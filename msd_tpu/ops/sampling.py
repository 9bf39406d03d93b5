"""Logits processing (temperature / top-k / top-p) as pure jax ops.

Mirrors the reference's HF LogitsProcessorList assembly
(EAGLE/eagle/model/utils.py:64-80): temperature warp, then top-k, then top-p.
Greedy decoding corresponds to ``temperature == 0`` (no processor at all).
Repetition penalty is accepted for API parity but 0.0/1.0 (off) in every
reference run; a nonzero value is applied host-side by the harness.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@dataclass(frozen=True)
class SamplingParams:
    temperature: float = 0.0
    top_p: float = 1.0
    top_k: int = 0
    repetition_penalty: float = 1.0
    # Canonical greedy argmax: round logits to this many mantissa bits before
    # every greedy argmax (0 = off, exact fp32 argmax). See canon_logits.
    greedy_round_bits: int = 0

    @property
    def greedy(self) -> bool:
        return self.temperature < 1e-5


def process_logits(logits: jnp.ndarray, sp: SamplingParams) -> jnp.ndarray:
    """Apply temperature/top-k/top-p filtering to [..., V] fp32 logits."""
    if sp.greedy:
        return logits
    x = logits / jnp.float32(sp.temperature)
    if sp.top_k and sp.top_k > 0:
        kth = jnp.sort(x, axis=-1)[..., -sp.top_k][..., None]
        x = jnp.where(x < kth, NEG_INF, x)
    if sp.top_p < 1.0:
        sorted_x = jnp.sort(x, axis=-1)[..., ::-1]
        probs = jax.nn.softmax(sorted_x, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep tokens until cumulative prob exceeds top_p (always keep top-1)
        keep_sorted = (cum - probs) < sp.top_p
        cutoff = jnp.sum(keep_sorted, axis=-1, keepdims=True)  # num kept
        kth = jnp.take_along_axis(sorted_x, jnp.maximum(cutoff - 1, 0), axis=-1)
        x = jnp.where(x < kth, NEG_INF, x)
    return x


def apply_repetition_penalty(logits: jnp.ndarray, ids_buf: jnp.ndarray,
                             cur_len: jnp.ndarray, penalty: float
                             ) -> jnp.ndarray:
    """HF RepetitionPenaltyLogitsProcessor over the committed context.

    logits: [..., V]; ids_buf: [S] committed token buffer; tokens at index
    >= cur_len ignored. (The reference constructs this processor in
    prepare_logits_processor but its MSD verify path passes input_ids=None,
    so a nonzero penalty would crash there — this is the working version.)
    """
    v = logits.shape[-1]
    s = ids_buf.shape[0]
    safe = jnp.where(jnp.arange(s) < cur_len, ids_buf, v)  # OOB -> dropped
    present = jnp.zeros((v,), jnp.bool_).at[safe].set(True, mode="drop")
    pen = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(present, pen, logits)


def canon_logits(logits: jnp.ndarray, bits: int) -> jnp.ndarray:
    """Round logits to ``bits`` mantissa bits (a scale-free grid) for a
    CANONICAL greedy argmax.

    bf16 matmul reduction orders differ across XLA program shapes (a 1-row AR
    step, an N-row tree verify, a fused vs split prefill), so near-tie argmaxes
    can flip between programs computing the same math — the decode trajectory
    becomes a numeric lottery. Rounding to a grid much coarser than that
    reduction noise before the argmax makes ties collapse to the same bucket
    (argmax's lowest-index tie-break is deterministic), so the greedy
    trajectory is a function of (prefix, weights) alone, independent of
    program shape. Applied IDENTICALLY in the AR baseline, prefill bonus
    sampling, and tree verification, losslessness (greedy MSD == greedy AR)
    is preserved by construction and becomes robust on real bf16 hardware.

    bits=0 disables (exact fp32 argmax); bits=7 is the bf16 grid; smaller is
    coarser (quantum 2^-bits relative).
    """
    if not bits:
        return logits
    return jax.lax.reduce_precision(logits, exponent_bits=8,
                                    mantissa_bits=bits)


def sample_token(key: jnp.ndarray, logits: jnp.ndarray,
                 sp: SamplingParams) -> jnp.ndarray:
    """[V] logits -> token id (argmax when greedy)."""
    if sp.greedy:
        return jnp.argmax(canon_logits(logits, sp.greedy_round_bits)
                          ).astype(jnp.int32)
    return jax.random.categorical(key, process_logits(logits, sp)).astype(jnp.int32)
