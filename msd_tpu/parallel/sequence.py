"""Sequence parallelism for long-prompt prefill.

Shards the token axis over a ``seq`` mesh axis: each device projects
q/k/v for its block, K/V are all-gathered (causal attention needs every
earlier token), and attention + MLP run on the local block only. Activation
memory and matmul FLOPs scale 1/K with the shard count; the collective is
one K/V all_gather per layer riding ICI.

This is the prefill-side complement to tensor parallelism (decode) and the
GPipe pipeline (microbatched training forwards) in this package. Exact vs
the unsharded forward (tests/test_parallel.py).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from msd_tpu.configs import LlamaConfig
from msd_tpu.models.llama import _layer_post_attn, _layer_qkv
from msd_tpu.ops.attention import masked_attention
from msd_tpu.ops.norms import rms_norm


def _ring_attention(q, k, v, bias_rows, sid, K, Tk, seq_axis, n_rep):
    """Blockwise ring attention: K/V blocks rotate around the ring while each
    shard accumulates flash-style (running max + rescaled sum), so no shard
    ever holds more than one [Tk] K/V block — O(T/K) memory vs the
    all_gather's O(T). bias_rows: this shard's [Tk, T] bias rows.
    """
    Tq, Hq, D = q.shape
    qf = q.astype(jnp.float32)
    m = jnp.full((Tq, Hq, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((Tq, Hq, 1), jnp.float32)
    acc = jnp.zeros((Tq, Hq, D), jnp.float32)
    perm = [(i, (i + 1) % K) for i in range(K)]

    for r in range(K):
        src = (sid - r) % K  # whose block we hold this round
        kb = jnp.repeat(k.astype(jnp.float32), n_rep, axis=1)  # GQA expand
        vb = jnp.repeat(v.astype(jnp.float32), n_rep, axis=1)
        bias_blk = jax.lax.dynamic_slice(
            bias_rows, (0, src * Tk), (Tq, Tk)).astype(jnp.float32)
        s = (jnp.einsum("thd,shd->ths", qf, kb) * (D ** -0.5)
             + bias_blk[:, None, :])
        m_new = jnp.maximum(m, s.max(axis=-1, keepdims=True))
        scale = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        acc = acc * scale + jnp.einsum("ths,shd->thd", p, vb)
        l = l * scale + p.sum(axis=-1, keepdims=True)
        m = m_new
        if r + 1 < K:
            k = jax.lax.ppermute(k, seq_axis, perm)
            v = jax.lax.ppermute(v, seq_axis, perm)
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def sequence_parallel_forward(params: Dict, cfg: LlamaConfig,
                              embeds: jnp.ndarray, bias: jnp.ndarray,
                              cos_t, sin_t, mesh: Mesh,
                              seq_axis: str = "seq",
                              mode: str = "gather") -> jnp.ndarray:
    """[T, H] prefill forward with T sharded over ``seq_axis``.

    embeds: [T, H] (T % n_shards == 0); bias: [T, T] full attention bias
    (rows are sliced per shard). Params replicated. Returns hidden [T, H]
    post final norm, identical to llama_forward on one device.

    mode: "gather" all-gathers K/V per layer (one collective, O(T) memory);
    "ring" rotates K/V blocks with flash-style accumulation (O(T/K) memory —
    the long-context choice).
    """
    K = mesh.shape[seq_axis]
    T = embeds.shape[0]
    assert T % K == 0, f"seq len {T} must divide shards {K}"
    Tk = T // K
    n_rep = cfg.num_attention_heads // cfg.num_key_value_heads

    def staged(layers, x_local):
        sid = jax.lax.axis_index(seq_axis)
        positions = sid * Tk + jnp.arange(Tk, dtype=jnp.int32)
        bias_local = jax.lax.dynamic_slice(bias, (sid * Tk, 0), (Tk, T))

        def body(h, lp):
            resid = h
            q, k, v = _layer_qkv(lp, cfg, h, positions, cos_t, sin_t, False)
            if mode == "ring":
                attn = _ring_attention(q, k, v, bias_local, sid, K, Tk,
                                       seq_axis, n_rep)
            else:
                # causal attention needs all earlier tokens' K/V
                k_all = jax.lax.all_gather(k, seq_axis, tiled=True)
                v_all = jax.lax.all_gather(v, seq_axis, tiled=True)
                attn = masked_attention(q, k_all, v_all, bias_local)
            return _layer_post_attn(lp, cfg, resid, attn), None

        h, _ = jax.lax.scan(body, x_local, layers)
        return h

    from jax.experimental.shard_map import shard_map

    fwd = shard_map(
        staged, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(), params["layers"]),
                  P(seq_axis)),
        out_specs=P(seq_axis),
        check_rep=False)
    hidden = fwd(params["layers"], embeds)
    return rms_norm(hidden, params["norm"], cfg.rms_norm_eps)
