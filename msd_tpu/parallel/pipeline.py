"""GPipe-style pipeline parallelism for the stacked decoder forward.

The reference scales with per-process GPU sharding (deepspeed in
EAGLE/eagle/train/main_deepspeed.py); the TPU-native analog shards the
*layer axis* of the stacked parameters over a ``stage`` mesh axis and
rotates microbatch activations through the stages with ``ppermute``
(SPMD: every device runs the same program; warmup/drain ticks are masked).

This targets the throughput-bound phases (prefill, draft-data teacher
forwards, training) where microbatching keeps all stages busy; the decode
loop itself is latency-bound bs=1 and uses tensor parallelism instead
(parallel/sharding.py).

Scheduling: microbatch j is processed by stage s at tick t = j + s.
After L/S local layers, activations ppermute to the next stage; the last
stage's outputs are all-gathered (masked psum) so every device returns the
full result.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from msd_tpu.configs import LlamaConfig
from msd_tpu.models.llama import _layer_post_attn, _layer_qkv
from msd_tpu.ops.attention import masked_attention
from msd_tpu.ops.norms import rms_norm


def _local_forward(local_layers: Dict, cfg: LlamaConfig, x: jnp.ndarray,
                   positions: jnp.ndarray, bias: jnp.ndarray,
                   cos_t, sin_t) -> jnp.ndarray:
    """Run this stage's Lk stacked layers (no KV cache: prefill/training)."""

    def body(h, lp):
        resid = h
        q, k, v = _layer_qkv(lp, cfg, h, positions, cos_t, sin_t, False)
        attn = masked_attention(q, k, v, bias)
        return _layer_post_attn(lp, cfg, resid, attn), None

    x, _ = jax.lax.scan(body, x, local_layers)
    return x


def shard_layers_for_pipeline(params: Dict, mesh: Mesh) -> Dict:
    """Place the stacked layer pytree with the layer axis split over
    ``stage``; everything else (norm, embed, head) replicated."""
    out = dict(params)
    out["layers"] = jax.tree.map(
        lambda w: jax.device_put(w, NamedSharding(mesh, P("stage"))),
        params["layers"])
    for k in ("embed_tokens", "norm", "lm_head"):
        if k in out:
            out[k] = jax.device_put(out[k], NamedSharding(mesh, P()))
    return out


def pipeline_forward(params: Dict, cfg: LlamaConfig, embeds: jnp.ndarray,
                     bias: jnp.ndarray, cos_t, sin_t, mesh: Mesh,
                     stage_axis: str = "stage") -> jnp.ndarray:
    """Pipelined decoder forward over microbatches.

    embeds: [M, T, H] microbatches (M >= 1); bias: [T, T] shared attention
    bias; params["layers"] leaves are [L, ...] with L % n_stages == 0 and the
    layer axis sharded over ``stage_axis``. Returns hidden [M, T, H]
    (post final rms_norm), identical to the unpipelined scan forward.
    """
    S = mesh.shape[stage_axis]
    M, T, H = embeds.shape
    L = params["layers"]["q_proj"].shape[0]
    assert L % S == 0, f"layers {L} must divide stages {S}"
    positions = jnp.arange(T, dtype=jnp.int32)

    def staged(local_layers, mb):
        # local_layers: [L/S, ...] this stage's layers; mb: [M, T, H] (full,
        # replicated — only stage 0 reads it)
        sid = jax.lax.axis_index(stage_axis)
        carry = jnp.zeros((T, H), mb.dtype)
        outs = jnp.zeros((M, T, H), mb.dtype)
        for t in range(M + S - 1):
            j_in = min(t, M - 1)
            x = jnp.where(sid == 0, mb[j_in], carry)
            y = _local_forward(local_layers, cfg, x, positions, bias,
                               cos_t, sin_t)
            j_out = t - (S - 1)
            if 0 <= j_out < M:
                write = (sid == S - 1)
                outs = jax.lax.dynamic_update_slice(
                    outs,
                    jnp.where(write, y, outs[j_out])[None],
                    (j_out, 0, 0))
            carry = jax.lax.ppermute(
                y, stage_axis, [(i, (i + 1) % S) for i in range(S)])
        # broadcast the last stage's outputs to every device
        sel = (sid == S - 1).astype(outs.dtype)
        outs = jax.lax.psum(outs * sel, stage_axis)
        return outs

    from jax.experimental.shard_map import shard_map

    fwd = shard_map(
        staged, mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(stage_axis), params["layers"]),
                  P()),
        out_specs=P(),
        check_rep=False)
    hidden = fwd(params["layers"], embeds)
    return rms_norm(hidden, params["norm"], cfg.rms_norm_eps)
