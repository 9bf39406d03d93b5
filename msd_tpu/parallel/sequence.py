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


def sequence_parallel_forward(params: Dict, cfg: LlamaConfig,
                              embeds: jnp.ndarray, bias: jnp.ndarray,
                              cos_t, sin_t, mesh: Mesh,
                              seq_axis: str = "seq") -> jnp.ndarray:
    """[T, H] prefill forward with T sharded over ``seq_axis``.

    embeds: [T, H] (T % n_shards == 0); bias: [T, T] full attention bias
    (rows are sliced per shard). Params replicated. Returns hidden [T, H]
    post final norm, identical to llama_forward on one device.
    """
    K = mesh.shape[seq_axis]
    T = embeds.shape[0]
    assert T % K == 0, f"seq len {T} must divide shards {K}"
    Tk = T // K

    def staged(layers, x_local):
        sid = jax.lax.axis_index(seq_axis)
        positions = sid * Tk + jnp.arange(Tk, dtype=jnp.int32)
        bias_local = jax.lax.dynamic_slice(bias, (sid * Tk, 0), (Tk, T))

        def body(h, lp):
            resid = h
            q, k, v = _layer_qkv(lp, cfg, h, positions, cos_t, sin_t, False)
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
