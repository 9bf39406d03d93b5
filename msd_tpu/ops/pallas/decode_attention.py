"""Length-aware flash attention over the preallocated KV cache (Pallas/TPU).

The XLA attention path (ops/attention.py) reads the ENTIRE [S, Hkv, D] cache
every step because shapes are static — at serving lengths (S=4096) that is
gigabytes of dead HBM traffic per 7B forward once the live context is short.
The reference never pays this (torch attends over narrowed views,
kv_cache.py:52-66). This kernel restores cost ∝ live length on TPU:

- grid (head_blocks, S/BLOCK); the kv-length scalar is PREFETCHED and the
  BlockSpec index maps clamp out-of-range blocks to the last needed one —
  Pallas skips the DMA for consecutive identical block indices, so dead cache
  blocks are neither fetched nor computed.
- flash-style streaming softmax (running max/sum in VMEM scratch) with the
  engine's additive bias blocks — the same masks (causal / tree / length)
  drive visibility, so greedy AR == MSD parity is preserved by construction.
- KV blocks are (BLOCK_S, HB=8 heads, 128) straight from the seq-major cache
  layout (no transposed copies of the cache).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(kvlen_ref, q_ref, k_ref, v_ref, b_ref, o_ref,
            acc_ref, m_ref, l_ref, *, block_s: int, scale: float):
    s = pl.program_id(1)
    n_s = pl.num_programs(1)
    needed = pl.cdiv(kvlen_ref[0], block_s)

    @pl.when(s == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(s < needed)
    def _compute():
        q = q_ref[:]                                   # [HB, GT, D]
        k = jnp.swapaxes(k_ref[:], 0, 1)               # [HB, BS, D]
        v = jnp.swapaxes(v_ref[:], 0, 1)               # [HB, BS, D]
        scores = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # [HB, GT, BS]
        scores = scores + b_ref[:][None].astype(jnp.float32)

        m_prev = jnp.max(m_ref[:], axis=2, keepdims=True)   # [HB, GT, 1]
        m_cur = jnp.max(scores, axis=2, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)                         # [HB, GT, BS]
        l_new = (jnp.max(l_ref[:], axis=2, keepdims=True) * alpha
                 + jnp.sum(p, axis=2, keepdims=True))
        l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)             # [HB, GT, D]
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)

    @pl.when(s == n_s - 1)
    def _finish():
        l = jnp.maximum(jnp.max(l_ref[:], axis=2, keepdims=True), 1e-20)
        o_ref[:] = (acc_ref[:] / l).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def decode_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     bias: jnp.ndarray, kv_len: jnp.ndarray,
                     block_s: int = 256, interpret: bool = False
                     ) -> jnp.ndarray:
    """q: [T, Hq, D]; k, v: [S, Hkv, D] (seq-major cache); bias: [T, S].

    Semantics identical to ops.attention.masked_attention for keys < kv_len;
    keys at positions >= kv_len must already be masked by the bias (the
    kernel additionally skips their blocks entirely).
    """
    t, hq, d = q.shape
    s, hkv, _ = k.shape
    g = hq // hkv
    gt = g * t
    assert s % block_s == 0, (s, block_s)
    n_s = s // block_s
    hb = min(hkv, 8)
    assert hkv % hb == 0
    scale = 1.0 / (d ** 0.5)

    # group-major query layout [Hkv, G*T, D]
    qg = q.reshape(t, hkv, g, d).transpose(1, 2, 0, 3).reshape(hkv, gt, d)
    bias_gt = jnp.tile(bias, (g, 1)) if g > 1 else bias

    kv_len_arr = jnp.asarray(kv_len, jnp.int32).reshape(1)

    def clamp(sidx, kvlen_ref):
        needed = pl.cdiv(kvlen_ref[0], block_s)
        return jnp.minimum(sidx, jnp.maximum(needed - 1, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(hkv // hb, n_s),
        in_specs=[
            pl.BlockSpec((hb, gt, d), lambda h, sb, kl: (h, 0, 0)),
            pl.BlockSpec((block_s, hb, d),
                         lambda h, sb, kl: (clamp(sb, kl), h, 0)),
            pl.BlockSpec((block_s, hb, d),
                         lambda h, sb, kl: (clamp(sb, kl), h, 0)),
            pl.BlockSpec((gt, block_s), lambda h, sb, kl: (0, clamp(sb, kl))),
        ],
        out_specs=pl.BlockSpec((hb, gt, d), lambda h, sb, kl: (h, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hb, gt, d), jnp.float32),
            pltpu.VMEM((hb, gt, 128), jnp.float32),
            pltpu.VMEM((hb, gt, 128), jnp.float32),
        ],
    )

    out = pl.pallas_call(
        functools.partial(_kernel, block_s=block_s, scale=scale),
        out_shape=jax.ShapeDtypeStruct((hkv, gt, d), q.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(kv_len_arr, qg, k, v, bias_gt)

    # back to [T, Hq, D]
    return out.reshape(hkv, g, t, d).transpose(2, 0, 1, 3).reshape(t, hq, d)
