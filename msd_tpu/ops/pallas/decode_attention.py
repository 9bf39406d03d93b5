"""Length-aware flash attention over the preallocated KV cache (Pallas/TPU).

The XLA attention path (ops/attention.py) reads the ENTIRE [S, Hkv, D] cache
every step because shapes are static — at serving lengths (S=4096) that is
gigabytes of dead HBM traffic per 7B forward once the live context is short.
The reference never pays this (torch attends over narrowed views,
kv_cache.py:52-66). This kernel restores cost ∝ live length on TPU:

- 1-D grid over sequence blocks; the kv-length scalar is PREFETCHED and the
  BlockSpec index maps clamp out-of-range blocks to the last needed one —
  Pallas skips the DMA for consecutive identical block indices, so dead cache
  blocks are neither fetched nor computed.
- every KV block carries ALL hkv heads: a (BLOCK_S, Hkv, D) slice of the
  seq-major cache is one fully CONTIGUOUS address range, so each block is a
  single streaming DMA. (The previous head-blocked layout fetched 8-of-32
  head strips — 2KB strided chunks re-swept 4x — and ran ~1.7x slower than
  XLA's full-cache read; measured in tools/attn_microbench.py.)
- flash-style streaming softmax (running max/sum in VMEM scratch) with the
  engine's additive bias blocks — the same masks (causal / tree / length)
  drive visibility, so greedy AR == MSD parity is preserved by construction.
- block_s auto-sizes to the VMEM budget (~16MB/core): the largest of
  512/256/128 that divides S and keeps the measured scoped working set under
  ~14MB (blocks below 128 are illegal: the bias block's lane dim must be
  128-aligned). No fit -> fall back to the XLA path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


# at/below this many grouped query rows the VPU multiply-reduce path wins:
# it works directly on the seq-major [BS, H, D] block (no transposes, no
# MXU), and its VPU cost scales with GT while the transpose cost is fixed
VPU_MAX_GT = 4


def _kernel(kvlen_ref, q_ref, k_ref, v_ref, b_ref, o_ref,
            acc_ref, m_ref, l_ref, *, block_s: int, scale: float):
    sb = pl.program_id(0)
    n_s = pl.num_programs(0)
    needed = pl.cdiv(kvlen_ref[0], block_s)
    gt = q_ref.shape[1]

    @pl.when(sb == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(sb < needed)
    def _compute():
        q = q_ref[:]                                   # [H, GT, D]
        k = k_ref[:]                                   # [BS, H, D] seq-major
        v = v_ref[:]
        b = b_ref[:]                                   # [GT, BS]
        if gt <= VPU_MAX_GT:
            # AR-decode path: per query row, scores[bs,h] = sum_d k*q — an
            # elementwise multiply + lane reduction in the DMA'd layout (the
            # big K/V tensors are never transposed; only the 16KB score
            # matrix flips orientation). Softmax stats run in [H, BS] space
            # so every reduction is over the lane dim — the only reduction
            # axis Mosaic lowers for all output ranks.
            k32 = k.astype(jnp.float32)
            v32 = v.astype(jnp.float32)
            for i in range(gt):
                qi = q[:, i, :].astype(jnp.float32)         # [H, D]
                s_bh = jnp.sum(k32 * qi[None], axis=2) * scale  # [BS, H]
                s_hb = jnp.swapaxes(s_bh, 0, 1)             # [H, BS] (16KB)
                s_hb = s_hb + b[i:i + 1, :].astype(jnp.float32)
                m_prev = m_ref[:, i:i + 1]                  # [H, 1]
                m_new = jnp.maximum(
                    m_prev, jnp.max(s_hb, axis=1, keepdims=True))
                alpha = jnp.exp(m_prev - m_new)             # [H, 1]
                p_hb = jnp.exp(s_hb - m_new)                # [H, BS]
                l_ref[:, i:i + 1] = (l_ref[:, i:i + 1] * alpha
                                     + jnp.sum(p_hb, axis=1, keepdims=True))
                p_bh = jnp.swapaxes(p_hb, 0, 1)             # [BS, H]
                pv = jnp.sum(v32 * p_bh[:, :, None], axis=0)    # [H, D]
                acc_ref[:, i, :] = acc_ref[:, i, :] * alpha + pv
                m_ref[:, i:i + 1] = m_new
            return
        # verify/prefill path: batched MXU matmuls; Mosaic needs batch dims
        # at the same operand position, so swap K/V to [H, BS, D] in VMEM
        kb = jnp.swapaxes(k, 0, 1)                     # [H, BS, D]
        vb = jnp.swapaxes(v, 0, 1)
        scores = jax.lax.dot_general(
            q, kb, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale  # [H, GT, BS]
        scores = scores + b[None].astype(jnp.float32)

        m_prev = m_ref[:][:, :, None]                       # [H, GT, 1]
        m_cur = jnp.max(scores, axis=2, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new)                         # [H, GT, BS]
        l_ref[:] = l_ref[:] * alpha[:, :, 0] + jnp.sum(p, axis=2)
        pv = jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)             # [H, GT, D]
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = m_new[:, :, 0]

    @pl.when(sb == n_s - 1)
    def _finish():
        l = jnp.maximum(l_ref[:][:, :, None], 1e-20)
        o_ref[:] = (acc_ref[:] / l).astype(o_ref.dtype)


def _pick_block_s(s: int, hkv: int, gt: int, d: int):
    """Largest block dividing S whose working set fits scoped VMEM (16MB);
    None when nothing fits (caller falls back to XLA).

    Mosaic's measured scoped allocation runs ~3x the naive double-buffered
    K/V estimate (buffering + matmul/transpose stack temporaries), so the
    estimate uses that factor against a 14MB budget.
    """
    fixed = (hkv * gt * d) * (2 + 4 + 2 * 2)     # q bf16 + acc f32 + out x2
    fixed += 2 * 4 * hkv * gt                    # m/l scratch
    # block_s < 128 is illegal (the bias block's lane dim must be 128-aligned)
    for bs in (512, 256, 128):
        if s % bs:
            continue
        kv = 3 * 2 * 2 * (bs * hkv * d * 2)      # K+V, buffered, x3 measured
        bias = 2 * 4 * gt * bs
        if fixed + kv + bias <= 14 * 1024 * 1024:
            return bs
    return None                                  # doesn't fit: use XLA


@functools.partial(jax.jit, static_argnames=("block_s", "interpret"))
def decode_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     bias: jnp.ndarray, kv_len: jnp.ndarray,
                     block_s: int | None = None, interpret: bool = False
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
    if block_s is None:
        block_s = _pick_block_s(s, hkv, gt, d)
        if block_s is None:
            # working set exceeds scoped VMEM (huge GT x long cache) — the
            # XLA path is both legal and faster there (attn_microbench)
            from msd_tpu.ops.attention import masked_attention
            return masked_attention(q, k, v, bias)
    assert s % block_s == 0, (s, block_s)
    n_s = s // block_s
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
        grid=(n_s,),
        in_specs=[
            pl.BlockSpec((hkv, gt, d), lambda sb, kl: (0, 0, 0)),
            pl.BlockSpec((block_s, hkv, d),
                         lambda sb, kl: (clamp(sb, kl), 0, 0)),
            pl.BlockSpec((block_s, hkv, d),
                         lambda sb, kl: (clamp(sb, kl), 0, 0)),
            pl.BlockSpec((gt, block_s), lambda sb, kl: (0, clamp(sb, kl))),
        ],
        out_specs=pl.BlockSpec((hkv, gt, d), lambda sb, kl: (0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((hkv, gt, d), jnp.float32),
            pltpu.VMEM((hkv, gt), jnp.float32),
            pltpu.VMEM((hkv, gt), jnp.float32),
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
