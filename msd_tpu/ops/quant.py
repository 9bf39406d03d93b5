"""Weight-only int8/int4 quantization for TPU serving.

The reference's load-4bit/load-8bit path is bitsandbytes CUDA
(LLaVA/llava/model/builder.py:26-167); the TPU-native analog is symmetric
per-output-channel integer weights dequantized at matmul time. On v5e the
decode loop is HBM-bandwidth-bound on weight reads, so int8 storage halves
the bytes per step and int4 quarters them; XLA fuses the unpack/dequant
elementwise chain into the matmul's operand read, so no dequantized copy is
materialized in HBM.

int4 storage is two nibbles per int8 byte, packed along the LAST axis of
the weight (independent of the contraction axis the scale reduces over) —
bit-exact round trip for values in [-7, 7] via arithmetic-shift
sign-extension, portable to every backend (no reliance on XLA S4 support).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_tensor(w: jnp.ndarray, axis: int, bits: int = 8):
    """Symmetric per-channel int8/int4 quantization.

    axis: the CONTRACTION axis of the matmul this weight feeds (amax is
    taken over it, keepdims, so ``dequantize`` broadcasts for any layout).
    bits=4 additionally packs value pairs along the last axis (which must
    be even-sized).
    Returns (w_q int8 [possibly packed], scale fp32 with singleton
    contraction dim).
    """
    qmax = {8: 127.0, 4: 7.0}[bits]
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=axis, keepdims=True)
    scale = jnp.where(amax > 0, amax / qmax, 1.0)
    w_q = jnp.clip(jnp.round(w32 / scale), -qmax, qmax).astype(jnp.int8)
    if bits == 4:
        w_q = pack_int4(w_q)
    return w_q, scale


def pack_int4(q: jnp.ndarray) -> jnp.ndarray:
    """int8 values in [-7,7] -> two-per-byte along the last axis."""
    lo, hi = q[..., 0::2], q[..., 1::2]
    return jnp.bitwise_or(jnp.bitwise_and(lo, 0x0F),
                          jnp.left_shift(hi, 4)).astype(jnp.int8)


def unpack_int4(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pack_int4: [..., N/2] int8 -> [..., N] int8 in [-7,7]."""
    lo = jnp.right_shift(jnp.left_shift(packed, 4), 4)  # sign-extend nibble
    hi = jnp.right_shift(packed, 4)                     # arithmetic shift
    out = jnp.stack([lo, hi], axis=-1)
    return out.reshape(packed.shape[:-1] + (packed.shape[-1] * 2,))


def dequantize(w_q: jnp.ndarray, scale: jnp.ndarray,
               dtype=jnp.bfloat16) -> jnp.ndarray:
    """int8 * per-channel scale -> dtype (fused by XLA into the consumer)."""
    return (w_q.astype(jnp.float32) * scale).astype(dtype)


def dequantize_int4(w_q: jnp.ndarray, scale: jnp.ndarray,
                    dtype=jnp.bfloat16) -> jnp.ndarray:
    """Packed int4 -> dtype, re-unpacked at every use.

    The unpack chain (shift/stack/reshape) does not fuse into the consumer
    dot, so XLA materializes it — and loop-invariant code motion then
    hoists it OUT of the decode while-loop, materializing the full bf16
    weight stacks as persistent temp (8.8GB at 13B: the whole point of
    int4 storage lost, and an instant OOM next to the 6.6GB packed args).
    The optimization barrier pins the unpack inside the loop body: int4
    decode re-pays a cheap VPU unpack per step and keeps HBM traffic at
    the packed byte count.
    """
    w_q = jax.lax.optimization_barrier(w_q)
    return (unpack_int4(w_q).astype(jnp.float32) * scale).astype(dtype)
