"""Weight-only int8 quantization for TPU serving.

The reference's load-4bit/load-8bit path is bitsandbytes CUDA
(LLaVA/llava/model/builder.py:33-47); the TPU-native analog is symmetric
per-output-channel int8 weights dequantized at matmul time. On v5e the
decode loop is HBM-bandwidth-bound on weight reads, so int8 storage halves
the bytes per step; XLA fuses ``int8 -> bf16 * scale`` into the matmul's
operand read, so no dequantized copy is materialized in HBM.
"""

from __future__ import annotations

import jax.numpy as jnp


def quantize_tensor(w: jnp.ndarray, axis: int):
    """Symmetric per-channel int8 quantization.

    axis: the CONTRACTION axis of the matmul this weight feeds (amax is
    taken over it, keepdims, so ``dequantize`` broadcasts for any layout).
    Returns (w_q int8, scale fp32 with singleton contraction dim).
    """
    w32 = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(w32), axis=axis, keepdims=True)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    w_q = jnp.clip(jnp.round(w32 / scale), -127, 127).astype(jnp.int8)
    return w_q, scale


def dequantize(w_q: jnp.ndarray, scale: jnp.ndarray,
               dtype=jnp.bfloat16) -> jnp.ndarray:
    """int8 * per-channel scale -> dtype (fused by XLA into the consumer)."""
    return (w_q.astype(jnp.float32) * scale).astype(dtype)
