"""Normalization ops. fp32 accumulation regardless of activation dtype."""

from __future__ import annotations

import jax.numpy as jnp


def rms_norm(x: jnp.ndarray, weight: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """LLaMA RMSNorm: x * rsqrt(mean(x^2) + eps) * w, moments in fp32."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    xf = xf * jnp.reciprocal(jnp.sqrt(var + eps))
    return (xf * weight.astype(jnp.float32)).astype(dtype)


def layer_norm(x: jnp.ndarray, weight: jnp.ndarray, bias: jnp.ndarray,
               eps: float = 1e-5) -> jnp.ndarray:
    """Standard LayerNorm (CLIP tower), fp32 moments."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    xf = (xf - mean) * jnp.reciprocal(jnp.sqrt(var + eps))
    out = xf * weight.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(dtype)
