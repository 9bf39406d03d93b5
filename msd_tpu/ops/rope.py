"""Rotary position embeddings (LLaMA rotate-half convention).

The reference relies on HF LlamaRotaryEmbedding
(EAGLE/eagle/model/modeling_llama_kv.py). Here the cos/sin table is built once
in fp32 at engine setup and gathered by (possibly tree-shaped) position ids —
positions are data, not shapes, so one compiled program serves every tree.
"""

from __future__ import annotations

import jax.numpy as jnp


def rope_table(max_pos: int, head_dim: int, theta: float = 10000.0):
    """Returns (cos, sin), each [max_pos, head_dim] in fp32 (HF half-duplicated layout)."""
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    t = jnp.arange(max_pos, dtype=jnp.float32)
    freqs = jnp.outer(t, inv_freq)  # [max_pos, head_dim//2]
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jnp.ndarray) -> jnp.ndarray:
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(q: jnp.ndarray, k: jnp.ndarray, cos_t: jnp.ndarray,
               sin_t: jnp.ndarray, positions: jnp.ndarray):
    """Apply rotary embedding.

    q: [T, Hq, D], k: [T, Hkv, D], positions: [T] int32 (post image expansion),
    cos_t/sin_t: [max_pos, D] tables. Computation in fp32, cast back.
    """
    cos = cos_t[positions][:, None, :]  # [T, 1, D]
    sin = sin_t[positions][:, None, :]
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    q_out = qf * cos + _rotate_half(qf) * sin
    k_out = kf * cos + _rotate_half(kf) * sin
    return q_out.astype(q.dtype), k_out.astype(k.dtype)
