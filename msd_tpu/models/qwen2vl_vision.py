"""Qwen2-VL vision tower (Qwen2VisionTransformer) as functional JAX.

Completes the Qwen2-VL family: patch conv (expressed as matmul), 2D rotary
position embedding, full-attention blocks, and the 2x2 PatchMerger producing
LM-space image tokens. Reference consumer: the qwen2_vl_msd adapter
(lmms-eval/lmms_eval/models/qwen2_vl_msd.py) runs HF's visual tower; here the
tower is native so the whole encode is one jitted program.

Layout notes (must match HF exactly for checkpoint compatibility):
- The patch SEQUENCE is in 2x2-merge-window-major order: window (R, C), then
  (r, c) within the window (modeling_qwen2_vl.py rot_pos_emb:673-695 builds
  hpos/wpos with exactly this permutation, and PatchMerger groups 4
  consecutive patches).
- Rotary: head_dim//4 frequencies over the h position concatenated with the
  same over w -> duplicated to head_dim (apply_rotary_pos_emb_vision).
- Single images are repeated over the temporal_patch_size=2 axis.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from msd_tpu.models.clip_vit import quick_gelu
from msd_tpu.ops.norms import layer_norm


@dataclass(frozen=True)
class Qwen2VisionConfig:
    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: float = 4.0
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    in_channels: int = 3
    hidden_size: int = 3584   # LM hidden (merger output)
    layer_norm_eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def mlp_hidden(self) -> int:
        return int(self.embed_dim * self.mlp_ratio)

    @staticmethod
    def tiny(embed=32, depth=2, heads=4, hidden=64) -> "Qwen2VisionConfig":
        return Qwen2VisionConfig(embed_dim=embed, depth=depth,
                                 num_heads=heads, hidden_size=hidden)


def init_qwen_vision_params(key, cfg: Qwen2VisionConfig,
                            dtype=jnp.float32) -> Dict:
    e, mh = cfg.embed_dim, cfg.mlp_hidden
    merge_in = cfg.embed_dim * cfg.spatial_merge_size ** 2
    patch_in = cfg.in_channels * cfg.temporal_patch_size * cfg.patch_size ** 2
    keys = jax.random.split(key, 4 + cfg.depth)

    def mat(k, shape, scale=None):
        s = scale if scale is not None else shape[0] ** -0.5
        return (jax.random.normal(k, shape, jnp.float32) * s).astype(dtype)

    blocks = []
    for i in range(cfg.depth):
        bk = jax.random.split(keys[4 + i], 4)
        blocks.append({
            "norm1_w": jnp.ones((e,), dtype), "norm1_b": jnp.zeros((e,), dtype),
            "norm2_w": jnp.ones((e,), dtype), "norm2_b": jnp.zeros((e,), dtype),
            "qkv_w": mat(bk[0], (e, 3 * e)), "qkv_b": jnp.zeros((3 * e,), dtype),
            "proj_w": mat(bk[1], (e, e)), "proj_b": jnp.zeros((e,), dtype),
            "fc1_w": mat(bk[2], (e, mh)), "fc1_b": jnp.zeros((mh,), dtype),
            "fc2_w": mat(bk[3], (mh, e)), "fc2_b": jnp.zeros((e,), dtype),
        })
    return {
        "patch_embed": mat(keys[0], (patch_in, e)),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs, 0), *blocks),
        "ln_q_w": jnp.ones((e,), dtype), "ln_q_b": jnp.zeros((e,), dtype),
        "merge_fc1": mat(keys[1], (merge_in, merge_in)),
        "merge_fc1_b": jnp.zeros((merge_in,), dtype),
        "merge_fc2": mat(keys[2], (merge_in, cfg.hidden_size)),
        "merge_fc2_b": jnp.zeros((cfg.hidden_size,), dtype),
    }


def window_major_patches(pixels: jnp.ndarray, cfg: Qwen2VisionConfig
                         ) -> jnp.ndarray:
    """[3, H, W] -> [gh*gw, C*Tp*P*P] patch rows in merge-window-major order
    (single image; the frame is repeated over the temporal axis)."""
    p, m = cfg.patch_size, cfg.spatial_merge_size
    c, H, W = pixels.shape
    gh, gw = H // p, W // p
    x = pixels.reshape(c, gh // m, m, p, gw // m, m, p)
    # order: (R, C, r, c) windows-major, patch pixels (ch, tp, ph, pw)
    x = x.transpose(1, 4, 2, 5, 0, 3, 6)       # [gh/m, gw/m, m, m, C, p, p]
    x = x.reshape(gh * gw, c * p * p)
    # temporal repeat: HF flattens as [C, Tp, P, P] per patch
    x = x.reshape(gh * gw, c, 1, p * p)
    x = jnp.tile(x, (1, 1, cfg.temporal_patch_size, 1))
    return x.reshape(gh * gw, c * cfg.temporal_patch_size * p * p)


def window_major_patches_video(frames: jnp.ndarray, cfg: Qwen2VisionConfig
                               ) -> jnp.ndarray:
    """[T, 3, H, W] frames -> [grid_t*gh*gw, C*Tp*P*P] patch rows.

    Temporal patching groups ``temporal_patch_size`` consecutive frames into
    one patch (grid_t = T / Tp; an odd tail repeats the last frame, matching
    Qwen2VLImageProcessor); within each temporal block the spatial order is
    merge-window-major, blocks concatenated in time order."""
    tp, p, m = cfg.temporal_patch_size, cfg.patch_size, cfg.spatial_merge_size
    T, c, H, W = frames.shape
    if T % tp:
        frames = jnp.concatenate(
            [frames, jnp.repeat(frames[-1:], tp - T % tp, axis=0)], axis=0)
        T = frames.shape[0]
    gt, gh, gw = T // tp, H // p, W // p
    x = frames.reshape(gt, tp, c, gh // m, m, p, gw // m, m, p)
    # -> [gt, R, C, r, c, ch, tp, ph, pw] (HF per-patch layout [C, Tp, P, P])
    x = x.transpose(0, 3, 6, 4, 7, 2, 1, 5, 8)
    return x.reshape(gt * gh * gw, c * tp * p * p)


def vision_rotary(cfg: Qwen2VisionConfig, gh: int, gw: int,
                  theta: float = 10000.0, grid_t: int = 1
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """cos/sin [grid_t*gh*gw, head_dim] for the window-major patch order
    (rot_pos_emb repeats the same 2D spatial positions for every temporal
    block, modeling_qwen2vl_kv.py:997-1025)."""
    m = cfg.spatial_merge_size
    dim4 = cfg.head_dim // 4
    inv = 1.0 / (theta ** (np.arange(0, dim4 * 2, 2, dtype=np.float64) / (dim4 * 2)))

    hh = np.arange(gh)[:, None] * np.ones((1, gw))
    ww = np.ones((gh, 1)) * np.arange(gw)[None, :]

    def window_major(a):
        a = a.reshape(gh // m, m, gw // m, m).transpose(0, 2, 1, 3)
        return a.reshape(-1)

    hpos, wpos = window_major(hh), window_major(ww)
    freqs = np.concatenate([np.outer(hpos, inv), np.outer(wpos, inv)], axis=1)
    emb = np.concatenate([freqs, freqs], axis=1)  # [gh*gw, head_dim]
    if grid_t > 1:
        emb = np.tile(emb, (grid_t, 1))
    return jnp.asarray(np.cos(emb), jnp.float32), \
        jnp.asarray(np.sin(emb), jnp.float32)


def _rotate_half(x):
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def qwen_vision_encode(params: Dict, cfg: Qwen2VisionConfig,
                       pixels: jnp.ndarray) -> jnp.ndarray:
    """[3, H, W] -> merged image tokens [gh*gw/4, hidden_size]."""
    p = cfg.patch_size
    _, H, W = pixels.shape
    gh, gw = H // p, W // p
    x = window_major_patches(pixels, cfg) @ params["patch_embed"]
    return _encode_core(params, cfg, x, 1, gh, gw)


def qwen_vision_encode_video(params: Dict, cfg: Qwen2VisionConfig,
                             frames: jnp.ndarray) -> jnp.ndarray:
    """[T, 3, H, W] frames -> merged video tokens [grid_t*gh*gw/4, hidden].

    grid_t = ceil(T / temporal_patch_size); attention is block-diagonal over
    temporal blocks (cu_seqlens = repeat_interleave(gh*gw, grid_t),
    modeling_qwen2vl_kv.py:1032), so each temporal slice attends within
    itself — unlike a naive full-attention stack of frames."""
    tp, p = cfg.temporal_patch_size, cfg.patch_size
    T, _, H, W = frames.shape
    gt = (T + tp - 1) // tp
    gh, gw = H // p, W // p
    x = window_major_patches_video(frames, cfg) @ params["patch_embed"]
    return _encode_core(params, cfg, x, gt, gh, gw)


def _encode_core(params: Dict, cfg: Qwen2VisionConfig, x: jnp.ndarray,
                 gt: int, gh: int, gw: int) -> jnp.ndarray:
    n = gt * gh * gw
    e, nh, d = cfg.embed_dim, cfg.num_heads, cfg.head_dim

    cos, sin = vision_rotary(cfg, gh, gw, grid_t=gt)
    cos = cos[:, None, :]
    sin = sin[:, None, :]
    if gt > 1:  # per-temporal-block attention
        blk = jnp.arange(n) // (gh * gw)
        attn_bias = jnp.where(blk[:, None] == blk[None, :], 0.0,
                              -1e30).astype(jnp.float32)
    else:
        attn_bias = None

    def block(x, bp):
        y = layer_norm(x, bp["norm1_w"], bp["norm1_b"], cfg.layer_norm_eps)
        qkv = (y @ bp["qkv_w"] + bp["qkv_b"]).reshape(n, 3, nh, d)
        q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]
        qf, kf = q.astype(jnp.float32), k.astype(jnp.float32)
        q = (qf * cos + _rotate_half(qf) * sin).astype(x.dtype)
        k = (kf * cos + _rotate_half(kf) * sin).astype(x.dtype)
        scores = jnp.einsum("qhd,khd->hqk", q, k,
                            preferred_element_type=jnp.float32) * (d ** -0.5)
        if attn_bias is not None:
            scores = scores + attn_bias[None]
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        attn = jnp.einsum("hqk,khd->qhd", probs, v,
                          preferred_element_type=jnp.float32).astype(x.dtype)
        x = x + attn.reshape(n, e) @ bp["proj_w"] + bp["proj_b"]
        y = layer_norm(x, bp["norm2_w"], bp["norm2_b"], cfg.layer_norm_eps)
        y = quick_gelu(y @ bp["fc1_w"] + bp["fc1_b"])
        return x + y @ bp["fc2_w"] + bp["fc2_b"], None

    x, _ = jax.lax.scan(block, x, params["blocks"])

    x = layer_norm(x, params["ln_q_w"], params["ln_q_b"], cfg.layer_norm_eps)
    merge_in = e * cfg.spatial_merge_size ** 2
    x = x.reshape(n // (cfg.spatial_merge_size ** 2), merge_in)
    x = x @ params["merge_fc1"] + params["merge_fc1_b"]
    x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)
    return x @ params["merge_fc2"] + params["merge_fc2_b"]


def params_from_hf_qwen_vision(state: Dict, cfg: Qwen2VisionConfig,
                               prefix: str = "visual.",
                               dtype=jnp.float32) -> Dict:
    def get(name):
        return np.asarray(state[prefix + name])

    conv = get("patch_embed.proj.weight")  # [E, C, Tp, P, P]
    patch_w = conv.reshape(cfg.embed_dim, -1).T

    blocks = []
    for i in range(cfg.depth):
        pre = f"blocks.{i}."
        blocks.append({
            "norm1_w": jnp.asarray(get(pre + "norm1.weight"), dtype),
            "norm1_b": jnp.asarray(get(pre + "norm1.bias"), dtype),
            "norm2_w": jnp.asarray(get(pre + "norm2.weight"), dtype),
            "norm2_b": jnp.asarray(get(pre + "norm2.bias"), dtype),
            "qkv_w": jnp.asarray(get(pre + "attn.qkv.weight").T, dtype),
            "qkv_b": jnp.asarray(get(pre + "attn.qkv.bias"), dtype),
            "proj_w": jnp.asarray(get(pre + "attn.proj.weight").T, dtype),
            "proj_b": jnp.asarray(get(pre + "attn.proj.bias"), dtype),
            "fc1_w": jnp.asarray(get(pre + "mlp.fc1.weight").T, dtype),
            "fc1_b": jnp.asarray(get(pre + "mlp.fc1.bias"), dtype),
            "fc2_w": jnp.asarray(get(pre + "mlp.fc2.weight").T, dtype),
            "fc2_b": jnp.asarray(get(pre + "mlp.fc2.bias"), dtype),
        })
    return {
        "patch_embed": jnp.asarray(patch_w, dtype),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs, 0), *blocks),
        "ln_q_w": jnp.asarray(get("merger.ln_q.weight"), dtype),
        "ln_q_b": jnp.asarray(get("merger.ln_q.bias"), dtype),
        "merge_fc1": jnp.asarray(get("merger.mlp.0.weight").T, dtype),
        "merge_fc1_b": jnp.asarray(get("merger.mlp.0.bias"), dtype),
        "merge_fc2": jnp.asarray(get("merger.mlp.2.weight").T, dtype),
        "merge_fc2_b": jnp.asarray(get("merger.mlp.2.bias"), dtype),
    }
