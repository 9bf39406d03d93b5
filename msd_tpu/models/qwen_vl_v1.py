"""Qwen-VL (v1) visual tower: OpenCLIP-style ViT + cross-attention Resampler.

The reference's ``qwen_vl_eagle`` adapter (lmms-eval/lmms_eval/models/
qwen_vl_eagle.py:29-384) serves Qwen/Qwen-VL via HF remote code, whose
visual model is a pre-LN ViT (448px, patch 14, width 1664, 48 layers) whose
output a Resampler pools into 256 learned-query tokens via one cross-
attention with 2D sincos positional embeddings, then projects to the LM
hidden size. Unlike Qwen2-VL there is no mrope — the 256 image tokens sit
inline in the prompt under ordinary 1D positions, so the MSD engine serves
it with image_mode="inline" and mrope_section=None.

Layout conventions (match the public Qwen-VL ``visual.py`` for checkpoint
compatibility):
- torch nn.MultiheadAttention packs q/k/v as in_proj_weight [3E, E] (rows)
  with in_proj_bias [3E]; out_proj is a Linear.
- Resampler: queries get pos_embed (grid n_queries**0.5); keys get the SAME
  sincos table interpolated (bicubic) to the ViT output grid; values carry
  no positions.
- ViT positional_embedding is learned, interpolated (bicubic) when the
  input grid differs from the checkpoint grid.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from msd_tpu.ops.norms import layer_norm


@dataclass(frozen=True)
class QwenVLVisionConfig:
    image_size: int = 448
    patch_size: int = 14
    width: int = 1664
    layers: int = 48
    heads: int = 16
    mlp_size: int = 8192
    output_dim: int = 4096      # LM hidden (= resampler embed dim)
    n_queries: int = 256
    resampler_heads: int = 32
    layer_norm_eps: float = 1e-6

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @staticmethod
    def tiny(width=32, layers=2, heads=4, out=48, queries=4,
             image_size=56) -> "QwenVLVisionConfig":
        return QwenVLVisionConfig(image_size=image_size, width=width,
                                  layers=layers, heads=heads,
                                  mlp_size=width * 4, output_dim=out,
                                  n_queries=queries, resampler_heads=4)


def sincos_2d(embed_dim: int, grid: int) -> np.ndarray:
    """[grid*grid, embed_dim] 2D sincos table (get_2d_sincos_pos_embed)."""
    def _1d(dim, pos):
        omega = 1.0 / 10000 ** (np.arange(dim // 2, dtype=np.float64)
                                / (dim / 2.0))
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    gh = np.arange(grid, dtype=np.float64)
    gw = np.arange(grid, dtype=np.float64)
    ww, hh = np.meshgrid(gw, gh)
    # MAE's get_2d_sincos_pos_embed quirk: grid = meshgrid(grid_w, grid_h)
    # makes grid[0] the W-mesh, so its "emb_h" FIRST HALF actually encodes
    # the w coordinate — the table is [w-half, h-half]
    emb_w = _1d(embed_dim // 2, ww)
    emb_h = _1d(embed_dim // 2, hh)
    return np.concatenate([emb_w, emb_h], axis=1).astype(np.float32)


def _torch_bicubic_matrix(src: int, tgt: int) -> np.ndarray:
    """[tgt, src] 1D resize matrix matching torch F.interpolate(mode=
    'bicubic', align_corners=False): half-pixel centers, Keys kernel with
    A=-0.75 (jax.image.resize uses A=-0.5 — different values), edge-clamped
    taps. Built once at trace time (sizes are static)."""
    A = -0.75

    def w(d):
        d = abs(d)
        if d <= 1.0:
            return ((A + 2) * d - (A + 3)) * d * d + 1
        if d < 2.0:
            return A * (((d - 5) * d + 8) * d - 4)
        return 0.0

    M = np.zeros((tgt, src), np.float64)
    for i in range(tgt):
        x = (i + 0.5) * src / tgt - 0.5
        base = int(np.floor(x))
        frac = x - base
        for k, dist in ((-1, 1 + frac), (0, frac), (1, 1 - frac),
                        (2, 2 - frac)):
            M[i, min(max(base + k, 0), src - 1)] += w(dist)
    return M.astype(np.float32)


def interp_abs_pos(pos: jnp.ndarray, tgt_len: int) -> jnp.ndarray:
    """get_abs_pos: bicubic-resize a [S, D] grid table to tgt_len rows
    (torch-exact kernel — the remote code interpolates checkpoint tables up
    to the input patch grid, e.g. 16x16 -> 32x32 at 448px)."""
    src = int(round(pos.shape[0] ** 0.5))
    tgt = int(round(tgt_len ** 0.5))
    if src == tgt:
        return pos
    d = pos.shape[1]
    M = jnp.asarray(_torch_bicubic_matrix(src, tgt))
    x = pos.reshape(src, src, d).astype(jnp.float32)
    x = jnp.einsum("ts,suv->tuv", M, x)
    x = jnp.einsum("us,tsv->tuv", M, x)
    return x.reshape(tgt * tgt, d).astype(pos.dtype)


def _mha(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, p: Dict,
         heads: int) -> jnp.ndarray:
    """torch nn.MultiheadAttention forward (batch-free [T, E] tensors)."""
    e = q.shape[-1]
    d = e // heads
    wq, wk, wv = jnp.split(p["in_proj_w"], 3, axis=0)   # [E, E] each (rows)
    bq, bk, bv = jnp.split(p["in_proj_b"], 3, axis=0)
    qh = (q @ wq.T + bq).reshape(-1, heads, d)
    kh = (k @ wk.T + bk).reshape(-1, heads, d)
    vh = (v @ wv.T + bv).reshape(-1, heads, d)
    scores = jnp.einsum("qhd,khd->hqk", qh, kh,
                        preferred_element_type=jnp.float32) * (d ** -0.5)
    probs = jax.nn.softmax(scores, axis=-1).astype(vh.dtype)
    out = jnp.einsum("hqk,khd->qhd", probs, vh,
                     preferred_element_type=jnp.float32).astype(q.dtype)
    return out.reshape(-1, e) @ p["out_proj_w"].T + p["out_proj_b"]


def init_qwen_vl_vision_params(key, cfg: QwenVLVisionConfig,
                               dtype=jnp.float32) -> Dict:
    g2 = cfg.grid ** 2
    w, m, o = cfg.width, cfg.mlp_size, cfg.output_dim
    keys = jax.random.split(key, 6 + cfg.layers)

    def mat(k, shape, scale=None):
        s = scale if scale is not None else shape[-1] ** -0.5
        return (jax.random.normal(k, shape, jnp.float32) * s).astype(dtype)

    blocks = []
    for i in range(cfg.layers):
        bk = jax.random.split(keys[6 + i], 4)
        blocks.append({
            "ln1_w": jnp.ones((w,), dtype), "ln1_b": jnp.zeros((w,), dtype),
            "ln2_w": jnp.ones((w,), dtype), "ln2_b": jnp.zeros((w,), dtype),
            "in_proj_w": mat(bk[0], (3 * w, w)),
            "in_proj_b": jnp.zeros((3 * w,), dtype),
            "out_proj_w": mat(bk[1], (w, w)),
            "out_proj_b": jnp.zeros((w,), dtype),
            "fc_w": mat(bk[2], (m, w)), "fc_b": jnp.zeros((m,), dtype),
            "proj_w": mat(bk[3], (w, m)), "proj_b": jnp.zeros((w,), dtype),
        })
    return {
        "conv1": mat(keys[0], (w, 3 * cfg.patch_size ** 2)),
        "pos_embed": mat(keys[1], (g2, w), scale=0.02),
        "ln_pre_w": jnp.ones((w,), dtype), "ln_pre_b": jnp.zeros((w,), dtype),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs, 0), *blocks),
        "resampler": {
            "pos_embed": jnp.asarray(
                sincos_2d(o, int(round(cfg.n_queries ** 0.5))), dtype),
            "query": mat(keys[2], (cfg.n_queries, o), scale=0.02),
            "kv_proj_w": mat(keys[3], (o, w)),
            "ln_q_w": jnp.ones((o,), dtype), "ln_q_b": jnp.zeros((o,), dtype),
            "ln_kv_w": jnp.ones((o,), dtype),
            "ln_kv_b": jnp.zeros((o,), dtype),
            "attn": {
                "in_proj_w": mat(keys[4], (3 * o, o)),
                "in_proj_b": jnp.zeros((3 * o,), dtype),
                "out_proj_w": mat(keys[5], (o, o)),
                "out_proj_b": jnp.zeros((o,), dtype),
            },
        },
        "ln_post_w": jnp.ones((o,), dtype),
        "ln_post_b": jnp.zeros((o,), dtype),
        "proj": mat(jax.random.fold_in(keys[0], 1), (o, o)),
    }


def qwen_vl_vision_encode(params: Dict, cfg: QwenVLVisionConfig,
                          pixels: jnp.ndarray) -> jnp.ndarray:
    """[3, H, W] -> [n_queries, output_dim] image tokens."""
    p = cfg.patch_size
    _, H, W = pixels.shape
    gh, gw = H // p, W // p
    eps = cfg.layer_norm_eps
    heads = cfg.heads

    # conv1 as matmul over [gh*gw, 3*p*p] patch rows (row-major per patch)
    x = pixels.reshape(3, gh, p, gw, p).transpose(1, 3, 0, 2, 4)
    x = x.reshape(gh * gw, 3 * p * p) @ params["conv1"].T
    x = x + interp_abs_pos(params["pos_embed"], gh * gw)
    x = layer_norm(x, params["ln_pre_w"], params["ln_pre_b"], eps)

    def block(x, bp):
        y = layer_norm(x, bp["ln1_w"], bp["ln1_b"], eps)
        x = x + _mha(y, y, y, bp, heads)
        y = layer_norm(x, bp["ln2_w"], bp["ln2_b"], eps)
        y = jax.nn.gelu(y @ bp["fc_w"].T + bp["fc_b"], approximate=False)
        return x + y @ bp["proj_w"].T + bp["proj_b"], None

    x, _ = jax.lax.scan(block, x, params["blocks"])

    # Resampler: 256 learned queries cross-attend the ViT grid
    r = params["resampler"]
    kv = x @ r["kv_proj_w"].T
    kv = layer_norm(kv, r["ln_kv_w"], r["ln_kv_b"], eps)
    q = layer_norm(r["query"], r["ln_q_w"], r["ln_q_b"], eps)
    k_pos = interp_abs_pos(r["pos_embed"], kv.shape[0])
    out = _mha(q + r["pos_embed"], kv + k_pos, kv, r["attn"],
               cfg.resampler_heads)

    out = layer_norm(out, params["ln_post_w"], params["ln_post_b"], eps)
    return out @ params["proj"]


def params_from_hf_qwen_vl_vision(state: Dict, cfg: QwenVLVisionConfig,
                                  prefix: str = "transformer.visual.",
                                  dtype=jnp.float32) -> Dict:
    """Map the public Qwen/Qwen-VL checkpoint names (visual.py layout)."""
    def get(name):
        return np.asarray(state[prefix + name])

    conv = get("conv1.weight")                    # [W, 3, P, P]
    blocks = []
    for i in range(cfg.layers):
        pre = f"transformer.resblocks.{i}."
        blocks.append({
            "ln1_w": jnp.asarray(get(pre + "ln_1.weight"), dtype),
            "ln1_b": jnp.asarray(get(pre + "ln_1.bias"), dtype),
            "ln2_w": jnp.asarray(get(pre + "ln_2.weight"), dtype),
            "ln2_b": jnp.asarray(get(pre + "ln_2.bias"), dtype),
            "in_proj_w": jnp.asarray(get(pre + "attn.in_proj_weight"), dtype),
            "in_proj_b": jnp.asarray(get(pre + "attn.in_proj_bias"), dtype),
            "out_proj_w": jnp.asarray(get(pre + "attn.out_proj.weight"),
                                      dtype),
            "out_proj_b": jnp.asarray(get(pre + "attn.out_proj.bias"), dtype),
            "fc_w": jnp.asarray(get(pre + "mlp.c_fc.weight"), dtype),
            "fc_b": jnp.asarray(get(pre + "mlp.c_fc.bias"), dtype),
            "proj_w": jnp.asarray(get(pre + "mlp.c_proj.weight"), dtype),
            "proj_b": jnp.asarray(get(pre + "mlp.c_proj.bias"), dtype),
        })
    return {
        "conv1": jnp.asarray(conv.reshape(cfg.width, -1), dtype),
        "pos_embed": jnp.asarray(get("positional_embedding"), dtype),
        "ln_pre_w": jnp.asarray(get("ln_pre.weight"), dtype),
        "ln_pre_b": jnp.asarray(get("ln_pre.bias"), dtype),
        "blocks": jax.tree.map(lambda *xs: jnp.stack(xs, 0), *blocks),
        "resampler": {
            "pos_embed": jnp.asarray(get("attn_pool.pos_embed"), dtype),
            "query": jnp.asarray(get("attn_pool.query"), dtype),
            "kv_proj_w": jnp.asarray(get("attn_pool.kv_proj.weight"), dtype),
            "ln_q_w": jnp.asarray(get("attn_pool.ln_q.weight"), dtype),
            "ln_q_b": jnp.asarray(get("attn_pool.ln_q.bias"), dtype),
            "ln_kv_w": jnp.asarray(get("attn_pool.ln_kv.weight"), dtype),
            "ln_kv_b": jnp.asarray(get("attn_pool.ln_kv.bias"), dtype),
            "attn": {
                "in_proj_w": jnp.asarray(
                    get("attn_pool.attn.in_proj_weight"), dtype),
                "in_proj_b": jnp.asarray(
                    get("attn_pool.attn.in_proj_bias"), dtype),
                "out_proj_w": jnp.asarray(
                    get("attn_pool.attn.out_proj.weight"), dtype),
                "out_proj_b": jnp.asarray(
                    get("attn_pool.attn.out_proj.bias"), dtype),
            },
        },
        "ln_post_w": jnp.asarray(get("ln_post.weight"), dtype),
        "ln_post_b": jnp.asarray(get("ln_post.bias"), dtype),
        "proj": jnp.asarray(get("proj"), dtype),
    }


# ---------------------------------------------------------------------------
# Qwen (v1) language model: llama machinery + fused-qkv checkpoint layout
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class QwenVLV1TextConfig:
    """Qwen-VL (v1) LM shapes — Qwen-1 architecture: RMSNorm, 1D rotary,
    SwiGLU (w1/w2 halves), fused c_attn qkv WITH bias, no GQA. Serves on the
    llama kernels with qkv biases (the qwen2 layer structure minus mrope)."""

    vocab_size: int = 151936
    hidden_size: int = 4096
    intermediate_size: int = 11008    # HF config's 22016 // 2 (w1/w2 halves)
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    max_position_embeddings: int = 8192
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0

    def as_llama(self):
        from msd_tpu.configs import LlamaConfig
        return LlamaConfig(
            vocab_size=self.vocab_size, hidden_size=self.hidden_size,
            intermediate_size=self.intermediate_size,
            num_hidden_layers=self.num_hidden_layers,
            num_attention_heads=self.num_attention_heads,
            num_key_value_heads=self.num_attention_heads,
            max_position_embeddings=self.max_position_embeddings,
            rms_norm_eps=self.rms_norm_eps, rope_theta=self.rope_theta)

    @staticmethod
    def tiny(vocab=512, hidden=64, layers=2, heads=4,
             inter=128) -> "QwenVLV1TextConfig":
        return QwenVLV1TextConfig(
            vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
            num_hidden_layers=layers, num_attention_heads=heads,
            max_position_embeddings=2048)


def params_from_hf_qwen_v1(state: Dict, cfg: QwenVLV1TextConfig,
                           dtype=jnp.float32) -> Dict:
    """Map the public Qwen/Qwen-VL LM names (modeling_qwen.py layout):
    transformer.wte / h.{i}.{ln_1, attn.c_attn(+bias, fused qkv),
    attn.c_proj, ln_2, mlp.{w1 (up), w2 (gated/silu), c_proj}} /
    transformer.ln_f / lm_head."""
    h = cfg.hidden_size

    def get(name):
        return np.asarray(state[name])

    # llama stacked layout: q/k/v kept [out, in] (contract-dim minor — see
    # models/llama._HF_LAYER_MAP), o/gate/up/down transposed to [in, out]
    layers = {k: [] for k in ("input_layernorm", "post_attention_layernorm",
                              "q_proj", "k_proj", "v_proj", "o_proj",
                              "gate_proj", "up_proj", "down_proj",
                              "q_bias", "k_bias", "v_bias")}
    for i in range(cfg.num_hidden_layers):
        pre = f"transformer.h.{i}."
        cw = get(pre + "attn.c_attn.weight")     # [3H, H] rows q,k,v
        cb = get(pre + "attn.c_attn.bias")       # [3H]
        layers["q_proj"].append(cw[:h])
        layers["k_proj"].append(cw[h:2 * h])
        layers["v_proj"].append(cw[2 * h:])
        layers["q_bias"].append(cb[:h])
        layers["k_bias"].append(cb[h:2 * h])
        layers["v_bias"].append(cb[2 * h:])
        layers["o_proj"].append(get(pre + "attn.c_proj.weight").T)
        layers["input_layernorm"].append(get(pre + "ln_1.weight"))
        layers["post_attention_layernorm"].append(get(pre + "ln_2.weight"))
        # Qwen-1 MLP: c_proj(w1(x) * silu(w2(x))) — w2 is the gated half
        layers["gate_proj"].append(get(pre + "mlp.w2.weight").T)
        layers["up_proj"].append(get(pre + "mlp.w1.weight").T)
        layers["down_proj"].append(get(pre + "mlp.c_proj.weight").T)

    return {
        "embed_tokens": jnp.asarray(get("transformer.wte.weight"), dtype),
        "norm": jnp.asarray(get("transformer.ln_f.weight"), dtype),
        "lm_head": jnp.asarray(get("lm_head.weight").T, dtype),
        "layers": {k: jnp.asarray(np.stack(v, 0), dtype)
                   for k, v in layers.items()},
    }
