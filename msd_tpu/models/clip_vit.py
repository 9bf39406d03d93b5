"""CLIP ViT vision tower (ViT-L/14-336 shapes) as functional JAX.

Reference consumer: LLaVA/llava/model/multimodal_encoder/clip_encoder.py:7-89 —
frozen CLIPVisionModel, features read from hidden layer ``select_layer`` (-2),
CLS dropped for 'patch' mode -> 576 patch features.

TPU notes: the patch conv is expressed as an unfold + matmul
([num_patches, P*P*3] @ [P*P*3, H]) so it lands on the MXU rather than a small
convolution; pre-LN transformer blocks use quick_gelu to match OpenAI CLIP.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from msd_tpu.configs import ClipVisionConfig
from msd_tpu.ops.norms import layer_norm

Params = Dict


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


def init_clip_params(key, cfg: ClipVisionConfig, dtype=jnp.float32) -> Params:
    h, inter = cfg.hidden_size, cfg.intermediate_size
    p = cfg.patch_size
    n_pos = cfg.num_patches + 1
    keys = jax.random.split(key, 4 + cfg.num_hidden_layers)
    scale = h ** -0.5

    def mat(k, shape, s=scale):
        return (jax.random.normal(k, shape, jnp.float32) * s).astype(dtype)

    layers = []
    for i in range(cfg.num_hidden_layers):
        lk = jax.random.split(keys[4 + i], 6)
        layers.append({
            "ln1_w": jnp.ones((h,), dtype), "ln1_b": jnp.zeros((h,), dtype),
            "ln2_w": jnp.ones((h,), dtype), "ln2_b": jnp.zeros((h,), dtype),
            "q_proj": mat(lk[0], (h, h)), "q_bias": jnp.zeros((h,), dtype),
            "k_proj": mat(lk[1], (h, h)), "k_bias": jnp.zeros((h,), dtype),
            "v_proj": mat(lk[2], (h, h)), "v_bias": jnp.zeros((h,), dtype),
            "o_proj": mat(lk[3], (h, h)), "o_bias": jnp.zeros((h,), dtype),
            "fc1": mat(lk[4], (h, inter)), "fc1_b": jnp.zeros((inter,), dtype),
            "fc2": mat(lk[5], (inter, h)), "fc2_b": jnp.zeros((h,), dtype),
        })

    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *layers)
    return {
        "patch_embed": mat(keys[0], (p * p * 3, h)),
        "class_embed": mat(keys[1], (h,)),
        "pos_embed": mat(keys[2], (n_pos, h)),
        "pre_ln_w": jnp.ones((h,), dtype), "pre_ln_b": jnp.zeros((h,), dtype),
        "layers": stacked,
    }


def _block(lp: Params, cfg: ClipVisionConfig, x: jnp.ndarray) -> jnp.ndarray:
    """Pre-LN transformer block. x: [T, H]."""
    t, h = x.shape
    nh = cfg.num_attention_heads
    d = h // nh
    scale = d ** -0.5

    resid = x
    y = layer_norm(x, lp["ln1_w"], lp["ln1_b"], cfg.layer_norm_eps)
    q = (y @ lp["q_proj"] + lp["q_bias"]).reshape(t, nh, d)
    k = (y @ lp["k_proj"] + lp["k_bias"]).reshape(t, nh, d)
    v = (y @ lp["v_proj"] + lp["v_bias"]).reshape(t, nh, d)
    scores = jnp.einsum("qhd,khd->hqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    attn = jnp.einsum("hqk,khd->qhd", probs, v,
                      preferred_element_type=jnp.float32).astype(x.dtype)
    x = resid + attn.reshape(t, h) @ lp["o_proj"] + lp["o_bias"]

    resid = x
    y = layer_norm(x, lp["ln2_w"], lp["ln2_b"], cfg.layer_norm_eps)
    y = quick_gelu(y @ lp["fc1"] + lp["fc1_b"])
    return resid + y @ lp["fc2"] + lp["fc2_b"]


def clip_encode(params: Params, cfg: ClipVisionConfig,
                pixels: jnp.ndarray) -> jnp.ndarray:
    """pixels: [3, H, W] (CLIP-normalized) -> patch features [num_patches, hidden].

    Features come from hidden_states[select_layer] (HF indexing: index L means
    "after L blocks"; -2 of num_layers+1 entries = after num_layers-1 blocks),
    with the CLS token dropped (select_feature='patch').
    """
    p = cfg.patch_size
    g = cfg.image_size // p
    # unfold into [g*g, p*p*3]: conv-as-matmul, channels-last within a patch
    # matching Conv2d(C_in, H, kernel=p, stride=p) semantics.
    x = pixels.reshape(3, g, p, g, p)
    x = x.transpose(1, 3, 0, 2, 4).reshape(g * g, 3 * p * p)
    x = x @ params["patch_embed"]

    cls = params["class_embed"][None, :]
    x = jnp.concatenate([cls, x], axis=0) + params["pos_embed"]
    x = layer_norm(x, params["pre_ln_w"], params["pre_ln_b"], cfg.layer_norm_eps)

    # run blocks up to the selected layer only — the reference discards the
    # rest of the tower anyway (clip_encoder.py:35-56).
    n_run = cfg.num_hidden_layers + 1 + cfg.select_layer  # -2 -> L-1 blocks

    def body(x, lp):
        return _block(lp, cfg, x), None

    sliced = jax.tree.map(lambda a: a[:n_run], params["layers"])
    x, _ = jax.lax.scan(body, x, sliced)
    return x[1:]  # drop CLS


def params_from_hf_clip(state: Dict, cfg: ClipVisionConfig,
                        prefix: str = "vision_model.", dtype=jnp.float32) -> Params:
    """Import HF CLIPVisionModel weights. Conv kernel [H, 3, p, p] is reshaped
    to our unfold layout [3*p*p, H] (channel-major within patch)."""
    import numpy as np

    def get(name):
        return np.asarray(state[prefix + name])

    p = cfg.patch_size
    conv = get("embeddings.patch_embedding.weight")  # [H, 3, p, p]
    patch_w = conv.reshape(cfg.hidden_size, 3 * p * p).T

    layers = []
    for i in range(cfg.num_hidden_layers):
        pre = f"encoder.layers.{i}."
        layers.append({
            "ln1_w": jnp.asarray(get(pre + "layer_norm1.weight"), dtype),
            "ln1_b": jnp.asarray(get(pre + "layer_norm1.bias"), dtype),
            "ln2_w": jnp.asarray(get(pre + "layer_norm2.weight"), dtype),
            "ln2_b": jnp.asarray(get(pre + "layer_norm2.bias"), dtype),
            "q_proj": jnp.asarray(get(pre + "self_attn.q_proj.weight").T, dtype),
            "q_bias": jnp.asarray(get(pre + "self_attn.q_proj.bias"), dtype),
            "k_proj": jnp.asarray(get(pre + "self_attn.k_proj.weight").T, dtype),
            "k_bias": jnp.asarray(get(pre + "self_attn.k_proj.bias"), dtype),
            "v_proj": jnp.asarray(get(pre + "self_attn.v_proj.weight").T, dtype),
            "v_bias": jnp.asarray(get(pre + "self_attn.v_proj.bias"), dtype),
            "o_proj": jnp.asarray(get(pre + "self_attn.out_proj.weight").T, dtype),
            "o_bias": jnp.asarray(get(pre + "self_attn.out_proj.bias"), dtype),
            "fc1": jnp.asarray(get(pre + "mlp.fc1.weight").T, dtype),
            "fc1_b": jnp.asarray(get(pre + "mlp.fc1.bias"), dtype),
            "fc2": jnp.asarray(get(pre + "mlp.fc2.weight").T, dtype),
            "fc2_b": jnp.asarray(get(pre + "mlp.fc2.bias"), dtype),
        })
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs, 0), *layers)
    return {
        "patch_embed": jnp.asarray(patch_w, dtype),
        "class_embed": jnp.asarray(get("embeddings.class_embedding"), dtype),
        "pos_embed": jnp.asarray(get("embeddings.position_embedding.weight"), dtype),
        "pre_ln_w": jnp.asarray(get("pre_layrnorm.weight"), dtype),
        "pre_ln_b": jnp.asarray(get("pre_layrnorm.bias"), dtype),
        "layers": stacked,
    }


def clip_encode_s2(params: Params, cfg: ClipVisionConfig, pixels: jnp.ndarray,
                   scales) -> jnp.ndarray:
    """S2 multi-scale encoding (CLIPVisionTowerS2, clip_encoder.py:92-147;
    public scaling_on_scales recipe).

    pixels: [3, S_max, S_max] at the LARGEST scale. For each scale s the image
    is resized to s x s, split into (s/base)^2 base-size tiles (each tower
    call sees base x base — no pos-embed interpolation), tile feature grids
    are reassembled spatially and area-pooled back to the base grid, and the
    per-scale features are concatenated channel-wise:
    output [num_patches, hidden * len(scales)].
    """
    base = cfg.image_size
    g = base // cfg.patch_size  # base feature grid side
    outs = []
    for s in sorted(scales):
        k = s // base
        assert k * base == s, f"scale {s} must be a multiple of base {base}"
        img = pixels if s == pixels.shape[-1] else jax.image.resize(
            pixels, (3, s, s), method="linear")
        # [3, k*base, k*base] -> [k*k, 3, base, base] row-major tiles
        tiles = img.reshape(3, k, base, k, base).transpose(1, 3, 0, 2, 4)
        tiles = tiles.reshape(k * k, 3, base, base)
        feats = jax.vmap(lambda t: clip_encode(params, cfg, t))(tiles)
        # reassemble [k,k,g,g,H] -> [k*g, k*g, H], then area-pool to [g,g,H]
        H = feats.shape[-1]
        grid = feats.reshape(k, k, g, g, H).transpose(0, 2, 1, 3, 4)
        grid = grid.reshape(k * g, k * g, H)
        pooled = grid.reshape(g, k, g, k, H).mean(axis=(1, 3))
        outs.append(pooled.reshape(g * g, H))
    return jnp.concatenate(outs, axis=-1)
