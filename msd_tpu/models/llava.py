"""LLaVA-1.5 multimodal assembly: vision tower -> projector -> embedding fusion.

Reference: LLaVA/llava/model/llava_arch.py:145-324
(prepare_inputs_labels_for_multimodal) and
multimodal_projector/builder.py:33-50 (mlp2x_gelu 1024->4096).

TPU-first differences from the reference:
- Image features are encoded ONCE per request and cached. The reference
  re-runs the CLIP tower on every verify step
  (EAGLE/eagle/model/utils.py:537-542) — deterministic features, pure waste.
- Fusion is a fixed-shape gather/select: expanded[j] is either a text-token
  embedding (index j or j-(n_img-1) around the placeholder) or an image
  feature, selected by position masks — no per-sample Python splicing.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from msd_tpu.configs import IMAGE_TOKEN_INDEX, LlavaConfig
from msd_tpu.models.clip_vit import clip_encode

Params = Dict


def init_projector_params(key, cfg: LlavaConfig, dtype=jnp.float32) -> Params:
    vh, th = cfg.mm_hidden_size, cfg.text.hidden_size
    k1, k2 = jax.random.split(key)
    s1, s2 = vh ** -0.5, th ** -0.5
    return {
        "fc1": (jax.random.normal(k1, (vh, th), jnp.float32) * s1).astype(dtype),
        "fc1_b": jnp.zeros((th,), dtype),
        "fc2": (jax.random.normal(k2, (th, th), jnp.float32) * s2).astype(dtype),
        "fc2_b": jnp.zeros((th,), dtype),
    }


def projector_apply(params: Params, feats: jnp.ndarray) -> jnp.ndarray:
    """mlp2x_gelu: Linear -> GELU(tanh-free exact) -> Linear."""
    x = feats @ params["fc1"] + params["fc1_b"]
    x = jax.nn.gelu(x.astype(jnp.float32), approximate=False).astype(x.dtype)
    return x @ params["fc2"] + params["fc2_b"]


def encode_image(llava_params: Params, cfg: LlavaConfig,
                 pixels: jnp.ndarray) -> jnp.ndarray:
    """[3, H, W] -> projected image tokens [n_img, text_hidden].

    With cfg.s2_scales set, pixels must be at the largest scale and features
    are multi-scale-concatenated (clip_encoder.py:92-147) before projection.
    """
    if cfg.s2_scales:
        from msd_tpu.models.clip_vit import clip_encode_s2
        feats = clip_encode_s2(llava_params["vision"], cfg.vision, pixels,
                               cfg.s2_scales)
    else:
        feats = clip_encode(llava_params["vision"], cfg.vision, pixels)
    return projector_apply(llava_params["projector"], feats)


def expand_ids(ids: jnp.ndarray, img_pos: jnp.ndarray, n_img: int,
               out_len: int, sentinel: int = 0) -> jnp.ndarray:
    """Expand ids containing one image placeholder into post-expansion layout.

    ids: [P] (pad tail arbitrary), img_pos: scalar index of the placeholder.
    Output [out_len]: positions [img_pos, img_pos+n_img) get `sentinel`,
    others get the corresponding text token. out_len >= P + n_img - 1.
    """
    j = jnp.arange(out_len)
    before = j < img_pos
    in_img = (j >= img_pos) & (j < img_pos + n_img)
    src = jnp.where(before, j, j - (n_img - 1))
    src = jnp.clip(src, 0, ids.shape[0] - 1)
    toks = ids[src]
    return jnp.where(in_img, jnp.int32(sentinel), toks)


def fuse_embeddings(embed_table: jnp.ndarray, ids: jnp.ndarray,
                    img_feats: jnp.ndarray, img_pos: jnp.ndarray,
                    out_len: int) -> jnp.ndarray:
    """Build fused embeddings [out_len, H] with image features spliced in.

    ids: [P] token ids with IMAGE_TOKEN_INDEX at img_pos; img_feats [n_img, H].
    Token positions beyond the real prompt length are garbage-but-masked later
    (static-shape prefill). Matches llava_arch.py:229-324 splicing for the
    single-image, bs=1 case the MSD pipeline uses.
    """
    n_img = img_feats.shape[0]
    safe_ids = jnp.where(ids == IMAGE_TOKEN_INDEX, 0, ids)
    exp_ids = expand_ids(safe_ids, img_pos, n_img, out_len)
    text_emb = embed_table[exp_ids]

    j = jnp.arange(out_len)
    in_img = (j >= img_pos) & (j < img_pos + n_img)
    img_idx = jnp.clip(j - img_pos, 0, n_img - 1)
    img_emb = img_feats[img_idx]
    return jnp.where(in_img[:, None], img_emb.astype(text_emb.dtype), text_emb)


def params_from_hf_projector(state: Dict, dtype=jnp.float32,
                             prefix: str = "model.mm_projector.") -> Params:
    import numpy as np

    def get(name):
        return np.asarray(state[prefix + name])

    return {
        "fc1": jnp.asarray(get("0.weight").T, dtype),
        "fc1_b": jnp.asarray(get("0.bias"), dtype),
        "fc2": jnp.asarray(get("2.weight").T, dtype),
        "fc2_b": jnp.asarray(get("2.bias"), dtype),
    }
