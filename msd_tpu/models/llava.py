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


# ---------------------------------------------------------------------------
# anyres 'spatial'/'spatial_unpad' merge (llava_arch.py:100-200) and
# multi-image fusion (llava_arch.py:229-324). These run HOST-side per
# request (variable shapes); the resulting fused block feeds the engine's
# prefused-prefill path (spec_engine.prefill accepts prebuilt embeddings).
# ---------------------------------------------------------------------------

def unpad_feature_grid(grid, original_size):
    """Crop the aspect-ratio padding off a [gh, gw, H] feature grid
    (llava_arch.py:100-128 unpad_image; original_size is (width, height))."""
    import numpy as np
    grid = np.asarray(grid)
    ow, oh = original_size
    ch, cw = grid.shape[:2]
    if ow / oh > cw / ch:
        scale = cw / ow
        new_h = int(oh * scale)
        pad = (ch - new_h) // 2
        return grid[pad:ch - pad]
    scale = ch / oh
    new_w = int(ow * scale)
    pad = (cw - new_w) // 2
    return grid[:, pad:cw - pad]


def merge_anyres_features(tile_feats, grid_wh, original_size,
                          num_patches_per_side: int,
                          image_newline=None, mode: str = "spatial_unpad"):
    """[1+n_tiles, P, H] projected tile features -> merged [N, H]
    (llava_arch.py:153-200 mm_patch_merge_type 'spatial'/'spatial_unpad').

    tile_feats[0] is the base (global) view; grid_wh = (n_patch_w,
    n_patch_h) from get_anyres_image_grid_shape; original_size = (width,
    height) of the raw image; image_newline: optional [H] learned separator
    appended per spatial row under 'unpad'.
    """
    import numpy as np
    tile_feats = np.asarray(tile_feats)
    base = tile_feats[0]
    H = tile_feats.shape[-1]
    if tile_feats.shape[0] == 1:
        if "unpad" in mode and image_newline is not None:
            return np.concatenate([base, np.asarray(image_newline)[None]], 0)
        return base
    s = num_patches_per_side
    npw, nph = grid_wh
    assert nph * npw == tile_feats.shape[0] - 1, \
        f"grid {grid_wh} != {tile_feats.shape[0] - 1} tiles"
    tiles = tile_feats[1:].reshape(nph, npw, s, s, H)
    # (nph, npw, s, s, H) -> (nph, s, npw, s, H) -> raster [nph*s, npw*s, H]
    g = tiles.transpose(0, 2, 1, 3, 4).reshape(nph * s, npw * s, H)
    if "unpad" in mode:
        g = unpad_feature_grid(g, original_size)
        if image_newline is not None:
            col = np.broadcast_to(np.asarray(image_newline),
                                  (g.shape[0], 1, H))
            g = np.concatenate([g, col], axis=1)
    spatial = g.reshape(-1, H)
    return np.concatenate([base, spatial], 0)


def fuse_embeddings_multi(embed_table, ids, feats_list):
    """Multi-image fusion: splice each image's features at its placeholder
    (llava_arch.py:229-324, bs=1). Host-side numpy; variable output length.

    ids: [T] with one IMAGE_TOKEN_INDEX per image (k of them, in order);
    feats_list: k feature blocks [n_i, H]. Returns (fused [T', H] np array,
    exp_ids [T'] with 0 at image rows, img_row_mask [T'] bool).
    """
    import numpy as np
    ids = np.asarray(ids)
    spots = np.nonzero(ids == IMAGE_TOKEN_INDEX)[0]
    assert len(spots) == len(feats_list), \
        f"{len(spots)} image tokens vs {len(feats_list)} feature blocks"
    table = np.asarray(embed_table)
    chunks, id_chunks, mask_chunks = [], [], []
    prev = 0
    for pos, feats in zip(spots, feats_list):
        feats = np.asarray(feats)
        seg = ids[prev:pos]
        chunks += [table[np.maximum(seg, 0)], feats.astype(table.dtype)]
        id_chunks += [seg, np.zeros((len(feats),), ids.dtype)]
        mask_chunks += [np.zeros((len(seg),), bool),
                        np.ones((len(feats),), bool)]
        prev = pos + 1
    seg = ids[prev:]
    chunks.append(table[np.maximum(seg, 0)])
    id_chunks.append(seg)
    mask_chunks.append(np.zeros((len(seg),), bool))
    return (np.concatenate(chunks, 0), np.concatenate(id_chunks, 0),
            np.concatenate(mask_chunks, 0))


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
