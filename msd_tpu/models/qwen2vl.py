"""Qwen2-VL language model support: mrope + qkv-bias decoder + fusion.

Reference: EAGLE/eagle/model/modeling_qwen2vl_kv.py (tree-mask KV Qwen2-VL,
3D mrope ``apply_multimodal_rotary_pos_emb`` :172-208) and
ea_qwen2vl_model.py (draft decoder layer + Qwen2VLRotaryEmbedding);
utils.py:609-630 get_input_embeds_qwen2vl; image-token conventions
151652 <|vision_start|> / 151655 <|image_pad|> consumed in cnets.py:245-252.

TPU-native observation exploited here: mrope's three position streams are
EQUAL for every token outside the image span, where mrope reduces exactly to
1-D RoPE at that position. Only the prefill needs per-token 3D positions, so
the decode engine keeps scalar positions plus a carried ``pos_delta``
(= max(grid_h, grid_w) - n_img, the amount Qwen positions lag the cache
index after an image).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import numpy as np

import jax.numpy as jnp

from msd_tpu.configs import LlamaConfig

VISION_START_ID = 151652
VISION_END_ID = 151653
IMAGE_PAD_ID = 151655
VIDEO_PAD_ID = 151656


@dataclass(frozen=True)
class Qwen2VLTextConfig:
    """Qwen2-VL-7B-Instruct LM shapes; reuses the llama machinery with
    qkv-bias and GQA."""

    vocab_size: int = 152064
    hidden_size: int = 3584
    intermediate_size: int = 18944
    num_hidden_layers: int = 28
    num_attention_heads: int = 28
    num_key_value_heads: int = 4
    max_position_embeddings: int = 32768
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1e6
    mrope_section: Tuple[int, int, int] = (16, 24, 24)

    def as_llama(self) -> LlamaConfig:
        return LlamaConfig(
            vocab_size=self.vocab_size, hidden_size=self.hidden_size,
            intermediate_size=self.intermediate_size,
            num_hidden_layers=self.num_hidden_layers,
            num_attention_heads=self.num_attention_heads,
            num_key_value_heads=self.num_key_value_heads,
            max_position_embeddings=self.max_position_embeddings,
            rms_norm_eps=self.rms_norm_eps, rope_theta=self.rope_theta)

    @staticmethod
    def tiny(vocab=512, hidden=64, layers=2, heads=4, kv_heads=2,
             inter=128) -> "Qwen2VLTextConfig":
        # mrope sections must sum to head_dim // 2
        d2 = (hidden // heads) // 2
        s = d2 // 4
        return Qwen2VLTextConfig(
            vocab_size=vocab, hidden_size=hidden, intermediate_size=inter,
            num_hidden_layers=layers, num_attention_heads=heads,
            num_key_value_heads=kv_heads, max_position_embeddings=2048,
            mrope_section=(d2 - 2 * s, s, s))


def init_qwen2_params(key, cfg: Qwen2VLTextConfig, dtype=jnp.float32) -> Dict:
    """llama-layout params + qkv biases."""
    from msd_tpu.models import llama as L

    lc = cfg.as_llama()
    p = L.init_llama_params(key, lc, dtype)
    nl, h = lc.num_hidden_layers, lc.hidden_size
    hkv = lc.num_key_value_heads * lc.head_dim
    p["layers"]["q_bias"] = jnp.zeros((nl, h), dtype)
    p["layers"]["k_bias"] = jnp.zeros((nl, hkv), dtype)
    p["layers"]["v_bias"] = jnp.zeros((nl, hkv), dtype)
    return p


def params_from_hf_qwen2(state: Dict, cfg: Qwen2VLTextConfig,
                         prefix: str = "model.", dtype=jnp.float32) -> Dict:
    from msd_tpu.models import llama as L

    lc = cfg.as_llama()
    p = L.params_from_hf(state, lc, prefix=prefix, dtype=dtype)

    def get(name):
        return np.asarray(state[name])

    biases = {"q_bias": [], "k_bias": [], "v_bias": []}
    for i in range(lc.num_hidden_layers):
        for ours, theirs in (("q_bias", "q_proj"), ("k_bias", "k_proj"),
                             ("v_bias", "v_proj")):
            biases[ours].append(jnp.asarray(
                get(f"{prefix}layers.{i}.self_attn.{theirs}.bias"), dtype))
    for k, v in biases.items():
        p["layers"][k] = jnp.stack(v, 0)
    return p


# ---------------------------------------------------------------------------
# mrope
# ---------------------------------------------------------------------------

def mrope_positions(prompt_len: int, img_start: int, n_img: int,
                    grid_h: int, grid_w: int, grid_t: int = 1
                    ) -> Tuple[np.ndarray, int]:
    """3D position ids [3, prompt_len] for a single image/video Qwen2-VL
    prompt (HF get_rope_index, modeling_qwen2vl_kv.py:1480-1600), plus the
    post-vision position delta.

    img_start: index of the first <|image_pad|>/<|video_pad|> token;
    n_img = grid_t * grid_h * grid_w (LLM-space merged grids); grid_t > 1 for
    videos (temporal position advances once per temporal block, the
    documented [0,0,0,0, 1,1,1,1, 2,2,2,2] pattern).
    """
    pos = np.zeros((3, prompt_len), np.int64)
    for i in range(min(img_start, prompt_len)):
        pos[:, i] = i
    st = img_start
    hw = grid_h * grid_w
    for k in range(n_img):
        i = img_start + k
        if i >= prompt_len:
            break
        t, rem = divmod(k, hw)
        r, c = rem // grid_w, rem % grid_w
        pos[0, i] = st + t
        pos[1, i] = st + r
        pos[2, i] = st + c
    nxt = st + max(grid_t, grid_h, grid_w)
    for j, i in enumerate(range(img_start + n_img, prompt_len)):
        pos[:, i] = nxt + j
    delta = nxt - (img_start + n_img)
    return pos, int(delta)


def mrope_gather(cos_t: jnp.ndarray, sin_t: jnp.ndarray,
                 pos3: jnp.ndarray, sections: Tuple[int, int, int]
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-token cos/sin [T, D] from 3D positions.

    cos_t/sin_t: [max_pos, D] standard tables (HF half-duplicated layout);
    frequency column d (and d + D/2) takes its position from the mrope
    section owning d (modeling_qwen2vl_kv.py:172-208).
    """
    D = cos_t.shape[1]
    half = D // 2
    sel_half = np.concatenate([
        np.full(sections[0], 0), np.full(sections[1], 1),
        np.full(sections[2], 2)])
    assert len(sel_half) == half, "mrope sections must sum to head_dim//2"
    sel = jnp.asarray(np.concatenate([sel_half, sel_half]), jnp.int32)  # [D]
    # p[t, d] = pos3[sel[d], t]
    p = pos3[sel, :].T                                   # [T, D]
    cols = jnp.arange(D)[None, :]
    return cos_t[p, cols], sin_t[p, cols]


def fuse_qwen_embeddings(embed_table: jnp.ndarray, ids: jnp.ndarray,
                         img_feats: jnp.ndarray, img_start: jnp.ndarray,
                         n_img: int) -> jnp.ndarray:
    """Replace the <|image_pad|> span with projected vision features.

    Qwen2-VL prompts are already expanded (no -200 placeholder); this is
    get_input_embeds_qwen2vl (utils.py:609-630) as a masked select.
    """
    P = ids.shape[0]
    emb = embed_table[jnp.maximum(ids, 0)]
    j = jnp.arange(P)
    in_img = (j >= img_start) & (j < img_start + n_img)
    idx = jnp.clip(j - img_start, 0, n_img - 1)
    return jnp.where(in_img[:, None], img_feats[idx].astype(emb.dtype), emb)
