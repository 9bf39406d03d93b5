"""EAGLE-style MSD draft head: embed + fc([emb, hidden]) + one decoder layer.

Reference: EAGLE/eagle/model/cnets.py:94-133 (Model), ea_llama_model.py
(LlamaDecoderLayer with input_layernorm skipped at index 0), and the
multimodal splice semantics of cnets.py:236-327:

The draft input at expanded position j pairs the embedding of the *next*
token (shift-by-one) with the target hidden state at j; rows inside the image
span bypass fc and carry the (shifted) fused image embedding directly. In this
build that is expressed as masked selects over fixed shapes instead of the
reference's per-sample Python splicing.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from msd_tpu.configs import DraftConfig
from msd_tpu.models import llama as L
from msd_tpu.ops.attention import attention_probs, masked_attention
from msd_tpu.ops.rope import apply_rope

Params = Dict


def init_draft_params(key, cfg: DraftConfig, dtype=jnp.float32) -> Params:
    tc = cfg.text
    keys = jax.random.split(key, cfg.num_layers + 2)
    layers = [L.init_layer_params(keys[i], tc, dtype) for i in range(cfg.num_layers)]
    h = tc.hidden_size
    fc_scale = (2 * h) ** -0.5
    p = {
        "embed_tokens": (jax.random.normal(keys[-2], (tc.vocab_size, h),
                                           jnp.float32) * h ** -0.5).astype(dtype),
        "fc_w": (jax.random.normal(keys[-1], (2 * h, h), jnp.float32)
                 * fc_scale).astype(dtype),
        "layers": L._stack_layers(layers),
    }
    if cfg.fc_bias:
        p["fc_b"] = jnp.zeros((h,), dtype)
    return p


def init_medusa_params(key, cfg: DraftConfig, dtype=jnp.float32) -> Params:
    """Per-depth residual-block heads (Medusa-style, public technique:
    SiLU resblock + shared lm_head). K = cfg.medusa_heads; head k predicts
    the token k+2 steps ahead of the current position."""
    h = cfg.text.hidden_size
    k = cfg.medusa_heads
    return {
        "mw": (jax.random.normal(key, (k, h, h), jnp.float32)
               * (h ** -0.5) * 0.1).astype(dtype),
        "mb": jnp.zeros((k, h), dtype),
    }


def medusa_hiddens(mp: Params, x: jnp.ndarray) -> jnp.ndarray:
    """x: [..., H] depth-1 draft hidden -> [K, ..., H] per-depth hiddens.

    h_k = x + silu(x @ mw[k] + mb[k]); head(h_k) is the depth-(k+2)
    distribution. All K blocks read the SAME x (no recursion)."""
    mw = L._w(mp, "mw")
    y = jnp.einsum("...h,khg->k...g", x.astype(mw.dtype), mw) + \
        mp["mb"].reshape((mp["mb"].shape[0],) + (1,) * (x.ndim - 1)
                         + (mp["mb"].shape[-1],))
    return x[None] + jax.nn.silu(y.astype(jnp.float32)).astype(x.dtype)


def draft_fuse(params: Params, emb_next: jnp.ndarray, target_hidden: jnp.ndarray,
               image_row_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """fc([emb_next, target_hidden]) with image rows passing emb_next through.

    emb_next: [T, H] embedding of token t_{j+1} (or fused image feature);
    target_hidden: [T, H]; image_row_mask: [T] bool (True = image span row).
    """
    x = jnp.concatenate([emb_next, target_hidden.astype(emb_next.dtype)], axis=-1)
    fc_w = L._w(params, "fc_w")
    fused = x.astype(fc_w.dtype) @ fc_w
    if "fc_b" in params:
        fused = fused + params["fc_b"]
    if image_row_mask is not None:
        fused = jnp.where(image_row_mask[:, None], emb_next, fused)
    return fused


def quantize_draft_params(params: Params, bits: int = 8) -> Params:
    """Weight-only int8/int4 transform of the DRAFT param tree (decoder
    layers + fc fuse + medusa resblocks).

    Unlike target quantization, this is LOSSLESS for committed outputs:
    the draft only proposes candidates and the (bf16) target verifier
    decides acceptance, so quantization can shift which tokens get
    proposed (alpha) but never the greedy trajectory. It trims the
    draft-side HBM reads (~0.45GB/step at 7B with 13 medusa heads:
    0.4GB layer + 67MB fc + 0.44GB medusa halved) from the decode step.

    embed_tokens stays full precision (it is a gather, and is usually the
    target's own embedding shared by reference); biases/norms too.
    """
    from msd_tpu.ops.quant import quantize_tensor

    sfx = "_qs" if bits == 8 else "_qs4"
    out = dict(params)
    layers = dict(params["layers"])
    for name, ax in L._QUANT_AXES.items():
        if name in layers:
            wq, sc = quantize_tensor(layers[name], ax, bits)
            layers[name] = wq
            layers[name + sfx] = sc
    out["layers"] = layers
    if "fc_w" in out:
        wq, sc = quantize_tensor(out["fc_w"], -2, bits)   # [2H, H], in first
        out["fc_w"], out["fc_w" + sfx] = wq, sc
    if "medusa" in out and "mw" in out["medusa"]:
        med = dict(out["medusa"])
        wq, sc = quantize_tensor(med["mw"], -2, bits)     # [K, h, g], h in
        med["mw"], med["mw" + sfx] = wq, sc
        out["medusa"] = med
    return out


def draft_forward(params: Params, cfg: DraftConfig, hidden_in: jnp.ndarray,
                  positions: jnp.ndarray, kv: Params, write_pos: jnp.ndarray,
                  bias: jnp.ndarray, cos_t: jnp.ndarray, sin_t: jnp.ndarray,
                  return_attn: bool = False):
    """Run the draft decoder layer(s) over pre-fused hidden states.

    hidden_in: [T, H] (already through draft_fuse); kv: {'k','v'}
    [num_layers, S, Hkv, D]. Layer 0 skips input_layernorm (EAGLE convention).
    Returns (hidden [T, H], new_kv[, attn_probs]) — attn_probs [Hq, T, S] from
    layer 0, used for visual-attention calibration features.
    """
    tc = cfg.text
    x = hidden_in
    new_k, new_v = [], []
    attn_p = None
    for i in range(cfg.num_layers):
        lp = jax.tree.map(lambda a: a[i], params["layers"])
        if return_attn and i == 0:
            attn_p = _layer_attn_probs(lp, tc, x, positions, kv["k"][i],
                                       write_pos, bias, cos_t, sin_t)
        x, k, v = L._layer_forward(lp, tc, x, positions, kv["k"][i], kv["v"][i],
                                   write_pos, bias, cos_t, sin_t,
                                   skip_input_norm=(i == 0))
        new_k.append(k)
        new_v.append(v)
    out_kv = {"k": jnp.stack(new_k, 0), "v": jnp.stack(new_v, 0)}
    if return_attn:
        return x, out_kv, attn_p
    return x, out_kv


def _layer_attn_probs(lp, tc, x, positions, kv_k, write_pos, bias, cos_t, sin_t):
    """Recompute layer-0 attention probabilities (cheap: one layer, small T)."""
    t = x.shape[0]
    hq, hkv, d = tc.num_attention_heads, tc.num_key_value_heads, tc.head_dim
    h = x  # layer 0 skips input_layernorm
    q = (h @ lp["q_proj"]).reshape(t, hq, d)
    k = (h @ lp["k_proj"]).reshape(t, hkv, d)
    q, k = apply_rope(q, k, cos_t, sin_t, positions)
    kv_k = jax.lax.dynamic_update_slice(kv_k, k, (write_pos, 0, 0))
    return attention_probs(q, kv_k, bias)


def draft_forward_nocache(params: Params, cfg: DraftConfig,
                          hidden_in: jnp.ndarray, positions: jnp.ndarray,
                          bias: jnp.ndarray, cos_t: jnp.ndarray,
                          sin_t: jnp.ndarray) -> jnp.ndarray:
    """Training-mode forward: full-sequence causal attention, no KV cache.

    hidden_in: [T, H] (already through draft_fuse); bias: [T, T] additive.
    """
    tc = cfg.text
    x = hidden_in
    for i in range(cfg.num_layers):
        lp = jax.tree.map(lambda a: a[i], params["layers"])
        resid = x
        q, k, v = L._layer_qkv(lp, tc, x, positions, cos_t, sin_t, i == 0)
        attn = masked_attention(q, k, v, bias)
        x = L._layer_post_attn(lp, tc, resid, attn)
    return x


def init_draft_kv(cfg: DraftConfig, max_len: int, dtype=jnp.float32) -> Params:
    return L.init_kv_cache(cfg.text, max_len, dtype, num_layers=cfg.num_layers)


def params_from_torch_draft(state: Dict, cfg: DraftConfig,
                            dtype=jnp.float32) -> Params:
    """Import reference draft checkpoint (cnets.Model state_dict layout)."""
    import numpy as np

    def get(name):
        return np.asarray(state[name])

    layers = []
    for i in range(cfg.num_layers):
        pre = f"layers.{i}."
        lp = {}
        for ours, (theirs, transpose) in L._HF_LAYER_MAP.items():
            key = pre + theirs
            if ours == "input_layernorm" and key not in state:
                # layer 0 has no input_layernorm in the EAGLE checkpoint
                lp[ours] = jnp.ones((cfg.text.hidden_size,), dtype)
                continue
            w = get(key)
            lp[ours] = jnp.asarray(w.T if transpose else w, dtype)
        layers.append(lp)

    p = {
        "embed_tokens": jnp.asarray(get("embed_tokens.weight"), dtype),
        "fc_w": jnp.asarray(get("fc.weight").T, dtype),
        "layers": L._stack_layers(layers),
    }
    if "fc.bias" in state:
        p["fc_b"] = jnp.asarray(get("fc.bias"), dtype)
    return p
