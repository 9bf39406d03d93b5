"""Functional LLaMA decoder for TPU (target LM of LLaVA-1.5 and draft layers).

Design: pure functions over a parameter pytree (nested dicts), batch size 1
(the reference engine is strictly bs=1: EAGLE/eagle/model/ea_model.py:235-400),
one token axis. The KV cache is a preallocated seq-major [L, S, Hkv, D] pair
written with ``lax.dynamic_update_slice`` at a traced offset — the functional
analog of the reference's in-place ``KVCache.cat``
(EAGLE/eagle/model/kv_cache.py:52-66). Seq-major means new K/V rows are
written untransposed, which keeps XLA from relayouting the stacked projection
weights (3x1GB HLO-temp copies at 7B scale otherwise).

Attention masking is an explicit additive bias argument so the exact same
compiled attention serves prefill, AR decode and tree verification (the
reference instead injects ``tree_mask`` by side effect,
modeling_llama_kv.py:915-921).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from msd_tpu.configs import LlamaConfig
from msd_tpu.ops.attention import masked_attention
from msd_tpu.ops.norms import rms_norm
from msd_tpu.ops.rope import apply_rope, rope_table

Params = Dict


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_layer_params(key, cfg: LlamaConfig, dtype=jnp.float32) -> Params:
    h, inter = cfg.hidden_size, cfg.intermediate_size
    hkv = cfg.num_key_value_heads * cfg.head_dim
    ks = jax.random.split(key, 7)
    scale = h ** -0.5

    def mat(k, shape):
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    return {
        "input_layernorm": jnp.ones((h,), dtype),
        "post_attention_layernorm": jnp.ones((h,), dtype),
        # q/k/v stored [out, in] (HF orientation): XLA prefers the
        # contracting dim minormost for matmuls inside while loops; storing
        # [in, out] made it relayout 3x1GB HLO-temp copies at 7B scale.
        "q_proj": mat(ks[0], (h, h)),
        "k_proj": mat(ks[1], (hkv, h)),
        "v_proj": mat(ks[2], (hkv, h)),
        "o_proj": mat(ks[3], (h, h)),
        "gate_proj": mat(ks[4], (h, inter)),
        "up_proj": mat(ks[5], (h, inter)),
        "down_proj": mat(ks[6], (inter, h)),
    }


def init_llama_params(key, cfg: LlamaConfig, dtype=jnp.float32) -> Params:
    keys = jax.random.split(key, cfg.num_hidden_layers + 2)
    layers = [init_layer_params(keys[i], cfg, dtype)
              for i in range(cfg.num_hidden_layers)]
    emb_scale = cfg.hidden_size ** -0.5
    return {
        "embed_tokens": (jax.random.normal(
            keys[-2], (cfg.vocab_size, cfg.hidden_size), jnp.float32) * emb_scale
        ).astype(dtype),
        "layers": _stack_layers(layers),
        "norm": jnp.ones((cfg.hidden_size,), dtype),
        "lm_head": (jax.random.normal(
            keys[-1], (cfg.hidden_size, cfg.vocab_size), jnp.float32) * emb_scale
        ).astype(dtype),
    }


def _stack_layers(layers):
    """Stack per-layer dicts into arrays with a leading layer axis (for scan)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *layers)


def init_llama_params_stacked(key, cfg: LlamaConfig, dtype=jnp.bfloat16) -> Params:
    """Memory-lean random init: emit each stacked [L, in, out] weight directly
    in the target dtype (no per-layer stack copies) — used for 7B/13B-shaped
    benchmark models that must fit one chip's HBM."""
    h, inter, nl = cfg.hidden_size, cfg.intermediate_size, cfg.num_hidden_layers
    hkv = cfg.num_key_value_heads * cfg.head_dim
    names = [("input_layernorm", None), ("post_attention_layernorm", None),
             ("q_proj", (h, h)), ("k_proj", (hkv, h)), ("v_proj", (hkv, h)),
             ("o_proj", (h, h)), ("gate_proj", (h, inter)),
             ("up_proj", (h, inter)), ("down_proj", (inter, h))]
    keys = jax.random.split(key, len(names) + 2)
    scale = h ** -0.5
    layers = {}
    for (name, shape), k in zip(names, keys[:len(names)]):
        if shape is None:
            layers[name] = jnp.ones((nl, h), dtype)
        else:
            layers[name] = (jax.random.normal(k, (nl,) + shape, dtype) * scale)
    return {
        "embed_tokens": jax.random.normal(
            keys[-2], (cfg.vocab_size, h), dtype) * scale,
        "layers": layers,
        "norm": jnp.ones((h,), dtype),
        "lm_head": jax.random.normal(
            keys[-1], (h, cfg.vocab_size), dtype) * scale,
    }


# ---------------------------------------------------------------------------
# KV cache
# ---------------------------------------------------------------------------

def init_kv_cache(cfg: LlamaConfig, max_seq_len: int, dtype=jnp.float32,
                  num_layers: int | None = None) -> Params:
    nl = cfg.num_hidden_layers if num_layers is None else num_layers
    shape = (nl, max_seq_len, cfg.num_key_value_heads, cfg.head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _w(lp: Params, name: str) -> jnp.ndarray:
    """Weight access with optional int8/int4 weight-only dequant (ops.quant)."""
    if name + "_qs4" in lp:
        from msd_tpu.ops.quant import dequantize_int4
        return dequantize_int4(lp[name], lp[name + "_qs4"])
    if name + "_qs" in lp:
        from msd_tpu.ops.quant import dequantize
        return dequantize(lp[name], lp[name + "_qs"])
    return lp[name]


def _layer_qkv(lp: Params, cfg: LlamaConfig, x: jnp.ndarray,
               positions: jnp.ndarray, cos_t, sin_t, skip_input_norm: bool):
    """Pre-attention projections. Returns (h_normed_input, q, k, v)."""
    t = x.shape[0]
    hq, hkv, d = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim
    if skip_input_norm:
        # EAGLE skips input_layernorm on draft layer 0
        # (EAGLE/eagle/model/ea_llama_model.py, index==0).
        h = x
    else:
        h = rms_norm(x, lp["input_layernorm"], cfg.rms_norm_eps)
    # matmuls run in the param dtype even when the residual rides in fp32
    # (cfg.residual_dtype): bf16 MXU inputs, fp32 elementwise accumulation
    h = h.astype(lp["input_layernorm"].dtype)
    q = jnp.einsum("th,oh->to", h, _w(lp, "q_proj"))
    k = jnp.einsum("th,oh->to", h, _w(lp, "k_proj"))
    v = jnp.einsum("th,oh->to", h, _w(lp, "v_proj"))
    if "q_bias" in lp:  # Qwen2 attention carries qkv biases
        q = q + lp["q_bias"]
        k = k + lp["k_bias"]
        v = v + lp["v_bias"]
    q = q.reshape(t, hq, d)
    k = k.reshape(t, hkv, d)
    v = v.reshape(t, hkv, d)
    q, k = apply_rope(q, k, cos_t, sin_t, positions)
    return q, k, v


def _layer_post_attn(lp: Params, cfg: LlamaConfig, resid: jnp.ndarray,
                     attn: jnp.ndarray):
    t = attn.shape[0]
    x = resid + (attn.reshape(t, -1) @ _w(lp, "o_proj")).astype(resid.dtype)
    resid = x
    h = rms_norm(x, lp["post_attention_layernorm"], cfg.rms_norm_eps)
    h = h.astype(lp["post_attention_layernorm"].dtype)
    gate = jax.nn.silu((h @ _w(lp, "gate_proj")).astype(jnp.float32)
                       ).astype(h.dtype)
    up = h @ _w(lp, "up_proj")
    return resid + ((gate * up) @ _w(lp, "down_proj")).astype(resid.dtype)


def _attend(cfg: LlamaConfig, q, kv_k, kv_v, bias, kv_len, win=None):
    """Attention backend dispatch (cfg.attn_impl).

    "auto" selects per allocated cache length (static at trace time): the
    pallas kernel's win is dead-block DMA skipping, which only outweighs its
    grid overhead once the cache is long (>= cfg.pallas_min_s).

    win: optional (win_idx, win_bias, win_start) — routes to the
    window-canonical kernel (ops/attention.windowed_attention) used by tree
    verification for bitwise draft-invariant greedy trajectories; the pallas
    backend is bypassed for those rows (the canonical association structure
    IS the point)."""
    if win is not None:
        from msd_tpu.ops.attention import windowed_attention
        # compact=True: the engine keeps every window row inside the
        # [E-W+1, E+T) span (_commit compaction), so the compact two-stage
        # gather applies — bitwise identical, cheaper HBM traffic.
        return windowed_attention(q, kv_k, kv_v, bias, *win, compact=True)
    # "auto" is measurement-backed (tools/attn_microbench.py, v5e, r3 sweep
    # in artifacts/attn_sweep_r3.log): the kernel's VPU path wins every
    # tested cache length for <=4 grouped query rows (40 vs 52us at S=1152
    # ... 170 vs 282us at S=8192, live=0.6S); at larger T the XLA kernel
    # ties or wins, and tree-verify rows use windowed_attention anyway.
    from msd_tpu.ops.pallas.decode_attention import VPU_MAX_GT
    gt = q.shape[0] * (cfg.num_attention_heads // cfg.num_key_value_heads)
    want_pallas = cfg.attn_impl == "pallas" or (
        cfg.attn_impl == "auto" and gt <= VPU_MAX_GT
        and kv_k.shape[0] >= cfg.pallas_min_s
        and jax.default_backend() == "tpu")
    if want_pallas and kv_len is not None \
            and kv_k.shape[0] % 128 == 0 and cfg.head_dim == 128:
        from msd_tpu.ops.pallas.decode_attention import decode_attention
        return decode_attention(q, kv_k, kv_v, bias, kv_len)
    return masked_attention(q, kv_k, kv_v, bias)


def _layer_forward(lp: Params, cfg: LlamaConfig, x: jnp.ndarray,
                   positions: jnp.ndarray, kv_k: jnp.ndarray, kv_v: jnp.ndarray,
                   write_pos: jnp.ndarray, bias: jnp.ndarray,
                   cos_t: jnp.ndarray, sin_t: jnp.ndarray,
                   skip_input_norm: bool = False, kv_len=None):
    """One decoder layer. x: [T, H]; kv_k/kv_v: [S, Hkv, D]. Returns (x, k, v)."""
    resid = x
    q, k, v = _layer_qkv(lp, cfg, x, positions, cos_t, sin_t, skip_input_norm)

    # write new K/V rows into the preallocated cache at write_pos (no transpose)
    kv_k = jax.lax.dynamic_update_slice(kv_k, k, (write_pos, 0, 0))
    kv_v = jax.lax.dynamic_update_slice(kv_v, v, (write_pos, 0, 0))

    attn = _attend(cfg, q, kv_k, kv_v, bias, kv_len)
    return _layer_post_attn(lp, cfg, resid, attn), kv_k, kv_v


def llama_forward(params: Params, cfg: LlamaConfig, embeds: jnp.ndarray,
                  positions: jnp.ndarray, kv: Params, write_pos: jnp.ndarray,
                  bias: jnp.ndarray, cos_t: jnp.ndarray, sin_t: jnp.ndarray,
                  kv_len=None, win=None) -> Tuple[jnp.ndarray, Params]:
    """Run all decoder layers via lax.scan over the stacked layer params.

    embeds: [T, H] (already fused multimodal embeddings); positions: [T] int32;
    kv: {'k','v'} [L, S, Hkv, D]; bias: [T, S]. Returns (hidden [T, H], new kv).

    The KV cache rides the scan *carry* and is updated layer-by-layer with
    dynamic_update_slice, so XLA aliases the buffer across iterations instead
    of materializing a per-forward copy of the whole cache.
    """
    nl = params["layers"]["q_proj"].shape[0]
    out_dtype = embeds.dtype
    if cfg.residual_dtype is not None:
        embeds = embeds.astype(jnp.dtype(cfg.residual_dtype))

    def body(carry, scan_in):
        x, kv_k_all, kv_v_all = carry
        lp, li = scan_in
        resid = x
        q, k, v = _layer_qkv(lp, cfg, x, positions, cos_t, sin_t, False)
        # window-write the new tokens' K/V rows straight into the 4D cache
        kv_k_all = jax.lax.dynamic_update_slice(
            kv_k_all, k[None], (li, write_pos, 0, 0))
        kv_v_all = jax.lax.dynamic_update_slice(
            kv_v_all, v[None], (li, write_pos, 0, 0))
        kv_k = jax.lax.dynamic_index_in_dim(kv_k_all, li, 0, keepdims=False)
        kv_v = jax.lax.dynamic_index_in_dim(kv_v_all, li, 0, keepdims=False)
        attn = _attend(cfg, q, kv_k, kv_v, bias, kv_len, win)
        x = _layer_post_attn(lp, cfg, resid, attn)
        return (x, kv_k_all, kv_v_all), None

    (x, new_k, new_v), _ = jax.lax.scan(
        body, (embeds, kv["k"], kv["v"]),
        (params["layers"], jnp.arange(nl, dtype=jnp.int32)))
    # final norm in the residual dtype, interface dtype on the way out
    x = rms_norm(x, params["norm"], cfg.rms_norm_eps).astype(out_dtype)
    return x, {"k": new_k, "v": new_v}


def lm_head(params: Params, hidden: jnp.ndarray) -> jnp.ndarray:
    """[T, H] -> [T, V] logits in fp32."""
    return (hidden @ _w(params, "lm_head")).astype(jnp.float32)


def embed_tokens(params: Params, ids: jnp.ndarray) -> jnp.ndarray:
    return params["embed_tokens"][ids]


# int8 weight-only quantization: contraction axis per weight name.
# q/k/v stacks are [L, out, in] (in is contracted); the rest are [L, in, out]
# / [in, out] (in is contracted). Norms, biases, embeddings stay full precision
# (negligible bytes; the embedding is a gather, not a matmul).
_QUANT_AXES = {"q_proj": -1, "k_proj": -1, "v_proj": -1,
               "o_proj": -2, "gate_proj": -2, "up_proj": -2, "down_proj": -2}


def quantize_llama_params(params: Params, quant_lm_head: bool = True,
                          bits: int = 8) -> Params:
    """Weight-only int8/int4 transform of a (stacked) LLaMA param tree.

    The TPU-native counterpart of the reference's load-8bit/load-4bit
    serving paths (builder.py:26-167). Decode-step HBM traffic is dominated
    by these weight reads, so int8 storage roughly halves step time when
    bandwidth-bound and int4 quarters it. int4 scales live under ``_qs4``
    keys so the forward pass knows to unpack (ops/quant.pack_int4).
    """
    from msd_tpu.ops.quant import quantize_tensor

    sfx = "_qs" if bits == 8 else "_qs4"
    out = dict(params)
    layers = dict(params["layers"])
    for name, axis in _QUANT_AXES.items():
        layers[name], layers[name + sfx] = quantize_tensor(
            layers[name], axis, bits)
    out["layers"] = layers
    if quant_lm_head:
        out["lm_head"], out["lm_head" + sfx] = quantize_tensor(
            params["lm_head"], -2, bits)
    return out


def make_rope(cfg: LlamaConfig, max_seq_len: int):
    return rope_table(max_seq_len, cfg.head_dim, cfg.rope_theta)


# ---------------------------------------------------------------------------
# HF weight import (torch state_dict / safetensors -> our pytree)
# ---------------------------------------------------------------------------

_HF_LAYER_MAP = {
    "input_layernorm": ("input_layernorm.weight", False),
    "post_attention_layernorm": ("post_attention_layernorm.weight", False),
    "q_proj": ("self_attn.q_proj.weight", False),  # kept [out, in]
    "k_proj": ("self_attn.k_proj.weight", False),
    "v_proj": ("self_attn.v_proj.weight", False),
    "o_proj": ("self_attn.o_proj.weight", True),
    "gate_proj": ("mlp.gate_proj.weight", True),
    "up_proj": ("mlp.up_proj.weight", True),
    "down_proj": ("mlp.down_proj.weight", True),
}


def params_from_hf(state: Dict[str, "jnp.ndarray"], cfg: LlamaConfig,
                   prefix: str = "model.", dtype=jnp.float32) -> Params:
    """Build our pytree from a HF-LLaMA flat state dict of numpy arrays.

    HF Linear stores [out, in]; we keep [in, out] so activations hit the MXU as
    plain ``x @ W`` without runtime transposes.

    Per-weight strategy (7B load was 23 min the naive way, ~1 min this way):
    stack all L layers into one contiguous numpy array in the SOURCE dtype
    (pure memcpy slice-assigns), convert/upload with a single ``jnp.asarray``
    per weight, and do any [out, in] -> [in, out] transpose on device —
    avoiding hundreds of small strided host conversions and per-tensor
    device buffers.
    """
    import numpy as np

    def get(name):
        return np.asarray(state[name])

    L = cfg.num_hidden_layers
    stacked = {}
    for ours, (theirs, transpose) in _HF_LAYER_MAP.items():
        first = get(f"{prefix}layers.0.{theirs}")
        buf = np.empty((L,) + first.shape, first.dtype)
        buf[0] = first
        for i in range(1, L):
            buf[i] = get(f"{prefix}layers.{i}.{theirs}")
        j = jnp.asarray(buf, dtype)
        del buf
        stacked[ours] = jnp.swapaxes(j, 1, 2) if transpose else j

    head_key = "lm_head.weight"
    return {
        "embed_tokens": jnp.asarray(get(f"{prefix}embed_tokens.weight"), dtype),
        "layers": stacked,
        "norm": jnp.asarray(get(f"{prefix}norm.weight"), dtype),
        "lm_head": jnp.swapaxes(jnp.asarray(get(head_key), dtype), 0, 1),
    }
