"""Checkpoint loading: HF LLaVA-1.5 + MSD draft heads -> our param pytrees.

Reference loader: LLaVA/llava/model/builder.py:26-167 (load_pretrained_model)
and EAGLE/eagle/model/ea_model.py:116-142 (draft weights from
pytorch_model.bin or model.safetensors). This loader reads safetensors/torch
checkpoints lazily and converts straight into device arrays in the requested
dtype (bf16 on TPU).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, Optional, Tuple

import numpy as np

import jax.numpy as jnp

from msd_tpu.configs import (ClipVisionConfig, DraftConfig, LlamaConfig,
                             LlavaConfig)


def _load_state(path: str) -> Dict[str, np.ndarray]:
    """Load all tensors from a checkpoint dir (safetensors preferred)."""
    state: Dict[str, np.ndarray] = {}
    st_files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if st_files:
        from safetensors.numpy import load_file
        for f in st_files:
            state.update(load_file(f))
        return state
    bins = sorted(glob.glob(os.path.join(path, "pytorch_model*.bin")))
    if bins:
        import torch
        for f in bins:
            sd = torch.load(f, map_location="cpu", weights_only=True)
            state.update({k: v.float().numpy() for k, v in sd.items()})
        return state
    raise FileNotFoundError(f"no safetensors/bin checkpoints under {path}")


def llama_config_from_json(path: str) -> LlamaConfig:
    with open(os.path.join(path, "config.json")) as f:
        cfg = json.load(f)
    return LlamaConfig(
        vocab_size=cfg["vocab_size"],
        hidden_size=cfg["hidden_size"],
        intermediate_size=cfg["intermediate_size"],
        num_hidden_layers=cfg["num_hidden_layers"],
        num_attention_heads=cfg["num_attention_heads"],
        num_key_value_heads=cfg.get("num_key_value_heads",
                                    cfg["num_attention_heads"]),
        max_position_embeddings=cfg.get("max_position_embeddings", 4096),
        rms_norm_eps=cfg.get("rms_norm_eps", 1e-5),
        rope_theta=cfg.get("rope_theta", 10000.0),
    )


def merge_lora_state(state: Dict[str, np.ndarray], lora_path: str,
                     log=None) -> Dict[str, np.ndarray]:
    """Merge a PEFT LoRA adapter dir into a flat base state dict.

    Reference flow: builder.load_pretrained_model merges LoRA + applies
    non_lora_trainables when model_base is given (builder.py:50-90). Here the
    merge is W += (alpha/r) * B @ A per adapted linear; non-LoRA trainables
    (projector etc.) in the adapter dir override the base entries.
    """
    with open(os.path.join(lora_path, "adapter_config.json")) as f:
        acfg = json.load(f)
    scaling = acfg.get("lora_alpha", 16) / acfg.get("r", 16)
    astate = _load_state(lora_path)

    def canon(k: str) -> str:
        for pre in ("base_model.model.", "base_model."):
            if k.startswith(pre):
                return k[len(pre):]
        return k

    state = dict(state)
    n_merged = 0
    for k, a in astate.items():
        if ".lora_A." not in k:
            continue
        bkey = k.replace(".lora_A.", ".lora_B.")
        target = canon(k).split(".lora_A.")[0] + ".weight"
        if target not in state:
            if log:
                log(f"merge_lora: no base weight for {target}; skipping")
            continue
        b = astate[bkey]
        state[target] = (np.asarray(state[target], np.float32)
                         + scaling * (np.asarray(b, np.float32)
                                      @ np.asarray(a, np.float32)))
        n_merged += 1
    # non-LoRA trainables (mm_projector etc.) saved alongside the adapter
    for k, v in astate.items():
        if ".lora_A." in k or ".lora_B." in k:
            continue
        state[canon(k)] = np.asarray(v)
    if log:
        log(f"merge_lora: merged {n_merged} adapted linears "
            f"(scaling={scaling})")
    return state


def clip_config_from_state(vis_state: Dict[str, np.ndarray],
                           heads: Optional[int] = None) -> ClipVisionConfig:
    """Infer the CLIP tower config from weight shapes (prefix-stripped state
    with ``vision_model.*`` keys). Head count is not recoverable from shapes;
    defaults to hidden//64 (CLIP's fixed 64-dim heads)."""
    pe = vis_state["vision_model.embeddings.patch_embedding.weight"]
    hidden, _, patch, _ = pe.shape
    npos = vis_state["vision_model.embeddings.position_embedding.weight"].shape[0]
    grid = int(round((npos - 1) ** 0.5))
    n_layers = 1 + max(
        int(k.split(".")[3]) for k in vis_state
        if k.startswith("vision_model.encoder.layers."))
    inter = vis_state["vision_model.encoder.layers.0.mlp.fc1.weight"].shape[0]
    return ClipVisionConfig(
        hidden_size=int(hidden), intermediate_size=int(inter),
        num_hidden_layers=n_layers,
        num_attention_heads=heads or max(1, hidden // 64),
        image_size=grid * patch, patch_size=int(patch))


def load_llava(path: str, dtype=jnp.bfloat16
               ) -> Tuple[Dict, LlavaConfig]:
    """Load a local LLaVA-1.5 checkpoint dir -> {target, vision, projector}.

    Expects the standard llava-hf or liuhaotian layout: LM weights under
    ``model.*``, projector under ``model.mm_projector.*``, CLIP tower under
    ``model.vision_tower.vision_tower.vision_model.*`` (or a separate
    vision checkpoint configured via mm_vision_tower).
    """
    from msd_tpu.models.clip_vit import params_from_hf_clip
    from msd_tpu.models.llama import params_from_hf
    from msd_tpu.models.llava import params_from_hf_projector

    if os.path.exists(os.path.join(path, "adapter_config.json")):
        # LoRA checkpoint dir: resolve the base model and merge
        # (builder.py:50-90 model_base flow)
        with open(os.path.join(path, "adapter_config.json")) as f:
            base = json.load(f).get("base_model_name_or_path", "")
        if not os.path.isdir(base):
            raise FileNotFoundError(
                f"LoRA adapter at {path} needs a local base model dir; "
                f"base_model_name_or_path={base!r} not found")
        state = merge_lora_state(_load_state(base), path)
        tcfg = llama_config_from_json(base)
    else:
        state = _load_state(path)
        tcfg = llama_config_from_json(path)

    target = params_from_hf(state, tcfg, prefix="model.", dtype=dtype)
    projector = params_from_hf_projector(state, dtype=dtype)

    tower_prefix = "model.vision_tower.vision_tower.vision_model."
    if any(k.startswith(tower_prefix) for k in state):
        vis_state = {k[len("model.vision_tower.vision_tower."):]: v
                     for k, v in state.items() if k.startswith(tower_prefix)}
    else:
        # separate CLIP checkpoint (openai/clip-vit-large-patch14-336 layout)
        with open(os.path.join(path, "config.json")) as f:
            tower_path = json.load(f).get("mm_vision_tower")
        if tower_path and os.path.isdir(tower_path):
            vis_state = _load_state(tower_path)
        else:
            raise FileNotFoundError(
                "vision tower weights not found in checkpoint; set "
                "mm_vision_tower in config.json to a local CLIP dir")
    vcfg = clip_config_from_state(vis_state)
    lcfg = LlavaConfig(text=tcfg, vision=vcfg)
    vision = params_from_hf_clip(vis_state, vcfg, dtype=dtype)

    return {"target": target, "vision": vision, "projector": projector}, lcfg


def load_draft(path: str, tcfg: LlamaConfig,
               base_embed: Optional[jnp.ndarray] = None,
               dtype=jnp.bfloat16) -> Tuple[Dict, DraftConfig]:
    """Load an MSD/EAGLE draft checkpoint (lucylyn/MSD-LLaVA1.5-*B layout)."""
    from msd_tpu.models.draft import params_from_torch_draft

    state = dict(_load_state(path))
    # medusa heads (this framework's own extension): stacked [K, H, H]/[K, H]
    # under "medusa.mw"/"medusa.mb" (or per-head "medusa.{k}.w"/".b")
    med = None
    if "medusa.mw" in state:
        med = {"mw": jnp.asarray(np.asarray(state.pop("medusa.mw")), dtype),
               "mb": jnp.asarray(np.asarray(state.pop("medusa.mb")), dtype)}
    elif any(k.startswith("medusa.0.") for k in state):
        ws, bs = [], []
        k = 0
        while f"medusa.{k}.w" in state:
            ws.append(np.asarray(state.pop(f"medusa.{k}.w")))
            bs.append(np.asarray(state.pop(f"medusa.{k}.b")))
            k += 1
        med = {"mw": jnp.asarray(np.stack(ws), dtype),
               "mb": jnp.asarray(np.stack(bs), dtype)}
    dcfg = DraftConfig(text=tcfg,
                       medusa_heads=(med["mw"].shape[0] if med else 0))
    if "embed_tokens.weight" not in state:
        # draft checkpoints trained with load_emb=True freeze the base
        # embedding and may not serialize it (main_deepspeed.py:145-163)
        if base_embed is None:
            raise ValueError("draft checkpoint lacks embed_tokens; pass "
                             "base_embed from the target model")
        state["embed_tokens.weight"] = np.asarray(base_embed)
    params = params_from_torch_draft(state, dcfg, dtype=dtype)
    if med is not None:
        params["medusa"] = med
    return params, dcfg


def save_draft(params: Dict, path: str,
               include_embed: bool = False) -> str:
    """Export a draft param pytree (incl. medusa heads) to the torch-layout
    safetensors file that ``load_draft`` reads — the deployable artifact of
    ``DraftTrainer`` runs (the reference ships cnets state_dicts the same
    way; medusa.mw/.mb is this framework's extension)."""
    from safetensors.numpy import save_file

    from msd_tpu.models.llama import _HF_LAYER_MAP

    os.makedirs(path, exist_ok=True)
    st = {}
    layers = params["layers"]
    n_layers = np.asarray(layers["q_proj"]).shape[0]
    for i in range(n_layers):
        for ours, (theirs, transpose) in _HF_LAYER_MAP.items():
            if ours == "input_layernorm" and i == 0:
                continue  # EAGLE layer 0 has no input_layernorm
            w = np.asarray(layers[ours][i], np.float32)
            st[f"layers.{i}.{theirs}"] = np.ascontiguousarray(
                w.T if transpose else w)
    st["fc.weight"] = np.ascontiguousarray(
        np.asarray(params["fc_w"], np.float32).T)
    if "fc_b" in params:
        st["fc.bias"] = np.asarray(params["fc_b"], np.float32)
    if include_embed and "embed_tokens" in params:
        st["embed_tokens.weight"] = np.asarray(params["embed_tokens"],
                                               np.float32)
    if "medusa" in params:
        st["medusa.mw"] = np.asarray(params["medusa"]["mw"], np.float32)
        st["medusa.mb"] = np.asarray(params["medusa"]["mb"], np.float32)
    out = os.path.join(path, "model.safetensors")
    save_file(st, out)
    return out


def load_qwen2_vl(path: str, dtype=jnp.bfloat16):
    """Load a local Qwen2-VL checkpoint dir -> (lm_params, vision_params,
    text_cfg, vision_cfg)."""
    from msd_tpu.models.qwen2vl import (Qwen2VLTextConfig,
                                        params_from_hf_qwen2)
    from msd_tpu.models.qwen2vl_vision import (Qwen2VisionConfig,
                                               params_from_hf_qwen_vision)

    state = _load_state(path)
    with open(os.path.join(path, "config.json")) as f:
        cfg = json.load(f)
    tcfg = Qwen2VLTextConfig(
        vocab_size=cfg["vocab_size"], hidden_size=cfg["hidden_size"],
        intermediate_size=cfg["intermediate_size"],
        num_hidden_layers=cfg["num_hidden_layers"],
        num_attention_heads=cfg["num_attention_heads"],
        num_key_value_heads=cfg.get("num_key_value_heads",
                                    cfg["num_attention_heads"]),
        max_position_embeddings=cfg.get("max_position_embeddings", 32768),
        rms_norm_eps=cfg.get("rms_norm_eps", 1e-6),
        rope_theta=cfg.get("rope_theta", 1e6),
        mrope_section=tuple(cfg.get("rope_scaling", {}).get(
            "mrope_section", (16, 24, 24))))
    vc = cfg.get("vision_config", {})
    vcfg = Qwen2VisionConfig(
        embed_dim=vc.get("embed_dim", 1280), depth=vc.get("depth", 32),
        num_heads=vc.get("num_heads", 16),
        mlp_ratio=vc.get("mlp_ratio", 4.0),
        patch_size=vc.get("patch_size", 14),
        temporal_patch_size=vc.get("temporal_patch_size", 2),
        spatial_merge_size=vc.get("spatial_merge_size", 2),
        hidden_size=cfg["hidden_size"])
    lm = params_from_hf_qwen2(state, tcfg, prefix="model.", dtype=dtype)
    vision = params_from_hf_qwen_vision(state, vcfg, prefix="visual.",
                                        dtype=dtype)
    return lm, vision, tcfg, vcfg


def load_qwen_vl_v1(path: str, dtype=jnp.bfloat16):
    """Load a local Qwen-VL (v1) checkpoint dir -> (lm_params, vision_params,
    text_cfg, vision_cfg). Names follow the public Qwen/Qwen-VL remote-code
    layout (transformer.h.* fused c_attn; transformer.visual.* ViT+Resampler)."""
    from msd_tpu.models.qwen_vl_v1 import (QwenVLVisionConfig,
                                           QwenVLV1TextConfig,
                                           params_from_hf_qwen_v1,
                                           params_from_hf_qwen_vl_vision)

    state = _load_state(path)
    with open(os.path.join(path, "config.json")) as f:
        cfg = json.load(f)
    tcfg = QwenVLV1TextConfig(
        vocab_size=cfg["vocab_size"], hidden_size=cfg["hidden_size"],
        intermediate_size=cfg["intermediate_size"] // 2,  # w1/w2 halves
        num_hidden_layers=cfg["num_hidden_layers"],
        num_attention_heads=cfg["num_attention_heads"],
        max_position_embeddings=cfg.get("max_position_embeddings", 8192),
        rms_norm_eps=cfg.get("layer_norm_epsilon", 1e-6),
        rope_theta=cfg.get("rotary_emb_base", 10000.0))
    vc = cfg.get("visual", {})
    vcfg = QwenVLVisionConfig(
        image_size=vc.get("image_size", 448),
        patch_size=vc.get("patch_size", 14),
        width=vc.get("width", 1664), layers=vc.get("layers", 48),
        heads=vc.get("heads", 16), mlp_size=vc.get("mlp_size", 8192),
        output_dim=vc.get("output_dim", cfg["hidden_size"]),
        n_queries=vc.get("n_queries", 256))
    lm = params_from_hf_qwen_v1(state, tcfg, dtype=dtype)
    vision = params_from_hf_qwen_vl_vision(state, vcfg, dtype=dtype)
    return lm, vision, tcfg, vcfg
