"""Helpers that build tiny HF torch models as golden references for tests."""

from __future__ import annotations

import numpy as np

from msd_tpu.configs import ClipVisionConfig, LlamaConfig


def tiny_hf_llama(cfg: LlamaConfig, seed: int = 0):
    import torch
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM

    torch.manual_seed(seed)
    hf_cfg = HFLlamaConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        num_key_value_heads=cfg.num_key_value_heads,
        max_position_embeddings=cfg.max_position_embeddings,
        rms_norm_eps=cfg.rms_norm_eps,
        rope_theta=cfg.rope_theta,
        attention_bias=False,
        tie_word_embeddings=False,
        use_cache=True,
    )
    model = LlamaForCausalLM(hf_cfg).eval()
    return model


def hf_state_numpy(model):
    return {k: v.detach().cpu().float().numpy() for k, v in model.state_dict().items()}


def tiny_hf_clip(cfg: ClipVisionConfig, seed: int = 0):
    import torch
    from transformers import CLIPVisionConfig as HFCLIPVisionConfig
    from transformers import CLIPVisionModel

    torch.manual_seed(seed)
    hf_cfg = HFCLIPVisionConfig(
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_hidden_layers,
        num_attention_heads=cfg.num_attention_heads,
        image_size=cfg.image_size,
        patch_size=cfg.patch_size,
        layer_norm_eps=cfg.layer_norm_eps,
        hidden_act="quick_gelu",
    )
    return CLIPVisionModel(hf_cfg).eval()


def rand_ids(vocab: int, n: int, seed: int = 0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, vocab, size=(n,), dtype=np.int32)
