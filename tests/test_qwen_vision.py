"""Qwen2-VL vision tower golden tests vs HF transformers."""

import numpy as np
import pytest

import jax.numpy as jnp

from msd_tpu.models.qwen2vl_vision import (Qwen2VisionConfig,
                                           params_from_hf_qwen_vision,
                                           qwen_vision_encode,
                                           vision_rotary,
                                           window_major_patches)


def _hf_vision(cfg: Qwen2VisionConfig, seed=0):
    import torch
    from transformers.models.qwen2_vl.configuration_qwen2_vl import \
        Qwen2VLVisionConfig
    from transformers.models.qwen2_vl.modeling_qwen2_vl import \
        Qwen2VisionTransformerPretrainedModel

    torch.manual_seed(seed)
    hf_cfg = Qwen2VLVisionConfig(
        embed_dim=cfg.embed_dim, depth=cfg.depth, num_heads=cfg.num_heads,
        mlp_ratio=cfg.mlp_ratio, in_channels=cfg.in_channels,
        hidden_size=cfg.hidden_size, patch_size=cfg.patch_size,
        spatial_merge_size=cfg.spatial_merge_size,
        temporal_patch_size=cfg.temporal_patch_size)
    hf_cfg._attn_implementation = "eager"
    return Qwen2VisionTransformerPretrainedModel(hf_cfg).eval()


def test_vision_matches_hf():
    import torch
    cfg = Qwen2VisionConfig.tiny(embed=32, depth=2, heads=4, hidden=48)
    hf = _hf_vision(cfg)
    state = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    params = params_from_hf_qwen_vision(state, cfg, prefix="")

    rng = np.random.default_rng(0)
    H = W = 4 * cfg.patch_size  # grid 4x4 -> 16 patches -> 4 merged tokens
    pixels = rng.normal(size=(3, H, W)).astype(np.float32)

    patches = np.asarray(window_major_patches(jnp.asarray(pixels), cfg))
    grid_thw = torch.tensor([[1, 4, 4]])
    with torch.no_grad():
        ref = hf(torch.tensor(patches), grid_thw=grid_thw).numpy()

    ours = np.asarray(qwen_vision_encode(params, cfg, jnp.asarray(pixels)))
    assert ours.shape == ref.shape == (4, cfg.hidden_size)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)


def test_patch_order_matches_hf_processor():
    """Our window-major patch layout == Qwen2VLImageProcessor's output."""
    pytest.importorskip("transformers.models.qwen2_vl.image_processing_qwen2_vl")
    from transformers.models.qwen2_vl.image_processing_qwen2_vl import \
        Qwen2VLImageProcessor

    cfg = Qwen2VisionConfig()
    rng = np.random.default_rng(1)
    H = W = 4 * cfg.patch_size
    img = rng.integers(0, 255, size=(H, W, 3), dtype=np.uint8)

    proc = Qwen2VLImageProcessor(do_resize=False, do_rescale=True,
                                 do_normalize=False)
    out = proc(images=[img], return_tensors="np")
    hf_patches = out["pixel_values"]
    assert list(out["image_grid_thw"][0]) == [1, 4, 4]

    pixels = (img.astype(np.float32) / 255.0).transpose(2, 0, 1)
    ours = np.asarray(window_major_patches(jnp.asarray(pixels), cfg))
    np.testing.assert_allclose(ours, hf_patches, atol=1e-6)


def test_vision_rotary_shapes():
    cfg = Qwen2VisionConfig.tiny()
    cos, sin = vision_rotary(cfg, 4, 6)
    assert cos.shape == (24, cfg.head_dim)
    # equal h==w positions give identical first/second half frequencies
    c2, _ = vision_rotary(cfg, 2, 2)
    half = cfg.head_dim // 2
    q = cfg.head_dim // 4
    np.testing.assert_allclose(np.asarray(c2[3, :q]),
                               np.asarray(c2[3, q:half]))


def test_vision_video_matches_hf():
    """Multi-frame (grid_t=3) encode vs HF Qwen2VisionTransformer: temporal
    patching, per-block attention (cu_seqlens), repeated 2D rotary."""
    import torch
    cfg = Qwen2VisionConfig.tiny(embed=32, depth=2, heads=4, hidden=48)
    hf = _hf_vision(cfg, seed=1)
    state = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    params = params_from_hf_qwen_vision(state, cfg, prefix="")

    from msd_tpu.models.qwen2vl_vision import (qwen_vision_encode_video,
                                               window_major_patches_video)
    rng = np.random.default_rng(2)
    T = 6                              # grid_t = 3 with temporal_patch_size=2
    H = W = 4 * cfg.patch_size
    frames = rng.normal(size=(T, 3, H, W)).astype(np.float32)

    patches = np.asarray(window_major_patches_video(jnp.asarray(frames), cfg))
    gt = T // cfg.temporal_patch_size
    grid_thw = torch.tensor([[gt, 4, 4]])
    with torch.no_grad():
        ref = hf(torch.tensor(patches), grid_thw=grid_thw).numpy()

    ours = np.asarray(qwen_vision_encode_video(params, cfg,
                                               jnp.asarray(frames)))
    assert ours.shape == ref.shape == (gt * 4, cfg.hidden_size)
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)


def test_vision_video_odd_frames_repeat_last():
    """An odd frame tail repeats the last frame (Qwen2VLImageProcessor)."""
    from msd_tpu.models.qwen2vl_vision import window_major_patches_video
    cfg = Qwen2VisionConfig.tiny()
    rng = np.random.default_rng(3)
    H = W = 2 * cfg.patch_size
    f3 = rng.normal(size=(3, 3, H, W)).astype(np.float32)
    f4 = np.concatenate([f3, f3[-1:]], axis=0)
    a = np.asarray(window_major_patches_video(jnp.asarray(f3), cfg))
    b = np.asarray(window_major_patches_video(jnp.asarray(f4), cfg))
    np.testing.assert_array_equal(a, b)
