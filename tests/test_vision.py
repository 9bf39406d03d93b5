"""CLIP tower golden tests vs HF + multimodal fusion + image-mode losslessness."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msd_tpu.configs import (ClipVisionConfig, DraftConfig, EngineConfig,
                             IMAGE_TOKEN_INDEX, LlamaConfig, TreeConfig)
from msd_tpu.engine.generator import MSDGenerator
from msd_tpu.models import clip_vit as C
from msd_tpu.models import draft as draft_mod
from msd_tpu.models import llama as L
from msd_tpu.models.llava import expand_ids, fuse_embeddings

from tests.hf_ref import tiny_hf_clip


def test_clip_matches_hf():
    import torch
    cfg = ClipVisionConfig.tiny(hidden_size=32, layers=3, heads=4,
                                image_size=28, patch_size=14,
                                intermediate_size=64)
    hf = tiny_hf_clip(cfg)
    state = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    params = C.params_from_hf_clip(state, cfg)

    rng = np.random.default_rng(0)
    img = rng.normal(size=(3, 28, 28)).astype(np.float32)
    with torch.no_grad():
        out = hf(torch.tensor(img[None]), output_hidden_states=True)
    # select_layer -2, drop CLS
    ref = out.hidden_states[cfg.select_layer][0, 1:].numpy()

    ours = np.asarray(C.clip_encode(params, cfg, jnp.asarray(img)))
    np.testing.assert_allclose(ours, ref, atol=5e-4, rtol=2e-3)


def test_expand_and_fuse():
    ids = np.array([1, 5, IMAGE_TOKEN_INDEX, 7, 9], np.int32)
    n_img, H, out_len = 4, 8, 16
    table = np.arange(32 * H, dtype=np.float32).reshape(32, H)
    feats = -np.ones((n_img, H), np.float32)
    img_pos = 2

    exp = np.asarray(expand_ids(jnp.asarray(np.where(ids < 0, 0, ids)),
                                jnp.int32(img_pos), n_img, out_len))
    assert list(exp[:2]) == [1, 5]
    assert list(exp[2:6]) == [0, 0, 0, 0]
    assert list(exp[6:8]) == [7, 9]

    fused = np.asarray(fuse_embeddings(jnp.asarray(table), jnp.asarray(ids),
                                       jnp.asarray(feats), jnp.int32(img_pos),
                                       out_len))
    np.testing.assert_array_equal(fused[0], table[1])
    np.testing.assert_array_equal(fused[2:6], feats)
    np.testing.assert_array_equal(fused[6], table[7])
    np.testing.assert_array_equal(fused[7], table[9])


@pytest.fixture(scope="module")
def mm_gen():
    cfg = LlamaConfig.tiny(vocab_size=128, hidden_size=32, layers=2, heads=4,
                           intermediate_size=64, max_pos=1024)
    dcfg = DraftConfig(text=cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tp = L.init_llama_params(k1, cfg)
    dp = draft_mod.init_draft_params(k2, dcfg)
    eng = EngineConfig(max_seq_len=512, prompt_pad_multiple=32,
                       tree=TreeConfig(top_k=4, max_depth=4, num_nodes=12))
    n_img = 16
    return MSDGenerator(tp, dp, cfg, dcfg, eng, eos_id=2, n_img=n_img), n_img, cfg


def test_multimodal_greedy_losslessness(mm_gen):
    """Image-mode MSD greedy == AR greedy (image splice + position offsets)."""
    gen, n_img, cfg = mm_gen
    rng = np.random.default_rng(3)
    feats = jnp.asarray(rng.normal(size=(n_img, cfg.hidden_size)) * 0.1,
                        jnp.float32)
    for trial in range(2):
        n = int(rng.integers(5, 20))
        ids = rng.integers(3, 120, size=n).astype(np.int32)
        ids[int(rng.integers(1, n - 1))] = IMAGE_TOKEN_INDEX
        ar = gen.naive_generate(ids, img_feats=feats, max_new_tokens=20)
        msd = gen.generate(ids, img_feats=feats, max_new_tokens=20)
        np.testing.assert_array_equal(msd.tokens, ar.tokens,
                                      err_msg=f"mm trial {trial}")
        assert msd.accept_steps > 0


def test_s2_multiscale_encode():
    """S2: single-scale s2 == plain encode; two scales concat channels and
    keep the base token count; end-to-end encode_image projects the concat."""
    import jax
    import jax.numpy as jnp
    from msd_tpu.configs import ClipVisionConfig, LlamaConfig, LlavaConfig
    from msd_tpu.models.clip_vit import (clip_encode, clip_encode_s2,
                                         init_clip_params)
    from msd_tpu.models.llava import encode_image, init_projector_params

    vcfg = ClipVisionConfig.tiny(image_size=28, patch_size=14)
    params = init_clip_params(jax.random.PRNGKey(0), vcfg)
    px = jax.random.normal(jax.random.PRNGKey(1), (3, 28, 28), jnp.float32)

    one = clip_encode_s2(params, vcfg, px, (28,))
    ref = clip_encode(params, vcfg, px)
    assert jnp.allclose(one, ref, atol=1e-5)

    px_big = jax.random.normal(jax.random.PRNGKey(2), (3, 56, 56), jnp.float32)
    two = clip_encode_s2(params, vcfg, px_big, (28, 56))
    assert two.shape == (vcfg.num_patches, 2 * vcfg.hidden_size)
    # low-res half must equal encoding the resized base image directly
    small = jax.image.resize(px_big, (3, 28, 28), method="linear")
    assert jnp.allclose(two[:, :vcfg.hidden_size],
                        clip_encode(params, vcfg, small), atol=1e-5)

    lcfg = LlavaConfig(text=LlamaConfig.tiny(), vision=vcfg, s2_scales=(28, 56))
    lp = {"vision": params,
          "projector": init_projector_params(jax.random.PRNGKey(3), lcfg)}
    toks = encode_image(lp, lcfg, px_big)
    assert toks.shape == (vcfg.num_patches, lcfg.text.hidden_size)
