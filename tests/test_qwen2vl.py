"""Qwen2-VL family tests: qkv-bias decoder golden vs HF Qwen2, mrope
position/gather semantics, and inline-image MSD losslessness."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msd_tpu.configs import DraftConfig, EngineConfig, TreeConfig
from msd_tpu.engine.generator import MSDGenerator
from msd_tpu.models import draft as draft_mod
from msd_tpu.models import llama as L
from msd_tpu.models.qwen2vl import (IMAGE_PAD_ID, Qwen2VLTextConfig,
                                    fuse_qwen_embeddings, init_qwen2_params,
                                    mrope_gather, mrope_positions,
                                    params_from_hf_qwen2)
from msd_tpu.ops.attention import causal_prefill_bias

from tests.hf_ref import rand_ids


def test_qwen2_matches_hf():
    import torch
    from transformers import Qwen2Config, Qwen2ForCausalLM

    qcfg = Qwen2VLTextConfig.tiny(vocab=128, hidden=32, layers=2, heads=4,
                                  kv_heads=2, inter=64)
    torch.manual_seed(0)
    hf = Qwen2ForCausalLM(Qwen2Config(
        vocab_size=qcfg.vocab_size, hidden_size=qcfg.hidden_size,
        intermediate_size=qcfg.intermediate_size,
        num_hidden_layers=qcfg.num_hidden_layers,
        num_attention_heads=qcfg.num_attention_heads,
        num_key_value_heads=qcfg.num_key_value_heads,
        max_position_embeddings=qcfg.max_position_embeddings,
        rms_norm_eps=qcfg.rms_norm_eps, rope_theta=qcfg.rope_theta,
        tie_word_embeddings=False, use_cache=True)).eval()
    state = {k: v.detach().float().numpy() for k, v in hf.state_dict().items()}
    params = params_from_hf_qwen2(state, qcfg)
    lc = qcfg.as_llama()

    ids = rand_ids(qcfg.vocab_size, 13, seed=4)
    with torch.no_grad():
        ref = hf(torch.tensor(ids[None].astype(np.int64))).logits[0].numpy()
    cos_t, sin_t = L.make_rope(lc, 64)
    kv = L.init_kv_cache(lc, 64)
    emb = params["embed_tokens"][jnp.asarray(ids)]
    hidden, _ = L.llama_forward(params, lc, emb, jnp.arange(len(ids)), kv,
                                jnp.int32(0), causal_prefill_bias(len(ids), 64),
                                cos_t, sin_t)
    ours = np.asarray(L.lm_head(params, hidden))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)


def test_mrope_positions():
    # prompt: 4 text, image 2x3 grid (6 pads) at 4, then 3 text
    pos, delta = mrope_positions(13, img_start=4, n_img=6, grid_h=2, grid_w=3)
    # prefix text: all dims equal
    np.testing.assert_array_equal(pos[:, :4], np.tile(np.arange(4), (3, 1)))
    # image: temporal stays at 4; h/w walk the grid
    assert list(pos[0, 4:10]) == [4] * 6
    assert list(pos[1, 4:10]) == [4, 4, 4, 5, 5, 5]
    assert list(pos[2, 4:10]) == [4, 5, 6, 4, 5, 6]
    # suffix text resumes at st + max(gh, gw) = 4 + 3 = 7
    np.testing.assert_array_equal(pos[:, 10], [7, 7, 7])
    assert delta == 7 - 10  # position lags cache index by 3


def test_mrope_gather_equals_1d_for_equal_dims():
    cfg = Qwen2VLTextConfig.tiny()
    lc = cfg.as_llama()
    cos_t, sin_t = L.make_rope(lc, 64)
    p = np.arange(10)
    pos3 = jnp.asarray(np.tile(p, (3, 1)), jnp.int32)
    g_cos, g_sin = mrope_gather(cos_t, sin_t, pos3, cfg.mrope_section)
    np.testing.assert_allclose(np.asarray(g_cos), np.asarray(cos_t[p]))
    np.testing.assert_allclose(np.asarray(g_sin), np.asarray(sin_t[p]))


def test_fuse_qwen_embeddings():
    table = jnp.asarray(np.arange(40).reshape(10, 4), jnp.float32)
    ids = jnp.asarray([1, 2, 3, 3, 3, 4], jnp.int32)
    feats = -jnp.ones((3, 4), jnp.float32)
    out = np.asarray(fuse_qwen_embeddings(table, ids, feats, jnp.int32(2), 3))
    np.testing.assert_array_equal(out[0], np.arange(4, 8))
    np.testing.assert_array_equal(out[2:5], -np.ones((3, 4)))
    np.testing.assert_array_equal(out[5], np.asarray(table[4]))


@pytest.fixture(scope="module")
def qwen_gen():
    qcfg = Qwen2VLTextConfig.tiny(vocab=512, hidden=64, layers=2, heads=4,
                                  kv_heads=2, inter=128)
    lc = qcfg.as_llama()
    dcfg = DraftConfig(text=lc)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tp = init_qwen2_params(k1, qcfg)
    dp = draft_mod.init_draft_params(k2, dcfg)
    # draft layer needs matching bias structure? draft layers are bias-free
    # in the reference qwen draft too — EAGLE draft uses its own layer defs.
    eng = EngineConfig(max_seq_len=256, prompt_pad_multiple=32,
                       tree=TreeConfig(top_k=4, max_depth=4, num_nodes=12))
    n_img = 6
    gen = MSDGenerator(tp, dp, lc, dcfg, eng, n_img=n_img, eos_id=2,
                       image_mode="inline", mrope_section=qcfg.mrope_section)
    return gen, n_img, lc


def test_qwen_inline_msd_lossless(qwen_gen):
    gen, n_img, lc = qwen_gen
    rng = np.random.default_rng(0)
    # prompt with an inline image-pad span (grid 2x3)
    ids = rng.integers(3, 500, size=17).astype(np.int32)
    ids[5:5 + n_img] = IMAGE_PAD_ID
    feats = jnp.asarray(rng.normal(size=(n_img, lc.hidden_size)) * 0.1,
                        jnp.float32)
    grid = (2, 3)
    ar = gen.naive_generate(ids, img_feats=feats, max_new_tokens=20,
                            img_grid=grid)
    msd = gen.generate(ids, img_feats=feats, max_new_tokens=20, img_grid=grid)
    np.testing.assert_array_equal(msd.tokens, ar.tokens)
    assert msd.accept_steps > 0


def test_qwen_textonly_msd_lossless(qwen_gen):
    gen, n_img, lc = qwen_gen
    ids = np.arange(3, 14, dtype=np.int32)
    ar = gen.naive_generate(ids, max_new_tokens=16)
    msd = gen.generate(ids, max_new_tokens=16)
    np.testing.assert_array_equal(msd.tokens, ar.tokens)


def test_qwen_inline_streaming_matches_oneshot(qwen_gen):
    """generate_stream over the inline (mrope) image path == generate()."""
    gen, n_img, lc = qwen_gen
    rng = np.random.default_rng(3)
    ids = rng.integers(3, 500, size=15).astype(np.int32)
    ids[4:4 + n_img] = IMAGE_PAD_ID
    feats = jnp.asarray(rng.normal(size=(n_img, lc.hidden_size)) * 0.1,
                        jnp.float32)
    grid = (2, 3)
    one = gen.generate(ids, img_feats=feats, max_new_tokens=24, img_grid=grid)
    chunks = list(gen.generate_stream(ids, img_feats=feats, max_new_tokens=24,
                                      segment=6, img_grid=grid))
    np.testing.assert_array_equal(np.concatenate(chunks), one.tokens)


def test_qwen_batched_matches_single(qwen_gen):
    """Inline-mode generate_batch == per-sample generate, incl. mrope delta."""
    gen, n_img, lc = qwen_gen
    rng = np.random.default_rng(9)
    grid = (2, 3)
    prompts, feats_list = [], []
    for b in range(3):
        ids = rng.integers(3, 500, size=12 + b).astype(np.int32)
        ids[2:2 + n_img] = IMAGE_PAD_ID
        prompts.append(ids)
        feats_list.append(jnp.asarray(
            rng.normal(size=(n_img, lc.hidden_size)) * 0.1, jnp.float32))
    batch = gen.generate_batch(prompts, feats_list, max_new_tokens=16,
                               img_grid=grid)
    for b in range(3):
        single = gen.generate(prompts[b], img_feats=feats_list[b],
                              max_new_tokens=16, seed=0, img_grid=grid)
        np.testing.assert_array_equal(batch[b].tokens, single.tokens)


def test_mrope_positions_video():
    """grid_t > 1: temporal position advances once per temporal block — the
    documented HF pattern (modeling_qwen2vl_kv.py:1503-1510: video 3x2x2 ->
    t [0,0,0,0,1,1,1,1,2,2,2,2], text resumes at max position + 1)."""
    pos, delta = mrope_positions(17, img_start=0, n_img=12, grid_h=2,
                                 grid_w=2, grid_t=3)
    assert list(pos[0, :12]) == [0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2]
    assert list(pos[1, :12]) == [0, 0, 1, 1] * 3
    assert list(pos[2, :12]) == [0, 1, 0, 1] * 3
    # text after the video: st + max(gt, gh, gw) = 3
    np.testing.assert_array_equal(pos[:, 12], [3, 3, 3])
    assert delta == 3 - 12


def test_qwen_video_msd_lossless():
    """Inline VIDEO span (grid_t=2 x 2x2): greedy MSD == AR with temporal
    mrope positions carried through prefill + decode."""
    from msd_tpu.models.qwen2vl import VIDEO_PAD_ID

    qcfg = Qwen2VLTextConfig.tiny(vocab=512, hidden=64, layers=2, heads=4,
                                  kv_heads=2, inter=128)
    lc = qcfg.as_llama()
    dcfg = DraftConfig(text=lc)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    tp = init_qwen2_params(k1, qcfg)
    dp = draft_mod.init_draft_params(k2, dcfg)
    eng = EngineConfig(max_seq_len=256, prompt_pad_multiple=32,
                       tree=TreeConfig(top_k=4, max_depth=4, num_nodes=12))
    n_vid = 2 * 2 * 2  # grid_t * gh * gw (merged)
    gen = MSDGenerator(tp, dp, lc, dcfg, eng, n_img=n_vid, eos_id=2,
                       image_mode="inline", mrope_section=qcfg.mrope_section)
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 500, size=19).astype(np.int32)
    ids[4:4 + n_vid] = VIDEO_PAD_ID
    feats = jnp.asarray(rng.normal(size=(n_vid, lc.hidden_size)) * 0.1,
                        jnp.float32)
    grid = (2, 2, 2)  # (grid_t, gh, gw)
    ar = gen.naive_generate(ids, img_feats=feats, max_new_tokens=20,
                            img_grid=grid)
    msd = gen.generate(ids, img_feats=feats, max_new_tokens=20, img_grid=grid)
    np.testing.assert_array_equal(msd.tokens, ar.tokens)
    assert msd.accept_steps > 0


def test_qwen_adapter_video_request():
    """The tiny qwen2_vl_msd adapter routes a [T, H, W, 3] video visual
    through frame sampling + the video engine and returns text."""
    from msd_tpu.harness.models.qwen2_vl_msd import (Qwen2VLMSD,
                                                     is_video_visual,
                                                     load_video_frames,
                                                     sample_frames)

    # frame sampling semantics (reference qwen2_vl_msd.py:251-257)
    idx = sample_frames(100, 8)
    assert len(idx) == 8 and idx[0] == 0 and idx[-1] == 99
    idx_short = sample_frames(3, 8)
    assert len(idx_short) == 8 and idx_short[-1] == 2  # duplicates kept

    adapter = Qwen2VLMSD.from_tiny(max_num_frames=8)
    frames = np.random.default_rng(0).integers(
        0, 255, size=(20, 56, 56, 3), dtype=np.uint8)
    assert is_video_visual(frames)
    assert load_video_frames(frames, 8).shape == (8, 56, 56, 3)
    out = adapter._generate_plain("describe the video", [frames],
                                  {"max_new_tokens": 8})
    assert isinstance(out, str)
    assert adapter.video_gen.n_img == (8 // 2) * 4
