"""anyres spatial merge + unpad + multi-image fusion (VERDICT r1 item 4).

Golden checks against HF transformers' llava_next implementation of the same
math (get_anyres_image_grid_shape / unpad_image / the spatial pack order),
plus engine-level decode with multi-image prompts through the prefused
prefill path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msd_tpu.configs import (DraftConfig, EngineConfig, LlamaConfig,
                             TreeConfig, IMAGE_TOKEN_INDEX)
from msd_tpu.engine.generator import MSDGenerator
from msd_tpu.models import draft as draft_mod
from msd_tpu.models import llama as L
from msd_tpu.models.llava import (fuse_embeddings_multi,
                                  merge_anyres_features, unpad_feature_grid)
from msd_tpu.utils.mm_utils import (get_anyres_image_grid_shape,
                                    process_anyres_image,
                                    select_best_resolution)

PINPOINTS = [(336, 672), (672, 336), (672, 672), (1008, 336), (336, 1008)]


def test_grid_shape_matches_hf():
    from transformers.models.llava_next.modeling_llava_next import \
        get_anyres_image_grid_shape as hf_grid
    # original-LLaVA reads image_size/pinpoints as (width, height)
    # (LLaVA/llava/mm_utils.py:99-116); HF llava_next reads (height, width) —
    # swap both for an apples-to-apples golden comparison
    hf_pins = [(p[1], p[0]) for p in PINPOINTS]
    for size in [(500, 400), (1000, 300), (336, 336), (200, 800), (640, 480)]:
        ours = get_anyres_image_grid_shape(size, PINPOINTS, 336)
        theirs = hf_grid((size[1], size[0]), hf_pins, 336)
        assert ours == (theirs[1], theirs[0]), (size, ours, theirs)


def test_unpad_matches_hf():
    import torch
    from transformers.models.llava_next.modeling_llava_next import \
        unpad_image as hf_unpad
    rng = np.random.default_rng(0)
    for (gh, gw, ow, oh) in [(48, 24, 500, 900), (24, 48, 900, 400),
                             (24, 24, 336, 336), (48, 48, 700, 701)]:
        g = rng.normal(size=(gh, gw, 8)).astype(np.float32)
        ours = unpad_feature_grid(g, (ow, oh))
        # HF unpad takes CHW and (height, width)
        theirs = hf_unpad(torch.from_numpy(g.transpose(2, 0, 1)),
                          (oh, ow)).numpy().transpose(1, 2, 0)
        np.testing.assert_array_equal(ours, theirs)


def test_spatial_merge_matches_reference_op_order():
    """Replicate llava_arch.py:166-186 with torch ops and compare."""
    import torch
    rng = np.random.default_rng(1)
    s, H = 4, 6
    npw, nph = 2, 3          # grid (width, height)
    base = rng.normal(size=(s * s, H)).astype(np.float32)
    tiles = rng.normal(size=(nph * npw, s * s, H)).astype(np.float32)
    newline = rng.normal(size=(H,)).astype(np.float32)
    orig_size = (500, 900)   # (width, height)

    feats = np.concatenate([base[None], tiles], axis=0)
    ours = merge_anyres_features(feats, (npw, nph), orig_size, s,
                                 image_newline=newline, mode="spatial_unpad")

    # reference op sequence (llava_arch.py:172-186), torch verbatim semantics
    tf = torch.from_numpy(tiles).view(nph, npw, s, s, H)
    tf = tf.permute(4, 0, 2, 1, 3).contiguous()
    tf = tf.flatten(1, 2).flatten(2, 3)          # [H, nph*s, npw*s]
    from transformers.models.llava_next.modeling_llava_next import unpad_image
    tf = unpad_image(tf, (orig_size[1], orig_size[0]))
    nl = torch.from_numpy(newline)[:, None, None].expand(*tf.shape[:-1], 1)
    tf = torch.cat((tf, nl), dim=-1)
    tf = tf.flatten(1, 2).transpose(0, 1)        # [rows, H]
    want = np.concatenate([base, tf.numpy()], axis=0)
    np.testing.assert_allclose(ours, want, atol=0, rtol=0)

    # 'spatial' (no unpad) raster order
    ours_sp = merge_anyres_features(feats, (npw, nph), orig_size, s,
                                    mode="spatial")
    tf2 = torch.from_numpy(tiles).view(nph, npw, s, s, H)
    tf2 = tf2.permute(0, 2, 1, 3, 4).contiguous().flatten(0, 3)
    want_sp = np.concatenate([base, tf2.numpy()], axis=0)
    np.testing.assert_allclose(ours_sp, want_sp, atol=0, rtol=0)


def test_process_anyres_image_shapes():
    img = np.random.default_rng(2).integers(
        0, 255, size=(400, 700, 3), dtype=np.uint8)
    views = process_anyres_image(img, image_size=336,
                                 grid_pinpoints=PINPOINTS)
    best = select_best_resolution((700, 400), PINPOINTS)
    n_tiles = (best[0] // 336) * (best[1] // 336)
    assert views.shape == (1 + n_tiles, 3, 336, 336)


# ---------------------------------------------------------------------------
# engine: multi-image prompts
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_gen():
    tcfg = LlamaConfig.tiny(vocab_size=512, hidden_size=64, layers=2, heads=4,
                            intermediate_size=128, max_pos=1024)
    dcfg = DraftConfig(text=tcfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    eng = EngineConfig(max_seq_len=512, prompt_pad_multiple=64,
                       tree=TreeConfig(top_k=4, max_depth=4, num_nodes=12))
    return MSDGenerator(L.init_llama_params(k1, tcfg),
                        draft_mod.init_draft_params(k2, dcfg),
                        tcfg, dcfg, eng, n_img=4, eos_id=-1)


def test_multi_image_msd_equals_ar(tiny_gen):
    rng = np.random.default_rng(3)
    ids = rng.integers(3, 500, size=20).astype(np.int32)
    ids[2] = IMAGE_TOKEN_INDEX
    ids[10] = IMAGE_TOKEN_INDEX
    feats = [jnp.asarray(rng.normal(size=(4, 64)) * 0.1, jnp.float32),
             jnp.asarray(rng.normal(size=(6, 64)) * 0.1, jnp.float32)]
    ar = tiny_gen.naive_generate(ids, img_feats=feats, max_new_tokens=32)
    msd = tiny_gen.generate(ids, img_feats=feats, max_new_tokens=32)
    n = min(len(ar.tokens), len(msd.tokens))
    assert n > 0
    np.testing.assert_array_equal(ar.tokens[:n], msd.tokens[:n])


def test_multi_path_consistent_with_single_image_path(tiny_gen):
    """One image through the prefused path == the standard fused path."""
    rng = np.random.default_rng(4)
    ids = rng.integers(3, 500, size=16).astype(np.int32)
    ids[3] = IMAGE_TOKEN_INDEX
    feats = jnp.asarray(rng.normal(size=(4, 64)) * 0.1, jnp.float32)
    single = tiny_gen.generate(ids, img_feats=feats, max_new_tokens=24)
    multi = tiny_gen.generate(ids, img_feats=[feats], max_new_tokens=24)
    np.testing.assert_array_equal(single.tokens, multi.tokens)


def test_fuse_embeddings_multi_layout():
    rng = np.random.default_rng(5)
    table = rng.normal(size=(32, 8)).astype(np.float32)
    ids = np.asarray([5, IMAGE_TOKEN_INDEX, 7, IMAGE_TOKEN_INDEX, 9],
                     np.int32)
    f1 = rng.normal(size=(2, 8)).astype(np.float32)
    f2 = rng.normal(size=(3, 8)).astype(np.float32)
    fused, exp_ids, img_rows = fuse_embeddings_multi(table, ids, [f1, f2])
    assert fused.shape == (1 + 2 + 1 + 3 + 1, 8)
    np.testing.assert_array_equal(
        exp_ids, [5, 0, 0, 7, 0, 0, 0, 9])
    np.testing.assert_array_equal(
        img_rows, [0, 1, 1, 0, 1, 1, 1, 0])
    np.testing.assert_array_equal(fused[0], table[5])
    np.testing.assert_array_equal(fused[1:3], f1)
    np.testing.assert_array_equal(fused[3], table[7])
    np.testing.assert_array_equal(fused[4:7], f2)
    np.testing.assert_array_equal(fused[7], table[9])
