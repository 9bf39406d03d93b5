"""Window-canonical tree attention: bitwise draft-invariance of the greedy
trajectory (EngineConfig.canonical_attn, ops/attention.windowed_attention).

The losslessness theorem for greedy speculative decoding says the committed
sequence is the target's greedy continuation REGARDLESS of the draft. With
eager GPU kernels the reference gets token-level equality for free (same
kernels either way); under XLA, floating-point association used to depend on
which step boundary / tree slot an accepted token occupied, so near-tie
argmaxes could flip between acceptance patterns. The window-canonical kernel
fixes the association per logical position, so these tests demand BITWISE
equality at DEFAULT matmul precision — no fp32-highest crutch.

Reference behavior being rebuilt: EAGLE/eagle/model/utils.py:395-409
(evaluate_posterior greedy), ea_model.py:235-400 (msdgenerate).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msd_tpu.configs import (DraftConfig, EngineConfig, LlamaConfig,
                             TreeConfig, IMAGE_TOKEN_INDEX)
from msd_tpu.engine.generator import MSDGenerator
from msd_tpu.models import draft as draft_mod
from msd_tpu.models import llama as L


@pytest.fixture()
def default_precision():
    """Run at DEFAULT (bf16-like) matmul precision — the invariance claim
    must hold without the conftest's fp32-highest crutch."""
    with jax.default_matmul_precision("default"):
        yield


@pytest.fixture(scope="module")
def bundle():
    cfg = LlamaConfig.tiny(vocab_size=512, hidden_size=128, layers=4, heads=4,
                           intermediate_size=256, max_pos=2048)
    dcfg = DraftConfig(text=cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tp = L.init_llama_params(k1, cfg)
    dp = draft_mod.init_draft_params(k2, dcfg)
    dp["embed_tokens"] = tp["embed_tokens"]
    ids = np.random.default_rng(1).integers(3, 500, size=23).astype(np.int32)
    ids[4] = IMAGE_TOKEN_INDEX
    feats = jnp.asarray(
        np.random.default_rng(1).normal(size=(64, cfg.hidden_size)) * 0.1,
        jnp.float32)
    return cfg, dcfg, tp, dp, ids, feats


def _gen(cfg, dcfg, tp, dp, tree, n_img=64):
    return MSDGenerator(tp, dp, cfg, dcfg,
                        EngineConfig(max_seq_len=1024, prompt_pad_multiple=64,
                                     tree=tree),
                        eos_id=-1, n_img=n_img)


DEEP = TreeConfig(top_k=8, max_depth=6, num_nodes=32)


@pytest.mark.usefixtures("default_precision")
class TestDraftInvariance:
    def test_two_random_drafts_identical_trajectory(self, bundle):
        """Same target, two unrelated drafts -> bitwise-identical tokens."""
        cfg, dcfg, tp, dp, ids, feats = bundle
        gen = _gen(cfg, dcfg, tp, dp, DEEP)
        r1 = gen.generate(ids, img_feats=feats, max_new_tokens=96,
                          split_programs=True)
        dp2 = draft_mod.init_draft_params(jax.random.PRNGKey(99), dcfg)
        dp2["embed_tokens"] = tp["embed_tokens"]
        gen.params = dict(gen.params)
        gen.params["draft"] = dp2
        r2 = gen.generate(ids, img_feats=feats, max_new_tokens=96,
                          split_programs=True)
        n = min(len(r1.tokens), len(r2.tokens))
        assert n >= 90
        np.testing.assert_array_equal(r1.tokens[:n], r2.tokens[:n])

    def test_tree_geometry_invariance(self, bundle):
        """Different tree budgets (different acceptance structures AND
        program shapes) -> bitwise-identical tokens."""
        cfg, dcfg, tp, dp, ids, feats = bundle
        outs = []
        for tree in (DEEP,
                     TreeConfig(top_k=4, max_depth=2, num_nodes=8),
                     TreeConfig(top_k=12, max_depth=3, num_nodes=24)):
            gen = _gen(cfg, dcfg, tp, dp, tree)
            outs.append(gen.generate(ids, img_feats=feats, max_new_tokens=96,
                                     split_programs=True).tokens)
        n = min(map(len, outs))
        assert n >= 90
        for o in outs[1:]:
            np.testing.assert_array_equal(outs[0][:n], o[:n])

    def test_distilled_vs_random_draft(self, bundle):
        """A draft overfit to the target's own trajectory (high alpha, deep
        accepted paths) commits the SAME tokens as an untrained draft
        (alpha ~1, bonus-only steps) — the null-draft run is canonical
        greedy AR."""
        from msd_tpu.train.data_gen import record_from_traj
        from msd_tpu.train.draft_train import TrainConfig
        from msd_tpu.train.trainer import DraftTrainer, TrainerConfig
        cfg, dcfg, tp, dp, _, _ = bundle
        ids = np.random.default_rng(7).integers(3, 500, size=16).astype(
            np.int32)
        eng = EngineConfig(max_seq_len=512, prompt_pad_multiple=64, tree=DEEP)
        gen = MSDGenerator(tp, dp, cfg, dcfg, eng, eos_id=-1, n_img=0)
        r = gen.generate(ids, max_new_tokens=64, collect_hiddens=True,
                         split_programs=True)
        rec = record_from_traj(r.traj_hidden, r.exp_ids, len(ids), 512, 0,
                               None, np.asarray(tp["embed_tokens"]), 128)
        tc = TrainerConfig(train=TrainConfig(lr=1e-2, warmup_steps=10,
                                             total_steps=200, noise_std=0.0,
                                             p_w=0.5, v_norm=True),
                           batch_size=1, max_len=128, num_epochs=1,
                           log_every=10 ** 9)
        trainer = DraftTrainer(
            dcfg, jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), dp),
            tp["lm_head"], tc)
        while trainer.step_count < 200:
            trainer.run_epoch([], [rec], log=lambda *a: None)
        dp2 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32),
                           trainer.params)
        dp2["embed_tokens"] = tp["embed_tokens"]
        gen.params = dict(gen.params)
        gen.params["draft"] = dp2
        r2 = gen.generate(ids, max_new_tokens=64, collect_hiddens=True,
                          split_programs=True)
        assert r2.avg_accept_len > r.avg_accept_len + 0.5  # actually sped up
        n = min(len(r.tokens), len(r2.tokens))
        assert n >= 60
        np.testing.assert_array_equal(r.tokens[:n], r2.tokens[:n])

    def test_canonical_ar_optin_matches_fast_ar(self, bundle):
        """EngineConfig.canonical_ar routes the fast-AR loop's single query
        row through the windowed split-softmax association. The split is
        mathematically exact, so at highest precision the opt-in program
        must reproduce the default (speed) AR program token-for-token."""
        cfg, dcfg, tp, dp, ids, feats = bundle
        with jax.default_matmul_precision("highest"):
            outs = []
            for can_ar in (False, True):
                gen = MSDGenerator(
                    tp, dp, cfg, dcfg,
                    EngineConfig(max_seq_len=1024, prompt_pad_multiple=64,
                                 tree=DEEP, canonical_ar=can_ar),
                    eos_id=-1, n_img=64)
                outs.append(gen.naive_generate(ids, img_feats=feats,
                                               max_new_tokens=48).tokens)
        n = min(map(len, outs))
        assert n >= 40
        np.testing.assert_array_equal(outs[0][:n], outs[1][:n])

    def test_legacy_tree_bias_path_still_works(self, bundle):
        """canonical_attn=False keeps the original tree_bias verification;
        MSD stays lossless vs AR at highest precision (legacy behavior)."""
        cfg, dcfg, tp, dp, ids, feats = bundle
        with jax.default_matmul_precision("highest"):
            gen = MSDGenerator(
                tp, dp, cfg, dcfg,
                EngineConfig(max_seq_len=1024, prompt_pad_multiple=64,
                             tree=DEEP, canonical_attn=False),
                eos_id=-1, n_img=64)
            ar = gen.naive_generate(ids, img_feats=feats, max_new_tokens=48)
            msd = gen.generate(ids, img_feats=feats, max_new_tokens=48)
        n = min(len(ar.tokens), len(msd.tokens))
        np.testing.assert_array_equal(ar.tokens[:n], msd.tokens[:n])
