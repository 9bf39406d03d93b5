"""End-to-end engine tests on tiny random models (CPU).

THE property that matters (SURVEY.md §4): speculative decoding is lossless —
greedy MSD output must equal greedy AR output token-for-token, for any draft
weights (a bad draft only lowers the accept rate, never changes the output).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msd_tpu.configs import DraftConfig, EngineConfig, LlamaConfig, TreeConfig
from msd_tpu.engine.generator import MSDGenerator
from msd_tpu.models import draft as draft_mod
from msd_tpu.models import llama as L
from msd_tpu.ops.sampling import SamplingParams


def build_tiny(seed=0, vocab=128, hidden=32, layers=2, heads=4):
    cfg = LlamaConfig.tiny(vocab_size=vocab, hidden_size=hidden, layers=layers,
                           heads=heads, intermediate_size=64, max_pos=1024)
    dcfg = DraftConfig(text=cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    tp = L.init_llama_params(k1, cfg)
    dp = draft_mod.init_draft_params(k2, dcfg)
    return cfg, dcfg, tp, dp


def make_gen(seed=0, tree=None, max_seq=512, **kw):
    cfg, dcfg, tp, dp = build_tiny(seed)
    eng = EngineConfig(max_seq_len=max_seq, prompt_pad_multiple=32,
                       tree=tree or TreeConfig(top_k=4, max_depth=4, num_nodes=12))
    return MSDGenerator(tp, dp, cfg, dcfg, eng, eos_id=2, **kw)


@pytest.fixture(scope="module")
def gen():
    return make_gen()


@pytest.mark.quick
def test_greedy_losslessness(gen):
    """MSD greedy == AR greedy, bit for bit, random draft."""
    rng = np.random.default_rng(0)
    for trial in range(3):
        ids = rng.integers(3, 120, size=rng.integers(4, 30)).astype(np.int32)
        ar = gen.naive_generate(ids, max_new_tokens=24)
        msd = gen.generate(ids, max_new_tokens=24)
        np.testing.assert_array_equal(
            msd.tokens, ar.tokens,
            err_msg=f"trial {trial}: MSD diverged from AR greedy")


def test_msd_emits_tokens_and_stats(gen):
    ids = np.arange(3, 10, dtype=np.int32)
    r = gen.generate(ids, max_new_tokens=16)
    assert len(r.tokens) > 0
    assert r.accept_steps > 0
    assert r.accept_len_sum >= r.accept_steps  # >= 1 token per step
    assert r.avg_accept_len >= 1.0


def test_distilled_draft_accepts_more():
    """A draft sharing the target's layer-0 behavior should beat alpha=1 on
    average vs a mismatched draft (sanity that the tree machinery works)."""
    # same seed => draft embeds == target embeds (init shares distribution)
    g = make_gen(seed=1)
    ids = np.arange(3, 12, dtype=np.int32)
    r = g.generate(ids, max_new_tokens=32)
    assert r.avg_accept_len >= 1.0


def test_sampling_mode_runs():
    g = make_gen()
    ids = np.arange(3, 11, dtype=np.int32)
    sp = SamplingParams(temperature=1.0, top_p=0.9, top_k=20)
    r = g.generate(ids, max_new_tokens=12, sp=sp, seed=7)
    assert len(r.tokens) >= 0
    assert r.accept_steps > 0


def test_long_generation_consistency(gen):
    """Longer budget: still lossless, multiple verify steps exercised."""
    ids = np.asarray([5, 9, 17, 33], np.int32)
    ar = gen.naive_generate(ids, max_new_tokens=48)
    msd = gen.generate(ids, max_new_tokens=48)
    np.testing.assert_array_equal(msd.tokens, ar.tokens)
    assert msd.accept_steps >= 2


def test_speculative_sampling_preserves_distribution():
    """Core spec-sampling guarantee (utils.py:411-450): the first token
    emitted after the root (accepted draft child or residual-sampled bonus)
    is distributed EXACTLY as the target's conditional distribution,
    regardless of what the draft proposed."""
    from msd_tpu.engine.static_tree import tree_from_tokens
    from msd_tpu.engine.tree import evaluate_sampling

    V = 16
    rng = np.random.default_rng(0)
    # a small tree: root with 3 children, one grandchild
    choices = [[0], [1], [2], [0, 0]]
    draft_tokens = jnp.asarray([3, 7, 12, 5], jnp.int32)  # children tokens
    tree = tree_from_tokens(choices, jnp.int32(2), draft_tokens,
                            max_path_len=3)

    logits = rng.normal(size=(5, V)) * 1.5
    probs = jnp.asarray(np.exp(logits) / np.exp(logits).sum(-1, keepdims=True),
                        jnp.float32)

    def one(key):
        best, acc, nxt = evaluate_sampling(tree, probs, key)
        first = jnp.where(acc >= 1, tree.tokens[tree.retrieve[best, 1]], nxt)
        return first

    n = 4000
    keys = jax.random.split(jax.random.PRNGKey(42), n)
    firsts = np.asarray(jax.jit(jax.vmap(one))(keys))
    emp = np.bincount(firsts, minlength=V) / n
    expected = np.asarray(probs[0])
    tv = 0.5 * np.abs(emp - expected).sum()
    assert tv < 0.05, f"total variation {tv:.4f} (empirical {emp}, " \
                      f"target {expected})"


@pytest.mark.parametrize("tree_kw", [
    dict(top_k=4, max_depth=4, num_nodes=12),
    dict(top_k=3, max_depth=6, num_nodes=32),   # budget > depth*top_k: dead-pad
    dict(top_k=8, max_depth=3, num_nodes=20),
])
def test_losslessness_across_tree_shapes(tree_kw):
    gen = make_gen(seed=2, tree=TreeConfig(**tree_kw))
    rng = np.random.default_rng(7)
    ids = rng.integers(3, 120, size=13).astype(np.int32)
    ar = gen.naive_generate(ids, max_new_tokens=20)
    msd = gen.generate(ids, max_new_tokens=20)
    np.testing.assert_array_equal(msd.tokens, ar.tokens)


def test_losslessness_gqa_target():
    cfg = LlamaConfig.tiny(vocab_size=128, hidden_size=64, layers=2, heads=8,
                           kv_heads=2, intermediate_size=128, max_pos=1024)
    dcfg = DraftConfig(text=cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(5))
    tp = L.init_llama_params(k1, cfg)
    dp = draft_mod.init_draft_params(k2, dcfg)
    eng = EngineConfig(max_seq_len=256, prompt_pad_multiple=32,
                       tree=TreeConfig(top_k=4, max_depth=4, num_nodes=12))
    gen = MSDGenerator(tp, dp, cfg, dcfg, eng, eos_id=2)
    ids = np.arange(3, 17, dtype=np.int32)
    np.testing.assert_array_equal(gen.generate(ids, max_new_tokens=16).tokens,
                                  gen.naive_generate(ids, max_new_tokens=16).tokens)


def test_prompt_at_bucket_boundary(gen):
    ids = np.arange(3, 3 + 32, dtype=np.int32)  # == prompt_pad_multiple
    ar = gen.naive_generate(ids, max_new_tokens=12)
    msd = gen.generate(ids, max_new_tokens=12)
    np.testing.assert_array_equal(msd.tokens, ar.tokens)


@pytest.mark.quick
def test_max_new_one(gen):
    ids = np.arange(3, 9, dtype=np.int32)
    r = gen.generate(ids, max_new_tokens=1)
    a = gen.naive_generate(ids, max_new_tokens=1)
    assert len(r.tokens) >= 1 and len(a.tokens) >= 1
    assert r.tokens[0] == a.tokens[0]


def test_eos_stops_generation():
    """Whatever token the target emits first, make IT the eos: generation
    must stop immediately in both engines."""
    g0 = make_gen(seed=0)
    ids = np.arange(3, 10, dtype=np.int32)
    first = int(g0.naive_generate(ids, max_new_tokens=4).tokens[0])
    cfg, dcfg, tp, dp = build_tiny(0)
    eng = EngineConfig(max_seq_len=512, prompt_pad_multiple=32,
                       tree=TreeConfig(top_k=4, max_depth=4, num_nodes=12))
    g1 = MSDGenerator(tp, dp, cfg, dcfg, eng, eos_id=first)
    assert len(g1.naive_generate(ids, max_new_tokens=16).tokens) == 0
    assert len(g1.generate(ids, max_new_tokens=16).tokens) == 0


def test_prompt_too_long_raises(gen):
    with pytest.raises(ValueError, match="prompt too long"):
        gen.generate(np.arange(3, 3 + 600, dtype=np.int32) % 100 + 3,
                     max_new_tokens=4)


def test_static_tree_drafting_lossless():
    """Legacy static-tree drafting (generate_tree_buffers analog): greedy MSD
    with a hand-written choices tree == AR greedy."""
    choices = ((0,), (1,), (2,), (0, 0), (0, 1), (1, 0), (0, 0, 0),
               (0, 0, 1), (0, 0, 0, 0))
    tree = TreeConfig(top_k=4, max_depth=5, num_nodes=12,
                      static_choices=choices)
    gen = make_gen(seed=3, tree=tree)
    rng = np.random.default_rng(11)
    for trial in range(2):
        ids = rng.integers(3, 120, size=rng.integers(5, 20)).astype(np.int32)
        ar = gen.naive_generate(ids, max_new_tokens=20)
        msd = gen.generate(ids, max_new_tokens=20)
        np.testing.assert_array_equal(msd.tokens, ar.tokens,
                                      err_msg=f"static trial {trial}")
        assert msd.accept_steps > 0


def test_static_mc_sim_tree_lossless():
    """The shipped 63-node EAGLE tree drives the engine losslessly."""
    from msd_tpu.engine.static_tree import mc_sim_7b_63
    choices = tuple(tuple(c) for c in mc_sim_7b_63)
    tree = TreeConfig(top_k=4, max_depth=10, num_nodes=64,
                      static_choices=choices)
    gen = make_gen(seed=4, tree=tree)
    ids = np.arange(3, 14, dtype=np.int32)
    ar = gen.naive_generate(ids, max_new_tokens=16)
    msd = gen.generate(ids, max_new_tokens=16)
    np.testing.assert_array_equal(msd.tokens, ar.tokens)


def test_batched_generation_matches_single(gen):
    rng = np.random.default_rng(9)
    prompts = [rng.integers(3, 120, size=n).astype(np.int32)
               for n in (6, 11, 9)]
    singles = [gen.generate(p, max_new_tokens=16) for p in prompts]
    batch = gen.generate_batch(prompts, max_new_tokens=16)
    for s, b in zip(singles, batch):
        np.testing.assert_array_equal(b.tokens, s.tokens)
        assert b.accept_steps == s.accept_steps


def test_streaming_matches_oneshot(gen):
    """generate_stream segments concatenate to exactly generate()'s output,
    with more than one segment actually produced."""
    rng = np.random.default_rng(7)
    for trial in range(2):
        ids = rng.integers(3, 120, size=rng.integers(5, 25)).astype(np.int32)
        one = gen.generate(ids, max_new_tokens=40, seed=trial)
        chunks = list(gen.generate_stream(ids, max_new_tokens=40, seed=trial,
                                          segment=8))
        assert len(chunks) >= 2, "expected multiple stream segments"
        np.testing.assert_array_equal(np.concatenate(chunks), one.tokens)
        stats = gen.last_stream_stats
        assert stats["accept_steps"] == one.accept_steps
        assert stats["accept_len_sum"] == one.accept_len_sum


@pytest.mark.quick
def test_finalize_tree_padded_budget_keeps_parent_chain():
    """Regression: when num_nodes - 1 > max_depth * top_k (dead-pad entries),
    the pad scatter must not overwrite layer-0 slot 0's tree index — that
    re-parented the top depth-1 candidate's subtree onto the root and capped
    greedy acceptance at 1 draft token (round-2 7B bench finding)."""
    import jax.numpy as jnp

    from msd_tpu.configs import TreeConfig
    from msd_tpu.engine.tree import finalize_tree

    cfg = TreeConfig(top_k=2, max_depth=2, num_nodes=8)  # 7 > 2*2 -> pads
    wm = jnp.asarray([[0.9, 0.05], [0.8, 0.04]], jnp.float32)
    tm = jnp.asarray([[5, 6], [7, 8]], jnp.int32)
    pm = jnp.asarray([[0, 1], [0, 0]], jnp.int32)
    tr = finalize_tree(cfg, jnp.int32(3), wm, tm, pm, jnp.int32(2))
    toks = np.asarray(tr.tokens)
    par = np.asarray(tr.parents)
    i5 = int(np.where(toks == 5)[0][0])
    for child in (7, 8):   # both are children of token 5 (layer-0 slot 0)
        ic = int(np.where(toks == child)[0][0])
        assert par[ic] == i5, (child, par[ic], i5)
        assert int(np.asarray(tr.positions)[ic]) == 2


def test_collect_hiddens_matches_teacher_forward():
    """collect_hiddens exports the engine's per-position hiddens; at full
    matmul precision they must match a clean teacher prefill over the same
    committed trajectory (same math, different program shape), and
    record_from_traj must lay them out in the trainer's shift-by-one
    convention."""
    import jax
    import jax.numpy as jnp

    from msd_tpu.configs import (DraftConfig, EngineConfig, LlamaConfig,
                                 TreeConfig, IMAGE_TOKEN_INDEX)
    from msd_tpu.engine.generator import MSDGenerator
    from msd_tpu.models import draft as draft_mod
    from msd_tpu.models import llama as L
    from msd_tpu.train.data_gen import make_record_from_ids, record_from_traj

    cfg = LlamaConfig.tiny(vocab_size=128, hidden_size=32, layers=2, heads=2,
                           intermediate_size=64, max_pos=512)
    dcfg = DraftConfig(text=cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tp = L.init_llama_params(k1, cfg)
    dp = draft_mod.init_draft_params(k2, dcfg)
    n_img = 4
    eng = EngineConfig(max_seq_len=128, prompt_pad_multiple=16,
                       tree=TreeConfig(top_k=4, max_depth=4, num_nodes=12))
    gen = MSDGenerator(tp, dp, cfg, dcfg, eng, n_img=n_img, eos_id=-1)
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 120, size=11).astype(np.int32)
    ids[2] = IMAGE_TOKEN_INDEX
    feats = jnp.asarray(rng.normal(size=(n_img, 32)) * 0.1, jnp.float32)

    r = gen.generate(ids, img_feats=feats, max_new_tokens=16,
                     collect_hiddens=True)
    assert r.traj_hidden is not None
    cur = r.traj_hidden.shape[0]
    e0 = len(ids) + n_img - 1
    assert cur == e0 + len(r.tokens)

    full = np.concatenate([ids, r.tokens]).astype(np.int32)
    mask = np.zeros((len(full),), np.float32)
    mask[len(ids) - 1:] = 1.0
    ref = make_record_from_ids(tp, cfg, full, mask, pad_to=len(full),
                               img_feats=feats, n_img=n_img)
    np.testing.assert_array_equal(ref["exp_ids"][:cur], r.exp_ids)
    np.testing.assert_allclose(np.asarray(ref["hidden"][:cur], np.float32),
                               np.asarray(r.traj_hidden, np.float32),
                               atol=5e-4, rtol=1e-3)

    rec = record_from_traj(r.traj_hidden, r.exp_ids, e0, 2, n_img,
                           np.asarray(feats), np.asarray(tp["embed_tokens"]),
                           pad_to=cur)
    np.testing.assert_allclose(rec["target"][:-1], rec["hidden"][1:])
    np.testing.assert_allclose(rec["emb_next"][:cur - 1],
                               np.asarray(ref["emb_next"][:cur - 1],
                                          np.float32), atol=1e-5)
    assert rec["loss_mask"].sum() > 0
    np.testing.assert_array_equal(rec["img_mask"], ref["img_mask"][:cur])


@pytest.mark.quick
def test_medusa_draft_mode():
    """Medusa-style multi-head drafting (DraftConfig.medusa_heads > 0):
    greedy MSD == greedy AR with random heads (lossless regardless of draft
    quality), and distilling the heads on an engine-recorded trajectory
    raises alpha with depth >= 2 acceptances (no recursion drift)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from msd_tpu.configs import DraftConfig, EngineConfig, LlamaConfig, \
        TreeConfig
    from msd_tpu.engine.generator import MSDGenerator
    from msd_tpu.models import draft as draft_mod
    from msd_tpu.models import llama as L
    from msd_tpu.train.data_gen import record_from_traj
    from msd_tpu.train.draft_train import TrainConfig
    from msd_tpu.train.trainer import DraftTrainer, TrainerConfig

    cfg = LlamaConfig.tiny(vocab_size=256, hidden_size=64, layers=2, heads=4,
                           intermediate_size=128, max_pos=512)
    dcfg = DraftConfig(text=cfg, medusa_heads=4)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    tp = L.init_llama_params(k1, cfg)
    tp["lm_head"] = tp["lm_head"] * 3.0
    dp = draft_mod.init_draft_params(k2, dcfg)
    dp["medusa"] = draft_mod.init_medusa_params(k3, dcfg)
    dp["embed_tokens"] = tp["embed_tokens"]

    eng = EngineConfig(max_seq_len=256, prompt_pad_multiple=32,
                       tree=TreeConfig(top_k=4, max_depth=5, num_nodes=24))
    gen = MSDGenerator(tp, dp, cfg, dcfg, eng, eos_id=-1)
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 250, size=9).astype(np.int32)

    ar = gen.naive_generate(ids, max_new_tokens=40).tokens
    r0 = gen.generate(ids, max_new_tokens=40, collect_hiddens=True)
    np.testing.assert_array_equal(ar, r0.tokens)  # lossless w/ random heads

    rec = record_from_traj(r0.traj_hidden, r0.exp_ids, len(ids), len(ids), 0,
                           None, np.asarray(tp["embed_tokens"]), pad_to=64)
    tc = TrainerConfig(
        train=TrainConfig(lr=3e-3, warmup_steps=5, total_steps=600,
                          noise_std=0.0, noise_rel=0.01, v_norm=True,
                          medusa_w=1.0),
        batch_size=1, max_len=64, num_epochs=1, ckpt_dir="/tmp/med_ckpt",
        log_every=10 ** 9)
    trainer = DraftTrainer(dcfg, dp, tp["lm_head"], tc)
    last = {}
    for _ in range(600):
        last = trainer.run_epoch([], [rec], log=lambda *a: None)
        if trainer.step_count >= 600:
            break
    assert last["medusa1_agree"] > 0.5, last

    gen2 = MSDGenerator(tp, trainer.params, cfg, dcfg, eng, eos_id=-1)
    r1 = gen2.generate(ids, max_new_tokens=40)
    np.testing.assert_array_equal(ar, r1.tokens)  # still lossless
    assert r1.avg_accept_len > r0.avg_accept_len + 0.5, \
        (r0.avg_accept_len, r1.avg_accept_len)
    # depth >= 2 acceptance happens (tokens-per-step bucket >= 3)
    assert np.asarray(r1.alpha_hist)[3:].sum() > 0, r1.alpha_hist


def test_medusa_tapered_widths():
    """medusa_widths tapers per-depth candidate counts; the static layout,
    parents and retrieve paths must stay consistent and greedy MSD must stay
    lossless at depths beyond the uniform top_k budget."""
    import jax
    import jax.numpy as jnp

    from msd_tpu.configs import DraftConfig, EngineConfig, LlamaConfig, \
        TreeConfig
    from msd_tpu.engine.generator import MSDGenerator
    from msd_tpu.models import draft as draft_mod
    from msd_tpu.models import llama as L

    cfg = LlamaConfig.tiny(vocab_size=256, hidden_size=64, layers=2, heads=4,
                           intermediate_size=128, max_pos=512)
    widths = (4, 3, 2, 1, 1, 1)
    dcfg = DraftConfig(text=cfg, medusa_heads=len(widths) - 1)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    tp = L.init_llama_params(k1, cfg)
    dp = draft_mod.init_draft_params(k2, dcfg)
    dp["medusa"] = draft_mod.init_medusa_params(k3, dcfg)
    dp["embed_tokens"] = tp["embed_tokens"]
    eng = EngineConfig(max_seq_len=256, prompt_pad_multiple=32,
                       tree=TreeConfig(top_k=4, max_depth=len(widths),
                                       num_nodes=16, medusa_widths=widths))
    gen = MSDGenerator(tp, dp, cfg, dcfg, eng, eos_id=-1)
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 250, size=9).astype(np.int32)
    ar = gen.naive_generate(ids, max_new_tokens=40).tokens
    r = gen.generate(ids, max_new_tokens=40)
    np.testing.assert_array_equal(ar, r.tokens)


def test_medusa_choices_tree():
    """medusa_choices: sparse cartesian-product static trees (reference
    choices.py mc_sim_7b_63 analog for position-based medusa heads).

    (a) a choices tree encoding exactly the backbone-widths layout commits
        the same greedy tokens with the same per-step acceptance as the
        equivalent medusa_widths config; (b) a true cross-product tree
        (branches under rank-1/2 depth-1 candidates) stays lossless and
        never accepts fewer tokens per step than its backbone subset;
        (c) prefix closure is applied for paths given without prefixes."""
    import dataclasses

    import jax

    from msd_tpu.configs import DraftConfig, EngineConfig, LlamaConfig, \
        TreeConfig
    from msd_tpu.engine.generator import MSDGenerator
    from msd_tpu.models import draft as draft_mod
    from msd_tpu.models import llama as L

    cfg = LlamaConfig.tiny(vocab_size=256, hidden_size=64, layers=2, heads=4,
                           intermediate_size=128, max_pos=512)
    widths = (4, 2, 1, 1)
    dcfg = DraftConfig(text=cfg, medusa_heads=len(widths) - 1)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    tp = L.init_llama_params(k1, cfg)
    tp["lm_head"] = tp["lm_head"] * 3.0
    dp = draft_mod.init_draft_params(k2, dcfg)
    dp["medusa"] = draft_mod.init_medusa_params(k3, dcfg)
    dp["embed_tokens"] = tp["embed_tokens"]
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 250, size=9).astype(np.int32)

    def run(tree):
        eng = EngineConfig(max_seq_len=256, prompt_pad_multiple=32, tree=tree)
        gen = MSDGenerator(tp, dp, cfg, dcfg, eng, eos_id=-1)
        return gen.generate(ids, max_new_tokens=40)

    # (a) backbone encoded as choices == medusa_widths, bitwise
    base = TreeConfig(top_k=4, max_depth=len(widths), num_nodes=16,
                      medusa_widths=widths)
    backbone = tuple((0,) * (d - 1) + (r,)
                     for d in range(1, len(widths) + 1)
                     for r in range(widths[d - 1]))
    rw = run(base)
    rc = run(dataclasses.replace(base, medusa_widths=None,
                                 medusa_choices=backbone))
    np.testing.assert_array_equal(rw.tokens, rc.tokens)
    assert rw.accept_steps == rc.accept_steps
    assert rw.accept_len_sum == rc.accept_len_sum

    ar = MSDGenerator(tp, dp, cfg, dcfg,
                      EngineConfig(max_seq_len=256, prompt_pad_multiple=32,
                                   tree=base),
                      eos_id=-1).naive_generate(ids, max_new_tokens=40).tokens

    # (b) cross-product tree: backbone + full depth-2 fan under ranks 1-3 +
    # rank-1 continuation chains — lossless; the FIRST step (identical
    # prefill state, superset of backbone paths) accepts >= the backbone's
    cross = backbone + ((1, 0), (2, 0), (3, 0), (0, 1), (1, 1),
                        (1, 0, 0), (1, 0, 0, 0))
    cross_tree = dataclasses.replace(base, num_nodes=24, medusa_widths=None,
                                     medusa_choices=cross)
    rx = run(cross_tree)
    np.testing.assert_array_equal(ar, rx.tokens)

    def first_step_accept(tree):
        eng = EngineConfig(max_seq_len=256, prompt_pad_multiple=32, tree=tree)
        gen = MSDGenerator(tp, dp, cfg, dcfg, eng, eos_id=-1)
        r1 = gen.generate(ids, max_new_tokens=1)
        assert r1.accept_steps == 1
        return r1.accept_len_sum

    assert first_step_accept(cross_tree) >= first_step_accept(base)

    # (c) closure: leaves-only spec runs (prefixes inserted automatically)
    leaves = ((3, 0), (0, 1), (1, 0, 0, 0), (0, 0, 0, 0))
    rl = run(dataclasses.replace(base, num_nodes=16, medusa_widths=None,
                                 medusa_choices=leaves))
    np.testing.assert_array_equal(ar, rl.tokens)


def test_greedy_round_bits_lossless_and_pinned_first_token():
    """Canonical greedy argmax (greedy_round_bits > 0): MSD == AR with the
    rounding applied identically on both paths, and first_token() pinning
    keeps the output unchanged (the pin injects AR's own token 1)."""
    sp = SamplingParams(greedy_round_bits=6)
    g = make_gen(sp=sp)
    rng = np.random.default_rng(3)
    for trial in range(3):
        ids = rng.integers(3, 120, size=rng.integers(4, 30)).astype(np.int32)
        ar = g.naive_generate(ids, max_new_tokens=24)
        tok0 = g.first_token(ids, max_new_tokens=24)
        assert tok0 == int(ar.tokens[0])
        msd = g.generate(ids, max_new_tokens=24, first_token=tok0)
        np.testing.assert_array_equal(
            msd.tokens, ar.tokens,
            err_msg=f"trial {trial}: rounded-greedy MSD diverged from AR")


@pytest.mark.quick
def test_canon_logits_properties():
    """Rounding is idempotent, monotone in comparisons it preserves, and a
    no-op at bits=0; argmax over rounded logits breaks exact ties toward the
    lower index regardless of tiny perturbations."""
    from msd_tpu.ops.sampling import canon_logits
    x = jnp.asarray(np.random.default_rng(0).normal(size=(64,)) * 30,
                    jnp.float32)
    r1 = canon_logits(x, 6)
    r2 = canon_logits(r1, 6)
    np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
    np.testing.assert_array_equal(np.asarray(canon_logits(x, 0)),
                                  np.asarray(x))
    # two near-tie values collapse to the same bucket -> argmax picks the
    # lower index in both perturbed copies
    base = jnp.zeros((8,), jnp.float32).at[2].set(10.0).at[5].set(10.0)
    a = base.at[5].add(1e-4)   # below the 2^-6 * 8 quantum at magnitude 10
    b = base.at[2].add(1e-4)
    ia = int(jnp.argmax(canon_logits(a, 6)))
    ib = int(jnp.argmax(canon_logits(b, 6)))
    assert ia == ib == 2


def test_share_prefill_ar_matches_msd():
    """naive_generate(share_prefill=True) consumes the MSD prefill program's
    state; output must equal both the plain AR path and greedy MSD."""
    sp = SamplingParams(greedy_round_bits=6)
    g = make_gen(sp=sp)
    rng = np.random.default_rng(5)
    for _ in range(2):
        ids = rng.integers(3, 120, size=rng.integers(4, 24)).astype(np.int32)
        ar_plain = g.naive_generate(ids, max_new_tokens=20)
        ar_shared = g.naive_generate(ids, max_new_tokens=20,
                                     share_prefill=True, collect_hiddens=True)
        msd = g.generate(ids, max_new_tokens=20, collect_hiddens=True,
                         split_programs=True, fetch_hiddens=False)
        np.testing.assert_array_equal(ar_shared.tokens, ar_plain.tokens)
        np.testing.assert_array_equal(msd.tokens, ar_shared.tokens)
        assert msd.traj_hidden is None  # fetch_hiddens=False skips transfer


def test_autotune_tree_alpha_picks_and_applies():
    """autotune_tree_alpha measures end-to-end alpha/step per candidate and
    installs the argmax tree on the generator."""
    from msd_tpu.configs import TreeConfig
    from msd_tpu.engine.autotune import autotune_tree_alpha, widths_tree

    g = make_gen()
    base = g.eng.tree
    cands = [base, widths_tree((4, 2, 1), base),
             TreeConfig(top_k=2, max_depth=2, num_nodes=5)]
    ids = np.arange(3, 12, dtype=np.int32)
    info = autotune_tree_alpha(g, cands, ids, max_new=12, t_ar=0.01,
                               repeats=1)
    assert len(info["sweep"]) == 3
    assert g.eng.tree.num_nodes == info["picked_nodes"]
    assert info["picked_nodes"] in [c.num_nodes for c in cands]
    # the picked tree still decodes losslessly
    ar = g.naive_generate(ids, max_new_tokens=12)
    msd = g.generate(ids, max_new_tokens=12)
    np.testing.assert_array_equal(msd.tokens, ar.tokens)
