"""Calibrator tests: PAV isotonic, grouped hierarchy, device-table parity,
and end-to-end calibrated drafting (which must preserve losslessness)."""

import numpy as np
import pytest

import jax.numpy as jnp

from msd_tpu.calib.device import CalibTables, predict_proba
from msd_tpu.calib.grouped import GroupedIsotonicCalibrator, soft_labels_from
from msd_tpu.calib.isotonic import IsotonicRegression
from msd_tpu.calib.token_class import (classify_text, synthetic_vocab_table,
                                       CONTENT, FUNC_PUNCT, NUMBER)

from tests.test_spec_engine import make_gen


@pytest.mark.quick
def test_pav_monotone_and_interp():
    x = np.array([0.1, 0.2, 0.3, 0.4, 0.5])
    y = np.array([0.0, 1.0, 0.0, 1.0, 1.0])
    iso = IsotonicRegression().fit(x, y)
    pred = iso.predict(x)
    assert np.all(np.diff(pred) >= -1e-12)  # monotone
    # mean preserved under uniform weights
    np.testing.assert_allclose(pred.mean(), y.mean(), atol=1e-9)
    # clipping out of bounds
    assert iso.predict(np.array([-1.0]))[0] == pred[0]
    assert iso.predict(np.array([2.0]))[0] == pred[-1]


@pytest.mark.quick
def test_pav_matches_bruteforce():
    rng = np.random.default_rng(0)
    x = rng.uniform(size=50)
    y = (rng.uniform(size=50) < x).astype(float)  # increasing trend
    iso = IsotonicRegression().fit(x, y)
    pred = iso.predict(np.sort(x))
    # isotonic fit minimizes squared error among monotone fits; check it
    # beats the constant fit and is monotone
    assert np.all(np.diff(pred) >= -1e-12)
    const_err = np.mean((y - y.mean()) ** 2)
    fit_err = np.mean((iso.predict(x) - y) ** 2)
    assert fit_err <= const_err + 1e-12


def _fake_features(n, rng):
    return {
        "token_category": rng.choice(["content", "func_punct", "number"], n),
        "avg_visual_attention_intensity": rng.uniform(size=n),
        "tree_depth": rng.integers(1, 7, n).astype(float),
        "draft_margin": rng.uniform(size=n),
        "draft_confidence": rng.uniform(size=n),
    }


@pytest.mark.quick
def test_grouped_calibrator_fit_predict_and_tables():
    rng = np.random.default_rng(1)
    n = 3000
    feats = _fake_features(n, rng)
    # label correlated with confidence
    hard = (rng.uniform(size=n) < feats["draft_confidence"]).astype(float)
    soft = np.clip(feats["draft_confidence"] + rng.normal(0, 0.05, n), 0, 1)

    cal = GroupedIsotonicCalibrator(min_samples_per_group=50,
                                    max_grouping_level=2, target="soft")
    cal.fit(feats, soft, hard)
    p = cal.predict_proba(feats)
    assert p.shape == (n,)
    assert np.all((p >= 1e-4) & (p <= 1 - 1e-4))
    # calibrated probs should correlate strongly with confidence
    assert np.corrcoef(p, feats["draft_confidence"])[0, 1] > 0.8

    m = cal.evaluate(feats, soft, hard)
    assert m["ece_eqfreq20"] < 0.1

    # device tables reproduce host predictions
    export = cal.export_tables(n_breakpoints=1024)
    vt = synthetic_vocab_table(1000)
    ct = CalibTables.from_host(export, vt)
    cmap = {"content": CONTENT, "func_punct": FUNC_PUNCT, "number": NUMBER}
    # pick token ids whose class matches the synthetic categories
    cats = np.asarray([cmap[c] for c in feats["token_category"]])
    tok_ids = np.array([np.nonzero(vt == c)[0][0] for c in cats])
    p_dev = np.asarray(predict_proba(
        ct, jnp.asarray(tok_ids), jnp.asarray(feats["draft_confidence"]),
        jnp.asarray(feats["avg_visual_attention_intensity"]),
        jnp.asarray(feats["tree_depth"].astype(np.int32)),
        jnp.asarray(feats["draft_margin"])))
    # isotonic fits have arbitrarily sharp steps at data points; a dense
    # table can only bound the error statistically, not pointwise
    err = np.abs(p_dev - p)
    assert np.quantile(err, 0.99) < 2e-2
    assert err.max() < 5e-2


@pytest.mark.quick
def test_soft_labels():
    np.testing.assert_allclose(
        soft_labels_from(np.array([0.5, 0.1]), np.array([0.25, 0.2])),
        np.array([1.0, 0.5]))


@pytest.mark.quick
def test_token_classify():
    assert classify_text("123") == NUMBER
    assert classify_text("3.14") == NUMBER
    assert classify_text(".") == FUNC_PUNCT
    assert classify_text("the") == FUNC_PUNCT
    assert classify_text("<s>") == FUNC_PUNCT
    assert classify_text("cat") == CONTENT


@pytest.mark.quick
def test_collect_then_calibrated_generation_lossless():
    """Full loop: collect calibration data, fit, install device tables,
    decode with calibrated tree construction — greedy output must STILL
    equal AR greedy (calibration only changes what gets drafted)."""
    gen = make_gen(seed=0)
    ids = np.arange(3, 12, dtype=np.int32)

    r = gen.generate(ids, max_new_tokens=24, collect_calibration=True)
    cd = r.calib_data
    assert cd is not None and cd["token"].shape[0] == r.accept_steps
    valid = cd["valid"].astype(bool)
    assert valid.sum() > 0
    # features behave: confidences in [0,1], accepts subset of valid
    assert np.all((cd["draft_conf"][valid] >= 0)
                  & (cd["draft_conf"][valid] <= 1.0 + 1e-5))
    assert np.all(cd["accept"][valid] >= 0)

    feats = {
        "token_category": np.asarray(
            ["content"] * int(valid.sum())),
        "avg_visual_attention_intensity": cd["attn"][valid],
        "tree_depth": cd["depth"][valid].astype(float),
        "draft_margin": cd["margin"][valid],
        "draft_confidence": cd["draft_conf"][valid],
    }
    soft = soft_labels_from(cd["base_conf"][valid],
                            np.maximum(cd["draft_conf"][valid], 1e-6))
    hard = cd["base_top1"][valid].astype(float)
    cal = GroupedIsotonicCalibrator(min_samples_per_group=20,
                                    max_grouping_level=2, target="soft")
    cal.fit(feats, soft, hard)

    vt = synthetic_vocab_table(128)
    gen.set_calibrator(CalibTables.from_host(cal.export_tables(), vt,
                                             base_alpha=1.0))
    ar = gen.naive_generate(ids, max_new_tokens=24)
    msd_cal = gen.generate(ids, max_new_tokens=24, use_calibration=True)
    np.testing.assert_array_equal(msd_cal.tokens, ar.tokens)
    assert msd_cal.accept_steps > 0


def test_compare_ece_and_timing():
    from msd_tpu.calib.evaluate import (benchmark_calibrator_timing,
                                        compare_ece_train_val)
    rng = np.random.default_rng(2)
    n = 2000
    feats = _fake_features(n, rng)
    hard = (rng.uniform(size=n) < feats["draft_confidence"] ** 2).astype(float)
    soft = np.clip(feats["draft_confidence"] ** 2
                   + rng.normal(0, 0.03, n), 0, 1)
    out = compare_ece_train_val(feats, soft, hard, min_samples_per_group=50)
    # conf^2 labels make raw confidence badly calibrated; fit must improve ECE
    assert out["val"]["post"]["ece_eqfreq20"] < out["val"]["pre"]["ece_eqfreq20"]
    t = benchmark_calibrator_timing(out["calibrator"], feats, repeats=2,
                                    vocab_size=500)
    assert t["host_predict_s"] > 0 and t["device_predict_s"] > 0


def test_repetition_penalty_op():
    import jax.numpy as jnp
    from msd_tpu.ops.sampling import apply_repetition_penalty
    logits = jnp.asarray([1.0, -1.0, 2.0, 0.5])
    ids = jnp.asarray([0, 1, 3, 99], jnp.int32)   # 99 beyond cur_len
    out = np.asarray(apply_repetition_penalty(logits, ids, jnp.int32(3), 2.0))
    np.testing.assert_allclose(out, [0.5, -2.0, 2.0, 0.25])


def test_sampling_with_repetition_penalty_runs():
    from msd_tpu.ops.sampling import SamplingParams
    gen = make_gen()
    ids = np.arange(3, 11, dtype=np.int32)
    sp = SamplingParams(temperature=1.0, repetition_penalty=1.3)
    r = gen.generate(ids, max_new_tokens=12, sp=sp, seed=3)
    assert r.accept_steps > 0


def test_rerank_changes_candidate_order():
    """A calibrator that kills one candidate's acceptance probability must
    push it down the reranked order (behavioral check of _rerank)."""
    import jax
    from msd_tpu.engine import spec_engine as SE
    from msd_tpu.configs import (DraftConfig, EngineConfig, LlamaConfig,
                                 TreeConfig)
    from msd_tpu.ops.sampling import SamplingParams

    V, K = 64, 4
    # tables: probability depends ONLY on token type; type-2 tokens ~0
    table = np.full((3, 5, 2, 3, 8), 0.5, np.float32)
    table[2] = 1e-3   # 'number' type: near-zero acceptance
    vt = np.zeros((V,), np.int8)
    bad_token = 7
    vt[bad_token] = 2
    export = {"table": table, "attn_quantiles": np.asarray([.2, .4, .6, .8]),
              "margin_quantiles": np.asarray([.33, .67]),
              "global_mean": np.float32(0.5)}
    ct = CalibTables.from_host(export, vt, base_alpha=10.0)

    cfg = LlamaConfig.tiny(vocab_size=V)
    st = SE.Statics(tcfg=cfg, dcfg=DraftConfig(text=cfg),
                    tree=TreeConfig(top_k=K, max_depth=4, num_nodes=12),
                    eng=EngineConfig(max_seq_len=128), sp=SamplingParams(),
                    n_img=0, eos_id=2, max_new=8, use_calibration=True)
    params = {"calib": ct}

    logits = np.zeros((1, V), np.float32)
    cand = np.asarray([[bad_token, 3, 5, 9]], np.int32)
    probs = np.asarray([[0.4, 0.3, 0.2, 0.1]], np.float32)
    new_ids, new_scores, margin = SE._rerank(
        st, params, jnp.asarray(logits), jnp.asarray(cand),
        jnp.asarray(probs), jnp.zeros((K,), jnp.float32), jnp.int32(1))
    new_ids = np.asarray(new_ids[0])
    # the killed token drops from rank 0; order among others preserved
    assert new_ids[0] != bad_token
    assert list(new_ids[:3]) == [3, 5, 9]
    assert new_ids[3] == bad_token


@pytest.mark.quick
def test_adaptive_alpha_semantics():
    from msd_tpu.calib.device import adaptive_alpha
    vt = np.zeros((10,), np.int8)
    vt[4] = 2  # number token
    export = {"table": np.full((3, 5, 2, 3, 8), 0.5, np.float32),
              "attn_quantiles": np.asarray([.2, .4, .6, .8]),
              "margin_quantiles": np.asarray([.33, .67]),
              "global_mean": np.float32(0.5)}
    ct = CalibTables.from_host(export, vt, base_alpha=1.0)
    toks = jnp.asarray([0, 1, 4, 2], jnp.int32)
    conf = jnp.asarray([0.9, 0.5, 0.5, 0.1])
    attn = jnp.asarray([0.9, 0.5, 0.5, 0.1])
    depth = jnp.asarray([1, 3, 3, 6], jnp.int32)
    margin = jnp.asarray([0.9, 0.5, 0.5, 0.05])
    a = np.asarray(adaptive_alpha(ct, toks, conf, attn, depth, margin))
    assert np.all((a >= 0.2 - 1e-6) & (a <= 0.8 + 1e-6))  # clip range
    assert a[3] > a[0]            # deeper + low margin + low attn -> higher
    assert a[2] > a[1] or np.isclose(a[2], min(a[2], 0.8))  # number boost


def test_attn_feature_last_row_mode_lossless():
    """The principled visual-attention feature mode keeps calibrated
    decoding lossless and produces a uniform per-candidate feature."""
    from tests.test_spec_engine import build_tiny
    from msd_tpu.configs import EngineConfig, TreeConfig
    from msd_tpu.engine.generator import MSDGenerator

    cfg, dcfg, tp, dp = build_tiny(0)
    eng = EngineConfig(max_seq_len=512, prompt_pad_multiple=32,
                       tree=TreeConfig(top_k=4, max_depth=4, num_nodes=12))
    gen = MSDGenerator(tp, dp, cfg, dcfg, eng, eos_id=2,
                       attn_feature_mode="last_row")
    ids = np.arange(3, 12, dtype=np.int32)
    r = gen.generate(ids, max_new_tokens=16, collect_calibration=True)
    ar = gen.naive_generate(ids, max_new_tokens=16)
    np.testing.assert_array_equal(r.tokens, ar.tokens)
    assert r.calib_data is not None


def test_calibration_logger_session_api():
    """Session protocol parity (calibration_logger.py:44-321): start ->
    log_draft_confidence -> log_attention_weights -> log_acceptance, then
    token-level extraction + cross-modal quantile analysis (:482-548)."""
    from msd_tpu.calib.logger import CalibrationLogger

    lg = CalibrationLogger()
    rng = np.random.default_rng(0)
    for sess in range(6):
        lg.start_draft_session(img_start_idx=2, img_end_idx=6)
        n = 8
        conf = rng.uniform(0.05, 0.95, size=n)
        lg.log_draft_confidence(np.log(conf), np.log(conf),  # log-space in
                                draft_tokens=rng.integers(0, 100, n),
                                tree_positions=np.arange(n),
                                tree_depths=1 + np.arange(n) // 3,
                                parent_positions=np.maximum(
                                    np.arange(n) - 1, 0),
                                log_space=True)
        lg.log_attention_weights(rng.uniform(0, 1, size=n))
        lg.log_acceptance(accepted_length=sess % 4)

    assert len(lg.draft_sessions) == 6
    assert lg.current_session is None
    data = lg.get_token_level_data()
    assert len(data) == 48
    # labels: first accepted_length per session are 1
    assert data[0]["is_accepted"] == 0          # session 0 accepted 0
    assert data[8]["is_accepted"] == 1          # session 1 accepted 1
    assert data[9]["is_accepted"] == 0
    # log-space confidences were exponentiated back to probabilities
    assert all(0.0 <= d["path_confidence"] <= 1.0 for d in data)

    q = lg.analyze_by_cross_modal_attention(num_quantiles=4)
    assert set(q) == {"Q1", "Q2", "Q3", "Q4"}
    assert sum(v["count"] for v in q.values()) == 48
    # rank-based equal-count bins: attention ranges are ordered
    assert (q["Q1"]["avg_cross_modal_attention"]
            < q["Q4"]["avg_cross_modal_attention"])
    for v in q.values():
        assert 0.0 <= v["ece"] <= 1.0


def test_calibration_logger_sessions_from_engine_rows():
    """log_request splits the device calib_log into per-step sessions and
    get_calibration_stats reports per-depth + cross-modal quantiles."""
    from msd_tpu.calib.logger import CalibrationLogger

    lg = CalibrationLogger()
    rng = np.random.default_rng(1)
    S, N = 5, 12
    valid = np.zeros((S, N), np.int32)
    valid[:, :7] = 1
    calib = {
        "token": rng.integers(0, 100, (S, N)),
        "depth": 1 + rng.integers(0, 3, (S, N)),
        "draft_conf": rng.uniform(0, 1, (S, N)),
        "attn": rng.uniform(0, 1, (S, N)),
        "margin": rng.uniform(0, 1, (S, N)),
        "base_conf": rng.uniform(0, 1, (S, N)),
        "base_top1": rng.integers(0, 2, (S, N)),
        "accept": rng.integers(0, 2, (S, N)),
        "valid": valid,
    }
    lg.log_request(calib)
    assert len(lg.draft_sessions) == S
    stats = lg.get_calibration_stats()
    assert stats["n_candidates"] == S * 7
    assert stats["n_sessions"] == S
    assert set(stats["by_depth"]) <= {1, 2, 3}
    assert stats["cross_modal_quantiles"]
    assert "avg_accepted_length" in stats


def test_calibrated_rerank_width1_medusa():
    """use_calibration over a width-1 medusa plan: _rerank sees K=1
    candidate columns and must not index cand_probs[:, 1] (static OOB at
    trace time); greedy stays lossless."""
    import jax

    from msd_tpu.configs import DraftConfig, EngineConfig, LlamaConfig, \
        TreeConfig
    from msd_tpu.engine.generator import MSDGenerator
    from msd_tpu.models import draft as draft_mod
    from msd_tpu.models import llama as L

    cfg = LlamaConfig.tiny(vocab_size=128, hidden_size=32, layers=2, heads=4,
                           intermediate_size=64, max_pos=512)
    dcfg = DraftConfig(text=cfg, medusa_heads=3)
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(0), 3)
    tp = L.init_llama_params(k1, cfg)
    dp = draft_mod.init_draft_params(k2, dcfg)
    dp["medusa"] = draft_mod.init_medusa_params(k3, dcfg)
    dp["embed_tokens"] = tp["embed_tokens"]
    eng = EngineConfig(max_seq_len=256, prompt_pad_multiple=32,
                       tree=TreeConfig(top_k=1, max_depth=4, num_nodes=4,
                                       medusa_widths=(1, 1, 1)))
    gen = MSDGenerator(tp, dp, cfg, dcfg, eng, eos_id=-1)
    ids = np.arange(3, 12, dtype=np.int32)

    r = gen.generate(ids, max_new_tokens=16, collect_calibration=True)
    cd = r.calib_data
    valid = cd["valid"].astype(bool)
    feats = {
        "token_category": np.asarray(["content"] * int(valid.sum())),
        "avg_visual_attention_intensity": cd["attn"][valid],
        "tree_depth": cd["depth"][valid].astype(float),
        "draft_margin": cd["margin"][valid],
        "draft_confidence": cd["draft_conf"][valid],
    }
    soft = soft_labels_from(cd["base_conf"][valid],
                            np.maximum(cd["draft_conf"][valid], 1e-6))
    cal = GroupedIsotonicCalibrator(min_samples_per_group=2,
                                    max_grouping_level=1, target="soft")
    cal.fit(feats, soft, cd["base_top1"][valid].astype(float))
    gen.set_calibrator(CalibTables.from_host(
        cal.export_tables(), synthetic_vocab_table(128), base_alpha=1.0))

    ar = gen.naive_generate(ids, max_new_tokens=16)
    msd = gen.generate(ids, max_new_tokens=16, use_calibration=True)
    np.testing.assert_array_equal(msd.tokens, ar.tokens)
