"""loglikelihood + generate_until_multi_round request types.

Covers VERDICT item 2: the abstract lmms surface (api/model.py:17-127) beyond
generate_until — teacher-forced continuation scoring (engine/scoring.py) and
the round-looped generation protocol (llava_onevision.py:568-773)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msd_tpu.configs import (ClipVisionConfig, DraftConfig, EngineConfig,
                             LlamaConfig, LlavaConfig, TreeConfig,
                             IMAGE_TOKEN_INDEX)
from msd_tpu.engine.generator import MSDGenerator
from msd_tpu.harness.evaluator import evaluate
from msd_tpu.harness.models.llava_msd import LlavaMSD, SimpleTokenizer
from msd_tpu.harness.registry import register_task
from msd_tpu.harness.tasks import TaskConfig, make_mc_ppl_task, _synth_image
from msd_tpu.models import clip_vit as C
from msd_tpu.models import draft as draft_mod
from msd_tpu.models import llama as L
from msd_tpu.models.llava import encode_image, init_projector_params


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


def test_score_greedy_continuation_is_greedy(tiny_gen):
    rng = np.random.default_rng(0)
    prompt = rng.integers(3, 500, size=12).astype(np.int32)
    cont = tiny_gen.naive_generate(prompt, max_new_tokens=8).tokens
    full = np.concatenate([prompt, cont]).astype(np.int32)
    lp, greedy = tiny_gen.score(full, cont_start=len(prompt))
    assert greedy
    assert lp < 0.0
    # perturbing one continuation token breaks greediness and drops logprob
    bad = full.copy()
    bad[len(prompt) + 2] = (bad[len(prompt) + 2] + 7) % 500 + 3
    lp_bad, greedy_bad = tiny_gen.score(bad, cont_start=len(prompt))
    assert not greedy_bad
    assert lp_bad < lp


def test_score_additivity(tiny_gen):
    """Causality: lp(full, s) == lp(full[:m], s) + lp(full, m)."""
    rng = np.random.default_rng(1)
    full = rng.integers(3, 500, size=24).astype(np.int32)
    s, m = 10, 17
    lp_all, _ = tiny_gen.score(full, cont_start=s)
    lp_head, _ = tiny_gen.score(full[:m], cont_start=s)
    lp_tail, _ = tiny_gen.score(full, cont_start=m)
    assert lp_all == pytest.approx(lp_head + lp_tail, abs=1e-3)


def test_score_matches_manual_forward(tiny_gen):
    """Cross-check the jitted program against a direct softmax computation."""
    rng = np.random.default_rng(2)
    full = rng.integers(3, 500, size=16).astype(np.int32)
    s = 9
    lp, greedy = tiny_gen.score(full, cont_start=s)

    tcfg = tiny_gen.tcfg
    tp = tiny_gen.params["target"]
    from msd_tpu.ops.attention import causal_prefill_bias
    T = len(full)
    emb = tp["embed_tokens"][full]
    kv = L.init_kv_cache(tcfg, T, emb.dtype)
    hidden, _ = L.llama_forward(tp, tcfg, emb,
                                jnp.arange(T, dtype=jnp.int32), kv,
                                jnp.int32(0), causal_prefill_bias(T, T),
                                tiny_gen.params["cos_t"],
                                tiny_gen.params["sin_t"])
    logits = np.asarray(L.lm_head(tp, hidden), np.float64)
    logp = logits - np.log(np.exp(logits - logits.max(-1, keepdims=True))
                           .sum(-1, keepdims=True)) - logits.max(-1,
                                                                 keepdims=True)
    want = sum(logp[r, full[r + 1]] for r in range(s - 1, T - 1))
    assert lp == pytest.approx(want, rel=1e-4)
    want_greedy = all(int(np.argmax(logits[r])) == int(full[r + 1])
                      for r in range(s - 1, T - 1))
    assert greedy == want_greedy


def test_score_with_image(tiny_gen):
    rng = np.random.default_rng(3)
    prompt = rng.integers(3, 500, size=10).astype(np.int32)
    prompt[2] = IMAGE_TOKEN_INDEX
    feats = jnp.asarray(rng.normal(size=(4, 64)) * 0.1, jnp.float32)
    cont = tiny_gen.naive_generate(prompt, img_feats=feats,
                                   max_new_tokens=6).tokens
    full = np.concatenate([prompt, cont]).astype(np.int32)
    lp, greedy = tiny_gen.score(full, cont_start=len(prompt),
                                img_feats=feats)
    assert greedy and lp < 0.0
    # without the image the same continuation is (generically) not greedy-
    # matched with the same likelihood
    lp_noimg, _ = tiny_gen.score(np.where(full == IMAGE_TOKEN_INDEX, 3,
                                          full).astype(np.int32),
                                 cont_start=len(prompt))
    assert lp_noimg != pytest.approx(lp, abs=1e-6)


def test_qwen_score_greedy():
    from msd_tpu.harness.models.qwen2_vl_msd import Qwen2VLMSD
    lm = Qwen2VLMSD.from_tiny()
    rng = np.random.default_rng(4)
    prompt = rng.integers(3, 500, size=11).astype(np.int32)
    cont = lm.gen.naive_generate(prompt, max_new_tokens=6).tokens
    full = np.concatenate([prompt, cont]).astype(np.int32)
    lp, greedy = lm.gen.score(full, cont_start=len(prompt))
    assert greedy and lp < 0.0


# ---------------------------------------------------------------------------
# harness plumbing
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def tiny_llava_adapter():
    return LlavaMSD.from_tiny()


def test_loglikelihood_task_end_to_end(tiny_llava_adapter):
    task = make_mc_ppl_task("mc_ppl_test")
    register_task("mc_ppl_test", task)
    out = evaluate(tiny_llava_adapter, ["mc_ppl_test"], limit=3)
    res = out["results"]["mc_ppl_test"]
    assert 0.0 <= res["accuracy"] <= 1.0
    samples = out["details"]["mc_ppl_test"]["samples"]
    assert len(samples) == 3
    # each sample carries one (logprob, is_greedy) pair per choice
    assert len(samples[0]["response"]) == 4
    lp, greedy = samples[0]["response"][0]
    assert isinstance(lp, float) and isinstance(greedy, bool)


def test_adapter_loglikelihood_properties(tiny_llava_adapter):
    """Deterministic scoring; a continuation extension strictly lowers the
    summed logprob (each extra token contributes log p < 0); callable
    doc_to_target resolves against the doc.

    (is_greedy is exercised at the engine level in test_score_* — at the
    adapter level the template's trailing </s> is part of the scored span,
    as in the reference's labels, so text continuations are generically
    non-greedy.)"""
    lm = tiny_llava_adapter
    from msd_tpu.harness.instance import Instance

    doc = {"image": _synth_image(0), "answer": "blue"}
    ctx = "Describe."

    def ll(cont):
        req = Instance(request_type="loglikelihood", doc=doc,
                       arguments=(ctx, cont, lambda d: [d["image"]], 0, "t",
                                  "test"),
                       idx=0, task_name="t", doc_id=0)
        return lm.loglikelihood([req])[0]

    lp1, g1 = ll("blue")
    lp2, g2 = ll("blue")
    assert (lp1, g1) == (lp2, g2)
    lp_ext, _ = ll("blue and also red and green")
    assert lp_ext < lp1
    lp_callable, _ = ll(lambda d: d["answer"])
    assert lp_callable == pytest.approx(lp1)


def test_multi_round_generation(tiny_llava_adapter):
    """Round protocol: doc_to_text drives follow-up rounds + termination."""
    calls = []

    def doc_to_text(doc, previous_output=None, round_idx=0,
                    previous_round_info=None):
        if round_idx == 0:
            return "Round zero question?"
        calls.append((round_idx, list(previous_output), previous_round_info))
        if round_idx >= 2:
            return [], "", True, previous_output, previous_round_info
        return ([doc["image"]], f"Follow-up {round_idx}?", False,
                previous_output, {"round": round_idx})

    task = TaskConfig(
        name="mr_test",
        doc_to_text=doc_to_text,
        doc_to_visual=lambda d: [d["image"]],
        process_results=lambda d, r: {"n_rounds": float(len(r[0]))},
        output_type="generate_until_multi_round",
        gen_kwargs={"max_new_tokens": 4, "temperature": 0.0},
        metric_names=("n_rounds",),
        synthetic_docs=lambda n: [{"image": _synth_image(i)}
                                  for i in range(n)])
    register_task("mr_test", task)
    out = evaluate(tiny_llava_adapter, ["mr_test"], limit=2)
    assert out["results"]["mr_test"]["n_rounds"] == 2.0  # two rounds each
    # round 1 saw round 0's output; round 2 carried the info dict
    assert calls[0][0] == 1 and len(calls[0][1]) == 1
    assert calls[1][2] == {"round": 1}
