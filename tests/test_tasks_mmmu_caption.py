"""MMMU / VizWiz / COCO-caption task rebuilds.

Unit-level: the MMMU answer parsers (tasks/mmmu/utils.py rebuild) and the
native corpus captioning scorers (BLEU/ROUGE-L/CIDEr, pycocoevalcap
semantics). End-to-end: the three new TaskConfigs run through the evaluator
with the tiny adapter and produce their metric surfaces.
"""

import math

import numpy as np
import pytest

from msd_tpu.harness.task_utils import captioning as C
from msd_tpu.harness.task_utils import mmmu as U

# ---------------------------------------------------------------------------
# MMMU parsing / eval
# ---------------------------------------------------------------------------


def test_mmmu_construct_prompt_mc_and_open():
    doc = {"question": "<image 1> What is shown?",
           "question_type": "multiple-choice",
           "options": "['cat', 'dog', 'bird']"}
    p = U.construct_prompt(doc)
    assert "A. cat" in p and "B. dog" in p and "C. bird" in p
    assert p.endswith(U.MULTI_CHOICE_PROMPT)
    assert "<image" not in p
    q = U.construct_prompt({"question": "Count the dots",
                            "question_type": "open"})
    assert q.endswith(U.OPEN_ENDED_PROMPT)


def test_mmmu_parse_multi_choice_forms():
    i2a, choices = U.get_multi_choice_info(["red", "green", "blue"])
    assert choices == ["A", "B", "C"]
    assert U.parse_multi_choice_response("The answer is (B)", choices,
                                         i2a) == "B"
    assert U.parse_multi_choice_response("C. because...", choices, i2a) == "C"
    assert U.parse_multi_choice_response("A ", choices, i2a) == "A"
    # content match needs > 5 words (utils.py:302)
    long = "after much thought the color must surely be green here"
    assert U.parse_multi_choice_response(long, choices, i2a) == "B"
    # several letter hits: the last mention wins (utils.py:311-327)
    assert U.parse_multi_choice_response("(A) no wait (C)", choices,
                                         i2a) == "C"
    # unparseable: deterministic first choice (documented deviation)
    assert U.parse_multi_choice_response("hmm", choices, i2a) == "A"


def test_mmmu_open_parse_and_eval():
    preds = U.parse_open_response("The total is 1,234 apples")
    assert 1234.0 in preds
    assert U.eval_open("1234", preds)
    assert U.eval_open(["1,234"], preds)
    assert not U.eval_open("17", U.parse_open_response("the answer is 16"))
    # 1-char answers get space-padded to avoid substring hits
    assert U.normalize_str("x") == [" x", "x "]
    assert U.normalize_str("3.14159") == [3.14]


def test_mmmu_process_and_subdomains():
    doc = {"id": "validation_Art_3", "question_type": "multiple-choice",
           "options": "['1', '2']", "answer": "B"}
    row = U.process_results(doc, ["(B)"])
    assert row["mmmu_acc"] == 1.0
    assert U.extract_subset_name("validation_Art_Theory_12") == "Art_Theory"
    rows = [U.process_results(doc, ["(B)"]),
            U.process_results(doc, ["(A)"]),
            U.process_results({**doc, "id": "validation_Math_1"}, ["(B)"])]
    agg = U.aggregate_subdomains(rows)
    assert agg["mmmu_acc_Art"] == 0.5
    assert agg["mmmu_acc_Math"] == 1.0


# ---------------------------------------------------------------------------
# captioning scorers
# ---------------------------------------------------------------------------


def test_bleu_perfect_and_partial():
    hyps = ["a cat sits on the mat", "two dogs run fast"]
    refs = [[h] for h in hyps]
    b = C.corpus_bleu(hyps, refs)
    assert all(abs(x - 1.0) < 1e-9 for x in b)
    b2 = C.corpus_bleu(["a cat"], [["a dog"]])
    assert b2[0] == pytest.approx(0.5 * math.exp(1 - 2 / 2) * 1.0)
    assert b2[1] == 0.0 and b2[3] == 0.0  # no bigram match, no smoothing


def test_bleu_brevity_penalty():
    # 2-token hyp vs 4-token ref: bp = exp(1 - 4/2)
    b = C.corpus_bleu(["a cat"], [["a cat on mat"]])
    assert b[0] == pytest.approx(math.exp(-1.0), abs=1e-6)


def test_rouge_l():
    assert C.rouge_l(["a b c d"], [["a b c d"]]) == pytest.approx(1.0)
    # hyp "a c" vs ref "a b c": LCS=2, P=1, R=2/3, beta=1.2
    p, r, beta = 1.0, 2 / 3, 1.2
    want = (1 + beta**2) * p * r / (r + beta**2 * p)
    assert C.rouge_l(["a c"], [["a b c"]]) == pytest.approx(want)


def test_cider_identity_tops_mismatch():
    hyps = ["a red ball on grass", "a blue cube on sand",
            "three birds in the sky", "an empty white room"]
    refs = [[h] for h in hyps]
    perfect = C.cider(hyps, refs)
    assert perfect > 5.0  # identical hyp==ref scores near the 10.0 ceiling
    shuffled = C.cider(list(reversed(hyps)), refs)
    assert perfect > shuffled + 1.0


def test_caption_scores_rows():
    rows = [{"_pred": "a red ball", "_refs": ["a red ball", "red ball photo"]},
            {"_pred": "blue sky", "_refs": ["the blue sky"]}]
    out = C.caption_scores(rows)
    for k in ("coco_Bleu_1", "coco_Bleu_4", "coco_ROUGE_L", "coco_CIDEr"):
        assert k in out
    assert 0.0 <= out["coco_Bleu_1"] <= 1.0
    assert C.caption_scores([{"_pred": None, "_refs": []}]) == {}


# ---------------------------------------------------------------------------
# end-to-end through the evaluator (tiny adapter, synthetic docs)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tiny_lm():
    from msd_tpu.harness.models.llava_msd import LlavaMSD
    return LlavaMSD.from_tiny()


def test_evaluate_new_tasks_end_to_end(tiny_lm):
    from msd_tpu.harness.evaluator import evaluate
    from msd_tpu.harness.tasks import register_builtin_tasks
    register_builtin_tasks()
    out = evaluate(tiny_lm, ["mmmu_val", "vizwiz_vqa_val",
                             "coco2017_cap_val"], limit=4)
    res = out["results"]
    assert "mmmu_acc" in res["mmmu_val"]
    assert any(k.startswith("mmmu_acc_") for k in res["mmmu_val"])
    assert "exact_match" in res["vizwiz_vqa_val"]
    assert "coco_CIDEr" in res["coco2017_cap_val"]
    assert "coco_Bleu_4" in res["coco2017_cap_val"]
    # synthetic fallbacks must be loudly marked
    assert set(out["synthetic_tasks"]) >= {"mmmu_val", "coco2017_cap_val"}


def test_fractional_limit():
    """float --limit in (0,1) = fraction of docs (lmms-eval __main__:150)."""
    from msd_tpu.harness.__main__ import _parse_limit
    from msd_tpu.harness.tasks import make_vizwiz
    assert _parse_limit("8") == 8 and isinstance(_parse_limit("8"), int)
    assert _parse_limit("0.25") == 0.25
    task = make_vizwiz(None)
    full = task.load_docs(limit=None)
    frac = task.load_docs(limit=0.25)
    assert len(frac) == max(1, int(len(full) * 0.25))
