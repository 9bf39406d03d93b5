"""Round-3b extended task tier: scoring semantics for mme_realworld,
muirbench, websrc, qbench, longvideobench, mlvu, mmlu, mmlu_pro, gpqa,
synthdog, vatex, naturalbench (msd_tpu/harness/tasks_ext.py)."""

import json

import pytest

import numpy as np

pytestmark = pytest.mark.quick

from msd_tpu.harness.registry import get_task
from msd_tpu.harness.tasks import register_builtin_tasks
from msd_tpu.harness.tasks_ext import (edit_distance_accuracy,
                                       extract_letter, make_gpqa,
                                       make_longvideobench, make_mlvu,
                                       make_mme_realworld, make_mmlu,
                                       make_mmlu_pro, make_muirbench,
                                       make_naturalbench, make_qbench,
                                       make_synthdog, make_websrc,
                                       websrc_f1)

IMG = np.zeros((8, 8, 3), np.uint8)


def test_extract_letter_prefixes_and_long_answers():
    assert extract_letter("The best answer is C.") == "C"
    assert extract_letter("(B) because ...") == "B"
    # >10 words with no capital option letter scores empty
    assert extract_letter("i really cannot tell you what this might be "
                          "from here at all") == ""


def test_mme_realworld_scoring_and_subaggregates():
    t = make_mme_realworld()
    d = {"question": "q",
         "multi-choice options": [f"({c}) o{j}"
                                  for j, c in enumerate("ABCDE")],
         "answer": "E", "category": "Reasoning/OCR",
         "l2-category": "Diagram and Table", "image": IMG}
    assert t.process_results(d, ["The best answer is E"])["accuracy"] == 1.0
    r = t.process_results(d, ["A"])
    assert r["accuracy"] == 0.0 and r["_Reasoning"] == 0.0
    agg = t.aggregate_extra([r])
    assert agg["Reasoning"] == 0.0
    assert "(A, B, C, D, or E)" in t.doc_to_text(d)


def test_muirbench_multi_image_and_per_task():
    t = make_muirbench()
    d = {"question": "q", "options": ["x", "y"], "answer": "B",
         "task": "Ordering",
         "image_list": [IMG, IMG]}
    assert len(t.doc_to_visual(d)) == 2
    ok = t.process_results(d, ["B"])
    assert ok["accuracy"] == 1.0
    assert t.aggregate_extra([ok])["Ordering"] == 1.0


def test_websrc_f1():
    assert websrc_f1("5 Dollars", "5 dollars") == 1.0
    assert websrc_f1("cat", "dog") == 0.0
    # half the answer tokens present: prec=1, rec=0.5 -> f1=2/3
    assert abs(websrc_f1("5", "5 dollars") - 2 / 3) < 1e-9
    # extra pred words cost precision (utils.py:146-152): comm=2, |pred|=5
    assert abs(websrc_f1("the price is 5 dollars", "5 dollars")
               - 2 * 0.4 / 1.4) < 1e-9
    t = make_websrc()
    r = t.process_results({"question": "q", "answer": "blue shirt",
                           "domain": "shopping", "image": IMG},
                          ["blue shirt"])
    assert r["squad_f1"] == 1.0
    assert t.aggregate_extra([r])["shopping"] == 1.0


def test_qbench_na_filtering_and_int_gold():
    t = make_qbench()
    d = {"question": "q", "option0": "Good", "option1": "Bad",
         "option2": "N/A", "option3": "N/A", "correct_choice": 1,
         "image": IMG}
    txt = t.doc_to_text(d)
    assert "A. Good" in txt and "B. Bad" in txt and "N/A" not in txt
    assert t.process_results(d, ["B"])["accuracy"] == 1.0
    # gold as full option text
    d2 = dict(d, correct_choice="Bad")
    assert t.process_results(d2, ["B"])["accuracy"] == 1.0
    # two-image pair input
    d3 = {"question": "q", "option0": "a", "option1": "b",
          "correct_choice": 0, "image1": IMG, "image2": IMG}
    assert len(t.doc_to_visual(d3)) == 2


def test_longvideobench_and_mlvu():
    t = make_longvideobench()
    vid = np.zeros((4, 8, 8, 3), np.uint8)
    d = {"question": "q", "option0": "a", "option1": "b", "option2": "N/A",
         "correct_choice": 1, "video": vid}
    assert t.process_results(d, ["B."])["accuracy"] == 1.0
    assert t.doc_to_visual(d)[0].shape == (4, 8, 8, 3)

    t2 = make_mlvu()
    d2 = {"question": "q\n(A) a\n(B) b", "answer": "A", "video": vid,
          "task_type": "needle"}
    assert t2.doc_to_text(d2).endswith("Best option: (")
    r = t2.process_results(d2, ["A) a"])
    assert r["accuracy"] == 1.0
    assert t2.aggregate_extra([r])["needle"] == 1.0


def test_mmlu_ppl_choice():
    t = make_mmlu()
    d = {"question": "q", "choices": ["c0", "c1", "c2", "c3"],
         "answer": 2, "subject": "astronomy"}
    assert t.output_type == "loglikelihood"
    assert t.doc_to_choice(d) == [" A", " B", " C", " D"]
    r = t.process_results(d, [(-5.0, False), (-4.0, False),
                              (-1.0, True), (-9.0, False)])
    assert r["accuracy"] == 1.0
    assert t.aggregate_extra([r])["astronomy"] == 1.0
    assert "about astronomy" in t.doc_to_text(d)


def test_mmlu_pro_regex_extraction():
    t = make_mmlu_pro()
    d = {"question": "q", "options": [f"o{j}" for j in range(10)],
         "answer_index": 9}
    assert t.process_results(
        d, ["... so the answer is (J)."])["exact_match"] == 1.0
    assert t.process_results(d, ["the answer is A"])["exact_match"] == 0.0
    assert "J. o9" in t.doc_to_text(d)


def test_gpqa_ppl_choice():
    t = make_gpqa()
    d = {"question": " q?", "choice1": "a", "choice2": "b", "choice3": "c",
         "choice4": "d", "answer": 0}
    assert t.doc_to_choice(d) == [" (A)", " (B)", " (C)", " (D)"]
    r = t.process_results(d, [(-1.0, True), (-2.0, False),
                              (-3.0, False), (-4.0, False)])
    assert r["acc"] == 1.0 and r["acc_norm"] == 1.0
    assert "Choices:\n(A) a" in t.doc_to_text(d)


def test_synthdog_edit_distance():
    assert edit_distance_accuracy("abcd", "abcd") == 1.0
    assert edit_distance_accuracy("", "abcd") == 0.0
    assert abs(edit_distance_accuracy("abcx", "abcd") - 0.75) < 1e-9
    t = make_synthdog()
    d = {"ground_truth": json.dumps(
        {"gt_parse": {"text_sequence": "Hello World"}}), "image": IMG}
    assert t.process_results(d, ["hello world"])["edit_distance_acc"] == 1.0


def test_naturalbench_grouped_metrics():
    t = make_naturalbench()
    # one full group where q0 is right on both images, q1 wrong on both
    rows = []
    golds = ["yes", "no", "no", "yes"]       # q0_i0 q0_i1 q1_i0 q1_i1
    preds = ["yes", "no", "yes", "no"]
    for i, (g, p) in enumerate(zip(golds, preds)):
        d = {"index": i, "question": "q", "question_type": "yes_no",
             "answer": g, "image": IMG}
        rows.append(t.process_results(d, [p]))
    agg = t.aggregate_extra(rows)
    assert agg["Q_Acc"] == 0.5       # q0 both right, q1 both wrong
    assert agg["I_Acc"] == 0.0       # each image has one wrong question
    assert agg["G_Acc"] == 0.0
    # incomplete groups are dropped, not crashed
    assert t.aggregate_extra(rows[:3])["Q_Acc"] == 0.0


def test_mmt_letter_columns():
    from msd_tpu.harness.tasks_ext import make_mmt
    t = make_mmt()
    d = {"question": "q", "A": "a", "B": "b", "C": "", "answer": "B",
         "l2-category": "ocr", "image": IMG}
    txt = t.doc_to_text(d)
    assert "A: a" in txt and "B: b" in txt and "C:" not in txt
    r = t.process_results(d, ["B"])
    assert r["accuracy"] == 1.0
    assert t.aggregate_extra([r])["ocr"] == 1.0


def test_ii_bench_most_common_letter():
    from msd_tpu.harness.tasks_ext import ii_bench_extract, make_ii_bench
    assert ii_bench_extract("the answer is (C)") == "C"
    assert ii_bench_extract("A or B, but B fits better: B") == "B"
    assert ii_bench_extract("no letters here at all") == ""
    t = make_ii_bench()
    d = dict({"question": "q", "answer": "F", "image": IMG},
             **{f"option{j + 1}": f"o{j}" for j in range(6)})
    assert "(F) o5" in t.doc_to_text(d)
    assert t.process_results(d, ["(F)"])["accuracy"] == 1.0


def test_mirb_numeric_and_subset():
    from msd_tpu.harness.tasks_ext import make_mirb
    t = make_mirb()
    d = {"questions": " How many?", "answers": "12", "subset": "count",
         "image_list": [IMG, IMG]}
    assert t.doc_to_text(d).startswith("Answer with a single number.")
    assert len(t.doc_to_visual(d)) == 2
    r = t.process_results(d, ["There are 12."])
    assert r["accuracy"] == 1.0
    assert t.aggregate_extra([r])["count"] == 1.0
    assert t.process_results(d, ["eleven"])["accuracy"] == 0.0


def test_conbench_three_fields_and_conscore():
    from msd_tpu.harness.tasks_ext import make_conbench
    t = make_conbench()
    base = {"image_id": "7", "image": IMG}
    ny = dict(base, question="Is it?", question_field="N/Y", answer="Yes")
    ch = dict(base, question="A or B?", question_field="Choices",
              answer="A")
    qa = dict(base, question="What?", question_field="Q/A",
              answer="a red car")
    rows = [t.process_results(ny, ["Yes, it is"]),
            t.process_results(ch, [" A."]),
            t.process_results(qa, ["a red car"])]
    assert all(r["accuracy"] == 1.0 for r in rows)
    assert t.aggregate_extra(rows)["ConScore_D"] == 1.0
    rows[2] = t.process_results(qa, ["a blue bike"])
    assert rows[2]["accuracy"] == 0.0
    assert t.aggregate_extra(rows)["ConScore_D"] == 0.0


def test_tempcompass_rule_matching():
    from msd_tpu.harness.tasks_ext import (_tempcompass_mc_rating,
                                           make_tempcompass)
    assert _tempcompass_mc_rating("B. a cat", "B. a cat") == 1.0
    assert _tempcompass_mc_rating("B", "B. a cat") == 1.0
    assert _tempcompass_mc_rating("B)", "B. a cat") == 1.0
    assert _tempcompass_mc_rating("C", "B. a cat") == 0.0
    # unmatched free text: the reference's ChatGPT fallback is out of
    # scope — scores 0
    assert _tempcompass_mc_rating("it looks like a cat", "B. a cat") == 0.0
    t = make_tempcompass(kind="yes_no")
    vid = np.zeros((4, 8, 8, 3), np.uint8)
    d = {"question": "q", "answer": "yes", "dim": "direction",
         "video": vid}
    assert t.doc_to_text(d).endswith("Please answer yes or no:")
    r = t.process_results(d, ["Yes."])
    assert r["avg_accuracy"] == 1.0
    assert t.aggregate_extra([r])["direction_accuracy"] == 1.0


def test_ext_tasks_registered():
    register_builtin_tasks()
    for name in ("mme_realworld", "muirbench", "websrc_val", "qbench_dev",
                 "longvideobench_val_v", "mlvu", "mmlu", "mmlu_pro",
                 "gpqa_main_zeroshot", "synthdog_en", "vatex_test",
                 "detailcaps", "naturalbench", "mmt_val", "ii_bench",
                 "mirb", "conbench", "tempcompass_mc",
                 "tempcompass_yes_no", "tempcompass_caption_matching",
                 "qbench2_dev", "abench_dev", "mme_realworld_lite"):
        task = get_task(name)
        docs = task.load_docs(limit=4)
        assert len(docs) == 4
        txt = task.doc_to_text(docs[0])
        assert isinstance(txt, str) and txt


def test_tempcompass_caption_matching_rule():
    """Reference eval_rule semantics (tempcompass/utils.py:438-458): match
    the raw output against option lines/sentences/indices, then compare the
    matched form against the answer's equivalent forms."""
    from msd_tpu.harness.tasks_ext import (_tempcompass_caption_rating,
                                           make_tempcompass)
    q = ("Which caption matches the video?\n"
         "Caption A: a dog runs left\n"
         "Caption B: a dog runs right")
    ans = "Caption A: a dog runs left"
    assert _tempcompass_caption_rating("Caption A", q, ans) == 1.0
    assert _tempcompass_caption_rating("A", q, ans) == 1.0
    assert _tempcompass_caption_rating("A.", q, ans) == 1.0
    assert _tempcompass_caption_rating(ans, q, ans) == 1.0
    assert _tempcompass_caption_rating("a dog runs left", q, ans) == 1.0
    assert _tempcompass_caption_rating("B) a dog runs left", q, ans) == 1.0
    assert _tempcompass_caption_rating("Caption B", q, ans) == 0.0
    assert _tempcompass_caption_rating("a dog runs right", q, ans) == 0.0
    # unmatched free text = the reference's 'fail' -> 0 offline
    assert _tempcompass_caption_rating("something else", q, ans) == 0.0
    # 'Option 1' style indices
    q2 = "Pick one.\nOption 1: first\nOption 2: second"
    assert _tempcompass_caption_rating("Option 2", q2,
                                       "Option 2: second") == 1.0
    assert _tempcompass_caption_rating("2", q2, "Option 2: second") == 1.0
    t = make_tempcompass(kind="caption_matching")
    d = t.synthetic_docs(2)[1]
    assert t.process_results(d, [d["answer"]])["avg_accuracy"] == 1.0
    assert t.process_results(d, ["Caption A"])["avg_accuracy"] == 0.0


def test_naturalbench_implicit_slot_answers():
    """Reference-format docs carry no answer field: correctness is implicit
    in the Index slot pattern (naturalbench/utils.py get_scores)."""
    t = make_naturalbench()
    preds = ["yes", "no", "no", "yes"]     # the correct slot pattern
    rows = [t.process_results({"Index": i, "question": "q",
                               "question_type": "yes_no", "image": IMG},
                              [preds[i]]) for i in range(4)]
    agg = t.aggregate_extra(rows)
    assert agg["G_Acc"] == 1.0 and agg["Q_Acc"] == 1.0
    # multiple_choice variant: A for slots 0/3, B for 1/2
    rows = [t.process_results({"Index": i, "question": "q",
                               "question_type": "multiple_choice",
                               "image": IMG}, [p])
            for i, p in enumerate(["A", "B", "B", "A"])]
    assert t.aggregate_extra(rows)["G_Acc"] == 1.0


def test_qbench_unmappable_gold_scores_zero():
    t = make_qbench()
    d = {"question": "q", "option0": "Good", "option1": "Bad",
         "option2": "N/A", "option3": "N/A",
         "answer": "totally absent option text", "image": IMG}
    assert t.process_results(d, ["A"])["accuracy"] == 0.0


def test_extract_letter_choice_fallback():
    """mme_realworld/utils.py:112-116: a regex miss falls back to substring
    matching against the option strings; empty predictions stay empty."""
    from msd_tpu.harness.tasks_ext import extract_letter, make_mme_realworld
    choices = ["(A) cat", "(B) dog"]
    assert extract_letter("dog", "ABCDE", choices) == "B"
    assert extract_letter("", "ABCDE", choices) == ""
    assert extract_letter("zebra", "ABCDE", choices) == ""
    t = make_mme_realworld()
    d = {"question": "q",
         "multi-choice options": ["(A) red panda", "(B) otter"],
         "answer": "B", "category": "Perception", "l2-category": "x",
         "image": IMG}
    assert t.process_results(d, ["otter"])["accuracy"] == 1.0
