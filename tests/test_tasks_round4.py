"""Round-4 task tier: mmbench circular eval, seedbench_2_plus, mmmu_pro,
cmmmu, cinepile, vcr_wiki, mmvetv2, activitynetqa/videochatgpt offline
scoring."""

import numpy as np
import pytest

pytestmark = pytest.mark.quick

from msd_tpu.harness.tasks_ext2 import (cinepile_eval, make_activitynetqa,
                                        make_cinepile, make_cmmmu,
                                        make_mmmu_pro, make_mmvetv2,
                                        make_seedbench_2_plus, make_vcr,
                                        vcr_score_single)
from msd_tpu.harness.tasks_mmbench import (can_infer, can_infer_option,
                                           can_infer_text, make_mmbench)

IMG = np.zeros((8, 8, 3), np.uint8)


def test_can_infer_option_rules():
    """mmbench_evals.py:81-107 semantics."""
    assert can_infer_option("B") == "B"
    assert can_infer_option("The answer is B.") == "B"
    assert can_infer_option("(C)") == "C"
    assert can_infer_option("B.") == "B"
    # two candidate letters -> no inference
    assert can_infer_option("A or B") is False
    # 'A' as a quantifier in a long sentence is rejected
    assert can_infer_option("A cat sits on a very long mat") is False
    assert can_infer_text("it is clearly the red one",
                          {"A": "red", "B": "green"}) == "A"
    # option text appearing twice -> ambiguous
    assert can_infer_text("red or green", {"A": "red", "B": "green"}) is False
    assert can_infer("the green one", {"A": "red", "B": "green"}) == "B"


def test_mmbench_circular_eval():
    t = make_mmbench("mmbench_en_dev")
    docs = t.synthetic_docs(4)
    by_idx = {d["index"]: d for d in docs}
    d0, d1 = by_idx[0], by_idx[1000000]   # two rotations of question 0
    # both rotations answered correctly -> hit
    rows = [t.process_results(d0, [d0["answer"]]),
            t.process_results(d1, [d1["answer"]])]
    assert t.aggregate_extra(rows)["gpt_eval_score"] == 1.0
    # one rotation wrong -> the whole question misses
    rows = [t.process_results(d0, [d0["answer"]]),
            t.process_results(d1, ["Z"])]
    assert t.aggregate_extra(rows)["gpt_eval_score"] == 0.0
    # prompt carries options and the hint when present
    txt = t.doc_to_text(d0)
    assert "There are several options:" in txt and "A." in txt


def test_seedbench_2_plus():
    t = make_seedbench_2_plus()
    d = t.synthetic_docs(3)[1]
    assert t.process_results(d, [d["answer"]])["accuracy"] == 1.0
    assert t.process_results(d, ["B. option 1"])["accuracy"] == \
        (1.0 if d["answer"] == "B" else 0.0)
    rows = [t.process_results(x, [x["answer"]]) for x in t.synthetic_docs(6)]
    agg = t.aggregate_extra(rows)
    assert all(v == 1.0 for v in agg.values())


def test_mmmu_pro_standard_ten_options():
    t = make_mmmu_pro("standard")
    d = t.synthetic_docs(12)[9]           # answer 'J'
    txt = t.doc_to_text(d)
    assert "J." in txt
    assert t.process_results(d, ["J"])["accuracy"] == 1.0
    assert t.process_results(d, ["A"])["accuracy"] == 0.0


def test_cmmmu_three_types():
    t = make_cmmmu()
    docs = t.synthetic_docs(6)
    mc = docs[0]       # 选择
    assert t.process_results(mc, [mc["answer"]])["accuracy"] == 1.0
    tf = docs[1]       # 判断
    assert t.process_results(tf, [tf["answer"]])["accuracy"] == 1.0
    assert t.process_results(tf, ["错" if tf["answer"] == "对"
                                  else "对"])["accuracy"] == 0.0
    fb = docs[2]       # 填空
    assert t.process_results(fb, [f"答案是{fb['answer']}。"])["accuracy"] == 1.0


def test_cinepile_eval_rules():
    """cinepile/utils.py:75-120."""
    assert cinepile_eval("A", "A", "event 0") == 1.0
    assert cinepile_eval("Answer: A) event 0", "A", "event 0") == 1.0
    assert cinepile_eval("Answer: A) wrong text", "A", "event 0") == 0.0
    assert cinepile_eval("Answer: B", "A", "event 0") == 0.0
    assert cinepile_eval("event 0", "A", "event 0") == 1.0
    t = make_cinepile()
    d = t.synthetic_docs(3)[2]
    gold = "ABCDE"[d["answer_key_position"]]
    assert t.process_results(d, [gold])["accuracy"] == 1.0


def test_vcr_scoring():
    """vcr_wiki/utils.py:100-187 (regex tokenization deviation noted)."""
    s = vcr_score_single("hidden words", "the hidden words are here", "en")
    assert s["exact_match"] == 1.0 and s["jaccard"] == 1.0
    s = vcr_score_single("hidden words", "the hidden phrase is here", "en")
    assert s["exact_match"] == 0.0
    # refusals are zeroed (fast_filter)
    s = vcr_score_single("hidden words", "Sorry, I cannot see it", "en")
    assert s["exact_match"] == 0.0 and s["jaccard"] == 0.0
    z = vcr_score_single("隐藏文本", "图中是隐藏文本内容", "zh")
    assert z["exact_match"] == 1.0
    t = make_vcr("en", "easy")
    d = t.synthetic_docs(2)[0]
    r = t.process_results(d, [d["caption"]])
    assert r["exact_match"] == 1.0


def test_mmvetv2_offline_algebra_and_caps():
    t = make_mmvetv2()
    d = {"question": "nums?", "answer": "3 <AND> 4",
         "capability": "ocr, math", "image": IMG}
    r = t.process_results(d, ["3 and 4"])
    assert r["gpt_eval_score"] == 1.0
    assert t.aggregate_extra([r]) == {"math": 1.0, "ocr": 1.0}
    assert t.process_results(d, ["3"])["gpt_eval_score"] == 0.5


def test_activitynetqa_offline_proxy():
    t = make_activitynetqa()
    d = t.synthetic_docs(2)[0]
    r = t.process_results(d, [d["answer"]])
    assert r["accuracy"] == 1.0 and r["score"] == 5.0
    r = t.process_results(d, ["completely unrelated"])
    assert r["accuracy"] == 0.0
    # type 3 docs append the yes/no hint
    d3 = [x for x in t.synthetic_docs(4) if x["type"] == "3"][0]
    assert "yes' or 'no'" in t.doc_to_text(d3)


def test_round4_tasks_registered():
    from msd_tpu.harness.registry import TASK_REGISTRY, get_task
    from msd_tpu.harness.tasks import register_builtin_tasks
    register_builtin_tasks()
    for name in ("mmbench_en_dev", "mmbench_en_test", "mmbench_cn_dev",
                 "mmbench_cn_test", "mmbench_cn_cc", "seedbench_2_plus",
                 "mmmu_pro_standard", "mmmu_pro_vision", "cmmmu_val",
                 "cinepile", "vcr_wiki_en_easy", "vcr_wiki_en_hard",
                 "vcr_wiki_zh_easy", "vcr_wiki_zh_hard", "gqa_ru",
                 "mmvetv2", "llava_wilder_small", "activitynetqa",
                 "videochatgpt_gen"):
        task = get_task(name)
        docs = task.load_docs(limit=4)
        assert len(docs) >= 2
        assert isinstance(task.doc_to_text(docs[0]), str)
    assert len(TASK_REGISTRY) >= 90
