"""Round-4b task tier: temporalbench, vitatecs, jmmmu, mmworld, youcook2,
video_detail_description, olympiadbench."""

import numpy as np
import pytest

pytestmark = pytest.mark.quick

from msd_tpu.harness.tasks_ext3 import (_math_equal, _vitatecs_qa,
                                        make_jmmmu, make_mmworld,
                                        make_olympiadbench,
                                        make_temporalbench, make_vitatecs,
                                        make_video_detail_description,
                                        make_youcook2)


def test_temporalbench_binary_and_multiple_binary():
    """temporalbench/utils.py:106-131: first-char binary accuracy; a video
    counts for Multiple Binary Accuracy only when ALL its QAs are right."""
    t = make_temporalbench("short_qa")
    docs = t.synthetic_docs(4)  # vids: vid0(x2), vid1(x2)
    rows = [t.process_results(d, [d["GT"]]) for d in docs]
    assert all(r["accuracy"] == 1.0 for r in rows)
    agg = t.aggregate_extra(rows)
    assert agg["multiple_binary_accuracy"] == 1.0
    # break one QA of vid0 -> vid0 misses, vid1 still hits
    rows[0] = t.process_results(docs[0], ["B" if docs[0]["GT"] == "A"
                                          else "A"])
    agg = t.aggregate_extra(rows)
    assert agg["multiple_binary_accuracy"] == 0.5
    # long answers score by first character (reference pred[0] semantics)
    assert t.process_results(docs[1], ["B. no, it did not"])["accuracy"] \
        == (1.0 if docs[1]["GT"].lower().startswith("b") else 0.0)


def test_vitatecs_deterministic_order_and_rules():
    """vitatecs/utils.py:91-105: A/B order is seeded by the caption text;
    :114-143 hand-crafted matching rules."""
    d = {"caption": "a person opens door 1",
         "counterfactual": "a person closes door 1"}
    q1, a1, o1 = _vitatecs_qa(d)
    q2, a2, o2 = _vitatecs_qa(d)
    assert (q1, a1, o1) == (q2, a2, o2)  # deterministic
    assert a1[1] in "AB" and "(A)" in q1 and "(B)" in q1
    t = make_vitatecs("Direction")
    # bare letter form
    assert t.process_results(d, [a1[1]])["accuracy"] == 1.0
    assert t.process_results(d, ["B" if a1[1] == "A" else "A"])[
        "accuracy"] == 0.0
    # full option text containment beats letters
    assert t.process_results(d, [d["caption"]])["accuracy"] == 1.0
    assert t.process_results(d, [d["counterfactual"]])["accuracy"] == 0.0
    # unmatched + no judge -> 0 (reference would call GPT here)
    assert t.process_results(d, ["no idea"])["accuracy"] == 0.0


def test_jmmmu_mc_and_subdomain_aggregate():
    t = make_jmmmu()
    docs = t.synthetic_docs(4)
    d = docs[2]
    r = t.process_results(d, [d["answer"]])
    assert r["accuracy"] == 1.0 and r["_sub_Physics"] == 1.0
    rows = [t.process_results(x, [x["answer"]]) for x in docs]
    rows[0] = t.process_results(docs[0], ["Z no letter here"])
    agg = t.aggregate_extra(rows)
    assert 0.0 <= agg["Physics"] <= 1.0
    # Japanese MC instruction present in the prompt
    assert "アルファベット" in t.doc_to_text(d)


def test_mmworld_letter_extraction_and_disciplines():
    t = make_mmworld()
    d = t.synthetic_docs(3)[0]
    gold = d["correct_answer_label"].upper()
    assert t.process_results(d, [f"The best answer is {gold}"])[
        "accuracy"] == 1.0
    # long answer without a letter -> no credit
    assert t.process_results(
        d, ["this is a very long answer with many words and no "
            "option letter at all"])["accuracy"] == 0.0
    rows = [t.process_results(x, [x["correct_answer_label"].upper()])
            for x in t.synthetic_docs(6)]
    agg = t.aggregate_extra(rows)
    assert agg and all(v == 1.0 for v in agg.values())


def test_youcook2_caption_scores():
    t = make_youcook2()
    docs = t.synthetic_docs(4)
    rows = [t.process_results(d, [d["sentence"]]) for d in docs]
    agg = t.aggregate_extra(rows)
    assert agg["coco_Bleu_4"] > 0.99 and agg["coco_CIDEr"] > 0.0
    # non-ascii stripped (youcook2/utils.py:20-22)
    r = t.process_results(docs[0], ["café cooking"])
    assert "é" not in r["_pred"]


def test_video_detail_description_offline_fallback():
    t = make_video_detail_description()
    d = t.synthetic_docs(2)[0]
    perfect = t.process_results(d, [d["answer"]])["gpt_eval_score"]
    junk = t.process_results(d, ["nothing relevant"])["gpt_eval_score"]
    assert perfect == 5.0 and junk < perfect


def test_olympiadbench_math_equivalence():
    """olympiadbench_evals.py judge semantics: numeric within precision,
    symbolic equivalence, multi-answer comma split."""
    assert _math_equal("0.5", "\\frac{1}{2}", 1e-8)
    assert _math_equal("2", "2.0000000001", 1e-8)
    assert not _math_equal("3", "2", 0)
    assert _math_equal("1,2", "2, 1", 0)          # order-insensitive
    assert not _math_equal("1,2", "1, 3", 0)
    assert _math_equal("$x^2 - 1$", "(x-1)*(x+1)", 0)
    t = make_olympiadbench()
    d = t.synthetic_docs(3)[1]   # answer "3"
    out = t.process_results(
        d, ["Working... So the final answer is \\boxed{3}."])
    assert out["exact_match"] == 1.0
    out = t.process_results(d, ["So the final answer is \\boxed{4}."])
    assert out["exact_match"] == 0.0
    # proof questions are excluded from accuracy (en_utils.py:58-59)
    dp = dict(d, source="TP_synth")
    assert "exact_match" not in t.process_results(dp, ["anything"])
    assert "competition" in t.doc_to_text(d)


def test_registry_includes_round4b_tier():
    from msd_tpu.harness.registry import TASK_REGISTRY
    from msd_tpu.harness.tasks import register_builtin_tasks
    register_builtin_tasks()
    for name in ("temporalbench_short_qa", "vitatecs_direction", "jmmmu",
                 "mmworld", "youcook2_val", "video_detail_description",
                 "olympiadbench_test_en"):
        assert name in TASK_REGISTRY, name


def test_mmupd_dual_accuracy():
    """mmupd_evals.py:600-618 dual accuracy: a question scores only when
    the standard row picks the gold option AND the upd row abstains."""
    from msd_tpu.harness.tasks_mmupd import make_mmupd, mmupd_grade_row
    t = make_mmupd("aad", "base")
    docs = t.synthetic_docs(4)
    std = [d for d in docs if d["type"] == "standard"]
    upd = [d for d in docs if d["type"] == "upd"]
    # perfect model: gold letters on standard, abstains on upd
    rows = [t.process_results(d, [d["answer"]]) for d in std]
    rows += [t.process_results(d, ["None of the above"]) for d in upd]
    agg = t.aggregate_extra(rows)
    assert agg["gpt_eval_score"] == 100.0
    assert agg["overall_acc_standard"] == 1.0
    assert agg["overall_acc_upd"] == 1.0
    # a model that always answers 'A' fails every upd twin -> dual 0
    rows = [t.process_results(d, ["A"]) for d in std]
    rows += [t.process_results(d, ["A"]) for d in upd]
    assert t.aggregate_extra(rows)["gpt_eval_score"] == 0.0
    # instruction variant: 'F. None of the above' counts as abstention
    assert mmupd_grade_row({"type": "upd", "A": "red", "B": "green",
                            "answer": "F"}, "F. None of the above",
                           "inst") == 1.0
    # picking a real option on a upd row is wrong
    assert mmupd_grade_row({"type": "upd", "A": "red", "B": "green",
                            "answer": "F"}, "A. red", "base") == 0.0


def test_mmupd_registry():
    from msd_tpu.harness.registry import TASK_REGISTRY
    from msd_tpu.harness.tasks import register_builtin_tasks
    register_builtin_tasks()
    for upd in ("mmaad", "mmiasd", "mmivqd"):
        for qt in ("base", "option", "instruction"):
            assert f"{upd}_{qt}" in TASK_REGISTRY


def test_wild_vision_verdict_mapping_and_offline():
    from msd_tpu.harness.tasks_judge2 import (make_wild_vision,
                                              wild_vision_judgement_to_score)
    assert wild_vision_judgement_to_score("A>>B") == (-2, "model_a")
    assert wild_vision_judgement_to_score("B>>A") == (2, "model_b")
    assert wild_vision_judgement_to_score("A>B") == (-1, "model_a")
    assert wild_vision_judgement_to_score("A=B") == (0, "tie")
    assert wild_vision_judgement_to_score("garbage") == (0, "tie")
    t = make_wild_vision()
    d = t.synthetic_docs(2)[0]
    # offline: agreeing with the baseline answer -> tie (0), junk -> worse
    tie = t.process_results(d, [d["claude-3-sonnet-20240229"]])
    junk = t.process_results(d, ["nothing relevant at all"])
    assert tie["raw_score"] == 0.0 and junk["raw_score"] == -1.0


def test_vibe_and_mia_offline_scores():
    from msd_tpu.harness.tasks_judge2 import make_mia_bench, make_vibe_eval
    tv = make_vibe_eval()
    d = tv.synthetic_docs(2)[1]          # category 'hard'
    good = tv.process_results(d, [d["reference"]])
    assert good["score100"] == 100.0 and good["_hard"] == 100.0
    assert tv.aggregate_extra([good]) == {"hard": 100.0}
    bad = tv.process_results(d, ["zzz"])
    assert bad["score100"] < good["score100"]
    tm = make_mia_bench()
    dm = tm.synthetic_docs(1)[0]
    assert tm.process_results(dm, [dm["instruction"]])["total_score"] == 1.0


def test_judge2_registry():
    from msd_tpu.harness.registry import TASK_REGISTRY
    from msd_tpu.harness.tasks import register_builtin_tasks
    register_builtin_tasks()
    for name in ("wildvision_0617", "vibe_eval", "mia_bench"):
        assert name in TASK_REGISTRY


def test_ifeval_checkers():
    """instructions.py checker semantics spot-checks."""
    from msd_tpu.harness.task_utils import ifeval as IF
    c = IF.check
    assert c("punctuation:no_comma", {}, "no commas here")
    assert not c("punctuation:no_comma", {}, "one, comma")
    assert c("detectable_format:title", {}, "<<My Title>>\nbody")
    assert not c("detectable_format:title", {}, "<< >>")
    assert c("startend:quotation", {}, '"wrapped fully"')
    assert c("keywords:existence", {"keywords": ["alpha", "beta"]},
             "Alpha meets BETA.")
    assert not c("keywords:existence", {"keywords": ["alpha", "gamma"]},
                 "alpha only")
    assert c("keywords:frequency",
             {"keyword": "cat", "frequency": 2, "relation": "at least"},
             "cat and cat")
    assert c("keywords:forbidden_words", {"forbidden_words": ["dog"]},
             "a doghouse is fine")        # \b word boundary semantics
    assert not c("keywords:forbidden_words", {"forbidden_words": ["dog"]},
                 "a dog is not")
    assert c("length_constraints:number_paragraphs", {"num_paragraphs": 2},
             "first\n***\nsecond")
    assert c("detectable_format:number_bullet_lists", {"num_bullets": 2},
             "* one\n- two")
    assert not c("detectable_format:number_bullet_lists", {"num_bullets": 2},
                 "* one\n- two\n- three")   # exact count
    assert c("detectable_format:json_format", {}, '```json\n{"a": 1}\n```')
    assert c("combination:two_responses", {}, "yes\n******\nno")
    assert not c("combination:two_responses", {}, "same\n******\nsame")
    assert c("change_case:english_capital", {}, "ALL CAPS HERE")
    assert c("language:response_language", {"language": "zh"}, "你好世界")
    assert not c("language:response_language", {"language": "zh"},
                 "hello world")
    assert c("length_constraints:nth_paragraph_first_word",
             {"num_paragraphs": 2, "nth_paragraph": 2,
              "first_word": "hello"},
             "intro text\n\nHello, second paragraph.")


def test_ifeval_strict_vs_loose():
    """utils.py:62-80: a leading junk line breaks strict but loose passes
    once the first line is stripped."""
    from msd_tpu.harness.tasks_ext3 import make_ifeval
    t = make_ifeval()
    d = {"prompt": "p", "instruction_id_list": ["startend:quotation"],
         "kwargs": [{}]}
    r = t.process_results(d, ['Sure! Here you go:\n"quoted answer"'])
    assert r["prompt_level_strict_acc"] == 0.0
    assert r["prompt_level_loose_acc"] == 1.0
    agg = t.aggregate_extra([r])
    assert agg["inst_level_loose_acc"] == 1.0
    assert agg["inst_level_strict_acc"] == 0.0


def test_cvrr_moviechat_cuva():
    from msd_tpu.harness.tasks_judge2 import (make_cuva, make_cvrr,
                                              make_moviechat)
    tc = make_cvrr()
    d = tc.synthetic_docs(2)[0]
    good = tc.process_results(d, [d["answer"]])
    assert good["accuracy"] == 1.0 and good["score"] == 5.0
    assert tc.aggregate_extra([good])["Partial actions"] == 1.0
    bad = tc.process_results(d, ["unrelated"])
    assert bad["accuracy"] == 0.0
    tm = make_moviechat("global")
    dm = tm.synthetic_docs(1)[0]
    assert tm.process_results(dm, [dm["answer"]])["accuracy"] == 1.0
    tv = make_cuva()
    docs = tv.synthetic_docs(3)
    rows = [tv.process_results(x, [x["answer"]]) for x in docs]
    assert tv.aggregate_extra(rows)["coco_Bleu_4"] > 0.99
    # the three CUVA prompts are keyed by doc['task']
    assert "describe any anomaly" in tv.doc_to_text(docs[0])
    assert "Explain why" in tv.doc_to_text(docs[1])


def test_llava_interleave_mcq_and_rouge():
    from msd_tpu.harness.tasks_judge2 import (interleave_mcq_acc,
                                              make_llava_interleave)
    # option-prefix form and standalone letter both extract
    assert interleave_mcq_acc("A", "A. the first one") == 1.0
    assert interleave_mcq_acc("B", "the answer is (B)") == 1.0
    assert interleave_mcq_acc("A", "B. wrong") == 0.0
    # processed-text fallback: full-text match without letters
    assert interleave_mcq_acc("the red cube", "The red cube!") == 1.0
    t = make_llava_interleave()
    docs = t.synthetic_docs(4)
    rows = [t.process_results(d, [d["answer"]]) for d in docs]
    agg = t.aggregate_extra(rows)
    assert agg["category_mean"] == 1.0 and "sub_Spot-the-Diff" in agg


def test_mix_evals_video2text():
    from msd_tpu.harness.tasks_judge2 import make_mix_evals_video2text
    t = make_mix_evals_video2text("mc")
    d = t.synthetic_docs(3)[2]
    assert t.process_results(d, [d["answer"]])["exact_match"] == 1.0
    assert t.process_results(d, ["no letter here at all"])[
        "exact_match"] == 0.0
    # gold given as option text maps back to its letter
    d2 = dict(d, answer=d["options"][ord(d["answer"]) - ord("A")])
    assert t.process_results(d2, [d["answer"]])["exact_match"] == 1.0
    tf = make_mix_evals_video2text("freeform")
    df = tf.synthetic_docs(2)[1]
    good = tf.process_results(df, [df["reference_answer"][0]])
    assert good["gpt_eval"] == 1.0
    assert tf.process_results(df, ["zzz"])["gpt_eval"] < 1.0
    assert "Here are the options" in t.doc_to_text(d)


def test_audio_wer_and_tasks():
    from msd_tpu.harness.tasks_audio import (make_air_bench,
                                             make_asr_task,
                                             make_muchomusic,
                                             make_vocalsound, wer)
    # WER semantics: punctuation/case-insensitive, word-level edits
    assert wer("Hello, World!", "hello world") == 0.0
    assert wer("hello there world", "hello world") == 0.5  # 1 ins / 2 ref
    assert wer("", "a b") == 1.0
    assert wer("<|en|> 你好 世界", "你好世界", language="zh") == 0.0
    t = make_asr_task("librispeech_test_clean")
    d = t.synthetic_docs(2)[0]
    assert t.process_results(d, [d["gt"]])["wer"] == 0.0
    tv = make_vocalsound()
    dv = tv.synthetic_docs(6)[0]
    assert tv.process_results(dv, [dv["answer"]])["accuracy"] == 1.0
    rows = [tv.process_results(x, [x["answer"]])
            for x in tv.synthetic_docs(6)]
    agg = tv.aggregate_extra(rows)
    assert agg["female"] == 1.0 and agg["male"] == 1.0
    tm = make_muchomusic()
    dm = tm.synthetic_docs(3)[1]
    gold = dm["answer"][1]
    assert tm.process_results(dm, [gold])["accuracy"] == 1.0
    tf = make_air_bench("foundation")
    df = tf.synthetic_docs(4)[2]
    assert tf.process_results(df, ["C"])["accuracy"] == 1.0
    assert tf.process_results(df, ["A"])["accuracy"] == 0.0


def test_audio_registry():
    from msd_tpu.harness.registry import TASK_REGISTRY
    from msd_tpu.harness.tasks import register_builtin_tasks
    register_builtin_tasks()
    for name in ("librispeech_test_clean", "vocalsound_test", "muchomusic",
                 "clotho_aqa_test", "air_bench_foundation",
                 "air_bench_chat", "alpaca_audio_test", "wavcaps_val",
                 "gigaspeech_test", "tedlium_dev_test",
                 "common_voice_15_en", "people_speech_val"):
        assert name in TASK_REGISTRY, name
    print("total:", len(TASK_REGISTRY))


def test_ext4_tasks():
    from msd_tpu.harness.tasks_ext4 import (make_av_odyssey, make_ferret,
                                            make_live_bench,
                                            make_vinoground)
    t = make_av_odyssey()
    docs = t.synthetic_docs(8)
    rows = [t.process_results(d, [d["answer"]]) for d in docs]
    assert all(r["accuracy"] == 1.0 for r in rows)
    agg = t.aggregate_extra(rows)
    assert agg.get("timbre") == 1.0 and agg.get("tone") == 1.0
    # vinoground: group score needs all four cells of an index right
    tv = make_vinoground()
    docs = tv.synthetic_docs(8)   # 2 base indices x 4 cells
    rows = [tv.process_results(d, [d["GT"]]) for d in docs]
    agg = tv.aggregate_extra(rows)
    assert agg["text_score"] == 1.0 and agg["group_score"] == 1.0
    # one wrong neg-text cell kills that index's text + group scores
    rows[1] = tv.process_results(docs[1], ["B" if docs[1]["GT"] == "A"
                                           else "A"])
    agg = tv.aggregate_extra(rows)
    assert agg["text_score"] == 0.5 and agg["group_score"] == 0.5
    assert agg["video_score"] == 1.0
    tl = make_live_bench()
    d = tl.synthetic_docs(2)[0]
    assert tl.process_results(d, [""])["gpt4_eval_score"] == 0.0
    good = tl.process_results(d, [d["answer"]])
    assert good["gpt4_eval_score"] == 10.0
    tf = make_ferret()
    df = tf.synthetic_docs(3)[0]
    rows = [tf.process_results(df, [df["gpt_answer"]])]
    agg = tf.aggregate_extra(rows)
    assert agg["gpt_eval_ferret_all"] == 100.0


def test_ext4_registry():
    from msd_tpu.harness.registry import TASK_REGISTRY
    from msd_tpu.harness.tasks import register_builtin_tasks
    register_builtin_tasks()
    for name in ("av_odyssey", "vinoground", "openhermes", "funqa",
                 "live_bench", "ferret"):
        assert name in TASK_REGISTRY, name


def test_vdc_offline_caption_scores():
    from msd_tpu.harness.tasks_ext4 import make_vdc
    t = make_vdc("detailed")
    docs = t.synthetic_docs(3)
    rows = [t.process_results(d, [d["caption"]]) for d in docs]
    agg = t.aggregate_extra(rows)
    assert agg["coco_Bleu_4"] > 0.99
    assert "accuracy" not in agg   # judge-only metric stays absent offline
    from msd_tpu.harness.registry import TASK_REGISTRY
    from msd_tpu.harness.tasks import register_builtin_tasks
    register_builtin_tasks()
    for kind in ("detailed", "camera", "background", "main_object",
                 "short"):
        assert f"vdc_{kind}_test" in TASK_REGISTRY
