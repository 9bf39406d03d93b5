"""Round-3 task-library additions: REC bbox grounding, MM-Vet offline
scoring, video multiple-choice normalization, MP-DocVQA multi-page, and the
text-only tasks (gsm8k, arc/hellaswag ppl-choice)."""

import pytest

import numpy as np

pytestmark = pytest.mark.quick

from msd_tpu.harness import metrics as M
from msd_tpu.harness.registry import get_task
from msd_tpu.harness.tasks import (make_gsm8k, make_mmvet, make_multidocvqa,
                                   make_rec_task, make_text_ppl_choice,
                                   make_video_mc_task,
                                   register_builtin_tasks)


def test_parse_box_and_iou():
    assert M.parse_box("box: [0.1, 0.2, 0.5, 0.6].") == [0.1, 0.2, 0.5, 0.6]
    assert M.parse_box("no box here") == [0.0, 0.0, 0.0, 0.0]
    assert M.box_iou([0, 0, 1, 1], [0, 0, 1, 1]) == 1.0
    # half-overlap: inter 0.5, union 1.5
    assert abs(M.box_iou([0, 0, 1, 1], [0.5, 0, 1.5, 1]) - 1 / 3) < 1e-9
    assert M.box_iou([0, 0, 0, 0], [0, 0, 0, 0]) == 0.0  # degenerate
    assert M.box_center_in([0, 0, 1, 1], [0.4, 0.4, 0.6, 0.6]) == 1.0
    assert M.box_center_in([0, 0, 0.3, 0.3], [0.8, 0.8, 1.0, 1.0]) == 0.0


def test_rec_task_metrics():
    task = make_rec_task("refcoco_bbox_rec_val")
    doc = {"answer": "the red mug", "bbox": [0.1, 0.1, 0.5, 0.5],
           "image": np.zeros((8, 8, 3), np.uint8)}
    exact = task.process_results(doc, ["[0.1, 0.1, 0.5, 0.5]"])
    assert exact["IoU"] == 1.0 and exact["ACC@0.9"] == 1.0
    assert exact["Center_ACC"] == 1.0
    near = task.process_results(doc, ["Here: [0.1, 0.1, 0.45, 0.5] ok"])
    assert 0.5 < near["IoU"] < 1.0
    assert near["ACC@0.5"] == 1.0 and near["ACC@0.9"] == 0.0
    miss = task.process_results(doc, ["I cannot find it"])
    assert miss["IoU"] == 0.0 and miss["Center_ACC"] == 0.0
    assert "the red mug" in task.doc_to_text(doc)


def test_rec_screenspot_query_key():
    task = make_rec_task("screenspot_rec_test", query_key="instruction")
    doc = {"instruction": "click the save button",
           "bbox": [0.2, 0.2, 0.4, 0.3],
           "image": np.zeros((8, 8, 3), np.uint8)}
    assert "click the save button" in task.doc_to_text(doc)


def test_mmvet_offline_scoring_anchor_cases():
    """The MM_VET_PROMPT anchor rows (tasks/mmvet/utils.py:38-44): all
    <AND> conjuncts present = 1.0, one of two = 0.5, none = 0.0; any <OR>
    alternative present = 1.0."""
    task = make_mmvet()
    img = np.zeros((8, 8, 3), np.uint8)
    d_and = {"question": "q", "answer": "-1 <AND> -5", "image": img}
    assert task.process_results(
        d_and, ["x = -1 or x = -5"])["gpt_eval_score"] == 1.0
    assert task.process_results(d_and, ["x = -1"])["gpt_eval_score"] == 0.5
    assert task.process_results(d_and, ["x = 3"])["gpt_eval_score"] == 0.0
    d_or = {"question": "q", "answer": "cat <OR> kitten", "image": img}
    assert task.process_results(
        d_or, ["a small kitten sits"])["gpt_eval_score"] == 1.0
    assert task.process_results(d_or, ["a dog"])["gpt_eval_score"] == 0.0


def test_video_mc_schema_normalization():
    task = make_video_mc_task("egoschema")
    vid = np.zeros((4, 8, 8, 3), np.uint8)
    # egoschema: 'option' list + int answer
    d1 = {"question": "what happened?", "option": ["walk", "run", "sit"],
          "answer": 1, "video": vid}
    assert task.process_results(d1, ["B"])["accuracy"] == 1.0
    assert task.process_results(d1, ["A"])["accuracy"] == 0.0
    text = task.doc_to_text(d1)
    assert "A. walk" in text and "B. run" in text
    # nextqa: a0..a4 + digit-string answer
    d2 = {"question": "q", "a0": "red", "a1": "blue", "a2": "green",
          "a3": "gray", "a4": "pink", "answer": "2", "video": vid}
    assert task.process_results(d2, ["C"])["accuracy"] == 1.0
    # mvbench: 'candidates' + gold given as the full option string
    d3 = {"question": "q", "candidates": ["jump", "swim", "fly"],
          "answer": "swim", "video": vid}
    assert task.process_results(d3, ["The answer is B."])["accuracy"] == 1.0
    # letter answers pass through
    d4 = {"question": "q", "options": ["A. x", "B. y"], "answer": "B",
          "video": vid}
    assert task.process_results(d4, ["B"])["accuracy"] == 1.0


def test_multidocvqa_pages_and_scoring():
    task = make_multidocvqa()
    img = np.zeros((8, 8, 3), np.uint8)
    doc = {"question": "total?", "answers": "['42', 'forty-two']",
           "image_1": img, "image_2": img, "image_3": None}
    assert len(task.doc_to_visual(doc)) == 2
    res = task.process_results(doc, ["42"])
    assert res["anls"] == 1.0 and res["accuracy"] == 1.0
    res2 = task.process_results(doc, ["41"])
    assert res2["accuracy"] == 0.0


def test_gsm8k_extraction():
    task = make_gsm8k()
    doc = {"question": "2+2?", "answer": "think... #### 4,000"}
    assert task.process_results(
        doc, ["The total is 4,000."])["exact_match"] == 1.0
    assert task.process_results(
        doc, ["First 7, then the answer is $4000"])["exact_match"] == 1.0
    assert task.process_results(doc, ["42"])["exact_match"] == 0.0
    assert task.doc_to_visual(doc) == []
    assert task.doc_to_text(doc).startswith("Question: ")


def test_text_ppl_choice_acc_and_norm():
    task = make_text_ppl_choice("arc_easy")
    doc = {"query": "Q?", "choices": [" tiny", " a much longer option"],
           "gold": 1}
    # raw logprobs favor choice 0, length-normalized favor choice 1
    res = task.process_results(doc, [(-1.0, True), (-2.0, False)])
    assert res["acc"] == 0.0
    assert res["acc_norm"] == 1.0  # -2/21 > -1/5
    assert task.doc_to_choice(doc) == [" tiny", " a much longer option"]
    assert task.doc_to_visual(doc) == []


def test_apply_until_stop_strings():
    from msd_tpu.harness.models.llava_msd import apply_until
    assert apply_until("4\nQuestion: next", {"until": ["Question:"]}) == "4\n"
    assert apply_until("no stops here", {"until": ["Question:"]}) == \
        "no stops here"
    assert apply_until("a</s>b", {"until": ["</s>", "###"]}) == "a"
    assert apply_until("text", {}) == "text"
    assert apply_until("text", {"until": None}) == "text"


def test_round3_tasks_registered_and_build_requests():
    register_builtin_tasks()
    for name in ("refcoco_bbox_rec_val", "refcoco+_bbox_rec_val",
                 "refcocog_bbox_rec_val", "screenspot_rec_test", "mmvet",
                 "multidocvqa_val", "egoschema", "nextqa_mc_test",
                 "perceptiontest_val_mc", "mvbench", "gsm8k", "arc_easy",
                 "arc_challenge", "hellaswag"):
        task = get_task(name)
        docs = task.load_docs(limit=3)
        assert len(docs) == 3, name
        reqs = task.build_requests(docs)
        assert len(reqs) >= 3, name


def test_gsm8k_end_to_end_text_only(tiny_adapter_parts=None):
    """gsm8k runs through the evaluator with NO visual — exercises the
    adapter's text-only prompt path."""
    import jax
    from msd_tpu.configs import (ClipVisionConfig, DraftConfig, EngineConfig,
                                 LlamaConfig, LlavaConfig, TreeConfig)
    from msd_tpu.engine.generator import MSDGenerator
    from msd_tpu.harness.evaluator import evaluate
    from msd_tpu.harness.models.llava_msd import LlavaMSD, SimpleTokenizer
    from msd_tpu.models import clip_vit as C
    from msd_tpu.models import draft as draft_mod
    from msd_tpu.models import llama as L
    from msd_tpu.models.llava import encode_image, init_projector_params

    tcfg = LlamaConfig.tiny(vocab_size=512, hidden_size=64, layers=2,
                            heads=4, intermediate_size=128, max_pos=1024)
    vcfg = ClipVisionConfig.tiny(hidden_size=32, layers=2, heads=4,
                                 image_size=28, patch_size=14,
                                 intermediate_size=64)
    lcfg = LlavaConfig(text=tcfg, vision=vcfg)
    dcfg = DraftConfig(text=tcfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    gen = MSDGenerator(L.init_llama_params(keys[0], tcfg),
                       draft_mod.init_draft_params(keys[1], dcfg),
                       tcfg, dcfg,
                       EngineConfig(max_seq_len=512, prompt_pad_multiple=64,
                                    tree=TreeConfig(top_k=4, max_depth=4,
                                                    num_nodes=12)),
                       n_img=vcfg.num_patches, eos_id=2)
    lp = {"vision": C.init_clip_params(keys[2], vcfg),
          "projector": init_projector_params(keys[3], lcfg)}
    lm = LlavaMSD(gen, SimpleTokenizer(vocab_size=512),
                  jax.jit(lambda px: encode_image(lp, lcfg, px)),
                  image_size=28)
    out = evaluate(lm, ["gsm8k"], limit=2)
    assert "exact_match" in out["results"]["gsm8k"]
    assert len(out["details"]["gsm8k"]["samples"]) == 2
