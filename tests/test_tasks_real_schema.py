"""Real-dataset task fidelity (VERDICT r1 item 3).

Fixtures mimic the actual HF layouts of ChartQA / TextVQA / AI2D / MathVista
(field names, splits, PIL images) and pass through the harness end-to-end;
the YAML TaskConfig loader resolves !function hooks like the reference's
tasks/*/*.yaml + utils.py convention; synthetic fallbacks are loudly marked.
"""

import os

import numpy as np
import pytest

from msd_tpu.harness.evaluator import evaluate
from msd_tpu.harness.models.llava_msd import LlavaMSD
from msd_tpu.harness.registry import TASK_REGISTRY, register_task
from msd_tpu.harness.tasks import (make_chartqa, make_mathvista,
                                   make_mathverse, make_mc_task,
                                   make_textvqa, register_builtin_tasks)
from msd_tpu.harness.task_utils import mathvista as MV


def _pil(seed, size=48):
    from PIL import Image
    rng = np.random.default_rng(seed)
    return Image.fromarray(
        rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8))


@pytest.fixture(scope="module")
def tiny_adapter():
    return LlavaMSD.from_tiny()


def _save_hf(tmpdir, split, rows):
    import datasets
    ds = datasets.Dataset.from_dict(
        {k: [r[k] for r in rows] for k in rows[0]})
    datasets.DatasetDict({split: ds}).save_to_disk(str(tmpdir))
    return str(tmpdir)


# ---------------------------------------------------------------------------
# extraction/normalization unit tests (mathvista_evals.py semantics)
# ---------------------------------------------------------------------------

def test_mathvista_extract_and_normalize():
    mc = {"question_type": "multi_choice", "answer_type": "text",
          "choices": ["red", "green", "blue"], "query": ""}
    assert MV.extract_answer("blue", mc) == "blue"          # direct choice
    assert MV.extract_answer('The answer is "green".', mc) == "green"
    assert MV.extract_answer("(B) because...", mc) == "B"
    assert MV.normalize_extracted_answer("B", mc["choices"], "multi_choice",
                                         "text", 0) == "green"
    # most-similar fallback (Levenshtein), exactly like get_most_similar
    assert MV.normalize_extracted_answer("greeen", mc["choices"],
                                         "multi_choice", "text", 0) == "green"

    ff = {"question_type": "free_form", "answer_type": "integer", "query": ""}
    assert MV.extract_answer("42", ff) == "42"
    assert MV.extract_answer("So the total is 42.", ff) == "42"
    assert MV.normalize_extracted_answer("42.0", [], "free_form", "integer",
                                         0) == "42"
    flt = {"question_type": "free_form", "answer_type": "float", "query": ""}
    assert MV.normalize_extracted_answer("3.14159", [], "free_form", "float",
                                         2) == "3.14"
    assert MV.safe_equal(" 42 ", "42")


def test_mathvista_process_results_scores():
    doc = {"question": "q", "question_type": "free_form",
           "answer_type": "integer", "choices": None, "answer": "7",
           "precision": 0, "query": "", "pid": "0",
           "metadata": {"split": "testmini"}}
    assert MV.process_results(doc, ["The answer is 7."]) == \
        {"gpt_eval_score": 1.0}
    assert MV.process_results(doc, ["I believe it is 8"]) == \
        {"gpt_eval_score": 0.0}


# ---------------------------------------------------------------------------
# real HF layouts through the harness
# ---------------------------------------------------------------------------

def test_chartqa_real_layout(tmp_path, tiny_adapter):
    rows = [{"question": f"What is the value of bar {i}?",
             "answer": str(i), "type": "human_test" if i % 2 == 0
             else "augmented_test", "image": _pil(i)} for i in range(3)]
    path = _save_hf(tmp_path / "ChartQA", "test", rows)
    register_task("chartqa_fixture", make_chartqa(path))
    out = evaluate(tiny_adapter, ["chartqa_fixture"], limit=3)
    det = out["details"]["chartqa_fixture"]
    assert det["synthetic_docs"] is False
    assert "relaxed_overall" in det["metrics"]
    assert det["n_docs"] == 3
    assert "synthetic_tasks" not in out


def test_textvqa_real_layout(tmp_path, tiny_adapter):
    rows = [{"question": f"what does the sign say {i}?",
             "answers": [f"word{i}"] * 10, "question_id": i,
             "image": _pil(i + 10)} for i in range(2)]
    path = _save_hf(tmp_path / "TextVQA", "validation", rows)
    task = make_textvqa(path)
    task.split = "validation"
    register_task("textvqa_fixture", task)
    out = evaluate(tiny_adapter, ["textvqa_fixture"], limit=2)
    det = out["details"]["textvqa_fixture"]
    assert det["synthetic_docs"] is False
    assert "exact_match" in det["metrics"]
    # the prompt capitalizes the question like tasks/textvqa/utils.py:58
    reqs = task.build_requests(task.load_docs(2))
    assert reqs[0].arguments[0].startswith("What does the sign say")


def test_ai2d_real_layout(tmp_path, tiny_adapter):
    # AI2D answers are option INDICES ('2'), options are bare texts
    rows = [{"question": f"Which part is {i}?",
             "options": ["stem", "leaf", "root", "flower"],
             "answer": str(i % 4), "image": _pil(i + 20)} for i in range(2)]
    path = _save_hf(tmp_path / "AI2D", "test", rows)
    task = make_mc_task("ai2d_fixture", path)
    register_task("ai2d_fixture", task)
    out = evaluate(tiny_adapter, ["ai2d_fixture"], limit=2)
    assert out["details"]["ai2d_fixture"]["synthetic_docs"] is False
    # prompt letters the options; scoring maps index->letter
    reqs = task.build_requests(task.load_docs(2))
    assert "A. stem" in reqs[0].arguments[0]
    assert task.process_results(rows[0], ["A"]) == {"accuracy": 1.0}
    assert task.process_results(rows[1], ["A. stem"])["accuracy"] in (0.0, 1.0)


def test_mathvista_real_layout(tmp_path, tiny_adapter):
    rows = [{"question": "What is 3 plus 4?", "question_type": "free_form",
             "answer_type": "integer", "choices": None, "answer": "7",
             "precision": 0, "query": "", "pid": "1",
             "unit": "", "metadata": {"split": "testmini"},
             "decoded_image": _pil(30)}]
    path = _save_hf(tmp_path / "MathVista", "testmini", rows)
    register_task("mathvista_fixture", make_mathvista(path))
    out = evaluate(tiny_adapter, ["mathvista_fixture"], limit=1)
    det = out["details"]["mathvista_fixture"]
    assert det["synthetic_docs"] is False
    assert "gpt_eval_score" in det["metrics"]


def test_synthetic_fallback_is_loud(tiny_adapter, capsys):
    register_builtin_tasks()
    out = evaluate(tiny_adapter, ["mathverse"], limit=2)
    assert out["details"]["mathverse"]["synthetic_docs"] is True
    assert out["synthetic_tasks"] == ["mathverse"]
    assert "SYNTHETIC docs" in capsys.readouterr().err


# ---------------------------------------------------------------------------
# YAML task layer
# ---------------------------------------------------------------------------

def test_yaml_task_loader(tmp_path, tiny_adapter):
    (tmp_path / "myutils.py").write_text(
        "def my_doc_to_visual(doc):\n    return [doc['image']]\n\n"
        "def my_doc_to_text(doc, lmms_eval_specific_kwargs):\n"
        "    pre = lmms_eval_specific_kwargs['pre_prompt']\n"
        "    post = lmms_eval_specific_kwargs['post_prompt']\n"
        "    return f\"{pre}{doc['question']}{post}\"\n\n"
        "def my_process_results(doc, results):\n"
        "    return {'relaxed_overall': float(results[0] is not None)}\n")
    (tmp_path / "mytask.yaml").write_text(
        "dataset_path: %s\n"
        "task: \"my_yaml_task\"\n"
        "test_split: test\n"
        "output_type: generate_until\n"
        "doc_to_visual: !function myutils.my_doc_to_visual\n"
        "doc_to_text: !function myutils.my_doc_to_text\n"
        "doc_to_target: \"answer\"\n"
        "generation_kwargs:\n"
        "  max_new_tokens: 8\n"
        "  temperature: 0\n"
        "  do_sample: False\n"
        "process_results: !function myutils.my_process_results\n"
        "metric_list:\n"
        "  - metric: relaxed_overall\n"
        "    aggregation: mean\n"
        "lmms_eval_specific_kwargs:\n"
        "  default:\n"
        "    pre_prompt: \"\"\n"
        "    post_prompt: \"\\nAnswer briefly.\"\n"
        % (tmp_path / "ds"))
    rows = [{"question": "How many?", "answer": "2", "image": _pil(40)}]
    _save_hf(tmp_path / "ds", "test", rows)

    from msd_tpu.harness.yaml_task import register_yaml_dir
    names = register_yaml_dir(str(tmp_path))
    assert names == ["my_yaml_task"]
    task = TASK_REGISTRY["my_yaml_task"]
    assert task.gen_kwargs == {"max_new_tokens": 8, "temperature": 0}
    docs = task.load_docs()
    assert task.doc_to_text(docs[0]) == "How many?\nAnswer briefly."
    out = evaluate(tiny_adapter, ["my_yaml_task"], limit=1)
    assert out["details"]["my_yaml_task"]["metrics"]["relaxed_overall"] == 1.0
