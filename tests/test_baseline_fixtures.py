"""End-to-end score fidelity on the six BASELINE tasks (round-4 VERDICT
item 7).

The existing real-schema tests (test_tasks_real_schema.py) prove the
harness consumes real HF layouts; they cannot pin SCORES because the tiny
random model's predictions are garbage. Here a scripted adapter returns
controlled predictions for ~20 real-layout docs, and the harness's
aggregated metrics are asserted against hand-computed values derived from
the reference scoring rules:

  chartqa    relaxed_correctness, 5% numeric tolerance + split metrics
             (tasks/chartqa/utils.py relaxed_correctness)
  textvqa    VQAv2 leave-one-annotator-out min(1, matches/3)
             (tasks/textvqa/utils.py + vqa_eval_metric)
  ai2d       option-index answers -> letters, letter extraction
             (tasks/ai2d/utils.py:31-38)
  iconqa     same MC rule (tasks/iconqa yaml family)
  mathvista  extract -> normalize -> safe_equal chain
             (tasks/mathvista/mathvista_evals.py)
  mathverse  extract + normalized match (tasks/mathverse/mathverse_evals)

A scorer regression on any of these now fails a test instead of silently
shifting reported numbers.
"""

import numpy as np
import pytest

from msd_tpu.harness.evaluator import evaluate
from msd_tpu.harness.registry import register_task
from msd_tpu.harness.tasks import (make_chartqa, make_mathverse,
                                   make_mathvista, make_mc_task,
                                   make_textvqa)


def _pil(seed, size=32):
    from PIL import Image
    rng = np.random.default_rng(seed)
    return Image.fromarray(
        rng.integers(0, 255, size=(size, size, 3), dtype=np.uint8))


def _save_hf(tmpdir, split, rows):
    import datasets
    ds = datasets.Dataset.from_dict(
        {k: [r[k] for r in rows] for k in rows[0]})
    datasets.DatasetDict({split: ds}).save_to_disk(str(tmpdir))
    return str(tmpdir)


class ScriptedLM:
    """Adapter double: answers each request by looking up the doc's
    question in a script. Exercises the real evaluate() request/response
    plumbing with deterministic predictions."""

    def __init__(self, script):
        self.script = script  # question-substring -> prediction

    def generate_until(self, requests):
        out = []
        for r in requests:
            q = str(r.doc.get("question", r.doc.get("query_wo", "")))
            for key, pred in self.script.items():
                if key in q:
                    out.append(pred)
                    break
            else:
                raise AssertionError(f"unscripted question: {q!r}")
        return out


def test_chartqa_fixture_scores(tmp_path):
    rows = [
        # 14 vs 14.5: |14.5-14|/14 = 0.0357 <= 0.05 -> correct (human)
        {"question": "Q-bar-height", "answer": "14", "type": "human_test",
         "image": _pil(0)},
        # case-insensitive string match -> correct (human)
        {"question": "Q-color", "answer": "Blue", "type": "human_test",
         "image": _pil(1)},
        # 27 vs 25: 0.08 > 0.05 -> wrong (augmented)
        {"question": "Q-total", "answer": "25", "type": "augmented_test",
         "image": _pil(2)},
        # non-numeric mismatch -> wrong (augmented)
        {"question": "Q-animal", "answer": "cat", "type": "augmented_test",
         "image": _pil(3)},
    ]
    path = _save_hf(tmp_path / "ChartQA", "test", rows)
    register_task("chartqa_scored_fixture", make_chartqa(path))
    lm = ScriptedLM({"Q-bar-height": "14.5", "Q-color": "blue",
                     "Q-total": "27", "Q-animal": "dog"})
    out = evaluate(lm, ["chartqa_scored_fixture"])
    m = out["details"]["chartqa_scored_fixture"]["metrics"]
    assert abs(m["relaxed_overall"] - 0.5) < 1e-9
    assert abs(m["relaxed_human_split"] - 1.0) < 1e-9
    assert abs(m["relaxed_augmented_split"] - 0.0) < 1e-9


def test_textvqa_fixture_scores(tmp_path):
    rows = [
        # unanimous annotators, exact match -> 1.0
        {"question": "q-sign says", "answers": ["stop"] * 10,
         "question_id": 0, "image": _pil(10)},
        # 2 of 10 annotators say "red": leave-one-out gives
        # (2*(1/3) + 8*(2/3)) / 10 = 0.6
        {"question": "q-shirt color", "answers": ["red"] * 2 + ["blue"] * 8,
         "question_id": 1, "image": _pil(11)},
        # normalization: "Two" -> "2" matches annotator "2"; and the VQA
        # punctuation/article strip makes "the 2." -> "2" as well
        {"question": "q-how many", "answers": ["2"] * 10,
         "question_id": 2, "image": _pil(12)},
        # no annotator agreement -> 0.0
        {"question": "q-brand", "answers": ["nike"] * 10,
         "question_id": 3, "image": _pil(13)},
    ]
    path = _save_hf(tmp_path / "TextVQA", "validation", rows)
    task = make_textvqa(path)
    task.split = "validation"
    register_task("textvqa_scored_fixture", task)
    lm = ScriptedLM({"q-sign says": "stop", "q-shirt color": "red",
                     "q-how many": "Two", "q-brand": "adidas"})
    out = evaluate(lm, ["textvqa_scored_fixture"])
    m = out["details"]["textvqa_scored_fixture"]["metrics"]
    assert abs(m["exact_match"] - (1.0 + 0.6 + 1.0 + 0.0) / 4) < 1e-9


@pytest.mark.parametrize("task_name", ["ai2d", "iconqa"])
def test_mc_fixture_scores(tmp_path, task_name):
    # real AI2D/IconQA layout: bare option texts, answer = index string
    rows = [
        {"question": "q-part A", "options": ["stem", "leaf", "root", "bud"],
         "answer": "1", "image": _pil(20)},   # gt letter B
        {"question": "q-part B", "options": ["stem", "leaf", "root", "bud"],
         "answer": "0", "image": _pil(21)},   # gt letter A
        {"question": "q-part C", "options": ["stem", "leaf", "root", "bud"],
         "answer": "2", "image": _pil(22)},   # gt letter C
        {"question": "q-part D", "options": ["stem", "leaf", "root", "bud"],
         "answer": "3", "image": _pil(23)},   # gt letter D
    ]
    path = _save_hf(tmp_path / task_name, "test", rows)
    register_task(f"{task_name}_scored_fixture",
                  make_mc_task(f"{task_name}_scored_fixture", path))
    lm = ScriptedLM({
        "q-part A": "B",                    # bare letter -> correct
        "q-part B": "A. stem",              # lettered option -> correct
        "q-part C": "D",                    # wrong letter
        "q-part D": "The answer is D.",     # letter in prose -> correct
    })
    out = evaluate(lm, [f"{task_name}_scored_fixture"])
    m = out["details"][f"{task_name}_scored_fixture"]["metrics"]
    assert abs(m["accuracy"] - 0.75) < 1e-9


def test_mathvista_fixture_scores(tmp_path):
    rows = [
        # free-form integer: "The answer is 7." extracts 7 -> correct
        {"question": "mv-add", "question_type": "free_form",
         "answer_type": "integer", "choices": None, "answer": "7",
         "precision": 0, "query": "", "pid": "0", "unit": "",
         "metadata": {"split": "testmini"}, "decoded_image": _pil(30)},
        # multi-choice: "(B)" normalizes to the B choice text -> correct
        {"question": "mv-color", "question_type": "multi_choice",
         "answer_type": "text", "choices": ["red", "green", "blue"],
         "answer": "green", "precision": 0, "query": "", "pid": "1",
         "unit": "", "metadata": {"split": "testmini"},
         "decoded_image": _pil(31)},
        # free-form float at precision 1: 1.24 rounds to 1.2 -> correct
        {"question": "mv-length", "question_type": "free_form",
         "answer_type": "float", "choices": None, "answer": "1.2",
         "precision": 1, "query": "", "pid": "2", "unit": "cm",
         "metadata": {"split": "testmini"}, "decoded_image": _pil(32)},
        # wrong integer -> 0
        {"question": "mv-count", "question_type": "free_form",
         "answer_type": "integer", "choices": None, "answer": "5",
         "precision": 0, "query": "", "pid": "3", "unit": "",
         "metadata": {"split": "testmini"}, "decoded_image": _pil(33)},
    ]
    path = _save_hf(tmp_path / "MathVista", "testmini", rows)
    register_task("mathvista_scored_fixture", make_mathvista(path))
    lm = ScriptedLM({"mv-add": "The answer is 7.",
                     "mv-color": "(B) because the grass",
                     "mv-length": "It measures 1.24 cm",
                     "mv-count": "The answer is 4."})
    out = evaluate(lm, ["mathvista_scored_fixture"])
    m = out["details"]["mathvista_scored_fixture"]["metrics"]
    assert abs(m["gpt_eval_score"] - 0.75) < 1e-9


def test_mathverse_fixture_scores(tmp_path):
    rows = [
        # numeric match through extraction -> correct
        {"question": "mve-times", "query_wo": "mve-times: what is 6 x 2?",
         "query_cot": "mve-times cot", "question_type": "free-form",
         "problem_version": "Text Only", "answer": "12",
         "sample_index": "0", "problem_index": "0",
         "metadata": {"split": "testmini"}, "image": _pil(40)},
        # option-letter answer accepted in "(B)" form -> correct
        {"question": "mve-opt", "query_wo": "mve-opt: which option?",
         "query_cot": "mve-opt cot", "question_type": "multi-choice",
         "problem_version": "Text Only", "answer": "B",
         "sample_index": "1", "problem_index": "1",
         "metadata": {"split": "testmini"}, "image": _pil(41)},
        # wrong number -> 0
        {"question": "mve-wrong", "query_wo": "mve-wrong: how many?",
         "query_cot": "mve-wrong cot", "question_type": "free-form",
         "problem_version": "Text Only", "answer": "3",
         "sample_index": "2", "problem_index": "2",
         "metadata": {"split": "testmini"}, "image": _pil(42)},
    ]
    path = _save_hf(tmp_path / "MathVerse", "testmini", rows)
    register_task("mathverse_scored_fixture", make_mathverse(path))
    # "The answer is N" is the pattern the offline extractor (shared with
    # MathVista) recognizes; the reference's GPT extraction round is the
    # documented deviation (PARITY.md)
    lm = ScriptedLM({"mve-times": "The answer is 12.",
                     "mve-opt": "(B)",
                     "mve-wrong": "The answer is 4."})
    out = evaluate(lm, ["mathverse_scored_fixture"])
    m = out["details"]["mathverse_scored_fixture"]["metrics"]
    assert abs(m["gpt_eval_score"] - 2.0 / 3.0) < 1e-9
