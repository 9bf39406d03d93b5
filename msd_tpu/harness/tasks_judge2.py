"""Judge-backed round-4 tasks: wild_vision_bench, vibe_eval, mia_bench.

All three are GPT-judged in the reference; here the judge seam is pluggable
(msd_tpu.harness.judge) with deterministic offline fallbacks. Offline
numbers are pipeline checks, NOT comparable to GPT-judged scores
(documented in PARITY.md).
"""

from __future__ import annotations

import re
from typing import Dict, List

import numpy as np

from msd_tpu.harness.tasks import TaskConfig, _synth_image
from msd_tpu.harness.registry import register_task
from msd_tpu.harness.tasks_judge import _token_f1
from msd_tpu.harness import judge as J


# ---------------------------------------------------------------------------
# WildVision-Bench (wild_vision_bench/utils.py)
# ---------------------------------------------------------------------------

_WV_SYSTEM = (
    "Please act as an impartial judge and evaluate the quality of the "
    "responses provided by two AI assistants to the user prompt displayed "
    "below. You will be given assistant A's answer and assistant B's "
    "answer. Your job is to evaluate which assistant's answer is better. "
    "After providing your explanation, you must output only one of the "
    "following choices as your final verdict with a label:\n\n"
    "1. Assistant A is significantly better: [[A>>B]]\n"
    "2. Assistant A is slightly better: [[A>B]]\n"
    "3. Tie, relatively the same: [[A=B]]\n"
    "4. Assistant B is slightly better: [[B>A]]\n"
    "5. Assistant B is significantly better: [[B>>A]]")

_WV_TEMPLATE = ("<|User Prompt|>\n{question_1}\n\n<|The Start of Assistant "
                "A's Answer|>\n{answer_1}\n<|The End of Assistant A's "
                "Answer|>\n\n<|The Start of Assistant B's Answer|>\n"
                "{answer_2}\n<|The End of Assistant B's Answer|>")


def wild_vision_judgement_to_score(score: str):
    """wild_vision_bench/utils.py:162-185 verdict mapping (A = baseline,
    B = the evaluated model). NOTE the reference checks 'A>B' BEFORE
    'A>>B', so a strict 'A>>B' verdict also matches the substring 'A>B'
    in ITS order; the canonical map below is ordered longest-first, which
    matches the judge contract ([[A>>B]] labels)."""
    for pat, (raw, winner) in (("A>>B", (-2, "model_a")),
                               ("B>>A", (2, "model_b")),
                               ("A>B", (-1, "model_a")),
                               ("B>A", (1, "model_b")),
                               ("A=B", (0, "tie"))):
        if pat in score:
            return raw, winner
    return 0, "tie"


def make_wild_vision(dataset_path=None) -> TaskConfig:
    """Pairwise judge vs the dataset's baseline-model answer
    (claude-3-sonnet column, utils.py:31,152-199). Metrics: mean raw score
    in [-2, 2] and win rate vs the baseline. Offline fallback: tie when the
    prediction token-F1-agrees with the baseline answer (>= 0.5), else
    'worse' — a pipeline check only."""
    def _baseline(d) -> str:
        for k in ("claude-3-sonnet-20240229", "baseline_answer", "answer"):
            if d.get(k):
                return str(d[k])
        return ""

    def _res(d, r):
        pred = str(r[0]) if r else ""
        base = _baseline(d)
        j = J.get_judge()
        raw = None
        if j is not None:
            out = j.complete(
                _WV_TEMPLATE.format(question_1=d.get("instruction", ""),
                                    answer_1=base, answer_2=pred),
                max_tokens=1024, system=_WV_SYSTEM)
            if out:
                m = re.search(r"\[\[([AB<>=]+)\]\]", out)
                raw, _ = wild_vision_judgement_to_score(
                    m.group(1) if m else out)
        if raw is None:
            raw = 0 if _token_f1(pred, base) >= 0.5 else -1
        return {"raw_score": float(raw),
                "win": 1.0 if raw > 0 else 0.0}

    return TaskConfig(
        name="wildvision_0617",
        doc_to_text=lambda d: str(d.get("instruction", "")),
        doc_to_visual=lambda d: [d["image"]],
        process_results=_res,
        dataset_path=dataset_path,
        gen_kwargs={"max_new_tokens": 512, "temperature": 0.0},
        metric_names=("raw_score", "win"),
        synthetic_docs=lambda n: [{
            "instruction": f"Describe object {i} in the image.",
            "claude-3-sonnet-20240229": f"object {i} is a red cube",
            "image": _synth_image(i)} for i in range(n)])


# ---------------------------------------------------------------------------
# Vibe-Eval (vibe_eval/utils.py)
# ---------------------------------------------------------------------------

def make_vibe_eval(dataset_path=None) -> TaskConfig:
    """vibe_eval/utils.py:41-141: the judge rates the generation against
    the ground-truth reference 1-5 ('Rating: (int)'); aggregate is
    25*(score-1) averaged — a 0-100 scale (:186-189) — reported overall
    and for the 'hard' subset. Offline fallback: rating = 1 + round(4 *
    tokenF1(pred, reference))."""
    _T = ("[Question]\n{prompt}\n\n[Assistant Response]\n{generation}\n\n"
          "[Ground Truth Response]\n{reference}\n\n[System]\nRate whether "
          "the assistant response correctly matches the ground truth, in "
          "regards to the image above.\nThe rating should be 1-5, where 1 "
          "is incorrect and 5 is correct.\nYour response should be in the "
          "format:\nExplanation: (your explanation)\nRating: (int)")

    def _res(d, r):
        pred = str(r[0]) if r else ""
        ref = str(d.get("reference", ""))
        j = J.get_judge()
        score = None
        if j is not None:
            out = j.complete(_T.format(prompt=d.get("prompt", ""),
                                       generation=pred, reference=ref),
                             max_tokens=512)
            if out:
                m = re.search(r"Rating:\s*([1-5])", out)
                score = int(m.group(1)) if m else 0
        if score is None:
            score = 1 + round(4 * _token_f1(pred, ref))
        row = {"score100": 25.0 * (score - 1)}
        if "hard" in str(d.get("category", "")):
            row["_hard"] = row["score100"]
        return row

    def _agg(rows):
        hard = [r["_hard"] for r in rows if "_hard" in r]
        return {"hard": float(np.mean(hard))} if hard else {}

    return TaskConfig(
        name="vibe_eval",
        doc_to_text=lambda d: str(d.get("prompt", "")).strip(),
        doc_to_visual=lambda d: [d["image"]],
        process_results=_res,
        dataset_path=dataset_path,
        gen_kwargs={"max_new_tokens": 512, "temperature": 0.0},
        metric_names=("score100",),
        aggregate_extra=_agg,
        synthetic_docs=lambda n: [{
            "prompt": f"What is in image {i}?",
            "reference": f"a red cube numbered {i}",
            "category": ("normal", "hard")[i % 2],
            "image": _synth_image(i)} for i in range(n)])


# ---------------------------------------------------------------------------
# MIA-Bench (mia_bench/utils.py)
# ---------------------------------------------------------------------------

def make_mia_bench(dataset_path=None) -> TaskConfig:
    """mia_bench/utils.py:97-167: the judge scores each instruction
    component against its weight and reports 'total score: z/10'; the
    metric is the mean total in [0, 1]. Offline fallback:
    tokenF1(pred, instruction) as the total — pipeline check only."""
    def _res(d, r):
        pred = str(r[0]) if r else ""
        instr = str(d.get("instruction", ""))
        comps = d.get("components") or []
        j = J.get_judge()
        total = None
        if j is not None:
            comp_lines = "".join(f"\ncomponent {i + 1}: {c}"
                                 for i, c in enumerate(comps))
            prompt = (
                f"Here is an instruction for a multimodal LLM: '{instr}'. "
                f"You need to grade if the response from the model follows "
                f"each component of the instruction.{comp_lines}\n"
                f"The response is: '{pred}' You need to score the response "
                "and be strict. The total score ranges from 0 to 10, "
                "depending on if the response follows the instruction. "
                "List scores of each component, and the total score in one "
                "sentence in this format: score of component 1: x/2, score "
                "of component 2: y/8, total score: z/10. Then explain your "
                "reasons.")
            out = j.complete(prompt, max_tokens=512)
            if out:
                m = re.search(r"total score:\s*(\d+(?:\.\d+)?)\s*/\s*(\d+)",
                              out, re.IGNORECASE)
                if m and float(m.group(2)) > 0:
                    total = min(1.0, float(m.group(1)) / float(m.group(2)))
        if total is None:
            total = _token_f1(pred, instr)
        return {"total_score": total}

    return TaskConfig(
        name="mia_bench",
        doc_to_text=lambda d: str(d.get("instruction", "")),
        doc_to_visual=lambda d: [d["image"]],
        process_results=_res,
        dataset_path=dataset_path,
        gen_kwargs={"max_new_tokens": 512, "temperature": 0.0},
        metric_names=("total_score",),
        synthetic_docs=lambda n: [{
            "instruction": f"Describe image {i} in exactly two sentences.",
            "components": ["describe the image", "use two sentences"],
            "image": _synth_image(i)} for i in range(n)])


def register_judge2_tasks(p) -> None:
    register_task("wildvision_0617", make_wild_vision(p("WildVision")))
    register_task("vibe_eval", make_vibe_eval(p("VibeEval")))
    register_task("mia_bench", make_mia_bench(p("MIA-Bench")))
