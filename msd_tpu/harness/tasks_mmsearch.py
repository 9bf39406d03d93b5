"""MMSearch task family — the reference's agentic multimodal-search
benchmark (lmms-eval/lmms_eval/tasks/mmsearch/: mmsearch_end2end.yaml,
mmsearch_rerank.yaml, mmsearch_summarization.yaml).

Three tasks:

* ``mmsearch_rerank`` — single round: 8 website briefs (title/snippet/
  screenshot), model picks ``<Website N>``; rek_score 1 / 0.5 / 0 against
  the doc's valid / not_sure / invalid index sets
  (lmms_eval_utils.py:394-430, utils/prompt_utils.py:70-92).
* ``mmsearch_summarization`` — single round: one full website (title/
  snippet/retrieved content/fullpage screenshot), squad-token F1 over
  gt_answer plus alternative_gt_answers (score/f1_score.py,
  lmms_eval_utils.py:338-364).
* ``mmsearch_end2end`` — the reference's multi-round pipeline
  (generate_until_multi_round; lmms_eval_utils.py:40-162): round 1
  requery, round 2 search+rerank, round 3 fullpage+summarize. Scored on
  end2end_f1_score (answer) and requery_score = mean(BLEU-1 smoothed,
  ROUGE-L f) vs gt_requery (score/req_score.py).

Documented deviation (PARITY.md): the reference's round 2/3 call a LIVE
search engine + Playwright screenshotter (utils/web_content_utils.py) and
a SentenceTransformer content retriever (retrieve_content/retriever.py).
This environment has zero egress, so search is an OFFLINE retriever over
website entries carried in the doc itself (``websites`` list, or the
rerank-split ``website{i}_info`` fields); when a doc carries none, a
deterministic stub result set is synthesized so the 3-round protocol and
both metrics still exercise end-to-end. Scoring semantics are the
reference's exactly.
"""

from __future__ import annotations

import collections
import math
import re
import string
from typing import Dict, List, Optional, Sequence

import numpy as np

from msd_tpu.harness.tasks import TaskConfig, _synth_image
from msd_tpu.harness.registry import register_task
BRIEF_RESULT_NUM = 8   # lmms_eval_utils.py:36
FULLPAGE_NUM = 1       # lmms_eval_utils.py:37
# The reference embeds a literal <image> per screenshot in the prompt text
# (prompt_utils.py:18). This harness's convention (muirbench, mirb, ...)
# keeps image placeholders OUT of doc_to_text — screenshots ride
# doc_to_visual and the single-image LLaVA adapter consumes visuals[0]
# while interleave-capable adapters may consume all — so the text carries a
# plain label instead of an expanding token.
IMG = "[screenshot]"


# ---------------------------------------------------------------------------
# Scoring primitives (score/f1_score.py, score/req_score.py — exact)
# ---------------------------------------------------------------------------

def _normalize_answer(s: str) -> str:
    """Lower, strip punctuation/articles/extra whitespace
    (score/f1_score.py:6-23)."""
    s = "".join(ch for ch in str(s).lower()
                if ch not in set(string.punctuation))
    s = re.sub(r"\b(a|an|the)\b", " ", s)
    return " ".join(s.split())


def get_f1_score(a_pred: str, a_gold: str) -> float:
    """Squad-style token F1 (score/f1_score.py:26-47): empty-vs-empty
    agreement counts 1, any other empty side 0."""
    gold = _normalize_answer(a_gold).split() if a_gold else []
    pred = _normalize_answer(a_pred).split() if a_pred else []
    if not gold or not pred:
        return float(gold == pred)
    common = collections.Counter(gold) & collections.Counter(pred)
    num_same = sum(common.values())
    if num_same == 0:
        return 0.0
    p = num_same / len(pred)
    r = num_same / len(gold)
    return 2 * p * r / (p + r)


def _bleu1_smoothed(pred: str, gt: str) -> float:
    """sentence_bleu weights (1,0,0,0) with nltk SmoothingFunction.method1
    (score/req_score.py:8-13): clipped unigram precision, zero numerator
    replaced by epsilon 0.1, times brevity penalty."""
    pt, gtt = str(pred).split(), str(gt).split()
    if not pt:
        return 0.0
    clipped = collections.Counter(pt) & collections.Counter(gtt)
    num = sum(clipped.values())
    p1 = (num if num > 0 else 0.1) / len(pt)
    bp = 1.0 if len(pt) >= len(gtt) else math.exp(1 - len(gtt) / len(pt))
    return bp * p1


def _lcs_word_set(ref: List[str], hyp: List[str]) -> set:
    """Unique words on the standard LCS backtrack between two token lists
    (up-move preferred on ties, matching the `rouge` package's _recon_lcs
    so rare same-length-different-words backtracks agree)."""
    n, m = len(ref), len(hyp)
    t = [[0] * (m + 1) for _ in range(n + 1)]
    for i in range(1, n + 1):
        ri = ref[i - 1]
        ti, tp = t[i], t[i - 1]
        for j in range(1, m + 1):
            ti[j] = (tp[j - 1] + 1 if ri == hyp[j - 1]
                     else (tp[j] if tp[j] > ti[j - 1] else ti[j - 1]))
    out: set = set()
    i, j = n, m
    while i and j:
        if ref[i - 1] == hyp[j - 1]:
            out.add(ref[i - 1])
            i -= 1
            j -= 1
        elif t[i - 1][j] > t[i][j - 1]:
            i -= 1
        else:
            j -= 1
    return out


def rouge_l_raw(pred: str, gt: str) -> float:
    """ROUGE-L summary-level f-score with the `rouge` pip package's exact
    semantics (the package req_score.py:15-17 instantiates): sentences split
    on '.', RAW whitespace tokens (case- and punctuation-SENSITIVE — unlike
    the casefolded corpus ROUGE-L in task_utils/captioning.py), exclusive
    (unique-word) counting, union-LCS across sentences, and the package's
    f = 2pr/(p+r+1e-8). Verified token-for-token against `rouge.Rouge` in
    tests/test_mmsearch.py. Empty either side scores 0.0 (the package
    raises ValueError; the reference never feeds it empties)."""
    hyp_sents = [" ".join(seg.split()) for seg in str(pred).split(".")
                 if len(seg) > 0]
    ref_sents = [" ".join(seg.split()) for seg in str(gt).split(".")
                 if len(seg) > 0]
    if not hyp_sents or not ref_sents:
        return 0.0
    hyp_words = [s.split(" ") for s in hyp_sents]
    m = len({w for s in ref_sents for w in s.split(" ")})
    n = len({w for s in hyp_words for w in s})
    union: set = set()
    llcs = 0
    for ref_s in ref_sents:
        rw = ref_s.split(" ")
        cur: set = set()
        for hw in hyp_words:
            cur |= _lcs_word_set(rw, hw)
        llcs += len(union | cur) - len(union)
        union |= cur
    r = llcs / m
    p = llcs / n
    return 2.0 * p * r / (p + r + 1e-8)


def get_requery_score(prediction: str, gt: str) -> Dict[str, float]:
    """(BLEU-1 + ROUGE-L f) / 2 (score/req_score.py:5-23). ROUGE-L is the
    `rouge` package's raw-token summary-level score (see rouge_l_raw) —
    round-4 ADVICE: the captioning tokenizer's casefolded whole-string LCS
    inflated requery_score (e.g. 'iPhone 16 release date' vs 'iphone 16
    release date?' scored 1.0 instead of the reference's 0.5)."""
    bleu = _bleu1_smoothed(prediction, gt)
    rl = rouge_l_raw(prediction, gt)
    return {"bleu": bleu, "rouge_l": rl, "score": (bleu + rl) / 2}


def postprocess_rerank(rerank: str, rerank_num: int = FULLPAGE_NUM):
    """Parse ``<Website N>`` picks, 1-based in text, 0-based out
    (utils/prompt_utils.py:70-92). Over-count parses truncate; a PARTIAL
    parse (0 < len < rerank_num) keeps the parsed indices; only a zero
    parse substitutes [0..rerank_num). All three are marked invalid."""
    idx = [int(x) - 1 for x in re.findall(r"<Website (\d+)>", str(rerank))]
    if len(idx) > rerank_num:
        return idx[:rerank_num], False
    if len(idx) < rerank_num:
        return (idx if idx else list(range(rerank_num))), False
    return idx, True


# ---------------------------------------------------------------------------
# Prompt construction (prompts/prompt.py, utils/prompt_utils.py)
# ---------------------------------------------------------------------------

_STAGE1 = (
    "You are a helpful assistant. I am giving you a question, which cannot "
    "be solved without external knowledge.\nAssume you have access to a "
    "text-only search engine (e.g., google). Please raise a query to the "
    "search engine to search for what is useful for you to answer the "
    "question correctly.\nQuestion: {question}\n"
    "Query to the search engine (do not involve any explanation): ")

_STAGE2 = (
    "You are a helpful assistant. I am giving you a question and "
    "{brief_result_num} website information related to the question "
    "(including the screenshot, snippet and title).\nSelect {rerank_num} "
    "website that are the most helpful for you to answer the question.\n"
    "The question is: {question}\nThe website informations is: \n"
    "{website_information}\n\nYou should directly output {rerank_num} "
    "website's index that can help you most, separated with ',', and "
    "enclose each website in angle brackets. The output format should be: "
    "<Website Index>. \nAn example of the output is: {incontext_example}\n"
    "Your answer: ")

_STAGE3 = (
    "You are a helpful assistant. I am giving you a question and "
    "{rerank_num} website information related to the question.\n"
    "Please follow these guidelines when formulating your answer:\n"
    "1. If the question contains a false premise or assumption, answer "
    "\"invalid question\".\n2. When answering questions about dates, use "
    "the yyyy-mm-dd format.\n3. Answer the question with as few words as "
    "you can.\n\nYou should now read the information of the website and "
    "answer the question.\nThe website informations is "
    "{website_information}\nThe question is: {question}.\n"
    "Please directly output the answer without any explanation: ")


def _rerank_incontext(n: int) -> str:
    # utils/prompt_utils.py:25-27 — 0-based in the example (reference quirk
    # kept verbatim; postprocess subtracts 1 from whatever the model picks)
    return ",".join(f"<Website {i}>" for i in range(n))


def _website_information(briefs: Sequence[Dict]) -> str:
    """utils/prompt_utils.py:12-22 brief template."""
    return "\n\n".join(
        f"Website {i + 1} Title: {b.get('title', '')};\n"
        f"Website {i + 1} snippet: {b.get('snippet', '')};\n"
        f"Website {i + 1} Screenshot: {IMG}"
        for i, b in enumerate(briefs))


def _full_website_information(inst: Dict) -> str:
    """utils/prompt_utils.py:30-68 fullpage template (screenshot slices
    collapse to one image token offline)."""
    return (f"Website Title: {inst.get('title', '')};\n"
            f" Website Snippet: {inst.get('snippet', '')};\n"
            f"Website Content: {inst.get('content', '')};\n"
            f"Website Screenshot: {IMG};\n")


def _doc_briefs(doc: Dict) -> List[Dict]:
    """Offline search-result source: doc['websites'], or the rerank split's
    website{i}_info columns, else a deterministic stub set seeded from the
    query so the end2end protocol always has 8 results to rank."""
    if isinstance(doc.get("websites"), list) and doc["websites"]:
        return list(doc["websites"])[:BRIEF_RESULT_NUM]
    briefs = []
    for i in range(BRIEF_RESULT_NUM):
        info = doc.get(f"website{i}_info")
        if isinstance(info, dict):
            briefs.append(dict(info))
    if briefs:
        return briefs
    q = str(doc.get("query", ""))
    gt = str(doc.get("gt_answer", doc.get("answer", "")))
    hit = sum(ord(c) for c in q) % BRIEF_RESULT_NUM
    return [{"title": f"Result {i + 1} for: {q[:48]}",
             "snippet": (f"{q} — {gt}" if i == hit
                         else f"Unrelated page {i + 1} about {q[:24]}"),
             "content": (f"{q}. The answer is {gt}." if i == hit
                         else f"Filler content {i + 1}.")}
            for i in range(BRIEF_RESULT_NUM)]


def _brief_images(doc: Dict, briefs: Sequence[Dict]) -> List:
    imgs = []
    for i, b in enumerate(briefs):
        shot = doc.get(f"website{i}_head_screenshot", b.get("screenshot"))
        imgs.append(shot if shot is not None else _synth_image(i))
    return imgs


# ---------------------------------------------------------------------------
# mmsearch_rerank
# ---------------------------------------------------------------------------

def make_mmsearch_rerank(dataset_path=None) -> TaskConfig:
    """mmsearch_rerank.yaml + lmms_eval_utils.py:171-183 (visuals),
    185-211 (prompt), 299-318 + 394-430 (rek_score)."""
    def _text(doc):
        briefs = _doc_briefs(doc)
        # len(briefs), not the constant: a doc carrying fewer than 8
        # websites must not have its prompt overstate the count (the
        # end2end round-2 path already does this)
        return _STAGE2.format(
            brief_result_num=len(briefs), rerank_num=FULLPAGE_NUM,
            question=str(doc["query"]),
            website_information=_website_information(briefs),
            incontext_example=_rerank_incontext(FULLPAGE_NUM))

    def _vis(doc):
        vis = []
        if doc.get("query_image") is not None:
            vis.append(doc["query_image"])
            if doc.get("image_search_result") is not None:
                vis.append(doc["image_search_result"])
        vis.extend(_brief_images(doc, _doc_briefs(doc)))
        return vis

    def _res(doc, results):
        sel, valid = postprocess_rerank(str(results[0]).strip())
        sel = sel[0]
        if not valid:
            score = 0.0
        elif sel in list(doc.get("valid", [])):
            score = 1.0
        elif sel in list(doc.get("not_sure", [])):
            score = 0.5
        else:
            score = 0.0
        return {"rek_score": score, "_area": str(doc.get("area", ""))}

    def _agg(rows):
        per = {}
        for r in rows:
            per.setdefault(r["_area"], []).append(r["rek_score"])
        return {f"rek_score_{a}": float(np.mean(xs))
                for a, xs in sorted(per.items()) if a}

    return TaskConfig(
        name="mmsearch_rerank",
        doc_to_text=_text, doc_to_visual=_vis, process_results=_res,
        dataset_path=dataset_path,
        gen_kwargs={"max_new_tokens": 64, "temperature": 0.0,
                    "until": ["ASSISTANT:"]},
        metric_names=("rek_score",), aggregate_extra=_agg,
        synthetic_docs=lambda n: [{
            "sample_id": f"rr{i}", "query": f"what is entity {i}",
            "gt_answer": f"entity-{i}", "area": ("news", "knowledge")[i % 2],
            "subfield": "synthetic", "timestamp": "2024-01-01",
            "query_image": None,
            **{f"website{j}_info": {
                "title": f"doc{i} site {j + 1}",
                "snippet": (f"entity {i} explained" if j == i % 8
                            else f"other page {j}")}
               for j in range(BRIEF_RESULT_NUM)},
            "valid": [i % 8], "not_sure": [(i + 1) % 8],
            "invalid": [j for j in range(8)
                        if j not in (i % 8, (i + 1) % 8)],
        } for i in range(n)])


# ---------------------------------------------------------------------------
# mmsearch_summarization
# ---------------------------------------------------------------------------

def make_mmsearch_summarization(dataset_path=None) -> TaskConfig:
    """mmsearch_summarization.yaml + lmms_eval_utils.py:215-283 (prompt),
    320-336 + 338-364 (answer F1 with alternatives)."""
    def _full(doc):
        return {"title": doc.get("website_title", ""),
                "snippet": doc.get("website_snippet", ""),
                "content": doc.get("website_retrieved_content", "")}

    def _text(doc):
        return _STAGE3.format(
            rerank_num=FULLPAGE_NUM,
            website_information=_full_website_information(_full(doc)),
            question=str(doc["query"]))

    def _vis(doc):
        vis = [doc.get("website_fullpage_screenshot")]
        if doc.get("query_image") is not None:
            vis += [doc.get("image_search_result"), doc["query_image"]]
        return [v if v is not None else _synth_image(0) for v in vis]

    def _res(doc, results):
        pred = str(results[0]).strip()
        f1 = get_f1_score(pred, str(doc.get("gt_answer", "")))
        for alt in list(doc.get("alternative_gt_answers", [])):
            f1 = max(f1, get_f1_score(pred, str(alt)))
        return {"summarization_f1_score": f1,
                "_area": str(doc.get("area", ""))}

    def _agg(rows):
        per = {}
        for r in rows:
            per.setdefault(r["_area"], []).append(
                r["summarization_f1_score"])
        return {f"f1_{a}": float(np.mean(xs))
                for a, xs in sorted(per.items()) if a}

    return TaskConfig(
        name="mmsearch_summarization",
        doc_to_text=_text, doc_to_visual=_vis, process_results=_res,
        dataset_path=dataset_path,
        gen_kwargs={"max_new_tokens": 1024, "temperature": 0.0,
                    "until": ["ASSISTANT:"]},
        metric_names=("summarization_f1_score",), aggregate_extra=_agg,
        synthetic_docs=lambda n: [{
            "sample_id": f"sm{i}", "query": f"when was item {i} released",
            "gt_answer": f"2024-0{i % 9 + 1}-15",
            "alternative_gt_answers": [f"january {i}"],
            "area": "news", "subfield": "synthetic",
            "timestamp": "2024-01-01", "query_image": None,
            "website_title": f"item {i} page",
            "website_snippet": f"release info for item {i}",
            "website_retrieved_content":
                f"Item {i} was released on 2024-0{i % 9 + 1}-15.",
            "website_fullpage_screenshot": _synth_image(i),
        } for i in range(n)])


# ---------------------------------------------------------------------------
# mmsearch_end2end (multi-round)
# ---------------------------------------------------------------------------

def make_mmsearch_end2end(dataset_path=None) -> TaskConfig:
    """mmsearch_end2end.yaml: generate_until_multi_round through the
    reference round protocol (lmms_eval_utils.py:40-162). round_res is
    [requery, rerank, answer]; scored on answer F1 + requery BLEU/ROUGE
    (lmms_eval_utils.py:281-297, 338-392)."""
    def _text(doc, lmms_eval_specific_kwargs=None, previous_output=None,
              round_idx=None, previous_round_info=None):
        query = str(doc["query"])
        if round_idx is None:           # round 1: requery
            return _STAGE1.format(question=query)
        if round_idx == 1:              # round 2: offline search + rerank
            briefs = _doc_briefs(doc)
            ctx = _STAGE2.format(
                brief_result_num=len(briefs), rerank_num=FULLPAGE_NUM,
                question=query,
                website_information=_website_information(briefs),
                incontext_example=_rerank_incontext(FULLPAGE_NUM))
            vis = _brief_images(doc, briefs)
            return vis, ctx, False, list(previous_output), {
                "result_brief": briefs}
        if round_idx == 2:              # round 3: fullpage + summarize
            briefs = previous_round_info["result_brief"]
            sel, _ = postprocess_rerank(str(previous_output[1]))
            inst = dict(briefs[sel[0] % len(briefs)])
            inst.setdefault("content", inst.get("snippet", ""))
            ctx = _STAGE3.format(
                rerank_num=FULLPAGE_NUM,
                website_information=_full_website_information(inst),
                question=query)
            return ([_synth_image(0)], ctx, False, list(previous_output),
                    previous_round_info)
        return None, None, True, list(previous_output), None

    def _vis(doc):
        if doc.get("query_image") is None:
            return []
        return [doc["query_image"], doc.get("image_search_result")]

    def _res(doc, results):
        rr = results[0] if results and isinstance(results[0], list) \
            else list(results)
        requery = str(rr[0]) if len(rr) > 0 and rr[0] is not None else ""
        answer = str(rr[2]) if len(rr) > 2 and rr[2] is not None else ""
        f1 = get_f1_score(answer, str(doc.get("gt_answer", "")))
        for alt in list(doc.get("alternative_gt_answers", [])):
            f1 = max(f1, get_f1_score(answer, str(alt)))
        req = get_requery_score(requery, str(doc.get("gt_requery", "")))
        return {"end2end_f1_score": f1, "requery_score": req["score"],
                "_area": str(doc.get("area", ""))}

    def _agg(rows):
        per = {}
        for r in rows:
            per.setdefault(r["_area"], []).append(r["end2end_f1_score"])
        return {f"f1_{a}": float(np.mean(xs))
                for a, xs in sorted(per.items()) if a}

    return TaskConfig(
        name="mmsearch_end2end",
        doc_to_text=_text, doc_to_visual=_vis, process_results=_res,
        dataset_path=dataset_path, output_type="generate_until_multi_round",
        gen_kwargs={"max_new_tokens": 512, "temperature": 0.0,
                    "until": ["ASSISTANT:"], "max_rounds": 4},
        metric_names=("end2end_f1_score", "requery_score"),
        aggregate_extra=_agg,
        synthetic_docs=lambda n: [{
            "sample_id": f"e2e{i}", "query": f"who made gadget {i}",
            "gt_answer": f"maker-{i}", "gt_requery": f"gadget {i} maker",
            "alternative_gt_answers": [], "area": "tech",
            "subfield": "synthetic", "timestamp": "2024-01-01",
            "query_image": None,
        } for i in range(n)])


def register_mmsearch_tasks(p) -> None:
    register_task("mmsearch_rerank", make_mmsearch_rerank(p("MMSearch")))
    register_task("mmsearch_summarization",
                  make_mmsearch_summarization(p("MMSearch")))
    register_task("mmsearch_end2end", make_mmsearch_end2end(p("MMSearch")))
