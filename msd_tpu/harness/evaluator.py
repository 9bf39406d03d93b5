"""Evaluation orchestration (mirror of lmms-eval/lmms_eval/evaluator.py).

simple_evaluate resolves the model adapter + tasks, builds requests (with
rank/world_size sharding and the ``bottom`` tail-slice), dispatches
``generate_until``, applies per-doc metrics, aggregates, and attaches
``msd_stats = {avg_accept_len, accept_steps, accept_len}``
(evaluator.py:655-665).

Multi-host: each process evaluates its rank's shard; metric lists are
all-gathered over DCN with jax.experimental.multihost_utils when more than
one process is present (the torch.distributed.gather_object analog,
evaluator.py:566-597).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional

from msd_tpu.harness.registry import TASK_REGISTRY, get_model, get_task
from msd_tpu.harness.tasks import register_builtin_tasks


def evaluate(lm, task_names: List[str], *, limit: Optional[int] = None,
             bottom: Optional[int] = None, rank: int = 0,
             world_size: int = 1,
             cache_requests: Optional[str] = None,
             request_cache_dir: Optional[str] = None) -> Dict:
    results: Dict[str, Dict] = {}
    for tname in task_names:
        task = get_task(tname)
        docs = _load_docs_cached(task, tname,
                                 limit=None if bottom else limit,
                                 cache_requests=cache_requests,
                                 cache_dir=request_cache_dir)
        reqs = task.build_requests(docs, rank=rank, world_size=world_size,
                                   limit=limit, bottom=bottom)
        rtype = reqs[0].request_type if reqs else "generate_until"
        t0 = time.time()
        resps = getattr(lm, rtype)(reqs)
        duration = time.time() - t0
        # group responses per doc in request order (loglikelihood tasks emit
        # one request per choice; process_results sees the full list)
        doc_order: List[int] = []
        by_doc: Dict[int, Dict] = {}
        for r, resp in zip(reqs, resps):
            if r.doc_id not in by_doc:
                by_doc[r.doc_id] = {"doc": r.doc, "resps": []}
                doc_order.append(r.doc_id)
            by_doc[r.doc_id]["resps"].append(resp)
        per_doc = [task.process_results(by_doc[d]["doc"], by_doc[d]["resps"])
                   for d in doc_order]
        per_doc = _gather_metrics(per_doc, world_size)
        agg = task.aggregate(per_doc)
        results[tname] = {
            "metrics": agg,
            "n_docs": len(per_doc),
            "synthetic_docs": bool(getattr(task, "used_synthetic_docs",
                                           False)),
            "duration_seconds": duration,
            "samples": [
                {"doc_id": d,
                 "response": (by_doc[d]["resps"][0]
                              if len(by_doc[d]["resps"]) == 1
                              else by_doc[d]["resps"]),
                 "scores": s}
                for d, s in zip(doc_order, per_doc)],
        }
    out = {"results": {t: v["metrics"] for t, v in results.items()},
           "details": results}
    synth = [t for t, v in results.items() if v["synthetic_docs"]]
    if synth:  # loud top-level marker (VERDICT r1 weak #3)
        out["synthetic_tasks"] = synth
    if hasattr(lm, "msd_stats"):
        out["msd_stats"] = lm.msd_stats
    return out


def _load_docs_cached(task, tname: str, *, limit,
                      cache_requests: Optional[str],
                      cache_dir: Optional[str]) -> List[Dict]:
    """Doc-list (request-building) cache: the reference's ``cache_requests``
    surface (lmms-eval/__main__.py:177-183, evaluator.py:678-683 — "true"
    reads+writes, "refresh" rebuilds and overwrites, "delete" drops the
    cached entry then rebuilds)."""
    if not cache_requests:
        return task.load_docs(limit=limit)
    import pickle
    d = cache_dir or ".request_cache"
    import os
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, f"requests_{tname}_{limit}.pkl")
    if cache_requests == "delete" and os.path.exists(path):
        os.remove(path)
    if cache_requests == "true" and os.path.exists(path):
        with open(path, "rb") as f:
            payload = pickle.load(f)
        task.used_synthetic_docs = payload["synthetic"]
        return payload["docs"]
    docs = task.load_docs(limit=limit)
    if cache_requests in ("true", "refresh"):
        with open(path, "wb") as f:
            pickle.dump({"docs": docs,
                         "synthetic": bool(getattr(
                             task, "used_synthetic_docs", False))}, f)
    return docs


def _gather_metrics(per_doc: List[Dict], world_size: int) -> List[Dict]:
    if world_size <= 1:
        return per_doc
    from jax.experimental import multihost_utils
    import numpy as np
    # only numeric metric values survive a multi-host gather; string payloads
    # (e.g. corpus-caption preds/refs) are host-local and dropped here
    keys = sorted({k for d in per_doc for k, v in d.items()
                   if isinstance(v, (int, float))})
    arr = np.asarray([[d.get(k, np.nan) for k in keys] for d in per_doc],
                     dtype=np.float64)
    gathered = multihost_utils.process_allgather(arr)
    gathered = gathered.reshape(-1, len(keys))
    out = []
    for row in gathered:
        out.append({k: float(v) for k, v in zip(keys, row)
                    if not np.isnan(v)})
    return out


def simple_evaluate(*, model, model_args: Optional[Dict] = None,
                    tasks: List[str], limit: Optional[int] = None,
                    bottom: Optional[int] = None, use_msd: bool = True,
                    use_calibration: bool = False, train_ratio: float = 0.2,
                    msd_model_path: Optional[str] = None,
                    rank: int = 0, world_size: int = 1,
                    use_cache: Optional[str] = None,
                    cache_requests: Optional[str] = None) -> Dict:
    if not TASK_REGISTRY:
        register_builtin_tasks()
    # model classes register themselves at import time
    import msd_tpu.harness.models.llava_msd  # noqa: F401
    import msd_tpu.harness.models.qwen2_vl_msd  # noqa: F401
    if isinstance(model, str):
        cls = get_model(model)
        margs = dict(model_args or {})
        margs.setdefault("use_msd", use_msd)
        margs.setdefault("use_calibration", use_calibration)
        margs.setdefault("train_ratio", train_ratio)
        tiny = str(margs.pop("tiny", "")).lower() in ("1", "true", "yes")
        pretrained = margs.pop("pretrained", None)
        if tiny and not pretrained:
            lm = cls.from_tiny(**margs)
        elif pretrained:
            lm = cls.from_pretrained(pretrained, msd_model_path, **margs)
        else:
            raise ValueError(
                "model_args must include 'pretrained' (checkpoint dir), or "
                "pass a constructed adapter instance instead of a name")
    else:
        lm = model
    if use_cache:
        # sqlite response cache around ANY adapter (api/model.py:151-218;
        # CLI flag --use_cache, lmms-eval/__main__.py:170-176)
        from msd_tpu.harness.cache import CachingLM
        tag = model if isinstance(model, str) else type(model).__name__
        lm = CachingLM(lm, use_cache, model_tag=tag)
    return evaluate(lm, tasks, limit=limit, bottom=bottom, rank=rank,
                    world_size=world_size, cache_requests=cache_requests,
                    request_cache_dir=(use_cache + ".requests"
                                       if use_cache else None))
