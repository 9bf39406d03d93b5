"""SQLite response cache — the CachingLMM analog
(lmms-eval/lmms_eval/api/model.py:151-218 with sqlitedict).

Wraps any adapter's generate_until: responses are keyed by a hash of the
request context + gen kwargs + a model tag, so repeated eval runs skip
generation entirely.
"""

from __future__ import annotations

import hashlib
import json
import os
import sqlite3
from typing import List, Optional


class ResponseCache:
    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.conn = sqlite3.connect(path)
        self.conn.execute(
            "CREATE TABLE IF NOT EXISTS responses (key TEXT PRIMARY KEY, "
            "value TEXT)")
        self.conn.commit()

    def get(self, key: str) -> Optional[str]:
        row = self.conn.execute(
            "SELECT value FROM responses WHERE key = ?", (key,)).fetchone()
        return row[0] if row else None

    def put(self, key: str, value: str) -> None:
        self.conn.execute(
            "INSERT OR REPLACE INTO responses VALUES (?, ?)", (key, value))
        self.conn.commit()

    def close(self):
        self.conn.close()


def request_key(model_tag: str, context: str, gen_kwargs: dict,
                doc_id: int, task: str) -> str:
    payload = json.dumps([model_tag, context, sorted(gen_kwargs.items()),
                          doc_id, task], default=str)
    return hashlib.sha256(payload.encode()).hexdigest()


class CachingLM:
    """Adapter wrapper: lm must expose generate_until(requests) -> [str]."""

    def __init__(self, lm, cache_path: str, model_tag: str = "model"):
        self.lm = lm
        self.cache = ResponseCache(cache_path)
        self.model_tag = model_tag

    def generate_until(self, requests) -> List[str]:
        outputs: List[Optional[str]] = [None] * len(requests)
        misses = []
        for i, req in enumerate(requests):
            ctx, gkw = req.arguments[0], req.arguments[1]
            key = request_key(self.model_tag, ctx, gkw, req.doc_id,
                              req.task_name)
            hit = self.cache.get(key)
            if hit is not None:
                outputs[i] = hit
            else:
                misses.append((i, key, req))
        if misses:
            fresh = self.lm.generate_until([r for _, _, r in misses])
            for (i, key, _), resp in zip(misses, fresh):
                outputs[i] = resp
                self.cache.put(key, resp)
        return outputs  # type: ignore[return-value]

    def __getattr__(self, name):
        return getattr(self.lm, name)
