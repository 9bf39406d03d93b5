"""Timing / profiling utilities.

Reference: EAGLE/eagle/model/utils.py:50-61 Timer (cuda.synchronize-bracketed
wall clock) and the absence of any real profiler. TPU equivalents:
``Timer`` brackets with ``jax.block_until_ready``; ``trace`` wraps
``jax.profiler`` for XLA/TensorBoard traces.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax


class Timer:
    """with Timer("step") as t: ... ; t.elapsed — device-synchronized."""

    def __init__(self, name: str = "", sync_on: Optional[object] = None,
                 log=None):
        self.name = name
        self.sync_on = sync_on
        self.log = log
        self.elapsed = 0.0

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self.sync_on is not None:
            jax.block_until_ready(self.sync_on)
        self.elapsed = time.perf_counter() - self.t0
        if self.log:
            self.log(f"[Timer] {self.name}: {self.elapsed*1e3:.2f} ms")
        return False


def time_fn(fn, *args, repeats: int = 3, warmup: int = 1) -> float:
    """Best-of wall-clock for a device function (blocks on the result)."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/msd_tpu_trace"):
    """jax.profiler trace context (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class StepStats:
    """Streaming accumulator for per-step engine metrics (temp_cache analog,
    utils.py:23-48: token counters + acceptance histogram)."""

    def __init__(self):
        self.in_tokens = 0
        self.out_tokens = 0
        self.accept_steps = 0
        self.accept_len_sum = 0
        self.alpha_hist: Dict[int, int] = {}

    def update(self, *, prompt_tokens: int, new_tokens: int, steps: int,
               acc_sum: int, hist=None):
        self.in_tokens += prompt_tokens
        self.out_tokens += new_tokens
        self.accept_steps += steps
        self.accept_len_sum += acc_sum
        if hist is not None:
            for i, c in enumerate(hist):
                self.alpha_hist[i] = self.alpha_hist.get(i, 0) + int(c)

    @property
    def avg_accept_len(self) -> float:
        return self.accept_len_sum / max(self.accept_steps, 1)

    def summary(self) -> Dict:
        return {"in_tokens": self.in_tokens, "out_tokens": self.out_tokens,
                "accept_steps": self.accept_steps,
                "avg_accept_len": self.avg_accept_len,
                "alpha_hist": dict(sorted(self.alpha_hist.items()))}
