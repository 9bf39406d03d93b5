"""Continuous (in-flight) batching for the MSD engine.

The reference serves one request at a time per worker (LLaVA/llava/serve
model worker; marked out-of-scope by SURVEY §2.4 — our server.py is the
rebuilt surface). server.py's micro-batching already groups *compatible,
simultaneously queued* requests, but the batch then stays fixed until every
member finishes: a short request waits for the longest one, and new arrivals
wait for the whole batch (head-of-line blocking).

This module removes both stalls the TPU-native way. The engine's decode is
already a fixed-shape XLA program over a fixed-shape `EngineState`
(spec_engine.py), so a *batch slot* is just index b of a stacked state
pytree:

- ONE compiled segment program: ``vmap(decode_until)`` over the stacked
  state with a per-slot ``stop_at`` target. jax batches the inner
  while_loop by running until every lane meets its own bound and masking
  finished lanes, so an idle/retired slot contributes zero iterations and
  the step stays one weight-read wide regardless of how many slots are
  live (decode is HBM-bound; B slots cost ~the same as 1).
- Slot join = the SINGLE-sample prefill program (shared compile with
  generate()/generate_stream()) + one jitted ``dynamic_update_index_in_dim``
  scatter of the new state into lane b. A request therefore joins a RUNNING
  batch at the next segment boundary without recompiling or restarting
  anyone else.
- Slot retire = host bookkeeping only; the stale lane is masked by
  ``stop_at=0`` until a new request lands in it.

Scheduling is cooperative and host-driven: the owner calls ``step()`` in a
loop; each call admits queued requests into free slots, runs ONE segment
(one device dispatch + one D2H fetch), streams newly committed tokens to
per-request callbacks, and returns the requests that finished. Sampling
params are pinned per scheduler (slots share one compiled Statics); mixed
image/text prompts and per-request ``max_new``/seeds all share the batch.

Token identity: every slot's output is bitwise what a lone
``generate()``/``generate_stream()`` call would produce for that request
(tests/test_continuous.py) — batching changes throughput, never text.
"""

from __future__ import annotations

import dataclasses
from collections import deque
from functools import partial
from typing import Callable, List, Optional

import numpy as np
import jax
import jax.numpy as jnp

from msd_tpu.engine import spec_engine as SE
from msd_tpu.engine.generator import _trim
from msd_tpu.ops.sampling import SamplingParams


# Compiled scheduler programs, shared across scheduler instances: jit caches
# by function identity, so per-instance wrappers would retrace + recompile
# the (expensive) vmapped segment program every time a scheduler is created.
_PROG_CACHE: dict = {}


def _programs(st: SE.Statics, n_slots: int):
    key = (st, n_slots)
    progs = _PROG_CACHE.get(key)
    if progs is None:
        seg = jax.jit(
            jax.vmap(partial(SE.decode_until.__wrapped__, st),
                     in_axes=(None, 0, 0)),
            donate_argnums=(1,))
        insert = jax.jit(
            lambda bs, s, i: jax.tree.map(
                lambda b, x: jax.lax.dynamic_update_index_in_dim(b, x, i, 0),
                bs, s),
            donate_argnums=(0,))
        stack = jax.jit(
            lambda s: jax.tree.map(
                lambda x: jnp.stack([x] * n_slots), s))
        progs = _PROG_CACHE[key] = (seg, insert, stack)
    return progs


@dataclasses.dataclass
class Request:
    """One generation request tracked by the scheduler."""

    ids: np.ndarray                      # prompt token ids (unpadded)
    img_feats: Optional[jnp.ndarray] = None
    img_grid: Optional[tuple] = None     # inline (Qwen) engines only
    max_new: int = 256
    seed: int = 0
    # called with each np.int32 array of newly committed tokens (streaming)
    on_tokens: Optional[Callable[[np.ndarray], None]] = None
    # filled in by the scheduler when the request finishes
    tokens: Optional[np.ndarray] = None
    accept_steps: int = 0
    accept_len_sum: int = 0
    segments: int = 0                    # segment steps this request spanned
    error: Optional[str] = None          # admission failure (solo; the batch
    #                                      and other requests are unaffected)

    @property
    def avg_accept_len(self) -> float:
        return self.accept_len_sum / max(self.accept_steps, 1)


@dataclasses.dataclass
class _Active:
    req: Request
    e0: int            # first new-token row in the expanded ids buffer
    emitted: int = 0   # tokens already surfaced to the callback
    new_tokens: int = 0


class ContinuousScheduler:
    """Fixed-slot continuous batcher over one MSDGenerator.

    n_slots bounds concurrency (and KV memory: each slot owns a full
    target+draft KV allocation, ~630 MB at 7B/seq-1152 bf16 — pick n_slots
    from the HBM left over after weights). segment is the token interval
    between scheduling decisions: smaller = lower join/stream latency,
    larger = fewer host round-trips (one D2H fetch per step; ~25 ms on a
    tunneled backend).
    """

    def __init__(self, gen, n_slots: int = 4, segment: int = 16,
                 sp: Optional[SamplingParams] = None,
                 use_calibration: bool = False):
        if n_slots < 1:
            raise ValueError("n_slots must be >= 1")
        self.gen = gen
        self.n_slots = n_slots
        self.segment = int(segment)
        self.sp = sp if sp is not None else gen.sp
        self.st = gen._statics(gen.eng.max_new_tokens, self.sp,
                               use_calibration)
        self.queue: "deque[Request]" = deque()
        self.slots: List[Optional[_Active]] = [None] * n_slots
        self.bstate = None               # stacked EngineState or None
        self.steps = 0                   # segment steps executed
        self.joined = 0                  # requests admitted into slots

        self._seg, self._insert, self._stack = _programs(self.st, n_slots)

    # -- public API -----------------------------------------------------
    def submit(self, req: Request) -> None:
        req.max_new = min(int(req.max_new), self.st.max_new)
        self.queue.append(req)

    @property
    def busy(self) -> bool:
        return bool(self.queue) or any(s is not None for s in self.slots)

    @property
    def active(self) -> int:
        return sum(s is not None for s in self.slots)

    def step(self) -> List[Request]:
        """Admit, run one segment, harvest. Returns finished requests
        (including ones that failed admission, with .error set — a bad
        request must not take down the other slots)."""
        failed = self._admit()
        if self.active == 0:
            return failed
        stop = np.zeros((self.n_slots,), np.int32)
        for i, a in enumerate(self.slots):
            if a is not None:
                stop[i] = min(a.new_tokens + self.segment, a.req.max_new)
        self.bstate = self._seg(self.gen.params, self.bstate,
                                jnp.asarray(stop))
        self.steps += 1
        got = jax.device_get({
            "cur": self.bstate.cur_len, "ids": self.bstate.ids,
            "done": self.bstate.done, "new": self.bstate.new_tokens,
            "steps": self.bstate.steps, "acc": self.bstate.acc_sum,
        })  # one D2H trip per segment
        finished: List[Request] = []
        for i, a in enumerate(self.slots):
            if a is None:
                continue
            r = a.req
            r.segments += 1
            cur = int(got["cur"][i])
            out = _trim(got["ids"][i, a.e0:cur + 1], self.gen.eos_id,
                        r.max_new)
            if len(out) > a.emitted:
                if r.on_tokens is not None:
                    r.on_tokens(out[a.emitted:])
                a.emitted = len(out)
            a.new_tokens = int(got["new"][i])
            if bool(got["done"][i]) or a.emitted >= r.max_new:
                r.tokens = out
                r.accept_steps = int(got["steps"][i])
                r.accept_len_sum = int(got["acc"][i])
                finished.append(r)
                self.slots[i] = None     # lane masked by stop_at=0
        return failed + finished

    def run_all(self) -> List[Request]:
        """Drive step() until drained (convenience for tests/offline use)."""
        done: List[Request] = []
        while self.busy:
            done.extend(self.step())
        return done

    # -- internals ------------------------------------------------------
    def _prefill(self, req: Request):
        """Single-sample prefill (shared compile with generate_stream)."""
        gen, st = self.gen, self.st
        ids = np.asarray(req.ids, np.int32)
        padded_np = gen._pad(ids)
        padded = jnp.asarray(padded_np)
        key = gen._key(req.seed)
        if gen.image_mode == "inline":
            pos3, delta = gen._qwen_pos(padded_np, len(ids), req.img_grid)
            state = SE.qwen_prefill(st, gen.params, padded,
                                    np.int32(len(ids)), req.img_feats,
                                    np.int32(gen._img_pos(ids)), pos3,
                                    np.int32(delta), key)
            e0 = len(ids)
        else:
            state = SE.prefill(st, gen.params, padded, np.int32(len(ids)),
                               req.img_feats, np.int32(gen._img_pos(ids)),
                               key)
            e0 = len(ids) + (max(gen.n_img - 1, 0)
                             if req.img_feats is not None else 0)
        return state, e0

    def _admit(self) -> List[Request]:
        failed: List[Request] = []
        for i in range(self.n_slots):
            while self.queue and self.slots[i] is None:
                req = self.queue.popleft()
                try:
                    state, e0 = self._prefill(req)
                except Exception as e:   # bad request (e.g. prompt too long)
                    req.error = f"{type(e).__name__}: {e}"
                    failed.append(req)
                    continue
                if self.bstate is None:
                    self.bstate = self._stack(state)
                else:
                    self.bstate = self._insert(self.bstate, state, i)
                self.slots[i] = _Active(req=req, e0=e0)
                self.joined += 1
        return failed
