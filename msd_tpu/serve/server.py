"""Minimal HTTP serving layer over the MSD engine.

The reference ships a controller/worker/gradio demo stack
(LLaVA/llava/serve/*, ~1.4k LoC of fastapi+gradio, marked out-of-scope by
SURVEY §2.4). This is the TPU-native equivalent surface: one worker thread
owns the chip, stdlib-only HTTP front end, with two scheduling upgrades over
the reference's one-request-at-a-time worker:

- micro-batching: compatible queued /generate requests (same sampling
  params/limits) are served together through the vmapped batch program
  (generator.generate_batch) — throughput scales with queue depth.
- streaming: /generate_stream emits newline-delimited JSON chunks, backed by
  segment-bounded decode programs (spec_engine.decode_until), token-identical
  to the non-streaming path.
- continuous batching (--continuous N): requests join/leave a running N-slot
  batch at segment boundaries (serve/continuous.py) — no head-of-line
  blocking, mixed image/text prompts, per-request max_new/seeds, streaming
  and non-streaming slots side by side. Token-identical to solo runs.

  POST /generate        {"prompt": str, "image_b64"?: str,
                         "max_new_tokens"?: int, "temperature"?: float,
                         "top_p"?: float, "use_msd"?: bool}
  POST /generate_stream same body; response is chunked JSONL:
                        {"text": "..."} per segment, {"done": true, ...} last
  GET  /health          {"status": "ok", ...}

Run: python -m msd_tpu.serve.server --pretrained ... --msd_model_path ...
(or serve_forever(adapter, port) with a constructed adapter for tests).
"""

from __future__ import annotations

import base64
import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

MAX_MICROBATCH = 8


class _Work:
    def __init__(self, payload, stream: bool = False):
        self.payload = payload
        self.stream = stream
        self.done = threading.Event()
        self.result = None
        self.error: Optional[str] = None
        # streaming works receive text chunks here; None terminates
        self.chunks: "queue.Queue" = queue.Queue() if stream else None


class EngineWorker(threading.Thread):
    """Single thread owning the generator; serializes chip access and
    micro-batches compatible queued requests."""

    def __init__(self, adapter):
        super().__init__(daemon=True)
        self.adapter = adapter
        self.q: "queue.Queue[_Work]" = queue.Queue()
        self.served = 0
        self.batches = 0

    # -- request prep -------------------------------------------------
    def _prep(self, p):
        """payload -> (ids, feats, sp, max_new, use_msd)."""
        import numpy as np
        import jax.numpy as jnp

        from msd_tpu.ops.sampling import SamplingParams
        from msd_tpu.utils.conversation import build_msd_prompt
        from msd_tpu.utils.mm_utils import process_image, tokenizer_image_token

        adapter = self.adapter
        feats = None
        with_image = False
        if p.get("image_b64"):
            from PIL import Image
            img = Image.open(io.BytesIO(base64.b64decode(p["image_b64"])))
            px = process_image(np.asarray(img.convert("RGB")),
                               image_size=adapter.image_size)
            feats = adapter.encode_image_fn(jnp.asarray(px))
            with_image = True
        prompt = build_msd_prompt(p["prompt"], with_image=with_image)
        ids = tokenizer_image_token(prompt, adapter.tokenizer)
        sp = SamplingParams(temperature=float(p.get("temperature", 0.0)),
                            top_p=float(p.get("top_p", 1.0)))
        max_new = int(p.get("max_new_tokens", 256))
        use_msd = bool(p.get("use_msd", True)) and adapter.use_msd
        return ids, feats, sp, max_new, use_msd

    @staticmethod
    def _batch_key(p):
        return (float(p.get("temperature", 0.0)), float(p.get("top_p", 1.0)),
                int(p.get("max_new_tokens", 256)),
                bool(p.get("use_msd", True)), bool(p.get("image_b64")))

    def _drain_compatible(self, first: _Work):
        """Pull queued non-streaming works sharing first's batch key."""
        group, leftover = [first], []
        key = self._batch_key(first.payload)
        while len(group) < MAX_MICROBATCH:
            try:
                w = self.q.get_nowait()
            except queue.Empty:
                break
            if (not w.stream) and self._batch_key(w.payload) == key:
                group.append(w)
            else:
                leftover.append(w)
        for w in leftover:  # preserve arrival order for incompatible works
            self.q.put(w)
        return group

    # -- main loop ----------------------------------------------------
    def run(self):
        while True:
            w = self.q.get()
            mode = getattr(self.adapter.gen, "image_mode", "expand")
            batchable = ((not w.stream)
                         and (mode == "expand"
                              or not w.payload.get("image_b64"))
                         and bool(w.payload.get("use_msd", True))
                         and self.adapter.use_msd)
            group = self._drain_compatible(w) if batchable else [w]
            try:
                if len(group) > 1:
                    self._handle_group(group)
                elif w.stream:
                    self._handle_stream(w)
                    self.served += 1
                else:
                    w.result = self._handle(w.payload)
                    self.served += 1
                    w.done.set()
            except Exception as e:  # surfaced to the client(s)
                for g in group:
                    g.error = f"{type(e).__name__}: {e}"
                    if g.chunks is not None:
                        g.chunks.put(None)
                    g.done.set()

    def _decode_result(self, tokens, dt, r=None):
        text = self.adapter.tokenizer.decode(list(tokens),
                                             skip_special_tokens=True)
        return {
            "text": text.strip(),
            "tokens_generated": int(len(tokens)),
            "seconds": dt,
            "tokens_per_second": len(tokens) / max(dt, 1e-9),
            "avg_accept_len": getattr(r, "avg_accept_len", None),
        }

    def _handle(self, p):
        ids, feats, sp, max_new, use_msd = self._prep(p)
        t0 = time.time()
        fn = (self.adapter.gen.generate if use_msd
              else self.adapter.gen.naive_generate)
        r = fn(ids, img_feats=feats, max_new_tokens=max_new, sp=sp)
        return self._decode_result(r.tokens, time.time() - t0, r)

    def _handle_group(self, group):
        """Serve compatible requests through one vmapped batch program."""
        preps = [self._prep(g.payload) for g in group]
        ids_list = [pr[0] for pr in preps]
        feats_list = ([pr[1] for pr in preps]
                      if preps[0][1] is not None else None)
        _, _, sp, max_new, _ = preps[0]
        t0 = time.time()
        rs = self.adapter.gen.generate_batch(ids_list, feats_list,
                                             max_new_tokens=max_new, sp=sp)
        dt = time.time() - t0
        self.batches += 1
        for g, r in zip(group, rs):
            g.result = self._decode_result(r.tokens, dt, r)
            g.result["batch_size"] = len(group)
            self.served += 1
            g.done.set()

    def _handle_stream(self, w):
        ids, feats, sp, max_new, use_msd = self._prep(w.payload)
        gen = self.adapter.gen
        t0 = time.time()
        n = 0
        if use_msd:
            for chunk in gen.generate_stream(ids, img_feats=feats,
                                             max_new_tokens=max_new, sp=sp,
                                             segment=int(w.payload.get(
                                                 "segment", 16))):
                n += len(chunk)
                w.chunks.put(self.adapter.tokenizer.decode(
                    list(chunk), skip_special_tokens=True))
        else:  # AR path has no segment program; emit in one chunk
            r = gen.naive_generate(ids, img_feats=feats,
                                   max_new_tokens=max_new, sp=sp)
            n = len(r.tokens)
            w.chunks.put(self.adapter.tokenizer.decode(
                list(r.tokens), skip_special_tokens=True))
        dt = time.time() - t0
        w.result = {"done": True, "tokens_generated": n, "seconds": dt,
                    "tokens_per_second": n / max(dt, 1e-9)}
        w.chunks.put(None)
        w.done.set()


class ContinuousWorker(EngineWorker):
    """EngineWorker variant backed by a ContinuousScheduler: compatible
    requests JOIN the running slot batch at the next segment boundary
    (continuous batching) instead of waiting for the current batch to drain.

    Compatible = sampling params match the scheduler's pinned set and MSD is
    on; image and text prompts mix freely (unlike the static micro-batcher).
    Incompatible requests run through the ordinary single-request path, but
    only while the scheduler is idle — under sustained compatible load they
    wait (documented tradeoff: slots never stall on a foreign program).
    """

    def __init__(self, adapter, n_slots: int = 4, segment: int = 16):
        super().__init__(adapter)
        from collections import deque

        from msd_tpu.serve.continuous import ContinuousScheduler
        self.sched = ContinuousScheduler(adapter.gen, n_slots=n_slots,
                                         segment=segment)
        self._serial = deque()

    def _compatible(self, p) -> bool:
        sp = self.sched.sp
        return (float(p.get("temperature", 0.0)) == sp.temperature
                and float(p.get("top_p", 1.0)) == sp.top_p
                and bool(p.get("use_msd", True)) and self.adapter.use_msd)

    def _dispatch(self, w: _Work):
        if not self._compatible(w.payload):
            self._serial.append(w)
            return
        from msd_tpu.serve.continuous import Request
        try:
            ids, feats, _, max_new, _ = self._prep(w.payload)
        except Exception as e:
            w.error = f"{type(e).__name__}: {e}"
            if w.chunks is not None:
                w.chunks.put(None)
            w.done.set()
            return
        req = Request(ids=ids, img_feats=feats, max_new=max_new,
                      seed=int(w.payload.get("seed", 0)))
        req._work = w
        req._t0 = time.time()
        if w.stream:
            tok = self.adapter.tokenizer
            req.on_tokens = lambda t: w.chunks.put(
                tok.decode(list(t), skip_special_tokens=True))
        self.sched.submit(req)

    def _finish(self, req):
        w = req._work
        if req.error is not None:        # solo admission failure
            w.error = req.error
            if w.chunks is not None:
                w.chunks.put(None)
            w.done.set()
            return
        dt = time.time() - req._t0
        self.served += 1
        if w.stream:
            w.result = {"done": True, "tokens_generated": len(req.tokens),
                        "seconds": dt,
                        "tokens_per_second": len(req.tokens) / max(dt, 1e-9),
                        "avg_accept_len": req.avg_accept_len}
            w.chunks.put(None)
        else:
            w.result = self._decode_result(req.tokens, dt, req)
            w.result["segments"] = req.segments
        w.done.set()

    def _fail_all(self, err: str):
        works = [a.req._work for a in self.sched.slots if a is not None]
        works += [r._work for r in self.sched.queue]
        self.sched.slots = [None] * self.sched.n_slots
        self.sched.queue.clear()
        self.sched.bstate = None
        for w in works:
            w.error = err
            if w.chunks is not None:
                w.chunks.put(None)
            w.done.set()

    def run(self):
        while True:
            block = not (self.sched.busy or self._serial)
            try:
                self._dispatch(self.q.get(block=block))
                while True:
                    self._dispatch(self.q.get_nowait())
            except queue.Empty:
                pass
            if self.sched.busy:
                try:
                    finished = self.sched.step()
                    self.batches += 1
                except Exception as e:  # surfaced to every in-flight client
                    self._fail_all(f"{type(e).__name__}: {e}")
                    finished = []
                for req in finished:
                    self._finish(req)
            elif self._serial:
                w = self._serial.popleft()
                try:
                    if w.stream:
                        self._handle_stream(w)
                    else:
                        w.result = self._handle(w.payload)
                        w.done.set()
                    self.served += 1
                except Exception as e:
                    w.error = f"{type(e).__name__}: {e}"
                    if w.chunks is not None:
                        w.chunks.put(None)
                    w.done.set()


def make_handler(worker: EngineWorker):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):
            pass

        def _send(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/health":
                info = {"status": "ok", "served": worker.served,
                        "batches": worker.batches,
                        "queued": worker.q.qsize()}
                sched = getattr(worker, "sched", None)
                if sched is not None:
                    info["active_slots"] = sched.active
                    info["n_slots"] = sched.n_slots
                    info["segments_run"] = sched.steps
                self._send(200, info)
            else:
                self._send(404, {"error": "unknown path"})

        def _read_payload(self):
            n = int(self.headers.get("Content-Length", 0))
            return json.loads(self.rfile.read(n) or b"{}")

        def do_POST(self):
            try:
                if self.path == "/generate":
                    payload = self._read_payload()
                    if "prompt" not in payload:
                        self._send(400, {"error": "missing 'prompt'"})
                        return
                    w = _Work(payload)
                    worker.q.put(w)
                    w.done.wait()
                    if w.error:
                        self._send(500, {"error": w.error})
                    else:
                        self._send(200, w.result)
                elif self.path == "/generate_stream":
                    payload = self._read_payload()
                    if "prompt" not in payload:
                        self._send(400, {"error": "missing 'prompt'"})
                        return
                    w = _Work(payload, stream=True)
                    worker.q.put(w)
                    self.send_response(200)
                    self.send_header("Content-Type", "application/jsonl")
                    self.send_header("Transfer-Encoding", "chunked")
                    self.end_headers()

                    def emit(obj):
                        line = (json.dumps(obj) + "\n").encode()
                        self.wfile.write(f"{len(line):x}\r\n".encode()
                                         + line + b"\r\n")

                    while True:
                        chunk = w.chunks.get()
                        if chunk is None:
                            break
                        emit({"text": chunk})
                    if w.error:
                        emit({"error": w.error})
                    elif w.result:
                        emit(w.result)
                    self.wfile.write(b"0\r\n\r\n")
                else:
                    self._send(404, {"error": "unknown path"})
            except Exception as e:
                try:
                    self._send(500, {"error": str(e)})
                except Exception:
                    pass

    return Handler


def serve_forever(adapter, port: int = 8399, host: str = "127.0.0.1",
                  continuous: int = 0, segment: int = 16):
    """continuous=N serves through an N-slot continuous batcher
    (ContinuousWorker); 0 keeps the static micro-batching worker."""
    worker = (ContinuousWorker(adapter, n_slots=continuous, segment=segment)
              if continuous > 0 else EngineWorker(adapter))
    worker.start()
    httpd = ThreadingHTTPServer((host, port), make_handler(worker))
    return httpd  # caller invokes httpd.serve_forever()


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser("msd_tpu.serve")
    ap.add_argument("--pretrained", required=True)
    ap.add_argument("--msd_model_path", required=True)
    ap.add_argument("--port", type=int, default=8399)
    ap.add_argument("--no-msd", dest="use_msd", action="store_false")
    ap.add_argument("--max-seq-len", type=int, default=None,
                    help="allocated KV length (128-aligned values enable "
                         "the pallas decode-attention fast path)")
    ap.add_argument("--attn-impl", default=None,
                    choices=["xla", "pallas", "auto"],
                    help="decode attention backend; 'auto' engages the "
                         "length-aware pallas kernel at long caches")
    ap.add_argument("--continuous", type=int, default=0, metavar="N",
                    help="continuous batching over N slots (0 = static "
                         "micro-batching); each slot owns a full KV "
                         "allocation — size N to the free HBM")
    ap.add_argument("--segment", type=int, default=16,
                    help="tokens per scheduling segment in continuous mode")
    args = ap.parse_args(argv)

    from msd_tpu.harness.models.llava_msd import LlavaMSD

    kw = {}
    if args.max_seq_len:
        kw["max_seq_len"] = args.max_seq_len
    if args.attn_impl:
        kw["attn_impl"] = args.attn_impl
    adapter = LlavaMSD.from_pretrained(args.pretrained, args.msd_model_path,
                                       use_msd=args.use_msd, **kw)
    httpd = serve_forever(adapter, args.port, continuous=args.continuous,
                          segment=args.segment)
    print(f"serving on :{args.port}")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
