"""Minimal HTTP serving layer over the MSD engine.

The reference ships a controller/worker/gradio demo stack
(LLaVA/llava/serve/*, ~1.4k LoC of fastapi+gradio, marked out-of-scope by
SURVEY §2.4). This is the TPU-native equivalent surface: one worker thread
owns the chip (requests are serialized — the engine is bs=1 like the
reference), stdlib-only HTTP front end.

  POST /generate   {"prompt": str, "image_b64"?: str, "max_new_tokens"?: int,
                    "temperature"?: float, "use_msd"?: bool}
  GET  /health     {"status": "ok", "stats": {...}}

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


class _Work:
    def __init__(self, payload):
        self.payload = payload
        self.done = threading.Event()
        self.result = None
        self.error: Optional[str] = None


class EngineWorker(threading.Thread):
    """Single thread owning the generator; serializes chip access."""

    def __init__(self, adapter):
        super().__init__(daemon=True)
        self.adapter = adapter
        self.q: "queue.Queue[_Work]" = queue.Queue()
        self.served = 0

    def run(self):
        while True:
            w = self.q.get()
            try:
                w.result = self._handle(w.payload)
                self.served += 1
            except Exception as e:  # surfaced to the client
                w.error = f"{type(e).__name__}: {e}"
            w.done.set()

    def _handle(self, p):
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
        t0 = time.time()
        use_msd = bool(p.get("use_msd", True)) and adapter.use_msd
        fn = adapter.gen.generate if use_msd else adapter.gen.naive_generate
        r = fn(ids, img_feats=feats, max_new_tokens=max_new, sp=sp)
        dt = time.time() - t0
        text = adapter.tokenizer.decode(list(r.tokens),
                                        skip_special_tokens=True)
        return {
            "text": text.strip(),
            "tokens_generated": int(len(r.tokens)),
            "seconds": dt,
            "tokens_per_second": len(r.tokens) / max(dt, 1e-9),
            "avg_accept_len": getattr(r, "avg_accept_len", None),
        }


def make_handler(worker: EngineWorker):
    class Handler(BaseHTTPRequestHandler):
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
                self._send(200, {"status": "ok",
                                 "served": worker.served,
                                 "queued": worker.q.qsize()})
            else:
                self._send(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/generate":
                self._send(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                payload = json.loads(self.rfile.read(n) or b"{}")
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
            except Exception as e:
                self._send(500, {"error": str(e)})

    return Handler


def serve_forever(adapter, port: int = 8399, host: str = "127.0.0.1"):
    worker = EngineWorker(adapter)
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
    args = ap.parse_args(argv)

    from msd_tpu.harness.models.llava_msd import LlavaMSD

    adapter = LlavaMSD.from_pretrained(args.pretrained, args.msd_model_path,
                                       use_msd=args.use_msd)
    httpd = serve_forever(adapter, args.port)
    print(f"serving on :{args.port}")
    httpd.serve_forever()


if __name__ == "__main__":
    main()
