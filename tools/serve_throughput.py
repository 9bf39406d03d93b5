"""Serving-throughput microbench: batched MSD decode on the real chip.

Single-request MSD optimizes LATENCY (the reference's serving mode, bs=1).
On TPU the decode step is weight-read-bound, so batching B requests through
the vmapped fused program (generator.generate_batch — the same program the
HTTP server's micro-batcher uses) amortizes the 13.5GB weight stream across
B sequences: aggregate tokens/s grows until activations/KV dominate.

Measures, for each batch size: wall-clock, committed tokens, aggregate
tokens/s, and per-request latency vs bs=1. One JSON line at the end.

Usage:
  python tools/serve_throughput.py [--model 7b] [--batch-sizes 1,2,4,8]
      [--max-new 64] [--prompt-tokens 64] [--distill-steps 0]
  python tools/serve_throughput.py --arrival-sim [--requests 16]
      [--arrival-gap 0.3] [--slots 4] [--segment 16]

--arrival-sim replays a timed arrival stream through BOTH serving policies
and reports per-request latency + makespan:
  static      the server's micro-batcher (serve/server.py EngineWorker):
              whatever has arrived when the worker frees up forms a batch
              (padded to --slots for one compiled shape) and runs to
              completion — later arrivals wait for the whole batch.
  continuous  ContinuousScheduler (serve/continuous.py): arrivals join the
              running batch at the next --segment boundary and retire
              independently.

With random weights alpha~1 (no distilled draft), so tokens/s reflects the
machine cost per step, not speculation gains; pass --distill-steps to train
first for realistic alphas (slower).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the axon TPU plugin ignores the JAX_PLATFORMS env var; honor an explicit
# cpu request via jax.config before backend init (CLAUDE.md gotcha)
if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    import jax
    jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="7b", choices=["7b", "tiny"])
    ap.add_argument("--batch-sizes", default="1,2,4,8")
    ap.add_argument("--max-new", type=int, default=64)
    ap.add_argument("--prompt-tokens", type=int, default=64)
    ap.add_argument("--image", action="store_true", default=True)
    ap.add_argument("--no-image", dest="image", action="store_false")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--draft-ckpt", default="",
                    help="bench draft-cache npz: serve the TRAINED draft "
                         "(bench.py save_draft_cache format) instead of "
                         "random init; adopts the bench's 14-deep medusa "
                         "geometry")
    ap.add_argument("--widths", default="",
                    help="override medusa width plan (comma list) when "
                         "--draft-ckpt is set")
    ap.add_argument("--head-sharpen", type=float, default=1.0,
                    help="lm_head scale — MUST match the bench run that "
                         "trained the draft (bench default 6.0) or the "
                         "draft is off-policy")
    ap.add_argument("--bench-prompts", action="store_true",
                    help="use bench.py's exact prompt stream (the prompts "
                         "a --draft-ckpt draft was distilled on) so "
                         "serving shows real speculative alphas")
    ap.add_argument("--arrival-sim", action="store_true",
                    help="timed arrival stream: static micro-batch vs "
                         "continuous batching, per-request latency")
    ap.add_argument("--requests", type=int, default=16)
    ap.add_argument("--arrival-gap", type=float, default=0.3,
                    help="seconds between request arrivals")
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--segment", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    # persistent compile cache: the 7B while-loop programs here take 6-17
    # min cold on the remote compiler; cache them like bench.py does
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get("JAX_COMPILATION_CACHE_DIR",
                           "artifacts/jax_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          10.0)
    except Exception:
        pass

    from msd_tpu.configs import (IMAGE_TOKEN_INDEX, DraftConfig, EngineConfig,
                                 LlamaConfig, TreeConfig)
    from msd_tpu.engine.generator import MSDGenerator
    from msd_tpu.models import draft as draft_mod
    from msd_tpu.models import llama as L

    if args.model == "7b":
        tcfg = LlamaConfig.llava_7b()
        dtype = jnp.bfloat16
    else:
        tcfg = LlamaConfig.tiny(vocab_size=512, hidden_size=64, layers=2,
                                heads=4, intermediate_size=128, max_pos=2048)
        dtype = jnp.float32
    # a bench-distilled draft cache (artifacts/draft_cache/*.npz) carries
    # 13 medusa heads for the bench's 14-deep width plan — adopt that
    # geometry when loading one, so serving throughput reflects a TRAINED
    # draft (alpha > 1) instead of the random-init machine-cost floor
    ck = None
    widths = (8, 6, 4, 3, 2, 2, 1, 1)
    if args.draft_ckpt:
        import bench as bench_mod
        loaded = bench_mod.load_draft_cache(args.draft_ckpt)
        if loaded is None:
            raise FileNotFoundError(args.draft_ckpt)
        ck = loaded[0]
        n_heads = int(np.asarray(ck["medusa"]["mw"]).shape[0])
        widths = tuple(int(x) for x in args.widths.split(",")) if \
            args.widths else (10, 8, 6, 5, 4, 3, 2, 2, 2, 1, 1, 1, 1, 1)
        assert len(widths) == n_heads + 1, (len(widths), n_heads)
        dcfg = DraftConfig(text=tcfg, medusa_heads=n_heads)
    else:
        dcfg = DraftConfig(text=tcfg, medusa_heads=len(widths) - 1)

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tp = L.init_llama_params_stacked(k1, tcfg, dtype)
    if args.head_sharpen != 1.0:
        tp["lm_head"] = tp["lm_head"] * dtype(args.head_sharpen)
    dp = draft_mod.init_draft_params(k2, dcfg, dtype)
    dp["medusa"] = draft_mod.init_medusa_params(jax.random.PRNGKey(7), dcfg,
                                                dtype)
    if ck is not None:
        dp = jax.tree.map(lambda a: jnp.asarray(np.asarray(a), dtype), ck)
    dp["embed_tokens"] = tp["embed_tokens"]

    n_img = 576 if args.image else 0
    # the arrival sim serves heterogeneous limits up to 2x max_new
    new_budget = 2 * args.max_new if args.arrival_sim else args.max_new
    max_seq = args.prompt_tokens + n_img + new_budget + 64
    eng = EngineConfig(
        max_seq_len=max_seq, prompt_pad_multiple=64,
        max_new_tokens=new_budget, canonical_attn=True,
        tree=TreeConfig(top_k=widths[0], max_depth=len(widths),
                        num_nodes=1 + sum(widths), medusa_widths=widths))
    gen = MSDGenerator(tp, dp, tcfg, dcfg, eng, eos_id=-1, n_img=n_img)

    rng = np.random.default_rng(0)
    if args.bench_prompts:
        # replicate bench.py's prompt stream EXACTLY (bench.py:566-580):
        # first prompt + feats + extras all from default_rng(0) in bench
        # order, so a --draft-ckpt distilled draft is ON-POLICY here and
        # serving throughput reflects real speculative alphas
        bench_first = rng.integers(3, 31000,
                                   size=args.prompt_tokens).astype(np.int32)
        if n_img:
            bench_first[1] = IMAGE_TOKEN_INDEX
        feats = jnp.asarray(rng.normal(size=(n_img, tcfg.hidden_size)) * 0.02,
                            dtype) if n_img else None
        bench_pool = [bench_first]

        def mk_prompt(i):
            while len(bench_pool) <= i:
                q = rng.integers(3, 31000,
                                 size=args.prompt_tokens).astype(np.int32)
                if n_img:
                    q[1] = IMAGE_TOKEN_INDEX
                bench_pool.append(q)
            return bench_pool[i]
    else:
        feats = jnp.asarray(rng.normal(size=(n_img, tcfg.hidden_size)) * 0.02,
                            dtype) if n_img else None

        def mk_prompt(i):
            q = rng.integers(3, tcfg.vocab_size - 2,
                             size=args.prompt_tokens).astype(np.int32)
            if n_img:
                q[1] = IMAGE_TOKEN_INDEX
            return q

    if args.arrival_sim:
        return arrival_sim(gen, feats, mk_prompt, args)

    rows = []
    base_lat = None
    for bs in [int(x) for x in args.batch_sizes.split(",")]:
        prompts = [mk_prompt(i) for i in range(bs)]
        fl = [feats] * bs if feats is not None else None
        t0 = time.time()
        rs = gen.generate_batch(prompts, fl, max_new_tokens=args.max_new)
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(args.repeats):
            t0 = time.time()
            rs = gen.generate_batch(prompts, fl, max_new_tokens=args.max_new)
            best = min(best, time.time() - t0)
        toks = sum(len(r.tokens) for r in rs)
        tps = toks / best
        if base_lat is None:
            base_lat = best
        rows.append({"batch": bs, "wall_s": round(best, 3),
                     "tokens": toks, "tokens_per_s": round(tps, 1),
                     "latency_vs_bs1": round(best / base_lat, 2),
                     "compile_s": round(compile_s, 1)})
        print(f"bs={bs:2d}  {best*1e3:8.1f} ms  {toks:4d} tok  "
              f"{tps:8.1f} tok/s  latency x{best/base_lat:.2f}  "
              f"(compile {compile_s:.0f}s)", flush=True)

    print(json.dumps({"metric": "serve_throughput_batched_msd",
                      "model": args.model, "max_new": args.max_new,
                      "image_tokens": n_img, "rows": rows}))
    return 0


def arrival_sim(gen, feats, mk_prompt, args):
    """Replay one timed arrival stream through both serving policies."""
    import time as _t
    from collections import deque

    import numpy as np

    from msd_tpu.serve.continuous import ContinuousScheduler, Request

    R, gap, N = args.requests, args.arrival_gap, args.slots
    prompts = [mk_prompt(i) for i in range(R)]
    # heterogeneous generation limits: the static micro-batcher can only
    # group requests with EQUAL max_new (serve/server.py _batch_key), while
    # the continuous scheduler mixes limits in one program via per-slot
    # stop targets — the architectural difference under test
    m = args.max_new
    lens = [(m // 2, m, 2 * m, m)[i % 4] for i in range(R)]
    fl = [feats] * N if feats is not None else None
    total_toks = sum(lens)

    def stats(lat, makespan):
        lat = np.asarray(sorted(lat.values()))
        return {"makespan_s": round(makespan, 2),
                "mean_latency_s": round(float(lat.mean()), 2),
                "p50_latency_s": round(float(lat[len(lat) // 2]), 2),
                "p95_latency_s": round(float(lat[int(len(lat) * 0.95)]), 2),
                "agg_tokens_per_s": round(total_toks / makespan, 1)}

    # ---- warm every compiled shape OUT of the timed region ----
    print("warming compiles...", flush=True)
    for n in sorted(set(lens)):
        gen.generate_batch([prompts[0]] * N, fl, max_new_tokens=n)
    sched = ContinuousScheduler(gen, n_slots=N, segment=args.segment)
    for _ in range(2):  # two joins: the _stack AND _insert paths compile
        sched.submit(Request(ids=prompts[0], img_feats=feats, max_new=m))
    sched.run_all()

    # ---- static micro-batch policy (serve/server.py EngineWorker) ----
    t0 = _t.time()
    arrived, next_i, finish = deque(), 0, {}
    while len(finish) < R:
        now = _t.time() - t0
        while next_i < R and next_i * gap <= now:
            arrived.append(next_i)
            next_i += 1
        if not arrived:
            _t.sleep(0.002)
            continue
        # group = arrivals sharing the head's batch key (equal max_new)
        head = arrived.popleft()
        group, rest = [head], []
        while arrived and len(group) < N:
            i = arrived.popleft()
            (group if lens[i] == lens[head] else rest).append(i)
        arrived.extendleft(reversed(rest))
        pad = group + [group[-1]] * (N - len(group))
        gen.generate_batch([prompts[i] for i in pad], fl,
                           max_new_tokens=lens[head])
        done_at = _t.time() - t0
        for i in group:
            finish[i] = done_at - i * gap
    static = stats(finish, _t.time() - t0)
    print(f"static     {static}", flush=True)

    # ---- continuous policy (serve/continuous.py) ----
    sched = ContinuousScheduler(gen, n_slots=N, segment=args.segment)
    t0 = _t.time()
    next_i, finish = 0, {}
    while len(finish) < R:
        now = _t.time() - t0
        while next_i < R and next_i * gap <= now:
            rq = Request(ids=prompts[next_i], img_feats=feats,
                         max_new=lens[next_i])
            rq.idx = next_i
            sched.submit(rq)
            next_i += 1
        if not sched.busy:
            _t.sleep(0.002)
            continue
        for rq in sched.step():
            finish[rq.idx] = (_t.time() - t0) - rq.idx * gap
    cont = stats(finish, _t.time() - t0)
    print(f"continuous {cont}", flush=True)

    print(json.dumps({"metric": "serve_arrival_sim", "model": args.model,
                      "requests": R, "arrival_gap_s": gap, "slots": N,
                      "segment": args.segment, "max_new": args.max_new,
                      "image_tokens": 576 if feats is not None else 0,
                      "static": static, "continuous": cont,
                      "p95_latency_improvement":
                          round(static["p95_latency_s"]
                                / max(cont["p95_latency_s"], 1e-9), 2)}))
    return 0


def _run_with_flap_retries(max_retries: int = 2):
    """Same transient classification as bench.py: an axon tunnel flap or a
    chip-lease teardown race (a previous holder exited <60s ago) surfaces
    as UNAVAILABLE / ABORTED / ResourceExhausted; re-exec so the fresh
    process re-probes the backend."""
    try:
        return main()
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        transient = ("UNAVAILABLE" in msg or "worker process crashed" in msg
                     or "not in the list of known backends" in msg
                     or "ABORTED" in msg or "TPU backend error" in msg)
        tries = int(os.environ.get("SERVE_FLAP_RETRY", "0"))
        if not transient or tries >= max_retries:
            raise
        print(f"TPU backend lost ({msg.splitlines()[0][:100]}); re-exec "
              f"{tries + 1}/{max_retries} after 60s lease wait",
              file=sys.stderr, flush=True)
        os.environ["SERVE_FLAP_RETRY"] = str(tries + 1)
        time.sleep(60.0)
        os.execv(sys.executable, [sys.executable] + sys.argv)


if __name__ == "__main__":
    sys.exit(_run_with_flap_retries())
