"""Pallas vs XLA decode-attention microbench on the real chip.

Times the 7B-shaped attention op at AR-decode (T=1) and tree-verify (T=128)
query shapes across allocated cache lengths, with a live kv_len typical of
serving (prompt+some decode). Sets/validates LlamaConfig.pallas_min_s — the
"auto" backend threshold (VERDICT r1 item 7).

Usage: python tools/attn_microbench.py [--live-frac 0.6] [--iters 50]
Prints one line per (S, T, impl) with per-call microseconds, then a
recommendation.
"""
import argparse
import os
import sys
import time

import numpy as np

# self-locating import: setting PYTHONPATH=/root/repo breaks the axon TPU
# plugin's backend registration, so the repo root goes on sys.path here
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--live-frac", type=float, default=0.6)
    # one dispatch over the axon tunnel costs ~25ms; iters must amortize
    # that below the kernel times being measured (2000 -> ~12us/call)
    ap.add_argument("--iters", type=int, default=2000)
    ap.add_argument("--lengths", default="1152,2048,4096,8192")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from msd_tpu.ops.attention import masked_attention
    from msd_tpu.ops.pallas.decode_attention import decode_attention

    hq = hkv = 32
    d = 128
    rng = np.random.default_rng(0)
    results = {}
    for S in [int(x) for x in args.lengths.split(",")]:
        live = int(S * args.live_frac)
        for T in (1, 128):
            q = jnp.asarray(rng.normal(size=(T, hq, d)), jnp.bfloat16)
            k = jnp.asarray(rng.normal(size=(S, hkv, d)), jnp.bfloat16)
            v = jnp.asarray(rng.normal(size=(S, hkv, d)), jnp.bfloat16)
            kpos = np.arange(S)[None, :]
            keep = kpos < live
            bias = jnp.asarray(np.where(keep, 0.0, -1e30), jnp.float32)
            bias = jnp.broadcast_to(bias, (T, S))

            # loop inside jit: per-dispatch overhead (~25ms via the tunnel)
            # would otherwise swamp sub-ms kernels. The carry must feed an
            # *input* of the op (q) or XLA constant-folds the whole scan
            # (observed: 1us/call phantom timings via `bias + x*0.0`), and
            # it must depend on EVERY output element or XLA slice-propagates
            # and skips most rows/heads (observed: T=128 == T=1 xla time).
            def loop(fn):
                def body(x, _):
                    o = fn(q + x, k, v, bias)
                    s = o.astype(jnp.float32).mean() * 1e-8
                    return s.astype(jnp.bfloat16), None
                return jax.jit(lambda: jax.lax.scan(
                    body, jnp.bfloat16(0.0), None, length=args.iters)[0])

            for name, fn in (
                    ("xla", lambda q, k, v, b: masked_attention(q, k, v, b)),
                    ("pallas", lambda q, k, v, b: decode_attention(
                        q, k, v, b, jnp.int32(live)))):
                f = loop(fn)
                jax.block_until_ready(f())  # compile + warm
                best = float("inf")
                for _ in range(3):
                    t0 = time.time()
                    jax.block_until_ready(f())
                    best = min(best, time.time() - t0)
                us = best / args.iters * 1e6
                results[(S, T, name)] = us
                print(f"S={S:5d} live={live:5d} T={T:3d} {name:6s} "
                      f"{us:9.1f} us/call", flush=True)

    # recommendation: smallest S where pallas wins both shapes
    thresh = None
    for S in sorted({k[0] for k in results}):
        if all(results[(S, T, "pallas")] <= results[(S, T, "xla")]
               for T in (1, 128)):
            thresh = S
            break
    print(f"recommended pallas_min_s: {thresh}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
