"""Profile one MSD decode segment + AR decode on the real chip.

Times the pieces separately (jitted loops, steady-state):
  - AR decode step (T=1 forward)
  - verify forward alone (tree-shaped target forward at N nodes)
  - draft suffix forward + medusa/eagle expansion alone
  - full decode step (decode_until over a fixed token budget)
and writes a jax.profiler trace to /tmp/msd_trace for op-level inspection.

Usage: python tools/profile_step.py [--draft-mode medusa] [--nodes 96]
"""
import argparse
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--draft-mode", default="medusa",
                    choices=["eagle", "medusa"])
    ap.add_argument("--nodes", type=int, default=96)
    ap.add_argument("--depth", type=int, default=8)
    ap.add_argument("--trace", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, ".")
    from bench import wait_for_backend
    if not wait_for_backend(3600.0):
        return 2
    import jax
    import jax.numpy as jnp

    from msd_tpu.configs import (DraftConfig, EngineConfig, LlamaConfig,
                                 TreeConfig, IMAGE_TOKEN_INDEX)
    from msd_tpu.engine import spec_engine as SE
    from msd_tpu.engine.generator import MSDGenerator
    from msd_tpu.models import draft as draft_mod
    from msd_tpu.models import llama as L
    from msd_tpu.ops.attention import causal_prefill_bias, tree_bias

    import dataclasses
    dtype = jnp.bfloat16
    tcfg = dataclasses.replace(LlamaConfig.llava_7b(),
                               residual_dtype="float32")
    dcfg = DraftConfig(
        text=tcfg,
        medusa_heads=(args.depth - 1 if args.draft_mode == "medusa" else 0))
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tp = L.init_llama_params_stacked(k1, tcfg, dtype)
    tp["lm_head"] = tp["lm_head"] * dtype(6.0)
    dp = draft_mod.init_draft_params(k2, dcfg, dtype)
    if dcfg.medusa_heads:
        dp["medusa"] = draft_mod.init_medusa_params(jax.random.PRNGKey(7),
                                                    dcfg, dtype)
    dp["embed_tokens"] = tp["embed_tokens"]
    log("params ready")

    n_img = 576
    eng = EngineConfig(max_seq_len=1024, prompt_pad_multiple=128,
                       tree=TreeConfig(top_k=10, max_depth=args.depth,
                                       num_nodes=args.nodes))
    gen = MSDGenerator(tp, dp, tcfg, dcfg, eng, n_img=n_img, eos_id=-1)
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 31000, size=64).astype(np.int32)
    ids[1] = IMAGE_TOKEN_INDEX
    feats = jnp.asarray(rng.normal(size=(n_img, tcfg.hidden_size)) * 0.02,
                        dtype)

    # AR baseline
    t0 = time.time()
    r = gen.naive_generate(ids, img_feats=feats, max_new_tokens=64)
    log(f"AR compile {time.time()-t0:.1f}s")
    t0 = time.time()
    r = gen.naive_generate(ids, img_feats=feats, max_new_tokens=64)
    ar_ms = (time.time() - t0) / 64 * 1e3
    log(f"AR: {ar_ms:.2f} ms/tok")

    # full MSD step
    t0 = time.time()
    m = gen.generate(ids, img_feats=feats, max_new_tokens=64)
    log(f"MSD compile {time.time()-t0:.1f}s")
    t0 = time.time()
    m = gen.generate(ids, img_feats=feats, max_new_tokens=64)
    step_ms = (time.time() - t0) / max(m.accept_steps, 1) * 1e3
    log(f"MSD: {step_ms:.2f} ms/step ({m.accept_steps} steps, "
        f"alpha={m.avg_accept_len:.2f})")

    # ---- piecewise: verify-shaped target forward ----
    N = args.nodes
    S = eng.max_seq_len + N
    cos_t, sin_t = gen.params["cos_t"], gen.params["sin_t"]
    kv = L.init_kv_cache(tcfg, S, dtype)
    emb = tp["embed_tokens"][jnp.arange(N)]
    pos = 700 + jnp.arange(N)
    bias = causal_prefill_bias(N, S, start=700)

    @jax.jit
    def verify_loop():
        def body(c, _):
            h, kvv = L.llama_forward(tp, tcfg, emb + c * 0.0, pos, kv,
                                     jnp.int32(700), bias, cos_t, sin_t,
                                     kv_len=jnp.int32(700 + N))
            return jnp.float32(h[0, 0]), None
        return jax.lax.scan(body, jnp.float32(0.0), None, length=20)[0]

    verify_loop()
    jax.block_until_ready(verify_loop())
    t0 = time.time()
    jax.block_until_ready(verify_loop())
    log(f"verify forward alone (N={N}): {(time.time()-t0)/20*1e3:.2f} ms")

    # T=1 forward (AR step cost, no sampling)
    emb1 = tp["embed_tokens"][jnp.arange(1)]
    bias1 = causal_prefill_bias(1, S, start=700)

    @jax.jit
    def ar_loop():
        def body(c, _):
            h, kvv = L.llama_forward(tp, tcfg, emb1 + c * 0.0,
                                     jnp.arange(1) + 700, kv, jnp.int32(700),
                                     bias1, cos_t, sin_t,
                                     kv_len=jnp.int32(701))
            return jnp.float32(h[0, 0]), None
        return jax.lax.scan(body, jnp.float32(0.0), None, length=20)[0]

    ar_loop()
    jax.block_until_ready(ar_loop())
    t0 = time.time()
    jax.block_until_ready(ar_loop())
    log(f"T=1 target forward alone: {(time.time()-t0)/20*1e3:.2f} ms")

    if args.trace:
        with jax.profiler.trace("/tmp/msd_trace"):
            jax.block_until_ready(verify_loop())
        log("trace written to /tmp/msd_trace")
    return 0


if __name__ == "__main__":
    sys.exit(main())
