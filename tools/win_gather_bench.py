"""Microbench: window K/V gather strategies inside windowed_attention.

The step breakdown (artifacts/step_breakdown_r3.json) shows the canonical
window path costs +1.7 ms/verify over the plain-bias kernel while its data
movement is only ~377 MB/step (~0.46 ms at roofline) — the jnp.take row
gather is suspect. Candidates, timed per layer-shape call on the real chip:

  take    : kw = jnp.take(k, win_idx, axis=0)            (current kernel)
  onehot  : kw = onehot(win_idx) @ k.reshape(S, -1)      (MXU gather trick)
  stacked : one take over a stacked [S, 2, Hkv, D] (k,v) array

Each loop threads its carry into the indices via optimization_barrier so
nothing hoists, and consumes the full windowed_attention output.

Usage: python tools/win_gather_bench.py [--iters 50] [--tiny]
"""
import argparse
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--nodes", type=int, default=48)
    ap.add_argument("--win", type=int, default=15)
    ap.add_argument("--alloc", type=int, default=1152)
    ap.add_argument("--heads", type=int, default=32)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--layers", type=int, default=32,
                    help="chain this many per-layer calls per iteration "
                         "(amortizes loop overhead like the real verify)")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    sys.path.insert(0, ".")
    if args.tiny:
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")
        args.layers = 2
    else:
        from bench import wait_for_backend
        if not wait_for_backend(3600.0):
            return 2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from msd_tpu.ops.attention import NEG_INF

    N, W, S, H, D = args.nodes, args.win, args.alloc, args.heads, args.dim
    IT, NL = args.iters, args.layers
    dtype = jnp.bfloat16
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.normal(size=(N, H, D)) * 0.1, dtype)
    ks = jnp.asarray(rng.normal(size=(NL, S, H, D)) * 0.1, dtype)
    vs = jnp.asarray(rng.normal(size=(NL, S, H, D)) * 0.1, dtype)
    E = S - N - 1
    depth = jnp.asarray(rng.integers(0, 14, size=(N,)), jnp.int32)
    win_start = E + depth - (W - 1)
    l = win_start[:, None] + jnp.arange(W)[None, :]
    win_idx = jnp.clip(l, 0, S - 1).astype(jnp.int32)
    win_bias = jnp.where(l >= 0, 0.0, NEG_INF).astype(jnp.float32)
    cols = jnp.arange(S)[None, :]
    bias = jnp.where(cols < win_start[:, None], 0.0, NEG_INF
                     ).astype(jnp.float32)
    ob = jax.lax.optimization_barrier

    def core_postdiv(qx, k, v, kw, vw):
        # divide by the softmax denominator AFTER the value matmul: the
        # division runs on [T, H, D] (small) instead of materializing
        # p = e/den over [H, T, S] fp32 (28MB/layer at these shapes)
        scale = 1.0 / (D ** 0.5)
        sc_c = jnp.einsum("thd,shd->hts", qx, k,
                          preferred_element_type=jnp.float32) * scale
        sc_c = sc_c + bias.astype(jnp.float32)[None, :, :]
        sc_w = jnp.einsum("thd,twhd->htw", qx, kw,
                          preferred_element_type=jnp.float32) * scale
        sc_w = sc_w + win_bias.astype(jnp.float32)[None, :, :]
        m = jnp.maximum(jnp.max(sc_c, -1), jnp.max(sc_w, -1))[..., None]
        e_c, e_w = jnp.exp(sc_c - m), jnp.exp(sc_w - m)
        den = (jnp.sum(e_c, -1) + jnp.sum(e_w, -1))  # [H, T]
        out = jnp.einsum("hts,shd->thd", e_c.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out + jnp.einsum("htw,twhd->thd", e_w.astype(v.dtype), vw,
                               preferred_element_type=jnp.float32)
        return (out / den.T[..., None]).astype(dtype)

    def core(qx, k, v, kw, vw):
        scale = 1.0 / (D ** 0.5)
        sc_c = jnp.einsum("thd,shd->hts", qx, k,
                          preferred_element_type=jnp.float32) * scale
        sc_c = sc_c + bias.astype(jnp.float32)[None, :, :]
        sc_w = jnp.einsum("thd,twhd->htw", qx, kw,
                          preferred_element_type=jnp.float32) * scale
        sc_w = sc_w + win_bias.astype(jnp.float32)[None, :, :]
        m = jnp.maximum(jnp.max(sc_c, -1), jnp.max(sc_w, -1))[..., None]
        e_c, e_w = jnp.exp(sc_c - m), jnp.exp(sc_w - m)
        den = (jnp.sum(e_c, -1) + jnp.sum(e_w, -1))[..., None]
        out = jnp.einsum("hts,shd->thd", (e_c / den).astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out + jnp.einsum("htw,twhd->thd", (e_w / den).astype(v.dtype),
                               vw, preferred_element_type=jnp.float32)
        return out.astype(dtype)

    def gather_take(k, v, idx):
        return jnp.take(k, idx, axis=0), jnp.take(v, idx, axis=0)

    def gather_onehot(k, v, idx):
        oh = jax.nn.one_hot(idx.reshape(-1), S, dtype=dtype)   # [N*W, S]
        kw = (oh @ k.reshape(S, H * D)).reshape(N, W, H, D)
        vw = (oh @ v.reshape(S, H * D)).reshape(N, W, H, D)
        return kw, vw

    def gather_stacked(k, v, idx):
        kv = jnp.stack([k, v], axis=1)                         # [S, 2, H, D]
        g = jnp.take(kv, idx, axis=0)                          # [N, W, 2, H, D]
        return g[:, :, 0], g[:, :, 1]

    def gather_dds(k, v, idx):
        # per-row dynamic_slice over contiguous windows (win rows ARE
        # contiguous cache rows whenever depth maps 1:1 to slots; clip
        # handles the rest) — only valid for backbone trees, measured for
        # reference
        starts = jnp.clip(idx[:, 0], 0, S - W)

        def row(s0):
            return (jax.lax.dynamic_slice_in_dim(k, s0, W, 0),
                    jax.lax.dynamic_slice_in_dim(v, s0, W, 0))
        kw, vw = jax.vmap(row)(starts)
        return kw, vw

    def core_scanw(qx, k, v, kw, vw):
        # never materialize [T, W, H, D]: unrolled loop over the W window
        # slots; per slot gather [T, H, D] rows, dot for scores, and
        # accumulate p*v in fp32. Window-slot iteration order is fixed ->
        # the association is still a pure function of the logical prefix.
        del kw, vw
        scale = 1.0 / (D ** 0.5)
        sc_c = jnp.einsum("thd,shd->hts", qx, k,
                          preferred_element_type=jnp.float32) * scale
        sc_c = sc_c + bias.astype(jnp.float32)[None, :, :]
        sc_ws = []
        for w in range(W):
            krow = jnp.take(k, win_idx[:, w], axis=0)         # [T, H, D]
            sc = jnp.einsum("thd,thd->ht", qx, krow,
                            preferred_element_type=jnp.float32) * scale
            sc_ws.append(sc + win_bias[None, :, w])
        sc_w = jnp.stack(sc_ws, axis=-1)                      # [H, T, W]
        m = jnp.maximum(jnp.max(sc_c, -1), jnp.max(sc_w, -1))[..., None]
        e_c, e_w = jnp.exp(sc_c - m), jnp.exp(sc_w - m)
        den = (jnp.sum(e_c, -1) + jnp.sum(e_w, -1))[..., None]
        p_w = e_w / den                                       # [H, T, W]
        out = jnp.einsum("hts,shd->thd", (e_c / den).astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        for w in range(W):
            vrow = jnp.take(v, win_idx[:, w], axis=0)         # [T, H, D]
            out = out + p_w[:, :, w].T[..., None] * vrow.astype(jnp.float32)
        return out.astype(dtype)

    CW = W + N                                                # compact rows
    cbase = E - W + 1                                         # static here

    def gather_compact(k, v, idx):
        kc = jax.lax.dynamic_slice_in_dim(k, cbase, CW, 0)
        vc = jax.lax.dynamic_slice_in_dim(v, cbase, CW, 0)
        loc = jnp.clip(idx - cbase, 0, CW - 1)
        return jnp.take(kc, loc, axis=0), jnp.take(vc, loc, axis=0)

    variants = {"take": (gather_take, core),
                "onehot": (gather_onehot, core),
                "stacked": (gather_stacked, core),
                "dds_contig": (gather_dds, core),
                "take_postdiv": (gather_take, core_postdiv),
                "onehot_postdiv": (gather_onehot, core_postdiv),
                "compact_take": (gather_compact, core),
                "scan_w": (gather_take, core_scanw)}
    res = {}
    for name, (g, crx) in variants.items():
        @jax.jit
        def loop(q0, kss, vss, idx0):
            def body(c, kv):
                acc, idx = c
                k, v = kv
                idxx = ob((idx, acc.astype(jnp.int32) * 0))[0] + 0
                kw, vw = g(k, v, idxx)
                out = crx(q0, k, v, kw, vw)
                return (acc + jnp.sum(out.astype(jnp.float32)), idx), None

            def it(c, _):
                return jax.lax.scan(body, c, (kss, vss))[0], None
            return jax.lax.scan(it, (jnp.float32(0.0), idx0), None,
                                length=IT)[0][0]

        t0 = time.time()
        out = jax.block_until_ready(loop(q, ks, vs, win_idx))
        comp = time.time() - t0
        t0 = time.time()
        out = jax.block_until_ready(loop(q, ks, vs, win_idx))
        ms = (time.time() - t0) / IT / NL * 1e3
        res[name] = ms
        log(f"{name:12s} {ms:8.4f} ms/layer-call  (x{NL} layers = "
            f"{ms*NL:7.3f} ms/verify)  compile {comp:.1f}s")

    # plain masked_attention baseline (no window) for the same shapes
    @jax.jit
    def plain_loop(q0, kss, vss):
        from msd_tpu.ops.attention import masked_attention

        def body(acc, kv):
            k, v = kv
            qx = ob((q0, acc))[0].astype(dtype)
            out = masked_attention(qx, k, v, bias)
            return acc + jnp.sum(out.astype(jnp.float32)), None

        def it(c, _):
            return jax.lax.scan(body, c, (kss, vss))[0], None
        return jax.lax.scan(it, jnp.float32(0.0), None, length=IT)[0]

    t0 = time.time()
    jax.block_until_ready(plain_loop(q, ks, vs))
    comp = time.time() - t0
    t0 = time.time()
    jax.block_until_ready(plain_loop(q, ks, vs))
    ms = (time.time() - t0) / IT / NL * 1e3
    res["plain"] = ms
    log(f"{'plain':12s} {ms:8.4f} ms/layer-call  (x{NL} layers = "
        f"{ms*NL:7.3f} ms/verify)  compile {comp:.1f}s")

    print(__import__("json").dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
