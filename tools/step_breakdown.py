"""Per-stage timing breakdown of ONE MSD decode step on the real chip.

The bench records ~36 ms/step at the default 48-node tapered medusa tree
while the 7B weight read alone predicts ~17-20 ms — this tool locates the
difference. It rebuilds the engine's decode-step stages (draft suffix
forward, medusa expansion, verify forward, lm_head, greedy evaluation,
KV commit) as individually-timed steady-state jitted scan loops using the
engine's OWN functions (msd_tpu.engine.spec_engine internals), plus the
full decode body with canonical attention on/off, and reports ms per call.

Microbench integrity rules (RESULTS.md "Round-3 kernel findings" #3):
every loop threads its carry through jax.lax.optimization_barrier into the
stage inputs (no hoisting / constant folding) and the carry depends on
large output aggregates (no slice propagation / DCE). Stages that mutate a
KV cache carry the whole cache so the writes cannot be dead-code-eliminated.

Usage: python tools/step_breakdown.py [--medusa-widths 10,8,...] [--iters 30]
"""
import argparse
import sys
import time


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--medusa-widths",
                    default="10,8,6,5,4,3,2,2,2,1,1,1,1,1")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--max-seq", type=int, default=1152)
    ap.add_argument("--prompt-tokens", type=int, default=64)
    ap.add_argument("--skip-full", action="store_true",
                    help="skip the two full-body loops (longest compiles)")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model on CPU: validates the loop plumbing "
                         "without the chip")
    args = ap.parse_args()

    sys.path.insert(0, ".")
    if args.tiny:
        import jax as _jax
        _jax.config.update("jax_platforms", "cpu")
    else:
        from bench import wait_for_backend
        if not wait_for_backend(3600.0):
            return 2
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from msd_tpu.configs import (DraftConfig, EngineConfig, LlamaConfig,
                                 TreeConfig, IMAGE_TOKEN_INDEX)
    from msd_tpu.engine import spec_engine as SE
    from msd_tpu.engine import tree as tree_mod
    from msd_tpu.engine.generator import MSDGenerator
    from msd_tpu.models import draft as draft_mod
    from msd_tpu.models import llama as L
    from msd_tpu.ops.sampling import SamplingParams, canon_logits

    dtype = jnp.bfloat16
    widths = tuple(int(x) for x in args.medusa_widths.split(","))
    nodes = 1 + sum(widths)
    base = LlamaConfig.llava_7b() if not args.tiny else dataclasses.replace(
        LlamaConfig.llava_7b(), hidden_size=128, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        vocab_size=512)
    tcfg = dataclasses.replace(base, residual_dtype="float32")
    dcfg = DraftConfig(text=tcfg, medusa_heads=len(widths) - 1)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tp = L.init_llama_params_stacked(k1, tcfg, dtype)
    tp["lm_head"] = tp["lm_head"] * dtype(6.0)
    dp = draft_mod.init_draft_params(k2, dcfg, dtype)
    dp["medusa"] = draft_mod.init_medusa_params(jax.random.PRNGKey(7), dcfg,
                                                dtype)
    dp["embed_tokens"] = tp["embed_tokens"]
    log(f"params ready (widths={widths}, nodes={nodes})")

    n_img = 576
    eng = EngineConfig(max_seq_len=args.max_seq, prompt_pad_multiple=128,
                       tree=TreeConfig(top_k=widths[0],
                                       max_depth=len(widths),
                                       num_nodes=nodes,
                                       medusa_widths=widths))
    sp = SamplingParams(greedy_round_bits=6)
    gen = MSDGenerator(tp, dp, tcfg, dcfg, eng, n_img=n_img, eos_id=-1, sp=sp)
    params = gen.params
    cos_t, sin_t = params["cos_t"], params["sin_t"]

    rng = np.random.default_rng(0)
    ids = rng.integers(3, 31000, size=args.prompt_tokens).astype(np.int32)
    ids[1] = IMAGE_TOKEN_INDEX
    feats = jnp.asarray(rng.normal(size=(n_img, tcfg.hidden_size)) * 0.02,
                        dtype)

    # one real prefilled EngineState (bench statics: collect_hiddens=True)
    st = gen._statics(64, sp, collect_hiddens=True)
    st_nocanon = dataclasses.replace(
        st, eng=dataclasses.replace(st.eng, canonical_attn=False))
    padded = jnp.asarray(gen._pad(ids))
    t0 = time.time()
    state = SE.prefill(st, params, padded, jnp.int32(len(ids)), feats,
                       jnp.int32(gen._img_pos(ids)), jax.random.PRNGKey(0))
    state = jax.block_until_ready(state)
    log(f"prefill ready in {time.time()-t0:.1f}s  E={int(state.cur_len)}")

    IT = args.iters
    ob = jax.lax.optimization_barrier

    def timed(name, fn, *xs, big=False):
        t0 = time.time()
        out = jax.block_until_ready(fn(*xs))
        c = time.time() - t0
        if big:
            # full-body outputs are whole EngineStates (~1.3GB at 7B);
            # holding the compile-run output while the timed run executes
            # (plus a previous variant's output bound to `_` at the call
            # site) OOMs the chip — drop it first, and don't return it
            out = None
        t0 = time.time()
        out = jax.block_until_ready(fn(*xs))
        ms = (time.time() - t0) / IT * 1e3
        log(f"{name:34s} {ms:8.3f} ms/call   (compile+1st {c:.1f}s)")
        return (None if big else out), ms

    def leaf_sum(tr):
        return sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(tr)
                   if jnp.issubdtype(x.dtype, jnp.number))

    res = {}

    # ---- stage inputs derived once from the prefilled state ----
    s0 = state

    # 1) draft suffix forward (P rows through the 1-layer draft)
    # NOTE every loop takes (params, cos_t, sin_t) as jit ARGUMENTS —
    # closed-over device arrays become XLA constants, and a 13.5GB
    # constant stalls the remote compile (same pitfall as commit e2424d1)
    @jax.jit
    def suffix_loop(pr, ct, sn, s):
        def body(c, _):
            dkv, lh, af = c
            sh = ob((s.suffix_hidden, lh))[0]
            lh2, dkv2, _dl, af2 = SE._draft_suffix_forward(
                st, pr, dkv, s.draft_len, s.suffix_tokens, sh,
                s.suffix_len, lh, ct, sn, s.img_pos, af, s.pos_delta)
            return (dkv2, lh2, af2), None
        c0 = (s.draft_kv, s.last_draft_hidden, s.attn_feat)
        return jax.lax.scan(body, c0, None, length=IT)[0][1]

    _, res["suffix_fwd"] = timed("draft suffix forward", suffix_loop,
                                 params, cos_t, sin_t, s0)

    # 2) medusa expansion (heads + stacked lm_head + top_k + tree build)
    @jax.jit
    def expand_loop(pr, s):
        def body(c, _):
            lh = ob((s.last_draft_hidden, c))[0]
            tr, _ = SE._draft_expand_medusa(st, pr, s.draft_kv, lh,
                                            s.bonus, s.attn_feat)
            return leaf_sum((tr.tokens, tr.node_weight)), None
        return jax.lax.scan(body, jnp.float32(0.0), None, length=IT)[0]

    _, res["expand"] = timed("medusa expansion", expand_loop, params, s0)

    # a fixed tree for the verify/commit stages
    tr0 = SE._draft_expand_medusa(st, params, s0.draft_kv,
                                  s0.last_draft_hidden, s0.bonus,
                                  s0.attn_feat)[0]
    tr0 = jax.block_until_ready(tr0)

    # 3) verify forward + lm_head + greedy eval (canonical window attention)
    def make_verify_loop(stx):
        @jax.jit
        def verify_loop(pr, ct, sn, s, tr):
            def body(c, _):
                tkv, acc = c
                toks = ob((tr.tokens, acc))[0]
                trx = tr._replace(tokens=toks)
                hidden, tkv2, best, acc_len, next_tok, _k, logits = \
                    SE._verify(stx, pr, tkv, s.cur_len, trx, s.key,
                               ct, sn, s.pos_delta, s.ids)
                acc2 = (jnp.sum(logits) + jnp.sum(hidden.astype(jnp.float32))
                        + jnp.float32(best + acc_len + next_tok))
                return (tkv2, acc2), None
            c0 = (s.target_kv, jnp.float32(0.0))
            return jax.lax.scan(body, c0, None, length=IT)[0][1]
        return verify_loop

    _, res["verify_canon"] = timed("verify fwd+head+eval (canonical)",
                                   make_verify_loop(st), params, cos_t,
                                   sin_t, s0, tr0)
    _, res["verify_plain"] = timed("verify fwd+head+eval (plain bias)",
                                   make_verify_loop(st_nocanon), params,
                                   cos_t, sin_t, s0, tr0)

    # 4) lm_head alone on N rows
    hid0 = jax.block_until_ready(
        jax.jit(lambda s: s.suffix_hidden[:1].repeat(nodes, 0))(s0))

    @jax.jit
    def head_loop(pr, h):
        def body(c, _):
            hx = ob((h, c))[0]
            lg = L.lm_head(pr["target"], hx)
            return jnp.sum(lg), None
        return jax.lax.scan(body, jnp.float32(0.0), None, length=IT)[0]

    _, res["lm_head"] = timed(f"lm_head [{nodes}, V]", head_loop, params,
                              hid0)

    # 5) greedy evaluation alone (canon round + path walk)
    lg0 = jax.block_until_ready(
        jax.jit(lambda pr, h: L.lm_head(pr["target"], h))(params, hid0))

    @jax.jit
    def eval_loop(lg, tr):
        def body(c, _):
            lgx = ob((lg, c))[0]
            best, acc_len, next_tok = tree_mod.evaluate_greedy(
                tr, canon_logits(lgx, sp.greedy_round_bits))
            return jnp.float32(best + acc_len + next_tok), None
        return jax.lax.scan(body, jnp.float32(0.0), None, length=IT)[0]

    _, res["eval_greedy"] = timed("greedy eval (canon+path)", eval_loop,
                                  lg0, tr0)

    # 6) commit (KV path gather + ids/suffix staging)
    @jax.jit
    def commit_loop(s, tr):  # no params needed: _commit touches no weights
        def body(tkv, _):
            sx = s._replace(target_kv=tkv)
            hid = ob((hid0, leaf_sum((tkv["k"][0, 0],))))[0]
            s2 = SE._commit(st, sx, tr, hid, tkv, jnp.int32(3),
                            jnp.int32(2), jnp.int32(11))
            return s2.target_kv, None
        return jax.lax.scan(body, s.target_kv, None, length=IT)[0]["k"][0, 0, 0, 0]

    _, res["commit"] = timed("commit (KV gather+stage)", commit_loop, s0, tr0)

    # 7) T=1 target forward (the AR step's forward cost)
    emb1 = jax.block_until_ready(jax.jit(
        lambda pr: pr["target"]["embed_tokens"][:1] * 1.0)(params))

    @jax.jit
    def t1_loop(pr, ct, sn, s, emb):
        def body(c, _):
            tkv, acc = c
            ex = ob((emb, acc))[0]
            bias = jnp.where(jnp.arange(st.s_target)[None, :] <= s.cur_len,
                             0.0, SE.NEG_INF).astype(jnp.float32)
            h, tkv2 = L.llama_forward(pr["target"], tcfg, ex,
                                      s.cur_len[None], tkv, s.cur_len, bias,
                                      ct, sn, kv_len=s.cur_len + 1)
            lg = L.lm_head(pr["target"], h)
            return (tkv2, jnp.sum(lg)), None
        return jax.lax.scan(body, (s.target_kv, jnp.float32(0.0)), None,
                            length=IT)[0][1]

    _, res["t1_fwd"] = timed("T=1 target forward+head", t1_loop, params,
                             cos_t, sin_t, s0, emb1)

    # ---- full decode body, canonical on/off ----
    if not args.skip_full:
        def make_body_loop(stx):
            @jax.jit
            def body_loop(pr, ct, sn, s):
                body = SE._decode_body(stx, pr, ct, sn)

                def it(sx, _):
                    sx = sx._replace(
                        cur_len=s.cur_len, draft_len=s.draft_len,
                        suffix_len=s.suffix_len, new_tokens=s.new_tokens,
                        steps=s.steps, done=s.done)
                    return body(sx), None
                return jax.lax.scan(it, s, None, length=IT)[0]
            return body_loop

        _, res["body_canon"] = timed("FULL decode body (canonical)",
                                     make_body_loop(st), params, cos_t,
                                     sin_t, s0, big=True)
        st_nocollect = dataclasses.replace(st, collect_hiddens=False)
        _, res["body_nocollect"] = timed("FULL decode body (no collect)",
                                         make_body_loop(st_nocollect),
                                         params, cos_t, sin_t, s0, big=True)
        _, res["body_plain"] = timed("FULL decode body (plain bias)",
                                     make_body_loop(st_nocanon), params,
                                     cos_t, sin_t, s0, big=True)

    log("")
    parts = ["suffix_fwd", "expand", "verify_canon", "commit"]
    tot = sum(res[p] for p in parts)
    log(f"sum of stages (suffix+expand+verify_canon+commit) = {tot:.3f} ms")
    if "body_canon" in res:
        log(f"full body (canonical) = {res['body_canon']:.3f} ms "
            f"-> unattributed {res['body_canon']-tot:+.3f} ms")
    log(f"canonical-attn cost (verify) = "
        f"{res['verify_canon']-res['verify_plain']:+.3f} ms")
    print(__import__("json").dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
