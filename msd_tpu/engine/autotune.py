"""Tree-budget auto-tuning — the ``total_token = -1`` path.

Reference: EAGLE/eagle/model/ea_model.py:156-179 — when total_token is -1,
time 20 base-model forwards at each candidate length in {40, 48, 50, 56, 60}
and pick the cheapest per-token one. TPU version: time the actual verify-step
forward (tree-masked target forward at the candidate node count) and score
candidate budgets by (verify_time / expected_tokens); since verification on
the MXU is flat in node count up to a tile (128), larger budgets usually win.
"""

from __future__ import annotations

import time
from dataclasses import replace
from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from msd_tpu.configs import EngineConfig, LlamaConfig, TreeConfig
from msd_tpu.models import llama as L
from msd_tpu.ops.attention import tree_bias


def time_verify_forward(params: Dict, cfg: LlamaConfig, n_nodes: int,
                        s_target: int, prefix_len: int = 640,
                        repeats: int = 5) -> float:
    """Wall-clock one tree-masked target forward over n_nodes draft tokens."""
    cos_t, sin_t = L.make_rope(cfg, s_target + 64)
    kv = L.init_kv_cache(cfg, s_target,
                         params["layers"]["q_proj"].dtype)
    emb = jnp.zeros((n_nodes, cfg.hidden_size),
                    params["layers"]["q_proj"].dtype)
    mask = jnp.tril(jnp.ones((n_nodes, n_nodes), jnp.bool_))
    pos = prefix_len + jnp.arange(n_nodes, dtype=jnp.int32)

    @jax.jit
    def fwd(kv):
        bias = tree_bias(mask, jnp.int32(prefix_len), s_target)
        hidden, kv = L.llama_forward(params, cfg, emb, pos, kv,
                                     jnp.int32(prefix_len), bias, cos_t, sin_t)
        return hidden, kv

    h, kv = fwd(kv)
    jax.block_until_ready(h)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        h, kv = fwd(kv)
        jax.block_until_ready(h)
        best = min(best, time.perf_counter() - t0)
    return best


def autotune_total_token(params: Dict, cfg: LlamaConfig,
                         eng: EngineConfig,
                         candidates: Tuple[int, ...] = (40, 48, 50, 56, 60,
                                                        96, 128),
                         expected_alpha_fn=None, log=None) -> TreeConfig:
    """Pick the tree budget minimizing verify-time per expected token.

    expected_alpha_fn(n) estimates accepted length at budget n; default uses
    a saturating curve (more nodes help sublinearly) mirroring the
    reference's empirical preference for larger trees until the forward cost
    bites (ea_model.py:156-179).
    """
    if expected_alpha_fn is None:
        def expected_alpha_fn(n):
            return n ** 0.25  # saturating proxy; relative ranking only

    best, best_n = float("inf"), candidates[0]
    for n in candidates:
        t = time_verify_forward(params, cfg, n, eng.max_seq_len + n)
        score = t / expected_alpha_fn(n)
        if log:
            log(f"autotune: nodes={n} verify={t*1e3:.2f}ms score={score:.5f}")
        if score < best:
            best, best_n = score, n
    return replace(eng.tree, num_nodes=best_n)


def widths_tree(widths: Tuple[int, ...], base: TreeConfig) -> TreeConfig:
    """TreeConfig for a medusa per-depth width plan."""
    widths = tuple(int(w) for w in widths)
    return replace(base, top_k=widths[0], max_depth=len(widths),
                   num_nodes=1 + sum(widths), medusa_widths=widths)


def autotune_tree_alpha(gen, candidates, ids, img_feats=None,
                        max_new: int = 128, t_ar: float | None = None,
                        repeats: int = 2, log=None, **gen_kw) -> Dict:
    """ALPHA-AWARE budget tuning: run the real engine end-to-end per
    candidate TreeConfig, measure (measured alpha, ms/step), and adopt the
    tree maximizing the measured speedup alpha * t_ar / t_step (or
    alpha / t_step when t_ar is unknown).

    Unlike autotune_total_token (the reference's verify-cost-only heuristic,
    ea_model.py:156-179), this accounts for how much acceptance each budget
    actually buys with the CURRENT draft — a 96-node tree that pays 4ms/step
    over 32 nodes without raising alpha loses here. Each candidate costs one
    decode-program compile; meant for a handful of candidates after draft
    distillation. ``gen`` is an MSDGenerator (mutated to the winning tree).
    """
    import dataclasses
    import time as _time

    results = []
    best_score, best_tree = -float("inf"), gen.eng.tree
    # medusa can only draft 1 + medusa_heads depths (fixed at engine
    # construction): a deeper sweep plan would run TRUNCATED while being
    # reported (and paying verify rows) for its full widths — trim it to
    # the drafting capacity instead
    max_d = 1 + getattr(gen.dcfg, "medusa_heads", 0)
    if getattr(gen.dcfg, "medusa_heads", 0):
        trimmed = []
        for tree in candidates:
            w = tree.medusa_widths
            if w is not None and len(w) > max_d:
                if log:
                    log(f"alpha-tune: plan {w} exceeds the engine's "
                        f"{max_d} draftable depths — trimming")
                tree = widths_tree(w[:max_d], tree)
            trimmed.append(tree)
        candidates = trimmed
    for tree in candidates:
        gen.eng = dataclasses.replace(gen.eng, tree=tree)
        r = gen.generate(ids, img_feats=img_feats, max_new_tokens=max_new,
                         **gen_kw)  # compile + first run
        times = []
        for _ in range(repeats):
            t0 = _time.perf_counter()
            r = gen.generate(ids, img_feats=img_feats,
                             max_new_tokens=max_new, **gen_kw)
            times.append(_time.perf_counter() - t0)
        t_step = min(times) / max(r.accept_steps, 1)
        alpha = r.avg_accept_len
        score = alpha * (t_ar if t_ar else 1.0) / t_step
        results.append({"tree_nodes": tree.num_nodes,
                        "widths": tree.medusa_widths,
                        "alpha": round(alpha, 3),
                        "ms_per_step": round(t_step * 1e3, 3),
                        "score": round(score, 4)})
        if log:
            log(f"alpha-tune: nodes={tree.num_nodes} "
                f"widths={tree.medusa_widths} alpha={alpha:.2f} "
                f"step={t_step*1e3:.2f}ms "
                f"{'speedup' if t_ar else 'score'}={score:.3f}")
        if score > best_score:
            best_score, best_tree = score, tree
    gen.eng = dataclasses.replace(gen.eng, tree=best_tree)
    return {"picked_nodes": best_tree.num_nodes,
            "picked_widths": best_tree.medusa_widths, "sweep": results}
