"""The TPU-native MSD decode engine.

Replaces the reference's eager Python drive loop
(EAGLE/eagle/model/ea_model.py:235-400 ``msdgenerate`` +
cnets.py:929-1574 ``topK_genrate`` + utils.py ``tree_decoding``/
``evaluate_posterior``/``update_inference_inputs``) with two compiled
programs and zero per-token host round-trips:

  prefill : fused multimodal embedding -> target prefill -> first token ->
            draft prefill (EAGLE shift-by-one pairing, image rows bypassing
            the fusion fc) — one jit per prompt-length bucket.
  decode  : a single ``lax.while_loop``; each iteration drafts an OPT-Tree
            (inner while_loop with early stopping), verifies all branches in
            one tree-masked target forward, accepts losslessly (greedy
            cumprod or speculative sampling), gathers the accepted path's KV
            in place, and re-drafts — all fixed shapes.

Position/layout conventions (post image expansion everywhere):
  E            committed expanded length (= target KV length).
  bonus        the sampled-but-uncommitted next token; it sits at position E
               and becomes tree node 0 of the next draft tree.
  draft row j  pairs emb(token at j+1) with the target hidden at j, so draft
               rows/positions are the token's expanded position minus one
               (cnets.py:950-957 shift; len_posi bookkeeping :994-996,1194).
The reference's scattered +575/-575 offsets (utils.py:334-335,477-482;
cnets.py:995-1001) vanish under this convention.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from msd_tpu.configs import DraftConfig, EngineConfig, LlamaConfig, TreeConfig
from msd_tpu.engine import tree as tree_mod
from msd_tpu.engine.tree import Tree
from msd_tpu.models import draft as draft_mod
from msd_tpu.models import llama as L
from msd_tpu.models.llava import expand_ids, fuse_embeddings
from msd_tpu.ops.attention import NEG_INF, causal_prefill_bias, tree_bias
from msd_tpu.ops.sampling import SamplingParams, process_logits, sample_token


@dataclass(frozen=True)
class Statics:
    """Hashable static configuration closed over by the jitted programs."""

    tcfg: LlamaConfig
    dcfg: DraftConfig
    tree: TreeConfig
    eng: EngineConfig
    sp: SamplingParams
    n_img: int          # 0 (text-only) or vision.num_patches (e.g. 576)
    eos_id: int
    max_new: int
    # "expand": LLaVA -200 placeholder expands to n_img rows.
    # "inline": Qwen2-VL — the prompt already contains the image-pad span;
    #           positions follow mrope with a post-image delta.
    image_mode: str = "expand"
    # mrope frequency sections (Qwen2-VL); None = standard 1D rope
    mrope_section: Optional[Tuple[int, int, int]] = None
    # visual-attention calibration feature:
    #   "reference": row[child_idx] of the latest prefix forward, 0 beyond the
    #                valid rows — faithful to cnets.py:516-575, which is
    #                degenerate during decode (most candidates read row 0..K
    #                of an 11-row suffix);
    #   "last_row":  the CURRENT position's attention over the image span
    #                (row suffix_len-1), broadcast to all candidates — the
    #                principled variant.
    attn_feature_mode: str = "reference"
    # calibrated tree construction (params must carry a "calib" CalibTables)
    use_calibration: bool = False
    # record per-node calibration features/labels each step (training phase)
    collect_calibration: bool = False
    # export the engine's OWN trajectory hidden states (prefill rows + the
    # verify hiddens committed at each step) — on-policy distillation data
    # with EXACTLY the numerics the draft sees at decode time, eliminating
    # the teacher-re-forward program-shape mismatch
    collect_hiddens: bool = False

    @property
    def s_target(self) -> int:
        """Target KV capacity: room for the prompt + generation + one tree,
        rounded up to the 128-lane multiple — the length-aware pallas decode
        kernel requires S % 128 == 0 (ops/pallas/decode_attention.py), and
        alignment costs at most 127 bias-masked cache rows (~64MB at 7B),
        so ``attn_impl="auto"`` can engage at any engine geometry."""
        return -128 * (-(self.eng.max_seq_len + self.tree.num_nodes) // 128)

    @property
    def s_draft(self) -> int:
        """Draft KV capacity: stable prefix + suffix pad + frontier scratch."""
        t = self.tree
        return self.eng.max_seq_len + t.max_path_len + t.max_depth * t.top_k + 8


class EngineState(NamedTuple):
    ids: jnp.ndarray            # [S_t] int32 expanded committed ids
    cur_len: jnp.ndarray        # E
    bonus: jnp.ndarray          # pending token at position E
    suffix_tokens: jnp.ndarray  # [MAX_PATH] tokens for the next draft suffix rows
    suffix_hidden: jnp.ndarray  # [MAX_PATH, H] target hidden for those rows
    suffix_len: jnp.ndarray
    last_draft_hidden: jnp.ndarray  # [H]
    target_kv: Dict
    draft_kv: Dict
    draft_len: jnp.ndarray      # draft stable KV length (== E after expand)
    new_tokens: jnp.ndarray
    steps: jnp.ndarray
    acc_sum: jnp.ndarray        # sum of (accept_len + 1) per verify step
    alpha_hist: jnp.ndarray     # [16] histogram of tokens-per-step
    done: jnp.ndarray
    key: jnp.ndarray
    img_pos: jnp.ndarray        # placeholder index (= image span start)
    pos_delta: jnp.ndarray      # rope position minus cache index (Qwen mrope
    #                             collapse: max(grid_h, grid_w) - n_img; 0 for
    #                             LLaVA)
    attn_feat: jnp.ndarray      # [TOP_K] visual-attention intensity per child
    #                             slot from the latest draft prefix forward
    #                             (cnets.py:516-575 candidate_idx semantics)
    calib_log: Dict             # {} or fixed [max_new, N] feature/label buffers
    traj_hidden: jnp.ndarray    # [S_t, H] engine-computed hidden per position
    #                             (collect_hiddens) or [0, 0]


# ---------------------------------------------------------------------------
# Draft tree expansion (OPT-Tree + early stop), all on device
# ---------------------------------------------------------------------------

def _attn_feature_vec(st: Statics, attn_probs: jnp.ndarray,
                      img_pos: jnp.ndarray, valid_rows: jnp.ndarray
                      ) -> jnp.ndarray:
    """[TOP_K] mean attention of row child_idx over the image span.

    attn_probs: [Hq, T, S] from the draft prefix/suffix forward. Faithful to
    cnets.py:516-575: candidate_idx indexes ROWS of the latest prefix forward
    (rows beyond the valid length give 0.0), span = [img_pos-1, img_pos-1+n_img).
    """
    K = st.tree.top_k
    n_img = max(st.n_img, 1)
    mean_h = jnp.mean(attn_probs, axis=0)               # [T, S]
    t_rows = mean_h.shape[0]
    span = jax.lax.dynamic_slice(
        mean_h, (0, jnp.maximum(img_pos - 1, 0)), (t_rows, n_img))
    row_mean = jnp.mean(span, axis=1)                   # [T]
    k_idx = jnp.arange(K)
    if st.attn_feature_mode == "last_row":
        last = row_mean[jnp.clip(valid_rows - 1, 0, t_rows - 1)]
        vals = jnp.broadcast_to(last, (K,))
        ok = (valid_rows > 0) & (st.n_img > 0)
        return jnp.where(ok, vals, 0.0).astype(jnp.float32)
    vals = row_mean[jnp.minimum(k_idx, t_rows - 1)]
    ok = (k_idx < valid_rows) & (k_idx < t_rows) & (st.n_img > 0)
    return jnp.where(ok, vals, 0.0).astype(jnp.float32)


def _rerank(st: Statics, params: Dict, logits: jnp.ndarray,
            cand_ids: jnp.ndarray, cand_probs: jnp.ndarray,
            attn_feat: jnp.ndarray, depth: jnp.ndarray):
    """Calibrated in-place rerank of per-row candidate sets.

    logits/cand_ids/cand_probs: [R, V] / [R, K] / [R, K]; depth: scalar or
    [R] per-row depths. Implements cnets.py:1286-1339: calibrated logit bias
    scatter-added at the candidate ids, re-softmax, reselect K within each
    row's candidate set. Returns (new_ids, new_probs, margin_row).
    """
    from msd_tpu.calib.device import calibration_bias

    R, K = cand_ids.shape
    ct = params["calib"]
    # K can be 1 for width-1 medusa plans: the top1-top2 margin degrades
    # to the top1 prob (no runner-up), matching cnets.py's single-candidate
    # fallback semantics — indexing [:, 1] would be a static OOB at trace
    margin_row = (cand_probs[:, 0] - cand_probs[:, 1] if K > 1
                  else cand_probs[:, 0])                        # [R]
    depth_row = jnp.broadcast_to(jnp.asarray(depth, jnp.int32), (R,))
    if attn_feat.shape[0] < K:  # medusa width can exceed the OPT-Tree top_k
        attn_feat = jnp.pad(attn_feat, (0, K - attn_feat.shape[0]))
    bias = calibration_bias(
        ct, cand_ids.reshape(-1), cand_probs.reshape(-1),
        jnp.tile(attn_feat[:K], (R,)),
        jnp.repeat(depth_row, K),
        jnp.repeat(margin_row, K)).reshape(R, K)
    rows = jnp.arange(R)[:, None]
    logits_c = logits.at[rows, cand_ids].add(bias.astype(logits.dtype))
    probs_c = jax.nn.softmax(logits_c.astype(jnp.float32), axis=-1)
    scores = jnp.take_along_axis(probs_c, cand_ids, axis=1)     # [R, K]
    new_scores, order = jax.lax.top_k(scores, K)
    new_ids = jnp.take_along_axis(cand_ids, order, axis=1)
    return new_ids, new_scores, margin_row


def _draft_expand_static(st: Statics, params: Dict, draft_kv: Dict,
                         E: jnp.ndarray, last_hidden: jnp.ndarray,
                         root_token: jnp.ndarray, cos_t, sin_t,
                         pos_delta: jnp.ndarray = 0) -> Tuple[Tree, Dict]:
    """Legacy static-tree drafting (utils.py:115-233 + choices.py): the tree
    SHAPE is fixed; node at path [..., s] takes its parent distribution's
    rank-s token. Depth loop is unrolled over the (static) level structure;
    each level's rows attend to the stable prefix + their static ancestors
    written at fixed scratch offsets E + (node_id - 1)."""
    from msd_tpu.engine.static_tree import (per_depth_structure,
                                            static_layout, tree_from_tokens)

    dp = params["draft"]
    head = params["target"]["lm_head"]
    choices = [list(c) for c in st.tree.static_choices]
    parents_np, depths_np, n, levels = per_depth_structure(choices)
    _, _, anc_mask_np, _ = static_layout(choices, st.tree.max_path_len)
    max_slot = max(s for lv in levels.values() for _, _, s in lv) + 1
    s_d = st.s_draft

    child_tokens = jnp.zeros((n - 1,), jnp.int32)
    # per-node draft hidden output, indexed by node id (0 = root)
    node_hidden = jnp.zeros((n,) + last_hidden.shape, last_hidden.dtype)
    node_hidden = node_hidden.at[0].set(last_hidden)

    # root children from head(last_hidden)
    logits0 = (last_hidden @ head).astype(jnp.float32)
    _, top0 = jax.lax.top_k(logits0, max_slot)
    for node_id, parent_id, slot in levels.get(1, []):
        child_tokens = child_tokens.at[node_id - 1].set(top0[slot])

    kpos = jnp.arange(s_d)[None, :]
    for d in sorted(levels):
        lv = levels[d]
        rows = jnp.asarray([node for node, _, _ in lv], jnp.int32)
        par = jnp.asarray([p for _, p, _ in lv], jnp.int32)
        toks = child_tokens[rows - 1]
        hid = node_hidden[par]
        emb = dp["embed_tokens"][toks]
        hin = draft_mod.draft_fuse(dp, emb, hid)
        pos = jnp.broadcast_to(E + pos_delta + d - 1, rows.shape).astype(jnp.int32)
        # per-row bias: prefix + static ancestors (incl. self). Scratch slot
        # of node i is E + i - 1, so the node id at key position p is
        # rel = p - E + 1.
        anc = jnp.asarray(anc_mask_np)[rows]            # [W_d, n] bool
        rel = kpos - E + 1                              # [1, s_d]
        relc = jnp.clip(rel, 0, n - 1)
        anc_g = jnp.take_along_axis(
            anc, jnp.broadcast_to(relc, (len(lv), s_d)), axis=1)
        keep = (kpos < E) | ((rel >= 1) & (rel < n) & anc_g)
        bias = jnp.where(keep, 0.0, NEG_INF).astype(jnp.float32)
        # rows of one level are contiguous node ids -> contiguous scratch
        write = E + rows[0] - 1
        out, draft_kv = draft_mod.draft_forward(dp, st.dcfg, hin, pos,
                                                draft_kv, write, bias,
                                                cos_t, sin_t)
        node_hidden = node_hidden.at[rows].set(out)
        if d + 1 in levels:
            logits = (out @ head).astype(jnp.float32)
            _, topd = jax.lax.top_k(logits, max_slot)   # [W_d, max_slot]
            row_of = {node: i for i, (node, _, _) in enumerate(lv)}
            for node_id, parent_id, slot in levels[d + 1]:
                child_tokens = child_tokens.at[node_id - 1].set(
                    topd[row_of[parent_id], slot])

    tr = tree_from_tokens(choices, root_token, child_tokens,
                          st.tree.max_path_len)
    # pad the static tree (n nodes) out to the engine budget (num_nodes)
    N = st.tree.num_nodes
    if n < N:
        pad = N - n
        tr = Tree(
            tokens=jnp.concatenate([tr.tokens, jnp.full((pad,), -1, jnp.int32)]),
            parents=jnp.concatenate([tr.parents, jnp.zeros((pad,), jnp.int32)]),
            mask=jnp.pad(tr.mask, ((0, pad), (0, pad))) |
                 jnp.eye(N, dtype=jnp.bool_),
            positions=jnp.concatenate([tr.positions, jnp.ones((pad,), jnp.int32)]),
            retrieve=jnp.concatenate([
                tr.retrieve, jnp.full((pad, st.tree.max_path_len), -1,
                                      jnp.int32)]),
            valid=jnp.concatenate([tr.valid, jnp.zeros((pad,), jnp.bool_)]),
            node_depth=jnp.concatenate([tr.node_depth,
                                        jnp.ones((pad,), jnp.int32)]),
            node_weight=jnp.concatenate([tr.node_weight,
                                         jnp.zeros((pad,), jnp.float32)]),
            extras={})
    return tr, draft_kv


def _draft_expand_medusa(st: Statics, params: Dict, draft_kv: Dict,
                         last_hidden: jnp.ndarray, root_token: jnp.ndarray,
                         attn_feat: jnp.ndarray) -> Tuple[Tree, Dict]:
    """Medusa-style expansion (public multi-head drafting technique): depth-1
    candidates from head(last_hidden) as usual; depth d >= 2 from per-depth
    resblock heads over the SAME last_hidden — no recursion, so the draft
    never eats its own prediction error, and every depth's logits come from
    one stacked lm_head matmul (one weight read instead of max_depth).

    The tree layout is STATIC: every node occupies a fixed slot, so a node's
    verify value depends only on the committed prefix, its (fixed) ancestor
    slots and its own rope position — sibling rows are exact
    zero-contributions under the mask — and near-tie argmax flips between
    runs with slightly different draft params (which plagued the
    weight-sorted finalize_tree layout) largely disappear.

    Two layouts:
    - TreeConfig.medusa_widths (default): depth d's widths[d-1] candidates
      branch off the previous depth's rank-0 node (backbone chain). Tapered
      widths (wide shallow, narrow deep) buy much deeper trees for the same
      node budget.
    - TreeConfig.medusa_choices: an explicit sparse cartesian-product tree —
      a tuple of per-depth-rank paths like the reference's mc_sim_7b_63
      (choices.py:1-3), e.g. ((0,), (1,), (0, 0), (1, 0), (0, 0, 0), ...).
      Because medusa heads are POSITION-based (head d predicts slot E+d+1
      from the same hidden, unconditioned on the depth-d token), the same
      per-depth candidate set extends ANY branch: node (r1..rd) carries
      idx[d-1, rd]. A backbone tree ends the step whenever verification
      accepts an off-backbone candidate; cross-product paths keep extending
      rank-1/2 branches, raising alpha for a few extra nodes."""
    import numpy as _np

    t = st.tree
    K, D = t.top_k, t.max_depth
    N = t.num_nodes
    d_cap = min(D, 1 + st.dcfg.medusa_heads)
    if t.medusa_choices is not None:
        closed = set()
        for p in t.medusa_choices:
            p = tuple(int(r) for r in p)[:d_cap]
            for i in range(1, len(p) + 1):
                closed.add(p[:i])
        # prefix-closed, depth-major slot order; prefixes sort first, so a
        # budget cut keeps the closure
        paths = sorted(closed, key=lambda p: (len(p), p))[:N - 1]
    else:
        widths = list(t.medusa_widths) if t.medusa_widths is not None \
            else [K] * D
        widths = widths[:d_cap]
        # fit the width plan into the node budget, shallow depths first
        budget, fitted = N - 1, []
        for wd in widths:
            take = min(wd, budget)
            if take <= 0:
                break
            fitted.append(take)
            budget -= take
        paths = [(0,) * (d - 1) + (r,)
                 for d in range(1, len(fitted) + 1)
                 for r in range(fitted[d - 1])]
    d_use = max((len(p) for p in paths), default=0)
    W = 1 + max((p[-1] for p in paths), default=0)
    slot_of = {p: i + 1 for i, p in enumerate(paths)}
    dp = params["draft"]
    head = params["target"]["lm_head"]

    mh = draft_mod.medusa_hiddens(dp["medusa"], last_hidden)   # [Km, H]
    xs = jnp.concatenate([last_hidden[None], mh[:d_use - 1]], axis=0)
    logits = (xs @ head).astype(jnp.float32)                   # [d_use, V]
    probs = jax.nn.softmax(logits, axis=-1)
    w, idx = jax.lax.top_k(probs, W)                           # [d_use, W]
    margin_pre = (w[:, 0] - w[:, 1]) if W > 1 \
        else jnp.zeros((d_use,), jnp.float32)                  # pre-rerank
    if st.use_calibration:
        # calibrated rerank of each depth's candidate row (row r = depth r+1)
        idx_r, w_r, _ = _rerank(st, params, logits, idx.astype(jnp.int32), w,
                                attn_feat, jnp.arange(1, d_use + 1))
        idx, w = idx_r, w_r

    # ---- static structure (trace-time numpy constants) ----
    depth_np = _np.zeros((N,), _np.int32)
    par_np = _np.zeros((N,), _np.int32)
    valid_np = _np.zeros((N,), bool)
    valid_np[0] = True
    mask_np = _np.eye(N, dtype=bool)
    mask_np[:, 0] = True
    P = t.max_path_len
    ret_np = _np.full((N, P), -1, _np.int32)
    ret_np[0, 0] = 0
    by_depth = {}      # d -> (slots, last ranks, parent slots) numpy arrays
    for p, s in slot_of.items():
        d = len(p)
        depth_np[s] = d
        par_np[s] = slot_of[p[:-1]] if d > 1 else 0
        valid_np[s] = True
        ret_np[s, 0] = 0
        for a in range(1, d + 1):
            mask_np[s, slot_of[p[:a]]] = True
            ret_np[s, a] = slot_of[p[:a]]
        by_depth.setdefault(d, []).append((s, p[-1], par_np[s]))
    by_depth = {d: tuple(_np.asarray(c) for c in zip(*sorted(v)))
                for d, v in by_depth.items()}

    # ---- dynamic: tokens + weights ----
    tokens = jnp.full((N,), -1, jnp.int32)
    tokens = tokens.at[0].set(root_token.astype(jnp.int32))
    node_w = jnp.zeros((N,), jnp.float32).at[0].set(1.0)
    conf = jnp.zeros((N,), jnp.float32)
    for d in range(1, d_use + 1):
        sl, rk, pa = by_depth[d]
        tokens = tokens.at[sl].set(idx[d - 1, rk].astype(jnp.int32))
        node_w = node_w.at[sl].set(node_w[pa] * w[d - 1, rk])
        if st.collect_calibration:
            conf = conf.at[sl].set(w[d - 1, rk])

    extras = {}
    if st.collect_calibration:
        margin = margin_pre
        attn_v = jnp.zeros((N,), jnp.float32)
        marg_v = jnp.zeros((N,), jnp.float32)
        af_n = attn_feat.shape[0]
        for d in range(1, d_use + 1):
            sl, rk, _pa = by_depth[d]
            attn_v = attn_v.at[sl].set(attn_feat[_np.minimum(rk, af_n - 1)])
            marg_v = marg_v.at[sl].set(
                jnp.broadcast_to(margin[d - 1], (len(sl),)))
        extras = {"local_conf": conf, "attn": attn_v, "margin": marg_v}

    tr = Tree(tokens=tokens,
              parents=jnp.asarray(par_np),
              mask=jnp.asarray(mask_np),
              positions=jnp.asarray(depth_np),
              retrieve=jnp.asarray(ret_np),
              valid=jnp.asarray(valid_np),
              node_depth=jnp.asarray(depth_np),
              node_weight=node_w,
              extras=extras)
    return tr, draft_kv


def _draft_expand(st: Statics, params: Dict, draft_kv: Dict, E: jnp.ndarray,
                  last_hidden: jnp.ndarray, root_token: jnp.ndarray,
                  cos_t, sin_t, attn_feat: jnp.ndarray,
                  pos_delta: jnp.ndarray = 0) -> Tuple[Tree, Dict]:
    """Expand the draft tree from the last draft hidden state.

    Mirrors cnets.py:1066-1427: layer 0 = top-k of head(last_hidden); depth
    loop forwards the k-node frontier (identity tree mask: each node sees the
    stable prefix, all previously written frontier KV, and itself —
    cnets.py:1183-1202), path weight = parent weight x child prob, global
    top-k over the flattened [K, K] candidates, early stop when the top-
    ``num_draft`` weight-sum increment <= threshold (:1401-1418, the newest
    layer is discarded on stop, :1429-1437).
    """
    t = st.tree
    if t.static_choices is not None:
        return _draft_expand_static(st, params, draft_kv, E, last_hidden,
                                    root_token, cos_t, sin_t, pos_delta)
    if st.dcfg.medusa_heads > 0:
        return _draft_expand_medusa(st, params, draft_kv, last_hidden,
                                    root_token, attn_feat)
    K, D, n_draft = t.top_k, t.max_depth, t.num_draft
    dp = params["draft"]
    head = params["target"]["lm_head"]
    s_d = st.s_draft

    logits0 = (last_hidden @ head).astype(jnp.float32)
    probs0 = jax.nn.softmax(logits0)
    w0, ids0 = jax.lax.top_k(probs0, K)
    margin0 = w0[0] - w0[1]
    if st.use_calibration:
        ids0_r, w0_r, _ = _rerank(st, params, logits0[None],
                                  ids0[None].astype(jnp.int32), w0[None],
                                  attn_feat, jnp.int32(1))
        ids0, w0 = ids0_r[0], w0_r[0]

    wm = jnp.zeros((D, K), jnp.float32).at[0].set(w0)
    tm = jnp.zeros((D, K), jnp.int32).at[0].set(ids0.astype(jnp.int32))
    pm = jnp.zeros((D, K), jnp.int32).at[0].set(jnp.arange(K, dtype=jnp.int32))

    collect = st.collect_calibration
    if collect:
        ex = {
            "local_conf": jnp.zeros((D, K), jnp.float32).at[0].set(w0),
            "attn": jnp.zeros((D, K), jnp.float32).at[0].set(attn_feat[:K]),
            "margin": jnp.zeros((D, K), jnp.float32).at[0].set(margin0),
        }
    else:
        ex = {"local_conf": jnp.zeros((0, 0), jnp.float32)}

    frontier_tok = ids0.astype(jnp.int32)
    frontier_hid = jnp.broadcast_to(last_hidden, (K,) + last_hidden.shape)

    def cond(c):
        layer, stop = c[3], c[5]
        return (layer < D) & (~stop)

    def body(c):
        wm, tm, pm, layer, s_prev, stop, use_depth, f_tok, f_hid, dkv, ex = c
        d = layer - 1  # scratch slot of the frontier being forwarded
        emb = dp["embed_tokens"][f_tok]
        hin = draft_mod.draft_fuse(dp, emb, f_hid)
        pos = jnp.broadcast_to(E + pos_delta + d, (K,)).astype(jnp.int32)
        write = E + d * K

        kpos = jnp.arange(s_d)[None, :]
        self_pos = write + jnp.arange(K)[:, None]
        keep = (kpos < write) | (kpos == self_pos)
        bias = jnp.where(keep, 0.0, NEG_INF).astype(jnp.float32)

        out, dkv = draft_mod.draft_forward(dp, st.dcfg, hin, pos, dkv, write,
                                           bias, cos_t, sin_t)
        logits = (out @ head).astype(jnp.float32)          # [K, V]
        probs = jax.nn.softmax(logits, axis=-1)
        cw, cid = jax.lax.top_k(probs, K)                  # [K, K]
        margin_row = cw[:, 0] - cw[:, 1]
        if st.use_calibration:
            cid, cw, margin_row = _rerank(st, params, logits,
                                          cid.astype(jnp.int32), cw,
                                          attn_feat, layer + 1)
        pathw = wm[layer - 1][:, None] * cw
        gw, gidx = jax.lax.top_k(pathw.reshape(-1), K)
        sel_tok = cid.reshape(-1)[gidx].astype(jnp.int32)
        sel_par = (gidx // K).astype(jnp.int32)
        sel_slot = (gidx % K).astype(jnp.int32)

        wm = wm.at[layer].set(gw)
        tm = tm.at[layer].set(sel_tok)
        pm = pm.at[layer].set(sel_par)
        if collect:
            ex = {
                "local_conf": ex["local_conf"].at[layer].set(
                    cw.reshape(-1)[gidx]),
                "attn": ex["attn"].at[layer].set(attn_feat[sel_slot]),
                "margin": ex["margin"].at[layer].set(margin_row[sel_par]),
            }

        # early stop on weight-sum increment over layers [0, layer)
        row = jnp.arange(D)[:, None]
        masked = jnp.where(row < layer, wm, 0.0).reshape(-1)
        s_now = jnp.sum(jax.lax.top_k(masked, min(n_draft, D * K))[0])
        stop2 = (s_now - s_prev) <= t.early_stop_threshold
        use_depth2 = jnp.where(stop2, layer, layer + 1)

        f_hid2 = out[sel_par]
        return (wm, tm, pm, layer + 1, s_now, stop2, use_depth2,
                sel_tok, f_hid2, dkv, ex)

    init = (wm, tm, pm, jnp.int32(1), jnp.float32(0.0), jnp.bool_(False),
            jnp.int32(D), frontier_tok, frontier_hid, draft_kv, ex)
    wm, tm, pm, _, _, _, use_depth, _, _, draft_kv, ex = \
        jax.lax.while_loop(cond, body, init)

    tr = tree_mod.finalize_tree(t, root_token, wm, tm, pm, use_depth,
                                extra_mats=ex if collect else None)
    return tr, draft_kv


def _draft_suffix_forward(st: Statics, params: Dict, dkv: Dict,
                          draft_len: jnp.ndarray, suffix_tokens: jnp.ndarray,
                          suffix_hidden: jnp.ndarray, suffix_len: jnp.ndarray,
                          last_hidden_prev: jnp.ndarray, cos_t, sin_t,
                          img_pos: jnp.ndarray, attn_feat_prev: jnp.ndarray,
                          pos_delta: jnp.ndarray = 0):
    """Extend the draft stable KV with the accepted rows (cnets.py:998-1047).

    Always runs MAX_PATH rows (suffix_len of them valid). Returns
    (last_hidden, dkv, new_draft_len, attn_feat).
    """
    dp = params["draft"]
    P = st.tree.max_path_len
    emb = dp["embed_tokens"][jnp.maximum(suffix_tokens, 0)]
    hin = draft_mod.draft_fuse(dp, emb, suffix_hidden)
    # rope positions carry the mrope pos_delta; CACHE-slot indices do not
    pos = (draft_len + pos_delta + jnp.arange(P)).astype(jnp.int32)
    slot = (draft_len + jnp.arange(P)).astype(jnp.int32)
    # causal over the growing prefix: row i sees cache slots [0, draft_len+i]
    kpos = jnp.arange(st.s_draft)[None, :]
    keep = kpos <= slot[:, None]
    bias = jnp.where(keep, 0.0, NEG_INF).astype(jnp.float32)
    need_attn = st.use_calibration or st.collect_calibration
    if need_attn:
        out, dkv, attn_p = draft_mod.draft_forward(
            dp, st.dcfg, hin, pos, dkv, draft_len, bias, cos_t, sin_t,
            return_attn=True)
        attn_new = _attn_feature_vec(st, attn_p, img_pos, suffix_len)
        attn_feat = jnp.where(suffix_len > 0, attn_new, attn_feat_prev)
    else:
        out, dkv = draft_mod.draft_forward(dp, st.dcfg, hin, pos, dkv,
                                           draft_len, bias, cos_t, sin_t)
        attn_feat = attn_feat_prev
    idx = jnp.maximum(suffix_len - 1, 0)
    last_hidden = jnp.where(suffix_len > 0, out[idx], last_hidden_prev)
    return last_hidden, dkv, draft_len + suffix_len, attn_feat


# ---------------------------------------------------------------------------
# Target verification
# ---------------------------------------------------------------------------

def _verify(st: Statics, params: Dict, target_kv: Dict, E: jnp.ndarray,
            tr: Tree, key, cos_t, sin_t, pos_delta: jnp.ndarray = 0,
            ids_buf: Optional[jnp.ndarray] = None):
    """One tree-masked target forward + lossless acceptance
    (utils.py:320-366 tree_decoding + :372-450 evaluate_posterior)."""
    tp = params["target"]
    emb = tp["embed_tokens"][jnp.maximum(tr.tokens, 0)]
    pos = (E + pos_delta + tr.positions).astype(jnp.int32)
    win = None
    if st.eng.canonical_attn:
        # Window-canonical verification: node i's last W logical positions
        # (committed-prefix tail for l < E, tree ancestors/self for l >= E)
        # reduce via fixed depth-indexed window slots, so its logits are a
        # pure function of (token, logical prefix) — bitwise invariant to
        # the draft/tree layout (ops/attention.windowed_attention).
        W = st.tree.max_path_len
        depth = tr.positions.astype(jnp.int32)                  # [N]
        win_start = E + depth - (W - 1)                         # [N]
        l = win_start[:, None] + jnp.arange(W)[None, :]         # [N, W]
        rel = l - E                                             # anc depth
        anc = jnp.take_along_axis(tr.retrieve,
                                  jnp.clip(rel, 0, W - 1), axis=1)
        row = jnp.where(rel >= 0, E + jnp.maximum(anc, 0), l)
        win_idx = jnp.clip(row, 0, st.s_target - 1)
        win_bias = jnp.where(l >= 0, 0.0, NEG_INF).astype(jnp.float32)
        cols = jnp.arange(st.s_target)[None, :]
        bias = jnp.where(cols < win_start[:, None], 0.0,
                         NEG_INF).astype(jnp.float32)
        win = (win_idx, win_bias, win_start)
    else:
        bias = tree_bias(tr.mask, E, st.s_target)
    hidden, target_kv = L.llama_forward(tp, st.tcfg, emb, pos, target_kv, E,
                                        bias, cos_t, sin_t,
                                        kv_len=E + st.tree.num_nodes, win=win)
    logits = L.lm_head(tp, hidden)  # [N, V] fp32

    if st.sp.greedy:
        from msd_tpu.ops.sampling import canon_logits
        best, acc_len, next_tok = tree_mod.evaluate_greedy(
            tr, canon_logits(logits, st.sp.greedy_round_bits))
    else:
        from msd_tpu.ops.sampling import apply_repetition_penalty
        plogits = logits
        if st.sp.repetition_penalty != 1.0:
            plogits = apply_repetition_penalty(
                plogits, ids_buf, E, st.sp.repetition_penalty)
        probs = jax.nn.softmax(process_logits(plogits, st.sp), axis=-1)
        key, sub = jax.random.split(key)
        best, acc_len, next_tok = tree_mod.evaluate_sampling(
            tr, probs, sub, top_k=st.tree.top_k)
    return hidden, target_kv, best, acc_len, next_tok, key, logits


def _collect_step(st: Statics, state: EngineState, tr: Tree,
                  logits: jnp.ndarray, best, acc_len) -> Dict:
    """Record per-node calibration features + labels for this verify step.

    TPU-native replacement for the reference's per-parent-path base-model
    re-forwards (cnets.py:577-716): the verify pass already computed the
    target's conditional distribution at every tree node, so base_confidence /
    base_top1 / base_margin come from ``logits[parent]`` for free. (Scope
    difference, documented: features are collected for the ~num_nodes tree
    nodes rather than every explored preselect candidate.)
    """
    N = st.tree.num_nodes
    p_node = jax.nn.softmax(logits, axis=-1)                   # [N, V] f32
    top2, _ = jax.lax.top_k(p_node, 2)                         # [N, 2]
    argmax_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    par = tr.parents
    tok = jnp.maximum(tr.tokens, 0)
    base_conf = p_node[par, tok]
    base_top1 = (argmax_tok[par] == tr.tokens).astype(jnp.int32)
    base_margin = (top2[par, 0] - top2[par, 1]).astype(jnp.float32)

    path = tr.retrieve[best]
    slot = jnp.arange(st.tree.max_path_len)
    on_path = jnp.zeros((N,), jnp.bool_).at[jnp.maximum(path, 0)].set(
        (slot <= acc_len) & (path >= 0))
    accept = on_path.astype(jnp.int32)

    i = state.steps
    log = state.calib_log
    row = {
        "token": tr.tokens, "depth": tr.positions.astype(jnp.int32),
        "draft_conf": tr.extras["local_conf"],
        "attn": tr.extras["attn"], "margin": tr.extras["margin"],
        "base_conf": base_conf.astype(jnp.float32), "base_top1": base_top1,
        "base_margin": base_margin, "accept": accept,
        "valid": (tr.valid & (jnp.arange(N) > 0)).astype(jnp.int32),
    }
    return {k: log[k].at[i].set(v) for k, v in row.items()}


def _commit(st: Statics, state: EngineState, tr: Tree, hidden: jnp.ndarray,
            target_kv: Dict, best, acc_len, next_tok) -> EngineState:
    """Commit the accepted path (utils.py:453-581 without the re-encode quirk):
    scatter tokens into ids, gather the accepted path's KV into the prefix,
    and stage the draft-suffix rows for the next iteration."""
    P = st.tree.max_path_len
    E = state.cur_len
    path = tr.retrieve[best]                    # [P] tree indices, -1 pad
    pc = jnp.maximum(path, 0)
    slot = jnp.arange(P)
    ct = jnp.where(slot <= acc_len, tr.tokens[pc], 0).astype(jnp.int32)

    ids = jax.lax.dynamic_update_slice(state.ids, ct, (E,))

    # KV gather of accepted path -> contiguous prefix rows [E, E+P)
    src = E + pc

    def gather_commit(a):
        g = jnp.take(a, src, axis=1)            # [L, P, Hkv, D]
        return jax.lax.dynamic_update_slice(a, g, (0, E, 0, 0))

    target_kv = {"k": gather_commit(target_kv["k"]),
                 "v": gather_commit(target_kv["v"])}

    ct_shift = jnp.concatenate([ct[1:], jnp.zeros((1,), jnp.int32)])
    suffix_tokens = jnp.where(slot < acc_len, ct_shift,
                              jnp.where(slot == acc_len, next_tok, 0))
    suffix_hidden = hidden[pc]
    n_new = acc_len + 1

    new_len = E + n_new
    eos_hit = jnp.any((ct == st.eos_id) & (slot <= acc_len)) | (next_tok == st.eos_id)
    new_tokens = state.new_tokens + n_new
    limit = st.eng.max_seq_len - st.tree.num_nodes - P - 2
    done = eos_hit | (new_tokens >= st.max_new) | (new_len >= limit)

    hist_idx = jnp.minimum(n_new, 15)
    traj_hidden = state.traj_hidden
    if st.collect_hiddens:
        traj_hidden = jax.lax.dynamic_update_slice(
            traj_hidden, suffix_hidden.astype(traj_hidden.dtype), (E, 0))
    return state._replace(
        traj_hidden=traj_hidden,
        ids=ids, cur_len=new_len, bonus=next_tok,
        suffix_tokens=suffix_tokens, suffix_hidden=suffix_hidden,
        suffix_len=n_new, target_kv=target_kv,
        new_tokens=new_tokens, steps=state.steps + 1,
        acc_sum=state.acc_sum + n_new,
        alpha_hist=state.alpha_hist.at[hist_idx].add(1),
        done=done)


# ---------------------------------------------------------------------------
# Public jitted programs
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(0,))
def prefill(st: Statics, params: Dict, ids: jnp.ndarray,
            prompt_len: jnp.ndarray, img_feats: Optional[jnp.ndarray],
            img_pos: jnp.ndarray, key: jnp.ndarray,
            bonus_override: Optional[jnp.ndarray] = None) -> EngineState:
    """Target + draft prefill over a padded prompt.

    ids: [P_pad] (unexpanded, IMAGE_TOKEN_INDEX at img_pos when n_img > 0);
    img_feats: [n_img, H] projected image tokens (encoded ONCE per request —
    unlike utils.py:537-542 which re-runs CLIP every step).
    bonus_override: optional scalar first token (< 0 = ignore): pins the
    first new token to a value computed by a CANONICAL program (the AR
    prefill), so AR-vs-MSD divergence can only start inside the decode loop.
    """
    tcfg, dcfg = st.tcfg, st.dcfg
    # an image-capable engine still serves text-only prompts (feats is None)
    n_img = st.n_img if img_feats is not None else 0
    P_pad = ids.shape[0]
    P_exp = P_pad + max(n_img - 1, 0)
    tp = params["target"]

    E0 = prompt_len + max(n_img - 1, 0)

    if n_img > 0:
        fused = fuse_embeddings(tp["embed_tokens"], ids, img_feats, img_pos, P_exp)
        exp_ids = expand_ids(jnp.where(ids < 0, 0, ids), img_pos, n_img, P_exp)
        j = jnp.arange(P_exp)
        img_rows = (j >= img_pos) & (j < img_pos + n_img)
    else:
        fused = tp["embed_tokens"][jnp.maximum(ids, 0)]
        exp_ids = ids
        img_rows = jnp.zeros((P_exp,), jnp.bool_)

    return _prefill_core(st, params, fused, exp_ids, E0, img_rows, img_pos,
                         key, bonus_override)


@partial(jax.jit, static_argnums=(0,))
def prefill_prefused(st: Statics, params: Dict, fused: jnp.ndarray,
                     exp_ids: jnp.ndarray, e0: jnp.ndarray,
                     img_rows: jnp.ndarray, img_pos: jnp.ndarray,
                     key: jnp.ndarray) -> EngineState:
    """Prefill over HOST-prebuilt fused embeddings (multi-image / anyres
    prompts, llava.fuse_embeddings_multi — llava_arch.py:229-324). fused:
    [P_exp, H] already expanded; exp_ids: [P_exp] (0 at image rows);
    img_rows: [P_exp] bool image-row mask; e0: expanded prompt length."""
    return _prefill_core(st, params, fused, exp_ids, e0, img_rows, img_pos,
                         key)


def _prefill_core(st: Statics, params: Dict, fused: jnp.ndarray,
                  exp_ids: jnp.ndarray, E0: jnp.ndarray,
                  img_rows: jnp.ndarray, img_pos: jnp.ndarray,
                  key: jnp.ndarray,
                  bonus_override: Optional[jnp.ndarray] = None) -> EngineState:
    tcfg, dcfg = st.tcfg, st.dcfg
    P_exp = fused.shape[0]
    cos_t, sin_t = params["cos_t"], params["sin_t"]
    tp, dp = params["target"], params["draft"]

    positions = jnp.arange(P_exp, dtype=jnp.int32)
    bias = causal_prefill_bias(P_exp, st.s_target)
    target_kv = L.init_kv_cache(tcfg, st.s_target, fused.dtype)
    hidden, target_kv = L.llama_forward(tp, tcfg, fused, positions, target_kv,
                                        jnp.int32(0), bias, cos_t, sin_t)

    last_logits = L.lm_head(tp, hidden[E0 - 1][None])[0]
    key, sub = jax.random.split(key)
    bonus = sample_token(sub, last_logits, st.sp)
    if bonus_override is not None:
        bonus = jnp.where(bonus_override >= 0,
                          bonus_override.astype(jnp.int32), bonus)

    # ---- draft prefill: SE[j] = fused[j+1]-style shifted inputs ----
    j = jnp.arange(P_exp)
    exp_shift = jnp.concatenate([exp_ids[1:], jnp.zeros((1,), jnp.int32)])
    se = dp["embed_tokens"][jnp.maximum(exp_shift, 0)]
    # rows whose NEXT position is an image row take the fused (image-
    # feature) embedding and bypass the fc (cnets.py:302-314)
    img_next = jnp.concatenate([img_rows[1:], jnp.zeros((1,), jnp.bool_)])
    fused_shift = jnp.concatenate([fused[1:], jnp.zeros_like(fused[:1])])
    se = jnp.where(img_next[:, None], fused_shift, se)
    se = jnp.where((j == E0 - 1)[:, None], dp["embed_tokens"][bonus][None], se)

    dh_in = draft_mod.draft_fuse(dp, se, hidden, image_row_mask=img_next)
    d_bias = causal_prefill_bias(P_exp, st.s_draft)
    draft_kv = draft_mod.init_draft_kv(dcfg, st.s_draft, fused.dtype)
    need_attn = st.use_calibration or st.collect_calibration
    if need_attn:
        d_out, draft_kv, attn_p = draft_mod.draft_forward(
            dp, dcfg, dh_in, positions, draft_kv, jnp.int32(0), d_bias,
            cos_t, sin_t, return_attn=True)
        attn_feat = _attn_feature_vec(st, attn_p, img_pos,
                                      jnp.int32(P_exp))
    else:
        d_out, draft_kv = draft_mod.draft_forward(dp, dcfg, dh_in, positions,
                                                  draft_kv, jnp.int32(0),
                                                  d_bias, cos_t, sin_t)
        attn_feat = jnp.zeros((st.tree.top_k,), jnp.float32)
    last_draft_hidden = d_out[E0 - 1]

    P = st.tree.max_path_len
    H = tcfg.hidden_size
    ids_buf = jnp.zeros((st.s_target,), jnp.int32)
    ids_buf = jax.lax.dynamic_update_slice(ids_buf, exp_ids[:P_exp], (0,))

    if st.collect_calibration:
        N, M = st.tree.num_nodes, st.max_new
        f32 = lambda: jnp.zeros((M, N), jnp.float32)  # noqa: E731
        i32 = lambda: jnp.zeros((M, N), jnp.int32)    # noqa: E731
        calib_log = {"token": i32(), "depth": i32(), "draft_conf": f32(),
                     "attn": f32(), "margin": f32(), "base_conf": f32(),
                     "base_top1": i32(), "base_margin": f32(),
                     "accept": i32(), "valid": i32()}
    else:
        calib_log = {}

    if st.collect_hiddens:
        traj_hidden = jax.lax.dynamic_update_slice(
            jnp.zeros((st.s_target, H), hidden.dtype), hidden, (0, 0))
    else:
        traj_hidden = jnp.zeros((0, 0), hidden.dtype)

    return EngineState(
        ids=ids_buf, cur_len=E0, bonus=bonus,
        suffix_tokens=jnp.zeros((P,), jnp.int32),
        suffix_hidden=jnp.zeros((P, H), hidden.dtype),
        suffix_len=jnp.int32(0),
        last_draft_hidden=last_draft_hidden,
        target_kv=target_kv, draft_kv=draft_kv, draft_len=E0,
        new_tokens=jnp.int32(0), steps=jnp.int32(0), acc_sum=jnp.int32(0),
        alpha_hist=jnp.zeros((16,), jnp.int32),
        done=jnp.bool_(False), key=key, img_pos=img_pos,
        pos_delta=jnp.int32(0), attn_feat=attn_feat, calib_log=calib_log,
        traj_hidden=traj_hidden)


def _decode_body(st: Statics, params: Dict, cos_t, sin_t):
    """One verify-step body shared by decode / decode_until."""

    def body(s: EngineState) -> EngineState:
        last_hidden, dkv, dlen, attn_feat = _draft_suffix_forward(
            st, params, s.draft_kv, s.draft_len, s.suffix_tokens,
            s.suffix_hidden, s.suffix_len, s.last_draft_hidden, cos_t, sin_t,
            s.img_pos, s.attn_feat, s.pos_delta)
        tr, dkv = _draft_expand(st, params, dkv, dlen, last_hidden, s.bonus,
                                cos_t, sin_t, attn_feat, s.pos_delta)
        hidden, tkv, best, acc_len, next_tok, key, logits = _verify(
            st, params, s.target_kv, s.cur_len, tr, s.key, cos_t, sin_t,
            s.pos_delta, s.ids)
        s = s._replace(draft_kv=dkv, draft_len=dlen, target_kv=tkv, key=key,
                       last_draft_hidden=last_hidden, attn_feat=attn_feat)
        if st.collect_calibration:
            s = s._replace(calib_log=_collect_step(st, s, tr, logits, best,
                                                   acc_len))
        return _commit(st, s, tr, hidden, tkv, best, acc_len, next_tok)

    return body


def _surface_bonus(state: EngineState) -> EngineState:
    # surface the final pending token so hosts can read ids[:cur_len+1]
    # (a subsequent decode/decode_until call overwrites this slot at commit)
    ids = jax.lax.dynamic_update_slice(state.ids, state.bonus[None],
                                       (state.cur_len,))
    return state._replace(ids=ids)


@partial(jax.jit, static_argnums=(0,), donate_argnums=(2,))
def decode(st: Statics, params: Dict, state: EngineState) -> EngineState:
    """The speculative decode loop — one XLA while_loop, zero host syncs."""
    body = _decode_body(st, params, params["cos_t"], params["sin_t"])
    state = jax.lax.while_loop(lambda s: ~s.done, body, state)
    return _surface_bonus(state)


@partial(jax.jit, static_argnums=(0,), donate_argnums=(2,))
def decode_until(st: Statics, params: Dict, state: EngineState,
                 stop_at: jnp.ndarray) -> EngineState:
    """Decode segment: run until `new_tokens >= stop_at` (traced scalar) or
    the overall stop condition in state.done (eos / max_new / cache limit).

    Streaming = repeated decode_until calls with growing stop_at; one compile
    serves every segment. Identical results to a single decode() because the
    body and all state transitions are shared; the only cost is one host
    sync per segment (the reference streams per token because its loop is
    eager, ea_model.py; ours is one XLA program per segment).
    """
    body = _decode_body(st, params, params["cos_t"], params["sin_t"])
    state = jax.lax.while_loop(
        lambda s: (~s.done) & (s.new_tokens < stop_at), body, state)
    return _surface_bonus(state)




@partial(jax.jit, static_argnums=(0,))
def qwen_prefill(st: Statics, params: Dict, ids: jnp.ndarray,
                 prompt_len: jnp.ndarray, img_feats: Optional[jnp.ndarray],
                 img_start: jnp.ndarray, pos3: Optional[jnp.ndarray],
                 pos_delta: jnp.ndarray, key: jnp.ndarray) -> EngineState:
    """Qwen2-VL prefill: inline image span + mrope positions.

    ids: [P_pad] already-expanded prompt (contains the <|image_pad|> span);
    pos3: [3, P_pad] mrope position ids (models/qwen2vl.mrope_positions) or
    None for text-only; pos_delta: max(grid_h, grid_w) - n_img (0 if no
    image). Statics.image_mode must be "inline".
    """
    assert st.image_mode == "inline"
    tcfg, dcfg = st.tcfg, st.dcfg
    n_img = st.n_img
    P_pad = ids.shape[0]
    cos_t, sin_t = params["cos_t"], params["sin_t"]
    tp, dp = params["target"], params["draft"]
    E0 = prompt_len

    has_image = n_img > 0 and img_feats is not None
    if has_image:
        from msd_tpu.models.qwen2vl import fuse_qwen_embeddings
        fused = fuse_qwen_embeddings(tp["embed_tokens"], ids, img_feats,
                                     img_start, n_img)
    else:
        fused = tp["embed_tokens"][jnp.maximum(ids, 0)]
    exp_ids = ids

    if pos3 is not None:
        from msd_tpu.models.qwen2vl import mrope_gather
        g_cos, g_sin = mrope_gather(cos_t, sin_t, pos3, st.mrope_section)
        # gathered-cos trick: tables ARE the per-token values, positions are
        # row indices
        eff_cos, eff_sin = g_cos, g_sin
        positions = jnp.arange(P_pad, dtype=jnp.int32)
    else:
        eff_cos, eff_sin = cos_t, sin_t
        positions = jnp.arange(P_pad, dtype=jnp.int32)

    bias = causal_prefill_bias(P_pad, st.s_target)
    target_kv = L.init_kv_cache(tcfg, st.s_target, fused.dtype)
    hidden, target_kv = L.llama_forward(tp, tcfg, fused, positions, target_kv,
                                        jnp.int32(0), bias, eff_cos, eff_sin)
    last_logits = L.lm_head(tp, hidden[E0 - 1][None])[0]
    key, sub = jax.random.split(key)
    bonus = sample_token(sub, last_logits, st.sp)

    # draft prefill: SE[j] = fused[j+1] for image-successor rows, else
    # draft embed of the next token (cnets.py:245-252, 315-323)
    j = jnp.arange(P_pad)
    exp_shift = jnp.concatenate([exp_ids[1:], jnp.zeros((1,), jnp.int32)])
    se = dp["embed_tokens"][jnp.maximum(exp_shift, 0)]
    if has_image:
        img_next = ((j + 1) >= img_start) & ((j + 1) < img_start + n_img)
        fused_shift = jnp.concatenate([fused[1:], jnp.zeros_like(fused[:1])])
        se = jnp.where(img_next[:, None], fused_shift, se)
    else:
        img_next = jnp.zeros((P_pad,), jnp.bool_)
    se = jnp.where((j == E0 - 1)[:, None], dp["embed_tokens"][bonus][None], se)

    dh_in = draft_mod.draft_fuse(dp, se, hidden, image_row_mask=img_next)
    d_bias = causal_prefill_bias(P_pad, st.s_draft)
    draft_kv = draft_mod.init_draft_kv(dcfg, st.s_draft, fused.dtype)
    need_attn = st.use_calibration or st.collect_calibration
    if need_attn:
        d_out, draft_kv, attn_p = draft_mod.draft_forward(
            dp, dcfg, dh_in, positions, draft_kv, jnp.int32(0), d_bias,
            eff_cos, eff_sin, return_attn=True)
        attn_feat = _attn_feature_vec(st, attn_p, img_start, jnp.int32(P_pad))
    else:
        d_out, draft_kv = draft_mod.draft_forward(dp, dcfg, dh_in, positions,
                                                  draft_kv, jnp.int32(0),
                                                  d_bias, eff_cos, eff_sin)
        attn_feat = jnp.zeros((st.tree.top_k,), jnp.float32)
    last_draft_hidden = d_out[E0 - 1]

    P = st.tree.max_path_len
    H = tcfg.hidden_size
    ids_buf = jnp.zeros((st.s_target,), jnp.int32)
    ids_buf = jax.lax.dynamic_update_slice(ids_buf, exp_ids, (0,))

    if st.collect_calibration:
        N, M = st.tree.num_nodes, st.max_new
        f32 = lambda: jnp.zeros((M, N), jnp.float32)  # noqa: E731
        i32 = lambda: jnp.zeros((M, N), jnp.int32)    # noqa: E731
        calib_log = {"token": i32(), "depth": i32(), "draft_conf": f32(),
                     "attn": f32(), "margin": f32(), "base_conf": f32(),
                     "base_top1": i32(), "base_margin": f32(),
                     "accept": i32(), "valid": i32()}
    else:
        calib_log = {}

    if st.collect_hiddens:
        traj_hidden = jax.lax.dynamic_update_slice(
            jnp.zeros((st.s_target, H), hidden.dtype), hidden, (0, 0))
    else:
        traj_hidden = jnp.zeros((0, 0), hidden.dtype)

    return EngineState(
        ids=ids_buf, cur_len=E0, bonus=bonus,
        suffix_tokens=jnp.zeros((P,), jnp.int32),
        suffix_hidden=jnp.zeros((P, H), hidden.dtype),
        suffix_len=jnp.int32(0),
        last_draft_hidden=last_draft_hidden,
        target_kv=target_kv, draft_kv=draft_kv, draft_len=E0,
        new_tokens=jnp.int32(0), steps=jnp.int32(0), acc_sum=jnp.int32(0),
        alpha_hist=jnp.zeros((16,), jnp.int32),
        done=jnp.bool_(False), key=key, img_pos=img_start,
        pos_delta=jnp.int32(pos_delta), attn_feat=attn_feat,
        calib_log=calib_log, traj_hidden=traj_hidden)



@partial(jax.jit, static_argnums=(0,))
def generate_program(st: Statics, params: Dict, ids: jnp.ndarray,
                     prompt_len: jnp.ndarray,
                     img_feats: Optional[jnp.ndarray], img_pos: jnp.ndarray,
                     key: jnp.ndarray,
                     bonus_override: Optional[jnp.ndarray] = None
                     ) -> EngineState:
    """prefill + decode fused into ONE program.

    Avoids the cross-program KV-cache handoff (XLA could not alias the
    donated caches between the separate prefill and decode executables,
    costing a full extra KV allocation at 7B image sizes)."""
    state = prefill.__wrapped__(st, params, ids, prompt_len, img_feats,
                                img_pos, key, bonus_override)
    return decode.__wrapped__(st, params, state)


@partial(jax.jit, static_argnums=(0,))
def qwen_generate_program(st: Statics, params: Dict, ids: jnp.ndarray,
                          prompt_len: jnp.ndarray,
                          img_feats: Optional[jnp.ndarray],
                          img_start: jnp.ndarray,
                          pos3: Optional[jnp.ndarray],
                          pos_delta: jnp.ndarray,
                          key: jnp.ndarray) -> EngineState:
    state = qwen_prefill.__wrapped__(st, params, ids, prompt_len, img_feats,
                                     img_start, pos3, pos_delta, key)
    return decode.__wrapped__(st, params, state)


# ---------------------------------------------------------------------------
# Autoregressive baseline (naivegenerate, ea_model.py:402-487)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnums=(0,))
def ar_prefill(st: Statics, params: Dict, ids: jnp.ndarray,
               prompt_len: jnp.ndarray, img_feats: Optional[jnp.ndarray],
               img_pos: jnp.ndarray, key: jnp.ndarray):
    tcfg = st.tcfg
    n_img = st.n_img if img_feats is not None else 0
    P_pad = ids.shape[0]
    P_exp = P_pad + max(n_img - 1, 0)
    cos_t, sin_t = params["cos_t"], params["sin_t"]
    tp = params["target"]
    E0 = prompt_len + max(n_img - 1, 0)

    if n_img > 0:
        fused = fuse_embeddings(tp["embed_tokens"], ids, img_feats, img_pos, P_exp)
        exp_ids = expand_ids(jnp.where(ids < 0, 0, ids), img_pos, n_img, P_exp)
    else:
        fused = tp["embed_tokens"][jnp.maximum(ids, 0)]
        exp_ids = ids

    positions = jnp.arange(P_exp, dtype=jnp.int32)
    bias = causal_prefill_bias(P_exp, st.s_target)
    target_kv = L.init_kv_cache(tcfg, st.s_target, fused.dtype)
    hidden, target_kv = L.llama_forward(tp, tcfg, fused, positions, target_kv,
                                        jnp.int32(0), bias, cos_t, sin_t)
    logits = L.lm_head(tp, hidden[E0 - 1][None])[0]
    key, sub = jax.random.split(key)
    tok = sample_token(sub, logits, st.sp)
    ids_buf = jnp.zeros((st.s_target,), jnp.int32)
    ids_buf = jax.lax.dynamic_update_slice(ids_buf, exp_ids[:P_exp], (0,))
    ids_buf = jax.lax.dynamic_update_slice(ids_buf, tok[None], (E0,))
    return ids_buf, target_kv, E0, tok, jnp.int32(0), key


@partial(jax.jit, static_argnums=(0,))
def ar_prefill_prefused(st: Statics, params: Dict, fused: jnp.ndarray,
                        exp_ids: jnp.ndarray, e0: jnp.ndarray,
                        key: jnp.ndarray):
    """AR prefill over host-prebuilt fused embeddings (multi-image/anyres)."""
    tcfg = st.tcfg
    tp = params["target"]
    cos_t, sin_t = params["cos_t"], params["sin_t"]
    P_exp = fused.shape[0]
    positions = jnp.arange(P_exp, dtype=jnp.int32)
    bias = causal_prefill_bias(P_exp, st.s_target)
    target_kv = L.init_kv_cache(tcfg, st.s_target, fused.dtype)
    hidden, target_kv = L.llama_forward(tp, tcfg, fused, positions, target_kv,
                                        jnp.int32(0), bias, cos_t, sin_t)
    logits = L.lm_head(tp, hidden[e0 - 1][None])[0]
    key, sub = jax.random.split(key)
    tok = sample_token(sub, logits, st.sp)
    ids_buf = jnp.zeros((st.s_target,), jnp.int32)
    ids_buf = jax.lax.dynamic_update_slice(ids_buf, exp_ids, (0,))
    ids_buf = jax.lax.dynamic_update_slice(ids_buf, tok[None], (e0,))
    return ids_buf, target_kv, e0, tok, jnp.int32(0), key


@partial(jax.jit, static_argnums=(0,))
def qwen_ar_prefill(st: Statics, params: Dict, ids: jnp.ndarray,
                    prompt_len: jnp.ndarray,
                    img_feats: Optional[jnp.ndarray],
                    img_start: jnp.ndarray, pos3: Optional[jnp.ndarray],
                    pos_delta: jnp.ndarray, key: jnp.ndarray):
    """AR prefill for inline-image (Qwen2-VL) prompts with mrope."""
    tcfg = st.tcfg
    n_img = st.n_img
    P_pad = ids.shape[0]
    cos_t, sin_t = params["cos_t"], params["sin_t"]
    tp = params["target"]
    E0 = prompt_len
    if n_img > 0 and img_feats is not None:
        from msd_tpu.models.qwen2vl import fuse_qwen_embeddings
        fused = fuse_qwen_embeddings(tp["embed_tokens"], ids, img_feats,
                                     img_start, n_img)
    else:
        fused = tp["embed_tokens"][jnp.maximum(ids, 0)]
    if pos3 is not None:
        from msd_tpu.models.qwen2vl import mrope_gather
        eff_cos, eff_sin = mrope_gather(cos_t, sin_t, pos3, st.mrope_section)
    else:
        eff_cos, eff_sin = cos_t, sin_t
    positions = jnp.arange(P_pad, dtype=jnp.int32)
    bias = causal_prefill_bias(P_pad, st.s_target)
    target_kv = L.init_kv_cache(tcfg, st.s_target, fused.dtype)
    hidden, target_kv = L.llama_forward(tp, tcfg, fused, positions, target_kv,
                                        jnp.int32(0), bias, eff_cos, eff_sin)
    logits = L.lm_head(tp, hidden[E0 - 1][None])[0]
    key, sub = jax.random.split(key)
    tok = sample_token(sub, logits, st.sp)
    ids_buf = jnp.zeros((st.s_target,), jnp.int32)
    ids_buf = jax.lax.dynamic_update_slice(ids_buf, ids, (0,))
    ids_buf = jax.lax.dynamic_update_slice(ids_buf, tok[None], (E0,))
    return ids_buf, target_kv, E0, tok, jnp.int32(pos_delta), key


@partial(jax.jit, static_argnums=(0,), donate_argnums=(2,))
def ar_decode_from_state(st: Statics, params: Dict, state: EngineState):
    """AR decode consuming the MSD ``prefill`` program's EngineState.

    Sharing ONE compiled prefill between the AR baseline and the MSD path
    makes their KV caches (and first token) bitwise identical — the two
    prefill executables otherwise round the bf16 KV values differently, and
    attention over hundreds of slightly-different keys yields ~1e-2 logit
    noise that flips near-tie greedy argmaxes (the residual AR-vs-MSD
    divergence after logit-grid canonicalization)."""
    ids_buf = jax.lax.dynamic_update_slice(state.ids, state.bonus[None],
                                           (state.cur_len,))
    carry = (ids_buf, state.target_kv, state.cur_len, state.bonus,
             state.pos_delta, state.key)
    return ar_decode.__wrapped__(st, params, carry)


@partial(jax.jit, static_argnums=(0,), donate_argnums=(2,))
def ar_decode(st: Statics, params: Dict, carry):
    """Plain AR decode while_loop with the same kernels as verification."""
    ids_buf, target_kv, E0, tok, pos_delta, key = carry
    cos_t, sin_t = params["cos_t"], params["sin_t"]
    tp = params["target"]
    kpos = jnp.arange(st.s_target)

    def cond(c):
        _, _, cur, _, _, done, _ = c
        return ~done

    def body(c):
        ids_buf, kv, cur, tok, n_new, done, key = c
        emb = tp["embed_tokens"][tok][None]
        win = None
        if st.eng.canonical_ar:
            # Opt-in canonical AR (EngineConfig.canonical_ar): the single
            # query row at logical position ``cur`` reduces through the SAME
            # split-softmax association as a verify node at that logical
            # position (_verify's window scheme) — its last W positions via
            # fixed window slots, everything below via the bias-masked cache
            # einsum. Measured on the v5e (r4): +0.2ms/tok and it does NOT
            # deliver cross-program bitwise identity (the T=1 AR and T=N
            # verify matmuls still accumulate bf16 in different orders), so
            # the default keeps fast-AR speed-optimal (pallas-eligible);
            # identity is guaranteed against canonical greedy AR instead —
            # the null-draft rerun of the same MSD executable (the reference
            # shares one torch kernel, eagle/model/utils.py:395-409).
            W = st.tree.max_path_len
            win_start = cur + 1 - W                       # window [cur-W+1, cur]
            l = win_start + jnp.arange(W, dtype=jnp.int32)
            win_idx = jnp.clip(l, 0, st.s_target - 1)[None, :]
            win_bias = jnp.where(l >= 0, 0.0, NEG_INF)[None, :].astype(
                jnp.float32)
            bias = jnp.where(kpos < win_start, 0.0,
                             NEG_INF)[None, :].astype(jnp.float32)
            win = (win_idx, win_bias, win_start[None])
        else:
            bias = jnp.where(kpos <= cur, 0.0,
                             NEG_INF)[None, :].astype(jnp.float32)
        hidden, kv = L.llama_forward(tp, st.tcfg, emb, (cur + pos_delta)[None],
                                     kv, cur, bias, cos_t, sin_t,
                                     kv_len=cur + 1, win=win)
        logits = L.lm_head(tp, hidden)[0]
        if (not st.sp.greedy) and st.sp.repetition_penalty != 1.0:
            from msd_tpu.ops.sampling import apply_repetition_penalty
            logits = apply_repetition_penalty(logits, ids_buf, cur + 1,
                                              st.sp.repetition_penalty)
        key, sub = jax.random.split(key)
        nxt = sample_token(sub, logits, st.sp)
        cur = cur + 1
        ids_buf = jax.lax.dynamic_update_slice(ids_buf, nxt[None], (cur,))
        n_new = n_new + 1
        done = (nxt == st.eos_id) | (n_new >= st.max_new) | \
            (cur >= st.eng.max_seq_len - 2)
        return (ids_buf, kv, cur, nxt, n_new, done, key)

    init = (ids_buf, target_kv, E0, tok, jnp.int32(1), jnp.bool_(False), key)
    ids_buf, target_kv, cur, tok, n_new, _, key = \
        jax.lax.while_loop(cond, body, init)
    return ids_buf, cur, n_new
