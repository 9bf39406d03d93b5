"""Device-side draft-tree construction and verification primitives.

This replaces the reference's Python tree bookkeeping
(EAGLE/eagle/model/cnets.py:1429-1513 — per-node Python loops, .item() syncs)
with fixed-shape XLA ops:

- OPT-Tree selection state lives in [MAX_DEPTH, TOP_K] matrices
  (path weight / token / parent), filled by the drafting loop.
- ``finalize_tree`` picks the global top-``num_draft`` nodes, reconstructs
  parent pointers with a scatter/gather table (valid because a child's path
  weight never exceeds its parent's, so parents are always selected with it;
  depth-major flattening makes jax.lax.top_k's lowest-index tie-break pick
  parents first on exact ties).
- The ancestor mask is built by parent-pointer propagation over
  topologically-ordered nodes, positions are mask row-sums, and retrieve
  paths are parent walks — all ``fori_loop``s over the fixed node budget.
- Greedy verification is the cumprod-of-matches trick
  (utils.py:395-409) on per-node argmax ids — no [paths, depth, vocab]
  materialization.
- Sampling verification follows utils.py:411-450: walk depths, try distinct
  children of the accepted node in tree order, accept with prob p_target(x),
  zero-and-renormalize the residual on rejection (lossless speculative
  sampling), as a fori_loop carried over the residual distribution.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from msd_tpu.configs import TreeConfig

NEG = -1.0  # dead-slot weight: valid path weights are probabilities > 0


class Tree(NamedTuple):
    tokens: jnp.ndarray       # [N] int32, tokens[0] = root (already-sampled) token; -1 = dead
    parents: jnp.ndarray      # [N] int32 parent pointer into tree order (root=0)
    mask: jnp.ndarray         # [N, N] bool, mask[i, j] = node i attends node j (ancestors+self)
    positions: jnp.ndarray    # [N] int32 depth of node (root=0)
    retrieve: jnp.ndarray     # [N, MAX_PATH] int32 root->node path, -1 padded
    valid: jnp.ndarray        # [N] bool
    # bookkeeping for calibration features
    node_depth: jnp.ndarray   # [N] int32 == positions
    node_weight: jnp.ndarray  # [N] f32 OPT-Tree path weight (prob space)
    extras: dict              # optional per-node f32 features gathered from
    #                           [MAX_DEPTH, TOP_K] matrices (root slot = 0.0)


def finalize_tree(cfg: TreeConfig, root_token: jnp.ndarray,
                  weight_mat: jnp.ndarray, token_mat: jnp.ndarray,
                  parent_mat: jnp.ndarray, use_depth: jnp.ndarray,
                  extra_mats: dict | None = None) -> Tree:
    """Select top-``num_draft`` of the explored frontier and pack the tree.

    weight_mat/token_mat/parent_mat: [MAX_DEPTH, TOP_K]; use_depth: scalar —
    layers >= use_depth are masked out (early stop discards the newest layer,
    mirroring cnets.py:1429-1437 slicing weight_matrix[:final_depth]).
    """
    D, K = cfg.max_depth, cfg.top_k
    N = cfg.num_nodes
    n_draft = cfg.num_draft

    depth_idx = jnp.arange(D)[:, None]
    flat_w = jnp.where(depth_idx < use_depth, weight_mat, NEG).reshape(-1)

    # global top-n_draft. depth-major flatten => ties resolved toward parents.
    # budget may exceed the explored frontier (num_nodes > depth*top_k, as
    # with the reference's nodes=500 kwarg) — dead-pad the difference.
    n_sel = min(n_draft, D * K)
    top_w, top_pos = jax.lax.top_k(flat_w, n_sel)
    if n_sel < n_draft:
        top_w = jnp.concatenate(
            [top_w, jnp.full((n_draft - n_sel,), NEG, top_w.dtype)])
        top_pos = jnp.concatenate(
            [top_pos, jnp.zeros((n_draft - n_sel,), top_pos.dtype)])
    sel_layer = top_pos // K
    sel_node = top_pos % K
    sel_valid = top_w > 0.0

    # topological order: stable sort by depth (dead slots pushed to the end)
    order = jnp.argsort(jnp.where(sel_valid, sel_layer, D + 1), stable=True)
    sel_layer = sel_layer[order]
    sel_node = sel_node[order]
    sel_valid = sel_valid[order]
    sel_w = top_w[order]

    tokens = jnp.concatenate([
        root_token[None].astype(jnp.int32),
        jnp.where(sel_valid, token_mat[sel_layer, sel_node], -1).astype(jnp.int32),
    ])

    # position-of table: (layer, node) -> tree index (1-based after root).
    # Dead-pad entries (budget > explored frontier) must NOT scatter: their
    # (layer, node) is (0, 0), which would overwrite the REAL tree index of
    # layer-0 slot 0 — the top depth-1 candidate — re-parenting its whole
    # subtree onto the root and capping acceptance at 1 draft token whenever
    # num_nodes - 1 > max_depth * top_k. Route them out of bounds instead.
    pos_of = jnp.full((D, K), 0, jnp.int32)
    tree_idx = jnp.arange(1, N, dtype=jnp.int32)
    scat_layer = jnp.where(sel_valid, sel_layer, D)  # D -> dropped
    pos_of = pos_of.at[scat_layer, sel_node].set(tree_idx, mode="drop")

    par_node = parent_mat[sel_layer, sel_node]
    par_ptr = jnp.where(sel_layer == 0, 0,
                        pos_of[jnp.maximum(sel_layer - 1, 0), par_node])
    par_ptr = jnp.where(sel_valid, par_ptr, 0)
    parents = jnp.concatenate([jnp.zeros((1,), jnp.int32), par_ptr.astype(jnp.int32)])

    # ancestor mask by doubling: A_{2k} = A_k @ A_k over the parent one-hot
    # relation (+ identity). log2(max_depth) boolean matmuls instead of N
    # sequential row updates — the Python-loop bookkeeping the reference does
    # per node (cnets.py:1476-1484) becomes 4-5 MXU ops.
    node_idx = jnp.arange(N)
    parent_onehot = (parents[:, None] == node_idx[None, :]) & (node_idx[:, None] > 0)
    reach = parent_onehot.astype(jnp.float32) + jnp.eye(N, dtype=jnp.float32)
    hops = max(1, (cfg.max_depth).bit_length())
    for _ in range(hops):
        reach = jnp.minimum(reach @ reach, 1.0)
    mask = reach > 0.0
    positions = jnp.sum(mask, axis=1).astype(jnp.int32) - 1

    # retrieve paths from the ancestor mask: slot d of row i holds i's
    # ancestor at depth d — a one-hot-by-depth matmul, no sequential walk.
    P = cfg.max_path_len
    depth_onehot = (positions[:, None] ==
                    jnp.arange(P)[None, :]).astype(jnp.float32)  # [N, P]
    maskf = mask.astype(jnp.float32)
    count = maskf @ depth_onehot                                  # [N, P]
    val = maskf @ (depth_onehot * node_idx[:, None].astype(jnp.float32))
    retrieve = jnp.where(count > 0, val, -1.0).astype(jnp.int32)

    valid = jnp.concatenate([jnp.ones((1,), jnp.bool_), sel_valid])
    node_w = jnp.concatenate([jnp.ones((1,), jnp.float32),
                              jnp.where(sel_valid, sel_w, 0.0)])
    extras = {}
    if extra_mats:
        for name, mat in extra_mats.items():
            vals = jnp.where(sel_valid, mat[sel_layer, sel_node].astype(jnp.float32), 0.0)
            extras[name] = jnp.concatenate([jnp.zeros((1,), jnp.float32), vals])
    return Tree(tokens=tokens, parents=parents, mask=mask, positions=positions,
                retrieve=retrieve, valid=valid, node_depth=positions,
                node_weight=node_w, extras=extras)


# ---------------------------------------------------------------------------
# Verification
# ---------------------------------------------------------------------------

def evaluate_greedy(tree: Tree, tree_logits: jnp.ndarray
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy (temperature 0) acceptance. tree_logits: [N, V] target logits.

    Returns (best_row, accept_len, next_token). Lossless by construction: a
    draft token at path slot j+1 is accepted iff it equals argmax of the
    target logits at slot j (utils.py:395-409), so the committed sequence is
    exactly the target's greedy continuation.
    """
    argmax_tok = jnp.argmax(tree_logits, axis=-1).astype(jnp.int32)  # [N]
    retrieve = tree.retrieve                                         # [R, P]
    r_clamped = jnp.maximum(retrieve, 0)
    cand = jnp.where(retrieve >= 0, tree.tokens[r_clamped], -1)      # [R, P]
    pred = argmax_tok[r_clamped]                                     # [R, P]

    match = (cand[:, 1:] == pred[:, :-1]) & (cand[:, 1:] >= 0)
    accept_lens = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
    accept_len = jnp.max(accept_lens)
    best = jnp.where(accept_len == 0, 0, jnp.argmax(accept_lens)).astype(jnp.int32)
    bonus_node = retrieve[best, accept_len]
    next_token = argmax_tok[jnp.maximum(bonus_node, 0)]
    return best, accept_len, next_token


def evaluate_sampling(tree: Tree, tree_probs: jnp.ndarray, key: jnp.ndarray,
                      top_k: int = 10
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Speculative-sampling acceptance (temperature > 0); lossless.

    tree_probs: [N, V] processed target distributions per tree node.
    Walks depths from the root; at the current accepted node, tries its
    distinct children in tree order, accepting child token x with probability
    residual[x] and zeroing/renormalizing the residual on rejection
    (utils.py:411-450 with q(x)=1 for deterministic top-k drafts).
    Returns (best_node, accept_len, next_token sampled from final residual).
    """
    N, V = tree_probs.shape

    # The drafting frontier caps children per node at top_k; iterating all N
    # nodes per depth serialized 128 tiny steps. Instead gather each depth's
    # children of the current node (ascending tree order, matching the
    # reference's sorted-row visit order) and loop over those. The gather
    # width tracks the configured frontier width so no drafted child is ever
    # skipped (a skipped child cannot bias the distribution — its mass stays
    # in the residual — but it would forfeit acceptances).
    K = min(N - 1, max(16, top_k))

    def depth_step(carry, _):
        cur, acc_len, residual, alive, key = carry

        node_idx = jnp.arange(N)
        is_child = (tree.parents == cur) & tree.valid & (tree.tokens >= 0) \
            & (node_idx > 0)
        # indices of the first K children in ascending node order
        order_key = jnp.where(is_child, node_idx, N)
        child_ids = jnp.sort(order_key)[:K]                 # [K], N = none

        def child_step(i, c):
            cur_c, acc_c, res, alive_c, key_c, advanced = c
            j = child_ids[i]
            valid_child = (j < N) & alive_c & (~advanced)
            tok = tree.tokens[jnp.minimum(j, N - 1)]
            p_tok = res[jnp.maximum(tok, 0)]
            key_c, sub = jax.random.split(key_c)
            r = jax.random.uniform(sub)
            accept = valid_child & (r <= p_tok)
            reject = valid_child & (r > p_tok)
            # on rejection: zero the token's mass and renormalize
            res_zero = res.at[jnp.maximum(tok, 0)].set(0.0)
            res_zero = res_zero / jnp.maximum(jnp.sum(res_zero), 1e-20)
            res = jnp.where(reject, res_zero, res)
            cur_c = jnp.where(accept, j, cur_c)
            acc_c = jnp.where(accept, acc_c + 1, acc_c)
            advanced = advanced | accept
            return (cur_c, acc_c, res, alive_c, key_c, advanced)

        cur2, acc2, res2, alive2, key2, advanced = jax.lax.fori_loop(
            0, K, child_step,
            (cur, acc_len, residual, alive, key, jnp.bool_(False)))
        # if we advanced, the residual for the NEXT depth is the new node's dist
        res_next = jnp.where(advanced, tree_probs[cur2], res2)
        alive_next = alive2 & advanced
        return (cur2, acc2, res_next, alive_next, key2), None

    residual0 = tree_probs[0]
    (cur, acc_len, residual, _, key), _ = jax.lax.scan(
        depth_step, (jnp.int32(0), jnp.int32(0), residual0, jnp.bool_(True), key),
        None, length=tree.retrieve.shape[1] - 1)

    next_token = jax.random.categorical(key, jnp.log(jnp.maximum(residual, 1e-20)))
    return cur, acc_len, next_token.astype(jnp.int32)


def accepted_path(tree: Tree, best_node: jnp.ndarray) -> jnp.ndarray:
    """Retrieve row for a node index: [MAX_PATH] tree indices, -1 padded."""
    return tree.retrieve[best_node]
