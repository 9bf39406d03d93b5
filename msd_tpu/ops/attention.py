"""Attention over a preallocated KV cache with an additive bias mask.

One attention routine serves prefill, AR decode, tree verification, and the
draft frontier expansion — only the bias differs. The reference instead forks
behavior through HF attention + a tree_mask side channel
(EAGLE/eagle/model/modeling_llama_kv.py:587-594, 915-921); here the mask is an
explicit argument, which is both jit-friendly and what makes greedy
AR-vs-speculative bit-parity possible (same kernel, same reduction order).

Layout choices for TPU: the KV cache is seq-major [S, Hkv, D] with D=128
(lane dim), so newly-projected K/V rows [T, Hkv, D] are written with a plain
dynamic_update_slice — no transposes on the matmul outputs (transposed
outputs made XLA relayout the 1GB stacked q/k/v weight arrays into HLO-temp
copies at 7B scale). Scores accumulate in fp32 on the MXU
(preferred_element_type), softmax in fp32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30  # finite large-negative: avoids NaN from (-inf) - (-inf) rows


def masked_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     bias: jnp.ndarray) -> jnp.ndarray:
    """q: [T, Hq, D]; k, v: [S, Hkv, D]; bias: [T, S] additive (0 or NEG_INF).

    Supports GQA (Hq a multiple of Hkv). Returns [T, Hq, D] in q.dtype.
    """
    t, hq, d = q.shape
    s, hkv, _ = k.shape
    group = hq // hkv
    scale = 1.0 / (d ** 0.5)

    qg = q.reshape(t, hkv, group, d)
    # scores: [Hkv, G, T, S] accumulated in fp32
    scores = jnp.einsum("thgd,shd->hgts", qg, k,
                        preferred_element_type=jnp.float32) * scale
    scores = scores + bias.astype(jnp.float32)[None, None, :, :]
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("hgts,shd->thgd", probs.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.reshape(t, hq, d).astype(q.dtype)


def windowed_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                       bias: jnp.ndarray, win_idx: jnp.ndarray,
                       win_bias: jnp.ndarray, win_start: jnp.ndarray,
                       compact: bool = False) -> jnp.ndarray:
    """Window-canonical attention: bitwise layout-invariant tree verification.

    Per query row i, the last W logical positions (its tree ancestors + self +
    the tail of the committed prefix, wherever those rows physically live) are
    gathered into fixed window slots and reduced by a dedicated einsum; the
    cache einsum is masked to columns strictly below the window. The floating-
    point association of every reduction then depends only on the row's
    LOGICAL prefix (length E + depth_i), not on which step boundary or tree
    slot the ancestors happened to occupy — so a committed greedy trajectory
    is bitwise invariant to the draft that proposed it (see DESIGN.md
    "Canonical tree attention"; the reference has no analog — its GPU kernels
    are shared between paths, eagle/model/modeling_llama_kv.py:915-921).

    q: [T, Hq, D]; k, v: [S, Hkv, D] (cache with tree rows already written).
    bias: [T, S] additive, must mask every column >= win_start[i].
    win_idx: [T, W] int32 cache row per window slot (clipped in-range).
    win_bias: [T, W] additive (NEG_INF for slots below position 0 / dead).
    win_start: [T] int32 — column where window slot 0 logically sits
    (= E + depth_i - W + 1; may be negative). Unused by the reduction (the
    caller's bias already encodes it); kept for diagnostics/API stability.

    The two-part softmax is canonical without any scatter/gather assembly:
    the running max is associativity-exact, exp of the NEG_INF mask
    underflows to an exact zero (adding it never perturbs a float), and the
    denominator's fixed cache-sum + window-sum split is itself a pure
    function of the logical prefix — so every term depends only on
    (tokens, logical positions).
    """
    del win_start
    t, hq, d = q.shape
    s, hkv, _ = k.shape
    group = hq // hkv
    scale = 1.0 / (d ** 0.5)
    qg = q.reshape(t, hkv, group, d)

    # cache part: columns strictly below the window (bias masks the rest)
    sc_c = jnp.einsum("thgd,shd->hgts", qg, k,
                      preferred_element_type=jnp.float32) * scale
    sc_c = sc_c + bias.astype(jnp.float32)[None, None, :, :]

    # window part: the last W logical positions at fixed depth-indexed slots.
    # compact=True (static; the engine's verify path): every window row
    # lives inside one [t + w]-row span of the cache (committed tail
    # [E-W+1, E) + the tree block [E, E+T) that _commit's compaction
    # maintains), so slice that span once (contiguous HBM read) and take
    # rows from the small block instead of gathering from the full [S]
    # cache. Bitwise identical — the same rows feed the same einsums —
    # measured 1.8x faster per layer standalone (tools/win_gather_bench.py,
    # artifacts/win_gather_r3.log). Dead slots (win_bias = NEG_INF) may
    # gather garbage rows; exp underflows them to exact zeros so the values
    # never matter. compact=False keeps the general contract: arbitrary row
    # placement (rows outside any [t + w] span), same values, same bits.
    if compact:
        w = win_idx.shape[1]
        cw = min(s, t + w)
        cbase = jnp.clip(jnp.min(win_idx), 0, s - cw)
        loc = jnp.clip(win_idx - cbase, 0, cw - 1)
        kc = jax.lax.dynamic_slice_in_dim(k, cbase, cw, axis=0)
        vc = jax.lax.dynamic_slice_in_dim(v, cbase, cw, axis=0)
        kw = jnp.take(kc, loc, axis=0)           # [T, W, Hkv, D]
        vw = jnp.take(vc, loc, axis=0)
    else:
        kw = jnp.take(k, win_idx, axis=0)        # [T, W, Hkv, D]
        vw = jnp.take(v, win_idx, axis=0)
    sc_w = jnp.einsum("thgd,twhd->hgtw", qg, kw,
                      preferred_element_type=jnp.float32) * scale
    sc_w = sc_w + win_bias.astype(jnp.float32)[None, None, :, :]

    m = jnp.maximum(jnp.max(sc_c, axis=-1), jnp.max(sc_w, axis=-1))
    m = jax.lax.stop_gradient(jnp.maximum(m, NEG_INF))[..., None]
    e_c = jnp.exp(sc_c - m)                      # exact 0 at masked columns
    e_w = jnp.exp(sc_w - m)
    denom = jnp.sum(e_c, axis=-1) + jnp.sum(e_w, axis=-1)
    p_c = e_c / denom[..., None]
    p_w = e_w / denom[..., None]

    out = jnp.einsum("hgts,shd->thgd", p_c.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    out = out + jnp.einsum("hgtw,twhd->thgd", p_w.astype(v.dtype), vw,
                           preferred_element_type=jnp.float32)
    return out.reshape(t, hq, d).astype(q.dtype)


def attention_probs(q: jnp.ndarray, k: jnp.ndarray, bias: jnp.ndarray) -> jnp.ndarray:
    """Softmax attention probabilities (no value matmul): [Hq, T, S] fp32.

    Used by the calibration feature path (visual-attention intensity over the
    image-token span; reference cnets.py:516-575 reads draft-layer attentions).
    """
    t, hq, d = q.shape
    s, hkv, _ = k.shape
    group = hq // hkv
    scale = 1.0 / (d ** 0.5)
    qg = q.reshape(t, hkv, group, d)
    scores = jnp.einsum("thgd,shd->hgts", qg, k,
                        preferred_element_type=jnp.float32) * scale
    scores = scores + bias.astype(jnp.float32)[None, None, :, :]
    return jax.nn.softmax(scores, axis=-1).reshape(hq, t, s)


def length_mask_bias(positions_k: jnp.ndarray, valid_len: jnp.ndarray,
                     num_q: int) -> jnp.ndarray:
    """Bias [num_q, S] admitting keys with index < valid_len (decode over prefix)."""
    keep = positions_k < valid_len
    return jnp.where(keep[None, :], 0.0, NEG_INF) * jnp.ones((num_q, 1), jnp.float32)


def causal_prefill_bias(seq_len: int, cache_len: int, start: int = 0) -> jnp.ndarray:
    """Bias [seq_len, cache_len] for a prefill written at [start, start+seq_len)."""
    qpos = start + jnp.arange(seq_len)[:, None]
    kpos = jnp.arange(cache_len)[None, :]
    return jnp.where(kpos <= qpos, 0.0, NEG_INF).astype(jnp.float32)


def tree_bias(tree_mask: jnp.ndarray, prefix_len: jnp.ndarray,
              cache_len: int) -> jnp.ndarray:
    """Bias [N, cache_len] for tree verification.

    Key j is visible to tree node i iff j < prefix_len (committed prefix) or
    j in [prefix_len, prefix_len+N) and tree_mask[i, j-prefix_len] (ancestor).
    tree_mask: [N, N] bool ancestor matrix (i attends to j), written into the
    cache at offset prefix_len. Mirrors modeling_llama_kv.py:915-921 where the
    tree block overlays the last NxN of the causal mask.
    """
    n = tree_mask.shape[0]
    kpos = jnp.arange(cache_len)[None, :]                      # [1, S]
    in_prefix = kpos < prefix_len                              # [1, S]
    rel = kpos - prefix_len                                    # [1, S]
    rel_clamped = jnp.clip(rel, 0, n - 1)
    tree_vis = jnp.take_along_axis(
        tree_mask, jnp.broadcast_to(rel_clamped, (n, cache_len)), axis=1)
    in_tree = (rel >= 0) & (rel < n) & tree_vis
    keep = in_prefix | in_tree
    return jnp.where(keep, 0.0, NEG_INF).astype(jnp.float32)
