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
                       win_bias: jnp.ndarray, win_start: jnp.ndarray
                       ) -> jnp.ndarray:
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
    (= E + depth_i - W + 1; may be negative).
    """
    t, hq, d = q.shape
    s, hkv, _ = k.shape
    w = win_idx.shape[1]
    group = hq // hkv
    scale = 1.0 / (d ** 0.5)
    qg = q.reshape(t, hkv, group, d)

    sc_c = jnp.einsum("thgd,shd->hgts", qg, k,
                      preferred_element_type=jnp.float32) * scale
    sc_c = sc_c + bias.astype(jnp.float32)[None, None, :, :]

    kw = jnp.take(k, win_idx, axis=0)            # [T, W, Hkv, D]
    vw = jnp.take(v, win_idx, axis=0)
    sc_w = jnp.einsum("thgd,twhd->hgtw", qg, kw,
                      preferred_element_type=jnp.float32) * scale
    sc_w = sc_w + win_bias.astype(jnp.float32)[None, None, :, :]

    # assemble: column c of row i shows the window score at slot
    # c - win_start[i] when that slot exists, else the (masked) cache score
    cols = jnp.arange(s)[None, :]                # [1, S]
    slot = cols - win_start[:, None]             # [T, S]
    in_win = (slot >= 0) & (slot < w)
    slot_c = jnp.clip(slot, 0, w - 1)
    scw_full = jnp.take_along_axis(
        sc_w, jnp.broadcast_to(slot_c, (hkv, group, t, s)), axis=-1)
    scores = jnp.where(in_win[None, None, :, :], scw_full, sc_c)

    probs = jax.nn.softmax(scores, axis=-1)      # [Hkv, G, T, S] fp32
    # cache part: columns strictly below the window (exact-zero elsewhere)
    p_c = jnp.where((slot < 0)[None, None, :, :], probs, 0.0)
    # window part: gather probs back at the window's canonical columns
    cols_w = win_start[:, None] + jnp.arange(w)[None, :]       # [T, W]
    p_w = jnp.take_along_axis(
        probs, jnp.broadcast_to(jnp.clip(cols_w, 0, s - 1),
                                (hkv, group, t, w)), axis=-1)
    p_w = jnp.where((cols_w >= 0)[None, None, :, :], p_w, 0.0)

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
