"""Unit tests for ops/attention.windowed_attention — the window-canonical
kernel behind EngineConfig.canonical_attn (end-to-end draft-invariance is
covered by tests/test_canonical_attn.py; here the kernel itself).

Properties checked:
1. Numerical equivalence to masked_attention on the same logical mask
   (different f32 association -> allclose, not bitwise).
2. Bitwise invariance to the PHYSICAL placement of window rows: permuting
   where the windowed rows live in the cache (updating win_idx to match)
   must not change a single bit of the output.
3. Bitwise invariance to the allocated cache length: growing S with junk
   rows (masked off) must not change the output.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from msd_tpu.ops.attention import NEG_INF, masked_attention, windowed_attention


def _mk(seed, t=5, s=48, w=4, hq=8, hkv=4, d=16, e=20):
    """Rows i attend to cache cols [0, e + depth_i] with the last w logical
    positions routed through window slots; depth_i = i (row i sits at
    logical position e + i, its ancestors are rows 0..i-1)."""
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(t, hq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(s, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(s, hkv, d)), jnp.float32)
    # physical rows of the "tree": rows e..e+t-1 hold logical e..e+t-1
    depth = np.arange(t)
    win_start = e + depth - (w - 1)                      # [T]
    l = win_start[:, None] + np.arange(w)[None, :]       # [T, W] logical col
    win_idx = np.clip(l, 0, s - 1).astype(np.int32)      # physical == logical here
    win_bias = np.where(l >= 0, 0.0, NEG_INF).astype(np.float32)
    cols = np.arange(s)[None, :]
    bias = np.where(cols < win_start[:, None], 0.0, NEG_INF).astype(np.float32)
    return (q, k, v, jnp.asarray(bias), jnp.asarray(win_idx),
            jnp.asarray(win_bias), jnp.asarray(win_start, jnp.int32),
            depth, e, w)


class TestWindowedAttention:
    def test_matches_masked_attention(self):
        q, k, v, bias, wi, wb, ws, depth, e, w = _mk(0)
        out = windowed_attention(q, k, v, bias, wi, wb, ws)
        # reference: full mask letting row i see logical cols 0..e+depth_i
        t, s = bias.shape
        cols = np.arange(s)[None, :]
        full = np.where(cols <= (e + depth)[:, None], 0.0, NEG_INF)
        ref = masked_attention(q, k, v, jnp.asarray(full, jnp.float32))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)

    def test_bitwise_invariant_to_physical_row_placement(self):
        # engine invariant: depth_i <= W-1 (max_path_len = max depth + 1),
        # so every TREE row (logical col >= e) has win_start_i <= e and is
        # invisible to every row's cache part — only window slots reach it.
        # Moving tree rows anywhere in the cache (and updating win_idx) must
        # therefore not change a bit. Committed rows stay at their logical
        # positions, exactly as _commit's compaction guarantees.
        q, k, v, bias, wi, wb, ws, depth, e, w = _mk(1, t=5, w=6)
        out1 = np.asarray(windowed_attention(q, k, v, bias, wi, wb, ws))
        s = k.shape[0]
        t = q.shape[0]
        moved = list(range(e, e + t))                    # tree rows only
        perm = np.arange(s)
        for j, c in enumerate(moved):
            dst = s - 1 - j                              # junk rows at the end
            perm[c], perm[dst] = perm[dst], perm[c]
        k2 = np.asarray(k)[np.argsort(perm)]
        v2 = np.asarray(v)[np.argsort(perm)]
        wi2 = jnp.asarray(perm[np.asarray(wi)], jnp.int32)
        out2 = np.asarray(windowed_attention(q, jnp.asarray(k2),
                                             jnp.asarray(v2), bias, wi2, wb,
                                             ws))
        np.testing.assert_array_equal(out1, out2)

    def test_bitwise_invariant_to_cache_length(self):
        q, k, v, bias, wi, wb, ws, depth, e, w = _mk(2)
        out1 = np.asarray(windowed_attention(q, k, v, bias, wi, wb, ws))
        # grow the cache with junk rows; bias masks them (cols >= win_start
        # were already NEG_INF, the new ones are too)
        s = k.shape[0]
        extra = 16
        rng = np.random.default_rng(99)
        kx = jnp.concatenate([k, jnp.asarray(
            rng.normal(size=(extra,) + k.shape[1:]), k.dtype)])
        vx = jnp.concatenate([v, jnp.asarray(
            rng.normal(size=(extra,) + v.shape[1:]), v.dtype)])
        biasx = jnp.concatenate(
            [bias, jnp.full((bias.shape[0], extra), NEG_INF, bias.dtype)],
            axis=1)
        out2 = np.asarray(windowed_attention(q, kx, vx, biasx, wi, wb, ws))
        np.testing.assert_array_equal(out1, out2)

    def test_gqa_groups(self):
        q, k, v, bias, wi, wb, ws, depth, e, w = _mk(3, hq=8, hkv=2)
        out = windowed_attention(q, k, v, bias, wi, wb, ws)
        t, s = bias.shape
        cols = np.arange(s)[None, :]
        full = np.where(cols <= (e + depth)[:, None], 0.0, NEG_INF)
        ref = masked_attention(q, k, v, jnp.asarray(full, jnp.float32))
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=2e-5, atol=2e-5)


class TestCompactGather:
    """compact=True (the engine's static fast path, models/llama.py
    attention dispatch): two-stage window gather over the [t + w]-row span
    that _commit's compaction maintains. Must be BITWISE equal to the
    general gather whenever the span assumption holds."""

    def test_bitwise_equals_general_gather(self):
        for seed in range(4):
            q, k, v, bias, wi, wb, ws, depth, e, w = _mk(seed)
            out_g = np.asarray(windowed_attention(q, k, v, bias, wi, wb, ws))
            out_c = np.asarray(windowed_attention(q, k, v, bias, wi, wb, ws,
                                                  compact=True))
            np.testing.assert_array_equal(out_g, out_c)

    def test_bitwise_small_e_dead_slots(self):
        # E < W: window slots below position 0 are dead (NEG_INF) and clip
        # their row index to 0; the compact span starts at 0 there.
        q, k, v, bias, wi, wb, ws, depth, e, w = _mk(7, t=4, w=6, e=2)
        out_g = np.asarray(windowed_attention(q, k, v, bias, wi, wb, ws))
        out_c = np.asarray(windowed_attention(q, k, v, bias, wi, wb, ws,
                                              compact=True))
        np.testing.assert_array_equal(out_g, out_c)

    def test_bitwise_span_at_cache_end(self):
        # tree block flush against the end of the cache: cbase clamps to
        # s - cw and local indices stay in range.
        t, w, s = 5, 4, 48
        q, k, v, bias, wi, wb, ws, depth, e, _ = _mk(9, t=t, w=w, s=s,
                                                     e=s - t)
        out_g = np.asarray(windowed_attention(q, k, v, bias, wi, wb, ws))
        out_c = np.asarray(windowed_attention(q, k, v, bias, wi, wb, ws,
                                              compact=True))
        np.testing.assert_array_equal(out_g, out_c)
