"""Device-side calibrated reranking: table lookup + adaptive alpha, pure jax.

Replaces the reference's in-loop pandas/numpy round trip
(cnets.py:1286-1344: DataFrame -> predict_proba -> logit bias ->
scatter_add_ -> re-softmax) with fixed-shape gathers that live inside the
jitted draft-expansion loop.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax.numpy as jnp

MAX_CALIB_LOGIT = 3.0
PROB_FLOOR = 1e-3


class CalibTables(NamedTuple):
    """Device-resident export of a fitted GroupedIsotonicCalibrator."""

    table: jnp.ndarray            # [3, 5, 2, 3, B] fp32
    attn_quantiles: jnp.ndarray   # [4]
    margin_quantiles: jnp.ndarray  # [2]
    global_mean: jnp.ndarray      # scalar
    vocab_class: jnp.ndarray      # [V] int32 token category table
    base_alpha: jnp.ndarray       # scalar fusion strength

    @staticmethod
    def from_host(export: Dict, vocab_class, base_alpha: float = 1.0
                  ) -> "CalibTables":
        import numpy as np
        return CalibTables(
            table=jnp.asarray(export["table"], jnp.float32),
            attn_quantiles=jnp.asarray(export["attn_quantiles"], jnp.float32),
            margin_quantiles=jnp.asarray(export["margin_quantiles"], jnp.float32),
            global_mean=jnp.asarray(export["global_mean"], jnp.float32),
            vocab_class=jnp.asarray(np.asarray(vocab_class), jnp.int32),
            base_alpha=jnp.asarray(base_alpha, jnp.float32),
        )


def _bin(x: jnp.ndarray, quantiles: jnp.ndarray) -> jnp.ndarray:
    """searchsorted(side='left'): count of quantiles strictly below x."""
    return jnp.sum(x[..., None] > quantiles, axis=-1).astype(jnp.int32)


def predict_proba(ct: CalibTables, token_ids: jnp.ndarray, conf: jnp.ndarray,
                  attn: jnp.ndarray, depth: jnp.ndarray,
                  margin: jnp.ndarray) -> jnp.ndarray:
    """Vectorized calibrated acceptance probability. All inputs same shape.

    conf: draft probability; attn: visual-attention intensity; depth: tree
    depth (1-based); margin: draft top1-top2 margin (per parent row).
    """
    t = ct.vocab_class[jnp.clip(token_ids, 0, ct.vocab_class.shape[0] - 1)]
    a = _bin(attn, ct.attn_quantiles)
    p = (depth > 2).astype(jnp.int32)
    m = _bin(margin, ct.margin_quantiles)

    B = ct.table.shape[-1]
    cc = jnp.clip(conf, 0.0, 1.0)
    pos = cc * (B - 1)
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, B - 2)
    frac = pos - lo
    v_lo = ct.table[t, a, p, m, lo]
    v_hi = ct.table[t, a, p, m, lo + 1]
    out = v_lo + frac * (v_hi - v_lo)

    valid = jnp.isfinite(conf) & (conf >= 0.0) & (conf <= 1.0)
    return jnp.where(valid, out, ct.global_mean)


def adaptive_alpha(ct: CalibTables, token_ids: jnp.ndarray, conf: jnp.ndarray,
                   attn: jnp.ndarray, depth: jnp.ndarray,
                   margin: jnp.ndarray) -> jnp.ndarray:
    """Per-candidate alpha (cnets.py:826-927 _compute_adaptive_alpha).

    Percentile normalization (10/90) is computed within the candidate batch,
    exactly as the reference normalizes within each layer's data_list.
    """
    def pctl_norm(x):
        lo = jnp.percentile(x, 10.0)
        hi = jnp.percentile(x, 90.0)
        hi = jnp.where(hi <= lo, jnp.max(x) + 1e-8, hi)
        lo = jnp.where(hi <= lo, jnp.min(x), lo)
        return jnp.clip((x - lo) / (hi - lo + 1e-8), 0.0, 1.0)

    margin_factor = 1.0 - pctl_norm(margin)
    depth_factor = jnp.clip(depth.astype(jnp.float32) / 6.0, 0.0, 1.0)
    attn_factor = 1.0 - pctl_norm(attn)

    t = ct.vocab_class[jnp.clip(token_ids, 0, ct.vocab_class.shape[0] - 1)]
    tok_boost = jnp.where(t == 2, 1.40, 1.00)  # 'number' boost

    combo = 0.2 * margin_factor + 0.4 * depth_factor + 0.4 * attn_factor
    combo = jnp.clip(jnp.clip(combo * tok_boost, 0.0, 1.2), 0.2, 0.8)
    return ct.base_alpha * combo


def calibration_bias(ct: CalibTables, token_ids: jnp.ndarray,
                     conf: jnp.ndarray, attn: jnp.ndarray,
                     depth: jnp.ndarray, margin: jnp.ndarray) -> jnp.ndarray:
    """alpha * clip(logit(p_cal), +-3) — the additive logit correction
    (cnets.py:1294-1321)."""
    p = jnp.clip(predict_proba(ct, token_ids, conf, attn, depth, margin),
                 PROB_FLOOR, 1.0 - PROB_FLOOR)
    logit = jnp.log(p) - jnp.log1p(-p)
    logit = jnp.clip(logit, -MAX_CALIB_LOGIT, MAX_CALIB_LOGIT)
    alpha = adaptive_alpha(ct, token_ids, conf, attn, depth, margin)
    return alpha * logit
