"""Teacher-forced scoring programs for ``loglikelihood`` requests.

Rebuilds the reference's context/continuation scoring
(lmms-eval/lmms_eval/models/llava_msd_calibrated.py:231-305 — one causal
forward over [context + continuation] with the context labels masked out)
against the abstract surface at lmms-eval/lmms_eval/api/model.py:29-54:
loglikelihood returns (sum log-prob of the continuation, is_greedy).

TPU shape: one jitted forward per prompt-length bucket; the continuation
window is selected by traced index arithmetic so every (ctx, cont) pair of
the same padded length shares a compile. The per-row log-prob is computed as
``logit[next] - logsumexp(logits)`` so the [T, V] log-softmax is never
materialized beyond the fp32 logits XLA already fuses.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from msd_tpu.configs import LlamaConfig
from msd_tpu.models import llama as L
from msd_tpu.models.llava import expand_ids, fuse_embeddings
from msd_tpu.ops.attention import causal_prefill_bias


def _score_rows(tp: Dict, exp_ids: jnp.ndarray, hidden: jnp.ndarray,
                cont_first: jnp.ndarray, cont_end: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Sum log p(token) and greedy-match over rows [cont_first-1, cont_end-1).

    exp_ids: [T] expanded token ids; hidden: [T, H] final hidden states;
    row r predicts the token at r+1.
    """
    logits = L.lm_head(tp, hidden)                       # [T, V] fp32
    next_ids = jnp.concatenate([exp_ids[1:], jnp.zeros((1,), jnp.int32)])
    lse = jax.scipy.special.logsumexp(logits, axis=-1)   # [T]
    tok_lp = jnp.take_along_axis(logits, next_ids[:, None], axis=-1)[:, 0] - lse
    greedy = jnp.argmax(logits, axis=-1) == next_ids     # [T]
    rows = jnp.arange(exp_ids.shape[0], dtype=jnp.int32)
    mask = (rows >= cont_first - 1) & (rows < cont_end - 1)
    lp_sum = jnp.sum(jnp.where(mask, tok_lp, 0.0))
    n_match = jnp.sum(jnp.where(mask & greedy, 1, 0))
    n_cont = jnp.sum(jnp.where(mask, 1, 0))
    return lp_sum, n_match, n_cont


@partial(jax.jit, static_argnums=(0, 1))
def score_program(tcfg: LlamaConfig, n_img: int, params: Dict,
                  ids: jnp.ndarray, total_len: jnp.ndarray,
                  cont_start: jnp.ndarray,
                  img_feats: Optional[jnp.ndarray], img_pos: jnp.ndarray
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """LLaVA-style (image-token expansion) scoring forward.

    ids: [P_pad] unexpanded (IMAGE_TOKEN_INDEX at img_pos when the request
    has an image); total_len: prompt+continuation length (unexpanded);
    cont_start: index of the first continuation token (unexpanded). The
    image always sits in the context, so both indices shift by the same
    expansion offset. Returns (logprob_sum, n_greedy_match, n_cont).
    """
    tp = params["target"]
    cos_t, sin_t = params["cos_t"], params["sin_t"]
    n_img_eff = n_img if img_feats is not None else 0
    P_pad = ids.shape[0]
    P_exp = P_pad + max(n_img_eff - 1, 0)
    off = max(n_img_eff - 1, 0)

    if n_img_eff > 0:
        fused = fuse_embeddings(tp["embed_tokens"], ids, img_feats, img_pos,
                                P_exp)
        exp_ids = expand_ids(jnp.where(ids < 0, 0, ids), img_pos, n_img_eff,
                             P_exp)
    else:
        fused = tp["embed_tokens"][jnp.maximum(ids, 0)]
        exp_ids = ids

    positions = jnp.arange(P_exp, dtype=jnp.int32)
    bias = causal_prefill_bias(P_exp, P_exp)
    kv = L.init_kv_cache(tcfg, P_exp, fused.dtype)
    hidden, _ = L.llama_forward(tp, tcfg, fused, positions, kv, jnp.int32(0),
                                bias, cos_t, sin_t)
    return _score_rows(tp, exp_ids, hidden, cont_start + off,
                       total_len + off)


@partial(jax.jit, static_argnums=(0, 1, 2))
def qwen_score_program(tcfg: LlamaConfig, n_img: int, mrope_section,
                       params: Dict, ids: jnp.ndarray,
                       total_len: jnp.ndarray, cont_start: jnp.ndarray,
                       img_feats: Optional[jnp.ndarray],
                       img_start: jnp.ndarray,
                       pos3: Optional[jnp.ndarray]
                       ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Qwen2-VL (inline image span + mrope) scoring forward.

    ids: [P_pad] already-expanded prompt+continuation; pos3: [3, P_pad]
    mrope positions or None for text-only.
    """
    tp = params["target"]
    cos_t, sin_t = params["cos_t"], params["sin_t"]
    P_pad = ids.shape[0]

    if n_img > 0 and img_feats is not None:
        from msd_tpu.models.qwen2vl import fuse_qwen_embeddings
        fused = fuse_qwen_embeddings(tp["embed_tokens"], ids, img_feats,
                                     img_start, n_img)
    else:
        fused = tp["embed_tokens"][jnp.maximum(ids, 0)]

    if pos3 is not None:
        from msd_tpu.models.qwen2vl import mrope_gather
        eff_cos, eff_sin = mrope_gather(cos_t, sin_t, pos3, mrope_section)
    else:
        eff_cos, eff_sin = cos_t, sin_t
    positions = jnp.arange(P_pad, dtype=jnp.int32)
    bias = causal_prefill_bias(P_pad, P_pad)
    kv = L.init_kv_cache(tcfg, P_pad, fused.dtype)
    hidden, _ = L.llama_forward(tp, tcfg, fused, positions, kv, jnp.int32(0),
                                bias, eff_cos, eff_sin)
    return _score_rows(tp, ids, hidden, cont_start, total_len)
