"""Draft-head training: the TPU-native analog of
EAGLE/eagle/train/main_deepspeed.py.

Reference recipe (main_deepspeed.py:98-126 train_config, :317-330 losses,
:193-247 dataset shift, :71-80 noise):
- rows pair (emb of token t_{j+1}, target hidden h_j) -> predict h_{j+1}
- vloss = SmoothL1(predict, h_{j+1}), masked mean; ploss = soft cross-entropy
  between softmax(head(h_{j+1})) and log_softmax(head(predict)), masked
- total = v_w * vloss + p_w * ploss  (v_w=1.0, p_w=0.1)
- uniform noise on the input hidden states: (U-0.5) * std * 512 / hidden
- AdamW(b1=0.9, b2=0.95), grad clip 0.5, linear warmup
- text -> visual curriculum over epochs (``curriculum_visual_ratio``)

DeepSpeed ZeRO is replaced by sharding: the train step is jitted over a
(data, model) mesh — batch over 'data', draft layer weights tensor-parallel
over 'model', optimizer state sharded like the params (ZeRO-equivalent).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from msd_tpu.configs import DraftConfig
from msd_tpu.models import draft as draft_mod
from msd_tpu.ops.attention import NEG_INF


@dataclass(frozen=True)
class TrainConfig:
    v_w: float = 1.0
    p_w: float = 0.1
    lr: float = 2e-4
    b1: float = 0.9
    b2: float = 0.95
    grad_clip: float = 0.5
    warmup_steps: int = 2000
    total_steps: int = 800_000
    noise_std: float = 0.2
    # relative (per-element multiplicative) input noise: h *= 1 + U(-r/2, r/2).
    # Unlike the reference's absolute noise (which is negligible against
    # late-layer hidden magnitudes), this matches the statistics of bf16
    # rounding (eps 2^-8 ~= 0.004) at ANY activation scale — the perturbation
    # the draft actually sees at serve time.
    noise_rel: float = 0.0
    weight_decay: float = 0.0
    # train_embed=False freezes embed_tokens (reference default,
    # cnets.py:130-132) and skips its optimizer state
    train_embed: bool = False
    # Rollout-augmented distillation (beyond the reference): extra forward
    # passes whose input hidden states are the draft's OWN (stop-gradient)
    # previous-pass predictions, shifted by one row — the exact input
    # distribution the tree expansion sees at depth >= 2, which pure
    # teacher-forced training never visits. rollout_steps=r trains the
    # recursion to depth r+1; each pass r is weighted rollout_w**r.
    rollout_steps: int = 0
    rollout_w: float = 0.5
    # normalize the regression residual by the target hidden's RMS before
    # SmoothL1. Raw hiddens with std >> 1 (deep residual streams) put
    # SmoothL1 in its linear regime — constant unit gradients, poor
    # conditioning — and the hidden prediction never tightens, which is what
    # the depth>=2 draft recursion depends on.
    v_norm: bool = False
    # Medusa-head training weight: when the draft params carry a "medusa"
    # block, each head k gets hard-label CE against the trajectory token
    # k+2 steps ahead, weighted medusa_w * 0.8**(k-1) (the public Medusa
    # recipe's decay).
    medusa_w: float = 0.2


class Batch(NamedTuple):
    """One training microbatch (all post-image-expansion, fixed T).

    emb_next:   [B, T, H] embedding of token t_{j+1} (image rows carry the
                fused image feature, as in cnets.py:284-301 decouple mode)
    hidden:     [B, T, H] target hidden h_j (noise added in-step)
    target:     [B, T, H] target hidden h_{j+1}
    loss_mask:  [B, T] 1.0 on assistant tokens (ge_data loss-masking)
    attn_len:   [B] valid lengths
    img_mask:   [B, T] True on image-span rows (fc bypass)
    """

    emb_next: jnp.ndarray
    hidden: jnp.ndarray
    target: jnp.ndarray
    loss_mask: jnp.ndarray
    attn_len: jnp.ndarray
    img_mask: jnp.ndarray


def add_uniform_noise(key, hidden: jnp.ndarray, std: float) -> jnp.ndarray:
    """(U[0,1)-0.5) * std * 512 / hidden_dim  (main_deepspeed.py:71-80)."""
    h = hidden.shape[-1]
    u = jax.random.uniform(key, hidden.shape, jnp.float32)
    return hidden + ((u - 0.5) * std * 512.0 / h).astype(hidden.dtype)


def draft_loss(dparams: Dict, cfg: DraftConfig, head_w: jnp.ndarray,
               batch: Batch, cos_t, sin_t,
               rollout_steps: int = 0,
               rollout_w: float = 0.5,
               v_norm: bool = False,
               medusa_w: float = 0.2) -> Tuple[jnp.ndarray, Dict]:
    B, T, H = batch.hidden.shape
    n_med = dparams["medusa"]["mw"].shape[0] if "medusa" in dparams else 0

    def per_seq(emb_next, hidden, target, loss_mask, attn_len, img_mask):
        pos = jnp.arange(T, dtype=jnp.int32)
        qpos = pos[:, None]
        kpos = pos[None, :]
        keep = (kpos <= qpos) & (kpos < attn_len)
        bias = jnp.where(keep, 0.0, NEG_INF).astype(jnp.float32)
        tgt_logits = (target @ head_w).astype(jnp.float32)
        tgt_p = jax.nn.softmax(tgt_logits, axis=-1)
        tgt_arg = jnp.argmax(tgt_logits, -1)

        v_scale = 1.0
        if v_norm:
            t32 = target.astype(jnp.float32)
            m32 = loss_mask.astype(jnp.float32)[:, None]
            v_scale = jax.lax.stop_gradient(jnp.sqrt(
                jnp.sum(m32 * t32 * t32)
                / (jnp.sum(m32) * t32.shape[-1] + 1e-6) + 1e-6))

        def one_pass(hidden_in):
            hin = draft_mod.draft_fuse(dparams, emb_next, hidden_in, img_mask)
            out = draft_mod.draft_forward_nocache(dparams, cfg, hin, pos,
                                                  bias, cos_t, sin_t)
            diff = (out - target).astype(jnp.float32) / v_scale
            v_elem = jnp.where(jnp.abs(diff) < 1.0, 0.5 * diff * diff,
                               jnp.abs(diff) - 0.5)      # SmoothL1, beta=1
            v_row = jnp.mean(v_elem, axis=-1)             # mean over hidden
            logits = (out @ head_w).astype(jnp.float32)
            logp = jax.nn.log_softmax(logits, axis=-1)
            p_row = -jnp.sum(tgt_p * logp, axis=-1)
            # top-1 agreement diagnostic (main_deepspeed.py:437-441)
            agree = (jnp.argmax(logits, -1) == tgt_arg)
            return out, v_row, p_row, agree

        out, v_row, p_row, agree = one_pass(hidden)

        med = jnp.float32(0.0)
        med_agree = jnp.float32(0.0)
        if n_med:
            mh = draft_mod.medusa_hiddens(dparams["medusa"], out)  # [Km,T,H]
            med_den = jnp.float32(1e-5)
            agree_den = jnp.float32(1e-5)

            # remat per head: the [T, V] logits are recomputed in backward
            # instead of all n_med of them living until the gradient pass
            # (13 heads x [896, 32000] fp32 OOMed the 7B distill otherwise)
            @jax.checkpoint
            def head_ce(mh_k, lab_k, m_k):
                lg = (mh_k @ head_w).astype(jnp.float32)        # [T, V]
                ce = (jax.nn.logsumexp(lg, axis=-1)
                      - jnp.take_along_axis(lg, lab_k[:, None],
                                            axis=1)[:, 0])
                ag = jnp.sum(m_k * (jnp.argmax(lg, -1) == lab_k
                                    ).astype(jnp.float32))
                return jnp.sum(m_k * ce), ag

            for k in range(1, n_med + 1):
                # head k predicts t_{j+2+k}; greedy trajectory label =
                # argmax head(target[j+k]) (a shift of tgt_arg — free)
                lab_k = jnp.concatenate(
                    [tgt_arg[k:], jnp.zeros((k,), tgt_arg.dtype)])
                m_k = jnp.concatenate(
                    [loss_mask[k:], jnp.zeros((k,), loss_mask.dtype)]
                ).astype(jnp.float32)
                wk = 0.8 ** (k - 1)
                ce_sum, ag_sum = head_ce(mh[k - 1], lab_k, m_k)
                med = med + wk * ce_sum
                med_den = med_den + wk * jnp.sum(m_k)
                if k == 1:
                    med_agree = ag_sum
                    agree_den = agree_den + jnp.sum(m_k)
            med = med / med_den
            med_agree = med_agree / agree_den

        w_sum = 1.0
        for r in range(1, rollout_steps + 1):
            # row j's input hidden becomes the draft's own prediction of h_j
            # (previous pass, row j-1) — the depth-(r+1) expansion condition
            h_r = jnp.concatenate(
                [hidden[:1], jax.lax.stop_gradient(out[:-1])], axis=0)
            out, v_r, p_r, _ = one_pass(h_r)
            w = rollout_w ** r
            v_row = v_row + w * v_r
            p_row = p_row + w * p_r
            w_sum += w
        v_row = v_row / w_sum
        p_row = p_row / w_sum
        return v_row, p_row, agree, med, med_agree

    v_row, p_row, agree, med, med_agree = jax.vmap(per_seq)(
        batch.emb_next, batch.hidden, batch.target, batch.loss_mask,
        batch.attn_len, batch.img_mask)

    m = batch.loss_mask.astype(jnp.float32)
    denom = jnp.sum(m) + 1e-5
    vloss = jnp.sum(m * v_row) / denom
    ploss = jnp.sum(m * p_row) / denom + medusa_w * jnp.mean(med)
    top1 = jnp.sum(m * agree.astype(jnp.float32)) / denom
    return vloss, ploss, top1, jnp.mean(med_agree)


def make_optimizer(tc: TrainConfig) -> optax.GradientTransformation:
    sched = optax.join_schedules(
        [optax.linear_schedule(0.0, tc.lr, tc.warmup_steps),
         optax.linear_schedule(tc.lr, 0.0, max(tc.total_steps - tc.warmup_steps, 1))],
        [tc.warmup_steps])
    opt = optax.chain(
        optax.clip_by_global_norm(tc.grad_clip),
        optax.adamw(sched, b1=tc.b1, b2=tc.b2, weight_decay=tc.weight_decay))
    if not tc.train_embed:
        def mask(params):
            return jax.tree.map_with_path(
                lambda path, _: not (path and getattr(path[0], "key", "")
                                     == "embed_tokens"), params)
        opt = optax.masked(opt, mask)
    return opt


def train_step(dparams: Dict, opt_state, cfg: DraftConfig, tcfg: TrainConfig,
               head_w: jnp.ndarray, batch: Batch, key, cos_t, sin_t, opt):
    """One SGD step. jit/pjit this with sharded-in params and batch."""
    key, sub = jax.random.split(key)
    batch = batch._replace(hidden=add_uniform_noise(sub, batch.hidden,
                                                    tcfg.noise_std))
    if tcfg.noise_rel > 0.0:
        key, sub = jax.random.split(key)
        u = jax.random.uniform(sub, batch.hidden.shape, jnp.float32) - 0.5
        batch = batch._replace(
            hidden=batch.hidden * (1.0 + u * tcfg.noise_rel
                                   ).astype(batch.hidden.dtype))

    def total_loss(p):
        v, pl, top1, med_agree = draft_loss(
            p, cfg, head_w, batch, cos_t, sin_t,
            rollout_steps=tcfg.rollout_steps,
            rollout_w=tcfg.rollout_w,
            v_norm=tcfg.v_norm, medusa_w=tcfg.medusa_w)
        return tcfg.v_w * v + tcfg.p_w * pl, (v, pl, top1, med_agree)

    (loss, (v, pl, top1, med_agree)), grads = jax.value_and_grad(
        total_loss, has_aux=True)(dparams)
    updates, opt_state = opt.update(grads, opt_state, dparams)
    dparams = optax.apply_updates(dparams, updates)
    metrics = {"loss": loss, "vloss": v, "ploss": pl, "top1_agree": top1,
               "medusa1_agree": med_agree}
    return dparams, opt_state, key, metrics


def curriculum_visual_ratio(epoch: int, num_epochs: int) -> float:
    """Text-only for the first half, then linear ramp to all-visual
    (CustomDataset.update_ratio, main_deepspeed.py:179-191)."""
    half = num_epochs // 2
    if epoch < half:
        return 0.0
    if num_epochs == half:
        return 1.0
    return min(1.0, (epoch - half + 1) / max(num_epochs - half, 1))
