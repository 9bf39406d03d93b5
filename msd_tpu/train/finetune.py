"""LLaVA target-model finetuning — the TPU-native analog of
LLaVA/llava/train/train.py (+ llava_trainer.py).

Mirrors the reference's training regimes without copying its structure:
- stage-1 projector pretraining: ``tune_mm_mlp_adapter=True`` trains ONLY the
  mm projector (train.py:189, :926-941 — the "pretrain" stage of the LLaVA
  recipe);
- stage-2 full finetune: LM + projector train together, with an optional
  separate projector learning rate (``mm_projector_lr``, train.py:111 and
  llava_trainer.py:126-146 parameter groups);
- ``freeze_backbone`` (train.py:57, :844) freezes the LM while the projector
  trains at its own lr.
The vision tower stays frozen (reference default) — records carry the
PRE-projection CLIP features, so projector gradients flow while the tower is
run once per example offline.

Loss: next-token cross-entropy over assistant-reply rows in post-expansion
coordinates (the same conversation/loss-mask construction the draft-data
generator uses — train/data_gen.build_conversation_ids).

TPU-first: one jitted train step; full-sequence forward reuses the engine's
fused-embedding prefill math (models/llava.fuse_embeddings + llama_forward)
so train-time fusion is bit-identical to serve-time fusion. Optional
(data, model) mesh: megatron param specs for the LM, ZeRO-1 (data-axis)
optimizer-state sharding.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Dict, Iterator, List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from msd_tpu.configs import IMAGE_TOKEN_INDEX, LlamaConfig
from msd_tpu.models import llama as L
from msd_tpu.models.llava import expand_ids, fuse_embeddings, projector_apply
from msd_tpu.ops.attention import causal_prefill_bias
from msd_tpu.train.data_gen import build_conversation_ids
from msd_tpu.utils.conversation import DEFAULT_VICUNA_SYSTEM


@dataclass(frozen=True)
class FinetuneConfig:
    lr: float = 2e-5                      # train.py finetune default scale
    mm_projector_lr: Optional[float] = None   # train.py:111; None = lr
    b1: float = 0.9
    b2: float = 0.999
    weight_decay: float = 0.0
    grad_clip: float = 1.0
    warmup_steps: int = 100
    total_steps: int = 10_000
    # stage-1: train only the projector (train.py tune_mm_mlp_adapter)
    tune_mm_mlp_adapter: bool = False
    # freeze the LM backbone while other groups train (train.py:844)
    freeze_backbone: bool = False


class FinetuneBatch(NamedTuple):
    """One microbatch (unexpanded token space; expansion happens in-step).

    ids:        [B, Tp] padded prompt+reply ids (IMAGE_TOKEN_INDEX at img_pos)
    clip_feats: [B, n_img, Hv] pre-projection CLIP features (zeros if no img)
    img_pos:    [B] placeholder position (>= attn_len when no image)
    attn_len:   [B] valid unexpanded lengths
    tgt_mask:   [B, P_exp] 1.0 where row j's next-token label is trained
    """

    ids: jnp.ndarray
    clip_feats: jnp.ndarray
    img_pos: jnp.ndarray
    attn_len: jnp.ndarray
    tgt_mask: jnp.ndarray


def make_finetune_record(tokenizer, turns: Sequence[Tuple[str, str]],
                         clip_feats: Optional[np.ndarray], n_img: int,
                         pad_to: int,
                         system: str = DEFAULT_VICUNA_SYSTEM) -> Dict:
    """Host-side record: conversation ids + expanded next-token loss mask.

    clip_feats: [n_img, Hv] PRE-projection tower output (frozen tower run
    offline), or None for a text-only conversation.
    """
    with_image = clip_feats is not None and n_img > 0
    ids, loss_mask = build_conversation_ids(tokenizer, turns, with_image,
                                            system=system)
    ids = ids[:pad_to]
    loss_mask = loss_mask[:pad_to]
    img_positions = np.nonzero(ids == IMAGE_TOKEN_INDEX)[0]
    img_pos = int(img_positions[0]) if len(img_positions) else pad_to
    P_exp = pad_to + max(n_img - 1, 0)
    e_len = len(ids) + (n_img - 1 if with_image else 0)

    # assistant mask in post-expansion coordinates (image rows 0)
    exp_mask = np.zeros((P_exp,), np.float32)
    if with_image:
        exp_mask[:img_pos] = loss_mask[:img_pos]
        exp_mask[img_pos + n_img:img_pos + n_img + len(ids) - img_pos - 1] = \
            loss_mask[img_pos + 1:]
    else:
        exp_mask[:len(ids)] = loss_mask
    # row j's label is expanded token j+1 -> shift the label mask onto row j
    tmask = np.concatenate([exp_mask[1:], np.zeros((1,), np.float32)])
    tmask[max(e_len - 1, 0):] = 0.0

    padded = np.zeros((pad_to,), np.int32)
    padded[:len(ids)] = ids
    return {"ids": padded, "clip_feats": clip_feats, "img_pos": img_pos,
            "attn_len": np.int32(len(ids)), "tgt_mask": tmask}


def finetune_loss(params: Dict, cfg: LlamaConfig, n_img: int,
                  batch: FinetuneBatch, cos_t, sin_t) -> Tuple:
    """Masked next-token CE through projector + fused-embedding LM forward."""
    B, Tp = batch.ids.shape
    P_exp = Tp + max(n_img - 1, 0)
    tp = params["target"]

    def per_seq(ids, clip_feats, img_pos, attn_len, tgt_mask):
        has_img = img_pos < attn_len
        e_len = attn_len + jnp.where(has_img, max(n_img - 1, 0), 0)
        if n_img > 0:
            feats = projector_apply(params["projector"], clip_feats)
            fused_img = fuse_embeddings(tp["embed_tokens"], ids, feats,
                                        img_pos, P_exp)
            fused_txt = tp["embed_tokens"][jnp.maximum(ids, 0)]
            if P_exp > Tp:
                fused_txt = jnp.concatenate(
                    [fused_txt,
                     jnp.zeros((P_exp - Tp, fused_txt.shape[1]),
                               fused_txt.dtype)])
            fused = jnp.where(has_img, fused_img, fused_txt)
            exp = expand_ids(jnp.maximum(ids, 0), img_pos, n_img, P_exp)
            exp_txt = jnp.concatenate(
                [jnp.maximum(ids, 0),
                 jnp.zeros((P_exp - Tp,), jnp.int32)]) if P_exp > Tp \
                else jnp.maximum(ids, 0)
            exp_ids = jnp.where(has_img, exp, exp_txt)
        else:
            fused = tp["embed_tokens"][jnp.maximum(ids, 0)]
            exp_ids = jnp.maximum(ids, 0)

        positions = jnp.arange(P_exp, dtype=jnp.int32)
        kv = L.init_kv_cache(cfg, P_exp, fused.dtype)
        qpos = positions[:, None]
        kpos = positions[None, :]
        keep = (kpos <= qpos) & (kpos < e_len)
        bias = jnp.where(keep, 0.0, -1e30).astype(jnp.float32)
        hidden, _ = L.llama_forward(tp, cfg, fused, positions, kv,
                                    jnp.int32(0), bias, cos_t, sin_t)
        logits = L.lm_head(tp, hidden)                     # [P_exp, V] f32
        labels = jnp.concatenate([exp_ids[1:], jnp.zeros((1,), jnp.int32)])
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
        agree = (jnp.argmax(logits, -1) == labels).astype(jnp.float32)
        return nll * tgt_mask, agree * tgt_mask

    nll, agree = jax.vmap(per_seq)(batch.ids, batch.clip_feats,
                                   batch.img_pos, batch.attn_len,
                                   batch.tgt_mask)
    denom = jnp.sum(batch.tgt_mask) + 1e-5
    return jnp.sum(nll) / denom, jnp.sum(agree) / denom


def _param_labels(params: Dict) -> Dict:
    """'proj' for the mm projector, 'lm' for everything else."""
    return {
        "target": jax.tree.map(lambda _: "lm", params["target"]),
        "projector": jax.tree.map(lambda _: "proj", params["projector"]),
    }


def make_finetune_optimizer(fc: FinetuneConfig, params: Dict
                            ) -> optax.GradientTransformation:
    def adamw(lr):
        sched = optax.join_schedules(
            [optax.linear_schedule(0.0, lr, fc.warmup_steps),
             optax.cosine_decay_schedule(
                 lr, max(fc.total_steps - fc.warmup_steps, 1))],
            [fc.warmup_steps])
        return optax.chain(
            optax.clip_by_global_norm(fc.grad_clip),
            optax.adamw(sched, b1=fc.b1, b2=fc.b2,
                        weight_decay=fc.weight_decay))

    lm_frozen = fc.tune_mm_mlp_adapter or fc.freeze_backbone
    proj_lr = fc.mm_projector_lr if fc.mm_projector_lr is not None else fc.lr
    return optax.multi_transform(
        {"lm": optax.set_to_zero() if lm_frozen else adamw(fc.lr),
         "proj": adamw(proj_lr)},
        _param_labels(params))


def finetune_step(params: Dict, opt_state, cfg: LlamaConfig, fc: FinetuneConfig,
                  n_img: int, batch: FinetuneBatch, cos_t, sin_t, opt):
    def total(p):
        loss, agree = finetune_loss(p, cfg, n_img, batch, cos_t, sin_t)
        return loss, agree

    (loss, agree), grads = jax.value_and_grad(total, has_aux=True)(params)
    updates, opt_state = opt.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, {"loss": loss, "next_token_agree": agree}


class LlavaFinetuner:
    """Finetuning driver for {target LM + mm projector} bundles.

    params: {"target": llama params, "projector": mlp2x params}. With a mesh,
    LM params shard megatron-style and optimizer state shards ZeRO-1 over the
    data axis (the reference's DeepSpeed zero2/zero3 configs, SURVEY §2.7).
    """

    def __init__(self, cfg: LlamaConfig, params: Dict, n_img: int,
                 fc: FinetuneConfig = FinetuneConfig(), max_exp_len: int = 512,
                 mesh=None):
        self.cfg, self.fc, self.n_img = cfg, fc, n_img
        self.params = params
        self.opt = make_finetune_optimizer(fc, params)
        jit_kw = {}
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec
            from msd_tpu.parallel.sharding import (llama_param_specs,
                                                   shard_opt_state_zero,
                                                   shard_params)
            specs = {"target": llama_param_specs(cfg, stacked=True),
                     "projector": jax.tree.map(
                         lambda _: PartitionSpec(), params["projector"])}
            self.params = shard_params(params, specs, mesh)
            self.opt_state = shard_opt_state_zero(
                self.opt.init(self.params), specs, self.params, mesh)
            repl = NamedSharding(mesh, PartitionSpec())

            def _sh(x):
                s = getattr(x, "sharding", None)
                return s if isinstance(s, NamedSharding) else repl
            jit_kw["out_shardings"] = (
                jax.tree.map(_sh, self.params),
                jax.tree.map(_sh, self.opt_state),
                {"loss": repl, "next_token_agree": repl})
        else:
            self.opt_state = self.opt.init(params)
        self.cos_t, self.sin_t = L.make_rope(cfg, max_exp_len + 8)
        self.step_count = 0
        self._step = jax.jit(functools.partial(
            finetune_step, cfg=cfg, fc=fc, n_img=n_img, opt=self.opt),
            **jit_kw)

    def run(self, batches: Iterator[FinetuneBatch], log=print,
            log_every: int = 50) -> Dict[str, float]:
        acc: Dict[str, float] = {}
        n = 0
        for batch in batches:
            self.params, self.opt_state, metrics = self._step(
                self.params, self.opt_state, batch=batch,
                cos_t=self.cos_t, sin_t=self.sin_t)
            self.step_count += 1
            n += 1
            for k, v in metrics.items():
                acc[k] = acc.get(k, 0.0) + float(v)
            if n % log_every == 0:
                log(f"step {self.step_count}: " + " ".join(
                    f"{k}={acc[k]/n:.4f}" for k in acc))
        return {k: v / max(n, 1) for k, v in acc.items()}


def batches_from_finetune_records(records: List[Dict], batch_size: int,
                                  rng: np.random.Generator, n_img: int,
                                  vision_h: int) -> Iterator[FinetuneBatch]:
    order = rng.permutation(len(records))
    for i in range(0, len(order) - batch_size + 1, batch_size):
        group = [records[j] for j in order[i:i + batch_size]]
        feats = np.stack([
            (g["clip_feats"] if g["clip_feats"] is not None
             else np.zeros((n_img, vision_h), np.float32)) for g in group]) \
            if n_img > 0 else np.zeros((len(group), 0, vision_h), np.float32)
        yield FinetuneBatch(
            ids=jnp.asarray(np.stack([g["ids"] for g in group])),
            clip_feats=jnp.asarray(feats),
            img_pos=jnp.asarray([g["img_pos"] for g in group], jnp.int32),
            attn_len=jnp.asarray([g["attn_len"] for g in group], jnp.int32),
            tgt_mask=jnp.asarray(np.stack([g["tgt_mask"] for g in group])))
