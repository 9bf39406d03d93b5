"""Draft-head training driver — the main_deepspeed.py analog.

Epoch loop over .npz teacher-state shards with:
- text -> visual curriculum (main_deepspeed.py:179-191 update_ratio),
- uniform hidden-state noise (applied in-step, :71-80),
- AdamW + warmup + global-norm clip (train_config :98-126),
- per-epoch orbax checkpoints (the save_16bit_model analog, :476-483) with
  full optimizer-state resume (which the reference lacks),
- optional (data, model)-mesh sharding via msd_tpu.parallel.
"""

from __future__ import annotations

import functools
import glob
import json
import os
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from msd_tpu.configs import DraftConfig
from msd_tpu.models.llama import make_rope
from msd_tpu.train.draft_train import (Batch, TrainConfig,
                                       curriculum_visual_ratio,
                                       make_optimizer, train_step)


@dataclass
class TrainerConfig:
    train: TrainConfig = field(default_factory=TrainConfig)
    batch_size: int = 2
    max_len: int = 512
    num_epochs: int = 40
    ckpt_dir: str = "checkpoints/draft"
    log_every: int = 50
    # W&B experiment logging (main_deepspeed.py:141-143 wandb.init); None
    # disables. The logger no-ops when wandb is unavailable/offline.
    wandb_project: Optional[str] = None


def _load_records(paths: List[str]) -> List[Dict[str, np.ndarray]]:
    return [dict(np.load(p)) for p in paths]


_PREPAD_CACHE: Dict[int, Dict[str, jnp.ndarray]] = {}


def prepad_records(records: List[Dict], max_len: int) -> Dict[str, jnp.ndarray]:
    """Pad + stack + device-put ALL records once; batches then slice on
    device. Re-padding per epoch on the host dominated wall clock at 7B."""
    # key on the record OBJECTS (run_epoch rebuilds the list each epoch)
    key = (tuple(id(r) for r in records), max_len)
    hit = _PREPAD_CACHE.get(key)
    if hit is not None:
        return hit

    def pad(a, value=0.0):
        out = np.full((max_len,) + a.shape[1:], value, a.dtype)
        out[:min(len(a), max_len)] = a[:max_len]
        return out

    stacked = {
        "emb_next": jnp.asarray(np.stack([pad(g["emb_next"]) for g in records])),
        "hidden": jnp.asarray(np.stack([pad(g["hidden"]) for g in records])),
        "target": jnp.asarray(np.stack([pad(g["target"]) for g in records])),
        "loss_mask": jnp.asarray(np.stack(
            [pad(g["loss_mask"]) for g in records])),
        "attn_len": jnp.asarray(np.asarray(
            [min(int(g["attn_len"]), max_len) for g in records], np.int32)),
        "img_mask": jnp.asarray(np.stack([pad(g["img_mask"]) for g in records])),
    }
    _PREPAD_CACHE.clear()   # hold at most one dataset
    _PREPAD_CACHE[key] = stacked
    return stacked


def batches_from_records(records: List[Dict], batch_size: int, max_len: int,
                         rng: np.random.Generator) -> Iterator[Batch]:
    data = prepad_records(records, max_len)
    order = rng.permutation(len(records))
    for i in range(0, len(order) - batch_size + 1, batch_size):
        idx = jnp.asarray(order[i:i + batch_size])
        yield Batch(**{k: v[idx] for k, v in data.items()})


class DraftTrainer:
    def __init__(self, dcfg: DraftConfig, dparams: Dict, head_w,
                 tc: TrainerConfig = TrainerConfig(), mesh=None):
        self.dcfg, self.tc = dcfg, tc
        self.params = dparams
        self.head_w = head_w
        self.opt = make_optimizer(tc.train)
        jit_kw = {}
        if mesh is not None:
            # (data, model) mesh: params TP-sharded, optimizer moments
            # additionally sharded over 'data' (the DeepSpeed ZeRO-1 analog,
            # SURVEY §2.7); out_shardings pin the layout across steps.
            from msd_tpu.parallel.sharding import (draft_param_specs,
                                                   shard_opt_state_zero,
                                                   shard_params)
            specs = draft_param_specs(dcfg, has_bias="fc_b" in dparams)
            self.params = shard_params(dparams, specs, mesh)
            self.opt_state = shard_opt_state_zero(
                self.opt.init(self.params), specs, self.params, mesh)
            from jax.sharding import NamedSharding, PartitionSpec
            repl = NamedSharding(mesh, PartitionSpec())

            def _sh(x):  # scalar leaves (adam count etc.) replicate
                s = getattr(x, "sharding", None)
                return s if isinstance(s, NamedSharding) else repl
            jit_kw["out_shardings"] = (
                jax.tree.map(_sh, self.params),
                jax.tree.map(_sh, self.opt_state), repl,
                jax.tree.map(lambda _: repl,
                             {"loss": 0, "vloss": 0, "ploss": 0,
                              "top1_agree": 0, "medusa1_agree": 0}))
        else:
            self.opt_state = self.opt.init(dparams)
        self.cos_t, self.sin_t = make_rope(dcfg.text, tc.max_len + 8)
        self.key = jax.random.PRNGKey(0)
        self.step_count = 0
        self.epoch = 0
        self.wandb = None
        if tc.wandb_project:
            from msd_tpu.harness.loggers import WandbLogger
            self.wandb = WandbLogger(project=tc.wandb_project,
                                     config={"train": vars(tc.train),
                                             "batch_size": tc.batch_size,
                                             "max_len": tc.max_len})
        self._step = jax.jit(functools.partial(
            train_step, cfg=dcfg, tcfg=tc.train, opt=self.opt), **jit_kw)

    # ------------------------------------------------------------------
    def run_epoch(self, visual_records: List[Dict], text_records: List[Dict],
                  log=print) -> Dict[str, float]:
        ratio = curriculum_visual_ratio(self.epoch, self.tc.num_epochs)
        rng = np.random.default_rng(self.epoch)
        n = max(len(visual_records) + len(text_records), 1)
        n_vis = int(round(ratio * min(len(visual_records), n)))
        pool = (list(rng.choice(len(visual_records), n_vis, replace=False))
                if n_vis else [])
        records = [visual_records[i] for i in pool] + text_records
        metrics_acc: Dict[str, float] = {}
        count = 0
        t0 = time.time()
        for batch in batches_from_records(records, self.tc.batch_size,
                                          self.tc.max_len, rng):
            self.params, self.opt_state, self.key, metrics = self._step(
                self.params, self.opt_state, head_w=self.head_w, batch=batch,
                key=self.key, cos_t=self.cos_t, sin_t=self.sin_t)
            self.step_count += 1
            count += 1
            for k, v in metrics.items():
                metrics_acc[k] = metrics_acc.get(k, 0.0) + float(v)
            if count % self.tc.log_every == 0:
                log(f"epoch {self.epoch} step {count}: " + " ".join(
                    f"{k}={metrics_acc[k]/count:.4f}" for k in metrics_acc))
                if self.wandb:
                    self.wandb.log({f"train/{k}": float(v)
                                    for k, v in metrics.items()},
                                   step=self.step_count)
        out = {k: v / max(count, 1) for k, v in metrics_acc.items()}
        out["steps"] = count
        out["visual_ratio"] = ratio
        out["seconds"] = time.time() - t0
        if self.wandb:
            self.wandb.log({f"epoch/{k}": float(v) for k, v in out.items()},
                           step=self.step_count)
        self.epoch += 1
        return out

    # ------------------------------------------------------------------
    def save(self, tag: Optional[str] = None) -> str:
        import orbax.checkpoint as ocp

        path = os.path.abspath(os.path.join(
            self.tc.ckpt_dir, tag or f"epoch_{self.epoch}"))
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(os.path.join(path, "state"), {
            "params": self.params, "opt_state": self.opt_state,
        }, force=True)
        ckptr.wait_until_finished()
        with open(os.path.join(path, "trainer.json"), "w") as f:
            json.dump({"epoch": self.epoch, "step_count": self.step_count}, f)
        return path

    def restore(self, path: str) -> None:
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        target = {"params": self.params, "opt_state": self.opt_state}
        state = ckptr.restore(os.path.join(os.path.abspath(path), "state"),
                              target)
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        with open(os.path.join(path, "trainer.json")) as f:
            meta = json.load(f)
        self.epoch = meta["epoch"]
        self.step_count = meta["step_count"]


def train_from_dirs(dcfg: DraftConfig, dparams: Dict, head_w,
                    visual_dir: str, text_dir: str,
                    tc: TrainerConfig = TrainerConfig(), log=print):
    trainer = DraftTrainer(dcfg, dparams, head_w, tc)
    vis = _load_records(sorted(glob.glob(os.path.join(visual_dir, "*.npz"))))
    txt = _load_records(sorted(glob.glob(os.path.join(text_dir, "*.npz"))))
    for _ in range(tc.num_epochs):
        m = trainer.run_epoch(vis, txt, log=log)
        log(f"epoch {trainer.epoch - 1} done: {m}")
        trainer.save()
    return trainer
