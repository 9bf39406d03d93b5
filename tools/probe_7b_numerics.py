"""7B-scale probe: how much do teacher hiddens move across program shapes,
and does the distilled draft survive that movement?

Runs on the real TPU. Steps:
  1. init 7B bf16 (sharpened head), record one MSD trajectory,
  2. teacher states with verify chunking A (=tree nodes) and B (=64),
  3. distill the draft on A,
  4. report: relative hidden delta A vs B, teacher-forced top-1 agreement on
     A-inputs vs B-inputs.
A large A->B agreement drop means the draft's failure at 7B is numeric
brittleness to program-shape noise (fix: bigger noise_rel / multi-shape
records), not engine structure.
"""
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    sys.path.insert(0, ".")
    from bench import wait_for_backend
    if not wait_for_backend(3600.0):
        log("FATAL: no backend")
        return 2
    import jax
    import jax.numpy as jnp

    from msd_tpu.configs import (DraftConfig, EngineConfig, LlamaConfig,
                                 TreeConfig, IMAGE_TOKEN_INDEX)
    from msd_tpu.engine.generator import MSDGenerator
    from msd_tpu.models import draft as draft_mod
    from msd_tpu.models import llama as L
    from msd_tpu.train.data_gen import make_record_from_ids

    dtype = jnp.bfloat16
    tcfg = LlamaConfig.llava_7b()
    import dataclasses
    tcfg = dataclasses.replace(tcfg, residual_dtype="float32")
    dcfg = DraftConfig(text=tcfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    t0 = time.time()
    tp = L.init_llama_params_stacked(k1, tcfg, dtype)
    tp["lm_head"] = tp["lm_head"] * dtype(6.0)
    dp = draft_mod.init_draft_params(k2, dcfg, dtype)
    dp["embed_tokens"] = tp["embed_tokens"]
    log(f"params in {time.time()-t0:.1f}s")

    n_img = 576
    max_seq = 1024
    eng = EngineConfig(max_seq_len=max_seq, prompt_pad_multiple=128,
                       tree=TreeConfig(top_k=10, max_depth=10, num_nodes=128))
    gen = MSDGenerator(tp, dp, tcfg, dcfg, eng, n_img=n_img, eos_id=-1)
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 31000, size=64).astype(np.int32)
    ids[1] = IMAGE_TOKEN_INDEX
    feats = jnp.asarray(rng.normal(size=(n_img, tcfg.hidden_size)) * 0.02,
                        dtype)
    t0 = time.time()
    cont = gen.generate(ids, img_feats=feats, max_new_tokens=128).tokens
    log(f"trajectory ({len(cont)} tokens) in {time.time()-t0:.1f}s")
    full = np.concatenate([ids, cont]).astype(np.int32)
    mask = np.zeros((len(full),), np.float32)
    mask[len(ids) - 1:] = 1.0
    pad_rec = 896

    t0 = time.time()
    recA = make_record_from_ids(tp, tcfg, full, mask, pad_to=pad_rec,
                                img_feats=feats, n_img=n_img,
                                verify_chunk=128, cache_len=max_seq + 128)
    recB = make_record_from_ids(tp, tcfg, full, mask, pad_to=pad_rec,
                                img_feats=feats, n_img=n_img,
                                verify_chunk=64, cache_len=max_seq + 128)
    log(f"records in {time.time()-t0:.1f}s")

    hA = np.asarray(recA["hidden"], np.float32)
    hB = np.asarray(recB["hidden"], np.float32)
    m = recA["loss_mask"] > 0
    num = np.linalg.norm(hA[m] - hB[m], axis=-1)
    den = np.linalg.norm(hA[m], axis=-1) + 1e-9
    log(f"hidden rel delta A vs B: mean {np.mean(num/den):.5f} "
        f"p95 {np.quantile(num/den, 0.95):.5f}")
    # does the TARGET's own argmax move? (head on recorded hiddens)
    head = np.asarray(tp["lm_head"], np.float32)
    aA = np.argmax(hA[m] @ head, -1)
    aB = np.argmax(hB[m] @ head, -1)
    log(f"target argmax stable A vs B: {(aA == aB).mean():.4f}")

    # ---- distill on A ----
    from msd_tpu.train.draft_train import TrainConfig
    from msd_tpu.train.trainer import DraftTrainer, TrainerConfig
    import gc
    head_w = tp["lm_head"]
    gen.params = None
    dp32 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), dp)
    del tp, dp, gen
    gc.collect()
    tc = TrainerConfig(
        train=TrainConfig(lr=1e-3, warmup_steps=20, total_steps=800,
                          noise_std=0.0, noise_rel=0.01),
        batch_size=1, max_len=pad_rec, num_epochs=1, log_every=10 ** 9)
    trainer = DraftTrainer(dcfg, dp32, head_w, tc)
    t0 = time.time()
    last = {}
    while trainer.step_count < 800:
        last = trainer.run_epoch([], [recA], log=lambda *a: None)
    log(f"distilled 800 steps in {time.time()-t0:.1f}s "
        f"(agree={last.get('top1_agree', 0):.3f}, "
        f"vloss={last.get('vloss', 0):.4f})")
    dpt = trainer.params

    # ---- teacher-forced agreement on A-inputs vs B-inputs ----
    cos_t, sin_t = L.make_rope(tcfg, pad_rec + 8)
    from msd_tpu.ops.attention import NEG_INF

    def agree_on(rec, tgt_rec):
        T = rec["hidden"].shape[0]
        hin = draft_mod.draft_fuse(dpt, jnp.asarray(rec["emb_next"]),
                                   jnp.asarray(rec["hidden"]),
                                   jnp.asarray(rec["img_mask"]))
        pos = jnp.arange(T, dtype=jnp.int32)
        keep = (pos[None, :] <= pos[:, None]) & (pos[None, :] <
                                                 int(rec["attn_len"]))
        bias = jnp.where(keep, 0.0, NEG_INF).astype(jnp.float32)
        out = draft_mod.draft_forward_nocache(dpt, dcfg, hin, pos, bias,
                                              cos_t, sin_t)
        pred = np.argmax(np.asarray((out @ jnp.asarray(head_w)
                                     ).astype(jnp.float32)), -1)
        tgt = np.argmax(np.asarray(tgt_rec["target"], np.float32) @ head, -1)
        mm = rec["loss_mask"] > 0
        return (pred[mm] == tgt[mm]).mean()

    log(f"teacher-forced agreement on A-inputs: {agree_on(recA, recA):.3f}")
    log(f"teacher-forced agreement on B-inputs (A-trained): "
        f"{agree_on(recB, recA):.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
