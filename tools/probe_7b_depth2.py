"""7B probe: depth-2 recursion quality of the distilled draft.

Measures, on an engine-collected record:
  pass-1 agree: argmax head(draft(h_true, emb)) == target argmax  (depth-1)
  pass-2 agree: argmax head(draft(draft_out_shifted, emb)) == target argmax
                (the depth-2 expansion condition)
then fine-tunes WITH rollout_steps=1 and re-measures — does rollout training
rescue the recursion at 7B scale?
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
        return 2
    import gc

    import jax
    import jax.numpy as jnp

    from msd_tpu.configs import (DraftConfig, EngineConfig, LlamaConfig,
                                 TreeConfig, IMAGE_TOKEN_INDEX)
    from msd_tpu.engine.generator import MSDGenerator
    from msd_tpu.models import draft as draft_mod
    from msd_tpu.models import llama as L
    from msd_tpu.ops.attention import NEG_INF
    from msd_tpu.train.data_gen import record_from_traj
    from msd_tpu.train.draft_train import TrainConfig
    from msd_tpu.train.trainer import DraftTrainer, TrainerConfig

    dtype = jnp.bfloat16
    import dataclasses
    tcfg = dataclasses.replace(LlamaConfig.llava_7b(),
                               residual_dtype="float32")
    dcfg = DraftConfig(text=tcfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tp = L.init_llama_params_stacked(k1, tcfg, dtype)
    tp["lm_head"] = tp["lm_head"] * dtype(6.0)
    dp = draft_mod.init_draft_params(k2, dcfg, dtype)
    dp["embed_tokens"] = tp["embed_tokens"]
    log("params ready")

    n_img = 576
    eng = EngineConfig(max_seq_len=1024, prompt_pad_multiple=128,
                       tree=TreeConfig(top_k=10, max_depth=10, num_nodes=128))
    gen = MSDGenerator(tp, dp, tcfg, dcfg, eng, n_img=n_img, eos_id=-1)
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 31000, size=64).astype(np.int32)
    ids[1] = IMAGE_TOKEN_INDEX
    feats = jnp.asarray(rng.normal(size=(n_img, tcfg.hidden_size)) * 0.02,
                        dtype)
    t0 = time.time()
    r = gen.generate(ids, img_feats=feats, max_new_tokens=128,
                     collect_hiddens=True)
    log(f"trajectory + hiddens in {time.time()-t0:.1f}s")
    emb_host = np.asarray(tp["embed_tokens"])
    rec = record_from_traj(r.traj_hidden, r.exp_ids, 64 + 575, 1, n_img,
                           np.asarray(feats), emb_host, 896)

    head_host = np.asarray(tp["lm_head"], np.float32)
    head_w = tp["lm_head"]
    gen.params = None
    dp32 = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), dp)
    del tp, dp, gen
    gc.collect()

    cos_t, sin_t = L.make_rope(tcfg, 904)

    def agreements(dparams):
        T = rec["hidden"].shape[0]
        hid = jnp.asarray(rec["hidden"])
        emb = jnp.asarray(rec["emb_next"])
        imm = jnp.asarray(rec["img_mask"])
        pos = jnp.arange(T, dtype=jnp.int32)
        keep = (pos[None, :] <= pos[:, None]) & (pos[None, :] <
                                                 int(rec["attn_len"]))
        bias = jnp.where(keep, 0.0, NEG_INF).astype(jnp.float32)

        def fwd(h_in):
            hin = draft_mod.draft_fuse(dparams, emb, h_in, imm)
            return draft_mod.draft_forward_nocache(dparams, dcfg, hin, pos,
                                                   bias, cos_t, sin_t)

        out1 = fwd(hid)
        h2 = jnp.concatenate([hid[:1], out1[:-1]], axis=0)
        out2 = fwd(h2)
        tgt = np.argmax(np.asarray(rec["target"], np.float32) @ head_host, -1)
        m = rec["loss_mask"] > 0
        res = []
        for o in (out1, out2):
            pred = np.argmax(
                np.asarray((o @ jnp.asarray(head_w)).astype(jnp.float32)), -1)
            res.append(float((pred[m] == tgt[m]).mean()))
        # relative hidden error of pass 1 (recursion input quality)
        e = np.asarray(out1, np.float32)[:-1] - np.asarray(
            rec["target"], np.float32)[:-1]
        rel = (np.linalg.norm(e[m[:-1]], axis=-1)
               / (np.linalg.norm(np.asarray(rec["target"],
                                            np.float32)[:-1][m[:-1]],
                                 axis=-1) + 1e-9))
        return res[0], res[1], float(np.mean(rel))

    def train(dparams, steps, lr, rollout):
        tc = TrainerConfig(
            train=TrainConfig(lr=lr, warmup_steps=20,
                              total_steps=max(steps, 21), noise_std=0.0,
                              noise_rel=0.01, v_norm=True,
                              rollout_steps=rollout),
            batch_size=1, max_len=896, num_epochs=1, log_every=10 ** 9)
        tr = DraftTrainer(dcfg, dparams, head_w, tc)
        last = {}
        t0 = time.time()
        while tr.step_count < steps:
            last = tr.run_epoch([], [rec], log=lambda *a: None)
        log(f"trained {steps} steps rollout={rollout} in "
            f"{time.time()-t0:.1f}s agree={last.get('top1_agree', 0):.3f} "
            f"vloss={last.get('vloss', 0):.4f}")
        return tr.params

    p1 = train(dp32, 800, 1e-3, 0)
    a1, a2, rel = agreements(p1)
    log(f"after teacher-forced: pass1={a1:.3f} pass2={a2:.3f} "
        f"rel_hidden_err={rel:.3f}")
    p2 = train(p1, 400, 3e-4, 1)
    b1, b2, rel2 = agreements(p2)
    log(f"after rollout-ft:     pass1={b1:.3f} pass2={b2:.3f} "
        f"rel_hidden_err={rel2:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
