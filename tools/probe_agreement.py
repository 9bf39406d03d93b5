"""Diagnose the train/decode draft-agreement gap.

Trains a tiny draft on on-policy teacher trajectories, then compares:
  (a) train-time top1 agreement (loss rows),
  (b) teacher-forced top1 agreement on a held-out trajectory,
  (c) decode-time depth-1 top-candidate agreement (engine, collect_calibration),
for text-only and (optionally) image prompts. A large (b) vs (c) gap means the
engine's suffix-forward path deviates from the training convention.

Usage: PYTHONPATH=. python tools/probe_agreement.py [--image]
"""
import argparse
import sys

import numpy as np

import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
import jax.numpy as jnp  # noqa: E402

from msd_tpu.configs import DraftConfig, EngineConfig, LlamaConfig, TreeConfig
from msd_tpu.engine.generator import MSDGenerator
from msd_tpu.harness.models.llava_msd import SimpleTokenizer
from msd_tpu.models import draft as draft_mod
from msd_tpu.models import llama as L
from msd_tpu.train.data_gen import make_record_from_ids
from msd_tpu.train.draft_train import TrainConfig
from msd_tpu.train.trainer import DraftTrainer, TrainerConfig


def teacher_forced_agreement(rec, tparams, cfg, dparams, dcfg):
    """argmax head(draft_out_j) == argmax head(hidden_{j+1}) on loss rows."""
    T = rec["hidden"].shape[0]
    hin = draft_mod.draft_fuse(dparams, jnp.asarray(rec["emb_next"]),
                               jnp.asarray(rec["hidden"]),
                               jnp.asarray(rec["img_mask"]))
    cos_t, sin_t = L.make_rope(cfg, T + 8)
    bias = jnp.where(jnp.tril(jnp.ones((T, T), bool)), 0.0, -1e30)
    out = draft_mod.draft_forward_nocache(dparams, dcfg, hin,
                                          jnp.arange(T), bias, cos_t, sin_t)
    head = tparams["lm_head"]
    pred = np.argmax(np.asarray(out @ head), -1)
    tgt = np.argmax(np.asarray(jnp.asarray(rec["target"]) @ head), -1)
    m = rec["loss_mask"] > 0
    return float((pred[m] == tgt[m]).mean()), pred, tgt, m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", action="store_true")
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--sharpen", type=float, default=1.0,
                    help="scale lm_head to peak the random target's logits")
    ap.add_argument("--eval-train", action="store_true",
                    help="decode a TRAINING prompt (on-trajectory alpha)")
    ap.add_argument("--noise", type=float, default=0.0)
    ap.add_argument("--topk", type=int, default=4)
    ap.add_argument("--layers", type=int, default=4)
    ap.add_argument("--hidden", type=int, default=64)
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--nodes", type=int, default=16)
    ap.add_argument("--rollout", type=int, default=0)
    ap.add_argument("--pw", type=float, default=0.1)
    ap.add_argument("--cast-bf16", action="store_true",
                    help="cast the trained stack to bf16 before decode "
                         "(emulates the 7B bench's serving dtype)")
    ap.add_argument("--msd-records", action="store_true",
                    help="record trajectories from MSD decode (verify-greedy) "
                         "instead of AR decode")
    ap.add_argument("--noise-rel", type=float, default=0.0)
    ap.add_argument("--bench-mode", action="store_true",
                    help="emulate the 7B bench exactly: bf16 target "
                         "generates the records AND serves decode; draft "
                         "trains fp32 and casts to bf16")
    args = ap.parse_args()

    cfg = LlamaConfig.tiny(vocab_size=256, hidden_size=args.hidden,
                           layers=args.layers, heads=4,
                           intermediate_size=2 * args.hidden, max_pos=512)
    dcfg = DraftConfig(text=cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tparams = L.init_llama_params(k1, cfg)
    if args.sharpen != 1.0:
        tparams["lm_head"] = tparams["lm_head"] * args.sharpen
    dparams = draft_mod.init_draft_params(k2, dcfg)
    dparams["embed_tokens"] = tparams["embed_tokens"]
    tok = SimpleTokenizer(vocab_size=256)

    n_img = 8 if args.image else 0
    feats = (jnp.asarray(
        np.random.default_rng(5).normal(size=(n_img, args.hidden)) * 0.1,
        jnp.float32) if n_img else None)

    eng = EngineConfig(max_seq_len=256, prompt_pad_multiple=32,
                       tree=TreeConfig(top_k=args.topk, max_depth=args.depth,
                                       num_nodes=args.nodes))
    trec = tparams   # params that produce the training records
    if args.bench_mode:
        trec = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), tparams)
        args.cast_bf16 = True
    gen0 = MSDGenerator(trec, dparams if not args.bench_mode else
                        jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16),
                                     dparams), cfg, dcfg, eng, eos_id=-1,
                        n_img=n_img)

    prompts = ["the quick brown fox", "jumps over the lazy dog",
               "pack my box with", "how vexingly quick"]
    recs, conts = [], []
    for p in prompts:
        ids = np.asarray(tok.encode(p), np.int32)
        if n_img:
            from msd_tpu.configs import IMAGE_TOKEN_INDEX
            ids = np.concatenate([[ids[0], IMAGE_TOKEN_INDEX], ids[1:]]
                                 ).astype(np.int32)
        cont = (gen0.generate(ids, img_feats=feats,
                              max_new_tokens=48).tokens
                if args.msd_records else
                gen0.naive_generate(ids, img_feats=feats,
                                    max_new_tokens=48).tokens)
        conts.append(cont)
        full = np.concatenate([ids, cont]).astype(np.int32)
        mask = np.zeros((len(full),), np.float32)
        mask[len(ids) - 1:] = 1.0
        recs.append(make_record_from_ids(
            trec, cfg, full, mask, pad_to=96,
            img_feats=feats, n_img=n_img,
            verify_chunk=eng.tree.num_nodes,
            cache_len=eng.max_seq_len + eng.tree.num_nodes))

    tc = TrainerConfig(
        train=TrainConfig(lr=3e-3, warmup_steps=5, total_steps=4000,
                          noise_std=args.noise, rollout_steps=args.rollout,
                          p_w=args.pw, noise_rel=args.noise_rel),
        batch_size=3, max_len=96, num_epochs=1, ckpt_dir="/tmp/probe_ckpt",
        log_every=100000)
    trainer = DraftTrainer(dcfg, dparams, trec["lm_head"], tc)
    last = None
    for _ in range(args.steps):
        last = trainer.run_epoch([], recs[:-1], log=lambda *a: None)
    print(f"train: loss={last['loss']:.4f} vloss={last.get('vloss'):.4f} "
          f"top1_agree={last.get('top1_agree')}")
    dp = trainer.params

    # (b) teacher-forced agreement
    eval_i = 0 if args.eval_train else -1
    agree, pred, tgt, m = teacher_forced_agreement(recs[eval_i], trec, cfg,
                                                   dp, dcfg)
    kind = "train" if args.eval_train else "held-out"
    print(f"teacher-forced top1 agreement ({kind}): {agree:.3f}")

    # (c) decode-time depth-1
    tdec, ddec = tparams, dp
    if args.cast_bf16:
        tdec = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), tparams)
        ddec = jax.tree.map(lambda a: jnp.asarray(a, jnp.bfloat16), dp)
        ddec["embed_tokens"] = tdec["embed_tokens"]
    gen = MSDGenerator(tdec, ddec, cfg, dcfg, eng, eos_id=-1, n_img=n_img)
    ids = np.asarray(tok.encode(prompts[eval_i]), np.int32)
    if n_img:
        from msd_tpu.configs import IMAGE_TOKEN_INDEX
        ids = np.concatenate([[ids[0], IMAGE_TOKEN_INDEX], ids[1:]]
                             ).astype(np.int32)
    fdec = (jnp.asarray(feats, jnp.bfloat16) if args.cast_bf16 and n_img
            else feats)
    ar = gen.naive_generate(ids, img_feats=fdec, max_new_tokens=48).tokens
    r = gen.generate(ids, img_feats=fdec, max_new_tokens=48,
                     collect_calibration=True)
    same = np.array_equal(ar[:min(len(ar), len(r.tokens))],
                          r.tokens[:min(len(ar), len(r.tokens))])
    print(f"greedy MSD == AR: {same}")
    rec_traj = conts[eval_i]
    k = min(len(rec_traj), len(r.tokens))
    on_rec = int(np.argmax(np.append(rec_traj[:k] != r.tokens[:k], True)))
    print(f"decode follows record trajectory for {on_rec}/{k} tokens")
    cd = r.calib_data
    # node 1 = top depth-1 candidate (finalize_tree sorts by weight)
    d1 = cd["depth"][:, 1] == 1
    top_ok = cd["base_top1"][:, 1][d1]
    print(f"decode-time depth-1 top-candidate agreement: "
          f"{top_ok.sum()}/{len(top_ok)} = {top_ok.mean():.3f}")
    print(f"alpha={r.avg_accept_len:.3f} steps={r.accept_steps} "
          f"tokens={len(r.tokens)}")
    # per-depth acceptance
    for d in range(1, args.depth + 1):
        sel = (cd["depth"] == d) & (cd["valid"] > 0)
        if sel.sum():
            print(f"depth {d}: n={sel.sum()} "
                  f"accept_rate={cd['accept'][sel].mean():.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
