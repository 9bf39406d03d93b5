"""CLI: draft-head training / teacher-state generation.

Usage (main_deepspeed.py analog):
  python -m msd_tpu.train fit --basepath /ckpt/llava-7b \
      --tmpdir_v data/visual --tmpdir_t data/text --cpdir checkpoints/draft

  python -m msd_tpu.train gen-data --basepath /ckpt/llava-7b \
      --data llava_instruct.json --outdir data/visual --start 0 --end 10000
"""

from __future__ import annotations

import argparse
import json
import os

# honor an explicit cpu request before jax backend init (the preinstalled
# axon TPU plugin ignores JAX_PLATFORMS and hangs if its tunnel is down)
if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    try:
        import jax
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


def main(argv=None):
    ap = argparse.ArgumentParser("msd_tpu.train")
    sub = ap.add_subparsers(dest="cmd", required=True)

    fit = sub.add_parser("fit")
    fit.add_argument("--basepath", required=True, help="target checkpoint dir")
    fit.add_argument("--tmpdir_v", default=None, help="visual records dir")
    fit.add_argument("--tmpdir_t", default=None, help="text records dir")
    fit.add_argument("--cpdir", default="checkpoints/draft")
    fit.add_argument("--epochs", type=int, default=40)
    fit.add_argument("--bs", type=int, default=2)
    fit.add_argument("--lr", type=float, default=2e-4)
    fit.add_argument("--max-len", type=int, default=2048)
    fit.add_argument("--resume", default=None)
    fit.add_argument("--wandb-project", default=None,
                     help="W&B project (main_deepspeed.py:141-143); no-op "
                          "when wandb is unavailable")

    pipe = sub.add_parser(
        "pipeline", help="distill the draft on on-policy teacher states, "
        "then evaluate per-task alpha (train/pipeline.py)")
    pipe.add_argument("--basepath", default=None)
    pipe.add_argument("--msd-model-path", dest="msd_model_path", default=None)
    pipe.add_argument("--tiny", action="store_true",
                      help="checkpoint-free tiny stack (pipeline smoke)")
    pipe.add_argument("--tasks", required=True)
    pipe.add_argument("--limit", type=int, default=None)
    pipe.add_argument("--distill-docs", type=int, default=16)
    pipe.add_argument("--distill-steps", type=int, default=200)
    pipe.add_argument("--log-dir", default=None)
    pipe.add_argument("--wandb-project", default=None)

    ft = sub.add_parser(
        "finetune", help="LLaVA target finetuning (LLaVA train.py analog): "
        "stage-1 projector pretrain via --tune-mm-mlp-adapter, stage-2 full "
        "finetune; vision tower frozen")
    ft.add_argument("--basepath", required=True, help="target checkpoint dir")
    ft.add_argument("--data", required=True, help="LLaVA-instruct style JSON")
    ft.add_argument("--cpdir", default="checkpoints/finetune")
    ft.add_argument("--epochs", type=int, default=1)
    ft.add_argument("--bs", type=int, default=2)
    ft.add_argument("--lr", type=float, default=2e-5)
    ft.add_argument("--mm-projector-lr", type=float, default=None)
    ft.add_argument("--tune-mm-mlp-adapter", action="store_true")
    ft.add_argument("--freeze-backbone", action="store_true")
    ft.add_argument("--pad-to", type=int, default=512)
    ft.add_argument("--no-image", action="store_true")

    gen = sub.add_parser("gen-data")
    gen.add_argument("--basepath", required=True)
    gen.add_argument("--data", required=True, help="LLaVA-instruct style JSON")
    gen.add_argument("--outdir", required=True)
    gen.add_argument("--start", type=int, default=0)
    gen.add_argument("--end", type=int, default=None)
    gen.add_argument("--pad-to", type=int, default=2048)
    gen.add_argument("--no-image", action="store_true")

    args = ap.parse_args(argv)

    if args.cmd == "pipeline":
        from msd_tpu.train.pipeline import main_pipeline
        main_pipeline(args)
        return

    import jax.numpy as jnp
    from msd_tpu.utils.weights import load_llava

    if args.cmd == "finetune":
        import jax
        import numpy as np
        from msd_tpu.models.clip_vit import clip_encode
        from msd_tpu.train.finetune import (FinetuneConfig, LlavaFinetuner,
                                            batches_from_finetune_records,
                                            make_finetune_record)

        params, lcfg = load_llava(args.basepath, jnp.bfloat16)
        try:
            from transformers import AutoTokenizer
            tokenizer = AutoTokenizer.from_pretrained(args.basepath,
                                                          local_files_only=True)
        except Exception:
            from msd_tpu.harness.models.llava_msd import SimpleTokenizer
            tokenizer = SimpleTokenizer(vocab_size=lcfg.text.vocab_size)
        with open(args.data) as f:
            raw = json.load(f)
        n_img = 0 if args.no_image else lcfg.num_image_tokens
        tower = None
        if n_img:
            tower_c = jax.jit(lambda p, px: clip_encode(p, lcfg.vision,
                                                        px))
            tower = lambda px: tower_c(params["vision"], px)
        recs = []
        for r in raw:
            conv = r.get("conversations", [])
            turns = [(conv[i]["value"].replace("<image>", "").strip(),
                      conv[i + 1]["value"])
                     for i in range(0, len(conv) - 1, 2)]
            feats = None
            if n_img and r.get("image") is not None:
                from msd_tpu.utils.mm_utils import process_image
                feats = np.asarray(
                    tower(jnp.asarray(process_image(r["image"]))), np.float32)
            rec = make_finetune_record(tokenizer, turns, feats, n_img,
                                       pad_to=args.pad_to)
            if float(rec["tgt_mask"].sum()) > 0:
                recs.append(rec)
        if len(recs) < args.bs:
            raise SystemExit(
                f"finetune: only {len(recs)} usable records (< batch size "
                f"{args.bs}) — answers truncated away? raise --pad-to")
        fc = FinetuneConfig(lr=args.lr, mm_projector_lr=args.mm_projector_lr,
                            tune_mm_mlp_adapter=args.tune_mm_mlp_adapter,
                            freeze_backbone=args.freeze_backbone,
                            total_steps=max(args.epochs * len(recs) // args.bs,
                                            1))
        ft = LlavaFinetuner(
            lcfg.text,
            {"target": params["target"], "projector": params["projector"]},
            n_img, fc, max_exp_len=args.pad_to + max(n_img - 1, 0))
        rng = np.random.default_rng(0)
        for ep in range(args.epochs):
            m = ft.run(batches_from_finetune_records(
                recs, args.bs, rng, n_img, lcfg.mm_hidden_size))
            print(f"epoch {ep}: " + " ".join(f"{k}={v:.4f}"
                                             for k, v in m.items()))
        os.makedirs(args.cpdir, exist_ok=True)
        flat = {}
        for scope in ("target", "projector"):
            leaves = jax.tree.leaves_with_path(ft.params[scope])
            for path, leaf in leaves:
                key = scope + "." + ".".join(
                    str(getattr(p, "key", getattr(p, "idx", ""))) for p in path)
                flat[key] = np.asarray(leaf, np.float32)
        out = os.path.join(args.cpdir, "finetuned.npz")
        np.savez(out, **flat)
        print(f"done: {ft.step_count} steps, saved {out}")
        return

    if args.cmd == "fit":
        import jax
        from msd_tpu.models.draft import init_draft_params
        from msd_tpu.train.draft_train import TrainConfig
        from msd_tpu.train.trainer import TrainerConfig, train_from_dirs
        from msd_tpu.configs import DraftConfig

        params, lcfg = load_llava(args.basepath, jnp.bfloat16)
        dcfg = DraftConfig(text=lcfg.text)
        dparams = init_draft_params(jax.random.PRNGKey(0), dcfg, jnp.bfloat16)
        dparams["embed_tokens"] = params["target"]["embed_tokens"]
        tc = TrainerConfig(
            train=TrainConfig(lr=args.lr), batch_size=args.bs,
            max_len=args.max_len, num_epochs=args.epochs, ckpt_dir=args.cpdir,
            wandb_project=args.wandb_project)
        trainer = train_from_dirs(dcfg, dparams, params["target"]["lm_head"],
                                  args.tmpdir_v or "", args.tmpdir_t or "", tc)
        from msd_tpu.utils.weights import save_draft
        exp = save_draft(trainer.params, os.path.join(args.cpdir, "export"))
        print(f"done: {trainer.step_count} steps, saved under {args.cpdir}; "
              f"deployable draft at {exp}")
    else:
        import jax
        from transformers import AutoTokenizer
        from msd_tpu.models.llava import encode_image
        from msd_tpu.train.data_gen import generate_dataset

        params, lcfg = load_llava(args.basepath, jnp.bfloat16)
        try:
            tokenizer = AutoTokenizer.from_pretrained(args.basepath,
                                                          local_files_only=True)
            if tokenizer.vocab_size > lcfg.text.vocab_size:
                raise ValueError("tokenizer/model vocab mismatch")
        except Exception:  # checkpoint dir without usable tokenizer files
            from msd_tpu.harness.models.llava_msd import SimpleTokenizer
            tokenizer = SimpleTokenizer(vocab_size=lcfg.text.vocab_size)
        with open(args.data) as f:
            raw = json.load(f)
        # LLaVA-instruct format: conversations [{from: human/gpt, value}, ...]
        samples = []
        for r in raw:
            conv = r.get("conversations", [])
            turns = [(conv[i]["value"].replace("<image>", "").strip(),
                      conv[i + 1]["value"])
                     for i in range(0, len(conv) - 1, 2)]
            samples.append({"turns": turns, "image": r.get("image")})
        if args.no_image:
            enc = None
        else:
            enc_c = jax.jit(lambda p, px: encode_image(p, lcfg, px))
            lp = {"vision": params["vision"],
                  "projector": params["projector"]}
            enc = lambda px: enc_c(lp, px)
        n = generate_dataset(params["target"], lcfg.text, tokenizer, samples,
                             args.outdir, encode_image_fn=enc,
                             n_img=0 if args.no_image else lcfg.num_image_tokens,
                             pad_to=args.pad_to, start=args.start,
                             end=args.end)
        print(f"wrote {n} records to {args.outdir}")


if __name__ == "__main__":
    main()
