#!/usr/bin/env python
"""Harness regression runner (lmms-eval/tools/regression.py analog).

Runs the same tasks through two adapter configurations (default: the MSD
path vs the AR baseline — which must agree EXACTLY at temperature 0) and
diffs per-task scores. Usable offline with the synthetic task.

  PYTHONPATH=. python tools/regression.py --tasks synthetic_vqa --limit 4
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--tasks", default="synthetic_vqa")
    ap.add_argument("--limit", type=int, default=4)
    ap.add_argument("--pretrained", default=None,
                    help="checkpoint dir; omit for the tiny synthetic model")
    ap.add_argument("--msd_model_path", default=None)
    ap.add_argument("--cpu", action="store_true",
                    help="run on CPU (e.g. when the TPU is held)")
    args = ap.parse_args(argv)

    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")

    from msd_tpu.harness.evaluator import evaluate
    from msd_tpu.harness.tasks import register_builtin_tasks

    register_builtin_tasks()
    tasks = args.tasks.split(",")

    if args.pretrained:
        from msd_tpu.harness.models.llava_msd import LlavaAR, LlavaMSD
        msd = LlavaMSD.from_pretrained(args.pretrained, args.msd_model_path)
        ar = LlavaAR.from_pretrained(args.pretrained, args.msd_model_path)
    else:
        msd, ar = _tiny_pair()

    out_msd = evaluate(msd, tasks, limit=args.limit)
    out_ar = evaluate(ar, tasks, limit=args.limit)

    ok = True
    report = {}
    for t in tasks:
        r1 = [s["response"] for s in out_msd["details"][t]["samples"]]
        r2 = [s["response"] for s in out_ar["details"][t]["samples"]]
        same = r1 == r2
        ok &= same
        report[t] = {
            "msd_scores": out_msd["results"][t],
            "ar_scores": out_ar["results"][t],
            "responses_identical": same,
            "msd_avg_accept_len": out_msd["msd_stats"]["avg_accept_len"],
        }
    print(json.dumps(report, indent=2, default=str))
    if not ok:
        print("REGRESSION: MSD responses diverged from AR at temperature 0",
              file=sys.stderr)
        return 1
    return 0


def _tiny_pair():
    import jax
    import jax.numpy as jnp
    from msd_tpu.configs import (ClipVisionConfig, DraftConfig, EngineConfig,
                                 LlamaConfig, LlavaConfig, TreeConfig)
    from msd_tpu.engine.generator import MSDGenerator
    from msd_tpu.harness.models.llava_msd import (LlavaAR, LlavaMSD,
                                                  SimpleTokenizer)
    from msd_tpu.models import clip_vit as C
    from msd_tpu.models import draft as draft_mod
    from msd_tpu.models import llama as L
    from msd_tpu.models.llava import encode_image, init_projector_params

    tcfg = LlamaConfig.tiny(vocab_size=512, hidden_size=64, layers=2, heads=4,
                            intermediate_size=128, max_pos=1024)
    vcfg = ClipVisionConfig.tiny(image_size=28)
    lcfg = LlavaConfig(text=tcfg, vision=vcfg)
    dcfg = DraftConfig(text=tcfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    tp = L.init_llama_params(keys[0], tcfg)
    dp = draft_mod.init_draft_params(keys[1], dcfg)
    lp = {"vision": C.init_clip_params(keys[2], vcfg),
          "projector": init_projector_params(keys[3], lcfg)}
    eng = EngineConfig(max_seq_len=512, prompt_pad_multiple=64,
                       tree=TreeConfig(top_k=4, max_depth=4, num_nodes=12))
    gen = MSDGenerator(tp, dp, tcfg, dcfg, eng, n_img=vcfg.num_patches,
                       eos_id=2)
    enc = jax.jit(lambda px: encode_image(lp, lcfg, px))
    tok = SimpleTokenizer(512)
    return (LlavaMSD(gen, tok, enc, image_size=28),
            LlavaAR(gen, tok, enc, image_size=28))


if __name__ == "__main__":
    sys.exit(main())
