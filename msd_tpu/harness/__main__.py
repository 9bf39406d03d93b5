"""CLI entry point: ``python -m msd_tpu.harness`` — mirrors the reference's
``python -m lmms_eval`` flag surface (lmms-eval/lmms_eval/__main__.py:85-300),
including the MSD additions: --msd_model_path, --use_msd, --use_calibration,
--train_ratio, --bottom.
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


def parse_model_args(s: str):
    out = {}
    if not s:
        return out
    for kv in s.split(","):
        if not kv:
            continue
        k, _, v = kv.partition("=")
        if v.lower() in ("true", "false"):
            out[k] = v.lower() == "true"
        else:
            try:
                out[k] = int(v)
            except ValueError:
                try:
                    out[k] = float(v)
                except ValueError:
                    out[k] = v
    return out


def _parse_limit(v: str):
    f = float(v)
    return int(f) if f >= 1 or f <= 0 else f


def main(argv=None):
    ap = argparse.ArgumentParser("msd_tpu.harness")
    ap.add_argument("--model", default="llava_msd_calibrated")
    ap.add_argument("--model_args", default="",
                    help="k=v,... incl. pretrained=<ckpt dir>")
    ap.add_argument("--tasks", required=True, help="comma-separated")
    # int = doc count; float in (0,1) = fraction of the task's docs
    # (lmms-eval/__main__.py:150-153)
    ap.add_argument("--limit", type=_parse_limit, default=None)
    ap.add_argument("--bottom", type=int, default=None,
                    help="evaluate only the LAST N docs")
    ap.add_argument("--msd_model_path", default=None)
    # store_true with default False — exact lmms_eval __main__.py:109-113
    # semantics: MSD is opt-in via the flag (the llava_msd adapters default
    # use_msd=True when constructed directly in python)
    ap.add_argument("--use_msd", action="store_true", default=False,
                    help="If True, use msd for inference")
    ap.add_argument("--no_msd", dest="use_msd", action="store_false",
                    help="(kept for round-1 compat; off is the default)")
    ap.add_argument("--use_calibration", action="store_true")
    ap.add_argument("--train_ratio", type=float, default=0.2)
    ap.add_argument("--use_cache", "-c", default=None, metavar="DIR",
                    help="path to a sqlite db file caching model responses "
                         "(lmms-eval/__main__.py:170-176); None = no cache")
    ap.add_argument("--cache_requests", default=None,
                    choices=["true", "refresh", "delete"],
                    help="cache the building of dataset requests "
                         "(lmms-eval/__main__.py:177-183)")
    ap.add_argument("--config", default=None,
                    help="YAML file with one run config or a LIST of run "
                         "configs; each entry overrides the CLI args and "
                         "runs sequentially (lmms-eval/__main__.py:344-358)")
    ap.add_argument("--output_path", default=None)
    ap.add_argument("--log_samples", action="store_true")
    ap.add_argument("--log_dir", default=None,
                    help="adapter run-output dir (acceptance JSON, "
                         "calibration stats, reliability SVG)")
    args = ap.parse_args(argv)

    # --config sweep: expand into one args namespace per run config
    args_list = []
    if args.config:
        if not os.path.exists(args.config):
            raise ValueError(f"Config file does not exist: {args.config}")
        import yaml
        with open(args.config) as f:
            config_args = yaml.safe_load(f)
        if not isinstance(config_args, list):
            config_args = [config_args]
        for config in config_args:
            args_copy = argparse.Namespace(**vars(args))
            for key, value in config.items():
                setattr(args_copy, key, value)
            args_list.append(args_copy)
    else:
        args_list.append(args)

    payloads = [_run_one(a) for a in args_list]
    return payloads if args.config else payloads[0]


def _run_one(args):
    from msd_tpu.harness.evaluator import simple_evaluate

    margs = parse_model_args(args.model_args)
    if args.log_dir:
        margs.setdefault("log_dir", args.log_dir)
    out = simple_evaluate(
        model=args.model,
        model_args=margs,
        tasks=args.tasks.split(","),
        limit=args.limit, bottom=args.bottom,
        use_msd=args.use_msd, use_calibration=args.use_calibration,
        train_ratio=args.train_ratio,
        msd_model_path=args.msd_model_path,
        use_cache=args.use_cache, cache_requests=args.cache_requests)

    payload = {"results": out["results"]}
    if "msd_stats" in out:
        payload["msd_stats"] = out["msd_stats"]
    if "synthetic_tasks" in out:
        payload["synthetic_tasks"] = out["synthetic_tasks"]
    if args.log_samples:
        payload["details"] = {
            t: {"samples": v["samples"]} for t, v in out["details"].items()}
    text = json.dumps(payload, indent=2, default=str)
    print(text)
    if args.output_path:
        if args.output_path.endswith(".json"):
            with open(args.output_path, "w") as f:
                f.write(text)
        else:
            from msd_tpu.harness.loggers import EvaluationTracker
            tracker = EvaluationTracker(args.output_path)
            tracker.save_results_aggregated(payload, args.model)
            if args.log_samples:
                for t, v in out["details"].items():
                    tracker.save_results_samples(t, v["samples"], args.model)
    return payload


if __name__ == "__main__":
    main()
