#!/usr/bin/env python
"""Deployment planner: per-chip memory + roofline decode estimates for a
model/mesh combination (the "will 13B fit a v5e-4" calculator).

  PYTHONPATH=. python tools/plan_deploy.py --model 13b --tp 4

Calibrate the roofline against a real single-chip measurement (bench.py's
JSON line) so the 13B/TP=4 estimate inherits the measured efficiency of the
same decode program instead of the theoretical bandwidth:

  python bench.py > bench7b.json
  PYTHONPATH=. python tools/plan_deploy.py --model 13b --tp 4 \\
      --bench-json bench7b.json
"""

from __future__ import annotations

import argparse
import json

V5E_HBM_GB = 15.75          # usable per chip
V5E_BW_GBS = 819.0          # HBM bandwidth
V5E_BF16_TFLOPS = 197.0


def param_count(cfg) -> int:
    h, inter, nl, v = (cfg.hidden_size, cfg.intermediate_size,
                       cfg.num_hidden_layers, cfg.vocab_size)
    hkv = cfg.num_key_value_heads * cfg.head_dim
    per_layer = h * h * 2 + h * hkv * 2 + 3 * h * inter + 2 * h
    return nl * per_layer + 2 * v * h + h


def theoretical_ar_ms(cfg, tp: int = 1) -> float:
    """Roofline AR decode ms/token: all params read once per token."""
    gb = 1 << 30
    return (param_count(cfg) * 2 / tp) / (V5E_BW_GBS * gb) * 1e3


def efficiency_from_bench(bench_json: dict) -> float:
    """Measured/theoretical bandwidth efficiency from a bench.py JSON line
    (7B, tp=1). <1.0 means the real program runs below the HBM roofline;
    applying it to another config transfers the measured program efficiency."""
    from msd_tpu.configs import LlamaConfig
    detail = bench_json.get("detail", bench_json)
    measured = float(detail["ar_ms_per_token"])
    model = "13b" if "13b" in bench_json.get("metric", "7b") else "7b"
    cfg = (LlamaConfig.llava_13b() if model == "13b"
           else LlamaConfig.llava_7b())
    return theoretical_ar_ms(cfg, tp=1) / measured


def plan(model: str = "13b", tp: int = 4, max_seq: int = 2048,
         tree_nodes: int = 128, ref_alpha: float = 6.69,
         efficiency: float = 1.0) -> dict:
    from msd_tpu.configs import DraftConfig, LlamaConfig

    tcfg = (LlamaConfig.llava_7b() if model == "7b"
            else LlamaConfig.llava_13b())
    dcfg = DraftConfig(text=tcfg)

    p_target = param_count(tcfg)
    # draft: one decoder layer + fc (embed shared with the target)
    h, inter = tcfg.hidden_size, tcfg.intermediate_size
    hkv = tcfg.num_key_value_heads * tcfg.head_dim
    p_draft = (h * h * 2 + h * hkv * 2 + 3 * h * inter) + 2 * h * h

    s_cache = max_seq + tree_nodes
    kv_bytes = (tcfg.num_hidden_layers * s_cache
                * tcfg.num_key_value_heads * tcfg.head_dim * 2 * 2)
    d_kv = dcfg.num_layers * (s_cache + 128) * hkv * 2 * 2

    gb = 1 << 30
    per_chip = {
        "target_params_gb": p_target * 2 / tp / gb,
        "draft_params_gb": p_draft * 2 / tp / gb,
        "target_kv_gb": kv_bytes / tp / gb,
        "draft_kv_gb": d_kv / tp / gb,
        "workspace_gb": 1.5 / tp + 0.5,
    }
    total = sum(per_chip.values())

    # roofline: AR decode reads all params once per token; TP divides the
    # read per chip but adds ICI all-reduces (~2*h bytes/layer, negligible).
    # `efficiency` scales the achievable bandwidth to a measured value.
    t_ar_ms = theoretical_ar_ms(tcfg, tp) / max(efficiency, 1e-6)
    # verify: same weight traffic + tree-node FLOPs
    flops = 2 * p_target * tree_nodes / tp
    t_flops_ms = flops / (V5E_BF16_TFLOPS * 1e12) * 1e3
    t_step_ms = max(t_ar_ms, t_flops_ms) + 0.25 * t_ar_ms  # draft+overhead
    speedup = ref_alpha * t_ar_ms / t_step_ms

    return {
        "model": model, "tp": tp, "max_seq": max_seq,
        "efficiency": round(efficiency, 3),
        "per_chip_gb": {k: round(v, 2) for k, v in per_chip.items()},
        "per_chip_total_gb": round(total, 2),
        "fits_v5e": total < V5E_HBM_GB,
        "roofline": {
            "ar_ms_per_token": round(t_ar_ms, 2),
            "verify_flops_ms": round(t_flops_ms, 2),
            "est_msd_step_ms": round(t_step_ms, 2),
            "est_speedup_at_ref_alpha": round(speedup, 2),
        },
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="13b", choices=["7b", "13b"])
    ap.add_argument("--tp", type=int, default=4)
    ap.add_argument("--max-seq", type=int, default=2048)
    ap.add_argument("--tree-nodes", type=int, default=128)
    ap.add_argument("--ref-alpha", type=float, default=6.69)
    ap.add_argument("--bench-json", default=None,
                    help="bench.py JSON line; calibrates the roofline to the "
                         "measured single-chip efficiency")
    args = ap.parse_args()

    eff = 1.0
    if args.bench_json:
        with open(args.bench_json) as f:
            eff = efficiency_from_bench(json.loads(f.read().strip()))
    print(json.dumps(plan(args.model, args.tp, args.max_seq, args.tree_nodes,
                          args.ref_alpha, efficiency=eff), indent=2))


if __name__ == "__main__":
    main()
