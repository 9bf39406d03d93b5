#!/usr/bin/env python
"""Deployment planner: per-chip memory + roofline decode estimates for a
model/mesh combination (the "will 13B fit a v5e-4" calculator).

  PYTHONPATH=. python tools/plan_deploy.py --model 13b --tp 4
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="13b", choices=["7b", "13b"])
    ap.add_argument("--tp", type=int, default=4)
    ap.add_argument("--max-seq", type=int, default=2048)
    ap.add_argument("--tree-nodes", type=int, default=128)
    ap.add_argument("--ref-alpha", type=float, default=6.69)
    args = ap.parse_args()

    from msd_tpu.configs import DraftConfig, LlamaConfig

    tcfg = (LlamaConfig.llava_7b() if args.model == "7b"
            else LlamaConfig.llava_13b())
    dcfg = DraftConfig(text=tcfg)

    p_target = param_count(tcfg)
    # draft: one decoder layer + fc (embed shared with the target)
    h, inter = tcfg.hidden_size, tcfg.intermediate_size
    hkv = tcfg.num_key_value_heads * tcfg.head_dim
    p_draft = (h * h * 2 + h * hkv * 2 + 3 * h * inter) + 2 * h * h

    s_cache = args.max_seq + args.tree_nodes
    kv_bytes = (tcfg.num_hidden_layers * s_cache
                * tcfg.num_key_value_heads * tcfg.head_dim * 2 * 2)
    d_kv = dcfg.num_layers * (s_cache + 128) * hkv * 2 * 2

    gb = 1 << 30
    tp = args.tp
    per_chip = {
        "target_params_gb": p_target * 2 / tp / gb,
        "draft_params_gb": p_draft * 2 / tp / gb,
        "target_kv_gb": kv_bytes / tp / gb,
        "draft_kv_gb": d_kv / tp / gb,
        "workspace_gb": 1.5 / tp + 0.5,
    }
    total = sum(per_chip.values())

    # roofline: AR decode reads all params once per token; TP divides the
    # read per chip but adds ICI all-reduces (~2*h bytes/layer, negligible)
    t_ar_ms = (p_target * 2 / tp) / (V5E_BW_GBS * gb) * 1e3
    # verify: same weight traffic + tree-node FLOPs
    flops = 2 * p_target * args.tree_nodes / tp
    t_flops_ms = flops / (V5E_BF16_TFLOPS * 1e12) * 1e3
    t_step_ms = max(t_ar_ms, t_flops_ms) + 0.25 * t_ar_ms  # draft+overhead
    speedup = args.ref_alpha * t_ar_ms / t_step_ms

    print(json.dumps({
        "model": args.model, "tp": tp, "max_seq": args.max_seq,
        "per_chip_gb": {k: round(v, 2) for k, v in per_chip.items()},
        "per_chip_total_gb": round(total, 2),
        "fits_v5e": total < V5E_HBM_GB,
        "roofline": {
            "ar_ms_per_token": round(t_ar_ms, 2),
            "verify_flops_ms": round(t_flops_ms, 2),
            "est_msd_step_ms": round(t_step_ms, 2),
            "est_speedup_at_ref_alpha": round(speedup, 2),
        },
    }, indent=2))


if __name__ == "__main__":
    main()
