"""Pre-build bench.py's --quant-cache pickle on the CPU backend.

bench.py with --quant int8/int4 initializes + quantizes the target on the
host (a 13B tree takes ~45 min on this 1-core host) before touching the
chip. Doing that inside bench.py would HOLD the TPU lease idle for the
whole quantize; this script builds the identical pickle offline so the
bench run starts at the ~1-min reload instead.

MUST mirror bench.py's param construction exactly (same PRNG split, then
--head-sharpen scaling, then quantization) or the cached target diverges
from what an uncached run would measure.

Usage: JAX_PLATFORMS=cpu python tools/quantize_target_cache.py \
           --model 13b --quant int8 --out artifacts/q13b_int8.pkl
"""
import argparse
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if "cpu" in os.environ.get("JAX_PLATFORMS", ""):
    import jax
    jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="13b", choices=["7b", "13b"])
    ap.add_argument("--quant", default="int8", choices=["int8", "int4"])
    ap.add_argument("--head-sharpen", type=float, default=6.0,
                    help="bench.py default; the pickle embeds it")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from msd_tpu.configs import LlamaConfig
    from msd_tpu.models import llama as L

    tcfg = (LlamaConfig.llava_13b() if args.model == "13b"
            else LlamaConfig.llava_7b())
    dtype = jnp.bfloat16
    k1, _ = jax.random.split(jax.random.PRNGKey(0))   # bench.py:488
    t0 = time.time()
    with jax.default_device(jax.devices("cpu")[0]):
        tp = L.init_llama_params_stacked(k1, tcfg, dtype)
        if args.head_sharpen != 1.0:
            tp["lm_head"] = tp["lm_head"] * dtype(args.head_sharpen)
        tp = L.quantize_llama_params(tp, bits=8 if args.quant == "int8"
                                     else 4)
    host = jax.tree.map(lambda a: np.asarray(a), tp)
    print(f"init+quantize {time.time()-t0:.1f}s", file=sys.stderr)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "wb") as f:
        pickle.dump(host, f, protocol=5)
    gb = sum(a.nbytes for a in jax.tree.leaves(host)) / 2 ** 30
    print(f"wrote {args.out} ({gb:.2f} GiB) in {time.time()-t0:.1f}s total",
          file=sys.stderr)


if __name__ == "__main__":
    main()
