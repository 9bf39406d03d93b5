#!/usr/bin/env python
"""Abstract-compile the decode programs for 7B shapes and print XLA's memory
analysis — no parameter allocation needed (jit().lower(ShapeDtypeStruct...)).

Usage: python tools/memcheck.py [7b|13b] [--image]
"""

import sys

import jax
import jax.numpy as jnp

from msd_tpu.configs import DraftConfig, EngineConfig, LlamaConfig, TreeConfig
from msd_tpu.engine import spec_engine as SE
from msd_tpu.engine.generator import MSDGenerator
from msd_tpu.models import draft as draft_mod
from msd_tpu.models import llama as L
from msd_tpu.ops.sampling import SamplingParams


def abstract(tree):
    return jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), tree)


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "7b"
    image = "--image" in sys.argv
    dtype = jnp.bfloat16
    tcfg = LlamaConfig.llava_7b() if model == "7b" else LlamaConfig.llava_13b()
    dcfg = DraftConfig(text=tcfg)
    n_img = 576 if image else 0
    max_seq = ((64 + (575 if n_img else 0) + 128 + 127) // 128) * 128
    eng = EngineConfig(max_seq_len=max_seq, prompt_pad_multiple=128,
                       tree=TreeConfig(top_k=10, max_depth=10, num_nodes=60))
    st = SE.Statics(tcfg=tcfg, dcfg=dcfg, tree=eng.tree, eng=eng,
                    sp=SamplingParams(), n_img=n_img, eos_id=-1, max_new=128)

    # abstract params/state built with eval_shape (no real memory)
    def build_params():
        k1, k2 = jax.random.split(jax.random.PRNGKey(0))
        tp = L.init_llama_params_stacked(k1, tcfg, dtype)
        dp = draft_mod.init_draft_params(k2, dcfg, dtype)
        dp["embed_tokens"] = tp["embed_tokens"]
        cos_t, sin_t = L.make_rope(tcfg, st.s_target + 64)
        return {"target": tp, "draft": dp, "cos_t": cos_t, "sin_t": sin_t}

    params_s = jax.eval_shape(build_params)
    P_pad = 128

    def build_state(params):
        return SE.prefill(st, params, jnp.zeros((P_pad,), jnp.int32),
                          jnp.int32(64),
                          jnp.zeros((n_img, tcfg.hidden_size), dtype)
                          if n_img else None,
                          jnp.int32(P_pad), jax.random.PRNGKey(0))

    state_s = jax.eval_shape(build_state, params_s)

    for name, fn, args in [
        ("decode", SE.decode, (st, params_s, state_s)),
    ]:
        lowered = jax.jit(fn, static_argnums=(0,), donate_argnums=(2,)).lower(*args)
        compiled = lowered.compile()
        ma = compiled.memory_analysis()
        gb = 1 << 30
        print(f"{name}: args={ma.argument_size_in_bytes/gb:.2f}G "
              f"out={ma.output_size_in_bytes/gb:.2f}G "
              f"temp={ma.temp_size_in_bytes/gb:.2f}G "
              f"alias={ma.alias_size_in_bytes/gb:.2f}G "
              f"gen={ma.generated_code_size_in_bytes/2**20:.1f}M")
        total = (ma.argument_size_in_bytes + ma.output_size_in_bytes
                 + ma.temp_size_in_bytes - ma.alias_size_in_bytes)
        print(f"  total-ish: {total/gb:.2f}G")


if __name__ == "__main__":
    main()
