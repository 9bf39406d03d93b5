"""Write a FULL-SIZE (7B-geometry) synthetic LLaVA-1.5 checkpoint dir + a
matching MSD draft checkpoint, for on-chip harness runs that exercise the
real load path (utils/weights.load_llava / load_draft) at serving scale —
VERDICT r2 missing #6 / next-round #5.

Layout matches liuhaotian/llava-v1.5-7b: LM under model.*, mm_projector,
embedded CLIP-L-336 tower under model.vision_tower.vision_tower.*. Weights
are random fp16 (bf16 on device); ~13.5 GB on disk, sharded.

Usage: python tools/make_synth_7b.py [--out /root/repo/.ckpt/llava7b-synth]
"""

import argparse
import json
import os

import numpy as np


def _shard_save(path, tensors, shard_gb=3.5):
    from safetensors.numpy import save_file
    shard, size, idx = {}, 0, 0
    items = tensors  # lazy: keep only one shard in RAM

    def flush():
        nonlocal shard, size, idx
        if shard:
            save_file(shard, os.path.join(path,
                                          f"model-{idx:05d}.safetensors"))
            idx += 1
            shard, size = {}, 0

    for name, arr in items:
        shard[name] = arr
        size += arr.nbytes
        if size > shard_gb * 2 ** 30:
            flush()
    flush()


def gen_llava_7b(out, seed=0):
    H, INTER, LAYERS, V = 4096, 11008, 32, 32000
    VH, VINTER, VLAYERS, VP, VIMG = 1024, 4096, 24, 14, 336
    rng = np.random.default_rng(seed)

    # bf16 on disk, not fp16: this VM (and some TPU hosts) convert fp16 in
    # software (~17 MB/s in numpy) — a 13.5 GB fp16 checkpoint takes ~20 min
    # to load while bf16 shards load at memcpy speed. Real HF checkpoints
    # are fp16; that path is covered by the tiny-checkpoint unit tests.
    import ml_dtypes

    def r(*shape, scale=None):
        s = scale if scale is not None else (shape[-1] ** -0.5)
        return (rng.standard_normal(shape, dtype=np.float32) * s
                ).astype(ml_dtypes.bfloat16)

    def tensors():
        yield "model.embed_tokens.weight", r(V, H)
        for i in range(LAYERS):
            p = f"model.layers.{i}."
            yield p + "input_layernorm.weight", np.ones(H, np.float16)
            yield p + "post_attention_layernorm.weight", np.ones(
                H, np.float16)
            for nm in ("q_proj", "k_proj", "v_proj", "o_proj"):
                yield p + f"self_attn.{nm}.weight", r(H, H)
            yield p + "mlp.gate_proj.weight", r(INTER, H)
            yield p + "mlp.up_proj.weight", r(INTER, H)
            yield p + "mlp.down_proj.weight", r(H, INTER)
        yield "model.norm.weight", np.ones(H, np.float16)
        # sharpened head: random init's near-flat logits make greedy argmax
        # a numeric lottery; real checkpoints produce peaked logits (see
        # bench.py --head-sharpen)
        yield "lm_head.weight", r(V, H, scale=6.0 * H ** -0.5)
        yield "model.mm_projector.0.weight", r(H, VH)
        yield "model.mm_projector.0.bias", np.zeros(H, np.float16)
        yield "model.mm_projector.2.weight", r(H, H)
        yield "model.mm_projector.2.bias", np.zeros(H, np.float16)

        vp = "model.vision_tower.vision_tower.vision_model."
        yield vp + "embeddings.patch_embedding.weight", r(VH, 3, VP, VP)
        yield vp + "embeddings.class_embedding", r(VH)
        npos = 1 + (VIMG // VP) ** 2
        yield vp + "embeddings.position_embedding.weight", r(npos, VH)
        yield vp + "pre_layrnorm.weight", np.ones(VH, np.float16)
        yield vp + "pre_layrnorm.bias", np.zeros(VH, np.float16)
        for i in range(VLAYERS):
            q = vp + f"encoder.layers.{i}."
            for ln in ("layer_norm1", "layer_norm2"):
                yield q + ln + ".weight", np.ones(VH, np.float16)
                yield q + ln + ".bias", np.zeros(VH, np.float16)
            for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
                yield q + f"self_attn.{nm}.weight", r(VH, VH)
                yield q + f"self_attn.{nm}.bias", np.zeros(VH, np.float16)
            yield q + "mlp.fc1.weight", r(VINTER, VH)
            yield q + "mlp.fc1.bias", np.zeros(VINTER, np.float16)
            yield q + "mlp.fc2.weight", r(VH, VINTER)
            yield q + "mlp.fc2.bias", np.zeros(VH, np.float16)
        yield vp + "post_layernorm.weight", np.ones(VH, np.float16)
        yield vp + "post_layernorm.bias", np.zeros(VH, np.float16)

    os.makedirs(out, exist_ok=True)
    _shard_save(out, tensors())
    with open(os.path.join(out, "config.json"), "w") as f:
        json.dump({"vocab_size": V, "hidden_size": H,
                   "intermediate_size": INTER, "num_hidden_layers": LAYERS,
                   "num_attention_heads": 32, "num_key_value_heads": 32,
                   "max_position_embeddings": 4096, "rms_norm_eps": 1e-5,
                   "rope_theta": 10000.0, "mm_hidden_size": VH,
                   "mm_projector_type": "mlp2x_gelu",
                   "model_type": "llava_llama"}, f, indent=1)
    print(f"wrote 7B LLaVA synth checkpoint -> {out}")


def gen_draft(out, seed=1, medusa_heads=7):
    """Matching MSD draft (1 EAGLE layer + medusa heads), torch layout."""
    import jax
    import jax.numpy as jnp

    from msd_tpu.configs import DraftConfig, LlamaConfig
    from msd_tpu.models import draft as draft_mod
    from msd_tpu.utils.weights import save_draft

    tcfg = LlamaConfig.llava_7b()
    dcfg = DraftConfig(text=tcfg, medusa_heads=medusa_heads)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    dp = draft_mod.init_draft_params(k1, dcfg, jnp.float32)
    if medusa_heads:
        dp["medusa"] = draft_mod.init_medusa_params(k2, dcfg, jnp.float32)
    save_draft(dp, out)
    with open(os.path.join(out, "config.json"), "w") as f:
        json.dump({"hidden_size": tcfg.hidden_size,
                   "vocab_size": tcfg.vocab_size,
                   "num_attention_heads": tcfg.num_attention_heads,
                   "medusa_heads": medusa_heads}, f, indent=1)
    print(f"wrote MSD draft checkpoint -> {out}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/root/repo/.ckpt/llava7b-synth")
    ap.add_argument("--draft-out", default="/root/repo/.ckpt/msd-draft-7b-synth")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    gen_llava_7b(args.out, args.seed)
    gen_draft(args.draft_out, args.seed + 1)
