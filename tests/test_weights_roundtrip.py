"""End-to-end checkpoint surface: a synthetic HF-layout LLaVA checkpoint on
disk -> load_llava / LlavaMSD.from_pretrained -> generation, plus the
training CLI (gen-data + fit) against the same checkpoint.

This exercises the exact file formats the reference consumes
(LLaVA/llava/model/builder.py load_pretrained_model key layout;
EAGLE ea_model.py:116-142 draft layout) without needing real weights.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

H, V, LAYERS, HEADS, INTER = 64, 512, 2, 4, 128
VH, VP, VIMG, VLAYERS, VINTER = 64, 14, 28, 2, 128


def _r(rng, *shape):
    return (rng.normal(size=shape) * 0.05).astype(np.float32)


def make_llava_checkpoint(path, rng):
    """Write a tiny HF-layout LLaVA dir (embedded vision tower)."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    st = {}
    st["model.embed_tokens.weight"] = _r(rng, V, H)
    for i in range(LAYERS):
        p = f"model.layers.{i}."
        st[p + "input_layernorm.weight"] = np.ones(H, np.float32)
        st[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
        for nm in ("q_proj", "k_proj", "v_proj", "o_proj"):
            st[p + f"self_attn.{nm}.weight"] = _r(rng, H, H)
        st[p + "mlp.gate_proj.weight"] = _r(rng, INTER, H)
        st[p + "mlp.up_proj.weight"] = _r(rng, INTER, H)
        st[p + "mlp.down_proj.weight"] = _r(rng, H, INTER)
    st["model.norm.weight"] = np.ones(H, np.float32)
    st["lm_head.weight"] = _r(rng, V, H)
    st["model.mm_projector.0.weight"] = _r(rng, H, VH)
    st["model.mm_projector.0.bias"] = np.zeros(H, np.float32)
    st["model.mm_projector.2.weight"] = _r(rng, H, H)
    st["model.mm_projector.2.bias"] = np.zeros(H, np.float32)

    vp = "model.vision_tower.vision_tower.vision_model."
    st[vp + "embeddings.patch_embedding.weight"] = _r(rng, VH, 3, VP, VP)
    st[vp + "embeddings.class_embedding"] = _r(rng, VH)
    npos = 1 + (VIMG // VP) ** 2
    st[vp + "embeddings.position_embedding.weight"] = _r(rng, npos, VH)
    st[vp + "pre_layrnorm.weight"] = np.ones(VH, np.float32)
    st[vp + "pre_layrnorm.bias"] = np.zeros(VH, np.float32)
    for i in range(VLAYERS):
        p = vp + f"encoder.layers.{i}."
        for ln in ("layer_norm1", "layer_norm2"):
            st[p + ln + ".weight"] = np.ones(VH, np.float32)
            st[p + ln + ".bias"] = np.zeros(VH, np.float32)
        for nm in ("q_proj", "k_proj", "v_proj", "out_proj"):
            st[p + f"self_attn.{nm}.weight"] = _r(rng, VH, VH)
            st[p + f"self_attn.{nm}.bias"] = np.zeros(VH, np.float32)
        st[p + "mlp.fc1.weight"] = _r(rng, VINTER, VH)
        st[p + "mlp.fc1.bias"] = np.zeros(VINTER, np.float32)
        st[p + "mlp.fc2.weight"] = _r(rng, VH, VINTER)
        st[p + "mlp.fc2.bias"] = np.zeros(VH, np.float32)

    save_file(st, os.path.join(path, "model.safetensors"))
    cfg = {"vocab_size": V, "hidden_size": H, "intermediate_size": INTER,
           "num_hidden_layers": LAYERS, "num_attention_heads": HEADS,
           "max_position_embeddings": 1024}
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)


def make_draft_checkpoint(path, rng, kv_dim=H):
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    st = {"fc.weight": _r(rng, H, 2 * H), "fc.bias": np.zeros(H, np.float32),
          "layers.0.post_attention_layernorm.weight": np.ones(H, np.float32)}
    for nm in ("q_proj", "o_proj"):
        st[f"layers.0.self_attn.{nm}.weight"] = _r(rng, H, H)
    for nm in ("k_proj", "v_proj"):
        st[f"layers.0.self_attn.{nm}.weight"] = _r(rng, kv_dim, H)
    st["layers.0.mlp.gate_proj.weight"] = _r(rng, INTER, H)
    st["layers.0.mlp.up_proj.weight"] = _r(rng, INTER, H)
    st["layers.0.mlp.down_proj.weight"] = _r(rng, H, INTER)
    save_file(st, os.path.join(path, "model.safetensors"))


@pytest.fixture(scope="module")
def ckpt_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("ckpt")
    rng = np.random.default_rng(0)
    make_llava_checkpoint(str(root / "llava"), rng)
    make_draft_checkpoint(str(root / "draft"), rng)
    return str(root / "llava"), str(root / "draft")


def test_load_llava_infers_vision_config(ckpt_dirs):
    import jax.numpy as jnp
    from msd_tpu.utils.weights import load_llava

    params, lcfg = load_llava(ckpt_dirs[0], jnp.float32)
    assert lcfg.text.hidden_size == H
    assert lcfg.vision.hidden_size == VH
    assert lcfg.vision.image_size == VIMG
    assert lcfg.vision.num_hidden_layers == VLAYERS
    assert lcfg.num_image_tokens == (VIMG // VP) ** 2
    assert params["target"]["layers"]["q_proj"].shape == (LAYERS, H, H)
    assert params["vision"]["patch_embed"].shape == (3 * VP * VP, VH)


def test_from_pretrained_generates(ckpt_dirs):
    """The real checkpoint entry point drives a lossless decode."""
    import jax.numpy as jnp
    import numpy as _np

    from msd_tpu.harness.models.llava_msd import LlavaMSD

    from msd_tpu.configs import EngineConfig, TreeConfig

    eng = EngineConfig(max_seq_len=256, prompt_pad_multiple=32,
                       tree=TreeConfig(top_k=4, max_depth=4, num_nodes=12))
    lm = LlavaMSD.from_pretrained(ckpt_dirs[0], ckpt_dirs[1],
                                  dtype=jnp.float32, eng=eng)
    ids = _np.arange(3, 12, dtype=_np.int32)
    msd = lm.gen.generate(ids, max_new_tokens=10)
    ar = lm.gen.naive_generate(ids, max_new_tokens=10)
    _np.testing.assert_array_equal(msd.tokens, ar.tokens)


def test_train_cli_end_to_end(ckpt_dirs, tmp_path):
    """gen-data + fit subcommands against the synthetic checkpoint."""
    llava_dir, _ = ckpt_dirs
    data = [{"conversations": [
        {"from": "human", "value": f"question {i}"},
        {"from": "gpt", "value": f"answer {i} with words"}]}
        for i in range(3)]
    data_json = tmp_path / "instruct.json"
    data_json.write_text(json.dumps(data))
    recs = tmp_path / "recs"
    env = dict(os.environ, JAX_PLATFORMS="cpu")

    r = subprocess.run(
        [sys.executable, "-m", "msd_tpu.train", "gen-data",
         "--basepath", llava_dir, "--data", str(data_json),
         "--outdir", str(recs), "--no-image", "--pad-to", "320"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert len(list(recs.glob("*.npz"))) == 3

    cp = tmp_path / "cp"
    r = subprocess.run(
        [sys.executable, "-m", "msd_tpu.train", "fit",
         "--basepath", llava_dir, "--tmpdir_t", str(recs),
         "--cpdir", str(cp), "--epochs", "1", "--bs", "1",
         "--max-len", "320"],
        capture_output=True, text=True, env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert cp.exists() and any(cp.iterdir())


def make_qwen_checkpoint(path, rng):
    """Tiny HF-layout Qwen2-VL dir (text + visual towers)."""
    from safetensors.numpy import save_file

    os.makedirs(path, exist_ok=True)
    QH, QV, QL, QHEADS, QKV, QI = 64, 512, 2, 4, 2, 128
    E, DEPTH, VHEADS, MLPR, P, TP, MS = 32, 2, 2, 2.0, 14, 2, 2
    st = {}
    st["model.embed_tokens.weight"] = _r(rng, QV, QH)
    hd = QH // QHEADS
    for i in range(QL):
        p = f"model.layers.{i}."
        st[p + "input_layernorm.weight"] = np.ones(QH, np.float32)
        st[p + "post_attention_layernorm.weight"] = np.ones(QH, np.float32)
        st[p + "self_attn.q_proj.weight"] = _r(rng, QH, QH)
        st[p + "self_attn.q_proj.bias"] = np.zeros(QH, np.float32)
        for nm in ("k_proj", "v_proj"):
            st[p + f"self_attn.{nm}.weight"] = _r(rng, QKV * hd, QH)
            st[p + f"self_attn.{nm}.bias"] = np.zeros(QKV * hd, np.float32)
        st[p + "self_attn.o_proj.weight"] = _r(rng, QH, QH)
        st[p + "mlp.gate_proj.weight"] = _r(rng, QI, QH)
        st[p + "mlp.up_proj.weight"] = _r(rng, QI, QH)
        st[p + "mlp.down_proj.weight"] = _r(rng, QH, QI)
    st["model.norm.weight"] = np.ones(QH, np.float32)
    st["lm_head.weight"] = _r(rng, QV, QH)

    st["visual.patch_embed.proj.weight"] = _r(rng, E, 3, TP, P, P)
    vmlp = int(E * MLPR)
    for i in range(DEPTH):
        p = f"visual.blocks.{i}."
        for nm in ("norm1", "norm2"):
            st[p + nm + ".weight"] = np.ones(E, np.float32)
            st[p + nm + ".bias"] = np.zeros(E, np.float32)
        st[p + "attn.qkv.weight"] = _r(rng, 3 * E, E)
        st[p + "attn.qkv.bias"] = np.zeros(3 * E, np.float32)
        st[p + "attn.proj.weight"] = _r(rng, E, E)
        st[p + "attn.proj.bias"] = np.zeros(E, np.float32)
        st[p + "mlp.fc1.weight"] = _r(rng, vmlp, E)
        st[p + "mlp.fc1.bias"] = np.zeros(vmlp, np.float32)
        st[p + "mlp.fc2.weight"] = _r(rng, E, vmlp)
        st[p + "mlp.fc2.bias"] = np.zeros(E, np.float32)
    merged = E * MS * MS
    st["visual.merger.ln_q.weight"] = np.ones(E, np.float32)
    st["visual.merger.ln_q.bias"] = np.zeros(E, np.float32)
    st["visual.merger.mlp.0.weight"] = _r(rng, merged, merged)
    st["visual.merger.mlp.0.bias"] = np.zeros(merged, np.float32)
    st["visual.merger.mlp.2.weight"] = _r(rng, QH, merged)
    st["visual.merger.mlp.2.bias"] = np.zeros(QH, np.float32)
    save_file(st, os.path.join(path, "model.safetensors"))

    cfg = {"vocab_size": QV, "hidden_size": QH, "intermediate_size": QI,
           "num_hidden_layers": QL, "num_attention_heads": QHEADS,
           "num_key_value_heads": QKV, "rms_norm_eps": 1e-6,
           "rope_theta": 1e6,
           "rope_scaling": {"mrope_section": [2, 3, 3]},
           "vision_config": {"embed_dim": E, "depth": DEPTH,
                             "num_heads": VHEADS, "mlp_ratio": MLPR,
                             "patch_size": P, "temporal_patch_size": TP,
                             "spatial_merge_size": MS}}
    with open(os.path.join(path, "config.json"), "w") as f:
        json.dump(cfg, f)


def test_qwen_from_pretrained_roundtrip(ckpt_dirs, tmp_path_factory):
    """Synthetic Qwen2-VL checkpoint -> adapter -> vision encode + lossless
    decode (load_qwen2_vl + Qwen2VLMSD.from_pretrained)."""
    import jax.numpy as jnp
    import numpy as _np

    from msd_tpu.configs import EngineConfig, TreeConfig
    from msd_tpu.harness.models.qwen2_vl_msd import Qwen2VLMSD

    root = tmp_path_factory.mktemp("qwen_ckpt")
    rng = np.random.default_rng(1)
    make_qwen_checkpoint(str(root / "qwen"), rng)
    make_draft_checkpoint(str(root / "qdraft"), rng, kv_dim=32)

    eng = EngineConfig(max_seq_len=256, prompt_pad_multiple=32,
                       tree=TreeConfig(top_k=4, max_depth=4, num_nodes=12))
    lm = Qwen2VLMSD.from_pretrained(str(root / "qwen"), str(root / "qdraft"),
                                    dtype=jnp.float32, eng=eng,
                                    img_grid=(4, 4))
    assert lm.gen.n_img == 4  # (4/2)*(4/2) after spatial merge

    # vision path: a 56x56 image (4x4 patch grid) through patch-embed +
    # blocks + merger -> 4 merged tokens in text hidden size
    px = jnp.asarray(rng.normal(size=(3, 56, 56)) * 0.05, jnp.float32)
    feats = lm.encode_image_fn(px)
    assert feats.shape == (4, 64)
    toks = _np.arange(3, 12, dtype=_np.int32)
    msd = lm.gen.generate(toks, max_new_tokens=10)
    ar = lm.gen.naive_generate(toks, max_new_tokens=10)
    _np.testing.assert_array_equal(msd.tokens, ar.tokens)


def test_lora_merge_loading(ckpt_dirs, tmp_path):
    """A PEFT-layout LoRA dir over the synthetic base: merged weights equal
    base + (alpha/r) * B @ A, and the merged model loads end-to-end."""
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    from msd_tpu.utils.weights import load_llava

    llava_dir, _ = ckpt_dirs
    rng = np.random.default_rng(5)
    lora = tmp_path / "lora"
    os.makedirs(lora)
    r = 4
    a0 = _r(rng, r, H)
    b0 = _r(rng, H, r)
    proj_override = _r(rng, H, VH)
    save_file({
        "base_model.model.model.layers.0.self_attn.q_proj.lora_A.weight": a0,
        "base_model.model.model.layers.0.self_attn.q_proj.lora_B.weight": b0,
        "base_model.model.model.mm_projector.0.weight": proj_override,
    }, str(lora / "adapter_model.safetensors"))
    (lora / "adapter_config.json").write_text(json.dumps(
        {"r": r, "lora_alpha": 8, "base_model_name_or_path": llava_dir}))

    base_params, _ = load_llava(llava_dir, jnp.float32)
    merged_params, lcfg = load_llava(str(lora), jnp.float32)
    scale = 8 / r
    want = (np.asarray(base_params["target"]["layers"]["q_proj"][0])
            + scale * (b0 @ a0))
    got = np.asarray(merged_params["target"]["layers"]["q_proj"][0])
    np.testing.assert_allclose(got, want, atol=1e-5)
    # untouched layer identical; non-LoRA trainable overrides the projector
    np.testing.assert_array_equal(
        np.asarray(merged_params["target"]["layers"]["q_proj"][1]),
        np.asarray(base_params["target"]["layers"]["q_proj"][1]))
    np.testing.assert_allclose(np.asarray(merged_params["projector"]["fc1"]),
                               proj_override.T, atol=1e-6)


def test_load_draft_with_medusa_heads(tmp_path):
    """A draft checkpoint carrying stacked medusa heads loads with
    medusa_heads inferred, and the engine runs in medusa mode from it."""
    from safetensors.numpy import save_file

    import jax
    import jax.numpy as jnp
    from msd_tpu.configs import EngineConfig, LlamaConfig, TreeConfig
    from msd_tpu.engine.generator import MSDGenerator
    from msd_tpu.models import llama as L
    from msd_tpu.utils.weights import load_draft

    rng = np.random.default_rng(0)
    path = str(tmp_path / "mdraft")
    make_draft_checkpoint(path, rng)
    import safetensors.numpy as stnp
    st = dict(stnp.load_file(os.path.join(path, "model.safetensors")))
    st["medusa.mw"] = (rng.normal(size=(3, H, H)) * 0.01).astype(np.float32)
    st["medusa.mb"] = np.zeros((3, H), np.float32)
    save_file(st, os.path.join(path, "model.safetensors"))

    tcfg = LlamaConfig.tiny(vocab_size=V, hidden_size=H, layers=LAYERS,
                            heads=HEADS, intermediate_size=INTER, max_pos=512)
    tparams = L.init_llama_params(jax.random.PRNGKey(1), tcfg)
    dparams, dcfg = load_draft(path, tcfg,
                               base_embed=tparams["embed_tokens"],
                               dtype=jnp.float32)
    assert dcfg.medusa_heads == 3
    assert dparams["medusa"]["mw"].shape == (3, H, H)

    eng = EngineConfig(max_seq_len=128, prompt_pad_multiple=32,
                       tree=TreeConfig(top_k=4, max_depth=4, num_nodes=16))
    gen = MSDGenerator(tparams, dparams, tcfg, dcfg, eng, eos_id=-1)
    ar = gen.naive_generate(np.arange(3, 12, dtype=np.int32),
                            max_new_tokens=12).tokens
    out = gen.generate(np.arange(3, 12, dtype=np.int32),
                       max_new_tokens=12).tokens
    np.testing.assert_array_equal(ar, out)


def test_save_draft_roundtrip(tmp_path):
    """save_draft -> load_draft is an identity for all draft params incl.
    medusa heads (the trainer's deployable export)."""
    import jax
    import jax.numpy as jnp
    from msd_tpu.configs import DraftConfig, LlamaConfig
    from msd_tpu.models import draft as draft_mod
    from msd_tpu.utils.weights import load_draft, save_draft

    cfg = LlamaConfig.tiny(vocab_size=64, hidden_size=32, layers=1, heads=2,
                           intermediate_size=64, max_pos=128)
    dcfg = DraftConfig(text=cfg, medusa_heads=2)
    dp = draft_mod.init_draft_params(jax.random.PRNGKey(0), dcfg)
    dp["medusa"] = draft_mod.init_medusa_params(jax.random.PRNGKey(1), dcfg)
    save_draft(dp, str(tmp_path / "exp"), include_embed=True)
    dp2, dcfg2 = load_draft(str(tmp_path / "exp"), cfg, dtype=jnp.float32)
    assert dcfg2.medusa_heads == 2
    for a, b in zip(jax.tree.leaves(dp), jax.tree.leaves(dp2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
