"""Golden-logit tests: our functional LLaMA vs HF transformers (torch CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from msd_tpu.configs import LlamaConfig
from msd_tpu.models import llama as L
from msd_tpu.ops.attention import causal_prefill_bias, length_mask_bias

from tests.hf_ref import hf_state_numpy, rand_ids, tiny_hf_llama


@pytest.fixture(scope="module")
def tiny():
    cfg = LlamaConfig.tiny(vocab_size=128, hidden_size=32, layers=2, heads=4,
                           intermediate_size=64, max_pos=128)
    hf = tiny_hf_llama(cfg)
    params = L.params_from_hf(hf_state_numpy(hf), cfg)
    return cfg, hf, params


def test_prefill_logits_match_hf(tiny):
    import torch
    cfg, hf, params = tiny
    ids = rand_ids(cfg.vocab_size, 17, seed=1)

    with torch.no_grad():
        ref = hf(torch.tensor(ids[None].astype(np.int64))).logits[0].numpy()

    cos_t, sin_t = L.make_rope(cfg, 64)
    kv = L.init_kv_cache(cfg, 64)
    embeds = L.embed_tokens(params, jnp.asarray(ids))
    bias = causal_prefill_bias(len(ids), 64)
    hidden, kv = L.llama_forward(params, cfg, embeds, jnp.arange(len(ids)),
                                 kv, jnp.int32(0), bias, cos_t, sin_t)
    ours = np.asarray(L.lm_head(params, hidden))
    np.testing.assert_allclose(ours, ref, atol=2e-4, rtol=2e-3)


def test_gqa_prefill_matches_hf():
    import torch
    cfg = LlamaConfig.tiny(vocab_size=96, hidden_size=32, layers=2, heads=4,
                           kv_heads=2, intermediate_size=64)
    hf = tiny_hf_llama(cfg, seed=3)
    params = L.params_from_hf(hf_state_numpy(hf), cfg)
    ids = rand_ids(cfg.vocab_size, 9, seed=5)
    with torch.no_grad():
        ref = hf(torch.tensor(ids[None].astype(np.int64))).logits[0].numpy()
    cos_t, sin_t = L.make_rope(cfg, 32)
    kv = L.init_kv_cache(cfg, 32)
    embeds = L.embed_tokens(params, jnp.asarray(ids))
    hidden, _ = L.llama_forward(params, cfg, embeds, jnp.arange(len(ids)), kv,
                                jnp.int32(0), causal_prefill_bias(len(ids), 32),
                                cos_t, sin_t)
    np.testing.assert_allclose(np.asarray(L.lm_head(params, hidden)), ref,
                               atol=2e-4, rtol=2e-3)


def test_incremental_decode_matches_prefill(tiny):
    """KV-cache decode one token at a time == full prefill logits."""
    cfg, _, params = tiny
    ids = rand_ids(cfg.vocab_size, 12, seed=2)
    S = 32
    cos_t, sin_t = L.make_rope(cfg, S)

    # full prefill
    kv = L.init_kv_cache(cfg, S)
    embeds = L.embed_tokens(params, jnp.asarray(ids))
    hidden_full, _ = L.llama_forward(params, cfg, embeds, jnp.arange(len(ids)),
                                     kv, jnp.int32(0),
                                     causal_prefill_bias(len(ids), S),
                                     cos_t, sin_t)
    full_logits = np.asarray(L.lm_head(params, hidden_full))

    # token-by-token with cache
    kv = L.init_kv_cache(cfg, S)
    step_logits = []
    for t, tok in enumerate(ids):
        e = L.embed_tokens(params, jnp.asarray([tok]))
        bias = length_mask_bias(jnp.arange(S), jnp.int32(t + 1), 1)
        hidden, kv = L.llama_forward(params, cfg, e, jnp.asarray([t]), kv,
                                     jnp.int32(t), bias, cos_t, sin_t)
        step_logits.append(np.asarray(L.lm_head(params, hidden))[0])
    np.testing.assert_allclose(np.stack(step_logits), full_logits,
                               atol=1e-4, rtol=1e-3)


def test_int8_weight_only_quantization():
    """Quantized params: small logit error vs fp, and greedy MSD == greedy AR
    stays exact (both paths share the same quantized weights)."""
    from msd_tpu.configs import DraftConfig, EngineConfig, TreeConfig
    from msd_tpu.engine.generator import MSDGenerator
    from msd_tpu.models import draft as draft_mod
    from msd_tpu.models.llama import quantize_llama_params
    from msd_tpu.ops.quant import dequantize, quantize_tensor

    import jax

    w = jax.random.normal(jax.random.PRNGKey(0), (8, 32, 64)) * 0.05
    wq, s = quantize_tensor(w, -1)
    assert wq.dtype == jnp.int8 and s.shape == (8, 32, 1)
    err = jnp.abs(dequantize(wq, s, jnp.float32) - w).max()
    assert float(err) < 0.05 * 2 / 127

    cfg = LlamaConfig.tiny(vocab_size=128, hidden_size=32, layers=2, heads=4,
                           intermediate_size=64, max_pos=512)
    dcfg = DraftConfig(text=cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    tp = quantize_llama_params(L.init_llama_params(k1, cfg))
    dp = draft_mod.init_draft_params(k2, dcfg)
    eng = EngineConfig(max_seq_len=256, prompt_pad_multiple=32,
                       tree=TreeConfig(top_k=4, max_depth=3, num_nodes=8))
    gen = MSDGenerator(tp, dp, cfg, dcfg, eng, eos_id=-1)
    ids = np.arange(3, 12, dtype=np.int32)
    msd = gen.generate(ids, max_new_tokens=12)
    ar = gen.naive_generate(ids, max_new_tokens=12)
    np.testing.assert_array_equal(msd.tokens, ar.tokens)


def test_int4_weight_only_quantization():
    """int4: nibble pack/unpack is a bit-exact round trip, quantized logits
    stay close to fp, and greedy MSD == greedy AR on the int4 target
    (the reference's load_4bit serving path, builder.py:26-167)."""
    from msd_tpu.configs import DraftConfig, EngineConfig, TreeConfig
    from msd_tpu.engine.generator import MSDGenerator
    from msd_tpu.models import draft as draft_mod
    from msd_tpu.models.llama import quantize_llama_params
    from msd_tpu.ops.quant import (dequantize_int4, pack_int4, quantize_tensor,
                                   unpack_int4)

    import jax

    # pack/unpack round trip over the full int4 range
    q = jnp.asarray(np.random.default_rng(0).integers(-7, 8, (6, 10, 32)),
                    jnp.int8)
    np.testing.assert_array_equal(np.asarray(unpack_int4(pack_int4(q))),
                                  np.asarray(q))

    w = jax.random.normal(jax.random.PRNGKey(0), (8, 32, 64)) * 0.05
    wq, s = quantize_tensor(w, -1, bits=4)
    assert wq.dtype == jnp.int8 and wq.shape == (8, 32, 32)
    assert s.shape == (8, 32, 1)
    err = jnp.abs(dequantize_int4(wq, s, jnp.float32) - w).max()
    assert float(err) < 0.05 * 2 / 7  # half an int4 step of the amax scale

    cfg = LlamaConfig.tiny(vocab_size=128, hidden_size=32, layers=2, heads=4,
                           intermediate_size=64, max_pos=512)
    dcfg = DraftConfig(text=cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    tp = quantize_llama_params(L.init_llama_params(k1, cfg), bits=4)
    assert "lm_head_qs4" in tp and "q_proj_qs4" in tp["layers"]
    dp = draft_mod.init_draft_params(k2, dcfg)
    eng = EngineConfig(max_seq_len=256, prompt_pad_multiple=32,
                       tree=TreeConfig(top_k=4, max_depth=3, num_nodes=8))
    gen = MSDGenerator(tp, dp, cfg, dcfg, eng, eos_id=-1)
    ids = np.arange(3, 12, dtype=np.int32)
    msd = gen.generate(ids, max_new_tokens=12)
    ar = gen.naive_generate(ids, max_new_tokens=12)
    np.testing.assert_array_equal(msd.tokens, ar.tokens)


def test_residual_dtype_fp32_is_identity_on_fp32_params():
    """residual_dtype='float32' with fp32 params is the same program."""
    import dataclasses

    import jax
    cfg = LlamaConfig.tiny(vocab_size=128, hidden_size=32, layers=2, heads=2,
                           intermediate_size=64, max_pos=128)
    params = L.init_llama_params(jax.random.PRNGKey(0), cfg)
    cos_t, sin_t = L.make_rope(cfg, 64)
    emb = params["embed_tokens"][jnp.arange(16) % 128]
    from msd_tpu.ops.attention import causal_prefill_bias
    bias = causal_prefill_bias(16, 16)
    pos = jnp.arange(16, dtype=jnp.int32)

    def run(c):
        kv = L.init_kv_cache(c, 16, emb.dtype)
        h, _ = L.llama_forward(params, c, emb, pos, kv, jnp.int32(0), bias,
                               cos_t, sin_t)
        return np.asarray(L.lm_head(params, h))

    a = run(cfg)
    b = run(dataclasses.replace(cfg, residual_dtype="float32"))
    np.testing.assert_array_equal(a, b)


def test_residual_dtype_fp32_msd_lossless_on_bf16():
    """bf16 params + fp32 residual: greedy MSD == greedy AR end-to-end."""
    import dataclasses

    import jax
    from msd_tpu.configs import DraftConfig, EngineConfig, TreeConfig
    from msd_tpu.engine.generator import MSDGenerator
    from msd_tpu.models import draft as draft_mod

    cfg = dataclasses.replace(
        LlamaConfig.tiny(vocab_size=256, hidden_size=64, layers=2, heads=4,
                         intermediate_size=128, max_pos=1024),
        residual_dtype="float32")
    dcfg = DraftConfig(text=cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(1))
    tp = L.init_llama_params(k1, cfg, jnp.bfloat16)
    dp = draft_mod.init_draft_params(k2, dcfg, jnp.bfloat16)
    dp["embed_tokens"] = tp["embed_tokens"]
    eng = EngineConfig(max_seq_len=512, prompt_pad_multiple=64,
                       tree=TreeConfig(top_k=4, max_depth=4, num_nodes=12))
    gen = MSDGenerator(tp, dp, cfg, dcfg, eng, n_img=0, eos_id=-1)
    ids = np.random.default_rng(3).integers(3, 250, size=17).astype(np.int32)
    ar = gen.naive_generate(ids, max_new_tokens=48)
    msd = gen.generate(ids, max_new_tokens=48)
    n = min(len(ar.tokens), len(msd.tokens))
    assert n > 0 and np.array_equal(ar.tokens[:n], msd.tokens[:n])


@pytest.mark.parametrize("bits", [8, 4])
def test_quantized_draft_lossless(bits):
    """quantize_draft_params (layers + fc + medusa resblocks): a quantized
    DRAFT changes only which candidates are proposed — greedy MSD still
    equals greedy AR token-for-token (the bf16 target decides acceptance),
    in both recursive and medusa modes."""
    from msd_tpu.configs import DraftConfig, EngineConfig, TreeConfig
    from msd_tpu.engine.generator import MSDGenerator
    from msd_tpu.models import draft as draft_mod

    import jax

    cfg = LlamaConfig.tiny(vocab_size=128, hidden_size=32, layers=2, heads=4,
                           intermediate_size=64, max_pos=512)
    for medusa_heads, widths in ((0, None), (3, (3, 2, 1))):
        dcfg = DraftConfig(text=cfg, medusa_heads=medusa_heads)
        k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
        tp = L.init_llama_params(k1, cfg)
        dp = draft_mod.init_draft_params(k2, dcfg)
        if medusa_heads:
            dp["medusa"] = draft_mod.init_medusa_params(k3, dcfg)
        dp = draft_mod.quantize_draft_params(dp, bits=bits)
        sfx = "_qs" if bits == 8 else "_qs4"
        assert "fc_w" + sfx in dp and dp["fc_w"].dtype == jnp.int8
        assert dp["layers"]["q_proj"].dtype == jnp.int8
        if medusa_heads:
            assert "mw" + sfx in dp["medusa"]
        dp["embed_tokens"] = tp["embed_tokens"]
        eng = EngineConfig(max_seq_len=256, prompt_pad_multiple=32,
                           tree=TreeConfig(top_k=4, max_depth=3, num_nodes=8,
                                           medusa_widths=widths))
        gen = MSDGenerator(tp, dp, cfg, dcfg, eng, eos_id=-1)
        ids = np.arange(3, 12, dtype=np.int32)
        msd = gen.generate(ids, max_new_tokens=12)
        ar = gen.naive_generate(ids, max_new_tokens=12)
        np.testing.assert_array_equal(msd.tokens, ar.tokens)
