"""Multi-device tests on the 8-way virtual CPU mesh:
- TP-sharded speculative inference produces identical results to single-device
- sharded draft training step runs and matches the unsharded loss
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from msd_tpu.configs import DraftConfig, EngineConfig, LlamaConfig, TreeConfig
from msd_tpu.engine.generator import MSDGenerator
from msd_tpu.models import draft as draft_mod
from msd_tpu.models import llama as L
from msd_tpu.parallel.sharding import (draft_param_specs, llama_param_specs,
                                       make_mesh, shard_params)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 4,
                                reason="needs >=4 virtual devices")


def build(seed=0):
    cfg = LlamaConfig.tiny(vocab_size=256, hidden_size=64, layers=2, heads=8,
                           intermediate_size=128, max_pos=1024)
    dcfg = DraftConfig(text=cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    tp = L.init_llama_params(k1, cfg)
    dp = draft_mod.init_draft_params(k2, dcfg)
    eng = EngineConfig(max_seq_len=256, prompt_pad_multiple=32,
                       tree=TreeConfig(top_k=4, max_depth=4, num_nodes=12))
    return cfg, dcfg, tp, dp, eng


def test_tp_sharded_inference_matches_single_device():
    cfg, dcfg, tp, dp, eng = build()
    ids = np.arange(3, 15, dtype=np.int32)

    gen0 = MSDGenerator(tp, dp, cfg, dcfg, eng, eos_id=2)
    ref = gen0.generate(ids, max_new_tokens=16)

    mesh = make_mesh(4, dp=1, tp=4)
    tp_sh = shard_params(tp, llama_param_specs(cfg), mesh)
    dp_sh = shard_params(dp, draft_param_specs(dcfg, "fc_b" in dp), mesh)
    gen1 = MSDGenerator(tp_sh, dp_sh, cfg, dcfg, eng, eos_id=2)
    out = gen1.generate(ids, max_new_tokens=16)

    np.testing.assert_array_equal(out.tokens, ref.tokens)
    assert out.accept_steps == ref.accept_steps

    # AR baseline under TP as well
    ar0 = gen0.naive_generate(ids, max_new_tokens=16)
    ar1 = gen1.naive_generate(ids, max_new_tokens=16)
    np.testing.assert_array_equal(ar1.tokens, ar0.tokens)


def test_sharded_train_step_matches_unsharded():
    from msd_tpu.train.draft_train import (Batch, TrainConfig, draft_loss,
                                           make_optimizer, train_step)

    cfg = LlamaConfig.tiny(vocab_size=128, hidden_size=64, layers=1, heads=8,
                           intermediate_size=128, max_pos=256)
    dcfg = DraftConfig(text=cfg)
    dp = draft_mod.init_draft_params(jax.random.PRNGKey(0), dcfg)
    head_w = jax.random.normal(jax.random.PRNGKey(1), (64, 128)) * 0.1
    cos_t, sin_t = L.make_rope(cfg, 64)

    rng = np.random.default_rng(0)
    B, T, H = 4, 16, 64
    batch = Batch(
        emb_next=jnp.asarray(rng.normal(size=(B, T, H)), jnp.float32) * 0.1,
        hidden=jnp.asarray(rng.normal(size=(B, T, H)), jnp.float32) * 0.1,
        target=jnp.asarray(rng.normal(size=(B, T, H)), jnp.float32) * 0.1,
        loss_mask=jnp.ones((B, T), jnp.float32),
        attn_len=jnp.full((B,), T, jnp.int32),
        img_mask=jnp.zeros((B, T), jnp.bool_))

    v0, p0, _, _ = draft_loss(dp, dcfg, head_w, batch, cos_t, sin_t)

    mesh = make_mesh(4, dp=2, tp=2)
    dp_sh = shard_params(dp, draft_param_specs(dcfg, "fc_b" in dp), mesh)
    batch_sh = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P("data"))), batch)
    head_sh = jax.device_put(head_w, NamedSharding(mesh, P(None, "model")))
    v1, p1, _, _ = jax.jit(draft_loss, static_argnums=(1,))(
        dp_sh, dcfg, head_sh, batch_sh, cos_t, sin_t)

    np.testing.assert_allclose(float(v1), float(v0), rtol=1e-5)
    np.testing.assert_allclose(float(p1), float(p0), rtol=1e-5)

    # full optimizer step executes under the mesh
    tc = TrainConfig(warmup_steps=2, total_steps=10)
    opt = make_optimizer(tc)
    opt_state = opt.init(dp_sh)
    import functools
    step = jax.jit(functools.partial(train_step, cfg=dcfg, tcfg=tc, opt=opt))
    dp2, _, _, metrics = step(dp_sh, opt_state, head_w=head_sh,
                              batch=batch_sh, key=jax.random.PRNGKey(3),
                              cos_t=cos_t, sin_t=sin_t)
    assert np.isfinite(float(metrics["loss"]))


import pytest


@pytest.mark.parametrize("bits", [8, 4])
def test_quantized_params_shard_and_decode(bits):
    """int8/int4-quantized target shards over the TP mesh and decodes
    losslessly (incl. packed-int4 columns sharded over 'model')."""
    import numpy as np

    from msd_tpu.configs import DraftConfig, EngineConfig, LlamaConfig, TreeConfig
    from msd_tpu.engine.generator import MSDGenerator
    from msd_tpu.models import draft as draft_mod
    from msd_tpu.models import llama as L
    from msd_tpu.parallel.sharding import (llama_param_specs, make_mesh,
                                           shard_params)

    mesh = make_mesh(8)
    tp_size = mesh.shape["model"]
    cfg = LlamaConfig.tiny(vocab_size=128, hidden_size=16 * tp_size,
                           layers=2, heads=tp_size,
                           intermediate_size=32 * tp_size, max_pos=512)
    dcfg = DraftConfig(text=cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tparams = L.quantize_llama_params(L.init_llama_params(k1, cfg), bits=bits)
    tparams = shard_params(tparams, llama_param_specs(cfg), mesh)
    assert tparams["layers"]["q_proj"].dtype == jnp.int8
    dp = draft_mod.init_draft_params(k2, dcfg)
    eng = EngineConfig(max_seq_len=256, prompt_pad_multiple=32,
                       tree=TreeConfig(top_k=4, max_depth=3, num_nodes=8))
    gen = MSDGenerator(tparams, dp, cfg, dcfg, eng, eos_id=-1)
    ids = np.arange(3, 12, dtype=np.int32)
    msd = gen.generate(ids, max_new_tokens=10)
    ar = gen.naive_generate(ids, max_new_tokens=10)
    np.testing.assert_array_equal(msd.tokens, ar.tokens)


def test_pipeline_forward_matches_scan():
    """GPipe pipeline over a 4-stage mesh == the plain stacked-scan forward."""
    import numpy as np
    from jax.sharding import Mesh

    from msd_tpu.configs import LlamaConfig
    from msd_tpu.models import llama as L
    from msd_tpu.ops.attention import causal_prefill_bias
    from msd_tpu.parallel.pipeline import (pipeline_forward,
                                           shard_layers_for_pipeline)

    cfg = LlamaConfig.tiny(vocab_size=128, hidden_size=32, layers=8, heads=4,
                           intermediate_size=64, max_pos=256)
    params = L.init_llama_params(jax.random.PRNGKey(0), cfg)
    devs = np.array(jax.devices()[:4])
    mesh = Mesh(devs, ("stage",))
    pparams = shard_layers_for_pipeline(params, mesh)

    M, T = 3, 16
    emb = jax.random.normal(jax.random.PRNGKey(1), (M, T, cfg.hidden_size),
                            jnp.float32) * 0.1
    bias = causal_prefill_bias(T, T)
    cos_t, sin_t = L.make_rope(cfg, 64)

    got = pipeline_forward(pparams, cfg, emb, bias, cos_t, sin_t, mesh)

    kv = L.init_kv_cache(cfg, T)
    ref = jnp.stack([
        L.llama_forward(params, cfg, emb[m], jnp.arange(T, dtype=jnp.int32),
                        kv, jnp.int32(0), bias, cos_t, sin_t)[0]
        for m in range(M)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_sequence_parallel_forward_matches():
    """Sequence-sharded prefill == single-device forward."""
    import numpy as np
    from jax.sharding import Mesh

    from msd_tpu.configs import LlamaConfig
    from msd_tpu.models import llama as L
    from msd_tpu.ops.attention import causal_prefill_bias
    from msd_tpu.parallel.sequence import sequence_parallel_forward

    # GQA config (kv_heads < heads) so the ring path's head expansion is hit
    cfg = LlamaConfig.tiny(vocab_size=128, hidden_size=32, layers=3, heads=4,
                           kv_heads=2, intermediate_size=64, max_pos=256)
    params = L.init_llama_params(jax.random.PRNGKey(0), cfg)
    mesh = Mesh(np.array(jax.devices()[:4]), ("seq",))
    T = 32
    emb = jax.random.normal(jax.random.PRNGKey(1), (T, cfg.hidden_size),
                            jnp.float32) * 0.1
    bias = causal_prefill_bias(T, T)
    cos_t, sin_t = L.make_rope(cfg, 64)

    kv = L.init_kv_cache(cfg, T)
    ref, _ = L.llama_forward(params, cfg, emb, jnp.arange(T, dtype=jnp.int32),
                             kv, jnp.int32(0), bias, cos_t, sin_t)
    for mode in ("gather", "ring"):
        got = sequence_parallel_forward(params, cfg, emb, bias, cos_t, sin_t,
                                        mesh, mode=mode)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5,
                                   err_msg=f"mode={mode}")


def test_zero_optimizer_state_sharding():
    """ZeRO-1 analog (SURVEY §2.7 DeepSpeed row): adam moments shard over
    'data' on top of the TP layout — per-device moment memory shrinks by dp —
    and a DraftTrainer(mesh=...) step runs and PRESERVES the sharding."""
    from msd_tpu.parallel.sharding import (shard_opt_state_zero,
                                           zero_opt_specs)
    from msd_tpu.train.draft_train import TrainConfig
    from msd_tpu.train.trainer import DraftTrainer, TrainerConfig

    cfg = LlamaConfig.tiny(vocab_size=128, hidden_size=64, layers=1, heads=8,
                           intermediate_size=128, max_pos=256)
    dcfg = DraftConfig(text=cfg)
    dparams = draft_mod.init_draft_params(jax.random.PRNGKey(0), dcfg)
    mesh = make_mesh(4, dp=2, tp=2)
    specs = draft_param_specs(dcfg, "fc_b" in dparams)

    zspecs = zero_opt_specs(specs, dparams, mesh)
    # fc_w is replicated as a param -> its moment gains a 'data' shard
    assert zspecs["fc_w"] == P("data", None)
    # column-parallel q_proj keeps 'model' and adds 'data' on a free axis
    assert "model" in tuple(zspecs["layers"]["q_proj"])
    assert "data" in tuple(zspecs["layers"]["q_proj"])

    head_w = jax.random.normal(jax.random.PRNGKey(1), (64, 128)) * 0.1
    head_sh = jax.device_put(head_w, NamedSharding(mesh, P(None, "model")))
    tc = TrainerConfig(train=TrainConfig(warmup_steps=2, total_steps=10),
                       batch_size=2, max_len=16, num_epochs=1,
                       log_every=10 ** 9)
    trainer = DraftTrainer(dcfg, dparams, head_sh, tc, mesh=mesh)

    def adam_node(state):
        return [n for n in jax.tree.leaves(
            state, is_leaf=lambda n: hasattr(n, "mu")) if hasattr(n, "mu")][0]

    mu_fc = adam_node(trainer.opt_state).mu["fc_w"]
    assert mu_fc.sharding.spec == P("data", None)
    # per-device bytes shrank by the data-axis size
    assert mu_fc.addressable_shards[0].data.size == mu_fc.size // 2

    # one real step through the trainer keeps the ZeRO layout
    rng = np.random.default_rng(0)
    T, H = 16, 64
    recs = [{"emb_next": rng.normal(size=(T, H)).astype(np.float32) * 0.1,
             "hidden": rng.normal(size=(T, H)).astype(np.float32) * 0.1,
             "target": rng.normal(size=(T, H)).astype(np.float32) * 0.1,
             "loss_mask": np.ones((T,), np.float32),
             "attn_len": np.int32(T),
             "img_mask": np.zeros((T,), bool)} for _ in range(4)]
    out = trainer.run_epoch([], recs, log=lambda *a: None)
    assert np.isfinite(out["loss"])
    mu_fc2 = adam_node(trainer.opt_state).mu["fc_w"]
    assert mu_fc2.sharding.spec == P("data", None)


def test_tp_sharded_medusa_inference_matches_single_device():
    """TP-sharded medusa-mode decode is bit-identical to single device
    (medusa heads replicated; lm_head column-sharded with gathered top_k)."""
    cfg, dcfg, tp, dp, eng = build()
    import dataclasses
    dcfg = dataclasses.replace(dcfg, medusa_heads=3)
    dp = dict(dp)
    dp["medusa"] = draft_mod.init_medusa_params(jax.random.PRNGKey(5), dcfg)
    ids = np.arange(3, 15, dtype=np.int32)

    gen0 = MSDGenerator(tp, dp, cfg, dcfg, eng, eos_id=2)
    ref = gen0.generate(ids, max_new_tokens=16)

    mesh = make_mesh(4, dp=1, tp=4)
    tp_sh = shard_params(tp, llama_param_specs(cfg), mesh)
    dp_sh = shard_params(dp, draft_param_specs(dcfg, "fc_b" in dp), mesh)
    gen1 = MSDGenerator(tp_sh, dp_sh, cfg, dcfg, eng, eos_id=2)
    out = gen1.generate(ids, max_new_tokens=16)
    np.testing.assert_array_equal(out.tokens, ref.tokens)
