"""Pallas decode-attention kernel vs the XLA reference implementation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msd_tpu.ops.attention import NEG_INF, masked_attention
from msd_tpu.ops.pallas.decode_attention import decode_attention

INTERPRET = jax.default_backend() != "tpu"


def _mk(t, hq, hkv, s, d, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(t, hq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(s, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(s, hkv, d)), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("t,hq,hkv,kv_len", [
    (8, 4, 4, 100),    # MHA, partial cache
    (8, 4, 4, 512),    # full cache
    (16, 8, 2, 300),   # GQA
    (1, 4, 4, 37),     # AR decode shape
])
def test_matches_xla(t, hq, hkv, kv_len):
    s, d = 512, 128
    q, k, v = _mk(t, hq, hkv, s, d)
    # causal-ish bias admitting keys < kv_len plus a random tree block
    rng = np.random.default_rng(1)
    keep = np.zeros((t, s), bool)
    keep[:, :kv_len] = rng.uniform(size=(t, kv_len)) < 0.8
    keep[:, 0] = True  # no fully-masked rows
    bias = jnp.asarray(np.where(keep, 0.0, NEG_INF), jnp.float32)

    ref = masked_attention(q, k, v, bias)
    out = decode_attention(q, k, v, bias, jnp.int32(kv_len),
                           block_s=128, interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_skipped_blocks_are_invisible():
    """Garbage (NaN) keys beyond kv_len must not affect the output."""
    t, hq, hkv, s, d = 4, 4, 4, 512, 128
    q, k, v = _mk(t, hq, hkv, s, d)
    kv_len = 130
    k = k.at[256:].set(jnp.nan)
    v = v.at[256:].set(jnp.nan)
    keep = np.zeros((t, s), bool)
    keep[:, :kv_len] = True
    bias = jnp.asarray(np.where(keep, 0.0, NEG_INF), jnp.float32)
    out = decode_attention(q, k, v, bias, jnp.int32(kv_len),
                           block_s=128, interpret=INTERPRET)
    assert np.isfinite(np.asarray(out)).all()


def test_vpu_and_mxu_paths_agree():
    """The small-GT VPU path and the batched-MXU path compute the same op."""
    from msd_tpu.ops.pallas.decode_attention import VPU_MAX_GT
    s, d, hq, hkv = 512, 128, 4, 4
    kv_len = 300
    for t in (1, VPU_MAX_GT, VPU_MAX_GT + 1, 16):
        q, k, v = _mk(t, hq, hkv, s, d, seed=t)
        keep = np.zeros((t, s), bool)
        keep[:, :kv_len] = True
        bias = jnp.asarray(np.where(keep, 0.0, NEG_INF), jnp.float32)
        ref = masked_attention(q, k, v, bias)
        out = decode_attention(q, k, v, bias, jnp.int32(kv_len),
                               interpret=INTERPRET)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5, err_msg=f"t={t}")


def test_block_picker_and_xla_fallback():
    """block_s auto-sizing respects scoped VMEM; oversized GT falls back."""
    from msd_tpu.ops.pallas.decode_attention import _pick_block_s
    # 7B decode: full-head blocks fit at 128 but not 256 (measured x3 factor)
    assert _pick_block_s(1152, 32, 1, 128) == 128
    assert _pick_block_s(2048, 32, 1, 128) == 128
    # GQA heads leave room for bigger blocks
    assert _pick_block_s(2048, 8, 1, 128) in (256, 512)
    # huge GT x many heads: nothing fits -> None -> decode_attention must
    # return the XLA result (fallback, still correct)
    assert _pick_block_s(8192, 32, 128, 128) is None
    t, hq, hkv, s, d = 128, 32, 32, 8192, 128
    q, k, v = _mk(t, hq, hkv, s, d)
    keep = np.zeros((t, s), bool)
    keep[:, :700] = True
    bias = jnp.asarray(np.where(keep, 0.0, NEG_INF), jnp.float32)
    ref = masked_attention(q, k, v, bias)
    out = decode_attention(q, k, v, bias, jnp.int32(700), interpret=INTERPRET)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
