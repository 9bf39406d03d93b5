"""bench.py draft/records cache semantics (round-4 VERDICT weak #1/#2).

The driver's round-4 run cached a 1-of-5-rounds draft and the opt-in
resume default would have measured its alpha ~1.9 forever. These tests pin
the cache-layer invariants the fix relies on: bf16-safe round-trips,
records-per-round staleness detection, and the meta fields the auto-resume
decision reads.
"""

import json

import numpy as np
import pytest

import bench


def test_draft_cache_roundtrip_bf16(tmp_path):
    import ml_dtypes
    tree = {
        "fc": {"w": np.arange(12, dtype=np.float32).reshape(3, 4)
               .astype(ml_dtypes.bfloat16)},
        "mb": np.ones((2, 3), np.float32),
    }
    trajs = [np.arange(5, dtype=np.int32), np.arange(3, dtype=np.int32) + 7]
    path = str(tmp_path / "d.npz")
    bench.save_draft_cache(path, tree, {"rounds_done": 2, "truncated": True},
                           trajs)
    loaded, meta, t2 = bench.load_draft_cache(path)
    assert meta == {"rounds_done": 2, "truncated": True}
    assert loaded["fc"]["w"].dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(
        loaded["fc"]["w"].astype(np.float32),
        tree["fc"]["w"].astype(np.float32))
    np.testing.assert_array_equal(loaded["mb"], tree["mb"])
    assert len(t2) == 2
    np.testing.assert_array_equal(t2[0], trajs[0])
    np.testing.assert_array_equal(t2[1], trajs[1])


def test_draft_cache_missing_and_corrupt(tmp_path):
    assert bench.load_draft_cache(str(tmp_path / "nope.npz")) is None
    bad = tmp_path / "bad.npz"
    bad.write_bytes(b"not an npz")
    assert bench.load_draft_cache(str(bad)) is None


def test_records_cache_roundtrip_and_round_staleness(tmp_path):
    recs = [{
        "hidden": np.random.default_rng(0).normal(
            size=(8, 4)).astype(np.float32),
        "loss_mask": np.ones((8,), np.float32),
        "attn_len": np.int32(6),
        "exp_ids": np.arange(8, dtype=np.int32),
    }, {
        "hidden": np.zeros((8, 4), np.float32),
        "loss_mask": np.zeros((8,), np.float32),
        "attn_len": np.int32(8),
        "exp_ids": np.arange(8, dtype=np.int32) + 1,
    }]
    trajs = [np.arange(4, dtype=np.int32)] * 2
    path = str(tmp_path / "sub" / "d.npz.recs.npz")  # dir auto-created
    bench.save_records_cache(path, recs, round_idx=3, trajs=trajs)
    # matching round loads
    out = bench.load_records_cache(path, expect_round=3)
    assert out is not None
    recs2, trajs2 = out
    assert len(recs2) == 2 and len(trajs2) == 2
    np.testing.assert_array_equal(recs2[0]["hidden"], recs[0]["hidden"])
    assert recs2[1]["attn_len"] == 8
    assert isinstance(recs2[1]["attn_len"], np.int32)  # not a 0-d array
    # stale round is rejected (records belong to a different draft state)
    assert bench.load_records_cache(path, expect_round=2) is None
    assert bench.load_records_cache(str(tmp_path / "no.npz"), 0) is None


def test_cache_key_is_stable_and_selective():
    """The key must ignore non-draft-shaping args (budget, heldout, temp
    probe) and change with draft-shaping ones. The 7b default key value is
    pinned so a refactor cannot silently orphan the on-disk cache."""
    import argparse
    base = dict(model="7b", prompt_tokens=64, max_new=256, image=True,
                draft_mode="medusa",
                medusa_widths="10,8,6,5,4,3,2,2,2,1,1,1,1,1",
                records_source="engine", distill_lr=1e-3, distill_pw=0.1,
                distill_noise_rel=0.01, distill_vnorm=True,
                distill_rollout=0, distill_medusa_w=1.0, distill_steps=1700,
                distill_prompts=8, head_sharpen=6.0, greedy_round_bits=6,
                share_prefill=True, canonical_attn=True, tree_depth=14,
                tree_topk=10, tree_nodes=96, quant="none", dtype=None)
    k0 = bench.draft_cache_key(argparse.Namespace(**base))
    # the driver's on-disk 7b cache (artifacts/draft_cache) hashes to this
    assert k0 == "471e598c36271822"
    same = bench.draft_cache_key(
        argparse.Namespace(**base, budget_s=9999.0, heldout_prompts=32,
                           temperature=0.5))
    assert same == k0  # extra non-key args are ignored
    diff = bench.draft_cache_key(
        argparse.Namespace(**{**base, "distill_steps": 1800}))
    assert diff != k0


def test_committed_default_cache_is_present_and_complete():
    """The driver's `python bench.py` must hit the COMMITTED warm cache:
    build the default namespace through the real parser + the same
    effective_args postprocessing main() runs, hash it, and assert the
    tracked npz exists at that path with a complete (rounds_done >= 5,
    untruncated) meta. Fails if a hash-relevant default drifts (which
    would silently orphan the cache and send the driver into a cold
    distill) or if the cache file is dropped from the tree."""
    import json as _json
    import os

    args, _ = bench.effective_args(bench.build_parser().parse_args([]))
    path = os.path.join(
        os.path.dirname(os.path.abspath(bench.__file__)),
        args.draft_ckpt,
        f"draft_{args.model}_{args.draft_mode}_"
        f"{bench.draft_cache_key(args)}.npz")
    assert os.path.exists(path), (
        f"committed draft cache missing at {path} — either a bench default "
        "changed (re-run the distillation and commit the new npz) or the "
        "cache was deleted")
    z = np.load(path, allow_pickle=False)          # lazy: reads only meta
    meta = _json.loads(bytes(z["__meta__"]).decode())
    assert int(meta.get("rounds_done", 0)) >= 5
    assert not meta.get("truncated", False)
