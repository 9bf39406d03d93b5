"""Continuous (in-flight) batching: slot join/retire over one vmapped
segment program (msd_tpu/serve/continuous.py).

The invariant under test is the serving-level losslessness claim: whatever
mix of requests shares the slot batch, and whenever each joins, every
request's tokens are exactly what a lone generate()/generate_stream() call
produces. The reference has no equivalent (one request per worker,
LLaVA/llava/serve); this is the TPU-native upgrade documented in DESIGN.md.
"""

import numpy as np
import jax
import pytest

from msd_tpu.configs import (ClipVisionConfig, DraftConfig, EngineConfig,
                             LlamaConfig, LlavaConfig, TreeConfig,
                             IMAGE_TOKEN_INDEX)
from msd_tpu.engine.generator import MSDGenerator
from msd_tpu.models import clip_vit as C
from msd_tpu.models import draft as draft_mod
from msd_tpu.models import llama as L
from msd_tpu.models.llava import encode_image, init_projector_params
from msd_tpu.serve.continuous import ContinuousScheduler, Request


@pytest.fixture(scope="module")
def text_gen():
    cfg = LlamaConfig.tiny(vocab_size=512, hidden_size=64, layers=2, heads=4,
                           intermediate_size=128, max_pos=1024)
    dcfg = DraftConfig(text=cfg)
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    tp = L.init_llama_params(k1, cfg)
    dp = draft_mod.init_draft_params(k2, dcfg)
    dp["embed_tokens"] = tp["embed_tokens"]
    eng = EngineConfig(max_seq_len=512, prompt_pad_multiple=64,
                       tree=TreeConfig(top_k=4, max_depth=4, num_nodes=12))
    return MSDGenerator(tp, dp, cfg, dcfg, eng, eos_id=2, n_img=0)


def _prompt(seed, n):
    return np.random.default_rng(seed).integers(3, 500, size=n,
                                                dtype=np.int64).astype(np.int32)


def test_queued_requests_match_single_runs(text_gen):
    """5 requests through 2 slots (forces queueing + mid-flight rejoin),
    different prompt lengths and max_new — all bitwise equal to solo runs."""
    gen = text_gen
    reqs = [Request(ids=_prompt(i, 9 + 7 * i), max_new=24 + 8 * (i % 3),
                    seed=i) for i in range(5)]
    sched = ContinuousScheduler(gen, n_slots=2, segment=8)
    for r in reqs:
        sched.submit(r)
    done = sched.run_all()
    assert len(done) == 5
    assert sched.joined == 5
    for r in reqs:
        solo = gen.generate(r.ids, max_new_tokens=r.max_new, seed=r.seed)
        np.testing.assert_array_equal(r.tokens, solo.tokens)
        assert r.accept_steps > 0


def test_staggered_join_does_not_perturb_running_slot(text_gen):
    """A request joining mid-flight leaves the running slot's trajectory
    untouched, and itself matches a solo run."""
    gen = text_gen
    r1 = Request(ids=_prompt(10, 13), max_new=40, seed=1)
    sched = ContinuousScheduler(gen, n_slots=2, segment=6)
    sched.submit(r1)
    fin = sched.step()          # r1 running alone
    fin += sched.step()
    r2 = Request(ids=_prompt(11, 21), max_new=18, seed=2)
    sched.submit(r2)            # joins while r1 is mid-generation
    while sched.busy:
        fin += sched.step()
    assert {id(r) for r in fin} == {id(r1), id(r2)}
    for r in (r1, r2):
        solo = gen.generate(r.ids, max_new_tokens=r.max_new, seed=r.seed)
        np.testing.assert_array_equal(r.tokens, solo.tokens)


def test_bad_request_does_not_kill_the_batch(text_gen):
    """An over-long prompt fails admission SOLO (error set on that request);
    requests sharing the batch complete normally."""
    gen = text_gen
    good1 = Request(ids=_prompt(40, 15), max_new=20, seed=0)
    bad = Request(ids=_prompt(41, 500), max_new=20, seed=0)  # > engine budget
    good2 = Request(ids=_prompt(42, 9), max_new=16, seed=0)
    sched = ContinuousScheduler(gen, n_slots=2, segment=8)
    for r in (good1, bad, good2):
        sched.submit(r)
    done = sched.run_all()
    assert len(done) == 3
    assert bad.error is not None and "prompt too long" in bad.error
    for r in (good1, good2):
        assert r.error is None
        solo = gen.generate(r.ids, max_new_tokens=r.max_new, seed=r.seed)
        np.testing.assert_array_equal(r.tokens, solo.tokens)


def test_streaming_chunks_concatenate_to_final(text_gen):
    gen = text_gen
    chunks = []
    r = Request(ids=_prompt(20, 11), max_new=30, seed=0,
                on_tokens=lambda t: chunks.append(np.asarray(t)))
    sched = ContinuousScheduler(gen, n_slots=1, segment=5)
    sched.submit(r)
    sched.run_all()
    np.testing.assert_array_equal(np.concatenate(chunks), r.tokens)
    assert len(chunks) >= 2     # actually streamed across segments


def test_mixed_image_and_text_slots():
    """Image and text requests share the slot batch (the static micro-batcher
    cannot mix them); each still matches its solo run."""
    tcfg = LlamaConfig.tiny(vocab_size=512, hidden_size=64, layers=2, heads=4,
                            intermediate_size=128, max_pos=1024)
    vcfg = ClipVisionConfig.tiny(hidden_size=32, layers=2, heads=4,
                                 image_size=28, patch_size=14,
                                 intermediate_size=64)
    lcfg = LlavaConfig(text=tcfg, vision=vcfg)
    dcfg = DraftConfig(text=tcfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    tp = L.init_llama_params(keys[0], tcfg)
    dp = draft_mod.init_draft_params(keys[1], dcfg)
    lp = {"vision": C.init_clip_params(keys[2], vcfg),
          "projector": init_projector_params(keys[3], lcfg)}
    eng = EngineConfig(max_seq_len=512, prompt_pad_multiple=64,
                       tree=TreeConfig(top_k=4, max_depth=4, num_nodes=12))
    gen = MSDGenerator(tp, dp, tcfg, dcfg, eng, n_img=vcfg.num_patches,
                       eos_id=2)
    px = np.random.default_rng(3).normal(size=(3, 28, 28)).astype(np.float32)
    feats = encode_image(lp, lcfg, jax.numpy.asarray(px))

    ids_img = _prompt(30, 12)
    ids_img[4] = IMAGE_TOKEN_INDEX
    r_img = Request(ids=ids_img, img_feats=feats, max_new=20, seed=0)
    r_txt = Request(ids=_prompt(31, 17), max_new=28, seed=0)
    sched = ContinuousScheduler(gen, n_slots=2, segment=8)
    sched.submit(r_img)
    sched.submit(r_txt)
    sched.run_all()
    solo_img = gen.generate(ids_img, img_feats=feats, max_new_tokens=20)
    solo_txt = gen.generate(r_txt.ids, max_new_tokens=28)
    np.testing.assert_array_equal(r_img.tokens, solo_img.tokens)
    np.testing.assert_array_equal(r_txt.tokens, solo_txt.tokens)


def test_arrival_sim_tool_smoke():
    """tools/serve_throughput.py --arrival-sim runs both policies end-to-end
    and emits the comparison JSON line (tiny model, CPU)."""
    import json
    import os
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "tools/serve_throughput.py", "--model", "tiny",
         "--no-image", "--arrival-sim", "--requests", "4",
         "--arrival-gap", "0.05", "--slots", "2", "--max-new", "8",
         "--segment", "4"],
        capture_output=True, text=True, env=env, timeout=900,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["metric"] == "serve_arrival_sim"
    for policy in ("static", "continuous"):
        assert out[policy]["makespan_s"] > 0
        assert out[policy]["agg_tokens_per_s"] > 0


def test_http_server_continuous_mode():
    """serve_forever(..., continuous=2): concurrent requests complete with
    the same text as a solo run, streaming works, /health reports slots."""
    import json as _json
    import threading
    import urllib.request

    from msd_tpu.harness.models.llava_msd import LlavaMSD, SimpleTokenizer
    from msd_tpu.serve.server import serve_forever

    tcfg = LlamaConfig.tiny(vocab_size=512, hidden_size=64, layers=2, heads=4,
                            intermediate_size=128, max_pos=1024)
    vcfg = ClipVisionConfig.tiny(hidden_size=32, layers=2, heads=4,
                                 image_size=28, patch_size=14,
                                 intermediate_size=64)
    lcfg = LlavaConfig(text=tcfg, vision=vcfg)
    dcfg = DraftConfig(text=tcfg)
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    gen = MSDGenerator(L.init_llama_params(keys[0], tcfg),
                       draft_mod.init_draft_params(keys[1], dcfg),
                       tcfg, dcfg,
                       EngineConfig(max_seq_len=512, prompt_pad_multiple=64,
                                    tree=TreeConfig(top_k=4, max_depth=4,
                                                    num_nodes=12)),
                       n_img=vcfg.num_patches, eos_id=2)
    lp = {"vision": C.init_clip_params(keys[2], vcfg),
          "projector": init_projector_params(keys[3], lcfg)}
    enc = jax.jit(lambda px: encode_image(lp, lcfg, px))
    lm = LlavaMSD(gen, SimpleTokenizer(vocab_size=512), enc, image_size=28)

    httpd = serve_forever(lm, port=0, continuous=2, segment=4)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        outs = []

        def hit(prompt, n):
            rq = urllib.request.Request(
                f"{base}/generate",
                data=_json.dumps({"prompt": prompt,
                                  "max_new_tokens": n}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(rq, timeout=600) as r:
                outs.append((prompt, n, _json.loads(r.read())))

        ts = [threading.Thread(target=hit, args=(p, n))
              for p, n in (("alpha beta", 12), ("gamma", 16),
                           ("delta epsilon zeta", 8))]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert len(outs) == 3
        for prompt, n, o in outs:
            assert o["tokens_generated"] > 0
            # identical to a second (solo, uncontended) run of the same req
            rq = urllib.request.Request(
                f"{base}/generate",
                data=_json.dumps({"prompt": prompt,
                                  "max_new_tokens": n}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(rq, timeout=600) as r:
                again = _json.loads(r.read())
            assert again["text"] == o["text"]

        # streaming through a slot
        rq = urllib.request.Request(
            f"{base}/generate_stream",
            data=_json.dumps({"prompt": "hello", "max_new_tokens": 16,
                              "segment": 4}).encode(),
            headers={"Content-Type": "application/json"})
        lines = []
        with urllib.request.urlopen(rq, timeout=600) as r:
            for line in r:
                lines.append(_json.loads(line))
        assert lines[-1].get("done") is True
        assert lines[-1]["tokens_generated"] > 0

        with urllib.request.urlopen(f"{base}/health", timeout=30) as r:
            h = _json.loads(r.read())
        assert h["n_slots"] == 2 and h["segments_run"] > 0
        assert h["served"] >= 7
    finally:
        httpd.shutdown()
