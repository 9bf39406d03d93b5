"""Harness tests: metrics, task plumbing, and the full evaluate() pipeline
with online calibration phases on a tiny model + synthetic task."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msd_tpu.configs import (ClipVisionConfig, DraftConfig, EngineConfig,
                             LlamaConfig, LlavaConfig, TreeConfig)
from msd_tpu.engine.generator import MSDGenerator
from msd_tpu.harness import metrics as M
from msd_tpu.harness.evaluator import evaluate, simple_evaluate
from msd_tpu.harness.models.llava_msd import LlavaAR, LlavaMSD, SimpleTokenizer
from msd_tpu.harness.registry import TASK_REGISTRY, get_model
from msd_tpu.harness.tasks import make_chartqa, register_builtin_tasks
from msd_tpu.models import clip_vit as C
from msd_tpu.models import draft as draft_mod
from msd_tpu.models import llama as L
from msd_tpu.models.llava import encode_image, init_projector_params
from msd_tpu.utils.conversation import build_msd_prompt
from msd_tpu.utils.mm_utils import process_image, tokenizer_image_token


def test_relaxed_correctness():
    assert M.relaxed_correctness("10.2", "10")       # within 5%
    assert not M.relaxed_correctness("11", "10")     # 10% off
    assert M.relaxed_correctness("50%", "0.5")
    assert M.relaxed_correctness("Paris", "paris")
    assert not M.relaxed_correctness("Paris", "London")


def test_vqa_accuracy():
    assert M.vqa_accuracy("a cat", ["cat"] * 10) == 1.0  # article stripped
    assert M.vqa_accuracy("dog", ["cat"] * 10) == 0.0
    # 3 of 10 annotators agree -> full credit per VQA rule
    answers = ["cat"] * 3 + ["dog"] * 7
    assert M.vqa_accuracy("cat", answers) > 0.8


def test_anls():
    assert M.anls("hello", ["hello"]) == 1.0
    assert M.anls("helo", ["hello"]) > 0.5
    assert M.anls("xyz", ["hello"]) == 0.0


def test_mc_accuracy():
    assert M.mc_accuracy("B", "B") == 1.0
    assert M.mc_accuracy("The answer is (C).", "C") == 1.0
    assert M.mc_accuracy("A", "B") == 0.0


def test_prompt_and_tokenization():
    prompt = build_msd_prompt("What is this?", with_image=True)
    assert prompt.startswith("USER: <image>\n")
    assert prompt.endswith("ASSISTANT:")
    tok = SimpleTokenizer()
    ids = tokenizer_image_token(prompt, tok)
    assert (ids == -200).sum() == 1
    assert ids[0] == tok.bos_token_id


def test_process_image_shapes():
    img = np.random.default_rng(0).integers(0, 255, (100, 60, 3), np.uint8)
    out = process_image(img, image_size=56)
    assert out.shape == (3, 56, 56)
    assert out.dtype == np.float32


@pytest.fixture(scope="module")
def tiny_adapter_parts():
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
    enc = jax.jit(lambda px: encode_image(lp, lcfg, px))

    def make(cls=LlavaMSD, **kw):
        kw.setdefault("image_size", 28)
        tok = SimpleTokenizer(vocab_size=512)
        return cls(gen, tok, enc, **kw)

    return make


def _patch_visuals(task):
    # adapter's encode fn expects raw images; synthetic docs carry uint8 HWC
    return task


def test_evaluate_synthetic_msd(tiny_adapter_parts):
    register_builtin_tasks()
    lm = tiny_adapter_parts()
    # patch encode path: doc images are uint8 arrays; adapter handles PIL or
    # ndarray via process_image inside _prepare
    out = evaluate(lm, ["synthetic_vqa"], limit=4)
    assert "chartqa" in TASK_REGISTRY  # builtin registration happened
    res = out["results"]["synthetic_vqa"]
    assert "relaxed_overall" in res
    assert out["msd_stats"]["accept_steps"] > 0
    assert len(out["details"]["synthetic_vqa"]["samples"]) == 4


def test_evaluate_ar_baseline_matches_msd_responses(tiny_adapter_parts):
    register_builtin_tasks()
    msd = tiny_adapter_parts()
    ar = tiny_adapter_parts(cls=LlavaAR)
    o1 = evaluate(msd, ["synthetic_vqa"], limit=2)
    o2 = evaluate(ar, ["synthetic_vqa"], limit=2)
    r1 = [s["response"] for s in o1["details"]["synthetic_vqa"]["samples"]]
    r2 = [s["response"] for s in o2["details"]["synthetic_vqa"]["samples"]]
    assert r1 == r2  # losslessness surfaces at the harness level too


def test_evaluate_with_online_calibration(tiny_adapter_parts):
    register_builtin_tasks()
    vc = np.zeros((512,), np.int8)
    lm = tiny_adapter_parts(use_calibration=True, train_ratio=0.5,
                            vocab_class=vc)
    out = evaluate(lm, ["synthetic_vqa"], limit=6)
    assert lm.calibrator is not None  # fitted at the phase boundary
    assert out["msd_stats"]["avg_accept_len"] >= 1.0


def test_registry_and_cli_parsing():
    from msd_tpu.harness.__main__ import parse_model_args
    assert get_model("llava_msd_calibrated") is LlavaMSD
    assert parse_model_args("pretrained=/x,bs=2,flag=true") == {
        "pretrained": "/x", "bs": 2, "flag": True}


def test_task_bottom_slicing():
    task = make_chartqa(None)
    docs = task.load_docs(limit=10)
    ids_bottom = [d for _, d in task.doc_iterator(docs, bottom=3)]
    assert len(ids_bottom) == 3
    assert ids_bottom[0] is docs[-3]
    sharded = list(task.doc_iterator(docs, rank=1, world_size=2))
    assert all(i % 2 == 1 for i, _ in sharded)


def test_http_server_generate(tiny_adapter_parts):
    """End-to-end over the HTTP surface: /health + /generate."""
    import json as _json
    import threading
    import urllib.request

    from msd_tpu.serve.server import serve_forever

    lm = tiny_adapter_parts()
    httpd = serve_forever(lm, port=0)  # ephemeral port
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/health", timeout=30) as r:
            assert _json.loads(r.read())["status"] == "ok"
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=_json.dumps({"prompt": "hi there",
                              "max_new_tokens": 8}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=300) as r:
            out = _json.loads(r.read())
        assert out["tokens_generated"] > 0
        assert "text" in out and "tokens_per_second" in out
        # bad request surfaces cleanly
        req2 = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate", data=b"{}",
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req2, timeout=30)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()


def test_anyres_utilities():
    from msd_tpu.utils.mm_utils import (divide_to_patches,
                                        process_anyres_image,
                                        select_best_resolution)
    # wide image prefers a wide grid
    assert select_best_resolution((1200, 300), [(336, 672), (672, 336),
                                                (672, 672)]) == (672, 336)
    img = np.random.default_rng(0).integers(0, 255, (300, 640, 3), np.uint8)
    tiles = divide_to_patches(np.zeros((672, 336, 3), np.uint8), 336)
    assert len(tiles) == 2
    out = process_anyres_image(img, image_size=336)
    assert out.ndim == 4 and out.shape[1:] == (3, 336, 336)
    assert out.shape[0] >= 2  # global view + tiles


def test_longtail_tasks_registered_and_run():
    from msd_tpu.harness.registry import get_task
    from msd_tpu.harness.tasks import register_builtin_tasks
    register_builtin_tasks()
    for name in ("docvqa", "infovqa", "gqa", "pope", "scienceqa_img",
                 "mmbench_en", "ocrbench"):
        task = get_task(name)
        docs = task.load_docs(limit=4)
        assert len(docs) == 4
        reqs = task.build_requests(docs)
        assert len(reqs) == 4
    pope = get_task("pope")
    docs = pope.load_docs(limit=2)
    res = pope.process_results(docs[0], ["Yes, it is."])
    assert res["accuracy"] == 1.0 and res["yes_rate"] == 1.0
    dv = get_task("docvqa")
    d = dv.load_docs(limit=1)[0]
    assert 0.0 <= dv.process_results(d, [d.get("answer", "x")])["anls"] <= 1.0


def test_qwen_vl_eagle_legacy_adapter():
    from msd_tpu.harness.registry import get_model
    import msd_tpu.harness.models  # noqa: F401
    from msd_tpu.harness.models.qwen2_vl_msd import Qwen2VLMSD, QwenVLEagle
    assert get_model("qwen_vl_eagle") is QwenVLEagle
    assert issubclass(QwenVLEagle, Qwen2VLMSD)


def test_http_server_stream_and_microbatch(tiny_adapter_parts):
    """/generate_stream emits JSONL chunks; concurrent compatible requests
    get micro-batched through the vmapped program (batch_size > 1)."""
    import json as _json
    import threading
    import urllib.request

    from msd_tpu.serve.server import serve_forever

    lm = tiny_adapter_parts()
    httpd = serve_forever(lm, port=0)
    port = httpd.server_address[1]
    threading.Thread(target=httpd.serve_forever, daemon=True).start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate_stream",
            data=_json.dumps({"prompt": "hello", "max_new_tokens": 24,
                              "segment": 4}).encode(),
            headers={"Content-Type": "application/json"})
        lines = []
        with urllib.request.urlopen(req, timeout=300) as r:
            for line in r:
                lines.append(_json.loads(line))
        assert lines[-1].get("done") is True
        texts = [l["text"] for l in lines if "text" in l]
        assert len(texts) >= 1 and lines[-1]["tokens_generated"] > 0

        # micro-batching: warm the batch program is not needed (jit caches by
        # shape); fire 3 identical requests concurrently
        outs = []

        def hit():
            rq = urllib.request.Request(
                f"http://127.0.0.1:{port}/generate",
                data=_json.dumps({"prompt": "count to ten",
                                  "max_new_tokens": 8}).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(rq, timeout=300) as r:
                outs.append(_json.loads(r.read()))

        ts = [threading.Thread(target=hit) for _ in range(3)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert len(outs) == 3 and all(o["tokens_generated"] > 0 for o in outs)
        # all were answerable; at least some may have shared a batch
        assert all(o["text"] == outs[0]["text"] for o in outs)
    finally:
        httpd.shutdown()


def test_cli_use_msd_default_off_matches_reference():
    """lmms_eval __main__.py:109-113: --use_msd is store_true default False."""
    import argparse

    from msd_tpu.harness.__main__ import main  # noqa: F401 (import side)
    # introspect the parser defaults without running an eval
    ap = argparse.ArgumentParser("msd_tpu.harness")
    # simplest faithful check: parse_known via the real main's parser is not
    # exposed; assert on the argv contract instead
    import msd_tpu.harness.__main__ as m
    import inspect
    src = inspect.getsource(m.main)
    assert 'add_argument("--use_msd", action="store_true", default=False' \
        in src


def test_bootstrap_stderr_in_aggregation():
    from msd_tpu.harness import metrics as M2
    from msd_tpu.harness.tasks import make_chartqa
    se = M2.bootstrap_stderr([0.0, 1.0] * 50)
    assert 0.01 < se < 0.15
    assert M2.bootstrap_stderr([1.0]) == 0.0
    task = make_chartqa(None)
    agg = task.aggregate([{"relaxed_overall": 1.0},
                          {"relaxed_overall": 0.0},
                          {"relaxed_overall": 1.0}])
    assert "relaxed_overall_stderr" in agg
    assert agg["relaxed_overall"] == pytest.approx(2 / 3)


def test_mme_acc_plus_pairing():
    """MME acc_plus: both probes of an image pair must be correct
    (lmms-eval tasks/mme/utils.py aggregation semantics)."""
    from msd_tpu.harness.tasks import _mme_acc_plus

    rows = [
        {"mme_acc": 1.0, "_pair_id": "a", "_ok": 1.0},
        {"mme_acc": 1.0, "_pair_id": "a", "_ok": 1.0},   # pair a: both ok
        {"mme_acc": 1.0, "_pair_id": "b", "_ok": 1.0},
        {"mme_acc": 0.0, "_pair_id": "b", "_ok": 0.0},   # pair b: one wrong
    ]
    out = _mme_acc_plus(rows)
    assert out["mme_acc_plus"] == 0.5


def test_new_round2_tasks_registered():
    from msd_tpu.harness.registry import TASK_REGISTRY
    from msd_tpu.harness.tasks import register_builtin_tasks
    register_builtin_tasks()
    for t in ("vqav2", "mme", "seedbench", "mmstar", "realworldqa"):
        assert t in TASK_REGISTRY, t


def test_cli_use_cache_roundtrip(tmp_path, capsys):
    """--use_cache CLI round-trip: the second run serves from sqlite and
    skips generation (lmms-eval/__main__.py:170-176, api/model.py:151-218)."""
    import sqlite3

    from msd_tpu.harness.__main__ import main

    db = str(tmp_path / "resp.sqlite")
    argv = ["--model", "llava_msd_calibrated", "--model_args", "tiny=true",
            "--tasks", "pope", "--limit", "3", "--use_cache", db]
    p1 = main(argv)
    assert sqlite3.connect(db).execute(
        "SELECT COUNT(*) FROM responses").fetchone()[0] == 3

    # second run: a poisoned adapter would crash if generation were invoked;
    # instead assert via simple_evaluate with a counting wrapper
    from msd_tpu.harness.cache import CachingLM
    from msd_tpu.harness.evaluator import simple_evaluate

    class ExplodingLM:
        rank, world_size = 0, 1

        def generate_until(self, reqs):
            raise AssertionError("generation must be served from cache")

    lm = CachingLM(ExplodingLM(), db, model_tag="llava_msd_calibrated")
    out2 = simple_evaluate(model=lm, tasks=["pope"], limit=3)
    assert lm.cache_hits == 3 and lm.cache_misses == 0
    assert out2["results"]["pope"]["accuracy"] == \
        p1["results"]["pope"]["accuracy"]
    capsys.readouterr()


def test_cli_cache_requests_modes(tmp_path, capsys):
    """--cache_requests true caches doc building; refresh/delete rebuild."""
    import os

    from msd_tpu.harness.__main__ import main

    db = str(tmp_path / "resp.sqlite")
    argv = ["--model", "llava_msd_calibrated", "--model_args", "tiny=true",
            "--tasks", "pope", "--limit", "2", "--use_cache", db,
            "--cache_requests", "true"]
    main(argv)
    reqdir = db + ".requests"
    cached = [f for f in os.listdir(reqdir) if f.startswith("requests_pope")]
    assert cached, "request cache file missing"
    main(argv)  # second run reads the cached docs without error
    capsys.readouterr()


def test_cli_config_yaml_sweep(tmp_path, capsys):
    """--config yaml with a LIST of run configs expands into sequential runs
    (lmms-eval/__main__.py:344-358)."""
    from msd_tpu.harness.__main__ import main

    cfg = tmp_path / "sweep.yaml"
    cfg.write_text(
        "- tasks: pope\n  limit: 2\n"
        "- tasks: docvqa\n  limit: 3\n")
    payloads = main(["--model", "llava_msd_calibrated", "--model_args",
                     "tiny=true", "--tasks", "ignored", "--config", str(cfg)])
    assert isinstance(payloads, list) and len(payloads) == 2
    assert "pope" in payloads[0]["results"]
    assert "docvqa" in payloads[1]["results"]
    capsys.readouterr()


def test_cli_longtail_flags(tmp_path, capsys):
    """--num_fewshot/--system_instruction/--gen_kwargs/--predict_only/
    --write_out/--check_integrity/--show_config/--seed behave
    (lmms-eval/__main__.py:85-300)."""
    from msd_tpu.harness.__main__ import main

    payload = main([
        "--model", "llava_msd_calibrated", "--model_args", "tiny=true",
        "--tasks", "pope", "--limit", "3", "--num_fewshot", "2",
        "--system_instruction", "Answer briefly.",
        "--gen_kwargs", "max_new_tokens=8", "--write_out",
        "--check_integrity", "--show_config", "--seed", "7",
        "--predict_only"])
    # predict_only: no metrics, samples present (implies log_samples)
    assert payload["results"]["pope"] == {}
    assert len(payload["details"]["pope"]["samples"]) == 3
    err = capsys.readouterr().err
    # write_out printed the composed prompt: system first, fewshot target
    # pairs before the question
    assert "[write_out] task=pope" in err
    assert err.index("Answer briefly.") < err.index("region")
    # show_config dumped the resolved args
    assert '"num_fewshot": 2' in err


def test_fewshot_context_composition():
    """fewshot_context: first-k OTHER docs as 'prompt target' pairs."""
    from msd_tpu.harness.registry import TASK_REGISTRY, get_task
    from msd_tpu.harness.tasks import register_builtin_tasks

    if not TASK_REGISTRY:
        register_builtin_tasks()
    task = get_task("pope")
    docs = task.load_docs(limit=4)
    ctx = task.fewshot_context(docs, 1, 2)
    assert ctx.endswith("\n\n")
    # doc 1 (the target doc) is excluded; docs 0 and 2 serve as shots
    assert task.doc_to_text(docs[1]) not in ctx
    assert task.doc_to_text(docs[0]).split("\n")[0] in ctx
    # each shot carries its gold answer inline
    assert docs[0]["answer"] in ctx


def test_cli_gen_kwargs_override_applies():
    """--gen_kwargs overrides every task's generation parameters."""
    from msd_tpu.harness.registry import TASK_REGISTRY, get_task
    from msd_tpu.harness.tasks import register_builtin_tasks

    if not TASK_REGISTRY:
        register_builtin_tasks()
    task = get_task("docvqa")
    docs = task.load_docs(limit=2)
    reqs = task.build_requests(docs, gen_kwargs_override={
        "max_new_tokens": 5, "temperature": 0.7})
    assert all(r.arguments[1]["max_new_tokens"] == 5 for r in reqs)
    assert all(r.arguments[1]["temperature"] == 0.7 for r in reqs)


def test_cli_validation_errors():
    """Reference validations: fewshot_as_multiturn and batch_size guards."""
    import pytest

    from msd_tpu.harness.__main__ import main

    base = ["--model", "llava_msd_calibrated", "--model_args", "tiny=true",
            "--tasks", "pope", "--limit", "1"]
    with pytest.raises(SystemExit):
        main(base + ["--fewshot_as_multiturn"])  # needs apply_chat_template
    with pytest.raises(SystemExit):
        main(base + ["--batch_size", "4"])  # MSD decode is bs=1


def test_check_integrity_catches_broken_task():
    """check_integrity raises on a task whose doc_to_text breaks."""
    import pytest

    from msd_tpu.harness.evaluator import check_integrity
    from msd_tpu.harness.registry import register_task
    from msd_tpu.harness.tasks import TaskConfig

    register_task("broken_task_ci", TaskConfig(
        name="broken_task_ci",
        doc_to_text=lambda d: None,  # invalid
        doc_to_visual=lambda d: [],
        process_results=lambda d, r: {"accuracy": 0.0},
        synthetic_docs=lambda n: [{"question": "q", "answer": "a"}] * n))
    with pytest.raises(AssertionError):
        check_integrity(["broken_task_ci"])


def test_serve_chat_cli(capsys):
    """msd_tpu.serve.cli chat_once: multi-turn conversation through the
    engine, streamed output == returned reply (llava/serve/cli.py analog)."""
    import io

    from msd_tpu.harness.models.llava_msd import LlavaMSD
    from msd_tpu.serve.cli import chat_once
    from msd_tpu.utils.conversation import vicuna_v1

    adapter = LlavaMSD.from_tiny(use_msd=True)
    sp = adapter._sp({"temperature": 0.0})
    conv = vicuna_v1()
    buf = io.StringIO()
    r1 = chat_once(adapter, conv, "hello there", None, sp, 16, out=buf)
    assert isinstance(r1, str)
    assert buf.getvalue().strip() == r1
    # the reply is recorded in the conversation for the next turn
    assert conv.messages[-1] == (conv.roles[1], r1)
    r2 = chat_once(adapter, conv, "and again", None, sp, 16)
    assert conv.get_prompt().count(conv.roles[0]) == 2
    assert isinstance(r2, str)


def test_from_pretrained_attn_impl_override(tmp_path):
    """model_args attn_impl=auto / pallas_min_s reach the target config
    (the serve --attn-impl passthrough for long-context serving)."""
    import numpy as np

    from msd_tpu.harness.models.llava_msd import LlavaMSD
    from tests.test_weights_roundtrip import (make_draft_checkpoint,
                                              make_llava_checkpoint)

    rng = np.random.default_rng(0)
    ck = tmp_path / "llava"
    dk = tmp_path / "draft"
    make_llava_checkpoint(str(ck), rng)
    make_draft_checkpoint(str(dk), rng)
    adapter = LlavaMSD.from_pretrained(str(ck), str(dk), attn_impl="auto",
                                       pallas_min_s=512)
    assert adapter.gen.tcfg.attn_impl == "auto"
    assert adapter.gen.tcfg.pallas_min_s == 512


def test_fractional_limit_applied_once():
    """--limit 0.5 over a 64-doc pool must evaluate 32 docs, not 0.5^2*64=16
    (load_docs truncates; the evaluator must not let doc_iterator re-apply
    a fractional limit to the already-truncated list)."""
    from msd_tpu.harness.evaluator import evaluate
    from msd_tpu.harness.models.llava_msd import LlavaMSD
    from msd_tpu.harness.registry import get_task
    from msd_tpu.harness.tasks import register_builtin_tasks

    register_builtin_tasks()
    task = get_task("pope")
    pool = len(task.load_docs(limit=None))
    lm = LlavaMSD.from_tiny(use_msd=False)
    res = evaluate(lm, ["pope"], limit=0.5)
    assert res["details"]["pope"]["n_docs"] == max(1, int(pool * 0.5))


def test_gen_kwargs_override_does_not_leak():
    """build_requests(gen_kwargs_override=...) merges per call; the
    registry-global TaskConfig must keep its defaults for later runs of a
    --config sweep."""
    from msd_tpu.harness.registry import get_task
    from msd_tpu.harness.tasks import register_builtin_tasks

    register_builtin_tasks()
    task = get_task("pope")
    before = dict(task.gen_kwargs)
    docs = task.load_docs(limit=4)
    reqs = task.build_requests(docs,
                               gen_kwargs_override={"max_new_tokens": 4})
    assert reqs[0].arguments[1]["max_new_tokens"] == 4
    assert task.gen_kwargs == before
    reqs2 = task.build_requests(docs)
    assert reqs2[0].arguments[1]["max_new_tokens"] == \
        before["max_new_tokens"]


def test_mathverse_letter_scoring_anchored():
    """Option-letter scoring accepts '(B)', 'B.', 'B) ...' and rejects a
    letter buried mid-word ('The answer is B' must not match gold 'H' via
    the 'h' in 'The')."""
    from msd_tpu.harness.task_utils.mathverse import score_answer

    assert score_answer("q", "B", "(B)")
    assert score_answer("q", "B", "B.")
    assert score_answer("q", "b", "B) because")
    assert score_answer("q", "B", "B")
    assert not score_answer("q", "H", "The answer is B")
    assert not score_answer("q", "H", "Hello")
    assert not score_answer("q", "B", "A")


def test_new_round3_tasks_registered_and_run():
    """Round-3 long-tail tasks: registration + synthetic-doc request build
    (ok_vqa/stvqa/hallusion_bench/mmbench_cn/seedbench_2 + the caption
    family textcaps/nocaps/flickr30k)."""
    from msd_tpu.harness.registry import get_task, TASK_REGISTRY
    from msd_tpu.harness.tasks import register_builtin_tasks
    register_builtin_tasks()
    for name in ("ok_vqa", "stvqa", "hallusion_bench", "mmbench_cn",
                 "seedbench_2", "textcaps_val", "nocaps_val",
                 "flickr30k_test"):
        assert name in TASK_REGISTRY, name
        task = get_task(name)
        docs = task.load_docs(limit=4)
        assert len(docs) == 4
        reqs = task.build_requests(docs)
        assert len(reqs) == 4
    # ok_vqa prompt carries the Unanswerable hint (ok_vqa_val2014_lite.yaml)
    okvqa = get_task("ok_vqa")
    d = okvqa.load_docs(limit=1)[0]
    assert "Unanswerable" in okvqa.doc_to_text(d)


def test_hallusion_bench_group_metrics():
    """qAcc/fAcc are min-over-group (evaluate_hb.py:91-117): one wrong
    answer zeroes its question group and its figure group."""
    from msd_tpu.harness.registry import get_task
    from msd_tpu.harness.tasks import register_builtin_tasks
    register_builtin_tasks()
    task = get_task("hallusion_bench")
    docs = task.load_docs(limit=4)  # figure groups {0: d0,d1}, {1: d2,d3}
    rows = []
    for i, d in enumerate(docs):
        gt_yes = d["gt_answer"] == "1"
        # answer d0 wrong, the rest right
        pred = ("No." if gt_yes else "Yes.") if i == 0 else (
            "Yes." if gt_yes else "No.")
        rows.append(task.process_results(d, [pred]))
    assert [r["aAcc"] for r in rows] == [0.0, 1.0, 1.0, 1.0]
    extra = task.aggregate_extra(rows)
    # 4 distinct question_ids -> qAcc = 3/4; figure_id groups {0,1},{2,3}
    # -> figure 0 has the wrong answer -> fAcc = 1/2
    assert extra["qAcc"] == 0.75
    assert extra["fAcc"] == 0.5


def test_caption_ref_key_fallbacks():
    """The caption factory reads whichever ref field the dataset uses:
    textcaps 'caption_str', nocaps 'annotations_captions', flickr30k
    'caption' (each reference utils.py reads its own)."""
    from msd_tpu.harness.tasks import make_caption_task
    t = make_caption_task("cap")
    for key in ("caption_str", "annotations_captions", "caption", "answer"):
        res = t.process_results({key: ["a red square", "red square"]},
                                ["a red square"])
        assert res["_refs"] == ["a red square", "red square"]
        assert res["_pred"] == "a red square"


def test_videomme_end_to_end_with_video_adapter():
    """videomme task docs carry video frames; evaluate() routes them through
    the tiny qwen2_vl_msd adapter's video branch (frame sampling + temporal
    tower) and scores MC accuracy."""
    from msd_tpu.harness.evaluator import evaluate
    from msd_tpu.harness.models.qwen2_vl_msd import Qwen2VLMSD
    from msd_tpu.harness.registry import get_task
    from msd_tpu.harness.tasks import register_builtin_tasks

    register_builtin_tasks()
    task = get_task("videomme")
    d = task.load_docs(limit=2)[0]
    assert task.doc_to_visual(d)[0].ndim == 4  # [T, H, W, 3]
    assert "The best answer is:" in task.doc_to_text(d)
    adapter = Qwen2VLMSD.from_tiny(max_num_frames=4)
    out = evaluate(adapter, ["videomme"], limit=2)
    res = out["results"]["videomme"]
    assert "accuracy" in res
    assert 0.0 <= res["accuracy"] <= 1.0


def test_prompt_truncation_preserves_image_token(tiny_adapter_parts):
    """Round-4 ADVICE: middle-truncation must keep exactly ONE <image>
    token (fusion sees a token/feature mismatch otherwise), even when the
    context embeds a literal '<image>' that tokenizes into a second
    image-token occurrence in the tail."""
    from msd_tpu.configs import IMAGE_TOKEN_INDEX
    lm = tiny_adapter_parts()
    cap = lm.gen.max_prompt_tokens
    # long context forcing truncation, with a literal <image> mid-text
    ctx = ("word " * (cap * 2)) + " <image> " + ("tail " * 64) + "question?"
    ids, feats = lm._prepare(ctx, [np.zeros((28, 28, 3), np.uint8)])
    assert len(ids) <= cap
    assert int(np.sum(ids == IMAGE_TOKEN_INDEX)) == 1
    assert feats is not None
    # the surviving image token is the PROMPT-level one (near the head)
    assert int(np.argmax(ids == IMAGE_TOKEN_INDEX)) < cap // 2
