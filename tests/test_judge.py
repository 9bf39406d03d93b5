"""Judge seam: offline fallbacks, endpoint client against a live stub
server, and the llava-bench pairwise tasks."""

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import numpy as np
import pytest

pytestmark = pytest.mark.quick

from msd_tpu.harness import judge as J
from msd_tpu.harness.tasks_judge import make_llava_bench


@pytest.fixture(autouse=True)
def _clean_judge():
    yield
    J.set_judge(None)


class _StubHandler(BaseHTTPRequestHandler):
    """OpenAI-chat-shaped stub; the reply is derived from the prompt so
    tests can steer it."""

    def do_POST(self):
        n = int(self.headers.get("Content-Length", 0))
        body = json.loads(self.rfile.read(n).decode())
        prompt = body["messages"][-1]["content"]
        if "[Context]" in prompt:          # llava pairwise review
            reply = "8 6\nAssistant 2 was decent."
        elif "Correctness" in prompt:      # mmvet rubric
            reply = "0.5"
        elif "Extracted answer:" in prompt:  # mathvista extraction
            reply = "B"
        else:
            reply = "ok"
        out = json.dumps({"choices": [{"message": {"content": reply}}]})
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(out.encode())

    def log_message(self, *a):  # silence
        pass


@pytest.fixture()
def stub_url():
    srv = HTTPServer(("127.0.0.1", 0), _StubHandler)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    yield f"http://127.0.0.1:{srv.server_port}/v1/chat/completions"
    srv.shutdown()


def test_offline_helpers_return_none():
    J.set_judge(None)
    assert J.mmvet_judge_score("q", "a <AND> b", "a") is None
    assert J.llava_pairwise_scores("ctx", "q", "a1", "a2") is None
    assert J.mathvista_judge_extract("q", "resp") is None


def test_endpoint_judge_against_stub(stub_url):
    J.set_judge(f"endpoint:{stub_url}")
    assert J.mmvet_judge_score("What is x?", "-1 <AND> -5", "x=-1") == 0.5
    assert J.llava_pairwise_scores("ctx", "q", "a1", "a2") == (8.0, 6.0)
    assert J.mathvista_judge_extract("Question: pick", "It is (B)") == "B"


def test_endpoint_judge_unreachable_falls_back():
    J.set_judge("endpoint:http://127.0.0.1:1/nope")
    # a dead endpoint must not raise; helpers return None (rule fallback)
    assert J.mmvet_judge_score("q", "a", "a") is None
    assert J.llava_pairwise_scores("c", "q", "a", "b") is None


def test_set_judge_specs():
    with pytest.raises(ValueError):
        J.set_judge("garbage-spec")
    J.set_judge("offline")
    assert J.get_judge() is None


def test_mmvet_judge_path_in_task(stub_url):
    from msd_tpu.harness.tasks import make_mmvet
    t = make_mmvet()
    d = {"question": "What is x?", "answer": "-1 <AND> -5",
         "image": np.zeros((8, 8, 3), np.uint8)}
    # offline algebra: one of two conjuncts -> 0.5
    assert t.process_results(d, ["x = -1"])["gpt_eval_score"] == 0.5
    # judged: the stub always says 0.5 regardless of the offline rule
    J.set_judge(f"endpoint:{stub_url}")
    assert t.process_results(d, ["nothing right"])["gpt_eval_score"] == 0.5


def test_llava_bench_offline_proxy_and_aggregation():
    t = make_llava_bench("llava_in_the_wild")
    docs = t.synthetic_docs(3)
    # echoing the reference answer scores the ratio at 100
    rows = [t.process_results(d, [d["gpt_answer"]]) for d in docs]
    agg = t.aggregate_extra(rows)
    assert agg["gpt_eval_llava_all"] == 100.0
    for c in ("conv", "detail", "complex"):
        assert agg[f"gpt_eval_llava_{c}"] == 100.0
    # an unrelated answer scores strictly lower
    rows_bad = [t.process_results(d, ["zebra"]) for d in docs]
    assert t.aggregate_extra(rows_bad)["gpt_eval_llava_all"] < 20.0


def test_llava_bench_judged_scores(stub_url):
    J.set_judge(f"endpoint:{stub_url}")
    t = make_llava_bench("llava_bench_coco")
    d = t.synthetic_docs(1)[0]
    row = t.process_results(d, ["whatever"])
    assert row["_pair_all"] == (8.0, 6.0)
    assert t.aggregate_extra([row])["gpt_eval_llava_all"] == 75.0


def test_mathvista_judge_extraction_path(stub_url):
    from msd_tpu.harness.task_utils import mathvista as MV
    problem = {"question_type": "multi_choice", "answer_type": "text",
               "choices": ["red", "blue"], "query": "Question: color?",
               "answer": "blue", "precision": 0}
    # a response none of the offline rules can settle
    weird = "hmm, considering everything, the second one"
    J.set_judge(f"endpoint:{stub_url}")   # stub extracts 'B'
    ext = MV.extract_answer(weird, problem)
    assert ext == "B"
    # and normalization maps the letter to the choice
    assert MV.normalize_extracted_answer(
        ext, problem["choices"], "multi_choice", "text", 0) == "blue"


def test_judge_tasks_registered():
    from msd_tpu.harness.registry import get_task
    from msd_tpu.harness.tasks import register_builtin_tasks
    register_builtin_tasks()
    for name in ("llava_in_the_wild", "llava_bench_coco"):
        t = get_task(name)
        docs = t.load_docs(limit=3)
        assert len(docs) == 3
        assert isinstance(t.doc_to_text(docs[0]), str)
