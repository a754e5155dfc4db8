"""OpenAI-compatible adapter (`generators.py`) against a local stub
server — verifies the endpoint contract (request shape, auth header,
retry on 503/429, timeout degradation, usage counters) and end-to-end
use through the semantic actor-pool stages."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest
import ray.data as rd

from palimpzest_ray.generators import OpenAIChatGenerator, OpenAIConfig, openai_generator
from palimpzest_ray.stages.semantic import sem_filter, sem_map


class _Stub(BaseHTTPRequestHandler):
    """Echo-style chat-completions stub. Behavior keyed by the prompt:
    'FAIL_ONCE:<x>' → one 503 then success; 'ALWAYS_500' → hard 500;
    otherwise replies with a JSON body derived from the user message."""

    fail_counts: dict[str, int] = {}
    seen: list[dict] = []
    lock = threading.Lock()

    def log_message(self, *a):  # silence
        pass

    def do_POST(self):
        body = json.loads(self.rfile.read(int(self.headers["Content-Length"])))
        with self.lock:
            self.seen.append(
                {"path": self.path, "auth": self.headers.get("Authorization"),
                 "body": body})
        prompt = body["messages"][-1]["content"]
        if prompt.startswith("FAIL_ONCE:"):
            with self.lock:
                n = self.fail_counts.get(prompt, 0)
                self.fail_counts[prompt] = n + 1
            if n == 0:
                self.send_response(503)
                self.end_headers()
                return
        if prompt == "ALWAYS_400":
            self.send_response(400)
            self.end_headers()
            return
        reply = prompt.upper() if not prompt.startswith("FAIL_ONCE:") else "RECOVERED"
        out = json.dumps({
            "choices": [{"message": {"role": "assistant", "content": reply}}],
            "usage": {"prompt_tokens": len(prompt.split()),
                      "completion_tokens": len(reply.split())},
        }).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(out)))
        self.end_headers()
        self.wfile.write(out)


@pytest.fixture(scope="module")
def stub_url():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Stub)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}/v1"
    srv.shutdown()


def _gen(stub_url, **kw):
    return OpenAIChatGenerator(OpenAIConfig(
        base_url=stub_url, model="test-model", api_key="sk-test",
        backoff_s=0.01, **kw))


def test_basic_batch_and_request_shape(stub_url):
    _Stub.seen.clear()
    gen = _gen(stub_url, system_prompt="be terse")
    out = gen(["hello world", "second prompt"])
    assert out == ["HELLO WORLD", "SECOND PROMPT"]
    req = _Stub.seen[-1]
    assert req["path"].endswith("/chat/completions")
    assert req["auth"] == "Bearer sk-test"
    assert req["body"]["model"] == "test-model"
    assert req["body"]["messages"][0] == {"role": "system", "content": "be terse"}
    assert req["body"]["temperature"] == 0.0
    u = gen.get_usage()
    assert u["calls"] == 2 and u["failures"] == 0
    assert u["prompt_tokens"] == 4 and u["completion_tokens"] == 4


def test_retry_on_503_then_success(stub_url):
    gen = _gen(stub_url)
    assert gen(["FAIL_ONCE:a"]) == ["RECOVERED"]
    u = gen.get_usage()
    assert u["retries"] == 1 and u["failures"] == 0


def test_non_retryable_degrades_to_empty(stub_url):
    _Stub.seen.clear()
    gen = _gen(stub_url, max_retries=3)
    assert gen(["ALWAYS_400"]) == [""]  # relax-schema: null, not crash
    # 400 is NOT retried
    assert len(_Stub.seen) == 1
    assert gen.get_usage()["failures"] == 1


def test_unreachable_endpoint_degrades(tmp_path):
    gen = OpenAIChatGenerator(OpenAIConfig(
        base_url="http://127.0.0.1:9", model="m", max_retries=1,
        backoff_s=0.01, timeout_s=0.2))
    assert gen(["x", "y"]) == ["", ""]
    assert gen.get_usage()["failures"] == 2


def test_missing_endpoint_config_raises(monkeypatch):
    monkeypatch.delenv("OPENAI_BASE_URL", raising=False)
    with pytest.raises(ValueError, match="OPENAI_BASE_URL"):
        OpenAIConfig().resolved()


def test_env_var_resolution(monkeypatch, stub_url):
    monkeypatch.setenv("OPENAI_BASE_URL", stub_url)
    monkeypatch.setenv("OPENAI_MODEL", "env-model")
    gen = OpenAIChatGenerator(OpenAIConfig())
    assert gen(["ping"]) == ["PING"]
    assert _Stub.seen[-1]["body"]["model"] == "env-model"


def test_parallel_fanout_order_preserved(stub_url):
    gen = _gen(stub_url, max_parallel=4)
    prompts = [f"p{i}" for i in range(20)]
    assert gen(prompts) == [p.upper() for p in prompts]


def test_through_sem_map_and_filter(stub_url):
    """End-to-end: the adapter as the generator behind the actor-pool
    semantic stages (factory pickled to the actor, client built once
    per actor in __init__)."""
    ds = rd.from_items([
        {"id": 1, "text": '{"shout": "aa"}'},
        {"id": 2, "text": "true"},
    ])
    factory = openai_generator(stub_url, "m", backoff_s=0.01)
    # stub upper-cases → '{"SHOUT": "AA"}' is broken JSON for field
    # "shout" → relax-schema null; exercise the real parse path with a
    # template that survives upper-casing
    out = sem_map(ds, ["shout"], "{text}", factory,
                  concurrency=1, batch_size=8).take_all()
    assert len(out) == 2 and all(d["shout"] is None for d in out)  # keys upper-cased
    kept = sem_filter(rd.from_items([{"v": "true"}, {"v": "no"}]),
                      "{v}", factory, concurrency=1, batch_size=8).take_all()
    assert [d["v"] for d in kept] == ["true"]
