"""Public LLM client adapter for the semantic layer.

The semantic stages (``stages/semantic.py``) take a *generator factory*
— ``Callable[[], Callable[[list[str]], list[str]]]`` — constructed once
per map_batches actor. This module provides the production factory: an
**OpenAI-compatible chat-completions HTTP client** built on stdlib
``urllib`` only (no SDK dependency), so it works against any endpoint
that speaks the public ``POST {base_url}/chat/completions`` protocol
(OpenAI, vLLM, llama.cpp server, Ollama's compat route, ...).

Reference parity: ``src/palimpzest/query/generators/generators.py:98-420``
(the reference's ``Generator`` wraps litellm/google clients, retries,
and per-call usage accounting). This adapter keeps the same contract —
config → callable, retry with backoff, token/cost counters — but stays
batch-first: a batch of prompts fans out over a small thread pool inside
the actor (HTTP latency hiding; the server still sees one request per
prompt, which is the chat-completions unit).

Design for Ray:
- the *config* object is what you ship in ``fn_constructor_kwargs`` —
  it is tiny and picklable; the HTTP state (opener, counters) is built
  per actor by :meth:`OpenAIConfig.factory`.
- usage counters live per actor and are folded into the Ray metrics via
  ``get_usage()``; they are also exposed process-wide through
  :func:`usage_snapshot` (aggregate over every generator built in this
  process — inside an actor, that actor's generators).
- cost accounting mirrors reference ``GenerationStats``
  (``models.py:794-800`` + model cards ``constants.py:144-183``): each
  call's USD cost = tokens x the model's per-1M-token price, from the
  config override or the public price table below.
- prompts may be plain strings OR chat-completions *content part*
  lists (``[{"type": "text", ...}, {"type": "image_url", ...}]``) —
  the multimodal protocol shape; the adapter passes parts through
  verbatim (reference modality detection: ``physical.py:42-56``).

No network exists in this container: tests run a local
``http.server``-based stub (``tests/test_generators.py``) which is
exactly how the endpoint contract is verified.
"""

from __future__ import annotations

import json
import os
import threading
import time
import urllib.error
import urllib.request
import weakref
from dataclasses import dataclass, field

# Public per-1M-token USD prices (openai.com/api/pricing, 2025-06 —
# same role as the reference's model cards, constants.py:144-183).
# Longest-prefix match on the model name; unknown models cost 0 unless
# the config carries explicit prices.
_MODEL_COSTS_PER_MTOK: dict[str, tuple[float, float]] = {
    "gpt-4o-mini": (0.15, 0.60),
    "gpt-4o": (2.50, 10.00),
    "gpt-4.1-nano": (0.10, 0.40),
    "gpt-4.1-mini": (0.40, 1.60),
    "gpt-4.1": (2.00, 8.00),
    "o3-mini": (1.10, 4.40),
    "o3": (2.00, 8.00),
    "o4-mini": (1.10, 4.40),
}


def model_cost_per_mtok(model: str | None) -> tuple[float, float]:
    """(prompt, completion) USD per 1M tokens by longest model-name
    prefix; (0, 0) for unknown models."""
    best = ("", (0.0, 0.0))
    for prefix, costs in _MODEL_COSTS_PER_MTOK.items():
        if model and model.startswith(prefix) and len(prefix) > len(best[0]):
            best = (prefix, costs)
    return best[1]


_ALL_USAGE: "weakref.WeakSet[Usage]" = weakref.WeakSet()


def usage_snapshot() -> dict:
    """Aggregate counters over every generator created in THIS process
    (per actor inside Ray workers; driver-side for local generators)."""
    total: dict[str, float] = {}
    for u in list(_ALL_USAGE):
        for k, v in u.snapshot().items():
            total[k] = total.get(k, 0) + v
    return total


_AGG_NAME, _AGG_NS = "pz_llm_usage", "palimpzest_ray"
_AGG_HANDLE = None


def _usage_actor(create: bool):
    """The cluster-wide usage aggregator: a zero-CPU named detached
    actor every generator pushes batch deltas to — how per-actor
    counters become visible on the driver (``cluster_usage`` /
    ``Dataset.stats``). Lazy: no Ray import unless Ray is running."""
    global _AGG_HANDLE
    if _AGG_HANDLE is not None:
        return _AGG_HANDLE
    try:
        import ray
        if not ray.is_initialized():
            return None
    except Exception:
        return None
    if not create:
        try:
            _AGG_HANDLE = ray.get_actor(_AGG_NAME, namespace=_AGG_NS)
            return _AGG_HANDLE
        except ValueError:
            return None

    @ray.remote(num_cpus=0)
    class _UsageAgg:
        def __init__(self):
            self.total: dict = {}

        def add(self, delta: dict) -> None:
            for k, v in delta.items():
                self.total[k] = self.total.get(k, 0) + v

        def snapshot(self) -> dict:
            return dict(self.total)

    _AGG_HANDLE = _UsageAgg.options(
        name=_AGG_NAME, namespace=_AGG_NS, get_if_exists=True,
        lifetime="detached",
    ).remote()
    return _AGG_HANDLE


def cluster_usage() -> dict:
    """Driver-visible LLM usage/cost across EVERY generator actor in
    the Ray session (reference ``GenerationStats`` rollup). Without a
    Ray session, falls back to this process's :func:`usage_snapshot`."""
    try:
        import ray
        if not ray.is_initialized():
            return usage_snapshot()
    except Exception:
        return usage_snapshot()
    agg = _usage_actor(create=False)
    if agg is None:
        return {}
    import ray
    return ray.get(agg.snapshot.remote())


@dataclass(frozen=True)
class OpenAIConfig:
    """Picklable config for an OpenAI-compatible chat endpoint.

    ``base_url``/``api_key``/``model`` default from the standard public
    environment variables (``OPENAI_BASE_URL``, ``OPENAI_API_KEY``,
    ``OPENAI_MODEL``) so a pipeline file never hard-codes secrets.
    """

    base_url: str | None = None
    model: str | None = None
    api_key: str | None = None
    temperature: float = 0.0
    max_tokens: int | None = None
    system_prompt: str | None = None
    timeout_s: float = 60.0
    max_retries: int = 3
    backoff_s: float = 0.5
    max_parallel: int = 8
    extra_body: dict = field(default_factory=dict, hash=False)
    #: USD per 1M tokens; None = look up the public price table by
    #: model name (unknown models cost 0)
    prompt_cost_per_mtok: float | None = None
    completion_cost_per_mtok: float | None = None

    def resolved(self) -> "OpenAIConfig":
        base = self.base_url or os.environ.get("OPENAI_BASE_URL")
        if not base:
            raise ValueError(
                "no endpoint configured: pass base_url= or set OPENAI_BASE_URL"
            )
        model = self.model or os.environ.get("OPENAI_MODEL", "default")
        key = self.api_key or os.environ.get("OPENAI_API_KEY")
        return OpenAIConfig(
            base_url=base.rstrip("/"),
            model=model,
            api_key=key,
            temperature=self.temperature,
            max_tokens=self.max_tokens,
            system_prompt=self.system_prompt,
            timeout_s=self.timeout_s,
            max_retries=self.max_retries,
            backoff_s=self.backoff_s,
            max_parallel=self.max_parallel,
            extra_body=self.extra_body,
            prompt_cost_per_mtok=self.prompt_cost_per_mtok,
            completion_cost_per_mtok=self.completion_cost_per_mtok,
        )

    def factory(self):
        """Generator factory for the semantic stages: call in actor
        ``__init__`` to get a batch callable."""
        cfg = self.resolved()
        return lambda: OpenAIChatGenerator(cfg)


class Usage:
    """Thread-safe token/cost/call counters (one per generator)."""

    __slots__ = ("_lock", "calls", "retries", "failures", "prompt_tokens",
                 "completion_tokens", "wall_s", "cost_usd", "__weakref__")

    def __init__(self):
        self._lock = threading.Lock()
        self.calls = 0
        self.retries = 0
        self.failures = 0
        self.prompt_tokens = 0
        self.completion_tokens = 0
        self.wall_s = 0.0
        self.cost_usd = 0.0
        _ALL_USAGE.add(self)

    def record(self, usage: dict | None, wall_s: float, retries: int,
               failed: bool = False,
               cost_per_mtok: tuple[float, float] = (0.0, 0.0)) -> None:
        with self._lock:
            self.calls += 1
            self.retries += retries
            self.failures += int(failed)
            self.wall_s += wall_s
            if usage:
                pt = int(usage.get("prompt_tokens") or 0)
                ct = int(usage.get("completion_tokens") or 0)
                self.prompt_tokens += pt
                self.completion_tokens += ct
                self.cost_usd += (
                    pt * cost_per_mtok[0] + ct * cost_per_mtok[1]
                ) / 1e6

    def snapshot(self) -> dict:
        with self._lock:
            return {
                "calls": self.calls,
                "retries": self.retries,
                "failures": self.failures,
                "prompt_tokens": self.prompt_tokens,
                "completion_tokens": self.completion_tokens,
                "total_tokens": self.prompt_tokens + self.completion_tokens,
                "wall_s": self.wall_s,
                "cost_usd": self.cost_usd,
            }


_RETRYABLE_STATUS = {408, 409, 429, 500, 502, 503, 504}


class OpenAIChatGenerator:
    """``Callable[[list[str]], list[str]]`` over an OpenAI-compatible
    ``/chat/completions`` endpoint.

    One HTTP request per prompt (the protocol's unit), fanned out over a
    bounded thread pool — inside a Ray actor this hides per-request
    latency without oversubscribing the node (threads block on I/O, not
    CPU). Failures after ``max_retries`` yield ``""`` for that prompt
    (the semantic stages' relax-schema parsing turns that into nulls,
    never a crash — same discipline as reference ``schemas.py:90-96``).
    """

    def __init__(self, config: OpenAIConfig):
        self.cfg = config.resolved()
        self.usage = Usage()
        self._pushed: dict = {}
        # per-field fallback to the price table: a config that sets only
        # one of the two rates must not poison Usage.record with a None
        # (ADVICE r4: (float, None) -> TypeError during accounting)
        table = model_cost_per_mtok(self.cfg.model)
        pc = self.cfg.prompt_cost_per_mtok
        cc = self.cfg.completion_cost_per_mtok
        self._cost = (
            table[0] if pc is None else float(pc),
            table[1] if cc is None else float(cc),
        )

    # -- single request ------------------------------------------------
    def _request_one(self, prompt) -> str:
        cfg = self.cfg
        messages = []
        if cfg.system_prompt:
            messages.append({"role": "system", "content": cfg.system_prompt})
        # a str is a text prompt; a list is chat-completions content
        # parts (text + image_url) and passes through verbatim
        messages.append({"role": "user", "content": prompt})
        body = {
            "model": cfg.model,
            "messages": messages,
            "temperature": cfg.temperature,
            **cfg.extra_body,
        }
        if cfg.max_tokens is not None:
            body["max_tokens"] = cfg.max_tokens
        data = json.dumps(body).encode()
        headers = {"Content-Type": "application/json"}
        if cfg.api_key:
            headers["Authorization"] = f"Bearer {cfg.api_key}"

        t0 = time.monotonic()
        last_err: Exception | None = None
        attempt = 0
        for attempt in range(cfg.max_retries + 1):
            try:
                req = urllib.request.Request(
                    f"{cfg.base_url}/chat/completions", data=data,
                    headers=headers, method="POST")
                with urllib.request.urlopen(req, timeout=cfg.timeout_s) as resp:
                    payload = json.loads(resp.read().decode())
                text = payload["choices"][0]["message"]["content"] or ""
                self.usage.record(payload.get("usage"),
                                  time.monotonic() - t0, attempt,
                                  cost_per_mtok=self._cost)
                return text
            except urllib.error.HTTPError as e:
                last_err = e
                if e.code not in _RETRYABLE_STATUS:
                    break
            except (urllib.error.URLError, TimeoutError, OSError,
                    json.JSONDecodeError, KeyError, IndexError) as e:
                last_err = e
            if attempt < cfg.max_retries:
                time.sleep(cfg.backoff_s * (2 ** attempt))
        self.usage.record(None, time.monotonic() - t0, attempt, failed=True)
        del last_err  # relax-schema: degrade to empty generation
        return ""

    # -- batch entry point ----------------------------------------------
    def __call__(self, prompts: list) -> list[str]:
        if not prompts:
            return []
        if len(prompts) == 1 or self.cfg.max_parallel <= 1:
            out1 = [self._request_one(p) for p in prompts]
            self.push_usage()
            return out1
        out: list[str | None] = [None] * len(prompts)
        sem = threading.Semaphore(self.cfg.max_parallel)

        def work(i: int, p: str) -> None:
            try:
                out[i] = self._request_one(p)
            finally:
                sem.release()

        threads = []
        for i, p in enumerate(prompts):
            sem.acquire()
            t = threading.Thread(target=work, args=(i, p), daemon=True)
            t.start()
            threads.append(t)
        for t in threads:
            t.join()
        self.push_usage()
        return [o if o is not None else "" for o in out]

    def get_usage(self) -> dict:
        return self.usage.snapshot()

    def push_usage(self) -> None:
        """Ship the since-last-push counter delta to the cluster
        aggregator (one fire-and-forget actor call per batch —
        negligible next to the HTTP inference it accounts for)."""
        agg = _usage_actor(create=True)
        if agg is None:
            return
        snap = self.usage.snapshot()
        delta = {k: snap[k] - self._pushed.get(k, 0) for k in snap}
        if any(delta.values()):
            agg.add.remote(delta)
            self._pushed = snap


def openai_generator(base_url: str | None = None, model: str | None = None,
                     **kwargs):
    """Convenience: a generator *factory* for the semantic stages.

    >>> ds = sem_map(ds, ["sentiment"], "Classify: {text}",
    ...              openai_generator("http://localhost:8000/v1", "m"))
    """
    return OpenAIConfig(base_url=base_url, model=model, **kwargs).factory()
