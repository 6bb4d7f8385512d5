"""HTTP LLM client adapter for the enrichment seam.

`assign_categories` / `assign_titles` (plans/enrichment.py) take any
``prompt -> response-text`` callable (the seam the reference fills with a
GPT-4 call at 91_property_categories.py:9,47-52 via cache_helper.py:27-44).
This module provides the production implementation: an OpenAI-style
chat-completions HTTP POST with bounded retry, exponential backoff with
decorrelated jitter, 429/5xx handling, and a simple client-side rate
limiter — all stdlib (urllib), no SDK dependency.

Offline-first: the ``transport`` argument (a ``(url, headers, body-bytes)
-> (status, body-bytes)`` callable) is injectable, so tests drive the full
retry/parse stack with recorded responses and no network. The default
transport uses ``urllib.request``. The fake clients in enrichment.py
remain the default everywhere — nothing in the repo calls the network
unless a user explicitly constructs one of these and passes it in.
"""
from __future__ import annotations

import json
import time
import urllib.error
import urllib.request
from dataclasses import dataclass, field
from typing import Callable, Optional

Transport = Callable[[str, dict, bytes], tuple[int, bytes]]

# HTTP statuses worth retrying: rate limit + transient server errors
_RETRYABLE = {429, 500, 502, 503, 504, 529}


def _urllib_transport(url: str, headers: dict, body: bytes,
                      timeout: float = 60.0) -> tuple[int, bytes]:
    req = urllib.request.Request(url, data=body, headers=headers,
                                 method="POST")
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.status, resp.read()
    except urllib.error.HTTPError as e:  # non-2xx still has a body
        return e.code, e.read()


@dataclass
class RateLimiter:
    """Client-side request pacing: at most ``rps`` requests/second,
    enforced across threads (assign_categories fans out over a
    ThreadPoolExecutor, so the limiter must be shared and locked)."""

    rps: float = 2.0
    _next_ok: float = field(default=0.0, repr=False)

    def __post_init__(self):
        import threading

        self._lock = threading.Lock()

    def wait(self, now: Callable[[], float] = time.monotonic,
             sleep: Callable[[float], None] = time.sleep) -> None:
        with self._lock:
            t = now()
            delay = self._next_ok - t
            self._next_ok = max(self._next_ok, t) + 1.0 / self.rps
        if delay > 0:
            sleep(delay)


@dataclass
class HttpChatClient:
    """``prompt -> response-text`` over an OpenAI-compatible
    ``/chat/completions`` endpoint (the shape llama.cpp, vLLM, Together,
    and the reference's provider all speak). Drop it into
    ``assign_categories(client=HttpChatClient(...))`` unchanged.

    Retries ``max_retries`` times on retryable statuses / transport
    errors with exponential backoff (base 2, capped, decorrelated by a
    deterministic per-attempt fraction — no RNG, reproducible tests),
    honours a ``retry_after`` field in the JSON error body when present
    (the bare (status, body) transport cannot see HTTP headers), and
    raises ``LLMClientError`` when
    attempts are exhausted. Response parsing accepts both the
    chat-completions shape (choices[0].message.content) and the
    messages shape (content[0].text)."""

    url: str
    # repr=False: the auto-generated dataclass repr would otherwise leak
    # the bearer key into tracebacks/logs that print the client
    api_key: str = field(default="", repr=False)
    model: str = "gpt-4"
    system: Optional[str] = None
    temperature: float = 0.0
    max_tokens: int = 512
    max_retries: int = 5
    backoff_base: float = 0.5
    backoff_cap: float = 30.0
    timeout: float = 60.0
    extra_headers: dict = field(default_factory=dict)
    rate_limiter: Optional[RateLimiter] = None
    transport: Optional[Transport] = None
    sleep: Callable[[float], None] = time.sleep

    def _headers(self) -> dict:
        h = {"Content-Type": "application/json"}
        if self.api_key:
            h["Authorization"] = f"Bearer {self.api_key}"
        h.update(self.extra_headers)
        return h

    def _body(self, prompt: str) -> bytes:
        messages = []
        if self.system:
            messages.append({"role": "system", "content": self.system})
        messages.append({"role": "user", "content": prompt})
        return json.dumps({
            "model": self.model,
            "messages": messages,
            "temperature": self.temperature,
            "max_tokens": self.max_tokens,
        }).encode()

    @staticmethod
    def parse_response(body: bytes) -> str:
        doc = json.loads(body.decode())
        if "choices" in doc:  # chat-completions shape
            return doc["choices"][0]["message"]["content"]
        if "content" in doc:  # messages shape
            parts = doc["content"]
            if isinstance(parts, list):
                return "".join(p.get("text", "") for p in parts)
            return str(parts)
        raise LLMClientError(f"unrecognized response shape: {doc.keys()}")

    def _delay(self, attempt: int, retry_after: Optional[float]) -> float:
        if retry_after is not None:
            return min(retry_after, self.backoff_cap)
        # deterministic decorrelated jitter: fraction from the attempt
        # number, no RNG (reproducible in tests; see project rule on
        # deterministic behavior)
        frac = ((attempt * 2654435761) % 1000) / 1999.0 + 0.5
        return min(self.backoff_base * (2 ** attempt) * frac,
                   self.backoff_cap)

    def __call__(self, prompt: str) -> str:
        transport = self.transport or (
            lambda u, h, b: _urllib_transport(u, h, b, self.timeout)
        )
        body = self._body(prompt)
        last = "no attempt made"
        for attempt in range(self.max_retries):
            if self.rate_limiter is not None:
                self.rate_limiter.wait(sleep=self.sleep)
            try:
                status, resp = transport(self.url, self._headers(), body)
            except (OSError, urllib.error.URLError) as e:
                last = f"transport error: {e}"
                if attempt + 1 < self.max_retries:  # no dead sleep pre-raise
                    self.sleep(self._delay(attempt, None))
                continue
            if status == 200:
                return self.parse_response(resp)
            last = f"HTTP {status}: {resp[:200]!r}"
            if status not in _RETRYABLE:
                raise LLMClientError(last)
            retry_after = None
            try:  # some providers put it in the JSON body
                retry_after = float(json.loads(resp).get("retry_after"))
            except Exception:
                pass
            # the final failed attempt raises immediately: sleeping the
            # backoff (up to backoff_cap, x8 enrichment workers) before
            # an exception nobody retries is pure dead wall-time
            if attempt + 1 < self.max_retries:
                self.sleep(self._delay(attempt, retry_after))
        raise LLMClientError(
            f"exhausted {self.max_retries} attempts; last: {last}"
        )


class LLMClientError(RuntimeError):
    """Raised when the HTTP adapter cannot produce a response."""
