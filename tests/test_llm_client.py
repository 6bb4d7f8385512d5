"""HTTP LLM adapter: retry/backoff/rate-limit/parse, offline via recorded
responses (VERDICT r3 task 5). No test touches the network — every case
injects a fake transport."""
from __future__ import annotations

import json

import pytest

from chemharmony_spark.plans.llm_client import (
    HttpChatClient,
    LLMClientError,
    RateLimiter,
)


def _chat_body(text):
    return json.dumps(
        {"choices": [{"message": {"role": "assistant", "content": text}}]}
    ).encode()


def _messages_body(text):
    return json.dumps(
        {"content": [{"type": "text", "text": text[:3]},
                     {"type": "text", "text": text[3:]}]}
    ).encode()


def _client(script, **kw):
    """script: list of (status, body) responses, consumed in order."""
    calls = []

    def transport(url, headers, body):
        calls.append((url, headers, json.loads(body.decode())))
        return script[min(len(calls) - 1, len(script) - 1)]

    sleeps = []
    c = HttpChatClient(
        url="http://fake.local/v1/chat/completions",
        api_key="k",
        transport=transport,
        sleep=sleeps.append,
        **kw,
    )
    return c, calls, sleeps


def test_success_chat_completions_shape():
    c, calls, sleeps = _client([(200, _chat_body("hello"))])
    assert c("prompt!") == "hello"
    assert sleeps == []
    url, headers, body = calls[0]
    assert headers["Authorization"] == "Bearer k"
    assert body["messages"][-1] == {"role": "user", "content": "prompt!"}
    assert body["temperature"] == 0.0


def test_success_messages_shape():
    c, _, _ = _client([(200, _messages_body("abcdef"))])
    assert c("p") == "abcdef"


def test_system_prompt_is_prepended():
    c, calls, _ = _client([(200, _chat_body("x"))], system="be terse")
    c("p")
    assert calls[0][2]["messages"][0] == {
        "role": "system", "content": "be terse"}


def test_retries_on_429_then_succeeds():
    c, calls, sleeps = _client(
        [(429, b"{}"), (429, b"{}"), (200, _chat_body("ok"))])
    assert c("p") == "ok"
    assert len(calls) == 3
    assert len(sleeps) == 2
    assert all(s > 0 for s in sleeps)
    assert sleeps[1] > sleeps[0] * 1.2  # exponential growth


def test_honours_retry_after():
    c, _, sleeps = _client(
        [(429, json.dumps({"retry_after": 7.5}).encode()),
         (200, _chat_body("ok"))])
    assert c("p") == "ok"
    assert sleeps == [7.5]


def test_non_retryable_status_raises_immediately():
    c, calls, _ = _client([(400, b'{"error": "bad request"}')])
    with pytest.raises(LLMClientError, match="HTTP 400"):
        c("p")
    assert len(calls) == 1


def test_exhaustion_raises_with_last_error():
    c, calls, sleeps = _client([(503, b"{}")], max_retries=3)
    with pytest.raises(LLMClientError, match="exhausted 3 attempts"):
        c("p")
    # r5: the FINAL failed attempt raises immediately — only the two
    # inter-attempt backoffs sleep, never a dead pre-raise one
    assert len(calls) == 3 and len(sleeps) == 2


def test_transport_errors_are_retried():
    state = {"n": 0}

    def transport(url, headers, body):
        state["n"] += 1
        if state["n"] == 1:
            raise OSError("connection reset")
        return 200, _chat_body("recovered")

    c = HttpChatClient(url="http://fake.local", transport=transport,
                       sleep=lambda s: None)
    assert c("p") == "recovered"
    assert state["n"] == 2


def test_backoff_is_capped():
    c, _, sleeps = _client([(503, b"{}")], max_retries=8, backoff_cap=2.0)
    with pytest.raises(LLMClientError):
        c("p")
    assert max(sleeps) <= 2.0


def test_rate_limiter_paces_requests():
    t = {"now": 100.0}
    waits = []
    rl = RateLimiter(rps=2.0)
    for _ in range(3):
        rl.wait(now=lambda: t["now"], sleep=waits.append)
    # first request free, later ones spaced 0.5s apart from a fixed clock
    assert waits == [0.5, 1.0]


def test_end_to_end_assign_categories_via_http_adapter(spark, tmp_path):
    """The adapter drops into the enrichment seam unchanged: recorded
    chat-completions responses flow through retry + category validation
    + the parquet cache."""
    from chemharmony_spark.plans.enrichment import assign_categories

    def transport(url, headers, body):
        prompt = json.loads(body.decode())["messages"][-1]["content"]
        pid = json.loads(prompt)["pid"]
        return 200, _chat_body(
            f"category: genotoxicity; reason: recorded for {pid}; "
            "strength: 7"
        )

    client = HttpChatClient(url="http://fake.local", transport=transport,
                            sleep=lambda s: None)
    props = spark.createDataFrame(
        [(f"p{i}", json.dumps({"pid": f"p{i}", "name": f"prop {i}"}))
         for i in range(4)],
        "pid string, data string",
    )
    res = assign_categories(
        spark, props, str(tmp_path / "cache"), client=client)
    rows = {r.pid: r for r in res.table.collect()}
    assert set(rows) == {"p0", "p1", "p2", "p3"}
    assert all(r.category == "genotoxicity" for r in rows.values())
    assert rows["p2"].reason.endswith("for p2")
    assert res.n_model_calls == 4
    # second run: all hits, zero model calls
    res2 = assign_categories(
        spark, props, str(tmp_path / "cache"), client=client)
    assert res2.n_model_calls == 0
