"""REST-source tests (SURVEY.md §2.1 S1-S4) — the reference's ingestion test
truth table (``tests/test_ingestion.py``) against the engine's transport-
agnostic retry machine. No network: scripted fake fetchers."""

from __future__ import annotations

import json

import pytest

from tmdb_spark_data_pipeline_spark.sources import rest

NOSLEEP = rest.RetryPolicy(sleep=lambda s: None)


class ScriptedFetch:
    """Returns scripted (status, headers, payload) per call; counts calls."""

    def __init__(self, script):
        self.script = list(script)
        self.calls = 0

    def __call__(self, key):
        self.calls += 1
        item = self.script.pop(0)
        if isinstance(item, Exception):
            raise item
        return item


def test_fetch_success_first_try():
    f = ScriptedFetch([(200, {}, {"id": 1, "title": "x"})])
    out = rest.fetch_with_retry(f, "1", NOSLEEP)
    assert out["success"] and out["payload"]["id"] == 1
    assert f.calls == 1


def test_fetch_404_rejects_without_retry():
    f = ScriptedFetch([(404, {}, None)])
    out = rest.fetch_with_retry(f, "1", NOSLEEP)
    assert out == {"key": "1", "success": False, "error": "HTTP_404", "payload": None}
    assert f.calls == 1  # permanent: exactly one attempt (fetch_movies.py:152-160)


def test_fetch_429_honors_retry_after_then_succeeds():
    waits = []
    policy = rest.RetryPolicy(sleep=waits.append)
    f = ScriptedFetch([(429, {"Retry-After": "7"}, None), (200, {}, {"ok": 1})])
    out = rest.fetch_with_retry(f, "1", policy)
    assert out["success"] and f.calls == 2
    assert waits == [7.0]  # Retry-After wins over backoff**attempt


def test_fetch_429_malformed_retry_after_degrades_to_backoff():
    # RFC 7231 allows an HTTP-date Retry-After; a ValueError escaping here
    # would kill the whole mapInPandas task, so garbage must fall back to
    # backoff**attempt instead of raising
    waits = []
    policy = rest.RetryPolicy(backoff=2.0, sleep=waits.append)
    f = ScriptedFetch([(429, {"Retry-After": "not-a-number"}, None), (200, {}, {"ok": 1})])
    out = rest.fetch_with_retry(f, "1", policy)
    assert out["success"] and f.calls == 2
    assert waits == [2.0]  # backoff**1


def test_fetch_429_http_date_retry_after_is_parsed():
    import time as _time
    from email.utils import formatdate

    waits = []
    policy = rest.RetryPolicy(sleep=waits.append)
    target = formatdate(_time.time() + 60, usegmt=True)
    f = ScriptedFetch([(429, {"Retry-After": target}, None), (200, {}, {"ok": 1})])
    out = rest.fetch_with_retry(f, "1", policy)
    assert out["success"]
    assert len(waits) == 1 and 50 <= waits[0] <= 61  # ~60s minus clock skew


def test_fetch_timeout_backs_off_exponentially_then_gives_up():
    waits = []
    policy = rest.RetryPolicy(max_retries=3, backoff=2.0, sleep=waits.append)
    f = ScriptedFetch([TimeoutError(), TimeoutError(), TimeoutError()])
    out = rest.fetch_with_retry(f, "1", policy)
    assert out["error"] == "TRANSPORT_TimeoutError"
    assert waits == [2.0, 4.0]  # backoff**1, backoff**2; last attempt doesn't sleep


def test_fetch_retryable_status_exhausts_to_max_retries():
    f = ScriptedFetch([(500, {}, None)] * 3)
    out = rest.fetch_with_retry(f, "1", NOSLEEP)
    assert out["error"] == "MAX_RETRIES_EXCEEDED"
    assert f.calls == 3


def test_fetch_unexpected_exception_is_permanent():
    f = ScriptedFetch([ValueError("boom")])
    out = rest.fetch_with_retry(f, "1", NOSLEEP)
    assert out["error"] == "UNEXPECTED_ValueError"
    assert f.calls == 1


@pytest.mark.parametrize(
    "payload,ok",
    [
        ({"id": 1, "title": "t", "credits": {"cast": [], "crew": []}}, True),
        ("not a dict", False),
        ({"id": None, "title": "t", "credits": {"cast": [], "crew": []}}, False),
        ({"id": 1, "title": "", "credits": {"cast": [], "crew": []}}, False),
        ({"id": 1, "title": "t"}, False),  # missing credits
        ({"id": 1, "title": "t", "credits": {"cast": [], "crew": None}}, False),
        ({"id": 1, "title": "t", "credits": {"cast": [], "crew": []}, "success": False}, False),
    ],
)
def test_validate_record_truth_table(payload, ok):
    # mirrors tests/test_ingestion.py:13-82
    assert rest.validate_record(payload) is ok


def test_fetch_distributed_and_quarantine(spark):
    def fetch(key):
        k = int(key)
        if k % 3 == 0:
            return (404, {}, None)
        return (200, {}, {"id": k, "title": f"t{k}", "credits": {"cast": [], "crew": []}})

    results = rest.fetch_distributed(spark, list(range(10)), fetch, NOSLEEP, num_partitions=4)
    valid, rejects = rest.split_quarantine(results)
    v, r = valid.collect(), rejects.collect()
    assert len(v) == 6 and len(r) == 4
    assert all(row.error == "HTTP_404" for row in r)
    payload = json.loads(sorted(v, key=lambda x: int(x.key))[0].payload_json)
    assert rest.validate_record(payload)
