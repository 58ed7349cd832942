"""REST API source (SURVEY.md §2.1 S1-S4).

The reference ingests TMDB movies driver-side with a thread pool and a
per-request retry state machine (``ingestion/fetch_movies.py:116-260``):
200 → success; 429 → honor ``Retry-After`` else exponential backoff and
retry; 401/403/404 → permanent reject, NO retry; timeout/connection error →
exponential backoff; retries exhausted → reject. Row-level validation
(``fetch_movies.py:69-99``) quarantines malformed payloads.

This module keeps those semantics but re-architects for Spark:

- the transport is an injectable callable (``(key) -> (status, headers,
  payload)``) — testable without a network, swappable for any HTTP client,
- fetching runs EXECUTOR-side via ``mapInPandas`` over a DataFrame of keys
  (S1's scale path: a driver thread pool caps out at one machine; partitions
  of keys fan out across the cluster, each partition rate-limited locally),
- results land as a DataFrame with a success/error envelope; valid rows and
  rejects split into separate sinks (quarantine pattern).
"""

from __future__ import annotations

import json
import time
from collections.abc import Callable, Iterator
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: (status_code, headers, payload). payload is a parsed JSON object for 2xx
#: or None. A transport raising TimeoutError/ConnectionError is retryable.
FetchFn = Callable[[Any], tuple[int, dict[str, str], Any]]


@dataclass(frozen=True)
class RetryPolicy:
    """The reference's retry state machine, as data
    (``fetch_movies.py:131-201``)."""

    max_retries: int = 3
    backoff: float = 2.0
    permanent_statuses: tuple[int, ...] = (401, 403, 404)
    rate_limit_status: int = 429
    retry_after_header: str = "Retry-After"
    #: injectable clock for tests; production uses time.sleep
    sleep: Callable[[float], None] = field(default=time.sleep)


def _retry_after_seconds(value: str | None, fallback: float) -> float:
    """Parse a ``Retry-After`` header. RFC 7231 allows either delta-seconds or
    an HTTP-date; a malformed value must degrade to the backoff fallback, not
    raise (a ValueError here would escape the executor task and kill the whole
    ingest job — the reference degrades per-key instead, fetch_movies.py:141-145).
    """
    if value is None:
        return fallback
    try:
        return max(0.0, float(value))
    except ValueError:
        pass
    try:
        from email.utils import parsedate_to_datetime

        target = parsedate_to_datetime(value)
        return max(0.0, target.timestamp() - time.time())
    except (ValueError, TypeError, OverflowError):
        return fallback


def fetch_with_retry(fetch: FetchFn, key: Any, policy: RetryPolicy = RetryPolicy()) -> dict:
    """One key through the retry state machine → success/error envelope.

    Mirrors ``fetch_movies.py:116-201`` decision-for-decision: rate limits
    honor ``Retry-After`` (falling back to ``backoff**attempt``), permanent
    statuses reject immediately, transient transport errors back off
    exponentially, exhaustion rejects with ``MAX_RETRIES_EXCEEDED``.
    """
    for attempt in range(1, policy.max_retries + 1):
        try:
            status, headers, payload = fetch(key)
        except (TimeoutError, ConnectionError) as e:
            if attempt < policy.max_retries:
                policy.sleep(policy.backoff**attempt)
                continue
            return {"key": key, "success": False, "error": f"TRANSPORT_{type(e).__name__}", "payload": None}
        except Exception as e:  # unexpected → permanent reject
            return {"key": key, "success": False, "error": f"UNEXPECTED_{type(e).__name__}", "payload": None}

        if status == 200:
            return {"key": key, "success": True, "error": None, "payload": payload}
        if status == policy.rate_limit_status:
            policy.sleep(_retry_after_seconds(headers.get(policy.retry_after_header), policy.backoff**attempt))
            continue
        if status in policy.permanent_statuses:
            return {"key": key, "success": False, "error": f"HTTP_{status}", "payload": None}
        # other statuses: retryable
        if attempt < policy.max_retries:
            policy.sleep(policy.backoff**attempt)
    return {"key": key, "success": False, "error": "MAX_RETRIES_EXCEEDED", "payload": None}


def validate_record(
    payload: Any,
    *,
    required_fields: tuple[str, ...] = ("id", "title"),
    required_list_paths: tuple[str, ...] = ("credits.cast", "credits.crew"),
) -> bool:
    """S4 row-level ingest validation (``fetch_movies.py:69-99``), generalized:
    payload must be a dict, carry truthy required fields, have lists at the
    given dotted paths, and not be an API error envelope."""
    if not isinstance(payload, dict) or payload.get("success") is False:
        return False
    for f_ in required_fields:
        if not payload.get(f_):
            return False
    for path in required_list_paths:
        node: Any = payload
        for part in path.split("."):
            node = node.get(part) if isinstance(node, dict) else None
        if not isinstance(node, list):
            return False
    return True


#: Envelope schema for distributed fetch results. The raw payload rides as a
#: JSON string; parse with from_json + the declared schema downstream (the
#: engine never infers, SURVEY §2.1 S6).
FETCH_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("success", T.BooleanType(), False),
        T.StructField("error", T.StringType(), True),
        T.StructField("payload_json", T.StringType(), True),
    ]
)


def fetch_distributed(
    spark: SparkSession,
    keys: list[Any] | DataFrame,
    fetch: FetchFn,
    policy: RetryPolicy = RetryPolicy(),
    *,
    num_partitions: int | None = None,
) -> DataFrame:
    """S1+S2 at scale: fan the key list out across executors via
    ``mapInPandas`` (instead of the reference's driver-side
    ``ThreadPoolExecutor(max_workers=10)``, ``fetch_movies.py:212-217``).

    Each partition fetches its keys sequentially through the retry machine —
    cluster-wide concurrency = number of partitions, settable to respect API
    rate limits. ``fetch`` and ``policy`` must be picklable (no live
    sessions; construct clients inside ``fetch`` lazily).
    """
    import pandas as pd

    if isinstance(keys, DataFrame):
        kdf = keys.select(F.col(keys.columns[0]).cast("string").alias("key"))
    else:
        kdf = spark.createDataFrame([(str(k),) for k in keys], ["key"])
    if num_partitions:
        kdf = kdf.repartition(num_partitions)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = [fetch_with_retry(fetch, k, policy) for k in pdf["key"]]
            yield pd.DataFrame(
                {
                    "key": [r["key"] for r in rows],
                    "success": [r["success"] for r in rows],
                    "error": [r["error"] for r in rows],
                    "payload_json": [
                        json.dumps(r["payload"]) if r["payload"] is not None else None
                        for r in rows
                    ],
                }
            )

    return kdf.mapInPandas(run, FETCH_RESULT_SCHEMA)


def split_quarantine(results: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Valid rows vs quarantine (the reference aborts on zero valid rows and
    logs rejects, ``fetch_movies.py:232-260``; here both are DataFrames the
    caller can sink separately)."""
    return results.filter(F.col("success")), results.filter(~F.col("success"))
