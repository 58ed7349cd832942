"""First-class Spark data source for REST ingest (Spark 4 Python DataSource
API) — ``spark.read.format("tmdb_rest")``.

The reference's ingest is a driver-side script around ``requests``
(``ingestion/fetch_movies.py``). ``sources/rest.py`` re-architected it as
executor-side ``mapInPandas``; this module goes one step further and exposes
it through Spark's DataSource V2 Python API, so REST ingest composes like any
other source: options instead of code, schema declared up front, partitions
planned by the source, and the result usable from pure SQL
(``CREATE TABLE ... USING tmdb_rest`` semantics via ``spark.read``).

Partitioning = one input partition per key shard (``num_partitions`` option):
cluster-wide fetch concurrency is the shard count, the same rate-limit lever
as ``rest.fetch_distributed``. Each shard runs the full retry/quarantine
state machine per key.

Transports (the container has no network; both are deterministic):

- ``transport=fixture``: ``fixture_path`` names a JSON file mapping key →
  payload. Missing keys are HTTP 404 (permanent reject).
- ``transport=fake``: synthetic deterministic behavior keyed off the key
  string — ``*_429`` rate-limits once then succeeds, ``*_404`` rejects,
  ``*_timeout`` raises a retryable transport error, anything else succeeds
  with a minimal valid payload. Mirrors the truth table in
  ``tests/unit/test_rest_ingestion.py``.
"""

from __future__ import annotations

import json
from collections.abc import Iterator, Sequence
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)

from .rest import RetryPolicy, fetch_with_retry

#: Envelope schema (DDL form of ``rest.FETCH_RESULT_SCHEMA``).
ENVELOPE_DDL = "key string, success boolean, error string, payload_json string"


def _fake_transport():
    """Deterministic offline transport (see module doc); per-key attempt
    tracking so a ``*_429`` key rate-limits exactly its own first attempt."""
    attempts: dict[str, int] = {}

    def _fetch(k: str):
        ks = str(k)
        attempts[ks] = attempts.get(ks, 0) + 1
        if ks.endswith("_timeout"):
            raise TimeoutError(f"synthetic timeout for {ks}")
        if ks.endswith("_404"):
            return 404, {}, None
        if ks.endswith("_429") and attempts[ks] == 1:
            return 429, {"Retry-After": "0"}, None
        return 200, {}, {"id": ks, "title": f"movie-{ks}", "credits": {"cast": [], "crew": []}}

    return _fetch


class _KeyShard(InputPartition):
    def __init__(self, keys: Sequence[str]):
        self.keys = list(keys)


class RestDataSource(DataSource):
    """``spark.read.format("tmdb_rest").option("keys", "1,2,3").load()``.

    Options: ``keys`` (comma-separated) or ``keys_path`` (newline-separated
    file); ``transport`` = ``fake`` (default) | ``fixture``;
    ``fixture_path``; ``num_partitions`` (default 4); ``max_retries``;
    ``backoff``.
    """

    @classmethod
    def name(cls) -> str:
        return "tmdb_rest"

    def schema(self) -> str:
        return ENVELOPE_DDL

    def reader(self, schema) -> "RestReader":
        return RestReader(self.options)


class RestReader(DataSourceReader):
    def __init__(self, options: dict):
        self.options = dict(options)
        if "keys" in self.options:
            self.keys = [k for k in str(self.options["keys"]).split(",") if k]
        elif "keys_path" in self.options:
            with open(self.options["keys_path"]) as f:
                self.keys = [line.strip() for line in f if line.strip()]
        else:
            raise ValueError("tmdb_rest requires a 'keys' or 'keys_path' option")
        self.num_partitions = int(self.options.get("num_partitions", "4"))

    def partitions(self) -> Sequence[InputPartition]:
        n = max(1, min(self.num_partitions, len(self.keys) or 1))
        shards = [self.keys[i::n] for i in range(n)]
        return [_KeyShard(s) for s in shards if s]

    def read(self, partition: _KeyShard) -> Iterator[tuple]:
        # runs on executors: build the transport lazily per task
        transport_kind = self.options.get("transport", "fake")
        if transport_kind == "fixture":
            with open(self.options["fixture_path"]) as f:
                table = json.load(f)

            def _fetch(k: str):
                if str(k) in table:
                    return 200, {}, table[str(k)]
                return 404, {}, None

        elif transport_kind == "fake":
            _fetch = _fake_transport()
        else:
            raise ValueError(f"unknown transport {transport_kind!r}")

        policy = RetryPolicy(
            max_retries=int(self.options.get("max_retries", "3")),
            backoff=float(self.options.get("backoff", "0")),
            sleep=lambda _s: None,  # offline transports never need real sleep
        )
        for key in partition.keys:
            r = fetch_with_retry(_fetch, key, policy)
            yield (
                str(r["key"]),
                r["success"],
                r["error"],
                json.dumps(r["payload"]) if r["payload"] is not None else None,
            )


def register(spark) -> None:
    """Register the source on a session: ``register(spark)`` then
    ``spark.read.format("tmdb_rest")``."""
    spark.dataSource.register(RestDataSource)


# ---------------------------------------------------------------------------
# Streaming Python DataSource: deterministic synthetic event feed
# ---------------------------------------------------------------------------

EVENTS_FEED_DDL = "event_id bigint, user_id bigint, value double"

_FEED_MULT = 2_654_435_761  # Knuth multiplicative constant (public domain)


def _feed_row(i: int) -> tuple:
    """Deterministic event i — pure function of the index, so the stream's
    content is replayable from offsets alone and an external oracle can
    regenerate it in SQL (``(i * mult) % 1000 / 10`` over a series)."""
    return (i, i % 7, ((i * _FEED_MULT) % 1000) / 10.0)


class _FeedStreamReader:
    """``SimpleDataSourceStreamReader`` for the synthetic feed: offsets are
    ``{"idx": n}`` (events emitted so far); each ``read`` advances by at most
    ``batch_size``; ``readBetweenOffsets`` regenerates any committed range
    exactly (the replay contract that makes the source exactly-once under
    checkpoint recovery — determinism IS the transaction log here)."""

    def __init__(self, options: dict):
        self.n_total = int(options.get("n_total", 1000))
        self.batch_size = int(options.get("batch_size", 100))

    def initialOffset(self) -> dict:
        return {"idx": 0}

    def read(self, start: dict):
        lo = int(start["idx"])
        hi = min(lo + self.batch_size, self.n_total)
        return (iter([_feed_row(i) for i in range(lo, hi)]), {"idx": hi})

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([_feed_row(i) for i in range(int(start["idx"]), int(end["idx"]))])

    def commit(self, end: dict) -> None:
        pass  # nothing to clean up: the feed is regenerable from offsets


class SyntheticEventsDataSource(DataSource):
    """``spark.readStream.format("synthetic_events")`` — a CUSTOM STREAMING
    source through Spark 4's Python DataSource API (the streaming sibling of
    ``RestDataSource``): schema declared up front, offsets owned by the
    source, micro-batch planning driven by ``batch_size``. Options:
    ``n_total`` (feed length; the stream idles at the end — a replayed test
    feed), ``batch_size`` (rows per micro-batch).
    """

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return EVENTS_FEED_DDL

    def simpleStreamReader(self, schema) -> _FeedStreamReader:
        return _FeedStreamReader(self.options)


def register_synthetic(spark) -> None:
    """Register the streaming feed source for this session."""
    spark.dataSource.register(SyntheticEventsDataSource)


# ---------------------------------------------------------------------------
# Streaming REST ingest: the reference's core job as a continuous source
# ---------------------------------------------------------------------------


class _RestStreamReader:
    """``SimpleDataSourceStreamReader`` over a key list: offsets are
    ``{"pos": n}`` (keys ingested so far); each micro-batch fetches the next
    ``page_size`` keys through the full retry/quarantine state machine and
    emits envelope rows. ``readBetweenOffsets`` re-fetches a committed range
    — exactly-once holds because the offline transports are deterministic
    per key (a live HTTP deployment would instead persist fetched pages to
    a replay log before commit, noted here as the production difference).
    The feed idles once every key is ingested (backfill-shaped; a live
    deployment would refresh the key list per poll)."""

    def __init__(self, options: dict):
        self.options = dict(options)
        if "keys" in self.options:
            self.keys = [k for k in str(self.options["keys"]).split(",") if k]
        elif "keys_path" in self.options:
            with open(self.options["keys_path"]) as f:
                self.keys = [line.strip() for line in f if line.strip()]
        else:
            raise ValueError("tmdb_rest_stream requires 'keys' or 'keys_path'")
        self.page_size = int(self.options.get("page_size", "20"))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _fetch_range(self, lo: int, hi: int):
        transport_kind = self.options.get("transport", "fake")
        if transport_kind == "fixture":
            with open(self.options["fixture_path"]) as f:
                table = json.load(f)

            def _fetch(k: str):
                if str(k) in table:
                    return 200, {}, table[str(k)]
                return 404, {}, None

        elif transport_kind == "fake":
            _fetch = _fake_transport()
        else:
            raise ValueError(f"unknown transport {transport_kind!r}")
        policy = RetryPolicy(
            max_retries=int(self.options.get("max_retries", "3")),
            backoff=float(self.options.get("backoff", "0")),
            sleep=lambda _s: None,
        )
        for key in self.keys[lo:hi]:
            r = fetch_with_retry(_fetch, key, policy)
            yield (
                str(r["key"]),
                r["success"],
                r["error"],
                json.dumps(r["payload"]) if r["payload"] is not None else None,
            )

    def read(self, start: dict):
        lo = int(start["pos"])
        hi = min(lo + self.page_size, len(self.keys))
        # materialize: Spark's prefetch cache copy.copy()s the returned
        # iterator, which a generator cannot survive (list iterators can)
        return (iter(list(self._fetch_range(lo, hi))), {"pos": hi})

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(list(self._fetch_range(int(start["pos"]), int(end["pos"]))))

    def commit(self, end: dict) -> None:
        pass


class RestStreamDataSource(DataSource):
    """``spark.readStream.format("tmdb_rest_stream")`` — the reference's
    batch ingest job re-expressed as a CONTINUOUS source: same envelope
    schema, same retry/quarantine semantics, but key pages arrive as
    micro-batches with source-owned offsets, so downstream
    validate/quarantine/aggregate stages run incrementally instead of as a
    nightly batch."""

    @classmethod
    def name(cls) -> str:
        return "tmdb_rest_stream"

    def schema(self) -> str:
        return ENVELOPE_DDL

    def simpleStreamReader(self, schema) -> _RestStreamReader:
        return _RestStreamReader(self.options)


def register_rest_stream(spark) -> None:
    spark.dataSource.register(RestStreamDataSource)


# ---------------------------------------------------------------------------
# Python DataSource WRITER — the sink-side counterpart of the sources above
# ---------------------------------------------------------------------------


@dataclass
class _JsonlCommit(WriterCommitMessage):
    """Per-task commit message: the staged temp file + its row count."""

    tmp_name: str = ""
    n_rows: int = 0


class JsonLinesDataSource(DataSource):
    """Batch JSON-lines SINK via the Spark 4 Python DataSource writer API —
    ``df.write.format("jsonl_py").option("path", ...).mode("overwrite").save()``.

    Demonstrates the full two-phase WriterCommitMessage protocol in Python
    (the piece ``RestDataSource`` doesn't cover — reference S5 is a plain
    driver-side JSON dump, ``fetch_movies.py:285-286``):

    - each task streams its partition to
      ``_tmp_<jobToken>_<taskAttemptId>.jsonl`` (the job token is drawn
      once on the DRIVER when the writer is built and travels to executors
      inside the pickled writer, so every task of one job shares it;
      the attempt id keeps speculative / retried attempts from colliding)
      and returns the temp name + row count as its commit message;
    - the DRIVER's ``commit`` renames exactly the reported temp files to
      final ``part-N.jsonl`` names and drops a ``_SUCCESS`` marker —
      temp files from failed or speculative attempts are never renamed, so
      readers (which ignore ``_tmp_*``) see an all-or-nothing result; in
      APPEND mode the stale-staging sweep is scoped to THIS job's token,
      so a concurrent appender targeting the same directory never has its
      staging deleted mid-write, while OVERWRITE mode asserts exclusive
      directory ownership (Spark's insert-overwrite contract) and sweeps
      ALL staging — reclaiming zombies an aborted job's cancelled tasks
      created after abort's own token sweep ran;
    - in append mode final part numbering CONTINUES past the highest
      existing ``part-N`` (a second commit never clobbers the first's
      files) and ``_SUCCESS`` carries the cumulative row count;
    - ``abort`` deletes whatever staged files the failed job reported.

    Options: ``path`` (required). Overwrite mode clears previous committed
    output at commit time (write-first: the old data survives any failure
    before the final rename step, the ``write_bucketed_table`` discipline).

    Deployment constraint (shared by the streaming twin): tasks stage into
    ``path`` on the EXECUTOR's filesystem and the DRIVER renames in
    ``commit`` — correct on local[...] and on any shared POSIX filesystem
    (NFS, Lustre), which is this sink's declared scope. On a multi-node
    cluster over independent local disks or an object store, commit would
    find nothing to rename; there, use Spark's native committer-backed
    sinks (``spark.write.json``) — this class exists to demonstrate the
    Python commit protocol, not to replace them (same adjudication as the
    marker-file connectors in ``sources/io.py``).
    """

    @classmethod
    def name(cls) -> str:
        return "jsonl_py"

    def writer(self, schema, overwrite: bool) -> "JsonLinesWriter":
        path = self.options.get("path")
        if not path:
            raise ValueError("jsonl_py writer requires option 'path'")
        return JsonLinesWriter(path, [f.name for f in schema.fields], overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "JsonLinesStreamWriter":
        path = self.options.get("path")
        if not path:
            raise ValueError("jsonl_py stream writer requires option 'path'")
        return JsonLinesStreamWriter(path, [f.name for f in schema.fields])


def _staged_jsonl(path: str, field_names: list, token: str, iterator) -> _JsonlCommit:
    """Executor side of both JSONL writers: stream one partition to a
    staging file named by (job token, task attempt id) — unique per job AND
    per attempt, so the commit-time sweep can target exactly one job's
    leftovers and retried/speculative attempts never share a file."""
    import os

    from pyspark import TaskContext

    ctx = TaskContext.get()
    attempt = ctx.taskAttemptId() if ctx is not None else os.getpid()
    os.makedirs(path, exist_ok=True)
    tmp_name = f"_tmp_{token}_{attempt}.jsonl"
    n = 0
    with open(os.path.join(path, tmp_name), "w") as f:
        for row in iterator:
            f.write(json.dumps(dict(zip(field_names, row)), default=str))
            f.write("\n")
            n += 1
    return _JsonlCommit(tmp_name=tmp_name, n_rows=n)


def _sweep_staging(path: str, token: str) -> None:
    """Delete leftover staging files belonging to ONE job token (failed or
    speculative attempts whose messages never reached commit). Staging from
    any other writer targeting the same directory is left alone."""
    import os

    prefix = f"_tmp_{token}_"
    for name in os.listdir(path):
        if name.startswith(prefix):
            os.remove(os.path.join(path, name))


def _acquire_commit_lock(path: str, timeout: float = 30.0, stale: float = 60.0) -> str:
    """Serialize APPEND-mode commits across concurrent writer jobs sharing
    one directory (ADVICE_r08): without it, two drivers committing at once
    can both read the same ``_max_part_index``, pick the same start index,
    and ``os.replace``-clobber each other's part files — and the cumulative
    ``_SUCCESS`` row count races the same read-modify-write way. Token
    scoping only protects STAGING names, not final names.

    Classic O_CREAT|O_EXCL lock file. A lock older than ``stale`` seconds is
    presumed abandoned (a commit crashed between acquire and release — the
    rename loop it guards takes milliseconds) and stolen; waiting past
    ``timeout`` raises rather than deadlocking the job. POSIX-local like the
    rest of this sink (see the module scope note)."""
    import contextlib
    import os
    import time

    lock = os.path.join(path, "_COMMIT_LOCK")
    deadline = time.monotonic() + timeout
    while True:
        try:
            fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            return lock
        except FileExistsError:
            try:
                age = time.time() - os.path.getmtime(lock)
            except OSError:
                continue  # holder released between open and stat — retry now
            if age > stale:
                with contextlib.suppress(OSError):
                    os.remove(lock)
                continue
            if time.monotonic() > deadline:
                raise TimeoutError(
                    f"jsonl append commit: lock {lock} held longer than "
                    f"{timeout}s by another writer"
                )
            time.sleep(0.05)


def _max_part_index(path: str) -> int:
    """Highest committed part-N index in the directory, -1 if none —
    append-mode commits continue numbering from here."""
    import os

    best = -1
    for name in os.listdir(path):
        if name.startswith("part-") and name.endswith(".jsonl"):
            digits = name[len("part-") : -len(".jsonl")]
            if digits.isdigit():
                best = max(best, int(digits))
    return best


class JsonLinesWriter(DataSourceWriter):
    def __init__(self, path: str, field_names: list, overwrite: bool):
        import uuid

        self.path = path
        self.field_names = field_names
        self.overwrite = overwrite
        # drawn once on the driver; pickled out to every task of this job
        self.job_token = uuid.uuid4().hex[:12]

    def write(self, iterator) -> _JsonlCommit:
        return _staged_jsonl(self.path, self.field_names, self.job_token, iterator)

    def commit(self, messages) -> None:
        import contextlib
        import os

        total = 0
        lock = None
        if self.overwrite:
            for name in os.listdir(self.path):
                if name.startswith("part-") or name == "_SUCCESS":
                    os.remove(os.path.join(self.path, name))
            start = 0
        else:
            # Append coexists with concurrent appenders, so the whole
            # read-numbering / rename / _SUCCESS-accumulate sequence is
            # serialized behind a directory lock (ADVICE_r08: without it two
            # commits can pick the same start index and clobber each other's
            # part files, and the cumulative row count loses updates).
            lock = _acquire_commit_lock(self.path)
            start = _max_part_index(self.path) + 1
            marker = os.path.join(self.path, "_SUCCESS")
            if os.path.exists(marker):
                with open(marker) as f:
                    total = int(f.read().strip() or 0)
        try:
            for i, m in enumerate(m for m in messages if m is not None):
                os.replace(
                    os.path.join(self.path, m.tmp_name),
                    os.path.join(self.path, f"part-{start + i:05d}.jsonl"),
                )
                total += m.n_rows
            with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
                f.write(str(total))
        finally:
            if lock is not None:
                with contextlib.suppress(OSError):
                    os.remove(lock)
        if self.overwrite:
            # Overwrite asserts EXCLUSIVE directory ownership (the same
            # contract as Spark's native insert-overwrite — concurrent
            # writers to one overwritten path are undefined), so sweep ALL
            # staging: this is what reclaims zombie files a cancelled task
            # of an aborted job managed to create after its abort() sweep
            # ran (the abort-vs-task-teardown race).
            for name in os.listdir(self.path):
                if name.startswith("_tmp_"):
                    os.remove(os.path.join(self.path, name))
        else:
            # Append mode coexists with concurrent appenders — only this
            # job's token is safe to sweep (needs no serialization: staging
            # names are token-unique, so it runs after lock release).
            _sweep_staging(self.path, self.job_token)

    def abort(self, messages) -> None:
        import contextlib
        import os

        # Sweep THIS job's whole token prefix, not just reported messages:
        # a task that died mid-write never produced a commit message, but
        # its staging file still carries our token. Other jobs' staging is
        # untouched (their tokens differ).
        with contextlib.suppress(OSError):
            _sweep_staging(self.path, self.job_token)


def register_jsonl_writer(spark) -> None:
    """Register the JSON-lines sink: ``register_jsonl_writer(spark)`` then
    ``df.write.format("jsonl_py").option("path", ...).save()``."""
    spark.dataSource.register(JsonLinesDataSource)


class JsonLinesStreamWriter(DataSourceStreamWriter):
    """Streaming twin of ``JsonLinesWriter`` — the per-EPOCH two-phase
    commit that makes the sink exactly-once under Structured Streaming's
    retry model: a failed/retried micro-batch re-runs ``write`` (new
    attempt-unique temp files) and then ``commit(messages, batchId)``
    REPLACES any files a previous attempt of the SAME batch already
    renamed (epoch-idempotent), so replays never duplicate rows — the
    ``foreachBatch`` dynamic-partition-overwrite discipline of
    ``streaming/sinks.py``, expressed through the DataSource API.

    Staging is token-scoped like the batch writer (one token per query
    run, drawn on the driver), so a second query writing the same path
    never has its in-flight staging swept. Epoch bookkeeping is a SINGLE
    ``_LATEST_EPOCH`` marker (``<batchId>:<rows>``, replaced atomically via
    temp + ``os.replace``) rather than one ``_epoch_N`` file per
    micro-batch — a long-running query no longer accumulates unbounded
    marker files, and a retried epoch leaves exactly one unambiguous
    record. Same shared-filesystem scope as ``JsonLinesDataSource``."""

    def __init__(self, path: str, field_names: list):
        import uuid

        self.path = path
        self.field_names = field_names
        self.job_token = uuid.uuid4().hex[:12]

    def write(self, iterator) -> _JsonlCommit:
        return _staged_jsonl(self.path, self.field_names, self.job_token, iterator)

    def commit(self, messages, batchId: int) -> None:
        import os

        prefix = f"part-{batchId:09d}-"
        # epoch idempotence: a retried batch replaces its own earlier files
        for name in os.listdir(self.path):
            if name.startswith(prefix):
                os.remove(os.path.join(self.path, name))
        total = 0
        for i, m in enumerate(m for m in messages if m is not None):
            os.replace(
                os.path.join(self.path, m.tmp_name),
                os.path.join(self.path, f"{prefix}{i:05d}.jsonl"),
            )
            total += m.n_rows
        _sweep_staging(self.path, self.job_token)
        marker_tmp = os.path.join(self.path, f"_tmp_{self.job_token}_marker")
        with open(marker_tmp, "w") as f:
            f.write(f"{batchId}:{total}")
        os.replace(marker_tmp, os.path.join(self.path, "_LATEST_EPOCH"))

    def abort(self, messages, batchId: int) -> None:
        import contextlib

        # token-scoped like the batch abort: cleans even mid-write deaths
        # of this query's tasks, never a concurrent query's staging
        with contextlib.suppress(OSError):
            _sweep_staging(self.path, self.job_token)
