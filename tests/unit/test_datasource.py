"""Spark 4 Python DataSource API wrapper for REST ingest."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from tmdb_spark_data_pipeline_spark.sources import datasource


@pytest.fixture(scope="module")
def registered(spark):
    datasource.register(spark)
    return spark


def test_fake_transport_truth_table(registered):
    keys = "m1,m2_404,m3_429,m4_timeout,m5"
    df = (
        registered.read.format("tmdb_rest")
        .option("keys", keys)
        .option("num_partitions", "2")
        .load()
    )
    rows = {r.key: r for r in df.collect()}
    assert len(rows) == 5
    assert rows["m1"].success and rows["m5"].success
    assert rows["m3_429"].success  # rate-limited once, then retried to 200
    assert not rows["m2_404"].success and rows["m2_404"].error == "HTTP_404"
    assert not rows["m4_timeout"].success
    assert rows["m4_timeout"].error == "TRANSPORT_TimeoutError"
    payload = json.loads(rows["m1"].payload_json)
    assert payload["title"] == "movie-m1"


def test_fixture_transport_and_quarantine_split(registered, tmp_path):
    fixture = {"10": {"id": 10, "title": "Ten", "credits": {"cast": [], "crew": []}}}
    fp = tmp_path / "fixture.json"
    fp.write_text(json.dumps(fixture))
    df = (
        registered.read.format("tmdb_rest")
        .option("keys", "10,11")
        .option("transport", "fixture")
        .option("fixture_path", str(fp))
        .load()
    )
    ok = df.filter(F.col("success")).count()
    bad = df.filter(~F.col("success")).count()
    assert (ok, bad) == (1, 1)


def test_partition_planning_bounds(registered):
    df = (
        registered.read.format("tmdb_rest")
        .option("keys", "a,b,c")
        .option("num_partitions", "8")  # more shards than keys -> clamp
        .load()
    )
    assert df.count() == 3
    assert df.rdd.getNumPartitions() <= 3


def test_missing_keys_option_raises(registered):
    with pytest.raises(Exception, match="keys"):
        registered.read.format("tmdb_rest").load().collect()


def test_synthetic_feed_reader_replay_is_exact():
    from tmdb_spark_data_pipeline_spark.sources.datasource import _FeedStreamReader

    r = _FeedStreamReader({"n_total": "25", "batch_size": "10"})
    off = r.initialOffset()
    seen = []
    for _ in range(5):  # 3 data batches then idle
        rows, off = r.read(off)
        seen.extend(rows)
    assert [x[0] for x in seen] == list(range(25))  # all events, exactly once
    assert off == {"idx": 25}  # idles at the end
    # committed-range replay regenerates identical rows (the recovery path)
    replay = list(r.readBetweenOffsets({"idx": 5}, {"idx": 15}))
    assert replay == seen[5:15]


def test_synthetic_feed_streams_deterministically(spark):
    from tmdb_spark_data_pipeline_spark.sources.datasource import register_synthetic
    from tmdb_spark_data_pipeline_spark.streaming.windows import run_stream_to_memory
    from pyspark.sql import functions as F

    register_synthetic(spark)

    def run(name):
        s = (
            spark.readStream.format("synthetic_events")
            .option("n_total", "200").option("batch_size", "30").load()
        )
        agg = s.groupBy("user_id").agg(F.count("*").alias("n"), F.sum("value").alias("t"))
        run_stream_to_memory(agg, name, output_mode="complete")
        return {(r.user_id, r.n, round(r.t, 6)) for r in spark.table(name).collect()}

    a, b = run("synfeed_a"), run("synfeed_b")
    assert a == b and sum(n for _, n, _ in a) == 200


def test_rest_stream_pages_and_replays(spark):
    from pyspark.sql import functions as F

    from tmdb_spark_data_pipeline_spark.sources.datasource import (
        _RestStreamReader,
        register_rest_stream,
    )
    from tmdb_spark_data_pipeline_spark.streaming.windows import run_stream_to_memory

    # reader-level: pages advance, idle at end, committed-range replay exact
    r = _RestStreamReader({"keys": "a,b_404,c,d_429,e", "page_size": "2"})
    off = r.initialOffset()
    rows = []
    for _ in range(4):
        batch, off = r.read(off)
        rows.extend(batch)
    assert [x[0] for x in rows] == ["a", "b_404", "c", "d_429", "e"]
    assert off == {"pos": 5}
    assert [x[0] for x in r.readBetweenOffsets({"pos": 1}, {"pos": 3})] == ["b_404", "c"]
    by_key = {x[0]: x for x in rows}
    assert by_key["b_404"][1] is False and by_key["b_404"][2] == "HTTP_404"
    assert by_key["d_429"][1] is True  # retried to success

    # end-to-end: the streaming source through a real query
    register_rest_stream(spark)
    s = (
        spark.readStream.format("tmdb_rest_stream")
        .option("keys", "k1,k2_404,k3").option("page_size", "2").load()
    )
    agg = s.groupBy("success").agg(F.count("*").alias("n"))
    run_stream_to_memory(agg, "rest_stream_probe", output_mode="complete")
    got = {r.success: r.n for r in spark.table("rest_stream_probe").collect()}
    assert got == {True: 2, False: 1}


def test_jsonl_writer_two_phase_commit(spark, tmp_path):
    """The writer's commit protocol: staged temp files are renamed to
    part-N ONLY at commit, a _SUCCESS marker carries the total row count,
    and no _tmp_ staging files survive a successful job."""
    import json
    import os

    from tmdb_spark_data_pipeline_spark.sources.datasource import (
        register_jsonl_writer,
    )

    register_jsonl_writer(spark)
    path = str(tmp_path / "jsonl_commit")
    df = spark.range(0, 50).selectExpr("id", "id * 3 AS v")
    df.repartition(3).write.format("jsonl_py").option("path", path).mode(
        "overwrite"
    ).save()
    names = sorted(os.listdir(path))
    assert "_SUCCESS" in names
    assert not any(n.startswith("_tmp_") for n in names)
    parts = [n for n in names if n.startswith("part-")]
    assert len(parts) == 3
    rows = []
    for p in parts:
        rows += [json.loads(ln) for ln in open(os.path.join(path, p))]
    assert sorted(r["id"] for r in rows) == list(range(50))
    assert open(os.path.join(path, "_SUCCESS")).read() == "50"


def test_jsonl_writer_failed_job_preserves_previous_output(spark, tmp_path):
    """Write-first discipline: a job that fails mid-write must leave the
    previously committed part files and _SUCCESS fully intact (rename
    happens only in commit, which a failed job never reaches)."""
    import json
    import os

    import pytest
    from pyspark.sql import functions as F

    from tmdb_spark_data_pipeline_spark.sources.datasource import (
        register_jsonl_writer,
    )

    register_jsonl_writer(spark)
    path = str(tmp_path / "jsonl_atomic")
    good = spark.range(0, 10).selectExpr("id", "id AS v")
    good.write.format("jsonl_py").option("path", path).mode("overwrite").save()
    bad = spark.range(0, 10).select(
        F.col("id"),
        F.when(F.col("id") < 5, F.col("id"))
        .otherwise(F.raise_error(F.lit("boom")))
        .alias("v"),
    )
    with pytest.raises(Exception, match="boom"):
        bad.write.format("jsonl_py").option("path", path).mode("overwrite").save()
    names = sorted(os.listdir(path))
    parts = [n for n in names if n.startswith("part-")]
    rows = []
    for p in parts:
        rows += [json.loads(ln) for ln in open(os.path.join(path, p))]
    assert sorted(r["id"] for r in rows) == list(range(10))  # old data intact
    # a subsequent good overwrite still lands cleanly (staging junk cleared)
    spark.range(0, 4).selectExpr("id", "id AS v").write.format("jsonl_py").option(
        "path", path
    ).mode("overwrite").save()
    names2 = sorted(os.listdir(path))
    assert not any(n.startswith("_tmp_") for n in names2)
    rows2 = []
    for p in [n for n in names2 if n.startswith("part-")]:
        rows2 += [json.loads(ln) for ln in open(os.path.join(path, p))]
    assert sorted(r["id"] for r in rows2) == list(range(4))


def test_jsonl_writer_append_continues_numbering(spark, tmp_path):
    """ADVICE_r07 (medium): append mode must not clobber a previous
    commit's part files — final numbering continues past the highest
    existing part and _SUCCESS accumulates the cumulative row count."""
    import json
    import os

    from tmdb_spark_data_pipeline_spark.sources.datasource import (
        register_jsonl_writer,
    )

    register_jsonl_writer(spark)
    path = str(tmp_path / "jsonl_append")
    first = spark.range(0, 10).selectExpr("id", "id AS v")
    first.repartition(2).write.format("jsonl_py").option("path", path).mode(
        "overwrite"
    ).save()
    second = spark.range(100, 110).selectExpr("id", "id AS v")
    second.repartition(2).write.format("jsonl_py").option("path", path).mode(
        "append"
    ).save()
    parts = sorted(n for n in os.listdir(path) if n.startswith("part-"))
    assert parts == [f"part-{i:05d}.jsonl" for i in range(4)]
    rows = []
    for p in parts:
        rows += [json.loads(ln) for ln in open(os.path.join(path, p))]
    assert sorted(r["id"] for r in rows) == list(range(10)) + list(range(100, 110))
    assert open(os.path.join(path, "_SUCCESS")).read() == "20"


def test_jsonl_append_commit_lock(spark, tmp_path):
    """ADVICE_r08 (low): append-mode commits are serialized behind a
    directory lock so two concurrent commits can't pick the same part
    numbers or lose _SUCCESS row-count updates. Pins: the lock helper's
    acquire / stale-steal / timeout behavior, that a held FRESH lock blocks
    an appending job, and that commits release the lock (back-to-back
    appends succeed with no leftover _COMMIT_LOCK)."""
    import os
    import time

    from tmdb_spark_data_pipeline_spark.sources.datasource import (
        _acquire_commit_lock,
        register_jsonl_writer,
    )

    d = str(tmp_path / "lockdir")
    os.makedirs(d)
    # plain acquire/release
    lock = _acquire_commit_lock(d)
    assert os.path.exists(lock)
    os.remove(lock)
    # a fresh foreign lock times out rather than deadlocking
    lock_path = os.path.join(d, "_COMMIT_LOCK")
    with open(lock_path, "w"):
        pass
    t0 = time.monotonic()
    try:
        _acquire_commit_lock(d, timeout=0.3, stale=60.0)
        raise AssertionError("expected TimeoutError")
    except TimeoutError:
        assert time.monotonic() - t0 >= 0.3
    # a STALE lock (dead committer) is stolen, not waited on
    old = time.time() - 120
    os.utime(lock_path, (old, old))
    stolen = _acquire_commit_lock(d, timeout=0.3, stale=60.0)
    os.remove(stolen)

    # end-to-end: consecutive appends release the lock and stay consistent
    register_jsonl_writer(spark)
    path = str(tmp_path / "jsonl_locked")
    for lo, hi in ((0, 3), (10, 14), (20, 25)):
        spark.range(lo, hi).selectExpr("id", "id AS v").write.format(
            "jsonl_py"
        ).option("path", path).mode("append").save()
    assert not os.path.exists(os.path.join(path, "_COMMIT_LOCK"))
    assert open(os.path.join(path, "_SUCCESS")).read() == "12"


def test_jsonl_commit_sweep_scoping(spark, tmp_path):
    """ADVICE_r07 (low): in APPEND mode (the concurrent-coexistence mode)
    the stale-staging sweep only touches THIS job's token — another
    writer's in-flight staging survives the commit. In OVERWRITE mode the
    directory is exclusively owned (Spark's insert-overwrite contract),
    so a subsequent overwrite reclaims any abandoned staging."""
    import os

    from tmdb_spark_data_pipeline_spark.sources.datasource import (
        register_jsonl_writer,
    )

    register_jsonl_writer(spark)
    path = str(tmp_path / "jsonl_foreign")
    os.makedirs(path)
    foreign = os.path.join(path, "_tmp_feedbeefcafe_42.jsonl")
    with open(foreign, "w") as f:
        f.write('{"id": 999}\n')
    spark.range(0, 5).selectExpr("id", "id AS v").write.format("jsonl_py").option(
        "path", path
    ).mode("append").save()
    assert os.path.exists(foreign)  # concurrent appender's staging untouched
    own_parts = [n for n in os.listdir(path) if n.startswith("part-")]
    rows = sum(1 for p in own_parts for _ in open(os.path.join(path, p)))
    assert rows == 5
    # overwrite asserts exclusive ownership: abandoned staging reclaimed
    spark.range(0, 2).selectExpr("id", "id AS v").write.format("jsonl_py").option(
        "path", path
    ).mode("overwrite").save()
    assert not os.path.exists(foreign)
    assert not any(n.startswith("_tmp_") for n in os.listdir(path))


def test_jsonl_stream_commit_single_epoch_marker(tmp_path):
    """ADVICE_r07 (low x2): streaming commit keeps ONE _LATEST_EPOCH
    marker (atomic replace) instead of accumulating per-batch _epoch_N
    files, and a retried epoch leaves one unambiguous record."""
    import os

    from tmdb_spark_data_pipeline_spark.sources.datasource import (
        JsonLinesStreamWriter,
        _JsonlCommit,
    )

    path = str(tmp_path / "stream_sink")
    os.makedirs(path)
    w = JsonLinesStreamWriter(path, ["id"])

    def stage(rows):
        name = f"_tmp_{w.job_token}_{stage.n}.jsonl"
        stage.n += 1
        with open(os.path.join(path, name), "w") as f:
            for r in rows:
                f.write('{"id": %d}\n' % r)
        return _JsonlCommit(tmp_name=name, n_rows=len(rows))

    stage.n = 0
    w.commit([stage([1, 2])], batchId=0)
    w.commit([stage([3])], batchId=1)
    w.commit([stage([3])], batchId=1)  # retried epoch: replaces, not doubles
    names = sorted(os.listdir(path))
    assert not any(n.startswith("_epoch_") for n in names)
    assert names.count("_LATEST_EPOCH") == 1
    assert open(os.path.join(path, "_LATEST_EPOCH")).read() == "1:1"
    assert [n for n in names if n.startswith("part-")] == [
        "part-000000000-00000.jsonl",
        "part-000000001-00000.jsonl",
    ]
