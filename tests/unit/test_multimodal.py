"""Multimodal plumbing tests (BASELINE.json north star): binary payload
schema, Arrow-batched feature extraction, metadata-only pruning."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from tmdb_spark_data_pipeline_spark.operators import multimodal


def _assets(spark):
    docs = spark.createDataFrame([(1, "hello"), (2, "world!")], ["doc_id", "text"])
    return multimodal.pack_binary(docs, "text", "doc_id", media_type="image")


def test_pack_binary_schema_and_meta(spark):
    assets = _assets(spark)
    assert [f.name for f in assets.schema.fields] == ["asset_id", "media_type", "payload", "meta"]
    row = assets.orderBy("asset_id").first()
    assert bytes(row.payload) == b"hello"
    assert row.meta.n_bytes == 5
    assert row.media_type == "image"


def test_payload_stats_aggregates_metadata(spark):
    out = multimodal.payload_stats(_assets(spark)).first()
    assert (out.n_assets, out.total_bytes, out.max_bytes) == (2, 11, 6)


def test_extract_features_digest_matches_hashlib(spark):
    out = multimodal.extract_features(_assets(spark)).orderBy("asset_id").collect()
    assert out[0].digest == hashlib.sha256(b"hello").hexdigest()
    assert out[1].n_bytes == 6
    assert len(out[0].feature) == 8
    assert all(0.0 <= v <= 1.0 for v in out[0].feature)


def test_extract_features_is_deterministic(spark):
    a = multimodal.extract_features(_assets(spark)).orderBy("asset_id").collect()
    b = multimodal.extract_features(_assets(spark)).orderBy("asset_id").collect()
    assert [r.feature for r in a] == [r.feature for r in b]


def test_decode_stub_is_explicitly_stubbed():
    import pytest

    with pytest.raises(NotImplementedError):
        multimodal.decode_stub(b"\x89PNG")


def test_frame_sample_plan_explodes_timestamps(spark):
    docs = spark.createDataFrame([(1, "vid")], ["doc_id", "text"])
    assets = multimodal.pack_binary(docs, "text", "doc_id", media_type="video").withColumn(
        "meta", F.struct(F.lit(2500).cast("long").alias("duration_ms"))
    )
    out = multimodal.frame_sample_plan(assets, every_ms=1000)
    assert [r.frame_ts_ms for r in out.orderBy("frame_ts_ms").collect()] == [0, 1000, 2000]


def test_sample_frames_schedule_cap_and_digest(spark):
    import hashlib

    # 50-char payload -> duration 500*10=5000ms? no: 50 chars -> 500ms*10
    docs = spark.createDataFrame(
        [(1, "x" * 500), (2, "y" * 5000), (3, "z")],  # 5000ms, 50000ms, 10ms
        "doc_id long, text string",
    )
    assets = multimodal.pack_binary(docs, "text", "doc_id", media_type="video")
    rows = multimodal.sample_frames(assets, every_ms=2000, max_frames=8).collect()
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r.asset_id, []).append(r)
    # asset 1: 5000ms -> frames at 0,2000,4000
    assert sorted(r.t_ms for r in by_asset[1]) == [0, 2000, 4000]
    # asset 2: 50000ms -> capped at max_frames=8
    assert len(by_asset[2]) == 8 and max(r.t_ms for r in by_asset[2]) == 14000
    # asset 3: 10ms -> single frame at t=0
    assert [r.t_ms for r in by_asset[3]] == [0]
    # digest is the documented deterministic stand-in
    f0 = next(r for r in by_asset[1] if r.frame_idx == 0)
    assert f0.frame_digest == hashlib.sha256(b"x" * 500 + b"#0").hexdigest()


def test_sample_frames_skips_non_video_and_null_duration(spark):
    docs = spark.createDataFrame([(1, "abc")], "doc_id long, text string")
    image_assets = multimodal.pack_binary(docs, "text", "doc_id", media_type="image")
    assert multimodal.sample_frames(image_assets).count() == 0


def test_sample_frames_mixed_null_durations_in_one_batch(spark):
    """ADVICE r5: a nullable long duration_ms arrives in pandas as float64,
    so a batch mixing null and non-null durations carries NaN — the skip
    guard must be pd.isna, not `is None` (which raised ValueError at
    int(NaN) instead of skipping the row)."""
    import pyspark.sql.functions as F

    docs = spark.createDataFrame(
        [(1, "x" * 500), (2, "y" * 300)], "doc_id long, text string"
    )
    assets = multimodal.pack_binary(docs, "text", "doc_id", media_type="video")
    # null out asset 2's duration while keeping it a video row, then force
    # both rows into one partition so the pandas batch mixes null/non-null
    assets = assets.withColumn(
        "meta",
        F.when(
            F.col("asset_id") == 2,
            F.struct(
                F.col("meta.n_bytes").alias("n_bytes"),
                F.col("meta.mime").alias("mime"),
                F.col("meta.width").alias("width"),
                F.col("meta.height").alias("height"),
                F.lit(None).cast("long").alias("duration_ms"),
            ),
        ).otherwise(F.col("meta")),
    ).coalesce(1)
    rows = multimodal.sample_frames(assets, every_ms=2000, max_frames=8).collect()
    ids = {r.asset_id for r in rows}
    assert 1 in ids and 2 not in ids  # null-duration row skipped, not raised
