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
