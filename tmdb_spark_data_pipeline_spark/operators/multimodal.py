"""Multimodal column plumbing (BASELINE.json north star).

Image/audio/video payloads are opaque ``binary`` columns + a typed metadata
struct. The Spark-side plumbing — schema, partition sizing, Arrow batch shape
through ``mapInPandas`` — is real and tested; the actual codec calls are
stubbed (the image/audio libraries are not in this container) behind
``decode_stub`` / a deterministic fake feature extractor, clearly marked.

Design for scale: binary payloads ride in their own column so Parquet keeps
them in separate column chunks — metadata-only queries never read the bytes
(column pruning). Batch size through Arrow is controlled by
``spark.sql.execution.arrow.maxRecordsPerBatch`` — for multi-MB payloads set
it low (e.g. 64) so an Arrow batch stays under a few hundred MB.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import ColumnOrName, _col

#: Canonical schema for a multimodal asset column group.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("n_bytes", T.LongType(), True),
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)


def pack_binary(df: DataFrame, text_col: str, id_col: str, media_type: str = "image") -> DataFrame:
    """Wrap a column's bytes as an asset row (used to exercise the plumbing
    on the synthetic ``documents`` table: text bytes stand in for payloads)."""
    payload = F.encode(_col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        F.lit(media_type).alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(_col(text_col)).cast("long").alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def payload_stats(df: DataFrame) -> DataFrame:
    """Metadata-only scan: never touches the payload column (Parquet column
    pruning keeps the bytes on disk)."""
    return df.groupBy("media_type").agg(
        F.count("*").alias("n_assets"),
        F.sum(F.col("meta.n_bytes")).alias("total_bytes"),
        F.max(F.col("meta.n_bytes")).alias("max_bytes"),
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("digest", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def decode_stub(payload: bytes) -> Any:
    """Codec boundary. Real deployments plug PIL/libav here.

    STUB: the decode libraries are not in this container.
    """
    raise NotImplementedError("media codecs are not available in this environment")


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake 'embedding' from payload bytes (stands in for a
    model forward pass so the distributed plumbing is testable)."""
    import hashlib

    h = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in h[:dim]]


def extract_features(df: DataFrame, *, dim: int = 8) -> DataFrame:
    """Feature extraction over binary payloads via ``mapInPandas``.

    Arrow-batched: each pandas batch holds whole payloads; per-batch Python
    cost is one loop over binaries, not one Python call per row via ``udf``.
    """
    import hashlib

    import pandas as pd

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else None),
                    "digest": payloads.map(lambda b: hashlib.sha256(b).hexdigest() if b is not None else None),
                    "feature": payloads.map(lambda b: _fake_feature(b, dim) if b is not None else None),
                }
            )

    return df.select("asset_id", "payload").mapInPandas(op, FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: computes the frame timestamps to decode
    from metadata only (duration), leaving decode to ``decode_stub``. Shows
    the explode-side shape without touching payloads."""
    return df.filter(F.col("media_type") == "video").select(
        "asset_id",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.coalesce(F.col("meta.duration_ms"), F.lit(0)), F.lit(every_ms).cast("long"))
        ).alias("frame_ts_ms"),
    )
