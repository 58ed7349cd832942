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
    # video assets get a synthetic duration (10 ms / payload byte) so the
    # frame-sampling operators have real metadata to schedule against
    duration = (
        (F.octet_length(_col(text_col)) * 10).cast("long")
        if media_type == "video"
        else F.lit(None).cast("long")
    )
    return df.select(
        F.col(id_col).cast("long").alias("asset_id"),
        F.lit(media_type).alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.octet_length(_col(text_col)).cast("long").alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            duration.alias("duration_ms"),
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


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("frame_idx", T.IntegerType(), False),
        T.StructField("t_ms", T.LongType(), False),
        T.StructField("frame_digest", T.StringType(), True),
    ]
)


def sample_frames(
    df: DataFrame, *, every_ms: int = 2000, max_frames: int = 8
) -> DataFrame:
    """Frame sampling over video payloads: one asset row → up to
    ``max_frames`` frame rows at ``every_ms`` intervals, via Arrow-batched
    ``mapInPandas`` (the payload crosses the Python boundary ONCE per
    asset, not once per frame — the generator runs inside the batch).

    The frame 'decode' is the stubbed codec boundary (``decode_stub``):
    here each frame yields a deterministic sha256(payload + '#' + t_ms)
    digest standing in for decoded pixels, so the distributed shape —
    schema, batch fan-out, per-asset state — is real and oracle-checkable
    while the codec library is absent. A real deployment replaces the
    digest line with the libav seek+decode call; nothing else changes.
    """
    import hashlib

    import pandas as pd

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            out: dict[str, list] = {
                "asset_id": [], "frame_idx": [], "t_ms": [], "frame_digest": []
            }
            for aid, payload, dur in zip(
                pdf["asset_id"], pdf["payload"], pdf["duration_ms"]
            ):
                # pd.isna, not `is None`: a nullable long duration_ms column
                # arrives in pandas as float64, so a null is NaN (ADVICE r5 —
                # `is None` never fired and int(NaN) raised instead of
                # honoring the documented skip contract)
                if payload is None or pd.isna(dur):
                    continue
                n_last = min(int(dur) // every_ms, max_frames - 1)
                for i in range(n_last + 1):
                    t = i * every_ms
                    out["asset_id"].append(aid)
                    out["frame_idx"].append(i)
                    out["t_ms"].append(t)
                    out["frame_digest"].append(
                        hashlib.sha256(bytes(payload) + f"#{t}".encode()).hexdigest()
                    )
            yield pd.DataFrame(out)

    src = df.filter(F.col("media_type") == "video").select(
        "asset_id", "payload", F.col("meta.duration_ms").alias("duration_ms")
    )
    return src.mapInPandas(op, FRAME_SCHEMA)
