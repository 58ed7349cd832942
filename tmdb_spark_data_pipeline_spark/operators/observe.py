"""Single-pass data-quality observability (``Dataset.observe``).

The reference logs row counts and rejection rates with separate ``count()``
actions (`ingestion/fetch_movies.py` prints per-run totals; the declared
max-rejection-rate threshold in `config/config.yaml:96-99` is never
enforced). Each extra action is another full scan; at 100 TB a "count then
write" pipeline reads everything twice.

``Dataset.observe`` attaches aggregate metrics to a plan node: they are
computed DURING the one real pass (the write), cost nothing extra, and are
available on the driver after the action — the idiomatic Spark shape for
ingest auditing and threshold enforcement.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation
from pyspark.sql import functions as F


def null_rate(c: str) -> Column:
    """Fraction of rows where ``c`` is null (guarded for empty input)."""
    return F.try_divide(
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)), F.count(F.lit(1))
    ).alias(f"null_rate_{c}")


def standard_metrics(*, null_cols: tuple[str, ...] = ()) -> list[Column]:
    """Row count plus per-column null rates — the ingest audit defaults."""
    return [F.count(F.lit(1)).alias("n_rows"), *[null_rate(c) for c in null_cols]]


def observed_write(
    df: DataFrame,
    path: str,
    *,
    metrics: list[Column] | None = None,
    null_cols: tuple[str, ...] = (),
    mode: str = "overwrite",
    fmt: str = "parquet",
    max_null_rate: float | None = None,
) -> dict[str, object]:
    """Write ``df`` and return quality metrics computed in the SAME pass.

    If ``max_null_rate`` is set, raises ``ValueError`` after the write when
    any observed ``null_rate_*`` exceeds it — the enforced version of the
    reference's declared-but-unenforced rejection threshold. (Enforce-before-
    write needs a staging location + rename; the marker protocol in
    ``sources/io.write_with_marker`` provides exactly that commit point.)
    """
    obs = Observation()
    cols = metrics if metrics is not None else standard_metrics(null_cols=null_cols)
    observed = df.observe(obs, *cols)
    observed.write.mode(mode).format(fmt).save(path)
    got = obs.get
    if max_null_rate is not None:
        bad = {
            k: v
            for k, v in got.items()
            if k.startswith("null_rate_") and v is not None and v > max_null_rate
        }
        if bad:
            raise ValueError(f"null-rate threshold {max_null_rate} exceeded: {bad}")
    return got
