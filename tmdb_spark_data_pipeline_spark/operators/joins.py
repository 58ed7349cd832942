"""Join surface (SURVEY.md §2.3).

The reference performs zero joins (single denormalized entity), but the
engine exposes the full surface because the normalized model (movies ↔
credits ↔ genres, and the driver's TPC-H-ish tables) is the idiomatic Spark
design. Everything here is built-in plumbing plus scale policy:

- dimension tables are broadcast (``F.broadcast``) — no shuffle of the fact
  side; at 100 TB a shuffled 600 GB/s exchange vs. a 1 MB broadcast is the
  whole game,
- AQE converts sort-merge→broadcast at runtime when stats allow, and splits
  skewed partitions (enabled in the session factory),
- as-of joins (no native Spark op) are composed from built-ins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

JOIN_TYPES = ("inner", "left", "right", "full", "left_semi", "left_anti", "cross")


def join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | Column,
    how: str = "inner",
    *,
    broadcast_right: bool = False,
) -> DataFrame:
    if how not in JOIN_TYPES:
        raise ValueError(f"unsupported join type {how!r}")
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on, how)


def star_join(fact: DataFrame, dims: list[tuple[DataFrame, list[str] | Column]], how: str = "inner") -> DataFrame:
    """Fact table joined to N dimension tables, all broadcast.

    The TPC-H shape: ``lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region`` where
    everything right of the fact is small enough to ship to every executor.
    """
    out = fact
    for dim, on in dims:
        out = out.join(F.broadcast(dim), on, how)
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_time: str,
    right_time: str,
    direction: str = "backward",
    left_id: str | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    ``right_time <= left_time`` (direction='backward') per key.

    Spark has no native as-of join; this composes built-ins:
    range-condition join + window dedup. The range join shuffles both sides
    on ``on``; for the 100 TB path, pre-bucket both sides on ``on`` so the
    exchange is avoided. (Alternative: ``applyInPandas`` + ``pd.merge_asof``
    per key group — kept out of the hot path per UDF policy.)

    Determinism contract:

    - ``left_id`` names a unique left key: the dedup window partitions by it
      alone, so the shuffle key is one column (not the whole left row) and
      fully-duplicate left rows each keep their own match. Without it the
      window falls back to all left columns, which silently collapses exact
      duplicates — acceptable only when the left side is known duplicate-free.
    - ``tiebreak`` names a right column ordering ties on ``right_time``
      (descending for 'backward', ascending for 'forward'); without it, equal
      timestamps pick an arbitrary right row.
    """
    from pyspark.sql import Window

    lt, rt = F.col(f"l.{left_time}"), F.col(f"r.{right_time}")
    cond = (F.col(f"l.{on}") == F.col(f"r.{on}")) & (rt <= lt if direction == "backward" else rt >= lt)
    l, r = left.alias("l"), right.alias("r")
    joined = l.join(r, cond, "left")
    part = (
        [F.col(f"l.{left_id}")]
        if left_id is not None
        else [F.col(f"l.{c}") for c in left.columns]
    )
    order = [rt.desc_nulls_last() if direction == "backward" else rt.asc_nulls_last()]
    if tiebreak is not None:
        tb = F.col(f"r.{tiebreak}")
        order.append(tb.desc_nulls_last() if direction == "backward" else tb.asc_nulls_last())
    w = Window.partitionBy(*part).orderBy(*order)
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    *,
    salt: int = 8,
    how: str = "inner",
    salt_by: str | None = None,
) -> DataFrame:
    """Skew-salted equi-join: the (big, skewed) ``left`` gets a deterministic
    salt in ``[0, salt)``, the (smaller) ``right`` is replicated ``salt``
    times, and the join key becomes ``(on, salt)`` — a hot key's rows spread
    over ``salt`` reducers instead of one.

    This is the *manual* fallback for when AQE skew-join splitting can't
    help: AQE splits oversized partitions of a sort-merge join, but a single
    hot KEY still lands in one partition per split boundary, and broadcast is
    off the table when the right side is too big. Salting rewrites the key
    space itself.

    The salt comes from ``xxhash64`` of ``salt_by`` (or the whole left row) —
    deterministic under task retry, unlike ``rand()``-based salting, which
    can duplicate or drop rows when a retried task re-draws.

    Inner/left joins only: an unmatched right row would surface ``salt``
    times under right/full semantics. Cost model: right side is scanned
    ``salt``× (explode) — keep ``salt`` small (4-16) and the right side lean
    (project before salting).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    if salt < 2:
        raise ValueError(f"salt must be >= 2, got {salt}")
    src = F.col(salt_by) if salt_by else F.struct(*[F.col(c) for c in left.columns])
    lsalted = left.withColumn("__salt", F.pmod(F.xxhash64(src), F.lit(salt)))
    rsalted = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(salt)]))
    )
    return lsalted.join(rsalted, [on, "__salt"], how).drop("__salt")


def interval_overlap_pairs(
    df: DataFrame,
    id_col: str,
    start_col: str,
    end_col: str,
    *,
    bucket_seconds: int = 3600,
    distinct_on: list[str] | None = None,
) -> DataFrame:
    """Interval-interval OVERLAP self-join: unordered pairs of rows whose
    closed intervals ``[start, end]`` intersect (``a.start ≤ b.end AND
    b.start ≤ a.end``), with ``a.id < b.id``. Output: the pair ids plus
    both intervals (``id_a, start_a, end_a, id_b, start_b, end_b``).

    Spark has no native interval join, and the naive form is a
    nested-loop cross product with a non-equi condition — the classic
    scale-killer. The standard distributed shape: EXPLODE each interval to
    the fixed-width time buckets it covers, equi-join on the bucket (the
    blocking step — only co-bucketed intervals ever meet), ``distinct`` the
    candidate pairs (an interval pair sharing k buckets meets k times),
    then verify the exact overlap predicate. Complete by construction:
    overlapping intervals share at least one covered bucket. Cost scales
    with intervals-per-bucket density, not |rows|²; long intervals fan out
    by ``duration/bucket_seconds`` rows — pick ``bucket_seconds`` near the
    typical interval span so the fan-out stays O(1) per row. A degenerate
    hot bucket (everything overlapping one rush hour) is a skew key like
    any other: AQE skew-split applies to the bucket equi-join.

    ``distinct_on``: extra key columns carried through blocking (and the
    pair-distinct) — e.g. partition the overlap test by day so the bucket
    key never collides across unrelated ranges.
    """
    sec_start = F.unix_timestamp(F.col(start_col))
    sec_end = F.unix_timestamp(F.col(end_col))
    extra = distinct_on or []
    buckets = df.select(
        F.col(id_col).alias("__id"),
        F.col(start_col).alias("__s"),
        F.col(end_col).alias("__e"),
        *[F.col(c) for c in extra],
        F.explode(
            F.sequence(
                F.floor(sec_start / bucket_seconds).cast("long"),
                F.floor(sec_end / bucket_seconds).cast("long"),
            )
        ).alias("__bkt"),
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    join_cond = (F.col("a.__bkt") == F.col("b.__bkt")) & (
        F.col("a.__id") < F.col("b.__id")
    )
    for c in extra:
        join_cond = join_cond & (F.col(f"a.{c}") == F.col(f"b.{c}"))
    cand = (
        a.join(b, join_cond)
        .select(
            F.col("a.__id").alias("id_a"),
            F.col("a.__s").alias("start_a"),
            F.col("a.__e").alias("end_a"),
            F.col("b.__id").alias("id_b"),
            F.col("b.__s").alias("start_b"),
            F.col("b.__e").alias("end_b"),
        )
        .distinct()
    )
    return cand.filter(
        (F.col("start_a") <= F.col("end_b")) & (F.col("start_b") <= F.col("end_a"))
    )


def asof_join_cogrouped(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_time: str,
    right_time: str,
    right_cols: tuple[str, ...],
    tolerance: str | None = None,
    tiebreak: str | None = None,
) -> DataFrame:
    """As-of join via COGROUPED ``applyInPandas`` + ``pd.merge_asof`` — the
    sixth tier of the sanctioned-Python matrix (scalar / grouped-agg /
    applyInPandas / mapInPandas / applyInPandasWithState / cogroup), and the
    escape hatch the expression-composed ``asof_join`` documents: both sides
    cogroup on the key, each (left-group, right-group) pair merges
    backward-as-of inside one Arrow batch.

    Semantics match ``asof_join(direction="backward")``: ``merge_asof``
    takes the LAST right row at an equal timestamp, so sorting the right
    side by ``(right_time, tiebreak)`` reproduces the composed form's
    ``tiebreak DESC`` exactly; without a tiebreak, equal timestamps resolve
    by input order (nondeterministic under shuffling). ``tolerance`` (a
    pandas offset alias like ``"7D"``) bounds how stale a match may be — a
    feature the range-join form would express as an extra predicate.

    The right side is re-aliased to fresh ``r_*`` attributes BEFORE the
    cogroup: when both sides derive from the same source, same-name columns
    share attribute ids and Spark's self-join deduplication rewrites one
    side's projection out from under the UDF (observed: the right batch
    arriving without its time column).

    Scale shape: one shuffle per side on ``on`` (exactly like the composed
    form's range join), then per-key pandas merges — state is one key's
    rows, so skew bound = rows per key. Right-side output columns are
    prefixed ``r_``.
    """
    import pandas as pd

    lcols = left.columns
    if tiebreak == right_time:
        tiebreak = None  # sorting by the time column twice adds nothing
    rkey = "__r_on"  # internal-only key name: never collides with an r_* alias
    rtime = f"r_{right_time}"
    rsel = right.select(
        F.col(on).alias(rkey),
        *([] if right_time in right_cols else [F.col(right_time).alias(rtime)]),
        *[F.col(c).alias(f"r_{c}") for c in right_cols],
        *(
            [F.col(tiebreak).alias(f"r_{tiebreak}")]
            if tiebreak and tiebreak not in right_cols
            else []
        ),
    )
    rtb = f"r_{tiebreak}" if tiebreak else None
    out_fields = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields
    )
    rstruct = {f.name: f for f in right.schema.fields}
    out_fields += ", " + ", ".join(
        f"r_{c} {rstruct[c].dataType.simpleString()}" for c in right_cols
    )

    def merge(l: "pd.DataFrame", r: "pd.DataFrame") -> "pd.DataFrame":
        l = l.sort_values(left_time)
        if r.empty:
            out = l.copy()
            for c in right_cols:
                out[f"r_{c}"] = None
            return out[[*lcols, *[f"r_{c}" for c in right_cols]]]
        r = r.sort_values([rtime, rtb] if rtb else [rtime])
        kwargs = {"tolerance": pd.Timedelta(tolerance)} if tolerance else {}
        merged = pd.merge_asof(
            l, r, left_on=left_time, right_on=rtime,
            direction="backward", **kwargs,
        )
        return merged[[*lcols, *[f"r_{c}" for c in right_cols]]]

    return (
        left.groupBy(on)
        .cogroup(rsel.groupBy(rkey))
        .applyInPandas(lambda l, r: merge(l, r), out_fields)
    )
