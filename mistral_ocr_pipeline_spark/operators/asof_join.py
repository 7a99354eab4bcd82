"""As-of (temporal) join — for each left row, the most recent right row
at or before its timestamp, per key.

Spark has no native ASOF JOIN (DuckDB/Pandas/kdb do).  The naive
formulations both fail at scale: an inequality theta-join explodes to a
range join (O(n·m) per key), and a windowed subquery per left row
re-scans.  This is the single-shuffle formulation instead:

    union(left tagged 1, right tagged 0)
      → one shuffle: partitionBy(key) orderBy(ts, tag)
      → F.last(right cols, ignorenulls=True) over rows UNBOUNDED..CURRENT
      → filter tag=1

One exchange, one sort, zero row multiplication — each row is touched
once, and the running "last right value" carries forward inside the sort
order.  Right rows sort BEFORE left rows at equal ts (tag 0 < 1), giving
the standard inclusive backward semantics (a right row at exactly t
matches a left row at t) — byte-compatible with DuckDB's ASOF JOIN, which
is this operator's oracle in the driver contract.

Skew note: the shuffle key is the join key alone; a hot key serializes
its partition's sort.  For hot keys use a coarser time-bucketed variant
(bucket the key with floor(ts / bucket) and run twice, current + previous
bucket) — not needed at the driver-contract scales, noted for 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: tuple[str, ...] = (),
    suffix: str = "_asof",
) -> DataFrame:
    """Left as-of join: every left row, plus the latest right row with
    ``right.ts <= left.ts`` on the same ``key`` (nulls when none).

    ``right_cols`` are the right-side payload columns to carry; each is
    emitted as ``<name><suffix>``.  The matched right timestamp is always
    emitted as ``ts<suffix>``."""
    carry = list(right_cols)
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_row"),
        # the null literal must carry right_ts's ACTUAL type (epoch longs and
        # dates are valid as-of axes too) or unionByName type-mismatches
        F.lit(None).cast(right.schema[right_ts].dataType).alias("_rts"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in carry],
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_tag.schema["_row"].dataType).alias("_row"),
        F.col(right_ts).alias("_rts"),
        *[F.col(c).alias(f"_r_{c}") for c in carry],
    )
    w = (
        W.partitionBy("_k")
        .orderBy(F.col("_ts"), F.col("_is_left"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = (
        l_tag.unionByName(r_tag)
        .select(
            "_is_left",
            "_row",
            F.last("_rts", ignorenulls=True).over(w).alias(f"ts{suffix}"),
            *[
                F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
                for c in carry
            ],
        )
        .filter(F.col("_is_left") == 1)
    )
    return matched.select(
        *[F.col(f"_row.{c}").alias(c) for c in left.columns],
        f"ts{suffix}",
        *[f"{c}{suffix}" for c in carry],
    )


def range_join_buckets(
    intervals: DataFrame,
    points: DataFrame,
    key: str,
    start_col: str = "start",
    end_col: str = "end",
    ts_col: str = "ts",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval-containment join (``start <= ts < end`` per key) as an
    EQUI-join.

    Spark plans a naive inequality join as BroadcastNestedLoop/Cartesian —
    O(n·m) per key.  Blocking instead: each interval explodes into the
    integer time buckets it spans (``floor(epoch / width)`` via a
    ``sequence`` flatMap, no shuffle); each point has exactly one bucket;
    the join keys on (key, bucket) — a well-distributed composite — and
    the exact predicate filters inside the joined stream.  A point's
    bucket is unique, so no dedup pass is needed.  Bucket width trades
    explode fan-out (long intervals) against join selectivity; pick ≈ the
    median interval length."""
    width = F.lit(int(bucket_seconds)).cast("long")

    def _b(c: F.Column) -> F.Column:
        return F.floor(F.unix_timestamp(c) / width).cast("long")

    b_intervals = intervals.withColumn(
        "_bucket",
        # window end is exclusive: a point at exactly `end` never matches,
        # but `end` may still land in the last spanned bucket
        F.explode(F.sequence(_b(F.col(start_col)), _b(F.col(end_col)))),
    )
    b_points = points.withColumn("_bucket", _b(F.col(ts_col)))
    return (
        b_intervals.join(b_points, [key, "_bucket"])
        .filter((F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col)))
        .drop("_bucket")
    )
