"""Mergeable sketches — cardinality estimation at warehouse scale.

``count(DISTINCT x)`` shuffles every distinct value; at 100 TB that is
the difference between a dashboard query and a cluster-wide sort.  The
HyperLogLog path shuffles fixed-size sketch buffers instead:

* ``approx_distinct``      — per-group estimate via ``hll_sketch_agg``
  (Apache DataSketches HLL, built into Spark): map-side partial sketches,
  one exchange of ~2^lgk-byte buffers per group, deterministic for a
  given input set (no RNG — order-insensitive hashing).
* ``approx_distinct_rollup`` — the mergeability story: per-shard sketch
  column → ``hll_union_agg`` rollup WITHOUT rescanning the data.  This is
  the pattern a lakehouse uses to keep per-partition sketch columns in a
  stats table and answer "distinct across any partition subset" from the
  stats alone.

Estimates are engine-specific (DuckDB's approx_count_distinct is a
different sketch), so the driver query checks them as a VERIFIED CLAIM:
it emits the exact count plus a boolean "estimate within tolerance",
both SQL-replayable — the oracle hash-match then certifies the sketch
landed inside its error envelope without pretending the estimate itself
is portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def approx_distinct(
    df: DataFrame,
    group_cols: list[str],
    target_col: str,
    lgk: int = 12,
) -> DataFrame:
    """(group_cols…, approx_distinct) — HLL estimate per group.

    ``lgk`` trades sketch size (2^lgk bytes-ish) against error
    (~1.04/sqrt(2^lgk): lgk=12 → ~1.6% relative standard error)."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(target_col), F.lit(lgk))
        ).alias("approx_distinct")
    )


def approx_distinct_rollup(
    df: DataFrame,
    shard_col: str,
    group_cols: list[str],
    target_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Two-level sketch rollup: build one sketch per (shard, group), then
    union sketches per group — the second level never touches the raw
    data, only the fixed-size buffers.  Returns (group_cols…,
    approx_distinct) identical to the one-level estimate (HLL union is
    lossless for same-lgk sketches), proving per-partition sketch columns
    can serve cross-partition distinct queries."""
    per_shard = df.groupBy(shard_col, *group_cols).agg(
        F.hll_sketch_agg(F.col(target_col), F.lit(lgk)).alias("_sk")
    )
    return per_shard.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("_sk"))).alias(
            "approx_distinct"
        )
    )
