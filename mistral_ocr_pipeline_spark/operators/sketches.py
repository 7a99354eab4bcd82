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

from pyspark.sql import DataFrame, Window as W, functions as F


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


def heavy_hitters_rollup(
    df: DataFrame,
    shard_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Approximate global heavy hitters from per-shard top-k summaries —
    the frequency twin of ``approx_distinct_rollup``: keep only each
    shard's ``k`` most frequent values (plus one scalar per shard, its
    (k+1)-th count, as the truncation bound) in a summary table, and
    answer "global top values" from the summaries alone with PROVABLE
    bounds, never rescanning the raw corpus.

    For a candidate value v:

    * ``est_count``  = Σ counts over shards whose top-k contains v — a
      certain LOWER bound (those counts are exact).
    * ``max_count``  = est_count + Σ over the OTHER shards of their
      (k+1)-th count — an upper bound, since v escaped those shards'
      top-k and so appears < err_s times in each.

    est ≤ true ≤ max always holds, and any value whose true count
    exceeds Σ_s err_s must appear as a candidate (it cannot miss every
    shard's top-k) — the SpaceSaving/Misra-Gries guarantee re-expressed
    relationally: every step is a Catalyst groupBy/window over the
    summary rows, deterministic for a content-derived ``shard_col``, so
    a SQL oracle replays it value-for-value (no sketch opacity).

    Scale shape: stage 1 is one map-side-combined shuffle of (shard,
    value) partials; everything after touches ≤ shards×k summary rows.
    At 100 TB the summary table is written once per ingest batch
    (mergeable: top-k of merged summaries re-truncates) and global
    top-k queries never touch the corpus again."""
    counts = df.groupBy(shard_col, value_col).agg(F.count(F.lit(1)).alias("c"))
    w = W.partitionBy(shard_col).orderBy(F.col("c").desc(), F.col(value_col).asc())
    ranked = counts.withColumn("_rn", F.row_number().over(w))
    kept = ranked.filter(F.col("_rn") <= k)
    errs = ranked.filter(F.col("_rn") == k + 1).select(
        F.col(shard_col), F.col("c").alias("_err")
    )
    total_err = errs.agg(F.coalesce(F.sum("_err"), F.lit(0)).alias("_total_err"))
    per_value = (
        kept.join(errs, shard_col, "left")
        .fillna(0, subset=["_err"])
        .groupBy(value_col)
        .agg(
            F.sum("c").alias("est_count"),
            F.sum("_err").alias("_covered_err"),
        )
    )
    return per_value.crossJoin(F.broadcast(total_err)).select(
        value_col,
        "est_count",
        (F.col("est_count") + F.col("_total_err") - F.col("_covered_err")).alias(
            "max_count"
        ),
    )
