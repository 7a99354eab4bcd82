"""Data-quality profiling — the Deequ/Great-Expectations-shaped pass a
training-data warehouse runs on every ingested table before curation
touches it (null spikes, cardinality collapse, and length drift are the
first symptoms of a broken upstream crawler or a bad schema migration).

Scale shape: ONE aggregation job over the table.  Every metric is a
map-side-combinable partial (count / count-if / min / max / sum), and the
exact distinct counts ride Spark's Expand-based multi-distinct rewrite —
one shuffle total regardless of how many columns are profiled.  The
single 1-row aggregate then unpivots driver-free via ``stack`` into one
row per column.  Nothing corpus-sized moves; output is #columns rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F
from pyspark.sql.types import NumericType, StringType

MICRO = 1_000_000


def profile_columns(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Profile ``columns`` (default: all string/numeric columns) into one
    row each: ``(column, n_rows, n_null, n_distinct, min_repr, max_repr,
    mean_micro)``.

    * ``n_distinct`` is the EXACT non-null distinct count (swap to
      ``approx_count_distinct`` at 100 TB if ±2% is acceptable — the rest
      of the plan is unchanged).
    * ``min_repr``/``max_repr`` are the extreme values cast to string —
      binary (codepoint) string ordering on both engines.
    * ``mean_micro`` is an exact BIGINT floor-division micro-unit mean of
      the column's numeric value, or of its LENGTH for strings — integer
      arithmetic end to end, so the value is bit-identical across
      partitionings and engines (no double summation).
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    if columns is None:
        columns = [
            n for n, t in fields.items()
            if isinstance(t, (StringType, NumericType))
        ]
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for c in columns:
        col = F.col(c)
        metric = (
            F.length(col).cast("long")
            if isinstance(fields[c], StringType)
            else col.cast("long")
        )
        aggs += [
            F.count_if(col.isNull()).cast("long").alias(f"{c}__n_null"),
            F.count_distinct(col).cast("long").alias(f"{c}__n_distinct"),
            F.min(col).cast("string").alias(f"{c}__min_repr"),
            F.max(col).cast("string").alias(f"{c}__max_repr"),
            F.sum(metric).alias(f"{c}__sum_metric"),
            F.count(metric).alias(f"{c}__cnt_metric"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__n_null`, `{c}__n_distinct`, `{c}__min_repr`,"
        f" `{c}__max_repr`,"
        f" CASE WHEN `{c}__cnt_metric` = 0 THEN CAST(NULL AS BIGINT)"
        f" ELSE `{c}__sum_metric` * {MICRO} DIV `{c}__cnt_metric` END"
        for c in columns
    )
    return one.select(
        F.expr(
            f"stack({len(columns)}, {stack_args}) AS "
            "(column, n_null, n_distinct, min_repr, max_repr, mean_micro)"
        ),
        F.col("n_rows"),
    ).select(
        "column", "n_rows", "n_null", "n_distinct",
        "min_repr", "max_repr", "mean_micro",
    )


def _profile_metric(df: DataFrame, c: str) -> F.Column:
    kind = dict((f.name, f.dataType) for f in df.schema.fields)[c]
    col = F.col(c)
    return (
        F.length(col).cast("long") if isinstance(kind, StringType)
        else col.cast("long")
    )


def profile_shards(
    df: DataFrame,
    columns: list[str] | None = None,
    shard_col: str = "shard",
    k: int = 256,
    salt: str = "profile",
) -> DataFrame:
    """The MERGEABLE form of the profiler — what a sharded/streaming
    warehouse stores per partition in a stats table instead of
    re-profiling the union on every question.  One row per
    (shard, column) holding ONLY lattice facts:

      n_rows / n_null / sum_metric / cnt_metric  (sums — additive),
      min_metric / max_metric                    (min/max laws),
      kmv                                        (bottom-k distinct
                                                  sketch array — union
                                                  then re-cut),

    so `merge_profiles` over ANY shard subset equals a direct profile of
    that subset (the `profile_merge` driver query hash-proves it, the
    lattice laws are pinned in test_ops).  Metric = value for numerics,
    char length for strings (value extrema as strings would NOT merge —
    '10' < '9' lexically — which is why the mergeable form tracks metric
    extrema, unlike one-shot `profile_columns`).

    Scale shape per column: scalar facts are one combinable groupBy on
    the shard key; the sketch pass collapses to DISTINCT (shard, hash)
    map-side first, and the per-shard bottom-k window then ranks only
    distinct 8-byte hashes — never raw values, never non-distinct rows."""
    from mistral_ocr_pipeline_spark.operators.sketches import _kmv_hash

    fields = {f.name: f.dataType for f in df.schema.fields}
    if columns is None:
        columns = [
            n for n, t in fields.items()
            if n != shard_col and isinstance(t, (StringType, NumericType))
        ]
    out = None
    for c in columns:
        metric = _profile_metric(df, c)
        scal = df.groupBy(F.col(shard_col).alias("shard")).agg(
            F.lit(c).alias("column"),
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count_if(F.col(c).isNull()).cast("long").alias("n_null"),
            F.min(metric).alias("min_metric"),
            F.max(metric).alias("max_metric"),
            F.sum(metric).alias("sum_metric"),
            F.count(metric).cast("long").alias("cnt_metric"),
        )
        hw = W.partitionBy("shard").orderBy("h")
        kmv = (
            df.select(
                F.col(shard_col).alias("shard"),
                _kmv_hash(F.col(c), f"{salt}:{c}").alias("h"),
            )
            .filter(F.col("h").isNotNull())
            .distinct()
            .withColumn("_r", F.row_number().over(hw))
            .filter(F.col("_r") <= k)
            .groupBy("shard")
            .agg(F.sort_array(F.collect_list("h")).alias("kmv"))
        )
        part = scal.join(kmv, "shard", "left").withColumn(
            "kmv", F.coalesce(F.col("kmv"), F.array().cast("array<long>"))
        )
        out = part if out is None else out.unionByName(part)
    return out.select(
        "shard", "column", "n_rows", "n_null", "min_metric", "max_metric",
        "sum_metric", "cnt_metric", "kmv",
    )


def merge_profiles(profiles: DataFrame, k: int = 256) -> DataFrame:
    """Fold per-shard profile rows into one row per column: sums add,
    extrema take min/max, the sketches union-and-recut (bottom-k of a
    union of bottom-k sets == bottom-k of the union), and the distinct
    ESTIMATE uses the exact `sketches.kmv_estimate` formula — exact
    below k, (k-1)/theta above.  Input can be any subset of shards; the
    result is identical to `profile_shards` on that subset's rows
    collapsed to one shard, which is how append-only stats tables answer
    table-level questions without rescanning data."""
    from mistral_ocr_pipeline_spark.operators.sketches import _KMV_SCALE

    scal = profiles.groupBy("column").agg(
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.sum("n_null").cast("long").alias("n_null"),
        F.min("min_metric").alias("min_metric"),
        F.max("max_metric").alias("max_metric"),
        F.sum("sum_metric").alias("sum_metric"),
        F.sum("cnt_metric").cast("long").alias("cnt_metric"),
    )
    hw = W.partitionBy("column").orderBy("h")
    kmv = (
        profiles.select("column", F.explode("kmv").alias("h"))
        .distinct()
        .withColumn("_r", F.row_number().over(hw))
        .filter(F.col("_r") <= k)
        .groupBy("column")
        .agg(
            F.sort_array(F.collect_list("h")).alias("kmv"),
            F.count(F.lit(1)).cast("long").alias("n_sketch"),
            F.max("h").alias("kth_hash"),
        )
    )
    est = (
        F.when(F.col("n_sketch") < k, F.col("n_sketch").cast("double"))
        .otherwise(F.lit(float(k - 1)) * F.lit(_KMV_SCALE) / F.col("kth_hash"))
    )
    return (
        scal.join(kmv, "column", "left")
        .select(
            "column", "n_rows", "n_null", "min_metric", "max_metric",
            F.expr(
                "CASE WHEN cnt_metric = 0 THEN CAST(NULL AS BIGINT)"
                f" ELSE sum_metric * {MICRO} DIV cnt_metric END"
            ).alias("mean_micro"),
            F.coalesce(F.col("n_sketch"), F.lit(0)).alias("n_sketch"),
            F.coalesce(est, F.lit(0.0)).alias("est_distinct"),
        )
    )


_CONSTRAINT_METRICS = (
    "n_rows", "n_null", "n_distinct", "null_frac_micro", "mean_micro",
    "est_distinct",
)
_CONSTRAINT_OPS = ("le", "ge", "eq")


def check_constraints(
    profile: DataFrame, constraints: list[tuple]
) -> DataFrame:
    """Deequ/Great-Expectations-style declarative DATA CONTRACT
    evaluated against a `profile_columns` relation: each constraint is
    ``(column, metric, op, threshold)`` with metric one of
    ``n_rows/n_null/n_distinct/null_frac_micro/mean_micro`` (the
    null fraction in integer micro-units, derived as n_null·10⁶ div
    n_rows) and op ``le/ge/eq``.  The contract is DATA (a tiny joined
    relation), not code — add a row, not a branch — and the evaluation
    costs one broadcast join over the #columns-row profile, so gating a
    10^12-row table's ingest on its contract is free once the profile
    exists.  A constraint naming an unprofiled column fails closed
    (passed = false, observed NULL) — a contract must never silently
    skip.  Output: (column, metric, op, threshold, observed, passed)."""
    # metrics this profile FORM can answer: direct columns, the derived
    # null fraction, and (mergeable form) the KMV distinct estimate —
    # a constraint the form cannot answer is a SPEC error, not a data
    # failure, and raises at submission
    avail = set(profile.columns) & set(_CONSTRAINT_METRICS)
    if {"n_rows", "n_null"} <= set(profile.columns):
        avail.add("null_frac_micro")
    for c in constraints:
        if c[1] not in _CONSTRAINT_METRICS:
            raise ValueError(f"unknown metric {c[1]!r}")
        if c[1] not in avail:
            raise ValueError(
                f"metric {c[1]!r} not available in this profile form "
                f"(has: {sorted(avail)})"
            )
        if c[2] not in _CONSTRAINT_OPS:
            raise ValueError(f"unknown op {c[2]!r}")
    spark = profile.sparkSession
    cdf = spark.createDataFrame(
        [(str(a), str(m), str(o), int(t)) for a, m, o, t in constraints],
        "column string, metric string, op string, threshold long",
    )
    j = cdf.join(F.broadcast(profile), "column", "left")
    observed = F.when(F.col("metric") == "n_rows", F.col("n_rows")).when(
        F.col("metric") == "n_null", F.col("n_null")
    )
    if "n_distinct" in profile.columns:
        observed = observed.when(
            F.col("metric") == "n_distinct", F.col("n_distinct")
        )
    if "est_distinct" in profile.columns:
        observed = observed.when(
            F.col("metric") == "est_distinct",
            F.round(F.col("est_distinct"), 0),
        )
    observed = observed.when(
        F.col("metric") == "null_frac_micro",
        F.expr("CASE WHEN n_rows > 0 THEN (n_null * 1000000) div n_rows END"),
    )
    if "mean_micro" in profile.columns:
        observed = observed.when(
            F.col("metric") == "mean_micro", F.col("mean_micro")
        )
    observed = observed.cast("long")
    j = j.withColumn("observed", observed)
    passed = (
        F.when(F.col("observed").isNull(), F.lit(False))
        .when(F.col("op") == "le", F.col("observed") <= F.col("threshold"))
        .when(F.col("op") == "ge", F.col("observed") >= F.col("threshold"))
        .otherwise(F.col("observed") == F.col("threshold"))
    )
    return j.select(
        "column", "metric", "op", "threshold", "observed",
        passed.alias("passed"),
    )
