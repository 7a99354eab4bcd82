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

from pyspark.sql import DataFrame, functions as F
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
