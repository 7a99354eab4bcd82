"""Event-time windowed aggregation with watermarks (Structured Streaming).

The reference is batch-only (SURVEY.md §2.10) — this is the Spark home for
the streaming-shaped analytics a transcript/event pipeline needs at scale:
tumbling event-time windows with late-data handling.  The batch twin
(`w7_event_tumbling_agg` in plans/entry_queries.py) is value-checked
against DuckDB; this module adds the streaming semantics on top:

* ``withWatermark(ts, watermark)`` bounds state: windows older than
  ``max(event time) - watermark`` are finalized and their state dropped —
  without it, a 10^12-event stream accumulates unbounded window state.
* **Append output mode** emits each window exactly once, when the
  watermark passes its end — the right contract for an append-only
  (Iceberg-style) sink: no row is ever rewritten.
* Late events inside the watermark still merge into their window (it has
  not emitted yet); events later than the watermark are dropped, and the
  drop is observable in ``n`` (tested in test_streaming_windowed.py).

Scale notes: the aggregation shuffles on (window, event_type) — a
well-distributed composite key; state lives in the state store partitioned
by the same key, sized by (windows in watermark horizon) × (types), which
is independent of total stream length."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def windowed_event_counts(
    stream: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    slide: str | None = None,
) -> DataFrame:
    """Tumbling — or, with ``slide``, hopping — event-time window
    aggregation over a streaming DataFrame (batch twins:
    `w7_event_tumbling_agg` / `w9_sliding_event_windows`).

    Same logical aggregation as the batch twin; `withWatermark` is the only
    streaming-specific line — the point of expressing the plan
    declaratively.  Hopping windows multiply state by window/slide
    (each event lives in that many open windows) — the watermark bound
    still holds per window."""
    w = (
        F.window(F.col("ts"), window, slide)
        if slide
        else F.window(F.col("ts"), window)
    )
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(w.alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4
            ).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def run_windowed_drain(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    slide: str | None = None,
) -> None:
    """Drain currently-available event files (AvailableNow) into an
    append-only parquet sink of FINALIZED windows.

    Each invocation emits exactly the windows the advancing watermark
    closed since the last run — the streaming generalization of the
    reference's incremental one-row-at-a-time append (main.py:283-295),
    with the checkpoint replacing the CSV resume index.  Blocking."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .option("path", input_dir)
        .load()
    )
    q = (
        windowed_event_counts(stream, window=window, watermark=watermark, slide=slide)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
