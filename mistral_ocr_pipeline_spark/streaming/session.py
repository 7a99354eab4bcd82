"""Streaming session windows with watermarks (Structured Streaming).

The streaming twin of the batch gaps-and-islands query
(`w8_event_session_windows` in plans/entry_queries.py, DuckDB-oracled):
per-user sessions that merge while events keep arriving within the gap
and finalize once the watermark passes ``last event + gap``.

* ``F.session_window(ts, gap)`` is a MERGING window: unlike tumbling
  windows, state for a key's open session is updated in place and two
  open sessions merge when a bridging event arrives — exactly the
  gaps-and-islands semantics, with the boundary convention verified in
  the batch twin (an exactly-``gap`` interval MERGES; a new session only
  when the gap is strictly exceeded).
* **Append mode + watermark** emits each session exactly once, after it
  can no longer grow — the append-only-sink contract; late events behind
  the watermark are dropped rather than reopening an emitted session.

Scale notes: state is keyed by (user_id, open session) — one entry per
user with activity inside the watermark horizon, independent of stream
length.  The shuffle key is user_id; the per-TRIGGER input for a hot key
is bounded by (user event rate × trigger interval) — the streaming
analog of the batch chunk bound — so a bot user costs one busy state
task, not an unbounded gather.  If a single trigger's hot-key volume
ever becomes the bottleneck, pre-aggregate per micro-batch with the
batch two-phase sessionizer (``operators/sessionize.salted_session_
windows`` with chunk = trigger interval) and feed session FRAGMENTS to
the stateful merge — same boundary-merge algebra, state unchanged."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mistral_ocr_pipeline_spark.streaming.windowed import EVENTS_SCHEMA


def sessionized_event_counts(
    stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Per-user session aggregation over a streaming DataFrame — same
    logical result as the batch twin on finalized sessions."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(
            F.session_window(F.col("ts"), gap).alias("sw"), F.col("user_id")
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.min("ts").alias("session_start"))
        .select("user_id", "session_start", "n_events")
    )


def run_session_drain(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "30 minutes",
) -> None:
    """Drain available event files (AvailableNow) into an append-only
    parquet sink of FINALIZED sessions; each invocation emits exactly the
    sessions the advancing watermark closed since the last run."""
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .format("parquet")
        .option("path", input_dir)
        .load()
    )
    q = (
        sessionized_event_counts(stream, gap=gap, watermark=watermark)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
