"""Streaming exact dedup — content-keyed, watermark-bounded state.

The batch `operators.dedup.exact_dedup` answers "which rows are dups" over
a finished corpus; a live ingest pipeline needs the streaming form: emit
each content key's FIRST arrival, drop re-arrivals, and — critically at
10¹²-turn scale — bound the dedup state.  `dropDuplicatesWithinWatermark`
keeps a key's state only until the watermark passes its event time + the
horizon: re-arrivals inside the horizon (retries, replays, mirrored
crawls — the realistic duplication window) drop; a re-arrival months later
re-emits rather than holding every key ever seen in the state store.

State sizing: keys in the watermark horizon × (key + timestamp) bytes,
independent of stream length — the property a naive `dropDuplicates`
(unbounded state) lacks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mistral_ocr_pipeline_spark.functions.text_functions import norm_key_col
from mistral_ocr_pipeline_spark.streaming.windowed import EVENTS_SCHEMA  # noqa: F401

TRANSCRIPTS_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string,"
    " ts timestamp"
)


def dedup_stream(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """First arrival per content key within the watermark horizon."""
    keyed = stream.withColumn(
        "content_key", F.md5(norm_key_col(F.col("text")))
    ).withWatermark("ts", watermark)
    return keyed.dropDuplicatesWithinWatermark(["content_key"])


def run_dedup_drain(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    watermark: str = "1 hour",
) -> None:
    """AvailableNow drain: append the deduplicated prefix of the stream."""
    stream = (
        spark.readStream.schema(TRANSCRIPTS_DDL)
        .format("parquet")
        .option("path", input_dir)
        .load()
    )
    q = (
        dedup_stream(stream, watermark=watermark)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
