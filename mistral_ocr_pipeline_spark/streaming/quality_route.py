"""Streaming quality routing: bucket arriving documents against FROZEN
per-language perplexity thresholds (the CCNet production shape —
`text_analysis.perplexity_thresholds` built once per corpus release)
and append them to their bucket partition continuously.

Why frozen thresholds and not streaming ntile: a windowed tercile over a
micro-batch would re-define "head quality" per batch (tiny batches →
noisy boundaries, and the bucket of a document would depend on what it
arrived WITH).  Routing against a persisted boundary table keeps bucket
membership a pure function of the document — reproducible, and a
zero-shuffle broadcast-CASE per batch.

Exactly-once protocol shared with the other streaming modules: routed
rows + per-batch lineage publish in ONE atomic catalog commit; the
stream identity carries the checkpoint lifecycle's UUID marker so a
wiped-and-recreated checkpoint (batch ids restart at 0) is not misread
as a replay.  NULL buckets (languages absent from the thresholds table)
are routed to an 'unseen' partition rather than dropped — new languages
surface in the output where a filter would silently lose them."""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, functions as F

from mistral_ocr_pipeline_spark.operators.text_analysis import (
    apply_perplexity_thresholds,
)
from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog
from mistral_ocr_pipeline_spark.streaming.identity import stream_identity


def run_quality_route(
    spark: SparkSession,
    input_dir: str,
    schema,
    thresholds: DataFrame,
    catalog: TableCatalog,
    checkpoint_dir: str,
    score_col: str = "surprisal",
    group_col: str = "lang",
    routed_table: str = "routed_docs",
    lineage_table: str = "route_lineage",
) -> None:
    """Drain available files, bucket each row against ``thresholds``
    (the `perplexity_thresholds` shape: (group, bounds)), and append to
    ``routed_table`` partitioned by bucket.  Replays are no-ops."""
    stream_id = stream_identity(checkpoint_dir)
    # pin the boundary table once for the whole run: routing must not
    # drift if the thresholds table is rebuilt mid-stream
    frozen = thresholds.localCheckpoint(eager=True)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if catalog.exists(lineage_table):
            seen = catalog.read(lineage_table).filter(
                (F.col("batch_id") == batch_id)
                & (F.col("stream_id") == stream_id)
            )
            if seen.limit(1).count():
                return
        routed = apply_perplexity_thresholds(
            batch_df, frozen, score_col=score_col, group_col=group_col
        ).withColumn("bucket", F.coalesce(F.col("bucket"), F.lit("unseen")))
        lineage = spark.createDataFrame(
            [(stream_id, int(batch_id))], "stream_id string, batch_id long"
        )
        catalog.commit(
            {
                routed_table: catalog.stage_append(
                    routed, routed_table, partition_by=["bucket"]
                ),
                lineage_table: catalog.stage_append(lineage, lineage_table),
            }
        )

    q = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("path", input_dir)
        .load()
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
