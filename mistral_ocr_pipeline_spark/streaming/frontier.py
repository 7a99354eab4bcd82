"""Incremental crawl-frontier ingest: maintain the frontier fact table
under a discovered-link stream.

The batch operator (``operators/urls.frontier_facts``) collapses one
batch of discovered links to per-canonical-URL mention-mass facts; a
crawl never stops discovering links, so this module keeps the frontier
ALIVE: each micro-batch's facts merge into the stored table via the
additive ``frontier_append`` law — history batches are never re-scanned,
and the maintained table equals a one-shot ``frontier_facts`` over every
link ever ingested (the batch-twin test pins it at every step).
Scheduling (trap/blocklist/robots gates + politeness waves) stays in
``spark_jobs/frontier_job.py`` / the `crawl_admission_pipeline` query —
this module owns only the state.

Exactly-once: ``foreachBatch`` is at-least-once, and a replayed merge
would double-count mention mass, so each batch commits frontier +
lineage in ONE atomic catalog commit and replays are skipped by
(stream_id, batch_id) with the UUID-marker checkpoint-lifecycle identity
(``streaming/identity.py`` — batch ids restart at 0 when a checkpoint is
wiped and recreated, so a path-only key would misread a fresh
lifecycle's batches as replays)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mistral_ocr_pipeline_spark.operators.urls import (
    frontier_append,
    frontier_facts,
)
from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog
from mistral_ocr_pipeline_spark.streaming.identity import stream_identity


def run_incremental_frontier(
    spark: SparkSession,
    input_dir: str,
    schema,
    catalog: TableCatalog,
    checkpoint_dir: str,
    url_col: str = "url",
    frontier_table: str = "frontier",
    lineage_table: str = "frontier_lineage",
) -> None:
    """Drain available link files and fold them into the frontier table.

    Each micro-batch publishes {frontier, lineage} in ONE atomic commit;
    replays (same stream_id + batch_id already in lineage) are no-ops."""
    stream_id = stream_identity(checkpoint_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if catalog.exists(lineage_table):
            seen = catalog.read(lineage_table).filter(
                (F.col("batch_id") == batch_id)
                & (F.col("stream_id") == stream_id)
            )
            if seen.limit(1).count():
                return
        facts = frontier_facts(batch_df, url_col)
        if catalog.exists(frontier_table):
            merged = frontier_append(catalog.read(frontier_table), facts)
        else:
            merged = facts
        # the merge reads the table it replaces → materialize BEFORE
        # staging the overwrite
        merged = merged.localCheckpoint(eager=True)
        lineage = spark.createDataFrame(
            [(stream_id, int(batch_id))], "stream_id string, batch_id long"
        )
        catalog.commit(
            {
                frontier_table: catalog.stage_overwrite(
                    merged, frontier_table
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
