"""Streaming maintenance of the conversation pathology fact table —
spin episodes, session-ending flags, and context-budget fit
(`transcript_qc.transcript_pathology_facts`) kept current as transcript
turns stream into the warehouse.

Facts are NOT lattice-mergeable (a batch turn can extend a spin run that
started in history, flip the final-turn flags, and shift the
suffix-budget window), so each micro-batch routes through
`transcript_qc.pathology_facts_append`: recompute ONLY the touched
conversations over their full history ∪ batch, carry every other fact
row over untouched — O(touched + |facts|) per batch, never O(history
turns).  The maintained table is therefore HASH-IDENTICAL to a one-shot
rebuild over everything ingested (pinned in
tests/test_streaming_pathology.py), including spin runs that cross
micro-batch boundaries.

Exactly-once protocol shared with the other streaming modules: the turn
history append, the fact-table swap, and the per-batch lineage publish
in ONE atomic catalog commit; the stream identity carries the checkpoint
lifecycle's UUID marker so a wiped-and-recreated checkpoint (batch ids
restart at 0) is not misread as a replay."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mistral_ocr_pipeline_spark.operators.transcript_qc import (
    pathology_facts_append,
    transcript_pathology_facts,
)
from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog
from mistral_ocr_pipeline_spark.streaming.identity import stream_identity


def run_pathology_facts(
    spark: SparkSession,
    input_dir: str,
    schema,
    catalog: TableCatalog,
    checkpoint_dir: str,
    min_run: int = 2,
    budget: int = 256,
    turns_table: str = "pathology_turns",
    facts_table: str = "pathology_facts",
    lineage_table: str = "pathology_lineage",
) -> None:
    """Drain available files of transcript turns; per batch, append the
    turns to ``turns_table`` and swap ``facts_table`` to the merged fact
    relation, atomically.  Replays are no-ops."""
    stream_id = stream_identity(checkpoint_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if catalog.exists(lineage_table):
            seen = catalog.read(lineage_table).filter(
                (F.col("batch_id") == batch_id)
                & (F.col("stream_id") == stream_id)
            )
            if seen.limit(1).count():
                return
        if catalog.exists(turns_table):
            hist = catalog.read(turns_table)
            facts = catalog.read(facts_table)
        else:
            hist = batch_df.limit(0)
            facts = transcript_pathology_facts(
                hist, min_run=min_run, budget=budget
            )
        merged = pathology_facts_append(
            facts, hist, batch_df, min_run=min_run, budget=budget
        )
        lineage = spark.createDataFrame(
            [(stream_id, int(batch_id))], "stream_id string, batch_id long"
        )
        catalog.commit(
            {
                turns_table: catalog.stage_append(batch_df, turns_table),
                facts_table: catalog.stage_overwrite(merged, facts_table),
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
