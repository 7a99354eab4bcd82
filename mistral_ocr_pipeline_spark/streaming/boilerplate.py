"""Incremental host-boilerplate stripping: maintain per-host line
frequencies under a page stream and clean arriving batches with them.

The batch operator (``operators/dedup.host_boilerplate_strip``) derives
per-host distinct-doc line frequencies in one pass; a crawl never
stops, so this module keeps the fact pair ALIVE: each micro-batch's
(host, line-digest, ndocs) cells and per-host doc totals merge into the
stored tables by the additive lattice law
(`host_boilerplate_facts_append` — each document arrives in exactly one
batch, so its 0/1 contribution to a cell lands with its batch, and the
maintained facts equal a one-shot rebuild; pinned in
tests/test_streaming_boilerplate.py), then the batch itself is stripped
against the MERGED facts — i.e. with everything the corpus knows about
each host so far, including what this batch just taught it — and the
cleaned rows append to the output table.  History pages are never
re-scanned.

Online caveat, stated rather than hidden: a page that arrived before
its host's template became statistically visible keeps its boilerplate
(its strip used the facts of its time).  The FACTS always equal the
one-shot rebuild, so a periodic re-strip of old partitions against
current facts (a batch `host_boilerplate_strip_with_facts` run) is the
standard compaction; the stream's own outputs converge to the batch
result for every page arriving after the template crosses the gate.

Exactly-once: ``foreachBatch`` is at-least-once and a replayed merge
would double-count ndocs/totals, so each batch commits facts + totals +
stripped + lineage in ONE atomic catalog commit and replays are
skipped by (stream_id, batch_id) with the UUID-marker
checkpoint-lifecycle identity (``streaming/identity.py``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mistral_ocr_pipeline_spark.operators.dedup import (
    host_boilerplate_facts,
    host_boilerplate_facts_append,
    host_boilerplate_strip_with_facts,
)
from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog
from mistral_ocr_pipeline_spark.streaming.identity import stream_identity


def run_incremental_boilerplate(
    spark: SparkSession,
    input_dir: str,
    schema,
    catalog: TableCatalog,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    host_col: str = "host",
    min_docs: int = 4,
    df_num: int = 3,
    df_den: int = 10,
    min_line_chars: int = 8,
    facts_table: str = "bp_line_facts",
    totals_table: str = "bp_host_totals",
    stripped_table: str = "bp_stripped",
    lineage_table: str = "bp_lineage",
) -> None:
    """Drain available page files, fold their line facts into the
    maintained pair, and append the batch stripped against the merged
    facts.  Each micro-batch publishes {facts, totals, stripped,
    lineage} in ONE atomic commit; replays (same stream_id + batch_id
    already in lineage) are no-ops."""
    stream_id = stream_identity(checkpoint_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if catalog.exists(lineage_table):
            seen = catalog.read(lineage_table).filter(
                (F.col("batch_id") == batch_id)
                & (F.col("stream_id") == stream_id)
            )
            if seen.limit(1).count():
                return
        if catalog.exists(facts_table):
            facts, totals = host_boilerplate_facts_append(
                catalog.read(facts_table),
                catalog.read(totals_table),
                batch_df,
                id_col,
                text_col,
                host_col,
                min_line_chars,
            )
        else:
            facts, totals = host_boilerplate_facts(
                batch_df, id_col, text_col, host_col, min_line_chars
            )
        # the merge reads the tables it replaces → materialize BEFORE
        # staging the overwrite
        facts = facts.localCheckpoint(eager=True)
        totals = totals.localCheckpoint(eager=True)
        stripped = host_boilerplate_strip_with_facts(
            batch_df,
            facts,
            totals,
            id_col,
            text_col,
            host_col,
            min_docs,
            df_num,
            df_den,
            min_line_chars,
        )
        lineage = spark.createDataFrame(
            [(stream_id, int(batch_id))], "stream_id string, batch_id long"
        )
        catalog.commit(
            {
                facts_table: catalog.stage_overwrite(facts, facts_table),
                totals_table: catalog.stage_overwrite(totals, totals_table),
                stripped_table: catalog.stage_append(
                    stripped, stripped_table
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
