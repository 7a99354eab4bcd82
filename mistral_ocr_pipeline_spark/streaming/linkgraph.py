"""Incremental link-graph ingest: maintain the host-graph fact table
under a page stream.

The batch operator (``operators/htmllinks.link_graph``) builds the
domain link graph in one pass; a crawl never stops, so this module
keeps the graph ALIVE: each micro-batch of pages has its anchors
extracted and its per-(src_host, dst_host) facts merged into the stored
table via the same lattice law `link_graph_append` proves oracled
(additive n_links / total_anchor_chars, one-batch-per-page n_docs,
bool_or internal) — history pages are never re-scanned.

Exactly-once: ``foreachBatch`` is at-least-once, and a replayed merge
would double-count, so each batch commits graph + lineage in ONE atomic
catalog commit and replays are skipped by (stream_id, batch_id) with
the UUID-marker checkpoint-lifecycle identity (``streaming/identity.py``
— batch ids restart at 0 when a checkpoint is wiped and recreated, so a
path-only key would misread a fresh lifecycle's batches as replays)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mistral_ocr_pipeline_spark.operators.htmllinks import (
    link_graph,
    link_graph_append,
)
from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog
from mistral_ocr_pipeline_spark.streaming.identity import stream_identity


def run_incremental_link_graph(
    spark: SparkSession,
    input_dir: str,
    schema,
    catalog: TableCatalog,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    html_col: str = "html",
    src_host_col: str = "src_host",
    graph_table: str = "link_graph",
    lineage_table: str = "link_graph_lineage",
) -> None:
    """Drain available page files and fold them into the graph table.

    Each micro-batch publishes {graph, lineage} in ONE atomic commit;
    replays (same stream_id + batch_id already in lineage) are no-ops.
    The maintained table equals a one-shot `link_graph` over every page
    ever ingested (the append law `link_graph_append`'s oracle proves;
    the batch-twin test pins it end to end)."""
    stream_id = stream_identity(checkpoint_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if catalog.exists(lineage_table):
            seen = catalog.read(lineage_table).filter(
                (F.col("batch_id") == batch_id)
                & (F.col("stream_id") == stream_id)
            )
            if seen.limit(1).count():
                return
        if catalog.exists(graph_table):
            merged = link_graph_append(
                catalog.read(graph_table),
                batch_df,
                id_col,
                html_col,
                src_host_col,
            )
        else:
            merged = link_graph(batch_df, id_col, html_col, src_host_col)
        # the merge reads the table it replaces → materialize BEFORE
        # staging the overwrite
        merged = merged.localCheckpoint(eager=True)
        lineage = spark.createDataFrame(
            [(stream_id, int(batch_id))], "stream_id string, batch_id long"
        )
        catalog.commit(
            {
                graph_table: catalog.stage_overwrite(merged, graph_table),
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
