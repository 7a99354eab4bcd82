"""Streaming edit-distance dedup against the persisted PassJoin chunk
index — the typo/OCR-noise gate in live-firehose form: every micro-batch
drops documents within ``max_edits`` Levenshtein edits of a smaller-id
batch sibling or of ANY kept history doc, appends the survivors, and
merges THEIR chunks into the index — history text is chunked exactly
once, ever.

Composition of verified pieces, nothing re-derived:

* within-batch pairs: ``operators.dedup.edit_distance_pairs`` (PassJoin
  pigeonhole blocking, salted bounded buckets, exact JVM levenshtein
  verify — completeness hash-proven by `dedup_edit_distance`);
* vs-history pairs: ``operators.dedup.edit_distance_incremental`` (the
  batch plays PassJoin's probe side against the pre-capped posting
  lists; candidate history docs are semi-join-pruned before their text
  is read — proven index-served ≡ full scan by
  `dedup_edit_incremental`);
* index maintenance: ``operators.dedup.edit_index_append`` — the capped
  merge is hash-identical to ``build_edit_index`` over the kept corpus
  (`edit_index_append` driver oracle), so the per-batch guarantee is
  inductive: batch i is checked against every kept doc from batches
  0..i−1;
* durability: corpus append + index rewrite + lineage row in ONE atomic
  catalog commit, idempotent on (stream_id, batch_id) with the UUID
  checkpoint-lifecycle marker (`streaming.identity`) — at-least-once
  ``foreachBatch`` replays become observable-exactly-once, and a wiped
  checkpoint gets a fresh idempotence namespace.

Drop rule matches `streaming.neardup`: within a batch the larger id of
every pair drops (min-canonical, conservative under chains); a doc
pairing with any historical doc drops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mistral_ocr_pipeline_spark.operators.dedup import (
    build_edit_index,
    edit_distance_incremental,
    edit_distance_pairs,
    edit_index_append,
)
from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog
from mistral_ocr_pipeline_spark.streaming.identity import stream_identity

DOCS_DDL = "doc_id long, text string"


def commit_editdist_batch(
    catalog: TableCatalog,
    batch_df: DataFrame,
    batch_id: int,
    corpus_table: str = "corpus",
    index_table: str = "edit_index",
    lineage_table: str = "editdist_batches",
    stream_id: str = "",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_edits: int = 2,
    max_bucket: int = 64,
) -> bool:
    """Edit-distance-dedup one micro-batch within itself and against
    history, then atomically publish (corpus append, index merge,
    lineage row).  Returns False on a replayed (stream_id, batch_id) —
    a no-op."""
    if catalog.exists(lineage_table):
        seen = catalog.read(lineage_table).filter(
            (F.col("batch_id") == batch_id) & (F.col("stream_id") == stream_id)
        )
        if seen.limit(1).count():
            return False

    batch_df = batch_df.select(id_col, text_col).persist()
    try:
        n_in = batch_df.count()
        within = edit_distance_pairs(
            batch_df, id_col, text_col, max_edits=max_edits,
            max_bucket=max_bucket,
        )
        drop_within = within.select(F.col("id_b").alias(id_col)).distinct()
        survivors = batch_df.join(drop_within, id_col, "left_anti")

        have_history = (
            catalog.exists(corpus_table) and catalog.exists(index_table)
        )
        if have_history:
            corpus = catalog.read(corpus_table)
            index = catalog.read(index_table)
            vs_hist = edit_distance_incremental(
                survivors, corpus, index, id_col, text_col,
                max_edits=max_edits,
            )
            survivors = survivors.join(
                vs_hist.select(F.col("id_new").alias(id_col)).distinct(),
                id_col,
                "left_anti",
            )
        survivors = survivors.persist()
        try:
            n_kept = survivors.count()
            if have_history:
                new_index = edit_index_append(
                    index, survivors, id_col, text_col,
                    max_edits=max_edits, max_bucket=max_bucket,
                )
            else:
                new_index = build_edit_index(
                    survivors, id_col, text_col,
                    max_edits=max_edits, max_bucket=max_bucket,
                )
            corpus_snap = catalog.stage_append(survivors, corpus_table)
            index_snap = catalog.stage_overwrite(new_index, index_table)
            lineage = batch_df.sparkSession.createDataFrame(
                [(stream_id, int(batch_id), int(n_in), int(n_kept))],
                "stream_id string, batch_id long, rows_in long, "
                "rows_kept long",
            )
            lineage_snap = catalog.stage_append(lineage, lineage_table)
            catalog.commit(
                {
                    corpus_table: corpus_snap,
                    index_table: index_snap,
                    lineage_table: lineage_snap,
                }
            )
        finally:
            survivors.unpersist()
    finally:
        batch_df.unpersist()
    return True


def run_editdist_ingest(
    spark: SparkSession,
    input_dir: str,
    catalog: TableCatalog,
    checkpoint_dir: str,
    corpus_table: str = "corpus",
    index_table: str = "edit_index",
    lineage_table: str = "editdist_batches",
    max_files_per_trigger: int | None = None,
    **dedup_params,
) -> None:
    """AvailableNow drain of a document directory through the
    edit-distance gate — same lifecycle conventions as
    `streaming.neardup.run_neardup_ingest` (checkpoint offsets for
    resume, UUID-marker stream identity so a wiped-and-recreated
    checkpoint is a fresh idempotence namespace)."""
    reader = (
        spark.readStream.schema(DOCS_DDL)
        .format("parquet")
        .option("path", input_dir)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.load()
    stream_id = stream_identity(checkpoint_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        commit_editdist_batch(
            catalog,
            batch_df,
            int(batch_id),
            corpus_table,
            index_table,
            lineage_table,
            stream_id=stream_id,
            **dedup_params,
        )

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
