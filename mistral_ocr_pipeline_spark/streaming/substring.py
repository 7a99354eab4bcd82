"""Streaming exact-substring span removal against a persisted digest
index — the live-firehose form of Lee-et-al dedup: every micro-batch
has its duplicated k-word spans CUT (against itself AND against all
history) before its cleaned documents enter the corpus, and its RAW
gram digests merge into the index — history text is never re-tokenized.

Composition of verified pieces (nothing re-derived):

* span removal: ``operators.dedup.substring_dedup_incremental`` — for
  the batch's rows, exactly what a one-shot ``substring_dedup`` over
  (raw history ∪ raw batch) would emit (its oracle-proven guarantee);
* index maintenance: ``operators.dedup.substring_index_append`` — both
  stored facts are lattice merges (canonical = min of minima, count =
  sum), hash-identical to rebuilding over the raw union, so after N
  batches the index IS ``build_substring_index`` of every raw batch
  seen — which is what makes the per-batch guarantee inductive: batch i
  is deduped against raw batches 0..i.  Canonicality is the GLOBAL min
  (id, pos) — identical to keep-first-in-arrival-order when doc ids are
  monotone with arrival (the ingest norm); a later batch carrying a
  SMALLER id than a historical occurrence keeps its span (it is the
  one-shot canonical) while the already-published historical doc is
  immutable, so per-batch outputs stay exactly one-shot-equivalent but
  corpus-level span uniqueness then needs a compaction pass — the same
  already-published caveat every streaming dedup carries;
* durability: cleaned-corpus append, index rewrite, and lineage row
  publish in ONE atomic catalog commit, idempotent on
  (stream_id, batch_id) — at-least-once ``foreachBatch`` replays become
  observable-exactly-once; ``stream_id`` is the checkpoint LIFECYCLE's
  UUID marker (`streaming.identity`), so a wiped-and-recreated
  checkpoint gets a fresh idempotence namespace instead of silently
  skipping its first batches.

The index stores one row per distinct k-gram digest (32-char md5 + two
integers) — at warehouse scale partition it by a digest prefix and
rewrite only touched partitions; the per-batch cost is O(batch grams)
compute plus one O(index) merge shuffle, never O(history text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mistral_ocr_pipeline_spark.operators.dedup import (
    build_substring_index,
    substring_dedup,
    substring_dedup_incremental,
    substring_index_append,
)
from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog
from mistral_ocr_pipeline_spark.streaming.identity import stream_identity

DOCS_DDL = "doc_id long, text string"


def commit_substring_batch(
    catalog: TableCatalog,
    batch_df: DataFrame,
    batch_id: int,
    corpus_table: str = "corpus_clean",
    index_table: str = "substring_index",
    lineage_table: str = "substring_batches",
    stream_id: str = "",
    id_col: str = "doc_id",
    text_col: str = "text",
    span_words: int = 50,
) -> bool:
    """Span-dedup one micro-batch against itself + history, then
    atomically publish (cleaned corpus append, index merge, lineage).
    Returns False on a replayed (stream_id, batch_id) — a no-op."""
    if catalog.exists(lineage_table):
        seen = catalog.read(lineage_table).filter(
            (F.col("batch_id") == batch_id) & (F.col("stream_id") == stream_id)
        )
        if seen.limit(1).count():
            return False

    batch_df = batch_df.select(id_col, text_col).persist()
    try:
        n_in = batch_df.count()
        have_history = catalog.exists(index_table)
        if have_history:
            index = catalog.read(index_table)
            cleaned = substring_dedup_incremental(
                batch_df, index, id_col, text_col, span_words
            )
            new_index = substring_index_append(
                index, batch_df, id_col, text_col, span_words
            )
        else:
            cleaned = substring_dedup(batch_df, id_col, text_col, span_words)
            new_index = build_substring_index(
                batch_df, id_col, text_col, span_words
            )
        cleaned = cleaned.persist()
        try:
            removed = (
                cleaned.agg(F.sum("n_removed").cast("long")).first()[0] or 0
            )
            corpus_snap = catalog.stage_append(cleaned, corpus_table)
            index_snap = catalog.stage_overwrite(new_index, index_table)
            lineage = batch_df.sparkSession.createDataFrame(
                [(stream_id, int(batch_id), int(n_in), int(removed))],
                "stream_id string, batch_id long, rows_in long, "
                "words_removed long",
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
            cleaned.unpersist()
    finally:
        batch_df.unpersist()
    return True


def run_substring_ingest(
    spark: SparkSession,
    input_dir: str,
    catalog: TableCatalog,
    checkpoint_dir: str,
    corpus_table: str = "corpus_clean",
    index_table: str = "substring_index",
    lineage_table: str = "substring_batches",
    max_files_per_trigger: int | None = None,
    **dedup_params,
) -> None:
    """AvailableNow drain of a document directory through the
    exact-substring gate — same lifecycle conventions as
    `streaming.neardup.run_neardup_ingest` (checkpoint offsets for
    resume, UUID-marker stream identity for replay idempotence)."""
    reader = (
        spark.readStream.schema(DOCS_DDL).format("parquet").option("path", input_dir)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.load()
    stream_id = stream_identity(checkpoint_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        commit_substring_batch(
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
