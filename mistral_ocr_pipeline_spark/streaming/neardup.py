"""Streaming near-duplicate ingest against a persisted MinHash index —
the daily-crawl / live-firehose shape of corpus curation: every
micro-batch dedups (a) within itself and (b) against ALL history, appends
its survivors to the corpus, and merges their band keys into the
posting-list index — without ever recomputing a historical signature.

Composition of existing verified pieces, nothing re-derived:

* within-batch pairs: ``operators.dedup.minhash_lsh_pairs`` (salted
  bounded bucket collect — a boilerplate-heavy batch can't blow up a
  task);
* vs-history pairs: ``operators.dedup.minhash_incremental_pairs`` (only
  the increment's signatures are computed; history costs one join
  against the pre-capped posting lists);
* index maintenance: ``operators.dedup.minhash_index_append``, whose
  capped merge is proven hash-identical to a one-shot
  ``build_minhash_index`` over the whole kept corpus — so after N
  batches the index is EXACTLY the index a batch rebuild would produce
  (pinned in tests/test_streaming_neardup.py);
* durability: the corpus append, the index rewrite, and the lineage row
  publish in ONE atomic catalog commit, idempotent on
  (stream_id, batch_id) — at-least-once ``foreachBatch`` replays become
  observable-exactly-once (same convention as
  ``streaming.incremental.commit_extracted_batch``).

Drop rule inside a batch: a doc that near-dup-pairs with a SMALLER id in
its own batch drops (min-canonical; conservative under chains — if A~B
and B~C, both B and C drop, matching the keep-one-per-cluster batch
composites).  A doc that pairs with ANY historical doc drops.  Dropped
docs never enter the corpus or the index, so the corpus stays near-dup
free by induction.

Scale note: the index rewrite per batch is O(index), the
MERGE-INTO/compaction shape — at warehouse scale partition the index
table by ``band_idx`` and rewrite only partitions the delta touches
(``TableCatalog`` appends/overwrites per table; the partitioned variant
is a partition_by away)."""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, functions as F

from mistral_ocr_pipeline_spark.operators.dedup import (
    build_minhash_index,
    minhash_incremental_pairs,
    minhash_index_append,
    minhash_lsh_pairs,
)
from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog
from mistral_ocr_pipeline_spark.streaming.identity import stream_identity

DOCS_DDL = "doc_id long, text string"


def commit_neardup_batch(
    catalog: TableCatalog,
    batch_df: DataFrame,
    batch_id: int,
    corpus_table: str = "corpus",
    index_table: str = "minhash_index",
    lineage_table: str = "neardup_batches",
    stream_id: str = "",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.7,
    n: int = 3,
    num_perm: int = 64,
    bands: int = 16,
    seed: int = 42,
    max_bucket: int = 64,
) -> bool:
    """Dedup one micro-batch within itself and against history, then
    atomically publish (corpus append, index merge, lineage row).
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
        within = minhash_lsh_pairs(
            batch_df, id_col, text_col, n=n, num_perm=num_perm, bands=bands,
            threshold=threshold, seed=seed, max_bucket=max_bucket,
        )
        # pairs arrive (id_a < id_b): the larger side of every pair drops
        drop_within = within.select(F.col("id_b").alias(id_col)).distinct()
        survivors = batch_df.join(drop_within, id_col, "left_anti")

        have_history = catalog.exists(corpus_table) and catalog.exists(index_table)
        if have_history:
            corpus = catalog.read(corpus_table)
            index = catalog.read(index_table)
            vs_hist = minhash_incremental_pairs(
                survivors, corpus, index, id_col, text_col,
                n=n, num_perm=num_perm, bands=bands, threshold=threshold,
                seed=seed,
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
                new_index = minhash_index_append(
                    index, survivors, id_col, text_col,
                    n=n, num_perm=num_perm, bands=bands, seed=seed,
                    max_bucket=max_bucket,
                )
            else:
                new_index = build_minhash_index(
                    survivors, id_col, text_col,
                    n=n, num_perm=num_perm, bands=bands, seed=seed,
                    max_bucket=max_bucket,
                )
            corpus_snap = catalog.stage_append(survivors, corpus_table)
            index_snap = catalog.stage_overwrite(new_index, index_table)
            lineage = batch_df.sparkSession.createDataFrame(
                [(stream_id, int(batch_id), int(n_in), int(n_kept))],
                "stream_id string, batch_id long, rows_in long, rows_kept long",
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


def run_neardup_ingest(
    spark: SparkSession,
    input_dir: str,
    catalog: TableCatalog,
    checkpoint_dir: str,
    corpus_table: str = "corpus",
    index_table: str = "minhash_index",
    lineage_table: str = "neardup_batches",
    max_files_per_trigger: int | None = None,
    **dedup_params,
) -> None:
    """AvailableNow drain of a document directory through the near-dup
    gate.  ``maxFilesPerTrigger`` bounds micro-batch size; the streaming
    checkpoint replaces any resume index, and the (stream_id, batch_id)
    lineage key makes replays no-ops.  ``stream_id`` carries the
    checkpoint LIFECYCLE's UUID marker: batch ids are unique only per
    checkpoint LIFECYCLE, and a checkpoint wiped and recreated at the
    same path restarts them at 0 — keyed on path alone, the new run's
    first batches would be silently skipped as replays of the old run's
    (data loss); a recreated checkpoint mints a fresh marker, so it gets a
    fresh idempotence namespace (same one-filesystem assumption the
    catalog's hardlink appends already make)."""
    reader = (
        spark.readStream.schema(DOCS_DDL).format("parquet").option("path", input_dir)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.load()
    stream_id = stream_identity(checkpoint_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        commit_neardup_batch(
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
