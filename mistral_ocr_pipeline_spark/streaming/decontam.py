"""Streaming benchmark decontamination: audit arriving documents against
a FROZEN eval-set gram index and route them — clean rows to the training
table, flagged rows to a quarantine table with their overlap counts.

This is the ingest-time form of the batch `dedup.contamination_flags`
pass (the audit→drop leg of `decontam_pipeline`): a pipeline that only
decontaminates at corpus-release time re-pays a full-corpus gram scan
per eval refresh, while the gate keeps the training table clean
CONTINUOUSLY for the cost of one broadcast join per micro-batch.

Why a frozen gram set and not the eval DataFrame per batch: benchmark
membership must be a pure function of the document and the eval RELEASE
— re-deriving grams from a live eval table mid-stream would let a
benchmark edit silently re-define past routing decisions (same
reproducibility argument as `quality_route`'s frozen thresholds).  The
gram set is pinned once per run with ``localCheckpoint``; a new eval
release is a new run.

Quarantine, not drop: flagged rows land in ``quarantine_table`` with
``n_contaminated_grams`` so a later eval-set correction can re-admit
them — deletion would make decontamination irreversible on exactly the
rows most likely to be re-litigated.  Both routes plus per-batch lineage
publish in ONE atomic catalog commit; the stream identity carries the
checkpoint lifecycle's UUID marker so a wiped-and-recreated checkpoint
(batch ids restart at 0) is not misread as a replay.

Scale shape per batch: eval grams broadcast (a benchmark is KBs–MBs of
grams); the batch streams map-side through shingle → explode →
broadcast-join → partial count, one exchange on doc id — the batch
never shuffles its text.  Reference dataflow twin: the resume/failure
routing of main.py:160-235 (clean vs failed sinks), applied to the
decontamination audit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mistral_ocr_pipeline_spark.operators.dedup import (
    contamination_flags,
    eval_gram_set,
)
from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog
from mistral_ocr_pipeline_spark.streaming.identity import stream_identity


def run_decontam_gate(
    spark: SparkSession,
    input_dir: str,
    schema,
    eval_set: DataFrame,
    catalog: TableCatalog,
    checkpoint_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 13,
    min_overlap: int = 1,
    clean_table: str = "clean_docs",
    quarantine_table: str = "contaminated_docs",
    lineage_table: str = "decontam_lineage",
) -> None:
    """Drain available files, audit each row for ``n``-gram overlap with
    ``eval_set`` ((id, text) shape on the same column names), and append
    clean rows to ``clean_table`` / flagged rows + overlap counts to
    ``quarantine_table`` — one atomic commit per batch, replays no-op."""
    stream_id = stream_identity(checkpoint_dir)
    frozen_grams = eval_gram_set(eval_set, id_col, text_col, n).localCheckpoint(
        eager=True
    )

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if catalog.exists(lineage_table):
            seen = catalog.read(lineage_table).filter(
                (F.col("batch_id") == batch_id)
                & (F.col("stream_id") == stream_id)
            )
            if seen.limit(1).count():
                return
        keep = [c for c in batch_df.columns if c != id_col]
        audit = (
            contamination_flags(
                batch_df,
                eval_set,
                id_col,
                text_col,
                n=n,
                min_overlap=min_overlap,
                keep_cols=keep,
                eval_grams=frozen_grams,
            )
            .withColumnRenamed("id", id_col)
            .persist()
        )
        try:
            clean = audit.filter(~F.col("contaminated")).drop(
                "n_contaminated_grams", "contaminated"
            )
            quarantine = audit.filter(F.col("contaminated")).drop(
                "contaminated"
            )
            lineage = spark.createDataFrame(
                [
                    (
                        stream_id,
                        int(batch_id),
                        clean.count(),
                        quarantine.count(),
                    )
                ],
                "stream_id string, batch_id long,"
                " n_clean long, n_quarantined long",
            )
            catalog.commit(
                {
                    clean_table: catalog.stage_append(clean, clean_table),
                    quarantine_table: catalog.stage_append(
                        quarantine, quarantine_table
                    ),
                    lineage_table: catalog.stage_append(lineage, lineage_table),
                }
            )
        finally:
            audit.unpersist()

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
