"""Streaming assistant-echo gating against a persisted per-conversation
gram index — the live-firehose form of `transcript_qc.transcript_echo`:
every micro-batch of transcript turns has its assistant turns scored
for prompt/tool-result regurgitation (against the batch itself AND
against all earlier turns of the same conversations), echo-flagged
turns are gated out of the kept corpus, and the batch's source grams
merge into the index — history text is never re-tokenized.

Composition of verified pieces (nothing re-derived):

* scoring: ``transcript_qc.transcript_echo_incremental`` — for the
  batch's assistant turns, exactly what a one-shot ``transcript_echo``
  over (raw history ∪ raw batch) would emit (its oracle-proven
  guarantee: echoed iff the GLOBAL earliest source occurrence precedes
  the turn);
* index maintenance: ``transcript_qc.echo_index_append`` — the one
  stored fact (first_turn) is a min-lattice, hash-identical to
  rebuilding over the raw union, so after N batches the index IS
  ``build_echo_index`` of every raw batch seen — which makes the
  per-batch guarantee inductive: batch i scores against raw batches
  0..i.  Unlike the SFT gate this module does NOT need whole
  conversations per batch: a session that keeps streaming scores each
  new assistant turn against everything the conversation said before,
  whichever batch carried it.  The only caveat is the streaming norm:
  with turn_idx monotone in arrival order (turns publish as they
  happen), per-batch scores equal the one-shot over the FULL corpus;
  an out-of-order source turn arriving AFTER an assistant turn was
  scored cannot retroactively re-flag the already-published score —
  the same already-published caveat every streaming dedup carries;
* durability: kept-turns append, score-audit append, index rewrite,
  and lineage row publish in ONE atomic catalog commit, idempotent on
  (stream_id, batch_id); ``stream_id`` is the checkpoint LIFECYCLE's
  UUID marker (`streaming.identity`), so a wiped-and-recreated
  checkpoint gets a fresh idempotence namespace.

The index stores one row per distinct (conv_id, source gram digest) —
a 32-char md5 and one integer, no text; per-batch cost is O(batch
grams) compute plus one O(index) merge shuffle, never O(history text).
Gram digests are computed map-side over normalized token arrays, so
every shuffle in the hot path moves digests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mistral_ocr_pipeline_spark.operators.transcript_qc import (
    build_echo_index,
    echo_index_append,
    transcript_echo,
    transcript_echo_incremental,
)
from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog
from mistral_ocr_pipeline_spark.streaming.identity import stream_identity

TURNS_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def commit_echo_batch(
    catalog: TableCatalog,
    batch_df: DataFrame,
    batch_id: int,
    kept_table: str = "echo_kept_turns",
    scores_table: str = "echo_scores",
    index_table: str = "echo_index",
    lineage_table: str = "echo_batches",
    stream_id: str = "",
    text_col: str = "text",
    k: int = 5,
    source_roles: tuple[str, ...] = ("user", "tool"),
    flag_threshold: float = 0.5,
) -> bool:
    """Echo-score one micro-batch against itself + history, gate flagged
    assistant turns, then atomically publish (kept turns, score audit,
    index merge, lineage).  Returns False on a replayed
    (stream_id, batch_id) — a no-op.  ALL assistant scores land in the
    audit table (flagged or not); the kept corpus is the batch minus
    its is_echo turns — non-assistant turns always survive (they are
    the context the trainable turns condition on)."""
    if catalog.exists(lineage_table):
        seen = catalog.read(lineage_table).filter(
            (F.col("batch_id") == batch_id) & (F.col("stream_id") == stream_id)
        )
        if seen.limit(1).count():
            return False

    batch_df = batch_df.persist()
    try:
        n_in = batch_df.count()
        if catalog.exists(index_table):
            index = catalog.read(index_table)
            scores = transcript_echo_incremental(
                batch_df, index, text_col, k, source_roles, flag_threshold
            )
            new_index = echo_index_append(
                index, batch_df, text_col, k, source_roles
            )
        else:
            scores = transcript_echo(
                batch_df, text_col, k, source_roles, flag_threshold
            )
            new_index = build_echo_index(batch_df, text_col, k, source_roles)
        scores = scores.withColumn("batch_id", F.lit(int(batch_id))).persist()
        try:
            n_flagged = (
                scores.agg(
                    F.sum(F.col("is_echo").cast("long")).cast("long")
                ).first()[0]
                or 0
            )
            # flagged (conv, turn) keys are assistant-turn-sized, tiny vs
            # the batch — broadcast left_anti, no shuffle of the batch
            flagged = F.broadcast(
                scores.filter("is_echo").select("conv_id", "turn_idx")
            )
            kept = batch_df.join(flagged, ["conv_id", "turn_idx"], "left_anti")
            lineage = batch_df.sparkSession.createDataFrame(
                [(stream_id, int(batch_id), int(n_in), int(n_flagged))],
                "stream_id string, batch_id long, rows_in long, "
                "turns_flagged long",
            )
            catalog.commit(
                {
                    kept_table: catalog.stage_append(kept, kept_table),
                    scores_table: catalog.stage_append(scores, scores_table),
                    index_table: catalog.stage_overwrite(
                        new_index, index_table
                    ),
                    lineage_table: catalog.stage_append(lineage, lineage_table),
                }
            )
        finally:
            scores.unpersist()
    finally:
        batch_df.unpersist()
    return True


def run_echo_gate(
    spark: SparkSession,
    input_dir: str,
    catalog: TableCatalog,
    checkpoint_dir: str,
    kept_table: str = "echo_kept_turns",
    scores_table: str = "echo_scores",
    index_table: str = "echo_index",
    lineage_table: str = "echo_batches",
    max_files_per_trigger: int | None = None,
    **echo_params,
) -> None:
    """AvailableNow drain of a transcript-turn directory through the
    echo gate — same lifecycle conventions as the other streaming
    modules (checkpoint offsets for resume, UUID-marker stream identity
    for replay idempotence)."""
    reader = (
        spark.readStream.schema(TURNS_DDL)
        .format("parquet")
        .option("path", input_dir)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    stream = reader.load()
    stream_id = stream_identity(checkpoint_dir)

    def process_batch(batch_df, batch_id: int) -> None:
        commit_echo_batch(
            catalog,
            batch_df,
            int(batch_id),
            kept_table,
            scores_table,
            index_table,
            lineage_table,
            stream_id=stream_id,
            **echo_params,
        )

    q = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
