"""Cluster entry point for streaming assistant-echo gating —
``spark-submit --py-files mistral_ocr_pipeline_spark.zip
spark_jobs/echo_gate_job.py``.

Drains a transcript-turn directory as micro-batches (AvailableNow):
each batch's assistant turns are scored for prompt/tool-result
regurgitation against the batch AND all earlier turns of the same
conversations via the persisted (conv_id, gram, first_turn) index —
history text is never re-tokenized — flagged turns are gated out of
the kept corpus, the batch's source grams merge into the index, and
lineage records the batch, all in ONE atomic catalog commit per batch,
idempotent on (stream_id, batch_id) (streaming/echo_gate.py).  Run it
on a schedule and every published assistant turn carries an echo score
computed against the conversation's full history by induction.

Example (multi-executor cluster):
  spark-submit \\
    --master yarn --deploy-mode cluster \\
    --num-executors 256 --executor-cores 4 \\
    --conf spark.sql.adaptive.enabled=true \\
    --py-files mistral_ocr_pipeline_spark.zip \\
    spark_jobs/echo_gate_job.py \\
    --input /drops/transcripts --warehouse /warehouse/sft \\
    --checkpoint /warehouse/sft/_echo_ckpt --flag-threshold 0.5
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="transcript turns parquet dir")
    p.add_argument("--warehouse", required=True, help="catalog warehouse dir")
    p.add_argument("--checkpoint", required=True, help="streaming checkpoint dir")
    p.add_argument("--kept-table", default="echo_kept_turns")
    p.add_argument("--scores-table", default="echo_scores")
    p.add_argument("--index-table", default="echo_index")
    p.add_argument("--lineage-table", default="echo_batches")
    p.add_argument("--gram-words", type=int, default=5,
                   help="word k-gram size for the echo overlap")
    p.add_argument("--source-roles", default="user,tool",
                   help="comma-separated roles assistant text is checked against")
    p.add_argument("--flag-threshold", type=float, default=0.5,
                   help="echo fraction at or above which a turn is gated out")
    p.add_argument("--max-files-per-trigger", type=int, default=None)
    args = p.parse_args()
    roles = tuple(r.strip() for r in args.source_roles.split(",") if r.strip())

    spark = SparkSession.builder.appName("echo_gate").getOrCreate()

    from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog
    from mistral_ocr_pipeline_spark.streaming.echo_gate import run_echo_gate

    catalog = TableCatalog(spark, args.warehouse)
    run_echo_gate(
        spark,
        args.input,
        catalog,
        args.checkpoint,
        kept_table=args.kept_table,
        scores_table=args.scores_table,
        index_table=args.index_table,
        lineage_table=args.lineage_table,
        max_files_per_trigger=args.max_files_per_trigger,
        k=args.gram_words,
        source_roles=roles,
        flag_threshold=args.flag_threshold,
    )
    if catalog.exists(args.lineage_table):
        for row in catalog.read(args.lineage_table).orderBy("batch_id").collect():
            print(
                f"batch {row.batch_id}: {row.rows_in} in, "
                f"{row.turns_flagged} flagged"
            )
    spark.stop()


if __name__ == "__main__":
    main()
