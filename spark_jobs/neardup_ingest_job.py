"""Cluster entry point for streaming near-dup corpus ingest —
``spark-submit --py-files mistral_ocr_pipeline_spark.zip
spark_jobs/neardup_ingest_job.py``.

Drains a documents directory as micro-batches (AvailableNow): each batch
dedups within itself and against ALL history via the persisted MinHash
posting-list index (no historical signature is ever recomputed), appends
its survivors to the corpus table, merges their band keys into the index,
and records lineage — all in ONE atomic catalog commit per batch,
idempotent on (stream_id, batch_id) so kills and foreachBatch replays
never double-ingest (streaming/neardup.py).  Run it on a schedule and the
corpus stays near-dup free by induction.

Example (multi-executor cluster):
  spark-submit \\
    --master yarn --deploy-mode cluster \\
    --num-executors 256 --executor-cores 4 \\
    --conf spark.sql.adaptive.enabled=true \\
    --py-files mistral_ocr_pipeline_spark.zip \\
    spark_jobs/neardup_ingest_job.py \\
    --input /drops/documents --warehouse /warehouse/corpus \\
    --checkpoint /warehouse/corpus/_ckpt --max-files-per-trigger 64
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="documents parquet dir")
    p.add_argument("--warehouse", required=True, help="catalog warehouse dir")
    p.add_argument("--checkpoint", required=True, help="streaming checkpoint dir")
    p.add_argument("--corpus-table", default="corpus")
    p.add_argument("--index-table", default="minhash_index")
    p.add_argument("--lineage-table", default="neardup_batches")
    p.add_argument("--threshold", type=float, default=0.7)
    p.add_argument("--max-files-per-trigger", type=int, default=None)
    args = p.parse_args()

    spark = SparkSession.builder.appName("neardup_ingest").getOrCreate()

    from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog
    from mistral_ocr_pipeline_spark.streaming.neardup import run_neardup_ingest

    catalog = TableCatalog(spark, args.warehouse)
    run_neardup_ingest(
        spark,
        args.input,
        catalog,
        args.checkpoint,
        corpus_table=args.corpus_table,
        index_table=args.index_table,
        lineage_table=args.lineage_table,
        max_files_per_trigger=args.max_files_per_trigger,
        threshold=args.threshold,
    )
    if catalog.exists(args.lineage_table):
        for row in catalog.read(args.lineage_table).orderBy("batch_id").collect():
            print(
                f"batch {row.batch_id}: {row.rows_in} in, {row.rows_kept} kept"
            )
    spark.stop()


if __name__ == "__main__":
    main()
