"""Cluster entry point for incremental ingest PROFILING —
``spark-submit --py-files mistral_ocr_pipeline_spark.zip spark_jobs/profile_job.py``.

Every ingest batch appends its MERGEABLE profile facts (one lattice row
per column: sums, metric extrema, bottom-k KMV distinct sketch —
`operators/profiling.profile_shards` keyed by batch id) to an
append-only ``profile_stats`` table, then folds ALL recorded batches
into the table-level ``profile_merged`` view (`merge_profiles`) — both
published in ONE atomic catalog commit.  The batch's raw data is read
exactly once, ever: table-level questions ("null spike this week?",
"distinct-id drift?") are answered from the stats rows, never by
rescanning history — the same never-recompute-history contract the
MinHash/substring/BM25/echo indexes keep.

Idempotent per ``--batch-id``: a rerun of an already-recorded batch is a
no-op (the stats table is the ledger), so the job is safe under
scheduler retries.

Example (multi-executor cluster):
  spark-submit \\
    --master yarn --deploy-mode cluster \\
    --num-executors 64 --executor-cores 4 \\
    --py-files mistral_ocr_pipeline_spark.zip \\
    spark_jobs/profile_job.py \\
    --input /landing/2026-08-19 --warehouse /warehouse/profiles \\
    --batch-id 2026-08-19 --columns doc_id,text,lang
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="batch parquet path")
    p.add_argument("--warehouse", required=True, help="stats warehouse dir")
    p.add_argument("--batch-id", required=True,
                   help="idempotency key; one stats row set per batch")
    p.add_argument("--columns", default=None,
                   help="comma-separated columns (default: all "
                        "string/numeric)")
    p.add_argument("--k", type=int, default=256,
                   help="KMV sketch size (distinct-estimate error "
                        "~1/sqrt(k-2))")
    args = p.parse_args()

    spark = SparkSession.builder.appName("ingest_profile").getOrCreate()

    from mistral_ocr_pipeline_spark.operators.profiling import (
        merge_profiles,
        profile_shards,
    )
    from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog

    catalog = TableCatalog(spark, args.warehouse)
    have_stats = "profile_stats" in catalog.current_tables()
    if have_stats:
        seen = (
            catalog.read("profile_stats")
            .filter(F.col("shard") == args.batch_id)
            .limit(1)
            .count()
        )
        if seen:
            print({"batch": args.batch_id, "status": "already-recorded",
                   "action": "no-op"})
            return

    cols = (
        [c.strip() for c in args.columns.split(",") if c.strip()]
        if args.columns else None
    )
    batch = spark.read.parquet(args.input).withColumn(
        "_batch", F.lit(args.batch_id)
    )
    stats = profile_shards(batch, columns=cols, shard_col="_batch", k=args.k)

    stage = catalog.stage_append if have_stats else catalog.stage_overwrite
    staged_stats = stage(stats, "profile_stats")
    # fold EVERY recorded batch (history rows + this batch's new rows) —
    # reading the staged snapshot directly keeps this a single commit
    all_stats = spark.read.parquet(
        f"{args.warehouse}/{staged_stats}"
    )
    merged = merge_profiles(all_stats, k=args.k)
    catalog.commit(
        {
            "profile_stats": staged_stats,
            "profile_merged": catalog.stage_overwrite(
                merged.coalesce(1), "profile_merged"
            ),
        }
    )
    out = {
        r.column: (r.n_rows, r.n_null, round(r.est_distinct, 1))
        for r in catalog.read("profile_merged").collect()
    }
    print({"batch": args.batch_id, "status": "recorded",
           "merged_profile": out})


if __name__ == "__main__":
    main()
