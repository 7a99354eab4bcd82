"""Cluster entry point for the training-data curation pipeline —
``spark-submit --py-files mistral_ocr_pipeline_spark.zip spark_jobs/curation_job.py``.

Reads a documents table (id + text), runs the curation DAG the engine
exposes as the ``curation_pipeline`` driver query — quality gate →
exact-dedup keep-canonical → deterministic train/valid/test split — and
writes the kept corpus partitioned by split, plus a one-row-per-split
rollup.  Everything up to the writes is one Catalyst plan: the gate is a
scan-level filter, dedup is one shuffle with map-side partial
aggregation, the split is a projection (content-hash fate, so reruns and
repartitions reproduce identical splits).

Example (multi-executor cluster):
  spark-submit \\
    --master yarn --deploy-mode cluster \\
    --num-executors 256 --executor-cores 4 \\
    --conf spark.sql.adaptive.enabled=true \\
    --py-files mistral_ocr_pipeline_spark.zip \\
    spark_jobs/curation_job.py \\
    --input /warehouse/documents --warehouse /warehouse/curated \\
    --min-quality 0.05
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--warehouse", required=True, help="output warehouse dir")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--min-quality", type=float, default=0.05)
    p.add_argument("--weights", default="0.8,0.1,0.1",
                   help="train,valid,test split weights")
    args = p.parse_args()

    spark = SparkSession.builder.appName("corpus_curation").getOrCreate()

    from mistral_ocr_pipeline_spark.operators.dedup import exact_dedup
    from mistral_ocr_pipeline_spark.operators.sampling import train_valid_test_split
    from mistral_ocr_pipeline_spark.operators.text_analysis import quality_features
    from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog

    catalog = TableCatalog(spark, args.warehouse)
    docs = spark.read.parquet(args.input).select(
        F.col(args.id_col).alias("doc_id"), F.col(args.text_col).alias("text")
    )
    gated = quality_features(docs).filter(F.col("q_score") >= args.min_quality)
    canon = gated.join(
        exact_dedup(gated, "doc_id", "text").filter("is_canonical"),
        gated["doc_id"] == F.col("id"),
        "left_semi",
    )
    w = tuple(float(x) for x in args.weights.split(","))
    split = train_valid_test_split(canon, key_col="doc_id", weights=w)

    catalog.overwrite(split, "curated", partition_by=["split"])
    rollup = split.groupBy("split").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.avg("q_score"), 6).alias("mean_q")
    )
    catalog.overwrite(rollup.coalesce(1), "curation_rollup")
    summary = {r.split: (r.n, r.mean_q) for r in rollup.collect()}
    print({"input": args.input, "kept_by_split": summary})
    spark.stop()


if __name__ == "__main__":
    main()
