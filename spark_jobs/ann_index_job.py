"""Cluster entry point for the IVFPQ vector index —
``spark-submit --py-files mistral_ocr_pipeline_spark.zip
spark_jobs/ann_index_job.py``.

Two subcommands covering the production retrieval flow
(operators/similarity_df.py):

* ``build`` — train the IVF centroids + PQ codebooks on the
  deterministic hash-ordered sample, encode the whole corpus in ONE
  Arrow pass, and publish the (vec_id, cell, codes) table partitioned
  BY CELL through the snapshot catalog (atomic, time-travelable) along
  with a one-row model table carrying the trained parameters — encode
  once, query forever.
* ``search`` — load the stored index + model, run probed-cells-only ADC
  top-k for a query parquet (optional exact-cosine refine), write
  results.  The query relation stays a DataFrame end to end.

Example:
  spark-submit --master yarn --num-executors 256 \\
    --py-files mistral_ocr_pipeline_spark.zip \\
    spark_jobs/ann_index_job.py build \\
      --corpus /warehouse/embeddings --warehouse /warehouse/ann \\
      --n-centroids 1024 --m 16 --ksub 256 --by-residual
  spark-submit ... spark_jobs/ann_index_job.py search \\
      --queries /drops/queries.parquet --warehouse /warehouse/ann \\
      --k 10 --n-probe 64 --refine 200 --output /results/topk
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def _build(spark: SparkSession, args: argparse.Namespace) -> None:
    from mistral_ocr_pipeline_spark.operators.similarity import (
        _kmeans_centroids,
        pq_codebooks_kmeans,
    )
    from mistral_ocr_pipeline_spark.operators.similarity_df import ivfpq_encode
    from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog

    catalog = TableCatalog(spark, args.warehouse)
    corpus = spark.read.parquet(args.corpus)
    cent = _kmeans_centroids(
        corpus, args.id_col, args.vec_col, args.n_centroids,
        args.ivf_iters, args.sample_size, seed=11,
    )
    books = pq_codebooks_kmeans(
        corpus, args.id_col, args.vec_col, m=args.m, ksub=args.ksub,
        iters=args.pq_iters, sample_size=args.sample_size,
        residual_centroids=cent if args.by_residual else None,
    )
    enc = ivfpq_encode(
        corpus, cent, books, args.id_col, args.vec_col,
        keep_vec=args.keep_vec, by_residual=args.by_residual,
    )
    model = spark.createDataFrame(
        [(
            json.dumps([[float(x) for x in c] for c in cent]),
            json.dumps([[[float(x) for x in kk] for kk in j] for j in books]),
            bool(args.by_residual),
            bool(args.keep_vec),
        )],
        "centroids string, codebooks string, by_residual boolean, "
        "keep_vec boolean",
    )
    # index + model publish in ONE atomic commit — a reader never sees a
    # codes table without the model that decodes it
    enc_snap = catalog.stage_overwrite(
        enc, args.index_table, partition_by=["cell"]
    )
    model_snap = catalog.stage_overwrite(model, args.model_table)
    catalog.commit({args.index_table: enc_snap, args.model_table: model_snap})
    print(
        json.dumps(
            {
                "indexed": catalog.read(args.index_table).count(),
                "cells": args.n_centroids,
                "m": args.m,
                "ksub": args.ksub,
                "by_residual": bool(args.by_residual),
            }
        )
    )


def _add(spark: SparkSession, args: argparse.Namespace) -> None:
    """Incremental index maintenance — FAISS ``IndexIVFPQ.add`` in Spark
    clothes: encode a NEW embedding batch with the PERSISTED model
    (frozen centroids + codebooks read back from the model table — no
    retraining, no rescan of indexed history) and append the codes in
    one atomic commit.  Because `ivfpq_encode` is a pure per-row
    function of the frozen model, the maintained index is trivially
    hash-identical to a one-shot encode over history ∪ batch with the
    same model — the daily-embedding-drop shape.  Caller owns vec_id
    uniqueness across batches (the ingest norm), exactly as FAISS does;
    re-quantization drift only enters if/when a `build` retrains."""
    import numpy as np

    from mistral_ocr_pipeline_spark.operators.similarity_df import ivfpq_encode
    from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog

    catalog = TableCatalog(spark, args.warehouse)
    model = catalog.read(args.model_table).first()
    cent = np.asarray(json.loads(model.centroids), dtype=np.float64)
    books = np.asarray(json.loads(model.codebooks), dtype=np.float64)
    batch = spark.read.parquet(args.corpus)
    enc = ivfpq_encode(
        batch, cent, books, args.id_col, args.vec_col,
        keep_vec=model.keep_vec, by_residual=model.by_residual,
    )
    snap = catalog.stage_append(enc, args.index_table, partition_by=["cell"])
    catalog.commit({args.index_table: snap})
    print(
        json.dumps(
            {
                "added": batch.count(),
                "indexed": catalog.read(args.index_table).count(),
            }
        )
    )


def _search(spark: SparkSession, args: argparse.Namespace) -> None:
    import numpy as np

    from mistral_ocr_pipeline_spark.operators.similarity_df import ivfpq_search
    from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog

    catalog = TableCatalog(spark, args.warehouse)
    model = catalog.read(args.model_table).first()
    cent = np.asarray(json.loads(model.centroids), dtype=np.float64)
    books = np.asarray(json.loads(model.codebooks), dtype=np.float64)
    if args.refine and not model.keep_vec:
        raise SystemExit(
            "--refine needs an index built with --keep-vec (float vectors "
            "must ride the index for the exact re-rank)"
        )
    enc = catalog.read(args.index_table)
    queries = spark.read.parquet(args.queries)
    out = ivfpq_search(
        enc, queries, cent, books, k=args.k, vec_col=args.vec_col,
        query_id_col=args.id_col, n_probe=args.n_probe,
        refine=args.refine, by_residual=model.by_residual,
    )
    out.write.mode("overwrite").parquet(args.output)
    print(json.dumps({"results": spark.read.parquet(args.output).count()}))


def main() -> None:
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--corpus", required=True, help="embeddings parquet dir")
    b.add_argument("--warehouse", required=True)
    b.add_argument("--index-table", default="ivfpq_index")
    b.add_argument("--model-table", default="ivfpq_model")
    b.add_argument("--id-col", default="vec_id")
    b.add_argument("--vec-col", default="embedding")
    b.add_argument("--n-centroids", type=int, default=16)
    b.add_argument("--m", type=int, default=8)
    b.add_argument("--ksub", type=int, default=8)
    b.add_argument("--ivf-iters", type=int, default=8)
    b.add_argument("--pq-iters", type=int, default=4)
    b.add_argument("--sample-size", type=int, default=2048)
    b.add_argument("--by-residual", action="store_true")
    b.add_argument("--keep-vec", action="store_true",
                   help="carry float vectors in the index (enables --refine)")

    a = sub.add_parser("add")
    a.add_argument("--corpus", required=True, help="NEW embeddings parquet dir")
    a.add_argument("--warehouse", required=True)
    a.add_argument("--index-table", default="ivfpq_index")
    a.add_argument("--model-table", default="ivfpq_model")
    a.add_argument("--id-col", default="vec_id")
    a.add_argument("--vec-col", default="embedding")

    s = sub.add_parser("search")
    s.add_argument("--queries", required=True, help="query parquet")
    s.add_argument("--warehouse", required=True)
    s.add_argument("--index-table", default="ivfpq_index")
    s.add_argument("--model-table", default="ivfpq_model")
    s.add_argument("--id-col", default="vec_id")
    s.add_argument("--vec-col", default="embedding")
    s.add_argument("--k", type=int, default=10)
    s.add_argument("--n-probe", type=int, default=4)
    s.add_argument("--refine", type=int, default=None)
    s.add_argument("--output", required=True)

    args = p.parse_args()
    spark = SparkSession.builder.appName(f"ann_index_{args.cmd}").getOrCreate()
    if args.cmd == "build":
        _build(spark, args)
    elif args.cmd == "add":
        _add(spark, args)
    else:
        _search(spark, args)


if __name__ == "__main__":
    main()
