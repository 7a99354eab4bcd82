"""Cluster entry point for incremental LINK-GRAPH maintenance —
``spark-submit --py-files mistral_ocr_pipeline_spark.zip spark_jobs/linkgraph_job.py``.

Every crawled page batch has its ``<a href>`` anchors extracted,
canonicalized, and merged into the persisted host-graph fact table via
the oracled `link_graph_append` lattice law (history pages are never
re-scanned); optionally the directed dangling-aware PageRank is
recomputed over the merged graph's external edges — authority runs on
the HOST-pair relation, orders of magnitude smaller than the pages.
Graph, lineage, and (optionally) authority publish in ONE atomic
catalog commit.

Idempotent per ``--batch-id``: a rerun of an already-recorded batch is
a no-op (the lineage table is the ledger), so the job is safe under
scheduler retries.  The Structured-Streaming twin of this job is
``streaming/linkgraph.py`` (checkpoint-driven drain instead of explicit
batch ids).

Example (multi-executor cluster):
  spark-submit \\
    --master yarn --deploy-mode cluster \\
    --num-executors 64 --executor-cores 4 \\
    --py-files mistral_ocr_pipeline_spark.zip \\
    spark_jobs/linkgraph_job.py \\
    --input /landing/pages/2026-08-20 --warehouse /warehouse/webgraph \\
    --batch-id 2026-08-20 --compute-authority
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="batch parquet path")
    p.add_argument("--warehouse", required=True, help="graph warehouse dir")
    p.add_argument("--batch-id", required=True,
                   help="idempotency key; one merge per batch")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--html-col", default="html")
    p.add_argument("--src-host-col", default="src_host")
    p.add_argument("--compute-authority", action="store_true",
                   help="recompute host PageRank over the merged graph")
    p.add_argument("--n-iter", type=int, default=5)
    args = p.parse_args()

    spark = SparkSession.builder.appName("linkgraph_ingest").getOrCreate()

    from mistral_ocr_pipeline_spark.operators.htmllinks import (
        host_pagerank,
        link_graph,
        link_graph_append,
    )
    from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog

    catalog = TableCatalog(spark, args.warehouse)
    have_lineage = catalog.exists("link_graph_lineage")
    if have_lineage:
        seen = (
            catalog.read("link_graph_lineage")
            .filter(F.col("batch_id") == args.batch_id)
            .limit(1)
            .count()
        )
        if seen:
            print({"batch": args.batch_id, "status": "already-recorded",
                   "action": "no-op"})
            return

    batch = spark.read.parquet(args.input)
    if catalog.exists("link_graph"):
        merged = link_graph_append(
            catalog.read("link_graph"), batch,
            args.id_col, args.html_col, args.src_host_col,
        )
    else:
        merged = link_graph(
            batch, args.id_col, args.html_col, args.src_host_col
        )
    # the merge reads the table it replaces → materialize before staging
    merged = merged.localCheckpoint(eager=True)
    lineage = spark.createDataFrame(
        [(args.batch_id,)], "batch_id string"
    )
    staged = {
        "link_graph": catalog.stage_overwrite(merged, "link_graph"),
        "link_graph_lineage": (
            catalog.stage_append(lineage, "link_graph_lineage")
            if have_lineage
            else catalog.stage_overwrite(lineage, "link_graph_lineage")
        ),
    }
    if args.compute_authority:
        edges = merged.filter(F.col("src_host") != F.col("dst_host"))
        pr = host_pagerank(edges, n_iter=args.n_iter)
        staged["host_authority"] = catalog.stage_overwrite(
            pr.coalesce(1), "host_authority"
        )
    catalog.commit(staged)
    print({
        "batch": args.batch_id,
        "status": "recorded",
        "edges": merged.count(),
        "authority": args.compute_authority,
    })


if __name__ == "__main__":
    main()
