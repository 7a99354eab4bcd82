"""Cluster entry point for incremental HOST-BOILERPLATE maintenance —
``spark-submit --py-files mistral_ocr_pipeline_spark.zip spark_jobs/boilerplate_job.py``.

Each page batch's per-host distinct-doc line frequencies merge into the
persisted fact pair (`host_boilerplate_facts_append` — additive lattice,
history pages never re-scanned), then the batch itself is stripped
against the MERGED facts (everything the corpus knows about each host so
far, including this batch) and appended to the cleaned-output table.
Facts, totals, stripped output, and lineage publish in ONE atomic
catalog commit.

Idempotent per ``--batch-id``: a rerun of an already-recorded batch is a
no-op (the lineage table is the ledger), so the job is safe under
scheduler retries.  The dataflow is the oracled `text_host_boilerplate`
operator; this CLI is its maintained-state spark-submit twin, as
`linkgraph_job` is to `html_link_graph`.  ``--restrip`` additionally
re-strips EVERY page ever ingested against the freshest facts (the
compaction pass that clears boilerplate from pages that arrived before
their host's template crossed the gate) — output table
``restripped``, same commit.

Example (multi-executor cluster):
  spark-submit \\
    --master yarn --deploy-mode cluster \\
    --num-executors 64 --executor-cores 4 \\
    --py-files mistral_ocr_pipeline_spark.zip \\
    spark_jobs/boilerplate_job.py \\
    --input /landing/pages/2026-08-20 --warehouse /warehouse/clean \\
    --batch-id 2026-08-20 --min-docs 8 --df-num 3 --df-den 10
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="batch parquet path")
    p.add_argument("--warehouse", required=True, help="warehouse dir")
    p.add_argument("--batch-id", required=True,
                   help="idempotency key; one merge per batch")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--host-col", default="host")
    p.add_argument("--min-docs", type=int, default=4)
    p.add_argument("--df-num", type=int, default=3)
    p.add_argument("--df-den", type=int, default=10)
    p.add_argument("--min-line-chars", type=int, default=8)
    p.add_argument("--restrip", action="store_true",
                   help="also re-strip all ingested pages with final facts")
    args = p.parse_args()

    spark = SparkSession.builder.appName("boilerplate_ingest").getOrCreate()

    from mistral_ocr_pipeline_spark.operators.dedup import (
        host_boilerplate_facts,
        host_boilerplate_facts_append,
        host_boilerplate_strip_with_facts,
    )
    from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog

    catalog = TableCatalog(spark, args.warehouse)
    have_lineage = catalog.exists("bp_lineage")
    if have_lineage:
        seen = (
            catalog.read("bp_lineage")
            .filter(F.col("batch_id") == args.batch_id)
            .limit(1)
            .count()
        )
        if seen:
            print({"batch": args.batch_id, "status": "already-recorded",
                   "action": "no-op"})
            return

    batch = spark.read.parquet(args.input)
    cols = (args.id_col, args.text_col, args.host_col)
    if catalog.exists("bp_line_facts"):
        facts, totals = host_boilerplate_facts_append(
            catalog.read("bp_line_facts"),
            catalog.read("bp_host_totals"),
            batch,
            *cols,
            args.min_line_chars,
        )
    else:
        facts, totals = host_boilerplate_facts(
            batch, *cols, args.min_line_chars
        )
    # the merge reads the tables it replaces → materialize before staging
    facts = facts.localCheckpoint(eager=True)
    totals = totals.localCheckpoint(eager=True)

    gate = dict(min_docs=args.min_docs, df_num=args.df_num,
                df_den=args.df_den, min_line_chars=args.min_line_chars)
    stripped = host_boilerplate_strip_with_facts(
        batch, facts, totals, *cols, **gate
    )

    lineage = spark.createDataFrame([(args.batch_id,)], "batch_id string")
    staged = {
        "bp_line_facts": catalog.stage_overwrite(facts, "bp_line_facts"),
        "bp_host_totals": catalog.stage_overwrite(totals, "bp_host_totals"),
        "bp_stripped": catalog.stage_append(stripped, "bp_stripped"),
        "bp_lineage": (
            catalog.stage_append(lineage, "bp_lineage")
            if have_lineage
            else catalog.stage_overwrite(lineage, "bp_lineage")
        ),
        "bp_pages": catalog.stage_append(batch, "bp_pages"),
    }
    if args.restrip:
        pages = (
            catalog.read("bp_pages").unionByName(batch)
            if catalog.exists("bp_pages")
            else batch
        )
        staged["restripped"] = catalog.stage_overwrite(
            host_boilerplate_strip_with_facts(
                pages, facts, totals, *cols, **gate
            ),
            "restripped",
        )
    catalog.commit(staged)
    print({
        "batch": args.batch_id,
        "status": "recorded",
        "hosts": totals.count(),
        "stripped_rows": stripped.count(),
    })


if __name__ == "__main__":
    main()
