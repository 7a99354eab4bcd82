"""Cluster entry point for data-contract enforcement —
``spark-submit --py-files mistral_ocr_pipeline_spark.zip spark_jobs/contract_job.py``.

Each batch is profiled ONCE into mergeable lattice shards
(`profiling.profile_shards`), the shard rows append to the stats
ledger, and the declarative contract (`profiling.check_constraints`)
is evaluated against BOTH scopes that matter operationally:

* the BATCH alone (did this drop itself violate anything?), and
* the MERGED corpus profile (did this drop tip a corpus-level cap a
  per-batch check cannot see — the slow-leak case?).

Shards, both verdict tables, and lineage publish in ONE atomic catalog
commit; ``--fail-on-violation`` additionally exits non-zero when any
corpus-level constraint fails, which is how a scheduler wires the gate
in front of curation.  Idempotent per ``--batch-id``.

Constraints come from a JSON file (a list of [column, metric, op,
threshold] rows) — the contract is DATA shipped next to the job, not
code.

Example:
  spark-submit --master yarn --num-executors 64 \\
    --py-files mistral_ocr_pipeline_spark.zip \\
    spark_jobs/contract_job.py \\
    --input /landing/docs/2026-08-21 --warehouse /warehouse/contract \\
    --batch-id 2026-08-21 --contract /conf/contract.json \\
    --fail-on-violation
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="batch parquet path")
    p.add_argument("--warehouse", required=True)
    p.add_argument("--batch-id", required=True)
    p.add_argument("--contract", required=True,
                   help="JSON file: [[column, metric, op, threshold], ...]")
    p.add_argument("--columns", action="append", default=None,
                   help="columns to profile (repeatable; default all)")
    p.add_argument("--fail-on-violation", action="store_true",
                   help="exit 3 when a corpus-level constraint fails")
    args = p.parse_args()

    constraints = [tuple(c) for c in json.load(open(args.contract))]
    spark = SparkSession.builder.appName("contract_gate").getOrCreate()

    from mistral_ocr_pipeline_spark.operators.profiling import (
        check_constraints,
        merge_profiles,
        profile_shards,
    )
    from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog

    catalog = TableCatalog(spark, args.warehouse)
    have_lineage = catalog.exists("contract_lineage")
    if have_lineage:
        seen = (
            catalog.read("contract_lineage")
            .filter(F.col("batch_id") == args.batch_id)
            .limit(1)
            .count()
        )
        if seen:
            print({"batch": args.batch_id, "status": "already-recorded",
                   "action": "no-op"})
            return

    batch = spark.read.parquet(args.input)
    shard = profile_shards(
        batch.withColumn("shard", F.lit(args.batch_id)),
        columns=args.columns,
    ).localCheckpoint(eager=True)

    batch_verdict = check_constraints(
        merge_profiles(shard), constraints
    ).withColumn("batch_id", F.lit(args.batch_id))
    all_shards = (
        catalog.read("contract_shards").unionByName(shard)
        if catalog.exists("contract_shards")
        else shard
    )
    corpus_verdict = check_constraints(
        merge_profiles(all_shards), constraints
    ).withColumn("as_of_batch", F.lit(args.batch_id))
    batch_verdict = batch_verdict.localCheckpoint(eager=True)
    corpus_verdict = corpus_verdict.localCheckpoint(eager=True)

    lineage = spark.createDataFrame([(args.batch_id,)], "batch_id string")
    catalog.commit({
        "contract_shards": catalog.stage_append(shard, "contract_shards"),
        "batch_verdicts": catalog.stage_append(
            batch_verdict, "batch_verdicts"
        ),
        "contract_verdicts": catalog.stage_overwrite(
            corpus_verdict, "contract_verdicts"
        ),
        "contract_lineage": (
            catalog.stage_append(lineage, "contract_lineage")
            if have_lineage
            else catalog.stage_overwrite(lineage, "contract_lineage")
        ),
    })
    failures = [
        (r.column, r.metric, r.observed, r.threshold)
        for r in corpus_verdict.filter(~F.col("passed")).collect()
    ]
    print({
        "batch": args.batch_id,
        "status": "recorded",
        "corpus_violations": failures,
    })
    if args.fail_on_violation and failures:
        sys.exit(3)


if __name__ == "__main__":
    main()
