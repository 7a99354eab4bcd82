"""Checkpoint / resume with per-partition lineage + metrics.

Spark-native generalization of the reference's resume machinery: the CSV
hash index that skips already-processed documents (reference
utils/utils.py:291-304, main.py:244-257) and the failures.jsonl sidecar
(main.py:304-311) become one ``run_partitions`` lineage table
(FIXTURES.md §3):

    run_partitions(run_id, partition_id, conv_bucket, rows, bytes,
                   failures, status, started_at, finished_at)

Unit of work = ``conv_bucket = pmod(hash(conv_id), n_buckets)`` — a
deterministic, data-independent partition of conversation space (the
Iceberg ``bucket(N, conv_id)`` transform's moral equivalent).  A killed
run resumes by anti-joining input buckets against committed lineage rows
(J1 in SURVEY.md §2.4) and recomputes nothing that committed.

Commit protocol (write-audit-publish, SURVEY.md §7.4.6): data files for a
batch of buckets publish first, then the lineage rows commit.  On resume,
bucket partitions present in the output but absent from lineage are
orphans from a mid-commit kill — they are dropped before reprocessing, so
the data+lineage pair behaves atomically (no double-writes)."""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from mistral_ocr_pipeline_spark.plans.extract_pipeline import extract_transcripts
from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("conv_bucket", T.IntegerType(), False),
        T.StructField("rows", T.LongType(), False),
        T.StructField("bytes", T.LongType(), False),
        T.StructField("failures", T.LongType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("started_at", T.TimestampType(), True),
        T.StructField("finished_at", T.TimestampType(), True),
    ]
)

DEFAULT_N_BUCKETS = 16


def with_conv_bucket(df: DataFrame, n_buckets: int = DEFAULT_N_BUCKETS) -> DataFrame:
    return df.withColumn(
        "conv_bucket", F.pmod(F.hash(F.col("conv_id")), F.lit(n_buckets)).cast("int")
    )


def committed_buckets(catalog: TableCatalog, lineage_table: str) -> set[int]:
    if not catalog.exists(lineage_table):
        return set()
    rows = (
        catalog.read(lineage_table)
        .filter(F.col("status") == "committed")
        .select("conv_bucket")
        .distinct()
        .collect()
    )
    return {r.conv_bucket for r in rows}


def _drop_orphan_buckets(
    catalog: TableCatalog, output_table: str, committed: set[int]
) -> list[int]:
    """Remove bucket partition dirs that have data but no lineage commit
    (mid-kill leftovers) so reprocessing cannot double-write."""
    table_dir = catalog.path(output_table)
    orphans = []
    if not os.path.isdir(table_dir):
        return orphans
    for entry in os.listdir(table_dir):
        if not entry.startswith("conv_bucket="):
            continue
        bucket = int(entry.split("=", 1)[1])
        if bucket not in committed:
            shutil.rmtree(os.path.join(table_dir, entry), ignore_errors=True)
            orphans.append(bucket)
    return orphans


def run_extraction(
    spark: SparkSession,
    catalog: TableCatalog,
    input_df: DataFrame,
    output_table: str = "extracted",
    lineage_table: str = "run_partitions",
    run_id: str = "run-0",
    n_buckets: int = DEFAULT_N_BUCKETS,
    only_buckets: set[int] | None = None,
    num_partitions: int | None = None,
) -> dict:
    """One (possibly resumed) extraction run.

    ``only_buckets`` restricts the run to a subset — the test hook that
    simulates a kill after k bucket-batches committed.  Returns summary
    metrics {processed_buckets, skipped_buckets, rows, failures}."""
    committed = committed_buckets(catalog, lineage_table)
    orphans = _drop_orphan_buckets(catalog, output_table, committed)

    src = with_conv_bucket(input_df, n_buckets)
    # J1 resume anti-join: committed buckets drop out of the scan.  The
    # committed set is tiny (one row per bucket) → broadcast by Catalyst.
    if committed:
        lineage_keys = (
            catalog.read(lineage_table)
            .filter(F.col("status") == "committed")
            .select("conv_bucket")
            .distinct()
        )
        src = src.join(F.broadcast(lineage_keys), "conv_bucket", "left_anti")
    if only_buckets is not None:
        src = src.filter(F.col("conv_bucket").isin(*[int(b) for b in only_buckets]))

    started_at = F.current_timestamp()
    extracted = extract_transcripts(
        src.select("conv_id", "turn_idx", "role", "text", "tool", "ts"),
        num_partitions=num_partitions,
    )
    out = with_conv_bucket(extracted, n_buckets)
    catalog.append(out, output_table, partition_by=["conv_bucket"])

    # metrics from the published files (read-back doubles as a write audit)
    written = catalog.read(output_table)
    if committed:
        written = written.filter(~F.col("conv_bucket").isin(*sorted(committed)))
    if only_buckets is not None:
        written = written.filter(
            F.col("conv_bucket").isin(*[int(b) for b in only_buckets])
        )
    metrics = (
        written.groupBy("conv_bucket")
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(
                F.coalesce(F.octet_length("extracted_text"), F.lit(0))
                + F.coalesce(F.octet_length("md"), F.lit(0))
            ).cast("long").alias("bytes"),
            F.sum(F.col("error").isNotNull().cast("long")).alias("failures"),
        )
        .select(
            F.lit(run_id).alias("run_id"),
            F.col("conv_bucket").alias("partition_id"),
            "conv_bucket",
            "rows",
            "bytes",
            "failures",
            F.lit("committed").alias("status"),
            started_at.alias("started_at"),
            F.current_timestamp().alias("finished_at"),
        )
    )
    n_new = metrics.count()
    if n_new:
        catalog.append(metrics, lineage_table)
    lineage = catalog.read(lineage_table) if catalog.exists(lineage_table) else None
    totals = (
        lineage.agg(F.sum("rows").alias("r"), F.sum("failures").alias("f")).first()
        if lineage is not None
        else None
    )
    return {
        "run_id": run_id,
        "processed_buckets": n_new,
        "skipped_buckets": len(committed),
        "orphans_dropped": orphans,
        "total_rows": totals.r if totals else 0,
        "total_failures": totals.f if totals else 0,
    }
