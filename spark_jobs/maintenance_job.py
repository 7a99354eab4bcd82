"""Warehouse maintenance entry point — the lakehouse upkeep pass an
incremental extraction warehouse needs on a schedule (Iceberg twins:
``rewrite_data_files`` + ``expire_snapshots`` + ``remove_orphan_files``).

Every resumed/streaming run appends its own files; at 10^12 turns a
scan's task count (and manifest/namenode load) is driven by FILE count,
not bytes.  This job, per table:

  1. ``compact``  — rewrite the current snapshot at the target file size
     (optionally re-sorting within files so conversation windows read
     clustered data), published as one atomic snapshot swap — readers
     never observe a half-compacted table;
  2. ``expire``   — drop superseded snapshots beyond ``--keep-snapshots``
     (hardlinked files shared with retained snapshots survive);
  3. ``vacuum``   — remove snapshot dirs no manifest references (the
     leftovers of staged-then-killed commits).

Example:
  spark-submit --py-files dist/mistral_ocr_pipeline_spark.zip \\
    spark_jobs/maintenance_job.py --warehouse /warehouse/extraction \\
    --tables extracted run_partitions --sort-within conv_id,turn_idx
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--warehouse", required=True)
    p.add_argument("--tables", nargs="+", required=True)
    p.add_argument("--target-file-mb", type=int, default=128)
    p.add_argument("--sort-within", default=None,
                   help="comma-separated intra-file sort columns (applied to "
                        "every table that has them)")
    p.add_argument("--keep-snapshots", type=int, default=1)
    p.add_argument("--skip-compact", action="store_true",
                   help="only expire + vacuum (cheap metadata pass)")
    p.add_argument("--vacuum-grace-secs", type=float, default=24 * 3600,
                   help="keep unreferenced snapshot dirs younger than this "
                        "(protects writers between stage and commit); 0 "
                        "only when no writer can be in flight")
    args = p.parse_args()

    spark = SparkSession.builder.appName("warehouse_maintenance").getOrCreate()

    from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog

    catalog = TableCatalog(spark, args.warehouse)
    sort_cols = args.sort_within.split(",") if args.sort_within else None
    report: dict[str, dict] = {}
    for table in args.tables:
        if not catalog.exists(table):
            report[table] = {"skipped": "missing"}
            continue
        entry: dict = {}
        if not args.skip_compact:
            cols = set(catalog.read(table).columns)
            sw = sort_cols if sort_cols and set(sort_cols) <= cols else None
            entry["compact"] = catalog.compact(
                table,
                target_file_bytes=args.target_file_mb * 1024 * 1024,
                sort_within_by=sw,
            )
        entry["expired"] = catalog.expire_snapshots(
            table, keep_last=args.keep_snapshots
        )
        entry["vacuumed"] = catalog.vacuum(
            table, grace_secs=args.vacuum_grace_secs
        )
        report[table] = entry
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
