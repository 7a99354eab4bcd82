"""Iceberg-shaped table catalog with a Parquet fallback.

The production design is Iceberg (bucketed transcripts, snapshot commits,
schema evolution — SURVEY.md §1.4); this sandbox has no
``iceberg-spark-runtime`` jar, so the same API is served by a thin
Parquet-backed catalog (SURVEY.md §7.4.5 fallback plan).  Jobs program
against ``TableCatalog`` only, so swapping in a real Iceberg catalog is a
constructor change, not a code change:

* ``append(df, table)``      → Iceberg ``df.writeTo(t).append()``
* ``overwrite(df, table)``   → Iceberg ``df.writeTo(t).createOrReplace()``
* ``read(table)``            → ``spark.table(t)``
* atomic visibility is approximated with a write-audit-publish pattern:
  data lands in a staging directory, then an atomic ``rename`` publishes it
  (one commit per partition-batch, mirroring Iceberg snapshot semantics and
  the reference's incremental appender, utils/utils.py:163-206).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class TableCatalog:
    def __init__(self, spark: SparkSession, warehouse: str) -> None:
        self.spark = spark
        self.warehouse = warehouse
        os.makedirs(warehouse, exist_ok=True)

    def path(self, table: str) -> str:
        return os.path.join(self.warehouse, table)

    def exists(self, table: str) -> bool:
        p = self.path(table)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") or f.startswith("part-")
            for root, _d, files in os.walk(p)
            for f in files
        )

    def read(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table))

    def append(self, df: DataFrame, table: str, partition_by: list[str] | None = None) -> None:
        """WAP append: stage → atomic publish into the table directory."""
        table_dir = self.path(table)
        os.makedirs(table_dir, exist_ok=True)
        staging = os.path.join(self.warehouse, f"_staging_{table}_{uuid.uuid4().hex}")
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(staging)
        # publish: move staged files in, preserving partition dirs
        for root, _dirs, files in os.walk(staging):
            rel = os.path.relpath(root, staging)
            dest_dir = table_dir if rel == "." else os.path.join(table_dir, rel)
            os.makedirs(dest_dir, exist_ok=True)
            for f in files:
                if f.startswith(("_", ".")):
                    continue
                os.rename(
                    os.path.join(root, f),
                    os.path.join(dest_dir, f"{uuid.uuid4().hex}-{f}"),
                )
        shutil.rmtree(staging, ignore_errors=True)

    def overwrite(self, df: DataFrame, table: str, partition_by: list[str] | None = None) -> None:
        staging = os.path.join(self.warehouse, f"_staging_{table}_{uuid.uuid4().hex}")
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(staging)
        table_dir = self.path(table)
        if os.path.isdir(table_dir):
            shutil.rmtree(table_dir)
        os.rename(staging, table_dir)

    def drop(self, table: str) -> None:
        shutil.rmtree(self.path(table), ignore_errors=True)

    def compact(
        self,
        table: str,
        target_file_bytes: int = 128 * 1024 * 1024,
        partition_by: list[str] | None = None,
        sort_within_by: list[str] | None = None,
    ) -> dict:
        """Small-file compaction — the maintenance pass an incremental
        WAP-append table needs: every resumed run appends its own files,
        and at 10^12 turns a scan's task count (and the namenode/manifest
        load) is driven by FILE count, not data size.

        Rewrites the table at ≈``target_file_bytes`` per file (computed
        from the table's actual on-disk size, not a guessed partition
        count), optionally re-establishing partition dirs and an intra-file
        sort (``sort_within_by`` — e.g. conv_id, turn_idx — so downstream
        conversation windows read clustered data).  The rewrite goes
        through the same staging+atomic-rename publish as overwrite();
        readers never observe a half-compacted table.  Iceberg twin:
        ``rewrite_data_files``."""
        import math

        table_dir = self.path(table)
        n_files = 0
        total_bytes = 0
        for root, _d, files in os.walk(table_dir):
            for f in files:
                if not f.startswith(("_", ".")):
                    n_files += 1
                    total_bytes += os.path.getsize(os.path.join(root, f))
        target = max(1, math.ceil(total_bytes / target_file_bytes))
        df = self.read(table)
        if sort_within_by:
            df = df.repartition(target).sortWithinPartitions(*sort_within_by)
        else:
            df = df.coalesce(target) if target < n_files else df.repartition(target)
        self.overwrite(df, table, partition_by=partition_by)
        n_after = sum(
            1
            for root, _d, files in os.walk(table_dir)
            for f in files
            if not f.startswith(("_", "."))
        )
        return {"files_before": n_files, "files_after": n_after,
                "bytes": total_bytes}

    # -- bucketed tables (co-located joins) --------------------------------
    #
    # The Iceberg production design buckets transcripts on conv_id
    # (``bucket(N, conv_id)``) so conversation-grained joins/aggregations
    # are ALREADY co-partitioned and need no exchange.  The Parquet
    # fallback reaches the same plan through Spark's managed-table
    # bucketing: two tables bucketed (same column, same count) hash-join
    # with ZERO Exchange on either side — at 100 TB that deletes the two
    # largest shuffles of a resume-join or conversation-merge pipeline.
    # Bucketed writes must go through saveAsTable (bucket metadata lives
    # in the session catalog), hence the separate API from append().

    def write_bucketed(
        self,
        df: DataFrame,
        table: str,
        bucket_col: str,
        n_buckets: int = 16,
        sort_col: str | None = None,
    ) -> None:
        """Overwrite ``table`` as a bucketed managed table.  ``sort_col``
        additionally sorts within buckets (sort-merge joins then skip the
        sort too)."""
        w = df.write.mode("overwrite").format("parquet").bucketBy(
            n_buckets, bucket_col
        )
        if sort_col is not None:
            w = w.sortBy(sort_col)
        w.option("path", self.path(table)).saveAsTable(table)

    def read_bucketed(self, table: str) -> DataFrame:
        """Read via the session catalog so the bucketing spec is visible
        to the planner (a plain ``read.parquet`` of the same files would
        lose it and reintroduce the shuffle)."""
        return self.spark.table(table)
