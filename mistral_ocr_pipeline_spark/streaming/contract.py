"""Continuous data-contract monitoring: maintain mergeable profile
shards under an ingest stream and re-evaluate the declarative contract
per batch.

The batch pair (`profiling.profile_shards` → lattice stats rows,
`profiling.check_constraints` → the Deequ-style gate) becomes a
monitor: each micro-batch profiles ONLY its own rows into one shard
(shard id = the lifecycle-qualified batch), appends the shard rows to
the stats table, folds the WHOLE stats table with `merge_profiles`
(stats rows, never raw data — the fold input is #batches × #columns
rows), and evaluates the contract against the corpus-level merged
profile.  The verdict table always holds the LATEST corpus verdict;
a batch that tips a null-fraction cap or collapses a cardinality
flips the verdict row the moment it lands — which is the entire point
of contract monitoring over per-batch-only checks (a slow null leak
passes every per-batch gate and still poisons the corpus).

Raw data is read exactly once ever (its own batch's profile pass).
Exactly-once: shards + verdicts + lineage publish in ONE atomic
catalog commit, replays are skipped by (stream_id, batch_id) with the
UUID-marker lifecycle identity.  Contract metrics available in the
mergeable form: n_rows / n_null / null_frac_micro / mean_micro /
est_distinct (the KMV estimate — `check_constraints` raises at
submission if a contract asks this form for exact n_distinct)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from mistral_ocr_pipeline_spark.operators.profiling import (
    check_constraints,
    merge_profiles,
    profile_shards,
)
from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog
from mistral_ocr_pipeline_spark.streaming.identity import stream_identity


def run_contract_monitor(
    spark: SparkSession,
    input_dir: str,
    schema,
    catalog: TableCatalog,
    checkpoint_dir: str,
    constraints: list[tuple],
    columns: list[str] | None = None,
    shards_table: str = "contract_shards",
    verdict_table: str = "contract_verdicts",
    lineage_table: str = "contract_lineage",
) -> None:
    """Drain available batches, fold their profile shards in, and
    re-evaluate the contract over the merged corpus profile.  Each
    micro-batch publishes {shards, verdicts, lineage} in ONE atomic
    commit; replays are no-ops."""
    stream_id = stream_identity(checkpoint_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if catalog.exists(lineage_table):
            seen = catalog.read(lineage_table).filter(
                (F.col("batch_id") == batch_id)
                & (F.col("stream_id") == stream_id)
            )
            if seen.limit(1).count():
                return
        shard = profile_shards(
            batch_df.withColumn(
                "shard", F.lit(f"{stream_id}#{int(batch_id)}")
            ),
            columns=columns,
        ).localCheckpoint(eager=True)
        all_shards = (
            catalog.read(shards_table).unionByName(shard)
            if catalog.exists(shards_table)
            else shard
        )
        verdict = check_constraints(
            merge_profiles(all_shards), constraints
        ).withColumn("as_of_batch", F.lit(int(batch_id)))
        verdict = verdict.localCheckpoint(eager=True)
        lineage = spark.createDataFrame(
            [(stream_id, int(batch_id))], "stream_id string, batch_id long"
        )
        catalog.commit(
            {
                shards_table: catalog.stage_append(shard, shards_table),
                verdict_table: catalog.stage_overwrite(
                    verdict, verdict_table
                ),
                lineage_table: catalog.stage_append(lineage, lineage_table),
            }
        )

    q = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("path", input_dir)
        .load()
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
