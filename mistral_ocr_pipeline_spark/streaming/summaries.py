"""Incremental heavy-hitter summary maintenance over a stream.

The batch operator (``operators/sketches.heavy_hitters_rollup``) answers
global top-k from per-shard top-k summaries.  This module keeps those
summaries ALIVE under ingestion: each micro-batch's exact (shard, value)
counts merge into the stored top-k rows, the merge re-truncates to k, and
whatever the truncation may have hidden is folded into a per-shard error
scalar — the mergeable Misra-Gries/SpaceSaving bound carried as data.

Invariant maintained across any number of batches (pinned in
``tests/test_streaming_summaries.py``): for every value v,

    est(v)  =  Σ_shards stored_count(v)  ≤  true_count(v)
    true_count(v)  ≤  est(v) + Σ_shards err_s      (ALL shards — see
    heavy_hitters_from_summary for why the one-shot rollup's tighter
    per-shard subtraction is invalid once values can re-enter a top-k)

and with k large enough that no truncation ever happens the summaries are
EXACT (equal to a one-shot groupBy of everything seen).

Exactly-once: ``foreachBatch`` is at-least-once, and a replayed merge
would double-count, so each batch commits summary + lineage row in ONE
atomic catalog commit and replays are skipped by (stream_id, batch_id) —
same protocol as ``streaming/incremental.py``.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog
from mistral_ocr_pipeline_spark.streaming.identity import stream_identity


def merge_summary(
    old_topk: DataFrame | None,
    old_err: DataFrame | None,
    batch: DataFrame,
    shard_col: str,
    value_col: str,
    k: int,
) -> tuple[DataFrame, DataFrame]:
    """Merge one batch's raw rows into (topk, err) summary frames.

    topk: (shard, value, c) with ≤ k rows per shard — c is a LOWER bound
    on the value's true count (exact until the value first falls out of
    a truncation).  err: (shard, err) — the accumulated (k+1)-th counts
    dropped at each truncation, i.e. the per-shard undercount bound."""
    batch_counts = batch.groupBy(
        F.col(shard_col).alias("shard"), F.col(value_col).alias("value")
    ).agg(F.count(F.lit(1)).alias("c"))
    if old_topk is not None:
        merged = (
            old_topk.select("shard", "value", F.col("c").alias("c_old"))
            .join(batch_counts.withColumnRenamed("c", "c_new"),
                  ["shard", "value"], "full_outer")
            .select(
                "shard",
                "value",
                (F.coalesce("c_old", F.lit(0)) + F.coalesce("c_new", F.lit(0))
                 ).alias("c"),
            )
        )
    else:
        merged = batch_counts
    w = W.partitionBy("shard").orderBy(F.col("c").desc(), F.col("value").asc())
    ranked = merged.withColumn("_rn", F.row_number().over(w))
    new_topk = ranked.filter(F.col("_rn") <= k).select("shard", "value", "c")
    trunc = ranked.filter(F.col("_rn") == k + 1).select(
        "shard", F.col("c").alias("t")
    )
    if old_err is None:
        new_err = trunc.select("shard", F.col("t").alias("err")).filter(
            F.col("err") > 0
        )
    else:
        new_err = (
            old_err.select("shard", F.col("err").alias("e_old"))
            .join(trunc, "shard", "full_outer")
            .select(
                "shard",
                (F.coalesce("e_old", F.lit(0)) + F.coalesce("t", F.lit(0))
                 ).alias("err"),
            )
            .filter(F.col("err") > 0)
        )
    return new_topk, new_err


def heavy_hitters_from_summary(
    topk: DataFrame, err: DataFrame
) -> DataFrame:
    """(value, est_count, max_count) from the maintained summaries alone,
    reading only summary rows (never the ingested data).

    The upper bound adds EVERY shard's error — deliberately looser than
    ``heavy_hitters_rollup``'s (which subtracts the errors of shards
    whose top-k contains the value).  The tight form is only valid
    one-shot: there, a surviving value's count is exact.  Incrementally,
    a value that was truncated out of a shard's top-k and later
    RE-ENTERED is undercounted by up to that shard's accumulated err
    even though it is present, so per shard the only safe invariant is
    true_s(v) ≤ stored_s(v) + err_s for all values (caught by the
    bounds test's re-entry scenario — the tight bound really is wrong
    here, not just conservative)."""
    total_err = err.agg(
        F.coalesce(F.sum("err"), F.lit(0)).alias("_total_err")
    )
    per_value = topk.groupBy("value").agg(F.sum("c").alias("est_count"))
    return per_value.crossJoin(F.broadcast(total_err)).select(
        "value",
        "est_count",
        (F.col("est_count") + F.col("_total_err")).alias("max_count"),
    )


def run_incremental_heavy_hitters(
    spark: SparkSession,
    input_dir: str,
    schema,
    shard_expr: str,
    value_expr: str,
    catalog: TableCatalog,
    checkpoint_dir: str,
    k: int = 64,
    topk_table: str = "hh_topk",
    err_table: str = "hh_err",
    lineage_table: str = "hh_lineage",
) -> None:
    """Drain available files and fold them into the summary tables.

    ``shard_expr`` / ``value_expr``: SQL expressions over the stream's
    columns (e.g. ``"pmod(xxhash64(doc_id), 8)"`` / ``"term"``).  Each
    micro-batch publishes {topk, err, lineage} in ONE atomic commit;
    replays (same stream_id + batch_id already in lineage) are no-ops.
    The stream identity carries the checkpoint lifecycle's UUID marker —
    batch ids are unique only per checkpoint LIFECYCLE, and a checkpoint
    wiped and recreated at the same path restarts them at 0, which a
    path-only key would misread as replays (silently dropped batches;
    same fix as streaming/incremental.py and streaming/neardup.py)."""
    stream_id = stream_identity(checkpoint_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if catalog.exists(lineage_table):
            seen = catalog.read(lineage_table).filter(
                (F.col("batch_id") == batch_id)
                & (F.col("stream_id") == stream_id)
            )
            if seen.limit(1).count():
                return
        rows = batch_df.select(
            F.expr(shard_expr).alias("shard"), F.expr(value_expr).alias("value")
        )
        old_topk = catalog.read(topk_table) if catalog.exists(topk_table) else None
        old_err = catalog.read(err_table) if catalog.exists(err_table) else None
        topk, err = merge_summary(old_topk, old_err, rows, "shard", "value", k)
        # the merge reads the tables it replaces → materialize BEFORE
        # staging the overwrite (staging writes new snapshot dirs, but
        # lazy plans must not race the swap)
        topk = topk.localCheckpoint(eager=True)
        err = err.localCheckpoint(eager=True)
        lineage = spark.createDataFrame(
            [(stream_id, int(batch_id))], "stream_id string, batch_id long"
        )
        catalog.commit(
            {
                topk_table: catalog.stage_overwrite(topk, topk_table),
                err_table: catalog.stage_overwrite(err, err_table),
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
