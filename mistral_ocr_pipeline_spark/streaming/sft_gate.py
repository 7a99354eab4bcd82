"""Streaming SFT-transcript gating: each arriving micro-batch of
conversations is curated against the SAME rule the batch composite
(`plans.entry_queries.transcript_sft_pipeline`) applies — fused
per-conversation facts, degeneracy/integrity keep rule — plus a
CROSS-BATCH dedup leg: a conversation whose fingerprint already passed
the gate in ANY earlier batch is dropped (first-arrival-wins), so a
re-ingested session never enters the training corpus twice no matter
how many days apart the copies land.

Input contract: a micro-batch carries WHOLE conversations (the
warehouse-ingest shape — a session is published once it closes).
Assembling conversations whose turns straddle batches is the session-
window module's job (`streaming/session.py`); gating half a
conversation would mis-count gaps and trainable tokens by
construction, so this module does not attempt it.

Cross-batch state is the persisted facts table itself — the kept
fingerprints are read back per batch and anti-joined (an md5-keyed join
against conversation-sized metadata, never against turn text), exactly
the posting-index discipline of `streaming/neardup.py`: history is
never re-scored, only its digests consulted.

Exactly-once protocol shared with the other streaming modules: kept
turns + per-conversation gate facts + per-batch lineage publish in ONE
atomic catalog commit, (stream_id, batch_id)-idempotent with the
checkpoint-lifecycle UUID identity."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from mistral_ocr_pipeline_spark.operators.transcript_qc import (
    transcript_conv_facts,
)
from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog
from mistral_ocr_pipeline_spark.streaming.identity import stream_identity


def run_sft_gate(
    spark: SparkSession,
    input_dir: str,
    schema,
    catalog: TableCatalog,
    checkpoint_dir: str,
    trainable_roles: tuple[str, ...] = ("assistant",),
    min_trainable_ratio: float = 0.0,
    kept_table: str = "sft_kept_turns",
    facts_table: str = "sft_gate_facts",
    lineage_table: str = "sft_gate_lineage",
) -> None:
    """Drain available files; per batch: fused conv facts → keep rule →
    within-batch canonical (min conv_id per fingerprint) → anti-join
    against every fingerprint previously KEPT → atomic 3-table commit.
    Replays are no-ops; facts rows for dropped conversations are
    retained with their verdict (the audit trail)."""
    stream_id = stream_identity(checkpoint_dir)

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        if catalog.exists(lineage_table):
            seen = catalog.read(lineage_table).filter(
                (F.col("batch_id") == batch_id)
                & (F.col("stream_id") == stream_id)
            )
            if seen.limit(1).count():
                return
        wfp = W.partitionBy("fingerprint")
        facts = transcript_conv_facts(
            batch_df, trainable_roles=trainable_roles
        )
        base = (
            ~F.col("has_gaps")
            & (F.col("dup_turns") == 0)
            & F.col("starts_at_zero")
            & (F.col("n_refusals") == 0)
            & (F.col("n_empty_assistant") == 0)
            & (F.col("n_assistant") > 0)
            & (F.col("tokens_trainable") > 0)
            & (F.col("trainable_ratio_r6") >= min_trainable_ratio)
        )
        # canonical = min conv_id among the RULE-PASSING members of the
        # fingerprint group: a corrupted clone (gapped/refused copy with
        # the same surviving texts) must never shadow a clean one
        facts = (
            facts.withColumn("_base", base)
            .withColumn(
                "is_canonical",
                F.coalesce(
                    F.col("conv_id")
                    == F.min(
                        F.when(F.col("_base"), F.col("conv_id"))
                    ).over(wfp),
                    F.lit(False),
                ),
            )
            .withColumn("keep", F.col("_base") & F.col("is_canonical"))
            .drop("_base")
        )
        if catalog.exists(facts_table):
            # history digests only — never the historical turn text
            seen_fps = (
                catalog.read(facts_table)
                .filter("keep")
                .select("fingerprint")
                .distinct()
            )
            facts = (
                facts.alias("f")
                .join(
                    seen_fps.withColumn("_hist", F.lit(True)),
                    "fingerprint",
                    "left",
                )
                .withColumn(
                    "keep", F.col("keep") & F.col("_hist").isNull()
                )
                .drop("_hist")
            )
        facts = facts.withColumn("batch_id", F.lit(int(batch_id))).persist()
        kept_turns = batch_df.join(
            F.broadcast(facts.filter("keep").select("conv_id")), "conv_id"
        )
        lineage = spark.createDataFrame(
            [(stream_id, int(batch_id))], "stream_id string, batch_id long"
        )
        catalog.commit(
            {
                kept_table: catalog.stage_append(kept_turns, kept_table),
                facts_table: catalog.stage_append(facts, facts_table),
                lineage_table: catalog.stage_append(lineage, lineage_table),
            }
        )
        facts.unpersist()

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
