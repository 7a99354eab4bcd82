"""Cluster entry point for TRANSCRIPT SFT curation —
``spark-submit --py-files mistral_ocr_pipeline_spark.zip spark_jobs/sft_job.py``.

Reads a transcript table in the warehouse shape (conv_id, turn_idx,
role, text, tool, ts), runs the conversation-curation DAG the engine
exposes as the ``transcript_sft_pipeline`` driver query — fused
per-conversation facts (integrity + refusal/empty-completion +
loss-mask + fingerprint in ONE conv_id exchange,
`transcript_qc.transcript_conv_facts`) → keep rule (intact ∧
non-degenerate ∧ trainable ∧ canonical-per-fingerprint, thresholds on
the CLI) → optional turn-level PII scrub → turn-aligned context-window
assignment — and publishes three tables in ONE atomic catalog commit:

* ``sft_turns``   — surviving turns with (win_id, turn_tokens,
  trainable) — the trainer's input, window-partitionable;
* ``sft_facts``   — the full per-conversation audit (kept AND dropped,
  with the keep verdict) — the curation's provenance record;
* ``sft_rollup``  — one-row summary (conversations/turns/tokens in and
  out).

Scale shape: two scans of the turn table (facts, then window cut over
the broadcast-joined survivors — the conv-facts relation is
conversation-sized), both keyed conv_id; the PII cascade is map-only;
nothing corpus-sized ever collects.

Example (multi-executor cluster):
  spark-submit \\
    --master yarn --deploy-mode cluster \\
    --num-executors 256 --executor-cores 4 \\
    --conf spark.sql.adaptive.enabled=true \\
    --py-files mistral_ocr_pipeline_spark.zip \\
    spark_jobs/sft_job.py \\
    --input /warehouse/transcripts --warehouse /warehouse/sft \\
    --budget 4096 --min-trainable-ratio 0.05 --scrub-pii
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession, Window as W, functions as F


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="transcripts parquet path")
    p.add_argument("--warehouse", required=True, help="output warehouse dir")
    p.add_argument("--budget", type=int, default=4096,
                   help="context-window token budget (turn-aligned cut)")
    p.add_argument("--trainable-roles", default="assistant",
                   help="comma-separated roles the loss mask trains on")
    p.add_argument("--min-trainable-ratio", type=float, default=0.0,
                   help="drop conversations below this trainable-token ratio")
    p.add_argument("--allow-gaps", action="store_true",
                   help="keep conversations with missing turn indices")
    p.add_argument("--scrub-pii", action="store_true",
                   help="redact emails/SSNs/phones/IPs on surviving turns")
    args = p.parse_args()
    roles = tuple(r.strip() for r in args.trainable_roles.split(",") if r.strip())

    spark = SparkSession.builder.appName("sft_curation").getOrCreate()

    from mistral_ocr_pipeline_spark.operators.text_analysis import pii_scrub
    from mistral_ocr_pipeline_spark.operators.transcript_qc import (
        transcript_context_windows,
        transcript_conv_facts,
    )
    from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog

    catalog = TableCatalog(spark, args.warehouse)
    turns = spark.read.parquet(args.input).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    ).persist()  # two scans: facts + window cut

    wfp = W.partitionBy("fingerprint")
    base_rule = (
        (F.col("dup_turns") == 0)
        & F.col("starts_at_zero")
        & (F.col("n_refusals") == 0)
        & (F.col("n_empty_assistant") == 0)
        & (F.col("n_assistant") > 0)
        & (F.col("tokens_trainable") > 0)
        & (F.col("trainable_ratio_r6") >= args.min_trainable_ratio)
    )
    if not args.allow_gaps:
        base_rule = base_rule & ~F.col("has_gaps")
    # the facts relation is conversation-sized; persist it so the audit
    # write and the survivor broadcast don't recompute the fused pass.
    # Canonical = min conv_id among the RULE-PASSING members of each
    # fingerprint group — a corrupted clone must not shadow a clean one.
    facts = (
        transcript_conv_facts(turns, trainable_roles=roles)
        .withColumn("_base", base_rule)
        .withColumn(
            "is_canonical",
            F.coalesce(
                F.col("conv_id")
                == F.min(F.when(F.col("_base"), F.col("conv_id"))).over(wfp),
                F.lit(False),
            ),
        )
        .withColumn("keep", F.col("_base") & F.col("is_canonical"))
        .drop("_base")
        .persist()
    )
    surv = turns.join(
        F.broadcast(facts.filter("keep").select("conv_id")), "conv_id"
    )
    if args.scrub_pii:
        surv = pii_scrub(
            surv, "conv_id", "text", keep_cols=["turn_idx", "role", "tool", "ts"]
        ).select(
            F.col("id").alias("conv_id"),
            "turn_idx",
            "role",
            F.col("scrubbed").alias("text"),
            "tool",
            "ts",
        )
    wins = transcript_context_windows(surv, budget=args.budget).select(
        "conv_id", "turn_idx", "turn_tokens", "start_offset", "win_id"
    )
    out_turns = surv.join(wins, ["conv_id", "turn_idx"]).withColumn(
        "trainable", F.col("role").isin(*roles)
    )
    rollup = (
        facts.groupBy("keep")
        .agg(
            F.count(F.lit(1)).alias("n_convs"),
            F.sum("n_turns").alias("n_turns"),
            F.sum("tokens_total").alias("tokens_total"),
            F.sum("tokens_trainable").alias("tokens_trainable"),
        )
    )
    catalog.commit(
        {
            "sft_turns": catalog.stage_overwrite(out_turns, "sft_turns"),
            "sft_facts": catalog.stage_overwrite(facts, "sft_facts"),
            "sft_rollup": catalog.stage_overwrite(
                rollup.coalesce(1), "sft_rollup"
            ),
        }
    )
    summary = {
        ("kept" if r.keep else "dropped"): (r.n_convs, r.tokens_trainable)
        for r in catalog.read("sft_rollup").collect()
    }
    print({"input": args.input, "convs": summary,
           "turns_out": catalog.read("sft_turns").count()})


if __name__ == "__main__":
    main()
