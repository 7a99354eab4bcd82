"""Cluster entry point for the training-data curation pipeline —
``spark-submit --py-files mistral_ocr_pipeline_spark.zip spark_jobs/curation_job.py``.

Reads a documents table (id + text), runs the curation DAG the engine
exposes as the ``curation_pipeline`` driver query — optional PII scrub →
quality gate → optional Kneser-Ney fluency cut (``--max-kn-surprisal``,
the CCNet-perplexity-filter shape) → exact-dedup keep-canonical →
deterministic train/valid/test split → optional token-budget sequence
packing — and
writes the kept corpus partitioned by split, plus a one-row-per-split
rollup (and a per-shard pack assignment when packing is on).  Everything
up to the writes is one Catalyst plan: the scrub is a map-side regex
cascade, the gate is a scan-level filter, dedup is one shuffle with
map-side partial aggregation, the split is a projection (content-hash
fate, so reruns and repartitions reproduce identical splits), and the
pack assignment is one window cumsum per shard.  The two tables publish
in ONE atomic catalog commit.

Example (multi-executor cluster):
  spark-submit \\
    --master yarn --deploy-mode cluster \\
    --num-executors 256 --executor-cores 4 \\
    --conf spark.sql.adaptive.enabled=true \\
    --py-files mistral_ocr_pipeline_spark.zip \\
    spark_jobs/curation_job.py \\
    --input /warehouse/documents --warehouse /warehouse/curated \\
    --min-quality 0.05
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="documents parquet path")
    p.add_argument("--warehouse", required=True, help="output warehouse dir")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--min-quality", type=float, default=0.05)
    p.add_argument("--max-kn-surprisal", type=float, default=0.0,
                   help="drop docs whose Kneser-Ney bigram surprisal "
                        "exceeds this (0 = off; docs with <2 tokens "
                        "carry no evidence and are kept)")
    p.add_argument("--weights", default="0.8,0.1,0.1",
                   help="train,valid,test split weights")
    p.add_argument("--scrub-pii", action="store_true",
                   help="redact emails/SSNs/phones/IPs before curation")
    p.add_argument("--pack-budget", type=int, default=0,
                   help="token budget per context window (0 = no packing)")
    p.add_argument("--pack-shards", type=int, default=64)
    p.add_argument("--lang-col", default=None,
                   help="language column on the input (enables --unimax-*)")
    p.add_argument("--unimax-budget-tokens", type=int, default=0,
                   help="UniMax total token budget across languages "
                        "(0 = no language balancing; needs --lang-col)")
    p.add_argument("--unimax-max-epochs", type=int, default=4)
    args = p.parse_args()
    if args.unimax_budget_tokens > 0 and not args.lang_col:
        p.error("--unimax-budget-tokens requires --lang-col")

    spark = SparkSession.builder.appName("corpus_curation").getOrCreate()

    from mistral_ocr_pipeline_spark.operators.dedup import exact_dedup
    from mistral_ocr_pipeline_spark.operators.packing import (
        pack_rollup,
        pack_token_budget,
    )
    from mistral_ocr_pipeline_spark.operators.sampling import train_valid_test_split
    from mistral_ocr_pipeline_spark.operators.text_analysis import (
        pii_scrub,
        quality_features,
        ws_token_count,
    )
    from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog

    catalog = TableCatalog(spark, args.warehouse)
    in_cols = [
        F.col(args.id_col).alias("doc_id"),
        F.col(args.text_col).alias("text"),
    ]
    if args.lang_col:
        in_cols.append(F.col(args.lang_col).alias("lang"))
    docs = spark.read.parquet(args.input).select(*in_cols)
    if args.scrub_pii:
        # keep_cols carries lang through the scrub's own projection —
        # one scan; a re-join would rescan AND fan out k² rows per
        # k-duplicated raw id (dedup only runs later)
        keep = ["lang"] if args.lang_col else None
        docs = pii_scrub(docs, "doc_id", "text", keep_cols=keep).select(
            F.col("id").alias("doc_id"),
            F.col("scrubbed").alias("text"),
            *(["lang"] if args.lang_col else []),
        )
    gated = quality_features(docs).filter(F.col("q_score") >= args.min_quality)
    if args.max_kn_surprisal > 0:
        # CCNet-style fluency cut on the rule-gated corpus: the KN
        # bigram LM trains on the survivors themselves (the in-engine
        # stand-in for a reference-corpus KenLM); docs too short to
        # produce a bigram carry no evidence and pass.  The LM tables
        # are vocabulary-sized; the score join is doc-keyed.
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            kn_bigram_surprisal,
        )

        kn = kn_bigram_surprisal(gated, "doc_id", "text").select(
            "doc_id", "kn_surprisal"
        )
        gated = (
            gated.join(kn, "doc_id", "left")
            .filter(
                F.coalesce(
                    F.col("kn_surprisal") <= args.max_kn_surprisal,
                    F.lit(True),
                )
            )
            .drop("kn_surprisal")
        )
    canon = gated.join(
        exact_dedup(gated, "doc_id", "text").filter("is_canonical"),
        gated["doc_id"] == F.col("id"),
        "left_semi",
    )
    w = tuple(float(x) for x in args.weights.split(","))
    # each staged table is its own action; persist the shared curation
    # DAG so scrub→gate→dedup→split run once, not once per output table
    split = train_valid_test_split(canon, key_col="doc_id", weights=w).persist()

    updates = {
        "curated": catalog.stage_overwrite(split, "curated", partition_by=["split"])
    }
    if args.unimax_budget_tokens > 0:
        # UniMax language balancing over the TRAIN split: the allocation
        # plan (one row per language) and the replica stream (doc_id,
        # lang, epoch — all replicas of a doc stay in one split because
        # the split hashed the doc_id) publish in the same atomic commit.
        # The plan is computed ONCE and passed into the mix so the
        # corpus-scale token aggregation never runs twice.
        from mistral_ocr_pipeline_spark.operators.sampling import (
            unimax_allocation,
            unimax_mix,
        )

        train_docs = split.filter(F.col("split") == "train").select(
            "doc_id", "lang", ws_token_count(F.col("text")).alias("tok")
        )
        alloc = unimax_allocation(
            train_docs, "lang", "tok",
            args.unimax_budget_tokens, args.unimax_max_epochs,
        ).persist()
        updates["unimax_plan"] = catalog.stage_overwrite(
            alloc.coalesce(1), "unimax_plan"
        )
        updates["unimax_stream"] = catalog.stage_overwrite(
            unimax_mix(
                train_docs, "doc_id", "lang", "tok",
                args.unimax_budget_tokens, args.unimax_max_epochs,
                allocation=alloc,
            ),
            "unimax_stream",
        )
    rollup = split.groupBy("split").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.avg("q_score"), 6).alias("mean_q")
    )
    updates["curation_rollup"] = catalog.stage_overwrite(
        rollup.coalesce(1), "curation_rollup"
    )
    if args.pack_budget > 0:
        train = split.filter(F.col("split") == "train").select(
            "doc_id", ws_token_count(F.col("text")).alias("tokens")
        )
        packed = pack_token_budget(
            train, "doc_id", "tokens",
            budget=args.pack_budget, n_shards=args.pack_shards,
        )
        updates["pack_assignment"] = catalog.stage_overwrite(
            packed, "pack_assignment"
        )
        updates["pack_stats"] = catalog.stage_overwrite(
            pack_rollup(packed, budget=args.pack_budget).coalesce(1), "pack_stats"
        )
    catalog.commit(updates)  # every output table publishes atomically
    summary = {r.split: (r.n, r.mean_q) for r in catalog.read("curation_rollup").collect()}
    out = {"input": args.input, "kept_by_split": summary}
    if args.max_kn_surprisal > 0:
        out["max_kn_surprisal"] = args.max_kn_surprisal
    if args.pack_budget > 0:
        n_packs = catalog.read("pack_stats").count()
        out["packs"] = n_packs
    if args.unimax_budget_tokens > 0:
        out["unimax_langs"] = catalog.read("unimax_plan").count()
        out["unimax_stream_rows"] = catalog.read("unimax_stream").count()
    print(out)
    spark.stop()


if __name__ == "__main__":
    main()
