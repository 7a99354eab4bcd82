"""Conversation-level quality control for multi-turn transcript tables
(the BASELINE.json input shape: conv_id, turn_idx, role, text, tool, ts).

The extraction pipeline (`plans/extract_pipeline`) treats every turn
independently and guarantees stable ordering on the way out; these
operators audit the INPUT side — the malformed-conversation classes an
agent-transcript warehouse actually accumulates (retry storms duplicating
turn indices, dropped turns leaving gaps, clock skew inverting
timestamps, tool loops breaking role alternation) — and deduplicate at
conversation granularity, where near-identical re-ingested sessions
dodge the per-turn/document dedup passes.

Both operators are pure Catalyst expressions over ONE shuffle keyed by
conv_id (the window and the groupBy share the exchange), so they run at
transcript-warehouse scale exactly like the extraction pipeline itself:
per-conversation state never exceeds one task, and a hot conversation is
bounded by its own turn count, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from mistral_ocr_pipeline_spark.functions.text_functions import norm_key_col


def transcript_integrity(df: DataFrame) -> DataFrame:
    """Per-conversation integrity audit.

    Returns one row per conv_id:

    * ``n_turns``            — raw row count;
    * ``n_idx``              — distinct turn_idx count;
    * ``dup_turns``          — rows sharing a turn_idx with another row
      (retry/ingest double-writes), ``n_turns − n_idx``;
    * ``has_gaps``           — the distinct indices do NOT form the
      contiguous range [min_idx, max_idx];
    * ``starts_at_zero``     — min(turn_idx) = 0;
    * ``role_repeats``       — adjacent turns (stable order: turn_idx,
      ts, role) carrying the SAME role — broken user/assistant
      alternation, the tool-loop smell;
    * ``ts_inversions``      — adjacent turns whose timestamp moves
      BACKWARD (clock skew / out-of-order ingest; NULL-safe: pairs with
      a NULL ts on either side don't count).

    One window + one groupBy, both keyed conv_id — a single exchange.
    """
    w = W.partitionBy("conv_id").orderBy("turn_idx", "ts", "role")
    stepped = df.select(
        "conv_id",
        "turn_idx",
        "role",
        "ts",
        (F.lag("role").over(w) == F.col("role")).alias("_rep"),
        (F.lag("ts").over(w) > F.col("ts")).alias("_inv"),
    )
    return stepped.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.countDistinct("turn_idx").alias("n_idx"),
        (F.count(F.lit(1)) - F.countDistinct("turn_idx")).alias("dup_turns"),
        (
            (F.max("turn_idx") - F.min("turn_idx") + 1)
            != F.countDistinct("turn_idx")
        ).alias("has_gaps"),
        (F.min("turn_idx") == F.lit(0)).alias("starts_at_zero"),
        F.sum(F.when(F.col("_rep"), 1).otherwise(0))
        .cast("long")
        .alias("role_repeats"),
        F.sum(F.when(F.col("_inv"), 1).otherwise(0))
        .cast("long")
        .alias("ts_inversions"),
    )


def transcript_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(conv_id, n_turns, fingerprint): md5 over the conversation's
    normalized turn texts concatenated in stable (turn_idx, text) order
    with an unprintable separator — the conversation-granularity exact-
    dedup key.  Normalization is the shared matching key
    (`norm_key_col`), so trivial re-ingest diffs (case, punctuation,
    whitespace) don't split a group; NULL text folds to ''.

    Order-insensitive aggregation + an explicit array_sort keeps the
    fingerprint partition-invariant (collect_list alone has no order
    guarantee)."""
    txt = F.coalesce(norm_key_col(F.col(text_col)), F.lit(""))
    per = df.select(
        "conv_id", F.struct(F.col("turn_idx"), txt.alias("t")).alias("e")
    )
    return per.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("e")), lambda s: s["t"]
                ),
                "\x1f",
            )
        ).alias("fingerprint"),
    )


def transcript_dedup_exact(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Conversation-level exact dedup: fingerprint groups, canonical =
    lowest conv_id per group.  Returns (conv_id, fingerprint, n_turns,
    group_size, is_canonical) — filter ``is_canonical`` to keep one
    session per re-ingested clone set.

    Two exchanges total: the conv_id groupBy inside
    `transcript_fingerprint`, then one fingerprint-keyed window over the
    CONVERSATION-sized (not turn-sized) relation."""
    fp = transcript_fingerprint(df, text_col)
    w = W.partitionBy("fingerprint")
    return fp.select(
        "conv_id",
        "fingerprint",
        "n_turns",
        F.count(F.lit(1)).over(w).alias("group_size"),
        (F.col("conv_id") == F.min("conv_id").over(w)).alias("is_canonical"),
    )
