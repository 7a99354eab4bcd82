"""Verdict application — the reference's LLM-validation write-back leg
(post_processing.py:155-202 `_apply_llm_result_to_row` and :309-315's
zip of results back onto rows): per-position support verdicts filter a
row's parallel value/sentence lists, and the surviving values are
reassembled IN ORDER into one row per document.

The reference does this driver-style (a pandas loc-loop applying each
result dict).  The engine twin is the classic zip-explode →
support-filter → ordered-collect dataflow: rows explode to (id, pos,
value, sentence), the verdict relation equi-joins on (id, pos), and an
``array_sort(collect_list(struct(pos, …)))`` rebuilds each row with
pair alignment preserved — `collect_list` alone has NO ordering
guarantee across a shuffle, so the position rides inside the struct and
the sort happens after aggregation (the same discipline as
`line_dedup`'s rebuild).

Reference guard semantics, kept faithfully:

* misaligned verdicts (a position with no verdict, or extra verdicts
  beyond the row's positions — the reference's ``len(values) !=
  len(supported)`` / result-``None`` skip) leave the row UNCHANGED;
* an all-unsupported row's value list becomes NULL (``filtered_values
  if filtered_values else None``);
* sentences are kept unchanged on aligned rows (NULL if empty — the
  ``sentences if sentences else None`` rule) and untouched on
  misaligned ones;
* a NULL ``supported`` element on an aligned row is falsy — the value
  drops (the reference keeps a value only on truthy ``ok``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def apply_verdicts(
    rows: DataFrame,
    verdicts: DataFrame,
    id_col: str = "doc_id",
    value_col: str = "values",
    sentence_col: str = "sentences",
    pos_col: str = "pos",
    supported_col: str = "supported",
) -> DataFrame:
    """List-field verdict application (cfg.is_list=True).

    ``rows``: one row per document with parallel array columns
    ``value_col`` / ``sentence_col``.  ``verdicts``: one row per
    (document, position) with a boolean ``supported_col``.  Returns the
    rows with ``<value_col>_clean`` (order-preserving filtered values,
    NULL when empty or when the input list was NULL) plus the original
    columns — one output row per input row.

    Plan: ONE generator (posexplode, map-side), one equi-join on
    (id, pos) — the verdict relation is usually tiny next to the corpus
    and AQE broadcasts it — and one groupBy(id) whose shuffle carries
    (pos, value, supported) structs, then the original rows join back by
    id to supply the unchanged-row fallback.  No driver loop, no
    per-row Python."""
    rid = F.col(id_col)
    exploded = rows.select(
        rid.alias("_id"),
        F.posexplode(F.col(value_col)).alias("_pos", "_val"),
    )
    v = verdicts.select(
        F.col(id_col).alias("_id"),
        F.col(pos_col).alias("_pos"),
        F.col(supported_col).alias("_sup"),
        F.lit(1).alias("_m"),
    )
    joined = exploded.join(v, ["_id", "_pos"], "left")
    re = joined.groupBy("_id").agg(
        F.transform(
            F.filter(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("_pos").alias("p"),
                            F.col("_val").alias("v"),
                            F.coalesce(F.col("_sup"), F.lit(False)).alias("s"),
                        )
                    )
                ),
                lambda s: s["s"],
            ),
            lambda s: s["v"],
        ).alias("_keep"),
        F.count("_m").alias("_n_matched"),
        F.count(F.lit(1)).alias("_n_pos"),
    )
    vtot = v.groupBy("_id").agg(F.count(F.lit(1)).alias("_v_tot"))
    n = F.size(F.col(value_col))
    aligned = (
        F.col(value_col).isNotNull()
        & (F.coalesce(F.col("_n_pos"), F.lit(0)) == n)
        & (F.coalesce(F.col("_n_matched"), F.lit(0)) == n)
        & (F.coalesce(F.col("_v_tot"), F.lit(0)) == n)
    )
    out = (
        rows.join(re, rid == F.col("_id"), "left")
        .drop("_id")
        .join(vtot, rid == F.col("_id"), "left")
        .drop("_id")
    )
    values_clean = F.when(
        aligned,
        F.when(F.size("_keep") > 0, F.col("_keep")).otherwise(
            F.lit(None).cast("array<string>")
        ),
    ).otherwise(F.col(value_col))
    sentences_out = F.when(
        aligned & (F.size(F.col(sentence_col)) == 0),
        F.lit(None).cast("array<string>"),
    ).otherwise(F.col(sentence_col))
    return out.select(
        rid,
        values_clean.alias(f"{value_col}_clean"),
        sentences_out.alias(sentence_col),
        aligned.alias("verdicts_aligned"),
    )


def apply_verdict_scalar(
    rows: DataFrame,
    verdicts: DataFrame,
    id_col: str = "doc_id",
    value_col: str = "value",
    supported_col: str = "supported",
) -> DataFrame:
    """Scalar-field verdict application (cfg.is_list=False,
    post_processing.py:193-202): the value is nulled unless its verdict
    is truthy; a missing verdict (result ``None``) leaves the row
    unchanged; the sentence column — and everything else — rides
    through untouched.  One broadcast-friendly equi-join."""
    v = verdicts.select(
        F.col(id_col).alias("_id"),
        F.col(supported_col).alias("_sup"),
        F.lit(1).alias("_m"),
    )
    out = rows.join(v, F.col(id_col) == F.col("_id"), "left").drop("_id")
    cleaned = F.when(
        F.col("_m").isNull(), F.col(value_col)  # no verdict: unchanged
    ).when(F.coalesce(F.col("_sup"), F.lit(False)), F.col(value_col))
    return out.select(
        *[c for c in rows.columns if c != value_col],
        cleaned.alias(value_col),
    )
