"""Evaluation harness — the Spark re-expression of the reference's semantic
comparison job (post_processing/compare_results.py, 1276 LoC): fuzzy 1:1
matching of a human-review table against the engine output, per-field
semantic comparison, and accuracy rollups.

Field comparators (reference compare_results.py:490-787):
* ``exact``   — normalized-key equality (C3/C4 normalization);
* ``year``    — equality after the '.0'-strip (C11);
* ``set``     — Jaccard overlap of ';'-separated concept lists ≥ threshold
                counts as a match, with recall/precision reported (A9);
* ``text``    — normalized Levenshtein similarity ≥ threshold (C5-family;
                SQL-replayable, unlike difflib).

Rollups (reference compare_results.py:855-901,1261-1263): overall,
per-field, and per-row (per-paper) accuracy, each a mean over the
``sc >= 0`` field scores — unmatched rows enter at a flat 0.0 per field
(:807-818); only matched both-empty fields (the -1 sentinel, NULL here)
are excluded — one groupBy each, all Catalyst exprs."""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, functions as F

from mistral_ocr_pipeline_spark.functions.text_functions import (
    norm_key_col,
    strip_trailing_dot_zero,
)
from mistral_ocr_pipeline_spark.operators.fuzzy_join import (
    fuzzy_best_match,
    levenshtein_sim,
)


@dataclass
class FieldSpec:
    name: str  # column name present in both tables
    kind: str  # exact | year | set | text
    threshold: float = 0.6


def _field_score(l: Column, r: Column, spec: FieldSpec) -> Column:
    """Faithful to compare_results.py's MATCHED-row sentinel scheme
    (cmp_* at :496-597): BOTH sides empty → NULL (the reference's -1
    exclude-from-scoring sentinel — the only case that leaves the
    rollups); review empty but output present → 0.25 ('extra');
    review present but output empty → 0.0 ('missing'); otherwise 1.0/0.0
    by the kind's comparator.  'Empty' means null or whitespace-only,
    the reference's strip() falsiness.  UNMATCHED rows never reach these
    sentinels: `evaluate` overrides them to a flat 0.0 per field BEFORE
    this comparator (:807-818 scores `out is None` 0.0 unconditionally
    — even when the review side is itself empty, so the both-empty
    exclusion must not fire there).

    EXCEPTION — kind='year' follows cmp_year (:549-557), which checks raw
    equality BEFORE any empty test: the trailing-'.0' strip applies to
    the OUTPUT side only (review '1999.0' vs output '1999' is a 0.0
    mismatch), both-empty compares ''=='' and scores 1.0 — it ENTERS the
    rollups; cmp_year's -1 branch is unreachable — and there is no
    'extra' 0.25 branch (review-empty/output-present is 0.0)."""

    def empty(c: Column) -> Column:
        return c.isNull() | (F.trim(c.cast("string")) == "")

    if spec.kind == "year":
        lv = F.trim(F.coalesce(l.cast("string"), F.lit("")))
        rv = strip_trailing_dot_zero(F.trim(F.coalesce(r.cast("string"), F.lit(""))))
        return (lv == rv).cast("double")

    l_empty, r_empty = empty(l), empty(r)
    if spec.kind == "exact":
        hit = norm_key_col(l) == norm_key_col(r)
    elif spec.kind == "set":
        def to_set(c: Column) -> Column:
            # split on ';' FIRST (normalization strips punctuation incl. ';')
            return F.array_distinct(
                F.filter(
                    F.transform(F.split(c, ";"), lambda x: norm_key_col(x)),
                    lambda x: x != "",
                )
            )

        ls, rs = to_set(l), to_set(r)
        inter = F.size(F.array_intersect(ls, rs))
        union = F.size(F.array_union(ls, rs))
        hit = (union > 0) & (inter / union.cast("double") >= F.lit(spec.threshold))
    elif spec.kind == "text":
        hit = levenshtein_sim(l, r) >= F.lit(spec.threshold)
    else:
        raise ValueError(spec.kind)
    return (
        F.when(l_empty & r_empty, F.lit(None).cast("double"))
        .when(l_empty, F.lit(0.25))
        .when(r_empty, F.lit(0.0))
        .otherwise(F.coalesce(hit.cast("double"), F.lit(0.0)))
    )


def evaluate(
    review: DataFrame,
    output: DataFrame,
    review_id: str,
    output_id: str,
    match_title: tuple[str, str],
    fields: list[FieldSpec],
    match_threshold: float = 1.5,
    sequential: bool = False,
) -> dict[str, DataFrame]:
    """Returns {"scores", "per_field", "per_row", "overall"} DataFrames.

    Match stage = J2 fuzzy best-match (broadcast cross join + two-stage
    windows); unmatched review rows score a flat 0.0 on EVERY field
    (compare_results.py:807-818), enter every rollup, and surface in
    ``overall.n_unmatched``.  Rollups follow the reference's ``sc >= 0``
    rule (:855-895): ``per_field.accuracy`` and ``overall_accuracy`` are
    means over all non-excluded field scores — ``overall`` is the FLAT
    mean across (row, field) scores, not a mean of per-row means — and
    only matched both-empty fields (the -1 sentinel, here NULL) are
    excluded.  ``per_row.row_accuracy`` is the per-paper analog.

    ``sequential=True`` switches to the REFERENCE-PARITY greedy matcher
    (``fuzzy_best_match_sequential``): reviews processed in id order, a
    contested review falls back to its next-best unused output exactly as
    compare_results.py:87-119 — the two formulations differ only when
    two reviews share a best output.  The window form stays the default:
    it is the fully-distributed scale shape and what the value oracles
    replay."""
    if sequential:
        from mistral_ocr_pipeline_spark.operators.fuzzy_join import (
            fuzzy_best_match_sequential,
        )

        matches = fuzzy_best_match_sequential(
            review, output, review_id, output_id,
            title_cols=match_title, threshold=match_threshold,
        )
    else:
        matches = fuzzy_best_match(
            review, output, review_id, output_id,
            title_cols=match_title, threshold=match_threshold,
        )
    l = review.select(
        F.col(review_id).alias("left_id"),
        *[F.col(s.name).alias(f"l_{s.name}") for s in fields],
    )
    r = output.select(
        F.col(output_id).alias("right_id"),
        *[F.col(s.name).alias(f"r_{s.name}") for s in fields],
    )
    joined = matches.join(l, "left_id").join(r, "right_id", "left")
    unmatched = F.col("right_id").isNull()
    scores = joined.select(
        "left_id",
        "right_id",
        *[
            # :807-818 — an unmatched review row scores 0.0 on every
            # field UNCONDITIONALLY (the matched-row empty sentinels,
            # including the both-empty exclusion, must not apply)
            F.when(unmatched, F.lit(0.0))
            .otherwise(
                _field_score(F.col(f"l_{s.name}"), F.col(f"r_{s.name}"), s)
            )
            .alias(f"score_{s.name}")
            for s in fields
        ],
    )
    score_cols = [F.col(f"score_{s.name}") for s in fields]
    per_row = scores.select(
        "left_id",
        "right_id",
        F.round(
            F.aggregate(
                F.filter(F.array(*score_cols), lambda x: x.isNotNull()),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            / F.greatest(
                F.size(F.filter(F.array(*score_cols), lambda x: x.isNotNull())),
                F.lit(1),
            ),
            6,
        ).alias("row_accuracy"),
        (F.col("right_id").isNull()).alias("unmatched"),
    )
    per_field_rows = []
    for s in fields:
        per_field_rows.append(
            scores.select(
                F.lit(s.name).alias("field"),
                F.col(f"score_{s.name}").alias("score"),
            )
        )
    stacked = per_field_rows[0]
    for extra in per_field_rows[1:]:
        stacked = stacked.unionByName(extra)
    per_field = stacked.groupBy("field").agg(
        F.round(F.avg("score"), 6).alias("accuracy"),
        F.count("score").alias("n_scored"),
    )
    # the reference's overall (:861-864) is the FLAT mean over every
    # sc >= 0 (field, row) score — unmatched rows' zeros included —
    # which is exactly the stacked per-field frame's mean, NOT the mean
    # of per-row means (those weight rows equally regardless of how many
    # of their fields were excluded)
    counts = per_row.agg(
        F.sum(F.col("unmatched").cast("long")).alias("n_unmatched"),
        F.count(F.lit(1)).alias("n_review_rows"),
    )
    overall = (
        stacked.agg(F.round(F.avg("score"), 6).alias("overall_accuracy"))
        .crossJoin(counts)
    )
    return {
        "scores": scores,
        "per_row": per_row,
        "per_field": per_field,
        "overall": overall,
    }


def render_report(
    results: dict[str, DataFrame], title: str = "Evaluation report"
) -> str:
    """S12 — deterministic HTML report over the rollup DataFrames (the
    Spark analog of the reference's report generator,
    compare_results.py:856-1246: summary header, per-field accuracy
    table, per-paper rows with match status).

    Driver-side presentation only: every input is an already-aggregated
    rollup (one row, one row per field, one row per review paper), so the
    collects here are bounded by the review-set size — the cluster-side
    work all happened in ``evaluate``.  Output is deterministic (sorted
    rows, fixed formatting) so reports diff cleanly across runs."""
    import html as _html

    def esc(v) -> str:
        return _html.escape("" if v is None else str(v))

    overall = results["overall"].first()
    per_field = sorted(results["per_field"].collect(), key=lambda r: r.field)
    per_row = sorted(
        results["per_row"].collect(),
        key=lambda r: (r.left_id is None, r.left_id),
    )
    parts = [
        "<!DOCTYPE html><html><head><meta charset='utf-8'>",
        f"<title>{esc(title)}</title>",
        "<style>table{border-collapse:collapse}td,th{border:1px solid #999;"
        "padding:4px 8px}th{background:#eee}.miss{background:#fdd}</style>",
        "</head><body>",
        f"<h1>{esc(title)}</h1>",
        "<h2>Summary</h2><table>",
        f"<tr><th>overall accuracy</th><td>{esc(overall.overall_accuracy)}</td></tr>",
        f"<tr><th>review rows</th><td>{esc(overall.n_review_rows)}</td></tr>",
        f"<tr><th>unmatched</th><td>{esc(overall.n_unmatched)}</td></tr>",
        "</table>",
        "<h2>Per-field accuracy</h2>",
        "<table><tr><th>field</th><th>accuracy</th><th>scored</th></tr>",
    ]
    for r in per_field:
        parts.append(
            f"<tr><td>{esc(r.field)}</td><td>{esc(r.accuracy)}</td>"
            f"<td>{esc(r.n_scored)}</td></tr>"
        )
    parts.append("</table><h2>Per-paper</h2>")
    parts.append(
        "<table><tr><th>review id</th><th>matched output</th>"
        "<th>row accuracy</th></tr>"
    )
    for r in per_row:
        cls = " class='miss'" if r.unmatched else ""
        parts.append(
            f"<tr{cls}><td>{esc(r.left_id)}</td><td>{esc(r.right_id)}</td>"
            f"<td>{esc(r.row_accuracy)}</td></tr>"
        )
    parts.append("</table></body></html>")
    return "".join(parts)


@dataclass
class FieldValidationConfig:
    """Paired value/evidence columns (reference unstack_payloads.py:12-18)."""

    value_field: str
    sentence_field: str
    is_list: bool = True
    field_label: str = ""


def field_configs_from_schema(
    schema,
    sentence_suffix: str = "_sentence_from_text",
    label_overrides: dict[str, str] | None = None,
) -> list[FieldValidationConfig]:
    """Derive validation configs from a DataFrame SCHEMA by the reference's
    paired-field convention (unstack_payloads.py:41-99): every column
    ``X<suffix>`` with a sibling column ``X`` yields a config;
    ``is_list`` mirrors whether the value column is array-typed.  This is
    the schema-driven extension contract — add a column pair to the table
    and the validation pass picks it up with zero code changes."""
    from pyspark.sql import types as T

    label_overrides = label_overrides or {}
    names = {f.name: f for f in schema.fields}
    configs: list[FieldValidationConfig] = []
    for name, field in names.items():
        if not name.endswith(sentence_suffix):
            continue
        base = name[: -len(sentence_suffix)]
        if base not in names:
            continue
        configs.append(
            FieldValidationConfig(
                value_field=base,
                sentence_field=name,
                is_list=isinstance(names[base].dataType, T.ArrayType),
                field_label=label_overrides.get(base, base.lower()),
            )
        )
    return configs
