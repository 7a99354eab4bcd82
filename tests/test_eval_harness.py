"""Evaluation harness: fuzzy match + field comparators + rollups, on the
FIXTURES.md §5 shape (title/year/journal perturbations, '2022.0' years,
missing rows)."""

from mistral_ocr_pipeline_spark.operators.eval_harness import FieldSpec, evaluate


def test_evaluate_end_to_end(spark):
    review = spark.createDataFrame(
        [
            (1, "Anticoagulation outcomes in elderly patients", "2021",
             "apixaban;rivaroxaban", "prospective cohort"),
            (2, "Renal dosing of DOACs a cohort study", "2022",
             "dabigatran", "retrospective cohort"),
            (3, "A title that matches nothing in the output", "1999", "x", "y"),
        ],
        "rid long, title string, year string, drugs string, design string",
    )
    output = spark.createDataFrame(
        [
            (10, "anticoagulation OUTCOMES in elderly patients!", "2021.0",
             "rivaroxaban;apixaban", "Prospective Cohort!"),
            (20, "Renal dosing of doacs — a cohort study", "2022",
             "edoxaban", "case control"),
        ],
        "oid long, title string, year string, drugs string, design string",
    )
    res = evaluate(
        review, output, "rid", "oid",
        match_title=("title", "title"),
        fields=[
            FieldSpec("year", "year"),
            FieldSpec("drugs", "set", 0.5),
            FieldSpec("design", "text", 0.8),
        ],
    )
    scores = {r.left_id: r for r in res["scores"].collect()}
    assert scores[1].right_id == 10
    assert scores[1].score_year == 1.0        # 2021 == 2021.0 after strip
    assert scores[1].score_drugs == 1.0       # same set, different order
    assert scores[1].score_design == 1.0      # punctuation/case normalized
    assert scores[2].right_id == 20
    assert scores[2].score_drugs == 0.0       # disjoint sets
    assert scores[3].right_id is None         # unmatched → left outer

    per_field = {r.field: r for r in res["per_field"].collect()}
    # reference parity (compare_results.py:807-818 + the sc >= 0 rule):
    # an UNMATCHED review row scores 0.0 on every field and ENTERS the
    # accuracy — so year = (1 + 1 + 0)/3; only both-empty is excluded
    assert per_field["year"].accuracy == 0.666667
    assert per_field["year"].n_scored == 3
    assert per_field["drugs"].n_scored == 3

    overall = res["overall"].first()
    assert overall.n_review_rows == 3
    assert overall.n_unmatched == 1
    assert overall.overall_accuracy is not None


def test_evaluate_sequential_contested_fallback(spark):
    """evaluate(sequential=True) runs the REFERENCE-PARITY matcher: when
    two reviews share a best output, the later review falls back to its
    next-best unused output (the window default leaves it unmatched)."""
    review = spark.createDataFrame(
        [
            (1, "Deep learning for cats", "2020"),
            (2, "Deep learning for cats!", "2020"),  # contested with rid 1
        ],
        "rid long, title string, year string",
    )
    output = spark.createDataFrame(
        [
            (10, "Deep learning for cats", "2020"),
            (11, "Deep learning for cat", "2020"),
        ],
        "oid long, title string, year string",
    )
    kw = dict(
        review_id="rid", output_id="oid",
        match_title=("title", "title"),
        fields=[FieldSpec("year", "year")],
    )
    seq = {
        r.left_id: r.right_id
        for r in evaluate(review, output, sequential=True, **kw)["scores"].collect()
    }
    win = {
        r.left_id: r.right_id
        for r in evaluate(review, output, **kw)["scores"].collect()
    }
    assert seq == {1: 10, 2: 11}
    assert win == {1: 10, 2: None}
    ov = evaluate(review, output, sequential=True, **kw)["overall"].first()
    assert ov.n_unmatched == 0


def test_render_report_structure_and_determinism(spark):
    from mistral_ocr_pipeline_spark.operators.eval_harness import (
        FieldSpec,
        evaluate,
        render_report,
    )

    review = spark.createDataFrame(
        [(1, "alpha beta paper", "2021"), (2, "zzz qqq never matches", "1999")],
        "rid long, title string, year string",
    )
    output = spark.createDataFrame(
        [(10, "alpha beta paper!", "2021.0")], "oid long, title string, year string"
    )
    res = evaluate(
        review, output, "rid", "oid", ("title", "title"),
        [FieldSpec("year", "year")],
    )
    html1 = render_report(res, title="Smoke <report>")
    html2 = render_report(res, title="Smoke <report>")
    assert html1 == html2  # deterministic across renders
    assert "Smoke &lt;report&gt;" in html1  # titles are escaped
    assert "Per-field accuracy" in html1 and "Per-paper" in html1
    assert "class='miss'" in html1  # unmatched row is flagged
    assert html1.count("<tr") >= 6  # summary + field + 2 paper rows


def test_field_configs_derive_from_schema(spark):
    # the reference's paired-field convention (unstack_payloads.py): a
    # value column + its '<name>_sentence_from_text' twin auto-derive a
    # validation config; list-ness follows the value column's type
    from pyspark.sql import types as T

    from mistral_ocr_pipeline_spark.operators.eval_harness import (
        field_configs_from_schema,
    )

    schema = T.StructType(
        [
            T.StructField("Drugs", T.ArrayType(T.StringType())),
            T.StructField("Drugs_sentence_from_text", T.ArrayType(T.StringType())),
            T.StructField("Design", T.StringType()),
            T.StructField("Design_sentence_from_text", T.StringType()),
            T.StructField("orphan_sentence_from_text", T.StringType()),  # no base
            T.StructField("plain", T.StringType()),                      # no twin
        ]
    )
    cfgs = {c.value_field: c for c in field_configs_from_schema(schema)}
    assert set(cfgs) == {"Drugs", "Design"}
    assert cfgs["Drugs"].is_list is True
    assert cfgs["Design"].is_list is False
    assert cfgs["Drugs"].sentence_field == "Drugs_sentence_from_text"
    assert cfgs["Design"].field_label == "design"


def test_field_score_sentinels_reference_parity(spark):
    """The cmp_* sentinel scheme of compare_results.py:496-597, pinned on
    an 'exact' field: both-empty → excluded; review-empty/output-present
    → 0.25 'extra'; output-empty/review-present → 0.0 'missing'; plain
    mismatch → 0.0.  The 'year' field is the cmp_year EXCEPTION
    (:549-557): raw equality fires before any empty test with the '.0'
    strip on the OUTPUT side only — both-empty scores 1.0 and ENTERS the
    rollup, there is no 'extra' branch, and review '1999.0' vs output
    '1999' is a 0.0 mismatch."""
    review = spark.createDataFrame(
        [
            (1, "shared title alpha beta gamma", "2021", "v1"),
            (2, "shared title delta epsilon zeta", "", ""),
            (3, "shared title eta theta iota", "1999", "v3"),
            (4, "shared title kappa lambda mu", "", ""),
            (5, "shared title nu xi omicron", "2021", "v5"),
            (6, "shared title pi rho sigma", "1999.0", "v6"),
        ],
        "rid long, title string, year string, val string",
    )
    output = spark.createDataFrame(
        [
            (10, "shared title alpha beta gamma", "2021", "v1"),
            (20, "shared title delta epsilon zeta", "2022", "vx"),  # extra
            (30, "shared title eta theta iota", "   ", "   "),  # missing (ws)
            (40, "shared title kappa lambda mu", None, None),   # both empty
            (50, "shared title nu xi omicron", "2021.0", "v5"),  # out-side strip
            (60, "shared title pi rho sigma", "1999", "v6"),    # rv-side NO strip
        ],
        "oid long, title string, year string, val string",
    )
    res = evaluate(
        review, output, "rid", "oid", ("title", "title"),
        [FieldSpec("year", "year"), FieldSpec("val", "exact")],
    )
    rows = {r.left_id: r for r in res["scores"].collect()}
    # exact field: the full sentinel scheme
    assert rows[1].score_val == 1.0
    assert rows[2].score_val == 0.25   # 'extra'
    assert rows[3].score_val == 0.0    # 'missing'
    assert rows[4].score_val is None   # both_empty → the -1 exclusion
    # year field: cmp_year — equality first, output-side-only strip
    assert rows[1].score_year == 1.0
    assert rows[2].score_year == 0.0   # NO 'extra' branch for year
    assert rows[3].score_year == 0.0   # '1999' vs '' → mismatch
    assert rows[4].score_year == 1.0   # both-empty: '' == '' → exact
    assert rows[5].score_year == 1.0   # '2021' vs '2021.0' → strip → hit
    assert rows[6].score_year == 0.0   # '1999.0' vs '1999' → NO rv strip
    pf = {r.field: r for r in res["per_field"].collect()}
    assert pf["val"].n_scored == 5   # the both-empty row left the rollup
    assert pf["year"].n_scored == 6  # ...but ENTERS the year rollup
    assert pf["year"].accuracy == 0.5  # (1+0+0+1+1+0)/6


def test_unmatched_rows_score_zero_and_enter_flat_overall(spark):
    """Review-finding parity pins (compare_results.py:807-818 + :861-864):
    an UNMATCHED review row scores 0.0 on every field even when its own
    review-side value is empty (the matched-row both-empty exclusion must
    not fire), and overall_accuracy is the FLAT mean over all sc>=0
    (row, field) scores — unmatched zeros included."""
    review = spark.createDataFrame(
        [
            (1, "shared title alpha beta gamma", "2021"),
            (2, "completely different unmatched title", ""),  # empty year!
        ],
        "rid long, title string, year string",
    )
    output = spark.createDataFrame(
        [(10, "shared title alpha beta gamma", "2021")],
        "oid long, title string, year string",
    )
    res = evaluate(
        review, output, "rid", "oid", ("title", "title"),
        [FieldSpec("year", "year")],
    )
    got = {r.left_id: r for r in res["scores"].collect()}
    assert got[2].right_id is None
    assert got[2].score_year == 0.0      # NOT None: unmatched beats both-empty
    pf = res["per_field"].first()
    assert pf.n_scored == 2              # the unmatched zero is IN the rollup
    assert pf.accuracy == 0.5
    ov = res["overall"].first()
    assert ov.overall_accuracy == 0.5    # flat mean (1.0 + 0.0) / 2
    assert ov.n_unmatched == 1 and ov.n_review_rows == 2
