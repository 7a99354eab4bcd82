"""Reference-parity tests for the J2 fuzzy matcher.

1. Sequential-greedy contested semantics: `fuzzy_best_match_sequential`
   must equal a pure-Python port of the reference loop
   (/root/reference/post_processing/compare_results.py:74-121) on a
   fixture where two reviews share the same best output — the contested
   review must fall back to its next-best UNUSED output.
2. Golden value-pin for the difflib window variant (the driver query
   `j2_fuzzy_difflib` is rows-only at the harness because difflib has no
   SQL twin): expected assignments computed with pure-Python
   SequenceMatcher over the same sf0.001 fixture, compared exactly.
"""

from __future__ import annotations

import re
from difflib import SequenceMatcher

import pytest
from pyspark.sql import functions as F

from mistral_ocr_pipeline_spark.operators.fuzzy_join import (
    fuzzy_best_match,
    fuzzy_best_match_sequential,
)

SF_DIR = "/root/testdata/sf0.001"


def _norm(s: str) -> str:
    """Python twin of functions.text_functions.norm_key_col (and of the
    reference's compare_results.py:32-37 norm)."""
    s = re.sub(r"[^\w\s/\-]", "", (s or "").lower())
    return re.sub(r"\s+", " ", s).strip()


def _sim(a: str, b: str) -> float:
    return SequenceMatcher(None, _norm(a), _norm(b)).ratio()


def _reference_match_rows(review: list[dict], output: list[dict]):
    """Pure-Python port of the reference's match_rows
    (compare_results.py:74-121): sequential over reviews, greedy over
    UNUSED outputs, strict `>` (earliest output index wins ties),
    empty-field gating, output-side-only '.0' year strip."""
    used: set[int] = set()
    pairs = []
    for rv in review:
        rv_title = rv.get("title", "").strip()
        rv_author = rv.get("author", "").strip()
        rv_year = rv.get("year", "").strip()
        rv_journal = rv.get("journal", "").strip()
        parts = rv_author.strip().split()
        rv_last = parts[-1].lower() if parts else ""

        best_score, best_idx = -1.0, -1
        for j, out in enumerate(output):
            if j in used:
                continue
            score = 0.0
            out_title = out.get("title", "").strip()
            out_year = re.sub(r"\.0$", "", out.get("year", "").strip())
            out_journal = out.get("journal", "").strip()
            if rv_title and out_title:
                score += _sim(rv_title, out_title) * 3.0
            if rv_year and out_year and rv_year == out_year:
                score += 1.0
            if rv_journal and out_journal:
                score += _sim(rv_journal, out_journal) * 1.0
            if rv_last and rv_last in _norm(out_title):
                score += 0.5
            if score > best_score:
                best_score = score
                best_idx = j
        if best_score >= 1.5 and best_idx >= 0:
            used.add(best_idx)
            pairs.append((rv["id"], output[best_idx]["id"]))
        else:
            pairs.append((rv["id"], None))
    return pairs


REVIEWS = [
    {"id": 1, "title": "Deep Learning for Cats", "year": "2020",
     "journal": "Nature", "author": "A. Smith"},
    # contested: same normalized best output as review 1 → must fall back
    {"id": 2, "title": "Deep Learning for Cats!", "year": "2020",
     "journal": "Nature", "author": "B. Jones"},
    {"id": 3, "title": "Quantum Widgets at Scale", "year": "2019",
     "journal": "Science", "author": "C. Lee"},
    # below threshold everywhere → unmatched
    {"id": 4, "title": "zzzzzz qqqq", "year": "", "journal": "", "author": ""},
]
OUTPUTS = [
    {"id": 10, "title": "Deep Learning for Cats", "year": "2020.0",
     "journal": "Nature"},
    {"id": 11, "title": "Deep Learning for Cat", "year": "2020",
     "journal": "Nature Communications"},
    {"id": 12, "title": "Quantum Widgets at Scale", "year": "2019",
     "journal": "Science"},
]


def test_sequential_matches_reference_loop_on_contested_fixture(spark):
    expected = _reference_match_rows(REVIEWS, OUTPUTS)
    # the fixture must actually exercise the contested fallback
    assert (2, 11) in expected, "fixture no longer contested — rebuild it"

    left = spark.createDataFrame(
        [(r["id"], r["title"], r["year"], r["journal"], r["author"])
         for r in REVIEWS],
        "lid int, title string, year string, journal string, author string",
    )
    right = spark.createDataFrame(
        [(o["id"], o["title"], o["year"], o["journal"]) for o in OUTPUTS],
        "rid int, title string, year string, journal string",
    )
    got = (
        fuzzy_best_match_sequential(
            left, right, "lid", "rid",
            title_cols=("title", "title"),
            year_cols=("year", "year"),
            journal_cols=("journal", "journal"),
            author_col="author",
            threshold=1.5,
            use_difflib=True,
            reference_gates=True,
        )
        .orderBy("left_id")
        .collect()
    )
    assert [(r.left_id, r.right_id) for r in got] == expected


def test_window_variant_leaves_contested_left_unmatched(spark):
    """Documents the divergence the sequential variant fixes: the
    single-round window formulation leaves the contested review unmatched
    instead of falling back (this is the scale variant's known shape)."""
    left = spark.createDataFrame(
        [(r["id"], r["title"]) for r in REVIEWS[:2]], "lid int, title string"
    )
    right = spark.createDataFrame(
        [(o["id"], o["title"]) for o in OUTPUTS[:2]], "rid int, title string"
    )
    win = {
        r.left_id: r.right_id
        for r in fuzzy_best_match(
            left, right, "lid", "rid", title_cols=("title", "title"),
            threshold=1.5, use_difflib=True,
        ).collect()
    }
    seq = {
        r.left_id: r.right_id
        for r in fuzzy_best_match_sequential(
            left, right, "lid", "rid", title_cols=("title", "title"),
            threshold=1.5, use_difflib=True, reference_gates=True,
        ).collect()
    }
    assert win[1] == 10 and win[2] is None
    assert seq[1] == 10 and seq[2] == 11


def test_sequential_equals_window_when_uncontested(spark):
    """With disjoint best matches the two formulations agree."""
    left = spark.createDataFrame(
        [(1, "alpha particle"), (2, "beta decay"), (3, "gamma ray")],
        "lid int, title string",
    )
    right = spark.createDataFrame(
        [(10, "alpha particles"), (11, "beta decays"), (12, "gamma rays")],
        "rid int, title string",
    )
    kw = dict(title_cols=("title", "title"), threshold=1.5)
    win = sorted(
        (r.left_id, r.right_id)
        for r in fuzzy_best_match(left, right, "lid", "rid", **kw).collect()
    )
    seq = sorted(
        (r.left_id, r.right_id)
        for r in fuzzy_best_match_sequential(
            left, right, "lid", "rid", **kw
        ).collect()
    )
    assert win == seq == [(1, 10), (2, 11), (3, 12)]


def _window_model_difflib(lefts, rights, threshold=1.5):
    """Pure-Python model of fuzzy_best_match(use_difflib=True): score =
    round(3·ratio, 9); best per left (tie: lowest rid); per right keep the
    highest-score left (tie: lowest lid); threshold filter; left outer."""
    pairs = []
    for lid, lt in lefts:
        best = max(
            ((round(3.0 * SequenceMatcher(None, _norm(lt), _norm(rt)).ratio(), 9), rid)
             for rid, rt in rights),
            key=lambda t: (t[0], -t[1]),
        )
        pairs.append((lid, best[1], best[0]))
    claimed: dict[int, tuple] = {}
    for lid, rid, score in pairs:
        cur = claimed.get(rid)
        if cur is None or (score, -lid) > (cur[2], -cur[0]):
            claimed[rid] = (lid, rid, score)
    winners = {
        lid: (rid, score)
        for lid, rid, score in claimed.values()
        if score >= threshold
    }
    return {
        lid: winners.get(lid, (None, None)) for lid, _ in lefts
    }


def test_j2_fuzzy_difflib_golden_value_pin(spark):
    """Value-pins the rows-only driver query j2_fuzzy_difflib (VERDICT r3
    item 5): exact match against a pure-Python SequenceMatcher model over
    the same sf0.001 part fixture."""
    pytest.importorskip("pyarrow")
    part = spark.read.parquet(f"{SF_DIR}/part.parquet")
    lefts = [
        (r.p_partkey, r.p_name)
        for r in part.filter(F.col("p_partkey") % 29 == 1)
        .select("p_partkey", "p_name").collect()
    ]
    rights = [
        (r.p_partkey + 1000000, r.p_name.upper() + "!")
        for r in part.filter(F.col("p_partkey") % 5 == 0)
        .select("p_partkey", "p_name").collect()
    ]
    assert lefts and rights
    expected = _window_model_difflib(lefts, rights)

    from mistral_ocr_pipeline_spark.plans.entry_queries import QUERIES

    got = {
        r.left_id: (r.right_id, r.match_score)
        for r in QUERIES["j2_fuzzy_difflib"](spark, SF_DIR).collect()
    }
    assert got == expected
