"""Continuous contract monitoring (`streaming/contract.py`): the
corpus-level verdict flips when a later batch tips a cap, the merged
facts equal a direct profile, replays are no-ops."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mistral_ocr_pipeline_spark.operators.profiling import (
    check_constraints,
    merge_profiles,
    profile_shards,
)
from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog
from mistral_ocr_pipeline_spark.streaming.contract import run_contract_monitor

SCHEMA = "doc_id long, text string"
# corpus null fraction must stay <= 20%
CONSTRAINTS = [
    ("text", "null_frac_micro", "le", 200000),
    ("doc_id", "null_frac_micro", "eq", 0),
]


def _batch(lo, hi, null_every):
    return [
        (i, None if (null_every and i % null_every == 0) else f"doc text {i}")
        for i in range(lo, hi)
    ]


def _write(rows, path):
    pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
        path, index=False
    )


@pytest.mark.filterwarnings("ignore")
def test_slow_null_leak_flips_corpus_verdict(spark, tmp_path):
    """Batch 1 is clean (passes); batch 2 is null-heavy — each batch
    ALONE would read 0% / 50%, but the monitor evaluates the CORPUS
    fraction, which crosses the 20% cap only once the leak lands."""
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    catalog = TableCatalog(spark, str(tmp_path / "wh"))

    rows1 = _batch(0, 60, null_every=0)
    _write(rows1, input_dir / "b0.parquet")
    run_contract_monitor(
        spark, str(input_dir), SCHEMA, catalog, ckpt, CONSTRAINTS
    )
    v1 = {
        (r.column, r.metric): r
        for r in catalog.read("contract_verdicts").collect()
    }
    assert v1[("text", "null_frac_micro")].passed
    assert v1[("text", "null_frac_micro")].observed == 0

    rows2 = _batch(60, 102, null_every=2)  # 21 nulls in 42 rows
    _write(rows2, input_dir / "b1.parquet")
    run_contract_monitor(
        spark, str(input_dir), SCHEMA, catalog, ckpt, CONSTRAINTS
    )
    v2 = {
        (r.column, r.metric): r
        for r in catalog.read("contract_verdicts").collect()
    }
    r = v2[("text", "null_frac_micro")]
    assert r.observed == (21 * 1000000) // 102 and not r.passed
    assert v2[("doc_id", "null_frac_micro")].passed

    # maintained shards fold to the direct profile of everything
    direct = profile_shards(
        spark.createDataFrame(rows1 + rows2, SCHEMA).withColumn("shard", F.lit("all"))
    )
    want = {
        (r.column,): (r.n_rows, r.n_null)
        for r in merge_profiles(direct).collect()
    }
    got = {
        (r.column,): (r.n_rows, r.n_null)
        for r in merge_profiles(catalog.read("contract_shards")).collect()
    }
    assert got == want

    # replay no-op: verdict unchanged, no new shards
    n_shards = catalog.read("contract_shards").count()
    run_contract_monitor(
        spark, str(input_dir), SCHEMA, catalog, ckpt, CONSTRAINTS
    )
    assert catalog.read("contract_shards").count() == n_shards
    assert not {
        (r.column, r.metric): r
        for r in catalog.read("contract_verdicts").collect()
    }[("text", "null_frac_micro")].passed


@pytest.mark.filterwarnings("ignore")
def test_exact_distinct_constraint_rejected_for_merged_form(spark, tmp_path):
    """The mergeable form cannot answer exact n_distinct; asking is a
    spec error at submission, not a silent estimate swap."""
    shards = profile_shards(
        spark.createDataFrame(_batch(0, 10, 0), SCHEMA).withColumn("shard", F.lit("s"))
    )
    merged = merge_profiles(shards)
    with pytest.raises(ValueError):
        check_constraints(merged, [("text", "n_distinct", "ge", 1)])
    out = {
        r.metric: r
        for r in check_constraints(
            merged, [("text", "est_distinct", "ge", 5)]
        ).collect()
    }
    assert out["est_distinct"].passed
