"""Incremental heavy-hitter summaries: bounds hold across micro-batches,
untruncated summaries stay exact, replays don't double-count."""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog
from mistral_ocr_pipeline_spark.streaming.summaries import (
    heavy_hitters_from_summary,
    merge_summary,
    run_incremental_heavy_hitters,
)

SCHEMA = "doc_id long, term string"


def _write(rows, path):
    pd.DataFrame(rows, columns=["doc_id", "term"]).to_parquet(path, index=False)


def _zipfish(start, stop):
    # value v appears roughly n/(v+1) times — a skewed stream slice
    return [(i, f"t{int((i * 7 + j) % 17) % 5}") for i in range(start, stop)
            for j in range(3)]


@pytest.mark.filterwarnings("ignore")
def test_incremental_bounds_and_exactness(spark, tmp_path):
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    wh = str(tmp_path / "wh")
    catalog = TableCatalog(spark, wh)

    all_rows = []
    for b, (lo, hi) in enumerate([(0, 40), (40, 90), (90, 120)]):
        rows = _zipfish(lo, hi)
        all_rows += rows
        _write(rows, input_dir / f"b{b}.parquet")
        run_incremental_heavy_hitters(
            spark, str(input_dir), SCHEMA,
            shard_expr="pmod(doc_id, 4)", value_expr="term",
            catalog=catalog, checkpoint_dir=ckpt, k=3,
        )
        topk = catalog.read("hh_topk")
        err = catalog.read("hh_err") if catalog.exists("hh_err") else (
            spark.createDataFrame([], "shard long, err long"))
        got = {r.value: (r.est_count, r.max_count)
               for r in heavy_hitters_from_summary(topk, err).collect()}
        exact = {}
        for d, t in all_rows:
            exact[t] = exact.get(t, 0) + 1
        for v, (est, mx) in got.items():
            assert est <= exact[v] <= mx, (b, v, est, exact[v], mx)
        assert topk.groupBy("shard").count().agg(F.max("count")).first()[0] <= 3

    # replay robustness: draining again with nothing new must not change
    # the summaries (and a re-run of the same checkpoint re-delivers no
    # batch, while a manual duplicate merge is blocked by lineage)
    before = sorted(map(tuple, catalog.read("hh_topk").collect()))
    run_incremental_heavy_hitters(
        spark, str(input_dir), SCHEMA,
        shard_expr="pmod(doc_id, 4)", value_expr="term",
        catalog=catalog, checkpoint_dir=ckpt, k=3,
    )
    assert sorted(map(tuple, catalog.read("hh_topk").collect())) == before


@pytest.mark.filterwarnings("ignore")
def test_untruncated_incremental_equals_oneshot(spark, tmp_path):
    # k larger than the distinct-value count → zero truncation → the
    # maintained summary IS the exact grouped count of everything seen
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    catalog = TableCatalog(spark, str(tmp_path / "wh"))
    rows1, rows2 = _zipfish(0, 50), _zipfish(50, 100)
    _write(rows1, input_dir / "b1.parquet")
    run_incremental_heavy_hitters(
        spark, str(input_dir), SCHEMA, "pmod(doc_id, 4)", "term",
        catalog, ckpt, k=32,
    )
    _write(rows2, input_dir / "b2.parquet")
    run_incremental_heavy_hitters(
        spark, str(input_dir), SCHEMA, "pmod(doc_id, 4)", "term",
        catalog, ckpt, k=32,
    )
    assert not catalog.exists("hh_err") or catalog.read("hh_err").count() == 0
    got = {r.value: r.est_count for r in heavy_hitters_from_summary(
        catalog.read("hh_topk"),
        spark.createDataFrame([], "shard long, err long"),
    ).collect()}
    exact = {}
    for _d, t in rows1 + rows2:
        exact[t] = exact.get(t, 0) + 1
    assert got == exact


def test_merge_summary_pure_frames(spark):
    a = spark.createDataFrame(
        [(0, "x"), (0, "x"), (0, "y"), (0, "z"), (1, "x")], "shard long, v string"
    )
    topk, err = merge_summary(None, None, a, "shard", "v", k=2)
    t = {(r.shard, r.value): r.c for r in topk.collect()}
    assert t[(0, "x")] == 2 and (0, "z") not in t     # z truncated at k=2
    e = {r.shard: r.err for r in err.collect()}
    assert e == {0: 1}                                # the dropped 3rd count
    # second batch resurfaces z: lower bound restarts from the new batch
    b = spark.createDataFrame([(0, "z")] * 5, "shard long, v string")
    topk2, err2 = merge_summary(topk, err, b, "shard", "v", k=2)
    t2 = {(r.shard, r.value): r.c for r in topk2.collect()}
    assert t2[(0, "z")] == 5                          # est ≤ true (6) ✓
    e2 = {r.shard: r.err for r in err2.collect()}
    assert e2[0] >= 1
