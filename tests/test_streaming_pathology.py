"""Streaming pathology-fact maintenance: multi-batch drain equals the
one-shot rebuild (including a spin run that CROSSES the batch boundary),
replays are no-ops, and all three tables publish atomically."""

import pandas as pd
import pytest

from mistral_ocr_pipeline_spark.operators.transcript_qc import (
    transcript_pathology_facts,
)
from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog
from mistral_ocr_pipeline_spark.streaming.pathology import run_pathology_facts

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)
COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _write(rows, path):
    df = pd.DataFrame(rows, columns=COLS)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    df["tool"] = df["tool"].astype("string")  # all-None infers int32
    df["ts"] = pd.to_datetime(df["ts"]).astype("datetime64[us]")
    df.to_parquet(path, index=False)


def _rows_batch0():
    rows = []
    # conv a: history ends mid-spin — "call x" at turns 2,3,4
    for i, t in enumerate(["intro", "setup", "call x", "call x", "call x"]):
        rows.append(("a", i, "tool", t, None, None))
    # conv b: clean, complete in batch 0
    rows += [("b", 0, "user", "hi.", None, None),
             ("b", 1, "assistant", "hello!", None, None)]
    return rows


def _rows_batch1():
    # conv a continues the spin ACROSS the boundary, then closes
    return [
        ("a", 5, "tool", "call x", None, None),
        ("a", 6, "assistant", "done.", None, None),
        # conv c is brand new
        ("c", 0, "user", "dangling question", None, None),
    ]


@pytest.mark.filterwarnings("ignore")
def test_drain_equals_rebuild_and_replay_noop(spark, tmp_path):
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    catalog = TableCatalog(spark, str(tmp_path / "wh"))

    _write(_rows_batch0(), input_dir / "b0.parquet")
    run_pathology_facts(spark, str(input_dir), SCHEMA, catalog, ckpt)
    got0 = {r.conv_id: r for r in catalog.read("pathology_facts").collect()}
    # history alone: conv a's run is 3 repeats → 2 cyclic turns
    assert got0["a"].max_spin_run == 2
    assert not got0["b"].ends_midsentence

    _write(_rows_batch1(), input_dir / "b1.parquet")
    run_pathology_facts(spark, str(input_dir), SCHEMA, catalog, ckpt)
    got = {r.conv_id: r for r in catalog.read("pathology_facts").collect()}
    # the boundary-crossing spin: 4 repeats → 3 cyclic turns
    assert got["a"].max_spin_run == 3 and got["a"].is_spinning
    assert got["c"].ends_with_user and got["c"].ends_midsentence
    assert tuple(got["b"]) == tuple(got0["b"])  # untouched carry-over

    # maintained table ≡ one-shot rebuild over everything ingested
    all_rows = spark.createDataFrame(_rows_batch0() + _rows_batch1(), SCHEMA)
    rebuilt = sorted(map(tuple, transcript_pathology_facts(all_rows).collect()))
    assert sorted(map(tuple, catalog.read("pathology_facts").collect())) == rebuilt

    # replay with the same checkpoint: drained stream → no-op everywhere
    n_turns = catalog.read("pathology_turns").count()
    n_lineage = catalog.read("pathology_lineage").count()
    run_pathology_facts(spark, str(input_dir), SCHEMA, catalog, ckpt)
    assert catalog.read("pathology_turns").count() == n_turns
    assert catalog.read("pathology_lineage").count() == n_lineage
    assert sorted(map(tuple, catalog.read("pathology_facts").collect())) == rebuilt


@pytest.mark.filterwarnings("ignore")
def test_wiped_checkpoint_is_new_lifecycle(spark, tmp_path):
    """Recreating the checkpoint restarts batch ids at 0; the UUID-marker
    stream identity must treat those as NEW batches, so the same file
    ingests twice (duplicate turns — the caller's dedup problem, not a
    silent drop)."""
    import shutil

    input_dir = tmp_path / "in"
    input_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    catalog = TableCatalog(spark, str(tmp_path / "wh"))

    _write(_rows_batch0(), input_dir / "b0.parquet")
    run_pathology_facts(spark, str(input_dir), SCHEMA, catalog, ckpt)
    assert catalog.read("pathology_turns").count() == len(_rows_batch0())

    shutil.rmtree(ckpt)
    run_pathology_facts(spark, str(input_dir), SCHEMA, catalog, ckpt)
    assert catalog.read("pathology_turns").count() == 2 * len(_rows_batch0())
