"""Streaming SFT gating: per-batch fused-facts curation + cross-batch
fingerprint dedup (first-arrival-wins), replay no-op, batch-twin
agreement with the one-shot gate — all under the single-atomic-commit
protocol."""

import pandas as pd
import pytest

from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog
from mistral_ocr_pipeline_spark.streaming.sft_gate import run_sft_gate

SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)
COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]


def _conv(conv_id, texts, roles=None):
    roles = roles or ["user", "assistant"] * len(texts)
    return [
        (conv_id, i, roles[i], t, None, None) for i, t in enumerate(texts)
    ]


def _write(rows, path):
    import pyarrow as pa
    import pyarrow.parquet as papq

    schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
            ("ts", pa.timestamp("us")),
        ]
    )
    papq.write_table(
        pa.Table.from_pylist([dict(zip(COLS, r)) for r in rows], schema=schema),
        path,
    )


@pytest.mark.filterwarnings("ignore")
def test_gate_dedup_and_replay(spark, tmp_path):
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    catalog = TableCatalog(spark, str(tmp_path / "wh"))

    good = _conv("a-good", ["hi there", "sure here is the answer"])
    refusal = _conv("b-refuse", ["hi", "I cannot help with that"])
    _write(good + refusal, input_dir / "b0.parquet")
    run_sft_gate(spark, str(input_dir), SCHEMA, catalog, ckpt)

    kept = {r.conv_id for r in catalog.read("sft_kept_turns").collect()}
    assert kept == {"a-good"}
    facts = {r.conv_id: r for r in catalog.read("sft_gate_facts").collect()}
    assert facts["a-good"].keep and not facts["b-refuse"].keep
    assert facts["b-refuse"].n_refusals == 1

    # batch 2: a RE-INGESTED clone of a-good (new conv_id, same content)
    # plus a genuinely new conversation — the clone must be dropped by
    # the cross-batch fingerprint leg even though per-batch facts alone
    # would keep it
    clone = _conv("z-clone", ["hi there", "sure here is the answer"])
    fresh = _conv("c-fresh", ["other question", "other answer"])
    _write(clone + fresh, input_dir / "b1.parquet")
    run_sft_gate(spark, str(input_dir), SCHEMA, catalog, ckpt)

    kept = {r.conv_id for r in catalog.read("sft_kept_turns").collect()}
    assert kept == {"a-good", "c-fresh"}
    facts = {r.conv_id: r for r in catalog.read("sft_gate_facts").collect()}
    assert not facts["z-clone"].keep and facts["c-fresh"].keep

    # batch-twin agreement: the streamed kept set equals the one-shot
    # gate over ALL input (the clone sorts after the original, so
    # first-arrival-wins and global min-conv_id agree by construction)
    from pyspark.sql import Window as W, functions as F

    from mistral_ocr_pipeline_spark.operators.transcript_qc import (
        transcript_conv_facts,
    )

    allturns = spark.createDataFrame(good + refusal + clone + fresh, SCHEMA)
    f = transcript_conv_facts(allturns)
    wfp = W.partitionBy("fingerprint")
    base = (
        ~F.col("has_gaps")
        & (F.col("dup_turns") == 0)
        & F.col("starts_at_zero")
        & (F.col("n_refusals") == 0)
        & (F.col("n_empty_assistant") == 0)
        & (F.col("n_assistant") > 0)
        & (F.col("tokens_trainable") > 0)
    )
    oneshot = {
        r.conv_id
        for r in f.withColumn("_b", base)
        .withColumn(
            "is_c",
            F.col("conv_id")
            == F.min(F.when(F.col("_b"), F.col("conv_id"))).over(wfp),
        )
        .filter(F.col("_b") & F.col("is_c"))
        .collect()
    }
    assert oneshot == kept

    # replay with the same checkpoint: drained → no growth
    n_turns = catalog.read("sft_kept_turns").count()
    n_lineage = catalog.read("sft_gate_lineage").count()
    run_sft_gate(spark, str(input_dir), SCHEMA, catalog, ckpt)
    assert catalog.read("sft_kept_turns").count() == n_turns
    assert catalog.read("sft_gate_lineage").count() == n_lineage


@pytest.mark.filterwarnings("ignore")
def test_within_batch_canonical_and_gap_drop(spark, tmp_path):
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    catalog = TableCatalog(spark, str(tmp_path / "wh"))

    # two identical convs in ONE batch -> min conv_id wins; a gapped
    # conv (turn 1 missing) is dropped
    a = _conv("m-one", ["q", "a"])
    b = _conv("m-two", ["q", "a"])
    gapped = [
        ("g-gap", 0, "user", "q", None, None),
        ("g-gap", 2, "assistant", "a", None, None),
    ]
    _write(a + b + gapped, input_dir / "b0.parquet")
    run_sft_gate(spark, str(input_dir), SCHEMA, catalog, ckpt)
    kept = {r.conv_id for r in catalog.read("sft_kept_turns").collect()}
    assert kept == {"m-one"}
    facts = {r.conv_id: r for r in catalog.read("sft_gate_facts").collect()}
    assert facts["g-gap"].has_gaps and not facts["g-gap"].keep
