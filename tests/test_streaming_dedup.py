"""Streaming content dedup: first-arrival wins inside the watermark
horizon; state does not grow with stream length (a far-later re-arrival
re-emits)."""

import pandas as pd
import pytest

from mistral_ocr_pipeline_spark.streaming.dedup import run_dedup_drain


def _write(rows, path):
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["tool"] = pdf["tool"].astype("string")  # all-None would write null type
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pdf.to_parquet(path, index=False)


@pytest.mark.filterwarnings("ignore")
def test_dedup_within_watermark_and_reemit_after(spark, tmp_path):
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write(
        [
            ("a", 0, "u", "Same Content", None, "2024-01-01 10:00:00"),
            ("b", 0, "u", "same   content", None, "2024-01-01 10:10:00"),  # dup (norm key)
            ("c", 0, "u", "unique one", None, "2024-01-01 10:20:00"),
        ],
        input_dir / "b1.parquet",
    )
    run_dedup_drain(spark, str(input_dir), out, ckpt, watermark="1 hour")
    got1 = {r.conv_id for r in spark.read.parquet(out).collect()}
    assert got1 == {"a", "c"}  # first arrival of the dup pair wins

    # watermark eviction is batch-boundary-driven: first advance the
    # watermark past the horizon with fresh data (this drain evicts the
    # old keys' state at its end)...
    _write(
        [("e", 0, "u", "fresh text", None, "2024-01-04 09:00:00")],
        input_dir / "b2.parquet",
    )
    run_dedup_drain(spark, str(input_dir), out, ckpt, watermark="1 hour")
    assert {r.conv_id for r in spark.read.parquet(out).collect()} == {"a", "c", "e"}

    # ...then a re-arrival of the old content, far past the horizon,
    # re-emits: its key's state is gone — dedup state does not grow with
    # stream length
    _write(
        [("d", 0, "u", "same content", None, "2024-01-04 09:30:00")],
        input_dir / "b3.parquet",
    )
    run_dedup_drain(spark, str(input_dir), out, ckpt, watermark="1 hour")
    got = {r.conv_id for r in spark.read.parquet(out).collect()}
    assert got == {"a", "c", "d", "e"}
