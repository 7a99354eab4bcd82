"""Streaming session windows: merge-within-gap, append-once finalization,
and agreement with the batch gaps-and-islands twin on finalized sessions."""

from datetime import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mistral_ocr_pipeline_spark.streaming.session import run_session_drain


def _write_events(rows, path):
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pdf.to_parquet(path, index=False)


def _ev(i, hhmm, user=7):
    return (i, f"2024-01-01 {hhmm}:00", user, "click", 1.0, None)


@pytest.mark.filterwarnings("ignore")
def test_sessions_merge_finalize_once_and_agree_with_batch(spark, tmp_path):
    input_dir = tmp_path / "se_in"
    input_dir.mkdir()
    out = str(tmp_path / "se_out")
    ckpt = str(tmp_path / "se_ckpt")

    # user 7: events 10:00, 10:20, 10:45 → ONE session (gaps ≤ 30m merge);
    # user 8: 10:00 only.  Event at 13:00 pushes the watermark far past
    # both sessions' ends, so both finalize in this drain.
    _write_events(
        [
            _ev(0, "10:00"),
            _ev(1, "10:20"),
            _ev(2, "10:45"),
            _ev(3, "10:00", user=8),
            _ev(4, "13:00", user=9),
        ],
        input_dir / "b1.parquet",
    )
    run_session_drain(spark, str(input_dir), out, ckpt)
    got1 = {
        (r.user_id, r.session_start): r.n_events
        for r in spark.read.parquet(out).collect()
    }
    t10 = datetime(2024, 1, 1, 10)
    assert got1 == {(7, t10): 3, (8, t10): 1}  # user 9 still open

    # batch 2: a LATE event for user 7 at 10:50 (session already emitted,
    # watermark far ahead) must be dropped — append-once holds; a fresh
    # event at 15:00 closes user 9's 13:00 session
    _write_events(
        [_ev(5, "10:50"), _ev(6, "15:00", user=9)],
        input_dir / "b2.parquet",
    )
    run_session_drain(spark, str(input_dir), out, ckpt)
    rows = spark.read.parquet(out).collect()
    u7 = [r for r in rows if r.user_id == 7]
    assert len(u7) == 1 and u7[0].n_events == 3  # not reopened, not duplicated
    u9 = {r.session_start: r.n_events for r in rows if r.user_id == 9}
    assert u9 == {datetime(2024, 1, 1, 13): 1}

    # finalized sessions agree with the batch gaps-and-islands twin
    # (w8 semantics) computed over the same finalized-horizon events
    batch_src = spark.read.parquet(str(input_dir)).filter(
        F.col("ts") < F.lit("2024-01-01 14:00:00")  # the finalized horizon
    ).filter(F.col("event_id") != 5)  # the dropped late event
    w = (
        batch_src.groupBy(
            F.session_window("ts", "30 minutes").alias("sw"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n_events"), F.min("ts").alias("session_start"))
        .select("user_id", "session_start", "n_events")
    )
    batch = {(r.user_id, r.session_start): r.n_events for r in w.collect()}
    streamed = {
        (r.user_id, r.session_start): r.n_events
        for r in spark.read.parquet(out).collect()
    }
    assert streamed == batch
