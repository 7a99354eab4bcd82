"""Event-time windowed streaming: watermark finalization, append-once
semantics, late-data drop — and agreement with the batch twin on the
finalized prefix."""

from datetime import datetime

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mistral_ocr_pipeline_spark.streaming.windowed import run_windowed_drain


def _write_events(rows, path):
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pdf.to_parquet(path, index=False)


def _ev(i, hhmm, typ, val=1.0):
    return (i, f"2024-01-01 {hhmm}:00", 7, typ, val, None)


@pytest.mark.filterwarnings("ignore")
def test_watermark_finalizes_append_once_and_drops_late(spark, tmp_path):
    input_dir = tmp_path / "ev_in"
    input_dir.mkdir()
    out = str(tmp_path / "ev_out")
    ckpt = str(tmp_path / "ev_ckpt")

    # batch 1: events in hours 10 and 11, max ts 11:40 → watermark 11:10;
    # the hour-10 window [10:00,11:00) is closed and must emit exactly once
    _write_events(
        [
            _ev(0, "10:05", "click", 2.0),
            _ev(1, "10:20", "click", 3.0),
            _ev(2, "10:45", "view", 5.0),
            _ev(3, "11:15", "click", 7.0),
            _ev(4, "11:40", "view", 11.0),
        ],
        input_dir / "b1.parquet",
    )
    run_windowed_drain(spark, str(input_dir), out, ckpt, watermark="30 minutes")
    got1 = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in spark.read.parquet(out).collect()
    }
    h10 = datetime(2024, 1, 1, 10)
    assert got1 == {
        (h10, "click"): (2, 5.0),
        (h10, "view"): (1, 5.0),
    }

    # batch 2: one event at 13:00 advances the watermark past hour 11;
    # one LATE event at 10:50 (behind the 11:10 watermark) must be dropped —
    # the already-emitted hour-10 rows cannot change in append mode
    _write_events(
        [
            _ev(5, "10:50", "click", 100.0),  # late beyond watermark → dropped
            _ev(6, "13:00", "view", 1.0),
        ],
        input_dir / "b2.parquet",
    )
    run_windowed_drain(spark, str(input_dir), out, ckpt, watermark="30 minutes")
    got2 = spark.read.parquet(out)
    h11 = datetime(2024, 1, 1, 11)
    hour10 = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in got2.filter(F.col("window_start") == h10).collect()
    }
    # unchanged: the late click did NOT reopen or duplicate the window
    assert hour10 == {(h10, "click"): (2, 5.0), (h10, "view"): (1, 5.0)}
    hour11 = {
        (r.window_start, r.event_type): (r.n, r.sum_value)
        for r in got2.filter(F.col("window_start") == h11).collect()
    }
    assert hour11 == {(h11, "click"): (1, 7.0), (h11, "view"): (1, 11.0)}


@pytest.mark.filterwarnings("ignore")
def test_streaming_matches_batch_twin_on_finalized_windows(spark, tmp_path):
    """The streaming aggregation and the batch twin agree exactly on every
    window the watermark finalized (the correctness contract that lets one
    logical plan serve both modes)."""
    input_dir = tmp_path / "ev_in2"
    input_dir.mkdir()
    rows = [
        _ev(i, f"{10 + (i * 7) % 4:02d}:{(i * 13) % 60:02d}", ["click", "view", "error"][i % 3], float(i))
        for i in range(40)
    ]
    _write_events(rows, input_dir / "all.parquet")
    out = str(tmp_path / "ev_out2")
    ckpt = str(tmp_path / "ev_ckpt2")
    run_windowed_drain(spark, str(input_dir), out, ckpt, watermark="10 minutes")

    streamed = spark.read.parquet(out)
    # batch twin: same agg without watermark, restricted to finalized windows
    src = spark.read.parquet(str(input_dir / "all.parquet"))
    max_ts = src.agg(F.max("ts")).first()[0]
    twin = (
        src.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4
            ).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
        .filter(
            F.col("window_end")
            <= F.lit(max_ts) - F.expr("INTERVAL 10 MINUTES")
        )
    )
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in twin.collect()}
    assert s == b and len(s) > 0


def test_hopping_windows_match_batch_twin(spark, tmp_path):
    """Hopping (1h window / 15min slide) streaming aggregation agrees with
    the w9 batch twin on finalized windows — each event lands in 4
    overlapping windows, and append mode emits each exactly once."""
    input_dir = tmp_path / "ev_in3"
    input_dir.mkdir()
    rows = [
        _ev(i, f"{10 + (i * 7) % 4:02d}:{(i * 13) % 60:02d}",
            ["click", "view"][i % 2], float(i))
        for i in range(40)
    ]
    _write_events(rows, input_dir / "all.parquet")
    out = str(tmp_path / "ev_out3")
    ckpt = str(tmp_path / "ev_ckpt3")
    run_windowed_drain(
        spark, str(input_dir), out, ckpt,
        watermark="10 minutes", slide="15 minutes",
    )

    streamed = spark.read.parquet(out)
    src = spark.read.parquet(str(input_dir / "all.parquet"))
    max_ts = src.agg(F.max("ts")).first()[0]
    twin = (
        src.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double"), 4
            ).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
        .filter(
            F.col("window_end") <= F.lit(max_ts) - F.expr("INTERVAL 10 MINUTES")
        )
    )
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in twin.collect()}
    assert s == b and len(s) > 0
    # an event contributes to 4 overlapping hops: total n across all
    # windows (finalized or not) would be 4x the events; on the finalized
    # prefix it is still strictly greater than the tumbling count
    assert sum(r.n for r in streamed.collect()) > 40
