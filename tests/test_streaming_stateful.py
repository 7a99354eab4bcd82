"""applyInPandasWithState: per-conversation running extraction progress,
with state surviving across AvailableNow runs via the checkpoint."""

import pandas as pd
import pytest

from mistral_ocr_pipeline_spark.fixtures.gen import gen_transcripts, transcripts_schema
from mistral_ocr_pipeline_spark.streaming.stateful import conversation_progress


def _write(rows, path):
    pdf = pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    pdf["ts"] = (
        pd.to_datetime(pdf["ts"], utc=True).dt.tz_localize(None).astype("datetime64[us]")
    )
    pdf.to_parquet(path, index=False)


@pytest.mark.filterwarnings("ignore")
def test_stateful_progress_across_runs(spark, tmp_path):
    input_dir = tmp_path / "in"
    input_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    rows = gen_transcripts(6, 8, seed=33, profile="unit")

    def run():
        collected: dict = {}

        def sink(batch_df, _bid):
            for r in batch_df.collect():
                collected[r.conv_id] = r

        stream = (
            spark.readStream.schema(transcripts_schema())
            .format("parquet")
            .option("path", str(input_dir))
            .load()
        )
        q = (
            conversation_progress(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return collected

    _write(rows[:24], input_dir / "p1.parquet")
    got1 = run()
    assert all(v.n_turns > 0 for v in got1.values())

    # second drain with the REMAINING turns: counts must be cumulative
    # (state restored from the checkpoint's state store)
    _write(rows[24:], input_dir / "p2.parquet")
    got2 = run()

    from collections import Counter, defaultdict
    expected_turns = Counter(r[0] for r in rows)
    expected_max = defaultdict(int)
    for r in rows:
        expected_max[r[0]] = max(expected_max[r[0]], r[1])
    for conv, exp_n in expected_turns.items():
        if conv in got2:  # only convs updated in batch 2 re-emit in update mode
            assert got2[conv].n_turns == exp_n, conv
            assert got2[conv].max_turn_idx == expected_max[conv]
    # every conv present in batch 2 must show CUMULATIVE counts > batch-2-only
    batch2_counts = Counter(r[0] for r in rows[24:])
    for conv, n2 in batch2_counts.items():
        if conv in got2 and expected_turns[conv] > n2:
            assert got2[conv].n_turns > n2
