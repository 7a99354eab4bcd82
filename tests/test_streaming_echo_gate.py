"""Streaming echo gate (streaming/echo_gate.py): per-batch assistant
turns are echo-scored against the batch AND all conversation history
via the persisted gram index — including conversations whose turns
straddle batches; streamed scores equal the one-shot scorer over the
full input; the maintained index equals a raw rebuild; replays are
no-ops with lifecycle-scoped idempotence."""

import pytest

from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog
from mistral_ocr_pipeline_spark.streaming.echo_gate import (
    commit_echo_batch,
    run_echo_gate,
)

COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]

# conv c1 straddles both batches: turn 1 echoes turn 0 within batch 0;
# turn 3 echoes turn 0 ACROSS batches (only the index can see it)
B0 = [
    ("c1", 0, "user", "please repeat the magic words alpha beta gamma delta epsilon", None, None),
    ("c1", 1, "assistant", "the magic words alpha beta gamma delta epsilon", None, None),
]
B1 = [
    ("c1", 2, "user", "now say something original please", None, None),
    ("c1", 3, "assistant", "alpha beta gamma delta epsilon indeed", None, None),
    ("c2", 0, "user", "what is two plus two", None, None),
    ("c2", 1, "assistant", "two plus two equals four friend", None, None),
]


def _write(spark, rows, path):
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


def _df(spark, rows):
    from mistral_ocr_pipeline_spark.streaming.echo_gate import TURNS_DDL

    return spark.createDataFrame(rows, TURNS_DDL)


@pytest.mark.filterwarnings("ignore")
def test_cross_batch_scoring_oneshot_twin_and_index_parity(spark, tmp_path):
    from mistral_ocr_pipeline_spark.operators.transcript_qc import (
        build_echo_index,
        transcript_echo,
    )

    input_dir = tmp_path / "in"
    input_dir.mkdir()
    catalog = TableCatalog(spark, str(tmp_path / "wh"))
    ckpt = str(tmp_path / "ckpt")

    _write(spark, B0, input_dir / "b0.parquet")
    run_echo_gate(spark, str(input_dir), catalog, ckpt)
    s0 = {
        (r.conv_id, r.turn_idx): r
        for r in catalog.read("echo_scores").collect()
    }
    # within-batch echo: turn 1 restates turn 0 → every gram echoed
    assert s0[("c1", 1)].echo_fraction == 1.0 and s0[("c1", 1)].is_echo

    _write(spark, B1, input_dir / "b1.parquet")
    run_echo_gate(spark, str(input_dir), catalog, ckpt)

    scores = {
        (r.conv_id, r.turn_idx): r
        for r in catalog.read("echo_scores").collect()
    }
    # CROSS-batch echo: c1 turn 3's "alpha beta gamma delta epsilon" gram
    # only appears in batch 0's user turn — reachable through the index
    r3 = scores[("c1", 3)]
    assert (r3.n_grams, r3.n_echoed) == (2, 1) and r3.is_echo
    assert not scores[("c2", 1)].is_echo

    # one-shot twin: streamed scores (all batches) == transcript_echo
    # over the full raw input
    oneshot = {
        (r.conv_id, r.turn_idx): r
        for r in transcript_echo(_df(spark, B0 + B1)).collect()
    }
    assert set(scores) == set(oneshot)
    for key, row in scores.items():
        exp = oneshot[key]
        assert (
            row.n_grams,
            row.n_echoed,
            row.echo_fraction,
            row.is_echo,
        ) == (exp.n_grams, exp.n_echoed, exp.echo_fraction, exp.is_echo), key

    # maintained index ≡ raw rebuild (the lattice-merge guarantee)
    got = {
        (r.conv_id, r.g): r.first_turn
        for r in catalog.read("echo_index").collect()
    }
    exp = {
        (r.conv_id, r.g): r.first_turn
        for r in build_echo_index(_df(spark, B0 + B1)).collect()
    }
    assert got == exp

    # gate: flagged assistant turns are absent from the kept corpus,
    # everything else survives
    kept = {
        (r.conv_id, r.turn_idx)
        for r in catalog.read("echo_kept_turns").collect()
    }
    flagged = {k for k, r in scores.items() if r.is_echo}
    assert flagged == {("c1", 1), ("c1", 3)}
    assert kept == {(r[0], r[1]) for r in B0 + B1} - flagged


@pytest.mark.filterwarnings("ignore")
def test_replay_noop_and_lifecycle_namespace(spark, tmp_path):
    catalog = TableCatalog(spark, str(tmp_path / "wh"))
    batch = _df(spark, B0)

    assert commit_echo_batch(catalog, batch, 0, stream_id="life-1")
    counts = {
        t: catalog.read(t).count()
        for t in ("echo_kept_turns", "echo_scores", "echo_batches")
    }
    # same (stream, batch): no-op — all three appended tables unchanged
    assert not commit_echo_batch(catalog, batch, 0, stream_id="life-1")
    for t, n in counts.items():
        assert catalog.read(t).count() == n, t

    # a DIFFERENT stream lifecycle gets its own idempotence namespace
    assert commit_echo_batch(catalog, batch, 0, stream_id="life-2")
    assert catalog.read("echo_batches").count() == 2
