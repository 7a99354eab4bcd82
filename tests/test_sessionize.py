"""Hot-key-safe sessionization (operators/sessionize.py): the salted
two-phase sessionizer must (a) equal single-pass F.session_window exactly,
including sessions straddling chunk boundaries, (b) spread a bot user's
events across (user, chunk) shuffle keys so per-task input is bounded by
chunk duration, not lifetime volume."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from mistral_ocr_pipeline_spark.operators.sessionize import (
    salted_session_windows,
    session_windows,
)

SCHEMA = "user_id long, ts timestamp"
T0 = datetime(2026, 1, 1, 0, 0, 0)


def _rows(user, offsets_secs):
    return [(user, T0 + timedelta(seconds=s)) for s in offsets_secs]


@pytest.fixture(scope="module")
def skewed(spark):
    """One bot (every 5 min for 5 days — one giant session) + a bursty
    user whose sessions straddle day boundaries + a quiet user."""
    rows = []
    rows += _rows(1, range(0, 5 * 86400, 300))  # bot: never a >30min gap
    # user 2: session crossing the day-1 boundary (23:50, 00:10 next day),
    # then a separate session well inside day 2
    rows += _rows(2, [86400 - 600, 86400 + 600, 86400 + 50000, 86400 + 50300])
    # user 3: two sessions inside one day, gap exactly 30min (must MERGE
    # per the empirically-pinned session_window convention)
    rows += _rows(3, [1000, 1000 + 1800, 20000])
    return spark.createDataFrame(rows, SCHEMA)


def _canon(df):
    return sorted(
        (r.user, r.session_start, r.session_last, r.n_events)
        for r in df.collect()
    )


class TestSaltedSessionEquivalence:
    def test_matches_single_pass_on_skewed_fixture(self, spark, skewed):
        plain = _canon(session_windows(skewed, "user_id", "ts", gap_secs=1800))
        salted = _canon(
            salted_session_windows(
                skewed, "user_id", "ts", gap_secs=1800, chunk_secs=86400
            )
        )
        assert salted == plain
        # the bot's 5-day ping stream is ONE session end-to-end: the
        # boundary merge must chain transitively across all 5 chunks
        bot = [s for s in salted if s[0] == 1]
        assert len(bot) == 1 and bot[0][3] == 5 * 86400 // 300

    def test_boundary_straddle_and_exact_gap_merge(self, spark, skewed):
        out = _canon(
            salted_session_windows(
                skewed, "user_id", "ts", gap_secs=1800, chunk_secs=86400
            )
        )
        # user 2: the 23:50+00:10 pair is one session despite the chunk cut
        u2 = [s for s in out if s[0] == 2]
        assert [s[3] for s in u2] == [2, 2]
        # user 3: an exactly-30-minute gap merges (strict-> convention)
        u3 = [s for s in out if s[0] == 3]
        assert [s[3] for s in u3] == [2, 1]

    def test_tiny_chunks_still_exact(self, spark, skewed):
        """chunk == gap (the minimum): every session fragments maximally,
        the merge must still reassemble exactly."""
        plain = _canon(session_windows(skewed, "user_id", "ts", gap_secs=1800))
        salted = _canon(
            salted_session_windows(
                skewed, "user_id", "ts", gap_secs=1800, chunk_secs=1800
            )
        )
        assert salted == plain

    def test_chunk_below_gap_rejected(self, spark, skewed):
        with pytest.raises(ValueError):
            salted_session_windows(
                skewed, "user_id", "ts", gap_secs=1800, chunk_secs=60
            )


class TestSaltedSessionPlan:
    def test_phase1_shuffle_key_includes_chunk(self, spark, skewed):
        """The bounded-input guarantee lives in the plan: phase 1's
        exchange must hash-partition on (user, _chunk) — NOT the raw user
        key — so one hot user occupies one task per chunk, and the raw-
        user window phase only ever sees per-session rows."""
        df = salted_session_windows(
            skewed, "user_id", "ts", gap_secs=1800, chunk_secs=86400
        )
        plan = df._jdf.queryExecution().executedPlan().toString()
        import re

        exchanges = re.findall(r"hashpartitioning\(([^)]*)\)", plan)
        assert any("_chunk" in e and "user" in e for e in exchanges), plan


class TestSaltedSessionProperty:
    def test_random_event_sets_agree_with_single_pass(self, spark):
        """Property check: for seeded random event sets (several users,
        dense and sparse regions, duplicate timestamps, chunk-boundary
        neighbors), the salted two-phase result equals single-pass
        session_window exactly — across three chunk sizes."""
        import random

        rng = random.Random(1234)
        rows = []
        for user in range(4):
            t = 0
            for _ in range(rng.randint(30, 120)):
                # mix of short gaps (in-session), exact-gap (merge), and
                # long gaps (new session); occasional duplicate ts
                t += rng.choice([1, 60, 300, 1800, 1801, 5400, 0])
                rows.append((user, T0 + timedelta(seconds=t)))
        df = spark.createDataFrame(rows, SCHEMA)
        plain = _canon(session_windows(df, "user_id", "ts", gap_secs=1800))
        for chunk in (1800, 7200, 86400):
            salted = _canon(
                salted_session_windows(
                    df, "user_id", "ts", gap_secs=1800, chunk_secs=chunk
                )
            )
            assert salted == plain, f"chunk={chunk}"

    def test_boundary_gap_epsilon_200_seeds(self, spark):
        """Contested-boundary property (round-3 verdict item 7): 200
        random seeds, each generating events that cluster AROUND a chunk
        boundary with inter-event gaps of exactly gap-ε / gap / gap+ε
        (ε=1s) — the exact-gap-merges vs strictly-greater-splits edge,
        placed where phase 1 cuts and phase 2 must re-merge.  Users are
        independent under sessionization, so each seed rides as its own
        user and ONE salted-vs-single-pass comparison per chunk size
        covers all 200 within CI budget."""
        import random

        gap = 1800
        chunk = 7200
        rows = []
        for seed in range(200):
            rng = random.Random(seed)
            # start so that the event walk crosses a chunk boundary mid-run
            t = chunk * rng.randint(1, 3) - rng.randint(0, 2 * gap)
            for _ in range(rng.randint(8, 20)):
                t += rng.choice([0, 1, gap - 1, gap, gap + 1])
                rows.append((seed, T0 + timedelta(seconds=t)))
        df = spark.createDataFrame(rows, SCHEMA)
        plain = _canon(session_windows(df, "user_id", "ts", gap_secs=gap))
        for c in (chunk, gap):  # chunk = gap is the worst case: every cut contested
            salted = _canon(
                salted_session_windows(
                    df, "user_id", "ts", gap_secs=gap, chunk_secs=c
                )
            )
            assert salted == plain, f"chunk={c}"
