"""Session windows that survive hot keys.

``F.session_window`` shuffles on the raw user key: one bot-like user with
10⁷ events pins a single task (the same Zipf argument as the conv_id
salting in plans/extract_pipeline.py).  ``salted_session_windows`` is the
two-phase fix:

* **Phase 1 — sessionize within (user, time-chunk).**  The time axis is
  cut into coarse chunks (``chunk_secs``, default 1 day) and the native
  ``session_window`` aggregation groups by (user, chunk): the shuffle key
  gains the chunk, so a hot user's events spread across one task per
  chunk — per-task input is bounded by (user's event rate × chunk
  duration) instead of the user's lifetime volume.
* **Phase 2 — merge boundary sessions.**  Sessions from adjacent chunks
  of the same user merge when the inter-session gap ≤ the session gap —
  gaps-and-islands (lag + cumulative sum) over per-user SESSION rows.
  This window does partition by the raw user, but it sees O(#sessions)
  rows (≤ a handful per chunk, since within-chunk sessions are separated
  by > gap), not O(#events): the bot with 10⁷ events/day contributes ONE
  session row per day to phase 2.

Equivalence to single-pass ``session_window`` (pinned by tests and the
``w8_event_session_windows`` value oracle): within a chunk the native
semantics apply verbatim; a session that would have spanned a chunk
boundary is split by phase 1 into pieces whose boundary gap is ≤ the
session gap, exactly the condition phase 2 merges on; transitive merges
across many chunks chain through the cumulative sum.  The boundary
convention matches ``session_window``'s empirically-pinned rule (an
exactly-``gap`` separation MERGES; a new session starts only when the
gap strictly exceeds it — see plans/entry_queries.py w8 oracle note).

Generalizes the reference's per-conversation re-sort semantics
(main.py:203-209) to event-time sessions at spam scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

MICROS = 1_000_000


def _micros(col: F.Column) -> F.Column:
    """Epoch micros for TIMESTAMP and TIMESTAMP_NTZ alike (unix_micros
    rejects NTZ; the cast is a no-op for tz-aware input, and for NTZ every
    operand gets the same session-tz interpretation, so gap arithmetic is
    unaffected — except across DST transitions of a non-UTC session tz,
    where the local-time axis folds.  The engine pins
    ``spark.sql.session.timeZone=UTC`` (session.get_spark), which has no
    DST; keep it pinned when sessionizing NTZ event time."""
    return F.unix_micros(col.cast("timestamp"))


def session_windows(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_secs: int = 1800,
) -> DataFrame:
    """Single-pass native sessionization — fine when no key is hot.
    Returns (user, session_start, session_last, n_events)."""
    return (
        df.groupBy(
            F.session_window(F.col(ts_col), f"{gap_secs} seconds").alias("sw"),
            F.col(user_col).alias("user"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(ts_col).alias("session_last"),
        )
        .select(
            "user",
            F.col("sw.start").alias("session_start"),
            "session_last",
            "n_events",
        )
    )


def salted_session_windows(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap_secs: int = 1800,
    chunk_secs: int = 86400,
) -> DataFrame:
    """Hot-key-safe sessionization (see module docstring).  Result is
    identical to ``session_windows``: (user, session_start, session_last,
    n_events).  ``chunk_secs`` must be ≥ ``gap_secs`` (a chunk shorter
    than the gap just adds merge work) and sets the per-task input bound:
    one task sees at most one user's events within one chunk."""
    if chunk_secs < gap_secs:
        raise ValueError(
            f"chunk_secs ({chunk_secs}) must be >= gap_secs ({gap_secs})"
        )
    chunked = df.withColumn(
        "_chunk",
        F.floor(_micros(F.col(ts_col)) / F.lit(chunk_secs * MICROS)),
    )
    # phase 1: shuffle key is (user, _chunk) — the hot user spreads
    per_chunk = (
        chunked.groupBy(
            F.session_window(F.col(ts_col), f"{gap_secs} seconds").alias("sw"),
            F.col(user_col).alias("user"),
            "_chunk",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max(ts_col).alias("s_last"),
        )
        .select("user", F.col("sw.start").alias("s_start"), "s_last", "n")
    )
    # phase 2: gaps-and-islands over session rows (O(#sessions) per user)
    w = W.partitionBy("user").orderBy("s_start")
    run = w.rowsBetween(W.unboundedPreceding, 0)
    merged = (
        per_chunk.withColumn("_prev_last", F.lag("s_last").over(w))
        .withColumn(
            "_new",
            (
                F.col("_prev_last").isNull()
                | (
                    _micros(F.col("s_start")) - _micros(F.col("_prev_last"))
                    > gap_secs * MICROS
                )
            ).cast("int"),
        )
        .withColumn("_sid", F.sum("_new").over(run))
        .groupBy("user", "_sid")
        .agg(
            F.min("s_start").alias("session_start"),
            F.max("s_last").alias("session_last"),
            F.sum("n").alias("n_events"),
        )
        .drop("_sid")
    )
    return merged.select("user", "session_start", "session_last", "n_events")
