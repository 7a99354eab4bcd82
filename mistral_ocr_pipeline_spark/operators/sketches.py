"""Mergeable sketches — cardinality estimation at warehouse scale.

``count(DISTINCT x)`` shuffles every distinct value; at 100 TB that is
the difference between a dashboard query and a cluster-wide sort.  The
HyperLogLog path shuffles fixed-size sketch buffers instead:

* ``approx_distinct``      — per-group estimate via ``hll_sketch_agg``
  (Apache DataSketches HLL, built into Spark): map-side partial sketches,
  one exchange of ~2^lgk-byte buffers per group, deterministic for a
  given input set (no RNG — order-insensitive hashing).
* ``approx_distinct_rollup`` — the mergeability story: per-shard sketch
  column → ``hll_union_agg`` rollup WITHOUT rescanning the data.  This is
  the pattern a lakehouse uses to keep per-partition sketch columns in a
  stats table and answer "distinct across any partition subset" from the
  stats alone.

Estimates are engine-specific (DuckDB's approx_count_distinct is a
different sketch), so the driver query checks them as a VERIFIED CLAIM:
it emits the exact count plus a boolean "estimate within tolerance",
both SQL-replayable — the oracle hash-match then certifies the sketch
landed inside its error envelope without pretending the estimate itself
is portable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def approx_distinct(
    df: DataFrame,
    group_cols: list[str],
    target_col: str,
    lgk: int = 12,
) -> DataFrame:
    """(group_cols…, approx_distinct) — HLL estimate per group.

    ``lgk`` trades sketch size (2^lgk bytes-ish) against error
    (~1.04/sqrt(2^lgk): lgk=12 → ~1.6% relative standard error)."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(target_col), F.lit(lgk))
        ).alias("approx_distinct")
    )


def approx_distinct_rollup(
    df: DataFrame,
    shard_col: str,
    group_cols: list[str],
    target_col: str,
    lgk: int = 12,
) -> DataFrame:
    """Two-level sketch rollup: build one sketch per (shard, group), then
    union sketches per group — the second level never touches the raw
    data, only the fixed-size buffers.  Returns (group_cols…,
    approx_distinct) identical to the one-level estimate (HLL union is
    lossless for same-lgk sketches), proving per-partition sketch columns
    can serve cross-partition distinct queries."""
    per_shard = df.groupBy(shard_col, *group_cols).agg(
        F.hll_sketch_agg(F.col(target_col), F.lit(lgk)).alias("_sk")
    )
    return per_shard.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("_sk"))).alias(
            "approx_distinct"
        )
    )


def _bloom_positions(key: F.Column, m: int, k: int) -> list[F.Column]:
    """k bit positions for a key — md5-derived (SQL-replayable; see
    dedup._md5_be_long) with ``m`` REQUIRED to be a power of two so the
    signed-long mask equals the unsigned mod both engines compute."""
    from mistral_ocr_pipeline_spark.operators.dedup import _md5_be_long

    assert m & (m - 1) == 0, "m must be a power of two"
    return [
        _md5_be_long(F.concat(key, F.lit(f":{i}"))).bitwiseAND(F.lit(m - 1))
        for i in range(k)
    ]


def bloom_build(
    keys: DataFrame, key_col: str, m: int = 1 << 16, k: int = 4
) -> DataFrame:
    """Build a Bloom filter as DATA: (word_idx, word) rows where word is
    the bit_or of 64-bit lanes — the same mergeable-summary shape as the
    HLL rollup (union two filters = union the rows, bit_or per word_idx;
    ``test_bloom_union_is_build_of_union`` pins it).  Size: ≤ m/64 rows
    regardless of key count, vs broadcasting the raw key set — the
    membership analog of a sketch column.  FPR ≈ (1 - e^(-k·n/m))^k;
    false negatives are impossible.  All Catalyst: explode k positions
    (flatMap) → one map-side-combined bit_or shuffle over ≤ m/64 groups."""
    pos = F.explode(F.array(*_bloom_positions(F.col(key_col), m, k))).alias("p")
    return (
        keys.select(pos)
        .select(
            F.shiftright("p", 6).alias("word_idx"),
            # shift amount is a column → expr (the python helper only
            # accepts literal ints)
            F.expr("shiftleft(cast(1 as bigint), cast(p & 63 as int))").alias("b"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("b").alias("word"))
    )


def bloom_probe(
    df: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """Distributed membership probe: explode each probe key's k positions,
    broadcast-join the (tiny) filter on word_idx, and AND the bit tests
    back per row — ``might_contain`` true iff every position's bit is
    set (a missing word row means that lane is all zeroes).  Adds a
    ``might_contain`` column; never drops rows.

    Scale paths: this join form needs no driver collect and works for
    any m.  When m/64 literals are acceptable (m ≤ ~2²⁰), collecting the
    words into a dense literal array turns the probe into a pure scan
    expression — zero shuffle, pushed below everything, which is exactly
    how Spark's own runtime bloom-filter joins consume theirs."""
    probe = df.select(
        F.col(key_col),
        F.posexplode(F.array(*_bloom_positions(F.col(key_col), m, k))).alias(
            "_i", "p"
        ),
    ).select(
        key_col,
        "_i",
        F.shiftright("p", 6).alias("word_idx"),
        F.expr("shiftleft(cast(1 as bigint), cast(p & 63 as int))").alias("_mask"),
    )
    hit = F.col("word").isNotNull() & (
        F.col("word").bitwiseAND(F.col("_mask")) != 0
    )
    per_key = (
        probe.join(F.broadcast(bloom), "word_idx", "left")
        .groupBy(key_col)
        .agg(F.bool_and(hit).alias("might_contain"))
    )
    return df.join(per_key, key_col, "left")


def bloom_words_dense(bloom: DataFrame, m: int) -> list[int]:
    """Collect a built filter into its dense m/64-long word list (zeros
    for absent rows) — the driver-side step that turns the summary into
    scan-expression literals.  One tiny action over ≤ m/64 rows."""
    dense = [0] * (m // 64)
    for r in bloom.collect():
        dense[int(r["word_idx"])] = int(r["word"])
    return dense


def bloom_might_contain_expr(
    key: F.Column, words: list[int], m: int, k: int
) -> F.Column:
    """Pure scan-expression membership test against dense word literals:
    zero joins, zero shuffles, pushed below everything — how Spark's own
    runtime bloom-filter join consumes its filter, exposed as a column
    you can drop into any scan-level ``filter``.  Bit masks come from a
    64-literal lookup array (the shift amount is a column, and the
    column API only shifts by literal ints)."""
    words_arr = F.array(*[F.lit(w).cast("long") for w in words])
    masks_arr = F.array(
        *[F.lit((1 << j) - (1 << 64 if j == 63 else 0)).cast("long") for j in range(64)]
    )
    test = F.lit(True)
    for p in _bloom_positions(key, m, k):
        word = F.element_at(words_arr, F.shiftright(p, 6).cast("int") + 1)
        mask = F.element_at(masks_arr, p.bitwiseAND(F.lit(63)).cast("int") + 1)
        test = test & (word.bitwiseAND(mask) != 0)
    return test


def heavy_hitters_rollup(
    df: DataFrame,
    shard_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """Approximate global heavy hitters from per-shard top-k summaries —
    the frequency twin of ``approx_distinct_rollup``: keep only each
    shard's ``k`` most frequent values (plus one scalar per shard, its
    (k+1)-th count, as the truncation bound) in a summary table, and
    answer "global top values" from the summaries alone with PROVABLE
    bounds, never rescanning the raw corpus.

    For a candidate value v:

    * ``est_count``  = Σ counts over shards whose top-k contains v — a
      certain LOWER bound (those counts are exact).
    * ``max_count``  = est_count + Σ over the OTHER shards of their
      (k+1)-th count — an upper bound, since v escaped those shards'
      top-k and so appears < err_s times in each.

    est ≤ true ≤ max always holds, and any value whose true count
    exceeds Σ_s err_s must appear as a candidate (it cannot miss every
    shard's top-k) — the SpaceSaving/Misra-Gries guarantee re-expressed
    relationally: every step is a Catalyst groupBy/window over the
    summary rows, deterministic for a content-derived ``shard_col``, so
    a SQL oracle replays it value-for-value (no sketch opacity).

    Scale shape: stage 1 is one map-side-combined shuffle of (shard,
    value) partials; everything after touches ≤ shards×k summary rows.
    At 100 TB the summary table is written once per ingest batch
    (mergeable: top-k of merged summaries re-truncates) and global
    top-k queries never touch the corpus again."""
    counts = df.groupBy(shard_col, value_col).agg(F.count(F.lit(1)).alias("c"))
    w = W.partitionBy(shard_col).orderBy(F.col("c").desc(), F.col(value_col).asc())
    ranked = counts.withColumn("_rn", F.row_number().over(w))
    kept = ranked.filter(F.col("_rn") <= k)
    errs = ranked.filter(F.col("_rn") == k + 1).select(
        F.col(shard_col), F.col("c").alias("_err")
    )
    total_err = errs.agg(F.coalesce(F.sum("_err"), F.lit(0)).alias("_total_err"))
    per_value = (
        kept.join(errs, shard_col, "left")
        .fillna(0, subset=["_err"])
        .groupBy(value_col)
        .agg(
            F.sum("c").alias("est_count"),
            F.sum("_err").alias("_covered_err"),
        )
    )
    return per_value.crossJoin(F.broadcast(total_err)).select(
        value_col,
        "est_count",
        (F.col("est_count") + F.col("_total_err") - F.col("_covered_err")).alias(
            "max_count"
        ),
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    w: int = 1 << 12,
    d: int = 4,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) as DATA:
    (row_idx, col_idx, c) cells where each key occurrence increments one
    cell per hash row — the frequency twin of `bloom_build`'s
    membership filter, completing the mergeable-summary family (HLL =
    distinct, Bloom = membership, CMS = point frequency, SpaceSaving =
    top-k).  Merge two sketches = union the rows and SUM per cell (the
    counters are linear), so per-shard/per-day sketches roll up exactly
    like the HLL rollup.

    Guarantees: estimates NEVER undercount; overcount ≤ e·N/w with
    probability 1 − e^(−d) (N = total stream weight).  Size: ≤ w·d cells
    regardless of key cardinality.

    Plan shape: the occurrence stream fans out ×``d`` (flatMap) and
    collapses map-side into ≤ w·d groups — one tiny shuffle, no
    vocabulary-sized state anywhere.  Positions are md5-derived with
    ``w`` a power of two (same scheme as `_bloom_positions`) so the
    whole sketch — build and probe — is SQL-replayable."""
    from mistral_ocr_pipeline_spark.operators.dedup import _md5_be_long

    assert w & (w - 1) == 0, "w must be a power of two"
    wt = (
        F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    )
    cells = df.select(
        wt.alias("_wt"),
        F.posexplode(
            F.array(
                *[
                    _md5_be_long(
                        F.concat(F.col(key_col), F.lit(f":{i}"))
                    ).bitwiseAND(F.lit(w - 1))
                    for i in range(d)
                ]
            )
        ).alias("row_idx", "col_idx"),
    )
    return cells.groupBy("row_idx", "col_idx").agg(F.sum("_wt").alias("c"))


def cms_estimate(
    df: DataFrame,
    key_col: str,
    cms: DataFrame,
    w: int = 1 << 12,
    d: int = 4,
) -> DataFrame:
    """Point-frequency estimate from a `cms_build` summary: each probe
    key's ``d`` cells are looked up through a broadcast join on
    (row_idx, col_idx) and the estimate is their MIN (a missing cell is
    an exact 0 → the key certainly never occurred).  Adds ``est_count``;
    never drops rows.  The sketch is ≤ w·d rows, so the join side always
    broadcasts; the probe stream shuffles once on the key for the min."""
    from mistral_ocr_pipeline_spark.operators.dedup import _md5_be_long

    assert w & (w - 1) == 0, "w must be a power of two"
    probe = df.select(
        F.col(key_col),
        F.posexplode(
            F.array(
                *[
                    _md5_be_long(
                        F.concat(F.col(key_col), F.lit(f":{i}"))
                    ).bitwiseAND(F.lit(w - 1))
                    for i in range(d)
                ]
            )
        ).alias("row_idx", "col_idx"),
    )
    per_key = (
        probe.join(F.broadcast(cms), ["row_idx", "col_idx"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_count"))
    )
    return df.join(per_key, key_col, "left")


# --------------------------------------------------------------------------
# KMV (bottom-k / theta) distinct sketch — mergeable, cross-engine exact
# --------------------------------------------------------------------------
_KMV_SCALE = float(1 << 52)  # hash space size; 52-bit md5 prefix


def _kmv_hash(key: F.Column, salt: str) -> F.Column:
    """52-bit big-endian md5 prefix of ``salt || ':' || key`` as a long —
    exact DuckDB twin: ``('0x' || substring(md5(s), 1, 13))::UBIGINT``.
    52 bits keep the value exactly representable in a double, so the
    (k-1)/theta estimate is bit-identical across engines."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), key.cast("string"))), 1, 13
        ),
        16,
        10,
    ).cast("long")


def kmv_sketch(
    df: DataFrame, key_col: str, k: int = 256, salt: str = "kmv"
) -> DataFrame:
    """Bottom-k (KMV / theta) distinct sketch: the ``k`` smallest distinct
    52-bit hashes of ``key_col`` as rows ``(h: long)``.

    The 100 TB shape: the distinct collapses map-side (partial hash
    aggregate over 8-byte digests, never the raw values), and the ordered
    ``limit(k)`` is a TakeOrdered — each task forwards at most ``k``
    longs, so the driver merge is O(partitions · k), independent of
    corpus size.  Sketches are MERGEABLE by construction (bottom-k of a
    union of bottom-k sets == bottom-k of the union), so per-shard
    sketches stored in a stats table answer "distinct across any shard
    subset" without rescanning data — see ``kmv_merge`` and the
    union/intersection estimators below.  Unlike HLL the sketch content
    is deterministic and engine-portable (pure md5), so estimates —
    not just error-envelope claims — value-oracle across engines."""
    return (
        df.select(_kmv_hash(F.col(key_col), salt).alias("h"))
        .filter(F.col("h").isNotNull())
        .distinct()
        .orderBy("h")
        .limit(k)
    )


def kmv_merge(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    """Merge two KMV sketches (union of hash sets → bottom-k).  Exactly
    the sketch of the concatenated inputs — the mergeability law pinned
    by tests/test_ops.py."""
    return a.unionByName(b).distinct().orderBy("h").limit(k)


def kmv_estimate(sketch: DataFrame, k: int = 256) -> DataFrame:
    """1-row ``(n_sketch, kth_hash, est_distinct)`` from a KMV sketch.

    If the sketch holds fewer than ``k`` hashes it IS the distinct set
    (estimate exact); otherwise D ≈ (k-1)/theta with theta =
    kth_smallest / 2^52 — the classic KMV unbiased estimator (Bar-Yossef
    et al. 2002), relative error ~1/sqrt(k-2)."""
    return sketch.agg(
        F.count("h").alias("n_sketch"), F.max("h").alias("kth_hash")
    ).select(
        "n_sketch",
        "kth_hash",
        F.when(F.col("n_sketch") < k, F.col("n_sketch").cast("double"))
        .otherwise(
            F.lit(float(k - 1)) * F.lit(_KMV_SCALE) / F.col("kth_hash")
        )
        .alias("est_distinct"),
    )


def kmv_intersection(a: DataFrame, b: DataFrame, k: int = 256) -> DataFrame:
    """1-row union/intersection/Jaccard estimate from two KMV sketches —
    corpus-overlap measurement (train-vs-eval contamination rate,
    crawl-vs-crawl novelty) WITHOUT ever joining the corpora: only two
    k-row sketches meet.

    K = bottom-k of the union of the two hash sets; |A∪B| est from K's
    kth hash; ρ = fraction of K present in BOTH sketches estimates
    Jaccard; |A∩B| ≈ ρ · |A∪B| (Beyer et al. 2007).  All driver-free:
    the sketches broadcast, the memberships are two tiny joins."""
    union = kmv_merge(a, b, k)
    in_both = (
        union.join(a.select(F.col("h").alias("h")), "h")
        .join(b.select(F.col("h").alias("h")), "h")
        .agg(F.count("h").alias("in_both"))
    )
    stats = union.agg(
        F.count("h").alias("n_union_sketch"), F.max("h").alias("kth_hash")
    )
    uest = F.when(
        F.col("n_union_sketch") < k, F.col("n_union_sketch").cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(_KMV_SCALE) / F.col("kth_hash"))
    return (
        stats.crossJoin(F.broadcast(in_both))
        .select(
            "n_union_sketch",
            "kth_hash",
            "in_both",
            uest.alias("union_est"),
            (F.col("in_both") * uest / F.col("n_union_sketch")).alias(
                "inter_est"
            ),
            (
                F.col("in_both").cast("double") / F.col("n_union_sketch")
            ).alias("jaccard_est"),
        )
    )
