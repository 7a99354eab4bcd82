"""Deterministic sampling for training-data curation.

`df.sample()` is seed-dependent on partitioning (same seed, different
partition layout → different rows), which breaks reproducibility across
cluster sizes and resumed runs.  These operators sample on a CONTENT hash
instead: a row's fate depends only on its key, so the sample is identical
at local[8], on 1000 executors, and across re-runs — and replayable in
plain SQL (the md5-hex prefix comparison is lexicographic, no integer
conversion needed, so DuckDB/Trino/anything agrees byte-for-byte).

All pure Catalyst expressions: no UDF, no shuffle — sampling is a filter,
stratified fractions are one CASE chain, splits are one label projection.
Salting the key (``salt`` param) decorrelates different samples drawn from
the same corpus (sample A ∩ sample B behaves like independent draws).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_HEX_WIDTH = 8  # 32 bits of hash → fraction resolution 2^-32


def _hash_frac_hex(key: Column, salt: str) -> Column:
    """First 8 hex chars of md5(salt || key) — uniform in ['00000000',
    'ffffffff']; compare lexicographically against a threshold."""
    return F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, _HEX_WIDTH)


def _threshold_hex(fraction: float) -> str:
    t = min(max(int(round(fraction * (1 << 32))), 0), (1 << 32) - 1)
    return format(t, "08x")


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ≈``fraction`` of rows, chosen by content hash of ``key_col``.

    Deterministic across partitioning/cluster size/reruns; the filter is a
    scan-level predicate (no shuffle)."""
    return df.filter(
        _hash_frac_hex(F.col(key_col), salt) < F.lit(_threshold_hex(fraction))
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (`sampleBy`'s reproducible twin).

    ``fractions`` maps stratum value → keep fraction; unlisted strata get
    ``default_fraction``.  One CASE chain, evaluated at the scan."""
    threshold = F.lit(_threshold_hex(default_fraction))
    for value, frac in sorted(fractions.items()):
        threshold = F.when(
            F.col(strata_col) == value, F.lit(_threshold_hex(frac))
        ).otherwise(threshold)
    return df.filter(_hash_frac_hex(F.col(key_col), salt) < threshold)


def train_valid_test_split(
    df: DataFrame,
    key_col: str,
    weights: tuple[float, float, float] = (0.8, 0.1, 0.1),
    salt: str = "split",
) -> DataFrame:
    """Adds a ``split`` column ('train' | 'valid' | 'test') by content hash.

    A conversation keyed by conv_id lands in exactly one split on every
    engine and at every scale — the property random splits lose the moment
    data is repartitioned."""
    w_train, w_valid, w_test = weights
    total = w_train + w_valid + w_test
    t1 = _threshold_hex(w_train / total)
    t2 = _threshold_hex((w_train + w_valid) / total)
    h = _hash_frac_hex(F.col(key_col), salt)
    return df.withColumn(
        "split",
        F.when(h < F.lit(t1), "train").when(h < F.lit(t2), "valid").otherwise("test"),
    )
