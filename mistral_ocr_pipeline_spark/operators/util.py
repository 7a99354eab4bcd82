"""Shared operator utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin fan-out when the incoming partitioning is coarser than
    the cluster's parallelism.

    Small single-file scans arrive as ONE split; any compute-heavy operator
    downstream (minhash signatures, levenshtein cross joins, cosine
    kernels) would serialize on it.  At warehouse scale inputs already have
    many splits and this is a no-op — same adaptive rule as the extraction
    pipeline's salted repartition."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
