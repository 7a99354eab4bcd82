"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship extraction pipeline (transcripts →
salted repartition → mapInPandas extraction → stable-ordering window) on
sf0.001.  ``queries()`` exposes every implemented operator from
SURVEY.md §2 (plus the training-data ops battery); ``oracle_sql()`` gives
the DuckDB twin for each SQL-expressible one — column names/types and
float rounding are aligned pair-wise in
``mistral_ocr_pipeline_spark/plans/entry_queries.py``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_ROOT = str(Path(__file__).resolve().parent)
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

from mistral_ocr_pipeline_spark.plans.entry_queries import (  # noqa: E402
    ORACLES,
    QUERIES,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["flagship_extract_plain"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return dict(ORACLES)
