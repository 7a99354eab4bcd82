"""P7/X8 — gate/consistency post-processing as pure Catalyst expressions.

Faithful generalization of the reference's `_postprocess_row`
(reference main.py:114-159):

1. *Infer a missing gate from evidence*: the gate column counts as missing
   when null or its stripped string is one of ``"" / "None" / "nan"``; it
   is then set to ``"Yes"`` iff the outcomes column holds real data (same
   sentinel set, plus ``"[]"``), else ``"No"``.  A non-missing gate is
   left byte-identical (the reference does NOT strip it in place).
2. *Enforce consistency*: when the (stripped) final gate is ``"No"``,
   every dependent column is nulled.  The reference only assigns None when
   the dependent held real data — observationally identical to always
   nulling, since sentinel values compare equal to null downstream; we
   null unconditionally to keep the expression branch-free.

Everything is `when`/`otherwise` over string predicates — whole-stage
codegen, no UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_SENTINELS = ("", "None", "nan")


def _is_missing(c: Column) -> Column:
    """Null, or strips to one of the reference's empty sentinels."""
    return c.isNull() | F.trim(c.cast("string")).isin(*_SENTINELS)


def _is_empty_evidence(c: Column) -> Column:
    """Missing, or the stringified-empty-list sentinel (reference also
    treats a literal ``[]`` value as no evidence)."""
    return _is_missing(c) | (F.trim(c.cast("string")) == "[]")


def apply_gate_rules(
    df: DataFrame,
    gate_col: str,
    evidence_col: str,
    dependent_cols: tuple[str, ...],
) -> DataFrame:
    """Returns df with the gate inferred where missing and the dependent
    columns (evidence included, if listed) nulled when the gate is No."""
    gate = F.col(gate_col)
    inferred = F.when(
        _is_missing(gate),
        F.when(~_is_empty_evidence(F.col(evidence_col)), F.lit("Yes")).otherwise(
            F.lit("No")
        ),
    ).otherwise(gate)
    out = df.withColumn(gate_col, inferred)
    gate_is_no = F.trim(F.col(gate_col).cast("string")) == "No"
    for dep in dependent_cols:
        out = out.withColumn(
            dep, F.when(gate_is_no, F.lit(None).cast(df.schema[dep].dataType)).otherwise(F.col(dep))
        )
    return out
