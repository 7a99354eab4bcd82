"""Ordered group-merge operators — A1–A4 in SURVEY.md §2.5.

The reference's single most load-bearing correctness contract: chunk rows
are sorted by start position, then folded with first-non-empty-wins scalar
merge, concat+stable-dedup list merge, and recursive struct merge
(reference main.py:203-216 + utils/utils.py:94-144, contract pinned by
tests/test_merge.py).  Spark expression: per-group ``collect_list(struct)``
→ ``array_sort`` → higher-order functions — all Catalyst built-ins with
partial aggregation; order never depends on shuffle arrival.

"Empty" (loses to data): NULL, ''/whitespace-only strings (reference
strips, utils/utils.py:95-96), empty arrays.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F


def _nonempty_scalar(v: Column) -> Column:
    """True iff v would win a merge slot (reference utils/utils.py:94-103)."""
    c = v.isNotNull()
    return c & (F.trim(v.cast("string")) != F.lit(""))


def first_nonempty_ordered(value: Column, order: Column) -> Column:
    """A2 as an aggregate expression: the first (by ``order``) non-empty
    value in the group; NULL if every candidate is empty.

    SQL-oracle equivalent (DuckDB):
    ``arg_min(v, ord) FILTER (WHERE v IS NOT NULL AND trim(v::varchar) != '')``
    """
    arr = F.array_sort(F.collect_list(F.struct(order.alias("o"), value.alias("v"))))
    kept = F.filter(arr, lambda s: _nonempty_scalar(s["v"]))
    # F.get is null-safe on empty arrays (ANSI mode makes element_at throw)
    return F.get(kept, 0)["v"]


def concat_dedup_ordered(value: Column, order: Column) -> Column:
    """A3 for scalar elements: per-group ordered concat with stable dedup
    (first occurrence kept).  ``array_distinct`` preserves first-occurrence
    order in Spark; ordering is pinned by the array_sort on (order, value).
    """
    arr = F.array_sort(F.collect_list(F.struct(order.alias("o"), value.alias("v"))))
    vals = F.transform(F.filter(arr, lambda s: _nonempty_scalar(s["v"])), lambda s: s["v"])
    return F.array_distinct(vals)


def merge_list_columns_ordered(value: Column, order: Column) -> Column:
    """A3 for array-typed columns: flatten group's arrays in turn order,
    stable dedup."""
    arr = F.array_sort(F.collect_list(F.struct(order.alias("o"), value.alias("v"))))
    flat = F.flatten(
        F.transform(F.filter(arr, lambda s: s["v"].isNotNull()), lambda s: s["v"])
    )
    return F.array_distinct(flat)


def _dedup_canonical(elems):
    if elems is None:
        return None
    seen, out = set(), []
    for e in elems:
        try:
            key = json.dumps(json.loads(e), sort_keys=True, ensure_ascii=False)
        except (TypeError, ValueError):
            key = e
        if key not in seen:
            seen.add(key)
            out.append(e)
    return out


def dedup_canonical_json(col) -> Column:
    """A3's canonical-JSON dedup for *dict-valued* elements: elements are
    JSON strings; equality is by sort_keys-canonicalized JSON (reference
    utils/utils.py:105-117 dedups dicts with permuted keys), first
    occurrence order kept.  Arrow-vectorized pandas UDF; the per-element
    loop is the same loop the reference runs per row.  (UDF is built at
    call time — pandas_udf registration needs an active session.)"""

    @F.pandas_udf("array<string>")
    def _udf(lists: pd.Series) -> pd.Series:
        return lists.map(_dedup_canonical)

    return _udf(col)


def merge_conversation(
    df: DataFrame,
    scalar_cols: list[str],
    list_cols: list[str] | None = None,
    group_col: str = "conv_id",
    order_col: str = "turn_idx",
) -> DataFrame:
    """A1: one merged row per conversation — ordered fold of per-turn values
    (the reference's per-document deep merge, main.py:203-216).

    Scalars: first non-empty by turn order.  Lists: ordered concat + stable
    dedup.  One shuffle on ``group_col`` with map-side partial aggregation.
    """
    ord_c = F.col(order_col)
    aggs = [
        first_nonempty_ordered(F.col(c), ord_c).alias(c) for c in scalar_cols
    ] + [
        merge_list_columns_ordered(F.col(c), ord_c).alias(c)
        for c in (list_cols or [])
    ]
    return df.groupBy(group_col).agg(*aggs)
