"""P9 — schema-align projection + A4 struct merge (SURVEY.md §2.2/§2.5).

The reference's ``table_cast_like`` (utils/utils.py:254-288) aligns every
appended row batch to the first-seen schema: cast matching columns, add
missing columns as typed nulls, drop extras, coerce null-typed list
columns.  In Spark this is one ``select`` built from the target
StructType — Catalyst folds it into the scan/write, no data pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F, types as T


def align_to_schema(df: DataFrame, target: T.StructType) -> DataFrame:
    """Cast present columns, null-fill missing, drop extras — column order
    and types end exactly at ``target`` (Iceberg schema evolution's manual
    twin, kept for the plain-parquet catalog)."""
    present = {f.name: f for f in df.schema.fields}
    cols = []
    for field in target.fields:
        if field.name in present:
            cols.append(F.col(field.name).cast(field.dataType).alias(field.name))
        else:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
    return df.select(*cols)


def merge_struct_ordered(value: Column, order: Column, fields: list[str]) -> Column:
    """A4 — recursive struct merge: per-leaf first-non-empty over turn order
    (reference utils/utils.py:118-138, nested Mapping recursion).  Fixed
    StructType ⇒ the recursion flattens to one expression per leaf."""
    from mistral_ocr_pipeline_spark.operators.merge import first_nonempty_ordered

    return F.struct(
        *[
            first_nonempty_ordered(value[f], order).alias(f)
            for f in fields
        ]
    )
