"""Port of the reference merge-semantics contract (tests/test_merge.py,
cases cited per line in SURVEY.md §5.1) to the engine's window+coalesce+
dedup operators — with input rows deliberately shuffled to prove the
result depends on turn order, not arrival order."""

import random

from pyspark.sql import functions as F, types as T

from mistral_ocr_pipeline_spark.operators.merge import (
    concat_dedup_ordered,
    dedup_canonical_json,
    merge_conversation,
)

SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType()),
        T.StructField("turn_idx", T.IntegerType()),
        T.StructField("val", T.StringType()),
        T.StructField("items", T.ArrayType(T.StringType())),
    ]
)


def _merged(spark, rows, shuffle_seed=99):
    rows = list(rows)
    random.Random(shuffle_seed).shuffle(rows)  # arrival order must not matter
    df = spark.createDataFrame(rows, SCHEMA).repartition(4)
    out = merge_conversation(df, scalar_cols=["val"], list_cols=["items"])
    return {r.conv_id: (r.val, r.items) for r in out.collect()}


class TestScalarMerge:
    def test_first_wins_on_conflict(self, spark):
        # reference test_merge.py:28-31
        got = _merged(spark, [("c", 0, "first", None), ("c", 1, "second", None)])
        assert got["c"][0] == "first"

    def test_empty_loses_to_data(self, spark):
        # reference test_merge.py:38-57 — None/""/whitespace lose
        got = _merged(
            spark,
            [("a", 0, None, None), ("a", 1, "win", None),
             ("b", 0, "", None), ("b", 1, "win", None),
             ("w", 0, "   ", None), ("w", 1, "win", None)],
        )
        for k in ("a", "b", "w"):
            assert got[k][0] == "win", k

    def test_both_empty_stays_null(self, spark):
        got = _merged(spark, [("n", 0, None, None), ("n", 1, "", None)])
        assert got["n"][0] is None

    def test_three_way_progressive(self, spark):
        # reference test_merge.py:126-138
        got = _merged(
            spark,
            [("p", 0, None, None), ("p", 1, "", None), ("p", 2, "third", None),
             ("p", 3, "fourth", None)],
        )
        assert got["p"][0] == "third"


class TestListMerge:
    def test_concat_order_and_dedup(self, spark):
        # reference test_merge.py:65-83 — a+b concat, first occurrence kept
        got = _merged(
            spark,
            [("l", 0, None, ["x", "y"]), ("l", 1, None, ["y", "z", "x"]),
             ("l", 2, None, ["q"])],
        )
        assert got["l"][1] == ["x", "y", "z", "q"]

    def test_null_and_empty_lists(self, spark):
        got = _merged(
            spark, [("e", 0, None, None), ("e", 1, None, []), ("e", 2, None, ["a"])]
        )
        assert got["e"][1] == ["a"]

    def test_dict_elements_permuted_keys_dedup(self, spark):
        # reference test_merge.py:65-83 dict-in-list case: {'a':1,'b':2} ==
        # {'b':2,'a':1} under canonical-JSON identity
        df = spark.createDataFrame(
            [(["{\"a\": 1, \"b\": 2}", "{\"b\": 2, \"a\": 1}", "{\"a\": 1}"],)],
            "items: array<string>",
        )
        out = df.select(dedup_canonical_json("items").alias("d")).first().d
        assert out == ['{"a": 1, "b": 2}', '{"a": 1}']


class TestOrderedConcatDedupExpr:
    def test_scalar_concat_dedup(self, spark):
        df = spark.createDataFrame(
            [("g", 2, "b"), ("g", 0, "a"), ("g", 1, "b"), ("g", 3, "")],
            "conv_id string, turn_idx int, val string",
        ).repartition(3)
        out = (
            df.groupBy("conv_id")
            .agg(concat_dedup_ordered(F.col("val"), F.col("turn_idx")).alias("seq"))
            .first()
        )
        assert out.seq == ["a", "b"]
