"""Robust raw-text ingestion — the messy-format front door of the corpus.

Everything downstream (dedup, curation, extraction) assumes clean typed
columns; real crawl drops arrive as JSONL (often gzipped, often with a
fraction of truncated/garbage lines) and CSV.  These readers pin the
engine's ingest contract:

* **schema is explicit** — no sampling-based inference (inference reads
  the data twice and can flip types between daily drops; a drifted drop
  should surface as nulls/corrupt counts, not as a silently different
  schema);
* **corrupt lines are DATA, not crashes** — PERMISSIVE mode captures the
  raw line in a corrupt-record column; `split_corrupt` separates good
  rows from quarantine rows so a pipeline can land both (the quarantine
  table is the debugging artifact);
* **missing fields are nulls, extra fields are dropped** — the
  schema-align convention (`operators.schema_align`) applied at the
  source.

Spark reads `.gz`/`.zst` JSONL transparently (codec from extension);
gzip is NOT splittable — one task per file — so at 100 TB the drop
should arrive as many files (it does: crawlers shard), and file-count
is the parallelism.  All JVM-side parsing, no UDF."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

CORRUPT_COL = "_corrupt_record"

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
) -> DataFrame:
    """JSONL → DataFrame with ``schema``'s columns plus ``_corrupt_record``
    (null for clean rows, the raw line for unparseable ones).  PERMISSIVE:
    a bad line never kills the job; a clean line missing fields yields
    nulls; extra fields are ignored."""
    # StructType.add MUTATES self — never .add() onto a shared schema
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows lose the corrupt column; quarantine
    keeps only (raw line) for the debugging table.  Spark requires caching
    or a materialization barrier before filtering on the corrupt column of
    a JSON scan (SPARK-38926-style referential query on internal column) —
    the `cache` here is scoped to the split and tiny relative to a drop."""
    raw = raw.cache()
    clean = raw.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = raw.filter(F.col(CORRUPT_COL).isNotNull()).select(
        F.col(CORRUPT_COL).alias("raw_line")
    )
    return clean, quarantine


def read_csv_documents(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
    header: bool = True,
) -> DataFrame:
    """CSV twin of ``read_jsonl`` — same PERMISSIVE + corrupt-column
    contract, multiline quoting on (a text corpus WILL contain embedded
    newlines inside quotes; note multiline CSV parsing is not splittable
    per file, same remedy as gzip: many files)."""
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(path)
    )
