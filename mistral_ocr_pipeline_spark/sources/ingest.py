"""Robust raw-text ingestion — the messy-format front door of the corpus.

Everything downstream (dedup, curation, extraction) assumes clean typed
columns; real crawl drops arrive as JSONL (often gzipped, often with a
fraction of truncated/garbage lines) and CSV.  These readers pin the
engine's ingest contract:

* **schema is explicit** — no sampling-based inference (inference reads
  the data twice and can flip types between daily drops; a drifted drop
  should surface as nulls/corrupt counts, not as a silently different
  schema);
* **corrupt lines are DATA, not crashes** — PERMISSIVE parsing captures
  the raw line in a corrupt-record column; `split_corrupt` separates
  good rows from quarantine rows so a pipeline can land both (the
  quarantine table is the debugging artifact);
* **missing fields are nulls, extra fields are dropped** — the
  schema-align convention (`operators.schema_align`) applied at the
  source.

JSONL parses via ``text`` + ``from_json`` so the corrupt-record column
is a REGULAR column: Spark disallows corrupt-column queries on a raw
JSON/CSV scan (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN)
and the usual cache() workaround pins every ingested drop in executor
memory for the session's lifetime — a leak in a daily-drop loop.  CSV
cannot take that route (multiline quoted records span text() lines), so
``read_csv_documents`` caches its frame and the caller releases it with
``.unpersist()`` once the drop has landed.

Spark reads `.gz`/`.zst` transparently (codec from extension); gzip is
NOT splittable — one task per file — so at 100 TB the drop should
arrive as many files (it does: crawlers shard), and file-count is the
parallelism.  All JVM-side parsing, no UDF."""

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


def _with_corrupt(schema: T.StructType) -> T.StructType:
    # StructType.add MUTATES self — never .add() onto a shared schema
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
) -> DataFrame:
    """JSONL → DataFrame with ``schema``'s columns plus ``_corrupt_record``
    (null for clean rows, the raw line for unparseable ones).  PERMISSIVE:
    a bad line never kills the job; a clean line missing fields yields
    nulls; extra fields are ignored.  Parsed with ``from_json`` over a
    text scan, so the corrupt column is a plain column — filter it freely,
    no cache required (see module docstring).  Blank lines are skipped,
    matching the JSON reader."""
    full = _with_corrupt(schema)
    return (
        spark.read.text(path)
        .filter(F.trim("value") != "")
        .select(
            F.from_json(
                "value",
                full,
                {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
            ).alias("_p")
        )
        .select("_p.*")
    )


def split_corrupt(raw: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): clean rows lose the corrupt column; quarantine
    keeps only the raw line for the debugging table.  ``raw`` must carry
    the corrupt column as a REGULAR column (`read_jsonl` does by
    construction; `read_csv_documents` satisfies it by pinning its
    frame)."""
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
    newlines inside quotes; multiline parsing is not splittable per
    file, same remedy as gzip: many files).

    Multiline records rule out the text()+from_csv route, so this path
    keeps the CSV DataFrameReader and CACHES the frame (Spark disallows
    corrupt-column queries on the raw scan otherwise).  The pin is per
    drop and the caller RELEASES it — ``df.unpersist()`` after the
    clean/quarantine tables land — or a daily-drop loop accumulates
    every drop in executor storage."""
    full = _with_corrupt(schema)
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .option("header", str(header).lower())
        .option("multiLine", "true")
        .option("escape", '"')
        .csv(path)
        .cache()
    )
