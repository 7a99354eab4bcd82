"""Scalar function inventory (SURVEY.md §2.8, C1–C17) as Catalyst column
expressions — JVM-side, codegen'd, no Python in the hot path.

Every function documents its reference twin (file:line) and, where used by
the correctness harness, its exact DuckDB-SQL equivalent so the oracle can
replay it."""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# C2 — references-heading predicate (reference utils/utils.py:21-24)
REFERENCES_HEADING_PATTERN = r"(?im)^\s*(references?|bibliography|works\s+cited)\s*:?\s*$"

# C12/P5 — numeric-looking string (reference utils/utils.py:228-230)
NUMERIC_STRING_PATTERN = r"^\s*[+-]?(\d+(\.\d+)?|\.\d+)([eE][+-]?\d+)?\s*$"


def references_heading_col(c: Column) -> Column:
    """True iff the text contains a standalone references/bibliography
    heading line.  DuckDB: ``regexp_matches(c, pattern)`` (same RE2-safe
    pattern, inline (?im) flags)."""
    return c.rlike(REFERENCES_HEADING_PATTERN)


def is_numeric_string_col(c: Column) -> Column:
    """P5/P6 sink-cleanup predicate: numeric-looking string (a 'Journal'
    value of '12.0' is junk — reference utils/utils.py:307-327)."""
    return c.rlike(NUMERIC_STRING_PATTERN)


def normalize_plain_col(c: Column) -> Column:
    """Plain-payload extraction as a pure Catalyst expression — identical to
    extractors.textnorm.normalize_plain minus NFC (Spark has no builtin NFC;
    the UDF path applies it; for ASCII corpora the two coincide).
    DuckDB: ``trim(regexp_replace(c, '\\s+', ' ', 'g'))``."""
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def norm_key_col(c: Column) -> Column:
    """C3+C4 matching key: lower + punctuation strip + ws collapse
    (reference compare_results.py:32-37)."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(c), r"[^\w\s/\-]", ""), r"\s+", " "
        )
    )


def strip_trailing_dot_zero(c: Column) -> Column:
    """C11 — year strings like '2022.0' → '2022'
    (reference compare_results.py:95,551)."""
    return F.regexp_replace(c, r"\.0$", "")


def sha256_provenance(c: Column) -> Column:
    """C7/P3 — provenance hash of the source key (reference
    utils/utils.py:147-149 hashes the file name; function says sha1, does
    sha256).  DuckDB: ``sha256(c)``."""
    return F.sha2(c, 256)


def truncate_at_references(c: Column) -> Column:
    """S4 — stop processing at the references heading: everything before the
    first standalone references/bibliography line (the reference counts
    pages only up to that heading, utils/utils.py:78-91).
    DuckDB: ``regexp_split_to_array(c, pattern)[1]``."""
    return F.split(c, REFERENCES_HEADING_PATTERN).getItem(0)


# C14 — country alias canonicalization (reference compare_results.py:574-586)
COUNTRY_ALIASES = {
    "usa": "united states", "us": "united states", "u.s.": "united states",
    "uk": "united kingdom", "u.k.": "united kingdom",
    "deutschland": "germany", "holland": "netherlands",
}


def canonical_country(c: Column) -> Column:
    """Map-literal lookup with identity fallback.
    DuckDB: CASE/``map`` equivalent."""
    m = F.create_map(
        *[F.lit(x) for kv in COUNTRY_ALIASES.items() for x in kv]
    )
    key = F.lower(F.trim(c))
    return F.coalesce(m[key], key)
