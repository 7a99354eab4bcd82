"""Fenced-code-block extraction from markdown/transcript text — the
Stack-style code-curation front door.

Agent transcripts and assistant answers carry code inside ``` fences;
curating them (per-language stats, code-aware dedup, language-balanced
mixing) starts with pulling the blocks out with their info-string
language tags.  The grammar here is the practical CommonMark subset a
markdown sink emits (the reference's md assembly,
``ocr_extraction/main.py`` analog, fences tool payloads the same way):

* a fence line starts with three backticks; text after the backticks up
  to the first whitespace is the (lower-cased) language tag;
* the next fence line closes the block — fences TOGGLE, they do not
  nest (CommonMark inner fences would need a longer marker run, which
  the emitters this feeds from never produce);
* an unclosed trailing fence runs to end-of-document (CommonMark's
  rule for unterminated fenced blocks).

The extraction is a single ``F.aggregate`` fold over the document's
line array — per-document state (inside-fence, current language,
accumulated lines) rides the accumulator struct, so the whole parse is
MAP-ONLY: zero shuffle, zero UDF, whole-stage codegen.  At 100 TB this
is a scan-level projection; the only exchange any downstream rollup
pays is its own groupBy.  The DuckDB oracle replays the identical
semantics in window form (cumulative fence count: odd = inside), which
the value hash proves equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Info-string language tag: first run of tag characters after the
# backticks.  Both engines anchor on '^```' and take group 1; the
# character class is ASCII-only so Java regex and RE2 agree.
LANG_PATTERN = r"^```[ \t]*([A-Za-z0-9_+.#-]*)"

_BLOCKS_T = "array<struct<lang:string,code:string>>"


def _acc(inside: Column, lang: Column, cur: Column, blocks: Column) -> Column:
    return F.struct(
        inside.alias("inside"),
        lang.alias("lang"),
        cur.alias("cur"),
        blocks.alias("blocks"),
    )


def _block(lang: Column, cur: Column) -> Column:
    return F.struct(
        lang.alias("lang"), F.array_join(cur, "\n").alias("code")
    )


def code_fence_array(text: Column) -> Column:
    """``array<struct<lang,code>>`` of the fenced blocks in ``text``,
    in document order — one O(n) expression fold over the line array.

    DuckDB twin (window form): cumulative count of '```%'-prefixed
    lines per document; a content line is inside a block iff its count
    is odd; the block's opening fence is the odd-numbered marker with
    the same count, carrying the language tag."""
    lines = F.split(F.coalesce(text, F.lit("")), "\n")
    empty_cur = F.array().cast("array<string>")
    acc0 = _acc(
        F.lit(False), F.lit(""), empty_cur, F.array().cast(_BLOCKS_T)
    )

    def step(acc: Column, ln: Column) -> Column:
        inside = acc.getField("inside")
        marker = ln.rlike("^```")
        lang = F.lower(F.regexp_extract(ln, LANG_PATTERN, 1))
        opened = _acc(F.lit(True), lang, empty_cur, acc.getField("blocks"))
        closed = _acc(
            F.lit(False),
            F.lit(""),
            empty_cur,
            F.array_append(
                acc.getField("blocks"),
                _block(acc.getField("lang"), acc.getField("cur")),
            ),
        )
        grew = _acc(
            F.lit(True),
            acc.getField("lang"),
            F.array_append(acc.getField("cur"), ln),
            acc.getField("blocks"),
        )
        return (
            F.when(marker & ~inside, opened)
            .when(marker & inside, closed)
            .when(inside, grew)
            .otherwise(acc)
        )

    def finish(acc: Column) -> Column:
        # CommonMark: an unterminated fence runs to end-of-document.
        return F.when(
            acc.getField("inside"),
            F.array_append(
                acc.getField("blocks"),
                _block(acc.getField("lang"), acc.getField("cur")),
            ),
        ).otherwise(acc.getField("blocks"))

    return F.aggregate(lines, acc0, step, finish)


def code_fence_blocks(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per fenced code block: (id, block_idx, lang, code,
    n_lines, n_chars).  block_idx is 1-based document order; lang is
    '' for bare fences.  n_lines counts the block's lines (0 for an
    empty block).  Map-only scan + the Generate for posexplode — the
    block array never outlives the projection."""
    blocks = code_fence_array(F.col(text_col))
    code = F.col("b").getField("code")
    return (
        df.select(F.col(id_col).alias("id"), F.posexplode(blocks).alias("p", "b"))
        .select(
            "id",
            (F.col("p") + 1).cast("int").alias("block_idx"),
            F.col("b").getField("lang").alias("lang"),
            code.alias("code"),
            F.when(code == "", F.lit(0))
            .otherwise(F.size(F.split(code, "\n")))
            .cast("long")
            .alias("n_lines"),
            F.length(code).cast("long").alias("n_chars"),
        )
    )


def code_lang_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-language corpus rollup over the extracted blocks: block and
    document counts, total lines/chars — the inventory a code-mixing
    recipe (UniMax over languages, The-Stack-style caps) is driven by.
    All BIGINT facts, one map-side-combinable groupBy on a tiny
    language domain."""
    return (
        code_fence_blocks(df, id_col, text_col)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.countDistinct("id").alias("n_docs"),
            F.sum("n_lines").alias("total_lines"),
            F.sum("n_chars").alias("total_chars"),
        )
    )
