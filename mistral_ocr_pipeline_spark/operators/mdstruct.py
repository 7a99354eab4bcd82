"""Markdown STRUCTURE extraction — pipe tables and heading sections.

The markdown sink (``extractors/blocks.py:34``, the reference's md
assembly analog in ``ocr_extraction/main.py``) emits GitHub-style pipe
tables and ``#``-run headings; downstream curation wants them back as
STRUCTURED relations: table cells as (id, table_idx, row_idx, col_idx,
cell) rows for table-QA / table-grounding corpora, and the heading
outline as sections with line offsets for section-aware chunking (RAG
passage boundaries that respect document structure instead of blind
token windows).

Both parsers follow the `codeblocks.py` recipe: ONE ``F.aggregate``
fold over the document's line array, per-document state riding the
accumulator struct — MAP-ONLY, zero shuffle, zero UDF, whole-stage
codegen.  At 100 TB each is a scan-level projection; the only exchange
a downstream rollup pays is its own groupBy.  The DuckDB oracles
replay the identical grammars in window form (gaps-and-islands over
consecutive pipe lines; cumulative heading count), so the value hash
also proves fold ≡ window.

Pipe-table grammar (the practical GitHub subset the md sink emits):

* a PIPE LINE is a line whose space-trimmed form starts with ``|``;
* a TABLE RUN is a maximal run of consecutive pipe lines; the run is a
  table iff it has ≥ 2 lines and its SECOND line is a separator
  (trimmed form matches ``^\\|[ \\t:|-]+$`` and contains a dash);
* row 0 is the header (first line), the separator is dropped, data
  rows follow in order;
* cells: strip one leading and one trailing ``|`` from the trimmed
  line, split on ``|``, trim each cell.  Escaped pipes (``\\|``) are
  NOT special — the emitters this feeds from never produce them.

Heading-section grammar (CommonMark ATX subset):

* a heading line matches ``^#{1,6} `` (1-6 hashes + one space; seven
  hashes is not a heading, per CommonMark);
* a section runs from its heading line to just before the next heading
  (or end-of-document); lines before the first heading form a level-0
  PREAMBLE section with an empty heading (emitted only if the document
  has any such line — a document that opens with a heading has none).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Separator line, applied to the TRIMMED text: pipes, dashes, colons,
# blanks only.  ASCII-only class — Java regex and RE2 agree.
SEP_PATTERN = r"^\|[ \t:|-]+$"
# ATX heading: 1-6 hashes + one space.  Greedy `#{1,6}` then a literal
# space means 7+ hashes can never match — identical in both engines.
HEADING_PATTERN = r"^#{1,6} "

_RUNS_T = "array<array<string>>"


def _is_sep(line: Column) -> Column:
    return line.rlike(SEP_PATTERN) & line.contains("-")


def _row_cells(row: Column) -> Column:
    """Cell array of one (already-trimmed) pipe-table row."""
    body = F.substr(row, F.lit(2))  # drop the guaranteed leading '|'
    body = F.when(
        body.endswith("|"),
        F.substr(body, F.lit(1), F.length(body) - 1),
    ).otherwise(body)
    return F.transform(F.split(body, r"\|"), lambda c: F.trim(c))


def pipe_table_runs(text: Column) -> Column:
    """``array<array<string>>`` of the VALID table runs in ``text``
    (trimmed lines, separator still in slot 2), in document order.

    DuckDB twin (gaps-and-islands): group consecutive pipe lines by
    ``pos − cum(non-pipe)``, keep groups whose 2nd line is a separator.
    """
    lines = F.split(F.coalesce(text, F.lit("")), "\n")
    empty_run = F.array().cast("array<string>")
    acc0 = F.struct(
        empty_run.alias("run"), F.array().cast(_RUNS_T).alias("tables")
    )

    def flushed(acc: Column) -> Column:
        run = acc.getField("run")
        valid = (F.size(run) >= 2) & _is_sep(F.element_at(run, 2))
        return F.when(
            valid, F.array_append(acc.getField("tables"), run)
        ).otherwise(acc.getField("tables"))

    def step(acc: Column, ln: Column) -> Column:
        t = F.trim(ln)
        grew = F.struct(
            F.array_append(acc.getField("run"), t).alias("run"),
            acc.getField("tables").alias("tables"),
        )
        closed = F.struct(empty_run.alias("run"), flushed(acc).alias("tables"))
        return F.when(t.startswith("|"), grew).otherwise(closed)

    # an unterminated trailing run is still a table (flush at EOF)
    return F.aggregate(lines, acc0, step, flushed)


def pipe_table_cells(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per table CELL: (id, table_idx, row_idx, col_idx, cell).

    table_idx is 1-based document order over valid tables; row_idx 0 is
    the header, 1.. the data rows (the separator line is dropped);
    col_idx is 1-based.  Ragged rows keep their own cell count — the
    `pipe_table_stats` rollup surfaces them."""
    run = F.col("run")
    rows = F.concat(F.slice(run, 1, 1), F.slice(run, 3, F.size(run) - 2))
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(pipe_table_runs(F.col(text_col))).alias("ti", "run"),
        )
        .select(
            "id",
            (F.col("ti") + 1).cast("int").alias("table_idx"),
            F.posexplode(rows).alias("row_idx", "row"),
        )
        .select(
            "id",
            "table_idx",
            F.col("row_idx").cast("int").alias("row_idx"),
            F.posexplode(_row_cells(F.col("row"))).alias("ci", "cell"),
        )
        .select(
            "id",
            "table_idx",
            "row_idx",
            (F.col("ci") + 1).cast("int").alias("col_idx"),
            "cell",
        )
    )


def pipe_table_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per table: (id, table_idx, n_rows, n_cols, ragged).

    n_rows counts DATA rows (header + separator excluded), n_cols the
    header's cell count, ragged whether ANY data row's cell count
    differs from the header's — the malformed-table gate a table-QA
    corpus filters on.  Computed inside the array (no second explode):
    still map-only."""
    run = F.col("run")
    header_cells = _row_cells(F.element_at(run, 1))
    data = F.slice(run, 3, F.size(run) - 2)
    n_cols = F.size(header_cells)
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(pipe_table_runs(F.col(text_col))).alias("ti", "run"),
    ).select(
        "id",
        (F.col("ti") + 1).cast("int").alias("table_idx"),
        (F.size(run) - 2).cast("long").alias("n_rows"),
        n_cols.cast("long").alias("n_cols"),
        F.exists(data, lambda r: F.size(_row_cells(r)) != n_cols).alias(
            "ragged"
        ),
    )


_SECS_T = (
    "array<struct<level:int,heading:string,start_line:int,"
    "lines:array<string>>>"
)


def _sec(level: Column, heading: Column, start: Column, lines: Column) -> Column:
    return F.struct(
        level.cast("int").alias("level"),
        heading.alias("heading"),
        start.cast("int").alias("start_line"),
        lines.alias("lines"),
    )


def md_section_array(text: Column) -> Column:
    """``array<struct<level,heading,start_line,lines>>`` of the heading
    sections in ``text``, in document order (preamble first when
    present).  ``lines`` holds the section's CONTENT lines — the
    heading line itself is metadata, not content.

    DuckDB twin (window form): cumulative heading count per line; a
    content line belongs to the section whose count it carries; count 0
    is the preamble."""
    lines = F.split(F.coalesce(text, F.lit("")), "\n")
    empty_lines = F.array().cast("array<string>")
    acc0 = F.struct(
        F.lit(0).cast("int").alias("pos"),
        F.array().cast(_SECS_T).alias("secs"),
    )

    def step(acc: Column, ln: Column) -> Column:
        pos = acc.getField("pos")
        secs = acc.getField("secs")
        is_h = ln.rlike(HEADING_PATTERN)
        level = F.length(F.regexp_extract(ln, r"^(#{1,6}) ", 1))
        title = F.trim(F.regexp_replace(ln, HEADING_PATTERN, ""))
        opened = F.array_append(secs, _sec(level, title, pos, empty_lines))
        last = F.element_at(secs, -1)
        grown = F.concat(
            F.slice(secs, 1, F.size(secs) - 1),
            F.array(
                _sec(
                    last.getField("level"),
                    last.getField("heading"),
                    last.getField("start_line"),
                    F.array_append(last.getField("lines"), ln),
                )
            ),
        )
        preamble = F.array(
            _sec(F.lit(0), F.lit(""), F.lit(0), F.array(ln))
        ).cast(_SECS_T)
        content = F.when(F.size(secs) == 0, preamble).otherwise(grown)
        return F.struct(
            (pos + 1).cast("int").alias("pos"),
            F.when(is_h, opened).otherwise(content).alias("secs"),
        )

    return F.aggregate(lines, acc0, step, lambda acc: acc.getField("secs"))


def md_sections(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per section: (id, section_idx, level, heading,
    start_line, n_lines, n_chars) — the document outline with LINE
    OFFSETS (the span-bookkeeping shape the north rule's extraction
    contract keeps everywhere else).  section_idx is 1-based document
    order; start_line is the 0-based line of the heading (0 for the
    preamble); n_lines/n_chars measure the content lines (heading
    excluded; n_chars counts the '\\n'-joined content)."""
    s = F.col("s")
    content = s.getField("lines")
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(md_section_array(F.col(text_col))).alias("p", "s"),
    ).select(
        "id",
        (F.col("p") + 1).cast("int").alias("section_idx"),
        s.getField("level").alias("level"),
        s.getField("heading").alias("heading"),
        s.getField("start_line").alias("start_line"),
        F.size(content).cast("long").alias("n_lines"),
        F.length(F.array_join(content, "\n")).cast("long").alias("n_chars"),
    )


def md_section_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per section WITH its content text: (id, section_idx,
    level, heading, sec_text) — the input shape for section-aware
    passage chunking (chunk boundaries that respect the document
    outline instead of blind token windows).  sec_text is the
    '\\n'-joined content (heading line excluded, '' for content-free
    sections).  Same map-only fold as `md_sections`."""
    s = F.col("s")
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(md_section_array(F.col(text_col))).alias("p", "s"),
    ).select(
        "id",
        (F.col("p") + 1).cast("int").alias("section_idx"),
        s.getField("level").alias("level"),
        s.getField("heading").alias("heading"),
        F.array_join(s.getField("lines"), "\n").alias("sec_text"),
    )


def pipe_table_linearize(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """ToTTo-style table linearization: each DATA row rendered as
    'h1: v1 | h2: v2 | …' by pairing cells with the header positionally
    — the flat string a table-QA / table-to-text corpus trains on.
    Pairs stop at the SHORTER of header/row (ragged extras carry no
    header name; `pipe_table_stats.ragged` flags those tables).  Still
    map-only: the pairing runs inside the run array via
    transform(sequence(...)).  Returns (id, table_idx, row_idx ≥ 1,
    row_text)."""
    run = F.col("run")
    hdr = _row_cells(F.element_at(run, 1))
    data = F.slice(run, 3, F.size(run) - 2)
    return (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(pipe_table_runs(F.col(text_col))).alias("ti", "run"),
        )
        .select(
            "id",
            (F.col("ti") + 1).cast("int").alias("table_idx"),
            F.posexplode(
                F.transform(
                    data,
                    lambda r: F.array_join(
                        F.transform(
                            F.sequence(
                                F.lit(1),
                                F.least(
                                    F.size(hdr), F.size(_row_cells(r))
                                ),
                            ),
                            lambda j: F.concat(
                                F.element_at(hdr, j),
                                F.lit(": "),
                                F.element_at(_row_cells(r), j),
                            ),
                        ),
                        " | ",
                    ),
                )
            ).alias("ri", "row_text"),
        )
        .select(
            "id",
            "table_idx",
            (F.col("ri") + 1).cast("int").alias("row_idx"),
            "row_text",
        )
    )


# Markdown image/figure reference: ![alt](src).  Character-class only —
# Java regex and RE2 agree; nested brackets/parens are out of grammar
# (the md sink never emits them).
IMAGE_PATTERN = r"!\[([^\]]*)\]\(([^)]*)\)"


def md_images(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Figure/image inventory of a markdown document: one row per
    ``![alt](src)`` reference — (id, img_idx, alt, src, alt_chars) in
    document order.  The markdown twin of the reference's figure-span
    bookkeeping (`extractors/blocks.py` renders figures exactly this
    way), extracted scan-level with regexp_extract_all: map-only, zero
    UDF."""
    pat = F.lit(IMAGE_PATTERN)
    body = F.coalesce(F.col(text_col), F.lit(""))
    z = F.col("z")
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.zip_with(
                F.regexp_extract_all(body, pat, 1),
                F.regexp_extract_all(body, pat, 2),
                lambda a, s: F.struct(a.alias("alt"), s.alias("src")),
            )
        ).alias("p", "z"),
    ).select(
        "id",
        (F.col("p") + 1).cast("int").alias("img_idx"),
        z.getField("alt").alias("alt"),
        z.getField("src").alias("src"),
        F.length(z.getField("alt")).cast("long").alias("alt_chars"),
    )
