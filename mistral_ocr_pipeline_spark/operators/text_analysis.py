"""Text analysis for training-data curation — all Catalyst expressions
(JVM, codegen'd) except the rolling-hash fingerprint's numpy kernel.

Every SQL-expressible operator documents its DuckDB twin so the
correctness harness can replay it."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window as W, functions as F

# A small pinned stopword inventory per language — enough for a reliable
# n-gram/stopword-ratio language heuristic on en/de/fr/es prose.
STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "was", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"),
    "fr": ("le", "la", "les", "et", "de", "un", "une", "est", "dans", "pour"),
    "es": ("el", "la", "los", "de", "que", "y", "en", "un", "una", "es"),
}

# BPE-ish token regex: word pieces, numbers, or single non-space symbols —
# the unit a GPT-style byte-pair pre-tokenizer would split on.
BPE_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def ws_token_count(c: Column) -> Column:
    """Whitespace token count.  DuckDB:
    ``case when trim(t)='' then 0 else length(regexp_split_to_array(trim(t),'\\s+')) end``"""
    t = F.trim(c)
    return F.when(t == "", F.lit(0)).otherwise(F.size(F.split(t, r"\s+"))).cast("long")


def bpe_token_count(c: Column) -> Column:
    """BPE-ish token count via regexp_count.  DuckDB:
    ``length(regexp_extract_all(t, pattern))``"""
    return F.regexp_count(c, F.lit(BPE_TOKEN_PATTERN)).cast("long")


def stopword_hits(c: Column, lang: str = "en") -> Column:
    """Occurrences of the language's stopwords as standalone words,
    counted by ASCII-class tokenization — NOT ``\\b``: Java's ``\\b`` is
    Unicode-aware while RE2's is ASCII (the same engine split the PII
    patterns below avoid), so a stopword adjacent to a non-ASCII word
    char ('müde') would count differently in Spark vs the DuckDB oracle.
    Splitting on ``[^a-z0-9_]+`` (the ASCII ``\\w`` complement) behaves
    identically in both engines.  DuckDB:
    ``len(list_filter(string_split_regex(lower(t), '[^a-z0-9_]+'),
    x -> x IN (...)))``."""
    words = STOPWORDS[lang]
    toks = F.split(F.lower(c), r"[^a-z0-9_]+")
    return F.size(F.filter(toks, lambda x: x.isin(*words))).cast("long")


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword / word-shape features + a composite
    quality score in [0,1] — the curation gate a pretraining pipeline runs
    over every document.  Pure expressions, fully SQL-replayable."""
    t = F.col(text_col)
    n_chars = F.length(t).cast("long")
    n_tokens = ws_token_count(t)
    n_stop = stopword_hits(t, "en")
    n_punct = F.regexp_count(t, F.lit(r"[^\w\s]")).cast("long")
    n_digit = F.regexp_count(t, F.lit(r"[0-9]")).cast("long")
    safe_chars = F.greatest(n_chars, F.lit(1))
    safe_tokens = F.greatest(n_tokens, F.lit(1))
    stop_ratio = n_stop / safe_tokens
    punct_ratio = n_punct / safe_chars
    digit_ratio = n_digit / safe_chars
    mean_word_len = n_chars / safe_tokens
    score = (
        F.when(n_tokens < 5, F.lit(0.0))
        .otherwise(
            F.least(F.lit(1.0), stop_ratio * 2)
            * (F.lit(1.0) - F.least(F.lit(1.0), punct_ratio * 4))
            * (F.lit(1.0) - F.least(F.lit(1.0), digit_ratio * 4))
        )
    )
    return df.select(
        "*",
        n_chars.alias("q_chars"),
        n_tokens.alias("q_tokens"),
        F.round(stop_ratio, 6).alias("q_stop_ratio"),
        F.round(punct_ratio, 6).alias("q_punct_ratio"),
        F.round(digit_ratio, 6).alias("q_digit_ratio"),
        F.round(mean_word_len, 6).alias("q_mean_word_len"),
        F.round(score, 6).alias("q_score"),
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: script detection (CJK/Arabic/Cyrillic ranges)
    first, else argmax of per-language stopword hit rates, else 'unknown'.
    Pure expressions — a greatest/when cascade, no UDF."""
    t = F.col(text_col)
    cjk = F.regexp_count(t, F.lit(r"[\x{4E00}-\x{9FFF}\x{3040}-\x{30FF}]"))
    arabic = F.regexp_count(t, F.lit(r"[\x{0600}-\x{06FF}]"))
    cyrillic = F.regexp_count(t, F.lit(r"[\x{0400}-\x{04FF}]"))
    hits = {lang: stopword_hits(t, lang) for lang in STOPWORDS}
    best_hits = F.greatest(*hits.values())
    # deterministic tie-break: first lang in pinned order wins ties
    lang_col = F.when(cjk > 0, F.lit("cjk")).when(arabic > 0, F.lit("ar")).when(
        cyrillic > 0, F.lit("ru")
    )
    for lang in ("en", "de", "fr", "es"):
        lang_col = lang_col.when(
            (best_hits > 0) & (hits[lang] == best_hits), F.lit(lang)
        )
    lang_col = lang_col.otherwise(F.lit("unknown"))
    return df.withColumn("lang_id", lang_col)


# Unicode script ranges in the RE2∩Java-identical subset (plain codepoint
# ranges via \x{...} — no \p{Script=} property classes, whose inventories
# differ between engines and Unicode versions).  Pinned order doubles as
# the dominant-script tie-break.
SCRIPT_RANGES = (
    ("latin", r"A-Za-z\x{00C0}-\x{024F}"),
    ("cyrillic", r"\x{0400}-\x{04FF}"),
    ("greek", r"\x{0370}-\x{03FF}"),
    ("arabic", r"\x{0600}-\x{06FF}"),
    ("hangul", r"\x{AC00}-\x{D7AF}"),
    ("cjk", r"\x{3040}-\x{30FF}\x{4E00}-\x{9FFF}"),
)


def dominant_script_col(t: Column) -> Column:
    """Standalone dominant-script expression (same range table and
    pinned-order tie-break as `script_profile`, NULL-safe, 'none' when
    no script characters) — for callers that need the verdict inline
    without the full per-script profile columns."""
    t = F.coalesce(t, F.lit(""))
    cnts = [
        (n, F.regexp_count(t, F.lit(f"[{rng}]")).cast("long"))
        for n, rng in SCRIPT_RANGES
    ]
    total = None
    for _, c in cnts:
        total = c if total is None else total + c
    best = F.greatest(*[c for _, c in cnts])
    dom = F.when(total == 0, F.lit("none"))
    for n, c in cnts:
        dom = dom.when(c == best, F.lit(n))
    return dom


def script_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document Unicode-script profile: per-script character counts
    and exact integer-micro-unit fractions, the dominant script, and a
    mixed-script flag — the homoglyph-spoofing / wrong-corpus signal
    ``language_id`` (which latches on the FIRST matching script) cannot
    express.  A doc whose `lang` metadata says 'en' but whose letters
    are 40% Cyrillic is either spam or mislabeled; a doc mixing 3+
    scripts above 5% each is a strong boilerplate/injection tell
    (cf. CCNet §3.1 language filtering, Gopher's doc-quality battery).

    Scale shape: map-only, zero shuffle, all JVM `regexp_count`
    expressions over pinned codepoint ranges; fractions are BIGINT
    floor-divisions (never double), so every value is bit-identical
    across partitionings and engines."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    sel = [F.col(id_col)]
    for name, rng in SCRIPT_RANGES:
        sel.append(
            F.regexp_count(t, F.lit(f"[{rng}]")).cast("long").alias(f"cnt_{name}")
        )
    base = df.select(*sel)
    names = [n for n, _ in SCRIPT_RANGES]
    total = None
    for n in names:
        c = F.col(f"cnt_{n}")
        total = c if total is None else total + c
    base = base.withColumn("script_chars", total.cast("long"))
    fracs = [
        F.expr(f"CASE WHEN script_chars = 0 THEN 0 "
               f"ELSE cnt_{n} * 1000000 DIV script_chars END")
        .cast("long")
        .alias(f"frac_{n}_micro")
        for n in names
    ]
    base = base.select("*", *fracs)
    best = F.greatest(*[F.col(f"cnt_{n}") for n in names])
    dom = F.when(F.col("script_chars") == 0, F.lit("none"))
    for n in names:
        dom = dom.when(F.col(f"cnt_{n}") == best, F.lit(n))
    n_scripts = None
    for n in names:
        flag = (F.col(f"frac_{n}_micro") >= 50000).cast("int")
        n_scripts = flag if n_scripts is None else n_scripts + flag
    return base.select(
        "*",
        dom.alias("dominant_script"),
        n_scripts.cast("int").alias("n_scripts"),
        (n_scripts >= 2).alias("is_mixed"),
    )


# PII patterns — deliberately in the RE2∩Java-identical subset: no
# backrefs, no lookarounds, and NO \b (Java's \b is Unicode-aware, RE2's
# is ASCII — adjacent non-ASCII word chars would make the engines
# disagree; the slight precision loss is the price of a bit-exact SQL
# twin).  Scrub order matters (an SSN is 9 digits a phone pattern could
# eat): patterns apply sequentially and each count is taken on the text
# as it stands BEFORE that pattern's replacement — the oracle replays the
# same staged pipeline.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("ssn", r"[0-9]{3}-[0-9]{2}-[0-9]{4}", "[SSN]"),
    ("phone", r"(?:\+?[0-9]{1,2}[-. ])?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}", "[PHONE]"),
    ("ip", r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}", "[IP]"),
)


def pii_scrub(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Redact emails / SSNs / phone numbers / IP literals and count each —
    the pre-training privacy pass.  All JVM ``regexp_replace`` /
    ``regexp_count`` (codegen'd, no UDF); at 100 TB this is a map-only
    scan.  ``keep_cols`` ride through the projection (the
    `repetition_metrics` convention) so callers needing extra columns
    stay a single scan instead of re-joining the input — a re-join both
    rescans and fans out k² rows per k-duplicated id.  DuckDB twin: the
    same staged ``regexp_replace(..., 'g')`` cascade (RE2 flavor;
    patterns are deliberately RE2∩Java-safe)."""
    cur = F.col(text_col)
    cols = [F.col(id_col).alias("id")]
    for name, pat, token in PII_PATTERNS:
        cols.append(F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, token)
    cols.append(cur.alias("scrubbed"))
    cols.extend(F.col(c) for c in keep_cols or [])
    return df.select(*cols)


def _utf8_as_cp1252(ch: str) -> str:
    """The mojibake artifact for ``ch``: its UTF-8 bytes mis-decoded as
    cp1252, with the five cp1252 holes (0x81 8D 8F 90 9D) falling back
    to the latin-1 control char -- ftfy's "sloppy cp1252", the decode
    real browsers and real crawls apply."""
    out = []
    for b in ch.encode("utf-8"):
        try:
            out.append(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            out.append(chr(b))
    return "".join(out)


# the canonical UTF-8-read-as-cp1252 double encodings: punctuation
# artifacts (a-circumflex + euro + trademark for the right single
# quote), accented-Latin artifacts, and the nbsp artifact (repaired to a
# plain space).  Generated from the true chars so the literals are
# exact; entries are mutually non-overlapping (the 3-char artifacts all
# share a prefix but differ in their final char and no entry IS that
# prefix), so per-pattern occurrence counts on the RAW text are exact.
# Pinned SMALL on purpose: each entry is an unambiguous artifact; a
# statistical repair (real ftfy) is a model, not a rule table.
_MOJIBAKE_CHARS = (
    "\u2019", "\u2018", "\u201c", "\u201d", "\u2013", "\u2014",
    "\u2026", "\u00e9", "\u00e8", "\u00e4", "\u00f6", "\u00fc",
    "\u00f1", "\u00e7",
)
MOJIBAKE_FIXES: tuple[tuple[str, str], ...] = tuple(
    (_utf8_as_cp1252(c), c) for c in _MOJIBAKE_CHARS
) + ((_utf8_as_cp1252("\u00a0"), " "),)


def mojibake_repair(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Repair the common UTF-8-decoded-as-Latin-1 mojibake artifacts
    (ftfy's bread and butter — every web-crawl pipeline runs this pass
    before quality scoring, since 'donâ€™t' both corrupts the text AND
    poisons token/quality statistics).  A pinned longest-first literal
    ``replace`` cascade — exact string surgery, no regex, no UDF —
    map-only at 100 TB, with a per-doc artifact count so the corpus's
    encoding-damage rate is auditable (`n_mojibake` counts artifact
    occurrences BEFORE repair).  ``keep_cols`` ride through the
    projection (the `pii_scrub` convention).  DuckDB twin: the same
    ``replace`` chain; the count twin is the length-delta of a
    sentinel-free single-pass replace per pattern.  NULL text survives
    as an empty repaired doc with count 0 (coalesce-to-'' like the
    dedup family)."""
    raw = F.coalesce(F.col(text_col), F.lit(""))
    n = F.lit(0).cast("long")
    for bad, _ in MOJIBAKE_FIXES:
        # occurrences of `bad` = length drop when deleting it / len(bad)
        n = n + (
            (F.length(raw) - F.length(F.replace(raw, F.lit(bad), F.lit(""))))
            / F.lit(len(bad))
        ).cast("long")
    cur = raw
    for bad, good in MOJIBAKE_FIXES:
        cur = F.replace(cur, F.lit(bad), F.lit(good))
    return df.select(
        F.col(id_col).alias("id"),
        n.alias("n_mojibake"),
        cur.alias("repaired"),
        *(F.col(c) for c in keep_cols or []),
    )


def repetition_metrics(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Intra-document repetition (Gopher-style quality signals): the
    fraction of duplicate non-empty lines and duplicate word 3-grams —
    boilerplate-heavy or loop-generated docs score high and get filtered
    before training.  Pure array expressions (split → filter →
    array_distinct), map-only at scale; DuckDB twin via string_split +
    list_distinct.  ``keep_cols`` carries extra source columns through so
    downstream rollups stay one scan/one plan (same convention as
    ``dedup.contamination_flags``)."""
    lines = F.filter(
        F.transform(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n"),
                    lambda x: F.trim(x)),
        lambda x: x != "",
    )
    words = F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda x: x != "",
    )
    # guard: Spark's sequence(1, 0) DESCENDS ([1, 0]) rather than being
    # empty (DuckDB's generate_series(1, 0) is empty), and slice rejects
    # a 0 start — short docs need an explicit empty-array branch
    grams = F.when(
        F.size(words) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - 2),
            lambda i: F.concat_ws(" ", F.slice(words, i, 3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    n_lines = F.size(lines)
    n_grams = F.size(grams)
    return df.select(
        F.col(id_col).alias("id"),
        *(keep_cols or []),
        n_lines.cast("long").alias("n_lines"),
        F.round(
            F.when(n_lines > 0,
                   (n_lines - F.size(F.array_distinct(lines))) / n_lines
                   ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_line_fraction"),
        n_grams.cast("long").alias("n_3grams"),
        F.round(
            F.when(n_grams > 0,
                   (n_grams - F.size(F.array_distinct(grams))) / n_grams
                   ).otherwise(F.lit(0.0)),
            6,
        ).alias("dup_3gram_fraction"),
    )


def fingerprint_md5(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Document fingerprint = md5 of the normalized text.  DuckDB:
    ``md5(trim(regexp_replace(lower(t),'\\s+',' ','g')))``"""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    return df.select(F.col(id_col), F.md5(norm).alias("fingerprint"))


def fingerprint_rolling(
    df: DataFrame, id_col: str, text_col: str = "text", window: int = 16
) -> DataFrame:
    """Winnowing-style rolling-hash fingerprint: min of a polynomial rolling
    hash over byte windows — robust to small local edits.  Vectorized numpy
    kernel in one Arrow pass (pandas UDF)."""

    @F.pandas_udf("long")
    def roll(texts: pd.Series) -> pd.Series:
        base = np.uint64(1099511628211)
        out = []
        for t in texts:
            if not isinstance(t, str) or not t:
                out.append(0)
                continue
            b = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
            w = min(window, len(b))  # short texts: one window over the whole text
            pw = base ** np.arange(w, dtype=np.uint64)
            win = np.lib.stride_tricks.sliding_window_view(b, w)
            hashes = (win * pw[None, :]).sum(axis=1)
            out.append(int(hashes.min().astype(np.int64)))
        return pd.Series(out, dtype="int64")

    return df.select(F.col(id_col), roll(F.col(text_col)).alias("rolling_fp"))


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
) -> DataFrame:
    """EXACT winnowing fingerprint selection (Schleimer, Wilkerson &
    Aiken 2003, "Winnowing: Local Algorithms for Document
    Fingerprinting" — the MOSS scheme): hash every character ``k``-gram
    of the normalized text, then in each window of ``w`` consecutive
    hashes select the minimum, breaking ties toward the RIGHTMOST
    occurrence (the paper's robust-winnowing rule), and emit the
    distinct selected (position, hash) pairs.  The guarantee: every
    ``w``-window contains at least one selected fingerprint, so any
    shared substring of length ≥ k + w − 1 between two documents shares
    at least one fingerprint — the deterministic document fingerprint a
    plagiarism / near-dup index is built on (cf. the
    probabilistic `fingerprint_rolling` above, which keeps only the
    global min).

    Returns (id, pos, fp): ``pos`` is the 1-based k-gram start offset,
    ``fp`` the md5 hex of that k-gram — md5 is fixed-width lowercase
    hex, so lexicographic min ≡ numeric min and the selection replays
    verbatim in any engine.  Texts shorter than ``k`` chars emit no
    rows (no k-grams → no fingerprints); when there are fewer than
    ``w`` hashes the window shrinks to cover them all (the paper's
    convention for short documents).

    Plan shape: explode the k-gram positions to rows (each gram's md5
    computed exactly ONCE), then the sliding window-of-``w`` minimum is
    ``min(struct(h, -pos))`` over ``rowsBetween(-(w-1), 0)`` — struct
    ordering puts the minimum hash first and, among ties, the minimum
    of ``-pos`` = the RIGHTMOST position, so one window-min expresses
    the paper's tie rule exactly.  One shuffle keyed on doc id for the
    window; the payload is the gram stream (~|text| rows), the same
    scale class as `dedup.line_dedup`'s digest stream.  The tempting
    pure-array-expression form (transform over window starts re-slicing
    a hashes array) is a trap: Catalyst inlines the md5-transform into
    every reference, going O(|text|²·w) per document — measured 40×
    slower at 300-char docs and unbounded worse at real document sizes.
    Zero UDFs either way."""
    if k < 1 or w < 1:
        raise ValueError("winnow_fingerprints: k and w must be >= 1")
    from pyspark.sql.window import Window

    from mistral_ocr_pipeline_spark.functions.text_functions import norm_key_col

    t = norm_key_col(F.col(text_col))
    n_grams = F.length(t) - k + 1  # m: number of k-gram hashes
    grams = (
        df.select(
            F.col(id_col).alias("id"), t.alias("_t"), n_grams.alias("_m")
        )
        .filter(F.col("_m") >= 1)
        .select(
            "id",
            "_m",
            F.explode(F.sequence(F.lit(1), F.col("_m"))).alias("pos"),
            "_t",
        )
        .select(
            "id",
            "_m",
            "pos",
            F.md5(F.expr(f"substring(_t, pos, {int(k)})")).alias("h"),
        )
    )
    win = Window.partitionBy("id").orderBy("pos").rowsBetween(-(w - 1), 0)
    eff_w = F.least(F.lit(w), F.col("_m"))  # short docs: one whole-text window
    return (
        grams.select(
            "id",
            "pos",
            eff_w.alias("_w"),
            F.min(
                F.struct(F.col("h"), (-F.col("pos")).alias("np"))
            ).over(win).alias("_mn"),
        )
        # keep only complete windows (pos is the window END); for m < w the
        # single surviving row pos == m covers the whole shrunk window
        .filter(F.col("pos") >= F.col("_w"))
        .select(
            "id",
            (-F.col("_mn.np")).alias("pos"),
            F.col("_mn.h").alias("fp"),
        )
        .distinct()
    )


def winnow_overlap_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    k: int = 8,
    w: int = 4,
    cap: int = 64,
) -> DataFrame:
    """Document pairs sharing winnowed fingerprints — the MOSS overlap
    join: (id_a, id_b, n_shared) over `winnow_fingerprints`, matching on
    the fingerprint VALUE only (never the position — winnowing's whole
    point is that local edits shift offsets but preserve the selected
    hashes of untouched regions).  Guarantee inherited from winnowing:
    two documents sharing any substring of ≥ k + w − 1 chars surface
    with n_shared ≥ 1.

    Never all-pairs: fingerprints selected by more than ``cap``
    documents are corpus boilerplate (the hot-line analogue) and are
    EXCLUDED before the self-join, so no fingerprint group can go
    quadratic — the same bounded-bucket discipline as
    `dedup.substring_overlap_pairs` / the LSH band joins.  One shuffle
    keyed on fp for the group-size count, one for the equi-self-join,
    one on (id_a, id_b) for the final count — all well-keyed; the
    fingerprint stream is ~|text|/(w/2) rows per doc (the winnowing
    density bound 2/(w+1)), far below the gram stream it summarizes."""
    fps = winnow_fingerprints(df, id_col, text_col, k=k, w=w).select(
        "id", "fp"
    ).distinct()
    ok = fps.groupBy("fp").agg(F.count(F.lit(1)).alias("_n")).filter(
        F.col("_n") <= cap
    )
    bounded = fps.join(ok.select("fp"), "fp")
    a = bounded.alias("a")
    b = bounded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


# C13 — keyword→concept mapping (reference compare_results.py:129-482: six
# literal keyword dictionaries matched after normalization).  Pure SQL
# higher-order functions: no UDF, vocab folded into the plan as literals.
CONCEPT_VOCAB = {
    "query": ("query", "sql", "filter", "join", "scan"),
    "perf": ("fast", "slow", "vector", "batch", "hash"),
    "data": ("table", "row", "column", "key", "value"),
}


def concept_tags(c: Column, vocab: dict[str, tuple[str, ...]] | None = None) -> Column:
    """Array of concept tags whose keyword set intersects the normalized
    token set — ``array_intersect`` against literal arrays, tags in pinned
    dict order.  DuckDB twin: list_has_any/EXISTS per concept."""
    from mistral_ocr_pipeline_spark.functions.text_functions import norm_key_col

    toks = F.split(norm_key_col(c), " ")
    tags = [
        F.when(
            F.arrays_overlap(toks, F.array(*[F.lit(k) for k in kws])), F.lit(name)
        )
        for name, kws in (vocab or CONCEPT_VOCAB).items()
    ]
    return F.filter(F.array(*tags), lambda x: x.isNotNull())


# --------------------------------------------------------------------------
# TF-IDF — corpus-level term weighting, top-k terms per document
# --------------------------------------------------------------------------
def tfidf_topk(
    df: DataFrame, id_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """Top-k terms per document by smoothed TF-IDF
    (``tf × (ln((1+N)/(1+df)) + 1)``), ties broken by term ascending.

    Plan shape at scale: tokenize+explode is a flatMap (no shuffle); term
    frequencies shuffle on (doc, term) — well-distributed; document
    frequencies shuffle on term with map-side partial agg; the tf⋈idf join
    keys on term (the vocabulary side is heavy-tailed but AQE's skew-join
    splits the stop-word keys); final top-k is one window per doc.  All
    JVM expressions — no UDF anywhere."""
    from mistral_ocr_pipeline_spark.functions.text_functions import norm_key_col

    terms = (
        df.select(
            F.col(id_col).alias("doc"),
            F.explode(F.split(norm_key_col(F.col(text_col)), " ")).alias("term"),
        )
        .filter(F.col("term") != "")
    )
    tf = terms.groupBy("doc", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.select(F.countDistinct(F.col(id_col)).alias("n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc",
            "term",
            "tf",
            F.round(
                F.col("tf")
                * (F.log((1 + F.col("n")) / (1 + F.col("df"))) + F.lit(1.0)),
                6,
            ).alias("tfidf"),
        )
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("doc").orderBy(F.col("tfidf").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("doc").alias(id_col), "term", "tf", "tfidf", "rank")
    )


def unigram_surprisal(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """(id, surprisal) — mean token surprisal -ln p(token) under the
    corpus's own unigram distribution: the cheap perplexity proxy a
    pretraining quality filter uses (gibberish/boilerplate-mangled docs
    score high; ordinary prose low) when no external LM is available.

    Two-pass shape: pass 1 builds the unigram table (one explode +
    groupBy — vocabulary-sized output, millions of rows at web scale, not
    corpus-sized); pass 2 joins it back BROADCAST and aggregates per doc.
    The corpus token stream itself never shuffles twice — the doc-side
    groupBy is the only full-stream exchange, keyed by doc id."""
    from mistral_ocr_pipeline_spark.functions.text_functions import norm_key_col

    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(norm_key_col(F.col(text_col)), " ")).alias("t"),
    )
    cnt = toks.groupBy("t").agg(F.count(F.lit(1)).alias("c"))
    tot = cnt.agg(F.sum("c").cast("double").alias("n"))
    table = cnt.crossJoin(F.broadcast(tot))
    return (
        toks.join(F.broadcast(table), "t")
        .groupBy("id")
        .agg(
            F.round(F.avg(-F.log(F.col("c") / F.col("n"))), 6).alias("surprisal")
        )
    )


def perplexity_buckets(
    scored: DataFrame,
    id_col: str,
    score_col: str = "surprisal",
    group_col: str | None = "lang",
    n_buckets: int = 3,
    labels: tuple[str, ...] = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet-style quality stratification (Wenzek et al. 2020, "CCNet:
    Extracting High Quality Monolingual Datasets from Web Crawl Data"):
    rank each language's documents by LM perplexity (here the corpus-
    unigram `unigram_surprisal` proxy — lower = more ordinary prose) and
    split into equal head/middle/tail buckets, per language so
    high-resource languages don't define "fluent" for low-resource ones.
    Trainers keep head+middle (or sample tail at a discount).

    Bucketing is ``ntile(n)`` over the deterministic total order
    (score, id) — ANSI semantics, identical in any engine; the score is
    pre-rounded (6 dp) upstream so the order itself is cross-engine
    stable.  Scale note: the window sorts each language's rows — one
    sort per language partition, acceptable because stratification runs
    once per corpus build; the incremental/streaming form is
    `perplexity_thresholds` + `apply_perplexity_thresholds` below —
    frozen per-language boundaries broadcast onto the scan, no window
    at all."""
    if len(labels) != n_buckets:
        raise ValueError(f"need {n_buckets} labels, got {len(labels)}")
    from pyspark.sql import Window as W

    part = W.partitionBy(group_col) if group_col else W.partitionBy()
    w = part.orderBy(F.col(score_col), F.col(id_col))
    label = F.lit(None).cast("string")
    for i, name in enumerate(labels, start=1):
        label = F.when(F.col("_b") == i, F.lit(name)).otherwise(label)
    return (
        scored.withColumn("_b", F.ntile(n_buckets).over(w))
        .withColumn("bucket", label)
        .drop("_b")
    )


def perplexity_thresholds(
    scored: DataFrame,
    score_col: str = "surprisal",
    group_col: str = "lang",
    n_buckets: int = 3,
) -> DataFrame:
    """Per-group EXACT percentile boundaries for `perplexity_buckets`'
    scan-level form: one map-side-combinable aggregate emitting
    (group, bounds[n_buckets-1]) — language-cardinality output meant to
    be persisted from the PREVIOUS corpus build and broadcast onto the
    next (the CCNet production shape: thresholds are frozen per release,
    new documents bucket by comparison, no window, no sort).  At 100 TB
    swap `percentile` for `percentile_approx` — same plan shape, and a
    t-digest boundary shifting by a few documents moves rows only
    between ADJACENT buckets."""
    qs = [i / n_buckets for i in range(1, n_buckets)]
    return scored.groupBy(F.col(group_col).alias("group")).agg(
        F.percentile(F.col(score_col), F.array(*[F.lit(q) for q in qs])).alias(
            "bounds"
        )
    )


def apply_perplexity_thresholds(
    df: DataFrame,
    thresholds: DataFrame,
    score_col: str = "surprisal",
    group_col: str = "lang",
    labels: tuple[str, ...] = ("head", "middle", "tail"),
) -> DataFrame:
    """Bucket rows against FROZEN boundaries: broadcast the
    language-cardinality thresholds onto the scan and count boundary
    crossings — a pure scan-level expression, zero shuffle on the corpus
    (the window-free twin of `perplexity_buckets`; exact agreement on
    the build that produced the thresholds is boundary-tie-modulo —
    ntile splits equal counts, thresholds split at values).  Rows of
    groups absent from ``thresholds`` keep a NULL bucket (surface new
    languages rather than silently mislabeling them).  A thresholds
    table built with a DIFFERENT bucket count than ``labels`` covers
    RAISES at evaluation — otherwise every row past the last label
    would get the NULL bucket and masquerade as the unseen-group
    sentinel."""
    idx = F.aggregate(
        F.col("bounds"),
        F.lit(0),
        lambda acc, b: acc + (F.col(score_col) > b).cast("int"),
    )
    label = F.lit(None).cast("string")
    for i, name in enumerate(labels):
        label = F.when(idx == i, F.lit(name)).otherwise(label)
    arity_ok = F.size(F.col("bounds")) == len(labels) - 1
    checked = F.when(arity_ok, label).otherwise(
        F.raise_error(
            F.lit(
                f"apply_perplexity_thresholds: thresholds carry "
                f"size(bounds)+1 buckets but {len(labels)} labels were "
                "given — rebuild thresholds or pass matching labels"
            )
        ).cast("string")
    )
    return (
        df.join(
            F.broadcast(thresholds.withColumnRenamed("group", group_col)),
            group_col,
            "left",
        )
        .withColumn(
            "bucket", F.when(F.col("bounds").isNotNull(), checked)
        )
        .drop("bounds")
    )


# --------------------------------------------------------------------------
# BM25 lexical retrieval — top-k documents per query
# --------------------------------------------------------------------------
def bm25_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    max_postings_per_term: int | None = None,
    exclude_self: bool = False,
) -> DataFrame:
    """Okapi BM25 top-k retrieval: (query_id, doc_id, score, rank) — the
    lexical half of a retrieval stack (`similarity.*` is the dense half;
    production RAG fuses both).  Lucene-style non-negative idf
    ``ln(1 + (N − df + 0.5)/(df + 0.5))`` and saturation
    ``tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl))``; score sums over the
    query's DISTINCT terms; ties break by doc id ascending.

    Plan shape at scale: the corpus tokenizes ONCE into a postings table
    (doc, term, tf) + per-doc lengths — at 100 TB you persist that table
    and every query batch reuses it (`bm25_postings` builds it
    standalone).  Queries are a small relation: their term lists
    broadcast-join the postings on term (no corpus shuffle), partial
    aggregation sums scores map-side, and one window per query takes the
    top-k.  All JVM expressions — no UDF anywhere.

    ``max_postings_per_term`` caps each term's posting list to its top-N
    docs by (tf desc, doc asc) — "champion lists" (Manning et al., IIR
    §7.1.3), the classic defense against stop-word key skew: a term that
    appears in half the corpus would otherwise route half the corpus
    through one join key.  idf keeps the TRUE document frequency, and
    each surviving (term, doc) contribution is computed identically —
    but a doc outside some matched term's champions loses that term's
    contribution, so capped score ≤ uncapped score, with equality iff
    the doc is a champion for every matched term (high-tf docs, i.e. the
    ones that contend for the top ranks, are).  The standard
    accepted-approximation trade: bounded key fan-out for exact scores
    on the contenders."""
    postings, stats = bm25_postings(corpus, id_col, text_col)
    if max_postings_per_term is not None:
        # salted two-phase cap: phase 1 takes each (term, salt-shard)'s
        # top-N, phase 2 merges shards and takes the final top-N — EXACT
        # (any of the union's top-N is in its own shard's top-N, the
        # minhash posting-cap argument), and the hot stop-word term's
        # postings spread over n_salts tasks instead of one.  The plain
        # single window gets only a Final WindowGroupLimit (no map-side
        # Partial below the term exchange, observed on the physical
        # plan), so without the salt the full posting list of a term in
        # half the corpus lands on one task before truncation — the
        # exact skew the cap exists to bound.
        n_salts = 16
        wp1 = W.partitionBy(
            "term", F.pmod(F.xxhash64("doc"), F.lit(n_salts))
        ).orderBy(F.col("tf").desc(), F.col("doc").asc())
        wp2 = W.partitionBy("term").orderBy(
            F.col("tf").desc(), F.col("doc").asc()
        )
        postings = (
            postings.withColumn("_pr", F.row_number().over(wp1))
            .filter(F.col("_pr") <= max_postings_per_term)
            .withColumn("_pr", F.row_number().over(wp2))
            .filter(F.col("_pr") <= max_postings_per_term)
            .drop("_pr")
        )
    return _bm25_score(
        postings, stats, queries, id_col=id_col, query_id_col=query_id_col,
        query_text_col=query_text_col, k=k, k1=k1, b=b,
        exclude_self=exclude_self,
    )


def _bm25_score(
    postings: DataFrame,
    stats: DataFrame,
    queries: DataFrame,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    exclude_self: bool = False,
) -> DataFrame:
    """Shared BM25 scoring tail: broadcast the query terms onto a
    postings frame (doc, term, tf, dl, df) + 1-row stats (n_docs,
    avgdl), sum exact integer micro-unit contributions, rank per query.
    Used by both the one-shot ``bm25_topk`` and the maintained-index
    ``bm25_search_index`` so the two paths cannot diverge."""
    from mistral_ocr_pipeline_spark.functions.text_functions import norm_key_col

    qterms = (
        queries.select(
            F.col(query_id_col).alias("qid"),
            F.explode(
                F.array_distinct(
                    F.filter(
                        F.split(norm_key_col(F.col(query_text_col)), " "),
                        lambda t: t != "",
                    )
                )
            ).alias("term"),
        )
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tfn = (F.col("tf") * F.lit(k1 + 1.0)) / (
        F.col("tf")
        + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    # per-term contributions are rounded to 1e-6 BEFORE summation (exact
    # integer micro-units): double addition is order-dependent at the ULP
    # level, and aggregation order varies with partitioning — this keeps
    # the score bit-identical across cluster sizes and SQL engines
    micro = F.round(idf * tfn * F.lit(1e6), 0).cast("long")
    scored = (
        postings.join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("qid", "doc")
        .agg(F.round(F.sum(micro) / F.lit(1e6), 6).alias("score"))
    )
    if exclude_self:
        # hard-negative mining: the query IS a document (same id space)
        # and its own row must not count as a retrieved negative — drop
        # it BEFORE ranking so ranks stay dense
        scored = scored.filter(F.col("qid") != F.col("doc"))
    w = W.partitionBy("qid").orderBy(F.col("score").desc(), F.col("doc").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias(query_id_col),
            F.col("doc").alias(id_col),
            "score",
            "rank",
        )
    )


def bm25_postings(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """The reusable BM25 index: a postings DataFrame (doc, term, tf, dl,
    df) and a 1-row stats DataFrame (n_docs, avgdl).  ``dl`` counts a
    doc's non-empty normalized tokens; ``n_docs``/``avgdl`` cover ALL
    corpus rows (an empty doc contributes dl = 0 to avgdl, matching its
    inability to match any term).  Persist the postings at scale — the
    corpus never re-tokenizes per query batch."""
    from mistral_ocr_pipeline_spark.functions.text_functions import norm_key_col

    toks = F.filter(
        F.split(norm_key_col(F.col(text_col)), " "), lambda t: t != ""
    )
    base = corpus.select(F.col(id_col).alias("doc"), toks.alias("_toks"))
    # stats come off the DOC-level frame — one map-side aggregate to a
    # single row, never a shuffle of the exploded term stream
    stats = base.select(F.size("_toks").alias("dl")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        base.select(
            "doc", F.explode("_toks").alias("term"), F.size("_toks").alias("dl")
        )
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    return tf.join(dfreq, "term"), stats


def bm25_index_build(
    corpus: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """The PERSISTABLE, MERGEABLE form of the BM25 index — what a daily
    ingest job stores instead of re-tokenizing the whole corpus per
    batch (the lexical sibling of ``dedup.build_minhash_index`` /
    ``build_substring_index``).

    Two frames of purely additive facts:
      * postings ``(doc, term, tf, dl)`` — doc-LOCAL facts only.  A new
        batch (disjoint doc ids) contributes disjoint rows, so merge is
        a plain union; ``df`` is deliberately NOT stored — it is a
        derived per-term count that would need read-modify-write on
        every append.
      * stats ``(n_docs, sum_dl)`` — one row, both columns additive
        (``avgdl`` is derived as sum_dl/n_docs at read time; storing the
        ratio would not merge).

    Because every stored fact is either row-disjoint or a sum, append ≡
    rebuild EXACTLY — the `bm25_index_append` driver query hash-proves
    it, and `text_bm25_incremental` proves search over the maintained
    index matches the one-shot `bm25_topk` score-for-score."""
    from mistral_ocr_pipeline_spark.functions.text_functions import norm_key_col

    toks = F.filter(
        F.split(norm_key_col(F.col(text_col)), " "), lambda t: t != ""
    )
    base = corpus.select(F.col(id_col).alias("doc"), toks.alias("_toks"))
    stats = base.select(F.size("_toks").alias("dl")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").cast("long").alias("sum_dl"),
    )
    postings = (
        base.select(
            "doc", F.explode("_toks").alias("term"), F.size("_toks").alias("dl")
        )
        .groupBy("doc", "term")
        .agg(F.count(F.lit(1)).alias("tf"), F.first("dl").alias("dl"))
    )
    return postings, stats


def bm25_index_append(
    index: tuple[DataFrame, DataFrame],
    batch: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """Merge a new batch into a persisted BM25 index WITHOUT touching
    history text: only the batch tokenizes; history contributes its
    already-stored postings rows and one stats row.  Both merges are
    lattice operations (row-disjoint union; column-wise sum), so the
    result is hash-identical to ``bm25_index_build`` over history ∪
    batch — the property the `bm25_index_append` oracle certifies."""
    postings, stats = index
    b_postings, b_stats = bm25_index_build(batch, id_col, text_col)
    merged_stats = (
        stats.unionByName(b_stats)
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("sum_dl").cast("long").alias("sum_dl"),
        )
    )
    return postings.unionByName(b_postings), merged_stats


def bm25_search_index(
    index: tuple[DataFrame, DataFrame],
    queries: DataFrame,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    exclude_self: bool = False,
) -> DataFrame:
    """BM25 top-k over a maintained index: derive ``df`` (one map-side
    combinable groupBy over 8-byte-ish (term, doc) rows — never text)
    and ``avgdl`` from the stored additive facts, then reuse the exact
    ``_bm25_score`` tail `bm25_topk` uses, so maintained-index search
    and one-shot search are the same arithmetic by construction."""
    postings, stats = index
    dfreq = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    read_stats = stats.select(
        "n_docs",
        (F.col("sum_dl") / F.col("n_docs")).alias("avgdl"),
    )
    return _bm25_score(
        postings.join(dfreq, "term"), read_stats, queries,
        id_col=id_col, query_id_col=query_id_col,
        query_text_col=query_text_col, k=k, k1=k1, b=b,
        exclude_self=exclude_self,
    )


def skipgram_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 2,
    subsample_t: float = 1e-3,
    salt: str = "sgp",
) -> DataFrame:
    """Skip-gram co-occurrence extraction — the word2vec/GloVe training
    feed: frequent-word subsampling (Mikolov et al. 2013: keep a token
    occurrence with probability ``sqrt(t/f)``, f = corpus frequency
    ratio), then every (center, context) pair within ±``window`` over
    the COMPACTED sequence (positions re-ranked after drops, exactly
    like the C implementation windows over the surviving stream),
    rolled up to ``(center, context, n_pairs, glove_micro)`` where
    glove_micro = Σ round(10^6 / distance) — GloVe's 1/d weighting in
    exact integer micro-units.

    Determinism: the keep draw is u = md5(salt‖id‖pos)/2^32 — a pure
    function of the token occurrence, identical at every cluster size
    and replayable in SQL; both sides of the keep comparison round to
    6 dp (the Pareto-gate discipline); sqrt is IEEE-correctly-rounded in
    both engines (never libm pow).

    Scale shape: one posexplode scan; the frequency join keys on the
    VOCABULARY; compaction + pairing are two conv-of-doc-keyed exchanges
    (window then self-join on the same key, per-doc bounded); the rollup
    collapses map-side to ≤|vocab|² rows — the corpus-sized pair stream
    never reaches a single task or the driver."""
    from mistral_ocr_pipeline_spark.functions.text_functions import norm_key_col

    toks = F.filter(
        F.split(norm_key_col(F.col(text_col)), " "), lambda t: t != ""
    )
    occ = df.select(
        F.col(id_col).alias("doc"), F.posexplode(toks).alias("pos", "w")
    )
    freq = occ.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").cast("double").alias("n_tok"))
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt + ":"),
                        F.col("doc").cast("string"),
                        F.lit(":"),
                        F.col("pos").cast("string"),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    keep_p = F.round(
        F.least(
            F.lit(1.0),
            F.sqrt(F.lit(float(subsample_t)) / (F.col("c") / F.col("n_tok"))),
        ),
        6,
    )
    kept = (
        occ.join(freq, "w")
        .crossJoin(F.broadcast(total))
        .filter(F.round(u, 6) < keep_p)
    )
    cw = W.partitionBy("doc").orderBy("pos")
    compact = kept.select(
        "doc", "w", (F.row_number().over(cw) - 1).alias("np")
    )
    a, b = compact.alias("a"), compact.alias("b")
    pairs = a.join(
        b,
        (F.col("a.doc") == F.col("b.doc"))
        & (F.col("b.np") != F.col("a.np"))
        & (F.col("b.np") >= F.col("a.np") - window)
        & (F.col("b.np") <= F.col("a.np") + window),
    ).select(
        F.col("a.w").alias("center"),
        F.col("b.w").alias("context"),
        F.abs(F.col("b.np") - F.col("a.np")).alias("d"),
    )
    return pairs.groupBy("center", "context").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.round(F.lit(1e6) / F.col("d"), 0).cast("long"))
        .cast("long")
        .alias("glove_micro"),
    )


def negative_sampling_table(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The word2vec/NCE negative-sampling table: each vocabulary word
    weighted ∝ count^0.75 (Mikolov et al. 2013 — the exponent that
    damps stop-word dominance without flattening to uniform), laid out
    as an inverse-CDF: ``(word, cnt, w_micro, cum_start, total_micro)``
    where a sampler draws u ∈ [0, total_micro) and binary-searches
    ``cum_start`` — the contiguous-range layout a trainer broadcasts.

    Engine-exact arithmetic: ``c^0.75 = sqrt(c · sqrt(c))`` — two
    correctly-rounded IEEE sqrts instead of ``pow`` (libm pow differs
    across engines at the ULP level; sqrt never does — the same trick
    the temperature-mix shares use), rounded to integer micro-units per
    word BEFORE any summation, so the cumulative offsets are exact
    BIGINT facts, bit-identical across partitionings and engines.

    Scale shape: one combinable word-count groupBy (the only
    corpus-sized shuffle); the weight map is per-row; the cumulative
    window runs over the VOCABULARY in deterministic (cnt desc, word)
    order."""
    from mistral_ocr_pipeline_spark.functions.text_functions import norm_key_col

    words = (
        df.select(
            F.explode(
                F.filter(
                    F.split(norm_key_col(F.col(text_col)), " "),
                    lambda t: t != "",
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    c = F.col("cnt").cast("double")
    w_micro = F.round(F.sqrt(c * F.sqrt(c)) * F.lit(1e6), 0).cast("long")
    weighted = words.withColumn("w_micro", w_micro)
    win = W.orderBy(F.col("cnt").desc(), F.col("word").asc()).rowsBetween(
        W.unboundedPreceding, -1
    )
    return (
        weighted.withColumn(
            "cum_start",
            F.coalesce(F.sum("w_micro").over(win), F.lit(0)).cast("long"),
        )
        .withColumn(
            "total_micro",
            F.sum("w_micro").over(
                W.partitionBy().rowsBetween(
                    W.unboundedPreceding, W.unboundedFollowing
                )
            ).cast("long"),
        )
        .select("word", "cnt", "w_micro", "cum_start", "total_micro")
    )


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Pointwise-mutual-information collocation mining: the top-k
    adjacent word pairs whose co-occurrence beats independence —
    ``PMI(a,b) = ln( p(ab) / (p(a)·p(b)) )`` (Church & Hanks 1990), the
    statistic behind phrase-vocabulary induction (word2vec's phrase
    pass, tokenizer merge seeding) and boilerplate-collocation review.
    ``min_count`` floors the bigram count — PMI famously explodes on
    hapax pairs, so unfloored ranks are noise.

    Output: (w1, w2, pair_count, c1, c2, pmi_micro) — the PMI in exact
    integer micro-units (one `round` over one `ln`, the same
    engine-identical discipline the BM25 scores use).

    Scale shape: bigram and unigram streams each collapse in ONE
    map-side-combinable groupBy; totals are 1-row broadcasts; the
    unigram join-back keys on words (vocabulary-sized, not corpus-sized);
    the final top-k window runs over floored PAIRS only.  Ties break by
    (w1, w2) ascending."""
    from mistral_ocr_pipeline_spark.functions.text_functions import norm_key_col

    toks = F.filter(
        F.split(norm_key_col(F.col(text_col)), " "), lambda t: t != ""
    )
    base = df.select(toks.alias("_toks"))
    uni = (
        base.select(F.explode("_toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    n_uni = uni.agg(F.sum("c").cast("double").alias("n_u"))
    pairs = (
        base.select(
            F.explode(
                F.zip_with(
                    F.slice(F.col("_toks"), 1, F.greatest(F.size("_toks") - 1, F.lit(0))),
                    F.slice(F.col("_toks"), 2, F.greatest(F.size("_toks") - 1, F.lit(0))),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            ).alias("p")
        )
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("pair_count"))
    )
    n_pairs = pairs.agg(F.sum("pair_count").cast("double").alias("n_b"))
    scored = (
        pairs.filter(F.col("pair_count") >= min_count)
        .join(uni.select(F.col("w").alias("w1"), F.col("c").alias("c1")), "w1")
        .join(uni.select(F.col("w").alias("w2"), F.col("c").alias("c2")), "w2")
        .crossJoin(F.broadcast(n_pairs))
        .crossJoin(F.broadcast(n_uni))
        .select(
            "w1", "w2", "pair_count", "c1", "c2",
            F.round(
                F.log(
                    (F.col("pair_count") / F.col("n_b"))
                    / ((F.col("c1") / F.col("n_u")) * (F.col("c2") / F.col("n_u")))
                )
                * F.lit(1e6),
                0,
            ).cast("long").alias("pmi_micro"),
        )
    )
    w = W.orderBy(
        F.col("pmi_micro").desc(), F.col("w1").asc(), F.col("w2").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("w1", "w2", "pair_count", "c1", "c2", "pmi_micro", "rank")
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    ks: tuple[int, ...] = (100, 1000, 10000),
) -> DataFrame:
    """Vocabulary-coverage curve: for each candidate vocab size k, what
    fraction of ALL corpus token occurrences the top-k most frequent
    words cover — the number that sizes a tokenizer's vocab budget and
    predicts its OOV rate before training one (Zipf's law says coverage
    grows ~log k; this measures the actual corpus).

    Output: one row per k — (vocab_k, n_types_used, covered_tokens,
    total_tokens, coverage_micro), where coverage is an exact BIGINT
    micro-unit floor division.

    Scale shape: the corpus collapses to its WORD-FREQUENCY table in one
    map-side-combinable groupBy (the only corpus-sized shuffle); the
    ranking window then runs over the vocabulary — millions of rows, not
    the corpus — and the k cuts are a tiny rollup.  Ties at the rank
    boundary break deterministically by (count desc, word asc)."""
    from mistral_ocr_pipeline_spark.functions.text_functions import norm_key_col

    words = (
        df.select(
            F.explode(
                F.filter(
                    F.split(norm_key_col(F.col(text_col)), " "),
                    lambda t: t != "",
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = W.orderBy(F.col("cnt").desc(), F.col("word").asc())
    ranked = words.select(
        "cnt", F.row_number().over(w).alias("rank")
    )
    total = ranked.agg(
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("total_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
    )
    cuts = None
    for k in ks:
        cut = (
            ranked.filter(F.col("rank") <= k)
            .agg(
                F.lit(k).cast("long").alias("vocab_k"),
                F.count(F.lit(1)).cast("long").alias("n_types_used"),
                F.sum("cnt").cast("long").alias("covered_tokens"),
            )
        )
        cuts = cut if cuts is None else cuts.unionByName(cut)
    return (
        cuts.crossJoin(F.broadcast(total))
        .select(
            "vocab_k",
            "n_types_used",
            F.coalesce(F.col("covered_tokens"), F.lit(0)).alias(
                "covered_tokens"
            ),
            "total_tokens",
            F.expr(
                "CASE WHEN total_tokens = 0 THEN 0 "
                "ELSE coalesce(covered_tokens, 0) * 1000000 DIV total_tokens "
                "END"
            ).cast("long").alias("coverage_micro"),
        )
    )


# --------------------------------------------------------------------------
# DSIR — data selection via importance resampling (hashed n-gram model)
# --------------------------------------------------------------------------
def dsir_logweights(
    corpus: DataFrame,
    target: "DataFrame | str",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 256,
) -> DataFrame:
    """Importance log-weights for data selection (DSIR, Xie et al. 2023):
    score each raw-corpus document by how much more likely its hashed
    n-gram features are under a TARGET distribution (the high-quality
    corpus you wish you had more of) than under the raw corpus itself —
    then resample the raw corpus by weight (`hash_sample` on a weight
    threshold, or top-fraction).  Returns (id, n_grams, logweight);
    docs with no tokens emit no row (no features → no evidence).

    Model: word unigrams + bigrams, hashed into ``n_buckets`` buckets
    (md5-derived so the bucketing replays in any engine; a production
    run would swap ``F.xxhash64(g) % n_buckets`` — ~5× cheaper per gram,
    same plan, no SQL twin); bucket
    probabilities add-1 smoothed over each distribution; logweight =
    Σ_grams ln(p_target[b]/p_raw[b]), each gram's contribution in exact
    integer micro-units (order-independent sum, cf. `bm25_topk`).

    ``target`` is either its own DataFrame (same schema slice) or — the
    common case, target ⊆ corpus — the NAME of a boolean column on
    ``corpus`` marking target membership: then both bucket distributions
    come off ONE gram pass (one `sum(flag)` beside the count), saving
    the re-shingle of the target slice (measured 1.12× end-to-end on
    sf0.1 with the en slice as target — the saving scales with the
    target's share of the corpus, since the scoring pass dominates).

    Plan shape at scale: both bucket-count aggregations collapse the
    gram streams to ≤ n_buckets rows map-side (the gram stream itself
    never shuffles for counting); the probability table is ≤ n_buckets
    rows and broadcasts; scoring is the gram stream joined to that
    broadcast and ONE groupBy(doc) — a single corpus-sized shuffle,
    well-keyed on doc id.  All JVM expressions, no UDF."""
    spark = corpus.sparkSession
    flag_col = target if isinstance(target, str) else None

    def grams(df: DataFrame, carry: str | None = None) -> DataFrame:
        from mistral_ocr_pipeline_spark.functions.text_functions import norm_key_col

        toks = F.filter(
            F.split(norm_key_col(F.col(text_col)), " "), lambda t: t != ""
        )
        carry_cols = [F.col(carry)] if carry else []
        base = df.select(F.col(id_col).alias("id"), toks.alias("_ts"), *carry_cols)
        # sequence(1, 0) DESCENDS in Spark — guard short docs explicitly
        bigrams = F.when(
            F.size("_ts") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("_ts") - 1),
                lambda i: F.concat_ws(
                    " ", F.element_at("_ts", i), F.element_at("_ts", i + 1)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        g = base.select(
            "id", F.explode(F.concat("_ts", bigrams)).alias("g"), *carry_cols
        )
        return g.select(
            "id",
            F.pmod(
                F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("long"),
                F.lit(n_buckets),
            ).alias("b"),
            *carry_cols,
        )

    if flag_col is not None:
        raw_g = grams(corpus, carry=flag_col)
        both = raw_g.groupBy("b").agg(
            F.count(F.lit(1)).alias("cr"),
            F.sum(F.col(flag_col).cast("long")).alias("ct"),
        )
        raw_cnt = both.select("b", "cr")
        tgt_cnt = both.select("b", "ct")
        raw_g = raw_g.select("id", "b")
    else:
        raw_g = grams(corpus)
        tgt_g = grams(target)
        raw_cnt = raw_g.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
        tgt_cnt = tgt_g.groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    totals = (
        raw_cnt.agg(F.sum("cr").alias("tr"))
        .crossJoin(tgt_cnt.agg(F.sum("ct").alias("tt")))
    )
    spine = spark.range(n_buckets).select(F.col("id").alias("b"))
    micro = F.round(
        (
            F.log(
                (F.coalesce(F.col("ct"), F.lit(0)) + 1)
                / (F.col("tt") + F.lit(float(n_buckets)))
            )
            - F.log(
                (F.coalesce(F.col("cr"), F.lit(0)) + 1)
                / (F.col("tr") + F.lit(float(n_buckets)))
            )
        )
        * F.lit(1e6),
        0,
    ).cast("long")
    probs = (
        spine.join(raw_cnt, "b", "left")
        .join(tgt_cnt, "b", "left")
        .crossJoin(F.broadcast(totals))
        .select("b", micro.alias("micro"))
    )
    return (
        raw_g.join(F.broadcast(probs), "b")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.round(F.sum("micro") / F.lit(1e6), 6).alias("logweight"),
        )
        .select(F.col("id").alias(id_col), "n_grams", "logweight")
    )


def bigram_surprisal(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """(id, n_pairs, surprisal) — mean conditional surprisal
    −ln P(wᵢ | wᵢ₋₁) under the corpus's own add-1-smoothed bigram LM:
    P(cur | prev) = (c(prev,cur) + 1) / (ctx(prev) + V), where ctx(prev)
    is prev's context count (occurrences followed by anything) and V the
    corpus vocabulary size.  One LM-order up from `unigram_surprisal` —
    the closest in-engine stand-in for CCNet's KenLM perplexity signal:
    shuffled-word salad scores high even when every word is common,
    which the unigram proxy cannot see.

    Determinism: each bigram's surprisal is rounded to integer
    MICRO-UNITS in the probability table (bigram-vocabulary-sized, not
    corpus-sized), so the per-doc aggregate is an order-independent
    BIGINT sum — the same cross-engine trick as `dsir_logweights` /
    `bm25_topk`.  Plan shape: two vocabulary-sized groupBys collapse
    map-side; the probability table broadcasts; scoring is the pair
    stream joined to that broadcast plus ONE corpus shuffle keyed on doc
    id.  Docs with < 2 tokens emit no row (no bigrams → no evidence).
    At 100 TB the bigram table outgrows a broadcast — swap the broadcast
    hint for a shuffle hash join on (prev, cur); the rest of the plan is
    unchanged."""
    from mistral_ocr_pipeline_spark.functions.text_functions import norm_key_col

    toks = F.filter(
        F.split(norm_key_col(F.col(text_col)), " "), lambda t: t != ""
    )
    base = df.select(F.col(id_col).alias("id"), toks.alias("_ts"))
    # sequence(1, 0) DESCENDS in Spark — guard short docs explicitly
    pair_arr = F.when(
        F.size("_ts") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("_ts") - 1),
            lambda i: F.struct(
                F.element_at("_ts", i).alias("prev"),
                F.element_at("_ts", i + 1).alias("cur"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
    pairs = base.select("id", F.explode(pair_arr).alias("p")).select(
        "id", F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur")
    )
    c2 = pairs.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c2"))
    ctx = c2.groupBy("prev").agg(F.sum("c2").alias("ctx"))
    vocab = (
        base.select(F.explode("_ts").alias("t"))
        .agg(F.count_distinct("t").cast("double").alias("v"))
    )
    micro = F.round(
        -F.log((F.col("c2") + 1) / (F.col("ctx") + F.col("v"))) * F.lit(1e6), 0
    ).cast("long")
    table = (
        c2.join(ctx, "prev")
        .crossJoin(F.broadcast(vocab))
        .select("prev", "cur", micro.alias("micro"))
    )
    return (
        pairs.join(F.broadcast(table), ["prev", "cur"])
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.sum("micro") / F.lit(1e6) / F.count(F.lit(1)), 6).alias(
                "surprisal"
            ),
        )
        .select(F.col("id").alias(id_col), "n_pairs", "surprisal")
    )


def nb_quality_classifier(
    df: DataFrame,
    id_col: str,
    label_col: str,
    train_col: str,
    text_col: str = "text",
    n_buckets: int = 256,
) -> DataFrame:
    """Binary multinomial Naive Bayes over hashed unigram+bigram
    features — the fastText-style model-based quality/domain filter
    (CCNet's Wikipedia-vs-crawl classifier, FineWeb-Edu's distilled
    educational scorer): train on the rows flagged by boolean
    ``train_col`` against boolean ``label_col``, then score EVERY row.
    The production shape this demonstrates: an expensive upstream signal
    (LM perplexity, an LLM judge, human ratings) labels a small seed
    set; the cheap linear model distills it and runs at full corpus
    scale as plain scan+join relational algebra.

    Model, all integer micro-units so every sum is order-independent
    across engines (cf. `dsir_logweights`):
      w(b)  = round((ln((n₊(b)+1)/(T₊+V)) − ln((n₋(b)+1)/(T₋+V)))·1e6)
      prior = round((ln(N₊+1) − ln(N₋+1))·1e6)
      score(d) = prior + Σ_{grams g∈d} w(bucket(g)),  pred = score > 0
    where n±(b) are train-split gram counts per hashed bucket, T± their
    totals, V = ``n_buckets``, N± the train-split DOC counts (add-1 so
    an empty class cannot produce ln 0).

    Plan shape at scale: the gram stream collapses map-side to
    ≤ n_buckets weight rows; the weight table and the 1-row prior
    broadcast; scoring is the gram stream joined to that broadcast plus
    ONE corpus shuffle keyed on doc id, then a broadcast-safe join back
    to the (id, label, train) spine — docs with no grams survive with
    score = prior (no evidence → prior).  Zero UDFs, zero driver-side
    actions; bucketing is md5-derived so the ENTIRE model — training
    included — replays in any engine (a production run would swap
    ``xxhash64`` for md5, same plan, no SQL twin).

    Input contract: ``df`` is read in FOUR passes (train-split gram
    counts, priors, scoring, final spine join) — persist or materialize
    it when its lineage is expensive, or Catalyst re-derives that
    lineage per reference (see the `text_nb_quality` query, which
    persists its surprisal-labeled spine for exactly this reason)."""
    spark = df.sparkSession
    from mistral_ocr_pipeline_spark.functions.text_functions import norm_key_col

    toks = F.filter(
        F.split(norm_key_col(F.col(text_col)), " "), lambda t: t != ""
    )
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(label_col).cast("boolean").alias("label"),
        F.col(train_col).cast("boolean").alias("is_train"),
        toks.alias("_ts"),
    )
    bigrams = F.when(
        F.size("_ts") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("_ts") - 1),
            lambda i: F.concat_ws(
                " ", F.element_at("_ts", i), F.element_at("_ts", i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    grams = base.select(
        "id", "label", "is_train", F.explode(F.concat("_ts", bigrams)).alias("g")
    ).select(
        "id",
        "label",
        "is_train",
        F.pmod(
            F.conv(F.substring(F.md5("g"), 1, 8), 16, 10).cast("long"),
            F.lit(n_buckets),
        ).alias("b"),
    )
    # train-split bucket counts for both classes off ONE gram pass
    cnt = (
        grams.filter("is_train")
        .groupBy("b")
        .agg(
            F.sum(F.col("label").cast("long")).alias("np"),
            F.sum((~F.col("label")).cast("long")).alias("nn"),
        )
    )
    totals = cnt.agg(
        F.sum("np").alias("tp"), F.sum("nn").alias("tn")
    )
    priors = base.filter("is_train").agg(
        F.round(
            (
                F.log(F.sum(F.col("label").cast("long")) + 1)
                - F.log(F.sum((~F.col("label")).cast("long")) + 1)
            )
            * F.lit(1e6),
            0,
        )
        .cast("long")
        .alias("prior")
    )
    spine = spark.range(n_buckets).select(F.col("id").alias("b"))
    v = float(n_buckets)
    w_micro = F.round(
        (
            F.log((F.coalesce(F.col("np"), F.lit(0)) + 1) / (F.col("tp") + F.lit(v)))
            - F.log(
                (F.coalesce(F.col("nn"), F.lit(0)) + 1) / (F.col("tn") + F.lit(v))
            )
        )
        * F.lit(1e6),
        0,
    ).cast("long")
    weights = (
        spine.join(cnt, "b", "left")
        .crossJoin(F.broadcast(totals))
        .select("b", w_micro.alias("w"))
    )
    doc_sums = (
        grams.join(F.broadcast(weights), "b")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_grams"), F.sum("w").alias("s"))
    )
    total = F.col("prior") + F.coalesce(F.col("s"), F.lit(0))
    return (
        base.select("id", "label", "is_train")
        .join(doc_sums, "id", "left")
        .crossJoin(F.broadcast(priors))
        .select(
            F.col("id").alias(id_col),
            "is_train",
            "label",
            (total > 0).alias("pred"),
            F.coalesce(F.col("n_grams"), F.lit(0)).alias("n_grams"),
            F.round(total / F.lit(1e6), 6).alias("score"),
        )
    )


# --------------------------------------------------------------------------
# Quality gate funnel — Gopher-style rules with first-fail attribution
# --------------------------------------------------------------------------
def _nonempty_words(t: Column) -> Column:
    """Whitespace words, empties dropped — DuckDB
    ``list_filter(string_split_regex(t, '\\s+'), x -> x <> '')``."""
    return F.filter(F.split(t, r"\s+"), lambda x: x != "")


def _char_total(items: Column) -> Column:
    return F.aggregate(
        items, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
    )


def _dup_char_count(items: Column) -> Column:
    """Σ len(x) over NON-FIRST occurrences of each repeated value — i.e.
    Σ (count−1)·len(value) — via one sorted-adjacency fold (map-only; the
    relational twin is a GROUP BY value).  The numerator of Gopher's
    duplicate-line/paragraph CHARACTER fractions."""
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("dup"),
    )
    return F.aggregate(
        F.array_sort(items),
        acc0,
        lambda a, x: F.struct(
            x.alias("prev"),
            (
                a["dup"]
                + F.when(x.eqNullSafe(a["prev"]), F.length(x)).otherwise(
                    F.lit(0)
                )
            ).alias("dup"),
        ),
        lambda a: a["dup"],
    )


def _grams_arr(words: Column, n: int) -> Column:
    """Space-joined word ``n``-grams (empty when the doc is shorter than
    ``n`` — guarded because Spark's ``sequence(0, -1)`` DESCENDS)."""
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(words) - n),
            lambda p: F.array_join(F.slice(words, p + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _top_gram_chars(words: Column, n: int) -> Column:
    """count × len of the MOST FREQUENT n-gram (ties → lexicographically
    smallest, the sorted fold's first max ≡ SQL ``row_number() ORDER BY
    cnt DESC, gram``) — the numerator of Gopher's top-n-gram character
    fraction.  Gram length includes its inner spaces."""
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.lit(0).cast("long").alias("bestrun"),
        F.lit(0).cast("long").alias("bestlen"),
    )

    def step(a, x):
        run = F.when(x.eqNullSafe(a["prev"]), a["run"] + 1).otherwise(
            F.lit(1).cast("long")
        )
        better = run > a["bestrun"]
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.when(better, run).otherwise(a["bestrun"]).alias("bestrun"),
            F.when(better, F.length(x).cast("long"))
            .otherwise(a["bestlen"])
            .alias("bestlen"),
        )

    return F.aggregate(
        F.array_sort(_grams_arr(words, n)),
        acc0,
        step,
        lambda a: a["bestrun"] * a["bestlen"],
    )


def _dup_gram_cover_chars(words: Column, n: int) -> Column:
    """Σ len(word) over word positions covered by ANY n-gram that occurs
    ≥2 times in the document (interval union over [p, p+n−1], counting
    each position once — Gopher's "taking care not to count characters
    twice") — the numerator of the duplicate-n-gram character fraction,
    over word characters (whitespace excluded from both numerator and
    the `_char_total` denominator; a fixed convention shared with the
    SQL oracle)."""
    g = _grams_arr(words, n)
    acc0 = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).cast("long").alias("run"),
        F.array().cast("array<string>").alias("dups"),
    )
    dups = F.aggregate(
        F.array_sort(g),
        acc0,
        lambda a, x: F.struct(
            x.alias("prev"),
            F.when(x.eqNullSafe(a["prev"]), a["run"] + 1)
            .otherwise(F.lit(1).cast("long"))
            .alias("run"),
            F.when(
                x.eqNullSafe(a["prev"]) & (a["run"] == 1),
                F.concat(a["dups"], F.array(x)),
            )
            .otherwise(a["dups"])
            .alias("dups"),
        ),
        lambda a: a["dups"],
    )
    hit_starts = F.filter(
        F.transform(
            g, lambda x, i: F.when(F.array_contains(dups, x), i).otherwise(F.lit(-1))
        ),
        lambda v: v >= 0,
    )
    covered = F.array_distinct(
        F.flatten(F.transform(hit_starts, lambda p: F.sequence(p, p + n - 1)))
    )
    return F.aggregate(
        covered,
        F.lit(0).cast("long"),
        lambda a, i: a + F.length(F.element_at(words, i + 1)),
    )


def c4_clean(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    blocklist: tuple[str, ...] = (),
    min_words: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """C4 cleaning rules (Raffel et al. 2020 §2.2) — the line- and
    page-level heuristics the original C4 corpus was built with,
    complementing `quality_funnel` (Gopher's document-statistics gate):

    * keep only lines ending in a terminal punctuation mark
      (``. ! ? "``) AND containing at least ``min_words`` words;
    * drop the page if the CLEANED text has fewer than
      ``min_sentences`` sentences (terminal-punctuation runs);
    * drop the page if the RAW text contains "lorem ipsum", a curly
      brace ``{`` (code), or any ``blocklist`` phrase
      (case-insensitive substring, the paper's bad-words rule).

    Pure array/string expressions, map-only, ZERO shuffle — at 100 TB
    this is a scan-level filter like the funnel, and the per-rule
    columns give first-fail-style attribution (which rule cost which
    page) so the gate is auditable, not just a boolean.

    Output: (id, clean_text, n_lines, n_kept_lines, n_sentences,
    has_blocklist, has_lorem, has_brace, keep).  NULL text survives as
    an empty dropped page (coalesce-to-'' like the dedup family)."""
    raw = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.transform(F.split(raw, "\n"), lambda x: F.trim(x))
    n_words = lambda l: F.size(F.filter(F.split(l, " "), lambda x: x != ""))
    kept = F.filter(
        lines,
        lambda l: l.rlike('[.!?"]$') & (n_words(l) >= min_words),
    )
    clean = F.array_join(kept, "\n")
    low = F.lower(raw)
    has_block = F.lit(False)
    for w in blocklist:
        has_block = has_block | F.contains(low, F.lit(w.lower()))
    out = df.select(
        F.col(id_col).alias("id"),
        clean.alias("clean_text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        F.regexp_count(clean, F.lit("[.!?]+")).cast("long").alias("n_sentences"),
        has_block.alias("has_blocklist"),
        F.contains(low, F.lit("lorem ipsum")).alias("has_lorem"),
        F.contains(raw, F.lit("{")).alias("has_brace"),
    )
    return out.withColumn(
        "keep",
        (F.col("n_sentences") >= min_sentences)
        & ~F.col("has_blocklist")
        & ~F.col("has_lorem")
        & ~F.col("has_brace"),
    )


TOP_GRAM_THRESHOLDS = {2: 0.20, 3: 0.18, 4: 0.16}
DUP_GRAM_THRESHOLDS = {5: 0.15, 6: 0.14, 7: 0.13, 8: 0.12, 9: 0.11, 10: 0.10}


def quality_funnel(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    word_len_bounds: tuple[float, float] = (3.0, 10.0),
    max_symbol_ratio: float = 0.1,
    max_bullet_frac: float = 0.9,
    max_ellipsis_frac: float = 0.3,
    min_alpha_frac: float = 0.8,
    min_stopword_hits: int = 2,
    max_dup_line_frac: float = 0.3,
    max_dup_line_char_frac: float = 0.2,
    max_dup_para_frac: float = 0.3,
    max_dup_para_char_frac: float = 0.2,
    top_gram_thresholds: dict[int, float] = TOP_GRAM_THRESHOLDS,
    dup_gram_thresholds: dict[int, float] = DUP_GRAM_THRESHOLDS,
) -> DataFrame:
    """Per-document gate verdict under the FULL published Gopher rule
    battery (Rae et al. 2021 Table A1) with first-fail attribution:

    length rules ('too_short', 'too_long'), mean-word-length bounds
    ('word_len'), symbol ratio ('symbol_heavy'), bullet-line and
    ellipsis-line ratios ('bullet_lines', 'ellipsis_lines' — >90% lines
    starting with a bullet / >30% ending in an ellipsis), alphabetic-
    word fraction ('low_alpha' — <80% of words contain a letter),
    stop-word evidence ('low_stopword'), then the repetition section:
    duplicate-line fraction and CHARACTER fraction ('dup_lines',
    'dup_line_chars'), duplicate-paragraph fraction and character
    fraction ('dup_paragraphs', 'dup_para_chars' — paragraphs split on
    blank lines), top-2/3/4-gram character mass ('top_ngram', paper
    thresholds 0.20/0.18/0.16), and duplicate-5..10-gram character
    coverage ('dup_ngram', thresholds 0.15…0.10, interval-union so no
    character is counted twice) — or 'keep'.  First-fail attribution is
    what makes a drop FUNNEL auditable: each rule's count states what it
    alone removed from what earlier rules passed, so rule costs add up
    to the total drop rate.  NOTE: a duplicated paragraph necessarily
    duplicates its lines, so the paragraph rules can only attribute when
    the line thresholds are looser — the funnel order (lines before
    paragraphs, the paper's listing order) is part of the contract.

    Character-fraction conventions (pinned for the SQL oracle): line /
    paragraph char fractions are over the total line / paragraph chars;
    top-gram mass is over the DOCUMENT length; dup-gram coverage is
    over total word chars (whitespace excluded on both sides).

    One map-only scan of pure expressions — sorted-adjacency folds
    replace per-doc GROUP BYs (`_dup_char_count`, `_top_gram_chars`,
    `_dup_gram_cover_chars`), so rows never shuffle and the whole funnel
    replays relationally in DuckDB."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_chars = F.length(t).cast("long")
    n_tokens = ws_token_count(t)
    n_stop = stopword_hits(t, "en")
    n_punct = F.regexp_count(t, F.lit(r"[^\w\s]")).cast("long")
    mean_word_len = n_chars / F.greatest(n_tokens, F.lit(1))
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    lines = F.filter(
        F.transform(F.split(t, "\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    paras = F.filter(
        F.transform(F.split(t, "\n\n"), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    words = _nonempty_words(t)
    n_words = F.greatest(F.size(words), F.lit(1))

    def dup_frac(items: Column) -> Column:
        return F.when(
            F.size(items) > 0,
            (F.size(items) - F.size(F.array_distinct(items)))
            / F.size(items),
        ).otherwise(F.lit(0.0))

    def dup_char_frac(items: Column) -> Column:
        total = _char_total(items)
        return F.when(
            total > 0, _dup_char_count(items) / total
        ).otherwise(F.lit(0.0))

    bullet_frac = F.when(
        F.size(lines) > 0,
        F.size(F.filter(lines, lambda x: x.rlike(r"^[-•*]"))) / F.size(lines),
    ).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(
        F.size(lines) > 0,
        F.size(F.filter(lines, lambda x: x.rlike(r"(\.\.\.|…)$")))
        / F.size(lines),
    ).otherwise(F.lit(0.0))
    alpha_frac = F.size(F.filter(words, lambda x: x.rlike("[a-zA-Z]"))) / n_words
    word_chars = F.greatest(_char_total(words), F.lit(1))

    top_ngram_fail = F.lit(False)
    for n, thr in sorted(top_gram_thresholds.items()):
        top_ngram_fail = top_ngram_fail | (
            _top_gram_chars(words, n) / F.greatest(n_chars, F.lit(1)) > thr
        )
    dup_ngram_fail = F.lit(False)
    for n, thr in sorted(dup_gram_thresholds.items()):
        dup_ngram_fail = dup_ngram_fail | (
            _dup_gram_cover_chars(words, n) / word_chars > thr
        )

    lo, hi = word_len_bounds
    verdict = (
        F.when(n_tokens < min_tokens, "too_short")
        .when(n_tokens > max_tokens, "too_long")
        .when((mean_word_len < lo) | (mean_word_len > hi), "word_len")
        .when(punct_ratio > max_symbol_ratio, "symbol_heavy")
        .when(bullet_frac > max_bullet_frac, "bullet_lines")
        .when(ellipsis_frac > max_ellipsis_frac, "ellipsis_lines")
        .when(alpha_frac < min_alpha_frac, "low_alpha")
        .when(n_stop < min_stopword_hits, "low_stopword")
        .when(dup_frac(lines) > max_dup_line_frac, "dup_lines")
        .when(dup_char_frac(lines) > max_dup_line_char_frac, "dup_line_chars")
        .when(dup_frac(paras) > max_dup_para_frac, "dup_paragraphs")
        .when(dup_char_frac(paras) > max_dup_para_char_frac, "dup_para_chars")
        .when(top_ngram_fail, "top_ngram")
        .when(dup_ngram_fail, "dup_ngram")
        .otherwise("keep")
    )
    return df.select(F.col(id_col).alias("id"), verdict.alias("verdict"))


def char_entropy(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """(id, n_chars, entropy) — Shannon entropy (nats) of the per-document
    CHARACTER distribution, the classic gibberish/keyboard-mash signal: a
    natural-language doc sits near the language's ~2.8-3.2 nat band,
    `aaaa...` collapses toward 0, and uniform random base64 pushes past 4.
    Complements the word-level battery (`quality_funnel` sees repeated
    TOKENS, entropy sees degenerate CHARACTER streams inside tokens).

    Determinism: each character's contribution (cnt/n)·ln(n/cnt) depends
    only on the two integers (cnt, n), is rounded to integer micro-units,
    and the per-doc total is a BIGINT sum — order-independent across
    partitionings and engines, the same trick as `dsir_logweights`.

    Plan shape: explode to a (id, char) stream, ONE map-side-combinable
    shuffle keyed on (id, char), then a second tiny per-id rollup — both
    keyed on the doc id, no corpus-wide state.  Empty/NULL texts emit
    (id, 0, 0.0): no evidence, zero entropy, never dropped."""
    chars = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), "")
        ).alias("ch"),
    ).filter(F.col("ch") != "")
    per_char = chars.groupBy("id", "ch").agg(F.count(F.lit(1)).alias("cnt"))
    n = F.sum("cnt").over(W.partitionBy("id"))
    term = F.round(
        (F.col("cnt") / n) * F.log(n / F.col("cnt")) * F.lit(1e6), 0
    ).cast("long")
    ent = (
        per_char.select("id", n.alias("n"), term.alias("t"))
        .groupBy("id")
        .agg(
            F.first("n").alias("n_chars"),
            F.round(F.sum("t") / F.lit(1e6), 6).alias("entropy"),
        )
    )
    spine = df.select(F.col(id_col).alias("id"))
    return (
        spine.join(ent, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n_chars"), F.lit(0)).alias("n_chars"),
            F.coalesce(F.col("entropy"), F.lit(0.0)).alias("entropy"),
        )
    )


def zipf_fit(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row corpus-health report: OLS fit of ln(frequency) against
    ln(rank) over the token rank-frequency table — Zipf's law says
    natural-language corpora sit near slope −1; a synthetic, templated,
    or boilerplate-flooded corpus bends the slope visibly.  Returns
    (vocab_size, total_tokens, zipf_slope, zipf_intercept).

    Determinism: rank is total-ordered by (freq DESC, token) so ties are
    stable; ln(rank)/ln(freq) are rounded to integer micro-units and the
    closed-form OLS moments (Σx, Σy, Σxy, Σx²) are summed as
    DECIMAL(38,0) — exact integer arithmetic in BOTH engines (a plain
    BIGINT Σxy overflows near ~10⁵ vocab; decimal keeps the slope exact
    at any corpus size).  Plan shape: one map-side-combined shuffle to
    the vocabulary-sized frequency table, a vocab-sized window for the
    rank, then a single 1-row aggregate — nothing corpus-sized moves
    after the first combine."""
    from mistral_ocr_pipeline_spark.functions.text_functions import norm_key_col

    toks = df.select(
        F.explode(
            F.filter(
                F.split(norm_key_col(F.col(text_col)), " "), lambda t: t != ""
            )
        ).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("f"))
    rank = F.row_number().over(W.orderBy(F.col("f").desc(), F.col("tok")))
    xy = freq.select(
        "f",
        F.round(F.log(rank.cast("double")) * F.lit(1e6), 0)
        .cast("decimal(38,0)")
        .alias("x"),
        F.round(F.log(F.col("f").cast("double")) * F.lit(1e6), 0)
        .cast("decimal(38,0)")
        .alias("y"),
    )
    mom = xy.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("f").alias("tot"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n, sx, sy, sxy, sxx = (F.col(c) for c in ("n", "sx", "sy", "sxy", "sxx"))
    # numerator/denominator stay EXACT integers (decimal(38,0)); only the
    # final division runs in IEEE double — the one operation both engines
    # implement bit-identically (decimal division scales differ; DuckDB
    # int128 division truncates)
    num = (n * sxy - sx * sy).cast("double")
    den = (n * sxx - sx * sx).cast("double")
    slope = num / den
    intercept = (
        sy.cast("double") / n.cast("double")
        - slope * (sx.cast("double") / n.cast("double"))
    ) / F.lit(1e6)
    return mom.select(
        F.col("n").cast("long").alias("vocab_size"),
        F.col("tot").cast("long").alias("total_tokens"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(intercept, 6).alias("zipf_intercept"),
    )


def corpus_kl_drift(
    df_a: DataFrame, df_b: DataFrame, text_col: str = "text"
) -> DataFrame:
    """One-row corpus-drift report between two corpora: add-1-smoothed
    token-distribution KL divergences in BOTH directions plus the vocab/
    mass counts behind them — the monitor a curation pipeline runs
    between today's batch and history, or train vs eval, before a silent
    distribution shift poisons a mix.  Returns (vocab_union, tokens_a,
    tokens_b, kl_ab, kl_ba) with p_x(t) = (c_x(t)+1)/(N_x+V) over the
    UNION vocabulary, so both directions are finite by construction.

    Determinism: each token's contribution p_a·ln(p_a/p_b) is a function
    of the five exact integers (c_a, c_b, N_a, N_b, V), rounded to
    integer micro-units; the total is a BIGINT sum — order-independent
    across engines and partitionings, the shared micro-unit discipline.

    Plan shape: each corpus collapses map-side to its vocabulary-sized
    frequency table; ONE full-outer join on token (vocab-sized); totals
    are 1-row broadcasts.  Nothing corpus-sized moves after the first
    combine."""
    from mistral_ocr_pipeline_spark.functions.text_functions import norm_key_col

    def freqs(df: DataFrame, side: str) -> DataFrame:
        return (
            df.select(
                F.explode(
                    F.filter(
                        F.split(norm_key_col(F.col(text_col)), " "),
                        lambda t: t != "",
                    )
                ).alias("tok")
            )
            .groupBy("tok")
            .agg(F.count(F.lit(1)).alias(f"c{side}"))
        )
    fa, fb = freqs(df_a, "a"), freqs(df_b, "b")
    joined = fa.join(fb, "tok", "full_outer").select(
        "tok",
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    tots = joined.agg(
        F.count(F.lit(1)).cast("double").alias("v"),
        F.sum("ca").alias("na"),
        F.sum("cb").alias("nb"),
    )
    pa = (F.col("ca") + 1) / (F.col("na") + F.col("v"))
    pb = (F.col("cb") + 1) / (F.col("nb") + F.col("v"))
    t_ab = F.round(pa * F.log(pa / pb) * F.lit(1e6), 0).cast("long")
    t_ba = F.round(pb * F.log(pb / pa) * F.lit(1e6), 0).cast("long")
    return (
        joined.crossJoin(F.broadcast(tots))
        .select("v", "na", "nb", t_ab.alias("tab"), t_ba.alias("tba"))
        .groupBy()
        .agg(
            F.first("v").cast("long").alias("vocab_union"),
            F.first("na").alias("tokens_a"),
            F.first("nb").alias("tokens_b"),
            F.round(F.sum("tab") / F.lit(1e6), 6).alias("kl_ab"),
            F.round(F.sum("tba") / F.lit(1e6), 6).alias("kl_ba"),
        )
    )


def ngram_novelty(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """Per-document n-gram NOVELTY score: the fraction of a document's
    distinct word ``n``-grams that occur in NO other document of the
    corpus — the memorization-risk / templated-content signal.  A doc
    assembled entirely from corpus-common spans scores near 0 even when
    no single partner duplicates it, which is exactly the case MinHash
    (whole-doc similarity) and substring dedup (needs a concrete shared
    span ≥ k words) both under-report; conversely high-novelty docs are
    the ones worth up-weighting in a data mix (the "new information"
    proxy used alongside DSIR-style importance weights).

    Returns one row per input document: (id, n_grams, n_novel, novelty)
    where ``n_grams`` counts the doc's DISTINCT grams, ``n_novel`` those
    with corpus document-frequency 1, and ``novelty = n_novel/n_grams``
    (one DOUBLE division of two exact BIGINTs — engine-identical).  Docs
    with < n words survive with n_grams = 0 and novelty NULL.

    Plan shape (100 TB): grams are md5-derived 64-bit digests
    (`dedup._md5_be_long` — SQL-replayable, unlike xxhash64), so every
    shuffle moves 8-byte longs, never text: distinct (doc, digest) pairs
    → document-frequency via ONE map-side-combinable groupBy on the
    digest (pairs are already distinct per doc, so count(*) IS the doc
    frequency) → join back on digest → per-doc counts.  No windows, no
    driver actions; gram-level skew is bounded because a digest's rows
    fan back out to at most its doc frequency."""
    from mistral_ocr_pipeline_spark.operators.dedup import (
        explode_grams,
        shingle_sets,
    )

    sets = shingle_sets(df, id_col, text_col, n, hashed=True, hash_basis="md5")
    # the gram stream feeds TWO shuffles (doc-frequency groupBy and the
    # join-back) whose exchanges don't canonicalize to one (different
    # column sets), so without a boundary the md5 shingle of every
    # document runs twice; persist the (id, digest) rows once — the same
    # multi-read-stage rule the DSIR/NB composites follow
    grams = explode_grams(sets, "id").persist()
    dfreq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("_df"))
    per_doc = (
        grams.join(dfreq, "g")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.when(F.col("_df") == 1, 1).otherwise(0)).alias("n_novel"),
        )
    )
    base = df.select(F.col(id_col).alias("id"))
    n_grams = F.coalesce("n_grams", F.lit(0)).cast("long")
    n_novel = F.coalesce("n_novel", F.lit(0)).cast("long")
    return base.join(per_doc, "id", "left").select(
        "id",
        n_grams.alias("n_grams"),
        n_novel.alias("n_novel"),
        F.when(
            n_grams > 0,
            F.round(n_novel.cast("double") / n_grams.cast("double"), 6),
        ).alias("novelty"),
    )


def soft_dedup_weights(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 3,
) -> DataFrame:
    """SoftDeDup-style per-document REWEIGHTING (Xue et al., ACL 2024):
    instead of *removing* near-duplicate content, down-weight documents by
    their **data commonness** — the mean corpus document-frequency of the
    doc's distinct word ``n``-grams — so repeated content contributes
    roughly one copy's worth of sampling mass while its unique remainder
    is preserved.  The removal-free alternative to `dedup.exact_dedup` /
    `minhash_lsh_pairs` when the dedup decision should be a *sampling
    weight*, not a drop.

    Integer-exact formulation (order-independent under any shuffle):
    ``commonness_micro = Σ df(g) * 1e6 div n_grams`` (≥ 1e6; an all-unique
    doc scores exactly 1e6) and ``weight_micro = 1e12 div
    commonness_micro`` (≤ 1e6; a doc duplicated k times scores ≈ 1e6/k).
    Docs with < n words get commonness 1e6 / weight 1e6 (nothing common
    about them).

    Returns (id, n_grams, commonness_micro, weight_micro) — one row per
    input document, NULL-text docs included.

    Plan shape (100 TB): identical to `ngram_novelty` — distinct
    (doc, md5-digest) gram pairs, ONE map-side-combinable doc-frequency
    groupBy on the 8-byte digest, join back, per-doc fold.  No windows,
    no driver actions, no text on any shuffle."""
    from mistral_ocr_pipeline_spark.operators.dedup import (
        explode_grams,
        shingle_sets,
    )

    sets = shingle_sets(df, id_col, text_col, n, hashed=True, hash_basis="md5")
    # the gram stream feeds TWO shuffles (doc-frequency groupBy and the
    # join-back) whose exchanges don't canonicalize to one (different
    # column sets), so without a boundary the md5 shingle of every
    # document runs twice; persist the (id, digest) rows once — the same
    # multi-read-stage rule the DSIR/NB composites follow
    grams = explode_grams(sets, "id").persist()
    dfreq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("_df"))
    per_doc = (
        grams.join(dfreq, "g")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("_ng"),
            F.sum("_df").alias("_df_sum"),
        )
    )
    base = df.select(F.col(id_col).alias("id"))
    return (
        base.join(per_doc, "id", "left")
        .select(
            "id",
            F.coalesce("_ng", F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce("_df_sum", F.lit(0)).cast("long").alias("_df_sum"),
        )
        .withColumn(
            "commonness_micro",
            F.when(
                F.col("n_grams") > 0,
                F.expr("_df_sum * 1000000L div n_grams"),
            ).otherwise(F.lit(1000000).cast("long")),
        )
        .withColumn(
            "weight_micro", F.expr("1000000000000L div commonness_micro")
        )
        .drop("_df_sum")
    )


# License-marker battery (The Stack / Common-Pile-style license filtering).
# Patterns live in the Java∩RE2-identical subset (no lookarounds) and are
# matched on lowercased text, so the booleans are honest SUBSTRING
# detections — 'cc-by-nc' also trips the cc_by pattern; the priority order
# in `license_tags` resolves the label (most-restrictive first).
LICENSE_PATTERNS: list[tuple[str, str]] = [
    ("cc_by_nc", r"cc[- ]by[- ]nc|noncommercial"),
    ("all_rights_reserved", r"all rights reserved"),
    ("gpl", r"gnu general public license|\bgpl\b"),
    ("cc_by_sa", r"cc[- ]by[- ]sa|sharealike"),
    ("cc_by", r"cc[- ]by\b"),
    ("cc0", r"creative commons zero|\bcc0\b|public domain"),
    ("mit", r"\bmit license\b"),
    ("apache", r"apache license"),
]

# labels whose docs a permissive-only training corpus must drop
RESTRICTIVE_LICENSES = ("cc_by_nc", "all_rights_reserved")


def license_tags(df: DataFrame, id_col: str, text_col: str = "text") -> DataFrame:
    """Per-document license-marker detection + the keep verdict a
    permissive-only corpus build applies (The Stack §2.2's license gate,
    generalized to prose): one boolean per marker family, a single
    ``license`` label resolved most-restrictive-first, and
    ``keep_for_training`` = the label is not NC / all-rights-reserved
    (unmarked docs keep — the policy knob lives in the caller).

    Pure scan-level Catalyst regexps (map-only, zero shuffle, zero UDF) —
    the 100 TB cost is one pass over the text column; every pattern is in
    the Java∩RE2 subset so the DuckDB oracle replays byte-identically.

    Output: (id, has_<tag>... , license, keep_for_training)."""
    low = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    out = df.select(F.col(id_col).alias("id"), low.alias("_low"))
    for tag, pat in LICENSE_PATTERNS:
        out = out.withColumn(f"has_{tag}", F.col("_low").rlike(pat))
    # right-fold builds the priority CASE: the FIRST (most-restrictive)
    # matching pattern supplies the label
    label = F.lit("none")
    for tag, _ in reversed(LICENSE_PATTERNS):
        label = F.when(F.col(f"has_{tag}"), F.lit(tag)).otherwise(label)
    return out.drop("_low").withColumn("license", label).withColumn(
        "keep_for_training", ~label.isin(*RESTRICTIVE_LICENSES)
    )


def readability_scores(
    df: DataFrame, id_col: str, text_col: str = "text"
) -> DataFrame:
    """Flesch reading-ease per document — the classic readability gate a
    kid-safe / textbook-style quality mix filters on (FineWeb-Edu-adjacent
    signal that needs no model): 206.835 − 1.015·(words/sentences) −
    84.6·(syllables/words).

    Syllables use the standard vowel-group heuristic: count of [aeiouy]+
    runs in the lowercased text, with consonant-only tokens (digits,
    acronyms) counting 1 — computed as regexp_count + a list_filter
    length, both pure Catalyst array/regex expressions (no explode: the
    per-word minimum folds into ONE filtered-size term).  Sentences =
    [.!?]+ runs, floored at 1.  Zero-word docs (empty/NULL text) survive
    with NULL score.

    Map-only — zero shuffles at any scale; all three counts come from
    the same materialized token array, and the final score is a fixed
    dyadic-rational affine of two exact-integer ratios rounded to 6 dp
    (engine-identical)."""
    lo = F.lower(F.coalesce(F.col(text_col), F.lit("")))
    toks = F.filter(
        F.split(F.trim(lo), r"\s+"), lambda t: t != F.lit("")
    )
    out = df.select(
        F.col(id_col).alias("id"), lo.alias("_lo"), toks.alias("_toks")
    )
    words = F.size("_toks")
    sentences = F.greatest(
        F.regexp_count(F.col("_lo"), F.lit(r"[.!?]+")), F.lit(1)
    )
    vowel_groups = F.regexp_count(F.col("_lo"), F.lit(r"[aeiouy]+"))
    no_vowel = F.size(
        F.filter(F.col("_toks"), lambda t: ~t.rlike("[aeiouy]"))
    )
    syllables = vowel_groups + no_vowel
    score = (
        F.lit(206.835)
        - F.lit(1.015) * (words.cast("double") / sentences.cast("double"))
        - F.lit(84.6) * (syllables.cast("double") / words.cast("double"))
    )
    return out.select(
        "id",
        words.cast("long").alias("n_words"),
        sentences.cast("long").alias("n_sentences"),
        syllables.cast("long").alias("n_syllables"),
        F.when(words > 0, F.round(score, 6)).alias("flesch_r6"),
        F.when(words == 0, F.lit("empty"))
        .when(score >= 70, F.lit("easy"))
        .when(score >= 50, F.lit("standard"))
        .otherwise(F.lit("difficult"))
        .alias("band"),
    )


def bigram_surprisal_heldout(
    train: DataFrame,
    score: DataFrame,
    id_col: str,
    text_col: str = "text",
) -> DataFrame:
    """(id, n_pairs, oov_pairs, surprisal) — mean conditional surprisal
    of ``score`` docs under an add-1-smoothed bigram LM trained ONLY on
    ``train``: the actual CCNet shape (Wenzek et al. 2020 train KenLM on
    Wikipedia and score CommonCrawl with it), where `bigram_surprisal`
    is the self-trained proxy.  Because the LM never sees the scored
    text, unseen events must score instead of vanishing:

    * unseen (prev, cur) with a known prev → the add-1 floor
      −ln(1 / (ctx(prev) + V));
    * unseen prev entirely (ctx = 0)      → −ln(1 / V);
    * V is the TRAIN vocabulary size.

    ``oov_pairs`` counts bigrams absent from the train LM — the
    out-of-domain signal on its own (a doc can have low surprisal yet be
    pure OOV boilerplate).

    Determinism: each pair's surprisal is a pure per-row function of
    (c2, ctx, V) rounded to integer micro-units BEFORE the per-doc sum,
    so the aggregate is an order-independent BIGINT sum.  Plan shape:
    the two count relations are train-vocabulary-sized and broadcast
    (swap for shuffle hash joins once the bigram table outgrows a
    broadcast); the score-side pair stream shuffles ONCE, keyed on doc
    id.  Score docs with < 2 tokens emit no row."""
    from mistral_ocr_pipeline_spark.functions.text_functions import norm_key_col

    def _pairs(df: DataFrame) -> DataFrame:
        toks = F.filter(
            F.split(norm_key_col(F.col(text_col)), " "), lambda t: t != ""
        )
        base = df.select(F.col(id_col).alias("id"), toks.alias("_ts"))
        pair_arr = F.when(
            F.size("_ts") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size("_ts") - 1),
                lambda i: F.struct(
                    F.element_at("_ts", i).alias("prev"),
                    F.element_at("_ts", i + 1).alias("cur"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
        return base.select("id", F.explode(pair_arr).alias("p")).select(
            "id", F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur")
        )

    tr = _pairs(train)
    c2 = tr.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c2"))
    ctx = c2.groupBy("prev").agg(F.sum("c2").alias("ctx"))
    toks = F.filter(
        F.split(norm_key_col(F.col(text_col)), " "), lambda t: t != ""
    )
    vocab = (
        train.select(F.explode(toks).alias("t"))
        .agg(F.count_distinct("t").cast("double").alias("v"))
    )
    sc = (
        _pairs(score)
        .join(F.broadcast(c2), ["prev", "cur"], "left")
        .join(F.broadcast(ctx), ["prev"], "left")
        .crossJoin(F.broadcast(vocab))
    )
    micro = F.round(
        -F.log(
            (F.coalesce(F.col("c2"), F.lit(0)) + 1)
            / (F.coalesce(F.col("ctx"), F.lit(0)) + F.col("v"))
        )
        * F.lit(1e6),
        0,
    ).cast("long")
    return (
        sc.select("id", micro.alias("micro"), F.col("c2").isNull().alias("_oov"))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.when(F.col("_oov"), 1).otherwise(0))
            .cast("long")
            .alias("oov_pairs"),
            F.round(F.sum("micro") / F.lit(1e6) / F.count(F.lit(1)), 6).alias(
                "surprisal"
            ),
        )
        .select(F.col("id").alias(id_col), "n_pairs", "oov_pairs", "surprisal")
    )


def tokenizer_fertility(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Tokenizer fertility per language — subword tokens per word and
    chars per subword token (Ács 2019's fertility metric; the statistic
    UniMax/byte-budget mixing needs to convert a language's token budget
    into a document budget).  High fertility = the tokenizer fragments
    that language (each word costs more subwords), so an equal-token mix
    under-represents it in *content*; curation corrects with fertility-
    aware budgets.

    Corpus-ratio estimator (sum/sum, not mean-of-ratios): matches how a
    budget is actually spent.  Plan: scan-level features → one partial-agg
    shuffle on a ≤8-value key — at 100 TB this is a map-side-combined
    rollup, ~bytes of shuffle per task.

    Returns (lang_id, n_docs, n_words, n_subwords, fertility_r6,
    chars_per_token_r6)."""
    t = F.col(text_col)
    feats = language_id(df.select(F.col(id_col), t.alias("text")), "text").select(
        "lang_id",
        F.length(F.col("text")).cast("long").alias("n_chars"),
        ws_token_count(F.col("text")).alias("ws"),
        bpe_token_count(F.col("text")).alias("bpe"),
    )
    return (
        feats.groupBy("lang_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws").alias("n_words"),
            F.sum("bpe").alias("n_subwords"),
            F.round(
                F.sum("bpe") / F.greatest(F.sum("ws"), F.lit(1)), 6
            ).alias("fertility_r6"),
            F.round(
                F.sum("n_chars") / F.greatest(F.sum("bpe"), F.lit(1)), 6
            ).alias("chars_per_token_r6"),
        )
    )


# --------------------------------------------------------------------------
# Logistic-regression quality classifier — trained by unrolled gradient
# descent, every step engine-replayable
# --------------------------------------------------------------------------
def _round_away(x: float) -> int:
    """Ties-away-from-zero rounding with EXACT decimal semantics on the
    double's true binary value — the same answer as Spark's
    ``F.round(_, 0)`` (BigDecimal HALF_UP) and DuckDB's ``round()``, so
    a weight update computed on the driver replays bit-identically in
    both engines (``floor(x+0.5)`` is NOT safe here: for |x| large
    enough, x+0.5 can round across the tie before floor sees it)."""
    from decimal import ROUND_HALF_UP, Decimal

    return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))


def lr_quality_classifier(
    df: DataFrame,
    id_col: str,
    label_col: str,
    train_col: str,
    text_col: str = "text",
    n_buckets: int = 16,
    n_iters: int = 6,
    lr: float = 4.0,
) -> DataFrame:
    """Binary logistic regression over hashed-unigram FREQUENCY features,
    trained by ``n_iters`` full-batch gradient-descent steps — the
    iterated-trainer counterpart of `nb_quality_classifier` (closed
    form) and the third engine-replayable trainer in the repo after
    unrolled-Lloyd k-means and the BPE merge loop: every training pass
    is plain relational algebra, so the WHOLE fit — not just the
    scoring — replays in any engine.

    Numeric parity discipline (cf. `nb_quality_classifier`,
    `similarity._kmeans_centroids`):

    * features are integer micro-units: f_b = round(count_b/n · 1e6),
      a bias feature is the constant 1e6;
    * weights are integer micro-units, so every margin is an EXACT
      bigint Σ w_b·f_b (+ w_bias·1e6) in 1e-12 units — order-independent
      by integer addition, |margin| ≪ 2⁵³ so the one float division
      that produces m is correctly rounded everywhere;
    * the activation is the FAST SIGMOID σ̃(m) = 0.5 + 0.5·m/(1+|m|) —
      add/mul/div/abs only, all IEEE-correctly-rounded, where exp()
      would be libm-dependent (the `temperature_allocation` rule);
    * per-row gradient contributions round to micro ints BEFORE the
      cross-row sum (g_b = round((σ̃(m)−y)·f_b), bigint Σ), and the
      driver applies w_b ← w_b − round(lr·G_b/n_train) with exact
      HALF_UP decimal semantics (`_round_away`) — each iteration ends
      in integers, so float drift can never accumulate across steps.

    Plan shape at scale: featurization is MAP-ONLY (the dense
    ``n_buckets``-vector is built per row with array higher-order
    functions — no explode, no shuffle); each GD step is one
    posexplode → map-side-combined sum collapsing to ``n_buckets``
    rows; scoring is one map-only projection with the trained weights
    as an array literal.  ``n_iters`` passes over a persisted feature
    frame — textbook distributed full-batch LR.  Zero UDFs.

    Returns (id_col, is_train, label, pred, n_grams, score) — the
    `nb_quality_classifier` output contract, score = margin rounded to
    6 dp."""
    from mistral_ocr_pipeline_spark.functions.text_functions import norm_key_col

    # coalesce: norm_key(NULL) is NULL → size(NULL) would null n_grams
    toks = F.filter(
        F.split(norm_key_col(F.coalesce(F.col(text_col), F.lit(""))), " "),
        lambda t: t != "",
    )
    bkts = F.transform(
        toks,
        lambda t: F.pmod(
            F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
            F.lit(n_buckets),
        ),
    )
    n = F.size(F.col("_bs"))
    fvec = F.transform(
        F.sequence(F.lit(0), F.lit(n_buckets - 1)),
        lambda i: F.when(
            n > 0,
            F.round(
                F.size(F.filter(F.col("_bs"), lambda b: b == i.cast("long")))
                / n
                * F.lit(1e6),
                0,
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long")),
    )
    feats = (
        df.select(
            F.col(id_col).alias("id"),
            F.col(label_col).cast("boolean").alias("label"),
            F.col(train_col).cast("boolean").alias("is_train"),
            bkts.alias("_bs"),
        )
        .select(
            "id",
            "label",
            "is_train",
            F.col("label").cast("double").alias("_y"),
            n.cast("long").alias("_n"),
            fvec.alias("_f"),
        )
        .persist()
    )
    n_train = feats.filter("is_train").count()

    def margin_p12(warr: Column, wb: int) -> Column:
        dot = F.aggregate(
            F.zip_with(warr, F.col("_f"), lambda a, b: a * b),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
        return dot + F.lit(int(wb) * 1_000_000).cast("long")

    def fast_sigmoid(m: Column) -> Column:
        return F.lit(0.5) + F.lit(0.5) * m / (F.lit(1.0) + F.abs(m))

    w = [0] * n_buckets
    wb = 0
    for _ in range(max(0, int(n_iters)) if n_train > 0 else 0):
        warr = F.array(*[F.lit(int(x)).cast("long") for x in w])
        m = (margin_p12(warr, wb) / F.lit(1e12)).alias("_m")
        resid = (fast_sigmoid(F.col("_m")) - F.col("_y")).alias("_r")
        g = (
            feats.filter("is_train")
            .select(m, "_y", "_f")
            .select(resid, "_f")
            .select(
                F.posexplode(
                    F.concat(
                        F.transform(
                            F.col("_f"),
                            lambda fm: F.round(F.col("_r") * fm, 0).cast(
                                "long"
                            ),
                        ),
                        F.array(
                            F.round(F.col("_r") * F.lit(1e6), 0).cast("long")
                        ),
                    )
                )
            )
            .groupBy("pos")
            .agg(F.sum("col").alias("G"))
            .collect()
        )
        G = {r["pos"]: r["G"] for r in g}
        w = [
            w[j] - _round_away(lr * G.get(j, 0) / n_train)
            for j in range(n_buckets)
        ]
        wb = wb - _round_away(lr * G.get(n_buckets, 0) / n_train)

    warr = F.array(*[F.lit(int(x)).cast("long") for x in w])
    mp12 = margin_p12(warr, wb)
    return feats.select(
        F.col("id").alias(id_col),
        "is_train",
        "label",
        (mp12 > 0).alias("pred"),
        F.col("_n").alias("n_grams"),
        F.round(mp12 / F.lit(1e12), 6).alias("score"),
    )


def kn_bigram_surprisal(
    df: DataFrame, id_col: str, text_col: str = "text", discount: float = 0.75
) -> DataFrame:
    """(id, n_pairs, kn_surprisal) — mean −ln P(wᵢ|wᵢ₋₁) under an
    INTERPOLATED KNESER-NEY bigram LM (Kneser & Ney 1995, the smoothing
    KenLM uses — so this is the honest in-engine stand-in for CCNet's
    perplexity filter, one rung above `bigram_surprisal`'s add-1):

      P(cur|prev) = (c(prev,cur) − D)/ctx(prev)
                    + D·N₁₊(prev·)/ctx(prev) · N₁₊(·cur)/N₁₊(··)

    with discount D, N₁₊(prev·) the distinct continuations of prev,
    N₁₊(·cur) the distinct HISTORIES of cur (the continuation
    probability that makes "francisco" cheap only after "san"), and
    N₁₊(··) the distinct-bigram total.  The LM is trained on the scored
    corpus itself, so every scored bigram has c ≥ 1 and the discounted
    term stays positive — no OOV floor needed; add-1 artifacts (common
    words inflated after rare ones) are what the continuation term
    fixes.

    Same determinism discipline as `bigram_surprisal`: each bigram's
    surprisal is micro-rounded in the VOCABULARY-sized table, per-doc
    sums are order-independent bigints.  Plan shape: the c(prev,cur)
    groupBy collapses map-side; the three count relations derive from it
    (prev rollup, cur rollup, 1-row total); the probability table
    broadcasts and scoring is one corpus shuffle keyed on doc id.  At
    100 TB swap the broadcast for a shuffle hash join on (prev, cur) —
    everything else unchanged.  Docs with < 2 tokens emit no row."""
    from mistral_ocr_pipeline_spark.functions.text_functions import norm_key_col

    toks = F.filter(
        F.split(norm_key_col(F.col(text_col)), " "), lambda t: t != ""
    )
    base = df.select(F.col(id_col).alias("id"), toks.alias("_ts"))
    pair_arr = F.when(
        F.size("_ts") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("_ts") - 1),
            lambda i: F.struct(
                F.element_at("_ts", i).alias("prev"),
                F.element_at("_ts", i + 1).alias("cur"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<prev:string,cur:string>>"))
    pairs = base.select("id", F.explode(pair_arr).alias("p")).select(
        "id", F.col("p.prev").alias("prev"), F.col("p.cur").alias("cur")
    )
    # persist: ctx/hist/tot/table all derive from c2 — uncached, Catalyst
    # re-derives the CORPUS-sized pair groupBy once per reference (4
    # scans); cached, the corpus pays one aggregation pass and the three
    # rollups read the VOCABULARY-sized result (the text_nb_quality
    # persisted-spine rule, applied to the operator's own lineage)
    c2 = pairs.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("c2")).persist()
    ctx = c2.groupBy("prev").agg(
        F.sum("c2").alias("ctx"), F.count(F.lit(1)).alias("n1pf")
    )
    hist = c2.groupBy("cur").agg(F.count(F.lit(1)).alias("n1pb"))
    tot = c2.agg(F.count(F.lit(1)).alias("n1pp"))
    d = F.lit(float(discount))
    p = (F.col("c2") - d) / F.col("ctx") + d * F.col("n1pf") / F.col(
        "ctx"
    ) * (F.col("n1pb") / F.col("n1pp"))
    table = (
        c2.join(ctx, "prev")
        .join(hist, "cur")
        .crossJoin(F.broadcast(tot))
        .select(
            "prev", "cur", F.round(-F.log(p) * F.lit(1e6), 0).cast("long").alias("micro")
        )
    )
    return (
        pairs.join(F.broadcast(table), ["prev", "cur"])
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.sum("micro") / F.lit(1e6) / F.count(F.lit(1)), 6).alias(
                "kn_surprisal"
            ),
        )
        .select(F.col("id").alias(id_col), "n_pairs", "kn_surprisal")
    )


def texttile_segments(
    df: DataFrame,
    id_col: str,
    text_col: str,
    w: int = 10,
) -> DataFrame:
    """Topic segmentation by lexical cohesion — TextTiling (Hearst
    1997), the content-aware complement to heading-based sectioning
    (`mdstruct.md_sections` needs markdown structure; transcripts and
    boilerplate-stripped prose often have none): the token stream is
    cut into ``w``-token blocks, each gap between adjacent blocks gets
    a cohesion score (term-frequency cosine of the two blocks), and a
    gap is a SEGMENT BOUNDARY when its valley is deep — depth_i =
    (peak_left − s_i) + (peak_right − s_i) — relative to the doc's own
    depth distribution (the Hearst cutoff μ − σ/2).

    Deterministic simplifications, stated: peaks are the prefix/suffix
    maxima of the score sequence (Hearst climbs to the nearest local
    max; the global form is order-free and SQL-replayable), and the
    cutoff comparison is exact integer arithmetic — with depths in
    MILLI-units d, boundary ⟺ 2·(d_i·m − Σd) > −sqrt(m·Σd² − (Σd)²)
    (both sides derived from exact BIGINTs; milli not micro keeps
    m·Σd² far inside BIGINT even for 100k-gap documents).

    Everything is per-document array arithmetic — map-only, ZERO
    shuffles, no UDF: block slicing, the tf-cosines (integer dot/norm
    folds over ≤w-token blocks), prefix/suffix maxima, and the cutoff
    all run as one Catalyst projection, then one posexplode emits (id,
    gap_idx, token_offset, score_r6, depth_r6, is_boundary).  Documents
    with fewer than two blocks emit no rows (no gap exists).  Feed the
    boundaries to a chunker to get topic-coherent passages where
    `md_section_chunks` would fall back to fixed windows."""
    from mistral_ocr_pipeline_spark.functions.text_functions import (
        norm_key_col,
    )

    def _dot(a: str, b: str, v: str) -> str:
        # integer tf dot product of two ≤w-token string arrays: for each
        # distinct term of `a`, count(a) * count(b).  Exact BIGINT —
        # fold order cannot matter.
        return (
            f"aggregate(array_distinct({a}), cast(0 as bigint), "
            f"(acc{v}, t{v}) -> acc{v} + "
            f"cast(size(filter({a}, p{v} -> p{v} = t{v})) as bigint) * "
            f"cast(size(filter({b}, q{v} -> q{v} = t{v})) as bigint))"
        )

    blk = f"(i - 1) * {w} + 1"
    a = f"slice(_toks, {blk}, {w})"
    b = f"slice(_toks, {blk} + {w}, {w})"
    cos_m = (
        f"cast(round({_dot(a, b, '1')} / "
        f"(sqrt({_dot(a, a, '2')}) * sqrt({_dot(b, b, '3')})) "
        f"* 1000000.0) as bigint)"
    )
    t = (
        df.select(
            F.col(id_col).alias("id"),
            F.filter(
                F.split(norm_key_col(F.col(text_col)), " "), lambda x: x != ""
            ).alias("_toks"),
        )
        .withColumn(
            "_nb",
            F.expr(f"cast((size(_toks) + {w} - 1) div {w} as int)"),
        )
        .filter(F.col("_nb") >= 2)
        .withColumn("_m", (F.col("_nb") - 1).cast("int"))
        .withColumn("_s", F.expr(f"transform(sequence(1, _m), i -> {cos_m})"))
    )
    depth = (
        "(array_max(slice(_s, 1, i)) - element_at(_s, i))"
        " + (array_max(slice(_s, i, _m - i + 1)) - element_at(_s, i))"
    )
    t = (
        t.withColumn(
            "_d2", F.expr(f"transform(sequence(1, _m), i -> ({depth}) div 1000)")
        )
        .withColumn(
            "_dsum", F.expr("aggregate(_d2, cast(0 as bigint), (a, x) -> a + x)")
        )
        .withColumn(
            "_dsq",
            F.expr("aggregate(_d2, cast(0 as bigint), (a, x) -> a + x * x)"),
        )
    )
    flags = (
        "transform(sequence(1, _m), i -> "
        "cast(2 * (element_at(_d2, i) * _m - _dsum) as double) > "
        "-sqrt(cast(_m * _dsq - _dsum * _dsum as double)))"
    )
    z = t.withColumn("_f", F.expr(flags)).select(
        "id",
        F.posexplode(F.expr("arrays_zip(_s, _d2, _f)")).alias("p", "z"),
    )
    return z.select(
        "id",
        (F.col("p") + 1).cast("int").alias("gap_idx"),
        ((F.col("p") + 1) * w).cast("long").alias("token_offset"),
        (F.col("z.`_s`").cast("double") / 1e6).alias("score_r6"),
        (F.col("z.`_d2`").cast("double") / 1e3).alias("depth_r3"),
        F.col("z.`_f`").alias("is_boundary"),
    )


def texttile_passages(
    df: DataFrame,
    id_col: str,
    text_col: str,
    w: int = 10,
) -> DataFrame:
    """Materialized TextTiling passages — the consumer half of
    `texttile_segments`: the boundary gaps become cut points and each
    document re-emits as topic-coherent passages of whole ``w``-token
    blocks, (id, seg_idx, start_token, n_tokens, seg_text).  The
    structureless-prose analog of `mdstruct.md_section_text`, and the
    RAG-chunking input where fixed windows would straddle topics.

    Same zero-shuffle shape: the boundary flags are recomputed in the
    same projection (they are pure array arithmetic — cheaper than a
    join against a materialized `texttile_segments`), cut offsets
    derive from the flags with a filter over gap indices, and passages
    slice straight out of the token array.  Documents with fewer than
    two blocks emit one passage covering the whole document (seg_idx
    0) — segmentation never loses text (Σ n_tokens = doc tokens,
    pinned in tests)."""
    from mistral_ocr_pipeline_spark.functions.text_functions import (
        norm_key_col,
    )

    def _dot(a: str, b: str, v: str) -> str:
        return (
            f"aggregate(array_distinct({a}), cast(0 as bigint), "
            f"(acc{v}, t{v}) -> acc{v} + "
            f"cast(size(filter({a}, p{v} -> p{v} = t{v})) as bigint) * "
            f"cast(size(filter({b}, q{v} -> q{v} = t{v})) as bigint))"
        )

    blk = f"(i - 1) * {w} + 1"
    a = f"slice(_toks, {blk}, {w})"
    b = f"slice(_toks, {blk} + {w}, {w})"
    cos_m = (
        f"cast(round({_dot(a, b, '1')} / "
        f"(sqrt({_dot(a, a, '2')}) * sqrt({_dot(b, b, '3')})) "
        f"* 1000000.0) as bigint)"
    )
    depth = (
        "(array_max(slice(_s, 1, i)) - element_at(_s, i))"
        " + (array_max(slice(_s, i, _m - i + 1)) - element_at(_s, i))"
    )
    t = (
        df.select(
            F.col(id_col).alias("id"),
            F.filter(
                F.split(norm_key_col(F.col(text_col)), " "), lambda x: x != ""
            ).alias("_toks"),
        )
        .withColumn(
            "_nb", F.expr(f"cast((size(_toks) + {w} - 1) div {w} as int)")
        )
        .withColumn("_m", F.greatest(F.col("_nb") - 1, F.lit(0)).cast("int"))
        .withColumn(
            "_s",
            F.expr(
                "CASE WHEN _m < 1 THEN array() ELSE "
                f"transform(sequence(1, _m), i -> {cos_m}) END"
            ),
        )
        .withColumn(
            "_d2",
            F.expr(
                "CASE WHEN _m < 1 THEN array() ELSE "
                f"transform(sequence(1, _m), i -> ({depth}) div 1000) END"
            ),
        )
        .withColumn(
            "_dsum", F.expr("aggregate(_d2, cast(0 as bigint), (a, x) -> a + x)")
        )
        .withColumn(
            "_dsq",
            F.expr("aggregate(_d2, cast(0 as bigint), (a, x) -> a + x * x)"),
        )
    )
    # cut points in TOKEN units: boundary gap i cuts before block i
    # (token i·w); always cut at 0 so slices pair up as (cut, next_cut)
    cuts = (
        "concat(array(0), CASE WHEN _m < 1 THEN array() ELSE "
        "transform(filter(sequence(1, _m), i -> "
        "cast(2 * (element_at(_d2, i) * _m - _dsum) as double) > "
        f"-sqrt(cast(_m * _dsq - _dsum * _dsum as double))), i -> i * {w}) END)"
    )
    t = t.withColumn("_cuts", F.expr(cuts))
    seg = (
        "transform(sequence(1, size(_cuts)), j -> named_struct("
        "'seg_idx', j - 1, "
        "'start_token', element_at(_cuts, j), "
        "'n_tokens', (CASE WHEN j < size(_cuts) "
        "  THEN element_at(_cuts, j + 1) ELSE size(_toks) END)"
        "  - element_at(_cuts, j), "
        "'seg_text', array_join(slice(_toks, element_at(_cuts, j) + 1, "
        "  (CASE WHEN j < size(_cuts) THEN element_at(_cuts, j + 1) "
        "   ELSE size(_toks) END) - element_at(_cuts, j)), ' ')))"
    )
    z = t.filter(F.expr("size(_toks) > 0")).select(
        "id", F.explode(F.expr(seg)).alias("z")
    )
    return z.select(
        "id",
        F.col("z.seg_idx").cast("int").alias("seg_idx"),
        F.col("z.start_token").cast("long").alias("start_token"),
        F.col("z.n_tokens").cast("long").alias("n_tokens"),
        F.col("z.seg_text").alias("seg_text"),
    )


# Cyrillic → Latin confusable pairs (the classic homoglyph spoof set:
# identical glyphs in most fonts).  ONE string pair so both engines'
# translate() see byte-identical tables.
_HOMOGLYPH_FROM = "АВЕКМНОРСТХаеорсух"
_HOMOGLYPH_TO = "ABEKMHOPCTXaeopcyx"


def fold_homoglyphs(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Homoglyph folding — the remediation step behind
    `script_profile`'s mixed-script FLAG: spam/SEO evasion swaps Latin
    letters for identical-looking Cyrillic ones ('раypal', 'сlick') to
    slip past exact dedup, keyword gates, and decontamination digests;
    folding the confusable set back to Latin restores every
    digest-keyed operator's ability to see through the spoof.  Pure
    ``translate`` (codepoint-for-codepoint, length-preserving) plus a
    confusable count via one regexp scan — map-only, zero shuffle.

    Deliberately NOT applied corpus-wide by default: genuine Cyrillic
    prose contains these letters legitimately — fold where a
    mixed-script or wrong-script signal fires (`script_profile`,
    `transcript_script_mismatch`), which is why the count and flag ride
    the output.  Output: (id, text_folded, n_homoglyphs,
    had_homoglyphs)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    n = F.regexp_count(t, F.lit(f"[{_HOMOGLYPH_FROM}]")).cast("long")
    return df.select(
        F.col(id_col).alias("id"),
        F.translate(t, _HOMOGLYPH_FROM, _HOMOGLYPH_TO).alias("text_folded"),
        n.alias("n_homoglyphs"),
        (n > 0).alias("had_homoglyphs"),
    )
