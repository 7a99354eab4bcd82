"""Token-budget sequence packing — the pretraining-data step between
curation and the trainer: documents are packed into fixed-token-budget
bins (context windows) so batch assembly wastes no padding.

Document-preserving greedy packing, deterministic and SQL-replayable:

* each document is assigned to a SHARD (``pmod(id, n_shards)`` — modulo
  rather than a hash so the DuckDB oracle replays it exactly; production
  would use ``xxhash64`` for key smoothing, same plan shape);
* within a shard, documents are laid out in id order and a running token
  offset is computed (one window cumsum per shard);
* ``pack_id = floor(start_offset / budget)`` — a document joins the pack
  its starting offset falls in, i.e. concatenate-in-order and cut at
  budget boundaries WITHOUT splitting documents (a pack can overflow by
  at most one document's tokens, the standard document-preserving
  variant of GPT-style pack-then-chunk).

Scale shape: the only wide operation is one window (sort + cumsum) per
shard; a shard's rows land on one task, so per-task input is bounded by
corpus/n_shards — raise ``n_shards`` with corpus size (the trainer wants
many independent pack streams anyway).  No driver-side state, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F


def pack_token_budget(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int = 2048,
    n_shards: int = 8,
) -> DataFrame:
    """Per-document pack assignment: (id, shard, tokens, start_offset,
    pack_id).  ``tokens_col`` is a precomputed per-document token count
    (see ``text_analysis.ws_token_count`` / ``bpe_token_count``)."""
    shard = F.pmod(F.col(id_col), F.lit(n_shards)).alias("shard")
    w = W.partitionBy("shard").orderBy("id")
    run = w.rowsBetween(W.unboundedPreceding, -1)
    return (
        df.select(F.col(id_col).alias("id"), shard, F.col(tokens_col).alias("tokens"))
        .withColumn(
            "start_offset",
            F.coalesce(F.sum("tokens").over(run), F.lit(0)).cast("long"),
        )
        .withColumn(
            "pack_id", F.floor(F.col("start_offset") / F.lit(budget)).cast("long")
        )
    )


def chunk_text_tokens(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window: int = 128,
    overlap: int = 32,
) -> DataFrame:
    """Overlapping token-window chunking — the document→passage step of
    an embedding/retrieval pipeline (each chunk gets embedded/indexed;
    the overlap keeps sentences straddling a boundary retrievable from
    both sides).  Returns (id, chunk_start, chunk_text, n_tokens); empty
    documents yield no chunks.

    Pure Catalyst fan-out, no UDF and no shuffle: whitespace tokens →
    ``explode(sequence(0, n-1, window-overlap))`` chunk starts →
    ``slice``+``array_join`` per chunk.  At scale this is a scan-side
    Generate whose output feeds the embedding kernel directly; chunk
    count per doc is ⌈n/step⌉, bounded and skew-free."""
    if overlap >= window:
        raise ValueError(f"overlap ({overlap}) must be < window ({window})")
    step = window - overlap
    toks = F.when(
        F.trim(F.col(text_col)) == "", F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(F.col(text_col)), r"\s+"))
    base = df.select(F.col(id_col).alias("id"), toks.alias("_toks")).select(
        "id", "_toks", F.size("_toks").alias("_n")
    )
    # chunks are materialized BEFORE the explode so the full token array
    # is dropped from the Generate input (Generate does not prune parent
    # columns — carrying _toks per chunk row would cost O(n²/step) for a
    # long doc; same lesson as the shingle drop in operators/dedup.py):
    # each generated row carries only its own ≤window-token text
    chunk_structs = F.transform(
        F.sequence(F.lit(0), F.col("_n") - 1, F.lit(step)),
        lambda s: F.struct(
            s.cast("int").alias("chunk_start"),
            F.array_join(F.slice("_toks", s + 1, window), " ").alias(
                "chunk_text"
            ),
            F.least(F.lit(window), F.col("_n") - s).cast("long").alias(
                "n_tokens"
            ),
        ),
    )
    return (
        base.filter(F.col("_n") > 0)
        .select("id", chunk_structs.alias("_chunks"))
        .select("id", F.explode("_chunks").alias("_c"))
        .select("id", "_c.chunk_start", "_c.chunk_text", "_c.n_tokens")
    )


def pack_emit(
    df: DataFrame,
    id_col: str,
    text_col: str,
    tokens_col: str,
    budget: int = 2048,
    n_shards: int = 8,
    doc_sep: str = "\n\n",
) -> DataFrame:
    """Materialize the packed CONTEXT WINDOWS themselves — the step the
    trainer actually consumes: `pack_token_budget` assigns each doc a
    (shard, pack_id), then one groupBy(shard, pack_id) rebuilds every
    pack as its documents concatenated IN OFFSET ORDER (id rides inside
    the sorted struct — collect_list alone has no order guarantee, the
    `line_dedup` rebuild discipline), separated by ``doc_sep`` (the
    EOS/document-boundary stand-in).  Returns (shard, pack_id, n_docs,
    total_tokens, doc_ids, text) with ``doc_ids`` a comma-joined string
    (scalar output contract).

    Scale shape: the ONLY wide ops are the per-shard offset window the
    assignment already pays and one groupBy on (shard, pack_id) whose
    groups are budget-bounded (≈budget tokens of text each) — emission
    adds no skew a pack doesn't already have."""
    packed = pack_token_budget(
        df.select(F.col(id_col).alias("id"), F.col(tokens_col).alias("tok")),
        "id", "tok", budget=budget, n_shards=n_shards,
    )
    joined = packed.join(
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("_text")),
        "id",
    )
    docs_sorted = F.array_sort(
        F.collect_list(F.struct(F.col("id"), F.col("_text").alias("t")))
    )
    return (
        joined.groupBy("shard", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tokens").cast("long").alias("total_tokens"),
            docs_sorted.alias("_d"),
        )
        .select(
            "shard",
            "pack_id",
            "n_docs",
            "total_tokens",
            F.array_join(
                F.transform(F.col("_d"), lambda s: s["id"].cast("string")), ","
            ).alias("doc_ids"),
            F.array_join(
                F.transform(F.col("_d"), lambda s: s["t"]), doc_sep
            ).alias("text"),
        )
    )


def pack_rollup(packed: DataFrame, budget: int = 2048) -> DataFrame:
    """Per-pack fill statistics: (shard, pack_id, n_docs, total_tokens,
    fill_ratio).  ``fill_ratio`` > 1 marks the overflow pack head (the one
    straddling document); the trainer-side consumer treats budget as the
    cut point."""
    return (
        packed.groupBy("shard", "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tokens").cast("long").alias("total_tokens"),
        )
        .withColumn(
            "fill_ratio",
            F.round(F.col("total_tokens") / F.lit(float(budget)), 6),
        )
    )


def pack_similar_neighbors(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    vec_col: str,
    centroids,
    budget: int = 2048,
) -> DataFrame:
    """Similarity-ordered packing — the In-Context Pretraining recipe
    (Shi et al. 2024: training on related documents concatenated into
    one context beats i.i.d. shuffling): documents are grouped into
    semantic cells (argmax dot against frozen centroids, the IVF
    assignment), ordered within each cell by centroid affinity
    (cd_m DESC, id — coherent neighbourhoods adjacent), and packed by
    the same exclusive-prefix-sum next-fit rule as `pack_token_budget`
    — so a context window fills with topically related documents
    instead of random ones.

    Output: (id, cell, cd_r6, tokens, start_offset, pack_id, pos).

    Scale: ONE shuffle keyed on cell; the window sort within a cell is
    per-key, so n_centroids is the parallelism/skew dial — size it to
    corpus_tokens / (≈10³ · budget) so cells stay task-sized (re-train
    a larger codebook rather than salting: splitting a cell across
    tasks would break the in-context adjacency the operator exists to
    create).  Assignment itself is map-only centroid-literal
    arithmetic; every downstream fact (cd_m, offsets, pack ids) is
    integer, partition-invariant, and SQL-replayable."""
    import numpy as np

    from mistral_ocr_pipeline_spark.operators.similarity_df import (
        _argmax_cell,
        _cell_dots,
        _dvec,
    )

    cent = np.asarray(centroids, dtype=np.float64)
    d = df.select(
        F.col(id_col).alias("id"),
        F.col(tokens_col).alias("tokens"),
        _dvec(F.col(vec_col)).alias("_v"),
    ).select("id", "tokens", _cell_dots("_v", cent).alias("_d"))
    cell = _argmax_cell(F.col("_d"))
    assigned = d.select(
        "id",
        "tokens",
        cell.alias("cell"),
        F.round(F.element_at(F.col("_d"), cell + 1) * F.lit(1000000.0), 0)
        .cast("long")
        .alias("cd_m"),
    )
    w = W.partitionBy("cell").orderBy(F.col("cd_m").desc(), F.col("id").asc())
    run = w.rowsBetween(W.unboundedPreceding, -1)
    return (
        assigned.withColumn(
            "start_offset",
            F.coalesce(F.sum("tokens").over(run), F.lit(0)).cast("long"),
        )
        .withColumn(
            "pack_id", F.floor(F.col("start_offset") / F.lit(budget)).cast("long")
        )
        .withColumn("pos", F.row_number().over(w))
        .select(
            "id",
            "cell",
            (F.col("cd_m").cast("double") / 1e6).alias("cd_r6"),
            "tokens",
            "start_offset",
            "pack_id",
            "pos",
        )
    )


_LEN_BUCKETS = (16, 32, 64, 128, 256, 512, 1024, 2048)


def length_bucket_stats(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
) -> DataFrame:
    """Padding-waste audit for length-bucketed batching — the
    dynamic-batching accounting every serving/training stack runs
    before picking bucket boundaries (pad-to-longest inside a
    power-of-two bucket; sequences above the top bucket truncate to
    it): per bucket, document count, real tokens, padded waste, and
    padding efficiency = tokens / (n_docs · bucket) in exact integer
    micro-units.  The bucket ladder is a fixed CASE chain
    (16…2048) — no log/pow floats, so the assignment is bit-identical
    in any engine.  One map-side-combined groupBy on ≤8 bucket keys;
    the efficiency number is precisely the fraction of batch FLOPs
    spent on real tokens, which is what motivates moving a boundary."""
    t = F.col(tokens_col)
    eff = F.least(t, F.lit(_LEN_BUCKETS[-1]))
    bucket = F.lit(_LEN_BUCKETS[-1])
    for b in reversed(_LEN_BUCKETS[:-1]):
        bucket = F.when(t <= b, F.lit(b)).otherwise(bucket)
    keyed = df.select(
        F.col(id_col).alias("id"),
        eff.alias("_eff"),
        bucket.cast("long").alias("bucket"),
        (t > F.lit(_LEN_BUCKETS[-1])).alias("_trunc"),
    )
    return (
        keyed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_eff").alias("total_tokens"),
            F.sum(F.col("bucket") - F.col("_eff")).alias("total_waste"),
            F.sum(F.col("_trunc").cast("long")).alias("n_truncated"),
        )
        .select(
            "bucket",
            "n_docs",
            "total_tokens",
            "total_waste",
            "n_truncated",
            (
                F.expr(
                    "(total_tokens * 1000000) div (n_docs * bucket)"
                ).cast("long")
            ).alias("pad_eff_micro"),
        )
    )
