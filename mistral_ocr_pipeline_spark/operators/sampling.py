"""Deterministic sampling for training-data curation.

`df.sample()` is seed-dependent on partitioning (same seed, different
partition layout → different rows), which breaks reproducibility across
cluster sizes and resumed runs.  These operators sample on a CONTENT hash
instead: a row's fate depends only on its key, so the sample is identical
at local[8], on 1000 executors, and across re-runs — and replayable in
plain SQL (the md5-hex prefix comparison is lexicographic, no integer
conversion needed, so DuckDB/Trino/anything agrees byte-for-byte).

All pure Catalyst expressions: no UDF, no shuffle — sampling is a filter,
stratified fractions are one CASE chain, splits are one label projection.
Salting the key (``salt`` param) decorrelates different samples drawn from
the same corpus (sample A ∩ sample B behaves like independent draws).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_HEX_WIDTH = 8  # 32 bits of hash → fraction resolution 2^-32


def _hash_frac_hex(key: Column, salt: str) -> Column:
    """First 8 hex chars of md5(salt || key) — uniform in ['00000000',
    'ffffffff']; compare lexicographically against a threshold."""
    return F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, _HEX_WIDTH)


def _threshold_hex(fraction: float) -> str:
    if fraction >= 1.0:
        # "g" sorts after every hex string, so `hash < threshold` keeps ALL
        # rows — clamping to 'ffffffff' with the strict < would silently
        # drop the 2^-32 of rows whose hash is exactly 0xffffffff from a
        # source meant to be fully kept
        return "g"
    t = min(max(int(round(fraction * (1 << 32))), 0), (1 << 32) - 1)
    return format(t, "08x")


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ≈``fraction`` of rows, chosen by content hash of ``key_col``.

    Deterministic across partitioning/cluster size/reruns; the filter is a
    scan-level predicate (no shuffle)."""
    return df.filter(
        _hash_frac_hex(F.col(key_col), salt) < F.lit(_threshold_hex(fraction))
    )


def stratified_sample(
    df: DataFrame,
    key_col: str,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum deterministic sampling (`sampleBy`'s reproducible twin).

    ``fractions`` maps stratum value → keep fraction; unlisted strata get
    ``default_fraction``.  One CASE chain, evaluated at the scan."""
    threshold = F.lit(_threshold_hex(default_fraction))
    for value, frac in sorted(fractions.items()):
        threshold = F.when(
            F.col(strata_col) == value, F.lit(_threshold_hex(frac))
        ).otherwise(threshold)
    return df.filter(_hash_frac_hex(F.col(key_col), salt) < threshold)


def train_valid_test_split(
    df: DataFrame,
    key_col: str,
    weights: tuple[float, float, float] = (0.8, 0.1, 0.1),
    salt: str = "split",
) -> DataFrame:
    """Adds a ``split`` column ('train' | 'valid' | 'test') by content hash.

    A conversation keyed by conv_id lands in exactly one split on every
    engine and at every scale — the property random splits lose the moment
    data is repartitioned."""
    w_train, w_valid, w_test = weights
    total = w_train + w_valid + w_test
    t1 = _threshold_hex(w_train / total)
    t2 = _threshold_hex((w_train + w_valid) / total)
    h = _hash_frac_hex(F.col(key_col), salt)
    return df.withColumn(
        "split",
        F.when(h < F.lit(t1), "train").when(h < F.lit(t2), "valid").otherwise("test"),
    )


def weighted_mix(
    sources: list[tuple[DataFrame, float]],
    key_col: str,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic weighted mixture of corpora — the dataset-mixing step
    of a pretraining pipeline (e.g. 70% web, 25% code, 5% reference).

    Each source keeps ``weight`` of its rows by content hash and carries a
    ``mix_source`` index column; rows never shuffle — selection is a
    scan-level filter per source (hash_sample), so mixing N corpora costs
    N scans and one union, independent of cluster size.  Reproducible
    across partitionings/reruns like every operator in this module."""
    parts = []
    for idx, (df, weight) in enumerate(sources):
        parts.append(
            hash_sample(df, key_col, weight, salt=f"{salt}:{idx}").withColumn(
                "mix_source", F.lit(idx)
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def weighted_mix_exact(
    sources: list[tuple[DataFrame, int]],
    key_col: str,
    salt: str = "mix",
) -> DataFrame:
    """Exact-quota variant: take precisely ``quota`` rows per source,
    chosen by content-hash rank.  The rank is a GLOBAL window (single
    partition) per source — fine for curated small corpora and for the
    SQL oracle; at web scale use ``weighted_mix`` (threshold selection,
    no global sort) and accept ±binomial noise on the quotas."""
    from pyspark.sql import Window as W

    parts = []
    for idx, (df, quota) in enumerate(sources):
        h = _hash_frac_hex(F.col(key_col), f"{salt}:{idx}")
        w = W.orderBy(h, F.col(key_col))
        parts.append(
            df.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= quota)
            .drop("_r")
            .withColumn("mix_source", F.lit(idx))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def sample_per_key(
    df: DataFrame,
    key_col: str,
    id_col: str,
    k: int,
    salt: str = "perkey",
) -> DataFrame:
    """Deterministic bounded per-group sample: the ``k`` rows of each key
    group with the smallest content-hash rank — the per-domain/per-source
    contribution CAP a curation pipeline applies so no single site
    dominates the corpus (the bounded analog of reservoir sampling, with
    a content-hash instead of an RNG so the sample is partition- and
    rerun-invariant, same fate rule as ``hash_sample``).

    One window per key (sort by hash within group); per-task input is the
    key group — for web-scale key skew compose with the salted bounded
    collect pattern or pre-filter hot keys.  Output adds ``sample_rank``
    (1-based, hash order).  SQL twin: row_number over (key, md5(salt ||
    id)) — md5 hex compares identically in both engines."""
    from pyspark.sql import Window as W

    h = _hash_frac_hex(F.col(id_col), salt)
    w = W.partitionBy(key_col).orderBy(h, F.col(id_col))
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def interleave_order(
    sources: list[tuple[DataFrame, int]],
    key_col: str,
    salt: str = "interleave",
) -> DataFrame:
    """Deterministic weighted interleave of N corpora — the epoch-ordering
    step of a training pipeline: one reproducible global order in which
    every source is spread uniformly rather than concatenated.

    Each row gets ``mix_key = floor(u32 / weight)`` where ``u32`` is its
    32-bit content hash: sorting by ``mix_key`` yields a stream whose
    source shares converge at every prefix to n_i·w_i proportions — a
    source with weight w appears w× denser RELATIVE TO ITS SIZE (its
    uniform keys compress into a w×-denser range).  With equal-sized
    sources that is exactly the w ratios; to hit a target RECIPE on
    unequal corpora, set the volumes first (`weighted_mix` /
    `weighted_mix_exact` / `token_budget_mix` / `epoch_repeat_mix`) and
    interleave with equal weights for ordering — this operator
    deliberately never drops or repeats a row, so it cannot change
    shares on its own.  The key
    is a SCAN-SIDE integer expression — no window, no shuffle, no
    transcendental functions (exact in any engine) — so producing the
    order costs nothing; consumers sort-merge on read or bucket by key
    range.  Reproducible across partitionings/cluster sizes/reruns like
    everything in this module.  Ties (two rows hashing into the same
    slot) break deterministically by (mix_key, mix_source, key_col)."""
    parts = []
    for idx, (df, weight) in enumerate(sources):
        hex8 = _hash_frac_hex(F.col(key_col), f"{salt}:{idx}")
        u32 = F.conv(hex8, 16, 10).cast("long")
        parts.append(
            df.withColumn("mix_source", F.lit(idx)).withColumn(
                "mix_key",
                F.floor(u32 / F.lit(float(weight))).cast("long"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def token_budget_mix(
    sources: list[tuple[DataFrame, int]],
    key_col: str,
    tokens_col: str,
    salt: str = "tokmix",
    n_shards: int = 8,
) -> DataFrame:
    """Token-budgeted corpus mixing — the dataset-mixing step stated the
    way trainers actually state it: "β billion tokens of web, γ of code",
    not row counts (`weighted_mix*` are the row-quota forms).  Each
    source contributes documents in content-hash order until its token
    target is met.

    Per source: shard by the 32-bit CONTENT hash of the key modulo
    ``n_shards`` (not ``pmod(key, …)`` — patterned ids, e.g. all-even
    doc_ids from an upstream stride, would starve whole shards and
    silently undershoot the target by their undelivered slices; the
    hash spreads any key population uniformly, and the md5-hex →
    UBIGINT conversion replays in SQL).  Within a shard documents lay
    out in (hash, key) order, one window cumsum of tokens, and every
    document whose START offset is under the shard's slice
    ``target // n_shards`` is kept — so each shard overshoots by at
    most one document (the packing boundary convention,
    `packing.pack_token_budget`).  Total take is within
    ±(n_shards · max_doc_tokens) of the target provided each shard
    HOLDS at least its slice; raise ``n_shards`` with corpus size —
    per-task input is corpus/n_shards — and accept the proportionally
    SMALLER absolute slack, or set ``n_shards=1`` for the
    exact-boundary eval-scale form.

    Deterministic across partitionings/cluster sizes/reruns like every
    operator in this module: a document's fate depends only on (salt,
    source index, its key, and the keys hashing below it in its shard).
    Output: (key, mix_source, shard, tokens, start_offset)."""
    from pyspark.sql import Window as W

    parts = []
    for idx, (df, target) in enumerate(sources):
        per_shard = int(target) // n_shards
        if per_shard <= 0:
            # a zero slice would silently select nothing from this source
            raise ValueError(
                f"source {idx}: target {target} tokens < n_shards "
                f"{n_shards}; lower n_shards or raise the target"
            )
        h = _hash_frac_hex(F.col(key_col), f"{salt}:{idx}")
        shard_h = _hash_frac_hex(F.col(key_col), f"{salt}-shard:{idx}")
        shard = F.pmod(
            F.conv(shard_h, 16, 10).cast("long"), F.lit(n_shards)
        ).cast("int")
        w = W.partitionBy("shard").orderBy(h, F.col(key_col))
        run = w.rowsBetween(W.unboundedPreceding, -1)
        parts.append(
            df.select(
                F.col(key_col),
                shard.alias("shard"),
                F.col(tokens_col).cast("long").alias("tokens"),
            )
            .withColumn(
                "start_offset",
                F.coalesce(F.sum("tokens").over(run), F.lit(0)).cast("long"),
            )
            .filter(F.col("start_offset") < per_shard)
            .withColumn("mix_source", F.lit(idx))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(key_col, "mix_source", "shard", "tokens", "start_offset")


def leakage_free_split(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[float, float, float] = (0.8, 0.1, 0.1),
    salt: str = "split",
    max_iter: int = 25,
) -> DataFrame:
    """Group-aware train/valid/test split: near-duplicate documents must
    land in the SAME split, or the eval set leaks training data (the
    contamination mode n-gram decontam can't see — the dup IS the eval
    doc).  `train_valid_test_split` hashes each doc independently, so two
    near-dups straddle splits with probability 2·p·(1−p); this operator
    closes the dup graph first (``dedup.connected_components`` over any
    pair generator's edges — minhash/simhash/embedding) and hashes the
    COMPONENT id, so an entire near-dup cluster moves as one unit.

    Scale shape: the component pass is the dedup pipeline's existing
    label propagation (O(diameter) rounds of well-keyed shuffles); the
    split itself stays a scan-level hash filter on the component label.
    Output: (id, comp, split) — split shares follow ``weights`` over
    COMPONENTS (≈ documents, since dup clusters are small and the hash
    is uniform)."""
    from mistral_ocr_pipeline_spark.operators.dedup import connected_components

    comp = connected_components(
        nodes.select(id_col), edges, id_col=id_col, max_iter=max_iter
    )
    return (
        train_valid_test_split(comp, key_col="comp", weights=weights, salt=salt)
        .select(F.col("id").alias(id_col), "comp", "split")
    )


def training_shard_order(
    df: DataFrame,
    n_shards: int,
    key_col: str = "mix_key",
    tie_cols: tuple[str, ...] = ("mix_source",),
) -> DataFrame:
    """The EMIT step after ``interleave_order``: assign each row to one of
    ``n_shards`` contiguous key-range shards and sort within the shard,
    so writing ``partitionBy('shard')`` (or one file per shard) gives the
    trainer files it can stream in (shard, row) order and observe exactly
    the global interleaved epoch order.

    Spark's own ``repartitionByRange`` would do this with SAMPLED
    boundaries — shard contents then depend on the input's partition
    layout (the reservoir sample does), which breaks the "same shards on
    every rerun/cluster size" contract everything in this module keeps.
    Boundaries here are EXACT percentiles of the key (one aggregate,
    broadcast back as a 1-row relation), so shard membership is a pure
    function of the data: deterministic at any parallelism.  Cost: one
    extra aggregate pass over the key column + one shuffle on shard —
    at 100 TB prefer `percentile_approx` for the boundary pass (same
    plan shape; boundaries then depend only on the t-digest, still
    layout-independent for a deterministic merge order, and a boundary
    shifted by a few keys moves rows between ADJACENT shards without
    touching the concatenated order, which is the actual contract).

    Output: input columns + ``shard`` (0-based), rows sorted by (shard,
    key, tie_cols) within each task."""
    qs = [i / n_shards for i in range(1, n_shards)]
    pct = F.percentile(F.col(key_col), F.array(*[F.lit(q) for q in qs]))
    bounds = df.agg(pct.alias("_bounds"))
    shard = F.aggregate(
        F.col("_bounds"),
        F.lit(0),
        lambda acc, b: acc + (F.col(key_col) > b).cast("int"),
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("shard", shard)
        .drop("_bounds")
        .repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", key_col, *tie_cols)
    )


def unimax_allocation(
    df: DataFrame,
    lang_col: str,
    tokens_col: str,
    token_budget: int,
    max_epochs: int = 4,
) -> DataFrame:
    """UniMax language-balanced budget allocation (Chung et al. 2023,
    "UniMax: Fairer and More Effective Language Sampling for Large-Scale
    Multilingual Pretraining"): split a total token budget across
    languages as uniformly as possible, capping every language at
    ``max_epochs`` passes over its corpus — low-resource languages stop
    being drowned out without being repeated into memorization.

    Water-filling, exactly the paper's greedy: visit languages in
    ASCENDING corpus size; a language is CAPPED (gets max_epochs · n
    tokens) when its cap is at most the current fair share of the
    remaining budget, else it and every larger language split the
    remainder evenly.  The capped set is a prefix of the size order, so
    the whole allocation is closed-form over one cumulative sum:
    capped(r) ⇔ e·n_r·(L−r+1) ≤ B − e·cum_{r−1} — ALL-INTEGER arithmetic
    (``max_epochs`` is an int), so the capped/uncapped decision is exact
    in every engine; only the final uncapped per-language rate involves
    float division, and that is micro-unit rounded (×1e6, half-away,
    BIGINT) so the published numbers are bit-identical cross-engine.

    The per-language frame is one row per language — the single-partition
    windows here sort dozens of rows, not the corpus (the corpus-sized
    work is the one map-side-combined groupBy).  Output, one row per
    language: (lang, n_docs, n_tokens, capped, budget_tokens_micro,
    rate_micro) where rate = allocated epochs for the language
    (= budget/n_tokens, ≤ max_epochs; capped rows are exactly
    max_epochs·1e6)."""
    from pyspark.sql import Window as W

    if max_epochs < 1 or int(max_epochs) != max_epochs:
        raise ValueError(f"max_epochs must be a positive int, got {max_epochs}")
    e = int(max_epochs)
    stats = df.groupBy(F.col(lang_col).alias("lang")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(tokens_col).cast("long")).alias("n_tokens"),
    )
    order = W.orderBy("n_tokens", "lang")
    ranked = (
        stats.withColumn("r", F.row_number().over(order))
        .withColumn(
            "cum_prev",
            F.coalesce(
                F.sum("n_tokens").over(
                    order.rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn("L", F.count(F.lit(1)).over(W.partitionBy()))
    )
    b = F.lit(int(token_budget)).cast("long")
    capped = (
        F.lit(e) * F.col("n_tokens") * (F.col("L") - F.col("r") + 1)
        <= b - F.lit(e) * F.col("cum_prev")
    )
    flagged = ranked.withColumn("capped", capped)
    agg = flagged.agg(
        F.sum(F.when(F.col("capped"), F.col("n_tokens")).otherwise(0)).alias(
            "cap_tokens"
        ),
        F.sum(F.col("capped").cast("int")).alias("k"),
    )
    # one row; broadcast back as a literal relation (no shuffle on the
    # corpus — everything after the stats groupBy is language-cardinality)
    shared = (
        (b - F.lit(e) * F.col("cap_tokens")).cast("double")
        / F.nullif((F.col("L") - F.col("k")).cast("double"), F.lit(0.0))
    )
    out = flagged.crossJoin(F.broadcast(agg)).select(
        "lang",
        "n_docs",
        "n_tokens",
        "capped",
        F.when(
            F.col("capped"),
            F.lit(e) * F.col("n_tokens") * F.lit(1000000),
        )
        .otherwise(F.round(shared * F.lit(1000000.0)).cast("long"))
        .alias("budget_tokens_micro"),
        F.when(F.col("capped"), F.lit(e) * F.lit(1000000))
        .otherwise(
            F.round(
                shared / F.col("n_tokens").cast("double") * F.lit(1000000.0)
            ).cast("long")
        )
        .cast("long")
        .alias("rate_micro"),
    )
    return out


def unimax_mix(
    df: DataFrame,
    key_col: str,
    lang_col: str,
    tokens_col: str,
    token_budget: int,
    max_epochs: int = 4,
    salt: str = "unimax",
    allocation: DataFrame | None = None,
) -> DataFrame:
    """Materialize the UniMax allocation as a document stream: each
    document emits ``floor(rate)`` full replicas plus one more for a
    content-hash-chosen ``frac(rate)`` subset of its language (the
    `epoch_repeat_mix` fan-out shape with per-language DATA-DEPENDENT
    epochs).  The fate rule is ALL-INTEGER with NO division:
    ``u32 · 1e6 < frac_micro · 2^32`` — both sides BIGINT products under
    2^63 — so replica membership is bit-identical across engines,
    partitionings, and cluster sizes (a divide-then-cast form would ride
    on cast semantics: Spark truncates double→long where DuckDB rounds).

    Plan: the language-cardinality allocation broadcasts onto the corpus
    scan; the replica fan-out is one explode(sequence) — no corpus
    shuffle anywhere.  Output: (key, lang, epoch) with epoch 0-based.

    The plan join is NULL-SAFE: `unimax_allocation`'s groupBy keeps a
    NULL-language group (and allocates budget to it), so the stream must
    deliver those documents too — a null-unsafe equi-join would silently
    drop every NULL-lang doc while the published plan still counted
    them.  ``allocation``: pass `unimax_allocation`'s output when the
    caller also publishes the plan itself, so the corpus-scale token
    aggregation underneath it runs once, not once per consumer."""
    alloc = (
        allocation
        if allocation is not None
        else unimax_allocation(
            df, lang_col, tokens_col, token_budget, max_epochs
        )
    )
    plan = alloc.select(
        F.col("lang").alias("_plan_lang"),
        (F.col("rate_micro") / F.lit(1000000)).cast("long").alias("_whole"),
        F.pmod(F.col("rate_micro"), F.lit(1000000)).alias("_frac_micro"),
    )
    u32 = F.conv(_hash_frac_hex(F.col(key_col), salt), 16, 10).cast("long")
    n = F.col("_whole") + (
        u32 * F.lit(1000000)
        < F.col("_frac_micro").cast("long") * F.lit(4294967296)
    ).cast("int")
    return (
        df.select(F.col(key_col), F.col(lang_col).alias("lang"))
        .join(
            F.broadcast(plan),
            F.col("lang").eqNullSafe(F.col("_plan_lang")),
        )
        .withColumn("_n", n)
        .filter(F.col("_n") > 0)
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), F.col("_n") - 1)))
        .select(key_col, "lang", "epoch")
    )


def temperature_allocation(
    df: DataFrame,
    lang_col: str,
    tokens_col: str,
    token_budget: int,
    alpha: float = 0.5,
) -> DataFrame:
    """Temperature-scaled sampling rates (mT5 / XLM-R style): language
    share ∝ n_lang^α, α ∈ (0, 1] — α=1 is proportional, smaller α
    flattens toward uniform, boosting low-resource languages.

    ``alpha`` must be 1/2^m (1.0, 0.5, 0.25, …): n^α is then computed by
    repeated ``sqrt``, which IEEE 754 requires to be CORRECTLY ROUNDED —
    bit-identical in every engine — where a general ``pow`` is
    libm-dependent at the ulp and can flip a rounding boundary between
    Spark and an oracle.  Each n^α is micro-unit rounded BEFORE the
    cross-language sum, so the normalizer is an order-independent BIGINT
    sum (the repo-wide float-determinism rule).  Output, one row per
    language: (lang, n_docs, n_tokens, scaled_micro, share_micro,
    budget_tokens, epochs_micro) where epochs = budget/n_tokens."""
    m = 0
    a = alpha
    while a < 1.0 and m < 8:
        a *= 2.0
        m += 1
    if a != 1.0:
        raise ValueError(
            f"alpha must be 1/2^m for exact cross-engine n^alpha, got {alpha}"
        )
    stats = df.groupBy(F.col(lang_col).alias("lang")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col(tokens_col).cast("long")).alias("n_tokens"),
    )
    scaled = F.col("n_tokens").cast("double")
    for _ in range(m):
        scaled = F.sqrt(scaled)
    stats = stats.withColumn(
        "scaled_micro", F.round(scaled * F.lit(1000000.0)).cast("long")
    )
    total = stats.agg(F.sum("scaled_micro").alias("_total"))
    b = F.lit(int(token_budget)).cast("double")
    share = F.col("scaled_micro").cast("double") / F.col("_total").cast("double")
    return stats.crossJoin(F.broadcast(total)).select(
        "lang",
        "n_docs",
        "n_tokens",
        "scaled_micro",
        F.round(share * F.lit(1000000.0)).cast("long").alias("share_micro"),
        F.round(b * share).cast("long").alias("budget_tokens"),
        F.round(
            b * share / F.col("n_tokens").cast("double") * F.lit(1000000.0)
        )
        .cast("long")
        .alias("epochs_micro"),
    )


def epoch_repeat_mix(
    sources: list[tuple[DataFrame, float]],
    key_col: str,
    salt: str = "epoch",
) -> DataFrame:
    """Epoch-repetition mixing — the data-recipe form "2.5 epochs of
    wiki, 1 epoch of web" (high-quality sources repeat; Llama/DoReMi
    style): each source's rows emit ``floor(epochs)`` full replicas plus
    one more for a content-hash-chosen ``frac(epochs)`` subset.  Output
    adds ``mix_source`` and ``epoch`` (0-based replica index) — the
    (key, epoch) pair is unique, so downstream interleave/shard steps
    can salt on it to spread replicas across the stream.

    Scan-side only: the replica fan-out is one ``explode(sequence)``
    per source and the fractional subset is the `hash_sample` predicate
    — no shuffle, no window; deterministic at any parallelism.  A
    replica COUNT n_i per row (not a join) keeps the plan width
    constant however large epochs get."""
    parts = []
    for idx, (df, epochs) in enumerate(sources):
        if epochs <= 0:
            raise ValueError(f"source {idx}: epochs must be > 0, got {epochs}")
        whole = int(epochs)
        frac = epochs - whole
        n = F.lit(whole) + (
            _hash_frac_hex(F.col(key_col), f"{salt}:{idx}")
            < F.lit(_threshold_hex(frac))
        ).cast("int")
        parts.append(
            df.withColumn("_n", n)
            .filter(F.col("_n") > 0)
            .withColumn(
                "epoch", F.explode(F.sequence(F.lit(0), F.col("_n") - 1))
            )
            .drop("_n")
            .withColumn("mix_source", F.lit(idx))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def cluster_balanced_sample(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = 16,
    per_cell_cap: int = 20,
    kmeans_iters: int = 8,
    sample_size: int = 2048,
    salt: str = "bal",
) -> DataFrame:
    """Topic-balanced subset selection over an embedding column — the
    "cluster, then cap per cluster" diversity recipe (the DataComp /
    cluster-balanced-sampling shape; SemDeDup's sibling: SemDeDup prunes
    near-identical vectors INSIDE a cell, this bounds how much any one
    TOPIC contributes to the mix).  A dominant cluster — one crawl
    template, one boilerplate genre — can no longer swamp the corpus.

    Pipeline: train the deterministic mini-k-means
    (`similarity._kmeans_centroids`: md5-hash-ordered sample, first-k
    seeding, micro-unit means — the engine-replayable build every
    trained ANN oracle unrolls), assign every vector to its
    argmax-cosine cell in one Arrow pass (`similarity.ivf_build`), score
    each vector's cosine to its own centroid (prototypicality — the
    quantity SemDeDup ranks within cells), then keep at most
    ``per_cell_cap`` rows per cell by content-hash rank
    (`sample_per_key`'s fate rule, partition/rerun-invariant).

    Returns (vec_id, cell, cos_centroid, sample_rank), sample_rank ≤
    ``per_cell_cap``.  100 TB shape: the assignment table is the IVF
    index layout (write once, partitioned by cell); the centroid
    relation is a ``n_cells``-row broadcast; the cosine is an in-plan
    zip_with fold (seed 0.0, left-to-right — the fold_dot /
    list_dot_product IEEE sequence, so the score SQL-replays); the cap
    is one window per cell, per-task input bounded by the cell (for
    pathological single-cell skew raise ``n_cells`` — cells are the
    unit of balance, so skew there is the signal, not an accident)."""
    from mistral_ocr_pipeline_spark.operators.similarity import ivf_build

    assigned, cent = ivf_build(
        emb, id_col, vec_col, n_cells, kmeans_iters, sample_size
    )
    spark = emb.sparkSession
    cdf = spark.createDataFrame(
        [(int(c), [float(x) for x in cv]) for c, cv in enumerate(cent)],
        "cell int, _cv array<double>",
    )
    cos = F.expr(
        "round(aggregate(zip_with(_v, _cv, (x, y) -> x * y), 0.0D,"
        " (acc, v) -> acc + v) / greatest(sqrt(aggregate(zip_with(_v, _v,"
        " (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)), 1e-12D), 6)"
    )
    scored = (
        assigned.select(
            "vec_id",
            "cell",
            F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
                "_v"
            ),
        )
        .join(F.broadcast(cdf), "cell")
        .select("vec_id", "cell", cos.alias("cos_centroid"))
    )
    return sample_per_key(scored, "cell", "vec_id", per_cell_cap, salt=salt)


def reservoir_sample(
    df: DataFrame, id_col: str, k: int, salt: str = "rsv"
) -> DataFrame:
    """EXACT-k uniform sample without replacement — the distributed
    reservoir: rank every row by md5(salt‖id) and keep the k smallest.

    Equivalent in distribution to Vitter's Algorithm R for any fixed
    salt-independent id set, but deterministic, rerun/partition-invariant,
    and mergeable (the bottom-k lattice law again — per-shard reservoirs
    union + re-cut to k EXACTLY reproduce the global reservoir, so daily
    shards keep k-row summaries and any union of shards re-samples
    without touching data).  `hash_sample` keeps a FRACTION (binomial
    count); this keeps an exact count — the eval-set / human-review
    budget shape ("exactly 10k docs for annotation").

    Plan shape: TakeOrdered — each task forwards its local bottom-k
    (id, hash) pairs, the driver merges p·k tiny rows; no global sort,
    no window, no shuffle of the corpus."""
    h = F.md5(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    ).alias("_rsv")
    return (
        df.select(F.col(id_col).alias("id"), h)
        .orderBy("_rsv", "id")
        .limit(k)
    )


def doremi_weights(
    docs: DataFrame,
    domain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    eta: float = 1.0,
    eps: float = 0.1,
) -> DataFrame:
    """DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi:
    Optimizing Data Mixtures Speeds Up Language Model Pretraining"):
    one exponentiated-gradient step from the uniform mixture, driven by
    per-domain EXCESS LOSS — how much worse the proxy loss is on a
    domain than the reference.  Domains whose text the proxy finds
    hardest (relative to the corpus baseline) get upweighted; domains
    already well-modeled fall back toward the uniform floor.

    This sandbox has no trained proxy/reference LM pair, so the proxy
    loss is the corpus-unigram surprisal (`text_analysis.
    unigram_surprisal` — the same external-LM-free perplexity proxy the
    quality filters use) and the reference loss is the corpus-wide mean
    of the same quantity; excess_d = max(0, L_d − L_corpus).  The
    update is the paper's step restricted to one round from uniform
    weights: w_d ∝ exp(η·excess_d), then smoothed with the uniform
    mixture, w ← (1−ε)·ŵ + ε·u  (paper's ε-smoothing, eq. 2).

    Determinism: per-doc surprisal is 6-dp rounded, converted to
    integer micro-units BEFORE any cross-doc aggregation, and both the
    per-domain and corpus means are half-up INTEGER divisions — so the
    only float ops after the per-doc round are one exp() and two final
    6-dp rounds (the ln/exp sub-ulp cross-engine drift the oracle
    convention already absorbs).

    Plan shape (100 TB): unigram_surprisal's two corpus passes
    (vocabulary groupBy, broadcast join-back + per-doc groupBy); after
    that everything is domain-sized — one groupBy over (domain), two
    1-row broadcast totals.  No windows, no collects.

    Returns (source, n_docs, loss_r6, ref_r6, excess_r6, weight_r6).
    """
    from mistral_ocr_pipeline_spark.operators.text_analysis import (
        unigram_surprisal,
    )

    per_doc = unigram_surprisal(docs, id_col, text_col)
    dom = docs.select(
        F.col(id_col).alias("id"), F.col(domain_col).alias("source")
    )
    micro = per_doc.join(dom, "id").select(
        "source",
        F.round(F.col("surprisal") * F.lit(1000000.0), 0)
        .cast("long")
        .alias("sm"),
    )
    per_dom = micro.groupBy("source").agg(
        F.sum("sm").alias("s"), F.count(F.lit(1)).alias("n_docs")
    )
    # half-up integer mean in micro-units (surprisal ≥ 0, so no sign leg)
    dom_mean = per_dom.withColumn(
        "lm", F.expr("(s * 2 + n_docs) div (2 * n_docs)")
    )
    ref = micro.agg(
        F.expr("(sum(sm) * 2 + count(*)) div (2 * count(*))").alias("ref")
    )
    e = dom_mean.crossJoin(F.broadcast(ref)).withColumn(
        "ex", F.greatest(F.col("lm") - F.col("ref"), F.lit(0).cast("long"))
    )
    b = e.withColumn(
        "bm",
        F.round(
            F.exp(F.lit(eta) * F.col("ex") / F.lit(1000000.0))
            * F.lit(1000000.0),
            0,
        ).cast("long"),
    )
    tot = b.agg(
        F.sum("bm").cast("double").alias("tb"),
        F.count(F.lit(1)).cast("double").alias("k"),
    )
    return b.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        (F.col("lm").cast("double") / 1e6).alias("loss_r6"),
        (F.col("ref").cast("double") / 1e6).alias("ref_r6"),
        (F.col("ex").cast("double") / 1e6).alias("excess_r6"),
        F.round(
            F.lit(1.0 - eps) * F.col("bm") / F.col("tb")
            + F.lit(eps) / F.col("k"),
            6,
        ).alias("weight_r6"),
    )


def doremi_resample(
    docs: DataFrame,
    domain_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    eta: float = 1.0,
    eps: float = 0.1,
    salt: str = "dmx",
) -> DataFrame:
    """DoReMi end-to-end: domain weights (`doremi_weights`) realized as
    an actual subsampled corpus.  A target mixture w over current
    domain masses n_d is realizable by DROPPING alone iff the rates are
    ≤ 1, so rates are r_d = (w_d / n_d) / max_e(w_e / n_e) — the most
    over-weighted domain keeps everything and every other domain is cut
    proportionally (the standard subsample-only mixture realization;
    upsampling is an epoch decision, cf. `epoch_repeat_mix`).

    Each doc's fate is the content-hash rule of `hash_sample`, but with
    the PER-DOMAIN rate computed in-plan: frac(md5(salt‖id)) < rate_d,
    where frac is the first 32 hash bits over 2³². frac is an exactly-
    representable dyadic rational and rate_d is 6-dp rounded from
    integer-derived inputs, so the decision replays bit-identically in
    any engine with md5.

    Plan shape: the weight/rate relation is domain-sized and broadcasts
    onto ONE corpus scan — beyond `doremi_weights`' own passes the
    resample adds no shuffle at all.

    Returns the kept rows: (doc_id, source, rate_r6)."""
    w = doremi_weights(
        docs, domain_col=domain_col, id_col=id_col, text_col=text_col,
        eta=eta, eps=eps,
    )
    rr = w.select(
        "source",
        (F.col("weight_r6") / F.col("n_docs")).alias("r_raw"),
    )
    mx = rr.agg(F.max("r_raw").alias("m"))
    rates = rr.crossJoin(F.broadcast(mx)).select(
        "source", F.round(F.col("r_raw") / F.col("m"), 6).alias("rate_r6")
    )
    # frac references the post-alias 'doc_id' — the filter runs on the
    # renamed projection, so F.col(id_col) would be unresolved for any
    # non-default id_col
    frac = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(salt + ":"), F.col("doc_id").cast("string"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.col(domain_col).alias("source"))
        .join(F.broadcast(rates), "source")
        .filter(frac < F.col("rate_r6"))
        .select("doc_id", "source", "rate_r6")
    )


def pareto_quality_gate(
    df: DataFrame,
    score_col: str,
    id_col: str = "doc_id",
    alpha: float = 3.0,
    x_m: float = 0.05,
    salt: str = "pareto",
) -> DataFrame:
    """CCNet / LLaMA-1 style stochastic quality gate: keep a document iff
    its classifier score exceeds a PARETO-sampled threshold (Wenzek et al.
    2020 §4.4; Touvron et al. 2023 kept CommonCrawl pages whose
    is-it-a-Wikipedia-reference score beat a Pareto draw).  Unlike a hard
    cutoff, low-scoring docs survive with probability P(T < s) — the tail
    of the quality distribution is sampled, not amputated, which keeps the
    kept corpus diverse while still biasing hard toward quality.

    Determinism: the "random" draw is u = md5(salt‖id)/2^32 (the same
    content-hash uniform every sampler in this module uses), so a document's
    fate is a pure function of its id — identical at local[8] and on 1000
    executors, across reruns and resumes, and replayable in plain SQL.
    The threshold is the Pareto quantile  T = x_m · (1−u)^(−1/α)  clamped
    to 1.0 (scores live in [0,1]); both sides of the keep comparison are
    rounded to 6 dp so the decision is engine-portable.

    Scan-level projection + filter-ready flag: no shuffle, no UDF.

    Returns (id, <score>_r6, pareto_u, pareto_threshold, keep)."""
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
    thresh = F.round(
        F.least(
            F.lit(1.0), F.lit(float(x_m)) * F.pow(F.lit(1.0) - u, F.lit(-1.0 / alpha))
        ),
        6,
    )
    score_r6 = F.round(F.col(score_col), 6)
    return df.select(
        F.col(id_col),
        score_r6.alias("score_r6"),
        F.round(u, 6).alias("pareto_u"),
        thresh.alias("pareto_threshold"),
        (score_r6 > thresh).alias("keep"),
    )
