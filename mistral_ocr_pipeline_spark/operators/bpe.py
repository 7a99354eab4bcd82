"""Real byte-pair encoding (Sennrich et al. 2016) — trained merge table
+ Arrow-batched application — replacing the regex proxy
(`text_analysis.bpe_token_count`) as the packing/chunking token basis.

**Train** (`bpe_train`): classic BPE over a bounded, md5-hash-ordered
corpus sample (the `_kmeans_centroids` sampling discipline — partition-
invariant and reproducible): words are whitespace-split, each word is a
character sequence plus an end-of-word symbol, and the most frequent
adjacent symbol pair is merged ``n_merges`` times.  Fully deterministic:
the sample order is pinned, and pair-frequency ties break
lexicographically — no RNG anywhere, so the same corpus always yields
the same merge table (rerun- and partition-invariant, the repo-wide
trainer convention).

**Apply** (`bpe_token_count_trained`): a scalar Arrow pandas_udf —
per batch, unique words tokenize once through a memo cache (Zipf makes
the cache hit rate high), each word by the GPT-2-style loop: repeatedly
merge every occurrence of the LOWEST-RANK adjacent pair present.  The
merge table is a few hundred pairs riding the closure; no per-row
Python at the Spark layer, and the kernel is O(|word| · merges-applied)
with the cache amortizing repeated words to O(1).

The merge LOOP has no SQL twin (iterative pairwise rewriting), so
queries built on this basis are registered rows-only; the kernel itself
is value-pinned in pytest against an independent reference BPE
implementation (the `j2_fuzzy_difflib` convention).

At 100 TB: training stays a one-shot bounded sample; application is
embarrassingly parallel (per-executor memo caches, no shuffle, no
broadcast beyond the small merge list), exactly how tokenizer-count
columns are produced for real pretraining pipelines.
"""

from __future__ import annotations

from collections import Counter

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

EOW = "</w>"


def bpe_train(
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_merges: int = 200,
    sample_size: int = 1024,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merges from a deterministic corpus sample.
    Ties in pair frequency break to the lexicographically SMALLEST pair
    (max count first) — pinned so retraining is bit-stable."""
    h = F.substring(
        F.md5(F.concat(F.lit("bpe:"), F.col(id_col).cast("string"))), 1, 8
    )
    sample = (
        corpus.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_t"))
        .orderBy(h, F.col("_id"))
        .limit(sample_size)
        .collect()
    )
    word_freq: Counter[str] = Counter()
    for r in sample:
        if r._t:
            word_freq.update(r._t.split())
    seqs: dict[str, list[str]] = {
        w: list(w) + [EOW] for w in word_freq
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for w, f in word_freq.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        for w, s in seqs.items():
            i, out = 0, []
            while i < len(s):
                if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = out
    return merges


def _encode_len(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Token count of one word under the merge table — the GPT-2 apply
    loop: merge every occurrence of the lowest-rank pair present,
    repeat until no learned pair remains."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        a, b = best_pair
        ab = a + b
        i, out = 0, []
        while i < len(syms):
            if i < len(syms) - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(ab)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return len(syms)


def bpe_token_count_trained(
    merges: list[tuple[str, str]],
) -> "Column | object":
    """Returns a pandas_udf column function: text → trained-BPE token
    count (sum of per-word counts; empty/NULL text → 0)."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    @F.pandas_udf(T.LongType())
    def _count(texts: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}
        out = []
        for t in texts:
            if not t:
                out.append(0)
                continue
            total = 0
            for w in t.split():
                n = cache.get(w)
                if n is None:
                    n = _encode_len(w, ranks)
                    cache[w] = n
                total += n
            out.append(total)
        return pd.Series(out, dtype="int64")

    return _count
