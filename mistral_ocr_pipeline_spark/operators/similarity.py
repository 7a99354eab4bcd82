"""Similarity search over embedding columns (array<float>).

* ``brute_force_topk`` — exact cosine top-k: the small query set is
  broadcast-joined against the corpus; dot products run as vectorized
  numpy inside one Arrow-batched stage (mapInPandas), top-k via a
  row_number window.  This is the exact baseline and the verification
  path for the ANN variants.
* ``lsh_topk``         — scale path: random-hyperplane bucketing with
  multi-probe (hamming-adjacent buckets), exact cosine only within probed
  buckets.  Recall/latency trade via ``n_planes`` / ``n_probe``.

At 100 TB the corpus side stays partitioned (never collected); only the
query block (k × dim floats) rides the broadcast. """

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window as W, functions as F, types as T

_TOPK_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType(), False),
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("cosine", T.DoubleType(), False),
    ]
)


def fold_dot(a: F.Column, b: F.Column) -> F.Column:
    """Dot product as a sequential ``aggregate`` fold over
    ``zip_with(a, b, *)`` — IN ARRAY ORDER, which is what makes it
    bit-identical to a SQL engine's sequential ``list_dot_product`` and
    therefore value-oracle-able.  The ONE shared definition: the exact
    fold shape (accumulator seed 0.0, left-to-right adds) is load-bearing
    for every oracle built on it — change it here or nowhere."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def cosine_expr(a: F.Column, b: F.Column, dp: int = 6) -> F.Column:
    """Cosine similarity via `fold_dot`, rounded to ``dp`` — the shared
    exact-verification expression of the retrieval/dedup stack."""
    return F.round(
        fold_dot(a, b) / (F.sqrt(fold_dot(a, a)) * F.sqrt(fold_dot(b, b))), dp
    )


def hash_embedding_col(text: F.Column, dim: int = 8) -> F.Column:
    """Deterministic pseudo-embedding for a text column: ``dim`` doubles
    in [-1, 1), component i derived from the first 32 md5 bits of
    ``text || '#i'``.  Every step is exact dyadic arithmetic, so the
    vector is bit-identical in any engine with md5 — the DuckDB twin is
    ``('0x' || substring(md5(t || '#' || i), 1, 8))::UBIGINT
    / 4294967296.0 * 2 - 1`` — which makes retrieval pipelines built on
    it value-oracle-able end to end.  Stands in for a real encoder the
    same way ``multimodal.deterministic_fake`` stands in for codecs: the
    Spark-side plumbing (schema, fan-out, cosine ranking) is real; only
    the model weights are fake."""
    comps = [
        F.conv(F.substring(F.md5(F.concat(text, F.lit(f"#{i}"))), 1, 8), 16, 10)
        .cast("long")
        .cast("double")
        / F.lit(4294967296.0)
        * 2
        - 1
        for i in range(dim)
    ]
    return F.array(*comps)


def _collect_queries(queries: DataFrame, id_col: str, vec_col: str):
    rows = queries.select(id_col, vec_col).collect()
    qids = np.array([r[0] for r in rows], dtype=np.int64)
    if not rows:  # norm(axis=1) on a shape-(0,) array would raise
        return qids, np.zeros((0, 0), dtype=np.float64)
    qmat = np.array([list(r[1]) for r in rows], dtype=np.float64)
    qmat /= np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-12)
    return qids, qmat


def _empty_topk(df: DataFrame) -> DataFrame:
    """Empty (query_id, vec_id, cosine, rank) frame — the zero-query /
    zero-corpus result of every ANN entry point (a periodic retrieval
    job's empty cycle must yield an empty frame, not a driver crash)."""
    spark = df.sparkSession
    return spark.createDataFrame(
        [],
        T.StructType(
            list(_TOPK_SCHEMA.fields)
            + [T.StructField("rank", T.IntegerType(), False)]
        ),
    )


def _emit_cell_pairs(
    b_qids: np.ndarray,
    b_qmat: np.ndarray,
    cell_queries: dict[int, list[int]],
    ids: np.ndarray,
    mat: np.ndarray,
    cells: np.ndarray,
) -> pd.DataFrame:
    """Vectorized (query, corpus-row) candidate emission for the IVF
    kernels: per probed cell, one matmul then np.repeat/np.tile batch
    emission — no per-candidate Python.  (query, row) pairs are unique by
    construction (a query probes distinct cells; a row lives in one cell),
    so no dedup pass is needed; self-pairs are masked out."""
    chunks: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
    for cell in np.unique(cells):
        qis = cell_queries.get(int(cell))
        if not qis:
            continue
        rows = np.where(cells == cell)[0]
        qarr = np.asarray(qis, dtype=np.int64)
        sims = b_qmat[qarr] @ mat[rows].T
        chunks.append(
            (np.repeat(qarr, len(rows)), np.tile(rows, len(qarr)), sims.ravel())
        )
    if chunks:
        qv = b_qids.take(np.concatenate([c[0] for c in chunks]))
        vv = ids.take(np.concatenate([c[1] for c in chunks]))
        ss = np.concatenate([c[2] for c in chunks])
        keep = qv != vv
        out_q, out_v, out_s = qv[keep], vv[keep], ss[keep]
    else:
        out_q = np.empty(0, np.int64)
        out_v = np.empty(0, np.int64)
        out_s = np.empty(0, np.float64)
    return pd.DataFrame(
        {"query_id": out_q, "vec_id": out_v, "cosine": out_s}
    ).astype({"query_id": "int64", "vec_id": "int64", "cosine": "float64"})


def _micro_away(y: np.ndarray) -> np.ndarray:
    """Vectorized `_micro`: ×1e6 rounded half-away-from-zero (the exact
    floor(y+0.5)/ceil(y-0.5) form of `_micro`, so numpy and the SQL
    ``round(x*1000000.0)::BIGINT`` agree on every boundary)."""
    y = y * 1e6
    return np.where(y >= 0, np.floor(y + 0.5), np.ceil(y - 0.5)).astype(np.int64)


def _seq_fold_dot(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Row-wise dot as a LEFT-TO-RIGHT fold over the dimension axis —
    the numpy twin of `fold_dot` / a SQL engine's sequential
    ``list_dot_product``.  ``np.dot``/``@`` use pairwise summation, whose
    intermediate rounding differs from a sequential fold at the ulp; the
    k-means replay below needs the SAME bits on both engines, so every
    dot in the training loop folds in array order (vectorized across
    rows — the loop is over the 64 dims, not the corpus).
    Shapes: (n, d) × (k, d) → (n, k)."""
    acc = np.zeros((a.shape[0], b.shape[0]), dtype=np.float64)
    for d in range(a.shape[1]):
        acc += a[:, d, None] * b[None, :, d]
    return acc


def _kmeans_centroids(
    corpus: DataFrame,
    id_col: str,
    vec_col: str,
    n_centroids: int,
    kmeans_iters: int,
    sample_size: int,
    seed: int,
) -> np.ndarray:
    """Mini k-means over a deterministic corpus sample, built so the WHOLE
    training replays bit-identically in SQL (the step that kept
    `ann_ivf_topk` rows-only through round 3):

    - **sample**: order by (md5-hex of the id, id) then limit — the same
      partition-invariant pseudo-random draw as `sampling._hash_frac_hex`
      (Spark executes it as TakeOrderedAndProject: per-partition top-n +
      driver merge, no full sort), and — unlike the previous xxhash64
      order — one a SQL engine reproduces verbatim.
    - **seeding**: the first ``n_centroids`` rows of the hash order (the
      order is already a uniform shuffle, so head-of-order IS a seeded
      random draw; an RNG ``choice`` would have no SQL twin).  ``seed``
      is retained for API compatibility and ignored.
    - **float discipline**: normalized sample vectors snap to integer
      micro-units, so every per-cell mean is an ORDER-INDEPENDENT integer
      sum (a group sum of raw doubles would depend on the engine's
      reduction order); all dots fold sequentially (`_seq_fold_dot`);
      every division/sqrt is a correctly-rounded IEEE op with pinned
      operand order.  Equal-dot argmax ties break to the LOWEST cell
      (numpy first-max == SQL ``row_number() ... ORDER BY d DESC, c``).
      Remaining cross-engine exposure is ulp-level dot noise flipping a
      near-exact assignment tie — the same exposure every green ANN
      oracle already carries."""
    h = F.substring(
        F.md5(F.concat(F.lit("ivf:"), F.col("_id").cast("string"))), 1, 8
    )
    sample = (
        corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy(h, F.col("_id"))
        .limit(sample_size)
        .collect()
    )
    if not sample:
        raise ValueError(
            "_kmeans_centroids: corpus is empty — no vectors to seed cells"
        )
    smat = np.array([list(r._v) for r in sample], dtype=np.float64)
    nrm2 = np.zeros(len(smat), dtype=np.float64)
    for d in range(smat.shape[1]):  # sequential fold, see _seq_fold_dot
        nrm2 += smat[:, d] * smat[:, d]
    u = _micro_away(smat / np.maximum(np.sqrt(nrm2), 1e-12)[:, None])
    uf = u.astype(np.float64)  # micro ints are exactly representable
    k = min(n_centroids, len(u))

    def _centroid(sum_u: np.ndarray, n: int) -> np.ndarray:
        m = sum_u.astype(np.float64) / (n * 1e6)
        mn2 = 0.0
        for x in m:  # sequential fold
            mn2 += x * x
        return m / max(np.sqrt(mn2), 1e-12)

    cent = np.stack([_centroid(u[c], 1) for c in range(k)])
    for _ in range(kmeans_iters):
        assign = np.argmax(_seq_fold_dot(uf, cent), axis=1)
        for c in range(len(cent)):
            members = u[assign == c]
            if len(members):
                cent[c] = _centroid(members.sum(axis=0), len(members))
    return cent


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    exclude_self: bool = True,
) -> DataFrame:
    """Exact cosine top-k per query.  The per-partition kernel is one
    numpy matmul per Arrow batch (no per-row Python); the final top-k is a
    per-query partial: each partition emits only its local top-k, so the
    shuffle carries O(#queries × k × #partitions) rows, not the corpus."""
    qids, qmat = _collect_queries(queries, query_id_col, vec_col)
    if qids.size == 0:
        return _empty_topk(corpus)
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast((qids, qmat, k))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_qids, b_qmat, b_k = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["_id"].to_numpy(dtype=np.int64)
            mat = np.array([list(v) for v in pdf["_vec"]], dtype=np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            sims = b_qmat @ mat.T  # (nq, nb)
            if exclude_self:
                mask = b_qids[:, None] == ids[None, :]
                sims = np.where(mask, -np.inf, sims)
            take = min(b_k, sims.shape[1])
            idx = np.argpartition(-sims, take - 1, axis=1)[:, :take]
            # batch emission (np.repeat/take), no per-candidate Python —
            # same pattern as the LSH/IVF kernels; the final window sorts,
            # so emission order is free
            vals = np.take_along_axis(sims, idx, axis=1).ravel()
            keep = vals != -np.inf
            out_q = np.repeat(b_qids, take)[keep]
            out_v = ids[idx.ravel()[keep]]
            out_s = vals[keep]
            yield pd.DataFrame(
                {"query_id": out_q, "vec_id": out_v, "cosine": out_s}
            ).astype({"query_id": "int64", "vec_id": "int64", "cosine": "float64"})

    from mistral_ocr_pipeline_spark.operators.util import ensure_parallelism

    local = ensure_parallelism(corpus).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec")
    ).mapInPandas(kernel, _TOPK_SCHEMA)
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    n_planes: int = 6,
    n_probe: int = 3,
    n_tables: int = 4,
    seed: int = 7,
) -> DataFrame:
    """ANN: multi-table hyperplane-LSH with multi-probe.

    ``n_tables`` independent hash tables (candidate union) × per-table
    multi-probe (own bucket + ``n_probe-1`` lowest-margin bit flips):
    recall scales with L·probe while each probe touches only one bucket.
    Exact cosine runs only within probed buckets.  A candidate pair found
    by several tables is scored redundantly and deduped by the final
    window — the shuffle carries per-partition top candidates only."""
    first = corpus.select(F.size(F.col(vec_col)).alias("d")).first()
    qids, qmat = _collect_queries(queries, query_id_col, vec_col)
    if first is None or qids.size == 0:  # empty corpus or query batch
        return _empty_topk(corpus)
    d = first.d
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((n_tables, n_planes, d))
    pows = 1 << np.arange(n_planes)
    probe_sets: list[list[tuple[int, int]]] = []  # [(table, bucket)]
    for qi in range(len(qids)):
        probes = []
        for t in range(n_tables):
            proj = qmat[qi] @ planes[t].T
            bucket = int(((proj >= 0) @ pows))
            probes.append((t, bucket))
            for bit in np.argsort(np.abs(proj))[: max(0, n_probe - 1)]:
                probes.append((t, bucket ^ (1 << int(bit))))
        probe_sets.append(probes)
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast((qids, qmat, probe_sets, planes, k))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_qids, b_qmat, b_probes, b_planes, b_k = bc.value
        n_t, n_p, _ = b_planes.shape
        b_pows = 1 << np.arange(n_p)
        probe_of: dict[tuple[int, int], list[int]] = {}
        for qi, probes in enumerate(b_probes):
            for key in probes:
                probe_of.setdefault(key, []).append(qi)
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["_id"].to_numpy(dtype=np.int64)
            mat = np.array([list(v) for v in pdf["_vec"]], dtype=np.float64)
            norms = np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            mat = mat / norms
            chunks: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
            for t in range(n_t):
                bits = (((mat @ b_planes[t].T) >= 0) @ b_pows).astype(np.int64)
                for bucket in np.unique(bits):
                    qis = probe_of.get((t, int(bucket)))
                    if not qis:
                        continue
                    rows = np.where(bits == bucket)[0]
                    qarr = np.asarray(qis, dtype=np.int64)
                    sims = b_qmat[qarr] @ mat[rows].T
                    # batch pair emission — no per-candidate Python
                    chunks.append(
                        (np.repeat(qarr, len(rows)), np.tile(rows, len(qarr)),
                         sims.ravel())
                    )
            if chunks:
                qq = np.concatenate([c[0] for c in chunks])
                vv = ids.take(np.concatenate([c[1] for c in chunks]))
                ss = np.concatenate([c[2] for c in chunks])
                qv = b_qids.take(qq)
                keep = qv != vv  # self-exclusion
                qq, qv, vv, ss = qq[keep], qv[keep], vv[keep], ss[keep]
                # cross-table dedup: duplicate (query, vec) pairs carry
                # IDENTICAL cosines (same two unit vectors), so keeping the
                # lexsort-first occurrence is value-neutral
                order = np.lexsort((vv, qq))
                qq, qv, vv, ss = qq[order], qv[order], vv[order], ss[order]
                first = np.ones(len(qq), dtype=bool)
                first[1:] = (qq[1:] != qq[:-1]) | (vv[1:] != vv[:-1])
                out_q, out_v, out_s = qv[first], vv[first], ss[first]
            else:
                out_q = np.empty(0, np.int64)
                out_v = np.empty(0, np.int64)
                out_s = np.empty(0, np.float64)
            yield pd.DataFrame(
                {"query_id": out_q, "vec_id": out_v, "cosine": out_s}
            ).astype({"query_id": "int64", "vec_id": "int64", "cosine": "float64"})

    from mistral_ocr_pipeline_spark.operators.util import ensure_parallelism

    local = ensure_parallelism(corpus).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec")
    ).mapInPandas(kernel, _TOPK_SCHEMA)
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    n_centroids: int = 16,
    n_probe: int = 3,
    kmeans_iters: int = 8,
    sample_size: int = 2048,
    seed: int = 11,
    centroids: np.ndarray | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: seeded mini k-means on a driver-side sample
    builds ``n_centroids`` cell centroids; each corpus vector is assigned to
    its nearest centroid in the same Arrow pass that scores it; each query
    probes its ``n_probe`` nearest cells and runs exact cosine only there.

    The index build touches ``sample_size`` vectors (one bounded collect);
    corpus assignment + search is one distributed pass — the classic
    IVF-Flat layout, recall tuned by ``n_probe``/``n_centroids``.  At
    warehouse scale the assignment would be written once as a bucketed
    column and reused across queries.

    ``centroids``: a data-independent (n_centroids, dim) float64 array to
    use INSTEAD of the k-means build — the literal-replay oracle variant;
    since late r4 the TRAINED path is also SQL-replayable
    (`_kmeans_centroids` is engine-deterministic and
    ``_ivf_trained_oracle_sql`` unrolls the iterations), so both variants
    carry full value oracles; the search path is identical either way.
    ``seed`` is accepted for API compatibility but has no effect — see
    `ivf_build`."""
    # guards BEFORE the index build: an empty query batch must not pay
    # (or an empty corpus crash in) the sample collect + k-means loop —
    # the empty-cycle contract every ANN entry point keeps
    qids, qmat = _collect_queries(queries, query_id_col, vec_col)
    if qids.size == 0:
        return _empty_topk(corpus)
    if centroids is not None:
        cent = np.asarray(centroids, dtype=np.float64)
    else:
        if corpus.select(id_col).first() is None:
            return _empty_topk(corpus)
        cent = _kmeans_centroids(
            corpus, id_col, vec_col, n_centroids, kmeans_iters, sample_size, seed
        )
    q_cells = np.argsort(-(qmat @ cent.T), axis=1)[:, :n_probe]
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast((qids, qmat, q_cells, cent, k))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_qids, b_qmat, b_qcells, b_cent, b_k = bc.value
        cell_queries: dict[int, list[int]] = {}
        for qi, cells in enumerate(b_qcells):
            for c in cells:
                cell_queries.setdefault(int(c), []).append(qi)
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["_id"].to_numpy(dtype=np.int64)
            mat = np.array([list(v) for v in pdf["_vec"]], dtype=np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            cells = np.argmax(mat @ b_cent.T, axis=1)
            yield _emit_cell_pairs(b_qids, b_qmat, cell_queries, ids, mat, cells)

    from mistral_ocr_pipeline_spark.operators.util import ensure_parallelism

    local = ensure_parallelism(corpus).select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec")
    ).mapInPandas(kernel, _TOPK_SCHEMA)
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def ivf_build(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    kmeans_iters: int = 8,
    sample_size: int = 2048,
    seed: int = 11,
) -> tuple[DataFrame, np.ndarray]:
    """Build the IVF index as DATA: (corpus rows + their cell id, centroid
    matrix).  The assignment DataFrame is meant to be WRITTEN ONCE —
    partitioned/bucketed by ``cell`` — and reused across query batches:
    ``ivf_topk`` re-assigns the whole corpus per call, which is the right
    shape for one-off queries but an O(corpus) rescan per batch when
    queries arrive continuously.  With a persisted assignment table each
    search touches only the probed cells' partitions (partition pruning on
    ``cell``), the warehouse IVF layout.

    ``seed`` is accepted for API compatibility but has NO effect since
    the training became engine-replayable (see `_kmeans_centroids`:
    seeding is the head of the content-hash order, not an RNG draw) —
    two builds over the same corpus yield identical indexes regardless
    of seed; vary ``sample_size``/``n_centroids`` for genuinely
    different indexes."""
    cent = _kmeans_centroids(
        corpus, id_col, vec_col, n_centroids, kmeans_iters, sample_size, seed
    )
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(cent)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.array([list(v) for v in pdf["_vec"]], dtype=np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            pdf = pdf.rename(columns={"_id": "vec_id", "_vec": "embedding"})
            pdf["cell"] = np.argmax(mat @ c.T, axis=1).astype("int32")
            yield pdf

    from mistral_ocr_pipeline_spark.operators.util import ensure_parallelism

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType()), True),
            T.StructField("cell", T.IntegerType(), False),
        ]
    )
    assigned = (
        ensure_parallelism(corpus)
        .select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"))
        .mapInPandas(kernel, schema)
    )
    return assigned, cent


def ivf_search_assigned(
    assigned: DataFrame,
    centroids: np.ndarray,
    queries: DataFrame,
    k: int = 10,
    n_probe: int = 3,
    query_id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search a PERSISTED IVF assignment table: queries probe their
    ``n_probe`` nearest cells; a ``cell IN (...)`` filter prunes the scan
    BEFORE any compute (partition pruning when the table is written
    partitioned by cell), then exact cosine runs only on surviving rows.
    Same output contract as ``ivf_topk`` (query_id, vec_id, cosine, rank)."""
    qids, qmat = _collect_queries(queries, query_id_col, vec_col)
    if qids.size == 0:
        return _empty_topk(assigned)
    q_cells = np.argsort(-(qmat @ centroids.T), axis=1)[:, :n_probe]
    probed = sorted({int(c) for row in q_cells for c in row})
    spark = assigned.sparkSession
    bc = spark.sparkContext.broadcast((qids, qmat, q_cells, k))

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        b_qids, b_qmat, b_qcells, b_k = bc.value
        cell_queries: dict[int, list[int]] = {}
        for qi, cells in enumerate(b_qcells):
            for c in cells:
                cell_queries.setdefault(int(c), []).append(qi)
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["vec_id"].to_numpy(dtype=np.int64)
            cells = pdf["cell"].to_numpy(dtype=np.int64)
            mat = np.array([list(v) for v in pdf["embedding"]], dtype=np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            yield _emit_cell_pairs(b_qids, b_qmat, cell_queries, ids, mat, cells)

    local = (
        assigned.filter(F.col("cell").isin(probed))  # scan-level cell pruning
        .select("vec_id", "embedding", "cell")
        .mapInPandas(kernel, _TOPK_SCHEMA)
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id").asc()
    )
    return (
        local.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


# --------------------------------------------------------------------------
# Product quantization (PQ) — the memory-bound 100 TB embedding-search shape
# --------------------------------------------------------------------------
def seeded_pq_codebooks(
    dim: int, m: int = 8, ksub: int = 16, seed: int = 29
) -> np.ndarray:
    """Data-independent PQ codebooks: ``m`` sub-codebooks of ``ksub``
    codewords over ``dim//m``-dim subspaces, components ~N(0, 1/dim) —
    the per-component scale of a unit vector in ``dim`` dimensions, so
    random codewords land at the data's magnitude.  Deterministic given
    the seed, hence bake-able into a SQL oracle as float64 literals
    (the same convention as the fixed-centroid IVF variant)."""
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    rng = np.random.RandomState(seed)
    return rng.standard_normal((m, ksub, dim // m)) / np.sqrt(dim)


def pq_codebooks_kmeans(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    ksub: int = 16,
    iters: int = 8,
    sample_size: int = 2048,
    seed: int = 29,
    residual_centroids: np.ndarray | None = None,
) -> np.ndarray:
    """Trained PQ codebooks: per-subspace Lloyd k-means (L2) over a
    deterministic corpus sample.  ``residual_centroids``: train on IVF
    RESIDUALS instead of raw vectors (v − centroid[argmax-dot cell], the
    FAISS ``by_residual`` convention) — the assignment uses the exact
    IVF rule (sequential-fold dots, first-max ties), so the whole
    residual stream replays in SQL through the same ``cassign`` CTEs — ENGINE-REPLAYABLE with the same
    discipline as `_kmeans_centroids` (the trained-IVF treatment), so a
    SQL oracle can unroll the whole training:

    - sample ordered by (md5-hex of the id, id) then limited
      (partition-invariant AND reproducible verbatim in SQL);
    - seeding = the first ``ksub`` sample rows per subspace (``seed`` is
      retained for API compatibility and ignored — an RNG ``choice``
      has no SQL twin);
    - assignment distances use the PQ reduced form ``c·c − 2·x·c`` on
      RAW subvectors with SEQUENTIAL folds (ties → lowest codeword,
      numpy first-min == SQL row_number);
    - centroid updates are integer micro-unit means (``Σ round(x·1e6)``
      per dimension / (n·1e6)) — order-independent where a raw double
      group sum is not.  Raw (unnormalized) subvectors throughout —
      classic PQ quantizes L2 geometry."""
    h = F.substring(
        F.md5(F.concat(F.lit("pq:"), F.col("_id").cast("string"))), 1, 8
    )
    sample = (
        corpus.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
        .orderBy(h, F.col("_id"))
        .limit(sample_size)
        .collect()
    )
    if not sample:
        raise ValueError(
            "pq_codebooks_kmeans: corpus is empty — no vectors to train on"
        )
    smat = np.array([list(r._v) for r in sample], dtype=np.float64)
    if residual_centroids is not None:
        cent = np.asarray(residual_centroids, dtype=np.float64)
        # the IVF assignment rule verbatim: first-max of sequential-fold
        # dots on the RAW vector (normalization is argmax-invariant)
        assign = np.argmax(_seq_fold_dot(smat, cent), axis=1)
        smat = smat - cent[assign]
    dim = smat.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    for j in range(m):
        sub = smat[:, j * dsub : (j + 1) * dsub]
        u = _micro_away(sub)
        k = min(ksub, len(sub))
        cb = u[:k].astype(np.float64) / 1e6
        for _ in range(iters):
            cc = np.zeros(len(cb), dtype=np.float64)
            xc = np.zeros((len(sub), len(cb)), dtype=np.float64)
            for d in range(dsub):  # sequential folds, see _seq_fold_dot
                cc += cb[:, d] * cb[:, d]
                xc += sub[:, d, None] * cb[None, :, d]
            assign = np.argmin(cc[None, :] - 2 * xc, axis=1)
            for c in range(len(cb)):
                members = u[assign == c]
                if len(members):
                    cb[c] = members.sum(axis=0).astype(np.float64) / (
                        len(members) * 1e6
                    )
        books[j, :k] = cb
        if k < ksub:  # tiny sample: pad by cycling real centroids — a
            # duplicate codeword loses every argmin tie to its lower
            # index, so padding never changes codes (and unlike RNG
            # noise it keeps the codebook a pure function of the data)
            books[j, k:] = cb[np.arange(ksub - k) % k]
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vec: bool = False,
) -> DataFrame:
    """Encode each vector to ``m`` codes (argmin-L2 codeword per
    subspace) in one Arrow pass — a (batch × ksub) matmul per subspace,
    no per-row Python.  Ties break to the LOWEST codeword index (numpy
    argmin first-hit ≡ the oracle's ``ORDER BY dist, k`` row_number).

    Codes drop the reduced term ``x·x`` (constant per row, argmin-
    invariant): d ∝ c·c − 2·x·c, the exact expression the SQL twin
    replays.  Output: (id, codes array<int>[, vec]) — at warehouse scale
    the codes table is the index: m bytes of codes replace dim×4 bytes
    of floats (32× smaller at m=8/dim=64), written once and scanned by
    every query batch."""
    m, ksub, dsub = codebooks.shape
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast(codebooks)

    out_fields = [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("codes", T.ArrayType(T.IntegerType()), False),
    ]
    if keep_vec:
        out_fields.append(
            T.StructField("embedding", T.ArrayType(T.FloatType()), True)
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        books = bc.value
        c2 = (books**2).sum(axis=2)  # (m, ksub)
        for pdf in batches:
            if pdf.empty:
                continue
            mat = np.array([list(v) for v in pdf["_vec"]], dtype=np.float64)
            codes = np.empty((len(mat), books.shape[0]), dtype=np.int32)
            for j in range(books.shape[0]):
                sub = mat[:, j * dsub : (j + 1) * dsub]
                d = c2[j][None, :] - 2.0 * (sub @ books[j].T)
                codes[:, j] = np.argmin(d, axis=1)
            out = {
                "vec_id": pdf["_id"].to_numpy(dtype=np.int64),
                "codes": list(codes),
            }
            if keep_vec:
                out["embedding"] = pdf["_vec"]
            yield pd.DataFrame(out)

    from mistral_ocr_pipeline_spark.operators.util import ensure_parallelism

    return (
        ensure_parallelism(corpus)
        .select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_vec"))
        .mapInPandas(kernel, T.StructType(out_fields))
    )


def _micro(x: float) -> int:
    """×1e6 rounded HALF-AWAY-FROM-ZERO — matching SQL/Spark round()
    semantics (Python's built-in round is banker's and would disagree
    with the oracle on an exact .5 boundary)."""
    import math

    y = x * 1e6
    return int(math.floor(y + 0.5)) if y >= 0 else int(math.ceil(y - 0.5))


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "vec_id",
    refine: int | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """PQ asymmetric-distance top-k: corpus vectors become ``m`` small
    codes (``pq_encode``); each query precomputes a (m × ksub) lookup
    table of partial squared distances; scoring a corpus row is then m
    table lookups summed — a pure Catalyst ``aggregate`` fold over the
    broadcast LUT literal, zero floats read from the corpus and zero
    Python on the hot path.  adc_dist = ‖q‖² + Σⱼ (‖c‖² − 2·q·c) is the
    exact squared L2 to the RECONSTRUCTED vector; rank ascending.

    ``refine=R`` re-ranks each query's top-R ADC candidates with exact
    cosine (expression fold dot — bit-identical to sequential SQL), the
    classic two-stage PQ search: the approximate pass prunes the corpus
    to R rows per query, only those R rows' float vectors are ever
    touched.  At 100 TB: codes table scanned (32× smaller than floats),
    candidates join back to the vector table by id.

    ``exclude_self`` (default True, the ANN-module convention) drops the
    corpus row whose id equals the query id — pass False when query ids
    live in their OWN id space, or a numerically colliding corpus doc
    would silently never be retrievable for that query.

    LUT partials and ‖q‖² are rounded to exact integer micro-units
    driver-side, so the ADC fold sums LONGS — the same order-independence
    convention as `text_analysis.bm25_topk` (a raw-double fold rounded
    only at the end can flip the 6th decimal vs the oracle's
    different-order aggregation on an unlucky corpus).

    Queries ride the driver (same `_collect_queries` convention as every
    ANN kernel here): the LUT block is #queries × m × ksub longs."""
    m, ksub, dsub = codebooks.shape
    rows = queries.select(query_id_col, vec_col).collect()
    qids = [int(r[0]) for r in rows]
    qmat = np.array([list(r[1]) for r in rows], dtype=np.float64)
    c2 = (codebooks**2).sum(axis=2)  # (m, ksub)
    lut_rows = []
    for qi, qid in enumerate(qids):
        qv = qmat[qi]
        lut = np.empty((m, ksub), dtype=np.float64)
        for j in range(m):
            sub = qv[j * dsub : (j + 1) * dsub]
            lut[j] = c2[j] - 2.0 * (codebooks[j] @ sub)
        lut_rows.append(
            (
                qid,
                _micro(float(qv @ qv)),
                [_micro(float(x)) for x in lut.ravel()],
                [float(x) for x in qv],
            )
        )
    spark = corpus.sparkSession
    lut_df = spark.createDataFrame(
        lut_rows,
        T.StructType(
            [
                T.StructField("query_id", T.LongType(), False),
                T.StructField("_qq", T.LongType(), False),
                T.StructField("_lut", T.ArrayType(T.LongType()), False),
                T.StructField("_qv", T.ArrayType(T.DoubleType()), False),
            ]
        ),
    )

    enc = pq_encode(corpus, codebooks, id_col, vec_col, keep_vec=refine is not None)
    adc_micro = (
        F.col("_qq")
        + F.aggregate(
            F.sequence(F.lit(0), F.lit(m - 1)),
            F.lit(0).cast("long"),
            lambda acc, j: acc
            + F.element_at(
                F.col("_lut"), j * F.lit(ksub) + F.element_at(F.col("codes"), j + 1) + 1
            ),
        )
    )
    scored = enc.crossJoin(
        F.broadcast(lut_df.drop("_qv") if refine is None else lut_df)
    )
    if exclude_self:
        scored = scored.filter(F.col("vec_id") != F.col("query_id"))
    scored = scored.withColumn(
        "adc_dist", F.round(adc_micro / F.lit(1e6), 6)
    )
    w = W.partitionBy("query_id").orderBy(F.col("adc_dist").asc(), F.col("vec_id").asc())
    ranked = scored.withColumn("rank", F.row_number().over(w))
    if refine is None:
        return ranked.filter(F.col("rank") <= k).select(
            "query_id", "vec_id", "adc_dist", "rank"
        )

    dv = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    cand = ranked.filter(F.col("rank") <= int(refine)).select(
        "query_id", "vec_id", "_qv", dv.alias("_v")
    )
    cosine = cosine_expr(F.col("_qv"), F.col("_v"))
    w2 = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        cand.withColumn("cosine", cosine)
        .withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


# --------------------------------------------------------------------------
# Reciprocal-rank fusion — merge sparse (BM25) and dense (ANN) result lists
# --------------------------------------------------------------------------
def rrf_fuse(
    ranked: "list[DataFrame]",
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al.) of N ranked retrieval
    lists: score(q, d) = Σ_lists 1/(c + rank) — the standard way to
    merge BM25 and embedding ANN results without score calibration,
    since only RANKS enter the formula.  Returns (query, id, rrf_score,
    n_lists, rank) — ``n_lists`` = how many input lists retrieved the
    doc (the agreement signal).

    Contributions are rounded to exact integer micro-units before the
    sum (same determinism argument as ``text_analysis.bm25_topk``), so
    fusing any number of lists is bit-stable across partitionings and
    engines.  Precondition: each input list carries at most one row per
    (query, id) — a duplicate would contribute twice (every top-k
    operator in this module satisfies this by construction).  Plan shape: the inputs are already top-k-per-query (tiny
    relative to the corpus); fusion is one union + one well-keyed
    groupBy + one window — nothing corpus-sized moves."""
    parts = [
        df.select(
            F.col(query_col).alias("qid"),
            F.col(id_col).alias("id"),
            F.round(F.lit(1e6) / (F.lit(c) + F.col(rank_col)), 0)
            .cast("long")
            .alias("_m"),
        )
        for df in ranked
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    scored = u.groupBy("qid", "id").agg(
        F.round(F.sum("_m") / F.lit(1e6), 6).alias("rrf_score"),
        F.count(F.lit(1)).alias("n_lists"),
    )
    w = W.partitionBy("qid").orderBy(
        F.col("rrf_score").desc(), F.col("id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias(query_col),
            F.col("id").alias(id_col),
            "rrf_score",
            "n_lists",
            "rank",
        )
    )


def kcenter_select(
    df: DataFrame, id_col: str, vec_col: str, k: int = 6
) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez 1985, the classic
    2-approximation): seed with the lowest id, then repeatedly select the
    point FARTHEST (squared L2) from the already-selected set — the
    facility-location-style diversity pass a DataComp-shaped curation
    pipeline runs to pick maximally-spread exemplars (dedup prototypes,
    eval probes, balanced fine-tuning seeds).

    Deterministic and engine-replayable by the same conventions as the
    trained IVF/PQ paths: every dot product is a sequential left-to-right
    float64 fold (`fold_dot` ≡ DuckDB ``list_dot_product``), squared
    distance composes as ``(v·v − 2·v·s) + s·s`` in that exact order, and
    argmax ties break to the lowest id.  The oracle unrolls all k
    iterations as CTE stages.

    Scale shape: the selected set is k-sized (literal expressions in the
    plan — `_dot_lit_sql`, one py4j string per iteration), each iteration
    is ONE corpus scan ending in a 1-row max(struct) aggregate, and the
    corpus norm column ``vv`` is computed once.  k driver actions total,
    each collecting ONE row; the corpus never rides the driver.

    Returns (sel_rank, vec_id, radius_r6): the selection order and the
    point's distance to the prior selected set at selection time (the
    covering-radius sequence; NULL for the seed)."""
    from mistral_ocr_pipeline_spark.operators.similarity_df import (
        _dot_lit_sql,
        _dvec,
    )

    c = (
        df.select(F.col(id_col).alias("id"), _dvec(F.col(vec_col)).alias("v"))
        .withColumn("vv", fold_dot(F.col("v"), F.col("v")))
        .persist()
    )
    try:
        seed = c.orderBy("id").limit(1).collect()[0]
        selected = [(seed.id, list(seed.v), float(seed.vv))]
        out = [(1, int(seed.id), None)]
        for i in range(2, k + 1):
            dists = [
                F.expr(
                    f"(vv - 2.0D * {_dot_lit_sql('v', sv)}) + {svv!r}D"
                )
                for (_, sv, svv) in selected
            ]
            dist = F.least(*dists) if len(dists) > 1 else dists[0]
            # exclude already-selected ids: when every remaining distance
            # is 0 (duplicate vectors) the argmax must still pick a NEW
            # point, not re-pick a selected one
            sel_ids = [s[0] for s in selected]
            m = c.filter(~F.col("id").isin(sel_ids)).select(
                F.max(
                    F.struct(
                        dist.alias("d"),
                        (-F.col("id")).alias("ni"),
                        F.col("v").alias("vec"),
                    )
                ).alias("m")
            ).collect()[0].m
            picked_id = -int(m.ni)
            selected.append((picked_id, list(m.vec), _seq_dot_py(m.vec)))
            out.append((i, picked_id, round(float(m.d), 6)))
    finally:
        c.unpersist()
    spark = df.sparkSession
    return spark.createDataFrame(
        out, "sel_rank int, vec_id long, radius_r6 double"
    )


def _seq_dot_py(v) -> float:
    """Driver-side v·v as the same sequential fold (`fold_dot` twin)."""
    acc = 0.0
    for x in v:
        acc += x * x
    return acc


def mean_pool_embeddings(
    df: DataFrame,
    key_col: str,
    vec_col: str,
) -> DataFrame:
    """Chunk→document embedding aggregation: element-wise MEAN of each
    key's chunk vectors, the standard late-chunking / passage-pooling
    step before doc-level ANN or clustering (chunk with
    `packing.chunk_text_tokens`, embed per chunk, pool here).

    Returns (key, n_chunks, pooled: array<double>) — pooled[i] =
    halfup(Σ_chunks round(v_i·1e6) / n) / 1e6, the half-away-from-zero
    integer-micro-unit mean.

    Determinism at any parallelism: each component is micro-unit rounded
    BEFORE the cross-chunk sum (the IVF-centroid trick), so the sum is
    an ORDER-INDEPENDENT integer under every shuffle/partitioning —
    stronger than a sequential fold, which would need a chunk-ordering
    guarantee the operator would then have to enforce with a window.

    Plan shape (100 TB): posexplode → map-side-combinable integer SUM
    per (key, dim) → one shuffle keyed (key, dim) → per-key array
    rebuild.  No windows, no collects; dim fan-out is a scan-side map;
    a million-chunk doc costs one long per dim per partition."""
    ex = df.select(
        F.col(key_col).alias("key"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("i", "x"),
    ).select(
        "key",
        "i",
        F.round(F.col("x") * F.lit(1000000.0), 0).cast("long").alias("xm"),
    )
    per_dim = ex.groupBy("key", "i").agg(
        F.sum("xm").alias("sm"), F.count(F.lit(1)).alias("n")
    )
    # Half-away-from-zero mean in EXACT integer micro-units, then one
    # identical int->double division: round(sm/n/1e6, 6) on doubles is
    # engine-divergent at exact halves (Spark rounds the shortest
    # decimal repr via BigDecimal.valueOf, DuckDB the raw binary), so
    # the halfway case -0.0009895 splits.  Integer math never does.
    m = F.expr(
        "(CASE WHEN sm < 0 THEN -1 ELSE 1 END)"
        " * ((abs(sm) * 2 + n) div (2 * n))"
    )
    val = m.cast("double") / F.lit(1000000.0)
    return (
        per_dim.select("key", "n", F.struct("i", val.alias("v")).alias("p"))
        .groupBy("key")
        .agg(
            F.max("n").alias("n_chunks"),
            F.transform(
                F.sort_array(F.collect_list("p")), lambda s: s.getField("v")
            ).alias("pooled"),
        )
    )


def centroid_outliers(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    q: float = 0.05,
) -> DataFrame:
    """Embedding-space outlier flags: cosine of every vector to the
    GLOBAL corpus centroid, bottom-``q`` quantile flagged — the cheap
    embedding-sanity gate that catches encoder failures, empty-input
    embeddings, and off-manifold noise before they poison clustering /
    ANN / SemDeDup downstream.

    Returns (id, cos_centroid_r6, thr_r6, is_outlier) with is_outlier =
    cos ≤ the exact interpolated ``q``-quantile.

    The centroid is `mean_pool_embeddings` under a constant key — the
    half-away-from-zero integer-micro-unit mean, so its components (and
    therefore every cosine) are engine-exact facts.  Threshold parity:
    Spark `percentile` and DuckDB `quantile_cont` share the linear
    interpolation rule (the a11 convention).

    Plan shape: one (key,dim)-combinable integer aggregate for the
    centroid + one 1-row quantile aggregate, both broadcast back — zero
    driver actions, corpus scanned twice, never shuffled.  The exact
    quantile gathers the cosine column on one reducer; at 100 TB swap
    `F.percentile` for `F.percentile_approx` (t-digest, mergeable
    partials) and keep everything else."""
    centroid = (
        mean_pool_embeddings(
            df.select(F.lit(1).alias("_k"), F.col(vec_col)), "_k", vec_col
        )
        .select(F.col("pooled").alias("_c"))
    )
    scored = (
        df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("_v"))
        .crossJoin(F.broadcast(centroid))
        .select(
            "id",
            cosine_expr(
                F.transform("_v", lambda x: x.cast("double")), F.col("_c")
            ).alias("cos_centroid_r6"),
        )
    )
    thr = scored.agg(
        F.percentile(F.col("cos_centroid_r6"), F.lit(float(q))).alias("_thr")
    )
    return scored.crossJoin(F.broadcast(thr)).select(
        "id",
        "cos_centroid_r6",
        F.round("_thr", 6).alias("thr_r6"),
        (F.col("cos_centroid_r6") <= F.col("_thr")).alias("is_outlier"),
    )
