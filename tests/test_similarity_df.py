"""DataFrame-native ANN query sides (`operators/similarity_df`): value
parity with the collect-form kernels, corpus-sized query relations that
never ride the driver, and the IVFPQ composite."""

import numpy as np
from pyspark.sql import functions as F

from mistral_ocr_pipeline_spark.operators import similarity as S
from mistral_ocr_pipeline_spark.operators import similarity_df as D

SF_DIR = "/root/testdata/sf0.001"
SF_BIG = "/root/testdata/sf0.1"


def _emb(spark, sf=SF_DIR):
    return spark.read.parquet(f"{sf}/embeddings.parquet")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_brute_df_matches_collect_kernel(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 8)
    assert _rows(D.brute_force_topk_df(emb, q, k=5)) == _rows(
        S.brute_force_topk(emb, q, k=5)
    )


def test_lsh_df_matches_collect_kernel(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 8)
    kw = dict(k=5, n_planes=5, n_probe=4, n_tables=8)
    assert _rows(D.lsh_topk_df(emb, q, **kw)) == _rows(S.lsh_topk(emb, q, **kw))


def test_ivf_df_matches_collect_kernel_trained(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 8)
    kw = dict(k=5, n_centroids=16, n_probe=6)
    assert _rows(D.ivf_topk_df(emb, q, **kw)) == _rows(S.ivf_topk(emb, q, **kw))


def test_pq_df_matches_collect_kernel_adc_and_refine(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 8)
    cb = S.pq_codebooks_kmeans(emb, m=8, ksub=8, iters=4)
    assert _rows(D.pq_topk_df(emb, q, cb, k=5)) == _rows(S.pq_topk(emb, q, cb, k=5))
    assert _rows(D.pq_topk_df(emb, q, cb, k=5, refine=32)) == _rows(
        S.pq_topk(emb, q, cb, k=5, refine=32)
    )


def test_df_forms_large_repartitioned_query_relation(spark):
    """The r4-verdict done-criterion: the query side as a big (corpus-
    sized, multi-partition) DataFrame — results hash-equal to the collect
    kernel fed the same relation.  The collect form materializes all 500
    queries on the driver; the DF forms join them partitioned."""
    emb = _emb(spark)
    queries = emb.repartition(16)  # every corpus row is a query
    kw = dict(k=3, n_planes=5, n_probe=4, n_tables=8)
    assert _rows(D.lsh_topk_df(emb, queries, **kw)) == _rows(
        S.lsh_topk(emb, queries, **kw)
    )
    ikw = dict(k=3, n_centroids=16, n_probe=4)
    assert _rows(D.ivf_topk_df(emb, queries, **ikw)) == _rows(
        S.ivf_topk(emb, queries, **ikw)
    )
    # brute force, non-broadcast: the distributed cartesian shape
    assert _rows(
        D.brute_force_topk_df(emb, queries, k=3, broadcast_queries=False)
    ) == _rows(S.brute_force_topk(emb, queries, k=3))


def test_corpus_as_queries_sf01_smoke_no_driver_queries(spark):
    """sf0.1 corpus-as-queries smoke: the full 2000-vector corpus is the
    query relation.  Structural guarantee that queries never ride the
    driver: the LSH-DF plan is joins + window over two scans — no
    mapInPandas stage (where the collect form injects its broadcast
    query block) and no local (driver-built) table of queries."""
    emb = _emb(spark, SF_BIG)
    out = D.lsh_topk_df(emb, emb, k=3, n_planes=6, n_probe=2, n_tables=2)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "mapInPandas" not in plan
    assert "LocalTableScan" not in plan  # no driver-materialized relation
    n_queries_with_hits = out.select("query_id").distinct().count()
    assert n_queries_with_hits > 1500  # ~every query finds bucket-mates
    top1 = out.filter(F.col("rank") == 1)
    assert top1.count() == n_queries_with_hits


def test_ivfpq_matches_pq_at_full_probe(spark):
    """Probing ALL cells makes IVFPQ scan exactly what PQ scans, so the
    composite must reproduce `pq_topk` verbatim — isolates the cell-
    pruning logic from the ADC scoring it shares."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 8)
    cb = S.pq_codebooks_kmeans(emb, m=8, ksub=8, iters=4)
    full = D.ivfpq_topk(emb, q, k=5, n_centroids=16, n_probe=16, codebooks=cb)
    assert _rows(full) == _rows(S.pq_topk(emb, q, cb, k=5))


def test_ivfpq_prunes_to_probed_cells(spark):
    """With n_probe=1 every returned candidate must live in the query's
    single probed cell — the structural IVF guarantee."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 4)
    cent = S._kmeans_centroids(emb, "vec_id", "embedding", 8, 4, 512, 11)
    cb = S.pq_codebooks_kmeans(emb, m=8, ksub=8, iters=2)
    out = D.ivfpq_topk(
        emb, q, k=50, n_probe=1, centroids=cent, codebooks=cb
    ).collect()
    enc = {
        r.vec_id: r.cell
        for r in D.ivfpq_encode(emb, cent, cb).select("vec_id", "cell").collect()
    }
    qcell = {
        r.vec_id: int(
            np.argmax(S._seq_fold_dot(np.array([list(r.embedding)], float), cent))
        )
        for r in q.select("vec_id", "embedding").collect()
    }
    assert out
    for r in out:
        assert enc[r.vec_id] == qcell[r.query_id]


def test_ivfpq_encode_matches_pq_encode_codes(spark):
    emb = _emb(spark)
    cb = S.pq_codebooks_kmeans(emb, m=8, ksub=8, iters=2)
    cent = S._kmeans_centroids(emb, "vec_id", "embedding", 8, 4, 512, 11)
    a = {
        r.vec_id: list(r.codes)
        for r in D.ivfpq_encode(emb, cent, cb).collect()
    }
    b = {r.vec_id: list(r.codes) for r in S.pq_encode(emb, cb).collect()}
    assert a == b


def test_df_forms_empty_query_relation(spark):
    """Empty-cycle contract: an empty query DataFrame yields an empty
    result with the stable (query_id, vec_id, score, rank) schema."""
    emb = _emb(spark)
    none = emb.filter(F.col("vec_id") < 0)
    assert D.brute_force_topk_df(emb, none, k=3).count() == 0
    assert D.lsh_topk_df(emb, none, k=3).count() == 0
    assert D.ivf_topk_df(emb, none, k=3, n_centroids=8).count() == 0
    cb = S.seeded_pq_codebooks(64, m=8, ksub=8)
    assert D.pq_topk_df(emb, none, cb, k=3).count() == 0
    assert D.ivfpq_topk(emb, none, k=3, n_centroids=8, codebooks=cb).count() == 0


def test_ivfpq_persisted_index_roundtrip(spark, tmp_path):
    """The production flow: encode once, WRITE the (cell, codes) index,
    read it back, search with `ivfpq_search` — results identical to the
    inline composite."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 8)
    cent = S._kmeans_centroids(emb, "vec_id", "embedding", 16, 8, 2048, 11)
    cb = S.pq_codebooks_kmeans(emb, m=8, ksub=8, iters=4)
    path = str(tmp_path / "ivfpq_index")
    D.ivfpq_encode(emb, cent, cb).write.partitionBy("cell").parquet(path)
    stored = spark.read.parquet(path)
    got = D.ivfpq_search(stored, q, cent, cb, k=5, n_probe=4)
    inline = D.ivfpq_topk(
        emb, q, k=5, n_probe=4, centroids=cent, codebooks=cb
    )
    assert _rows(got) == _rows(inline)


def test_ivfpq_residual_differs_and_prunes(spark):
    """by_residual=True quantizes v − centroid[cell]: codes must differ
    from the raw-vector encoding (the codebooks live in residual space),
    while cell assignment — which residuals don't touch — is identical."""
    emb = _emb(spark)
    cent = S._kmeans_centroids(emb, "vec_id", "embedding", 16, 8, 2048, 11)
    cb_raw = S.pq_codebooks_kmeans(emb, m=8, ksub=8, iters=2)
    cb_res = S.pq_codebooks_kmeans(
        emb, m=8, ksub=8, iters=2, residual_centroids=cent
    )
    raw = {r.vec_id: (r.cell, tuple(r.codes))
           for r in D.ivfpq_encode(emb, cent, cb_raw).collect()}
    res = {r.vec_id: (r.cell, tuple(r.codes))
           for r in D.ivfpq_encode(emb, cent, cb_res, by_residual=True).collect()}
    assert all(raw[k][0] == res[k][0] for k in raw)  # same cells
    assert any(raw[k][1] != res[k][1] for k in raw)  # different codes
    q = emb.filter(F.col("vec_id") < 4)
    out = D.ivfpq_topk(
        emb, q, k=50, n_probe=1, centroids=cent, codebooks=cb_res,
        by_residual=True,
    ).collect()
    cells = {k: v[0] for k, v in res.items()}
    qcell = {
        r.vec_id: int(np.argmax(
            S._seq_fold_dot(np.array([list(r.embedding)], float), cent)))
        for r in q.select("vec_id", "embedding").collect()
    }
    assert out
    for r in out:  # pruning guarantee holds under residual encoding too
        assert cells[r.vec_id] == qcell[r.query_id]


# ---------------------------------------------------------------------------
# MMR diversified top-k
# ---------------------------------------------------------------------------
def _mmr_fixture(spark):
    """One query at the origin direction; two near-duplicate highly-
    relevant vectors (ids 1, 2), one moderately relevant orthogonal-ish
    vector (id 3), one filler (id 4)."""
    rows = [
        (0, [1.0, 0.0, 0.0]),          # query
        (1, [0.99, 0.14, 0.0]),        # rel ~.990, near-dup of 2
        (2, [0.99, 0.141, 0.001]),     # rel ~.990
        (3, [0.7, -0.7, 0.1]),         # rel ~.70, diverse
        (4, [0.5, 0.5, 0.7]),          # rel ~.50
    ]
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )


def test_mmr_prefers_diverse_second_pick(spark):
    emb = _mmr_fixture(spark)
    q = emb.filter(F.col("vec_id") == 0)
    out = {
        r.sel_rank: r
        for r in D.mmr_topk_df(emb, q, k=3, pool=4, lam_num=5).collect()
    }
    # pure relevance order is 1, 2, 3 — at λ=0.5 MMR must skip the
    # near-dup 2 (its maxsim≈1 wipes out its relevance edge)
    assert out[1].vec_id == 1 and out[1].maxsim_r6 == 0.0
    assert out[2].vec_id == 3, "second pick must be the diverse vector"
    assert out[3].vec_id == 2
    # integer score identity: mmr_m == 5*rel_m - 5*maxsim_m exactly
    for r in out.values():
        assert r.mmr_m == round(r.rel_r6 * 1e6) * 5 - round(r.maxsim_r6 * 1e6) * 5


def test_mmr_lambda_one_is_pure_relevance(spark):
    emb = _mmr_fixture(spark)
    q = emb.filter(F.col("vec_id") == 0)
    out = D.mmr_topk_df(emb, q, k=3, pool=4, lam_num=10, lam_den=10)
    assert [r.vec_id for r in out.orderBy("sel_rank").collect()] == [1, 2, 3]


def test_mmr_pool_smaller_than_k_and_multi_query(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") % 37 == 0)
    out = D.mmr_topk_df(emb, q, k=6, pool=6).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r)
    for qid, rs in per_q.items():
        ranks = sorted(x.sel_rank for x in rs)
        assert ranks == list(range(1, len(rs) + 1))
        assert len({x.vec_id for x in rs}) == len(rs), "no repeats"


def test_ivfsq_full_probe_matches_sq8(spark):
    # with every cell probed, IVF pruning is a no-op and the composite
    # must rank exactly like the flat SQ8 path
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 8)
    full = D.ivfsq_topk(emb, q, k=5, n_centroids=8, n_probe=8)
    flat = D.sq8_topk_df(emb, q, k=5)
    assert _rows(full) == _rows(flat)


def test_ivfsq_prunes_to_probed_cells(spark):
    # n_probe=1: every returned neighbor must live in the query's argmax
    # cell — the pruning is real, not cosmetic
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 4)
    cent = S._kmeans_centroids(emb, "vec_id", "embedding", 8, 4, 2048, 11)
    out = D.ivfsq_topk(emb, q, k=50, n_centroids=8, n_probe=1, centroids=cent)
    cells = {
        r.vec_id: r.cell
        for r in emb.select(
            "vec_id",
            D._argmax_cell(
                D._cell_dots("CAST(embedding AS array<double>)", cent)
            ).alias("cell"),
        ).collect()
    }
    for r in out.collect():
        assert cells[r.vec_id] == cells[r.query_id]


def test_ivfsq_empty_query_relation(spark):
    emb = _emb(spark)
    none = emb.filter(F.col("vec_id") < 0)
    assert D.ivfsq_topk(emb, none, k=3, n_centroids=8).count() == 0


# ---------------------------------------------------------------------------
# margin-based pair mining (margin_mine)
# ---------------------------------------------------------------------------
def _vec_df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id bigint, embedding array<double>",
    )


def _sep_vectors(n, dim=16, seed=11):
    rng = np.random.RandomState(seed)
    v = rng.standard_normal((n, dim))
    return v / np.linalg.norm(v, axis=1, keepdims=True)


def test_margin_mine_planted_clones(spark):
    """Identical-vector clones across the two sets are mined: cosine 1,
    margin above the neighbourhood mean; each mined pair is the mutual
    margin-argmax."""
    base = _sep_vectors(8)
    xs = _vec_df(spark, [(i, base[i]) for i in range(8)])
    ys = _vec_df(
        spark,
        [(100 + i, base[i]) for i in range(8)]
        + [(200 + i, v) for i, v in enumerate(_sep_vectors(4, seed=99))],
    )
    out = D.margin_mine(xs, ys, k=3, threshold=1.02).collect()
    mined = {(r.x_id, r.y_id) for r in out}
    assert {(i, 100 + i) for i in range(8)} <= mined
    for r in out:
        if r.y_id == 100 + r.x_id:
            assert r.cosine_r6 == 1.0
            assert r.margin_r6 >= 1.02


def test_margin_mine_requires_mutual_argmax(spark):
    """y's best x wins: when x1 and x2 both point at y but x2 is closer,
    (x1, y) is not mined even though y is x1's forward argmax."""
    d = 8
    e = np.eye(d)
    # x1 and x2 both similar to y=e0; x2 closer.  Fillers keep kNN lists
    # populated without competing.
    x1 = 0.80 * e[0] + 0.60 * e[1]
    x2 = 0.95 * e[0] + np.sqrt(1 - 0.95**2) * e[2]
    xs = _vec_df(spark, [(1, x1), (2, x2), (3, e[3]), (4, e[4])])
    ys = _vec_df(spark, [(10, e[0]), (11, e[5]), (12, e[6]), (13, e[7])])
    out = D.margin_mine(xs, ys, k=2, threshold=0.0).collect()
    mined = {(r.x_id, r.y_id) for r in out}
    assert (2, 10) in mined
    assert (1, 10) not in mined


def test_margin_mine_partition_invariant(spark):
    emb = _emb(spark)
    xs = emb.filter(F.col("vec_id") % 2 == 0)
    ys = emb.filter(F.col("vec_id") % 2 == 1)
    a = _rows(D.margin_mine(xs, ys, k=4, threshold=1.0))
    b = _rows(
        D.margin_mine(xs.repartition(7), ys.repartition(5), k=4, threshold=1.0)
    )
    assert a == b and len(a) > 0


def test_margin_mine_knn_pairs_passthrough(spark):
    """A precomputed candidate relation (the ANN-kernel hand-off shape)
    reproduces the default cross-join path exactly when it carries the
    same pairs."""
    emb = _emb(spark)
    xs = emb.filter(F.col("vec_id") % 2 == 0).limit(40)
    ys = emb.filter(F.col("vec_id") % 2 == 1).limit(40)
    x = xs.select(F.col("vec_id").alias("x_id"), D._dvec(F.col("embedding")).alias("_xv"))
    y = ys.select(F.col("vec_id").alias("y_id"), D._dvec(F.col("embedding")).alias("_yv"))
    pairs = x.crossJoin(y).select(
        "x_id", "y_id", D._micro_cosine(F.col("_xv"), F.col("_yv")).alias("cm")
    )
    a = _rows(D.margin_mine(xs, ys, k=3, threshold=1.0))
    b = _rows(D.margin_mine(xs, ys, k=3, threshold=1.0, knn_pairs=pairs))
    assert a == b


def test_margin_mine_nonpositive_denominator_dropped(spark):
    """Anti-correlated sets (kNN means sum ≤ 0) drop before the division
    — empty result, no sign-flipped margins, no error."""
    v = np.ones(4) / 2.0
    xs = _vec_df(spark, [(1, v)])
    ys = _vec_df(spark, [(2, -v)])
    assert D.margin_mine(xs, ys, k=1, threshold=0.0).count() == 0


# ---------------------------------------------------------------------------
# incremental IVF index maintenance (ivf_index_build/append, search-from-index)
# ---------------------------------------------------------------------------
def _fixed_cent(n=16, dim=64, seed=23):
    rng = np.random.RandomState(seed)
    c = rng.standard_normal((n, dim))
    return c / np.maximum(np.linalg.norm(c, axis=1, keepdims=True), 1e-12)


def test_ivf_index_append_equals_rebuild(spark):
    emb = _emb(spark)
    cent = _fixed_cent()
    base = emb.filter(F.col("vec_id") < 150)
    batch = emb.filter(F.col("vec_id") >= 150)
    merged = D.ivf_index_append(D.ivf_index_build(base, cent), batch, cent)
    rebuilt = D.ivf_index_build(emb, cent)
    assert _rows(merged) == _rows(rebuilt)
    assert merged.count() == emb.count()


def test_ivf_index_append_empty_batch_noop(spark):
    emb = _emb(spark)
    cent = _fixed_cent()
    idx = D.ivf_index_build(emb, cent)
    merged = D.ivf_index_append(idx, emb.filter(F.col("vec_id") < 0), cent)
    assert _rows(merged) == _rows(idx)


def test_ivf_search_from_maintained_index_matches_inplan(spark):
    """The persisted (and appended) index serves search identically to
    the in-plan assignment: ivf_topk_from_index == ivf_topk_df under
    the same frozen centroids."""
    emb = _emb(spark)
    cent = _fixed_cent()
    q = emb.filter(F.col("vec_id") < 8)
    base = emb.filter(F.col("vec_id") < 150)
    batch = emb.filter(F.col("vec_id") >= 150)
    idx = D.ivf_index_append(D.ivf_index_build(base, cent), batch, cent)
    a = _rows(D.ivf_topk_from_index(idx, emb, q, cent, k=5, n_probe=4))
    b = _rows(D.ivf_topk_df(emb, q, k=5, n_probe=4, centroids=cent))
    assert a == b and len(a) > 0


def test_margin_mine_ivf_candidates_keep_planted_pairs(spark):
    """The ANN-candidate path (cell equi-join feeding knn_pairs) still
    mines the planted identical-vector translations: an identical
    vector shares its source's argmax cell by construction, so the
    candidate restriction cannot lose those pairs."""
    from mistral_ocr_pipeline_spark.plans.entry_queries import QUERIES

    rows = QUERIES["embed_margin_mine_ivf"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    planted = {
        (r.x_id, r.y_id) for r in rows if r.y_id == r.x_id + 1000000
    }
    n_sources = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).filter("vec_id % 20 = 0").count()
    assert len(planted) == n_sources
    for r in rows:
        if (r.x_id, r.y_id) in planted:
            assert r.cosine_r6 == 1.0 and r.margin_r6 >= 1.02


def test_mrl_full_prefix_equals_exact(spark):
    """prefix_dim = full dimension degrades MRL to exact brute force —
    the identity boundary that pins the slicing arithmetic."""
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 8)
    a = _rows(D.mrl_refine_topk(emb, q, k=5, prefix_dim=64, refine=10**6))
    b = _rows(D.brute_force_topk_df(emb, q, k=5))
    assert a == b and len(a) > 0


def test_mrl_recall_floor_both_sfs(spark):
    """Recall claim at BOTH SFs (the recall-claim scale-independence
    rule): every query's recall_ok holds at sf0.001 and sf0.1."""
    from mistral_ocr_pipeline_spark.plans.entry_queries import QUERIES

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.1"):
        rows = QUERIES["ann_mrl_recall"](spark, sf).collect()
        assert rows and all(r.recall_ok for r in rows), (sf, rows)


# ---------------------------------------------------------------------------
# retrieval ranking metrics (retrieval_rank_metrics)
# ---------------------------------------------------------------------------
def test_rank_metrics_hand_computed(spark):
    """Tiny hand-checkable case: known ranks and grades give the exact
    precision/MRR/NDCG values, and a query with no relevant docs scores
    zeros rather than nulls."""
    import math

    results = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3),
         (2, 20, 1), (2, 21, 2)],
        "query_id long, vec_id long, rank long",
    )
    qrels = spark.createDataFrame(
        [(1, 11, 2), (1, 12, 1), (1, 99, 1)],  # 99 not retrieved
        "query_id long, vec_id long, grade long",
    )
    out = {r.query_id: r for r in D.retrieval_rank_metrics(results, qrels, k=3).collect()}
    r1 = out[1]
    assert r1.precision_r6 == round(2 / 3, 6)
    assert r1.mrr_r6 == 0.5  # first relevant at rank 2
    dcg = round(2 / math.log2(3) * 1e6) + round(1 / math.log2(4) * 1e6)
    idcg = round(2 / math.log2(2) * 1e6) + round(1 / math.log2(3) * 1e6) + round(1 / math.log2(4) * 1e6)
    assert r1.ndcg_r6 == round(dcg / idcg, 6)
    assert r1.n_rel_total == 3
    r2 = out[2]
    assert r2.precision_r6 == 0.0 and r2.mrr_r6 == 0.0 and r2.ndcg_r6 == 0.0
    assert r2.n_rel_total == 0


def test_rank_metrics_perfect_ranking_is_one(spark):
    """Retrieving every relevant doc in ideal order scores NDCG 1.0 and
    MRR 1.0 — the identity anchor."""
    results = spark.createDataFrame(
        [(7, 1, 1), (7, 2, 2), (7, 3, 3)],
        "query_id long, vec_id long, rank long",
    )
    qrels = spark.createDataFrame(
        [(7, 1, 3), (7, 2, 2), (7, 3, 1)],
        "query_id long, vec_id long, grade long",
    )
    r = D.retrieval_rank_metrics(results, qrels, k=3).collect()[0]
    assert r.ndcg_r6 == 1.0 and r.mrr_r6 == 1.0 and r.precision_r6 == 1.0


def test_margin_mine_threshold_monotone(spark):
    """Raising the threshold can only shrink the mined set, and every
    surviving pair is in the lower-threshold result with identical
    scores — the filter is the ONLY thing the threshold touches."""
    emb = _emb(spark)
    xs = emb.filter(F.col("vec_id") % 2 == 0)
    ys = emb.filter(F.col("vec_id") % 2 == 1)
    lo = {(r.x_id, r.y_id): r for r in D.margin_mine(xs, ys, k=4, threshold=1.0).collect()}
    hi = {(r.x_id, r.y_id): r for r in D.margin_mine(xs, ys, k=4, threshold=1.05).collect()}
    assert set(hi) <= set(lo) and len(hi) < len(lo)
    for k, r in hi.items():
        assert r.margin_r6 >= 1.05 and r.margin_r6 == lo[k].margin_r6
