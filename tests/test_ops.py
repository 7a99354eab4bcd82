"""Operator tests: dedup family, similarity search, text analysis, fuzzy
join, multimodal plumbing — on crafted micro-data plus the driver's sf0.001
tables."""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


class TestExactDedup:
    def test_groups(self, spark):
        from mistral_ocr_pipeline_spark.operators.dedup import exact_dedup

        df = spark.createDataFrame(
            [(1, "Hello  World"), (2, "hello world"), (3, "Other text!"), (4, "other TEXT")],
            "id long, text string",
        )
        out = {r.id: (r.dup_count, r.is_canonical) for r in exact_dedup(df, "id", "text").collect()}
        assert out[1] == (2, True) and out[2] == (2, False)
        assert out[3] == (2, True) and out[4] == (2, False)

    def test_keep_best(self, spark):
        from mistral_ocr_pipeline_spark.operators.dedup import (
            exact_dedup_keep_best,
        )

        df = spark.createDataFrame(
            [
                # group A: max score wins regardless of id order
                (1, "Hello  World", 10),
                (2, "hello world", 30),
                (3, "HELLO WORLD", 20),
                # group B: score tie -> lowest id wins
                (4, "other text", 7),
                (5, "Other Text", 7),
                # singleton
                (6, "unique", 1),
            ],
            "id long, text string, score long",
        )
        rows = exact_dedup_keep_best(df, "id", "text", "score").collect()
        out = {r.id: r for r in rows}
        assert out[2].is_canonical and not out[1].is_canonical
        assert out[1].canonical_id == 2 and out[1].canonical_score == 30
        assert out[1].dup_count == 3
        assert out[4].is_canonical and not out[5].is_canonical
        assert out[5].canonical_id == 4 and out[5].canonical_score == 7
        assert out[6].is_canonical and out[6].dup_count == 1

    def test_null_text_survives(self, spark):
        # NULL text coalesces to '' — the row must not vanish on a NULL
        # join key (the line_dedup defect class from the r4 advice).
        from mistral_ocr_pipeline_spark.operators.dedup import (
            exact_dedup,
            exact_dedup_keep_best,
        )

        df = spark.createDataFrame(
            [(1, None, 5), (2, "", 3)], "id long, text string, score long"
        )
        ex = {r.id: r for r in exact_dedup(df.drop("score"), "id", "text").collect()}
        assert set(ex) == {1, 2} and ex[1].dup_count == 2
        kb = {
            r.id: r
            for r in exact_dedup_keep_best(df, "id", "text", "score").collect()
        }
        assert set(kb) == {1, 2}
        assert kb[1].is_canonical and kb[2].canonical_score == 5


class TestMinhashSimhash:
    @pytest.fixture(scope="class")
    def near_dups(self, spark):
        base = (
            "the quick brown fox jumps over the lazy dog and keeps running "
            "through the green field towards the old farm house every day"
        )
        rows = [
            (1, base),
            (2, base.replace("green", "wide")),        # near-dup of 1
            (3, "completely different content about spark shuffles and "
                "partitioning strategies for large scale data processing work"),
            (4, base),                                  # exact dup of 1
        ]
        return spark.createDataFrame(rows, "id long, text string")

    def test_minhash_finds_near_dups(self, spark, near_dups):
        from mistral_ocr_pipeline_spark.operators.dedup import minhash_lsh_pairs

        pairs = {
            (r.id_a, r.id_b)
            for r in minhash_lsh_pairs(
                near_dups, "id", "text", n=3, num_perm=32, bands=8, threshold=0.5
            ).collect()
        }
        assert (1, 4) in pairs and (1, 2) in pairs
        assert not any(3 in p for p in pairs)

    def test_simhash_finds_near_dups(self, spark, near_dups):
        from mistral_ocr_pipeline_spark.operators.dedup import simhash_pairs

        # radius 3 is the 4-band pigeonhole bound; larger now raises
        pairs = {
            (r.id_a, r.id_b): r.hamming
            for r in simhash_pairs(near_dups, "id", "text", max_hamming=3).collect()
        }
        assert (1, 4) in pairs and pairs[(1, 4)] == 0
        assert not any(3 in p for p in pairs)

    def test_bucket_cap_is_surfaced_not_silent(self, spark):
        # degenerate all-identical corpus: every doc lands in the same
        # bucket of every band; with max_bucket below the corpus size the
        # cap drops pairs — the surviving pairs MUST carry the flag so the
        # loss is visible (module contract; silent before round 2)
        from mistral_ocr_pipeline_spark.operators.dedup import (
            minhash_lsh_pairs,
            simhash_pairs,
        )

        text = "identical spam document body repeated across the whole corpus"
        docs = spark.createDataFrame(
            [(i, text) for i in range(12)], "id long, text string"
        )
        mh = minhash_lsh_pairs(
            docs, "id", "text", n=3, num_perm=32, bands=8, threshold=0.5,
            max_bucket=8,
        ).collect()
        assert mh and all(r.bucket_truncated for r in mh)
        assert len(mh) == 8 * 7 // 2  # only capped-bucket members pair up
        sh = simhash_pairs(
            docs, "id", "text", max_hamming=3, max_bucket=8
        ).collect()
        assert sh and all(r.bucket_truncated for r in sh)
        # uncapped control: same corpora, flag must be clean
        mh2 = minhash_lsh_pairs(
            docs, "id", "text", n=3, num_perm=32, bands=8, threshold=0.5
        ).collect()
        assert mh2 and not any(r.bucket_truncated for r in mh2)

    def test_degenerate_spam_bucket_gather_is_bounded(self, spark):
        """A 500-doc all-identical spam corpus — the adversarial case where
        every doc lands in ONE bucket of every band.  Round-2 verdict
        item #1: the bucket gather must be the salted two-stage bounded
        collect (no single reducer materializes the full bucket), not a
        `collect_list → slice` whose agg buffer grows with the bucket.
        Asserts (a) the plan groups the first collect by a pmod salt key,
        (b) results are still correct: the cap keeps the 8 smallest ids
        per bucket, every surviving pair carries the flag, (c) exactly
        C(8,2) deduped pairs over the 8 smallest ids."""
        from mistral_ocr_pipeline_spark.operators.dedup import minhash_lsh_pairs

        text = "identical spam document body repeated across the whole corpus"
        docs = spark.createDataFrame(
            [(i, text) for i in range(500)], "id long, text string"
        )
        out = minhash_lsh_pairs(
            docs, "id", "text", n=3, num_perm=32, bands=8, threshold=0.5,
            max_bucket=8,
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "pmod" in plan, plan  # salted stage-1 gather is in the plan
        rows = out.collect()
        assert len(rows) == 8 * 7 // 2
        assert all(r.bucket_truncated for r in rows)
        # cap keeps the SMALLEST ids — identical to the unsalted semantics
        assert {r.id_a for r in rows} | {r.id_b for r in rows} == set(range(8))

    def test_observation_surfaces_caps_when_no_pair_survives(self, spark):
        """bucket_truncated rides surviving pairs only; when every candidate
        from a capped bucket fails verification the output is empty and the
        cap would be invisible.  The Observation hook reports it anyway."""
        from pyspark.sql import Observation

        from mistral_ocr_pipeline_spark.operators.dedup import minhash_lsh_pairs

        text = "identical spam document body repeated across the whole corpus"
        docs = spark.createDataFrame(
            [(i, text) for i in range(30)], "id long, text string"
        )
        obs = Observation("mh_caps")
        # threshold > 1.0 is unsatisfiable: buckets cap, zero pairs survive
        out = minhash_lsh_pairs(
            docs, "id", "text", n=3, num_perm=32, bands=8, threshold=1.1,
            max_bucket=8, observation=obs,
        ).collect()
        assert out == []
        assert obs.get["truncated_buckets"] > 0
        assert obs.get["total_buckets"] >= obs.get["truncated_buckets"]

    def test_incremental_dedup_with_persisted_index(self, spark, tmp_path):
        """The production shape: build the posting-list index ONCE, persist
        it through the catalog, then dedup a new batch against history by
        reading the index back — results identical to computing over the
        live corpus, and the corpus side of verification is semi-join
        pruned (only candidate old docs are ever shingled)."""
        from mistral_ocr_pipeline_spark.operators.dedup import (
            build_minhash_index,
            minhash_incremental_pairs,
        )
        from mistral_ocr_pipeline_spark.sources.catalog import TableCatalog

        base = "some reasonably long document body about spark engines"
        hist = spark.createDataFrame(
            [(i, f"{base} variant {i}") for i in range(20)],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [(100, f"{base} variant 3"), (101, "completely different text here")],
            "doc_id long, text string",
        )
        cat = TableCatalog(spark, str(tmp_path / "wh_idx"))
        cat.overwrite(build_minhash_index(hist, "doc_id", "text"), "mh_index")
        via_persisted = sorted(
            (r.id_new, r.id_old)
            for r in minhash_incremental_pairs(
                new, hist, cat.read("mh_index"), "doc_id", "text", threshold=0.9
            ).collect()
        )
        via_inline = sorted(
            (r.id_new, r.id_old)
            for r in minhash_incremental_pairs(
                new, hist, build_minhash_index(hist, "doc_id", "text"),
                "doc_id", "text", threshold=0.9,
            ).collect()
        )
        assert via_persisted == via_inline
        assert (100, 3) in via_persisted  # the exact-duplicate hit
        assert all(p[0] != 101 for p in via_persisted)  # unrelated doc clean
        # the verification's corpus branch is pruned by a semi join
        plan = (
            minhash_incremental_pairs(
                new, hist, cat.read("mh_index"), "doc_id", "text"
            )._jdf.queryExecution().executedPlan().toString()
        )
        assert "LeftSemi" in plan, plan

    def test_index_append_equals_one_shot_build(self, spark, tmp_path):
        """minhash_index_append(build(old), new) must be EXACTLY
        build(old ∪ new) — including capped posting lists (the merge of
        two capped lists re-capped is lossless for smallest-id caps) and
        exact truncation flags — and must scan only the increment's text
        (the history side enters as index DATA, not documents)."""
        from mistral_ocr_pipeline_spark.operators.dedup import (
            build_minhash_index,
            minhash_index_append,
        )

        base = "some reasonably long document body about spark engines"
        hist = spark.createDataFrame(
            # 12 near-identical docs force shared (and, at max_bucket=8,
            # truncated) buckets across the old/new boundary
            [(i, f"{base} variant {i % 3}") for i in range(12)]
            + [(50, "an unrelated historical document entirely")],
            "doc_id long, text string",
        )
        new = spark.createDataFrame(
            [(100 + i, f"{base} variant {i % 3}") for i in range(6)]
            + [(200, "yet another singleton document")],
            "doc_id long, text string",
        )
        kw = dict(id_col="doc_id", text_col="text", max_bucket=8)
        one_shot = {
            (r.band_idx, r.band_hash): (tuple(r.ids), r.bucket_truncated)
            for r in build_minhash_index(hist.unionByName(new), **kw).collect()
        }
        merged_df = minhash_index_append(
            build_minhash_index(hist, **kw), new, **kw
        )
        merged = {
            (r.band_idx, r.band_hash): (tuple(r.ids), r.bucket_truncated)
            for r in merged_df.collect()
        }
        assert merged == one_shot
        assert any(tr for _ids, tr in merged.values())  # caps exercised

        # increment-only-signatures: persist history text and index to
        # parquet; the append plan over the PERSISTED index must scan the
        # new batch and the index — never the history documents
        hist_path = str(tmp_path / "hist_docs")
        idx_path = str(tmp_path / "mh_index")
        hist.write.parquet(hist_path)
        build_minhash_index(spark.read.parquet(hist_path), **kw).write.parquet(
            idx_path
        )
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            minhash_index_append(
                spark.read.parquet(idx_path), new, **kw
            ).explain("formatted")
        plan = buf.getvalue()
        assert "mh_index" in plan and "hist_docs" not in plan, plan

    def test_embedding_bucket_cap_is_surfaced(self, spark):
        from mistral_ocr_pipeline_spark.operators.dedup import (
            embedding_neardup_pairs,
        )

        vec = [1.0, 0.5, -0.25, 0.125]
        df = spark.createDataFrame(
            [(i, vec) for i in range(10)], "vec_id long, embedding array<float>"
        )
        capped = embedding_neardup_pairs(
            df, "vec_id", "embedding", threshold=0.99, max_bucket=4
        ).collect()
        assert capped and all(r.bucket_truncated for r in capped)
        clean = embedding_neardup_pairs(
            df, "vec_id", "embedding", threshold=0.99
        ).collect()
        assert clean and not any(r.bucket_truncated for r in clean)

    def test_ngram_jaccard_exact(self, spark, near_dups):
        from mistral_ocr_pipeline_spark.operators.dedup import ngram_jaccard_pairs

        pairs = spark.createDataFrame([(1, 4), (1, 3)], "id_a long, id_b long")
        got = {
            (r.id_a, r.id_b): r.jaccard
            for r in ngram_jaccard_pairs(
                near_dups, "id", "text", pairs, n=3, threshold=0.0
            ).collect()
        }
        assert got[(1, 4)] == 1.0
        assert got[(1, 3)] < 0.05


class TestEmbeddingOps:
    def test_brute_force_topk_matches_numpy(self, spark, emb):
        import numpy as np

        from mistral_ocr_pipeline_spark.operators.similarity import brute_force_topk

        queries = emb.filter(F.col("vec_id") < 5)
        got = brute_force_topk(emb.repartition(4), queries, k=3).collect()
        rows = emb.collect()
        ids = np.array([r.vec_id for r in rows])
        mat = np.array([list(r.embedding) for r in rows], dtype=np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        for qid in range(5):
            qv = mat[ids == qid][0]
            sims = mat @ qv
            sims[ids == qid] = -np.inf
            order = np.lexsort((ids, -np.round(sims, 6)))[:3]
            expected = [int(ids[i]) for i in order]
            mine = [r.vec_id for r in sorted(got, key=lambda r: r.rank) if r.query_id == qid]
            assert mine == expected, qid

    def test_lsh_recall_reasonable(self, spark, emb):
        from mistral_ocr_pipeline_spark.operators.similarity import (
            brute_force_topk,
            lsh_topk,
        )

        queries = emb.filter(F.col("vec_id") < 10)
        exact = brute_force_topk(emb, queries, k=5)
        approx = lsh_topk(emb, queries, k=5, n_planes=5, n_probe=4, n_tables=8)
        e = {(r.query_id, r.vec_id) for r in exact.collect()}
        a = {(r.query_id, r.vec_id) for r in approx.collect()}
        recall = len(e & a) / len(e)
        assert recall >= 0.5, recall

    def test_embedding_neardup_finds_self_dups(self, spark, emb):
        from mistral_ocr_pipeline_spark.operators.dedup import embedding_neardup_pairs

        # duplicate a few vectors under new ids → must be found at cos≈1
        dups = emb.filter(F.col("vec_id") < 3).select(
            (F.col("vec_id") + 100000).alias("vec_id"), "embedding", "label"
        )
        df = emb.unionByName(dups)
        pairs = {
            (r.id_a, r.id_b)
            for r in embedding_neardup_pairs(
                df, "vec_id", "embedding", threshold=0.999
            ).collect()
        }
        for i in range(3):
            assert (i, i + 100000) in pairs


class TestHostBoilerplateStrip:
    def test_host_scoped_gate_and_small_host_exemption(self, spark):
        """The footer strips only on the host where it clears the
        distinct-doc ratio; a < min_docs host is exempt even at 100%
        frequency; within-doc repetition does not create frequency."""
        from mistral_ocr_pipeline_spark.operators.dedup import (
            host_boilerplate_strip,
        )

        rows = []
        # host A: 4 docs, footer on 3 (75% >= 30%) -> stripped
        for i in range(4):
            t = f"prose A{i}"
            if i < 3:
                t += "\nfooter line A"
            rows.append((i, "a", t))
        # host B: 10 docs, footer on 2 (20% < 30%) -> kept
        for i in range(10):
            t = f"prose B{i}"
            if i < 2:
                t += "\nfooter line B"
            rows.append((100 + i, "b", t))
        # host C: 3 docs (< min_docs), all share a footer -> exempt
        for i in range(3):
            rows.append((200 + i, "c", f"prose C{i}\nfooter line C"))
        # host D: footer repeated 5x INSIDE one doc, once in another ->
        # distinct-doc freq 2/4 -> stripped (occurrence counting would
        # agree here; the within-doc case below disambiguates)
        rows.append((300, "d", "spam line D\n" * 5 + "prose D0"))
        rows.append((301, "d", "prose D1"))
        rows.append((302, "d", "prose D2"))
        rows.append((303, "d", "prose D3"))
        df = spark.createDataFrame(rows, "doc_id long, host string, text string")
        got = {
            r.id: r
            for r in host_boilerplate_strip(
                df, "doc_id", "text", "host", min_docs=4, df_num=3, df_den=10
            ).collect()
        }
        assert got[0].text_clean == "prose A0" and got[0].n_removed == 1
        assert got[3].text_clean == "prose A3" and got[3].n_removed == 0
        assert got[100].text_clean == "prose B0\nfooter line B"
        assert got[200].text_clean == "prose C0\nfooter line C"
        # host D: 'spam line D' appears in only ONE distinct doc (5x) ->
        # ndocs=1 < 2 -> kept everywhere
        assert got[300].n_removed == 0 and got[300].text_clean.count("spam line D") == 5

    def test_null_text_doc_survives(self, spark):
        from mistral_ocr_pipeline_spark.operators.dedup import (
            host_boilerplate_strip,
        )

        df = spark.createDataFrame(
            [(1, "h", None), (2, "h", "x\ny"), (3, "h", "x\nz"), (4, "h", "w")],
            "doc_id long, host string, text string",
        )
        got = {
            r.id: r
            for r in host_boilerplate_strip(
                df, "doc_id", "text", "host", min_docs=2, df_num=1, df_den=2
            ).collect()
        }
        assert 1 in got and got[1].text_clean == "" and got[1].n_kept == 1


class TestLineDedup:
    def test_hot_lines_removed_everywhere_order_kept(self, spark):
        from mistral_ocr_pipeline_spark.operators.dedup import line_dedup

        df = spark.createDataFrame(
            [
                (1, "unique alpha text\ncookie banner here\nmore alpha prose"),
                (2, "cookie banner here\nunique beta text"),
                (3, "unique gamma text\n--\ncookie banner here"),
            ],
            "doc_id long, text string",
        )
        got = {r.doc_id: r for r in line_dedup(df, "doc_id", "text", 2).collect()}
        # dup line stripped from ALL docs (no canonical survivor)…
        assert got[1].text_clean == "unique alpha text\nmore alpha prose"
        assert got[2].text_clean == "unique beta text"
        # …short separator lines are protected from removal
        assert got[3].text_clean == "unique gamma text\n--"
        assert got[1].n_removed == 1 and got[1].n_kept == 2

    def test_line_dedup_matches_python_model(self, spark):
        """Randomized docs vs a direct Python model of the convention
        (count trimmed lines ≥ min_chars corpus-wide; drop all
        occurrences of lines seen ≥ min_dup; rejoin in order)."""
        import random

        from mistral_ocr_pipeline_spark.operators.dedup import line_dedup

        rng = random.Random(42)
        vocab = ["alpha beta gamma", "boilerplate banner", "x", "  ",
                 "another real sentence", "footer text here", "short"]
        docs = []
        for d in range(40):
            docs.append((d, "\n".join(rng.choice(vocab)
                                      for _ in range(rng.randint(1, 6)))))
        counts: dict = {}
        for _d, text in docs:
            for ln in text.split("\n"):
                t = ln.strip()
                if len(t) >= 8:
                    counts[t] = counts.get(t, 0) + 1
        expected = {}
        for d, text in docs:
            kept = [ln for ln in text.split("\n")
                    if not (len(ln.strip()) >= 8 and counts[ln.strip()] >= 3)]
            expected[d] = "\n".join(kept)
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r.doc_id: r.text_clean
               for r in line_dedup(df, "doc_id", "text", min_dup_count=3).collect()}
        assert got == expected

    def test_fully_boilerplate_doc_empties(self, spark):
        from mistral_ocr_pipeline_spark.operators.dedup import line_dedup

        df = spark.createDataFrame(
            [(1, "same old banner"), (2, "same old banner"), (3, "real content line")],
            "doc_id long, text string",
        )
        got = {r.doc_id: (r.text_clean, r.n_kept) for r in
               line_dedup(df, "doc_id", "text", 2).collect()}
        assert got[1] == ("", 0) and got[2] == ("", 0)
        assert got[3] == ("real content line", 1)


class TestSemDeDup:
    def _mk(self, spark, rows):
        return spark.createDataFrame(rows, "id long, vec array<double>")

    def test_keeps_low_centroid_sim_member(self, spark):
        import numpy as np

        from mistral_ocr_pipeline_spark.operators.dedup import semdedup

        cent = np.array([[1.0, 0.0], [0.0, 1.0]])
        df = self._mk(
            spark,
            [
                (1, [1.0, 0.0]),     # csim 1.0       — the prototypical dup
                (2, [0.95, 0.2]),    # csim ≈ 0.9785  — the edge example
                (3, [0.0, 1.0]),     # other cluster, untouched
            ],
        )
        # cos(v1,v2) ≈ 0.9785 ≥ 0.95 → dup pair; paper rule keeps the
        # LOWER-centroid-sim member (id 2), drops the prototype (id 1)
        got = {r.id: (r.cell, r.centroid_sim) for r in semdedup(
            df, "id", "vec", cent, threshold=0.95
        ).collect()}
        assert set(got) == {2, 3}
        assert got[2][0] == 0 and got[3][0] == 1

    def test_chain_greedy_convention(self, spark):
        import math

        import numpy as np

        from mistral_ocr_pipeline_spark.operators.dedup import semdedup

        cent = np.array([[1.0, 0.0], [0.0, 1.0]])
        vec = lambda deg: [math.cos(math.radians(deg)), math.sin(math.radians(deg))]
        # unit circle: a=20°, b=10°, c=0° → cos(a,b)=cos(b,c)=cos10°≈.985,
        # cos(a,c)=cos20°≈.940; τ=.96 gives the chain a~b~c with a≁c.
        # csim_a < csim_b < csim_c, so b is dominated by a AND c by b —
        # the documented greedy (non-transitive) convention keeps only a.
        df = self._mk(spark, [(10, vec(20)), (11, vec(10)), (12, vec(0))])
        got = {r.id for r in semdedup(df, "id", "vec", cent, threshold=0.96).collect()}
        assert got == {10}

    def test_transitive_composition_keeps_one_per_chain(self, spark):
        import math

        import numpy as np

        from mistral_ocr_pipeline_spark.operators.dedup import (
            connected_components,
            semantic_assign,
            semantic_pairs,
        )

        cent = np.array([[1.0, 0.0], [0.0, 1.0]])
        vec = lambda deg: [math.cos(math.radians(deg)), math.sin(math.radians(deg))]
        # same a~b~c chain as the greedy test; composed with connected
        # components the CLUSTER keeps its min-csim member: exactly one
        # survivor, and it is a (the lowest centroid_sim = 20°)
        df = self._mk(spark, [(10, vec(20)), (11, vec(10)), (12, vec(0))])
        pairs = semantic_pairs(df, "id", "vec", cent, 0.96).select("id_a", "id_b")
        comp = connected_components(df.select("id"), pairs)
        asg = semantic_assign(df, "id", "vec", cent)
        rows = comp.join(asg, "id").collect()
        assert {r.comp for r in rows} == {10}          # one cluster, label=min id
        keeper = min(rows, key=lambda r: (r.csim, r.id))
        assert keeper.id == 10

    def test_expr_assignment_matches_ivf_kernel(self, spark, emb):
        """semantic_cell_cols claims the same argmax convention as the IVF
        Arrow kernel — prove it: identical (id → cell) maps on the same
        seeded centroids (kernel normalizes vectors first; argmax over
        unit centroids is scale-invariant, so conventions must agree)."""
        import numpy as np

        from mistral_ocr_pipeline_spark.operators.dedup import semantic_assign
        from mistral_ocr_pipeline_spark.operators.similarity import ivf_build

        rng = np.random.RandomState(23)
        cent = rng.standard_normal((16, 64))
        cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
        expr_cells = {r.id: r.cell for r in semantic_assign(
            emb, "vec_id", "embedding", cent
        ).collect()}

        import mistral_ocr_pipeline_spark.operators.similarity as sim

        orig = sim._kmeans_centroids
        sim._kmeans_centroids = lambda *a, **k: cent
        try:
            assigned, _ = ivf_build(emb)
            kernel_cells = {r.vec_id: r.cell for r in assigned.collect()}
        finally:
            sim._kmeans_centroids = orig
        assert expr_cells == kernel_cells

    def test_partition_invariance_and_pairs(self, spark, emb):
        import numpy as np

        from mistral_ocr_pipeline_spark.operators.dedup import semantic_pairs, semdedup

        rng = np.random.RandomState(23)
        cent = rng.standard_normal((16, 64))
        cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
        dvec = F.transform(F.col("embedding"), lambda x: x.cast("double"))
        base = emb.select("vec_id", dvec.alias("embedding"))
        clones = base.filter(F.col("vec_id") < 4).select(
            (F.col("vec_id") + 50000).alias("vec_id"),
            F.transform(F.col("embedding"), lambda x: x * F.lit(2.0)).alias("embedding"),
        )
        u = base.unionByName(clones)
        pairs = {
            (r.id_a, r.id_b)
            for r in semantic_pairs(u, "vec_id", "embedding", cent, 0.999).collect()
        }
        for i in range(4):  # scaled re-encodes land in the same cell at cos 1
            assert (i, i + 50000) in pairs
        a = sorted(map(tuple, semdedup(u, "vec_id", "embedding", cent, 0.999).collect()))
        b = sorted(map(tuple, semdedup(
            u.repartition(7), "vec_id", "embedding", cent, 0.999
        ).collect()))
        assert a == b and len(a) == u.count() - 4


class TestZorderLayout:
    """Z-order layout (layout.zorder_key/zorder_shards) — Morton-code
    parity with a pure-Python model, the file-skipping benefit claim,
    and edge guards (full path value-oracled by `layout_zorder`)."""

    @staticmethod
    def _py_morton(bx: int, by: int, bits: int = 16) -> int:
        z = 0
        for j in range(bits):
            z |= ((bx >> j) & 1) << (2 * j)
            z |= ((by >> j) & 1) << (2 * j + 1)
        return z

    def test_matches_python_model(self, spark):
        from mistral_ocr_pipeline_spark.operators.layout import zorder_key

        rows = [(i, (i * 37) % 100, (i * 59) % 1000) for i in range(200)]
        df = spark.createDataFrame(rows, "id long, x long, y long")
        xs = [r[1] for r in rows]
        ys = [r[2] for r in rows]
        top = (1 << 16) - 1

        def bucket(v, lo, hi):
            return 0 if hi == lo else (v - lo) * top // (hi - lo)

        expected = {
            i: self._py_morton(
                bucket(x, min(xs), max(xs)), bucket(y, min(ys), max(ys))
            )
            for i, x, y in rows
        }
        got = {r.id: r.zvalue for r in zorder_key(df, ["x", "y"]).collect()}
        assert got == expected

    def test_skipping_benefit_vs_row_order(self, spark):
        """Each z-shard covers a small bounding box in BOTH dims; id-order
        sharding of the same points leaves the y-extent near the full
        domain (why a plain sort can't serve two filter columns)."""
        from mistral_ocr_pipeline_spark.operators.layout import zorder_shards

        # a 64x64 grid visited in an id order uncorrelated with y
        rows = [(i, i % 64, (i * 17) % 64) for i in range(4096)]
        df = spark.createDataFrame(rows, "id long, x long, y long")
        out = zorder_shards(df, ["x", "y"], n_shards=16).collect()
        by_shard: dict = {}
        for r in out:
            by_shard.setdefault(r.shard, []).append((r.x, r.y))
        assert len(by_shard) == 16
        domain_area = 64 * 64

        def bbox_area(pts):
            xs = [p[0] for p in pts]
            ys = [p[1] for p in pts]
            return (max(xs) - min(xs) + 1) * (max(ys) - min(ys) + 1)

        z_mean = sum(bbox_area(p) for p in by_shard.values()) / 16
        id_order: dict = {}
        for i, x, y in rows:
            id_order.setdefault(i * 16 // 4096, []).append((x, y))
        id_mean = sum(bbox_area(p) for p in id_order.values()) / 16
        assert z_mean <= domain_area / 3   # tight rectangles
        assert id_mean >= domain_area / 2  # row-order: y spans the domain
        assert z_mean < id_mean / 2

    def test_constant_column_and_guards(self, spark):
        import pytest as _pytest

        from mistral_ocr_pipeline_spark.operators.layout import (
            zorder_key,
            zorder_shards,
        )

        df = spark.createDataFrame(
            [(1, 5, 10), (2, 5, 20)], "id long, x long, y long"
        )
        out = {r.id: r for r in zorder_key(df, ["x", "y"]).collect()}
        assert all(r.zbucket_x == 0 for r in out.values())
        assert out[2].zbucket_y == (1 << 16) - 1
        with _pytest.raises(ValueError):
            zorder_key(df, ["x", "y"], bits=32)
        with _pytest.raises(ValueError):
            zorder_key(df, [])
        # shard ids stay within [0, n)
        sh = zorder_shards(df, ["x", "y"], n_shards=4).collect()
        assert all(0 <= r.shard < 4 for r in sh)


class TestProfiling:
    """Column profiler (profiling.profile_columns) — hand-computed
    metrics, all-null / empty-table survival, column selection (the
    full path is value-oracled vs DuckDB by `profile_table`)."""

    def test_hand_computed_metrics(self, spark):
        from mistral_ocr_pipeline_spark.operators.profiling import (
            profile_columns,
        )

        df = spark.createDataFrame(
            [
                (1, "ab", 10.0),
                (2, "abcd", None),
                (3, None, 30.0),
                (3, "ab", 20.0),
            ],
            "id long, s string, v double",
        )
        out = {r.column: r for r in profile_columns(df).collect()}
        assert set(out) == {"id", "s", "v"}
        rid = out["id"]
        assert (rid.n_rows, rid.n_null, rid.n_distinct) == (4, 0, 3)
        assert (rid.min_repr, rid.max_repr) == ("1", "3")
        assert rid.mean_micro == (1 + 2 + 3 + 3) * 1_000_000 // 4
        rs = out["s"]
        assert (rs.n_null, rs.n_distinct) == (1, 2)
        # string metric is LENGTH; nulls excluded from the mean
        assert rs.mean_micro == (2 + 4 + 2) * 1_000_000 // 3
        assert (rs.min_repr, rs.max_repr) == ("ab", "abcd")
        rv = out["v"]
        assert rv.n_null == 1 and rv.n_distinct == 3
        assert rv.mean_micro == (10 + 30 + 20) * 1_000_000 // 3

    def test_all_null_and_empty_and_subset(self, spark):
        from mistral_ocr_pipeline_spark.operators.profiling import (
            profile_columns,
        )

        df = spark.createDataFrame(
            [(1, None), (2, None)], "id long, s string"
        )
        rs = {r.column: r for r in profile_columns(df).collect()}["s"]
        assert (rs.n_null, rs.n_distinct, rs.mean_micro) == (2, 0, None)
        assert rs.min_repr is None and rs.max_repr is None
        empty = df.filter("id < 0")
        rows = profile_columns(empty).collect()
        assert len(rows) == 2 and all(r.n_rows == 0 for r in rows)
        only = profile_columns(df, columns=["id"]).collect()
        assert [r.column for r in only] == ["id"]

    def test_mergeable_profile_lattice_law(self, spark):
        """merge_profiles over per-shard facts == profile_shards of the
        same rows collapsed to one shard (the stats-table contract), and
        merging a shard SUBSET profiles exactly that subset."""
        from mistral_ocr_pipeline_spark.operators.profiling import (
            merge_profiles,
            profile_shards,
        )

        rows = [
            (i, f"word{i % 7}" if i % 5 else None, i % 4)
            for i in range(40)
        ]
        df = spark.createDataFrame(rows, "id long, s string, shard int")
        merged = {
            r.column: r
            for r in merge_profiles(profile_shards(df, ["id", "s"])).collect()
        }
        direct = {
            r.column: r
            for r in merge_profiles(
                profile_shards(df.withColumn("shard", F.lit(0)), ["id", "s"])
            ).collect()
        }
        for c in ("id", "s"):
            assert merged[c].asDict() == direct[c].asDict()
        assert merged["id"].n_rows == 40 and merged["s"].n_null == 8
        # below-k sketch: the estimate is EXACT (7 distinct non-null s)
        assert merged["s"].est_distinct == 7.0
        assert merged["id"].min_metric == 0 and merged["id"].max_metric == 39
        # subset merge == profile of the subset only
        shards = profile_shards(df, ["id"])
        sub = {
            r.column: r
            for r in merge_profiles(
                shards.filter(F.col("shard") < 2)
            ).collect()
        }
        expect = {
            r.column: r
            for r in merge_profiles(
                profile_shards(
                    df.filter(F.col("shard") < 2).withColumn(
                        "shard", F.lit(0)
                    ),
                    ["id"],
                )
            ).collect()
        }
        assert sub["id"].asDict() == expect["id"].asDict()


class TestTextAnalysis:
    def test_quality_and_tokens(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            quality_features,
        )

        df = spark.createDataFrame(
            [(1, "The cat sat on the mat and it was happy for hours."),
             (2, "!!! ??? ###"),
             (3, "a b")],
            "id long, text string",
        )
        out = {r.id: r for r in quality_features(df).collect()}
        assert out[1].q_score > 0.3
        assert out[2].q_score == 0.0  # <5 tokens
        assert out[3].q_score == 0.0
        assert out[1].q_tokens == 12

    def test_language_id(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import language_id

        df = spark.createDataFrame(
            [(1, "the cat and the dog sat in the house"),
             (2, "der Hund ist nicht mit der Katze auf dem Dach"),
             (3, "le chat est dans la maison et il dort pour le moment"),
             (4, "日本語のテキストです"),
             (5, "мама мыла раму"),
             (6, "zzz qqq xxx")],
            "id long, text string",
        )
        out = {r.id: r.lang_id for r in language_id(df).collect()}
        assert out[1] == "en" and out[2] == "de" and out[3] == "fr"
        assert out[4] == "cjk" and out[5] == "ru" and out[6] == "unknown"

    def test_skipgram_pairs(self, spark):
        """Full pure-Python model replay: subsample draws, compaction,
        ±window pairing, GloVe 1/d weights (driver query oracles the
        same path in SQL)."""
        import hashlib
        import math

        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            skipgram_pairs,
        )

        docs = [(1, "a b c a b"), (2, "c c a d e f")]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        t, window = 0.1, 2  # drops 3 of 11 occurrences (verified below)

        occ = [(d, p, w) for d, s in docs for p, w in enumerate(s.split())]
        freq: dict = {}
        for _, _, w in occ:
            freq[w] = freq.get(w, 0) + 1
        n_tok = float(len(occ))

        def keep(d, p, w):
            u = int(hashlib.md5(f"sgp:{d}:{p}".encode()).hexdigest()[:8], 16) / 4294967296.0
            return round(u, 6) < round(
                min(1.0, math.sqrt(t / (freq[w] / n_tok))), 6
            )

        kept = [(d, p, w) for d, p, w in occ if keep(d, p, w)]
        assert 0 < len(kept) < len(occ)  # the gate is genuinely active
        expected: dict = {}
        for doc in (1, 2):
            seq = [w for d, p, w in kept if d == doc]
            for i, c in enumerate(seq):
                for j in range(max(0, i - window), min(len(seq), i + window + 1)):
                    if j == i:
                        continue
                    key = (c, seq[j])
                    n, g = expected.get(key, (0, 0))
                    expected[key] = (
                        n + 1, g + round(1e6 / abs(j - i))
                    )
        got = {
            (r.center, r.context): (r.n_pairs, r.glove_micro)
            for r in skipgram_pairs(df, window=window, subsample_t=t).collect()
        }
        assert got == expected
        # determinism: a rerun is bit-identical
        again = {
            (r.center, r.context): (r.n_pairs, r.glove_micro)
            for r in skipgram_pairs(df, window=window, subsample_t=t).collect()
        }
        assert again == got

    def test_negative_sampling_table(self, spark):
        """count^0.75 weights vs a pure-Python model, contiguous
        non-overlapping inverse-CDF ranges, deterministic order (full
        path oracled by `text_negative_sampling`)."""
        import math

        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            negative_sampling_table,
        )

        df = spark.createDataFrame(
            [("a a a a b b c",), ("a b c d",)], "text string"
        )
        rows = sorted(
            negative_sampling_table(df).collect(),
            key=lambda r: r.cum_start,
        )
        cnts = {"a": 5, "b": 3, "c": 2, "d": 1}
        for r in rows:
            expect = round(math.sqrt(cnts[r.word] * math.sqrt(cnts[r.word])) * 1e6)
            assert r.w_micro == expect
        # ranges tile [0, total) exactly: each starts where the prior ends
        offset = 0
        for r in rows:  # cum order == (cnt desc, word) order
            assert r.cum_start == offset
            offset += r.w_micro
        assert all(r.total_micro == offset for r in rows)
        assert [r.word for r in rows] == ["a", "b", "c", "d"]

    def test_pmi_collocations(self, spark):
        """Hand-computed PMI against math.log, the min-count hapax floor,
        and deterministic tie-breaking (full path oracled by
        `text_pmi_collocations`)."""
        import math

        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            pmi_collocations,
        )

        # 'new york' appears 3x and only together; 'the cat' 3x but both
        # words also occur apart; 'rare pair' once (floored out at 2)
        docs = [
            "new york is the cat place",
            "new york holds the cat now",
            "new york and the dog cat",
            "rare pair appears once only here",
        ]
        df = spark.createDataFrame([(t,) for t in docs], "text string")
        out = pmi_collocations(df, min_count=2, k=5).collect()
        got = {(r.w1, r.w2): r for r in out}
        assert ("rare", "pair") not in got  # hapax floored
        toks = [t.split() for t in docs]
        n_u = sum(len(t) for t in toks)
        n_b = sum(len(t) - 1 for t in toks)
        uni: dict = {}
        for t in toks:
            for w in t:
                uni[w] = uni.get(w, 0) + 1
        ny = got[("new", "york")]
        expect = round(
            math.log((3 / n_b) / ((uni["new"] / n_u) * (uni["york"] / n_u)))
            * 1e6
        )
        assert ny.pmi_micro == expect and ny.pair_count == 3
        tc = got[("the", "cat")]
        assert tc.pmi_micro < ny.pmi_micro  # exclusive pair scores higher
        ranks = sorted(r.rank for r in out)
        assert ranks == list(range(1, len(out) + 1))

    def test_vocab_coverage(self, spark):
        """Hand-computed coverage cuts, boundary tie-break, k beyond the
        vocab, and empty-corpus survival (full path oracled by
        `text_vocab_coverage`)."""
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            vocab_coverage,
        )

        # freqs: a=4, b=3, c=2, d=1  (10 tokens, 4 types)
        df = spark.createDataFrame(
            [("a a b c",), ("a b d",), ("a b c",)], "text string"
        )
        out = {
            r.vocab_k: r for r in vocab_coverage(df, ks=(1, 2, 10)).collect()
        }
        assert out[1].covered_tokens == 4
        assert out[1].coverage_micro == 4 * 1_000_000 // 10
        assert out[2].covered_tokens == 7
        assert (out[10].n_types_used, out[10].covered_tokens) == (4, 10)
        assert out[10].coverage_micro == 1_000_000
        empty = spark.createDataFrame([], "text string")
        rows = vocab_coverage(empty, ks=(5,)).collect()
        assert rows[0].total_tokens == 0 and rows[0].coverage_micro == 0

    def test_script_profile(self, spark):
        """Hand-computed counts/fractions, pinned-order tie-break, the
        5%-mixed rule, and none/NULL/empty survival (the full profile is
        value-oracled vs DuckDB by `text_script_detect`)."""
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            script_profile,
        )

        df = spark.createDataFrame(
            [
                (1, "abc привет"),        # 3 latin + 6 cyrillic, mixed
                (2, "мир"),               # pure cyrillic
                (3, "ab " + "я" * 100),   # latin 2/102 < 5% -> NOT mixed
                (4, "αβ юя"),             # 2 greek + 2 cyrillic tie ->
                                          # cyrillic (pinned order) wins
                (5, "123 .,!"),           # no script chars at all
                (6, None),                # NULL text survives
                (7, "naïve café"),        # extended-Latin diacritics count
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in script_profile(df).collect()}
        r1 = out[1]
        assert (r1.cnt_latin, r1.cnt_cyrillic, r1.script_chars) == (3, 6, 9)
        assert r1.frac_cyrillic_micro == 6 * 1000000 // 9
        assert r1.dominant_script == "cyrillic" and r1.is_mixed
        assert out[2].dominant_script == "cyrillic" and not out[2].is_mixed
        r3 = out[3]
        assert r3.frac_latin_micro < 50000 and not r3.is_mixed
        assert r3.dominant_script == "cyrillic"
        # equal counts: 'cyrillic' precedes 'greek' in SCRIPT_RANGES
        assert out[4].dominant_script == "cyrillic" and out[4].is_mixed
        r5 = out[5]
        assert r5.script_chars == 0 and r5.dominant_script == "none"
        assert r5.n_scripts == 0 and not r5.is_mixed
        assert out[6].dominant_script == "none"
        assert out[7].cnt_latin == 9  # ï and é are Latin letters

    def test_fingerprints(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            fingerprint_md5,
            fingerprint_rolling,
        )

        df = spark.createDataFrame(
            [(1, "Same   Text here"), (2, "same text HERE"), (3, "different body")],
            "id long, text string",
        )
        md5s = {r.id: r.fingerprint for r in fingerprint_md5(df, "id").collect()}
        assert md5s[1] == md5s[2] != md5s[3]
        rolls = {r.id: r.rolling_fp for r in fingerprint_rolling(df, "id").collect()}
        assert rolls[1] != 0 and rolls[3] != 0


class TestFuzzyJoin:
    def test_best_match_with_perturbations(self, spark):
        from mistral_ocr_pipeline_spark.operators.fuzzy_join import fuzzy_best_match

        review = spark.createDataFrame(
            [(1, "Anticoagulation outcomes in elderly patients", "2021", "J Clin Med"),
             (2, "Renal dosing of DOACs: a cohort study", "2022", "Lancet"),
             (3, "No match exists for this title at all", "1999", "Unknown")],
            "rid long, title string, year string, journal string",
        )
        output = spark.createDataFrame(
            [(10, "anticoagulation OUTCOMES in elderly patients!", "2021.0", "j clin med"),
             (20, "Renal dosing of doacs — a cohort study", "2022", "The Lancet"),
             (30, "Completely unrelated paper on fisheries", "2005", "Mar Biol")],
            "oid long, title string, year string, journal string",
        )
        got = {
            r.left_id: r.right_id
            for r in fuzzy_best_match(
                review, output, "rid", "oid",
                title_cols=("title", "title"),
                year_cols=("year", "year"),
                journal_cols=("journal", "journal"),
            ).collect()
        }
        assert got[1] == 10 and got[2] == 20
        assert got[3] is None  # below threshold → left-outer null

    def test_one_to_one_uniqueness(self, spark):
        from mistral_ocr_pipeline_spark.operators.fuzzy_join import fuzzy_best_match

        review = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "alpha beta gamma")],
            "rid long, title string",
        )
        output = spark.createDataFrame(
            [(10, "alpha beta gamma")], "oid long, title string"
        )
        got = fuzzy_best_match(
            review, output, "rid", "oid", title_cols=("title", "title")
        ).collect()
        matched = [r for r in got if r.right_id is not None]
        assert len(matched) == 1  # output row used at most once

    def test_year_blocking_hash_joins_and_matches(self, spark):
        # block_cols turns the pair space into an equi-join: the plan must
        # hash-join (no BroadcastNestedLoop), and same-year assignments
        # must agree with the unblocked join on this year-consistent data
        from mistral_ocr_pipeline_spark.operators.fuzzy_join import fuzzy_best_match

        review = spark.createDataFrame(
            [(1, "alpha beta gamma paper", "2021"),
             (2, "delta epsilon zeta study", "2022"),
             (3, "eta theta iota report", "2023")],
            "rid long, title string, year string",
        )
        output = spark.createDataFrame(
            [(10, "alpha beta gamma paper!", "2021"),
             (20, "delta epsilon zeta study!", "2022"),
             (30, "eta theta iota report (extended)", "2023"),
             (40, "alpha beta gamma paper", "1990")],  # wrong block: unreachable
            "oid long, title string, year string",
        )
        blocked = fuzzy_best_match(
            review, output, "rid", "oid",
            title_cols=("title", "title"), year_cols=("year", "year"),
            block_cols=("year", "year"),
        )
        plan = blocked._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoop" not in plan
        assert "HashJoin" in plan
        got = {r.left_id: r.right_id for r in blocked.collect()}
        unblocked = {
            r.left_id: r.right_id
            for r in fuzzy_best_match(
                review, output, "rid", "oid",
                title_cols=("title", "title"), year_cols=("year", "year"),
            ).collect()
        }
        assert got == unblocked == {1: 10, 2: 20, 3: 30}


class TestMultimodal:
    def test_decode_stub_plumbing(self, spark, docs):
        from mistral_ocr_pipeline_spark.operators.multimodal import (
            decode_features,
            documents_as_media,
        )

        media = documents_as_media(docs.limit(20))
        feats = decode_features(media, deterministic_fake=True).collect()
        assert len(feats) == 20
        for r in feats:
            assert r.n_bytes > 0
            assert len(r.checksum) == 64
            assert len(r.features) == 8
            assert all(0.0 <= x <= 1.0 for x in r.features)

    def test_decode_without_codec_raises(self, spark, docs):
        from py4j.protocol import Py4JJavaError
        from mistral_ocr_pipeline_spark.operators.multimodal import (
            decode_features,
            documents_as_media,
        )

        media = documents_as_media(docs.limit(1))
        with pytest.raises(Exception) as ei:
            decode_features(media, deterministic_fake=False).collect()
        assert "NotImplementedError" in str(ei.value) or "codec" in str(ei.value)

    def test_resize_passthrough_skips_decode(self, spark):
        # in-bounds metadata must pass through WITHOUT touching the codec:
        # deterministic_fake=False would raise if the kernel tried to decode
        from mistral_ocr_pipeline_spark.operators.multimodal import resize_images

        rows = [
            (1, "image", b"small-image-bytes", ("image/png", 300, 200, None)),
            (2, "image", b"big-image-bytes", ("image/png", 2048, 1024, None)),
        ]
        schema = (
            "media_id long, kind string, payload binary, "
            "meta struct<mime:string,width:int,height:int,duration_ms:int>"
        )
        df = spark.createDataFrame(rows, schema)
        small = resize_images(df.filter("media_id = 1"), max_side=512).collect()
        assert small[0].resized is False
        assert bytes(small[0].payload) == b"small-image-bytes"
        assert (small[0].width, small[0].height) == (300, 200)
        got = {
            r.media_id: r
            for r in resize_images(df, max_side=512, deterministic_fake=True).collect()
        }
        assert got[1].resized is False
        assert got[2].resized is True
        assert (got[2].width, got[2].height) == (512, 256)  # aspect kept
        assert len(bytes(got[2].payload)) == 128  # fixed-size fake raster

    def test_frame_sampling_fanout(self, spark):
        from mistral_ocr_pipeline_spark.operators.multimodal import sample_frames

        rows = [
            (1, "video", b"vid-a", ("video/mp4", None, None, 3500)),   # 3 frames
            (2, "video", b"vid-b", ("video/mp4", None, None, 20000)),  # capped at 8
            (3, "image", b"img", ("image/png", 10, 10, None)),         # filtered out
        ]
        schema = (
            "media_id long, kind string, payload binary, "
            "meta struct<mime:string,width:int,height:int,duration_ms:int>"
        )
        df = spark.createDataFrame(rows, schema)
        frames = sample_frames(
            df, every_ms=1000, max_frames=8, deterministic_fake=True
        ).collect()
        by_media = {}
        for r in frames:
            by_media.setdefault(r.media_id, []).append(r)
        assert set(by_media) == {1, 2}
        assert len(by_media[1]) == 3 and len(by_media[2]) == 8
        a = sorted(by_media[1], key=lambda r: r.frame_idx)
        assert [r.frame_ts_ms for r in a] == [0, 1000, 2000]
        # frame payloads are per-timestamp distinct and deterministic
        assert len({bytes(r.payload) for r in a}) == 3


class TestIvf:
    def test_ivf_recall_reasonable(self, spark, emb):
        from mistral_ocr_pipeline_spark.operators.similarity import (
            brute_force_topk,
            ivf_topk,
        )
        from pyspark.sql import functions as F

        queries = emb.filter(F.col("vec_id") < 10)
        exact = {(r.query_id, r.vec_id) for r in brute_force_topk(emb, queries, k=5).collect()}
        approx = {
            (r.query_id, r.vec_id)
            for r in ivf_topk(emb, queries, k=5, n_centroids=16, n_probe=6).collect()
        }
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.7, recall

    def test_ivf_invariant_under_corpus_repartition(self, spark, emb):
        """The k-means seed sample must be partition-layout-invariant
        (round-3 verdict defect #2: a bare limit().collect() takes
        whatever rows the scan yields first, so split sizing / AQE could
        silently change centroids and results).  Same corpus, three
        different layouts → byte-identical ANN output."""
        from pyspark.sql import functions as F

        from mistral_ocr_pipeline_spark.operators.similarity import ivf_topk

        queries = emb.filter(F.col("vec_id") < 8)
        kw = dict(k=5, n_centroids=16, n_probe=6)
        base = sorted(map(tuple, ivf_topk(emb, queries, **kw).collect()))
        for layout in (emb.repartition(7), emb.repartition(1), emb.coalesce(2)):
            got = sorted(map(tuple, ivf_topk(layout, queries, **kw).collect()))
            assert got == base

    def test_assignment_table_path_matches_inline_ivf(self, spark, emb, tmp_path):
        """The persisted-assignment search must return EXACTLY what the
        inline ivf_topk returns for the same centroids/probes — reusing a
        written index across query batches cannot change results — and
        its scan must carry the cell-pruning filter."""
        from pyspark.sql import functions as F

        from mistral_ocr_pipeline_spark.operators.similarity import (
            ivf_build,
            ivf_search_assigned,
            ivf_topk,
        )

        queries = emb.filter(F.col("vec_id") < 6)
        assigned, cent = ivf_build(emb, n_centroids=8)
        # round-trip through a cell-partitioned parquet table (the real
        # deployment: write once, prune per search)
        path = str(tmp_path / "ivf_assign")
        assigned.write.mode("overwrite").partitionBy("cell").parquet(path)
        table = spark.read.parquet(path)
        got = ivf_search_assigned(table, cent, queries, k=5, n_probe=3)
        plan = got._jdf.queryExecution().executedPlan().toString()
        assert "cell" in plan  # pruning filter reaches the scan
        inline = ivf_topk(
            emb, queries, k=5, n_centroids=8, n_probe=3
        )
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, inline.collect())
        )

    def test_assigned_search_empty_query_batch(self, spark, emb):
        """Empty query relation → empty top-k frame with the standard
        contract schema (regression: this path raised NameError — the
        guard returned `_empty_topk(corpus)` but the parameter is
        `assigned`)."""
        from pyspark.sql import functions as F

        from mistral_ocr_pipeline_spark.operators.similarity import (
            ivf_build,
            ivf_search_assigned,
        )

        assigned, cent = ivf_build(emb, n_centroids=8)
        out = ivf_search_assigned(
            assigned, cent, emb.filter(F.col("vec_id") < 0), k=5, n_probe=3
        )
        assert out.columns == ["query_id", "vec_id", "cosine", "rank"]
        assert out.count() == 0


class TestConnectedComponents:
    def test_chains_merge_and_singletons_stay(self, spark):
        from mistral_ocr_pipeline_spark.operators.dedup import connected_components

        nodes = spark.createDataFrame([(i,) for i in range(10)], "id long")
        # 1-2-3-4 is a 4-hop chain (needs >1 propagation round);
        # 6-7 and 7-8 arrive as separate pairs that must merge; 0,5,9 isolated
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (6, 7), (7, 8)], "id_a long, id_b long"
        )
        got = {
            r.id: r.comp for r in connected_components(nodes, edges).collect()
        }
        assert got == {0: 0, 1: 1, 2: 1, 3: 1, 4: 1, 5: 5, 6: 6, 7: 6, 8: 6, 9: 9}

    def test_label_flows_against_edge_direction(self, spark):
        from mistral_ocr_pipeline_spark.operators.dedup import connected_components

        # min id sits at the END of the chain: 5→4→3 written as (5,4),(4,3)
        nodes = spark.createDataFrame([(3,), (4,), (5,)], "id long")
        edges = spark.createDataFrame([(5, 4), (4, 3)], "id_a long, id_b long")
        got = {r.id: r.comp for r in connected_components(nodes, edges).collect()}
        assert got == {3: 3, 4: 3, 5: 3}

    def test_empty_edges_all_singletons(self, spark):
        from mistral_ocr_pipeline_spark.operators.dedup import connected_components

        nodes = spark.createDataFrame([(1,), (2,)], "id long")
        edges = spark.createDataFrame([], "id_a long, id_b long")
        got = {r.id: r.comp for r in connected_components(nodes, edges).collect()}
        assert got == {1: 1, 2: 2}

    def test_nonconvergence_raises_not_silent(self, spark):
        # a chain longer than max_iter hops cannot reach its min label; the
        # old behavior returned split clusters with no signal (ADVICE r01)
        import pytest

        from mistral_ocr_pipeline_spark.operators.dedup import connected_components

        n = 8
        nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
        )
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(nodes, edges, max_iter=2)
        got = {
            r.id: r.comp
            for r in connected_components(
                nodes, edges, max_iter=2, allow_partial=True
            ).collect()
        }
        assert got[n - 1] != 0  # partial labels really are split

    def test_reliable_checkpoint_dir(self, spark, tmp_path):
        # checkpoint_dir switches localCheckpoint -> reliable checkpoint()
        # (replayable after executor loss); multi-round chain exercises it
        from mistral_ocr_pipeline_spark.operators.dedup import connected_components

        n = 6
        nodes = spark.createDataFrame([(i,) for i in range(n)], "id long")
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long"
        )
        got = {
            r.id: r.comp
            for r in connected_components(
                nodes, edges, checkpoint_dir=str(tmp_path / "ckpt")
            ).collect()
        }
        assert got == {i: 0 for i in range(n)}
        ckpt_files = list((tmp_path / "ckpt").rglob("*"))
        assert ckpt_files, "reliable checkpoint directory was never written"


class TestPiiAndRepetition:
    def test_pii_scrub_order_and_counts(self, spark):
        """SSNs must be redacted BEFORE the phone pattern sees them;
        emails/IPs are independent; counts reflect each stage's input."""
        from mistral_ocr_pipeline_spark.operators.text_analysis import pii_scrub

        df = spark.createDataFrame(
            [
                (1, "mail a.b-c@ex.org and ssn 123-45-6789 ok"),
                (2, "call +1 555-123-4567 or (555) 123-4567 from 10.0.0.1"),
                (3, None),
                (4, "clean text with version 1.2.3 and date 2024-01-01"),
            ],
            "doc_id long, text string",
        )
        out = {r.id: r for r in pii_scrub(df, "doc_id", "text").collect()}
        assert out[1].n_email == 1 and out[1].n_ssn == 1 and out[1].n_phone == 0
        assert out[1].scrubbed == "mail [EMAIL] and ssn [SSN] ok"
        assert out[2].n_phone == 2 and out[2].n_ip == 1
        assert "[PHONE]" in out[2].scrubbed and "[IP]" in out[2].scrubbed
        assert out[3].scrubbed is None and out[3].n_email is None
        # no false positives on versions/dates (no phone-shaped separators)
        assert out[4].scrubbed == "clean text with version 1.2.3 and date 2024-01-01"

    def test_repetition_fractions(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            repetition_metrics,
        )

        df = spark.createDataFrame(
            [
                (1, "same line\nsame line\nother\n\n  \n"),
                (2, "a b c a b c a b c"),  # 7 3-grams, 3 distinct
                (3, ""),
            ],
            "doc_id long, text string",
        )
        out = {r.id: r for r in repetition_metrics(df, "doc_id", "text").collect()}
        assert out[1].n_lines == 3 and abs(out[1].dup_line_fraction - 1 / 3) < 1e-6
        assert out[2].n_3grams == 7
        assert abs(out[2].dup_3gram_fraction - 4 / 7) < 1e-6
        assert out[3].n_lines == 0 and out[3].dup_line_fraction == 0.0


class TestSequencePacking:
    def test_document_preserving_boundary_cut(self, spark):
        """Docs fill packs in id order; a doc whose start offset falls in
        pack k joins pack k even if it overflows the budget (documents
        are never split), and the next doc starts the next pack region."""
        from mistral_ocr_pipeline_spark.operators.packing import (
            pack_rollup,
            pack_token_budget,
        )

        docs = spark.createDataFrame(
            [(0, 60), (8, 50), (16, 10), (24, 100), (1, 30)],
            "doc_id long, tokens long",
        )
        out = {
            r.id: (r.shard, r.start_offset, r.pack_id)
            for r in pack_token_budget(
                docs, "doc_id", "tokens", budget=100, n_shards=8
            ).collect()
        }
        # shard 0 in id order: 0(60) -> off 0 pack 0; 8(50) -> off 60
        # pack 0 (overflows to 110); 16(10) -> off 110 pack 1; 24(100) ->
        # off 120 pack 1 (ends at 220)
        assert out[0] == (0, 0, 0)
        assert out[8] == (0, 60, 0)
        assert out[16] == (0, 110, 1)
        assert out[24] == (0, 120, 1)
        assert out[1] == (1, 0, 0)
        roll = {
            (r.shard, r.pack_id): (r.n_docs, r.total_tokens)
            for r in pack_rollup(
                pack_token_budget(docs, "doc_id", "tokens", budget=100, n_shards=8),
                budget=100,
            ).collect()
        }
        assert roll[(0, 0)] == (2, 110) and roll[(0, 1)] == (2, 110)

    def test_pack_similar_neighbors_clusters_adjacent(self, spark):
        """In-context-pretraining packing: two planted clusters land in
        separate cells, members pack adjacently in affinity order, and
        offsets follow the same next-fit rule as pack_token_budget."""
        import numpy as np

        from mistral_ocr_pipeline_spark.operators.packing import (
            pack_similar_neighbors,
        )

        # centroids = e0, e1; cluster A docs near e0, cluster B near e1
        cent = np.eye(2, 8)
        rows = []
        for i, a in enumerate([0.99, 0.95, 0.90]):      # cluster A ids 0-2
            v = [0.0] * 8
            v[0], v[2] = a, (1 - a**2) ** 0.5
            rows.append((i, 60, v))
        for i, a in enumerate([0.98, 0.93]):             # cluster B ids 10-11
            v = [0.0] * 8
            v[1], v[3] = a, (1 - a**2) ** 0.5
            rows.append((10 + i, 70, v))
        df = spark.createDataFrame(
            rows, "id long, tokens long, embedding array<double>"
        )
        out = {
            r.id: r
            for r in pack_similar_neighbors(
                df, "id", "tokens", "embedding", cent, budget=100
            ).collect()
        }
        assert {out[i].cell for i in (0, 1, 2)} == {0}
        assert {out[i].cell for i in (10, 11)} == {1}
        # affinity order within cell 0: 0 (0.99), 1 (0.95), 2 (0.90)
        assert [out[i].pos for i in (0, 1, 2)] == [1, 2, 3]
        assert [out[i].start_offset for i in (0, 1, 2)] == [0, 60, 120]
        assert [out[i].pack_id for i in (0, 1, 2)] == [0, 0, 1]
        assert [out[i].start_offset for i in (10, 11)] == [0, 70]

    def test_pack_similar_neighbors_partition_invariant(self, spark):
        import numpy as np

        from mistral_ocr_pipeline_spark.operators.packing import (
            pack_similar_neighbors,
        )

        rng = np.random.RandomState(3)
        cent = rng.standard_normal((4, 8))
        rows = [
            (i, int(10 + i % 37), [float(x) for x in rng.standard_normal(8)])
            for i in range(120)
        ]
        df = spark.createDataFrame(
            rows, "id long, tokens long, embedding array<double>"
        )
        a = sorted(
            map(tuple, pack_similar_neighbors(
                df, "id", "tokens", "embedding", cent, budget=64
            ).collect())
        )
        b = sorted(
            map(tuple, pack_similar_neighbors(
                df.repartition(11), "id", "tokens", "embedding", cent, budget=64
            ).collect())
        )
        assert a == b and len(a) == 120

    def test_chunk_text_tokens_overlap_and_edges(self, spark):
        """Window/overlap arithmetic: starts advance by window-overlap,
        consecutive chunks share exactly `overlap` tokens, the tail chunk
        is short, sub-window and empty docs behave."""
        import pytest as _pytest

        from mistral_ocr_pipeline_spark.operators.packing import chunk_text_tokens

        docs = spark.createDataFrame(
            [
                (1, " ".join(f"w{i}" for i in range(10))),  # 10 toks
                (2, "a b c"),                                # sub-window
                (3, ""),                                     # no chunks
                (4, "   "),                                  # no chunks
            ],
            "doc_id long, text string",
        )
        got = {
            (r.id, r.chunk_start): (r.chunk_text, r.n_tokens)
            for r in chunk_text_tokens(
                docs, "doc_id", "text", window=4, overlap=2
            ).collect()
        }
        # doc 1: starts 0,2,4,6,8
        assert {k[1] for k in got if k[0] == 1} == {0, 2, 4, 6, 8}
        assert got[(1, 0)] == ("w0 w1 w2 w3", 4)
        assert got[(1, 2)] == ("w2 w3 w4 w5", 4)  # 2-token overlap
        assert got[(1, 8)] == ("w8 w9", 2)        # short tail
        assert got[(2, 0)] == ("a b c", 3)
        assert {k[0] for k in got} == {1, 2}       # empty docs: no chunks
        # every token is covered by some chunk
        covered = " ".join(t for (_d, s), (t, _n) in sorted(got.items()) if _d == 1)
        assert all(f"w{i}" in covered for i in range(10))
        with _pytest.raises(ValueError):
            chunk_text_tokens(docs, "doc_id", "text", window=4, overlap=4)

    def test_hash_embedding_deterministic_and_bounded(self, spark):
        """hash_embedding_col: dim components in [-1, 1), equal text →
        equal vector, distinct text → distinct vector, stable across
        partitionings (pure expression of the text)."""
        from mistral_ocr_pipeline_spark.operators.similarity import (
            hash_embedding_col,
        )

        df = spark.createDataFrame(
            [(1, "alpha beta"), (2, "alpha beta"), (3, "gamma")],
            "id long, t string",
        )
        out = {
            r.id: list(r.v)
            for r in df.select(
                "id", hash_embedding_col(F.col("t"), 8).alias("v")
            ).collect()
        }
        assert all(len(v) == 8 for v in out.values())
        assert all(-1.0 <= x < 1.0 for v in out.values() for x in v)
        assert out[1] == out[2] and out[1] != out[3]
        rep = {
            r.id: list(r.v)
            for r in df.repartition(7)
            .select("id", hash_embedding_col(F.col("t"), 8).alias("v"))
            .collect()
        }
        assert rep == out

    def test_partition_invariant(self, spark):
        """Pack assignment is a pure function of (id, tokens) — identical
        under any physical partitioning of the input."""
        from mistral_ocr_pipeline_spark.operators.packing import pack_token_budget

        docs = spark.range(0, 500).select(
            F.col("id").alias("doc_id"), (F.col("id") % 37 + 1).alias("tokens")
        )
        a = set(
            map(tuple, pack_token_budget(docs, "doc_id", "tokens", 64, 8).collect())
        )
        b = set(
            map(
                tuple,
                pack_token_budget(
                    docs.repartition(13), "doc_id", "tokens", 64, 8
                ).collect(),
            )
        )
        assert a == b


class TestGraphAndInterleave:
    def test_pagerank_hub_outranks_leaves(self, spark):
        from mistral_ocr_pipeline_spark.operators.dedup import pagerank_canonical

        # star: 0 is the hub of 1..4; 5 isolated
        nodes = spark.createDataFrame([(i,) for i in range(6)], "id long")
        edges = spark.createDataFrame(
            [(0, i) for i in range(1, 5)], "id_a long, id_b long"
        )
        pr = {r.id: r.pagerank for r in pagerank_canonical(nodes, edges).collect()}
        assert pr[0] > pr[1] > pr[5]  # hub > spoke > isolated
        assert pr[1] == pr[2] == pr[3] == pr[4]  # symmetry
        assert abs(pr[5] - 0.15 / 6) < 1e-9  # isolated settles at (1-d)/N
        assert all(v > 0 for v in pr.values())

    def test_pagerank_partition_invariant(self, spark):
        from mistral_ocr_pipeline_spark.operators.dedup import pagerank_canonical

        nodes = spark.createDataFrame([(i,) for i in range(30)], "id long")
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(0, 28, 2)], "id_a long, id_b long"
        )
        a = {r.id: r.pagerank for r in pagerank_canonical(nodes, edges).collect()}
        b = {
            r.id: r.pagerank
            for r in pagerank_canonical(
                nodes.repartition(7), edges.repartition(5)
            ).collect()
        }
        assert a == b

    def test_interleave_prefix_shares_track_weights(self, spark):
        from mistral_ocr_pipeline_spark.operators.sampling import interleave_order

        big = spark.range(0, 3000).select(F.col("id").alias("k"))
        small = spark.range(10000, 13000).select(F.col("id").alias("k"))
        out = interleave_order([(big, 3), (small, 1)], key_col="k")
        rows = sorted(
            out.collect(), key=lambda r: (r.mix_key, r.mix_source, r.k)
        )
        for prefix in (400, 1200, 2400):
            share = sum(1 for r in rows[:prefix] if r.mix_source == 0) / prefix
            assert 0.68 <= share <= 0.82, (prefix, share)  # target 0.75
        # scan-side key: no exchange in the plan
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan


class TestSketches:
    def test_hll_estimate_and_lossless_rollup(self, spark):
        from mistral_ocr_pipeline_spark.operators.sketches import (
            approx_distinct,
            approx_distinct_rollup,
        )

        df = spark.range(0, 20000).select(
            (F.col("id") % 4).alias("g"),
            (F.col("id") % 3137).alias("v"),     # 3137 distincts per group
            (F.col("id") % 16).alias("shard"),
        )
        est = {r.g: r.approx_distinct for r in approx_distinct(df, ["g"], "v").collect()}
        for g, e in est.items():
            assert abs(e - 3137) / 3137 < 0.05, (g, e)
        # two-level rollup must equal the one-level estimate exactly:
        # same-lgk HLL union is lossless, so sketch columns kept per
        # partition answer cross-partition distincts with no rescan
        roll = {
            r.g: r.approx_distinct
            for r in approx_distinct_rollup(df, "shard", ["g"], "v").collect()
        }
        assert roll == est

    def test_heavy_hitters_bounds_and_coverage(self, spark):
        from mistral_ocr_pipeline_spark.operators.sketches import heavy_hitters_rollup

        # zipf-ish: value v appears ~N/(v+1) times, spread over 8 shards
        df = spark.range(0, 30000).select(
            (F.col("id") % 8).alias("shard"),
            F.floor(F.sqrt(F.col("id") % 3000)).cast("long").alias("v"),
        )
        hh = {r.v: (r.est_count, r.max_count)
              for r in heavy_hitters_rollup(df, "shard", "v", k=5).collect()}
        exact = {r.v: r.c for r in df.groupBy("v").agg(F.count(F.lit(1)).alias("c")).collect()}
        for v, (est, mx) in hh.items():
            assert est <= exact[v] <= mx, (v, est, exact[v], mx)
        # the SpaceSaving guarantee: any value a shard's top-5 can't hide
        # (true count > Σ shard errors) MUST surface as a candidate
        shard_counts = df.groupBy("shard", "v").agg(F.count(F.lit(1)).alias("c"))
        import collections
        per_shard = collections.defaultdict(list)
        for r in shard_counts.collect():
            per_shard[r.shard].append(r.c)
        err_sum = sum(sorted(cs, reverse=True)[5] for cs in per_shard.values()
                      if len(cs) > 5)
        for v, c in exact.items():
            if c > err_sum:
                assert v in hh, (v, c, err_sum)

    def test_bloom_no_false_negatives_and_low_fpr(self, spark):
        from mistral_ocr_pipeline_spark.operators.sketches import (
            bloom_build,
            bloom_probe,
        )

        keys = spark.range(0, 300).select(
            F.concat(F.lit("member-"), F.col("id")).alias("k")
        )
        others = spark.range(300, 5300).select(
            F.concat(F.lit("other-"), F.col("id")).alias("k")
        )
        bloom = bloom_build(keys, "k", m=1 << 14, k=4)
        assert bloom.count() <= (1 << 14) // 64
        got_m = bloom_probe(keys, "k", bloom, m=1 << 14, k=4)
        assert got_m.filter(~F.col("might_contain")).count() == 0  # no FN, ever
        fp = bloom_probe(others, "k", bloom, m=1 << 14, k=4).filter(
            F.col("might_contain")
        ).count()
        # n=300, m=2^14, k=4 → theoretical FPR ≈ 2.6e-5; give it slack
        assert fp <= 5, fp

    def test_bloom_expr_probe_equals_join_probe(self, spark):
        from mistral_ocr_pipeline_spark.operators.sketches import (
            bloom_build,
            bloom_might_contain_expr,
            bloom_probe,
            bloom_words_dense,
        )

        keys = spark.range(0, 200).select(
            F.concat(F.lit("key-"), F.col("id")).alias("k")
        )
        probes = spark.range(100, 400).select(
            F.concat(F.lit("key-"), F.col("id")).alias("k")
        )
        bloom = bloom_build(keys, "k", m=2048, k=5)
        joined = {r.k: r.might_contain
                  for r in bloom_probe(probes, "k", bloom, 2048, 5).collect()}
        words = bloom_words_dense(bloom, 2048)
        expr = {r.k: r.m for r in probes.select(
            "k", bloom_might_contain_expr(F.col("k"), words, 2048, 5).alias("m")
        ).collect()}
        assert joined == expr
        assert all(expr[f"key-{i}"] for i in range(100, 200))  # members all hit

    def test_bloom_union_is_build_of_union(self, spark):
        from mistral_ocr_pipeline_spark.operators.sketches import bloom_build

        a = spark.range(0, 50).select(F.concat(F.lit("a-"), F.col("id")).alias("k"))
        b = spark.range(0, 50).select(F.concat(F.lit("b-"), F.col("id")).alias("k"))
        merged = (
            bloom_build(a, "k", m=1024, k=3)
            .unionByName(bloom_build(b, "k", m=1024, k=3))
            .groupBy("word_idx")
            .agg(F.bit_or("word").alias("word"))
        )
        direct = bloom_build(a.unionByName(b), "k", m=1024, k=3)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, direct.collect())
        )

    def test_heavy_hitters_exact_when_untruncated(self, spark):
        from mistral_ocr_pipeline_spark.operators.sketches import heavy_hitters_rollup

        # < k distinct values per shard → no truncation, est == exact == max
        df = spark.range(0, 4000).select(
            (F.col("id") % 4).alias("shard"), (F.col("id") % 10).alias("v")
        )
        got = heavy_hitters_rollup(df, "shard", "v", k=16).collect()
        assert len(got) == 10
        for r in got:
            assert r.est_count == r.max_count == 400, r


class TestDeterministicSampling:
    def test_sample_invariant_under_repartitioning(self, spark):
        from mistral_ocr_pipeline_spark.operators.sampling import hash_sample

        df = spark.range(0, 2000).withColumnRenamed("id", "k")
        a = {r.k for r in hash_sample(df, "k", 0.3).collect()}
        b = {r.k for r in hash_sample(df.repartition(17), "k", 0.3).collect()}
        c = {r.k for r in hash_sample(df.coalesce(1), "k", 0.3).collect()}
        assert a == b == c
        assert 0.25 < len(a) / 2000 < 0.35

    def test_salt_decorrelates_samples(self, spark):
        from mistral_ocr_pipeline_spark.operators.sampling import hash_sample

        df = spark.range(0, 2000).withColumnRenamed("id", "k")
        a = {r.k for r in hash_sample(df, "k", 0.3, salt="a").collect()}
        b = {r.k for r in hash_sample(df, "k", 0.3, salt="b").collect()}
        overlap = len(a & b) / max(len(a), 1)
        assert 0.15 < overlap < 0.45  # ≈0.3 if independent; identical salts → 1.0

    def test_split_is_partition_and_exhaustive(self, spark):
        from mistral_ocr_pipeline_spark.operators.sampling import (
            train_valid_test_split,
        )

        df = spark.range(0, 3000).withColumnRenamed("id", "k")
        out = train_valid_test_split(df, "k").collect()
        by_split = {}
        for r in out:
            by_split.setdefault(r.split, set()).add(r.k)
        assert sum(len(s) for s in by_split.values()) == 3000
        assert set(by_split) == {"train", "valid", "test"}
        assert 0.75 < len(by_split["train"]) / 3000 < 0.85
        # same key → same split on a differently-partitioned clone
        out2 = {
            r.k: r.split
            for r in train_valid_test_split(df.repartition(13), "k").collect()
        }
        for split, keys in by_split.items():
            assert all(out2[k] == split for k in keys)


class TestAsofJoin:
    def test_backward_inclusive_and_null_before_first(self, spark):
        from mistral_ocr_pipeline_spark.operators.asof_join import asof_join

        left = spark.createDataFrame(
            [("u", "2024-01-01 09:59:59"), ("u", "2024-01-01 10:00:00"),
             ("u", "2024-01-01 10:30:00"), ("v", "2024-01-01 12:00:00")],
            "k string, ts string",
        ).select("k", F.to_timestamp("ts").alias("ts"))
        right = spark.createDataFrame(
            [("u", "2024-01-01 10:00:00", 1), ("u", "2024-01-01 10:15:00", 2)],
            "k string, ts string, ev long",
        ).select("k", F.to_timestamp("ts").alias("ts"), "ev")
        got = {
            (r.k, str(r.ts)): r.ev_asof
            for r in asof_join(left, right, key="k", right_cols=("ev",)).collect()
        }
        assert got[("u", "2024-01-01 09:59:59")] is None      # before first event
        assert got[("u", "2024-01-01 10:00:00")] == 1         # equal ts matches
        assert got[("u", "2024-01-01 10:30:00")] == 2         # latest wins
        assert got[("v", "2024-01-01 12:00:00")] is None      # key never seen

    def test_epoch_long_time_axis(self, spark):
        # right_ts of ANY orderable type: the left branch's null literal is
        # cast to the right column's actual type (r01 hardcoded timestamp,
        # so epoch-long axes type-mismatched at unionByName)
        from mistral_ocr_pipeline_spark.operators.asof_join import asof_join

        left = spark.createDataFrame(
            [("u", 95), ("u", 100), ("u", 130)], "k string, ts long"
        )
        right = spark.createDataFrame(
            [("u", 100, 1), ("u", 115, 2)], "k string, ts long, ev long"
        )
        out = asof_join(left, right, key="k", right_cols=("ev",))
        assert dict(out.dtypes)["ts_asof"] == "bigint"
        got = {(r.k, r.ts): (r.ev_asof, r.ts_asof) for r in out.collect()}
        assert got[("u", 95)] == (None, None)
        assert got[("u", 100)] == (1, 100)
        assert got[("u", 130)] == (2, 115)

    def test_single_shuffle_plan(self, spark):
        from mistral_ocr_pipeline_spark.operators.asof_join import asof_join

        left = spark.range(100).select(
            (F.col("id") % 5).alias("k"), F.timestamp_seconds("id").alias("ts")
        )
        right = spark.range(20).select(
            (F.col("id") % 5).alias("k"),
            F.timestamp_seconds(F.col("id") * 3).alias("ts"),
            F.col("id").alias("ev"),
        )
        plan = (
            asof_join(left, right, key="k", right_cols=("ev",))
            ._jdf.queryExecution().executedPlan().toString()
        )
        # no join node at all — and exactly one exchange feeds the sort
        assert "Join" not in plan
        assert plan.count("Exchange") == 1


class TestRangeJoinAndTfidf:
    def test_range_join_matches_naive(self, spark):
        from mistral_ocr_pipeline_spark.operators.asof_join import range_join_buckets

        iv = spark.createDataFrame(
            [(1, "u", "2024-01-01 10:00:00", "2024-01-01 12:00:00"),
             (2, "u", "2024-01-01 11:30:00", "2024-01-01 11:45:00"),
             (3, "v", "2024-01-01 10:00:00", "2024-01-01 23:00:00")],
            "iid long, k string, start string, end string",
        ).select("iid", "k", F.to_timestamp("start").alias("start"),
                 F.to_timestamp("end").alias("end"))
        pts = spark.createDataFrame(
            [(10, "u", "2024-01-01 10:00:00"),   # inclusive start
             (11, "u", "2024-01-01 12:00:00"),   # exclusive end → iv 1 no
             (12, "u", "2024-01-01 11:40:00"),   # both u intervals
             (13, "v", "2024-01-01 22:59:59"),   # long interval tail
             (14, "w", "2024-01-01 11:00:00")],  # unseen key
            "pid long, k string, ts string",
        ).select("pid", "k", F.to_timestamp("ts").alias("ts"))
        got = {
            (r.iid, r.pid)
            for r in range_join_buckets(iv, pts, key="k").collect()
        }
        naive = {
            (r.iid, r.pid)
            for r in iv.join(pts, "k")
            .filter((F.col("ts") >= F.col("start")) & (F.col("ts") < F.col("end")))
            .collect()
        }
        assert got == naive == {(1, 10), (1, 12), (2, 12), (3, 13)}

    def test_range_join_plan_is_equi_join(self, spark):
        from mistral_ocr_pipeline_spark.operators.asof_join import range_join_buckets

        iv = spark.range(100).select(
            F.col("id").alias("iid"), (F.col("id") % 7).alias("k"),
            F.timestamp_seconds(F.col("id") * 60).alias("start"),
            F.timestamp_seconds(F.col("id") * 60 + 7200).alias("end"),
        )
        pts = spark.range(100).select(
            F.col("id").alias("pid"), (F.col("id") % 7).alias("k"),
            F.timestamp_seconds(F.col("id") * 45).alias("ts"),
        )
        plan = (
            range_join_buckets(iv, pts, key="k")
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "NestedLoop" not in plan and "Cartesian" not in plan

    def test_tfidf_rare_term_outranks_common(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import tfidf_topk

        docs = spark.createDataFrame(
            [(1, "common zebra"), (2, "common word"), (3, "common word")],
            "doc_id long, text string",
        )
        got = {
            (r.doc_id, r.rank): (r.term, r.tf)
            for r in tfidf_topk(docs, "doc_id", "text", k=2).collect()
        }
        # equal tf=1: zebra (df=1) must outrank common (df=3, idf=1.0)
        assert got[(1, 1)][0] == "zebra"
        assert got[(1, 2)][0] == "common"


class TestWeightedMix:
    def test_mix_fractions_and_tags(self, spark):
        from mistral_ocr_pipeline_spark.operators.sampling import weighted_mix

        a = spark.range(0, 2000).withColumnRenamed("id", "k")
        b = spark.range(2000, 4000).withColumnRenamed("id", "k")
        out = weighted_mix([(a, 0.5), (b, 0.1)], key_col="k").collect()
        by_src = {}
        for r in out:
            by_src.setdefault(r.mix_source, []).append(r.k)
        assert 0.42 < len(by_src[0]) / 2000 < 0.58
        assert 0.05 < len(by_src[1]) / 2000 < 0.16
        assert all(k < 2000 for k in by_src[0]) and all(k >= 2000 for k in by_src[1])

    def test_mix_exact_quotas_partition_invariant(self, spark):
        from mistral_ocr_pipeline_spark.operators.sampling import weighted_mix_exact

        a = spark.range(0, 500).withColumnRenamed("id", "k")
        b = spark.range(500, 900).withColumnRenamed("id", "k")
        m1 = {(r.k, r.mix_source) for r in weighted_mix_exact([(a, 30), (b, 7)], "k").collect()}
        m2 = {
            (r.k, r.mix_source)
            for r in weighted_mix_exact(
                [(a.repartition(13), 30), (b.repartition(5), 7)], "k"
            ).collect()
        }
        assert m1 == m2
        assert sum(1 for _, s in m1 if s == 0) == 30
        assert sum(1 for _, s in m1 if s == 1) == 7


class TestContamination:
    def test_planted_overlap_flagged(self, spark):
        from mistral_ocr_pipeline_spark.operators.dedup import contamination_flags

        bench = "the quick brown fox jumps over the lazy dog tonight"
        corpus = spark.createDataFrame(
            [(1, f"intro text then {bench} and a conclusion paragraph"),
             (2, "completely unrelated content about spark partitioning"),
             (3, "short")],
            "id long, text string",
        )
        ev = spark.createDataFrame([(100, bench)], "id long, text string")
        got = {
            r.id: (r.n_contaminated_grams, r.contaminated)
            for r in contamination_flags(corpus, ev, "id", "text", n=5).collect()
        }
        assert got[1][1] is True and got[1][0] >= 1   # planted benchmark text
        assert got[2] == (0, False)
        assert got[3] == (0, False)                   # too short for any 5-gram
        assert len(got) == 3                          # audit covers every doc

    def test_semantic_flags(self, spark):
        from mistral_ocr_pipeline_spark.operators.dedup import (
            semantic_contamination_flags,
        )

        ev = spark.createDataFrame(
            [(100, [1.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        corpus = spark.createDataFrame(
            [
                (1, [3.0, 0.0, 0.0]),     # scaled copy of eval 100 -> cos 1.0
                (2, [1.0, 0.12, 0.0]),    # near-paraphrase of 100 -> cos ~0.993
                (3, [1.0, 1.0, 0.0]),     # equidistant: cos 0.707107 to BOTH
                (4, [0.0, 0.0, 5.0]),     # orthogonal -> clean, still audited
                (5, None),                # NULL embedding -> dropped
            ],
            "vec_id long, embedding array<double>",
        )
        rows = {
            r.id: r
            for r in semantic_contamination_flags(
                corpus, ev, threshold=0.9
            ).collect()
        }
        assert set(rows) == {1, 2, 3, 4}              # NULL dropped, rest audited
        assert rows[1].eval_id == 100 and rows[1].cosine == 1.0
        assert rows[1].contaminated is True
        assert rows[2].eval_id == 100 and rows[2].contaminated is True
        # 6-dp tie between the two eval items -> lowest eval id wins
        assert rows[3].eval_id == 100 and rows[3].contaminated is False
        assert rows[4].contaminated is False
        # empty eval set -> empty audit, not a crash
        assert (
            semantic_contamination_flags(
                corpus, ev.filter("vec_id < 0"), threshold=0.9
            ).count()
            == 0
        )


class TestPerKeySample:
    def test_cap_and_partition_invariance(self, spark):
        from mistral_ocr_pipeline_spark.operators.sampling import sample_per_key

        df = spark.range(0, 300).select(
            F.col("id").alias("doc_id"), (F.col("id") % 3).alias("src")
        )
        a = sample_per_key(df, "src", "doc_id", k=7)
        assert a.count() == 21
        assert a.groupBy("src").count().agg(F.max("count")).first()[0] == 7
        b = sample_per_key(df.repartition(13), "src", "doc_id", k=7)
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
        # groups smaller than k keep everything
        tiny = spark.createDataFrame([(1, 0), (2, 0)], "doc_id long, src long")
        assert sample_per_key(tiny, "src", "doc_id", k=7).count() == 2


class TestPq:
    """Product-quantization ANN (operators/similarity.py): the ADC path is
    value-replayed in SQL by `ann_pq_topk`/`ann_pq_refine_topk`; these pin
    layout-invariance, the numpy model, and trained-codebook quality."""

    def test_pq_encode_invariant_under_repartition(self, spark, emb):
        from mistral_ocr_pipeline_spark.operators.similarity import (
            pq_encode,
            seeded_pq_codebooks,
        )

        cb = seeded_pq_codebooks(64, m=16, ksub=16)
        base = {r.vec_id: list(r.codes) for r in pq_encode(emb, cb).collect()}
        for layout in (emb.repartition(7), emb.coalesce(1)):
            got = {r.vec_id: list(r.codes) for r in pq_encode(layout, cb).collect()}
            assert got == base
        assert all(0 <= c < 16 for codes in base.values() for c in codes)

    def test_pq_adc_matches_numpy_model(self, spark, emb):
        """pq_topk (ADC, no refine) ≡ a direct numpy model: argmin-L2
        codes, LUT, summed reconstruction distance, rank ascending with
        vec_id tie-break — the Catalyst fold and the model must agree
        exactly after the shared 6-dp round."""
        import numpy as np
        from pyspark.sql import functions as F

        from mistral_ocr_pipeline_spark.operators.similarity import (
            pq_topk,
            seeded_pq_codebooks,
        )

        cb = seeded_pq_codebooks(64, m=16, ksub=16)
        m, ksub, dsub = cb.shape
        rows = emb.select("vec_id", "embedding").collect()
        ids = np.array([r.vec_id for r in rows])
        mat = np.array([list(r.embedding) for r in rows], dtype=np.float64)
        c2 = (cb**2).sum(axis=2)
        codes = np.empty((len(mat), m), dtype=np.int64)
        for j in range(m):
            sub = mat[:, j * dsub : (j + 1) * dsub]
            codes[:, j] = np.argmin(c2[j][None, :] - 2.0 * (sub @ cb[j].T), axis=1)
        def micro(x):
            import math

            y = x * 1e6
            return int(math.floor(y + 0.5)) if y >= 0 else int(math.ceil(y - 0.5))

        expected = set()
        for qi in np.where(ids < 8)[0]:
            qv = mat[qi]
            lut = np.empty((m, ksub), dtype=np.int64)
            for j in range(m):
                for kk in range(ksub):
                    lut[j, kk] = micro(
                        float(c2[j][kk] - 2.0 * (cb[j][kk] @ qv[j * dsub : (j + 1) * dsub]))
                    )
            adc_micro = micro(float(qv @ qv)) + lut[
                np.arange(m)[None, :], codes
            ].sum(axis=1)
            order = sorted(
                (round(adc_micro[i] / 1e6, 6), int(ids[i]))
                for i in range(len(ids))
                if ids[i] != ids[qi]
            )
            for rank, (d, vid) in enumerate(order[:5], start=1):
                expected.add((int(ids[qi]), vid, d, rank))
        got = {
            (r.query_id, r.vec_id, r.adc_dist, r.rank)
            for r in pq_topk(emb, emb.filter(F.col("vec_id") < 8), cb, k=5).collect()
        }
        assert got == expected

    def test_trained_codebooks_reduce_quantization_error(self, spark, emb):
        """Lloyd-trained codebooks must reconstruct the corpus strictly
        better than seeded-random ones (both deterministic here), and be
        layout-invariant like every sample-derived index in this module."""
        import numpy as np

        from mistral_ocr_pipeline_spark.operators.similarity import (
            pq_codebooks_kmeans,
            seeded_pq_codebooks,
        )

        rows = emb.select("embedding").collect()
        mat = np.array([list(r.embedding) for r in rows], dtype=np.float64)

        def mse(cb):
            m, ksub, dsub = cb.shape
            err = 0.0
            for j in range(m):
                sub = mat[:, j * dsub : (j + 1) * dsub]
                d = ((sub[:, None, :] - cb[j][None, :, :]) ** 2).sum(axis=2)
                err += d.min(axis=1).sum()
            return err / mat.size

        trained = pq_codebooks_kmeans(emb, m=16, ksub=16)
        # measured ≈0.0049 vs ≈0.0072 on the sf0.01 corpus (32% lower)
        assert mse(trained) < 0.8 * mse(seeded_pq_codebooks(64, m=16, ksub=16))
        again = pq_codebooks_kmeans(emb.repartition(5), m=16, ksub=16)
        assert np.array_equal(trained, again)

    def test_refine_reranks_with_exact_cosine(self, spark, emb):
        """Every (query, vec) the refine path returns must carry the
        EXACT cosine (vs brute force) and rank consistently within the
        query — the approximate pass only selects candidates, never
        distorts reported scores."""
        from pyspark.sql import functions as F

        from mistral_ocr_pipeline_spark.operators.similarity import (
            brute_force_topk,
            pq_topk,
            seeded_pq_codebooks,
        )

        cb = seeded_pq_codebooks(64, m=16, ksub=16)
        q = emb.filter(F.col("vec_id") < 8)
        got = pq_topk(emb, q, cb, k=5, refine=64).collect()
        exact = {
            (r.query_id, r.vec_id): r.cosine
            for r in brute_force_topk(emb, q, k=100).collect()
        }
        for r in got:
            assert abs(exact[(r.query_id, r.vec_id)] - r.cosine) <= 1e-6
        by_q: dict = {}
        for r in got:
            by_q.setdefault(r.query_id, []).append(r)
        for rs in by_q.values():
            rs.sort(key=lambda r: r.rank)
            assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
            assert all(
                rs[i].cosine >= rs[i + 1].cosine for i in range(len(rs) - 1)
            )


class TestBm25:
    """BM25 retrieval (text_analysis.bm25_topk): the full path is
    value-replayed in SQL by `text_bm25_topk`; these pin the scoring
    model against a pure-Python BM25 and the edge semantics."""

    def test_matches_pure_python_model(self, spark):
        import math

        from mistral_ocr_pipeline_spark.operators.text_analysis import bm25_topk

        corpus = [
            (0, "the cat sat on the mat"),
            (1, "the dog chased the cat"),
            (2, "a quantum computer factors integers"),
            (3, "the mat was red"),
            (4, ""),  # empty doc: dl=0, counts toward N and avgdl
        ]
        queries = [(100, "cat mat"), (101, "quantum computer"), (102, "zzz")]

        def norm_toks(t):
            import re

            return [
                w
                for w in re.sub(r"\s+", " ", re.sub(r"[^\w\s/\-]", "", t.lower())).strip().split(" ")
                if w != ""
            ]

        toks = {d: norm_toks(t) for d, t in corpus}
        n = len(corpus)
        avgdl = sum(len(v) for v in toks.values()) / n
        dfreq: dict = {}
        for ts in toks.values():
            for term in set(ts):
                dfreq[term] = dfreq.get(term, 0) + 1
        expected = set()
        for qid, qt in queries:
            scores = {}
            for d, ts in toks.items():
                micro = 0
                for term in set(norm_toks(qt)):
                    tf = ts.count(term)
                    if tf == 0:
                        continue
                    idf = math.log(1 + (n - dfreq[term] + 0.5) / (dfreq[term] + 0.5))
                    tfn = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(ts) / avgdl))
                    micro += round(idf * tfn * 1e6)
                if micro:
                    scores[d] = round(micro / 1e6, 6)
            for rank, (d, s) in enumerate(
                sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3], start=1
            ):
                expected.add((qid, d, s, rank))
        cdf = spark.createDataFrame(corpus, "doc_id long, text string")
        qdf = spark.createDataFrame(queries, "query_id long, query_text string")
        got = {
            (r.query_id, r.doc_id, r.score, r.rank)
            for r in bm25_topk(cdf, qdf, k=3).collect()
        }
        assert got == expected
        assert not any(q == 102 for q, *_ in got)  # no-hit query → no rows

    def test_rarer_term_outranks_common(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import bm25_topk

        rows = [(i, "common filler words here") for i in range(20)]
        rows.append((20, "common rareword here"))
        cdf = spark.createDataFrame(rows, "doc_id long, text string")
        qdf = spark.createDataFrame(
            [(0, "rareword common")], "query_id long, query_text string"
        )
        top = bm25_topk(cdf, qdf, k=1).collect()[0]
        assert top.doc_id == 20  # the idf of 'rareword' dominates


class TestBm25Index:
    """Maintained BM25 index (bm25_index_build/append/search_index):
    append ≡ rebuild on both stored frames, and maintained-index search
    is row-identical to the one-shot `bm25_topk` (the driver queries
    `bm25_index_append` / `text_bm25_incremental` hash-prove the same
    claims against DuckDB at sf0.01)."""

    def _frames(self, spark):
        hist = spark.createDataFrame(
            [
                (0, "the cat sat on the mat"),
                (1, "the dog chased the cat"),
                (2, "a quantum computer factors integers"),
                (3, ""),  # empty doc: dl=0 but counts toward n_docs
            ],
            "doc_id long, text string",
        )
        batch = spark.createDataFrame(
            [
                (10, "the cat factors the mat"),
                (11, "brand new vocabulary only"),
            ],
            "doc_id long, text string",
        )
        return hist, batch

    def test_append_equals_rebuild(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            bm25_index_append,
            bm25_index_build,
        )

        hist, batch = self._frames(spark)
        m_p, m_s = bm25_index_append(bm25_index_build(hist), batch)
        r_p, r_s = bm25_index_build(hist.unionByName(batch))
        assert sorted(map(tuple, m_p.collect())) == sorted(
            map(tuple, r_p.collect())
        )
        assert m_s.collect() == r_s.collect()
        # stats are genuinely additive facts, not ratios
        row = m_s.collect()[0]
        assert row.n_docs == 6 and row.sum_dl == sum(
            len([w for w in t.split() if w]) for _, t in
            [(r.doc_id, r.text) for r in hist.unionByName(batch).collect()]
        )

    def test_index_search_matches_oneshot(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            bm25_index_append,
            bm25_index_build,
            bm25_search_index,
            bm25_topk,
        )

        hist, batch = self._frames(spark)
        qdf = spark.createDataFrame(
            [(100, "cat mat"), (101, "quantum computer"), (102, "vocabulary")],
            "query_id long, query_text string",
        )
        idx = bm25_index_append(bm25_index_build(hist), batch)
        via_index = sorted(
            (r.query_id, r.doc_id, r.score, r.rank)
            for r in bm25_search_index(idx, qdf, k=3).collect()
        )
        oneshot = sorted(
            (r.query_id, r.doc_id, r.score, r.rank)
            for r in bm25_topk(hist.unionByName(batch), qdf, k=3).collect()
        )
        assert via_index == oneshot
        # batch-only vocabulary is retrievable through the merged index
        assert any(q == 102 and d == 11 for q, d, _, _ in via_index)

    def test_append_never_reads_history_text(self, spark, tmp_path):
        """The append path's inputs are the PERSISTED index frames —
        history text is not among its data sources.  Persist the index,
        delete the history table from disk, and the merge still works."""
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            bm25_index_append,
            bm25_index_build,
        )

        hist, batch = self._frames(spark)
        p, s = bm25_index_build(hist)
        p.write.parquet(str(tmp_path / "postings"))
        s.write.parquet(str(tmp_path / "stats"))
        stored = (
            spark.read.parquet(str(tmp_path / "postings")),
            spark.read.parquet(str(tmp_path / "stats")),
        )
        m_p, m_s = bm25_index_append(stored, batch)
        assert m_p.count() > stored[0].count()
        assert m_s.collect()[0].n_docs == 6


class TestTokenBudgetMix:
    def _fixture(self, spark):
        rows = [(i, 10 + (i * 7) % 50) for i in range(200)]
        return spark.createDataFrame(rows, "doc_id long, tokens long")

    def test_matches_python_replay_and_layout_invariant(self, spark):
        import hashlib

        from mistral_ocr_pipeline_spark.operators.sampling import token_budget_mix

        df = self._fixture(spark)
        rows = [(r.doc_id, r.tokens) for r in df.collect()]

        def h(idx, key):
            return hashlib.md5(f"tokmix:{idx}{key}".encode()).hexdigest()[:8]

        def sh(idx, key):
            return (
                int(hashlib.md5(f"tokmix-shard:{idx}{key}".encode())
                    .hexdigest()[:8], 16) % 4
            )

        expected = set()
        per_shard = 900 // 4
        for shard in range(4):
            members = sorted(
                ((d, t) for d, t in rows if sh(0, d) == shard),
                key=lambda dt: (h(0, dt[0]), dt[0]),
            )
            off = 0
            for d, t in members:
                if off < per_shard:
                    expected.add((d, 0, shard, t, off))
                off += t
        for layout in (df, df.repartition(13), df.coalesce(1)):
            got = {
                (r.doc_id, r.mix_source, r.shard, r.tokens, r.start_offset)
                for r in token_budget_mix(
                    [(layout, 900)], key_col="doc_id", tokens_col="tokens",
                    n_shards=4,
                ).collect()
            }
            assert got == expected

    def test_budget_overshoot_bounded_by_one_doc_per_shard(self, spark):
        from mistral_ocr_pipeline_spark.operators.sampling import token_budget_mix

        df = self._fixture(spark)
        out = token_budget_mix(
            [(df, 1200)], key_col="doc_id", tokens_col="tokens", n_shards=4
        ).collect()
        per_shard = 1200 // 4
        taken: dict = {}
        for r in out:
            taken.setdefault(r.shard, []).append(r)
        for shard, rs in taken.items():
            total = sum(r.tokens for r in rs)
            # the straddling doc may overflow the slice; dropping the
            # largest doc must bring the shard back under its slice
            assert total - max(r.tokens for r in rs) < per_shard
            # kept set is exactly the hash-order prefix: offsets tile
            rs.sort(key=lambda r: r.start_offset)
            off = 0
            for r in rs:
                assert r.start_offset == off
                off += r.tokens


class TestLeakageFreeSplit:
    def test_dup_components_never_straddle_splits(self, spark):
        from mistral_ocr_pipeline_spark.operators.sampling import (
            leakage_free_split,
            train_valid_test_split,
        )

        nodes = spark.createDataFrame(
            [(i,) for i in range(300)], "doc_id long"
        )
        # chains of 3: (3k, 3k+1, 3k+2) — multi-hop closure required
        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(0, 300, 3)]
            + [(i + 1, i + 2) for i in range(0, 300, 3)],
            "id_a long, id_b long",
        )
        out = leakage_free_split(nodes, edges, id_col="doc_id").collect()
        by_comp: dict = {}
        for r in out:
            by_comp.setdefault(r.comp, set()).add(r.split)
            assert r.comp == (r.doc_id // 3) * 3
        assert all(len(s) == 1 for s in by_comp.values())
        assert len({next(iter(s)) for s in by_comp.values()}) == 3  # all splits used

        # the naive per-doc hash split WOULD have straddled some component
        naive = {
            r.doc_id: r.split
            for r in train_valid_test_split(nodes, key_col="doc_id").collect()
        }
        straddled = sum(
            1
            for base in range(0, 300, 3)
            if len({naive[base], naive[base + 1], naive[base + 2]}) > 1
        )
        assert straddled > 0


class TestBm25Champion:
    def test_cap_bounds_scores_per_pair(self, spark, docs):
        """Champion capping: idf keeps true df and surviving (term, doc)
        contributions compute identically, so capped ≤ uncapped per pair.
        Exact equality under full champion membership is pinned on the
        micro-fixture below (the sf corpus's tf≈1 common-word queries put
        no doc inside ALL its terms' champions at cap=5)."""
        from mistral_ocr_pipeline_spark.functions.text_functions import norm_key_col
        from mistral_ocr_pipeline_spark.operators.text_analysis import bm25_topk

        toks = F.filter(F.split(norm_key_col(F.col("text")), " "), lambda t: t != "")
        queries = docs.filter(F.col("doc_id") < 4).select(
            F.col("doc_id").alias("query_id"),
            F.array_join(F.slice(toks, 1, 6), " ").alias("query_text"),
        )
        full = {
            (r.query_id, r.doc_id): r.score
            for r in bm25_topk(docs, queries, k=10**6).collect()
        }
        capped = bm25_topk(docs, queries, k=100, max_postings_per_term=5).collect()
        assert capped
        for r in capped:
            assert r.score <= full[(r.query_id, r.doc_id)]

    def test_full_champion_membership_keeps_exact_score(self, spark):
        """A corpus where every doc fits inside every term's champion list
        must reproduce the uncapped scores bit-for-bit."""
        from mistral_ocr_pipeline_spark.operators.text_analysis import bm25_topk

        cdf = spark.createDataFrame(
            [(0, "alpha beta"), (1, "alpha gamma"), (2, "beta beta delta")],
            "doc_id long, text string",
        )
        qdf = spark.createDataFrame(
            [(9, "alpha beta")], "query_id long, query_text string"
        )
        base = {
            (r.query_id, r.doc_id): (r.score, r.rank)
            for r in bm25_topk(cdf, qdf, k=10).collect()
        }
        capped = {
            (r.query_id, r.doc_id): (r.score, r.rank)
            for r in bm25_topk(cdf, qdf, k=10, max_postings_per_term=3).collect()
        }
        assert base == capped


class TestRrfFuse:
    def test_matches_python_model(self, spark):
        from mistral_ocr_pipeline_spark.operators.similarity import rrf_fuse

        sparse = spark.createDataFrame(
            [(1, 10, 1), (1, 11, 2), (1, 12, 3), (2, 20, 1)],
            "query_id long, doc_id long, rank long",
        )
        dense = spark.createDataFrame(
            [(1, 11, 1), (1, 13, 2), (2, 20, 1), (2, 21, 2)],
            "query_id long, doc_id long, rank long",
        )
        got = {
            (r.query_id, r.doc_id): (r.rrf_score, r.n_lists, r.rank)
            for r in rrf_fuse([sparse, dense], k=3).collect()
        }

        def s(*ranks):
            return round(sum(round(1e6 / (60 + r)) for r in ranks) / 1e6, 6)

        # q1: doc 11 in both lists (ranks 2+1) beats single-list docs
        assert got[(1, 11)] == (s(2, 1), 2, 1)
        assert got[(1, 10)] == (s(1,), 1, 2)
        assert got[(1, 13)] == (s(2,), 1, 3)
        assert (1, 12) not in got  # k=3 cut
        assert got[(2, 20)] == (s(1, 1), 2, 1)
        assert got[(2, 21)] == (s(2,), 1, 2)


class TestDsir:
    """DSIR importance weights (text_analysis.dsir_logweights): the full
    model is value-replayed in SQL by `text_dsir_weights`; these pin the
    selection signal, edge semantics, and layout invariance."""

    def test_target_like_docs_score_higher(self, spark, docs):
        from mistral_ocr_pipeline_spark.operators.text_analysis import dsir_logweights

        out = dsir_logweights(
            docs.select("doc_id", "text"),
            docs.filter(F.col("lang") == "en").select("doc_id", "text"),
        )
        joined = out.join(docs.select("doc_id", "lang"), "doc_id")
        means = {
            r.is_en: r.m
            for r in joined.groupBy((F.col("lang") == "en").alias("is_en"))
            .agg(F.avg("logweight").alias("m"))
            .collect()
        }
        assert means[True] > means[False]  # the resampling signal exists

    def test_edges_and_layout_invariance(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import dsir_logweights

        corpus = spark.createDataFrame(
            [(0, "alpha beta gamma"), (1, "alpha"), (2, ""), (3, "   ")],
            "doc_id long, text string",
        )
        target = spark.createDataFrame([(9, "alpha beta")], "doc_id long, text string")
        base = {
            r.doc_id: (r.n_grams, r.logweight)
            for r in dsir_logweights(corpus, target).collect()
        }
        # doc 0: 3 unigrams + 2 bigrams; doc 1: 1 unigram, no bigram;
        # empty/whitespace docs emit no row (no features, no evidence)
        assert base[0][0] == 5 and base[1][0] == 1
        assert set(base) == {0, 1}
        for layout in (corpus.repartition(7), corpus.coalesce(1)):
            got = {
                r.doc_id: (r.n_grams, r.logweight)
                for r in dsir_logweights(layout, target).collect()
            }
            assert got == base


class TestQualityFunnel:
    def test_all_verdicts_and_first_fail_precedence(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import quality_funnel

        good = (
            "the cat and the dog sat in the old house and it was warm for "
            "a long while so they slept there until morning came again"
        )
        fixture = [
            (0, good),  # keep
            (1, "short text"),  # too_short (first rule wins over low_stopword)
            (2, "supercalifragilistic " * 30),  # word_len (mean > 10)
            (3, "#!?* " + "$%&@ " * 40),  # symbol_heavy fires before low_stopword? no: word_len lo
            (4, "lorem ipsum dolor sit amet " * 10),  # low_stopword
            (5, ("the cat and the dog sat in it\n" * 20) + good),  # dup_lines
        ]
        out = {
            r.id: r.verdict
            for r in quality_funnel(
                spark.createDataFrame(fixture, "doc_id long, text string"),
                min_tokens=5,
            ).collect()
        }
        assert out[0] == "keep"
        assert out[1] == "too_short"
        assert out[2] == "word_len"
        assert out[4] == "low_stopword"
        assert out[5] == "dup_lines"
        # doc 3: symbols dominate — but mean word len (5 incl. symbols)
        # is in bounds, so the verdict must be the symbol rule, not a
        # later one (first-fail ordering pinned)
        assert out[3] == "symbol_heavy"


class TestTokenBudgetMixGuard:
    def test_string_keys_shard_uniformly(self, spark):
        """Hash sharding accepts any key type and spreads PATTERNED key
        populations (all-even ids, string urls) across every shard — the
        pmod(key) rule this replaced starved whole shards and silently
        undershot the token target by their undelivered slices."""
        from mistral_ocr_pipeline_spark.operators.sampling import token_budget_mix

        strs = spark.createDataFrame(
            [(f"url-{i}", 10) for i in range(200)], "doc_key string, tokens long"
        )
        out = token_budget_mix([(strs, 400)], key_col="doc_key",
                               tokens_col="tokens", n_shards=4)
        assert {r.shard for r in out.collect()} == {0, 1, 2, 3}
        evens = spark.createDataFrame(
            [(2 * i, 10) for i in range(200)], "doc_id long, tokens long"
        )
        out2 = token_budget_mix([(evens, 400)], key_col="doc_id",
                                tokens_col="tokens", n_shards=4).collect()
        assert {r.shard for r in out2} == {0, 1, 2, 3}
        # every shard delivers its full 100-token slice (no starvation)
        totals = {}
        for r in out2:
            totals[r.shard] = totals.get(r.shard, 0) + r.tokens
        assert all(t >= 100 for t in totals.values())


class TestDsirFlagForm:
    def test_flag_form_equals_two_stream_form(self, spark, docs):
        """target-as-boolean-column (single gram pass) must reproduce
        target-as-DataFrame bit-for-bit — same model, cheaper plan."""
        from mistral_ocr_pipeline_spark.operators.text_analysis import dsir_logweights

        two = {
            r.doc_id: (r.n_grams, r.logweight)
            for r in dsir_logweights(
                docs.select("doc_id", "text"),
                docs.filter(F.col("lang") == "en").select("doc_id", "text"),
            ).collect()
        }
        one = {
            r.doc_id: (r.n_grams, r.logweight)
            for r in dsir_logweights(
                docs.select(
                    "doc_id", "text", (F.col("lang") == "en").alias("is_tgt")
                ),
                "is_tgt",
            ).collect()
        }
        assert one == two


class TestTokenBudgetMixZeroSlice:
    def test_target_below_shards_raises(self, spark):
        from mistral_ocr_pipeline_spark.operators.sampling import token_budget_mix

        df = spark.createDataFrame([(1, 10)], "doc_id long, tokens long")
        with pytest.raises(ValueError, match="lower n_shards"):
            token_budget_mix([(df, 3)], "doc_id", "tokens", n_shards=8)


class TestIntraLineDedup:
    def test_keeps_first_occurrences_in_order(self, spark):
        from mistral_ocr_pipeline_spark.operators.dedup import intra_line_dedup

        fixture = [
            (0, "a\nb\na\nc\nb\na"),      # interleaved repeats
            (1, "x\ny\nz"),                # all unique
            (2, "  pad  \n\npad\nq"),      # trim-normalized repeat + blank
            (3, ""),                       # empty doc
        ]
        out = {
            r.id: (r.clean_text, r.n_lines, r.n_removed)
            for r in intra_line_dedup(
                spark.createDataFrame(fixture, "doc_id long, text string"),
                "doc_id",
                "text",
            ).collect()
        }
        assert out[0] == ("a\nb\nc", 6, 3)
        assert out[1] == ("x\ny\nz", 3, 0)
        assert out[2] == ("pad\nq", 3, 1)
        assert out[3] == ("", 0, 0)


class TestBm25RandomCorpusParity:
    def test_seeded_random_corpus_matches_python_model(self, spark):
        """One Spark run over a seeded random corpus (repeats, casing,
        punctuation, numbers, empty docs) vs the pure-Python BM25 —
        richer coverage of tokenization/tf/df/dl edges than the hand
        fixture."""
        import math
        import random
        import re

        from mistral_ocr_pipeline_spark.operators.text_analysis import bm25_topk

        rng = random.Random(1234)
        vocab = ["the", "Cat", "dog!", "mat", "42", "Qu-antum", "beta",
                 "gamma", "run/walk", "zz"]
        corpus = [
            (i, " ".join(rng.choices(vocab, k=rng.randint(0, 25))))
            for i in range(60)
        ]
        queries = [
            (100 + j, " ".join(rng.choices(vocab, k=rng.randint(1, 4))))
            for j in range(6)
        ]

        def norm_toks(t):
            return [
                w
                for w in re.sub(
                    r"\s+", " ", re.sub(r"[^\w\s/\-]", "", t.lower())
                ).strip().split(" ")
                if w != ""
            ]

        toks = {d: norm_toks(t) for d, t in corpus}
        n = len(corpus)
        avgdl = sum(len(v) for v in toks.values()) / n
        dfreq: dict = {}
        for ts in toks.values():
            for term in set(ts):
                dfreq[term] = dfreq.get(term, 0) + 1
        expected = set()
        for qid, qt in queries:
            scores = {}
            for d, ts in toks.items():
                micro = 0
                for term in set(norm_toks(qt)):
                    tf = ts.count(term)
                    if tf == 0:
                        continue
                    idf = math.log(1 + (n - dfreq[term] + 0.5) / (dfreq[term] + 0.5))
                    tfn = tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * len(ts) / avgdl))
                    micro += round(idf * tfn * 1e6)
                if micro:
                    scores[d] = round(micro / 1e6, 6)
            for rank, (d, s) in enumerate(
                sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:4],
                start=1,
            ):
                expected.add((qid, d, s, rank))
        got = {
            (r.query_id, r.doc_id, r.score, r.rank)
            for r in bm25_topk(
                spark.createDataFrame(corpus, "doc_id long, text string"),
                spark.createDataFrame(queries, "query_id long, query_text string"),
                k=4,
            ).collect()
        }
        assert got == expected


class TestTrainingShardOrder:
    def test_concatenated_order_is_global_and_layout_invariant(self, spark, docs):
        from mistral_ocr_pipeline_spark.operators.sampling import (
            interleave_order,
            training_shard_order,
        )

        en = docs.filter(F.col("lang") == "en").select("doc_id")
        rest = docs.filter(F.col("lang") != "en").select("doc_id")
        mixed = interleave_order([(en, 3), (rest, 1)], key_col="doc_id")

        def run(df):
            out = training_shard_order(
                df, n_shards=4, key_col="mix_key",
                tie_cols=("mix_source", "doc_id"),
            )
            return [(r.shard, r.mix_key, r.mix_source, r.doc_id)
                    for r in out.collect()]

        base = run(mixed)
        # within each shard, rows already arrive sorted; concatenating
        # the shard groups in shard-VALUE order (what a partitionBy
        # write gives the trainer) replays the global epoch order
        by_shard: dict = {}
        for s, k, m, d in base:
            by_shard.setdefault(s, []).append((k, m, d))
        concat = [row for s in sorted(by_shard) for row in by_shard[s]]
        assert concat == sorted(concat)
        assert concat == sorted((k, m, d) for _, k, m, d in base)
        # shard sizes balanced to the percentile boundaries (±ties)
        from collections import Counter

        sizes = Counter(s for s, *_ in base)
        assert set(sizes) == {0, 1, 2, 3}
        assert max(sizes.values()) <= 2 * min(sizes.values())
        # exact-percentile boundaries: membership is a pure function of
        # the data — identical at any input partitioning
        assert run(mixed.repartition(11)) == base

    def test_no_sampled_range_partitioner_in_plan(self, spark, docs):
        from mistral_ocr_pipeline_spark.operators.sampling import (
            interleave_order,
            training_shard_order,
        )

        mixed = interleave_order(
            [(docs.select("doc_id"), 2)], key_col="doc_id"
        )
        plan = training_shard_order(
            mixed, n_shards=4, key_col="mix_key"
        )._jdf.queryExecution().executedPlan().toString()
        assert "rangepartitioning" not in plan  # no sampled boundaries
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


class TestNewOpsEmptyInputs:
    """Empty-relation behavior of the r4 operators: no crashes, sane
    empties — the probes a pipeline hits on an empty daily increment."""

    def test_bm25_empty_corpus_and_empty_queries(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import bm25_topk

        empty_c = spark.createDataFrame([], "doc_id long, text string")
        empty_q = spark.createDataFrame([], "query_id long, query_text string")
        docs = spark.createDataFrame([(0, "some words")], "doc_id long, text string")
        qs = spark.createDataFrame([(1, "words")], "query_id long, query_text string")
        assert bm25_topk(empty_c, qs, k=3).count() == 0
        assert bm25_topk(docs, empty_q, k=3).count() == 0

    def test_dsir_empty_corpus(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import dsir_logweights

        empty = spark.createDataFrame(
            [], "doc_id long, text string, is_tgt boolean"
        )
        assert dsir_logweights(empty, "is_tgt").count() == 0

    def test_token_budget_mix_empty_source(self, spark):
        from mistral_ocr_pipeline_spark.operators.sampling import token_budget_mix

        empty = spark.createDataFrame([], "doc_id long, tokens long")
        assert token_budget_mix([(empty, 100)], "doc_id", "tokens").count() == 0

    def test_rrf_empty_lists(self, spark):
        from mistral_ocr_pipeline_spark.operators.similarity import rrf_fuse

        empty = spark.createDataFrame([], "query_id long, doc_id long, rank long")
        assert rrf_fuse([empty, empty], k=3).count() == 0

    def test_quality_funnel_empty(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import quality_funnel

        empty = spark.createDataFrame([], "doc_id long, text string")
        assert quality_funnel(empty).count() == 0

    def test_leakage_free_split_no_edges(self, spark):
        from mistral_ocr_pipeline_spark.operators.sampling import leakage_free_split

        nodes = spark.createDataFrame([(1,), (2,)], "doc_id long")
        edges = spark.createDataFrame([], "id_a long, id_b long")
        out = {r.doc_id: r.comp for r in
               leakage_free_split(nodes, edges, id_col="doc_id").collect()}
        assert out == {1: 1, 2: 2}  # every node its own component


class TestHardNegatives:
    def test_exclude_self_drops_positive_keeps_dense_ranks(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import bm25_topk

        corpus = [
            (0, "alpha beta gamma"),
            (1, "alpha beta delta"),
            (2, "alpha epsilon"),
            (3, "unrelated words here"),
        ]
        cdf = spark.createDataFrame(corpus, "doc_id long, text string")
        qdf = spark.createDataFrame(
            [(0, "alpha beta gamma")], "query_id long, query_text string"
        )
        with_self = bm25_topk(cdf, qdf, k=3).collect()
        negs = bm25_topk(cdf, qdf, k=3, exclude_self=True).collect()
        assert with_self[0].doc_id == 0  # the positive wins its own query
        got = [(r.doc_id, r.rank) for r in sorted(negs, key=lambda r: r.rank)]
        assert [d for d, _ in got] == [1, 2]  # hard negatives, no doc 0
        assert [r for _, r in got] == [1, 2]  # ranks dense after exclusion


class TestEpochRepeatMix:
    def test_replica_counts_and_layout_invariance(self, spark):
        import hashlib

        from mistral_ocr_pipeline_spark.operators.sampling import epoch_repeat_mix

        df = spark.createDataFrame([(i,) for i in range(300)], "doc_id long")
        out = epoch_repeat_mix([(df, 2.5)], key_col="doc_id")
        base = sorted((r.doc_id, r.epoch) for r in out.collect())
        counts: dict = {}
        for d, e in base:
            counts[d] = counts.get(d, 0) + 1
            assert 0 <= e < counts[d] + 1
        assert set(counts.values()) == {2, 3}  # 2 or 3 replicas, never else
        # fractional subset ≈ half, chosen by the hash predicate exactly
        thr = int(0.5 * (1 << 32))
        for d, c in counts.items():
            h = int(hashlib.md5(f"epoch:0{d}".encode()).hexdigest()[:8], 16)
            assert c == (3 if h < thr else 2)
        # epochs are dense 0..n-1 per doc
        by_doc: dict = {}
        for d, e in base:
            by_doc.setdefault(d, []).append(e)
        assert all(sorted(v) == list(range(len(v))) for v in by_doc.values())
        again = sorted(
            (r.doc_id, r.epoch)
            for r in epoch_repeat_mix([(df.repartition(7), 2.5)], "doc_id").collect()
        )
        assert again == base

    def test_zero_epochs_rejected(self, spark):
        from mistral_ocr_pipeline_spark.operators.sampling import epoch_repeat_mix

        df = spark.createDataFrame([(1,)], "doc_id long")
        with pytest.raises(ValueError, match="epochs"):
            epoch_repeat_mix([(df, 0.0)], key_col="doc_id")


class TestStopwordEngineParity:
    def test_non_ascii_adjacency_matches_duckdb(self, spark):
        """The \\b the old implementation used is Unicode-aware in Java
        but ASCII in RE2 — 'müde' counted a 'de' stopword hit in DuckDB
        and none in Spark.  The ASCII-class tokenization must agree with
        DuckDB on exactly that text."""
        import duckdb

        from mistral_ocr_pipeline_spark.operators.text_analysis import stopword_hits

        texts = ["ich bin müde und gehe", "das ist nicht güt", "plain the and"]
        df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                                   "id long, text string")
        got = {
            r.id: r.n
            for r in df.select("id", stopword_hits(F.col("text"), "de").alias("n")).collect()
        }
        con = duckdb.connect()
        words = "'der','die','das','und','ist','nicht','ein','mit','auf','zu'"
        for i, t in enumerate(texts):
            (exp,) = con.execute(
                "SELECT len(list_filter(string_split_regex(lower(?), "
                f"'[^a-z0-9_]+'), x -> x IN ({words})))", [t]
            ).fetchone()
            assert got[i] == exp, (i, t)
        # the müde case exercises the boundary: ü splits the ASCII token
        # ('m', 'de') IDENTICALLY in both engines — under \b Java would
        # have seen no boundary inside 'müde' while RE2 did, so the
        # engines could disagree the moment a stopword bordered the split
        assert got[0] == 1  # 'und' ('de' is not in the German list)


class TestAnnEmptyInputs:
    """A periodic retrieval job's empty cycle (no queries this batch, or a
    fresh empty corpus) must yield an empty typed frame, not a driver
    crash — pins the `_empty_topk` guards on every ANN entry point."""

    def _frames(self, spark):
        corpus = spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
            "vec_id long, embedding array<double>",
        )
        empty_q = spark.createDataFrame(
            [], "vec_id long, embedding array<double>"
        )
        return corpus, empty_q

    def test_brute_force_empty_queries(self, spark):
        from mistral_ocr_pipeline_spark.operators.similarity import (
            brute_force_topk,
        )

        corpus, empty_q = self._frames(spark)
        out = brute_force_topk(corpus, empty_q, k=3)
        assert out.count() == 0
        assert [f.name for f in out.schema.fields] == [
            "query_id", "vec_id", "cosine", "rank",
        ]

    def test_lsh_empty_queries_and_empty_corpus(self, spark):
        from mistral_ocr_pipeline_spark.operators.similarity import lsh_topk

        corpus, empty_q = self._frames(spark)
        assert lsh_topk(corpus, empty_q, k=3).count() == 0
        # empty corpus with real queries: `first()` is None — guard path
        empty_c = empty_q
        queries = corpus
        assert lsh_topk(empty_c, queries, k=3).count() == 0

    def test_ivf_empty_queries(self, spark):
        from mistral_ocr_pipeline_spark.operators.similarity import ivf_topk

        corpus, empty_q = self._frames(spark)
        assert ivf_topk(corpus, empty_q, k=3, n_centroids=2).count() == 0

    def test_kmeans_empty_corpus_raises(self, spark):
        import pytest as _pytest

        from mistral_ocr_pipeline_spark.operators.similarity import (
            _kmeans_centroids,
        )

        empty = spark.createDataFrame(
            [], "vec_id long, embedding array<double>"
        )
        with _pytest.raises(ValueError, match="empty"):
            _kmeans_centroids(empty, "vec_id", "embedding", 2, 5, 16, 0)


class TestUnimaxAllocation:
    def _fixture(self, spark):
        rows = (
            [(f"a{i}", "a", 10) for i in range(10)]
            + [(f"b{i}", "b", 40) for i in range(10)]
            + [(f"c{i}", "c", 150) for i in range(10)]
        )
        return spark.createDataFrame(rows, "doc_id string, lang string, toks long")

    def test_water_filling_hand_example(self, spark):
        """a=100, b=400, c=1500 tokens; B=1200, cap 2: a caps at 200,
        b and c split the remaining 1000 evenly (500 each)."""
        from mistral_ocr_pipeline_spark.operators.sampling import unimax_allocation

        df = self._fixture(spark)
        got = {
            r.lang: r
            for r in unimax_allocation(df, "lang", "toks", 1200, 2).collect()
        }
        assert got["a"].capped and not got["b"].capped and not got["c"].capped
        assert got["a"].budget_tokens_micro == 200 * 1_000_000
        assert got["a"].rate_micro == 2_000_000
        assert got["b"].budget_tokens_micro == 500 * 1_000_000
        assert got["b"].rate_micro == 1_250_000
        assert got["c"].rate_micro == 333_333
        # conservation: budgets sum to B (micro-rounding slack < 1 token)
        total = sum(r.budget_tokens_micro for r in got.values())
        assert abs(total - 1200 * 1_000_000) < 1_000_000

    def test_all_capped_when_budget_exceeds_cap_total(self, spark):
        from mistral_ocr_pipeline_spark.operators.sampling import unimax_allocation

        df = self._fixture(spark)
        rows = unimax_allocation(df, "lang", "toks", 100_000, 2).collect()
        assert all(r.capped for r in rows)
        assert all(r.rate_micro == 2_000_000 for r in rows)

    def test_none_capped_small_budget(self, spark):
        from mistral_ocr_pipeline_spark.operators.sampling import unimax_allocation

        df = self._fixture(spark)
        rows = unimax_allocation(df, "lang", "toks", 300, 5).collect()
        assert not any(r.capped for r in rows)
        # equal split: every language gets B/L = 100 tokens
        assert all(r.budget_tokens_micro == 100 * 1_000_000 for r in rows)

    def test_mix_counts_bounded_by_epochs(self, spark):
        from mistral_ocr_pipeline_spark.operators.sampling import unimax_mix

        df = self._fixture(spark)
        out = unimax_mix(df, "doc_id", "lang", "toks", 1200, 2)
        counts = {
            r.lang: r.n
            for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
        }
        # a: exactly 2 epochs of 10 docs; b: rate 1.25 -> between 10 and 20
        assert counts["a"] == 20
        assert 10 <= counts["b"] <= 20
        assert 0 <= counts.get("c", 0) <= 10

    def test_rejects_fractional_epochs(self, spark):
        from mistral_ocr_pipeline_spark.operators.sampling import unimax_allocation

        with pytest.raises(ValueError, match="max_epochs"):
            unimax_allocation(self._fixture(spark), "lang", "toks", 100, 1.5)


class TestTemperatureAllocation:
    def test_alpha_one_is_proportional(self, spark):
        from mistral_ocr_pipeline_spark.operators.sampling import (
            temperature_allocation,
        )

        df = spark.createDataFrame(
            [("x", "a", 100), ("y", "b", 300)], "id string, lang string, t long"
        )
        got = {
            r.lang: r
            for r in temperature_allocation(df, "lang", "t", 1000, 1.0).collect()
        }
        assert got["a"].share_micro == 250_000
        assert got["b"].share_micro == 750_000

    def test_alpha_half_flattens_toward_uniform(self, spark):
        from mistral_ocr_pipeline_spark.operators.sampling import (
            temperature_allocation,
        )

        df = spark.createDataFrame(
            [("x", "a", 100), ("y", "b", 10000)], "id string, lang string, t long"
        )
        got = {
            r.lang: r
            for r in temperature_allocation(df, "lang", "t", 1000, 0.5).collect()
        }
        # proportional share for a would be ~9900; sqrt gives 10/110 ≈ 9.09%
        assert got["a"].share_micro > 9_900 * 2
        assert got["a"].share_micro + got["b"].share_micro in (999_999, 1_000_000, 1_000_001)
        # low-resource language is upsampled in epochs, high-resource down
        assert got["a"].epochs_micro > got["b"].epochs_micro

    def test_rejects_non_dyadic_alpha(self, spark):
        from mistral_ocr_pipeline_spark.operators.sampling import (
            temperature_allocation,
        )

        df = spark.createDataFrame([("x", "a", 10)], "id string, lang string, t long")
        with pytest.raises(ValueError, match="alpha"):
            temperature_allocation(df, "lang", "t", 100, 0.3)


class TestParagraphDedup:
    def test_keep_first_and_reassembly(self, spark):
        from mistral_ocr_pipeline_spark.operators.dedup import paragraph_dedup

        df = spark.createDataFrame(
            [
                (1, "SHARED LICENSE PARAGRAPH HERE\n\nunique one alpha beta"),
                (2, "unique two gamma delta epsi\n\nSHARED LICENSE PARAGRAPH HERE"),
                (3, "SHARED LICENSE PARAGRAPH HERE\n\nshort"),
            ],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: r
            for r in paragraph_dedup(df, "doc_id", "text").collect()
        }
        # canonical occurrence is (1, 0); later ones drop
        assert got[1].text_clean.startswith("SHARED LICENSE")
        assert got[1].n_removed == 0
        assert "SHARED" not in got[2].text_clean
        assert got[2].n_removed == 1
        # 'short' (< 16 chars) is never deduped
        assert got[3].text_clean == "short"

    def test_within_doc_duplicate_by_pos(self, spark):
        from mistral_ocr_pipeline_spark.operators.dedup import paragraph_dedup

        df = spark.createDataFrame(
            [(7, "same paragraph repeated twice\n\nsame paragraph repeated twice")],
            "doc_id long, text string",
        )
        row = paragraph_dedup(df, "doc_id", "text").first()
        assert row.n_kept == 1 and row.n_removed == 1
        assert row.text_clean == "same paragraph repeated twice"

    def test_all_dropped_yields_empty_string(self, spark):
        from mistral_ocr_pipeline_spark.operators.dedup import paragraph_dedup

        df = spark.createDataFrame(
            [(1, "only unique paragraph content"), (2, "only unique paragraph content")],
            "doc_id long, text string",
        )
        got = {r.doc_id: r for r in paragraph_dedup(df, "doc_id", "text").collect()}
        assert got[2].text_clean == "" and got[2].n_removed == 1


class TestPerplexityBuckets:
    def test_tercile_assignment_per_group(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            perplexity_buckets,
        )

        rows = [(i, "a", float(i)) for i in range(9)] + [
            (100 + i, "b", float(-i)) for i in range(3)
        ]
        df = spark.createDataFrame(rows, "doc_id long, lang string, surprisal double")
        got = {
            r.doc_id: r.bucket
            for r in perplexity_buckets(df, "doc_id", "surprisal", "lang").collect()
        }
        # lang a: 0-2 head, 3-5 middle, 6-8 tail (lowest surprisal = head)
        assert [got[i] for i in range(9)] == (
            ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
        )
        # lang b gets its own terciles: -2 is its head
        assert got[102] == "head" and got[100] == "tail"

    def test_label_arity_checked(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            perplexity_buckets,
        )

        df = spark.createDataFrame([(1, "a", 0.0)], "doc_id long, lang string, s double")
        with pytest.raises(ValueError, match="labels"):
            perplexity_buckets(df, "doc_id", "s", "lang", n_buckets=4)


class TestKmeansReplayHelpers:
    """The numpy kernels backing the trained-IVF SQL replay: `_micro_away`
    must agree with the scalar `_micro` on every boundary, and
    `_seq_fold_dot` must be the left-to-right fold (not pairwise)."""

    def test_micro_away_matches_scalar_micro(self):
        import numpy as np

        from mistral_ocr_pipeline_spark.operators.similarity import (
            _micro,
            _micro_away,
        )

        xs = [0.0, 0.5e-6, -0.5e-6, 1.5e-6, -1.5e-6, 0.1234565,
              -0.1234565, 0.9999995, -0.9999995, 1.0, -1.0, 0.3333333]
        got = _micro_away(np.array(xs, dtype=np.float64))
        assert [int(v) for v in got] == [_micro(x) for x in xs]

    def test_seq_fold_dot_is_sequential(self):
        import numpy as np

        from mistral_ocr_pipeline_spark.operators.similarity import (
            _seq_fold_dot,
        )

        rng = np.random.RandomState(3)
        a, b = rng.standard_normal((5, 64)), rng.standard_normal((3, 64))
        got = _seq_fold_dot(a, b)
        for i in range(5):
            for j in range(3):
                acc = 0.0
                for d in range(64):
                    acc += a[i, d] * b[j, d]
                assert got[i, j] == acc  # bitwise, not approx

    def test_trained_centroids_are_unit_and_layout_invariant(self, spark):
        import numpy as np

        from mistral_ocr_pipeline_spark.operators.similarity import (
            _kmeans_centroids,
        )

        rng = np.random.RandomState(5)
        rows = [(i, [float(x) for x in rng.standard_normal(16)])
                for i in range(120)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        c1 = _kmeans_centroids(df, "vec_id", "embedding", 4, 3, 100, 0)
        c2 = _kmeans_centroids(
            df.repartition(7), "vec_id", "embedding", 4, 3, 100, 0
        )
        assert np.array_equal(c1, c2)  # bitwise across layouts
        assert np.allclose(np.linalg.norm(c1, axis=1), 1.0, atol=1e-9)


class TestReviewRegressionFixes:
    """Pins for the late-r4 structured-review findings."""

    def test_paragraph_dedup_preserves_null_text_doc(self, spark):
        from mistral_ocr_pipeline_spark.operators.dedup import paragraph_dedup

        df = spark.createDataFrame(
            [(1, "real paragraph content here"), (2, None)],
            "doc_id long, text string",
        )
        got = {r.doc_id: r for r in paragraph_dedup(df, "doc_id", "text").collect()}
        assert 2 in got                      # the doc did not vanish
        assert got[2].text_clean == ""
        assert got[2].n_removed == 0

    def test_paragraph_dedup_literal_separator_with_regex_metachar(self, spark):
        from mistral_ocr_pipeline_spark.operators.dedup import paragraph_dedup

        df = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsi|unique second block here")],
            "doc_id long, text string",
        )
        row = paragraph_dedup(df, "doc_id", "text", sep="|").first()
        # '|' as a regex would split every character; as a literal it
        # yields exactly the two blocks and rejoins them verbatim
        assert row.n_kept == 2
        assert row.text_clean == "alpha beta gamma delta epsi|unique second block here"

    def test_ivf_empty_corpus_trained_path_returns_empty(self, spark):
        from mistral_ocr_pipeline_spark.operators.similarity import ivf_topk

        empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
        queries = spark.createDataFrame(
            [(1, [1.0, 0.0])], "vec_id long, embedding array<double>"
        )
        out = ivf_topk(empty, queries, k=3, n_centroids=2)
        assert out.count() == 0


class TestPerplexityThresholds:
    def test_frozen_thresholds_bucket_scan_side(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            apply_perplexity_thresholds,
            perplexity_thresholds,
        )

        build = spark.createDataFrame(
            [(i, "a", float(i)) for i in range(9)],
            "doc_id long, lang string, surprisal double",
        )
        th = perplexity_thresholds(build)
        bounds = th.first().bounds
        assert len(bounds) == 2  # terciles → two boundaries
        # new documents bucket against the FROZEN bounds, no window
        incoming = spark.createDataFrame(
            [(100, "a", -5.0), (101, "a", 4.5), (102, "a", 99.0),
             (103, "zz", 1.0)],  # unseen language
            "doc_id long, lang string, surprisal double",
        )
        got = {
            r.doc_id: r.bucket
            for r in apply_perplexity_thresholds(incoming, th).collect()
        }
        assert got[100] == "head" and got[101] == "middle" and got[102] == "tail"
        assert got[103] is None  # unseen group surfaces, not mislabeled

    def test_plan_is_broadcast_no_corpus_shuffle(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            apply_perplexity_thresholds,
            perplexity_thresholds,
        )

        build = spark.createDataFrame(
            [(i, "a", float(i)) for i in range(9)],
            "doc_id long, lang string, surprisal double",
        )
        out = apply_perplexity_thresholds(build, perplexity_thresholds(build))
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
        assert "hashpartitioning(doc_id" not in plan


class TestMediaNearDup:
    def _media(self, spark):
        from mistral_ocr_pipeline_spark.operators.multimodal import (
            documents_as_media,
        )

        # gram-RICH payload: locality means a 1-byte edit to a payload
        # with many distinct grams flips ~0 majority bits (measured 0
        # here).  A short/repetitive payload has few distinct grams, so
        # one extra gram can flip >3 near-tied bits and fall outside the
        # 4-band pigeonhole guarantee — small-edit-to-LARGE-payload is
        # the contract, same as real pHash.
        base = " ".join(f"w{i}token{i}variant" for i in range(40))
        docs = spark.createDataFrame(
            [
                (1, base),
                (2, base + "~"),
                (3, "entirely different payload with no shared content " * 4),
                (4, "abc"),  # shorter than one gram
            ],
            "doc_id long, text string",
        )
        return documents_as_media(docs)

    def test_locality_and_short_payload_drop(self, spark):
        from mistral_ocr_pipeline_spark.operators.multimodal import (
            media_fingerprint,
            media_neardup_pairs,
        )

        fps = {
            r.media_id: r.fp
            for r in media_fingerprint(
                self._media(spark), deterministic_fake=True
            ).collect()
        }
        assert 4 not in fps  # no grams → dropped, not zero-fingerprinted
        near = bin(fps[1] ^ fps[2]).count("1")
        far = bin(fps[1] ^ fps[3]).count("1")
        # locality: the 1-byte edit stays inside the 4-band pigeonhole
        # radius; unrelated content sits far outside it
        assert near <= 3 < far, (near, far)
        pairs = media_neardup_pairs(
            self._media(spark), deterministic_fake=True
        ).collect()
        assert {(r.id_a, r.id_b) for r in pairs} == {(1, 2)}

    def test_real_kernel_is_honestly_stubbed(self, spark):
        from py4j.protocol import Py4JJavaError

        from mistral_ocr_pipeline_spark.operators.multimodal import (
            media_fingerprint,
        )

        from pyspark.errors import PythonException

        with pytest.raises((PythonException, Py4JJavaError)):
            media_fingerprint(self._media(spark), deterministic_fake=False).count()


def _unimax_model(stats, budget, e):
    """Pure-Python water-filling reference (exact integer frontier) for
    the property tests: stats = {lang: n_tokens}."""
    order = sorted(stats.items(), key=lambda kv: (kv[1], kv[0]))
    L, k, cap_tokens = len(order), 0, 0
    capped = {}
    hit_uncapped = False
    for r, (lang, n) in enumerate(order, start=1):
        # the TRUE greedy's capped set is a PREFIX: once a language is
        # uncapped, the fair share freezes and no larger language can
        # re-enter the cap (e·n only grows while the share stays put)
        if not hit_uncapped and e * n * (L - r + 1) <= budget - e * cap_tokens:
            capped[lang] = True
            cap_tokens += n
            k += 1
        else:
            hit_uncapped = True
            capped[lang] = False
    share = (
        (budget - e * cap_tokens) / (L - k) if k < L else 0.0
    )
    out = {}
    for lang, n in stats.items():
        if capped[lang]:
            out[lang] = (True, e * n * 1_000_000, e * 1_000_000)
        else:
            out[lang] = (
                False,
                round(share * 1_000_000.0),
                round(share / n * 1_000_000.0),
            )
    return out


class TestUnimaxProperties:
    @pytest.mark.parametrize("seed", [0, 1, 2, 3, 4, 5])
    def test_matches_python_model_and_invariants(self, spark, seed):
        import random

        from mistral_ocr_pipeline_spark.operators.sampling import unimax_allocation

        rng = random.Random(seed)
        langs = [f"l{i}" for i in range(rng.randint(2, 7))]
        rows = []
        stats = {}
        for li, lang in enumerate(langs):
            n_docs = rng.randint(1, 6)
            for d in range(n_docs):
                tok = rng.randint(1, 500)
                stats[lang] = stats.get(lang, 0) + tok
                rows.append((f"{lang}-{d}", lang, tok))
        total = sum(stats.values())
        budget = rng.randint(total // 2, 3 * total)
        e = rng.randint(1, 4)
        df = spark.createDataFrame(rows, "doc_id string, lang string, toks long")
        got = {
            r.lang: r
            for r in unimax_allocation(df, "lang", "toks", budget, e).collect()
        }
        model = _unimax_model(stats, budget, e)
        for lang, (m_capped, m_budget, m_rate) in model.items():
            r = got[lang]
            assert r.capped == m_capped, (seed, lang)
            assert abs(r.budget_tokens_micro - m_budget) <= 1, (seed, lang)
            assert abs(r.rate_micro - m_rate) <= 1, (seed, lang)
            # a language never exceeds the epoch cap
            assert r.rate_micro <= e * 1_000_000 + 1
        # conservation: capped get e·n exactly; uncapped split the rest,
        # so totals reconstruct the budget unless everything capped
        tot_micro = sum(r.budget_tokens_micro for r in got.values())
        if all(r.capped for r in got.values()):
            assert tot_micro == e * total * 1_000_000
            assert e * total <= budget
        else:
            assert abs(tot_micro - budget * 1_000_000) <= len(langs) * 1_000_000


class TestParagraphDedupProperties:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_unique_corpus_roundtrips_and_dups_kept_once(self, spark, seed):
        import random

        from mistral_ocr_pipeline_spark.operators.dedup import paragraph_dedup

        rng = random.Random(seed)
        shared = [
            f"shared paragraph variant number {i} with stable words"
            for i in range(4)
        ]
        docs = []
        for d in range(12):
            paras = [f"unique paragraph of doc {d} index {j} filler words"
                     for j in range(rng.randint(1, 3))]
            for s in shared:
                if rng.random() < 0.5:
                    paras.insert(rng.randrange(len(paras) + 1), s)
            docs.append((d, "\n\n".join(paras)))
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {r.doc_id: r for r in paragraph_dedup(df, "doc_id", "text").collect()}
        # every doc survives; each distinct eligible paragraph appears
        # exactly once across the whole reconstructed corpus
        assert set(got) == {d for d, _ in docs}
        seen: dict[str, int] = {}
        for d, _ in docs:
            for para in got[d].text_clean.split("\n\n"):
                if para.strip():
                    seen[para.strip()] = seen.get(para.strip(), 0) + 1
        assert all(v == 1 for v in seen.values()), seen
        # kept paragraphs are an ordered subsequence of the original
        for d, text in docs:
            orig = text.split("\n\n")
            kept = [p for p in got[d].text_clean.split("\n\n") if p != ""]
            it = iter(orig)
            assert all(any(p == o for o in it) for p in kept), d
        # a corpus with NO duplicates round-trips byte-identically
        uniq = spark.createDataFrame(
            [(100, "alpha beta gamma delta epsilon\n\nzeta eta theta iota kappa")],
            "doc_id long, text string",
        )
        row = paragraph_dedup(uniq, "doc_id", "text").first()
        assert row.text_clean == "alpha beta gamma delta epsilon\n\nzeta eta theta iota kappa"
        assert row.n_removed == 0


class TestSecondReviewFixes:
    def test_unimax_mix_null_lang_not_dropped(self, spark):
        """The allocation groups NULL-language docs and budgets them, so
        the stream must deliver them too (null-safe plan join)."""
        from mistral_ocr_pipeline_spark.operators.sampling import (
            unimax_allocation,
            unimax_mix,
        )

        rows = [("a1", "a", 50), ("a2", "a", 50), ("n1", None, 50), ("n2", None, 50)]
        df = spark.createDataFrame(rows, "doc_id string, lang string, toks long")
        alloc = {r.lang: r for r in unimax_allocation(df, "lang", "toks", 400, 2).collect()}
        assert None in alloc and alloc[None].budget_tokens_micro > 0
        out = unimax_mix(df, "doc_id", "lang", "toks", 400, 2)
        got = {r.doc_id for r in out.collect()}
        assert {"n1", "n2"} <= got  # NULL-lang docs are in the stream

    def test_unimax_mix_accepts_precomputed_allocation(self, spark):
        from mistral_ocr_pipeline_spark.operators.sampling import (
            unimax_allocation,
            unimax_mix,
        )

        df = spark.createDataFrame(
            [("x1", "x", 10), ("y1", "y", 90)], "doc_id string, lang string, toks long"
        )
        alloc = unimax_allocation(df, "lang", "toks", 150, 3)
        a = sorted(map(tuple, unimax_mix(df, "doc_id", "lang", "toks", 150, 3).collect()))
        b = sorted(map(tuple, unimax_mix(
            df, "doc_id", "lang", "toks", 150, 3, allocation=alloc
        ).collect()))
        assert a == b

    def test_fingerprint_pairs_rejects_radius_beyond_banding(self, spark):
        from mistral_ocr_pipeline_spark.operators.dedup import fingerprint_pairs

        fps = spark.createDataFrame([(1, 7), (2, 7)], "id long, fp long")
        with pytest.raises(ValueError, match="pigeonhole"):
            fingerprint_pairs(fps, max_hamming=4)

    def test_threshold_label_arity_mismatch_raises(self, spark):
        from py4j.protocol import Py4JJavaError

        from pyspark.errors import PythonException, SparkRuntimeException

        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            apply_perplexity_thresholds,
            perplexity_thresholds,
        )

        build = spark.createDataFrame(
            [(i, "a", float(i)) for i in range(8)],
            "doc_id long, lang string, surprisal double",
        )
        th4 = perplexity_thresholds(build, n_buckets=4)  # 3 bounds
        out = apply_perplexity_thresholds(build, th4)    # 3 labels: mismatch
        with pytest.raises((SparkRuntimeException, PythonException, Py4JJavaError)):
            out.collect()

    def test_pii_scrub_keep_cols_single_projection(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import pii_scrub

        df = spark.createDataFrame(
            [(1, "mail me a@b.co", "en"), (2, "plain", "de")],
            "doc_id long, text string, lang string",
        )
        out = pii_scrub(df, "doc_id", "text", keep_cols=["lang"])
        got = {r.id: r.lang for r in out.collect()}
        assert got == {1: "en", 2: "de"}
        assert "Join" not in out._jdf.queryExecution().executedPlan().toString()

    def test_wider_radius_via_more_bands(self, spark):
        """radius 7 works by banding 8×8-bit (pigeonhole radius 7), the
        alternative the radius guard points to."""
        from mistral_ocr_pipeline_spark.operators.dedup import fingerprint_pairs

        fp_b = sum(1 << (8 * i) for i in range(7))  # 7 bits, 7 bands
        fps = spark.createDataFrame(
            [(1, 0), (2, fp_b), (3, -1)], "id long, fp long"
        )
        got = {
            (r.id_a, r.id_b): r.hamming
            for r in fingerprint_pairs(fps, max_hamming=7, n_bands=8).collect()
        }
        assert got == {(1, 2): 7}
        with pytest.raises(ValueError, match="divide 64"):
            fingerprint_pairs(fps, max_hamming=2, n_bands=5)


class TestTemperatureProperties:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_python_model(self, spark, seed):
        """Seeded random corpora vs a pure-Python model of the
        temperature allocation (micro-rounded sqrt, order-free integer
        normalizer) — shares sum to 1, alpha monotonicity."""
        import math
        import random

        from mistral_ocr_pipeline_spark.operators.sampling import (
            temperature_allocation,
        )

        rng = random.Random(seed)
        stats = {f"l{i}": rng.randint(1, 100000) for i in range(rng.randint(2, 6))}
        rows = [(f"{k}-0", k, v) for k, v in stats.items()]
        df = spark.createDataFrame(rows, "id string, lang string, t long")
        got = {
            r.lang: r
            for r in temperature_allocation(df, "lang", "t", 10_000, 0.5).collect()
        }

        def away(y):
            return int(math.floor(y + 0.5)) if y >= 0 else int(math.ceil(y - 0.5))

        scaled = {k: away(math.sqrt(float(v)) * 1e6) for k, v in stats.items()}
        total = sum(scaled.values())
        for k, v in stats.items():
            share = scaled[k] / total
            assert got[k].scaled_micro == scaled[k]
            assert abs(got[k].share_micro - away(share * 1e6)) <= 1
            assert abs(got[k].budget_tokens - away(10_000.0 * share)) <= 1
        assert abs(sum(r.share_micro for r in got.values()) - 1_000_000) <= len(stats)
        # flattening: the smallest language's share under alpha=0.5
        # strictly exceeds its proportional (alpha=1) share
        small = min(stats, key=lambda k: (stats[k], k))
        prop = {
            r.lang: r.share_micro
            for r in temperature_allocation(df, "lang", "t", 10_000, 1.0).collect()
        }
        if len(set(stats.values())) > 1:
            assert got[small].share_micro > prop[small]


class TestSubstringDedup:
    """Lee-et-al exact-substring removal (`dedup.substring_dedup`):
    span cut + word-level reassembly semantics."""

    def _run(self, spark, rows, k=4):
        from mistral_ocr_pipeline_spark.operators.dedup import substring_dedup

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {
            r.doc_id: r
            for r in substring_dedup(df, "doc_id", "text", span_words=k).collect()
        }

    def test_copied_region_cut_from_noncanonical_only(self, spark):
        span = "alpha beta gamma delta epsilon zeta"  # 6 words > k=4
        got = self._run(
            spark,
            [
                (1, f"intro one two {span} outro"),
                (2, f"other words here {span} tail piece"),
            ],
        )
        # doc 1 is canonical (lowest id): survives verbatim
        assert got[1].text_clean == f"intro one two {span} outro"
        assert got[1].n_removed == 0
        # doc 2 loses exactly the 6 copied words
        assert got[2].text_clean == "other words here tail piece"
        assert got[2].n_removed == 6

    def test_intra_doc_repeat_keeps_first(self, spark):
        span = "w1 w2 w3 w4"
        got = self._run(spark, [(1, f"{span} middle bit {span}")])
        assert got[1].text_clean == f"{span} middle bit"
        assert got[1].n_removed == 4

    def test_short_null_and_unique_docs_survive(self, spark):
        got = self._run(
            spark,
            [
                (1, "a b c"),                      # shorter than k
                (2, None),                          # NULL text
                (3, "all unique words in here ok"), # no duplicated gram
            ],
        )
        assert got[1].text_clean == "a b c" and got[1].n_removed == 0
        assert got[2].text_clean == "" and got[2].n_kept == 0
        assert got[3].n_removed == 0

    def test_whitespace_normalizing_rebuild(self, spark):
        got = self._run(spark, [(1, "  a\n b\tc   d ")])
        assert got[1].text_clean == "a b c d"
        assert got[1].n_kept == 4


class TestApplyVerdicts:
    """post_processing.py:155-202 write-back semantics: ordered rebuild,
    all-unsupported -> NULL, misalignment guards, scalar variant."""

    def _run(self, spark, rows, verdicts):
        from mistral_ocr_pipeline_spark.operators.verdicts import apply_verdicts

        r = spark.createDataFrame(
            rows, "doc_id long, values array<string>, sentences array<string>"
        )
        v = spark.createDataFrame(
            verdicts, "doc_id long, pos int, supported boolean"
        )
        return {x.doc_id: x for x in apply_verdicts(r, v).collect()}

    def test_ordered_filter_and_reassembly(self, spark):
        got = self._run(
            spark,
            [(1, ["a", "b", "c"], ["SA", "SB", "SC"])],
            [(1, 2, True), (1, 0, True), (1, 1, False)],  # shuffled input order
        )
        assert got[1].values_clean == ["a", "c"]  # order preserved
        assert got[1].sentences == ["SA", "SB", "SC"]  # kept unchanged
        assert got[1].verdicts_aligned

    def test_all_unsupported_becomes_null(self, spark):
        got = self._run(
            spark,
            [(1, ["a", "b"], ["x", "y"])],
            [(1, 0, False), (1, 1, None)],  # NULL verdict element = falsy
        )
        assert got[1].values_clean is None
        assert got[1].verdicts_aligned

    def test_misaligned_rows_unchanged(self, spark):
        got = self._run(
            spark,
            [
                (1, ["a", "b"], ["x", "y"]),  # missing verdict for pos 1
                (2, ["c", "d"], ["z", "w"]),  # extra verdict at pos 9
                (3, ["e"], ["q"]),            # aligned control
            ],
            [
                (1, 0, False),
                (2, 0, False), (2, 1, False), (2, 9, True),
                (3, 0, False),
            ],
        )
        assert got[1].values_clean == ["a", "b"] and not got[1].verdicts_aligned
        assert got[2].values_clean == ["c", "d"] and not got[2].verdicts_aligned
        assert got[3].values_clean is None and got[3].verdicts_aligned

    def test_scalar_variant(self, spark):
        from mistral_ocr_pipeline_spark.operators.verdicts import (
            apply_verdict_scalar,
        )

        r = spark.createDataFrame(
            [(1, "keep", "s1"), (2, "drop", "s2"), (3, "noverdict", "s3")],
            "doc_id long, value string, sentence string",
        )
        v = spark.createDataFrame(
            [(1, True), (2, False)], "doc_id long, supported boolean"
        )
        got = {x.doc_id: x for x in apply_verdict_scalar(r, v).collect()}
        assert got[1].value == "keep"
        assert got[2].value is None          # unsupported -> nulled
        assert got[2].sentence == "s2"       # sentence kept
        assert got[3].value == "noverdict"   # missing verdict -> unchanged


class TestTrainedBPE:
    """Real-BPE basis (`operators/bpe`): the trained merge table and the
    Arrow apply kernel, value-pinned against an INDEPENDENT reference
    implementation (training re-derived with a different pair-scan
    structure; application via sequential in-rank-order replacement,
    which is provably equivalent to the kernel's lowest-rank-first loop
    — a pair involving a merged symbol always ranks later than the
    merge that created it)."""

    @staticmethod
    def _ref_train(words_with_freq, n_merges):
        # independent training: pair counts rebuilt from scratch via
        # zip() each round, ties broken max-count-then-lexicographic
        seqs = {w: tuple(w) + ("</w>",) for w in words_with_freq}
        merges = []
        for _ in range(n_merges):
            counts = {}
            for w, f in words_with_freq.items():
                s = seqs[w]
                for pair in zip(s, s[1:]):
                    counts[pair] = counts.get(pair, 0) + f
            if not counts:
                break
            best = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0][0]
            merges.append(best)
            new = {}
            for w, s in seqs.items():
                out, skip = [], False
                for i, sym in enumerate(s):
                    if skip:
                        skip = False
                        continue
                    if i + 1 < len(s) and (sym, s[i + 1]) == best:
                        out.append(sym + s[i + 1])
                        skip = True
                    else:
                        out.append(sym)
                new[w] = tuple(out)
            seqs = new
        return merges

    @staticmethod
    def _ref_count(text, merges):
        # independent application: merges applied sequentially in rank
        # order (NOT the kernel's lowest-rank-present loop)
        if not text:
            return 0
        total = 0
        for w in text.split():
            syms = list(w) + ["</w>"]
            for a, b in merges:
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            total += len(syms)
        return total

    def test_training_matches_reference(self, spark):
        from mistral_ocr_pipeline_spark.operators.bpe import bpe_train

        rows = [
            (1, "low low low low low lower lower newest newest"),
            (2, "newest newest newest newest wider wider wider new new"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = bpe_train(df, "text", "doc_id", n_merges=12, sample_size=10)
        freq = {}
        for _, t in rows:
            for w in t.split():
                freq[w] = freq.get(w, 0) + 1
        assert got == self._ref_train(freq, 12)

    def test_kernel_counts_match_reference_on_fixture(self, spark):
        from mistral_ocr_pipeline_spark.operators.bpe import (
            bpe_token_count_trained,
            bpe_train,
        )
        from pyspark.sql import functions as F

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        merges = bpe_train(docs, "text", "doc_id", n_merges=80, sample_size=256)
        got = {
            r.doc_id: r.n
            for r in docs.select(
                "doc_id", bpe_token_count_trained(merges)(F.col("text")).alias("n")
            ).collect()
        }
        ref = {
            r.doc_id: self._ref_count(r.text, merges)
            for r in docs.select("doc_id", "text").collect()
        }
        assert got == ref
        assert sum(got.values()) > 0

    def test_more_merges_never_increase_counts(self, spark):
        from mistral_ocr_pipeline_spark.operators.bpe import (
            bpe_token_count_trained,
            bpe_train,
        )
        from pyspark.sql import functions as F

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
        m_small = bpe_train(docs, "text", "doc_id", n_merges=20, sample_size=64)
        m_big = bpe_train(docs, "text", "doc_id", n_merges=120, sample_size=64)
        assert m_big[: len(m_small)] == m_small  # training is prefix-stable
        a = docs.select(
            "doc_id", bpe_token_count_trained(m_small)(F.col("text")).alias("n")
        ).collect()
        b = {
            r.doc_id: r.n
            for r in docs.select(
                "doc_id", bpe_token_count_trained(m_big)(F.col("text")).alias("n")
            ).collect()
        }
        for r in a:
            assert b[r.doc_id] <= r.n

    def test_null_and_empty_text(self, spark):
        from mistral_ocr_pipeline_spark.operators.bpe import (
            bpe_token_count_trained,
        )
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [(1, None), (2, ""), (3, "  "), (4, "ab")],
            "doc_id long, text string",
        )
        got = {
            r.doc_id: r.n
            for r in df.select(
                "doc_id", bpe_token_count_trained([])(F.col("text")).alias("n")
            ).collect()
        }
        # no merges: every char + </w> is a token
        assert got == {1: 0, 2: 0, 3: 0, 4: 3}


class TestGopherFullBattery:
    """Every verdict branch of the FULL Gopher rule battery (Rae et al.
    2021 Table A1), pinned with one crafted doc per rule and first-fail
    ordering verified."""

    STOP = "the and of to in is that it was for"

    def _verdicts(self, spark, rows, **kw):
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            quality_funnel,
        )

        df = spark.createDataFrame(rows, "doc_id long, text string")
        args = dict(min_tokens=10, max_tokens=200, word_len_bounds=(3.0, 10.0))
        args.update(kw)
        return {
            r.id: r.verdict for r in quality_funnel(df, **args).collect()
        }

    def test_every_branch_fires(self, spark):
        filler = lambda n, p="tok": " ".join(f"{p}{i:03d}" for i in range(n))
        s = self.STOP
        rows = [
            (1, "tiny doc"),
            (2, filler(300)),
            (3, " ".join(f"{chr(97+i%26)}{chr(97+(i//26)%26)}" for i in range(60))),
            (4, ("w!!! " * 40) + s),
            (5, "\n".join(f"- bullet item {i:03d}" for i in range(30)) + "\n" + s),
            (6, "\n".join(
                f"line {i:03d} ends here..." if i % 2 == 0
                else f"plain {i:03d} line okay" for i in range(30)) + "\n" + s),
            (7, " ".join(f"{i:04d}" for i in range(1000, 1040)) + " " + s),
            (8, filler(40, "zq")),
            (9, "\n".join(["same line here okay"] * 20
                          + [f"uniq {i:03d} line okay" for i in range(10)])
                + "\n" + s),
            (10, "\n".join(["long repeated line " + filler(30, "LL")] * 2
                           + [f"u{i:02d}" for i in range(18)]) + "\n" + s),
            (11, s + " " + filler(30) + " spam ham " * 40),
            (12, s + " " + filler(20, "aa") + " " + filler(8, "dup") + " "
                 + filler(20, "bb") + " " + filler(8, "dup")),
            (13, s + " " + filler(40, "good")),
        ]
        got = self._verdicts(spark, rows)
        assert got == {
            1: "too_short", 2: "too_long", 3: "word_len", 4: "symbol_heavy",
            5: "bullet_lines", 6: "ellipsis_lines", 7: "low_alpha",
            8: "low_stopword", 9: "dup_lines", 10: "dup_line_chars",
            11: "top_ngram", 12: "dup_ngram", 13: "keep",
        }

    def test_paragraph_branches_with_loosened_line_rules(self, spark):
        """A duplicated paragraph necessarily duplicates its lines, so
        the paragraph rules attribute only when line thresholds are
        looser (documented funnel-order contract)."""
        s = self.STOP
        filler = lambda n, p: " ".join(f"{p}{i:03d}" for i in range(n))
        p_short = "alpha paragraph here okay " + s
        long_p = "repeated block " + filler(30, "PP") + " " + s
        rows = [
            (1, f"{p_short}\n\n{p_short}\n\nunique tail paragraph okay {s}"),
            (2, "\n\n".join([long_p] * 2 + [f"uniq {i:02d} {s}" for i in range(8)])),
        ]
        got = self._verdicts(
            spark, rows,
            max_dup_line_frac=0.6, max_dup_line_char_frac=0.6,
        )
        assert got == {1: "dup_paragraphs", 2: "dup_para_chars"}

    def test_top_gram_tie_breaks_deterministically(self, spark):
        """Two grams with equal top count: the lexicographically
        smallest wins (sorted-fold first max == the oracle's row_number
        ORDER BY cnt DESC, gram) — pinned via a doc where the tie
        decides the verdict (long gram fails, short gram passes)."""
        from pyspark.sql import functions as F
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            _top_gram_chars, _nonempty_words,
        )

        # 'aa bb' and 'zzzzzz yyyyyy' both occur twice; tie -> 'aa bb'
        text = "aa bb c1 aa bb c2 zzzzzz yyyyyy c3 zzzzzz yyyyyy"
        df = spark.createDataFrame([(text,)], "t string")
        got = df.select(
            _top_gram_chars(_nonempty_words(F.col("t")), 2).alias("m")
        ).first().m
        assert got == 2 * len("aa bb")


class TestEditDistancePairs:
    """PassJoin edit-distance pairs (dedup.edit_distance_pairs):
    completeness vs brute force under substitutions, insertions, and
    deletions (chunk-shifting cases), exact distances, the bucket cap,
    and short/identical-string edges (the driver query proves the same
    vs DuckDB's levenshtein at sf0.01)."""

    def test_complete_vs_brute_force(self, spark):
        from mistral_ocr_pipeline_spark.operators.dedup import (
            edit_distance_pairs,
        )

        def ed(a, b):  # tiny exact DP, fine at this size
            m, n = len(a), len(b)
            d = list(range(n + 1))
            for i in range(1, m + 1):
                prev, d[0] = d[0], i
                for j in range(1, n + 1):
                    prev, d[j] = d[j], min(
                        d[j] + 1, d[j - 1] + 1,
                        prev + (a[i - 1] != b[j - 1]),
                    )
            return d[n]

        base = "the quick brown fox jumps over the lazy dog"
        rows = [
            (0, base),
            (1, base.replace("quick", "quick")),          # identical -> 0
            (2, base[:10] + "x" + base[11:]),             # 1 substitution
            (3, base[:10] + base[11:]),                   # 1 deletion
            (4, base[:10] + "zz" + base[10:]),            # 2 insertions
            (5, base[:5] + base[8:]),                     # 3 deletions -> out
            (6, "completely different text body here"),
            (7, "ab"),                                    # short string
            (8, "ac"),                                    # ed=1 to 'ab'
        ]
        df = spark.createDataFrame(rows, "id long, text string")
        texts = dict(rows)
        expected = {
            (i, j): ed(texts[i], texts[j])
            for i in texts
            for j in texts
            if i < j and ed(texts[i], texts[j]) <= 2
        }
        got = {
            (r.id_a, r.id_b): r.edit_distance
            for r in edit_distance_pairs(df, "id", "text").collect()
        }
        assert got == expected
        assert got[(0, 1)] == 0 and got[(0, 3)] == 1 and got[(0, 4)] == 2
        assert (0, 5) not in got and (7, 8) in got

    def test_incremental_matches_oneshot_and_append_law(self, spark):
        """Index-served batch search == one-shot pairs restricted to
        batch×history, and append == rebuild on the chunk index."""
        from mistral_ocr_pipeline_spark.operators.dedup import (
            build_edit_index,
            edit_distance_incremental,
            edit_distance_pairs,
            edit_index_append,
        )

        base = "the quick brown fox jumps over the lazy dog"
        hist = spark.createDataFrame(
            [(0, base), (1, "completely different text body")],
            "id long, text string",
        )
        batch = spark.createDataFrame(
            [
                (10, base[:10] + base[11:]),   # deletion of char 10 -> ed 1
                (11, "no relation to anything at all"),
                (12, base[:7] + "xy" + base[9:]),  # 2 substitutions
            ],
            "id long, text string",
        )
        idx = build_edit_index(hist, "id", "text")
        inc = {
            (r.id_new, r.id_old): r.edit_distance
            for r in edit_distance_incremental(
                batch, hist, idx, "id", "text"
            ).collect()
        }
        oneshot = {
            (max(r.id_a, r.id_b), min(r.id_a, r.id_b)): r.edit_distance
            for r in edit_distance_pairs(
                hist.unionByName(batch), "id", "text"
            ).collect()
            if (r.id_a < 10) != (r.id_b < 10)  # batch-vs-history only
        }
        assert inc == oneshot
        assert inc[(10, 0)] == 1 and inc[(12, 0)] == 2
        assert not any(n == 11 for n, _ in inc)
        merged = edit_index_append(idx, batch, "id", "text")
        rebuilt = build_edit_index(hist.unionByName(batch), "id", "text")
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, rebuilt.collect())
        )

    def test_bucket_cap_surfaces(self, spark):
        from mistral_ocr_pipeline_spark.operators.dedup import (
            edit_distance_pairs,
        )

        # 12 identical docs, cap 4: pairs that survive must carry the flag
        df = spark.createDataFrame(
            [(i, "same exact text for everyone") for i in range(12)],
            "id long, text string",
        )
        out = edit_distance_pairs(df, "id", "text", max_bucket=4).collect()
        assert out and all(r.bucket_truncated for r in out)
        assert all(r.edit_distance == 0 for r in out)
    def test_batch_matches_oneshot_and_history_untouched(self, spark):
        """Incremental span removal for a batch == one-shot over
        history ∪ batch restricted to batch rows; history text is never
        read by the incremental path (only its digest index)."""
        from mistral_ocr_pipeline_spark.operators.dedup import (
            build_substring_index,
            substring_dedup,
            substring_dedup_incremental,
            substring_index_append,
        )

        span = "alpha beta gamma delta epsilon"
        hist_rows = [(1, f"h one two {span} tail")]
        batch_rows = [
            (10, f"b first words {span} end bit"),   # dups history -> cut
            (11, "fresh unique content here now ok"),
            (12, f"x y z {span} q r"),               # also dups -> cut
        ]
        hist = spark.createDataFrame(hist_rows, "doc_id long, text string")
        batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
        idx = build_substring_index(hist, "doc_id", "text", span_words=5)
        inc = {
            r.doc_id: (r.text_clean, r.n_removed)
            for r in substring_dedup_incremental(
                batch, idx, "doc_id", "text", span_words=5
            ).collect()
        }
        oneshot = {
            r.doc_id: (r.text_clean, r.n_removed)
            for r in substring_dedup(
                hist.unionByName(batch), "doc_id", "text", span_words=5
            ).collect()
            if r.doc_id >= 10
        }
        assert inc == oneshot
        assert inc[10] == ("b first words end bit", 5)
        assert inc[11][1] == 0
        # index append == rebuild over the union (lattice-merge exactness)
        merged = substring_index_append(idx, batch, "doc_id", "text", 5)
        rebuilt = build_substring_index(
            hist.unionByName(batch), "doc_id", "text", 5
        )
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, rebuilt.collect())
        )


class TestWinnowing:
    """Schleimer et al. 2003 winnowing — Spark selection vs a pure-Python
    reference model, the paper's guarantees, and the overlap join."""

    @staticmethod
    def _py_winnow(text: str, k: int = 8, w: int = 4):
        import hashlib
        import re

        t = re.sub(r"\s+", " ", re.sub(r"[^\w\s/\-]", "", text.lower())).strip()
        m = len(t) - k + 1
        if m < 1:
            return set()
        hs = [hashlib.md5(t[i : i + k].encode()).hexdigest() for i in range(m)]
        eff_w = min(w, m)
        out = set()
        for j in range(m - eff_w + 1):  # window hs[j .. j+eff_w-1]
            win = hs[j : j + eff_w]
            mn = min(win)
            pos = j + max(i for i, h in enumerate(win) if h == mn)
            out.add((pos + 1, hs[pos]))  # 1-based
        return out

    def _spark_winnow(self, spark, rows, k=8, w=4):
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            winnow_fingerprints,
        )

        df = spark.createDataFrame(rows, "id long, text string")
        got = winnow_fingerprints(df, "id", k=k, w=w).collect()
        by_id = {}
        for r in got:
            by_id.setdefault(r.id, set()).add((r.pos, r.fp))
        return by_id

    def test_matches_python_model(self, spark):
        rows = [
            (1, "The quick brown fox jumps over the lazy dog."),
            (2, "aaaaaaaaaaaa"),  # all-equal hashes: rightmost-tie rule fires
            (3, "short"),  # < k chars: no fingerprints
            (4, None),  # NULL text: no fingerprints
            (5, "exactly08"),  # m=2 < w: one shrunk whole-text window
            (6, "abcabcabcabcabcabc"),  # periodic: repeated hash values
        ]
        by_id = self._spark_winnow(spark, rows)
        for i, text in rows:
            want = self._py_winnow(text) if text else set()
            assert by_id.get(i, set()) == want, f"id={i}"

    def test_paper_guarantees(self, spark):
        # every w-window has a selection => density; shared substring of
        # length >= k+w-1 => shared fingerprint VALUE (position-free)
        shared = "this exact shared run of characters survives winnowing"
        rows = [
            (1, "left padding words " + shared + " trailing alpha"),
            (2, "completely different opening " + shared + " other end"),
        ]
        by_id = self._spark_winnow(spark, rows)
        fps1 = {fp for _, fp in by_id[1]}
        fps2 = {fp for _, fp in by_id[2]}
        assert fps1 & fps2, "k+w-1 shared substring must share a fingerprint"
        # winnowing guarantee: in any w consecutive window-ends, >=1 selection
        positions = sorted(p for p, _ in by_id[1])
        gaps = [b - a for a, b in zip(positions, positions[1:])]
        assert max(gaps) <= 4  # adjacent selections at most w apart

    def test_overlap_pairs_cap_and_match(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            winnow_overlap_pairs,
        )

        shared = "an uncommon duplicated sentence that is long enough here"
        rows = [
            (1, "doc one begins " + shared + " and then diverges fully"),
            (2, "doc two starts differently " + shared + " before ending"),
            (3, "unrelated text with no duplication in it at all okay"),
        ]
        df = spark.createDataFrame(rows, "id long, text string")
        pairs = {
            (r.id_a, r.id_b): r.n_shared
            for r in winnow_overlap_pairs(df, "id", "text", cap=64).collect()
        }
        assert pairs.get((1, 2), 0) >= 1
        # cap=0 excludes every fingerprint group -> no pairs at all
        assert (
            winnow_overlap_pairs(df, "id", "text", cap=0).count() == 0
        )


class TestBigramSurprisal:
    def test_matches_python_model(self, spark):
        import math

        rows = [
            (1, "the cat sat"),
            (2, "the cat ran"),
            (3, "the the the"),
            (4, "cat"),  # 1 token: no bigrams, no output row
            (5, None),  # NULL: no output row
        ]
        toks = {i: (t or "").lower().split() for i, t in rows}
        pairs = {
            i: list(zip(ts, ts[1:])) for i, ts in toks.items() if len(ts) >= 2
        }
        c2: dict = {}
        for ps in pairs.values():
            for p in ps:
                c2[p] = c2.get(p, 0) + 1
        ctx: dict = {}
        for (a, _), c in c2.items():
            ctx[a] = ctx.get(a, 0) + c
        vocab = len({t for ts in toks.values() for t in ts})
        micro = {
            p: round(-math.log((c + 1) / (ctx[p[0]] + vocab)) * 1e6)
            for p, c in c2.items()
        }
        want = {
            i: (len(ps), round(sum(micro[p] for p in ps) / 1e6 / len(ps), 6))
            for i, ps in pairs.items()
        }

        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            bigram_surprisal,
        )

        df = spark.createDataFrame(rows, "id long, text string")
        got = {
            r.id: (r.n_pairs, r.surprisal)
            for r in bigram_surprisal(df, "id").collect()
        }
        assert got == want
        # word salad scores strictly above natural-order text built from
        # the same common words
        assert 3 not in got or True  # (3 has bigrams; ordering check below)

    def test_salad_scores_above_fluent(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            bigram_surprisal,
        )

        fluent = "the quick brown fox jumps over the lazy dog"
        rows = [(i, fluent) for i in range(1, 9)] + [
            (9, "dog the over quick lazy fox brown jumps the")
        ]
        df = spark.createDataFrame(rows, "id long, text string")
        got = {r.id: r.surprisal for r in bigram_surprisal(df, "id").collect()}
        assert got[9] > got[1]


class TestNBQualityClassifier:
    def test_separable_corpus_and_prior_fallback(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            nb_quality_classifier,
        )

        good = "careful measured prose with varied structure and clarity"
        bad = "buy now click here free offer winner cash prize deal"
        rows = (
            [(i, good + f" variant {i}", True, True) for i in range(8)]
            + [(i + 8, bad + f" spam {i}", False, True) for i in range(8)]
            # held-out rows: never trained on, still scored
            + [(100, good + " unseen", True, False), (101, bad + " unseen", False, False)]
            # evidence-free doc: survives with score == prior
            + [(102, "", None, False)]
        )
        df = spark.createDataFrame(
            rows, "id long, text string, label boolean, is_train boolean"
        )
        out = {
            r.id: r
            for r in nb_quality_classifier(df, "id", "label", "is_train").collect()
        }
        assert len(out) == 19
        for i in range(8):
            assert out[i].pred is True and out[i + 8].pred is False
        assert out[100].pred is True and out[101].pred is False
        # balanced train split -> prior == 0 -> empty doc predicts False
        assert out[102].n_grams == 0 and out[102].score == 0.0
        assert out[102].pred is False

    def test_prior_only_when_one_class_dominates(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            nb_quality_classifier,
        )

        rows = [(i, f"tok{i} filler words", True, True) for i in range(9)] + [
            (9, "negative example text", False, True),
            (10, "", None, False),
        ]
        df = spark.createDataFrame(
            rows, "id long, text string, label boolean, is_train boolean"
        )
        out = {
            r.id: r
            for r in nb_quality_classifier(df, "id", "label", "is_train").collect()
        }
        # prior = ln(10) - ln(2) > 0 -> evidence-free doc predicts True
        assert out[10].pred is True and out[10].score > 0


class TestCountMinSketch:
    def test_union_is_sum_of_cells_and_never_under(self, spark):
        from mistral_ocr_pipeline_spark.operators.sketches import (
            cms_build,
            cms_estimate,
        )

        a = spark.createDataFrame(
            [(t,) for t in "x x x y z z".split()], "k string"
        )
        b = spark.createDataFrame(
            [(t,) for t in "x y y w w w w".split()], "k string"
        )
        merged = (
            cms_build(a, "k", w=16, d=3)
            .unionByName(cms_build(b, "k", w=16, d=3))
            .groupBy("row_idx", "col_idx")
            .agg(F.sum("c").alias("c"))
        )
        rebuilt = cms_build(a.unionByName(b), "k", w=16, d=3)
        assert sorted(map(tuple, merged.collect())) == sorted(
            map(tuple, rebuilt.collect())
        )
        keys = spark.createDataFrame(
            [("x",), ("y",), ("z",), ("w",), ("absent",)], "k string"
        )
        est = {
            r.k: r.est_count
            for r in cms_estimate(keys, "k", rebuilt, w=16, d=3).collect()
        }
        true = {"x": 4, "y": 3, "z": 2, "w": 4, "absent": 0}
        for k, t in true.items():
            assert est[k] >= t, k

    def test_weighted_build(self, spark):
        from mistral_ocr_pipeline_spark.operators.sketches import (
            cms_build,
            cms_estimate,
        )

        df = spark.createDataFrame(
            [("a", 5), ("a", 2), ("b", 1)], "k string, n long"
        )
        cms = cms_build(df, "k", w=64, d=4, weight_col="n")
        keys = spark.createDataFrame([("a",), ("b",)], "k string")
        est = {
            r.k: r.est_count
            for r in cms_estimate(keys, "k", cms, w=64, d=4).collect()
        }
        assert est["a"] >= 7 and est["b"] >= 1


class TestCharEntropyZipf:
    def test_entropy_matches_model_and_degenerate_cases(self, spark):
        import math
        from collections import Counter

        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            char_entropy,
        )

        rows = [
            (1, "aaaaaaaa"),        # single symbol: entropy 0
            (2, "abcdefgh"),        # uniform over 8: ln(8)
            (3, "hello world"),
            (4, ""),                # empty: (0, 0.0), never dropped
            (5, None),              # NULL: (0, 0.0), never dropped
        ]
        df = spark.createDataFrame(rows, "id long, text string")
        got = {
            r.id: (r.n_chars, r.entropy)
            for r in char_entropy(df, "id").collect()
        }

        def model(t):
            c = Counter(t)
            n = len(t)
            return (
                n,
                round(
                    sum(
                        round((k / n) * math.log(n / k) * 1e6)
                        for k in c.values()
                    )
                    / 1e6,
                    6,
                ),
            )

        for i, t in rows:
            want = model(t) if t else (0, 0.0)
            assert got[i] == want, f"id={i}"
        assert got[1][1] == 0.0
        assert abs(got[2][1] - math.log(8)) < 1e-5
        # gibberish-vs-prose ordering: random-ish spread > single-char mash
        assert got[2][1] > got[1][1]

    def test_zipf_exact_power_law_and_model(self, spark):
        import math

        from mistral_ocr_pipeline_spark.operators.text_analysis import zipf_fit

        # craft an exact Zipf corpus: token_r appears round(64/r) times
        words = []
        freqs = {}
        for r in range(1, 9):
            f = round(64 / r)
            freqs[f"w{r:02d}"] = f
            words += [f"w{r:02d}"] * f
        df = spark.createDataFrame([(1, " ".join(words))], "id long, text string")
        row = zipf_fit(df).collect()[0]
        assert row.vocab_size == 8 and row.total_tokens == sum(freqs.values())
        # pure-python OLS twin with identical micro-unit rounding
        ranked = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))
        pts = [
            (round(math.log(i + 1) * 1e6), round(math.log(f) * 1e6))
            for i, (_, f) in enumerate(ranked)
        ]
        n = len(pts)
        sx = sum(x for x, _ in pts); sy = sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts); sxx = sum(x * x for x, _ in pts)
        slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        assert row.zipf_slope == round(slope, 6)
        assert abs(row.zipf_slope - (-1.0)) < 0.05  # it IS a Zipf corpus


class TestSQ8:
    def test_quantization_error_bound_and_degenerate_dim(self, spark):
        from mistral_ocr_pipeline_spark.operators.similarity_df import (
            _sq8_dequant,
            sq8_encode,
            sq8_train,
        )

        rows = [
            (1, [0.0, 5.0, -1.0]),
            (2, [1.0, 5.0, 0.5]),
            (3, [0.25, 5.0, 1.0]),  # dim 2 is constant -> degenerate
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        params = sq8_train(df)
        enc = sq8_encode(df, params)
        dq = {
            r.vec_id: r.dv
            for r in enc.crossJoin(F.broadcast(params))
            .select(
                "vec_id",
                _sq8_dequant(F.col("codes"), F.col("lo"), F.col("hi")).alias("dv"),
            )
            .collect()
        }
        spans = [1.0, 0.0, 2.0]  # per-dim hi - lo
        for vid, vec in rows:
            for d, (orig, approx) in enumerate(zip(vec, dq[vid])):
                if spans[d] == 0.0:
                    assert approx == orig  # degenerate dim reconstructs exactly
                else:
                    # round-to-nearest on a 255-step grid: error <= step/2
                    assert abs(orig - approx) <= spans[d] / 255.0 / 2 + 1e-12

    def test_codes_are_bytes_and_saturate(self, spark):
        from mistral_ocr_pipeline_spark.operators.similarity_df import (
            sq8_encode,
            sq8_train,
        )

        train = spark.createDataFrame(
            [(1, [0.0]), (2, [1.0])], "vec_id long, embedding array<double>"
        )
        params = sq8_train(train)
        # out-of-range NEW vectors clamp to the trained grid, never overflow
        newv = spark.createDataFrame(
            [(3, [-9.0]), (4, [9.0]), (5, [0.5])],
            "vec_id long, embedding array<double>",
        )
        codes = {
            r.vec_id: r.codes[0]
            for r in sq8_encode(newv, params).collect()
        }
        assert codes[3] == 0 and codes[4] == 255 and codes[5] == 128


class TestCorpusKLDrift:
    def test_identical_zero_and_model_match(self, spark):
        import math
        from collections import Counter

        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            corpus_kl_drift,
        )

        a_rows = [(1, "the cat sat on the mat"), (2, "dogs chase the cat")]
        b_rows = [(3, "stocks fell sharply on monday"), (4, "the market rallied")]
        a = spark.createDataFrame(a_rows, "id long, text string")
        b = spark.createDataFrame(b_rows, "id long, text string")
        # identical corpora: zero drift both ways
        same = corpus_kl_drift(a, a).collect()[0]
        assert same.kl_ab == 0.0 and same.kl_ba == 0.0
        # disjoint-topic corpora: strictly positive, matches the model
        got = corpus_kl_drift(a, b).collect()[0]
        ca = Counter(t for _, s in a_rows for t in s.split())
        cb = Counter(t for _, s in b_rows for t in s.split())
        vocab = set(ca) | set(cb)
        v = float(len(vocab))
        na, nb = sum(ca.values()), sum(cb.values())

        def kl(cx, nx, cy, ny):
            tot = 0
            for t in vocab:
                px = (cx.get(t, 0) + 1) / (nx + v)
                py = (cy.get(t, 0) + 1) / (ny + v)
                tot += round(px * math.log(px / py) * 1e6)
            return round(tot / 1e6, 6)

        assert got.vocab_union == len(vocab)
        assert (got.tokens_a, got.tokens_b) == (na, nb)
        assert got.kl_ab == kl(ca, na, cb, nb) > 0
        assert got.kl_ba == kl(cb, nb, ca, na) > 0


class TestNgramNovelty:
    def test_unique_shared_and_short_docs(self, spark):
        """All-unique doc → novelty 1.0; two verbatim copies → both score
        0.0 (every gram has df ≥ 2); a doc shorter than n words and a
        NULL-text doc both SURVIVE with n_grams = 0 / novelty NULL."""
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            ngram_novelty,
        )

        df = spark.createDataFrame(
            [
                (1, "alpha beta gamma delta epsilon zeta"),
                (2, "one two three four five six seven"),
                (3, "one two three four five six seven"),
                (4, "too short"),
                (5, None),
            ],
            "id long, text string",
        )
        out = {r.id: r for r in ngram_novelty(df, "id", "text", n=3).collect()}
        assert set(out) == {1, 2, 3, 4, 5}
        assert out[1].novelty == 1.0 and out[1].n_grams == 4
        assert out[2].novelty == 0.0 and out[3].novelty == 0.0
        assert out[2].n_grams == 5 and out[2].n_novel == 0
        for i in (4, 5):
            assert out[i].n_grams == 0 and out[i].n_novel == 0
            assert out[i].novelty is None

    def test_mixed_doc_ratio_and_partition_invariance(self, spark):
        """A doc sharing exactly its first 3-gram with another doc scores
        (n_grams-1)/n_grams; results identical across partitionings."""
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            ngram_novelty,
        )

        df = spark.createDataFrame(
            [
                (1, "shared prefix words then entirely unique tail one"),
                (2, "shared prefix words but different continuation here"),
            ],
            "id long, text string",
        )
        out = {r.id: r for r in ngram_novelty(df, "id", "text", n=3).collect()}
        # both docs have 6 grams; exactly "shared prefix words" is common
        assert out[1].n_grams == 6 and out[1].n_novel == 5
        assert out[1].novelty == round(5 / 6, 6)
        base = sorted(map(tuple, ngram_novelty(df, "id", "text", n=3).collect()))
        for layout in (df.repartition(7), df.coalesce(1)):
            got = sorted(
                map(tuple, ngram_novelty(layout, "id", "text", n=3).collect())
            )
            assert got == base


class TestClusterBalancedSample:
    def test_cap_determinism_and_score_range(self, spark, emb):
        from mistral_ocr_pipeline_spark.operators.sampling import (
            cluster_balanced_sample,
        )

        out = cluster_balanced_sample(emb, n_cells=8, per_cell_cap=10)
        rows = out.collect()
        assert rows, "selection must be non-empty"
        per_cell = {}
        for r in rows:
            per_cell.setdefault(r.cell, []).append(r.sample_rank)
            assert -1.0 <= r.cos_centroid <= 1.0
        for cell, ranks in per_cell.items():
            assert len(ranks) <= 10
            # ranks are dense 1..len within each cell
            assert sorted(ranks) == list(range(1, len(ranks) + 1))
        # partition/rerun invariance: same selection from any layout
        base = sorted(map(tuple, rows))
        for layout in (emb.repartition(13), emb.coalesce(1)):
            got = sorted(
                map(
                    tuple,
                    cluster_balanced_sample(
                        layout, n_cells=8, per_cell_cap=10
                    ).collect(),
                )
            )
            assert got == base

    def test_balance_bounds_dominant_cluster(self, spark):
        """A corpus where one tight cluster holds 80% of the vectors: the
        capped selection cannot give that cluster more than per_cell_cap
        rows, while small clusters keep all theirs."""
        from mistral_ocr_pipeline_spark.operators.sampling import (
            cluster_balanced_sample,
        )

        rows = []
        # 80 near-identical vectors (dominant topic), 2 small distinct ones
        for i in range(80):
            rows.append((i, [1.0, 0.001 * i, 0.0, 0.0]))
        for i in range(10):
            rows.append((100 + i, [0.0, 1.0, 0.01 * i, 0.0]))
        for i in range(10):
            rows.append((200 + i, [0.0, 0.0, 1.0, 0.02 * i]))
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<double>"
        )
        out = cluster_balanced_sample(
            df, n_cells=3, per_cell_cap=8, sample_size=100
        ).collect()
        by_cell = {}
        for r in out:
            by_cell.setdefault(r.cell, set()).add(r.vec_id)
        assert all(len(v) <= 8 for v in by_cell.values())
        # the dominant block contributes at most 8 of its 80 vectors
        dominant = {r.vec_id for r in out if r.vec_id < 100}
        assert len(dominant) <= 8
        # total kept ≤ cells × cap, and the small topics are represented
        assert any(r.vec_id >= 200 for r in out)
        assert any(100 <= r.vec_id < 200 for r in out)


class TestJLRefine:
    def test_full_refine_equals_exact(self, spark, emb):
        """With refine ≥ corpus size the prefilter keeps everything, so
        the output must be hash-identical to exact brute force — the
        correctness anchor for the JL path."""
        from pyspark.sql import functions as F

        from mistral_ocr_pipeline_spark.operators.similarity_df import (
            brute_force_topk_df,
            jl_refine_topk,
        )

        q = emb.filter(F.col("vec_id") < 4)
        got = sorted(
            map(tuple, jl_refine_topk(emb, q, k=5, refine=10_000).collect())
        )
        exact = sorted(map(tuple, brute_force_topk_df(emb, q, k=5).collect()))
        assert got == exact

    def test_orthonormal_basis(self):
        """The projection basis rows are orthonormal: raw Gaussian rows'
        mutual correlations were the measured recall killer."""
        import numpy as np

        from mistral_ocr_pipeline_spark.operators.similarity_df import (
            _jl_planes,
        )

        p = _jl_planes(32, 64, seed=7)
        gram = p @ p.T
        assert np.allclose(gram, np.eye(32), atol=1e-10)

    def test_dataframe_native_query_side(self, spark, emb):
        """A repartitioned query relation produces identical results and
        the plan carries no mapInPandas/LocalTableScan — the query side
        never rides the driver."""
        from pyspark.sql import functions as F

        from mistral_ocr_pipeline_spark.operators.similarity_df import (
            jl_refine_topk,
        )

        q = emb.filter(F.col("vec_id") < 8)
        base = sorted(map(tuple, jl_refine_topk(emb, q, k=5).collect()))
        rep = sorted(
            map(tuple, jl_refine_topk(emb, q.repartition(5), k=5).collect())
        )
        assert rep == base
        plan = (
            jl_refine_topk(emb, q, k=5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "mapInPandas" not in plan and "MapInPandas" not in plan

    def test_empty_corpus(self, spark):
        from mistral_ocr_pipeline_spark.operators.similarity_df import (
            jl_refine_topk,
        )

        empty = spark.createDataFrame(
            [], "vec_id long, embedding array<float>"
        )
        out = jl_refine_topk(empty, empty, k=5)
        assert out.columns == ["query_id", "vec_id", "cosine", "rank"]
        assert out.count() == 0


class TestProfileContract:
    def test_contract_rows_and_fail_closed(self, spark):
        from mistral_ocr_pipeline_spark.operators.profiling import (
            check_constraints,
            profile_columns,
        )

        df = spark.createDataFrame(
            [(1, "x", 5), (2, None, 7), (3, "y", None)],
            "k long, v string, n long",
        )
        prof = profile_columns(df)
        out = {
            (r.column, r.metric): r
            for r in check_constraints(
                prof,
                [
                    ("k", "null_frac_micro", "eq", 0),
                    ("v", "null_frac_micro", "le", 400000),
                    ("v", "n_distinct", "ge", 3),
                    ("ghost", "n_rows", "ge", 1),
                ],
            ).collect()
        }
        assert out[("k", "null_frac_micro")].passed
        r = out[("v", "null_frac_micro")]
        assert r.observed == 333333 and r.passed
        assert not out[("v", "n_distinct")].passed  # 2 < 3
        g = out[("ghost", "n_rows")]
        assert g.observed is None and not g.passed  # fail closed

    def test_bad_specs_rejected(self, spark):
        import pytest

        from mistral_ocr_pipeline_spark.operators.profiling import (
            check_constraints,
            profile_columns,
        )

        prof = profile_columns(
            spark.createDataFrame([(1,)], "k long")
        )
        with pytest.raises(ValueError):
            check_constraints(prof, [("k", "bogus", "le", 1)])
        with pytest.raises(ValueError):
            check_constraints(prof, [("k", "n_rows", "between", 1)])


class TestHomoglyphFold:
    def test_spoofed_clone_rejoins_exact_dedup(self, spark):
        """The point of the fold: a Cyrillic-spoofed clone that exact
        dedup cannot see becomes digest-identical after folding; clean
        Latin text passes through untouched with a zero count."""
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            fold_homoglyphs,
        )

        clean = "paypal click here to verify your account"
        spoof = clean.replace("a", "\u0430").replace("e", "\u0435")
        df = spark.createDataFrame(
            [(1, clean), (2, spoof), (3, None)],
            "doc_id long, text string",
        )
        out = {r.id: r for r in fold_homoglyphs(df, "doc_id", "text").collect()}
        assert spoof != clean
        assert out[2].text_folded == clean and out[2].had_homoglyphs
        assert out[2].n_homoglyphs == clean.count("a") + clean.count("e")
        assert out[1].text_folded == clean and out[1].n_homoglyphs == 0
        assert out[3].text_folded == "" and not out[3].had_homoglyphs


class TestLengthBuckets:
    def test_bucket_boundaries_waste_and_truncation(self, spark):
        from mistral_ocr_pipeline_spark.operators.packing import (
            length_bucket_stats,
        )

        df = spark.createDataFrame(
            [(1, 10), (2, 16), (3, 17), (4, 100), (5, 3000)],
            "doc_id long, tokens long",
        )
        out = {r.bucket: r for r in length_bucket_stats(df, "doc_id", "tokens").collect()}
        # 10 and 16 share bucket 16 (boundary inclusive); 17 spills to 32
        assert out[16].n_docs == 2 and out[16].total_waste == (16 - 10)
        assert out[32].n_docs == 1 and out[32].total_waste == 15
        assert out[128].n_docs == 1 and out[128].total_waste == 28
        # above the ladder: truncated to 2048, zero waste, flagged
        assert out[2048].n_docs == 1 and out[2048].n_truncated == 1
        assert out[2048].total_waste == 0 and out[2048].total_tokens == 2048
        # efficiency is exact integer micro math
        assert out[16].pad_eff_micro == (26 * 1000000) // (2 * 16)


class TestTextTiling:
    def test_topic_shift_marks_the_valley(self, spark):
        """Two 30-token topics: the only boundary is the gap where the
        vocabulary flips; uniform neighbouring gaps score cosine 1 and
        depth 0."""
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            texttile_segments,
        )

        text = (
            "cat dog cat bird cat dog bird cat dog cat " * 3
            + "car road car truck road car truck road car road " * 3
        )
        df = spark.createDataFrame(
            [(1, text), (2, "short text"), (3, None)],
            "doc_id long, text string",
        )
        rows = {
            (r.id, r.gap_idx): r
            for r in texttile_segments(df, "doc_id", "text", w=10).collect()
        }
        assert {i for (i, _) in rows} == {1}  # short/NULL docs: no gaps
        assert rows[(1, 3)].is_boundary and rows[(1, 3)].score_r6 == 0.0
        assert rows[(1, 3)].token_offset == 30
        for g in (1, 2, 4, 5):
            assert not rows[(1, g)].is_boundary
            assert rows[(1, g)].score_r6 == 1.0 and rows[(1, g)].depth_r3 == 0.0

    def test_passages_cover_document_losslessly(self, spark):
        """Passage materialization: the two-topic doc splits into two
        passages at the valley; every doc's passages cover its tokens
        exactly (sum of n_tokens = token count), and a single-block doc
        emits one whole-document passage."""
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            texttile_passages,
        )

        text = (
            "cat dog cat bird cat dog bird cat dog cat " * 3
            + "car road car truck road car truck road car road " * 3
        )
        df = spark.createDataFrame(
            [(1, text), (2, "short text"), (3, None)],
            "doc_id long, text string",
        )
        rows = texttile_passages(df, "doc_id", "text", w=10).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.id, []).append(r)
        assert set(by_doc) == {1, 2}
        segs = sorted(by_doc[1], key=lambda r: r.seg_idx)
        assert [(s.start_token, s.n_tokens) for s in segs] == [(0, 30), (30, 30)]
        assert segs[0].seg_text.startswith("cat dog")
        assert segs[1].seg_text.startswith("car road")
        assert sum(s.n_tokens for s in by_doc[1]) == 60
        assert by_doc[2][0].seg_text == "short text"
        assert by_doc[2][0].n_tokens == 2

    def test_lossless_cover_at_any_block_size(self, spark):
        """Property: for any block size w, the passages of any document
        cover its tokens exactly — segmentation never gains or loses a
        token."""
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            texttile_passages,
        )

        docs = spark.read.parquet(
            "/root/testdata/sf0.001/documents.parquet"
        ).limit(40)
        from mistral_ocr_pipeline_spark.functions.text_functions import (
            norm_key_col,
        )
        from pyspark.sql import functions as F

        want = {
            r.doc_id: r.n
            for r in docs.select(
                "doc_id",
                F.size(
                    F.filter(
                        F.split(norm_key_col(F.col("text")), " "),
                        lambda x: x != "",
                    )
                ).alias("n"),
            ).collect()
            if r.n > 0
        }
        for w in (5, 10, 24):
            got = {}
            for r in texttile_passages(docs, "doc_id", "text", w=w).collect():
                got[r.id] = got.get(r.id, 0) + r.n_tokens
            assert got == want, f"w={w}"

    def test_uniform_document_has_no_boundaries(self, spark):
        """Constant cohesion → zero variance → the strict cutoff
        inequality fails everywhere: no spurious boundaries."""
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            texttile_segments,
        )

        df = spark.createDataFrame(
            [(1, "alpha beta gamma delta epsilon " * 20)],
            "doc_id long, text string",
        )
        rows = texttile_segments(df, "doc_id", "text", w=10).collect()
        assert rows and not any(r.is_boundary for r in rows)


class TestQualityDisagreementAudit:
    def test_committee_consistency(self, spark):
        """Composite sanity on sf0.001: every document is audited once,
        the disagree flag is exactly nb_pred != lr_pred, and each
        model's published score signs its own decision."""
        from mistral_ocr_pipeline_spark.plans.entry_queries import QUERIES

        rows = QUERIES["quality_disagreement_audit"](
            spark, "/root/testdata/sf0.001"
        ).collect()
        assert rows and len({r.doc_id for r in rows}) == len(rows)
        for r in rows:
            assert r.disagree == (r.nb_pred != r.lr_pred)
            assert r.nb_pred == (r.nb_score > 0)
            # lr score is the 6-dp margin; pred is margin > 0 (micro ints)
            if abs(r.lr_score) > 1e-6:
                assert r.lr_pred == (r.lr_score > 0)


class TestQualityMixPipeline:
    def test_rollup_invariants(self, spark):
        """Composite sanity on sf0.001: selection never exceeds the
        quality-pass pool, a rate of exactly 1.0 keeps every quality doc,
        and a sub-1.0 rate actually thins (the fate rule is not a
        constant)."""
        from mistral_ocr_pipeline_spark.plans.entry_queries import QUERIES

        rows = QUERIES["quality_mix_pipeline"](
            spark, "/root/testdata/sf0.001"
        ).collect()
        assert rows, "rollup must be non-empty"
        thinned = 0
        for r in rows:
            assert 0 <= r.n_selected <= r.n_quality
            assert 0 <= r.rate_micro <= 1_000_000
            if r.rate_micro == 1_000_000:
                assert r.n_selected == r.n_quality
            elif r.n_selected < r.n_quality:
                thinned += 1
        # the 20k budget is far below the corpus: some language must thin
        assert thinned >= 1


class TestSoftDedupWeights:
    def test_hand_computed(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            soft_dedup_weights,
        )

        df = spark.createDataFrame(
            [
                (1, "a b c d"),   # grams: "a b c", "b c d" — cloned by 2
                (2, "a b c d"),
                (3, "x y z"),     # 1 unique gram
                (4, "a b"),       # < n words -> 0 grams
                (5, None),        # NULL text survives
            ],
            "id long, text string",
        )
        out = {r.id: r for r in soft_dedup_weights(df, "id", "text").collect()}
        assert set(out) == {1, 2, 3, 4, 5}
        # clones: every gram df=2 -> commonness 2e6, weight 5e5
        for i in (1, 2):
            assert out[i].n_grams == 2
            assert out[i].commonness_micro == 2_000_000
            assert out[i].weight_micro == 500_000
        # all-unique doc: exactly 1e6 / 1e6
        assert out[3].commonness_micro == 1_000_000
        assert out[3].weight_micro == 1_000_000
        # gramless docs: nothing common about them
        for i in (4, 5):
            assert out[i].n_grams == 0 and out[i].weight_micro == 1_000_000


class TestClusterKeepBest:
    def test_argmax_and_tie(self, spark):
        from mistral_ocr_pipeline_spark.operators.dedup import cluster_keep_best

        comp = spark.createDataFrame(
            [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (9, 9)],
            "id long, comp long",
        )
        scores = spark.createDataFrame(
            [(1, 10), (2, 30), (3, 30), (4, 5), (5, 5), (9, 0)],
            "id long, score long",
        )
        out = {r.id: r for r in cluster_keep_best(comp, scores).collect()}
        # cluster 1: max score 30 shared by 2,3 -> lowest id 2 wins
        assert out[2].is_kept and not out[3].is_kept and not out[1].is_kept
        assert out[1].kept_id == 2 and out[1].kept_score == 30
        # cluster 4: tie -> id 4
        assert out[4].is_kept and out[5].kept_id == 4
        # singleton keeps itself
        assert out[9].is_kept and out[9].kept_score == 0


class TestLicenseTags:
    def test_priority_and_keep(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import license_tags

        df = spark.createDataFrame(
            [
                (1, "shared under CC-BY-NC terms"),   # trips cc_by too
                (2, "shared under CC-BY 4.0"),
                (3, "this is public domain text"),
                (4, "plain prose, no markers"),
                (5, None),
                (6, "All Rights Reserved. Also CC-BY."),  # restrictive wins
                (7, "built with gplv3 tooling"),  # \bgpl\b does NOT match
                (8, "under the GPL license"),
            ],
            "id long, text string",
        )
        out = {r.id: r for r in license_tags(df, "id", "text").collect()}
        assert out[1].license == "cc_by_nc" and out[1].has_cc_by
        assert not out[1].keep_for_training
        assert out[2].license == "cc_by" and out[2].keep_for_training
        assert out[3].license == "cc0"
        assert out[4].license == "none" and out[4].keep_for_training
        assert out[5].license == "none" and out[5].keep_for_training
        assert out[6].license == "all_rights_reserved"
        assert not out[6].keep_for_training and out[6].has_cc_by
        assert out[7].license == "none" and not out[7].has_gpl
        assert out[8].license == "gpl" and out[8].keep_for_training


class TestKCenter:
    def test_hand_computed_1d(self, spark):
        from mistral_ocr_pipeline_spark.operators.similarity import kcenter_select

        # 1-D points at integer coordinates: 0, 1, 10, 5, 9
        df = spark.createDataFrame(
            [(1, [0.0]), (2, [1.0]), (3, [10.0]), (4, [5.0]), (5, [9.0])],
            "id long, vec array<double>",
        )
        out = [(r.sel_rank, r.vec_id, r.radius_r6)
               for r in kcenter_select(df, "id", "vec", k=4).collect()]
        # seed=min id (1 at 0); farthest=3 (d=100); then 4 (min(25,25)=25);
        # then ids 2 and 5 tie at min-dist 1.0 -> lowest id 2
        assert out == [(1, 1, None), (2, 3, 100.0), (3, 4, 25.0), (4, 2, 1.0)]

    def test_duplicate_vectors_never_block(self, spark):
        from mistral_ocr_pipeline_spark.operators.similarity import kcenter_select

        df = spark.createDataFrame(
            [(1, [0.0]), (2, [0.0]), (3, [2.0])],
            "id long, vec array<double>",
        )
        out = [(r.sel_rank, r.vec_id) for r in
               kcenter_select(df, "id", "vec", k=3).collect()]
        # after {1,3} every remaining dist is 0 -> lowest id picks (id 2)
        assert out == [(1, 1), (2, 3), (3, 2)]


class TestKMVSketch:
    def _df(self, spark, keys):
        return spark.createDataFrame([(k,) for k in keys], "key string")

    def test_small_set_is_exact(self, spark):
        from mistral_ocr_pipeline_spark.operators.sketches import (
            kmv_estimate,
            kmv_sketch,
        )

        df = self._df(spark, [f"x{i}" for i in range(10)] * 3)  # dups collapse
        est = kmv_estimate(kmv_sketch(df, "key", k=64), k=64).collect()[0]
        assert est.n_sketch == 10
        assert est.est_distinct == 10.0  # sketch below k -> exact

    def test_merge_equals_sketch_of_union(self, spark):
        from mistral_ocr_pipeline_spark.operators.sketches import (
            kmv_merge,
            kmv_sketch,
        )

        a = self._df(spark, [f"a{i}" for i in range(200)])
        b = self._df(spark, [f"b{i}" for i in range(150)] + ["a0", "a1"])
        u = a.unionByName(b)
        k = 32
        merged = sorted(r.h for r in
                        kmv_merge(kmv_sketch(a, "key", k=k),
                                  kmv_sketch(b, "key", k=k), k=k).collect())
        direct = sorted(r.h for r in kmv_sketch(u, "key", k=k).collect())
        assert merged == direct  # mergeability law: bottom-k is a lattice

    def test_estimate_within_kmv_error_bound(self, spark):
        from mistral_ocr_pipeline_spark.operators.sketches import (
            kmv_estimate,
            kmv_sketch,
        )

        n, k = 5000, 256
        df = self._df(spark, [f"key-{i}" for i in range(n)])
        est = kmv_estimate(kmv_sketch(df, "key", k=k), k=k).collect()[0]
        # 5-sigma envelope of the (k-1)/theta estimator's ~1/sqrt(k-2) rse
        assert abs(est.est_distinct - n) / n < 5 / (k - 2) ** 0.5

    def test_intersection_estimates_jaccard(self, spark):
        from mistral_ocr_pipeline_spark.operators.sketches import (
            kmv_intersection,
            kmv_sketch,
        )

        shared = [f"s{i}" for i in range(1000)]
        a = self._df(spark, shared + [f"a{i}" for i in range(1000)])
        b = self._df(spark, shared + [f"b{i}" for i in range(1000)])
        k = 256
        out = kmv_intersection(
            kmv_sketch(a, "key", k=k), kmv_sketch(b, "key", k=k), k=k
        ).collect()[0]
        # true union 3000, intersection 1000, jaccard 1/3
        assert abs(out.union_est - 3000) / 3000 < 0.35
        assert abs(out.jaccard_est - 1 / 3) < 0.15
        assert abs(out.inter_est - 1000) / 1000 < 0.5

    def test_null_keys_ignored(self, spark):
        from mistral_ocr_pipeline_spark.operators.sketches import kmv_sketch

        df = spark.createDataFrame(
            [("a",), (None,), ("b",)], "key string"
        )
        assert kmv_sketch(df, "key", k=8).count() == 2


class TestNgramContainment:
    def test_excerpt_inside_long_doc(self, spark):
        from mistral_ocr_pipeline_spark.operators.dedup import (
            ngram_containment_pairs,
        )

        long_text = " ".join(f"word{i}" for i in range(60))
        excerpt = " ".join(f"word{i}" for i in range(10))  # strict prefix
        other = " ".join(f"zzz{i}" for i in range(40))
        df = spark.createDataFrame(
            [(1, long_text), (2, excerpt), (3, other)], "id long, text string"
        )
        rows = ngram_containment_pairs(
            df, "id", "text", n=3, threshold=0.8
        ).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.id_a, r.id_b) == (1, 2)
        # excerpt: 10 words -> 8 trigrams, all inside the long doc
        assert r.shared == 8
        assert r.containment_b == 1.0
        assert r.containment_a == 8 / 58  # jaccard would be ~0.14: invisible
        assert not r.bucket_truncated

    def test_threshold_filters_weak_overlap(self, spark):
        from mistral_ocr_pipeline_spark.operators.dedup import (
            ngram_containment_pairs,
        )

        a = " ".join(f"w{i}" for i in range(20))
        b = " ".join(f"w{i}" for i in range(5)) + " " + " ".join(
            f"q{i}" for i in range(30)
        )
        df = spark.createDataFrame([(1, a), (2, b)], "id long, text string")
        # shared trigrams = 3 of (a:18, b:33) -> max containment 1/6 < 0.5
        assert (
            ngram_containment_pairs(df, "id", "text", n=3, threshold=0.5).count()
            == 0
        )

    def test_direction_is_reported_both_ways(self, spark):
        from mistral_ocr_pipeline_spark.operators.dedup import (
            ngram_containment_pairs,
        )

        t = " ".join(f"tok{i}" for i in range(12))
        df = spark.createDataFrame([(7, t), (9, t)], "id long, text string")
        r = ngram_containment_pairs(df, "id", "text", n=3, threshold=0.9).collect()[0]
        assert r.containment_a == 1.0 and r.containment_b == 1.0


class TestReservoirSample:
    def test_exact_k_and_deterministic(self, spark):
        from mistral_ocr_pipeline_spark.operators.sampling import (
            reservoir_sample,
        )

        df = spark.createDataFrame([(i,) for i in range(500)], "id long")
        a = reservoir_sample(df, "id", k=50).collect()
        b = reservoir_sample(df, "id", k=50).collect()
        assert len(a) == 50
        assert sorted(r.id for r in a) == sorted(r.id for r in b)

    def test_shard_reservoirs_recut_to_global(self, spark):
        # The mergeability claim sample_reservoir's docstring pins:
        # per-shard bottom-k unioned then re-cut == global bottom-k.
        from mistral_ocr_pipeline_spark.operators.sampling import (
            reservoir_sample,
        )

        full = spark.createDataFrame([(i,) for i in range(400)], "id long")
        s1 = spark.createDataFrame([(i,) for i in range(0, 200)], "id long")
        s2 = spark.createDataFrame([(i,) for i in range(200, 400)], "id long")
        glob = sorted(r.id for r in reservoir_sample(full, "id", 30).collect())
        merged = reservoir_sample(s1, "id", 30).unionByName(
            reservoir_sample(s2, "id", 30)
        )
        recut = sorted(
            r.id for r in merged.orderBy("_rsv", "id").limit(30).collect()
        )
        assert glob == recut

    def test_salt_changes_sample(self, spark):
        from mistral_ocr_pipeline_spark.operators.sampling import (
            reservoir_sample,
        )

        df = spark.createDataFrame([(i,) for i in range(500)], "id long")
        a = {r.id for r in reservoir_sample(df, "id", 50, salt="x").collect()}
        b = {r.id for r in reservoir_sample(df, "id", 50, salt="y").collect()}
        assert a != b


class TestMeanPoolEmbeddings:
    def test_hand_computed(self, spark):
        from mistral_ocr_pipeline_spark.operators.similarity import (
            mean_pool_embeddings,
        )

        df = spark.createDataFrame(
            [(1, [1.0, 2.0]), (1, [3.0, 5.0]), (2, [0.5, -0.5])],
            "key long, v array<double>",
        )
        rows = {
            r.key: r for r in mean_pool_embeddings(df, "key", "v").collect()
        }
        assert rows[1].n_chunks == 2
        assert rows[1].pooled == [2.0, 3.5]
        assert rows[2].n_chunks == 1
        assert rows[2].pooled == [0.5, -0.5]

    def test_halfway_rounds_away_from_zero(self, spark):
        # The exact case that split Spark/DuckDB when the mean was
        # rounded on doubles: micro-sum -1979 over n=2 -> -989.5 micro,
        # half-away-from-zero -> -990 -> -0.00099.
        from mistral_ocr_pipeline_spark.operators.similarity import (
            mean_pool_embeddings,
        )

        df = spark.createDataFrame(
            [(1, [-0.000989]), (1, [-0.00099])], "key long, v array<double>"
        )
        r = mean_pool_embeddings(df, "key", "v").collect()[0]
        assert r.pooled == [-0.00099]

    def test_order_invariant_under_repartition(self, spark):
        from mistral_ocr_pipeline_spark.operators.similarity import (
            mean_pool_embeddings,
        )

        data = [(1, [0.1 * i, 0.3 * i + 0.05]) for i in range(1, 30)]
        df = spark.createDataFrame(data, "key long, v array<double>")
        a = mean_pool_embeddings(df, "key", "v").collect()[0]
        b = mean_pool_embeddings(df.repartition(7), "key", "v").collect()[0]
        assert a.pooled == b.pooled


class TestReadabilityScores:
    def test_hand_computed(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            readability_scores,
        )

        # "the cat sat. it ran!" -> 5 words, 2 sentences,
        # vowel groups: e,a,a,i,a -> 5 syllables
        df = spark.createDataFrame(
            [(1, "the cat sat. it ran!")], "doc_id long, text string"
        )
        r = readability_scores(df, "doc_id").collect()[0]
        assert (r.n_words, r.n_sentences, r.n_syllables) == (5, 2, 5)
        expect = 206.835 - 1.015 * (5 / 2) - 84.6 * (5 / 5)
        assert abs(r.flesch_r6 - round(expect, 6)) < 1e-9
        assert r.band == "easy"

    def test_consonant_only_tokens_count_one_syllable(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            readability_scores,
        )

        df = spark.createDataFrame(
            [(1, "xyz 123 ok")], "doc_id long, text string"
        )
        r = readability_scores(df, "doc_id").collect()[0]
        # vowel groups: "o" in ok -> 1; consonant-only: xyz, 123 -> 2
        assert r.n_syllables == 3
        assert r.n_words == 3

    def test_empty_and_null_survive(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            readability_scores,
        )

        df = spark.createDataFrame(
            [(1, ""), (2, None), (3, "a b")], "doc_id long, text string"
        )
        rows = {r.id: r for r in readability_scores(df, "doc_id").collect()}
        assert len(rows) == 3
        assert rows[1].flesch_r6 is None and rows[1].band == "empty"
        assert rows[2].flesch_r6 is None and rows[2].band == "empty"
        assert rows[3].band is not None


class TestKnnClassify:
    def test_hand_computed_vote(self, spark):
        from mistral_ocr_pipeline_spark.operators.similarity_df import (
            knn_classify,
        )

        seed = spark.createDataFrame(
            [(1, [1.0, 0.0], "a"), (2, [0.0, 1.0], "b"), (3, [0.8, 0.6], "a")],
            "vec_id long, embedding array<double>, label string",
        )
        unl = spark.createDataFrame(
            [(10, [0.9, 0.1])], "vec_id long, embedding array<double>"
        )
        r = knn_classify(unl, seed, k=2).collect()[0]
        # top-2 by cosine: id 1 (0.993884, 'a'), id 3 (0.861366, 'a')
        assert r.pred_label == "a"
        assert r.n_voters == 2 and r.k_used == 2
        assert abs(r.vote_r6 - (0.993884 + 0.861366)) < 1e-9

    def test_weight_tie_breaks_to_smaller_label(self, spark):
        from mistral_ocr_pipeline_spark.operators.similarity_df import (
            knn_classify,
        )

        # two seeds symmetric around the query -> identical cosines,
        # different labels: tie must go to the lexicographically smaller
        seed = spark.createDataFrame(
            [(1, [1.0, 0.0], "z"), (2, [0.0, 1.0], "a")],
            "vec_id long, embedding array<double>, label string",
        )
        unl = spark.createDataFrame(
            [(10, [1.0, 1.0])], "vec_id long, embedding array<double>"
        )
        r = knn_classify(unl, seed, k=2).collect()[0]
        assert r.pred_label == "a"

    def test_zero_norm_never_votes(self, spark):
        from mistral_ocr_pipeline_spark.operators.similarity_df import (
            knn_classify,
        )

        seed = spark.createDataFrame(
            [(1, [0.0, 0.0], "junk"), (2, [0.0, 1.0], "b")],
            "vec_id long, embedding array<double>, label string",
        )
        unl = spark.createDataFrame(
            [(10, [0.5, 0.5]), (11, [0.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        rows = {r.id: r for r in knn_classify(unl, seed, k=5).collect()}
        assert rows[10].pred_label == "b" and rows[10].k_used == 1
        # zero-norm query: every candidate filtered, NULL prediction
        assert rows[11].pred_label is None and rows[11].k_used == 0

    def test_corpus_never_shuffles(self, spark):
        from mistral_ocr_pipeline_spark.operators.similarity_df import (
            knn_classify,
        )

        seed = spark.createDataFrame(
            [(i, [float(i), 1.0], str(i % 3)) for i in range(1, 9)],
            "vec_id long, embedding array<double>, label string",
        )
        unl = spark.createDataFrame(
            [(100 + i, [1.0, float(i)]) for i in range(50)],
            "vec_id long, embedding array<double>",
        ).repartition(5)
        plan = knn_classify(unl, seed, k=3)._jdf.queryExecution().executedPlan().toString()
        # seed agg is a SinglePartition gather of the tiny labeled side;
        # the corpus path must never hash-shuffle (the whole point of the
        # broadcast array-row form vs a per-query window)
        assert "hashpartitioning" not in plan, plan


class TestCentroidOutliers:
    def test_flags_the_off_manifold_vector(self, spark):
        from mistral_ocr_pipeline_spark.operators.similarity import (
            centroid_outliers,
        )

        rows = [(i, [1.0, 0.01 * i]) for i in range(19)] + [(99, [-1.0, 0.0])]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = {r.id: r for r in centroid_outliers(df, "vec_id", "embedding", q=0.05).collect()}
        assert out[99].is_outlier
        assert sum(r.is_outlier for r in out.values()) == 1

    def test_partition_invariant(self, spark):
        from mistral_ocr_pipeline_spark.operators.similarity import (
            centroid_outliers,
        )

        rows = [(i, [0.3 * (i % 7) + 0.1, 1.0 - 0.05 * (i % 11)]) for i in range(60)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        a = sorted(map(tuple, centroid_outliers(df, "vec_id", "embedding").collect()))
        b = sorted(map(tuple, centroid_outliers(df.repartition(13), "vec_id", "embedding").collect()))
        assert a == b


class TestDoremiWeights:
    def _docs(self, spark):
        # domain 'hard': every doc is unique rare gibberish (high
        # surprisal under the corpus unigram LM); domain 'easy': the
        # same common sentence repeated (low surprisal)
        rows = [(i, f"zq{i}x wv{i}j kp{i}m", "hard") for i in range(8)] + [
            (100 + i, "the cat sat on the mat", "easy") for i in range(8)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string, source string")

    def test_excess_drives_weight_above_uniform_floor(self, spark):
        from mistral_ocr_pipeline_spark.operators.sampling import doremi_weights

        out = {r.source: r for r in doremi_weights(self._docs(spark)).collect()}
        assert set(out) == {"hard", "easy"}
        h, e = out["hard"], out["easy"]
        assert h.loss_r6 > e.loss_r6
        # easy domain is below the corpus mean -> clipped excess 0 ->
        # it gets exactly the smoothed share of a unit boost
        assert e.excess_r6 == 0.0
        assert h.excess_r6 > 0.0
        assert h.weight_r6 > e.weight_r6
        # weights form a distribution (up to the two 6-dp rounds)
        assert abs(h.weight_r6 + e.weight_r6 - 1.0) < 1e-5
        # uniform floor: nothing falls below eps/K
        for r in out.values():
            assert r.weight_r6 >= 0.1 / 2 - 1e-9

    def test_uniform_corpus_gives_uniform_weights(self, spark):
        from mistral_ocr_pipeline_spark.operators.sampling import doremi_weights

        rows = [(i, "alpha beta gamma", f"s{i % 4}") for i in range(16)]
        docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
        out = doremi_weights(docs).collect()
        assert len(out) == 4
        for r in out:
            assert r.excess_r6 == 0.0
            assert abs(r.weight_r6 - 0.25) < 1e-9

    def test_partition_invariant(self, spark):
        from mistral_ocr_pipeline_spark.operators.sampling import doremi_weights

        docs = self._docs(spark)
        a = sorted(map(tuple, doremi_weights(docs).collect()))
        b = sorted(map(tuple, doremi_weights(docs.repartition(7)).collect()))
        assert a == b


class TestTranscriptQC:
    def _t(self, spark):
        from datetime import datetime as dt

        rows = [
            # clean conv: 0..2, alternating roles, monotone ts
            ("a", 0, "user", "hi", dt(2024, 1, 1, 0, 0, 0)),
            ("a", 1, "assistant", "hello", dt(2024, 1, 1, 0, 0, 1)),
            ("a", 2, "user", "bye", dt(2024, 1, 1, 0, 0, 2)),
            # dirty conv: dup turn_idx, gap (no 1), role repeat, ts inversion
            ("b", 0, "user", "x", dt(2024, 1, 1, 0, 0, 5)),
            ("b", 0, "user", "x retry", dt(2024, 1, 1, 0, 0, 6)),
            ("b", 2, "assistant", "y", dt(2024, 1, 1, 0, 0, 4)),
            # conv starting late
            ("c", 3, "tool", "z", dt(2024, 1, 1, 0, 1, 0)),
        ]
        return spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string, ts timestamp"
        )

    def test_integrity_flags_each_corruption_class(self, spark):
        from mistral_ocr_pipeline_spark.operators.transcript_qc import (
            transcript_integrity,
        )

        out = {r.conv_id: r for r in transcript_integrity(self._t(spark)).collect()}
        a, b, c = out["a"], out["b"], out["c"]
        assert (a.n_turns, a.dup_turns, a.has_gaps, a.starts_at_zero) == (3, 0, False, True)
        assert a.role_repeats == 0 and a.ts_inversions == 0
        assert b.dup_turns == 1 and b.has_gaps and b.starts_at_zero
        assert b.role_repeats == 1, "user,user retry pair"
        assert b.ts_inversions == 1, "ts goes 6 -> 4 between turn 0 and 2"
        assert not c.starts_at_zero and c.n_turns == 1

    def test_dedup_groups_normalized_clones(self, spark):
        from mistral_ocr_pipeline_spark.operators.transcript_qc import (
            transcript_dedup_exact,
        )

        rows = [
            ("a", 0, "Hello, World!"),
            ("a", 1, "How are you?"),
            ("z-clone", 0, "hello world"),  # normalizes equal to a
            ("z-clone", 1, "how are you"),
            ("c", 0, "different"),
            ("d", 0, None),  # NULL folds to '' ...
            ("e", 0, ""),    # ... and groups with the empty string
        ]
        df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
        out = {r.conv_id: r for r in transcript_dedup_exact(df).collect()}
        assert out["a"].fingerprint == out["z-clone"].fingerprint
        assert out["a"].group_size == 2 and out["a"].is_canonical
        assert not out["z-clone"].is_canonical
        assert out["c"].group_size == 1 and out["c"].is_canonical
        assert out["d"].fingerprint == out["e"].fingerprint

    def test_dedup_partition_invariant(self, spark):
        from mistral_ocr_pipeline_spark.operators.transcript_qc import (
            transcript_dedup_exact,
        )

        rows = [(f"c{i % 5}", i // 5, f"t{i % 35}") for i in range(70)]
        df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
        a = sorted(map(tuple, transcript_dedup_exact(df).collect()))
        b = sorted(map(tuple, transcript_dedup_exact(df.repartition(9)).collect()))
        assert a == b


class TestHeldoutSurprisal:
    def test_oov_floors_and_train_separation(self, spark):
        import math

        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            bigram_surprisal_heldout,
        )

        train = spark.createDataFrame(
            [(1, "the cat sat"), (2, "the cat ran")], "doc_id long, text string"
        )
        score = spark.createDataFrame(
            [
                (10, "the cat sat"),   # every bigram seen
                (11, "zq wv kp"),      # fully OOV: prev unseen -> -ln(1/V)
                (12, "x"),             # < 2 tokens -> no row
            ],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in bigram_surprisal_heldout(train, score, "doc_id").collect()}
        assert set(out) == {10, 11}
        assert out[10].oov_pairs == 0
        assert out[11].oov_pairs == out[11].n_pairs == 2
        # train vocab V = {the, cat, sat, ran} = 4; unseen prev floor is
        # exactly ln(4) per pair (micro-rounded)
        assert abs(out[11].surprisal - round(math.log(4), 6)) < 2e-6
        # in-domain text must score strictly lower than the OOV floor
        assert out[10].surprisal < out[11].surprisal

    def test_partition_invariant(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            bigram_surprisal_heldout,
        )

        rows = [(i, f"w{i % 9} w{(i + 3) % 9} w{(i + 5) % 9}") for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        tr, sc = df.filter("doc_id % 4 = 0"), df.filter("doc_id % 4 != 0")
        a = sorted(map(tuple, bigram_surprisal_heldout(tr, sc, "doc_id").collect()))
        b = sorted(
            map(
                tuple,
                bigram_surprisal_heldout(
                    tr.repartition(5), sc.repartition(7), "doc_id"
                ).collect(),
            )
        )
        assert a == b


class TestDoremiResample:
    def test_rates_and_hash_gate(self, spark):
        import hashlib

        from mistral_ocr_pipeline_spark.operators.sampling import (
            doremi_resample,
            doremi_weights,
        )

        rows = [(i, f"zq{i}x wv{i}j kp{i}m", "hard") for i in range(30)] + [
            (100 + i, "the cat sat on the mat", "easy") for i in range(30)
        ]
        docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
        w = {r.source: r for r in doremi_weights(docs).collect()}
        kept = doremi_resample(docs).collect()
        rates = {r.source: r.rate_r6 for r in kept}
        # equal doc counts -> the higher-weight domain is the max-ratio
        # one and keeps everything
        assert rates["hard"] == 1.0
        assert 0.0 < rates["easy"] < 1.0
        assert abs(rates["easy"] - round(
            (w["easy"].weight_r6 / 30) / (w["hard"].weight_r6 / 30), 6
        )) < 1e-9
        # per-doc fate replays the md5 rule exactly
        kept_ids = {r.doc_id for r in kept}
        for i, _, src in [(r[0], r[1], r[2]) for r in rows]:
            frac = int(hashlib.md5(f"dmx:{i}".encode()).hexdigest()[:8], 16) / 2**32
            assert (i in kept_ids) == (frac < rates[src])

    def test_partition_invariant(self, spark):
        from mistral_ocr_pipeline_spark.operators.sampling import doremi_resample

        rows = [(i, f"t{i % 13} u{i % 7} v{i % 5}", f"s{i % 3}") for i in range(60)]
        docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
        a = sorted(map(tuple, doremi_resample(docs).collect()))
        b = sorted(map(tuple, doremi_resample(docs.repartition(11)).collect()))
        assert a == b


class TestDoremiResampleIdCol:
    def test_non_default_id_col(self, spark):
        from mistral_ocr_pipeline_spark.operators.sampling import doremi_resample

        rows = [(i, f"t{i % 7} u{i % 5}", f"s{i % 2}") for i in range(40)]
        docs = spark.createDataFrame(rows, "id long, text string, source string")
        renamed = doremi_resample(docs, id_col="id")
        default = doremi_resample(
            docs.withColumnRenamed("id", "doc_id"), id_col="doc_id"
        )
        assert sorted(map(tuple, renamed.collect())) == sorted(
            map(tuple, default.collect())
        )


class TestParetoQualityGate:
    def _gate(self, spark, rows, **kw):
        from mistral_ocr_pipeline_spark.operators.sampling import pareto_quality_gate

        df = spark.createDataFrame(rows, "doc_id long, q double")
        return {
            r.doc_id: r
            for r in pareto_quality_gate(df, "q", "doc_id", **kw).collect()
        }

    def test_keep_iff_score_beats_threshold(self, spark):
        rows = [(i, 0.5) for i in range(200)]
        out = self._gate(spark, rows, alpha=2.0, x_m=0.2)
        for r in out.values():
            assert r.keep == (r.score_r6 > r.pareto_threshold)
            assert 0.0 <= r.pareto_u < 1.0
            assert r.pareto_threshold <= 1.0  # clamped

    def test_score_monotonicity_same_id(self, spark):
        # same id -> same threshold; a higher score can only flip drop->keep
        low = self._gate(spark, [(i, 0.2) for i in range(100)], alpha=2.0, x_m=0.2)
        high = self._gate(spark, [(i, 0.9) for i in range(100)], alpha=2.0, x_m=0.2)
        for i in range(100):
            assert low[i].pareto_threshold == high[i].pareto_threshold
            if low[i].keep:
                assert high[i].keep

    def test_tail_survives_but_quality_biased(self, spark):
        # stochastic gate: some low-score docs survive (tail diversity),
        # and the keep RATE rises with score
        low = self._gate(spark, [(i, 0.25) for i in range(400)], alpha=2.0, x_m=0.2)
        high = self._gate(spark, [(i, 0.8) for i in range(400)], alpha=2.0, x_m=0.2)
        n_low = sum(r.keep for r in low.values())
        n_high = sum(r.keep for r in high.values())
        assert 0 < n_low < 400  # neither amputated nor all-pass
        assert n_high > n_low
        # analytic check: P(keep | s) = P(x_m * (1-u)^(-1/a) < s)
        #   = 1 - (x_m/s)^a  for s > x_m; s=0.25, x_m=0.2, a=2 -> 0.36
        assert abs(n_low / 400 - (1 - (0.2 / 0.25) ** 2)) < 0.08

    def test_salt_decorrelates(self, spark):
        a = self._gate(spark, [(i, 0.5) for i in range(200)], salt="a")
        b = self._gate(spark, [(i, 0.5) for i in range(200)], salt="b")
        assert any(a[i].keep != b[i].keep for i in range(200))


class TestTokenizerFertility:
    def test_pinned_counts(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            tokenizer_fertility,
        )

        rows = [
            # en: "the cat is on the mat." -> 6 ws tokens; bpe: 6 words + '.'
            (1, "the cat is on the mat."),
            # en: "it was the best of times" -> 6 ws, 6 bpe
            (2, "it was the best of times"),
            # unknown: no stopword/script hits
            (3, "zzz qqq"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.lang_id: r for r in tokenizer_fertility(df).collect()}
        en = out["en"]
        assert en.n_docs == 2 and en.n_words == 12 and en.n_subwords == 13
        assert abs(en.fertility_r6 - round(13 / 12, 6)) < 1e-9
        # chars: len("the cat is on the mat.")=22, len("it was the best of times")=24
        assert abs(en.chars_per_token_r6 - round(46 / 13, 6)) < 1e-9
        unk = out["unknown"]
        assert unk.n_docs == 1 and unk.n_words == 2 and unk.n_subwords == 2

    def test_empty_text_no_division_blowup(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            tokenizer_fertility,
        )

        df = spark.createDataFrame([(1, ""), (2, "   ")], "doc_id long, text string")
        rows = tokenizer_fertility(df).collect()
        assert len(rows) == 1 and rows[0].lang_id == "unknown"
        assert rows[0].n_words == 0 and rows[0].fertility_r6 == 0.0


class TestC4Clean:
    def _run(self, spark, rows):
        from mistral_ocr_pipeline_spark.operators.text_analysis import c4_clean

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {
            r.id: r
            for r in c4_clean(
                df, blocklist=("casino bonus",)
            ).collect()
        }

    def test_line_and_page_rules(self, spark):
        good = "alpha beta gamma delta epsilon.\nok\nzeta eta theta iota kappa!\nclosing remarks are here today."
        out = self._run(
            spark,
            [
                (1, good),
                # first line lacks terminal punct -> only 2 sentences -> drop
                (2, "alpha beta gamma delta epsilon\nzeta eta theta iota kappa.\nclosing remarks are here today."),
                (3, good + "\nLorem Ipsum dolor sit."),
                (4, good + "\nif (x) { y(); }"),
                (5, good + "\nbig CASINO Bonus now offered here."),
                (6, None),
            ],
        )
        r1 = out[1]
        # "ok" fails the 5-word minimum; the other three lines survive
        assert (r1.n_lines, r1.n_kept_lines, r1.n_sentences) == (4, 3, 3)
        assert r1.keep and "ok" not in r1.clean_text.split("\n")
        r2 = out[2]
        assert r2.n_kept_lines == 2 and r2.n_sentences == 2 and not r2.keep
        assert not out[3].keep and out[3].has_lorem
        assert not out[4].keep and out[4].has_brace
        assert not out[5].keep and out[5].has_blocklist
        # NULL text survives as an empty dropped page
        r6 = out[6]
        assert r6.clean_text == "" and r6.n_kept_lines == 0 and not r6.keep

    def test_quote_terminal_and_word_count_on_trimmed(self, spark):
        out = self._run(
            spark,
            [(1, '  he said "five words right here."  \nshort line.')],
        )
        r = out[1]
        # trimmed line ends in a quote -> kept; "short line." has 2 words
        assert r.n_kept_lines == 1 and r.clean_text.endswith('"')


class TestMojibakeRepair:
    def test_artifact_table_is_true_cp1252_misdecode(self):
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            MOJIBAKE_FIXES,
        )

        art = dict((g, b) for b, g in MOJIBAKE_FIXES)
        # the canonical example: RIGHT SINGLE QUOTE U+2019
        assert art["’"] == "â€™"  # 'a-circ euro tm'
        # non-overlap: no artifact is a substring of another
        bads = [b for b, _ in MOJIBAKE_FIXES]
        for i, b1 in enumerate(bads):
            for j, b2 in enumerate(bads):
                assert i == j or b1 not in b2, (b1, b2)

    def test_repair_counts_and_null(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            MOJIBAKE_FIXES,
            mojibake_repair,
        )

        art = dict((g, b) for b, g in MOJIBAKE_FIXES)
        corrupted = f"don{art['’']}t say caf{art['é']} twice caf{art['é']}"
        rows = [(1, corrupted), (2, "already clean"), (3, None)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.id: r for r in mojibake_repair(df, "doc_id").collect()}
        assert out[1].repaired == "don’t say café twice café"
        assert out[1].n_mojibake == 3
        assert out[2].repaired == "already clean" and out[2].n_mojibake == 0
        assert out[3].repaired == "" and out[3].n_mojibake == 0


class TestRenderSft:
    def test_spans_slice_back_to_turn_text(self, spark):
        from mistral_ocr_pipeline_spark.operators.transcript_qc import (
            transcript_render_sft,
        )

        rows = [
            ("c1", 0, "user", "hello there", None, None),
            ("c1", 1, "assistant", "hi, how can I help?", None, None),
            ("c1", 2, "user", None, None, None),  # NULL text turn
            ("c1", 3, "assistant", "bye", None, None),
            ("c2", 0, "user", "no assistant here", None, None),
        ]
        df = spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, "
            "tool string, ts timestamp",
        )
        out = {r.conv_id: r for r in transcript_render_sft(df).collect()}
        c1 = out["c1"]
        assert c1.rendered == (
            "<|user|>hello there\n<|assistant|>hi, how can I help?\n"
            "<|user|>\n<|assistant|>bye"
        )
        # the trainer-facing invariant: each span slices the rendered
        # string back to exactly the trainable turn's text
        spans = [tuple(map(int, s.split(":"))) for s in c1.train_spans.split(",")]
        assert [c1.rendered[a:b] for a, b in spans] == [
            "hi, how can I help?",
            "bye",
        ]
        assert (c1.n_turns, c1.n_trainable) == (4, 2)
        c2 = out["c2"]
        assert c2.train_spans == "" and c2.n_trainable == 0


class TestLRQualityClassifier:
    """`lr_quality_classifier` — unrolled-GD trainer: value-pin against
    an independent pure-Python model (the BPE-kernel convention), plus
    separability, evidence-free survival, and zero-train safety."""

    def _reference(self, rows, nb=8, it=5, lr=4.0):
        import hashlib
        import re
        from decimal import ROUND_HALF_UP, Decimal

        def norm_key(t):
            if t is None:
                return ""
            s = re.sub(r"[^\w\s/\-]", "", t.lower())
            return re.sub(r"\s+", " ", s).strip()

        def bucket(tok):
            return int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % nb

        def rnd(x):
            return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))

        feats = {}
        for i, t, lab, tr in rows:
            ts = [x for x in norm_key(t).split(" ") if x]
            n = len(ts)
            f = [
                rnd(sum(1 for x in ts if bucket(x) == b) / n * 1e6) if n else 0
                for b in range(nb)
            ]
            feats[i] = (f, n, 1.0 if lab else 0.0, bool(tr))
        w, wb = [0] * nb, 0
        ntr = sum(1 for v in feats.values() if v[3])
        for _ in range(it if ntr else 0):
            G = [0] * (nb + 1)
            for f, n, y, tr in feats.values():
                if not tr:
                    continue
                mp = sum(a * b for a, b in zip(w, f)) + wb * 1_000_000
                m = mp / 1e12
                r = (0.5 + 0.5 * m / (1.0 + abs(m))) - y
                for j in range(nb):
                    G[j] += rnd(r * f[j])
                G[nb] += rnd(r * 1e6)
            w = [w[j] - rnd(lr * G[j] / ntr) for j in range(nb)]
            wb = wb - rnd(lr * G[nb] / ntr)
        out = {}
        for i, (f, n, y, tr) in feats.items():
            mp = sum(a * b for a, b in zip(w, f)) + wb * 1_000_000
            # F.round(double, 6) goes through BigDecimal.valueOf =
            # Double.toString (SHORTEST round-trip repr), then HALF_UP;
            # python's repr() is the same shortest representation, so
            # Decimal(repr(x)) reproduces it exactly — Decimal(x) (exact
            # binary value) sits below the decimal tie and diverges
            s6 = float(
                Decimal(repr(mp / 1e12)).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            )
            out[i] = (mp > 0, n, s6)
        return out

    def _rows(self):
        good = "careful measured prose with varied structure and clarity"
        bad = "buy now click here free offer winner cash prize deal"
        return (
            [(i, good + f" variant {i}", True, True) for i in range(8)]
            + [(i + 8, bad + f" spam {i}", False, True) for i in range(8)]
            + [(100, good + " unseen", True, False),
               (101, bad + " unseen", False, False)]
            + [(102, "", False, False), (103, None, False, False)]
        )

    def test_matches_independent_model_exactly(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            lr_quality_classifier,
        )

        rows = self._rows()
        df = spark.createDataFrame(
            rows, "id long, text string, label boolean, is_train boolean"
        )
        got = {
            r.id: r
            for r in lr_quality_classifier(
                df, "id", "label", "is_train", n_buckets=8, n_iters=5, lr=4.0
            ).collect()
        }
        ref = self._reference(rows)
        assert len(got) == len(ref)
        for i, (pred, n, score) in ref.items():
            g = got[i]
            assert (g.pred, g.n_grams, float(g.score)) == (pred, n, score), i

    def test_separates_and_scores_heldout(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            lr_quality_classifier,
        )

        df = spark.createDataFrame(
            self._rows(), "id long, text string, label boolean, is_train boolean"
        )
        out = {
            r.id: r
            for r in lr_quality_classifier(
                df, "id", "label", "is_train", n_buckets=8, n_iters=5, lr=4.0
            ).collect()
        }
        for i in range(8):
            assert out[i].pred is True and out[i + 8].pred is False
        assert out[100].pred is True and out[101].pred is False
        # evidence-free docs survive and score exactly the bias
        assert out[102].n_grams == 0 and out[103].n_grams == 0
        assert out[102].score == out[103].score

    def test_partition_invariance(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            lr_quality_classifier,
        )

        rows = self._rows()
        a = spark.createDataFrame(
            rows, "id long, text string, label boolean, is_train boolean"
        )
        one = sorted(
            map(
                tuple,
                lr_quality_classifier(
                    a, "id", "label", "is_train", n_buckets=8, n_iters=3
                ).collect(),
            )
        )
        many = sorted(
            map(
                tuple,
                lr_quality_classifier(
                    a.repartition(7), "id", "label", "is_train",
                    n_buckets=8, n_iters=3,
                ).collect(),
            )
        )
        assert one == many

    def test_no_train_rows_scores_zero(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            lr_quality_classifier,
        )

        df = spark.createDataFrame(
            [(1, "some text", True, False), (2, "other words", False, False)],
            "id long, text string, label boolean, is_train boolean",
        )
        out = {
            r.id: r
            for r in lr_quality_classifier(
                df, "id", "label", "is_train", n_buckets=8, n_iters=4
            ).collect()
        }
        # untrained model: zero weights, zero bias -> score 0, pred False
        assert all(r.score == 0.0 and r.pred is False for r in out.values())


class TestKNBigramSurprisal:
    """`kn_bigram_surprisal` — interpolated Kneser-Ney: exact value-pin
    against an independent python model, the continuation-probability
    property KN exists for, and the word-salad ordering check."""

    def _reference(self, rows, D=0.75):
        import math
        import re
        from collections import Counter
        from decimal import ROUND_HALF_UP, Decimal

        def norm_key(t):
            if t is None:
                return ""
            s = re.sub(r"[^\w\s/\-]", "", t.lower())
            return re.sub(r"\s+", " ", s).strip()

        def rnd(x):
            return int(Decimal(x).quantize(Decimal(1), rounding=ROUND_HALF_UP))

        seqs = {i: [x for x in norm_key(t).split(" ") if x] for i, t in rows}
        c2 = Counter()
        for ts in seqs.values():
            for a, b in zip(ts, ts[1:]):
                c2[(a, b)] += 1
        ctx, n1pf, n1pb = Counter(), Counter(), Counter()
        for (a, b), c in c2.items():
            ctx[a] += c
            n1pf[a] += 1
            n1pb[b] += 1
        n1pp = len(c2)
        micro = {
            (a, b): rnd(
                -math.log(
                    (c - D) / ctx[a] + D * n1pf[a] / ctx[a] * (n1pb[b] / n1pp)
                )
                * 1e6
            )
            for (a, b), c in c2.items()
        }
        out = {}
        for i, ts in seqs.items():
            ms = [micro[(a, b)] for a, b in zip(ts, ts[1:])]
            if not ms:
                continue
            s6 = float(
                Decimal(repr(sum(ms) / 1e6 / len(ms))).quantize(
                    Decimal("0.000001"), rounding=ROUND_HALF_UP
                )
            )
            out[i] = (len(ms), s6)
        return out

    def test_matches_independent_model_exactly(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            kn_bigram_surprisal,
        )

        rows = [
            (1, "san francisco is in california"),
            (2, "new york is in new york state"),
            (3, "francisco york new san"),
            (4, "one"),          # < 2 tokens: no row
            (5, ""),
            (6, None),
        ]
        df = spark.createDataFrame(rows, "id long, text string")
        got = {
            r.id: (r.n_pairs, float(r.kn_surprisal))
            for r in kn_bigram_surprisal(df, "id").collect()
        }
        ref = self._reference(rows)
        assert got == ref
        assert 4 not in got and 5 not in got and 6 not in got

    def test_continuation_probability_property(self, spark):
        """The KN point: a word that only ever follows ONE history
        ("francisco" after "san") gets a LOW continuation probability,
        so an unusual pairing with it is more surprising than with an
        equally-frequent word seen after many histories."""
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            kn_bigram_surprisal,
        )

        corpus = [(i, "san francisco hosts events") for i in range(6)]
        corpus += [
            (10, "big data"), (11, "small data"), (12, "open data"),
            (13, "raw data"), (14, "fast data"), (15, "new data"),
        ]
        # probes: same bigram count (1 each), same context word
        corpus += [(20, "odd francisco"), (21, "odd data")]
        df = spark.createDataFrame(corpus, "id long, text string")
        got = {
            r.id: float(r.kn_surprisal)
            for r in kn_bigram_surprisal(df, "id").collect()
        }
        # "data" follows 7 distinct histories, "francisco" only 2 —
        # continuation backoff makes odd+francisco the more surprising
        assert got[20] > got[21]

    def test_salad_scores_above_fluent(self, spark):
        from mistral_ocr_pipeline_spark.operators.text_analysis import (
            kn_bigram_surprisal,
        )

        fluent = "the quick brown fox jumps over the lazy dog"
        rows = [(i, fluent) for i in range(1, 9)] + [
            (9, "dog the over quick lazy fox brown jumps the")
        ]
        df = spark.createDataFrame(rows, "id long, text string")
        got = {
            r.id: float(r.kn_surprisal)
            for r in kn_bigram_surprisal(df, "id").collect()
        }
        assert got[9] > got[1]


class TestCodeFenceBlocks:
    def _blocks(self, spark, text):
        from mistral_ocr_pipeline_spark.operators.codeblocks import (
            code_fence_blocks,
        )

        df = spark.createDataFrame([(1, text)], "doc_id long, text string")
        return code_fence_blocks(df).orderBy("block_idx").collect()

    def test_two_blocks_with_tags_and_attrs(self, spark):
        md = (
            "prose\n```python\na = 1\nb = 2\n```\nmiddle\n"
            "```sql  limit=5\nSELECT 1\n```\ntail"
        )
        out = self._blocks(spark, md)
        assert [(r.block_idx, r.lang, r.code) for r in out] == [
            (1, "python", "a = 1\nb = 2"),
            (2, "sql", "SELECT 1"),
        ]
        assert out[0].n_lines == 2 and out[0].n_chars == len("a = 1\nb = 2")

    def test_empty_block_and_bare_fence(self, spark):
        out = self._blocks(spark, "```\n```\nafter")
        assert len(out) == 1
        assert out[0].lang == "" and out[0].code == ""
        assert out[0].n_lines == 0 and out[0].n_chars == 0

    def test_unclosed_fence_runs_to_eof_and_lowers_tag(self, spark):
        out = self._blocks(spark, "pre\n```JS\nx\ny")
        assert len(out) == 1
        assert out[0].lang == "js" and out[0].code == "x\ny"

    def test_close_marker_with_trailing_text_still_closes(self, spark):
        # fences TOGGLE (documented subset): '```end' closes the block
        out = self._blocks(spark, "```py\ncode\n```end\nprose")
        assert [(r.lang, r.code) for r in out] == [("py", "code")]

    def test_no_fences_and_null_text(self, spark):
        from mistral_ocr_pipeline_spark.operators.codeblocks import (
            code_fence_blocks,
        )

        df = spark.createDataFrame(
            [(1, "just prose\nno code"), (2, None)],
            "doc_id long, text string",
        )
        assert code_fence_blocks(df).count() == 0

    def test_lang_stats_rollup(self, spark):
        from mistral_ocr_pipeline_spark.operators.codeblocks import (
            code_lang_stats,
        )

        rows = [
            (1, "```py\na\n```\n```py\nbb\n```"),
            (2, "```py\nccc\n```"),
            (3, "```go\nx\n```"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = {r.lang: r for r in code_lang_stats(df).collect()}
        assert out["py"].n_blocks == 3 and out["py"].n_docs == 2
        assert out["py"].total_lines == 3 and out["py"].total_chars == 6
        assert out["go"].n_blocks == 1 and out["go"].n_docs == 1

    def test_zero_shuffle_plan(self, spark):
        from mistral_ocr_pipeline_spark.operators.codeblocks import (
            code_fence_blocks,
        )

        df = spark.createDataFrame(
            [(1, "```py\na\n```")], "doc_id long, text string"
        )
        plan = code_fence_blocks(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
