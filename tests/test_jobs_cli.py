"""Smoke test for the spark-submit job surface: one subprocess run of
curation_job end to end (scrub → gate → dedup → split → UniMax → pack),
asserting every output table published in the single atomic commit.
One JVM spin-up (~40 s) — kept to a single invocation on the smallest
scale for suite-time reasons; extract/neardup jobs share the same
catalog publish path, which test_checkpoint_resume covers in-process."""

import json
import os
import subprocess
import sys


def test_curation_job_cli(tmp_path):
    wh = str(tmp_path / "wh")
    env = dict(os.environ, PYTHONPATH="/root/repo")
    proc = subprocess.run(
        [
            sys.executable, "spark_jobs/curation_job.py",
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--warehouse", wh,
            "--lang-col", "lang",
            "--unimax-budget-tokens", "4000",
            "--unimax-max-epochs", "2",
            "--pack-budget", "256",
        ],
        cwd="/root/repo", env=env, capture_output=True, text=True,
        timeout=400,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    head = os.path.join(wh, "_HEAD")
    assert os.path.exists(head)
    manifest = json.load(
        open(os.path.join(wh, "_manifests", open(head).read().strip()))
    )
    assert set(manifest["tables"]) == {
        "curated", "curation_rollup", "pack_assignment", "pack_stats",
        "unimax_plan", "unimax_stream",
    }


def test_ann_index_job_cli(tmp_path):
    """build → add → search round-trip through the spark-submit surface:
    the index + model publish atomically; `add` encodes a NEW batch with
    the persisted frozen model (no retrain, no history rescan) and the
    added vectors are immediately retrievable — each query finds its
    added exact clone at the top."""
    import duckdb

    wh = str(tmp_path / "wh_ann")
    out = str(tmp_path / "topk")
    env = dict(os.environ, PYTHONPATH="/root/repo")
    common = dict(cwd="/root/repo", env=env, capture_output=True, text=True,
                  timeout=400)
    corpus = "/root/testdata/sf0.001/embeddings.parquet"
    b = subprocess.run(
        [sys.executable, "spark_jobs/ann_index_job.py", "build",
         "--corpus", corpus, "--warehouse", wh,
         "--n-centroids", "8", "--m", "8", "--ksub", "8",
         "--pq-iters", "2", "--by-residual", "--keep-vec"],
        **common,
    )
    assert b.returncode == 0, b.stderr[-2000:]
    stats = json.loads(b.stdout.strip().splitlines()[-1])
    assert stats["indexed"] == 500 and stats["by_residual"]

    batch2 = str(tmp_path / "batch2.parquet")
    duckdb.sql(
        f"copy (select vec_id + 10000 as vec_id, embedding from '{corpus}')"
        f" to '{batch2}' (format parquet)"
    )
    a = subprocess.run(
        [sys.executable, "spark_jobs/ann_index_job.py", "add",
         "--corpus", batch2, "--warehouse", wh],
        **common,
    )
    assert a.returncode == 0, a.stderr[-2000:]
    astats = json.loads(a.stdout.strip().splitlines()[-1])
    assert astats == {"added": 500, "indexed": 1000}

    s = subprocess.run(
        [sys.executable, "spark_jobs/ann_index_job.py", "search",
         "--queries", corpus, "--warehouse", wh,
         "--k", "3", "--n-probe", "2", "--refine", "16", "--output", out],
        **common,
    )
    assert s.returncode == 0, s.stderr[-2000:]
    n = json.loads(s.stdout.strip().splitlines()[-1])["results"]
    assert 1400 <= n <= 1500  # ~k per query; a sparse probed cell may trim
    # the added exact clone of (almost) every query must be retrieved —
    # proof the appended codes live in the same searchable index (ties
    # at probed-cell boundaries may cost a few)
    clone_hits = duckdb.sql(
        f"select count(*) from '{out}/*.parquet'"
        " where vec_id = query_id + 10000"
    ).fetchone()[0]
    assert clone_hits >= 490, clone_hits
    manifest = json.load(
        open(os.path.join(wh, "_manifests",
                          open(os.path.join(wh, "_HEAD")).read().strip()))
    )
    assert set(manifest["tables"]) == {"ivfpq_index", "ivfpq_model"}


def test_sft_job_cli(tmp_path):
    """Transcript SFT curation through the spark-submit surface: fused
    facts -> keep rule -> PII scrub -> window cut, three tables in one
    atomic commit; turns in kept conversations all carry a window id."""
    import pyarrow.parquet as pq

    src = str(tmp_path / "transcripts")
    wh = str(tmp_path / "wh_sft")
    env = dict(os.environ, PYTHONPATH="/root/repo")
    mk = subprocess.run(
        [
            sys.executable, "-c",
            "import sys; sys.path.insert(0, '/root/repo');"
            "from mistral_ocr_pipeline_spark.session import get_spark;"
            "from mistral_ocr_pipeline_spark.plans.entry_queries import"
            " transcripts_from_documents;"
            "s = get_spark(app_name='mk', cores=2);"
            "transcripts_from_documents(s.read.parquet("
            "'/root/testdata/sf0.001/documents.parquet'))"
            f".write.mode('overwrite').parquet('{src}')",
        ],
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=400,
    )
    assert mk.returncode == 0, mk.stderr[-2000:]
    proc = subprocess.run(
        [
            sys.executable, "spark_jobs/sft_job.py",
            "--input", src, "--warehouse", wh,
            "--budget", "128", "--scrub-pii",
        ],
        cwd="/root/repo", env=env, capture_output=True, text=True, timeout=400,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    head = os.path.join(wh, "_HEAD")
    manifest = json.load(
        open(os.path.join(wh, "_manifests", open(head).read().strip()))
    )
    assert set(manifest["tables"]) == {"sft_turns", "sft_facts", "sft_rollup"}
    turns = pq.read_table(
        os.path.join(wh, manifest["tables"]["sft_turns"])
    ).to_pylist()
    facts = pq.read_table(
        os.path.join(wh, manifest["tables"]["sft_facts"])
    ).to_pylist()
    kept = {r["conv_id"] for r in facts if r["keep"]}
    assert kept and {t["conv_id"] for t in turns} == kept
    assert all(t["win_id"] >= 0 and t["turn_tokens"] >= 0 for t in turns)
