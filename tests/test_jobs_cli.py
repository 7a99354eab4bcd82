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
