"""Two-parallelism scaling run — the sandbox proxy for the north rule's
"N vs 4N executors, efficiency ≥ 0.8" criterion (no real cluster here;
driver instruction: evidence it with local[8] vs local[32] on the SAME
deterministic input and report both throughputs + efficiency).

Each measurement runs in a fresh subprocess (own JVM) so the two
parallelism levels cannot share executor state; one warmup drain per JVM
amortizes class-loading/codegen before the timed drain.

Usage:
  python tools/scaling_run.py                 # orchestrate + write BENCH/BASELINE.md
  python tools/scaling_run.py --child N REP   # one measurement (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(ROOT))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REP = int(os.environ.get("SPARK_GRAFT_SCALING_REP", "60"))


def child(cores: int, rep: int) -> None:
    from bench import mixed_transcripts
    from mistral_ocr_pipeline_spark.plans.extract_pipeline import extract_transcripts
    from mistral_ocr_pipeline_spark.session import get_spark

    spark = get_spark(app_name=f"scaling_{cores}", cores=cores)
    t_input = mixed_transcripts(spark, SF_DIR, rep).persist()
    n_turns = t_input.count()

    def drain():
        extract_transcripts(t_input, num_partitions=cores * 4).write.format(
            "noop"
        ).mode("overwrite").save()

    drain()  # warmup (codegen, python worker pool spin-up)
    t0 = time.perf_counter()
    drain()
    sec = time.perf_counter() - t0
    print(
        json.dumps(
            {"cores": cores, "turns": n_turns, "sec": round(sec, 3),
             "turns_per_sec": round(n_turns / sec, 1)}
        )
    )
    spark.stop()


def measure(cores: int) -> dict:
    out = subprocess.run(
        [sys.executable, __file__, "--child", str(cores), str(REP)],
        capture_output=True, text=True, cwd=str(ROOT), timeout=1800,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child(int(sys.argv[2]), int(sys.argv[3]))
        return
    n = measure(8)
    n4 = measure(32)
    eff = n4["turns_per_sec"] / (4 * n["turns_per_sec"])
    report = f"""# BENCH — scaling evidence (N vs 4N)

North-rule criterion: throughput scaling efficiency ≥ 0.8 between N and 4N
executors.  Sandbox proxy (per driver instruction): the same extraction job
on the same deterministic input at two parallelism levels.

Input: mixed-payload transcripts (1/3 plain, 1/3 HTML, 1/3 PDF-layout)
derived from `{SF_DIR}/documents.parquet` × {REP} replication =
{n["turns"]} turns.  Job: salted repartition → mapInPandas extraction →
noop sink.  Fresh JVM per level; one warmup drain before timing.

| parallelism | turns | wall sec | turns/sec |
|---|---|---|---|
| local[8]  (N)  | {n["turns"]} | {n["sec"]} | {n["turns_per_sec"]} |
| local[32] (4N) | {n4["turns"]} | {n4["sec"]} | {n4["turns_per_sec"]} |

**Scaling efficiency = {n4["turns_per_sec"]} / (4 × {n["turns_per_sec"]}) =
{eff:.3f}** (target ≥ 0.8)

Caveat: local[8] vs local[32] shares one machine's memory bandwidth and
page cache — a conservative proxy for independent executors (real
executors add network shuffle but remove core contention; this job has no
shuffle after the salted repartition, so the proxy is close).
"""
    (ROOT / "BENCH").mkdir(exist_ok=True)
    (ROOT / "BENCH" / "BASELINE.md").write_text(report)
    print(json.dumps({"n": n, "n4": n4, "efficiency": round(eff, 3)}))


if __name__ == "__main__":
    main()
