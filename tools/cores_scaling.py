"""N→4N CORES scaling evidence: the same job at local[8] vs local[32].

Companion to tools/scaling_bench.py (which models N→4N EXECUTORS with a
local standalone cluster of isolated worker JVMs).  This variant holds
the process architecture fixed — ONE JVM — and quadruples the cores, so
it isolates the engine's own scaling behavior from the sandbox host's
multi-process memory-management ceiling (documented in
BENCH/BASELINE.md: pure-ALU work scales near-linearly to 32 procs, but
any allocation-heavy MULTI-PROCESS workload collapses past ~8 JVMs).

Protocol: corpus materialized once; configurations alternated
8,32,8,32; best-of-3 per child process (fresh JVM each); efficiency =
(T_8 / T_32) / 4.

Usage:
    python tools/cores_scaling.py            # prints JSON; appends BENCH
    _CORES_CHILD=8 _SCALING_CORPUS=... python tools/cores_scaling.py
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAIRS = int(os.environ.get("SPARK_GRAFT_SCALE_PAIRS", "3"))
N_CORES = int(os.environ.get("SPARK_GRAFT_CORES_N", "8"))
N4_CORES = int(os.environ.get("SPARK_GRAFT_CORES_4N", "32"))
REPS = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "3"))


def child(cores: int) -> None:
    from pyspark.sql import functions as F

    from gorilla_tsc_spark.operators.encode import encode_blocks
    from gorilla_tsc_spark.operators.rollup import rollup_from_block_meta
    from gorilla_tsc_spark.session import get_spark
    from gorilla_tsc_spark.sources.transcripts import synthesize_transcripts

    corpus = os.environ["_SCALING_CORPUS"]
    spark = get_spark(f"cores-scaling-{cores}", cores=cores,
                      shuffle_partitions=cores * 2)
    warm = synthesize_transcripts(spark, n_convs=64, max_turns=50,
                                  partitions=cores)
    encode_blocks(warm).count()

    def job():
        t = spark.read.parquet(corpus)
        blocks = encode_blocks(t).persist()
        r = blocks.agg(F.sum("n_points"), F.count(F.lit(1))).first()
        tier_rows = rollup_from_block_meta(blocks).count()
        blocks.unpersist()
        return int(r[0]), int(r[1]), tier_rows

    best = float("inf")
    for _ in range(REPS):
        t0 = time.time()
        n_points, n_blocks, tier_rows = job()
        best = min(best, time.time() - t0)
    n_turns = n_points // 3
    print(json.dumps({
        "cores": cores, "wall_encode_rollup_sec": round(best, 2),
        "n_turns": n_turns, "n_points": n_points, "n_blocks": n_blocks,
        "tier_rows": tier_rows, "turns_per_sec": round(n_turns / best, 1),
    }))
    spark.stop()


def main() -> None:
    if os.environ.get("_CORES_CHILD"):
        child(int(os.environ["_CORES_CHILD"]))
        return
    from tools.scaling_bench import generate_corpus

    corpus = os.environ.get("_SCALING_CORPUS")
    if not corpus:
        corpus = os.path.join(tempfile.mkdtemp(prefix="cores_scaling_"),
                              "transcripts")
        print(f"materializing corpus at {corpus}", file=sys.stderr)
        generate_corpus(corpus)

    results: dict[int, list[dict]] = {N_CORES: [], N4_CORES: []}
    for _ in range(PAIRS):
        for cores in (N_CORES, N4_CORES):
            env = dict(os.environ, _CORES_CHILD=str(cores),
                       _SCALING_CORPUS=corpus,
                       SPARK_GRAFT_SCALE_REPS=str(REPS))
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env,
                capture_output=True, text=True, check=True)
            row = json.loads(out.stdout.strip().splitlines()[-1])
            results[cores].append(row)
            print(json.dumps(row), flush=True)

    best8 = min(r["wall_encode_rollup_sec"] for r in results[N_CORES])
    best32 = min(r["wall_encode_rollup_sec"] for r in results[N4_CORES])
    eff = (best8 / best32) / 4.0
    summary = {
        "job": "encode+rollup (same shape as scaling_bench)",
        "cores_n": N_CORES, "cores_4n": N4_CORES,
        "local_n_best_sec": best8, "local_4n_best_sec": best32,
        "local_n_turns_per_sec": max(r["turns_per_sec"] for r in results[N_CORES]),
        "local_4n_turns_per_sec": max(r["turns_per_sec"] for r in results[N4_CORES]),
        "cores_scaling_efficiency": round(eff, 3),
        "pairs": PAIRS, "reps_per_child": REPS,
    }
    print(json.dumps(summary))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH",
        f"CORES_SCALING_{N_CORES}_{N4_CORES}.json")
    history: dict = {"samples": []}
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        history = prev if "samples" in prev else {"samples": [prev]}
    label = os.environ.get("SPARK_GRAFT_SCALE_LABEL", "")
    history["samples"].append(
        {"summary": dict(summary, **({"label": label} if label else {})),
         "runs": results})
    with open(path, "w") as f:
        json.dump(history, f, indent=1)


if __name__ == "__main__":
    main()
