"""Two-cluster-size scaling evidence (north rule).

The sandbox has no real cluster, so the mandated N → 4N executor
scaling is evidenced by running the SAME encode+rollup job at two
parallelism levels — local[8] and local[32] — on the SAME deterministic
synthetic corpus, in separate JVMs (fresh session each), and reporting
throughput at both plus efficiency = (T_N / T_4N) / 4.

Usage:
    python tools/scaling_bench.py             # full run → BENCH/BASELINE.md
    _SCALING_CHILD=8 python tools/scaling_bench.py   # one child measurement

The job is the pipeline hot path: distributed transcript synthesis
(mapInPandas generator — no driver loop) → JVM-side channel projection
→ one shuffle keyed (conv_id, day, seq) → partition-batched Gorilla
encode → day-tier rollup from block metadata. Timing starts after a
small warmup job so JVM/Arrow-worker startup (identical at both sizes)
doesn't pollute the scaling signal — the same discipline as the
reference's JMH warmup iterations (EncodingBenchmark.java:38-50).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_CONVS = int(os.environ.get("SPARK_GRAFT_SCALE_CONVS", "160000"))
MAX_TURNS = int(os.environ.get("SPARK_GRAFT_SCALE_TURNS", "1200"))
ZIPF = 0.3


def generate_corpus(path: str) -> None:
    """One-time corpus materialization (untimed, identical input files
    for both measurements — like reading the same Iceberg table)."""
    from gorilla_tsc_spark.session import get_spark
    from gorilla_tsc_spark.sources.transcripts import synthesize_transcripts

    spark = get_spark("scaling-gen")
    t = synthesize_transcripts(spark, n_convs=N_CONVS, max_turns=MAX_TURNS,
                               zipf_a=ZIPF, partitions=128)
    t.write.mode("overwrite").parquet(path)
    spark.stop()


def child(cores: int) -> None:
    from pyspark.sql import functions as F

    from gorilla_tsc_spark.operators.encode import encode_blocks
    from gorilla_tsc_spark.operators.rollup import rollup_from_block_meta
    from gorilla_tsc_spark.session import get_spark
    from gorilla_tsc_spark.sources.transcripts import synthesize_transcripts

    corpus = os.environ["_SCALING_CORPUS"]
    spark = get_spark(f"scaling-{cores}", cores=cores,
                      shuffle_partitions=max(cores, 8))
    # warmup: spin up Arrow python workers (JIT/startup is identical at
    # both sizes; excluding it isolates the scaling signal)
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
    for _ in range(int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "3"))):
        t0 = time.time()
        n_points, n_blocks, tier_rows = job()
        best = min(best, time.time() - t0)
    n_turns = n_points // 3  # three channels per turn
    print(json.dumps({
        "cores": cores, "wall_encode_rollup_sec": round(best, 2),
        "n_turns": n_turns, "n_points": n_points, "n_blocks": n_blocks,
        "tier_rows": tier_rows,
        "turns_per_sec": round(n_turns / best, 1),
    }))
    spark.stop()


def main() -> None:
    import shutil
    import tempfile
    corpus = tempfile.mkdtemp(prefix="scaling_corpus_")
    try:
        generate_corpus(corpus)
        results = {}
        # the sandbox host has bursty background load: alternate the two
        # parallelism levels and keep the best measurement per level so
        # a noisy window doesn't bias one side
        for cores in (8, 32, 8, 32):
            env = dict(os.environ, _SCALING_CHILD=str(cores),
                       _SCALING_CORPUS=corpus)
            out = subprocess.run([sys.executable, os.path.abspath(__file__)],
                                 env=env, capture_output=True, text=True,
                                 timeout=3600)
            lines = [ln for ln in out.stdout.splitlines()
                     if ln.startswith("{")]
            if not lines:
                print(out.stdout[-2000:], out.stderr[-2000:])
                raise RuntimeError(f"child {cores} failed")
            r = json.loads(lines[-1])
            print(lines[-1])
            prev = results.get(cores)
            if prev is None or r["wall_encode_rollup_sec"] < prev["wall_encode_rollup_sec"]:
                results[cores] = r
    finally:
        shutil.rmtree(corpus, ignore_errors=True)
    r8, r32 = results[8], results[32]
    eff = (r8["wall_encode_rollup_sec"] / r32["wall_encode_rollup_sec"]) / 4
    md = f"""# BENCH — two-cluster-size scaling evidence

North rule: throughput scaling efficiency ≥ 0.8 going from N to 4N
executors. Sandbox stand-in (no real cluster): the same
`spark-submit`-shaped job at `local[8]` vs `local[32]`, each a fresh
JVM, reading the SAME pre-materialized parquet corpus
({r8["n_turns"]:,} turns → {r8["n_points"]:,} points →
{r8["n_blocks"]:,} Gorilla blocks), Arrow workers warmed before
timing, best of 2 reps.

Job: read transcripts → JVM-side channel projection → one shuffle
keyed (conv_id, day, seq) → partition-batched Gorilla encode →
block aggregate + day-tier rollup from block metadata.

| parallelism | encode+rollup wall (s) | turns/s |
|---|---|---|
| local[8]  (N)  | {r8["wall_encode_rollup_sec"]} | {r8["turns_per_sec"]:,} |
| local[32] (4N) | {r32["wall_encode_rollup_sec"]} | {r32["turns_per_sec"]:,} |

**Scaling efficiency = (T_N / T_4N) / 4 = {eff:.3f}**
{"(meets the ≥ 0.8 target)" if eff >= 0.8 else "(below the 0.8 target — see notes)"}

Raw JSON:

```json
{json.dumps(r8)}
{json.dumps(r32)}
```

Generated by `python tools/scaling_bench.py`.
"""
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(md)
    print(f"efficiency={eff:.3f} → BENCH/BASELINE.md")


if __name__ == "__main__":
    c = os.environ.get("_SCALING_CHILD")
    if c:
        child(int(c))
    else:
        main()
