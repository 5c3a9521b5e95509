"""spark-submit entry point for block-store compaction (maintenance).

Merges small-block debris (streaming seals, sparse-day batch encode)
into span-auto blocks — the engine's rewrite_data_files analogue.
Reads the warehouse's ``gorilla_blocks`` tier, compacts, writes
``gorilla_blocks_compacted``, and prints before/after accounting as one
JSON line.  The swap (rename/commit) is warehouse-specific and left to
the table layer — on Iceberg it is a snapshot commit.

Usage (cluster):
    spark-submit --py-files engine.zip jobs/compact_job.py \\
        --warehouse s3://lake/gorilla [--cores N]

Usage (sandbox):
    python jobs/compact_job.py --warehouse /tmp/wh
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--warehouse", required=True)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gorilla_tsc_spark.operators.compact import compact_blocks
    from gorilla_tsc_spark.pipeline import read_blocks
    from gorilla_tsc_spark.session import get_spark

    spark = get_spark("compact-job", cores=args.cores)
    blocks = read_blocks(spark, args.warehouse)
    out_path = f"{args.warehouse}/gorilla_blocks_compacted"
    compact_blocks(blocks).write.mode("overwrite").parquet(out_path)
    compacted = spark.read.parquet(out_path)

    def acct(df):
        r = df.agg(F.count(F.lit(1)), F.sum("n_points"),
                   F.sum(F.length("payload"))).first()
        return int(r[0]), int(r[1] or 0), int(r[2] or 0)

    nb, np_, pb = acct(blocks)
    cb, cp, cpb = acct(compacted)
    assert cp == np_, f"point count changed in compaction: {np_} -> {cp}"
    print(json.dumps({
        "blocks_in": nb, "blocks_out": cb,
        "points": np_,
        "payload_bytes_in": pb, "payload_bytes_out": cpb,
        "bytes_per_point_in": round(pb / max(np_, 1), 3),
        "bytes_per_point_out": round(cpb / max(cp, 1), 3),
        "out": out_path,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
