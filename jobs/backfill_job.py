"""spark-submit entry point for backfill ingest (late-data merge).

Merges a late transcript batch — a staging table written by the
streaming late path (streaming/late_path.py) or any delayed export —
into the sealed block store via operators/backfill.py::ingest_backfill:
late rows become staging blocks, only the affected conversations are
copy-on-write re-encoded, untouched blocks pass through byte-identical.
Writes the merged store and prints accounting as one JSON line.  The
swap is warehouse-specific and left to the table layer — on Iceberg
this is MERGE INTO with a copy-on-write snapshot commit.

Usage (cluster):
    spark-submit --py-files engine.zip jobs/backfill_job.py \\
        --warehouse s3://lake/gorilla --late s3://lake/gorilla/late \\
        [--on-conflict keep_both|last] [--cores N]

Usage (sandbox):
    python jobs/backfill_job.py --warehouse /tmp/wh --late /tmp/wh/late
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
    ap.add_argument("--late", required=True,
                    help="parquet path of late transcript rows "
                         "(the streaming late-path staging sink)")
    ap.add_argument("--on-conflict", choices=("keep_both", "last"),
                    default="keep_both")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gorilla_tsc_spark.operators.backfill import ingest_backfill
    from gorilla_tsc_spark.pipeline import read_blocks
    from gorilla_tsc_spark.session import get_spark

    spark = get_spark("backfill-job", cores=args.cores)
    blocks = read_blocks(spark, args.warehouse)
    late = spark.read.parquet(args.late)
    if "epoch_id" in late.columns:
        late = late.drop("epoch_id")

    merged = ingest_backfill(blocks, late, on_conflict=args.on_conflict)
    out_path = f"{args.warehouse}/gorilla_blocks_backfilled"
    merged.write.mode("overwrite").parquet(out_path)
    out = spark.read.parquet(out_path)

    def acct(df):
        r = df.agg(F.count(F.lit(1)), F.sum("n_points")).first()
        return int(r[0]), int(r[1] or 0)

    nb, npts = acct(blocks)
    mb, mpts = acct(out)
    n_late = late.count()
    n_convs = late.select("conv_id").distinct().count()
    print(json.dumps({
        "blocks_in": nb, "blocks_out": mb,
        "points_in": npts, "points_out": mpts,
        "late_rows": n_late, "affected_convs": n_convs,
        "on_conflict": args.on_conflict,
        "out": out_path,
    }))


if __name__ == "__main__":
    main()
