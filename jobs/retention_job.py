"""spark-submit entry point for the retention lifecycle sweep.

Applies the retention policy to each rollup tier (expired buckets are
dropped — on Iceberg this is a partition-predicate DELETE, here a
filtered overwrite) and optionally expires raw blocks past the archive
horizon.  Prints one JSON line of kept/dropped counters per tier.

Every predicate is a plain column comparison on the day-partitionable
``bucket`` / ``last_ts`` columns, so at warehouse scale the sweep is
metadata-only partition pruning — no payload is read, let alone
decoded.

Usage (cluster):
    spark-submit --py-files engine.zip jobs/retention_job.py \\
        --warehouse s3://lake/gorilla --now-ms 1700000000000 \\
        [--keep-1m-days 7 --keep-1h-days 90 --keep-blocks-days 365]

Usage (sandbox):
    python jobs/retention_job.py --warehouse /tmp/wh --now-ms <ms>
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
    ap.add_argument("--now-ms", type=int, required=True)
    ap.add_argument("--keep-1m-days", type=int, default=7)
    ap.add_argument("--keep-1h-days", type=int, default=90)
    ap.add_argument("--keep-blocks-days", type=int, default=None,
                    help="also expire raw blocks whose last_ts is older "
                         "(default: keep forever)")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gorilla_tsc_spark.operators.retention import (apply_retention,
                                                       cutoff_ms)
    from gorilla_tsc_spark.pipeline import read_blocks
    from gorilla_tsc_spark.session import get_spark
    from gorilla_tsc_spark.sources.tables import read_tier, write_tier

    spark = get_spark("retention-job", cores=args.cores)
    out: dict[str, dict[str, int]] = {}

    for tier_name, keep_days in (("rollup_1m", args.keep_1m_days),
                                 ("rollup_1h", args.keep_1h_days)):
        tier = read_tier(spark, args.warehouse, tier_name)
        before = tier.count()
        kept = apply_retention(tier, args.now_ms, keep_days)
        # rewrite through a staging suffix: the filtered plan still
        # reads the live table, and Spark's overwrite would otherwise
        # truncate its own input (on Iceberg this whole step is a
        # metadata-only DELETE WHERE instead)
        write_tier(kept, args.warehouse, tier_name + "_staged",
                   mode="overwrite")
        staged = read_tier(spark, args.warehouse, tier_name + "_staged")
        write_tier(staged, args.warehouse, tier_name, mode="overwrite")
        after = read_tier(spark, args.warehouse, tier_name).count()
        out[tier_name] = {"kept": after, "dropped": before - after}

    if args.keep_blocks_days is not None:
        blocks = read_blocks(spark, args.warehouse)
        before = blocks.count()
        cut = cutoff_ms(args.now_ms, args.keep_blocks_days)
        kept = blocks.where(F.col("last_ts") >= cut)
        write_tier(kept, args.warehouse, "gorilla_blocks_staged",
                   mode="overwrite")
        staged = read_tier(spark, args.warehouse, "gorilla_blocks_staged")
        write_tier(staged, args.warehouse, "gorilla_blocks",
                   mode="overwrite")
        after = read_blocks(spark, args.warehouse).count()
        out["gorilla_blocks"] = {"kept": after, "dropped": before - after}

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
