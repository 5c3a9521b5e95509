"""spark-submit entry point for targeted purge (compliance deletes).

Deletes whole conversations — or a time range within them — from the
block store: whole-conversation purge is a broadcast anti-join
(metadata-only, no payload decoded); a range purge rewrites only the
matched conversations' blocks via the compaction kernel (copy-on-write
restricted to the purge set, see operators/purge.py).  Writes the
surviving store and prints accounting as one JSON line.  The swap is
warehouse-specific and left to the table layer — on Iceberg the
whole-conversation case is a DELETE-WHERE metadata commit.

Usage (cluster):
    spark-submit --py-files engine.zip jobs/purge_job.py \\
        --warehouse s3://lake/gorilla --conv-ids ids.txt \\
        [--t0-ms T0 --t1-ms T1] [--cores N]

Usage (sandbox):
    python jobs/purge_job.py --warehouse /tmp/wh --conv-ids ids.txt
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
    ap.add_argument("--conv-ids", required=True,
                    help="text file, one conv_id per line")
    ap.add_argument("--t0-ms", type=int, default=None)
    ap.add_argument("--t1-ms", type=int, default=None)
    ap.add_argument("--patch-tiers", action="store_true",
                    help="also rewrite rollup_1m/1h/1d so the purged "
                         "range disappears from the aggregate tiers "
                         "(whole-conversation mode patches tiers by "
                         "the same anti-join; range mode recomputes "
                         "matched conversations from surviving blocks)")
    ap.add_argument("--predictor", default=None,
                    help="store's encode-time predictor (e.g. dfcm1024); "
                         "a range purge re-encodes matched blocks and "
                         "must decode them correctly first")
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()
    if (args.t0_ms is None) != (args.t1_ms is None):
        ap.error("--t0-ms and --t1-ms must be given together")

    from pyspark.sql import functions as F

    from gorilla_tsc_spark.operators.purge import (
        purge_conversations,
        purge_range,
    )
    from gorilla_tsc_spark.pipeline import read_blocks
    from gorilla_tsc_spark.session import get_spark

    with open(args.conv_ids) as f:
        conv_ids = [line.strip() for line in f if line.strip()]

    spark = get_spark("purge-job", cores=args.cores)
    blocks = read_blocks(spark, args.warehouse)
    if args.t0_ms is None:
        survived = purge_conversations(blocks, conv_ids)
    else:
        survived = purge_range(blocks, conv_ids, args.t0_ms, args.t1_ms,
                               predictor=args.predictor)
    out_path = f"{args.warehouse}/gorilla_blocks_purged"
    survived.write.mode("overwrite").parquet(out_path)
    out = spark.read.parquet(out_path)

    tier_rows = {}
    if args.patch_tiers:
        from gorilla_tsc_spark.operators.purge import (
            patch_tier_after_range_purge,
        )
        from gorilla_tsc_spark.operators.rollup import TIER_MS, cascade
        from gorilla_tsc_spark.sources.tables import read_tier, write_tier

        t1m = read_tier(spark, args.warehouse, "rollup_1m")
        if args.t0_ms is None:
            t1m = purge_conversations(t1m, conv_ids)
        else:
            t1m = patch_tier_after_range_purge(t1m, out, conv_ids,
                                               TIER_MS["1m"],
                                               predictor=args.predictor)
        write_tier(t1m, args.warehouse, "rollup_1m_purged",
                   mode="overwrite")
        t1m = read_tier(spark, args.warehouse, "rollup_1m_purged")
        # the coarser tiers cascade exactly from the patched 1m tier
        for name, frm, to in (("rollup_1h", "1m", "1h"),
                              ("rollup_1d", "1h", "1d")):
            t = cascade(t1m if name == "rollup_1h" else t,
                        TIER_MS[frm], TIER_MS[to])
            write_tier(t, args.warehouse, f"{name}_purged",
                       mode="overwrite")
            t = read_tier(spark, args.warehouse, f"{name}_purged")
        # the gap-filled SERVING tier also contains (and LOCF-smears)
        # the purged data — rebuild it from the patched 1m tier, or a
        # compliance delete would keep serving deleted values
        try:
            from gorilla_tsc_spark.operators.gapfill import gapfill
            from gorilla_tsc_spark.operators.rollup import with_mean
            filled = gapfill(with_mean(t1m), TIER_MS["1m"], how="locf")
            write_tier(filled, args.warehouse, "rollup_1m_filled_purged",
                       mode="overwrite")
        except Exception:
            pass  # warehouse without a filled tier
        tier_rows = {"tier_1m_rows": t1m.count()}

    def acct(df):
        r = df.agg(F.count(F.lit(1)), F.sum("n_points")).first()
        return int(r[0]), int(r[1] or 0)

    nb, np_ = acct(blocks)
    sb, sp = acct(out)
    print(json.dumps({
        "mode": "range" if args.t0_ms is not None else "conversations",
        "purge_set": len(conv_ids),
        "blocks_in": nb, "blocks_out": sb,
        "points_in": np_, "points_out": sp,
        "out": out_path, **tier_rows,
    }))


if __name__ == "__main__":
    main()
