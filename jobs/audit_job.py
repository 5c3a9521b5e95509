"""spark-submit entry point for the block-store integrity audit.

Read-only, shuffle-free: metadata checks run as scan-side JVM
expressions, the decode check as a narrow bounded-decode kernel.
Writes failing block identities to ``<warehouse>/gorilla_blocks_bad``
(quarantine table) when any check fails, and prints the counters as
one JSON line.  ``--sample-pct`` audits a deterministic hash-based
sample (rotate ``--seed`` nightly to sweep the store over time).

Usage (cluster):
    spark-submit --py-files engine.zip jobs/audit_job.py \\
        --warehouse s3://lake/gorilla [--sample-pct 5] [--seed 17]

Usage (sandbox):
    python jobs/audit_job.py --warehouse /tmp/wh
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
    ap.add_argument("--sample-pct", type=float, default=100.0)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cores", type=int, default=None)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from gorilla_tsc_spark.operators.audit import audit_blocks, audit_summary
    from gorilla_tsc_spark.pipeline import read_blocks
    from gorilla_tsc_spark.session import get_spark

    spark = get_spark("audit-job", cores=args.cores)
    audit = audit_blocks(read_blocks(spark, args.warehouse),
                         sample_pct=args.sample_pct, seed=args.seed)
    audit.persist()
    row = audit_summary(audit).first().asDict()
    n_bad = sum(v for k, v in row.items() if k.startswith("bad_"))
    if n_bad:
        flags = [c for c in audit.columns if c.startswith("ok_")]
        bad_pred = None
        for c in flags:
            bad_pred = ~F.col(c) if bad_pred is None else bad_pred | ~F.col(c)
        (audit.where(bad_pred)
         .write.mode("overwrite")
         .parquet(f"{args.warehouse}/gorilla_blocks_bad"))
    audit.unpersist()
    row["sample_pct"] = args.sample_pct
    row["seed"] = args.seed
    row["ok"] = n_bad == 0
    print(json.dumps(row))
    sys.exit(0 if n_bad == 0 else 2)


if __name__ == "__main__":
    main()
