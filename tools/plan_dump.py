"""Dump formatted physical plans of the headline queries → docs/PLANS.md.

The per-round plan audit evidence: for each headline operator the
formatted plan (AQE off for stable shape) plus a one-line summary of
Exchange count and any nested-loop joins.  Regenerate after plan-level
changes:  python tools/plan_dump.py
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "codec_roundtrip_2ch", "rollup_block_exact",
    "skew_salted_rollup", "gapfill_tiers", "asof_tier",
    "dedup_minhash_lsh", "ann_topk", "curation_funnel",
    "textstats_all", "read_range", "read_value_range", "purge_range",
    "topk_tier_merge", "decontaminate", "tier_families_1d",
    "ewma_serve_1h", "value_scan",
    # per-family production build+cascade plans (the tier_families_1d
    # gate unions all ten refresh-routed branches; these are the plain
    # plans a warehouse job runs, one section per audited family)
    "corr_tier_1d", "twa_tier_1d", "autocorr_tier_1d",
    "exphist_tier_1d", "trend_tier_1d",
]

SF = "/root/testdata/sf0.001"

NOTES = {
    "read_range": (
        "Block store derived inline from raw events here; against a "
        "stored parquet/Iceberg blocks table the plan is scan → "
        "min/max-pushed first_ts/last_ts filter → decode kernel, "
        "zero exchanges."),
    "read_value_range": (
        "Zone-map value scan: agg_min/agg_max envelope filter sits "
        "directly above the block source, so against a stored "
        "parquet/Iceberg blocks table it prunes row groups via "
        "min/max statistics before the decode kernel — only "
        "envelope-crossing blocks are ever decoded."),
    "purge_range": (
        "Purge set broadcasts into a LeftAnti (pass-through branch) "
        "and LeftSemi (rewrite branch); Catalyst reuses the inline "
        "encode exchange across both branches (ReusedExchange). "
        "Against a stored blocks table only the (conv_id, channel) "
        "compaction exchange of the matched conversations remains."),
    "topk_tier_merge": (
        "Fine tier built inline here, and its subplan appears twice "
        "(the per-bucket-bound branch and the per-item-sum branch). "
        "Against a STORED fine tier the merge is 4 exchanges over "
        "k-rows-per-bucket data: bound distinct, bound sum, item sum, "
        "re-truncation window."),
    "decontaminate": (
        "The eval side (tiny by contract) contributes a distinct "
        "exchange on KB-scale data, then broadcasts; the corpus side "
        "computes gram hashes as a per-row array transform (no "
        "exchange), broadcast-filters, and only the rare hit rows "
        "reach the distinct-count groupBy — the corpus never "
        "shuffles, and flagged ids come back as a broadcast anti-join."),
}


def main() -> None:
    from gorilla_tsc_spark.queries import build_queries
    from gorilla_tsc_spark.session import get_spark

    from pyspark.sql import functions as F

    from gorilla_tsc_spark.operators.encode import encode_blocks
    from gorilla_tsc_spark.operators.purge import purge_range
    from gorilla_tsc_spark.operators.retention import read_range
    from gorilla_tsc_spark.operators.rollup import DAY_MS
    from gorilla_tsc_spark.queries import _transcripts

    spark = get_spark("plan-dump", cores=8)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    qs = build_queries()

    # non-registry maintenance/serve operators, same audit treatment
    def _read_range(spark, sf):
        t0 = 1_704_672_000_000
        return read_range(encode_blocks(_transcripts(spark, sf)),
                          t0, t0 + DAY_MS)

    def _read_value_range(spark, sf):
        from gorilla_tsc_spark.operators.retention import read_value_range
        return read_value_range(encode_blocks(_transcripts(spark, sf)),
                                120.0, channel="len")

    def _purge_range(spark, sf):
        t0 = 1_704_672_000_000
        ids = spark.createDataFrame([("conv00000001",)], ["conv_id"])
        return purge_range(encode_blocks(_transcripts(spark, sf)),
                           ids, t0, t0 + DAY_MS)

    def _topk_merge(spark, sf):
        from gorilla_tsc_spark.operators.sketches import (merge_topk_tier,
                                                          topk_tier)
        t = _transcripts(spark, sf).select(
            F.unix_millis("ts").alias("ts_ms"),
            F.coalesce("tool", F.lit("none")).alias("item"))
        return merge_topk_tier(topk_tier(t, DAY_MS, "item"),
                               DAY_MS, 30 * DAY_MS)

    def _decontaminate(spark, sf):
        from gorilla_tsc_spark.operators.decontaminate import decontaminate
        from gorilla_tsc_spark.queries import _docs
        docs = _docs(spark, sf)
        ev = spark.createDataFrame(
            [(r["text"],) for r in docs.limit(3).collect()], ["text"])
        return decontaminate(docs, ev)

    from gorilla_tsc_spark.operators.rollup import HOUR_MS
    from gorilla_tsc_spark.queries import _len_points

    def _corr_1d(spark, sf):
        from gorilla_tsc_spark.operators.correlate import (
            cascade_corr_tier, corr_estimates, corr_tier)
        t = _transcripts(spark, sf)
        xy = t.select(
            "conv_id", F.unix_millis("ts").alias("ts_ms"),
            F.length("text").cast("double").alias("x"),
            F.size(F.expr(r"filter(split(text, '\\s+'), t -> t != '')"))
            .cast("double").alias("y"))
        return corr_estimates(
            cascade_corr_tier(corr_tier(xy, HOUR_MS), HOUR_MS, DAY_MS))

    def _family_1d(mod, build, cascade, serve, *extra):
        def q(spark, sf):
            import importlib
            m = importlib.import_module(
                f"gorilla_tsc_spark.operators.{mod}")
            pts = _len_points(spark, sf)
            tier = getattr(m, build)(pts, HOUR_MS, *extra)
            args = extra if mod in ("exphist",) else ()
            coarse = getattr(m, cascade)(tier, HOUR_MS, DAY_MS, *args)
            return getattr(m, serve)(coarse, *args)
        return q

    qs = dict(qs, read_range=_read_range,
              read_value_range=_read_value_range, purge_range=_purge_range,
              topk_tier_merge=_topk_merge, decontaminate=_decontaminate,
              corr_tier_1d=_corr_1d,
              twa_tier_1d=_family_1d("timeweight", "twa_tier",
                                     "cascade_twa_tier", "twa_estimates"),
              autocorr_tier_1d=_family_1d("autocorr", "autocorr_tier",
                                          "cascade_autocorr_tier",
                                          "autocorr_estimates"),
              exphist_tier_1d=_family_1d("exphist", "exphist_tier",
                                         "cascade_exphist_tier",
                                         "exphist_estimates", 9),
              trend_tier_1d=_family_1d("trend", "trend_tier",
                                       "cascade_trend_tier",
                                       "trend_estimates"))
    out = ["# Physical plans — headline operators",
           "",
           "Generated by `python tools/plan_dump.py` (AQE off for stable "
           "shape; at runtime AQE may further coalesce partitions / switch "
           "skew-join strategies). `tests/test_plan_budget.py` enforces the "
           "structural invariants on every registry query.",
           ""]
    for name in HEADLINE:
        df = qs[name](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        n_ex = plan.count("Exchange ")
        nested = [f for f in ("CartesianProduct", "BroadcastNestedLoopJoin")
                  if f in plan]
        out.append(f"## {name}")
        out.append("")
        out.append(f"Exchanges: **{n_ex}**"
                   + (f" — nested loop: {nested} (brute-force baseline by design)"
                      if nested else " — no cartesian/nested-loop"))
        out.append("")
        if name in NOTES:
            out.append(NOTES[name])
            out.append("")
        out.append("```")
        # cap each plan at 120 lines — the shape is what matters
        out.extend(plan.splitlines()[:120])
        out.append("```")
        out.append("")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "docs", "PLANS.md"), "w") as f:
        f.write("\n".join(out))
    print(f"wrote docs/PLANS.md ({len(HEADLINE)} plans)")
    spark.stop()


if __name__ == "__main__":
    main()
