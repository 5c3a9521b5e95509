"""Mergeable sketch tiers: HyperLogLog distinct counts, KLL quantiles,
Theta set algebra, and truncated top-k heavy hitters.

Why this operator exists at 100 TB: "how many distinct conversations /
users / tools were active per day, week, month?" is the canonical
transcript-warehouse dashboard query, and exact COUNT(DISTINCT) over
raw turns re-shuffles the full key set for every window size.  The
tier pattern that makes rollups cheap (associative summaries that
re-aggregate without touching raw data) needs a *mergeable* distinct
summary — that is exactly an HLL sketch: build one binary sketch per
fine bucket once, then every coarser window is a union of sketches,
the same cascade shape as the 1m→1h→1d numeric tiers in
``operators/rollup.py``.

Built on Spark's Apache DataSketches integration (JVM-side aggregates:
``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_sketch_estimate``) —
no Python in the loop, sketches shuffle as small fixed-size binaries
(lgK=12 → ~2.5 KB) instead of the raw key set.

Error model: standard HLL relative error ≈ 1.04/sqrt(2^lgK) — about
1.6 % at the default lgK=12; the pytest gate asserts a conservative
5 % bound against exact distinct counts per bucket and across the
merge cascade (tests/test_purge_serve.py).

Reference parity note: not in the reference codec library — this is
engine-tier functionality mandated by the continuous-aggregate half of
the north rule, mirroring TimescaleDB's approx_count_distinct
continuous aggregates.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rollup import bucket_col

DEFAULT_LGK = 12


def distinct_sketch_tier(df: DataFrame, bucket_ms: int,
                         key_col: str = "conv_id",
                         ts_col: str = "ts_ms",
                         lgk: int = DEFAULT_LGK) -> DataFrame:
    """One HLL sketch of distinct ``key_col`` values per time bucket.

    Partial aggregation is map-side (sketches combine associatively),
    so the shuffle carries one ~2.5 KB sketch per (bucket, partition),
    never the keys themselves.
    """
    return (df
            .groupBy(bucket_col(F.col(ts_col), bucket_ms).alias("bucket"))
            .agg(F.hll_sketch_agg(key_col, F.lit(lgk)).alias("sketch")))


def merge_sketch_tier(tier: DataFrame, from_ms: int, to_ms: int) -> DataFrame:
    """Coarsen a sketch tier (e.g. 1d → 30d) by unioning sketches —
    the raw keys are never revisited, exactly like the numeric
    cascade in rollup.cascade().  All input sketches share one lgK
    (written by distinct_sketch_tier), so mixed-precision union stays
    disallowed (the hll_union_agg flag)."""
    if to_ms % from_ms:
        raise ValueError(f"{to_ms} not a multiple of {from_ms}")
    return (tier
            .groupBy(bucket_col(F.col("bucket"), to_ms).alias("bucket"))
            .agg(F.hll_union_agg("sketch", F.lit(False)).alias("sketch")))


def estimate(tier: DataFrame) -> DataFrame:
    """Materialize the point estimate next to each sketch."""
    return tier.withColumn(
        "approx_distinct", F.hll_sketch_estimate("sketch"))


# ---------------------------------------------------------------------------
# KLL quantile sketch tier — mergeable percentiles.  The exact
# percentile tier (queries.q_tier_percentiles) re-reads raw values per
# window size; this tier builds one ~3 KB KLL sketch per fine bucket
# and answers ANY coarser window's p50/p90/p99 by merging sketches —
# rank error ≈ 1.7 % at the default k=200.

DEFAULT_KLL_K = 200


def quantile_sketch_tier(df: DataFrame, bucket_ms: int,
                         value_col: str = "v", ts_col: str = "ts_ms",
                         k: int = DEFAULT_KLL_K) -> DataFrame:
    """One KLL(double) sketch of ``value_col`` per time bucket."""
    return (df
            .groupBy(bucket_col(F.col(ts_col), bucket_ms).alias("bucket"))
            .agg(F.kll_sketch_agg_double(value_col, F.lit(k))
                 .alias("qsketch")))


def merge_quantile_tier(tier: DataFrame, from_ms: int,
                        to_ms: int) -> DataFrame:
    """Coarsen a quantile tier by merging sketches — raw values are
    never revisited."""
    if to_ms % from_ms:
        raise ValueError(f"{to_ms} not a multiple of {from_ms}")
    return (tier
            .groupBy(bucket_col(F.col("bucket"), to_ms).alias("bucket"))
            .agg(F.kll_merge_agg_double("qsketch").alias("qsketch")))


def quantile_estimates(tier: DataFrame,
                       qs: tuple[float, ...] = (0.5, 0.9, 0.99)) -> DataFrame:
    """Materialize point quantile estimates next to each sketch.

    Column names are collision-safe: p50/p90/p99 for the defaults,
    p99_9 for 0.999, p28_5 for 0.285 — ``int()`` truncation would
    mislabel 0.29 as p28 and silently overwrite p99 with p99.9.
    """
    out = tier
    names = set()
    for q in qs:
        name = "p" + format(q * 100, "g").replace(".", "_").replace("-", "m")
        if name in names:
            raise ValueError(f"duplicate quantile label {name!r} from {qs}")
        names.add(name)
        out = out.withColumn(
            name, F.kll_sketch_get_quantile_double("qsketch", F.lit(q)))
    return out.withColumn("n", F.kll_sketch_get_n_double("qsketch"))


# ---------------------------------------------------------------------------
# Theta sketch tier — distinct counts WITH set algebra.  HLL unions
# only; Theta also intersects and differences, which is what
# cohort/churn questions need: "conversations active in both week 1
# and week 2" is theta_intersection of two weekly sketches — no
# re-scan of the raw turns, no join on the key set.


def theta_sketch_tier(df: DataFrame, bucket_ms: int,
                      key_col: str = "conv_id",
                      ts_col: str = "ts_ms") -> DataFrame:
    """One Theta sketch of distinct ``key_col`` per time bucket."""
    return (df
            .groupBy(bucket_col(F.col(ts_col), bucket_ms).alias("bucket"))
            .agg(F.theta_sketch_agg(key_col).alias("tsketch")))


def theta_overlap(tier: DataFrame, bucket_a: int, bucket_b: int) -> DataFrame:
    """Retained / churned / new distinct keys between two buckets of a
    Theta tier, one row: (retained, churned, new) estimates.

    Fails loudly (rather than returning an empty or multiplied result)
    when a requested bucket is absent from the tier or appears more
    than once — a silent 0-row answer reads as "no churn" on a
    dashboard when the real problem is an off-by-one-grain bucket or
    a tier unioned without re-aggregation.
    """
    a = tier.where(F.col("bucket") == bucket_a).select(
        F.col("tsketch").alias("a"))
    b = tier.where(F.col("bucket") == bucket_b).select(
        F.col("tsketch").alias("b"))
    for side, bucket, df in (("a", bucket_a, a), ("b", bucket_b, b)):
        n = df.limit(2).count()
        if n != 1:
            raise ValueError(
                f"theta_overlap: bucket {bucket} ({side}) has {n} tier "
                f"rows (expected exactly 1) — wrong grain, expired "
                f"bucket, or un-reaggregated union")
    return a.crossJoin(b).select(
        F.theta_sketch_estimate(F.theta_intersection("a", "b"))
        .alias("retained"),
        F.theta_sketch_estimate(F.theta_difference("a", "b"))
        .alias("churned"),
        F.theta_sketch_estimate(F.theta_difference("b", "a"))
        .alias("new"))


# ---------------------------------------------------------------------------
# Top-k heavy-hitters tier — "which tools / roles / error codes dominated
# each day / week / month?".  Spark 4.1 ships no mergeable frequent-items
# aggregate (count_min_sketch has no SQL-level merge/estimate), so this is
# the classic mergeable Space-Saving summary expressed as pure DataFrame
# ops: exact (bucket, item) counts at the fine grain, truncated to the
# top k per bucket, with the (k+1)-th count carried as the bucket's error
# bound.  Merging coarsens buckets by summing the kept counts and
# re-truncating; the carried bounds keep the estimate interval honest:
#
#   invariant per tier row:   cnt_lb <= true count <= cnt_lb + err
#   invariant per bucket:     any item NOT listed has true count <= bucket_err
#
# (Agarwal et al., "Mergeable Summaries", PODS'12: truncated counter
# summaries merge with additive error — the same property that lets the
# numeric 1m->1h->1d cascade never revisit raw data.)
#
# Scale notes: one shuffle keyed (bucket, item) with map-side partial
# counts, then one window pass partitioned by bucket (rows per bucket are
# bounded by the per-bucket item cardinality, already reduced by the agg);
# the merge touches only k rows + 1 bound per fine bucket, never raw turns.

DEFAULT_TOPK = 20


def _truncate_topk(counts: DataFrame, k: int, tot_err=None) -> DataFrame:
    """Keep the top-k rows per bucket by (cnt_lb desc, item asc) and set
    bucket_err to the largest upper bound among dropped items (plus the
    never-seen floor ``tot_err`` when merging).  One window partitioning,
    no joins."""
    from pyspark.sql import Window
    w = Window.partitionBy("bucket").orderBy(
        F.col("cnt_lb").desc(), F.col("item").asc())
    wb = Window.partitionBy("bucket")
    dropped_ub = F.when(F.col("rk") > k, F.col("cnt_lb") + F.col("err"))
    floor = tot_err if tot_err is not None else F.lit(0)
    return (counts
            .withColumn("rk", F.row_number().over(w))
            .withColumn("bucket_err",
                        F.greatest(F.coalesce(F.max(dropped_ub).over(wb),
                                              F.lit(0)), floor))
            .where(F.col("rk") <= k)
            .select("bucket", "item", "cnt_lb", "err", "bucket_err"))


def topk_tier(df: DataFrame, bucket_ms: int, item_col: str,
              ts_col: str = "ts_ms", k: int = DEFAULT_TOPK,
              salts: int | None = None) -> DataFrame:
    """Top-k item counts per fine time bucket.

    Fine-grain counts are exact (err = 0); truncation to k rows records
    the (k+1)-th count as ``bucket_err`` — the ceiling on any item the
    summary dropped.

    ``salts``: for HIGH-CARDINALITY item domains (e.g. conv_id as the
    item) the per-bucket ranking window concentrates one bucket's whole
    item set on one task.  With ``salts=S`` the truncation runs in two
    phases: first per (bucket, xxhash64(item) % S) — each item's FULL
    count lives in exactly one salt, so every true top-k item survives
    its salt's top-k — then per bucket over ≤ S·k pre-truncated rows.
    The kept set and counts are IDENTICAL to the unsalted operator
    (pinned by tests); only ``bucket_err`` may be looser (the max salt
    bound instead of the global (k+1)-th count — still a valid ceiling
    on any unlisted item, which can only have been dropped within its
    own salt).
    """
    counts = (df
              .groupBy(bucket_col(F.col(ts_col), bucket_ms).alias("bucket"),
                       F.col(item_col).alias("item"))
              .agg(F.count(F.lit(1)).alias("cnt_lb"))
              .withColumn("err", F.lit(0).cast("long")))
    if not salts or salts <= 1:
        return _truncate_topk(counts, k)
    from pyspark.sql import Window
    ws = (Window.partitionBy("bucket",
                             F.pmod(F.xxhash64("item"), F.lit(salts)))
          .orderBy(F.col("cnt_lb").desc(), F.col("item").asc()))
    wsb = Window.partitionBy("bucket",
                             F.pmod(F.xxhash64("item"), F.lit(salts)))
    dropped = F.when(F.col("rk") > k, F.col("cnt_lb"))
    pre = (counts
           .withColumn("rk", F.row_number().over(ws))
           .withColumn("salt_err",
                       F.coalesce(F.max(dropped).over(wsb), F.lit(0)))
           .where(F.col("rk") <= k))
    wb = Window.partitionBy("bucket")
    w2 = Window.partitionBy("bucket").orderBy(
        F.col("cnt_lb").desc(), F.col("item").asc())
    return (pre
            .withColumn("rk2", F.row_number().over(w2))
            .withColumn("bucket_err",
                        F.greatest(
                            F.coalesce(F.max(F.when(F.col("rk2") > k,
                                                    F.col("cnt_lb")))
                                       .over(wb), F.lit(0)),
                            F.max("salt_err").over(wb)))
            .where(F.col("rk2") <= k)
            .select("bucket", "item", "cnt_lb", "err", "bucket_err"))


def _merge_summaries(tagged: DataFrame, coarse, k: int) -> DataFrame:
    """Merge truncated summaries grouped by ``coarse``.  ``tagged`` rows
    are tier rows plus a ``src`` column making (src, bucket) unique, so
    each input summary's bound is counted exactly once in the total."""
    per_src = tagged.select("src", "bucket", "bucket_err").distinct()
    tot = (per_src.groupBy(coarse)
           .agg(F.sum("bucket_err").alias("tot_err")))
    sums = (tagged.groupBy(coarse, "item")
            .agg(F.sum("cnt_lb").alias("cnt_lb"),
                 F.sum("err").alias("present_err"),
                 F.sum("bucket_err").alias("present_bnd")))
    counts = (sums.join(F.broadcast(tot), "bucket")
              .select("bucket", "item", "cnt_lb",
                      (F.col("present_err") + F.col("tot_err")
                       - F.col("present_bnd")).alias("err"),
                      "tot_err"))
    return _truncate_topk(counts, k, tot_err=F.col("tot_err"))


def merge_topk_tier(tier: DataFrame, from_ms: int, to_ms: int,
                    k: int = DEFAULT_TOPK) -> DataFrame:
    """Coarsen a top-k tier (e.g. 1d -> 30d) without touching raw data.

    For each item: the lower bound is the sum of its kept fine counts;
    the error adds each fine bucket's bound where the item was absent
    (it may have been dropped there with up to bucket_err occurrences).
    Re-truncation then keeps the coarse top-k by lower bound.  The
    input must be a well-formed tier (one summary per fine bucket —
    true by construction for topk_tier output); to fold a SAME-grain
    late batch into a standing tier use refresh_topk_tier.
    """
    if to_ms % from_ms:
        raise ValueError(f"{to_ms} not a multiple of {from_ms}")
    coarse = bucket_col(F.col("bucket"), to_ms).alias("bucket")
    return _merge_summaries(tier.withColumn("src", F.lit(0)), coarse, k)


def refresh_topk_tier(tier: DataFrame, late_df: DataFrame, bucket_ms: int,
                      item_col: str, ts_col: str = "ts_ms",
                      k: int = DEFAULT_TOPK,
                      salts: int | None = None) -> DataFrame:
    """Fold a late-data batch into a standing same-grain top-k tier —
    cost ∝ the late batch (same contract as rollup.refresh_tier).  The
    late rows are summarized at the tier's grain, then the two
    summaries merge per bucket; the source tag keeps each summary's
    truncation bound distinct even when the bound values collide.
    ``salts`` passes through to the late batch's truncation — use the
    same value the standing tier was built with for high-cardinality
    item domains."""
    late = topk_tier(late_df, bucket_ms, item_col, ts_col, k, salts=salts)
    cols = ["bucket", "item", "cnt_lb", "err", "bucket_err"]
    tagged = (tier.select(*cols).withColumn("src", F.lit(0))
              .unionByName(late.select(*cols).withColumn("src", F.lit(1))))
    return _merge_summaries(tagged, F.col("bucket").alias("bucket"), k)


def topk_estimates(tier: DataFrame) -> DataFrame:
    """Materialize the count interval next to each kept item."""
    return tier.select(
        "bucket", "item", "cnt_lb",
        (F.col("cnt_lb") + F.col("err")).alias("cnt_ub"), "bucket_err")


def refresh_distinct_tier(tier: DataFrame, late_df: DataFrame,
                          bucket_ms: int, key_col: str = "conv_id",
                          ts_col: str = "ts_ms",
                          lgk: int = DEFAULT_LGK) -> DataFrame:
    """Fold a late-data batch into a standing same-grain HLL tier —
    cost ∝ the late batch.  HLL union is exact w.r.t. the underlying
    set union (a sketch of A ∪ B ≡ union of sketches of A and B), so
    the refreshed tier is indistinguishable from a full rebuild."""
    late = distinct_sketch_tier(late_df, bucket_ms, key_col, ts_col, lgk)
    return (tier.unionByName(late)
            .groupBy("bucket")
            .agg(F.hll_union_agg("sketch", F.lit(False)).alias("sketch")))


def refresh_quantile_tier(tier: DataFrame, late_df: DataFrame,
                          bucket_ms: int, value_col: str = "v",
                          ts_col: str = "ts_ms",
                          k: int = DEFAULT_KLL_K) -> DataFrame:
    """Fold a late-data batch into a standing same-grain KLL tier —
    merged sketch ≡ a sketch built over the combined rows up to the
    sketch's own rank error."""
    late = quantile_sketch_tier(late_df, bucket_ms, value_col, ts_col, k)
    return (tier.unionByName(late)
            .groupBy("bucket")
            .agg(F.kll_merge_agg_double("qsketch").alias("qsketch")))


def merge_theta_tier(tier: DataFrame, from_ms: int, to_ms: int) -> DataFrame:
    """Coarsen a Theta tier by unioning sketches (same cascade shape
    as the HLL tier; the result still supports intersection/difference
    at the coarser grain)."""
    if to_ms % from_ms:
        raise ValueError(f"{to_ms} not a multiple of {from_ms}")
    return (tier
            .groupBy(bucket_col(F.col("bucket"), to_ms).alias("bucket"))
            .agg(F.theta_union_agg("tsketch").alias("tsketch")))


def refresh_theta_tier(tier: DataFrame, late_df: DataFrame, bucket_ms: int,
                       key_col: str = "conv_id",
                       ts_col: str = "ts_ms") -> DataFrame:
    """Fold a late-data batch into a standing same-grain Theta tier —
    like HLL, theta union is exact w.r.t. the underlying set union."""
    late = theta_sketch_tier(late_df, bucket_ms, key_col, ts_col)
    return (tier.unionByName(late)
            .groupBy("bucket")
            .agg(F.theta_union_agg("tsketch").alias("tsketch")))
