"""Fixed-bin histogram tier: exact, vector-sum-mergeable distributions.

The Prometheus classic-histogram shape (public docs: fixed buckets,
`histogram_quantile` linear interpolation within the crossing bucket),
re-expressed as a tier family under this engine's lifecycle contract
(ARCHITECTURE.md "Tier families"): build `histogram_tier`, cascade
`cascade_hist_tier`, late refresh `refresh_hist_tier`, serve
`hist_estimates`.

Where it sits next to the KLL quantile tier (`operators/sketches.py`):

* KLL answers ARBITRARY quantiles over UNBOUNDED value domains with a
  probabilistic rank-error bound — the right tool when the value range
  is unknown.
* This family answers quantiles over a KNOWN, operator-chosen value
  band with a DETERMINISTIC error bound (one bin width) and — unlike a
  sketch — its merges are EXACT: a histogram is just a vector of
  counts, so cascade and late-data refresh are element-wise sums with
  zero approximation stacking.  It is also directly serveable as a
  distribution (heatmaps, SLO burn curves), which a sketch is not.

Summary row per (series, bucket): `n` (all observations), `below` /
`above` (out-of-band overflow counters — Prometheus's `+Inf`/implicit
lower bound made explicit), and `counts` (array<long>[nbins] for the
band `[lo, lo + nbins*width)`).  Every component is a plain sum, so
merges are associative/commutative and the refresh path is a pure
delta-merge (the corr-family shape), never an invalidation rebuild.

Serve derives quantiles by the public `histogram_quantile` rule: walk
the cumulative distribution (starting at `below`), find the bin where
the rank `q*n` crosses, and interpolate linearly inside it; a rank
landing below the band clamps to `lo`, past it to `hi`.  The walk is a
row-local fold over the counts array (`transform` + `aggregate` higher-
order expressions) — no shuffle, no Python, no explode.

Scale shape: build = ONE groupBy keyed (series, bucket) with nbins
conditional-sum columns (map-side partials, whole-stage codegen);
cascade/refresh = sums + one element-wise array fold over tier rows;
serve = row-local arithmetic.  The shuffled payload per group is
~nbins longs — independent of point count, the property that makes
this the raw-scan-scale distribution summary at 100 TB.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .rollup import bucket_col

STAT_COLS = ("n", "below", "above", "counts")


def _bin_expr(v, lo: float, width: float, nbins: int):
    """Bin index for a value: -1 below the band, nbins at/past its end,
    else floor((v-lo)/width) clamped to nbins-1 (fp-edge guard)."""
    hi = lo + width * nbins
    return (F.when(v < lo, F.lit(-1))
            .when(v >= hi, F.lit(nbins))
            .otherwise(F.least(F.floor((v - F.lit(lo)) / F.lit(width)),
                               F.lit(nbins - 1)).cast("int")))


def _hist_aggs(b, nbins: int):
    """The family's aggregate expressions — shared by the batch build
    and the streaming twin so their bit-equality holds by
    construction, not by parallel maintenance."""
    return [F.count(F.lit(1)).alias("n"),
            F.sum((b == -1).cast("long")).alias("below"),
            F.sum((b == nbins).cast("long")).alias("above"),
            F.array(*[
                F.sum(F.when(b == i, F.lit(1))
                      .otherwise(F.lit(0)).cast("long"))
                for i in range(nbins)]).alias("counts")]


def histogram_tier(points: DataFrame, bucket_ms: int, lo: float,
                   width: float, nbins: int, value_col: str = "v",
                   keys=("conv_id",)) -> DataFrame:
    """Build the fine-grain histogram tier from (ts_ms, v) points.
    Null values are excluded (no observation)."""
    v = F.col(value_col).cast("double")
    b = _bin_expr(v, lo, width, nbins)
    return (points.where(v.isNotNull())
            .groupBy(*keys,
                     bucket_col(F.col("ts_ms"), bucket_ms).alias("bucket"))
            .agg(*_hist_aggs(b, nbins)))


def _summed_counts(list_col, nbins: int):
    """Element-wise sum of a collected list of count arrays."""
    zero = F.array_repeat(F.lit(0).cast("long"), nbins)
    return F.aggregate(list_col, zero,
                       lambda acc, x: F.zip_with(acc, x,
                                                 lambda a, b: a + b))


def _sum_merge(df: DataFrame, nbins: int, keys) -> DataFrame:
    g = (df.groupBy(*keys, "bucket")
         .agg(F.sum("n").alias("n"), F.sum("below").alias("below"),
              F.sum("above").alias("above"),
              F.collect_list("counts").alias("_cl")))
    return (g.withColumn("counts", _summed_counts(F.col("_cl"), nbins))
            .drop("_cl"))


def cascade_hist_tier(tier: DataFrame, from_ms: int, to_ms: int,
                      nbins: int, keys=("conv_id",)) -> DataFrame:
    """Re-aggregate a finer histogram tier into a coarser one — exact:
    scalar sums plus one element-wise vector sum (the per-group
    collect_list holds to_ms/from_ms small arrays, e.g. 24 for
    1h -> 1d, folded without touching raw data)."""
    assert to_ms % from_ms == 0, "coarser tier must align"
    rb = tier.withColumn("bucket", bucket_col(F.col("bucket"), to_ms))
    return _sum_merge(rb, nbins, keys)


def refresh_hist_tier(tier: DataFrame, late_points: DataFrame,
                      bucket_ms: int, lo: float, width: float, nbins: int,
                      value_col: str = "v", keys=("conv_id",)) -> DataFrame:
    """Fold a late batch in at cost ∝ the batch: histograms are
    distributive, so refresh = build the delta tier from the late
    points alone, then vector-sum-merge (no invalidation rebuild)."""
    delta = histogram_tier(late_points, bucket_ms, lo, width, nbins,
                           value_col, keys)
    cols = list(keys) + ["bucket"] + list(STAT_COLS)
    return _sum_merge(tier.select(*cols).unionByName(delta.select(*cols)),
                      nbins, keys)


def _quantile_expr(q: float, lo: float, width: float, nbins: int):
    """histogram_quantile(q): row-local cumulative walk + linear
    interpolation inside the crossing bin.  The fold carries
    (cum, res); the crossing bin is the unique one with
    cum_before < rank <= cum_after and a nonzero count.  rank <= below
    clamps to lo; rank past the band clamps to hi.  All arithmetic is
    over integer-valued doubles, so the oracle SQL twin computes the
    identical IEEE result."""
    hi = float(lo + width * nbins)
    n, below = F.col("n").cast("double"), F.col("below").cast("double")
    rank = F.lit(q) * n
    indexed = F.transform(
        F.col("counts"),
        lambda c, i: F.struct(i.cast("double").alias("i"),
                              c.cast("double").alias("c")))
    init = F.struct(below.alias("cum"),
                    F.lit(None).cast("double").alias("res"))
    folded = F.aggregate(
        indexed, init,
        lambda acc, s: F.struct(
            (acc["cum"] + s["c"]).alias("cum"),
            F.coalesce(acc["res"], F.when(
                (s["c"] > 0) & (acc["cum"] + s["c"] >= rank)
                & (acc["cum"] < rank),
                F.lit(float(lo)) + s["i"] * F.lit(float(width))
                + F.lit(float(width)) * (rank - acc["cum"]) / s["c"]))
            .alias("res")))
    return (F.when(rank <= below, F.lit(float(lo)))
            .otherwise(F.coalesce(folded["res"], F.lit(hi))))


def hist_estimates(tier: DataFrame, lo: float, width: float, nbins: int,
                   quantiles=((0.5, "p50"), (0.9, "p90"), (0.99, "p99")),
                   ) -> DataFrame:
    """Serve: named quantile columns per tier row (row-local, no
    shuffle).  Estimates are exact to within one bin width for ranks
    inside the band; out-of-band ranks clamp to the band edges."""
    out = tier
    for q, name in quantiles:
        out = out.withColumn(name, _quantile_expr(q, lo, width, nbins))
    return out


def merge_hist_series(tier: DataFrame, nbins: int, keys=()) -> DataFrame:
    """Cross-series merge: sum histograms over ALL series per bucket
    (or per any coarser key set) — the `sum by (le)` shape that makes
    fleet-wide quantiles possible from per-series tiers without
    revisiting raw data.  Exact, like every merge in this family."""
    return _sum_merge(tier, nbins, keys)


def hist_fraction_above(tier: DataFrame, threshold: float, lo: float,
                        width: float, nbins: int,
                        name: str = "frac_above") -> DataFrame:
    """Serve: fraction of observations >= threshold per tier row — the
    SLO-burn primitive ("what share of requests exceeded the budget").
    Exact when the threshold is a bin edge; linearly interpolated
    inside the straddled bin otherwise (the quantile serve's
    convention, inverted).  A threshold below the band attributes the
    `below` mass to < threshold; past the band only `above` counts.
    Row-local arithmetic, no shuffle."""
    hi = lo + width * nbins
    n = F.col("n").cast("double")
    above = F.col("above").cast("double")
    if threshold <= lo:
        cnt = n - F.col("below").cast("double")
    elif threshold >= hi:
        cnt = above
    else:
        k = min(int((threshold - lo) // width), nbins - 1)
        part = (lo + (k + 1) * width - threshold) / width
        tail = (F.aggregate(F.slice("counts", k + 2, nbins - k - 1),
                            F.lit(0).cast("long"), lambda a, x: a + x)
                .cast("double") if k + 1 < nbins else F.lit(0.0))
        cnt = (F.element_at("counts", k + 1).cast("double")
               * F.lit(float(part)) + tail + above)
    return tier.withColumn(name, cnt / n)
