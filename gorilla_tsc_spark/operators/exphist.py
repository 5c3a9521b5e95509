"""Exponential-bucket histogram tier: unbounded-range exact quantiles.

The Prometheus NATIVE-histogram shape (public docs: exponential bucket
boundaries at powers of a base, here base 2 / schema 0; DDSketch makes
the same log-bucket trade — public papers), as a fourteenth tier
family.  Where the fixed-bin family (`operators/histogram.py`) needs
an operator-declared band and pays one LINEAR bin width of error, this
family covers [1, 2^nbins) with a RELATIVE error bound (one power-of-
two bucket ⇒ the served quantile is within 2× of the true value, and
linear in-bucket interpolation does much better in practice) — the
right distribution summary when the value range is unknown or spans
orders of magnitude (latencies, token counts, payload sizes).

The summary row is the SAME (n, below, above, counts) vector as the
fixed-bin family — only the bin rule differs — so the merge algebra is
shared, not re-implemented: `cascade_exphist_tier` IS the fixed-bin
cascade (element-wise vector sums are bin-semantics-agnostic), and
`merge_hist_series` serves fleet-wide exp-histograms unchanged.

Exact cross-engine binning: for v ≥ 1, floor(log2(v)) is computed with
NO floating-point log — it is the bit length of floor(v) minus one
(`F.bin()` string length in Spark, `format('{:b}', …)` length in
DuckDB), exact for every double up to 2^53 because floor(v) lands in
the same power-of-two bucket as v.  v < 1 (including 0) counts in
`below`; v ≥ 2^nbins in `above`.  This is what lets the driver gate
hash-match the quantile serve IEEE-identically: bucket edges 2^i are
exact doubles built by integer shifts, never `pow()`.

Scale shape: identical to the fixed-bin family — ONE groupBy with
nbins conditional sums (map-side partials, whole-stage codegen),
tier-row-sized cascades/refreshes, row-local quantile serve."""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .histogram import STAT_COLS, _hist_aggs, _sum_merge, cascade_hist_tier
from .rollup import bucket_col


def _exp_bin_expr(v, nbins: int):
    """Bin index: -1 for v < 1 (underflow, incl. zero), nbins at/past
    2^nbins, else floor(log2(v)) = bit_length(floor(v)) − 1 — integer
    arithmetic only, exact on both engines."""
    return (F.when(v < 1, F.lit(-1))
            .when(v >= float(2 ** nbins), F.lit(nbins))
            .otherwise((F.length(F.bin(F.floor(v).cast("long"))) - 1)
                       .cast("int")))


def exphist_tier(points: DataFrame, bucket_ms: int, nbins: int,
                 value_col: str = "v", keys=("conv_id",)) -> DataFrame:
    """Build the fine-grain exponential-histogram tier from (ts_ms, v)
    points.  Null values are excluded (no observation)."""
    v = F.col(value_col).cast("double")
    b = _exp_bin_expr(v, nbins)
    return (points.where(v.isNotNull())
            .groupBy(*keys,
                     bucket_col(F.col("ts_ms"), bucket_ms).alias("bucket"))
            .agg(*_hist_aggs(b, nbins)))


def cascade_exphist_tier(tier: DataFrame, from_ms: int, to_ms: int,
                         nbins: int, keys=("conv_id",)) -> DataFrame:
    """Exact coarse merge — the fixed-bin cascade verbatim: element-wise
    vector sums never look at what a bin MEANS."""
    return cascade_hist_tier(tier, from_ms, to_ms, nbins, keys)


def refresh_exphist_tier(tier: DataFrame, late_points: DataFrame,
                         bucket_ms: int, nbins: int, value_col: str = "v",
                         keys=("conv_id",)) -> DataFrame:
    """Fold a late batch in at cost ∝ the batch: histograms are
    distributive, so refresh = build the delta tier from the late
    points alone, then vector-sum-merge (no invalidation rebuild)."""
    delta = exphist_tier(late_points, bucket_ms, nbins, value_col, keys)
    cols = list(keys) + ["bucket"] + list(STAT_COLS)
    return _sum_merge(tier.select(*cols).unionByName(delta.select(*cols)),
                      nbins, keys)


def _exp_quantile_expr(q: float, nbins: int):
    """histogram_quantile(q) over exponential buckets: row-local
    cumulative walk; the crossing bucket [2^i, 2^(i+1)) interpolates
    linearly with lo = width = 2^i (exact doubles via integer shift).
    rank <= below clamps to 1.0 (the band's lower edge); past the band
    clamps to 2^nbins.  Mirrored token-for-token by the gate's SQL."""
    hi = float(2 ** nbins)
    n, below = F.col("n").cast("double"), F.col("below").cast("double")
    rank = F.lit(q) * n
    vals = F.transform(F.col("counts"), lambda c: c.cast("double"))
    # the bucket edge rides the accumulator by exact doubling
    # (1.0, 2.0, 4.0, … are all exact doubles — bit-identical to the
    # SQL twin's integer-shift edges)
    init = F.struct(below.alias("cum"), F.lit(1.0).alias("lo"),
                    F.lit(None).cast("double").alias("res"))
    folded = F.aggregate(
        vals, init,
        lambda acc, c: F.struct(
            (acc["cum"] + c).alias("cum"),
            (acc["lo"] * F.lit(2.0)).alias("lo"),
            F.coalesce(acc["res"], F.when(
                (c > 0) & (acc["cum"] + c >= rank)
                & (acc["cum"] < rank),
                acc["lo"] + acc["lo"] * (rank - acc["cum"]) / c))
            .alias("res")))
    return (F.when(rank <= below, F.lit(1.0))
            .otherwise(F.coalesce(folded["res"], F.lit(hi))))


def exphist_fraction_above(tier: DataFrame, threshold: float, nbins: int,
                           name: str = "frac_above") -> DataFrame:
    """Serve: fraction of observations >= threshold per tier row — the
    SLO-burn primitive over exponential buckets.  Exact when the
    threshold is a power of two; linearly interpolated inside the
    straddled bucket otherwise (the quantile serve's convention,
    inverted).  A threshold below 1 attributes the `below` mass to
    < threshold; at/past 2^nbins only `above` counts.  Row-local
    arithmetic, no shuffle."""
    hi = float(2 ** nbins)
    n = F.col("n").cast("double")
    above = F.col("above").cast("double")
    if threshold <= 1.0:
        cnt = n - F.col("below").cast("double")
    elif threshold >= hi:
        cnt = above
    else:
        k = min(int(threshold).bit_length() - 1, nbins - 1)
        blo = float(1 << k)
        part = (2.0 * blo - threshold) / blo
        tail = (F.aggregate(F.slice("counts", k + 2, nbins - k - 1),
                            F.lit(0).cast("long"), lambda a, x: a + x)
                .cast("double") if k + 1 < nbins else F.lit(0.0))
        cnt = (F.element_at("counts", k + 1).cast("double")
               * F.lit(float(part)) + tail + above)
    return tier.withColumn(name, cnt / n)


def exphist_estimates(tier: DataFrame, nbins: int,
                      quantiles=((0.5, "ep50"), (0.9, "ep90"),
                                 (0.99, "ep99"))) -> DataFrame:
    """Serve: named quantile columns per tier row (row-local, no
    shuffle).  Relative error ≤ one power-of-two bucket for ranks
    inside the band; out-of-band ranks clamp to the band edges."""
    out = tier
    for q, name in quantiles:
        out = out.withColumn(name, _exp_quantile_expr(q, nbins))
    return out
