"""EWMA smoothing serve: time-aware exponential decay over tier rows.

The one PromQL-ish serve surface the tier families can't express
algebraically: s_i = d·s_{i−1} + (1−d)·x_i is ORDER-DEPENDENT, so it
is not a mergeable summary — it's a serve-time transform, like
`corr_estimates` or `gapfill`, applied to an already-built tier.

Irregular spacing is handled the standard way (half-life decay over
elapsed time, the convention behind pandas `ewm(halflife=..., times=…)`
and RiskMetrics-style irregular EWMA):

    d_i = exp(−ln2 · Δt_i / halflife)      (Δt from the previous row)
    s_i = d_i · s_{i−1} + (1 − d_i) · x_i,   s_0 = x_0

so a series that goes quiet for a day forgets a day's worth, not one
row's worth.  Nulls (e.g. gap-filled buckets under the `null` policy)
carry the previous smoothed value forward and decay nothing.

Why Python is the right path HERE and nowhere upstream: the recursion
has a closed form (a decay-weighted prefix sum) but its stable
evaluation needs per-chunk renormalisation — exp(+Σlog d) overflows a
double within ~1k rows at hourly grain — so the honest distributed
shape is one Arrow batch per series over TIER rows: the input is the
(series, bucket) tier (one row per bucket — thousands per series at
most), never raw points.  Work per series is one O(n) pass; the
groupBy key is the same series key every tier already shuffles on, so
at 100 TB this adds one Arrow hop over tier-sized data and zero new
shuffles of point-sized data.
"""
from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (callers' idiom)
from pyspark.sql.types import DoubleType, StructField, StructType


def _ewma_numpy(ts: np.ndarray, x: np.ndarray, halflife_ms: float
                ) -> np.ndarray:
    """Reference recursion, one O(n) pass; null x holds the level."""
    out = np.empty(len(x), dtype=np.float64)
    s = math.nan
    prev_ts = 0.0
    log2 = math.log(2.0)
    for i in range(len(x)):
        xi = x[i]
        if math.isnan(xi):
            out[i] = s  # carry the level; nothing observed to move toward
            continue
        if math.isnan(s):
            s = xi
        else:
            d = math.exp(-log2 * (ts[i] - prev_ts) / halflife_ms)
            s = d * s + (1.0 - d) * xi
        prev_ts = ts[i]
        out[i] = s
    return out


def ewma_serve(tier: DataFrame, value_col: str, halflife_ms: int,
               keys=("conv_id",), ts_col: str = "bucket",
               out_col: str = "ewma") -> DataFrame:
    """Add a half-life-decayed EWMA of ``value_col`` per series,
    ordered by ``ts_col``.  Input should be a tier (one row per
    (series, bucket)); output keeps every input column."""
    schema = StructType(
        tier.schema.fields + [StructField(out_col, DoubleType(), True)])
    key_cols = list(keys)

    def smooth(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        ts = pdf[ts_col].to_numpy(dtype=np.float64)
        x = pdf[value_col].to_numpy(dtype=np.float64)  # None → NaN
        pdf[out_col] = _ewma_numpy(ts, x, float(halflife_ms))
        return pdf

    return tier.groupBy(*key_cols).applyInPandas(smooth, schema=schema)
