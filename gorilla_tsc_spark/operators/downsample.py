"""LTTB (largest-triangle-three-buckets) downsampling per series.

The standard time-series visualization downsampler (Steinarsson 2013,
"Downsampling Time Series for Visual Representation"; TimescaleDB
ships it as ``lttb()``): keep the first and last point, split the
interior into ``n_out - 2`` equal index buckets, and from each bucket
keep the point forming the largest triangle with the previously kept
point and the next bucket's centroid.

Selection is sequential across buckets (each choice depends on the
previous), so the operator is a per-series ``applyInPandas`` kernel —
the engine's usual shape: parallelism across series, NumPy inside
(areas per bucket are vectorized; the Python loop is one iteration per
OUTPUT bucket, not per point).

Driver gating (queries.q_lttb): values of the selected points are
algorithm-defined and not SQL-expressible, but the CONTRACT is — the
gated query emits per-series (n_out, first/last ts, within_contract)
where the contract (ts strictly increasing, endpoints preserved,
every selected point a member of the source) is audited Spark-side and
the oracle recomputes the expected shape from the raw table.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

LTTB_SCHEMA = T.StructType([
    T.StructField("series", T.StringType()),
    T.StructField("idx", T.IntegerType()),
    T.StructField("t", T.LongType()),
    T.StructField("v", T.DoubleType()),
])


def lttb_select(ts: np.ndarray, vs: np.ndarray, n_out: int) -> np.ndarray:
    """Indices of the LTTB-selected points (ascending)."""
    n = len(ts)
    if n_out >= n or n_out <= 2:
        return np.arange(n) if n_out >= n else np.array(
            [0, n - 1][:max(n, 0)], dtype=np.int64)
    t = ts.astype(np.float64)
    v = vs.astype(np.float64)
    # interior bucket boundaries: n_out-2 equal index ranges over 1..n-2
    edges = (1 + (np.arange(n_out - 1, dtype=np.float64)
                  * (n - 2) / (n_out - 2))).astype(np.int64)
    edges[-1] = n - 1
    sel = np.empty(n_out, dtype=np.int64)
    sel[0] = 0
    a = 0
    for i in range(n_out - 2):
        lo, hi = int(edges[i]), int(edges[i + 1])          # bucket [lo, hi)
        nlo, nhi = hi, (int(edges[i + 2]) if i + 2 < len(edges) else n)
        cx = t[nlo:nhi].mean() if nhi > nlo else t[hi - 1]
        cy = v[nlo:nhi].mean() if nhi > nlo else v[hi - 1]
        area = np.abs((t[a] - cx) * (v[lo:hi] - v[a])
                      - (t[a] - t[lo:hi]) * (cy - v[a]))
        a = lo + int(np.argmax(area))
        sel[i + 1] = a
    sel[-1] = n - 1
    return sel


def lttb(points: DataFrame, n_out: int = 100,
         key: str = "series", ts_col: str = "t",
         v_col: str = "v") -> DataFrame:
    """points → ≤n_out LTTB-selected points per series."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        # (t, v) sort makes selection deterministic under tied
        # timestamps regardless of shuffle arrival order
        pdf = pdf.sort_values([ts_col, v_col], kind="mergesort")
        ts = pdf[ts_col].to_numpy(np.int64)
        vs = pdf[v_col].to_numpy(np.float64)
        sel = lttb_select(ts, vs, n_out)
        return pd.DataFrame({
            "series": pdf[key].iloc[0],
            "idx": np.arange(len(sel), dtype=np.int32),
            "t": ts[sel],
            "v": vs[sel],
        })

    return points.groupBy(key).applyInPandas(kernel, schema=LTTB_SCHEMA)


def m4(points: DataFrame, bucket_ms: int, key: str = "series",
       ts_col: str = "t", v_col: str = "v") -> DataFrame:
    """M4 downsampling: per (series, pixel-bucket) keep min, max, first
    and last values (Jugel et al., "M4: A Visualization-Oriented Time
    Series Data Aggregation", VLDB 2014) — the error-free width-based
    aggregation for line charts.

    Unlike LTTB this is a pure aggregate — one keyed groupBy, map-side
    partials, whole-stage codegen, no Python — so it is the downsampler
    to reach for at raw-scan scale; LTTB refines the look of the chart
    when the reduced set is small enough to post-process.  min_by /
    max_by on ts give first/last deterministically; tied extremes
    resolve via the (v, ts) struct ordering (min → earliest tied point,
    max → latest), pinned by the tests.
    """
    t, v = F.col(ts_col), F.col(v_col)
    # floor (not cast-trunc) so negative timestamps bucket like every
    # tier; field aliases so the struct tie-break works for ANY ts/v
    # column names, not just the defaults
    bucket = (F.floor(t / bucket_ms) * bucket_ms).cast("long").alias("bucket")
    vt = F.struct(v.alias("v"), t.alias("t"))
    return (points.groupBy(F.col(key).alias("series"), bucket)
            .agg(F.min(v).alias("v_min"),
                 F.max(v).alias("v_max"),
                 F.min_by(v, t).alias("v_first"),
                 F.max_by(v, t).alias("v_last"),
                 F.min(vt).t.alias("t_min"),
                 F.max(vt).t.alias("t_max"),
                 F.min(t).alias("t_first"),
                 F.max(t).alias("t_last"),
                 F.count(F.lit(1)).alias("n")))
