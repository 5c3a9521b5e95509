"""LTTB selection properties (pure-NumPy kernel, no Spark)."""
import numpy as np

from gorilla_tsc_spark.operators.downsample import lttb_select


def test_endpoints_and_size():
    ts = np.arange(1000, dtype=np.int64) * 60_000
    vs = np.sin(ts / 7e5) * 10
    sel = lttb_select(ts, vs, 50)
    assert len(sel) == 50
    assert sel[0] == 0 and sel[-1] == 999
    assert (np.diff(sel) > 0).all()


def test_spike_preserved():
    ts = np.arange(2000, dtype=np.int64)
    vs = np.zeros(2000)
    vs[777] = 1e6  # a spike LTTB must keep (it dominates its bucket)
    sel = lttb_select(ts, vs, 40)
    assert 777 in set(sel.tolist())


def test_small_series_passthrough():
    ts = np.arange(10, dtype=np.int64)
    vs = np.arange(10, dtype=np.float64)
    assert lttb_select(ts, vs, 50).tolist() == list(range(10))


def test_m4_vs_numpy(spark):
    """M4 per-bucket min/max/first/last vs a NumPy reference, including
    a tied-extreme bucket (min -> earliest, max -> latest)."""
    from gorilla_tsc_spark.operators.downsample import m4

    rng = np.random.default_rng(7)
    rows = []
    for s in ("a", "b"):
        ts = np.sort(rng.choice(100_000, size=400, replace=False))
        vs = np.round(rng.normal(0, 10, size=400), 1)  # rounding forces ties
        rows += [(s, int(t), float(v)) for t, v in zip(ts, vs)]
    df = spark.createDataFrame(rows, "series string, t long, v double")

    B = 10_000
    got = {(r["series"], r["bucket"]): r
           for r in m4(df, B).collect()}

    by_key = {}
    for s, t, v in rows:
        by_key.setdefault((s, t // B * B), []).append((t, v))
    assert set(got) == set(by_key)
    for k, pts in by_key.items():
        pts.sort()
        ts = [p[0] for p in pts]
        vs = [p[1] for p in pts]
        r = got[k]
        assert r["n"] == len(pts)
        assert r["v_min"] == min(vs) and r["v_max"] == max(vs)
        assert r["v_first"] == vs[0] and r["v_last"] == vs[-1]
        assert r["t_first"] == ts[0] and r["t_last"] == ts[-1]
        # tie policy: min -> earliest occurrence, max -> latest
        assert r["t_min"] == min(t for t, v in pts if v == min(vs))
        assert r["t_max"] == max(t for t, v in pts if v == max(vs))


def test_m4_custom_column_names_and_negative_ts(spark):
    """m4 must work with non-default column names (the struct
    tie-break used to hardcode field .t) and floor-bucket negative
    timestamps like every tier."""
    from gorilla_tsc_spark.operators.downsample import m4

    df = spark.createDataFrame(
        [("s", -1, 5.0), ("s", -60_000, 3.0), ("s", 10, 7.0)],
        "conv_id string, ts_ms long, v_double double")
    rows = {r["bucket"]: r for r in
            m4(df, 60_000, key="conv_id", ts_col="ts_ms",
               v_col="v_double").collect()}
    assert set(rows) == {-60_000, 0}  # floor, not trunc-to-zero
    assert rows[-60_000]["n"] == 2
    assert rows[-60_000]["v_min"] == 3.0 and rows[-60_000]["v_max"] == 5.0
    assert rows[-60_000]["t_min"] == -60_000 and rows[-60_000]["t_max"] == -1
    assert rows[0]["v_first"] == rows[0]["v_last"] == 7.0
