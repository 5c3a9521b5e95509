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
