"""Property-based codec tests (hypothesis) — beyond the reference's
fixed vectors: arbitrary float64 payloads and timestamp patterns must
round-trip bit-exactly through scalar, batch, and fast-decode paths."""
from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gorilla_tsc_spark.codec.batch import encode_partition, group_runs
from gorilla_tsc_spark.codec.fastdecode import decode_payload
from gorilla_tsc_spark.codec.gorilla import GorillaDecoder, encode_block

DAY_MS = 86_400_000
BASE = 1_700_000_000_000 // DAY_MS * DAY_MS

# any bit pattern, incl. NaN payloads, ±inf, -0.0, denormals
_bits = st.integers(min_value=0, max_value=(1 << 64) - 1)
# strides keep points inside the 27-bit first-delta day window
_strides = st.integers(min_value=0, max_value=500_000)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(_strides, _bits), min_size=1, max_size=300))
def test_roundtrip_any_bits(points):
    ts = BASE + 1 + np.cumsum([p[0] for p in points]).astype(np.int64)
    vb = np.array([p[1] for p in points], dtype=np.uint64)
    enc = encode_block(BASE, ts, vb)
    enc.close()
    payload = enc.to_bytes()
    t1, v1 = GorillaDecoder(payload).read_all()
    assert np.array_equal(t1, ts) and np.array_equal(v1, vb)
    t2, v2 = decode_payload(payload)
    assert np.array_equal(np.array(t2, np.int64), ts)
    assert np.array_equal(np.array(v2, np.uint64), vb)


@settings(max_examples=25, deadline=None)
@given(st.lists(
    st.lists(st.tuples(_strides, _bits), min_size=1, max_size=60),
    min_size=1, max_size=12))
def test_batch_equals_scalar(groups):
    gid, ts_all, vb_all, bts = [], [], [], []
    for g, pts in enumerate(groups):
        b = BASE + (g % 28) * DAY_MS
        ts = b + 1 + np.cumsum([p[0] for p in pts]).astype(np.int64)
        gid.append(np.full(len(pts), g, dtype=np.int64))
        ts_all.append(ts)
        vb_all.append(np.array([p[1] for p in pts], dtype=np.uint64))
        bts.append(b)
    starts, counts = group_runs(np.concatenate(gid))
    payloads, nbits = encode_partition(
        starts, counts, np.array(bts, np.int64),
        np.concatenate(ts_all), np.concatenate(vb_all))
    for i, pts in enumerate(groups):
        enc = encode_block(bts[i], ts_all[i], vb_all[i])
        enc.close()
        assert payloads[i] == enc.to_bytes()
        assert nbits[i] == enc.n_bits
