"""fastdecode.decode_payload must equal GorillaDecoder bit-for-bit."""
from __future__ import annotations

import numpy as np

from gorilla_tsc_spark.codec.fastdecode import decode_payload
from gorilla_tsc_spark.codec.gorilla import GorillaDecoder, encode_block

DAY_MS = 86_400_000
BASE = 1_700_000_000_000 // DAY_MS * DAY_MS


def _check(ts, vals_u64, block_ts):
    enc = encode_block(block_ts, np.asarray(ts, np.int64),
                       np.asarray(vals_u64, np.uint64))
    enc.close()
    payload = enc.to_bytes()
    t_ref, v_ref = GorillaDecoder(payload).read_all()
    t_f, v_f = decode_payload(payload)
    assert np.array_equal(np.array(t_f, np.int64), t_ref)
    assert np.array_equal(np.array(v_f, np.uint64).astype(np.uint64), v_ref)


def test_shapes_and_specials():
    rng = np.random.default_rng(3)
    for n in (1, 2, 3, 10, 257, 5000):
        ts = BASE + np.cumsum(rng.integers(1, 120_000, n)).astype(np.int64)
        for vals in (
            rng.standard_normal(n),
            np.full(n, 7.25),
            rng.choice([np.nan, np.inf, -np.inf, -0.0, 1.5, 2.0, 2.0], n),
            rng.integers(-100, 100, n).astype(np.float64),
        ):
            _check(ts, vals.view(np.uint64), BASE)


def test_dod_buckets_and_long_values():
    rng = np.random.default_rng(5)
    strides = rng.choice([1, 2, 59, 60, 61, 4000, 100_000, 8_000_000], 2000)
    ts = BASE + np.cumsum(strides).astype(np.int64)
    vals = rng.integers(-5, 5, 2000).astype(np.int64).view(np.uint64)
    _check(ts, vals, BASE)


def test_empty_block():
    enc = encode_block(BASE, np.array([], np.int64), np.array([], np.uint64))
    enc.close()
    t, v = decode_payload(enc.to_bytes())
    assert t == [] and v == []
