"""Native C kernel ≡ Python reference kernels, bit for bit.

The C fast path (codec/native.py + _gorilla_kernel.c) must reproduce
exactly what the golden-vector-validated Python paths produce:
- encode: byte-identical payloads + n_bits vs codec/batch.py
  (encode_partition_numpy), on every last-value golden fixture and on
  random corpora spanning the dod buckets, XOR window churn, repeats
  and single-point blocks;
- decode: identical (ts, value-word) streams vs codec/fastdecode.

When no C compiler is available the module is skipped and the engine
runs the Python kernels (native.decode_many/encode_many return None).
"""
from __future__ import annotations

import numpy as np
import pytest

from gorilla_tsc_spark.codec import native
from gorilla_tsc_spark.codec.batch import encode_partition_numpy
from gorilla_tsc_spark.codec.fastdecode import decode_payload

from .conftest import fixture_names, load_fixture

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="no C compiler available")

U64 = (1 << 64) - 1


def _lv_fixtures():
    out = []
    for n in fixture_names():
        fx = load_fixture(n)
        if (fx["mode"] == "gorilla64" and fx["input"]["close"]
                and fx["input"]["points"]):
            out.append(n)
    return out


@pytest.mark.parametrize("name", _lv_fixtures())
def test_native_matches_golden(name):
    fx = load_fixture(name)
    pts = [(ts, int(v, 16)) for ts, v in fx["input"]["points"]]
    ts = np.array([p[0] for p in pts], dtype=np.int64)
    vb = np.array([p[1] for p in pts], dtype=np.uint64)
    starts = np.array([0], np.int64)
    counts = np.array([len(pts)], np.int64)
    bts = np.array([fx["input"]["blockts"]], np.int64)
    p_ref, bits_ref = encode_partition_numpy(starts, counts, bts, ts, vb)
    p_nat, bits_nat = native.encode_many(starts, counts, bts, ts, vb)
    assert p_nat[0] == p_ref[0]
    assert int(bits_nat[0]) == int(bits_ref[0])
    t_ref, v_ref = decode_payload(p_ref[0])
    t_n, v_n, cnt = native.decode_many([p_ref[0]], counts)
    assert t_n.tolist() == t_ref
    assert v_n.tolist() == v_ref


def _vo_fixtures():
    out = []
    for n in fixture_names():
        fx = load_fixture(n)
        if fx["mode"] in ("v1", "v32") and fx["input"]["points"]:
            out.append(n)
    return out


@pytest.mark.parametrize("name", _vo_fixtures())
def test_native_valueonly_matches_golden(name):
    from gorilla_tsc_spark.codec.valueonly import (Compressor32, Compressor64,
                                                   Decompressor32,
                                                   Decompressor64)
    fx = load_fixture(name)
    word = 64 if fx["mode"] == "v1" else 32
    vb = np.array([int(v, 16) for _, v in fx["input"]["points"]],
                  dtype=np.uint64)
    enc = Compressor64() if word == 64 else Compressor32()
    enc.add_array(vb if word == 64 else vb.astype(np.uint32))
    enc.close()
    p_ref = enc.to_bytes()
    starts = np.array([0], np.int64)
    counts = np.array([len(vb)], np.int64)
    p_nat, bits_nat = native.encode_values_many(starts, counts, vb, word)
    assert p_nat[0] == p_ref
    assert int(bits_nat[0]) == enc.out.total_bits
    dec = (Decompressor64 if word == 64 else Decompressor32)(p_ref)
    v_ref = dec.read_all().astype(np.uint64)
    v_nat, cnt = native.decode_values_many([p_ref], counts, word)
    assert np.array_equal(v_nat, v_ref)


def _lossy_fixtures():
    out = []
    for n in fixture_names():
        fx = load_fixture(n)
        if fx["mode"].startswith("lossy32") and fx["input"]["points"]:
            out.append(n)
    return out


@pytest.mark.parametrize("name", _lossy_fixtures())
def test_native_lossy32_matches_golden(name):
    from gorilla_tsc_spark.codec.lossy import LossyCompressor32
    fx = load_fixture(name)
    log = int(fx["mode"].split(":")[1])
    vb = np.array([int(v, 16) for _, v in fx["input"]["points"]],
                  dtype=np.uint64)
    enc = LossyCompressor32(log)
    for b in vb.tolist():
        enc.add_bits(int(b))
    enc.close()
    p_ref = enc.out.to_bytes()
    starts = np.array([0], np.int64)
    counts = np.array([len(vb)], np.int64)
    p_nat, bits_nat = native.encode_lossy32_many(starts, counts, vb, log)
    assert p_nat[0] == p_ref
    assert int(bits_nat[0]) == enc.out.total_bits


@pytest.mark.parametrize("mode", ["pmc", "swing"])
def test_native_filters_match_golden(mode):
    from gorilla_tsc_spark.codec.lossy import pmc_mr_filter, swing_filter
    names = [n for n in fixture_names()
             if load_fixture(n)["mode"].startswith(mode)]
    assert names
    for name in names:
        fx = load_fixture(name)
        # mode carries epsilon as float32 hex bits
        eps = float(np.uint32(int(fx["mode"].split(":")[1], 16))
                    .view(np.float32))
        vb = np.array([int(v, 16) for _, v in fx["input"]["points"]],
                      dtype=np.uint32)
        vs = vb.view(np.float32)
        ts = np.array([t for t, _ in fx["input"]["points"]], dtype=np.int64)
        one = np.array([0], np.int64), np.array([len(vs)], np.int64)
        if mode == "pmc":
            t0, t1, bits, per = native.pmc_filter_many(*one, ts, vs, eps)
            segs = pmc_mr_filter(ts, vs, eps)
            assert int(per[0]) == len(segs)
            assert t0.tolist() == [s.t0 for s in segs]
            assert t1.tolist() == [s.t1 for s in segs]
            assert bits.tolist() == [s.value_bits for s in segs]
        else:
            t0, t1, a, b, per = native.swing_filter_many(*one, ts, vs, eps)
            segs = swing_filter(ts, vs, eps)
            assert int(per[0]) == len(segs)
            assert t0.tolist() == [s.t0 for s in segs]
            assert t1.tolist() == [s.t1 for s in segs]
            assert a.tolist() == [s.line.a for s in segs]
            assert b.tolist() == [s.line.b for s in segs]


def _random_partition(seed: int):
    rng = np.random.default_rng(seed)
    all_ts, all_vb, starts, counts, bts = [], [], [], [], []
    pos = 0
    for g in range(40):
        n = int(rng.integers(1, 300))
        t0 = 1_700_000_000_000 + g * 86_400_000
        ts = t0 + np.cumsum(rng.integers(1, 90_000, n)).astype(np.int64)
        if g % 4 == 0:          # dod=0 runs + -1 quirk
            ts = t0 + 1000 * np.arange(n, dtype=np.int64)
            ts[n // 2:] -= 1
        kind = g % 3
        if kind == 0:
            v = rng.normal(20, 5, n)
        elif kind == 1:
            v = np.repeat(rng.normal(10, 1), n)  # xor==0 repeats
        else:
            v = rng.integers(0, 1000, n).astype(np.float64)
        all_ts.append(ts)
        all_vb.append(v.view(np.uint64))
        starts.append(pos)
        counts.append(n)
        bts.append((int(ts[0]) // 86_400_000) * 86_400_000)
        pos += n
    return (np.array(starts, np.int64), np.array(counts, np.int64),
            np.array(bts, np.int64), np.concatenate(all_ts),
            np.concatenate(all_vb))


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_native_matches_numpy_random(seed):
    starts, counts, bts, ts, vb = _random_partition(seed)
    p_ref, bits_ref = encode_partition_numpy(starts, counts, bts, ts, vb)
    p_nat, bits_nat = native.encode_many(starts, counts, bts, ts, vb)
    assert all(a == b for a, b in zip(p_ref, p_nat))
    assert np.array_equal(np.asarray(bits_ref), np.asarray(bits_nat))
    t_n, v_n, cnt = native.decode_many(p_ref, counts)
    off = 0
    for i, p in enumerate(p_ref):
        t_ref, v_ref = decode_payload(p)
        n = len(t_ref)
        assert t_n[off:off + n].tolist() == t_ref
        assert v_n[off:off + n].tolist() == v_ref
        off += n
    assert off == len(t_n)


def test_native_dfcm_matches_golden():
    """Golden DFCM vector stays bit-exact through the C predictor path
    (DifferentialFCM.java:10-47; verdict r2 item 3)."""
    from gorilla_tsc_spark.codec.gorilla import GorillaDecoder, encode_block
    fx = load_fixture("dfcm")
    pts = [(ts, int(v, 16)) for ts, v in fx["input"]["points"]]
    ts = np.array([p[0] for p in pts], dtype=np.int64)
    vb = np.array([p[1] for p in pts], dtype=np.uint64)
    starts = np.array([0], np.int64)
    counts = np.array([len(pts)], np.int64)
    bts = np.array([fx["input"]["blockts"]], np.int64)
    enc = encode_block(int(bts[0]), ts, vb, "dfcm:1024")
    enc.close()
    p_ref = enc.to_bytes()
    p_nat, bits_nat = native.encode_many(starts, counts, bts, ts, vb,
                                         pred_size=1024)
    assert bytes(p_nat[0]) == p_ref
    assert int(bits_nat[0]) == enc.n_bits
    t_n, v_n, cnt = native.decode_many([p_ref], counts, pred_size=1024)
    t_s, v_s = GorillaDecoder(p_ref, "dfcm:1024").read_all()
    assert np.array_equal(t_n, t_s) and np.array_equal(t_n, ts)
    assert np.array_equal(v_n, v_s) and np.array_equal(v_n, vb)


@pytest.mark.parametrize("table_size", [64, 1000, 1024])
def test_native_dfcm_random(table_size):
    """Random corpora through the DFCM C path ≡ scalar Python codec,
    including non-pow2 table sizes (rounded up like the reference)."""
    from gorilla_tsc_spark.codec.gorilla import GorillaDecoder, encode_block
    starts, counts, bts, ts, vb = _random_partition(table_size)
    pred = f"dfcm:{table_size}"
    p_ref = []
    for i in range(len(starts)):
        s, c = int(starts[i]), int(counts[i])
        enc = encode_block(int(bts[i]), ts[s:s + c], vb[s:s + c], pred)
        enc.close()
        p_ref.append(enc.to_bytes())
    p_nat, _ = native.encode_many(starts, counts, bts, ts, vb,
                                  pred_size=table_size)
    assert [bytes(x) for x in p_nat] == p_ref
    t_n, v_n, cnt = native.decode_many(p_ref, counts, pred_size=table_size)
    assert np.array_equal(t_n, ts)
    assert np.array_equal(v_n, vb)


def test_native_decode_bounded_by_expected():
    """A truncated/corrupt payload must fail cleanly instead of walking
    past its bytes (zeros decode as dod=0 repeats) — ADVICE r2."""
    starts, counts, bts, ts, vb = _random_partition(3)
    p_ref, _ = encode_partition_numpy(starts, counts, bts, ts, vb)
    # truncated final payload: the zero pad would repeat forever
    trunc = list(p_ref)
    trunc[-1] = trunc[-1][: len(trunc[-1]) // 2]
    with pytest.raises(ValueError):
        native.decode_many(trunc, counts)
    # metadata drift: expected count lower than the real payload
    bad = counts.copy()
    bad[0] -= 1
    with pytest.raises(ValueError):
        native.decode_many(p_ref, bad)
