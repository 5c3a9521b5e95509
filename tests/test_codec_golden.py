"""Byte-identity tests: every golden fixture generated from the reference
implementation must be reproduced exactly — the full long[] stream
(including trailing-word semantics), sizes, lossy segments and decoded
round-trips. See tests/fixtures/README.md for provenance.
"""
from __future__ import annotations

import numpy as np
import pytest

from gorilla_tsc_spark.codec import (
    Compressor32,
    Compressor64,
    Decompressor32,
    Decompressor64,
    GorillaDecoder,
    GorillaEncoder,
    LossyCompressor32,
    encode_block,
    pmc_mr_filter,
    reconstruct_pmc,
    reconstruct_swing,
    swing_filter,
)

from .conftest import fixture_names, load_fixture

U64 = (1 << 64) - 1


def _hex2i(h: str) -> int:
    return int(h, 16)


def _points(fx):
    return [(ts, _hex2i(v)) for ts, v in fx["input"]["points"]]


GORILLA = [n for n in fixture_names() if load_fixture(n)["mode"].startswith("gorilla64")]
V1 = [n for n in fixture_names() if load_fixture(n)["mode"] == "v1"]
V32 = [n for n in fixture_names() if load_fixture(n)["mode"] == "v32"]
LOSSY = [n for n in fixture_names() if load_fixture(n)["mode"].startswith("lossy32")]
PMC = [n for n in fixture_names() if load_fixture(n)["mode"].startswith("pmc")]
SWING = [n for n in fixture_names() if load_fixture(n)["mode"].startswith("swing")]


@pytest.mark.parametrize("name", GORILLA)
def test_gorilla_encode_bitstream(name):
    fx = load_fixture(name)
    mode = fx["mode"]
    predictor = f"dfcm:{mode.split(':')[1]}" if "dfcm" in mode else None
    pts = _points(fx)
    enc = GorillaEncoder(fx["input"]["blockts"], predictor)
    for ts, v in pts:
        enc.add(ts, v)
    if fx["input"]["close"]:
        enc.close()
    got = [w & U64 for w in enc.long_array(flushed=fx["input"]["close"])]
    want = [_hex2i(h) for h in fx["longs"]]
    assert got == want, f"{name}: scalar bitstream mismatch ({len(got)} vs {len(want)} words)"


@pytest.mark.parametrize("name", GORILLA)
def test_gorilla_encode_block_vectorized(name):
    fx = load_fixture(name)
    mode = fx["mode"]
    predictor = f"dfcm:{mode.split(':')[1]}" if "dfcm" in mode else None
    pts = _points(fx)
    ts = np.array([p[0] for p in pts], dtype=np.int64)
    vb = np.array([p[1] for p in pts], dtype=np.uint64)
    enc = encode_block(fx["input"]["blockts"], ts, vb, predictor)
    if fx["input"]["close"]:
        enc.close()
    got = [w & U64 for w in enc.long_array(flushed=fx["input"]["close"])]
    want = [_hex2i(h) for h in fx["longs"]]
    assert got == want, f"{name}: vectorized bitstream mismatch"


@pytest.mark.parametrize("name", GORILLA)
def test_gorilla_decode(name):
    fx = load_fixture(name)
    mode = fx["mode"]
    predictor = f"dfcm:{mode.split(':')[1]}" if "dfcm" in mode else None
    words = [_hex2i(h) for h in fx["longs"]]
    dec = GorillaDecoder(words, predictor)
    want = [(ts, _hex2i(v)) for ts, v in fx["decoded"]]
    got = []
    for _ in range(len(want)):
        p = dec.read_pair()
        assert p is not None
        got.append(p)
    assert got == want, f"{name}: decode mismatch"
    if fx["input"]["close"]:
        assert dec.read_pair() is None
    # decoded output equals original input (lossless round trip)
    assert want == _points(fx)[: len(want)]


@pytest.mark.parametrize("name", V1)
def test_v1_roundtrip(name):
    fx = load_fixture(name)
    c = Compressor64()
    for _, v in _points(fx):
        c.add_bits(v)
    c.close()
    got = [w & U64 for w in c.long_array()]
    assert got == [_hex2i(h) for h in fx["longs"]], f"{name}: v1 bitstream"
    assert c.size == fx["size"], f"{name}: size {c.size} != {fx['size']}"
    d = Decompressor64([_hex2i(h) for h in fx["longs"]])
    vals = d.read_all().tolist()
    assert vals == [_hex2i(h) for h in fx["decoded"]], f"{name}: v1 decode"


@pytest.mark.parametrize("name", V1)
def test_v1_vectorized(name):
    fx = load_fixture(name)
    c = Compressor64()
    c.add_array(np.array([v for _, v in _points(fx)], dtype=np.uint64))
    c.close()
    got = [w & U64 for w in c.long_array()]
    assert got == [_hex2i(h) for h in fx["longs"]]
    assert c.size == fx["size"]


@pytest.mark.parametrize("name", V32)
def test_v32_roundtrip(name):
    fx = load_fixture(name)
    c = Compressor32()
    for _, v in _points(fx):
        c.add_bits(v)
    c.close()
    got = [w & U64 for w in c.long_array()]
    assert got == [_hex2i(h) for h in fx["longs"]], f"{name}: v32 bitstream"
    assert c.size == fx["size"]
    d = Decompressor32([_hex2i(h) for h in fx["longs"]])
    vals = [v & 0xFFFFFFFF for v in d.read_all().tolist()]
    assert vals == [_hex2i(h) & 0xFFFFFFFF for h in fx["decoded"]]


@pytest.mark.parametrize("name", V32)
def test_v32_vectorized(name):
    fx = load_fixture(name)
    c = Compressor32()
    c.add_array(np.array([v for _, v in _points(fx)], dtype=np.uint32))
    c.close()
    assert [w & U64 for w in c.long_array()] == [_hex2i(h) for h in fx["longs"]]
    assert c.size == fx["size"]


@pytest.mark.parametrize("name", LOSSY)
def test_lossy32(name):
    fx = load_fixture(name)
    log = int(fx["mode"].split(":")[1])
    c = LossyCompressor32(log)
    for _, v in _points(fx):
        c.add_bits(v)
    c.close()
    assert [w & U64 for w in c.long_array()] == [_hex2i(h) for h in fx["longs"]], f"{name}: bits"
    assert c.size == fx["size"]
    assert c.cases == fx["cases"]
    d = Decompressor32([_hex2i(h) for h in fx["longs"]])
    vals = [v & 0xFFFFFFFF for v in d.read_all().tolist()]
    assert vals == [_hex2i(h) & 0xFFFFFFFF for h in fx["decoded"]]
    # lossy bound: |decoded - original| <= 2^log
    orig = np.array([v for _, v in _points(fx)], dtype=np.uint32).view(np.float32)
    dec = np.array(vals, dtype=np.uint32).view(np.float32)
    assert np.all(np.abs(orig.astype(np.float64) - dec.astype(np.float64)) <= 2.0**log)


@pytest.mark.parametrize("name", PMC)
def test_pmc(name):
    fx = load_fixture(name)
    eps = np.uint32(_hex2i(fx["mode"].split(":")[1])).view(np.float32)
    ts = np.array([p[0] for p in fx["input"]["points"]], dtype=np.int64)
    vb = np.array([_hex2i(p[1]) for p in fx["input"]["points"]], dtype=np.uint32)
    segs = pmc_mr_filter(ts, vb.view(np.float32), float(eps))
    got = [[s.t0, s.t1, s.value_bits] for s in segs]
    want = [[t0, t1, _hex2i(v) & 0xFFFFFFFF] for t0, t1, v in fx["segments"]]
    assert got == want, f"{name}: segments"
    rec = reconstruct_pmc(segs).view(np.uint32).tolist()
    assert rec == [_hex2i(h) & 0xFFFFFFFF for h in fx["reconstructed"]]


@pytest.mark.parametrize("name", SWING)
def test_swing(name):
    fx = load_fixture(name)
    eps = np.uint32(_hex2i(fx["mode"].split(":")[1])).view(np.float32)
    ts = np.array([p[0] for p in fx["input"]["points"]], dtype=np.int64)
    vb = np.array([_hex2i(p[1]) for p in fx["input"]["points"]], dtype=np.uint32)
    segs = swing_filter(ts, vb.view(np.float32), float(eps))
    got = [
        [s.t0, s.t1,
         int(np.float64(s.line.a).view(np.uint64)),
         int(np.float64(s.line.b).view(np.uint64))]
        for s in segs
    ]
    want = [[t0, t1, _hex2i(a), _hex2i(b)] for t0, t1, a, b in fx["segments"]]
    assert got == want, f"{name}: segments"
    rec = reconstruct_swing(segs).view(np.uint32).tolist()
    assert rec == [_hex2i(h) & 0xFFFFFFFF for h in fx["reconstructed"]]
