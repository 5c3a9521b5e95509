"""Gorilla v2 (timestamp + value) codec, bit-identical to the reference.

Re-expresses the semantics of the reference's v2 pipeline
(GorillaCompressor.java:28-143, ValueCompressor.java:27-91,
GorillaDecompressor.java:33-112, ValueDecompressor.java:26-54) in
Python/NumPy. Encoding vectorizes everything that has no sequential
dependence (delta-of-delta bucketing, XOR chains, leading/trailing-zero
counts) and runs one tight per-block loop only for the stateful
leading/trailing window decision; bit packing is a single vectorized pass
(see bits.BitWriter).

Replicated format quirks (required for byte identity):
- dod == -1 zigzags to 0, whose bit-length 0 falls through to the 36-bit
  '1111'+32 branch (GorillaCompressor.java:108-137).
- first point is stored as 27-bit delta + raw 64-bit value
  (GorillaCompressor.java:73-79); an empty block stores first-delta
  (1<<27)-1 via the close marker (GorillaDecompressor.java:64-68).
- 32-bit Java int wraparound applies to delta and delta-of-delta math.
- a first timestamp of 0 keeps the encoder in "write first" state
  (addValue checks storedTimestamp == 0, GorillaCompressor.java:50); the
  decoder mirrors this, so the pair stays consistent.
"""
from __future__ import annotations

import numpy as np

from .bits import U64, BitReader, BitWriter, clz64, ctz64

FIRST_DELTA_BITS = 27
_I32_MIN, _U32 = -(1 << 31), (1 << 32) - 1


def to_i32(x: int) -> int:
    """Java (int) cast: wrap to signed 32-bit."""
    return ((x + (1 << 31)) & _U32) + _I32_MIN


def zigzag32(n: int) -> int:
    return ((n << 1) ^ (n >> 31)) & _U32


def unzigzag32(n: int) -> int:
    n &= _U32
    return (n >> 1) ^ -(n & 1)


class LastValuePredictor:
    """predictors/LastValuePredictor.java:10-22."""

    __slots__ = ("stored",)

    def __init__(self) -> None:
        self.stored = 0

    def update(self, value: int) -> None:
        self.stored = value

    def predict(self) -> int:
        return self.stored


class DifferentialFCM:
    """predictors/DifferentialFCM.java:10-47 (table size rounds up to pow2)."""

    __slots__ = ("last_value", "table", "last_hash", "mask")

    def __init__(self, size: int) -> None:
        if size <= 0:
            raise ValueError("Size must be positive")
        size -= 1
        lz = 64 - size.bit_length() if size else 64
        new_size = 1 << ((64 - lz) & 31)  # Java int shift uses count mod 32
        self.table = [0] * new_size
        self.mask = new_size - 1
        self.last_value = 0
        self.last_hash = 0

    def update(self, value: int) -> None:
        delta = (value - self.last_value) & U64
        self.table[self.last_hash] = delta
        # Java: (int)(((lastHash << 5) ^ ((value - lastValue) >> 50)) & mask)
        sdelta = delta - (1 << 64) if delta >> 63 else delta  # signed view
        self.last_hash = ((self.last_hash << 5) ^ (sdelta >> 50)) & self.mask
        self.last_value = value

    def predict(self) -> int:
        return (self.table[self.last_hash] + self.last_value) & U64


def make_predictor(spec: str | None):
    """'last_value' (default) or 'dfcm:<size>' — both codec ends must agree
    (README.adoc:76-77)."""
    if spec is None or spec == "last_value":
        return LastValuePredictor()
    if spec.startswith("dfcm"):
        return DifferentialFCM(dfcm_table_size(spec))
    raise ValueError(f"unknown predictor {spec!r}")


def dfcm_table_size(spec: str | None) -> int:
    """DFCM table size for a predictor spec; 0 = not DFCM (last-value).
    Shared by the Python predictors and the native kernel dispatch so
    both ends always agree on the table size."""
    if spec is None or spec == "last_value":
        return 0
    if spec.startswith("dfcm"):
        return int(spec.split(":")[1]) if ":" in spec else 1024
    raise ValueError(f"unknown predictor {spec!r}")


class GorillaEncoder:
    """Streaming scalar encoder (reference call-for-call semantics)."""

    def __init__(self, block_ts: int, predictor: str | None = None) -> None:
        self.block_ts = block_ts
        self.out = BitWriter()
        self.out.write(block_ts & U64, 64)
        self.stored_ts = 0
        self.stored_delta = 0
        self.predictor = make_predictor(predictor)
        self.slz = 1 << 30  # Integer.MAX_VALUE sentinel
        self.stz = 0
        self.n_points = 0

    def add(self, ts: int, value_bits: int) -> None:
        value_bits &= U64
        self.n_points += 1
        if self.stored_ts == 0:
            self.stored_delta = to_i32(ts - self.block_ts)
            self.stored_ts = ts
            self.out.write(self.stored_delta & ((1 << FIRST_DELTA_BITS) - 1), FIRST_DELTA_BITS)
            self.predictor.update(value_bits)
            self.out.write(value_bits, 64)
            return
        self._compress_ts(ts)
        self._compress_value(value_bits)

    def _compress_ts(self, ts: int) -> None:
        new_delta = to_i32(ts - self.stored_ts)
        dod = to_i32(new_delta - self.stored_delta)
        out = self.out
        if dod == 0:
            out.skip_bit()
        else:
            zz = (zigzag32(dod) - 1) & _U32
            if 1 <= zz < (1 << 7):
                out.write((0x02 << 7) | zz, 9)
            elif 1 <= zz < (1 << 9):
                out.write((0x06 << 9) | zz, 12)
            elif 1 <= zz < (1 << 12):
                out.write((0x0E << 12) | zz, 16)
            else:  # incl. zz == 0 (dod == -1 quirk)
                out.write((0x0F << 32) | zz, 36)
            self.stored_delta = new_delta
        self.stored_ts = ts

    def _compress_value(self, value: int) -> None:
        xor = self.predictor.predict() ^ value
        self.predictor.update(value)
        out = self.out
        if xor == 0:
            out.skip_bit()
            return
        lz = 64 - xor.bit_length()
        tz = (xor & -xor).bit_length() - 1
        if lz >= self.slz and tz >= self.stz:
            sig = 64 - self.slz - self.stz
            out.write(0b10, 2)
            out.write(xor >> self.stz, sig)
        else:
            sig = 64 - lz - tz
            out.write((0b11 << 12) | (lz << 6) | ((sig - 1) & 0x3F), 14)
            out.write(xor >> tz, sig)
            self.slz, self.stz = lz, tz

    def close(self) -> None:
        self.out.write(0x0F, 4)
        self.out.write(0xFFFFFFFF, 32)
        self.out.skip_bit()

    def long_array(self, flushed: bool = True) -> list[int]:
        return self.out.long_array(flushed=flushed)

    def to_bytes(self) -> bytes:
        return self.out.to_bytes()

    @property
    def n_bits(self) -> int:
        return self.out.total_bits


def encode_block(block_ts: int, ts: np.ndarray, value_bits: np.ndarray,
                 predictor: str | None = None) -> GorillaEncoder:
    """Vectorized block encode; bit-identical to feeding ``add`` point-wise.

    ``ts`` int64 epoch units, ``value_bits`` uint64 raw words. With the
    default last-value predictor the XOR chain, dod buckets and lz/tz
    counts are NumPy-vectorized; only the leading/trailing window scan is
    a per-block Python loop. Other predictors fall back to the scalar path.
    """
    enc = GorillaEncoder(block_ts, predictor)
    n = len(ts)
    if n == 0:
        return enc
    ts = np.asarray(ts, dtype=np.int64)
    value_bits = np.asarray(value_bits, dtype=np.uint64)
    if not isinstance(enc.predictor, LastValuePredictor):
        for t, v in zip(ts.tolist(), value_bits.tolist()):
            enc.add(int(t), int(v))
        return enc
    if int(ts[0]) == 0:
        # ts==0 sentinel quirk: scalar path keeps re-writing "first"
        for t, v in zip(ts.tolist(), value_bits.tolist()):
            enc.add(int(t), int(v))
        return enc

    out = enc.out
    first_delta = to_i32(int(ts[0]) - block_ts)
    out.write(first_delta & ((1 << FIRST_DELTA_BITS) - 1), FIRST_DELTA_BITS)
    out.write(int(value_bits[0]), 64)
    enc.n_points = n
    enc.stored_ts = int(ts[-1])
    enc.predictor.update(int(value_bits[-1]))
    if n == 1:
        enc.stored_delta = first_delta
        return enc

    # --- timestamps: delta-of-delta, fully vectorized ---
    deltas = (ts[1:] - ts[:-1]).astype(np.int32)  # Java (int) wrap
    prev = np.empty_like(deltas)
    prev[0] = first_delta
    prev[1:] = deltas[:-1]
    dod = (deltas.astype(np.int64) - prev.astype(np.int64)).astype(np.int32).astype(np.int64)
    zz = (((dod << 1) ^ (dod >> 31)).astype(np.uint32).astype(np.int64) - 1) & _U32
    ts_code = np.select(
        [dod == 0, (zz >= 1) & (zz < 128), (zz >= 128) & (zz < 512), (zz >= 512) & (zz < 4096)],
        [0, (0x02 << 7) | zz, (0x06 << 9) | zz, (0x0E << 12) | zz],
        default=(0x0F << 32) | zz,
    )
    ts_width = np.select(
        [dod == 0, (zz >= 1) & (zz < 128), (zz >= 128) & (zz < 512), (zz >= 512) & (zz < 4096)],
        [1, 9, 12, 16], default=36,
    )
    # storedDelta only advances when dod != 0, but dod==0 means delta
    # unchanged, so deltas[i-1] is always the live storedDelta.
    enc.stored_delta = int(deltas[-1])

    # --- values: XOR chain + exact lz/tz, vectorized ---
    xor = value_bits[1:] ^ value_bits[:-1]
    lz_a = clz64(xor)
    tz_a = ctz64(xor)

    vals, widths = out.vals, out.widths
    slz, stz = 1 << 30, 0
    tcode, twidth = ts_code.tolist(), ts_width.tolist()
    xor_l, lz_l, tz_l = xor.tolist(), lz_a.tolist(), tz_a.tolist()
    total = 0
    for i in range(n - 1):
        vals.append(tcode[i])
        w = twidth[i]
        x = xor_l[i]
        if x == 0:
            vals.append(0)
            widths.append(w)
            widths.append(1)
            total += w + 1
            continue
        lz, tz = lz_l[i], tz_l[i]
        if lz >= slz and tz >= stz:
            sig = 64 - slz - stz
            vals.append(0b10)
            vals.append(x >> stz)
            widths.append(w)
            widths.append(2)
            widths.append(sig)
            total += w + 2 + sig
        else:
            sig = 64 - lz - tz
            vals.append((0b11 << 12) | (lz << 6) | ((sig - 1) & 0x3F))
            vals.append(x >> tz)
            widths.append(w)
            widths.append(14)
            widths.append(sig)
            total += w + 14 + sig
            slz, stz = lz, tz
    out.total_bits += total
    enc.slz, enc.stz = slz, stz
    return enc


class GorillaDecoder:
    """Pull decoder (GorillaDecompressor.java:42-112)."""

    def __init__(self, words, predictor: str | None = None) -> None:
        self.r = BitReader(words)
        self.block_ts = self.r.get_long(64)
        self.stored_ts = 0
        self.stored_delta = 0
        self.stored_val = 0
        self.end = False
        self.predictor = make_predictor(predictor)
        self.slz = 1 << 30
        self.stz = 0

    def read_pair(self):
        if self.end:
            return None
        if self.stored_ts == 0:
            d = self.r.get_long(FIRST_DELTA_BITS)
            if d == (1 << FIRST_DELTA_BITS) - 1:
                self.end = True
                return None
            self.stored_delta = d
            self.stored_val = self.r.get_long(64)
            self.predictor.update(self.stored_val)
            self.stored_ts = self.block_ts + d
            return (self.stored_ts, self.stored_val)
        instr = self.r.next_clear_bit(4)
        if instr == 0x00:
            self.stored_ts = self.stored_delta + self.stored_ts
            self.stored_val = self._next_value()
            return (self.stored_ts, self.stored_val)
        if instr == 0x02:
            dd = self.r.get_long(7)
        elif instr == 0x06:
            dd = self.r.get_long(9)
        elif instr == 0x0E:
            dd = self.r.get_long(12)
        else:  # 0x0F
            dd = self.r.get_long(32)
            if dd == 0xFFFFFFFF:
                self.end = True
                return None
        dd = unzigzag32(dd + 1)
        self.stored_delta = self.stored_delta + dd
        self.stored_ts = self.stored_delta + self.stored_ts
        self.stored_val = self._next_value()
        return (self.stored_ts, self.stored_val)

    def _next_value(self) -> int:
        c = self.r.next_clear_bit(2)
        if c == 3:
            self.slz = self.r.get_long(6)
            sig = self.r.get_long(6) + 1
            self.stz = 64 - sig - self.slz
        if c >= 2:
            value = self.r.get_long(64 - self.slz - self.stz)
            value = (value << self.stz) & U64
            value = self.predictor.predict() ^ value
            self.predictor.update(value)
            return value
        # Repeat path: the reference encoder updates its predictor on
        # EVERY value (ValueCompressor.java:37-39) but the reference
        # decoder skips the update here (ValueDecompressor.java:53) — a
        # latent upstream asymmetry that permanently desyncs DFCM once
        # xor==0 occurs. We update, which exactly inverts the encoder
        # for all predictors and is a no-op for LastValue (so outputs
        # agree with the reference decoder on every stream it can
        # actually decode — all its test vectors pass bit-for-bit).
        value = self.predictor.predict()
        self.predictor.update(value)
        return value

    def read_all(self, limit: int | None = None):
        """Decode the whole block → (ts int64 array, value uint64 array)."""
        ts_out, v_out = [], []
        while limit is None or len(ts_out) < limit:
            p = self.read_pair()
            if p is None:
                break
            ts_out.append(p[0])
            v_out.append(p[1])
        return (np.array(ts_out, dtype=np.int64),
                np.array(v_out, dtype=np.uint64))
