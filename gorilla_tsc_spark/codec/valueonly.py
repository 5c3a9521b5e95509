"""Value-only Gorilla codecs: v1 64-bit and the fork's 32-bit variant.

Semantics per the reference:
- 64-bit: Compressor.java:32-139 / Decompressor.java:29-76. First value is
  64 raw bits; XOR chain with leading-zeros capped at 31
  (Compressor.java:82-84), 5-bit lz + 6-bit significant-bits header (64
  truncates to 0 on write, decoder maps 0 back to 64,
  Decompressor.java:59-62). ``close`` appends canonical NaN as the stream
  terminator (Compressor.java:63-67) — these formats cannot store NaN.
- 32-bit: Compressor32.java:36-149 / Decompressor32.java:32-79. First
  value 32 bits, lz capped at 15, 4-bit lz + 5-bit sig (32 → 0 explicit,
  Compressor32.java:133-137), NaN_INT terminator (Decompressor32.java:20).

``getSize`` bit accounting is replicated exactly (Compressor.java:137-139).
"""
from __future__ import annotations

import numpy as np

from .bits import U64, BitReader, BitWriter, clz64, ctz64

NAN_LONG = 0x7FF8000000000000
NAN_INT = 0x7FC00000
_U32 = (1 << 32) - 1


class _XorEncoder:
    """Shared XOR kernel parameterized by word width (64 or 32)."""

    def __init__(self, word: int) -> None:
        self.word = word
        self.lz_cap_at = word // 2        # lz >= cap_at → cap_to
        self.lz_cap_to = word // 2 - 1
        self.lz_bits = 5 if word == 64 else 4
        self.sig_bits = 6 if word == 64 else 5
        self.mask = U64 if word == 64 else _U32
        self.out = BitWriter()
        self.stored_val = 0
        self.first = True
        self.slz = 1 << 30
        self.stz = 0
        self.size = 0
        self.n_points = 0

    def add_bits(self, value: int) -> None:
        value &= self.mask
        self.n_points += 1
        if self.first:
            self.first = False
            self.stored_val = value
            self.out.write(value, self.word)
            self.size += self.word
            return
        self._compress(value)

    def _compress(self, value: int) -> None:
        w, out = self.word, self.out
        xor = self.stored_val ^ value
        if xor == 0:
            out.skip_bit()
            self.size += 1
        else:
            lz = w - xor.bit_length()
            tz = (xor & -xor).bit_length() - 1
            if lz >= self.lz_cap_at:
                lz = self.lz_cap_to
            out.write_bit()
            self.size += 1
            if lz >= self.slz and tz >= self.stz:
                sig = w - self.slz - self.stz
                out.skip_bit()
                out.write(xor >> self.stz, sig)
                self.size += 1 + sig
            else:
                sig = w - lz - tz
                out.write_bit()
                out.write(lz, self.lz_bits)
                out.write(sig & ((1 << self.sig_bits) - 1), self.sig_bits)
                out.write(xor >> tz, sig)
                self.slz, self.stz = lz, tz
                self.size += 1 + self.lz_bits + self.sig_bits + sig
        self.stored_val = value

    def add_array(self, bits: np.ndarray) -> None:
        """Vectorized bulk add — bit-identical to point-wise ``add_bits``."""
        n = len(bits)
        if n == 0:
            return
        w = self.word
        dtype = np.uint64 if w == 64 else np.uint32
        bits = np.asarray(bits, dtype=dtype)
        i0 = 0
        if self.first:
            self.add_bits(int(bits[0]))
            i0 = 1
            if n == 1:
                return
        self.n_points += n - i0
        prev = np.empty(n - i0, dtype=dtype)
        prev[0] = self.stored_val
        prev[1:] = bits[i0:-1]
        xor = (bits[i0:] ^ prev).astype(np.uint64)
        lz_a = clz64(xor) - (64 - w)
        lz_a = np.where(lz_a >= self.lz_cap_at, self.lz_cap_to, lz_a)
        tz_a = np.minimum(ctz64(xor), w)
        out = self.out
        vals, widths = out.vals, out.widths
        slz, stz = self.slz, self.stz
        lzb, sgb = self.lz_bits, self.sig_bits
        size = total = 0
        xl, ll, tl = xor.tolist(), lz_a.tolist(), tz_a.tolist()
        for i in range(len(xl)):
            x = xl[i]
            if x == 0:
                vals.append(0)
                widths.append(1)
                total += 1
                size += 1
                continue
            lz, tz = ll[i], tl[i]
            if lz >= slz and tz >= stz:
                sig = w - slz - stz
                vals.append(0b10)
                vals.append(x >> stz)
                widths.append(2)
                widths.append(sig)
                total += 2 + sig
                size += 2 + sig
            else:
                sig = w - lz - tz
                vals.append((0b11 << (lzb + sgb)) | (lz << sgb) | (sig & ((1 << sgb) - 1)))
                vals.append(x >> tz)
                widths.append(2 + lzb + sgb)
                widths.append(sig)
                total += 2 + lzb + sgb + sig
                size += 2 + lzb + sgb + sig
                slz, stz = lz, tz
        out.total_bits += total
        self.size += size
        self.slz, self.stz = slz, stz
        self.stored_val = int(bits[-1])

    def long_array(self, flushed: bool = True) -> list[int]:
        return self.out.long_array(flushed=flushed)

    def to_bytes(self) -> bytes:
        return self.out.to_bytes()


class Compressor64(_XorEncoder):
    """v1 64-bit value-only encoder (Compressor.java)."""

    def __init__(self) -> None:
        super().__init__(64)

    def add_double(self, value: float) -> None:
        self.add_bits(int(np.float64(value).view(np.uint64)))

    def close(self) -> None:
        self.add_bits(NAN_LONG)
        self.n_points -= 1  # terminator is not a point
        self.out.skip_bit()


class Compressor32(_XorEncoder):
    """32-bit value-only encoder (Compressor32.java)."""

    def __init__(self) -> None:
        super().__init__(32)

    def add_float(self, value: float) -> None:
        self.add_bits(int(np.float32(value).view(np.uint32)))

    def close(self) -> None:
        self.add_bits(NAN_INT)
        self.n_points -= 1
        self.out.skip_bit()


class _XorDecoder:
    def __init__(self, words, word: int) -> None:
        self.r = BitReader(words)
        self.word = word
        self.nan = NAN_LONG if word == 64 else NAN_INT
        self.lz_bits = 5 if word == 64 else 4
        self.sig_bits = 6 if word == 64 else 5
        self.stored_val = 0
        self.first = True
        self.end = False
        self.slz = 1 << 30
        self.stz = 0

    def read_value(self):
        if self.end:
            return None
        w = self.word
        if self.first:
            self.first = False
            self.stored_val = self.r.get_long(w)
            if self.stored_val == self.nan:
                self.end = True
                return None
            return self.stored_val
        if self.r.read_bit():
            if self.r.read_bit():
                self.slz = self.r.get_long(self.lz_bits)
                sig = self.r.get_long(self.sig_bits)
                if sig == 0:
                    sig = w
                self.stz = w - sig - self.slz
            value = self.r.get_long(w - self.slz - self.stz)
            value = (value << self.stz) & ((1 << w) - 1)
            value ^= self.stored_val
            if value == self.nan:
                self.end = True
                return None
            self.stored_val = value
        return self.stored_val

    def read_all(self) -> np.ndarray:
        vals = []
        while True:
            v = self.read_value()
            if v is None:
                break
            vals.append(v)
        return np.array(vals, dtype=np.uint64 if self.word == 64 else np.uint32)


class Decompressor64(_XorDecoder):
    def __init__(self, words) -> None:
        super().__init__(words, 64)


class Decompressor32(_XorDecoder):
    def __init__(self, words) -> None:
        super().__init__(words, 32)
