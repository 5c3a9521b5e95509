"""Partition-level batch Gorilla encoder: encodes MANY blocks in one
vectorized pass.

``encode_block`` (codec/gorilla.py) pays ~200µs of NumPy fixed cost per
block — fatal when a Spark partition holds tens of thousands of small
(conv, day) groups. This kernel amortizes everything across the whole
partition:

- delta-of-delta, zigzag, dod bucket codes, XOR chain and exact lz/tz
  run ONCE over the full point arrays (group boundaries handled with
  masks);
- the only sequential state — the leading/trailing window reuse
  decision (ValueCompressor.java:41-52) — runs in one lean Python loop
  over precomputed lists (~1µs/point);
- bit-packing happens in ONE global NumPy scatter: every block's field
  stream is laid out at a word-aligned offset in a shared uint64
  buffer, then sliced per block.

Output payloads are bit-identical to feeding each group through
``encode_block`` / the reference ``GorillaCompressor`` +
``LongArrayOutput`` byte view (tests/test_batch_encode.py proves
equality against the golden-vector-validated scalar path).
"""
from __future__ import annotations

import numpy as np

from .bits import U64, clz64, ctz64
from .gorilla import FIRST_DELTA_BITS

_U32 = (1 << 32) - 1
_MASK27 = (1 << FIRST_DELTA_BITS) - 1


def group_runs(key: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Start indices and counts of contiguous equal-key runs."""
    n = len(key)
    if n == 0:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    change = np.flatnonzero(key[1:] != key[:-1]) + 1
    starts = np.concatenate(([0], change)).astype(np.int64)
    counts = np.diff(np.concatenate((starts, [n]))).astype(np.int64)
    return starts, counts


def encode_partition(starts: np.ndarray, counts: np.ndarray,
                     block_ts: np.ndarray, ts: np.ndarray,
                     vbits: np.ndarray):
    """Encode every group in one pass.

    starts/counts: group runs (monotone, contiguous, cover all rows).
    block_ts: per-group 64-bit block header timestamp.
    ts: int64 per-row timestamps (in-group ascending).
    vbits: uint64 per-row raw value words.

    Returns (payloads: list[bytes], n_bits: int64[G]).
    """
    n = len(ts)
    G = len(starts)
    if n == 0:
        return [], np.zeros(0, np.int64)
    ts = np.asarray(ts, dtype=np.int64)
    vbits = np.asarray(vbits, dtype=np.uint64)
    ends = starts + counts - 1

    is_first = np.zeros(n, dtype=bool)
    is_first[starts] = True

    # --- timestamps: per-row live delta (storedDelta == previous row's
    # actual delta; dod==0 keeps them equal, so the chain is exact) ---
    delta = np.empty(n, dtype=np.int64)
    delta[1:] = ts[1:] - ts[:-1]
    first_delta = (ts[starts] - block_ts).astype(np.int32).astype(np.int64)
    delta = delta.astype(np.int32).astype(np.int64)
    delta[starts] = first_delta
    prev_delta = np.empty(n, dtype=np.int64)
    prev_delta[1:] = delta[:-1]
    prev_delta[0] = 0
    dod = (delta - prev_delta).astype(np.int32).astype(np.int64)
    zz = (((dod << 1) ^ (dod >> 31)).astype(np.uint32).astype(np.int64) - 1) & _U32
    small = zz >= 1
    ts_code = np.select(
        [dod == 0, small & (zz < 128), small & (zz < 512), small & (zz < 4096)],
        [0, (0x02 << 7) | zz, (0x06 << 9) | zz, (0x0E << 12) | zz],
        default=(0x0F << 32) | zz,
    )
    ts_width = np.select(
        [dod == 0, small & (zz < 128), small & (zz < 512), small & (zz < 4096)],
        [1, 9, 12, 16], default=36,
    )

    # --- values: XOR vs previous row, exact lz/tz ---
    xor = np.empty(n, dtype=np.uint64)
    xor[1:] = vbits[1:] ^ vbits[:-1]
    xor[0] = 0
    lz_a = clz64(xor)
    tz_a = ctz64(xor)

    # --- sequential emission loop (window state + field stream) ---
    vals: list[int] = []
    widths: list[int] = []
    va, wa = vals.append, widths.append
    tcode = ts_code.tolist()
    twidth = ts_width.tolist()
    xor_l = xor.tolist()
    lz_l = lz_a.tolist()
    tz_l = tz_a.tolist()
    vb_l = vbits.tolist()
    ts_l = None  # ts only needed via precomputed codes
    fd_l = first_delta.tolist()
    bts_l = np.asarray(block_ts, dtype=np.int64).tolist()
    starts_l = starts.tolist()
    counts_l = counts.tolist()

    fstart = np.empty(G + 1, dtype=np.int64)  # field index at block start
    cw = 0
    bit_base = np.empty(G + 1, dtype=np.int64)
    for g in range(G):
        s = starts_l[g]
        c = counts_l[g]
        fstart[g] = len(vals)
        bit_base[g] = cw
        # header + first point
        va(bts_l[g] & U64)
        wa(64)
        va(fd_l[g] & _MASK27)
        wa(FIRST_DELTA_BITS)
        va(vb_l[s])
        wa(64)
        cw += 64 + FIRST_DELTA_BITS + 64
        slz, stz = 1 << 30, 0
        for i in range(s + 1, s + c):
            va(tcode[i])
            w = twidth[i]
            x = xor_l[i]
            if x == 0:
                va(0)
                wa(w)
                wa(1)
                cw += w + 1
                continue
            lz = lz_l[i]
            tz = tz_l[i]
            if lz >= slz and tz >= stz:
                sig = 64 - slz - stz
                va(0b10)
                va(x >> stz)
                wa(w)
                wa(2)
                wa(sig)
                cw += w + 2 + sig
            else:
                sig = 64 - lz - tz
                va((0b11 << 12) | (lz << 6) | ((sig - 1) & 0x3F))
                va(x >> tz)
                wa(w)
                wa(14)
                wa(sig)
                cw += w + 14 + sig
                slz, stz = lz, tz
        # terminator: '1111' + 32 ones + one 0 bit
        va(0x0F)
        wa(4)
        va(0xFFFFFFFF)
        wa(32)
        va(0)
        wa(1)
        cw += 37
    fstart[G] = len(vals)
    bit_base[G] = cw

    # --- global packing: word-aligned block offsets, one scatter ---
    W = np.array(widths, dtype=np.int64)
    V = np.array(vals, dtype=np.uint64)
    block_bits = np.diff(bit_base)
    block_words = (block_bits + 63) // 64
    word_off = np.concatenate(([0], np.cumsum(block_words)))
    fields_per_block = np.diff(fstart)
    blk = np.repeat(np.arange(G, dtype=np.int64), fields_per_block)

    cumw = np.cumsum(W)
    local_start = (cumw - W) - bit_base[blk]
    gstart = word_off[blk] * 64 + local_start

    wmod = np.where(W == 64, 0, W).astype(np.uint64)
    mask = np.where(W == 64, np.uint64(U64), (np.uint64(1) << wmod) - np.uint64(1))
    V &= mask
    word = (gstart >> 6).astype(np.int64)
    avail = 64 - (gstart & 63)
    shift = avail - W
    part1 = np.where(shift >= 0, V << np.maximum(shift, 0).astype(np.uint64),
                     V >> np.maximum(-shift, 0).astype(np.uint64))
    buf = np.zeros(int(word_off[-1]) + 1, dtype=np.uint64)
    np.bitwise_or.at(buf, word, part1)
    spans = shift < 0
    if spans.any():
        rem = (-shift[spans]).astype(np.uint64)
        np.bitwise_or.at(buf, word[spans] + 1,
                         V[spans] << (np.uint64(64) - rem))

    allbytes = buf.byteswap().tobytes()
    nbytes = ((block_bits + 7) // 8).tolist()
    off_l = (word_off[:-1] * 8).tolist()
    payloads = [allbytes[o:o + nb] for o, nb in zip(off_l, nbytes)]
    return payloads, block_bits
