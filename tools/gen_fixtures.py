#!/usr/bin/env python3
"""Generate golden codec fixtures by running the REFERENCE implementation.

Compiles /root/reference (read-only, unmodified) with javac, feeds
deterministic test inputs through tools/RefVectors.java, and writes the
resulting exact bitstreams + decoded outputs to tests/fixtures/*.json.

Run once at build time; pytest consumes the JSON without needing Java.
Inputs mirror the reference test suite (EncodeGorillaTest / EncodeTest /
Encode32Test / CompressTest — see SURVEY.md §5) plus new ts52 /
special-float / dod-bucket cases from FIXTURES.md §F2.
"""
from __future__ import annotations

import json
import re
import struct
import subprocess
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
REF = Path("/root/reference")
CLASSES = Path("/tmp/refclasses")
FIXDIR = REPO / "tests" / "fixtures"

BLOCK_TS = 1500400800000  # EncodeGorillaTest.willItBlend block timestamp


def dbits(x: float) -> int:
    return struct.unpack(">Q", struct.pack(">d", x))[0]


def fbits(x: float) -> int:
    return struct.unpack(">I", struct.pack(">f", np.float32(x)))[0]


def compile_ref() -> None:
    CLASSES.mkdir(exist_ok=True)
    srcs = [str(p) for p in REF.glob("src/main/**/*.java") if "benchmark" not in str(p)]
    subprocess.run(["javac", "-encoding", "UTF-8", "-d", str(CLASSES), *srcs], check=True)
    subprocess.run(
        ["javac", "-cp", str(CLASSES), "-d", str(CLASSES), str(REPO / "tools" / "RefVectors.java")],
        check=True,
    )


def parse_willitblend() -> list[tuple[int, int]]:
    java = (REF / "src/test/java/fi/iki/yak/ts/compression/gorilla/EncodeGorillaTest.java").read_text()
    body = java.split("public void willItBlend()")[1].split("comparePairsToCompression")[0]
    return [(int(m.group(1)), int(m.group(2))) for m in re.finditer(r"new Pair\((\d+)L,\s*(\d+)\)", body)]


def parse_swing_simple() -> list[float]:
    java = (REF / "src/test/java/gr/aueb/compression/gorilla/CompressTest.java").read_text()
    body = java.split("public void testSwingFilterSimple()")[1].split("double maxValue")[0]
    return [float(m.group(1)) for m in re.finditer(r"values\.add\(([-0-9.eE]+)\)", body)]


def weather(n: int, seed: int = 7) -> np.ndarray:
    """Deterministic temp-like hourly series (FIXTURES.md §F3 stand-in)."""
    rng = np.random.default_rng(seed)
    t = np.arange(n)
    return (
        12.0
        + 8.0 * np.sin(2 * np.pi * t / (24 * 365.25))
        + 4.0 * np.sin(2 * np.pi * t / 24)
        + rng.normal(0, 0.6, n)
    )


def main() -> None:
    compile_ref()
    FIXDIR.mkdir(parents=True, exist_ok=True)
    lines: list[str] = []

    def case(name, mode, pts, blockts=None, close=True):
        lines.append(f"CASE {name}")
        lines.append(f"MODE {mode}")
        if blockts is not None:
            lines.append(f"BLOCKTS {blockts}")
        lines.append(f"CLOSE {1 if close else 0}")
        lines.append(f"N {len(pts)}")
        for ts, vbits in pts:
            lines.append(f"{ts} {vbits:x}")
        lines.append("END")

    # --- v2 gorilla (ts + value) ---
    blend = parse_willitblend()
    case("willitblend", "gorilla64", blend, blockts=BLOCK_TS)

    simple8_vals = [1.0, -2.0, -2.5, 65537.0, 2147483650.0, -16384.0, 2.8, -38.0]
    simple8_off = [10, 20, 28, 84, 400, 2300, 16384, 16500]
    case("simple8", "gorilla64", [(BLOCK_TS + o, dbits(v)) for o, v in zip(simple8_off, simple8_vals)], blockts=BLOCK_TS)

    sim = [6.00065e6, 6.000656e6, 6.000657e6, 6.000659e6, 6.000661e6]
    now = 1425254400000  # 2015-03-02T00:00Z, as in testEncodeSimilarFloats
    case("similar_floats", "gorilla64", [(now + i + 1, dbits(v)) for i, v in enumerate(sim)], blockts=now)

    rng = np.random.default_rng(42)
    n = 100_000
    ts = BLOCK_TS + 60 * np.arange(1, n + 1)  # 60ms stride like the JMH benchmark
    vals = rng.uniform(0, 10000, n)
    case("large_random", "gorilla64", list(zip(ts.tolist(), [dbits(v) for v in vals])), blockts=BLOCK_TS)

    lvals = rng.integers(0, 2**31, 10_000, dtype=np.int64)
    lts = BLOCK_TS + 60 * np.arange(1, 10_001)
    case("long_channel", "gorilla64", list(zip(lts.tolist(), lvals.tolist())), blockts=BLOCK_TS)

    case("empty", "gorilla64", [], blockts=BLOCK_TS)
    case("copyflush", "gorilla64", [(BLOCK_TS + 1, dbits(1.0)), (BLOCK_TS + 2, dbits(2.0))], blockts=BLOCK_TS, close=False)

    dvals = rng.uniform(-500, 500, 10_000)
    case("dfcm", "gorilla64_dfcm:1024", list(zip(lts.tolist(), [dbits(v) for v in dvals])), blockts=BLOCK_TS)

    ts52_block = 1 << 52
    case("ts52", "gorilla64", [(ts52_block + 100 + 60 * i, dbits(float(i) * 1.5)) for i in range(64)], blockts=ts52_block)

    specials = [
        float("nan"), 1.0, float("inf"), float("-inf"), -0.0, 0.0,
        5e-324, -5e-324, 1.7976931348623157e308,
    ]
    sp = [(BLOCK_TS + 10 * (i + 1), dbits(v)) for i, v in enumerate(specials)]
    sp.insert(3, (BLOCK_TS + 35, 0x7FF8000000000099))  # NaN with payload
    case("special_floats", "gorilla64", sp, blockts=BLOCK_TS)

    # dod bucket boundaries incl. the dod=-1 36-bit quirk (GorillaCompressor.java:108-110)
    dods = [0, -1, 1, 63, -63, 64, -64, 255, -255, 256, -256, 2047, -2047, 2048, -2048, 123456, -123456, 0, -1]
    t, d, pts = BLOCK_TS, 1000, []
    pts.append((t + d, dbits(0.5)))
    t += d
    for i, dod in enumerate(dods):
        d += dod
        t += d
        pts.append((t, dbits(0.5 + i)))
    case("dod_buckets", "gorilla64", pts, blockts=BLOCK_TS)

    # --- v1 (64-bit value-only) ---
    case("v1_blend", "v1", [(0, v) for _, v in blend])
    case("v1_doubles", "v1", [(0, dbits(v)) for v in np.concatenate([weather(3000), sim, simple8_vals])])
    case("v1_long", "v1", [(0, int(v)) for v in lvals[:5000]])
    case("v1_empty", "v1", [])
    case("v1_single", "v1", [(0, dbits(3.14159))])

    # --- 32-bit value-only ---
    w32 = [fbits(v) for v in weather(3000)]
    case("v32_floats", "v32", [(0, v) for v in w32])
    case("v32_long", "v32", [(0, int(v) & 0x7FFFFFFF) for v in rng.integers(0, 2**31, 3000)])
    case("v32_empty", "v32", [])
    case("v32_similar", "v32", [(0, fbits(v)) for v in sim])

    # --- lossy32 ---
    for log in (-5, -1, 0, 3):
        case(f"lossy32_e{log}", f"lossy32:{log}", [(0, v) for v in w32[:1500]])

    # --- PMC-MR / Swing ---
    swing_simple = parse_swing_simple()
    assert len(swing_simple) == 50, len(swing_simple)
    ss_pts = [(i, fbits(v)) for i, v in enumerate(swing_simple)]
    case("swing_simple", f"swing:{fbits(2.0 ** -10):x}", ss_pts)
    case("pmc_simple", f"pmc:{fbits(2.0 ** -10):x}", ss_pts)
    wpts = [(i, v) for i, v in enumerate(w32[:2000])]
    for log in (-3, 0, 3):
        eps = fbits(2.0**log)
        case(f"pmc_e{log}", f"pmc:{eps:x}", wpts)
        case(f"swing_e{log}", f"swing:{eps:x}", wpts)

    proc = subprocess.run(
        ["java", "-cp", str(CLASSES), "RefVectors"],
        input="\n".join(lines), capture_output=True, text=True, check=True,
    )
    out = {}
    for ln in proc.stdout.splitlines():
        rec = json.loads(ln)
        out[rec["name"]] = rec

    # inputs are stored alongside so pytest can re-encode
    inputs: dict[str, dict] = {}
    idx = 0
    cur = None
    for ln in lines:
        p = ln.split()
        if p[0] == "CASE":
            cur = {"mode": None, "blockts": None, "close": True, "points": []}
            inputs[p[1]] = cur
        elif p[0] == "MODE":
            cur["mode"] = p[1]
        elif p[0] == "BLOCKTS":
            cur["blockts"] = int(p[1])
        elif p[0] == "CLOSE":
            cur["close"] = p[1] == "1"
        elif p[0] not in ("N", "END"):
            cur["points"].append([int(p[0]), p[1]])

    for name, rec in out.items():
        rec["input"] = inputs[name]
        (FIXDIR / f"{name}.json").write_text(json.dumps(rec))
    print(f"wrote {len(out)} fixtures to {FIXDIR}", file=sys.stderr)


if __name__ == "__main__":
    main()
