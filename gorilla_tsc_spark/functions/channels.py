"""Per-turn numeric channels derived from transcripts.

The reference compresses one (ts, value) stream per series; our series
key is (conv_id, channel). Channels are plain JVM-side column
expressions (no Python in the hot path) evaluated before the encode
shuffle, so only ~40-byte numeric rows move, never the text.

``kind`` mirrors the reference's hard rule that long and double streams
must never mix in one block (README.adoc:60-61): kind is part of the
block identity and picks the bit-reinterpretation on both codec ends.
"""
from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Channel:
    name: str
    kind: str  # 'double' | 'long'
    # fingerprint channels (e.g. text_hash) are encoded/decoded but kept
    # out of rollup tiers: summing 2^63-magnitude values as double is
    # order-dependent, and a hash sum is meaningless anyway
    agg: bool = True

    def expr(self) -> Column:
        return _EXPRS[self.name]()


_EXPRS = {
    # integer-valued doubles: sums stay exact in IEEE754 → tier matching
    # and DuckDB oracle comparisons are bit-stable
    "len": lambda: F.length(F.col("text")).cast("double"),
    "words": lambda: F.size(F.split(F.col("text"), r"\s+")).cast("long"),
    # pins per-turn text equality through the codec round trip
    "text_hash": lambda: F.xxhash64(F.col("text")),
    # small-int state codes for the state-duration tier family (the
    # declared domain order is the family's tie rule)
    "role_idx": lambda: (F.when(F.col("role") == "user", 0)
                         .when(F.col("role") == "assistant", 1)
                         .otherwise(2).cast("long")),
}


def default_channels() -> list[Channel]:
    return [
        Channel("len", "double"),
        Channel("words", "long"),
        Channel("text_hash", "long", agg=False),
    ]


def agg_channel_names(channels: list[Channel] | None = None) -> list[str]:
    return [c.name for c in (channels or default_channels()) if c.agg]
