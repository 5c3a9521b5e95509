"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline slice on sf0.001: derive the
transcripts table, Gorilla-encode per-(conv, day) blocks with the
vectorized Arrow kernel, decode, and build the 1-minute continuous
aggregate tier.

``queries()`` / ``oracle_sql()`` — the operator registry lives in
``gorilla_tsc_spark.queries``: exactly 50 queries, every one carrying
a DuckDB oracle with matching column names.  Codec roundtrips are
oracled via point identities, the lossy trio via per-series coverage +
ε-bound audits, block accounting via SQL-derived block/point counts,
multimodal via hex-nibble byte reconstruction, streaming (rollup AND
the event-time block encoder) via batch replay against batch oracles,
checkpoint resume via the zero-pending-groups contract.  Round 4
driver-gates the maintenance/serve surface: compaction (decode
identity + shrinkage), range purge + tier patch (survivor rollup
truth), integrity audit (clean-store counters vs SQL block counts),
range join (DuckDB inequality-join truth), M4 (deterministic
per-bucket extremes), anomaly z-score (window SQL, 6dp-rounded z),
decontamination (raw-gram overlap truth) and duplicate-cluster
connected components (recursive-CTE transitive closure).  Round 5
driver-gates the remaining round-4 surface: the merged tier-family
gate (corr/twa/heartbeat plus the round-5 counter-rate, fixed-bin
histogram, LOCF state-duration, OHLCV candle, lag-1 autocorrelation,
exponential-histogram and linear-trend families — ten branches, each
refresh-routed at 1h and cascaded 1h→1d vs a DIRECT 1d oracle, with
the interpolated/gap/transition/forecast serves folded in),
the zone-map value scan (SQL value filter + candidate-block-count
truth), the smoothing serves (EWMA + Holt double-exponential in one
row, both recursions in one DuckDB recursive CTE, 6dp), the
sketch tiers (HLL/KLL/Theta/top-k error-bound audit,
lossy_bounds-style), and the streaming late-data path (two-batch
out-of-order replay merged back to point identity).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gorilla_tsc_spark.queries import build_oracle_sql, build_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from gorilla_tsc_spark.queries import q_rollup_from_decoded
    return q_rollup_from_decoded(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return build_queries()


def oracle_sql() -> dict[str, str]:
    return build_oracle_sql()
