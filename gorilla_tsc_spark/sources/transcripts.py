"""The transcripts input table (BASELINE.json input_hint schema):

    conv_id:string, turn_idx:int32, role:string, text:string,
    tool:string, ts:timestamp

Two deterministic providers:

1. ``transcripts_from_events`` — derives a transcripts-shaped table from
   the driver's ``events`` parquet with pure ANSI-SQL constructs, so the
   exact same derivation runs under DuckDB for the oracle comparison
   (engine-parity gate on "per-turn text equality under stable turn
   ordering").
2. ``synthesize_transcripts`` — FIXTURES.md §F1 generator: Zipf-skewed
   turn counts (hot conversations exercise salting), mostly-regular ms
   strides with jitter and gaps (exercise dod buckets and gap-fill).
   Generated distributed: a range() of conv ids → mapInPandas expansion,
   so a 10^12-turn corpus is producible without driver-side loops.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# {STR} is the engine-specific string type name: Spark STRING, DuckDB VARCHAR.
TRANSCRIPTS_SQL_TEMPLATE = """
SELECT
  'conv' || lpad(CAST(user_id AS {STR}), 8, '0') AS conv_id,
  CAST(row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS INT) AS turn_idx,
  CASE WHEN event_type IN ('click', 'view') THEN 'user'
       WHEN event_type IN ('signup', 'error') THEN 'tool'
       ELSE 'assistant' END AS role,
  repeat(event_type || ' ' || props || ' ', CAST(event_id % 7 AS INT) + 1) AS text,
  CASE WHEN event_type = 'error' THEN 'debugger'
       WHEN event_type = 'purchase' THEN 'checkout'
       ELSE NULL END AS tool,
  CAST(ts AS TIMESTAMP) AS ts
FROM events
"""


def transcripts_from_events(spark: SparkSession, events: DataFrame) -> DataFrame:
    events.createOrReplaceTempView("events")
    return spark.sql(TRANSCRIPTS_SQL_TEMPLATE.format(STR="STRING"))


def transcripts_oracle_sql(inner: str = "") -> str:
    """DuckDB-dialect transcripts derivation, as a CTE-able subquery."""
    return TRANSCRIPTS_SQL_TEMPLATE.format(STR="VARCHAR")


TRANSCRIPTS_SCHEMA = T.StructType([
    T.StructField("conv_id", T.StringType()),
    T.StructField("turn_idx", T.IntegerType()),
    T.StructField("role", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("tool", T.StringType()),
    T.StructField("ts", T.TimestampType()),
])

_ROLES = ("user", "assistant", "tool")
_TOOLS = (None, "search", "python", "browser", "calculator")
_WORDS = (
    "rollup window shuffle block delta gorilla spark codec tier stream "
    "partition salt skew checkpoint lineage decode encode bucket gapfill agg"
).split()


def _gen_conv_batch(pdf_iter, base_epoch_ms: int, zipf_a: float, max_turns: int):
    for pdf in pdf_iter:
        for k in pdf["conv_k"].tolist():
            rng = np.random.default_rng(10_000 + k)  # per-conv determinism
            # Zipf-skewed turn count: rank-based so conv 0 is hottest
            n = min(max_turns, max(3, int(max_turns / (1 + k) ** zipf_a)))
            conv_id = f"conv{k:08d}"
            # mostly-regular stride with jitter and occasional gaps
            strides = rng.integers(800, 1200, n)
            gaps = rng.random(n) < 0.02
            strides = np.where(gaps, strides + rng.integers(120_000, 600_000, n), strides)
            ts_ms = base_epoch_ms + 1 + np.int64(k % 86_400_000) + np.cumsum(strides)
            widx = rng.integers(0, len(_WORDS), (n, 8))
            texts = [" ".join(_WORDS[j] for j in row[: 3 + row[0] % 6]) for row in widx]
            yield pd.DataFrame({
                "conv_id": conv_id,
                "turn_idx": np.arange(n, dtype=np.int32),
                "role": [_ROLES[i % 3] for i in range(n)],
                "text": texts,
                "tool": [_TOOLS[i % 5] for i in range(n)],
                "ts": pd.to_datetime(ts_ms, unit="ms"),
            })


def synthesize_transcripts(
    spark: SparkSession,
    n_convs: int = 200,
    max_turns: int = 2000,
    zipf_a: float = 1.1,
    base_epoch_ms: int = 1_700_000_000_000,
    partitions: int | None = None,
) -> DataFrame:
    """Deterministic skewed transcripts; scales by adding conv partitions
    (each executor generates its own conversations — no driver loop)."""
    seed_df = spark.range(n_convs).withColumnRenamed("id", "conv_k")
    if partitions:
        seed_df = seed_df.repartition(partitions)
    return seed_df.mapInPandas(
        lambda it: _gen_conv_batch(it, base_epoch_ms, zipf_a, max_turns),
        schema=TRANSCRIPTS_SCHEMA,
    )
