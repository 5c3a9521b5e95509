"""Training-data assembly operators: sequence packing and quota sampling.

- ``pack_bins``: greedy in-order packing of documents into
  context-window-sized token bins — the "sequence packing" step of an
  LLM pretraining pipeline.  Docs are sharded deterministically
  (doc_id % n_shards) and packed per shard in doc_id order via one
  running-cumsum window: bin = (cumsum_before_doc) // budget.  Each bin
  fills until a doc crosses the budget (standard greedy fill; a bin may
  overflow by less than one document).  One shuffle keyed by shard;
  shards bound window-partition size at any corpus scale.
- ``quota_sample``: deterministic per-language quota sampling (e.g.
  downsample dominant languages).  The keep decision is an integer LCG
  on doc_id — portable arithmetic, so the oracle replays the exact
  sample; no RNG state, fully reproducible and shard-stable.

Both are pure column/window expressions (codegen'd; DuckDB replays
them verbatim via the shared snippets).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import portable as P
from ..functions import textstats

#: sandbox-sized defaults: at warehouse scale set n_shards ∝ cluster
#: parallelism (e.g. 4× executor count) — packing quality is per-shard
#: local, so more shards only change bin boundaries, not the contract
N_SHARDS = 8
BIN_BUDGET = 256          # ws-tokens per bin (sandbox-sized context)

#: per-language keep-rate percentages for quota_sample
QUOTA = {"en": 50, "zh": 75}
QUOTA_DEFAULT = 100

_LCG_SQL = "(1103515245 * doc_id + 12345) % 2147483647"


def pack_bins(docs: DataFrame, budget: int = BIN_BUDGET,
              n_shards: int = N_SHARDS) -> DataFrame:
    """(doc_id, shard, bin, tok): greedy in-order token packing."""
    tok_expr = dict(textstats.token_count_cols(P.SPARK))["ws_tokens"]
    toks = docs.select(
        "doc_id",
        (F.col("doc_id") % n_shards).alias("shard"),
        F.expr(tok_expr).alias("tok"))
    w = (Window.partitionBy("shard").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    return toks.select(
        "doc_id", "shard", "tok",
        ((F.sum("tok").over(w) - F.col("tok")) / budget)
        .cast("long").alias("bin"))


def pack_bins_sql(d: str = P.DUCK, budget: int = BIN_BUDGET,
                  n_shards: int = N_SHARDS) -> str:
    tok_expr = dict(textstats.token_count_cols(d))["ws_tokens"]
    return f"""
WITH toks AS (
  SELECT doc_id, doc_id % {n_shards} AS shard, {tok_expr} AS tok
  FROM documents)
SELECT doc_id, shard, tok,
       CAST(floor((sum(tok) OVER (PARTITION BY shard ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - tok)
                  / {budget}) AS BIGINT) AS bin
FROM toks
"""


def quota_sample(docs: DataFrame) -> DataFrame:
    """Deterministic language-quota sample: (doc_id, pred_lang)."""
    lang_expr = dict(textstats.lang_id_cols(P.SPARK))["pred_lang"]
    rate = "CASE " + " ".join(
        f"WHEN pred_lang = '{k}' THEN {v}" for k, v in QUOTA.items()
    ) + f" ELSE {QUOTA_DEFAULT} END"
    return (docs.select("doc_id", F.expr(lang_expr).alias("pred_lang"))
            .where(F.expr(f"{_LCG_SQL} % 100 < {rate}")))


def quota_sample_sql(d: str = P.DUCK) -> str:
    lang_expr = dict(textstats.lang_id_cols(d))["pred_lang"]
    rate = "CASE " + " ".join(
        f"WHEN pred_lang = '{k}' THEN {v}" for k, v in QUOTA.items()
    ) + f" ELSE {QUOTA_DEFAULT} END"
    return f"""
WITH langed AS (SELECT doc_id, {lang_expr} AS pred_lang FROM documents)
SELECT doc_id, pred_lang FROM langed
WHERE {_LCG_SQL} % 100 < {rate}
"""
