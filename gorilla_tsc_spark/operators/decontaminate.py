"""Benchmark decontamination: flag training documents that overlap an
evaluation set by word n-grams.

The standard pretraining hygiene step (GPT-3 appendix C / Dolma style):
an eval suite is tiny (thousands of prompts), the corpus is the 100 TB
side — so the eval side is hashed to distinct n-grams and BROADCAST;
each document contributes one narrow explode over its own n-grams and a
broadcast hash-join keeps only hits.  Nothing document-sized ever
shuffles:

  docs ──per-row gram-hash array, explode──> (doc_id, gram_hash)
       ──⋈ broadcast eval (filter first!)──> hits (rare)
       ──distinct + groupBy doc_id──> (n_hits) ──join back by id──> flags

The denominator (a doc's total distinct-position n-gram count) is a
pure column expression (``size(tokens) - n + 1``) — no second pass.

Contamination criterion: ``n_hits >= min_hits`` (default 1 — any shared
8-gram marks the doc, the conservative published default) plus a
continuous ``score = n_hits / n_grams`` for threshold tuning.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import portable as P

DEFAULT_N = 8
DEFAULT_MIN_HITS = 1


def _gram_hashes(df: DataFrame, id_col: str, n: int) -> DataFrame:
    """(id, gram_hash) word-n-gram identities — NOT deduplicated.

    A gram's identity is xxhash64 of its n token hashes, computed as a
    per-row array transform (hash the token array once, then each gram
    hashes n bigint array elements) — a document's grams never leave
    its partition, so this is shuffle-FREE.  No per-position string is
    ever built (an interpreted ``concat_ws`` gram was ~10× slower).
    Deduplication is deliberately left to the caller: the corpus side
    must broadcast-filter against the eval set FIRST and dedupe only
    the surviving hits — a corpus-wide distinct here would shuffle
    every gram row at 100 TB.
    """
    toks = P.tokens("text", P.SPARK)
    gram_of = ", ".join(f"element_at(h, i + {j})" for j in range(n))
    grams = (f"CASE WHEN size(h) >= {n} THEN "
             f"transform(sequence(1, size(h) - {n - 1}), "
             f"i -> xxhash64({gram_of})) ELSE array() END")
    return (df
            .select(id_col,
                    F.expr(f"transform({toks}, t -> xxhash64(t))").alias("h"))
            .select(id_col, F.explode(F.expr(grams)).alias("gram_hash")))


def eval_ngrams(eval_df: DataFrame, n: int = DEFAULT_N) -> DataFrame:
    """Distinct n-gram hashes of the evaluation texts.

    Rows: (gram_hash).  Small by contract (the eval suite), so callers
    broadcast it; persist + count it once if reused across corpora.
    """
    ev = eval_df.select(F.lit(0).alias("eid"), "text")
    return _gram_hashes(ev, "eid", n).select("gram_hash").distinct()


def contamination(docs: DataFrame, eval_df: DataFrame,
                  n: int = DEFAULT_N,
                  min_hits: int = DEFAULT_MIN_HITS) -> DataFrame:
    """Per-document contamination vs an eval set.

    Returns docs' ids plus (n_grams, n_hits, score, contaminated);
    join back to the full rows by doc_id downstream — the text column
    never crosses a shuffle here.
    """
    grams = eval_ngrams(eval_df, n)
    # broadcast-filter BEFORE any dedup/agg: only hit rows (rare by
    # construction) survive to the distinct + groupBy, so the corpus
    # grams never shuffle
    hits = (_gram_hashes(docs.select("doc_id", "text"), "doc_id", n)
            .join(F.broadcast(grams), "gram_hash")
            .groupBy("doc_id")
            .agg(F.count_distinct("gram_hash").alias("n_hits")))
    toks = P.tokens("text", P.SPARK)
    denom = docs.select(
        "doc_id",
        F.greatest(F.expr(f"size({toks}) - {n - 1}"),
                   F.lit(0)).alias("n_grams"))
    # hits are bounded by eval overlap (rare by contract) — broadcast
    # them so the corpus-sized denom side never shuffles for this join
    return (denom.join(F.broadcast(hits), "doc_id", "left")
            .withColumn("n_hits", F.coalesce("n_hits", F.lit(0)))
            .withColumn("score",
                        F.when(F.col("n_grams") > 0,
                               F.col("n_hits") / F.col("n_grams"))
                        .otherwise(F.lit(0.0)))
            .withColumn("contaminated", F.col("n_hits") >= min_hits))


def decontaminate(docs: DataFrame, eval_df: DataFrame,
                  n: int = DEFAULT_N,
                  min_hits: int = DEFAULT_MIN_HITS) -> DataFrame:
    """Drop contaminated documents — a left_anti on the flagged ids,
    so the kept side is a pure scan-side filter."""
    flagged = (contamination(docs, eval_df, n, min_hits)
               .where("contaminated").select("doc_id"))
    return docs.join(F.broadcast(flagged), "doc_id", "left_anti")
