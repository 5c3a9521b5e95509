"""Benchmark decontamination: flag training documents that overlap an
evaluation set by word n-grams.

The standard pretraining hygiene step (GPT-3 appendix C / Dolma style):
an eval suite is tiny (thousands of prompts), the corpus is the 100 TB
side — so the eval side is hashed to distinct n-grams and BROADCAST;
each document contributes one narrow explode over its own n-grams and a
broadcast hash-join keeps only hits.  Nothing document-sized ever
shuffles:

  docs ──explode n-grams──> (doc_id, gram_hash) ──⋈ broadcast eval──>
  hits ──groupBy doc_id──> (n_hits) ──join back (by id, no text)──> flags

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
    """(id, gram_hash) distinct word-n-gram identities.

    A gram's identity is xxhash64 of its n token hashes, not the joined
    string: one posexplode, one window with n−1 ``lead``s, all
    whole-stage codegen — no per-position string materialization (an
    interpreted ``transform(sequence(...), concat_ws(...))`` was ~10×
    slower at sf0.1).  Both the corpus and eval side use this same
    identity, so hits compare exactly.
    """
    from pyspark.sql import Window
    toks = P.tokens("text", P.SPARK)
    w = Window.partitionBy(id_col).orderBy("pos")
    th = (df
          .select(id_col, F.posexplode(F.expr(toks)).alias("pos", "tok"))
          .withColumn("th", F.xxhash64("tok")))
    gram_cols = [F.col("th")] + [F.lead("th", j).over(w) for j in range(1, n)]
    return (th
            .select(id_col, F.xxhash64(*gram_cols).alias("gram_hash"),
                    gram_cols[-1].alias("_last"))
            .where(F.col("_last").isNotNull())
            .select(id_col, "gram_hash")
            .distinct())


def eval_ngrams(eval_df: DataFrame, n: int = DEFAULT_N) -> DataFrame:
    """Distinct n-gram hashes of the evaluation texts.

    Rows: (gram_hash).  Small by contract (the eval suite), so callers
    broadcast it; persist + count it once if reused across corpora.
    """
    ev = eval_df.select(F.monotonically_increasing_id().alias("eid"), "text")
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
    hits = (_gram_hashes(docs.select("doc_id", "text"), "doc_id", n)
            .join(F.broadcast(grams), "gram_hash")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_hits")))
    toks = P.tokens("text", P.SPARK)
    denom = docs.select(
        "doc_id",
        F.greatest(F.expr(f"size({toks}) - {n - 1}"),
                   F.lit(0)).alias("n_grams"))
    return (denom.join(hits, "doc_id", "left")
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
    return docs.join(flagged, "doc_id", "left_anti")
