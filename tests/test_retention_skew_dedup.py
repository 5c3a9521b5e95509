"""Retention serve-union, skew salting, and training-data op smoke tests."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gorilla_tsc_spark.operators import dedup, similarity
from gorilla_tsc_spark.operators.retention import (RetentionPolicy,
                                                   apply_retention,
                                                   cutoff_ms, serve_union)
from gorilla_tsc_spark.operators.rollup import (DAY_MS, HOUR_MS, MINUTE_MS,
                                                cascade, rollup_points)
from gorilla_tsc_spark.operators.skew import hot_keys, salted_repartition
from gorilla_tsc_spark.sources.transcripts import synthesize_transcripts

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tiers(spark):
    # events-derived transcripts span 30 days — retention horizons bite
    from gorilla_tsc_spark.queries import _len_points
    pts = _len_points(spark, SF)
    t1m = rollup_points(pts, MINUTE_MS, F.col("v"), keys=("conv_id",)).cache()
    t1h = cascade(t1m, MINUTE_MS, HOUR_MS, keys=("conv_id",)).cache()
    t1d = cascade(t1h, HOUR_MS, DAY_MS, keys=("conv_id",)).cache()
    now = pts.agg(F.max("ts_ms")).first()[0]
    return t1m, t1h, t1d, now


def test_serve_union_partitions_by_age(spark, tiers):
    t1m, t1h, t1d, now = tiers
    pol = RetentionPolicy(keep_1m_days=0, keep_1h_days=1, keep_1d_days=3650)
    u = serve_union(t1m, t1h, t1d, now, pol).cache()
    c1m, c1h = cutoff_ms(now, 0), cutoff_ms(now, 1)
    rows = u.groupBy("tier").agg(F.min("bucket"), F.max("bucket")).collect()
    bounds = {r[0]: (r[1], r[2]) for r in rows}
    if "1m" in bounds:
        assert bounds["1m"][0] >= c1m
    if "1h" in bounds:
        assert bounds["1h"][0] >= c1h and bounds["1h"][1] < c1m
    if "1d" in bounds:
        assert bounds["1d"][1] < c1h
    # no bucket served twice across tiers
    assert u.count() == u.select("conv_id", "bucket").distinct().count()


def test_retention_expiry_prunes_old(spark, tiers):
    t1m, _, _, now = tiers
    kept = apply_retention(t1m, now, keep_days=1)
    assert kept.agg(F.min("bucket")).first()[0] >= cutoff_ms(now, 1)
    assert kept.count() < t1m.count()


def test_salting_spreads_hot_conversation(spark):
    # conv 0 is hottest by construction (zipf): force a low threshold so
    # it salts, and check its rows span multiple salt buckets
    t = synthesize_transcripts(spark, n_convs=6, max_turns=2000)
    hot = hot_keys(t, threshold_rows=500)
    assert hot.count() >= 1
    salted = salted_repartition(t, 8, threshold_rows=500, salt_buckets=4)
    hot_id = hot.first()[0]
    n_buckets = (salted.where(F.col("conv_id") == hot_id)
                 .select("salt").distinct().count())
    assert n_buckets > 1
    # cold keys keep salt 0
    cold = (salted.join(hot, "conv_id", "left_anti")
            .select("salt").distinct().collect())
    assert [r[0] for r in cold] == [0]


def test_dedup_and_similarity_smoke(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    exact = dedup.exact_dedup(docs)
    assert exact.count() == docs.select("text").distinct().count()
    sigs = dedup.minhash_signatures(docs)
    assert sigs.groupBy("doc_id").count().select(
        F.min("count")).first()[0] == dedup.MINHASH_K
    sh = dedup.simhash(docs)
    assert sh.count() == docs.count()
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    topk = similarity.cosine_topk(emb, k=3)
    per_q = topk.groupBy("q_id").count().select(F.max("count")).first()[0]
    assert per_q <= 3
    assert topk.where(F.col("cos") > 1.000001).count() == 0
