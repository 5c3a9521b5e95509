"""IVF ANN gates for the trained-quantizer (k-means) production path.

The driver-gated query uses the deterministic LCG quantizer (oracle
renderable in SQL); the FAISS-recipe sampled-k-means path is gated
here: training must be deterministic across invocations, and probing
n_probe of 16 trained lists must keep most of the true brute-force
top-k neighborhood (recall well above the 4/16 ≈ 0.25 a random
quantizer would give).
"""
from __future__ import annotations

import pytest

from gorilla_tsc_spark.operators import similarity

SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def emb(spark):
    from gorilla_tsc_spark.sources.tables import load_table
    return load_table(spark, SF_DIR, "embeddings").cache()


def test_trained_centroids_deterministic(emb):
    c1 = similarity.train_ivf_centroids(emb)
    c2 = similarity.train_ivf_centroids(emb)
    assert c1 == c2
    assert len(c1) == similarity.IVF_LISTS
    assert all(len(c) == similarity.IVF_DIM for c in c1)


def test_trained_ivf_recall(emb):
    cent = similarity.train_ivf_centroids(emb)
    ivf = similarity.ann_ivf_topk(emb, centroids=cent)
    brute = similarity.cosine_topk(emb)
    got = {(r.q_id, r.n_id) for r in ivf.collect()}
    want = {(r.q_id, r.n_id) for r in brute.collect()}
    recall = len(got & want) / len(want)
    assert recall >= 0.5, f"trained-IVF recall@{similarity.TOPK} = {recall:.2f}"
