"""Decontamination (eval n-gram overlap) and duplicate-cluster
connected components."""
from __future__ import annotations

from pyspark.sql import functions as F

from gorilla_tsc_spark.operators.components import (
    dup_components,
    keep_canonical,
)
from gorilla_tsc_spark.operators.decontaminate import (
    contamination,
    decontaminate,
)

EVAL = [
    "the quick brown fox jumps over the lazy dog tonight",
    "paris is the capital of france and seine flows through it",
]


def _corpus(spark):
    """Four docs: one embeds eval sentence 0 verbatim, one embeds a
    7-word fragment (below the 8-gram bar), two are clean."""
    clean = ("rollup window shuffle block delta gorilla spark codec tier "
             "stream partition salt skew checkpoint lineage decode encode")
    rows = [
        (1, f"intro text then {EVAL[0]} and a closing remark"),
        (2, "the quick brown fox jumps over the " + clean),  # 7-gram only
        (3, clean),
        (4, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_contamination_flags_exact_overlap(spark):
    docs = _corpus(spark)
    ev = spark.createDataFrame([(t,) for t in EVAL], ["text"])
    got = {r["doc_id"]: r for r in contamination(docs, ev, n=8).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1]["contaminated"] and got[1]["n_hits"] == 3  # 10 words -> 3 8-grams
    assert not got[2]["contaminated"] and got[2]["n_hits"] == 0
    assert not got[3]["contaminated"]
    assert got[4]["n_grams"] == 0 and got[4]["score"] == 0.0
    assert 0 < got[1]["score"] <= 1
    kept = {r["doc_id"] for r in decontaminate(docs, ev, n=8).collect()}
    assert kept == {2, 3, 4}


def test_contamination_min_hits_threshold(spark):
    docs = _corpus(spark)
    ev = spark.createDataFrame([(t,) for t in EVAL], ["text"])
    got = {r["doc_id"]: r["contaminated"]
           for r in contamination(docs, ev, n=8, min_hits=4).collect()}
    assert not any(got.values())  # doc 1 has 3 hits < 4


def test_dup_components_chain_and_islands(spark):
    # chain 1-2-3, pair 10-11, triangle 20-21-22; 99 is unpaired
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["a_id", "b_id"])
    comp = {r["id"]: r["comp"] for r in dup_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                    20: 20, 21: 20, 22: 20}

    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in (1, 2, 3, 10, 11, 20, 21, 22, 99)],
        ["doc_id", "text"])
    kept = {r["doc_id"] for r in keep_canonical(docs, pairs).collect()}
    assert kept == {1, 10, 20, 99}


def test_dup_components_on_lsh_pairs(spark):
    """End-to-end over the documents fixture: components from real LSH
    pairs must be consistent (label = min member, every labeled node
    appears in some pair)."""
    from gorilla_tsc_spark.operators.dedup import lsh_pairs
    from gorilla_tsc_spark.queries import _docs
    docs = _docs(spark, "/root/testdata/sf0.001")
    pairs = lsh_pairs(docs).cache()
    comp = dup_components(pairs).cache()
    rows = comp.collect()
    by_comp: dict[int, set] = {}
    for r in rows:
        by_comp.setdefault(r["comp"], set()).add(r["id"])
    assert rows, "fixture corpus should contain near-dup pairs"
    for label, members in by_comp.items():
        assert label == min(members)
    paired = {r["a_id"] for r in pairs.collect()} | {
        r["b_id"] for r in pairs.collect()}
    assert {r["id"] for r in rows} == paired
    # canonical keep drops exactly the non-min members
    kept = keep_canonical(docs, pairs).count()
    assert kept == docs.count() - sum(len(m) - 1 for m in by_comp.values())
    pairs.unpersist()
    comp.unpersist()
