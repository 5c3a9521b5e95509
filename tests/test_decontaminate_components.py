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


def test_contamination_randomized_vs_python(spark):
    """Seeded random corpora vs a pure-Python n-gram set reference:
    n_hits (distinct shared n-grams) and n_grams must match exactly."""
    import numpy as np
    vocab = [f"w{i}" for i in range(30)]
    rng = np.random.default_rng(20260817)
    for case in range(5):
        n = int(rng.integers(2, 6))
        docs_py = {}
        for d in range(int(rng.integers(3, 12))):
            ln = int(rng.integers(0, 25))
            docs_py[d] = [vocab[i] for i in rng.integers(0, 30, size=ln)]
        evs = []
        for _ in range(int(rng.integers(1, 4))):
            ln = int(rng.integers(n, 15))
            evs.append([vocab[i] for i in rng.integers(0, 30, size=ln)])

        def grams(toks):
            return {tuple(toks[i:i + n])
                    for i in range(len(toks) - n + 1)}

        ev_grams = set().union(*(grams(e) for e in evs))
        want = {d: (max(len(t) - n + 1, 0),
                    len(grams(t) & ev_grams))
                for d, t in docs_py.items()}

        docs = spark.createDataFrame(
            [(d, " ".join(t)) for d, t in docs_py.items()],
            ["doc_id", "text"])
        ev = spark.createDataFrame([(" ".join(e),) for e in evs], ["text"])
        got = {r["doc_id"]: (r["n_grams"], r["n_hits"])
               for r in contamination(docs, ev, n=n).collect()}
        assert got == want, (case, n, got, want)


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


def test_dup_components_randomized_vs_union_find(spark):
    """Seeded random graphs: Spark labels must equal a union-find
    ground truth (label = min member id)."""
    import numpy as np
    rng = np.random.default_rng(20260817)
    for case in range(6):
        n = int(rng.integers(4, 60))
        m = int(rng.integers(1, max(2, n)))
        a = rng.integers(0, n, size=m)
        b = rng.integers(0, n, size=m)
        edges = [(int(x), int(y)) for x, y in zip(a, b) if x != y]
        if not edges:
            continue
        parent = list(range(n))

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for x, y in edges:
            parent[find(x)] = find(y)
        members: dict[int, set] = {}
        for x, y in edges:
            for v in (x, y):
                members.setdefault(find(v), set()).add(v)
        want = {v: min(s) for s in members.values() for v in s}

        pairs = spark.createDataFrame(edges, ["a_id", "b_id"])
        got = {r["id"]: r["comp"] for r in dup_components(pairs).collect()}
        assert got == want, (case, got, want)


def test_dup_components_early_stop_overkeeps_never_drops(spark):
    """A 9-node path with max_rounds too small: labels are non-minimal,
    but the global min keeps itself and no node maps outside its
    component — unconverged runs only over-keep."""
    path = [(i, i + 1) for i in range(8)]
    pairs = spark.createDataFrame(path, ["a_id", "b_id"])
    got = {r["id"]: r["comp"] for r in
           dup_components(pairs, max_rounds=2).collect()}
    assert got[0] == 0                    # the canonical doc survives
    assert any(v != 0 for v in got.values())  # genuinely unconverged
    assert all(0 <= v <= k for k, v in got.items())  # labels stay inside

    docs = spark.createDataFrame([(i, f"d{i}") for i in range(9)],
                                 ["doc_id", "text"])
    kept = {r["doc_id"] for r in keep_canonical(docs, pairs).collect()}
    assert kept == {0}                    # converged default: exact
    # early-stop keep via the labels directly: node 0 always kept
    keepers = {k for k, v in got.items() if k == v}
    assert 0 in keepers and len(keepers) >= 1


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


def test_star_components_randomized_vs_union_find(spark):
    """algorithm="star" must produce identical labels to union-find
    on seeded random graphs (same harness as the label-prop test)."""
    import numpy as np
    rng = np.random.default_rng(20260818)
    for case in range(6):
        n = int(rng.integers(4, 60))
        m = int(rng.integers(1, max(2, n)))
        a = rng.integers(0, n, size=m)
        b = rng.integers(0, n, size=m)
        edges = [(int(x), int(y)) for x, y in zip(a, b) if x != y]
        if not edges:
            continue
        parent = list(range(n))

        def find(i):
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        for x, y in edges:
            parent[find(x)] = find(y)
        members: dict[int, set] = {}
        for x, y in edges:
            for v in (x, y):
                members.setdefault(find(v), set()).add(v)
        want = {v: min(s) for s in members.values() for v in s}

        pairs = spark.createDataFrame(edges, ["a_id", "b_id"])
        got = {r["id"]: r["comp"]
               for r in dup_components(pairs, algorithm="star").collect()}
        assert got == want, (case, got, want)


def test_star_components_long_path_beyond_label_budget(spark):
    """A 40-node path (diameter 39): label-prop's default 12-round
    budget CANNOT converge it, star must — in far fewer than 39
    rounds (the round cap inside the call is 30 < 39)."""
    path = [(i, i + 1) for i in range(39)]
    pairs = spark.createDataFrame(path, ["a_id", "b_id"])
    got = {r["id"]: r["comp"]
           for r in dup_components(pairs, algorithm="star").collect()}
    assert got == {i: 0 for i in range(40)}

    labelled = {r["id"]: r["comp"] for r in dup_components(pairs).collect()}
    assert any(v != 0 for v in labelled.values())  # label-prop: unconverged

    docs = spark.createDataFrame([(i, f"d{i}") for i in range(40)],
                                 ["doc_id", "text"])
    kept = {r["doc_id"] for r in
            keep_canonical(docs, pairs, algorithm="star").collect()}
    assert kept == {0}


def test_star_components_cliques_and_islands(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)],
        ["a_id", "b_id"])
    comp = {r["id"]: r["comp"]
            for r in dup_components(pairs, algorithm="star").collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                    20: 20, 21: 20, 22: 20}


def test_star_round_plans_have_no_cartesian(spark):
    """Plan gate for the star rounds: one large-star + small-star pass
    must stay equijoin-only (no CartesianProduct / BroadcastNestedLoop)
    — the per-round cost is what survives 100x, so pin it."""
    from gorilla_tsc_spark.operators.components import (
        _large_star,
        _small_star,
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], ["a_id", "b_id"])
    e = pairs.selectExpr("a_id as x", "b_id as y")
    plan = (_small_star(_large_star(e))
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
