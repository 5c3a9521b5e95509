"""Top-k heavy-hitters tier (operators/sketches.py): exactness at the
fine grain, honest bounds through the merge cascade.

The merge contract (mergeable Space-Saving summary):
  * cnt_lb <= true coarse count <= cnt_lb + err for every kept row;
  * any item missing from a coarse bucket has true count <= bucket_err.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from gorilla_tsc_spark.operators.sketches import (
    merge_topk_tier,
    refresh_topk_tier,
    topk_estimates,
    topk_tier,
)

DAY_MS = 86_400_000
K = 5


def _items(spark):
    """Transcripts with the leading text token as the counted item —
    ~20 distinct values, enough that k=5 actually truncates."""
    from gorilla_tsc_spark.queries import _transcripts
    return (_transcripts(spark, "/root/testdata/sf0.001")
            .select(F.unix_millis("ts").alias("ts_ms"),
                    F.split("text", " ")[0].alias("item")))


def _exact(df, bucket_ms):
    """{bucket: {item: count}} ground truth."""
    rows = (df.groupBy(
        (F.floor(F.col("ts_ms") / bucket_ms) * bucket_ms).alias("bucket"),
        "item").count().collect())
    out: dict[int, dict[str, int]] = {}
    for r in rows:
        out.setdefault(r["bucket"], {})[r["item"]] = r["count"]
    return out


def test_topk_fine_tier_is_exact(spark):
    df = _items(spark).cache()
    exact = _exact(df, DAY_MS)
    tier = topk_tier(df, DAY_MS, "item", k=K)
    got: dict[int, list] = {}
    for r in tier.collect():
        assert r["err"] == 0  # fine-grain counts are exact
        got.setdefault(r["bucket"], []).append(r)
    assert got.keys() == exact.keys()
    for b, rows in got.items():
        truth = exact[b]
        want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
        assert sorted((r["item"], r["cnt_lb"]) for r in rows) == sorted(want)
        dropped = sorted(truth.values(), reverse=True)[K:]
        want_bnd = dropped[0] if dropped else 0
        assert rows[0]["bucket_err"] == want_bnd
    df.unpersist()


def test_topk_merge_bounds_and_coverage(spark):
    df = _items(spark).cache()
    exact30 = _exact(df, 30 * DAY_MS)
    tier = topk_tier(df, DAY_MS, "item", k=K)
    month = topk_estimates(
        merge_topk_tier(tier, DAY_MS, 30 * DAY_MS, k=K)).collect()
    assert month
    by_bucket: dict[int, list] = {}
    for r in month:
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert by_bucket.keys() == exact30.keys()
    for b, rows in by_bucket.items():
        truth = exact30[b]
        bnd = rows[0]["bucket_err"]
        listed = set()
        for r in rows:
            # interval contains the truth
            assert r["cnt_lb"] <= truth[r["item"]] <= r["cnt_ub"], (
                b, r["item"], r["cnt_lb"], truth[r["item"]], r["cnt_ub"])
            listed.add(r["item"])
        # completeness: any item that truly exceeds the bucket bound
        # must have been kept
        for item, n in truth.items():
            if n > bnd:
                assert item in listed, (b, item, n, bnd)
    df.unpersist()


def _assert_invariants(rows, truth, ctx):
    """Interval containment + completeness for one bucket's rows."""
    bnd = rows[0]["bucket_err"]
    listed = set()
    for r in rows:
        lb, ub = r["cnt_lb"], r["cnt_lb"] + r["err"]
        assert lb <= truth.get(r["item"], 0) <= ub, (ctx, r["item"], lb, ub)
        listed.add(r["item"])
    for item, n in truth.items():
        if n > bnd:
            assert item in listed, (ctx, item, n, bnd)


def test_topk_merge_invariants_randomized(spark):
    """Seeded random corpora: skewed item draws over random bucket
    spans, small k so truncation bites, invariants checked per coarse
    bucket on every dataset."""
    import numpy as np
    rng = np.random.default_rng(20260817)
    for case in range(8):
        n_items = int(rng.integers(3, 40))
        n_rows = int(rng.integers(50, 2000))
        n_buckets = int(rng.integers(1, 12))
        probs = rng.dirichlet(np.full(n_items, 0.3))
        items = rng.choice(n_items, size=n_rows, p=probs)
        buckets = rng.integers(0, n_buckets, size=n_rows)
        ts = buckets * 1000 + rng.integers(0, 1000, size=n_rows)
        df = spark.createDataFrame(
            [(int(t), f"i{i}") for t, i in zip(ts, items)],
            ["ts_ms", "item"])
        k = int(rng.integers(2, 8))
        tier = topk_tier(df, 1000, "item", k=k)
        merged = merge_topk_tier(tier, 1000, 4000, k=k)
        truth: dict[int, dict[str, int]] = {}
        for t, i in zip(ts, items):
            b = int(t // 4000 * 4000)
            truth.setdefault(b, {})
            truth[b][f"i{i}"] = truth[b].get(f"i{i}", 0) + 1
        by_bucket: dict[int, list] = {}
        for r in merged.collect():
            by_bucket.setdefault(r["bucket"], []).append(r)
        assert by_bucket.keys() == truth.keys(), case
        for b, rows in by_bucket.items():
            _assert_invariants(rows, truth[b], (case, b))


def test_topk_refresh_late_data(spark):
    df = _items(spark).cache()
    # split deterministically: ~20% of rows arrive "late"
    late = df.where(F.abs(F.hash("item", "ts_ms")) % 5 == 0)
    base = df.where(F.abs(F.hash("item", "ts_ms")) % 5 != 0)
    exact = _exact(df, DAY_MS)

    # k large enough that nothing truncates -> refresh must be EXACT
    big_k = max(len(v) for v in exact.values()) + 1
    tier = topk_tier(base, DAY_MS, "item", k=big_k)
    refreshed = refresh_topk_tier(tier, late, DAY_MS, "item", k=big_k)
    got = {(r["bucket"], r["item"]): r for r in refreshed.collect()}
    want = {(b, i): n for b, m in exact.items() for i, n in m.items()}
    assert {k_: v["cnt_lb"] for k_, v in got.items()} == want
    assert all(r["err"] == 0 for r in got.values())

    # small k: truncation on both sides, bounds must still hold
    tier5 = topk_tier(base, DAY_MS, "item", k=5)
    ref5 = refresh_topk_tier(tier5, late, DAY_MS, "item", k=5)
    by_bucket: dict[int, list] = {}
    for r in ref5.collect():
        by_bucket.setdefault(r["bucket"], []).append(r)
    assert by_bucket.keys() == exact.keys()
    for b, rows in by_bucket.items():
        _assert_invariants(rows, exact[b], b)
    df.unpersist()


def test_topk_salted_identical_kept_set(spark):
    """Salted two-phase truncation must keep the SAME items and counts
    as the unsalted operator (the bound may only be looser), on the
    fixture and on randomized skewed corpora."""
    import numpy as np
    df = _items(spark).cache()
    plain = topk_tier(df, DAY_MS, "item", k=K).collect()
    salted = topk_tier(df, DAY_MS, "item", k=K, salts=4).collect()
    key = lambda rows: sorted((r["bucket"], r["item"], r["cnt_lb"])
                              for r in rows)
    assert key(plain) == key(salted)
    bnd_p = {r["bucket"]: r["bucket_err"] for r in plain}
    for r in salted:
        assert r["bucket_err"] >= bnd_p[r["bucket"]]  # valid, maybe looser
    df.unpersist()

    rng = np.random.default_rng(42)
    for case in range(4):
        n_items = int(rng.integers(10, 80))
        n_rows = int(rng.integers(100, 1500))
        probs = rng.dirichlet(np.full(n_items, 0.2))
        items = rng.choice(n_items, size=n_rows, p=probs)
        ts = rng.integers(0, 3, size=n_rows) * 1000 + rng.integers(
            0, 1000, size=n_rows)
        rdf = spark.createDataFrame(
            [(int(t), f"i{i}") for t, i in zip(ts, items)],
            ["ts_ms", "item"])
        a = topk_tier(rdf, 1000, "item", k=4).collect()
        b = topk_tier(rdf, 1000, "item", k=4, salts=3).collect()
        assert key(a) == key(b), case
