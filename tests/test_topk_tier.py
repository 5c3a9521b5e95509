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
