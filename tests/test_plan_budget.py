"""Plan-shape regression gate over the query registry.

The scale contract (docs/ARCHITECTURE.md) is enforced structurally:
no registry query may plan a CartesianProduct / BroadcastNestedLoopJoin,
and the shuffle count of the headline operators is pinned — a code
change that silently adds an exchange (or degrades a broadcast join to
a cartesian) fails here at sf0.001 cost, long before a 100 TB run
would discover it.
"""
from __future__ import annotations

import pytest

SF = "/root/testdata/sf0.001"

# queries whose construction runs driver-side actions or streaming
# replays; their plan shape is covered by their own gates
SKIP = {"checkpoint_resume", "stream_rollup_1m", "stream_encode_roundtrip"}

FORBIDDEN = ("CartesianProduct", "BroadcastNestedLoopJoin")

# max Exchange nodes tolerated in the PHYSICAL plan (sf0.001, AQE off
# for determinism).  These are ceilings, not targets — chosen one above
# the current count where AQE would collapse further at runtime.
EXCHANGE_BUDGET = {
    "rollup_1m": 2,
    # transcripts derivation (user_id) + encode (conv,day,seq)
    # + metadata groupBy — the derivation exchange disappears when
    # transcripts is a stored table
    "rollup_1d_from_blocks": 3,
    "rollup_from_decoded": 3,
    "codec_roundtrip_2ch": 2,
    "dedup_exact": 2,
    "asof_tier": 4,
    "sessionize": 3,
    "textstats_all": 1,
    "pii_scan": 1,
    "multimodal_features": 1,
    "frame_sample": 1,
}


@pytest.fixture(scope="module")
def plans(spark):
    from gorilla_tsc_spark.queries import build_queries
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    out = {}
    try:
        for name, fn in build_queries().items():
            if name in SKIP:
                continue
            df = fn(spark, SF)
            out[name] = df._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    return out


# brute-force cosine top-k IS a broadcast-nested-loop by definition:
# the tiny query set broadcasts against a linear corpus scan — the
# documented baseline whose scale path is ann_lsh_topk / ann_ivf_topk
ALLOWED_NESTED_LOOP = {"ann_cosine_topk"}


def test_no_cartesian_anywhere(plans):
    bad = {n for n, p in plans.items()
           if any(f in p for f in FORBIDDEN)
           and n not in ALLOWED_NESTED_LOOP}
    assert not bad, f"cartesian/nested-loop joins in: {sorted(bad)}"
    # and the allowed one must be the BROADCAST variant, never a
    # full CartesianProduct
    for n in ALLOWED_NESTED_LOOP:
        assert "CartesianProduct" not in plans[n], n


def test_exchange_budgets(plans):
    over = {}
    for name, budget in EXCHANGE_BUDGET.items():
        got = plans[name].count("Exchange ")
        if got > budget:
            over[name] = (got, budget)
    assert not over, f"exchange budget exceeded (got, budget): {over}"
