"""Composition gate: the v2 curation funnel — quality filter → exact
dedup → connected-component canonical near-dup resolution →
decontamination → quota sample → sequence packing — run end-to-end on
the documents fixture, with set-algebra invariants at every stage.

The driver-gated ``curation_funnel`` query pins the pairwise-drop
variant against a SQL oracle; this gate pins the cluster-resolved +
decontaminated refinement (CC and anti-joins aren't expressible in the
oracle dialect without recursion, so the invariants are asserted
directly)."""
from __future__ import annotations

from pyspark.sql import functions as F

from gorilla_tsc_spark.functions import portable as P
from gorilla_tsc_spark.functions import textstats
from gorilla_tsc_spark.operators import dedup, traindata
from gorilla_tsc_spark.operators.components import (
    dup_components,
    keep_canonical,
)
from gorilla_tsc_spark.operators.decontaminate import decontaminate
from gorilla_tsc_spark.queries import FUNNEL_QUALITY_TAU, _docs

SF = "/root/testdata/sf0.001"


def test_funnel_v2_composition(spark):
    docs = _docs(spark, SF).cache()
    q = dict(textstats.quality_cols(P.SPARK))["quality"]
    lang = dict(textstats.lang_id_cols(P.SPARK))["pred_lang"]
    base = docs.select("doc_id", "text", F.expr(q).alias("quality"),
                       F.expr(lang).alias("pred_lang"))

    # stage 1: quality + language gate
    kept = base.where((F.col("quality") >= FUNNEL_QUALITY_TAU)
                      & (F.col("pred_lang") != "und")).cache()
    n1 = kept.count()
    assert 0 < n1 <= docs.count()

    # stage 2: exact dedup — one doc per md5
    keep_ids = (kept.groupBy(F.md5("text").alias("h"))
                .agg(F.min("doc_id").alias("doc_id")).select("doc_id"))
    kept2 = kept.join(keep_ids, "doc_id", "left_semi").cache()
    n2 = kept2.count()
    assert n2 == kept.select(F.md5("text")).distinct().count()

    # stage 3: near-dup clusters resolved to canonical members
    pairs = dedup.lsh_pairs(docs).cache()
    kept3 = keep_canonical(kept2, pairs).cache()
    n3 = kept3.count()
    assert n3 <= n2
    # canonical selection never drops a whole cluster that survived
    # stages 1-2: for every component with a surviving member, its min
    # surviving id is kept
    comp = dup_components(pairs)
    surviving = {r["doc_id"] for r in kept2.select("doc_id").collect()}
    kept3_ids = {r["doc_id"] for r in kept3.select("doc_id").collect()}
    by_comp: dict[int, list] = {}
    for r in comp.collect():
        by_comp.setdefault(r["comp"], []).append(r["id"])
    for label, members in by_comp.items():
        alive = sorted(m for m in members if m in surviving)
        if not alive:
            continue
        if label in alive:
            # the component's canonical doc survived the upstream
            # stages, so it must be in the output...
            assert label in kept3_ids
        # ...and no other member of the cluster may be
        for m in alive:
            if m != label:
                assert m not in kept3_ids

    # stage 4: decontamination vs a planted eval set (two fixture texts)
    ev = spark.createDataFrame(
        [(r["text"],) for r in docs.orderBy("doc_id").limit(2).collect()],
        ["text"])
    kept4 = decontaminate(kept3.select("doc_id", "text", "pred_lang"),
                          ev).cache()
    n4 = kept4.count()
    assert n4 < n3  # the planted docs (or their dups) must drop

    # stage 5: quota sample — deterministic LCG, replayable
    kept5 = kept4.where(F.expr(
        f"{traindata._LCG_SQL} % 100 < "
        f"CASE WHEN pred_lang = 'en' THEN {traindata.QUOTA['en']} "
        f"WHEN pred_lang = 'zh' THEN {traindata.QUOTA['zh']} "
        f"ELSE {traindata.QUOTA_DEFAULT} END")).cache()
    n5 = kept5.count()
    assert 0 < n5 <= n4

    # stage 6: packing conserves docs and respects the budget shape
    packed = traindata.pack_bins(kept5.select("doc_id", "text"))
    assert packed.count() == n5
    bins = (packed.groupBy("shard", "bin")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("tok").alias("tok_sum")))
    stats = bins.agg(F.sum("n_docs"), F.max("tok_sum")).first()
    assert stats[0] == n5
    # a bin may overflow by less than one doc beyond the budget
    max_tok = kept5.select(F.max(F.expr(
        dict(textstats.token_count_cols(P.SPARK))["ws_tokens"]))).first()[0]
    assert stats[1] < traindata.BIN_BUDGET + max_tok

    for df in (docs, kept, kept2, pairs, kept3, kept4, kept5):
        df.unpersist()
