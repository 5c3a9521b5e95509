"""Block-store integrity audit (operators/audit.py): a clean store
passes every check; each tampering mode is caught by the matching
flag and never fails the task."""
from __future__ import annotations

from pyspark.sql import functions as F

from gorilla_tsc_spark.operators.audit import audit_blocks, audit_summary
from gorilla_tsc_spark.operators.encode import encode_blocks


def _blocks(spark):
    from gorilla_tsc_spark.queries import _transcripts
    return encode_blocks(_transcripts(spark, "/root/testdata/sf0.001"))


def _summary(blocks):
    return audit_summary(audit_blocks(blocks)).first().asDict()


def test_clean_store_all_green(spark):
    blocks = _blocks(spark).cache()
    row = _summary(blocks)
    assert row["n_blocks"] == blocks.count() and row["n_blocks"] > 0
    assert all(v == 0 for k, v in row.items() if k.startswith("bad_")), row

    # deterministic sampling: same seed → same subset, smaller than all
    s1 = audit_blocks(blocks, sample_pct=20.0, seed=7).count()
    s2 = audit_blocks(blocks, sample_pct=20.0, seed=7).count()
    assert s1 == s2
    assert 0 < s1 < row["n_blocks"]
    blocks.unpersist()


def test_tampered_payload_caught(spark):
    blocks = _blocks(spark).cache()
    n = blocks.count()
    # appending a byte breaks the crc; the decode stays bounded by
    # n_points so it may or may not notice — crc must
    tampered = blocks.withColumn(
        "payload", F.concat(F.col("payload"), F.lit(b"\x00")))
    row = _summary(tampered)
    assert row["bad_crc"] == n, row
    assert row["bad_len"] == n, row
    blocks.unpersist()


def test_tampered_metadata_caught(spark):
    blocks = _blocks(spark).cache()
    n = blocks.count()

    # n_points inflated by one → bounded decode fails every block
    row = _summary(blocks.withColumn(
        "n_points", F.col("n_points") + F.lit(1)))
    assert row["bad_decode"] == n, row

    # aggregate drift (a wrong sum) → ok_aggs catches it; the nudge is
    # relative (+0.1%) so it isn't absorbed below the ulp of the
    # 2^63-magnitude hash-channel sums
    row = _summary(blocks.withColumn(
        "agg_sum",
        F.col("agg_sum") + F.abs(F.col("agg_sum")) * 0.001 + F.lit(1.0)))
    assert row["bad_aggs"] == n, row

    # span tampering
    row = _summary(blocks.withColumn("first_ts", F.col("last_ts") + 1))
    assert row["bad_span"] == n, row
    blocks.unpersist()


def test_dfcm_store_audits_green(spark):
    """A DFCM-encoded store audits green with the matching predictor
    and red (bad_decode) with the default one — the both-ends-agree
    contract applies to the audit too."""
    from gorilla_tsc_spark.queries import _transcripts
    blocks = encode_blocks(
        _transcripts(spark, "/root/testdata/sf0.001"),
        predictor="dfcm1024").cache()
    n = blocks.count()
    row = audit_summary(audit_blocks(blocks, predictor="dfcm1024")) \
        .first().asDict()
    assert all(v == 0 for k, v in row.items() if k.startswith("bad_")), row
    # wrong predictor: the bitstream often still PARSES (timestamps are
    # predictor-independent; repeat-bits dominate) but decodes wrong
    # VALUES — exactly the silent corruption ok_aggs exists to catch
    wrong = audit_summary(audit_blocks(blocks)).first().asDict()
    assert wrong["bad_decode"] + wrong["bad_aggs"] > 0, wrong
    assert n == row["n_blocks"]
    blocks.unpersist()


def test_corrupt_member_does_not_mask_neighbours(spark):
    """One corrupt payload in a batch must flag ONLY itself: the batch
    decode degrades to per-block isolation."""
    blocks = _blocks(spark).cache()
    n = blocks.count()
    victim = blocks.orderBy("conv_id", "channel", "block_start",
                            "seq").first()
    is_victim = ((F.col("conv_id") == victim["conv_id"])
                 & (F.col("channel") == victim["channel"])
                 & (F.col("block_start") == victim["block_start"])
                 & (F.col("seq") == victim["seq"]))
    # truncate the victim's payload to 4 bytes: undecodable
    tampered = blocks.withColumn(
        "payload",
        F.when(is_victim, F.substring("payload", 1, 4))
        .otherwise(F.col("payload"))).coalesce(1)
    audit = audit_blocks(tampered).cache()
    assert audit.count() == n
    assert audit.where(~F.col("ok_decode")).count() == 1
    bad = audit.where(~F.col("ok_decode")).first()
    assert (bad["conv_id"], bad["channel"]) == (
        victim["conv_id"], victim["channel"])
    audit.unpersist()
    blocks.unpersist()
