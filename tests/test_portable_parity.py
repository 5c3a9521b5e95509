"""Every functions/portable.py snippet must evaluate identically in
Spark SQL and DuckDB — the foundation of the oracle gate."""
from __future__ import annotations

import duckdb
import pytest

from gorilla_tsc_spark.functions import portable as P

SAMPLES = [
    "the quick brown fox jumps over the lazy dog",
    "a b ",
    "",
    "x",
    "der hund und die katze und der vogel",
    "key agg row scan slow fast table value part hash",
    "punct, marks! and? 123 numbers 45.6",
    "中文 mixed ascii text",
]


def _pairs(expr_fn, needs_tokens=False):
    out = []
    for d in (P.SPARK, P.DUCK):
        col = P.tokens("s", d) if needs_tokens else "s"
        out.append(expr_fn(col, d))
    return out


CASES = {
    "tokens_size": lambda: [f"{P.array_size(P.tokens('s', d), d)}"
                            for d in (P.SPARK, P.DUCK)],
    "str_hash": lambda: [P.str_hash("s", d) for d in (P.SPARK, P.DUCK)],
    "shingles_size": lambda: [
        f"{P.array_size(P.shingles3(P.tokens('s', d), d), d)}"
        for d in (P.SPARK, P.DUCK)],
    "minhash_perm": lambda: [
        P.minhash_perm(P.str_hash("s", d), "3", d) for d in (P.SPARK, P.DUCK)],
    "bpe_count": lambda: [
        P.count_regex("s", P.BPE_SPARK, P.BPE_DUCK, d) for d in (P.SPARK, P.DUCK)],
    "stopword_en": lambda: [
        P.stopword_count(P.tokens("s", d), "en", d) for d in (P.SPARK, P.DUCK)],
    "cjk": lambda: [P.cjk_count("s", d) for d in (P.SPARK, P.DUCK)],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_snippet_parity(spark, name):
    spark_expr, duck_expr = CASES[name]()
    con = duckdb.connect()
    for s in SAMPLES:
        esc = s.replace("'", "''")
        got_s = spark.sql(
            f"SELECT {spark_expr} FROM (SELECT '{esc}' AS s)").first()[0]
        got_d = con.sql(f"SELECT {duck_expr} FROM (SELECT '{esc}' AS s)").fetchone()[0]
        assert got_s == got_d, (name, s, got_s, got_d)


def test_dot_parity(spark):
    con = duckdb.connect()
    vec = "[0.1, -2.5, 3.25, 4.125, 1e-7, 99.0]"
    sp = spark.sql(
        f"SELECT {P.dot('a', 'b', P.SPARK)} FROM "
        f"(SELECT array{tuple([0.1, -2.5, 3.25, 4.125, 1e-7, 99.0])} AS a, "
        f"array{tuple([7.0, 0.5, -1.25, 2.0, 3.0, 0.001])} AS b)").first()[0]
    dk = con.sql(
        f"SELECT {P.dot('a', 'b', P.DUCK)} FROM "
        f"(SELECT {vec}::DOUBLE[] AS a, "
        f"[7.0, 0.5, -1.25, 2.0, 3.0, 0.001]::DOUBLE[] AS b)").fetchone()[0]
    assert sp == dk  # bit-identical: same sequential fold
