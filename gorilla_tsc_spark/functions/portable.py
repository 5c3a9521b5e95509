"""Dialect-portable scalar SQL snippets (Spark SQL ⟷ DuckDB).

The training-data operators (dedup, similarity, text analysis) must be
verifiable against a DuckDB oracle with value-hash equality. The safest
way to guarantee that is a single source of truth for every scalar
computation: each helper here renders the SAME math in either dialect.
The Spark operator modules embed these snippets via ``F.expr`` (JVM-side,
whole-stage-codegen — no Python in the hot path) and the oracle SQL in
``queries.py`` embeds the DuckDB rendering.

Verified-identical semantics (probed in this sandbox, Spark 4.1 /
DuckDB 1.0): ``split(s,'')`` chars, whitespace regex split keeps a
trailing empty token, ``ascii()`` returns the Unicode codepoint,
sequential left-fold over lists, ms-epoch truncation.
"""
from __future__ import annotations

SPARK = "spark"
DUCK = "duckdb"

# modulus for all portable integer hashing (fits products in int64)
HASH_P = 1_000_000_007


def ws(d: str) -> str:
    """Whitespace regex literal (Spark processes backslash escapes)."""
    return r"'\\s+'" if d == SPARK else r"'\s+'"


def tokens(col: str, d: str) -> str:
    """Non-empty whitespace-separated tokens."""
    if d == SPARK:
        return f"filter(split({col}, {ws(d)}), t -> t <> '')"
    return f"list_filter(regexp_split_to_array({col}, {ws(d)}), t -> t <> '')"


def str_hash(col: str, d: str) -> str:
    """Polynomial rolling hash over characters: h = (h*31 + cp) mod P.

    This doubles as the engine's 'document fingerprint' primitive
    (rolling hash per SURVEY-mandated text analysis ops).
    """
    if d == SPARK:
        return (
            f"aggregate(transform(split({col}, ''), c -> cast(ascii(c) as bigint)), "
            f"cast(0 as bigint), (h, c) -> (h * 31 + c) % {HASH_P})"
        )
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(split({col}, ''), c -> CAST(ascii(c) AS BIGINT))), "
        f"(h, c) -> (h * 31 + c) % {HASH_P})"
    )


def shingles3(toks: str, d: str) -> str:
    """Word 3-gram shingles of a token array (space-joined)."""
    if d == SPARK:
        body = (
            f"transform(sequence(1, size({toks}) - 2), "
            f"i -> concat_ws(' ', element_at({toks}, i), "
            f"element_at({toks}, i + 1), element_at({toks}, i + 2)))"
        )
        return f"CASE WHEN size({toks}) >= 3 THEN {body} ELSE array() END"
    body = (
        f"list_transform(generate_series(1, len({toks}) - 2), "
        f"i -> {toks}[i] || ' ' || {toks}[i + 1] || ' ' || {toks}[i + 2])"
    )
    return f"CASE WHEN len({toks}) >= 3 THEN {body} ELSE [] END"


def minhash_perm(h: str, seed: str, d: str) -> str:
    """Universal-hash permutation for minhash seed j: (a_j*h+b_j) mod P."""
    del d  # identical in both dialects
    return f"((2 * {seed} + 1) * {h} + 7919 * {seed} + 1) % {HASH_P}"


def dot(a: str, b: str, d: str) -> str:
    """Sequential left-fold dot product over float arrays, in float64.

    Both renderings fold left in list order, so the result is
    bit-identical across engines (no reassociation).
    """
    if d == SPARK:
        return (
            f"aggregate(zip_with({a}, {b}, (x, y) -> "
            f"cast(x as double) * cast(y as double)), "
            f"cast(0.0 as double), (s, v) -> s + v)"
        )
    return (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(generate_series(1, len({a})), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))), "
        f"(s, v) -> s + v)"
    )


def array_size(a: str, d: str) -> str:
    return f"size({a})" if d == SPARK else f"len({a})"


def count_regex(col: str, pat_spark: str, pat_duck: str, d: str) -> str:
    """Number of regex matches in a string column."""
    if d == SPARK:
        return f"size(regexp_extract_all({col}, '{pat_spark}', 0))"
    return f"len(regexp_extract_all({col}, '{pat_duck}'))"


# BPE-ish tokenizer regex: letter runs, digit runs, single other-symbols
BPE_SPARK = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
BPE_DUCK = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# stopword lists for the n-gram/stopword language-ID heuristic
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "auf"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "pour", "dans", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "para", "en", "que"],
}


def stopword_count(toks: str, lang: str, d: str) -> str:
    lst = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    if d == SPARK:
        return f"size(filter({toks}, t -> lower(t) IN ({lst})))"
    return f"len(list_filter({toks}, t -> lower(t) IN ({lst})))"


def cjk_count(col: str, d: str) -> str:
    """Count of CJK codepoints — the 'zh' branch of language-ID."""
    if d == SPARK:
        return (
            f"size(filter(split({col}, ''), "
            f"c -> ascii(c) >= 19968 AND ascii(c) <= 40959))"
        )
    return (
        f"len(list_filter(split({col}, ''), "
        f"c -> ascii(c) >= 19968 AND ascii(c) <= 40959))"
    )
