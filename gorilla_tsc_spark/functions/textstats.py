"""Text analysis for training-data pipelines: language-ID, quality
scoring, token counting, document fingerprinting.

Every op is a pure column expression rendered from the portable snippet
layer (functions/portable.py), so it runs JVM-side under whole-stage
codegen in Spark AND can be replayed verbatim by the DuckDB oracle.
``*_cols(d)`` returns ``[(alias, sql_snippet)]`` for dialect ``d``; the
Spark operator applies them with ``F.expr``, the oracle joins them into
a SELECT.

Scale: all ops are narrow (per-row) projections — no shuffle, fully
pipelined with the parquet scan; predicate pushdown and column pruning
are unaffected.
"""
from __future__ import annotations

from . import portable as P


def _tok(d: str) -> str:
    return P.tokens("text", d)


def token_count_cols(d: str, toks: str | None = None) -> list[tuple[str, str]]:
    """Whitespace token count + BPE-ish regex token count.

    ``toks`` lets a caller substitute a pre-materialized token-array
    column for the inline split — Spark's CollapseProject keeps a
    non-cheap, multiply-referenced producer in its own projection, so
    the text is tokenized once per row instead of once per expression
    (q_textstats_all relies on this)."""
    return [
        ("doc_id", "doc_id"),
        ("ws_tokens", f"CAST({P.array_size(toks or _tok(d), d)} AS BIGINT)"),
        ("bpe_tokens",
         f"CAST({P.count_regex('text', P.BPE_SPARK, P.BPE_DUCK, d)} AS BIGINT)"),
    ]


def fingerprint_cols(d: str, toks: str | None = None) -> list[tuple[str, str]]:
    """Rolling-hash document fingerprint + min-shingle-hash (winnow-min).

    fp_full: polynomial rolling hash of the whole text.
    fp_min:  min over word-3-gram shingle hashes (a 1-seed minhash) —
             robust to local edits, the primitive behind near-dup LSH.
    """
    sh = P.shingles3(toks or _tok(d), d)
    if d == P.SPARK:
        minsh = (f"aggregate(transform({sh}, s -> {P.str_hash('s', d)}), "
                 f"cast({P.HASH_P} as bigint), (m, h) -> least(m, h))")
    else:
        minsh = (f"list_reduce(list_prepend(CAST({P.HASH_P} AS BIGINT), "
                 f"list_transform({sh}, s -> {P.str_hash('s', d)})), "
                 f"(m, h) -> least(m, h))")
    return [
        ("doc_id", "doc_id"),
        ("fp_full", P.str_hash("text", d)),
        ("fp_min", minsh),
    ]


def quality_cols(d: str, toks: str | None = None) -> list[tuple[str, str]]:
    """Quality heuristics: length, punctuation ratio, stopword ratio,
    mean token length, and a blended 0..1 score (6-dp rounded)."""
    toks = toks or _tok(d)
    n_tok = P.array_size(toks, d)
    n_chr = "length(text)"
    punct = P.count_regex("text", r"[^A-Za-z0-9\\s]", r"[^A-Za-z0-9\s]", d)
    stop_en = P.stopword_count(toks, "en", d)
    score = (
        f"round(0.4 * least(CAST({n_tok} AS DOUBLE) / 64.0, 1.0) "
        f"+ 0.3 * (1.0 - least(CAST({punct} AS DOUBLE) / "
        f"greatest(CAST({n_chr} AS DOUBLE), 1.0), 1.0)) "
        f"+ 0.3 * least(4.0 * CAST({stop_en} AS DOUBLE) / "
        f"greatest(CAST({n_tok} AS DOUBLE), 1.0), 1.0), 6)"
    )
    return [
        ("doc_id", "doc_id"),
        ("n_chars_m", f"CAST({n_chr} AS BIGINT)"),
        ("n_tokens", f"CAST({n_tok} AS BIGINT)"),
        ("punct_n", f"CAST({punct} AS BIGINT)"),
        ("stop_en", f"CAST({stop_en} AS BIGINT)"),
        ("mean_tok_len",
         f"round(CAST({n_chr} AS DOUBLE) / greatest(CAST({n_tok} AS DOUBLE), 1.0), 6)"),
        ("quality", score),
    ]


def lang_id_cols(d: str, toks: str | None = None) -> list[tuple[str, str]]:
    """Stopword-vote language-ID with a CJK-codepoint fast path.

    Deterministic tie-break: language order en→de→fr→es (strict '>'
    comparisons), 'und' (undetermined) when no evidence.
    """
    toks = toks or _tok(d)
    votes = {lang: P.stopword_count(toks, lang, d) for lang in P.STOPWORDS}
    cjk = P.cjk_count("text", d)
    best = (
        f"CASE WHEN {cjk} > 0 THEN 'zh' "
        f"WHEN {votes['en']} = 0 AND {votes['de']} = 0 "
        f"AND {votes['fr']} = 0 AND {votes['es']} = 0 THEN 'und' "
        f"WHEN {votes['en']} >= {votes['de']} AND {votes['en']} >= {votes['fr']} "
        f"AND {votes['en']} >= {votes['es']} THEN 'en' "
        f"WHEN {votes['de']} >= {votes['fr']} AND {votes['de']} >= {votes['es']} "
        f"THEN 'de' "
        f"WHEN {votes['fr']} >= {votes['es']} THEN 'fr' "
        f"ELSE 'es' END"
    )
    return [
        ("doc_id", "doc_id"),
        ("lang_tag", "lang"),
        ("pred_lang", best),
        ("cjk_chars", f"CAST({cjk} AS BIGINT)"),
    ]


def pii_scan_cols(d: str) -> list[tuple[str, str]]:
    """PII-pattern surface counts — the pre-filter a training-data
    pipeline runs before redaction: emails, URLs, and long digit runs
    (phone/account-shaped).  Pure regex projections (codegen'd;
    replayed verbatim by the oracle)."""
    email_s = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    email_d = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    url_s = url_d = r"https?://[^ \t\r\n]+"
    dig_s = dig_d = r"[0-9]{7,}"
    return [
        ("doc_id", "doc_id"),
        ("emails", f"CAST({P.count_regex('text', email_s, email_d, d)} AS BIGINT)"),
        ("urls", f"CAST({P.count_regex('text', url_s, url_d, d)} AS BIGINT)"),
        ("long_digit_runs",
         f"CAST({P.count_regex('text', dig_s, dig_d, d)} AS BIGINT)"),
    ]
