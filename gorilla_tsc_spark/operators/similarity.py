"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: exact brute-force top-k — broadcast the (small)
  query set against the corpus; the dot product is a sequential
  left-fold in float64 (functions/portable.py ``dot``) so the DuckDB
  oracle reproduces it bit-for-bit (no reassociation).
- ``cosine_dup_pairs``: embedding near-duplicate detection (cos ≥ τ).
- ``ann_lsh_topk``: random-hyperplane LSH — hyperplane components come
  from an integer LCG (exact in int64, portable), vectors bucket by
  their sign pattern, and top-k is computed within buckets only.

Scale notes: brute-force is O(Q·N) with Q broadcast — the right
baseline when Q is small; the LSH path turns the cross join into a
bucket-equijoin whose shuffle is keyed by (plane-sign pattern), which
is how this survives N at 100 TB. Norms are precomputed once per side.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import portable as P

TOPK = 5
QUERY_MOD = 31        # vec_id % QUERY_MOD == 0 → query set
DUP_TAU = 0.99
LSH_PLANES = 8

_LCG_M = 2_147_483_647


def _plane_component(h: str, i: str) -> str:
    """Deterministic pseudo-random hyperplane component in (-0.5, 0.5).

    Pure int64 arithmetic then one exact division — identical in both
    dialects.
    """
    return (f"(CAST((CAST(1103515245 AS BIGINT) * ({h} * 64 + {i}) + 12345) "
            f"% {_LCG_M} AS DOUBLE) / {_LCG_M}.0 - 0.5)")


def _cos_expr(a: str, b: str, d: str) -> str:
    return (f"round({P.dot(a, b, d)} / "
            f"(sqrt({P.dot(a, a, d)}) * sqrt({P.dot(b, b, d)})), 6)")


def _prepped(emb: DataFrame, prefix: str) -> DataFrame:
    """Rename + precompute the vector norm ONCE per side — the oracle's
    per-pair sqrt(dot(a,a))*sqrt(dot(b,b)) is the same float ops in the
    same order, so results stay bit-identical while the plan does one
    self-dot per vector instead of one per pair."""
    n = emb.sparkSession.sparkContext.defaultParallelism
    return (emb.repartition(n, "vec_id")
            .select(F.col("vec_id").alias(f"{prefix}_id"),
                    F.col("embedding").alias(f"{prefix}_emb"))
            .withColumn(f"{prefix}_norm", F.expr(
                f"sqrt({P.dot(prefix + '_emb', prefix + '_emb', P.SPARK)})")))


def _pair_cos(qp: str, cp: str):
    return F.round(
        F.expr(P.dot(f"{qp}_emb", f"{cp}_emb", P.SPARK))
        / (F.col(f"{qp}_norm") * F.col(f"{cp}_norm")), 6)


def cosine_topk(emb: DataFrame, k: int = TOPK, query_mod: int = QUERY_MOD) -> DataFrame:
    q = _prepped(emb.where(F.col("vec_id") % query_mod == 0), "q")
    c = _prepped(emb, "n")
    scored = (
        F.broadcast(q).crossJoin(c)
        .where(F.col("q_id") != F.col("n_id"))
        .withColumn("cos", _pair_cos("q", "n"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("q_id", "n_id", "rank", "cos"))


def cosine_topk_sql(d: str = P.DUCK, k: int = TOPK, query_mod: int = QUERY_MOD) -> str:
    cos = _cos_expr("q.embedding", "c.embedding", d)
    return f"""
WITH scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS n_id, {cos} AS cos
  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
  WHERE q.vec_id % {query_mod} = 0),
ranked AS (
  SELECT q_id, n_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank
  FROM scored)
SELECT q_id, n_id, rank, cos FROM ranked WHERE rank <= {k}
"""


DUP_BANDS = 2


def cosine_dup_pairs(emb: DataFrame, tau: float = DUP_TAU,
                     planes: int = LSH_PLANES,
                     bands: int = DUP_BANDS) -> DataFrame:
    """Embedding near-dup pairs (cos ≥ τ), LSH-banded.

    The 8-plane sign pattern splits into ``bands`` positional bands; a
    pair is a candidate iff some band matches (posexplode → equijoin on
    (band_idx, band_value) — never a cartesian; matches the simhash
    banding pattern).  Approximate by construction: a near-dup pair
    split by a hyperplane in every band is missed — that is the
    standard LSH recall trade-off and the oracle applies the identical
    band predicate, so parity is exact over the same candidate set.
    """
    bits = planes // bands
    mask = (1 << bits) - 1
    bucketed = (_prepped(emb, "x")
                .withColumn("bucket", F.expr(
                    _bucket_expr("x_emb", planes, P.SPARK))))
    banded = bucketed.select(
        "x_id", "x_emb", "x_norm",
        F.posexplode(F.array(
            *[F.expr(f"(bucket >> {bits * i}) & {mask}") for i in range(bands)])
        ).alias("bi", "bv"))

    def side(p: str) -> DataFrame:
        return banded.select(F.col("x_id").alias(f"{p}_id"),
                             F.col("x_emb").alias(f"{p}_emb"),
                             F.col("x_norm").alias(f"{p}_norm"), "bi", "bv")

    a, b = side("a"), side("b")
    cand = (a.join(b, ["bi", "bv"])
            .where(F.col("a_id") < F.col("b_id"))
            .select("a_id", "a_emb", "a_norm", "b_id", "b_emb", "b_norm")
            .dropDuplicates(["a_id", "b_id"]))
    return (cand.withColumn("cos", _pair_cos("a", "b"))
            .where(F.col("cos") >= tau)
            .select("a_id", "b_id", "cos"))


def cosine_dup_pairs_sql(d: str = P.DUCK, tau: float = DUP_TAU,
                         planes: int = LSH_PLANES,
                         bands: int = DUP_BANDS) -> str:
    bits = planes // bands
    mask = (1 << bits) - 1
    cos = _cos_expr("a.embedding", "b.embedding", d)
    pred = " OR ".join(
        f"((a.bucket >> {bits * i}) & {mask}) = ((b.bucket >> {bits * i}) & {mask})"
        for i in range(bands))
    return f"""
WITH bucketed AS (
  SELECT vec_id, embedding, {_bucket_expr('embedding', planes, d)} AS bucket
  FROM embeddings)
SELECT a.vec_id AS a_id, b.vec_id AS b_id, {cos} AS cos
FROM bucketed a JOIN bucketed b ON a.vec_id < b.vec_id AND ({pred})
WHERE {cos} >= {tau}
"""


def _bucket_expr(emb_col: str, planes: int, d: str) -> str:
    """LSH bucket id: sign bit per hyperplane, packed into an int."""
    terms = []
    for h in range(planes):
        if d == P.SPARK:
            proj = (f"aggregate(transform(sequence(0, size({emb_col}) - 1), "
                    f"i -> cast(element_at({emb_col}, i + 1) as double) * "
                    f"{_plane_component(str(h), 'i')}), "
                    f"cast(0.0 as double), (s, v) -> s + v)")
        else:
            proj = (f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
                    f"list_transform(generate_series(1, len({emb_col})), "
                    f"i -> CAST({emb_col}[i] AS DOUBLE) * "
                    f"{_plane_component(str(h), '(i - 1)')})), (s, v) -> s + v)")
        terms.append(f"(CASE WHEN {proj} >= 0 THEN {1 << h} ELSE 0 END)")
    return " + ".join(terms)


def ann_lsh_topk(emb: DataFrame, k: int = TOPK, query_mod: int = QUERY_MOD,
                 planes: int = LSH_PLANES) -> DataFrame:
    """Approximate top-k: exact cosine, but only within LSH buckets."""
    n = emb.sparkSession.sparkContext.defaultParallelism
    bucketed = emb.repartition(n, "vec_id").withColumn(
        "bucket", F.expr(_bucket_expr("embedding", planes, P.SPARK)))

    def prep(df: DataFrame, p: str) -> DataFrame:
        return (df.select(F.col("vec_id").alias(f"{p}_id"),
                          F.col("embedding").alias(f"{p}_emb"), "bucket")
                .withColumn(f"{p}_norm", F.expr(
                    f"sqrt({P.dot(p + '_emb', p + '_emb', P.SPARK)})")))

    q = prep(bucketed.where(F.col("vec_id") % query_mod == 0), "q")
    c = prep(bucketed, "n")
    scored = (
        F.broadcast(q).join(c, "bucket")
        .where(F.col("q_id") != F.col("n_id"))
        .withColumn("cos", _pair_cos("q", "n"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("q_id", "n_id", "rank", "cos"))


IVF_LISTS = 16
IVF_PROBE = 4
IVF_DIM = 64
#: seed offset keeping IVF's LCG stream disjoint from the LSH planes'
_IVF_SEED_BASE = 100_000


def ivf_centroids(n_lists: int = IVF_LISTS, dim: int = IVF_DIM) -> list[list[float]]:
    """Deterministic hash-seeded coarse quantizer.

    Components come from the same integer LCG as the LSH planes (exact
    int arithmetic, then one exact division) so the DuckDB oracle can
    embed the identical float literals — this is what makes the IVF
    query driver-verifiable.  A trained quantizer clusters better (see
    ``train_ivf_centroids``); the inverted-index plan is identical.
    """
    out = []
    for j in range(n_lists):
        row = []
        for i in range(dim):
            x = (1103515245 * ((_IVF_SEED_BASE + j) * 64 + i) + 12345) % _LCG_M
            row.append(x / _LCG_M - 0.5)
        out.append(row)
    return out


def train_ivf_centroids(emb: DataFrame, n_lists: int = IVF_LISTS,
                        sample: int = 2048, iters: int = 10,
                        seed: int = 7) -> list[list[float]]:
    """Sampled k-means quantizer (the standard FAISS IVF recipe).

    Training runs on a bounded driver-side sample — at 100 TB you train
    on a fixed-size sample regardless of corpus size — with a
    deterministic seed and a deterministic sample order (xxhash64 of
    vec_id), so repeated runs return identical centroids.
    """
    import numpy as np

    rows = (emb.select("vec_id", "embedding")
            .orderBy(F.pmod(F.xxhash64("vec_id"), F.lit(100_000)), "vec_id")
            .limit(sample).collect())
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    X /= np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_lists, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(len(C)):
            m = assign == j
            if m.any():
                c = X[m].mean(axis=0)
                C[j] = c / max(np.linalg.norm(c), 1e-12)
    return [[float(v) for v in c] for c in C]


def ann_ivf_topk(emb: DataFrame, k: int = TOPK, query_mod: int = QUERY_MOD,
                 n_probe: int = IVF_PROBE,
                 centroids: list[list[float]] | None = None) -> DataFrame:
    """IVF (inverted-file) ANN: coarse quantizer → per-list inverted
    index → queries probe their ``n_probe`` nearest lists.

    Centroids broadcast as literals; assignment is a JVM-side argmax
    over ``n_lists`` dot products. The big side shuffles once, keyed by
    list id.  Pass ``centroids`` (e.g. ``ivf_centroids()`` for the
    oracle-verifiable deterministic quantizer); ``None`` trains sampled
    k-means on the corpus (pytest-gated path).
    """
    cent = centroids if centroids is not None else train_ivf_centroids(emb)
    cent_arr = F.array(*[F.array(*[F.lit(v) for v in c]) for c in cent])

    def best_lists(n: int):
        idx = F.expr(
            "transform(array_sort(zip_with(_scores, sequence(0, size(_scores) - 1), "
            "(s, i) -> struct(-s AS negs, i AS i))), x -> x.i)")
        return F.slice(idx, 1, n)

    base = emb.withColumn("_cent", cent_arr)
    c = (base.withColumn("_scores", F.expr(
            f"transform(_cent, c -> {P.dot('c', 'embedding', P.SPARK)})"))
         .withColumn("list_id", F.expr(
             "array_position(_scores, array_max(_scores)) - 1"))
         .select(F.col("vec_id").alias("n_id"),
                 F.col("embedding").alias("n_emb"), "list_id")
         .withColumn("n_norm", F.expr(
             f"sqrt({P.dot('n_emb', 'n_emb', P.SPARK)})")))
    q = (base.where(F.col("vec_id") % query_mod == 0)
         .withColumn("_scores", F.expr(
             f"transform(_cent, c -> {P.dot('c', 'embedding', P.SPARK)})"))
         .withColumn("probe", F.explode(best_lists(n_probe)))
         .select(F.col("vec_id").alias("q_id"),
                 F.col("embedding").alias("q_emb"),
                 F.col("probe").alias("list_id"))
         .withColumn("q_norm", F.expr(
             f"sqrt({P.dot('q_emb', 'q_emb', P.SPARK)})")))
    scored = (F.broadcast(q).join(c, "list_id")
              .where(F.col("q_id") != F.col("n_id"))
              .withColumn("cos", _pair_cos("q", "n")))
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("n_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("q_id", "n_id", "rank", "cos"))


def ann_ivf_topk_sql(d: str = P.DUCK, k: int = TOPK, query_mod: int = QUERY_MOD,
                     n_probe: int = IVF_PROBE,
                     centroids: list[list[float]] | None = None) -> str:
    """Oracle for the deterministic-quantizer IVF query.

    The centroid floats are exact literals (repr round-trips doubles),
    each list score is the same sequential left-fold dot as the Spark
    side, corpus assignment is rn=1 and query probing rn≤n_probe over
    (score DESC, list ASC) — matching Spark's first-max
    ``array_position`` tie-break and ``best_lists`` sort.
    """
    cent = centroids if centroids is not None else ivf_centroids()

    def dot_lit(c: list[float], emb: str) -> str:
        lit = "[" + ", ".join(repr(v) for v in c) + "]"
        if d == P.SPARK:
            return P.dot(f"array({', '.join(repr(v) for v in c)})", emb, d)
        return (f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
                f"list_transform(generate_series(1, {len(c)}), "
                f"i -> ({lit}::DOUBLE[])[i] * CAST({emb}[i] AS DOUBLE))), "
                f"(s, v) -> s + v)")

    scores = "[" + ",\n     ".join(dot_lit(c, "embedding") for c in cent) + "]"
    cos = _cos_expr("q.embedding", "c.embedding", d)
    return f"""
WITH scored AS (
  SELECT vec_id, embedding, {scores} AS scores
  FROM embeddings),
per_list AS (
  SELECT vec_id, embedding,
         unnest(scores) AS s,
         unnest(generate_series(0, {len(cent) - 1})) AS j
  FROM scored),
corpus AS (
  SELECT vec_id, embedding, j AS list_id FROM (
    SELECT vec_id, embedding, j,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, j ASC) AS rn
    FROM per_list) WHERE rn = 1),
probes AS (
  SELECT vec_id, embedding, j AS list_id FROM (
    SELECT vec_id, embedding, j,
           row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, j ASC) AS rn
    FROM per_list WHERE vec_id % {query_mod} = 0) WHERE rn <= {n_probe}),
scored_pairs AS (
  SELECT q.vec_id AS q_id, c.vec_id AS n_id, {cos} AS cos
  FROM probes q JOIN corpus c
    ON q.list_id = c.list_id AND q.vec_id <> c.vec_id),
ranked AS (
  SELECT q_id, n_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank
  FROM scored_pairs)
SELECT q_id, n_id, rank, cos FROM ranked WHERE rank <= {k}
"""


def ann_lsh_topk_sql(d: str = P.DUCK, k: int = TOPK, query_mod: int = QUERY_MOD,
                     planes: int = LSH_PLANES) -> str:
    cos = _cos_expr("q.embedding", "c.embedding", d)
    bucket = _bucket_expr("embedding", planes, d)
    return f"""
WITH bucketed AS (
  SELECT vec_id, embedding, {bucket} AS bucket FROM embeddings),
scored AS (
  SELECT q.vec_id AS q_id, c.vec_id AS n_id, {cos} AS cos
  FROM bucketed q JOIN bucketed c ON q.bucket = c.bucket AND q.vec_id <> c.vec_id
  WHERE q.vec_id % {query_mod} = 0),
ranked AS (
  SELECT q_id, n_id, cos,
         row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, n_id ASC) AS rank
  FROM scored)
SELECT q_id, n_id, rank, cos FROM ranked WHERE rank <= {k}
"""
