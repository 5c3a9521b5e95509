"""Connected components over near-duplicate pairs → canonical keepers.

Near-dup detection (LSH / SimHash / embedding bands) emits PAIRS; a
curation pipeline needs CLUSTERS, else chains over-drop: with pairs
(a,b) and (b,c) a pairwise drop-the-larger rule keeps only `a` but
cannot tell whether `c` was dropped for a reason that still holds after
`b` is gone.  Resolving pairs to components makes "keep exactly one
document per duplicate cluster" well-defined.

Algorithm: min-label propagation on the symmetrized edge list — each
round every node takes the min component id among itself and its
neighbours (one join + one groupBy per round, all JVM-side).  Rounds
needed = graph diameter; duplicate clusters are near-cliques (diameter
2–4), so this converges in a handful of rounds.  For adversarial shapes
(long transitive chains over template families) pass
``algorithm="star"``: alternating large-star/small-star (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14), whose
round count is ~log(longest path) instead of the diameter.  Lineage is
truncated with localCheckpoint every round so the plan does not grow
with the iteration count; convergence is detected by counting changed
labels (one lightweight action per round).

Safety under early stop: if max_rounds is hit before convergence (a
path longer than the round budget), labels are non-minimal but every
node's label still points INTO its own component, and a node labeled
with its own id always survives keep_canonical — so an unconverged run
can only over-KEEP (more than one doc of a cluster), never drop a
whole cluster.  Duplicate-removal degrades gracefully toward no-op.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_ROUNDS = 12

#: round cap for the star algorithm: provably O(log^2 n) rounds
#: (Kiveris et al. thm 3.2), and in practice ~log2(longest path);
#: 30 covers any graph that fits in a warehouse
STAR_MAX_ROUNDS = 30


def dup_components(pairs: DataFrame, a: str = "a_id", b: str = "b_id",
                   max_rounds: int = MAX_ROUNDS,
                   algorithm: str = "label") -> DataFrame:
    """(id, comp): component label (= min member id) per node that
    appears in at least one pair.

    algorithm="label" (default): min-label propagation — rounds = graph
    diameter, ideal for near-clique duplicate clusters (diameter 2-4).
    algorithm="star": alternating large-star/small-star (Kiveris et
    al., SoCC'14) — O(log n)-ish rounds regardless of diameter, the
    safe choice when the pair graph may contain long chains (e.g.
    transitive near-dup edges over template families at web scale).
    """
    if algorithm == "star":
        return _dup_components_star(pairs, a, b)
    e = pairs.select(F.col(a).alias("x"), F.col(b).alias("y"))
    edges = (e.union(e.select(F.col("y").alias("x"), F.col("x").alias("y")))
             .distinct().localCheckpoint())
    labels = (edges.select(F.col("x").alias("id")).distinct()
              .withColumn("comp", F.col("id")).localCheckpoint())
    for i in range(max_rounds):
        nbr = (edges.join(labels.withColumnRenamed("id", "y"), "y")
               .groupBy("x").agg(F.min("comp").alias("nbr_min"))
               .withColumnRenamed("x", "id"))
        new = (labels.join(nbr, "id", "left")
               .select("id",
                       F.least(F.col("comp"),
                               F.coalesce("nbr_min", F.col("comp")))
                       .alias("comp"))
               .localCheckpoint())
        # convergence is checked every SECOND round (and on the last):
        # the count() action per round dominated wall-clock noise on
        # dup-clique graphs that converge in 2-3 rounds, and one extra
        # propagation round past the fixpoint is an exact no-op
        if i % 2 == 1 or i == max_rounds - 1:
            changed = (new.alias("n").join(labels.alias("o"), "id")
                       .where(F.col("n.comp") != F.col("o.comp")).count())
            labels = new
            if changed == 0:
                break
        else:
            labels = new
    return labels


def _large_star(edges: DataFrame) -> DataFrame:
    """One large-star round: every node connects its strictly-larger
    neighbours to the minimum of its neighbourhood (incl. itself).

    Input/output: directed distinct edge list (x, y).  Emits, for each
    (u, v) with v > u:  (v, min(Γ(u) ∪ {u})).  Two shuffles (symmetrize
    +groupBy, join back); map-side partial min keeps the agg cheap.
    """
    sym = edges.union(
        edges.select(F.col("y").alias("x"), F.col("x").alias("y")))
    m = (sym.groupBy("x")
         .agg(F.min("y").alias("nbr_min"))
         .select("x", F.least("x", "nbr_min").alias("m")))
    return (sym.join(m, "x")
            .where(F.col("y") > F.col("x"))
            .select(F.col("y").alias("x"), F.col("m").alias("y"))
            .where(F.col("x") != F.col("y"))
            .distinct())


def _small_star(edges: DataFrame) -> DataFrame:
    """One small-star round over big→small directed edges: every node
    re-hangs its smaller neighbours (and itself) off the minimum of
    that set.  Emits, for u with smaller-neighbour set N, m = min(N):
    (v, m) for v ∈ N ∪ {u}, v ≠ m.
    """
    canon = edges.select(F.greatest("x", "y").alias("x"),
                         F.least("x", "y").alias("y"))
    m = canon.groupBy("x").agg(F.min("y").alias("m"))
    hang_nbrs = (canon.join(m, "x")
                 .where(F.col("y") != F.col("m"))
                 .select(F.col("y").alias("x"), F.col("m").alias("y")))
    hang_self = m.select("x", F.col("m").alias("y"))
    return hang_nbrs.union(hang_self) \
        .where(F.col("x") != F.col("y")).distinct()


def _dup_components_star(pairs: DataFrame, a: str = "a_id",
                         b: str = "b_id",
                         max_rounds: int = STAR_MAX_ROUNDS) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris
    et al., "Connected Components in MapReduce and Beyond", SoCC'14).

    Converges in O(log n)-ish rounds independent of graph diameter —
    the upgrade over min-label propagation for adversarial shapes
    (long chains) where diameter-many rounds would be unbounded.  At
    the fixpoint the edge set IS the component forest: every edge is
    (member, component-min).  Each round is a bounded number of
    shuffles on a monotonically star-ifying edge set; lineage is cut
    with localCheckpoint per round.
    """
    e = (pairs.select(F.col(a).alias("x"), F.col(b).alias("y"))
         .where(F.col("x") != F.col("y"))
         .select(F.greatest("x", "y").alias("x"),
                 F.least("x", "y").alias("y"))
         .distinct().localCheckpoint())
    for _ in range(max_rounds):
        nxt = _small_star(_large_star(e)).localCheckpoint()
        # fixpoint test on distinct sets: equal counts + empty diff
        if nxt.count() == e.count() and nxt.subtract(e).isEmpty():
            e = nxt
            break
        e = nxt
    # star edges are (member, root=min); roots label themselves
    return (e.select(F.col("x").alias("id"), F.col("y").alias("comp"))
            .union(e.select(F.col("y").alias("id"),
                            F.col("y").alias("comp")))
            .distinct())


def keep_canonical(docs: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id", a: str = "a_id",
                   b: str = "b_id", algorithm: str = "label") -> DataFrame:
    """One document per duplicate cluster: the minimum id of each
    component survives; documents in no pair pass through untouched.
    The drop set (paired ids that are not their component's min) is
    tiny relative to the corpus, so it broadcasts into a left_anti —
    the corpus itself never shuffles."""
    comp = dup_components(pairs, a, b, algorithm=algorithm)
    drop = comp.where(F.col("id") != F.col("comp")) \
               .select(F.col("id").alias(id_col))
    return docs.join(F.broadcast(drop), id_col, "left_anti")
