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
2–4), so this converges in a handful of rounds where a general web
graph would want the large-star/small-star algorithm (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14).  Lineage is
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


def dup_components(pairs: DataFrame, a: str = "a_id", b: str = "b_id",
                   max_rounds: int = MAX_ROUNDS) -> DataFrame:
    """(id, comp): component label (= min member id) per node that
    appears in at least one pair."""
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


def keep_canonical(docs: DataFrame, pairs: DataFrame,
                   id_col: str = "doc_id", a: str = "a_id",
                   b: str = "b_id") -> DataFrame:
    """One document per duplicate cluster: the minimum id of each
    component survives; documents in no pair pass through untouched.
    The drop set (paired ids that are not their component's min) is
    tiny relative to the corpus, so it broadcasts into a left_anti —
    the corpus itself never shuffles."""
    comp = dup_components(pairs, a, b)
    drop = comp.where(F.col("id") != F.col("comp")) \
               .select(F.col("id").alias(id_col))
    return docs.join(F.broadcast(drop), id_col, "left_anti")
