"""Hierarchy (tree/DAG) ancestor closure by pointer doubling — the
recursive-query operator class (org charts, bill-of-materials, category
trees) that SQL expresses as WITH RECURSIVE and Spark has no native
node for.

The naive iterative form lifts one level per round (depth rounds, each
a full-closure shuffle). Pointer doubling joins the closure with ITSELF
— reach doubles every round, so a depth-d tree closes in ceil(log2 d)
rounds (the connected_components shortcutting idea applied to ancestor
enumeration). Each round is one join + union + distinct on (node, anc),
localCheckpointed so lineage doesn't nest exponentially; like CC, the
convergence count falls out of the round's own materialization, one
Spark job per round.

Output size is nodes x depth — the honest cost of ancestor
enumeration. For trees whose depth grows with log n (balanced), that is
n log n rows; real org/BOM hierarchies are depth <= a few dozen
regardless of n, so the closure stays linear-ish and every exchange is
on the node key. Exhausting max_rounds with the closure still growing
RAISES (the connected_components contract: never silently return a
truncated ancestor set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from datasketches_rust_spark.operators.connected_components import (
    ConvergenceError,
)


def ancestor_closure(parents: DataFrame, node: str = "node",
                     parent: str = "parent",
                     max_rounds: int = 20) -> DataFrame:
    """DataFrame[node, anc] — every proper ancestor of every node.

    ``parents``: DataFrame[node, parent], one row per non-root node
    (roots simply absent). Cycles would diverge; the max_rounds raise
    is the guard. max_rounds=20 covers depth 2^20 — any real
    hierarchy.
    """
    from pyspark.storagelevel import StorageLevel

    clo = (parents.select(F.col(node).alias("node"),
                          F.col(parent).alias("anc"))
           .where(F.col("anc").isNotNull())
           .distinct()
           .localCheckpoint(storageLevel=StorageLevel.MEMORY_AND_DISK))
    n = clo.count()
    for _ in range(max_rounds):
        # lift: node ->(closure) mid ->(closure) anc, then keep the union
        lifted = (clo.alias("a")
                  .join(clo.alias("b"),
                        F.col("a.anc") == F.col("b.node"))
                  .select(F.col("a.node").alias("node"),
                          F.col("b.anc").alias("anc")))
        nxt = (clo.union(lifted).distinct()
               .localCheckpoint(storageLevel=StorageLevel.MEMORY_AND_DISK))
        n_next = nxt.count()
        grew = n_next > n
        clo = nxt
        n = n_next
        if not grew:
            # a cycle does NOT diverge — it converges WITH self-pairs
            # (walking the loop back to the start node), so node==anc
            # in a "proper ancestor" closure is the cycle signature
            if clo.where(F.col("node") == F.col("anc")).take(1):
                raise ConvergenceError(
                    "cycle detected: closure contains node==anc "
                    "self-pairs — input is not a tree/DAG")
            return clo
    raise ConvergenceError(
        f"ancestor_closure still growing after {max_rounds} doubling "
        f"rounds ({n} pairs) — depth exceeds 2^max_rounds")


def tree_rollup(parents: DataFrame, values: DataFrame,
                node: str = "node", parent: str = "parent",
                value: str = "value", max_rounds: int = 20) -> DataFrame:
    """DataFrame[anc, n_nodes, total] — for every node, the count and
    value sum over its subtree (descendants + itself). The rollup is
    closure-join-aggregate: ancestors enumerate once, the per-ancestor
    aggregate map-side combines, and the output is node-bounded."""
    clo = ancestor_closure(parents, node, parent, max_rounds)
    v = values.select(F.col(node).alias("node"),
                      F.col(value).alias("v"))
    # every node is its own ancestor for rollup purposes
    self_pairs = v.select("node", F.col("node").alias("anc"))
    pairs = clo.select("node", "anc").union(self_pairs)
    return (pairs.join(v, "node")
            .groupBy("anc")
            .agg(F.count("*").alias("n_nodes"),
                 F.sum("v").alias("total")))
