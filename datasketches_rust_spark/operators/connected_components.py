"""Connected components over the candidate-pair edge DataFrame — the
genuinely iterative piece of the pipeline (SURVEY.md §4 "genuinely hard").

Algorithm: minimum-label propagation. Every vertex starts labeled with its
own id; each round every vertex takes the min of its label and its
neighbors' labels; converged when no label changes. Rounds needed = the
diameter of the largest component — for dedup graphs that is bounded by the
dup-cluster size (FIXTURES.md: clusters of 2-8, so <= 7 rounds even at
10^12 rows; near-dup clusters are dense, not chains, so in practice 2-3).
That bound, not O(log V) alternating star-contraction, is why min-label is
the right choice here — each round is ONE shuffle (groupBy min) + ONE join,
and AQE handles the shrinking label frontier.

Lineage is cut with localCheckpoint() each round (iterative self-joins
otherwise stack exponentially growing plans); convergence is detected with
a cheap count on changed labels only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, vertices: DataFrame,
                         id_col: str = "id", src: str = "id_a",
                         dst: str = "id_b", max_iter: int = 50) -> DataFrame:
    """DataFrame[id, cluster_id] — cluster_id = min vertex id reachable.

    edges: DataFrame[src, dst]; vertices: DataFrame[id_col] (must cover all
    edge endpoints; isolated vertices become singleton clusters).
    """
    sym = (edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
           .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))))
    sym = sym.localCheckpoint()

    labels = vertices.select(F.col(id_col).alias("v"),
                             F.col(id_col).alias("label"))
    labels = labels.localCheckpoint()

    for _ in range(max_iter):
        # neighbor messages: each edge forwards the source's current label
        msgs = (sym.join(labels, sym.s == labels.v)
                .select(F.col("d").alias("v"), "label"))
        new_labels = (labels.unionByName(msgs)
                      .groupBy("v").agg(F.min("label").alias("label")))
        new_labels = new_labels.localCheckpoint()
        changed = (new_labels.alias("n")
                   .join(labels.alias("o"), "v")
                   .where(F.col("n.label") != F.col("o.label"))
                   .limit(1).count())
        labels = new_labels
        if changed == 0:
            break

    return labels.select(F.col("v").alias(id_col),
                         F.col("label").alias("cluster_id"))
