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


def connected_components(edges: DataFrame, vertices: DataFrame | None = None,
                         id_col: str = "id", src: str = "id_a",
                         dst: str = "id_b", max_iter: int = 50) -> DataFrame:
    """DataFrame[id, cluster_id] — cluster_id = min vertex id reachable.

    edges: DataFrame[src, dst]. If ``vertices`` is None, only edge-touched
    nodes are labeled — the scale-critical case: singletons (the vast
    majority at 10^12 rows) never enter the iteration; use
    ``assign_clusters`` to fold them back in with a single join.
    """
    from pyspark.storagelevel import StorageLevel

    sym = (edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
           .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))))
    sym = sym.localCheckpoint()

    # initial labels stay lazy: they derive from the checkpointed edge set
    # (or a plain vertex scan), so materializing them separately would only
    # add a job — on this environment each job costs ~1.6s of fixed overhead
    if vertices is None:
        labels = sym.select(F.col("s").alias("v")).distinct() \
            .withColumn("label", F.col("v"))
    else:
        labels = vertices.select(F.col(id_col).alias("v"),
                                 F.col(id_col).alias("label"))

    prev = None
    for it in range(max_iter):
        # One Spark job per round: the min-label aggregation ALSO carries
        # each vertex's previous label (tagged union leg), so convergence
        # ("did any label change?") falls out of the same aggregate that
        # materializes the persisted next-round labels — no separate
        # join+count job.
        own = labels.select("v", "label", F.lit(1).alias("__own"))
        msgs = (sym.join(labels, sym.s == labels.v)
                .select(F.col("d").alias("v"), "label",
                        F.lit(0).alias("__own")))
        merged = (own.unionByName(msgs)
                  .groupBy("v")
                  .agg(F.min("label").alias("label"),
                       F.min(F.when(F.col("__own") == 1, F.col("label"))
                             ).alias("__prev")))
        merged = merged.persist(StorageLevel.MEMORY_AND_DISK)
        changed = merged.agg(F.sum(
            (F.col("label") != F.col("__prev")).cast("long"))).first()[0]
        if prev is not None:
            prev.unpersist(False)
        prev = merged
        labels = merged.select("v", "label")
        if it % 8 == 7:
            labels = labels.localCheckpoint()  # bound plan depth
        if not changed:
            break

    return labels.select(F.col("v").alias(id_col),
                         F.col("label").alias("cluster_id"))


def assign_clusters(vertices: DataFrame, edges: DataFrame,
                    id_col: str = "id", src: str = "id_a",
                    dst: str = "id_b", max_iter: int = 50) -> DataFrame:
    """Cluster ids for EVERY vertex: label propagation runs only on the
    edge-touched subgraph (dup candidates), then one left join assigns
    singletons their own id. This keeps the iterative shuffles proportional
    to the number of duplicate candidates, not the table size."""
    cc = connected_components(edges, None, id_col=id_col, src=src, dst=dst,
                              max_iter=max_iter)
    return (vertices.select(F.col(id_col))
            .join(cc, id_col, "left")
            .withColumn("cluster_id",
                        F.coalesce(F.col("cluster_id"), F.col(id_col)))
            .select(id_col, "cluster_id"))
