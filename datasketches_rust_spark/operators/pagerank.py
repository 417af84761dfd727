"""Distributed PageRank over an undirected edge list.

A training-data-pipeline extension beyond the reference's sketch surface
(the reference repo has no graph module): centrality over the near-dup
graph ranks the most-connected documents — boilerplate hubs, template
families — the docs a curation run inspects first. Same edge substrate
as connected components (``pipeline.dedup_pairs``), so it composes with
the dedup pipeline for free.

Scale shape
-----------
- The graph lives as an ADJACENCY AGGREGATE ``(u, nbrs, deg)`` built
  once, persisted, and hash-partitioned by node id. Every iteration's
  rank join lands on that same partitioning (``groupBy(u)`` output is
  hashpartitioning(u) with the same partition count), so the join needs
  NO exchange — each iteration costs exactly ONE shuffle (the
  contribution re-aggregation), the minimum any message-passing step can
  do.
- Fixed iteration count, no convergence collect: zero driver round-trips
  inside the loop (cf. connected_components, which folds its convergence
  flag into the label aggregate — here we don't need even that).
- ``localCheckpoint`` every ``checkpoint_every`` iterations truncates
  the lineage chain (15 chained shuffles would otherwise replay from the
  scan on any recompute), same discipline as the BPE merge loop.
- Symmetrized edges mean no dangling nodes (every node has out-degree
  >= 1), so the classic dangling-mass redistribution term is identically
  zero and the update is the pure form
  ``r'(v) = (1-d)/N + d * sum_{u~v} r(u)/deg(u)``.

The arithmetic is written so a fixed-iteration SQL unrolling computes
the SAME expression tree (see queries._pagerank_oracle_sql): init
``1.0/N``, per-step ``base + d * sum(contrib)`` — cross-engine float
sums differ only in addition order (~1e-14), absorbed by the round-7
output grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PAGERANK_DAMPING = 0.85
PAGERANK_ITERS = 15


def pagerank(edges: DataFrame, src: str = "id_a", dst: str = "id_b",
             damping: float = PAGERANK_DAMPING,
             n_iter: int = PAGERANK_ITERS,
             checkpoint_every: int = 6) -> DataFrame:
    """Rank nodes of the undirected graph given as an (src, dst) edge
    list (each undirected edge once). Returns (u, r) with sum(r) ~ 1."""
    from datasketches_rust_spark import cache
    sym = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
           .unionAll(
               edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))))
    # track()ed, not bare-persisted: the returned ranks frame is lazy and
    # references adj, so this function cannot unpersist before returning —
    # the session cache registry releases it at the next pipeline/CC
    # invocation (same deferred-release contract as the signature tables).
    adj = cache.track(
        sym.groupBy("u")
        .agg(F.collect_list("v").alias("nbrs"),
             F.count("*").alias("deg")))
    n = adj.count()  # one job; also materializes the cache at full
    # parallelism before the iteration fan-out (persist+AQE hazard)
    if n == 0:
        adj.unpersist()
        return sym.sparkSession.createDataFrame([], "u long, r double")
    base = (1.0 - damping) / n
    ranks = adj.select("u", F.lit(1.0 / n).alias("r"))
    for i in range(n_iter):
        contribs = (adj.join(ranks, "u")
                    .select(F.explode("nbrs").alias("u"),
                            (F.col("r") / F.col("deg")).alias("c")))
        ranks = (contribs.groupBy("u")
                 .agg((F.lit(base)
                       + F.lit(damping) * F.sum("c")).alias("r")))
        if (i + 1) % checkpoint_every == 0 and (i + 1) < n_iter:
            ranks = ranks.localCheckpoint(eager=False)
    return ranks
