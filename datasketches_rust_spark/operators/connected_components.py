"""Connected components over the candidate-pair edge DataFrame — the
genuinely iterative piece of the pipeline (SURVEY.md §4 "genuinely hard").

Algorithm: minimum-label propagation with pointer-doubling fallback.
Every vertex starts labeled with its own id; each round every vertex takes
the min of its label and its neighbors' labels; converged when no label
changes. Rounds needed = diameter of the largest component — for dedup
graphs usually 2-3 (near-dup clusters are dense, and the LSH hot-bucket
star degrade keeps even giant clusters at diameter <= 4). Each round is
ONE Spark job: the min-label aggregation also carries the previous label,
so convergence detection falls out of the same aggregate.

Chain-shaped components (pairwise-only similarity a~b~c~..., which do
occur in crawl dedup) would need diameter-many rounds, so after
``shortcut_after`` plain rounds every subsequent round also propagates
label-of-label (pointer doubling / "shortcutting", the same halving step
as the MapReduce large-star contraction of Kiveris et al.): reach doubles
per round, giving O(log diameter) convergence without paying the extra
join on the easy (typical) inputs. If max_iter is exhausted with labels
still changing, this RAISES instead of silently returning a wrong
clustering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


class ConvergenceError(RuntimeError):
    """Label propagation exhausted max_iter with labels still changing."""


def connected_components(edges: DataFrame, vertices: DataFrame | None = None,
                         id_col: str = "id", src: str = "id_a",
                         dst: str = "id_b", max_iter: int = 50,
                         shortcut_after: int = 6) -> DataFrame:
    """DataFrame[id, cluster_id] — cluster_id = min vertex id reachable.

    edges: DataFrame[src, dst]. If ``vertices`` is None, only edge-touched
    nodes are labeled — the scale-critical case: singletons (the vast
    majority at 10^12 rows) never enter the iteration; use
    ``assign_clusters`` to fold them back in with a single join.
    """
    from pyspark.storagelevel import StorageLevel
    from datasketches_rust_spark.cache import release_tracked, track

    sym = (edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
           .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d"))))
    # serialized storage (pyspark's MEMORY_AND_DISK is the serialized
    # variant; the JVM localCheckpoint default is the DESER one): the
    # checkpoint is re-read 1-2x per round (own + msgs legs), and
    # deserialized UnsafeRow caching costs ~80 bytes/row vs ~25 serialized
    # — on a DRAM-bound box the re-reads are the label-propagation
    # bottleneck, so trade decode CPU for bytes
    sym = sym.localCheckpoint(
        storageLevel=StorageLevel.MEMORY_AND_DISK)
    # the (eager) checkpoint above materialized everything upstream —
    # signature/fingerprint caches registered by producers are now
    # consumable garbage, as is any previous call's label table
    release_tracked()

    # initial labels stay lazy: they derive from the checkpointed edge set
    # (or a plain vertex scan), so materializing them separately would only
    # add a job — on this environment each job costs ~1.6s of fixed overhead
    if vertices is None:
        labels = None  # identity labels: round 1 reads them off sym directly
    else:
        labels = vertices.select(F.col(id_col).alias("v"),
                                 F.col(id_col).alias("label"))

    prev = None
    converged = False
    for it in range(max_iter):
        # One Spark job per round: the min-label aggregation ALSO carries
        # each vertex's previous label (tagged union leg), so convergence
        # ("did any label change?") falls out of the same aggregate that
        # materializes the persisted next-round labels — no separate
        # join+count job.
        if labels is None:
            # round 1 with identity labels: label(v)=v, so the message a
            # vertex d receives from neighbor s is just s — no distinct
            # (the groupBy dedups) and no join: ONE shuffle instead of
            # three (distinct + join + groupBy)
            own = sym.select(F.col("s").alias("v"),
                             F.col("s").alias("label"),
                             F.lit(1).alias("__own"))
            msgs = sym.select(F.col("d").alias("v"),
                              F.col("s").alias("label"),
                              F.lit(0).alias("__own"))
        else:
            own = labels.select("v", "label", F.lit(1).alias("__own"))
            msgs = (sym.join(labels, sym.s == labels.v)
                    .select(F.col("d").alias("v"), "label",
                            F.lit(0).alias("__own")))
        legs = own.unionByName(msgs)
        if it >= shortcut_after and labels is not None:
            # pointer doubling: v also adopts label(label(v)). label values
            # are themselves vertex ids present in `labels`, so this is a
            # self-join keyed on the label — reach doubles every round.
            la, lb = labels.alias("__la"), labels.alias("__lb")
            jump = (la.join(lb, F.col("__la.label") == F.col("__lb.v"))
                    .select(F.col("__la.v").alias("v"),
                            F.col("__lb.label").alias("label"),
                            F.lit(0).alias("__own")))
            legs = legs.unionByName(jump)
        merged = (legs.groupBy("v")
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
            labels = labels.localCheckpoint(  # bound plan depth
                storageLevel=StorageLevel.MEMORY_AND_DISK)
        if not changed:
            converged = True
            break

    if not converged:
        if prev is not None:
            prev.unpersist(False)
        raise ConvergenceError(
            f"connected_components did not converge in {max_iter} rounds "
            f"(labels still changing); raise max_iter — with pointer "
            f"doubling after round {shortcut_after} this takes a graph of "
            f"diameter > ~2^{max_iter - shortcut_after}")
    if prev is not None:
        # the caller consumes `labels` lazily; register the backing cache
        # for release at the next pipeline/CC invocation instead of
        # leaking it for the session lifetime
        from datasketches_rust_spark.cache import register
        register(prev)

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


def assign_clusters_string_ids(items: DataFrame, edges_from_long_ids,
                               id_col: str) -> DataFrame:
    """Cluster assignments for STRING-keyed items whose edge generation
    wants LONG ids (the shuffle-heavy middle of every modality
    pipeline rides xxhash64 longs; the min-STRING representative is
    recovered at the end — the image-axis discipline, CLAUDE.md).

    ``edges_from_long_ids(df_with___lid)`` must return
    DataFrame[id_a, id_b] over the ``__lid`` column the items get.
    Singletons map to themselves. Shared by the audio clip, audio
    frame, and video pipelines (was three identical inline copies)."""
    lids = items.withColumn("__lid", F.xxhash64(F.col(id_col)))
    edges = edges_from_long_ids(lids)
    cc = connected_components(edges, None, id_col="__lid")
    idmap = items.select(F.col(id_col),
                         F.xxhash64(F.col(id_col)).alias("__lid"))
    members = (cc.join(idmap, "__lid")
               .select(F.col(id_col), F.col("cluster_id").alias("__cl")))
    reps = members.groupBy("__cl").agg(F.min(id_col).alias("cluster_id"))
    assigned = members.join(reps, "__cl").select(id_col, "cluster_id")
    return (items.select(F.col(id_col))
            .join(assigned, id_col, "left")
            .withColumn("cluster_id",
                        F.coalesce(F.col("cluster_id"), F.col(id_col)))
            .select(id_col, "cluster_id"))
