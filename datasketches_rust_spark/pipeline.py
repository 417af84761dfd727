"""The end-to-end near-duplicate detection + clustering pipeline
(BASELINE.json north_rule), text modality. The image modality adds phash /
SimHash edges on top (sources/images.py + operators/visual.py).

Stages (SURVEY.md §7 step 4 spine):
  1. signatures : one Arrow-batched pandas UDF pass computes shingle
                  hashes -> 128-perm MinHash -> 32x4 LSH band keys per doc
                  (coupon-precompute discipline: hash each shingle once,
                  reuse across all permutations — hll/mod.rs:167-173).
  2. candidates : LSH band self-join (operators/lsh.py) with hot-bucket cap.
  3. verify     : exact shingle-set Jaccard on candidate pairs (the
                  "confirm" pass; analog of theta intersection semantics,
                  theta/intersection.rs:142-155) — keep pairs >= threshold.
  4. cluster    : connected components -> cluster_id = min member id.

Every stage returns a DataFrame so callers can checkpoint/inspect between
stages; run_dedup() wires them together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from datasketches_rust_spark.config import DedupConfig
from datasketches_rust_spark.functions.text import (exact_jaccard_udf,
                                                    minhash_struct_udf)
from datasketches_rust_spark.operators.connected_components import \
    assign_clusters
from datasketches_rust_spark.operators.lsh import candidate_pairs


def ensure_parallelism(df: DataFrame) -> DataFrame:
    """Repartition up to the cluster's default parallelism when the scan
    yields fewer partitions (e.g. one small parquet file locally) — the
    CPU-heavy signature UDF should use every core. At production scale the
    scan already has >> defaultParallelism partitions, so this is a no-op
    (no extra shuffle)."""
    if df.isStreaming:
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def minhash_signatures(df: DataFrame, cfg: DedupConfig, id_col: str,
                       text_col: str) -> DataFrame:
    """DataFrame[id, sig, bands, n_shingles]. Column-pruned: only id + text
    are read from the scan."""
    mh = minhash_struct_udf(cfg)
    narrow = ensure_parallelism(df.select(F.col(id_col), F.col(text_col)))
    return (narrow
            .withColumn("__mh", mh(F.lower(F.col(text_col))))
            .select(id_col, F.col("__mh.sig").alias("sig"),
                    F.col("__mh.bands").alias("bands"),
                    F.col("__mh.n_shingles").alias("n_shingles")))


def dedup_pairs(df: DataFrame, cfg: DedupConfig, id_col: str,
                text_col: str, sigs: DataFrame | None = None) -> DataFrame:
    """DataFrame[id_a, id_b, jaccard] — verified near-dup pairs
    (exact shingle Jaccard >= cfg.jaccard_threshold), id_a < id_b.

    ``sigs``: optional pre-materialized signature table [id, bands]
    (e.g. the image pipeline's fused one-scan sketch table, or a
    checkpointed Iceberg signature table on re-runs). When omitted it is
    built here and cached.
    """
    if sigs is None:
        # The signature table is read by the bucket-size guard and both
        # sides of the LSH self-join — persist it so the signature UDF
        # runs exactly once per input row. At 10^12-row scale this is the
        # per-partition signature table the north_star checkpoints to
        # Iceberg; MEMORY_AND_DISK spills gracefully. Tracked (cache.py):
        # released at the next CC/pipeline invocation, after consumers
        # have materialized, instead of leaking for the session lifetime.
        # Only (id, bands) is cached: candidate generation joins on the
        # band keys alone, and the verify stage recomputes shingle sets
        # from the raw text — caching the 128-long sig array would put
        # ~1 KB/row of never-read payload through the cache write AND
        # through every subtree scan that re-reads this table. Callers
        # that need sig (checkpointing, sketch queries) call
        # minhash_signatures directly.
        from datasketches_rust_spark.cache import track
        sigs = track(minhash_signatures(df, cfg, id_col, text_col)
                     .select(id_col, "bands"))
        # materialize the cache in ONE full-parallelism job before the
        # LSH subtrees fan out: concurrent AQE leaf stages first-touching
        # a cold cache serialize on per-partition locks, with blocked
        # consumer tasks occupying task slots (observed: every stage at
        # N-1/N, machine idle)
        sigs.count()
    cands = candidate_pairs(sigs, cfg, id_col)

    texts = df.select(F.col(id_col), F.lower(F.col(text_col)).alias("__t"))
    jac = exact_jaccard_udf(cfg)
    # explicit repartition (AQE leaves user-specified counts alone): the
    # candidate set is small in bytes but the exact-Jaccard verify is
    # CPU-heavy, so spreading it over all cores matters more than
    # shuffle-size-driven coalescing
    cands = cands.repartition(
        df.sparkSession.sparkContext.defaultParallelism, "id_a")
    verified = (cands
                .join(texts.withColumnRenamed(id_col, "id_a")
                      .withColumnRenamed("__t", "__ta"), "id_a")
                .join(texts.withColumnRenamed(id_col, "id_b")
                      .withColumnRenamed("__t", "__tb"), "id_b")
                .withColumn("jaccard", jac("__ta", "__tb"))
                .where(F.col("jaccard") >= F.lit(cfg.jaccard_threshold))
                .select("id_a", "id_b", "jaccard"))
    return verified


def cluster_assignments(df: DataFrame, cfg: DedupConfig, id_col: str,
                        text_col: str,
                        extra_edges: DataFrame | None = None) -> DataFrame:
    """DataFrame[id, cluster_id] for every input row (singletons included).
    cluster_id = min member id of the connected component. ``extra_edges``
    (e.g. visual SimHash edges) are unioned in before clustering."""
    edges = dedup_pairs(df, cfg, id_col, text_col).select("id_a", "id_b")
    if extra_edges is not None:
        # no distinct: min-label propagation is idempotent to duplicate
        # edges, so a pair found by both the caption and the visual path
        # just sends one redundant (tiny) message per round
        edges = edges.unionByName(extra_edges.select("id_a", "id_b"))
    vertices = df.select(F.col(id_col))
    return assign_clusters(vertices, edges, id_col=id_col)


def dedup_keep_canonical(df: DataFrame, cfg: DedupConfig, id_col: str,
                         text_col: str) -> DataFrame:
    """The actual dedup: keep one canonical row (min id) per cluster."""
    clusters = cluster_assignments(df, cfg, id_col, text_col)
    keep = (clusters.groupBy("cluster_id")
            .agg(F.min(id_col).alias(id_col),
                 F.count("*").alias("cluster_size")))
    return df.join(keep, id_col, "inner")
