"""Image+caption near-duplicate pipeline (the north_star pipeline).

Edge sources, merged before clustering:
  caption edges — MinHash/LSH/exact-Jaccard on the caption column
                  (pipeline.dedup_pairs), jaccard >= cfg threshold.
  visual edges  — phash Hamming <= cfg.simhash_hamming via pigeonhole
                  banding (operators/visual.simhash_pairs): recall 1.0,
                  then exact popcount verify. phash is DCT-based
                  (sources/phash.py) so JPEG re-encode / bounded noise
                  (PSNR >= 40 dB) keeps Hamming distance ~0-3.

Scale notes: both the caption and the visual path shuffle (band_key,
id) pairs — 16 bytes/row, the band index mixed into the key and string
image ids mapped to xxhash64 longs for the whole internal pipeline.
The heavy `bytes` column is never shuffled: phash is computed at scan time
(mapInPandas over the binary column) and only the 8-byte fingerprint
travels. Cluster ids come from connected components over the merged edges.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType

from datasketches_rust_spark.config import DedupConfig
from datasketches_rust_spark.operators.connected_components import \
    assign_clusters
from datasketches_rust_spark.operators.visual import simhash_pairs
from datasketches_rust_spark.pipeline import dedup_pairs


def phash_from_bytes_udf():
    """pandas UDF: (bytes, fmt) -> phash long, decoding in the SCAN stage so
    only the 8-byte fingerprint ever shuffles. Decode is per-row (variable-
    length compressed buffers have no batch form); the DCT/median/bit-pack
    run batched over the Arrow batch (sources/phash.phash_batch)."""
    from pyspark.sql.functions import pandas_udf
    from datasketches_rust_spark.sources.codec import decode_image
    from datasketches_rust_spark.sources.phash import phash_batch

    @pandas_udf(LongType())
    def _udf(bufs: pd.Series, fmts: pd.Series) -> pd.Series:
        pix = [decode_image(bytes(b), f) for b, f in zip(bufs, fmts)]
        return pd.Series(phash_batch(pix), dtype="int64")

    return _udf


def image_sketch_table(images: DataFrame, cfg: DedupConfig,
                       id_col: str = "image_id",
                       phash_source: str = "auto") -> DataFrame:
    """ONE scan computes every per-row sketch the dedup pipeline needs —
    DataFrame[id, bands array<long>, phash long], cached and materialized.

    The caption MinHash/LSH path and the visual phash path each need a
    full pass over the table; fusing them means the parquet row groups
    decompress once, the heavy `bytes` column is read once, and both
    pandas UDFs ride the same Arrow batch through one python-worker
    round-trip (Spark evaluates independent pandas UDFs in a projection
    as a single ArrowEvalPython node). At 100 TB this halves the scan
    bill; the cached result is the per-partition signature table the
    north_star checkpoints to Iceberg."""
    from datasketches_rust_spark.cache import track
    from datasketches_rust_spark.functions.text import minhash_struct_udf
    from datasketches_rust_spark.pipeline import ensure_parallelism

    if phash_source == "auto":
        phash_source = ("bytes" if {"bytes", "fmt"} <= set(images.columns)
                        else "stored")
    mh = minhash_struct_udf(cfg)
    in_cols = [id_col, "caption"] + (["bytes", "fmt"]
                                     if phash_source == "bytes"
                                     else ["phash"])
    narrow = ensure_parallelism(images.select(*in_cols))
    cols = [F.col(id_col),
            mh(F.lower(F.col("caption"))).getField("bands").alias("bands")]
    if phash_source == "bytes":
        ph = phash_from_bytes_udf()
        cols.append(ph(F.col("bytes"), F.col("fmt")).alias("phash"))
    else:
        cols.append(F.col("phash"))
    sk = track(narrow.select(*cols))
    # one full-parallelism job materializes the cache before consumers
    # fan out (per-partition cache-lock hazard, see pipeline.dedup_pairs)
    sk.count()
    return sk


def visual_edges(images: DataFrame, cfg: DedupConfig,
                 id_col: str = "image_id",
                 phash_col: str = "phash",
                 phash_source: str = "auto") -> DataFrame:
    """DataFrame[id_a, id_b] — phash Hamming <= cfg.simhash_hamming.

    phash_source:
      "bytes"  — decode the binary column and compute the DCT phash in the
                 scan stage (the north_star pipeline: fingerprints are
                 DERIVED from pixels, not trusted from a column).
      "stored" — trust the table's phash column (pre-sketched input, e.g.
                 the checkpointed signature table on re-runs).
      "auto"   — "bytes" when bytes+fmt columns exist, else "stored".
    The fixture stores phash64(decoded) (FIXTURES F1), so both paths yield
    bit-identical fingerprints there — pinned by tests/test_images.py."""
    if phash_source == "auto":
        phash_source = ("bytes" if {"bytes", "fmt"} <= set(images.columns)
                        else "stored")
    if phash_source == "bytes":
        ph = phash_from_bytes_udf()
        # the fingerprint table feeds 3 subtrees in simhash_pairs (bucket
        # sizes, star join, cold self-join) — persist it so the image
        # decode runs exactly once per row, not once per consumer. Tiny
        # (id + 8 bytes); released by the next CC/pipeline invocation.
        # The count() materializes the cache in ONE full-parallelism job:
        # without it, AQE's concurrent leaf stages first-touch the cached
        # partitions under per-partition locks, and the blocked consumer
        # tasks occupy task slots while a handful of lock-holders decode —
        # observed as every stage stuck at N-1/N tasks with the machine
        # 80% idle.
        from datasketches_rust_spark.cache import track
        fps = track(images.select(F.col(id_col),
                                  ph(F.col("bytes"), F.col("fmt"))
                                  .alias(phash_col)))
        fps.count()
    else:
        fps = images.select(F.col(id_col), F.col(phash_col))
    return (simhash_pairs(fps, id_col, phash_col,
                          max_hamming=cfg.simhash_hamming)
            .select("id_a", "id_b"))


def caption_edges(images: DataFrame, cfg: DedupConfig,
                  id_col: str = "image_id",
                  caption_col: str = "caption") -> DataFrame:
    return (dedup_pairs(images, cfg, id_col, caption_col)
            .select("id_a", "id_b"))


def image_cluster_assignments(images: DataFrame, cfg: DedupConfig,
                              id_col: str = "image_id",
                              phash_source: str = "auto") -> DataFrame:
    """DataFrame[image_id, cluster_id(string)] — connected components over
    caption ∪ visual edges; cluster_id = min member image_id.

    String ids run the shuffle-heavy middle (band self-joins, pair
    dedup, verify joins, label propagation) in LONG space: __lid =
    xxhash64(image_id) is derived once at the scan, every internal row
    carries 8-byte ids instead of variable-length UTF8, and the string
    cluster_id (min member image_id) is recovered afterwards with one
    groupBy + join over only the edge-touched vertices. Measured on this
    box the string rows inflate shuffle-stage task time ~1.5x at 8 cores
    (DRAM-bound machinery moving twice the bytes); at 10^12 rows the same
    bytes dominate the shuffle bill. xxhash64 collisions would need ~2^32
    ids to matter (birthday bound) — at that scale swap in a 128-bit
    (two-column) key."""
    if dict(images.dtypes)[id_col] == "string":
        limgs = images.withColumn("__lid", F.xxhash64(F.col(id_col)))
        sk = image_sketch_table(limgs, cfg, "__lid",
                                phash_source=phash_source)
        edges = (dedup_pairs(limgs, cfg, "__lid", "caption",
                             sigs=sk.select("__lid", "bands"))
                 .select("id_a", "id_b")
                 .unionByName(
                     simhash_pairs(sk.select("__lid", "phash"), "__lid",
                                   "phash",
                                   max_hamming=cfg.simhash_hamming)
                     .select("id_a", "id_b")))
        from datasketches_rust_spark.operators.connected_components import \
            connected_components
        cc = connected_components(edges, None, id_col="__lid")
        idmap = images.select(F.col(id_col),
                              F.xxhash64(F.col(id_col)).alias("__lid"))
        members = cc.join(idmap, "__lid") \
            .select(F.col(id_col), F.col("cluster_id").alias("__cl"))
        reps = members.groupBy("__cl").agg(F.min(id_col).alias("cluster_id"))
        assigned = members.join(reps, "__cl").select(id_col, "cluster_id")
        return (images.select(F.col(id_col))
                .join(assigned, id_col, "left")
                .withColumn("cluster_id",
                            F.coalesce(F.col("cluster_id"), F.col(id_col)))
                .select(id_col, "cluster_id"))
    sk = image_sketch_table(images, cfg, id_col, phash_source=phash_source)
    edges = (dedup_pairs(images, cfg, id_col, "caption",
                         sigs=sk.select(id_col, "bands"))
             .select("id_a", "id_b")
             .unionByName(
                 simhash_pairs(sk.select(id_col, "phash"), id_col, "phash",
                               max_hamming=cfg.simhash_hamming)
                 .select("id_a", "id_b")))
    vertices = images.select(F.col(id_col))
    return assign_clusters(vertices, edges, id_col=id_col)


def image_dedup_keep_canonical(images: DataFrame, cfg: DedupConfig,
                               id_col: str = "image_id") -> DataFrame:
    clusters = image_cluster_assignments(images, cfg, id_col)
    keep = (clusters.groupBy("cluster_id")
            .agg(F.min(id_col).alias(id_col),
                 F.count("*").alias("cluster_size")))
    return images.join(keep, id_col, "inner")


def image_dedup_keep_best(images: DataFrame, cfg: DedupConfig,
                          id_col: str = "image_id") -> DataFrame:
    """Quality-based representative per dup cluster: the SHARPEST member
    (max grayscale std over the decoded pixels — a detail/compression
    proxy), min-id on ties — image curation's 'keep the best copy',
    vs image_dedup_keep_canonical's arbitrary min-id.

    Output: DataFrame[cluster_id, rep_id, rep_sharpness, cluster_size].

    Selection runs as two cluster-keyed aggregates (max sharpness, then
    min id among the argmax members) instead of a member sort — both are
    partial-agg shuffles, and float ties (bit-identical copies are
    common in crawl data) stay deterministic."""
    from datasketches_rust_spark.multimodal import image_features
    clusters = image_cluster_assignments(images, cfg, id_col)
    feats = image_features(images).select(
        F.col("image_id").alias(id_col), "std_gray")
    members = clusters.join(feats, id_col)
    best = (members.groupBy("cluster_id")
            .agg(F.max("std_gray").alias("rep_sharpness"),
                 F.count("*").alias("cluster_size")))
    return (members.join(best, "cluster_id")
            .where(F.col("std_gray") == F.col("rep_sharpness"))
            .groupBy("cluster_id", "rep_sharpness", "cluster_size")
            .agg(F.min(id_col).alias("rep_id"))
            .select("cluster_id", "rep_id", "rep_sharpness",
                    "cluster_size"))
