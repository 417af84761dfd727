"""LSH candidate-pair generation — the one big shuffle of the dedup
pipeline, so everything here is shaped around shuffle hygiene.

Plan shape (at 100 TB / 10^12 rows):
  explode(bands)            -- narrow, stays in the scan stage
  groupBy(band_key)         -- shuffle 1: tiny rows (key, id); the band
                               index is mixed into the key by the kernel
  hot-bucket guard          -- CountMin-style skew detection done exactly
                               here (the counts are already materialized);
                               buckets over the cap DEGRADE to a star
                               topology instead of the quadratic self-join
  self-join on band_key     -- shuffle 2: both sides partitioned identically
                               by the join key, so AQE plans a co-located
                               join; skew-join splitting handles any
                               surviving hot key
  union star edges, then
  distinct pairs            -- shuffle 3 on (id_a, id_b); doubles as the
                               band-collision prefilter

Hot-bucket degrade (star topology): a bucket larger than
``max_bucket_size`` would contribute O(size^2) pairs to the self-join —
and for a near-dup cluster of 10k+ members (boilerplate duplicated across
a crawl) EVERY band bucket is that cluster, so dropping hot buckets would
drop the cluster entirely. Instead each hot bucket emits (representative,
member) edges where representative = min id in the bucket: O(size) pairs
that keep the component connected through the representative, while the
downstream exact verify still rejects dissimilar hash collisions. Star
edges bypass the >= min_band_matches prefilter (a pair whose buckets are
hot in every band has zero cold collisions to count — the prefilter only
applies to cold-bucket evidence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from datasketches_rust_spark.config import DedupConfig


def explode_bands(df: DataFrame, id_col: str, bands_col: str) -> DataFrame:
    """(__id, band_key) rows. The band index is already mixed into the key
    by sketches/minhash.band_hashes, so the single long IS the whole join
    key — band rows stay 16 bytes of payload through both LSH shuffles."""
    return df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.col(bands_col)).alias("band_key"))


def candidate_pairs(df: DataFrame, cfg: DedupConfig, id_col: str,
                    bands_col: str = "bands") -> DataFrame:
    """DataFrame[id_a, id_b] — unordered candidate pairs (id_a < id_b),
    distinct across bands.

    Cold buckets self-join quadratically; hot buckets (> max_bucket_size
    members) degrade to star edges around their min-id representative.
    A pair qualifies with >= cfg.min_band_matches cold-band collisions OR
    any star edge (see module docstring for why the prefilter must not
    count capped bands).
    """
    ex = explode_bands(df, id_col, bands_col)
    min_nb = max(getattr(cfg, "min_band_matches", 1), 1)

    star = None
    if cfg.max_bucket_size > 0:
        # ONE aggregation computes bucket size AND representative (min id):
        # both are map-side partial aggregates, so the skewed hot keys
        # reduce before the (tiny) shuffle, and the hot list — now carrying
        # its representative — broadcasts once instead of the former
        # size-then-rep two-step (every AQE barrier on the critical path is
        # a full job of fixed overhead)
        sizes = ex.groupBy("band_key").agg(
            F.count("*").alias("__n"), F.min("__id").alias("__rep"))
        hot = sizes.where(F.col("__n") > cfg.max_bucket_size) \
                   .select("band_key", "__rep")
        star = (ex.join(F.broadcast(hot), ["band_key"])
                .where(F.col("__id") != F.col("__rep"))
                .select(F.least("__id", "__rep").alias("id_a"),
                        F.greatest("__id", "__rep").alias("id_b"),
                        F.lit(1).alias("__hot")))
        ex = ex.join(F.broadcast(hot.select("band_key")),
                     ["band_key"], "left_anti")

    a = ex.alias("a")
    b = ex.alias("b")
    events = (a.join(b, ["band_key"])
              .where(F.col("a.__id") < F.col("b.__id"))
              .select(F.col("a.__id").alias("id_a"),
                      F.col("b.__id").alias("id_b"),
                      F.lit(0).alias("__hot")))
    if star is not None:
        events = events.unionByName(star)

    # ONE shuffle dedups pairs AND evaluates the prefilter: a true pair at
    # the jaccard threshold co-buckets in many cold bands, a false
    # candidate in ~1; star edges qualify unconditionally.
    return (events.groupBy("id_a", "id_b")
            .agg(F.sum(1 - F.col("__hot")).alias("__nb"),
                 F.max("__hot").alias("__star"))
            .where((F.col("__star") == 1) | (F.col("__nb") >= min_nb))
            .select("id_a", "id_b"))


def hot_bucket_stats(df: DataFrame, cfg: DedupConfig, id_col: str,
                     bands_col: str = "bands") -> DataFrame:
    """Metrics: per-band bucket-size distribution + number of capped
    (star-degraded) buckets. Feeds the pipeline's lineage/metrics
    checkpoint."""
    ex = explode_bands(df, id_col, bands_col)
    sizes = ex.groupBy("band_key").count()
    return sizes.agg(
        F.count("*").alias("n_buckets"),
        F.max("count").alias("max_bucket"),
        F.expr("percentile(count, 0.999)").alias("p999_bucket"),
        F.sum(F.when(F.col("count") > cfg.max_bucket_size, 1)
              .otherwise(0)).alias("capped_buckets"))
