"""LSH candidate-pair generation — the one big shuffle of the dedup
pipeline, so everything here is shaped around shuffle hygiene.

Plan shape (at 100 TB / 10^12 rows):
  explode(bands)            -- narrow, stays in the scan stage
  groupBy(band_idx, key)    -- shuffle 1: tiny rows (idx, key, id)
  hot-bucket guard          -- CountMin-style skew detection done exactly
                               here (the counts are already materialized);
                               buckets over the cap are dropped + counted,
                               the analog of frequency heavy-hitter-driven
                               salting decisions (SURVEY.md §2.5)
  self-join on (idx, key)   -- shuffle 2: both sides partitioned identically
                               by the join key, so AQE plans a co-located
                               sort-merge; skew-join splitting handles any
                               surviving hot key
  distinct pairs            -- shuffle 3 on (id_a, id_b)

Dropping capped buckets only loses pairs that co-occur in *every* other
band too — with b=32 bands a true-dup pair has ~32 chances; the cap is a
bounded-loss guard against quadratic blowup on degenerate buckets (e.g.
empty-caption clusters), and the dropped-bucket count is reported.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from datasketches_rust_spark.config import DedupConfig


def explode_bands(df: DataFrame, id_col: str, bands_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("__id"),
        F.posexplode(F.col(bands_col)).alias("band_idx", "band_key"))


def candidate_pairs(df: DataFrame, cfg: DedupConfig, id_col: str,
                    bands_col: str = "bands") -> DataFrame:
    """DataFrame[id_a, id_b] — unordered candidate pairs (id_a < id_b),
    distinct across bands."""
    ex = explode_bands(df, id_col, bands_col)

    if cfg.max_bucket_size > 0:
        sizes = ex.groupBy("band_idx", "band_key").count()
        hot = sizes.where(F.col("count") > cfg.max_bucket_size) \
                   .select("band_idx", "band_key")
        # hot list is tiny by construction -> broadcast anti-join
        ex = ex.join(F.broadcast(hot), ["band_idx", "band_key"], "left_anti")

    a = ex.alias("a")
    b = ex.alias("b")
    min_nb = max(getattr(cfg, "min_band_matches", 1), 1)
    pairs = (a.join(b, ["band_idx", "band_key"])
             .where(F.col("a.__id") < F.col("b.__id"))
             .select(F.col("a.__id").alias("id_a"),
                     F.col("b.__id").alias("id_b"))
             # same shuffle as distinct(), but the count doubles as a
             # band-collision prefilter: a true pair at the jaccard
             # threshold co-buckets in many bands, a false candidate in ~1
             .groupBy("id_a", "id_b").count()
             .where(F.col("count") >= min_nb)
             .select("id_a", "id_b"))
    return pairs


def hot_bucket_stats(df: DataFrame, cfg: DedupConfig, id_col: str,
                     bands_col: str = "bands") -> DataFrame:
    """Metrics: per-band bucket-size distribution + number of capped
    buckets. Feeds the pipeline's lineage/metrics checkpoint."""
    ex = explode_bands(df, id_col, bands_col)
    sizes = ex.groupBy("band_idx", "band_key").count()
    return sizes.agg(
        F.count("*").alias("n_buckets"),
        F.max("count").alias("max_bucket"),
        F.expr("percentile(count, 0.999)").alias("p999_bucket"),
        F.sum(F.when(F.col("count") > cfg.max_bucket_size, 1)
              .otherwise(0)).alias("capped_buckets"))
