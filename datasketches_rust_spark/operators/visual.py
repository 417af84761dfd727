"""Visual / fingerprint-space near-dup operators.

SimHash pair detection via pigeonhole Hamming bands: fingerprints within
``max_hamming`` bit flips agree exactly on at least one of
(max_hamming + 1) bands (sketches/simhash.py:hamming_bands), so the
candidate join is an equality self-join on the packed band key — the
same shuffle shape as the MinHash LSH join — followed by an exact popcount
verify. Recall is exactly 1.0 by the pigeonhole argument; no probabilistic
misses.

The image pipeline feeds phash-derived fingerprints through this; the text
pipeline can feed caption SimHashes (q_simhash_near_docs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def simhash_bands(df: DataFrame, id_col: str, fp_col: str,
                  num_bands: int) -> DataFrame:
    """Explode a 64-bit fingerprint into single-long band keys —
    JVM-side bit slicing (shiftright + mask), no Python. The band index
    is packed into the key's high bits ((idx << width) | slice, injective
    since slice < 2^width), so one long is the whole join key and band
    rows carry 16 bytes of payload through the self-join shuffle."""
    width = 64 // num_bands
    mask = (1 << width) - 1
    bands = F.array(*[
        F.shiftrightunsigned(F.col(fp_col), i * width).bitwiseAND(mask)
        + F.lit(i << width if num_bands > 1 else 0)
        for i in range(num_bands)])
    return (df.select(F.col(id_col).alias("__id"), F.col(fp_col),
                      F.explode(bands).alias("band_key")))


def simhash_pairs(df: DataFrame, id_col: str, fp_col: str,
                  max_hamming: int = 3,
                  max_bucket_size: int = 4096) -> DataFrame:
    """DataFrame[id_a, id_b, hamming] — all pairs within max_hamming bits.
    Exact recall via pigeonhole banding (num_bands = max_hamming + 1 must
    divide 64) for cold buckets.

    Hot buckets (> max_bucket_size members) degrade to a star topology
    around their min-id representative — the same guard as the text LSH
    (operators/lsh.py): at crawl scale, exact-duplicate images share an
    identical fingerprint, so EVERY band bucket is the whole cluster and
    the self-join would be O(cluster^2). The star keeps such a cluster
    connected with O(size) verified edges (identical fingerprints have
    hamming 0 to the representative, so the exact verify keeps them all);
    only pairwise recall between *distinct* fingerprints that co-bucket
    exclusively in hot bands degrades. Set max_bucket_size=0 to disable
    (restores unconditional exact pairwise recall)."""
    num_bands = max_hamming + 1
    if 64 % num_bands:
        # round up to the next divisor of 64 — recall stays 1.0, a few
        # more candidates get verified
        num_bands = next(b for b in (4, 8, 16, 32, 64)
                         if b >= num_bands)
    ex = simhash_bands(df, id_col, fp_col, num_bands)

    star = None
    if max_bucket_size > 0:
        # ONE aggregation computes bucket size, representative (min id), AND
        # the representative's fingerprint (min_by) — all map-side partial,
        # so the hot keys reduce before the tiny shuffle and the hot list
        # broadcasts once (no separate size-then-rep barrier)
        sizes = ex.groupBy("band_key").agg(
            F.count("*").alias("__n"), F.min("__id").alias("__rep"),
            F.min_by(F.col(fp_col), F.col("__id")).alias("__rep_fp"))
        hot = sizes.where(F.col("__n") > max_bucket_size) \
                   .select("band_key", "__rep", "__rep_fp")
        rep_first = F.col("__rep") < F.col("__id")
        star = (ex.join(F.broadcast(hot), ["band_key"])
                .where(F.col("__id") != F.col("__rep"))
                .select(F.least("__id", "__rep").alias("id_a"),
                        F.greatest("__id", "__rep").alias("id_b"),
                        F.when(rep_first, F.col("__rep_fp"))
                        .otherwise(F.col(fp_col)).alias("__fa"),
                        F.when(rep_first, F.col(fp_col))
                        .otherwise(F.col("__rep_fp")).alias("__fb")))
        ex = ex.join(F.broadcast(hot.select("band_key")),
                     ["band_key"], "left_anti")

    a = ex.alias("a")
    b = ex.alias("b")
    cand = (a.join(b, ["band_key"])
            .where(F.col("a.__id") < F.col("b.__id"))
            .select(F.col("a.__id").alias("id_a"),
                    F.col("b.__id").alias("id_b"),
                    F.col(f"a.{fp_col}").alias("__fa"),
                    F.col(f"b.{fp_col}").alias("__fb")))
    if star is not None:
        cand = cand.unionByName(star)
    # Hamming filter FIRST, distinct second: with w-bit band keys the band
    # self-join yields ~n^2/2^w birthday collisions (tens of millions at
    # 10^6 rows), so (a) the popcount must be JVM-side bit_count(xor) in
    # whole-stage codegen, not a Python UDF, and (b) the distinct shuffle
    # must run on the tiny post-filter survivor set, not the full
    # candidate stream. A pair colliding in several bands just evaluates
    # the cheap popcount that many times.
    ham = F.bit_count(F.col("__fa").bitwiseXOR(F.col("__fb")))
    return (cand
            .withColumn("hamming", ham)
            .where(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming")
            .distinct())
