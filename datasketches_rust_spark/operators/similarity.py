"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: the exactness baseline. Queries are the small
  side -> broadcast; candidates stream. All arithmetic is built-in
  higher-order functions (zip_with/aggregate) on double-cast arrays, fully
  JVM-side.
- LSH-bucketed ANN: random-hyperplane SimHash over the embedding (a numpy
  matmul per Arrow batch), banded like the text LSH so bucket self-joins
  find candidates; exact cosine re-rank inside buckets. The scale path:
  candidate generation is a shuffle on (band_idx, band_key), never a cross
  join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import ArrayType, LongType

from datasketches_rust_spark.hashing import murmur3_x64_128


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def with_norm(df: DataFrame, vec_col: str = "embedding",
              out: str = "__norm") -> DataFrame:
    v = _as_double(F.col(vec_col))
    return df.withColumn(out, F.sqrt(_dot(v, v)))


def cosine_topk_bruteforce(queries: DataFrame, candidates: DataFrame,
                           k: int, id_col: str = "vec_id",
                           vec_col: str = "embedding") -> DataFrame:
    """DataFrame[query_id, neighbor_id, rank] — exact cosine top-k.

    queries is broadcast (small side); ties broken by neighbor id so the
    result is deterministic.
    """
    q = with_norm(queries.select(F.col(id_col).alias("query_id"),
                                 F.col(vec_col).alias("__qv")),
                  "__qv", "__qn")
    c = with_norm(candidates.select(F.col(id_col).alias("neighbor_id"),
                                    F.col(vec_col).alias("__cv")),
                  "__cv", "__cn")
    sim = (_dot(_as_double(F.col("__qv")), _as_double(F.col("__cv")))
           / (F.col("__qn") * F.col("__cn")))
    joined = F.broadcast(q).crossJoin(c).withColumn("__sim", sim)
    w = Window.partitionBy("query_id").orderBy(F.desc("__sim"),
                                               F.col("neighbor_id"))
    return (joined.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank"))


def cosine_pairs_bruteforce(df: DataFrame, threshold: float,
                            id_col: str = "vec_id",
                            vec_col: str = "embedding") -> DataFrame:
    """DataFrame[id_a, id_b] — all pairs with cosine >= threshold.
    O(n^2): the correctness baseline; use lsh variants at scale."""
    a = with_norm(df.select(F.col(id_col).alias("id_a"),
                            F.col(vec_col).alias("__va")), "__va", "__na")
    b = with_norm(df.select(F.col(id_col).alias("id_b"),
                            F.col(vec_col).alias("__vb")), "__vb", "__nb")
    sim = (_dot(_as_double(F.col("__va")), _as_double(F.col("__vb")))
           / (F.col("__na") * F.col("__nb")))
    return (a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
            .withColumn("__sim", sim)
            .where(F.col("__sim") >= threshold)
            .select("id_a", "id_b"))


# ---------------------------------------------------------------------------
# random-hyperplane LSH (angular SimHash on embeddings)
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, nbits: int, seed: int) -> np.ndarray:
    h1, h2 = murmur3_x64_128(b"hyperplane-lsh", seed)
    rng = np.random.default_rng(np.uint64(h1 ^ h2))
    return rng.standard_normal((dim, nbits))


def hyperplane_bands_udf(dim: int, nbits: int, num_bands: int, seed: int):
    """pandas UDF: embedding -> array<long> of band keys. nbits sign bits
    from a seeded Gaussian projection (one numpy matmul per Arrow batch),
    split into num_bands keys; vectors within a small angle share all bits
    w.h.p., so they collide on every band."""
    from pyspark.sql.functions import pandas_udf
    if nbits % num_bands:
        raise ValueError("num_bands must divide nbits")
    width = nbits // num_bands

    @pandas_udf(ArrayType(LongType()))
    def _udf(vecs: pd.Series) -> pd.Series:
        planes = _hyperplanes(dim, nbits, seed)
        mat = np.array(list(vecs), dtype=np.float64)  # (batch, dim)
        bits = (mat @ planes >= 0)  # (batch, nbits)
        weights = (np.uint64(1) << np.arange(width, dtype=np.uint64))
        out = []
        for row in bits:
            keys = [int((row[b * width:(b + 1) * width]
                         .astype(np.uint64) * weights).sum()) + (b << 40)
                    for b in range(num_bands)]
            out.append(keys)
        return pd.Series(out)

    return _udf


def ann_lsh_topk(df: DataFrame, k: int, id_col: str = "vec_id",
                 vec_col: str = "embedding", nbits: int = 32,
                 num_bands: int = 4, seed: int = 9001) -> DataFrame:
    """Approximate top-k neighbors per vector via hyperplane-LSH buckets +
    exact cosine re-rank. Returns DataFrame[query_id, neighbor_id, rank]."""
    dim = len(df.select(vec_col).first()[0])
    bands = hyperplane_bands_udf(dim, nbits, num_bands, seed)
    keyed = df.select(F.col(id_col), F.col(vec_col),
                      F.explode(bands(F.col(vec_col))).alias("band_key"))
    a = keyed.select(F.col(id_col).alias("query_id"),
                     F.col(vec_col).alias("__qv"), "band_key")
    b = keyed.select(F.col(id_col).alias("neighbor_id"),
                     F.col(vec_col).alias("__cv"), "band_key")
    cands = (a.join(b, "band_key")
             .where(F.col("query_id") != F.col("neighbor_id"))
             .select("query_id", "__qv", "neighbor_id", "__cv")
             .distinct())
    qn = F.sqrt(_dot(_as_double(F.col("__qv")), _as_double(F.col("__qv"))))
    cn = F.sqrt(_dot(_as_double(F.col("__cv")), _as_double(F.col("__cv"))))
    sim = (_dot(_as_double(F.col("__qv")), _as_double(F.col("__cv")))
           / (qn * cn))
    w = Window.partitionBy("query_id").orderBy(F.desc("__sim"),
                                               F.col("neighbor_id"))
    return (cands.withColumn("__sim", sim)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "rank"))
