"""Visual / fingerprint-space near-dup operators.

SimHash pair detection via pigeonhole Hamming bands: fingerprints within
``max_hamming`` bit flips agree exactly on at least one of
(max_hamming + 1) bands (sketches/simhash.py:hamming_bands), so the
candidate join is an equality self-join on (band_idx, band_value) — the
same shuffle shape as the MinHash LSH join — followed by an exact popcount
verify. Recall is exactly 1.0 by the pigeonhole argument; no probabilistic
misses.

The image pipeline feeds phash-derived fingerprints through this; the text
pipeline can feed caption SimHashes (q_simhash_near_docs).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import IntegerType


def _hamming_udf():
    from pyspark.sql.functions import pandas_udf
    from datasketches_rust_spark.sketches.util import popcount64

    @pandas_udf(IntegerType())
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        xa = a.to_numpy(dtype=np.int64).view(np.uint64)
        xb = b.to_numpy(dtype=np.int64).view(np.uint64)
        return pd.Series(popcount64(xa ^ xb).astype(np.int32))

    return _udf


def simhash_bands(df: DataFrame, id_col: str, fp_col: str,
                  num_bands: int) -> DataFrame:
    """Explode a 64-bit fingerprint into (band_idx, band_key) rows —
    JVM-side bit slicing (shiftright + mask), no Python."""
    width = 64 // num_bands
    mask = (1 << width) - 1
    bands = F.array(*[
        F.shiftrightunsigned(F.col(fp_col), i * width).bitwiseAND(mask)
        for i in range(num_bands)])
    return (df.select(F.col(id_col).alias("__id"), F.col(fp_col),
                      F.posexplode(bands).alias("band_idx", "band_key")))


def simhash_pairs(df: DataFrame, id_col: str, fp_col: str,
                  max_hamming: int = 3) -> DataFrame:
    """DataFrame[id_a, id_b, hamming] — all pairs within max_hamming bits.
    Exact recall via pigeonhole banding (num_bands = max_hamming + 1 must
    divide 64)."""
    num_bands = max_hamming + 1
    if 64 % num_bands:
        # round up to the next divisor of 64 — recall stays 1.0, a few
        # more candidates get verified
        num_bands = next(b for b in (4, 8, 16, 32, 64)
                         if b >= num_bands)
    ex = simhash_bands(df, id_col, fp_col, num_bands)
    a = ex.alias("a")
    b = ex.alias("b")
    ham = _hamming_udf()
    return (a.join(b, ["band_idx", "band_key"])
            .where(F.col("a.__id") < F.col("b.__id"))
            .select(F.col("a.__id").alias("id_a"),
                    F.col("b.__id").alias("id_b"),
                    F.col(f"a.{fp_col}").alias("__fa"),
                    F.col(f"b.{fp_col}").alias("__fb"))
            .distinct()
            .withColumn("hamming", ham("__fa", "__fb"))
            .where(F.col("hamming") <= max_hamming)
            .select("id_a", "id_b", "hamming"))
