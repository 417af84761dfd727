"""Suffix-array confirm pass (north_star: "a suffix-array substring pass
confirms exact caption overlaps").

For each LSH candidate pair we compute the longest common substring of the
two captions via a proper suffix array (prefix-doubling construction,
O(n log n)) + Kasai LCP, partition-locally in numpy over Arrow batches
(SURVEY.md §7 step 6). The LCS length and ratio (lcs / min(len)) confirm
*contiguous* exact overlap — stricter evidence than shingle Jaccard, which
is order-insensitive; a pair can share 80% of shingles yet have no long
common run (e.g. token shuffles).

Usage in the pipeline: an optional verify stage after (or instead of)
exact-Jaccard; exposed as confirm_pairs_substring().
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import IntegerType


def suffix_array(s: np.ndarray) -> np.ndarray:
    """Suffix array of an int array (prefix doubling, O(n log^2 n) with
    numpy lexsort — columnar-friendly)."""
    n = len(s)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    rank = np.array(s, dtype=np.int64, copy=True)  # never alias caller's s
    sa = np.argsort(rank, kind="stable")
    tmp = np.empty(n, dtype=np.int64)
    k = 1
    while k < n:
        key2 = np.full(n, -1, dtype=np.int64)
        key2[: n - k] = rank[k:]
        order = np.lexsort((key2, rank))
        sa = order
        # recompute ranks: same (rank, key2) pair -> same new rank
        prev = sa[:-1]
        cur = sa[1:]
        diff = (rank[cur] != rank[prev]) | (key2[cur] != key2[prev])
        tmp[sa[0]] = 0
        tmp[cur] = np.cumsum(diff)
        rank, tmp = tmp.copy(), rank
        if rank[sa[-1]] == n - 1:
            break
        k <<= 1
    return sa


def lcp_kasai(s: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """LCP array (lcp[i] = common prefix of sa[i] and sa[i-1]), Kasai."""
    n = len(s)
    lcp = np.zeros(n, dtype=np.int64)
    rank = np.empty(n, dtype=np.int64)
    rank[sa] = np.arange(n)
    h = 0
    for i in range(n):
        if rank[i] > 0:
            j = sa[rank[i] - 1]
            while i + h < n and j + h < n and s[i + h] == s[j + h]:
                h += 1
            lcp[rank[i]] = h
            if h:
                h -= 1
        else:
            h = 0
    return lcp


def longest_common_substring(a: bytes, b: bytes) -> int:
    """LCS length via suffix array over a + SEP + b."""
    if not a or not b:
        return 0
    # separator value 256 is outside the byte range, so no common run can
    # cross the a/b boundary
    s = np.concatenate([np.frombuffer(a, np.uint8).astype(np.int64),
                        np.array([256], dtype=np.int64),
                        np.frombuffer(b, np.uint8).astype(np.int64)])
    sa = suffix_array(s)
    lcp = lcp_kasai(s, sa)
    na = len(a)
    from_a = sa < na  # suffix starts in a (separator belongs to neither)
    from_b = sa > na
    # max lcp over adjacent suffix pairs from different strings
    adj = (from_a[1:] & from_b[:-1]) | (from_b[1:] & from_a[:-1])
    if not adj.any():
        return 0
    # cap by distance to separator so the run can't cross it
    best = 0
    idx = np.flatnonzero(adj) + 1
    for i in idx:
        cap = min(lcp[i],
                  (na - sa[i]) if sa[i] < na else (na - sa[i - 1]))
        best = max(best, int(cap))
    return best


def lcs_udf():
    """pandas UDF: (text_a, text_b) -> LCS length in bytes."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(IntegerType())
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series([
            longest_common_substring((x or "").encode(), (y or "").encode())
            for x, y in zip(a, b)], dtype="int32")

    return _udf


def confirm_pairs_substring(pairs: DataFrame, texts: DataFrame,
                            id_col: str, text_col: str,
                            min_ratio: float = 0.5) -> DataFrame:
    """Confirm candidate pairs by exact contiguous overlap:
    keep pairs with lcs / min(byte_len) >= min_ratio.
    pairs: DataFrame[id_a, id_b]; texts: DataFrame[id_col, text_col]."""
    t = texts.select(F.col(id_col), F.lower(F.col(text_col)).alias("__t"))
    lcs = lcs_udf()
    joined = (pairs
              .join(t.withColumnRenamed(id_col, "id_a")
                    .withColumnRenamed("__t", "__ta"), "id_a")
              .join(t.withColumnRenamed(id_col, "id_b")
                    .withColumnRenamed("__t", "__tb"), "id_b"))
    return (joined
            .withColumn("lcs_len", lcs("__ta", "__tb"))
            .withColumn("lcs_ratio",
                        F.col("lcs_len")
                        / F.greatest(F.least(F.length("__ta"),
                                             F.length("__tb")), F.lit(1)))
            .where(F.col("lcs_ratio") >= min_ratio)
            .select("id_a", "id_b", "lcs_len", "lcs_ratio"))
