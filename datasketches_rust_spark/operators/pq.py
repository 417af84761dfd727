"""Product quantization (PQ) ANN — the memory-bounded scale path.

Extends the ANN ladder (brute -> hyperplane-LSH -> IVF in
operators/similarity.py) with the index shape that actually fits 10^9+
vectors in executor memory: each L2-normalized vector compresses to
``m`` one-byte codes (subspace KMeans codebooks, Jegou et al. 2011), a
16-64x cut vs the raw float vector (64-dim float64 = 512 B -> 16 B at
m=16). Search is the standard two-stage form:

1. **ADC shortlist**: per query, a (m x ksub) lookup table of
   query-subvector * codebook inner products scores every candidate with
   m table lookups — no float vector is touched — and keeps the top
   ``shortlist`` ids.
2. **Exact re-rank**: the shortlist (ids only) re-joins the raw vectors
   once and exact cosine picks the final top-k (the FAISS
   IVFPQ+refine recipe).

Scale shape: candidates come from the same IVF cell equi-join as
ann_ivf_topk (ids only); the codes join moves (id, 16 small ints) rows;
the query vector joins ONCE per query onto the collected candidate list
(never duplicated per pair); the ADC scorer is one Arrow-batched pandas
UDF. i.i.d. Gaussian fixtures are PQ's worst case (no low intrinsic
dimension to exploit) — the committed recall gates are measured there,
so real embedding tables only do better.

Codebook training runs driver-side on a bounded sample (the FAISS
practice: codebooks need ~10^5 vectors regardless of corpus size); at
10^9 rows pass ``codebooks=`` trained once on a hash-sampled subset and
checkpointed, exactly like IVF's ``centroids=``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, IntegerType, LongType

from datasketches_rust_spark.operators.similarity import (
    _as_double, _exact_rerank_topk, _infer_dim, ivf_cells_udf,
    train_ivf_centroids)

PQ_M = 16
PQ_KSUB = 16
PQ_SHORTLIST = 64


def _lloyd(x: np.ndarray, k: int, seed: int, iters: int = 15) -> np.ndarray:
    """Seeded numpy Lloyd iterations (deterministic; empty clusters keep
    their previous centroid — same convention as the IVF tests)."""
    rng = np.random.default_rng(seed)
    cent = x[rng.choice(len(x), size=min(k, len(x)), replace=False)].copy()
    if len(cent) < k:  # degenerate tiny input: pad by repeating
        cent = np.vstack([cent] * (k // len(cent) + 1))[:k]
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None]) ** 2).sum(-1)
        a = d.argmin(1)
        for j in range(k):
            pts = x[a == j]
            if len(pts):
                cent[j] = pts.mean(0)
    return cent


def train_pq_codebooks(df: DataFrame, m: int = PQ_M, ksub: int = PQ_KSUB,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       seed: int = 9001, sample_n: int = 65536,
                       dim: int | None = None) -> np.ndarray:
    """(m, ksub, dim/m) float64 codebooks from a deterministic sample
    (first ``sample_n`` rows by id — convenience path; at 10^9 rows
    train once on a hash-sampled subset and pass the result around)."""
    if dim is None:
        dim = _infer_dim(df, vec_col)
    if dim % m:
        raise ValueError(f"m={m} must divide dim={dim}")
    rows = (df.select(F.col(id_col), _as_double(F.col(vec_col))
                      .alias("__v"))
            .orderBy(id_col).limit(sample_n).collect())
    x = np.array([r["__v"] for r in rows], dtype=np.float64)
    x /= np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    dsub = dim // m
    return np.stack([
        _lloyd(x[:, i * dsub:(i + 1) * dsub], ksub, seed + i)
        for i in range(m)])


def pq_codes_udf(codebooks: np.ndarray):
    """pandas UDF: embedding -> array<int> of m subspace code ids (the
    PQ index row). Vectors are L2-normalized before encoding so ADC
    lookup tables approximate COSINE, consistent with the rest of the
    ANN surface. One numpy pass per Arrow batch per subspace."""
    from pyspark.sql.functions import pandas_udf
    m, ksub, dsub = codebooks.shape

    @pandas_udf(ArrayType(IntegerType()))
    def _udf(vecs: pd.Series) -> pd.Series:
        mat = np.array(list(vecs), dtype=np.float64)
        mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True),
                          1e-12)
        codes = np.empty((len(mat), m), dtype=np.int32)
        for i in range(m):
            sub = mat[:, i * dsub:(i + 1) * dsub]
            d = ((sub[:, None, :] - codebooks[i][None]) ** 2).sum(-1)
            codes[:, i] = d.argmin(1)
        return pd.Series([row.tolist() for row in codes])

    return _udf


def _adc_shortlist_udf(codebooks: np.ndarray, shortlist: int):
    """pandas UDF: (query embedding, collected [(neighbor_id, codes)])
    -> top-``shortlist`` neighbor ids by ADC approximate inner product
    (ties broken by neighbor id for determinism)."""
    from pyspark.sql.functions import pandas_udf
    m, ksub, dsub = codebooks.shape

    @pandas_udf(ArrayType(LongType()))
    def _udf(vecs: pd.Series, cands: pd.Series) -> pd.Series:
        out = []
        for vec, cl in zip(vecs, cands):
            q = np.asarray(vec, dtype=np.float64)
            q /= max(np.linalg.norm(q), 1e-12)
            lut = np.stack([
                q[i * dsub:(i + 1) * dsub] @ codebooks[i].T
                for i in range(m)])                      # (m, ksub)
            ids = np.fromiter((c["neighbor_id"] for c in cl),
                              dtype=np.int64, count=len(cl))
            codes = np.array([c["codes"] for c in cl],
                             dtype=np.int64)             # (nc, m)
            scores = lut[np.arange(m)[None, :], codes].sum(1)
            order = np.lexsort((ids, -scores))[:shortlist]
            out.append(ids[order].tolist())
        return pd.Series(out)

    return _udf


def ann_ivfpq_topk(df: DataFrame, k: int, id_col: str = "vec_id",
                   vec_col: str = "embedding", nlist: int = 8,
                   nprobe: int = 6, m: int = PQ_M, ksub: int = PQ_KSUB,
                   shortlist: int = PQ_SHORTLIST, seed: int = 9001,
                   dim: int | None = None,
                   centroids: np.ndarray | None = None,
                   codebooks: np.ndarray | None = None) -> DataFrame:
    """IVF-PQ approximate top-k: IVF cell equi-join proposes candidates
    (ids only), ADC over the m-byte codes prunes each query's candidates
    to ``shortlist``, exact cosine re-ranks the shortlist. Returns
    DataFrame[query_id, neighbor_id, rank]."""
    if dim is None:
        dim = _infer_dim(df, vec_col)
    if centroids is None:
        centroids = train_ivf_centroids(df, nlist, vec_col, seed)
    if codebooks is None:
        codebooks = train_pq_codebooks(df, m, ksub, id_col, vec_col,
                                       seed, dim=dim)
    probe = ivf_cells_udf(centroids, nprobe)
    home = ivf_cells_udf(centroids, 1)
    enc = pq_codes_udf(codebooks)

    # the PQ index: one (id, cell, m-codes) row per vector — this is the
    # table that stays in memory at 10^9 rows; raw vectors stay on disk
    index = df.select(F.col(id_col).alias("neighbor_id"),
                      F.explode(home(F.col(vec_col))).alias("__cell"),
                      enc(F.col(vec_col)).alias("codes"))
    q = df.select(F.col(id_col).alias("query_id"),
                  F.explode(probe(F.col(vec_col))).alias("__cell"))
    cand = (q.join(index, "__cell")
            .where(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id", "codes"))
    grouped = (cand.groupBy("query_id")
               .agg(F.collect_list(F.struct("neighbor_id", "codes"))
                    .alias("__cands")))
    adc = _adc_shortlist_udf(codebooks, shortlist)
    short = (grouped
             .join(df.select(F.col(id_col).alias("query_id"),
                             F.col(vec_col).alias("__qv")), "query_id")
             .select("query_id",
                     F.explode(adc(F.col("__qv"), F.col("__cands")))
                     .alias("neighbor_id")))
    return _exact_rerank_topk(short, df, k, id_col, vec_col)
