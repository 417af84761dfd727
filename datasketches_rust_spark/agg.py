"""The UDAF layer: sketch kernels as distributed Spark aggregates.

The reference's lifecycle — build(config) -> update(v)* -> serialize ->
merge* -> estimate (SURVEY.md §1) — is isomorphic to Spark's partial/final
aggregation, and merge legality rests on the same property the reference
exploits: register-max / bitwise-OR / counter-add / k-smallest-union are
commutative + associative (hll/union.rs:449, bloom/sketch.rs:174,
countmin/sketch.rs:246).

Execution shape (scale rationale):
  1. PARTIAL — ``mapInPandas`` over the scan: each Arrow batch is reduced
     to one serialized sketch per group key **before any shuffle** (map-side
     combine). What travels through the exchange is O(#groups x #partitions)
     sketch blobs, never raw rows — the same serialize/move/deserialize seam
     the reference acknowledges as its only process boundary
     (SURVEY.md §3.2 step 1).
  2. (optional) SALTED INTERMEDIATE — for low-cardinality keys at very high
     partition counts, a two-level groupBy((key, salt)) -> groupBy(key)
     treeReduce keeps any single reducer from absorbing all partials.
  3. FINAL — ``applyInPandas`` per key: deserialize + fold merge + emit
     either the serialized union (for further merging / checkpointing) or
     the finished estimate.

All sketch configs are fixed at plan time and closed over by the UDFs, so
every executor builds byte-compatible states (seed-hash checked at merge,
as theta/intersection.rs:81-87 demands).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (BinaryType, DoubleType, LongType, StructField,
                               StructType)

from datasketches_rust_spark.hashing import (DEFAULT_SEED, encode_values,
                                             hash_bytes_list,
                                             murmur128_bytes_list)
from datasketches_rust_spark.sketches.bloom import BloomFilter
from datasketches_rust_spark.sketches.countmin import CountMinSketch
from datasketches_rust_spark.sketches.cpc import CpcSketch
from datasketches_rust_spark.sketches.frequencies import FrequentItemsSketch
from datasketches_rust_spark.sketches.hll import HllSketch, coupons_from_keys
from datasketches_rust_spark.sketches.minhash import merge as mh_merge
from datasketches_rust_spark.sketches.tdigest import TDigest
from datasketches_rust_spark.sketches.theta import ThetaSketch
from datasketches_rust_spark.sketches.util import clz64

SKETCH_COL = "sketch"


# ---------------------------------------------------------------------------
# per-kind (build, update_series, merge, deserialize) drivers
# ---------------------------------------------------------------------------

class _Kind:
    def __init__(self, build: Callable, update: Callable,
                 deserialize: Callable):
        self.build = build
        self.update = update
        self.deserialize = deserialize


def _theta_update(sk: ThetaSketch, values: pd.Series) -> None:
    vals = values.dropna()
    if len(vals):
        sk.update_hashes(hash_bytes_list(encode_values(vals), sk.seed))


def _cpc_update(sk: CpcSketch, values: pd.Series) -> None:
    vals = values.dropna()
    if len(vals):
        h1, h2 = murmur128_bytes_list(encode_values(vals), sk.seed)
        sk.update_hashes(h1, h2)


def _hll_update(sk: HllSketch, values: pd.Series) -> None:
    vals = values.dropna()
    if not len(vals):
        return
    h1, h2 = murmur128_bytes_list(encode_values(vals), sk.seed)
    slots = (h1 & np.uint64(sk.k - 1)).astype(np.int64)
    v = np.minimum(clz64(h2), 62).astype(np.uint8) + np.uint8(1)
    sk.update_coupons(slots, v)


def _bloom_update(sk: BloomFilter, values: pd.Series) -> None:
    vals = values.dropna()
    if not len(vals):
        return
    from datasketches_rust_spark.hashing import _grouped_by_length
    for grp, mat in _grouped_by_length(encode_values(vals)):
        sk.insert_keys(mat)


def _countmin_update(sk: CountMinSketch, values: pd.Series) -> None:
    vals = values.dropna()
    if len(vals):
        # raw byte items, NOT a pre-hash: the sketch hashes them with its
        # per-row murmur seeds, so the state is bit-identical to a
        # reference sketch updated with the same items
        sk.update_keys(encode_values(vals))


def _freq_update(sk: FrequentItemsSketch, values: pd.Series) -> None:
    counts = values.dropna().value_counts()  # batch pre-reduction
    if len(counts):
        sk.update_counts(list(counts.index), counts.to_numpy())


def _tdigest_update(sk: TDigest, values: pd.Series) -> None:
    sk.update_values(values.dropna().to_numpy(dtype=np.float64))


def sketch_kind(kind: str, **kw) -> _Kind:
    seed = kw.pop("seed", DEFAULT_SEED)
    if kind == "theta":
        lg_k = kw.pop("lg_k", 12)
        return _Kind(lambda: ThetaSketch(lg_k=lg_k, seed=seed),
                     _theta_update,
                     lambda b: ThetaSketch.deserialize(b, seed))
    if kind == "hll":
        lg_k = kw.pop("lg_k", 12)
        return _Kind(lambda: HllSketch(lg_k=lg_k, seed=seed),
                     _hll_update,
                     lambda b: HllSketch.deserialize(b, seed))
    if kind == "cpc":
        lg_k = kw.pop("lg_k", 11)
        return _Kind(lambda: CpcSketch(lg_k=lg_k, seed=seed),
                     _cpc_update,
                     lambda b: CpcSketch.deserialize(b, seed))
    if kind == "bloom":
        num_bits = kw.pop("num_bits")
        num_hashes = kw.pop("num_hashes")
        return _Kind(lambda: BloomFilter(num_bits, num_hashes, seed),
                     _bloom_update,
                     lambda b: BloomFilter.deserialize(b, seed))
    if kind == "countmin":
        nh, nb = kw.pop("num_hashes"), kw.pop("num_buckets")
        return _Kind(lambda: CountMinSketch(nh, nb, seed),
                     _countmin_update,
                     lambda b: CountMinSketch.deserialize(b, seed))
    if kind == "freqitems":
        m = kw.pop("max_map_size", 256)
        return _Kind(lambda: FrequentItemsSketch(m),
                     _freq_update,
                     FrequentItemsSketch.deserialize)
    if kind == "tdigest":
        k = kw.pop("k", 200)
        return _Kind(lambda: TDigest(k=k),
                     _tdigest_update,
                     TDigest.deserialize)
    raise ValueError(f"unknown sketch kind {kind!r}")


def _merge_two(kind_name: str, a, b):
    if kind_name in ("theta", "hll", "bloom", "cpc"):
        return a.union(b)
    return a.merge(b)


# ---------------------------------------------------------------------------
# distributed aggregation
# ---------------------------------------------------------------------------

def sketch_agg(df: DataFrame, key_cols: list[str], value_col: str,
               kind: str, salt_buckets: int = 0, **sketch_kw) -> DataFrame:
    """GroupBy-aggregate ``value_col`` into one sketch per key.

    Returns DataFrame[key_cols..., sketch: binary]. ``key_cols`` may be
    empty for a global aggregate. ``salt_buckets`` > 0 inserts the
    treeReduce intermediate level.
    """
    knd = sketch_kind(kind, **dict(sketch_kw))
    kind_name = kind

    from datasketches_rust_spark.pipeline import ensure_parallelism
    keyed = ensure_parallelism(
        df.select(*key_cols, F.col(value_col).alias("__v")))
    key_fields = [keyed.schema[c] for c in key_cols]
    partial_schema = StructType(
        list(key_fields) + [StructField(SKETCH_COL, BinaryType(), False)])

    const_key = not key_cols

    def partial_iter(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            if const_key:
                sk = knd.build()
                knd.update(sk, pdf["__v"])
                yield pd.DataFrame({SKETCH_COL: [sk.serialize()]})
                continue
            rows = []
            for key, sub in pdf.groupby(key_cols, dropna=False, sort=False):
                if not isinstance(key, tuple):
                    key = (key,)
                sk = knd.build()
                knd.update(sk, sub["__v"])
                rows.append((*key, sk.serialize()))
            yield pd.DataFrame(rows, columns=[*key_cols, SKETCH_COL])

    partials = keyed.mapInPandas(partial_iter, schema=partial_schema)
    return merge_sketch_col(partials, key_cols, kind,
                            salt_buckets=salt_buckets, **sketch_kw)


def merge_sketch_col(df: DataFrame, key_cols: list[str], kind: str,
                     sketch_col: str = SKETCH_COL, salt_buckets: int = 0,
                     **sketch_kw) -> DataFrame:
    """Merge a binary sketch column down to one sketch per key."""
    knd = sketch_kind(kind, **dict(sketch_kw))
    kind_name = kind

    out_fields = ([df.schema[c] for c in key_cols]
                  + [StructField(sketch_col, BinaryType(), False)])
    out_schema = StructType(out_fields)

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = None
        for blob in pdf[sketch_col]:
            sk = knd.deserialize(bytes(blob))
            acc = sk if acc is None else _merge_two(kind_name, acc, sk)
        head = pdf.iloc[[0]][key_cols].reset_index(drop=True)
        head[sketch_col] = [acc.serialize()]
        return head

    if not key_cols:
        # global: constant key; optionally tree-reduce through a salt level
        work = df.withColumn("__k", F.lit(0))
        if salt_buckets > 1:
            salted = work.withColumn(
                "__salt", F.spark_partition_id() % salt_buckets)
            lvl1_schema = StructType(
                [StructField("__k", LongType(), False),
                 StructField("__salt", LongType(), False),
                 StructField(sketch_col, BinaryType(), False)])

            def merge_salted(pdf: pd.DataFrame) -> pd.DataFrame:
                acc = None
                for blob in pdf[sketch_col]:
                    sk = knd.deserialize(bytes(blob))
                    acc = sk if acc is None else _merge_two(kind_name, acc, sk)
                return pd.DataFrame({"__k": [0], "__salt": [pdf["__salt"].iloc[0]],
                                     sketch_col: [acc.serialize()]})

            work = salted.groupBy("__k", "__salt").applyInPandas(
                merge_salted, lvl1_schema).drop("__salt")
        final_schema = StructType(
            [StructField("__k", LongType(), False),
             StructField(sketch_col, BinaryType(), False)])

        def merge_global(pdf: pd.DataFrame) -> pd.DataFrame:
            acc = None
            for blob in pdf[sketch_col]:
                sk = knd.deserialize(bytes(blob))
                acc = sk if acc is None else _merge_two(kind_name, acc, sk)
            return pd.DataFrame({"__k": [0], sketch_col: [acc.serialize()]})

        return work.groupBy("__k").applyInPandas(
            merge_global, final_schema).drop("__k")

    return df.groupBy(*key_cols).applyInPandas(merge_group, out_schema)


# ---------------------------------------------------------------------------
# finishers (sketch bytes -> scalars), as vectorized pandas UDFs
# ---------------------------------------------------------------------------

def estimate_udf(kind: str, as_long: bool = False, **sketch_kw):
    """pandas UDF: sketch bytes -> cardinality estimate.

    ``as_long=True`` rounds to bigint — used for exact-mode parity queries
    (theta is exact until >k retained, tests/theta_sketch_test.rs:24-36,
    so at k > NDV the rounded estimate equals COUNT(DISTINCT))."""
    from pyspark.sql.functions import pandas_udf
    knd = sketch_kind(kind, **dict(sketch_kw))

    ret = LongType() if as_long else DoubleType()

    @pandas_udf(ret)
    def _udf(blobs: pd.Series) -> pd.Series:
        ests = [knd.deserialize(bytes(b)).estimate() for b in blobs]
        if as_long:
            return pd.Series([int(round(e)) for e in ests], dtype="int64")
        return pd.Series(ests, dtype="float64")

    return _udf


def theta_set_op_udf(op: str, seed: int = DEFAULT_SEED, as_long: bool = False):
    """pandas UDF: (sketch_a, sketch_b) -> estimate of union/intersection/
    a_not_b (theta/intersection.rs:64-196 semantics; a_not_b per the
    sibling DataSketches AnotB operator)."""
    from pyspark.sql.functions import pandas_udf

    ret = LongType() if as_long else DoubleType()

    @pandas_udf(ret)
    def _udf(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for ba, bb in zip(a, b):
            sa = ThetaSketch.deserialize(bytes(ba), seed)
            sb = ThetaSketch.deserialize(bytes(bb), seed)
            res = getattr(sa, "union" if op == "union" else
                          "intersect" if op == "intersect" else "a_not_b")(sb)
            e = res.estimate()
            out.append(int(round(e)) if as_long else e)
        return pd.Series(out, dtype="int64" if as_long else "float64")

    return _udf


def countmin_estimate_udf(seed: int = DEFAULT_SEED):
    """pandas UDF: (item, sketch) -> frequency estimate (long)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(LongType())
    def _udf(items: pd.Series, blobs: pd.Series) -> pd.Series:
        out = np.empty(len(items), dtype=np.int64)
        cache: dict[bytes, CountMinSketch] = {}
        for i, (item, blob) in enumerate(zip(items, blobs)):
            blob = bytes(blob)
            cm = cache.get(blob)
            if cm is None:
                cm = cache[blob] = CountMinSketch.deserialize(blob, seed)
            out[i] = int(cm.estimate_keys(encode_values([item]))[0])
        return pd.Series(out)

    return _udf


def bloom_contains_udf(seed: int = DEFAULT_SEED):
    """pandas UDF: (item, sketch) -> bool membership probe (no false
    negatives, bloom/sketch.rs:71-78). Typical use: broadcast one bloom
    blob as a literal column and pre-filter a huge fact table before an
    exact semi-join kills the false positives."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BooleanType
    from datasketches_rust_spark.hashing import _grouped_by_length

    @pandas_udf(BooleanType())
    def _udf(items: pd.Series, blobs: pd.Series) -> pd.Series:
        out = np.zeros(len(items), dtype=bool)
        encoded = encode_values(items)
        # group rows by blob via dict identity (each distinct blob is
        # hashed once by the dict, not memcmp'd per row); every group is
        # then probed with ONE deserialize + vectorized contains_keys —
        # the broadcast-literal case degenerates to a single group
        groups: dict[bytes, list[int]] = {}
        for i, b in enumerate(blobs):
            groups.setdefault(bytes(b), []).append(i)
        for blob, idxs in groups.items():
            bf = BloomFilter.deserialize(blob, seed)
            idx = np.asarray(idxs)
            sub = [encoded[i] for i in idxs]
            for grp, mat in _grouped_by_length(sub):
                out[idx[grp]] = bf.contains_keys(mat)
        return pd.Series(out)

    return _udf


def tdigest_quantile_udf(quantile: float, k: int = 200):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(DoubleType())
    def _udf(blobs: pd.Series) -> pd.Series:
        return pd.Series([TDigest.deserialize(bytes(b)).quantile(quantile)
                          for b in blobs])

    return _udf


def tdigest_stats_udf():
    """pandas UDF: tdigest bytes -> struct(min, max, total_weight) — these
    three are exact (tdigest tracks true min/max/weight), hence
    oracle-checkable against SQL MIN/MAX/COUNT."""
    from pyspark.sql.functions import pandas_udf
    schema = StructType([StructField("min_val", DoubleType()),
                         StructField("max_val", DoubleType()),
                         StructField("total_w", LongType())])

    @pandas_udf(schema)
    def _udf(blobs: pd.Series) -> pd.DataFrame:
        rows = []
        for b in blobs:
            td = TDigest.deserialize(bytes(b))
            rows.append((td.min_val, td.max_val, int(td.total_weight())))
        return pd.DataFrame(rows, columns=["min_val", "max_val", "total_w"])

    return _udf


def freq_topk_explode(df: DataFrame, key_cols: list[str], k: int,
                      sketch_col: str = SKETCH_COL,
                      max_map_size: int = 256) -> DataFrame:
    """Explode a frequent-items sketch column into top-k rows per key:
    DataFrame[key..., item string, est long, lb long, ub long]."""
    from pyspark.sql.types import StringType
    fields = [df.schema[c] for c in key_cols] if key_cols else []
    schema = StructType(fields + [
        StructField("item", StringType()), StructField("est", LongType()),
        StructField("lb", LongType()), StructField("ub", LongType())])

    def explode_group(pdf: pd.DataFrame):
        out = []
        for _, row in pdf.iterrows():
            fs = FrequentItemsSketch.deserialize(bytes(row[sketch_col]))
            for item, est, lb, ub in fs.frequent_items()[:k]:
                out.append((*[row[c] for c in key_cols], str(item),
                            int(est), int(lb), int(ub)))
        return pd.DataFrame(out, columns=[*key_cols, "item", "est", "lb", "ub"])

    if key_cols:
        return df.groupBy(*key_cols).applyInPandas(explode_group, schema)
    # global: the merged sketch column has exactly one row; mapInPandas
    # explodes it without another shuffle
    return df.mapInPandas(lambda it: (explode_group(pdf) for pdf in it
                                      if not pdf.empty), schema)


def register_sql_udfs(spark, lg_k: int = 16, seed: int = DEFAULT_SEED,
                      tdigest_k: int = 200, freq_max_map_size: int = 256,
                      countmin_hashes: int = 5, countmin_buckets: int = 1024,
                      bloom_bits: int = 1 << 16,
                      bloom_hashes: int = 7) -> None:
    """Expose the sketch surface to plain ``spark.sql()`` users:

    - ``theta/hll/cpc/tdigest/freq/countmin/bloom_sketch_agg`` —
      grouped-agg pandas UDAFs (values -> serialized sketch bytes),
      usable directly in SQL ``GROUP BY``. Convenience surface ONLY: a
      grouped-agg UDAF materializes each group on one worker with no
      partial aggregation, so the SCALE path for 10^12-row tables
      remains ``sketch_agg``'s map-side-combine partials + salted
      treeReduce. For bounded-group dashboards and ad-hoc SQL this is
      the ergonomic form.
    - ``theta_estimate / hll_estimate / cpc_estimate`` (bytes -> double)
      and ``theta_estimate_long`` (rounded bigint for exact-mode parity)
      — the sketch config travels inside the serialized blob, so the
      estimators need no parameters.
    - blob consumers for the value families: ``tdigest_quantile(blob,
      rank) -> double``, ``freq_estimate(blob, item) -> bigint``,
      ``countmin_estimate(blob, item) -> bigint``, ``bloom_contains(
      blob, item) -> boolean``. Each Arrow batch deserializes a blob
      once (cached per distinct blob within the batch) — the common
      shape is one merged sketch probed by many items.

    Idempotent: re-registration overwrites (Spark keeps the latest).
    """
    from pyspark.sql.functions import PandasUDFType, pandas_udf
    from pyspark.sql.types import BinaryType, BooleanType

    def _builder(kd):
        @pandas_udf(BinaryType(), PandasUDFType.GROUPED_AGG)
        def _agg(v: pd.Series) -> bytes:
            sk = kd.build()
            kd.update(sk, v)
            return bytes(sk.serialize())

        return _agg

    for kind in ("theta", "hll", "cpc"):
        spark.udf.register(f"{kind}_sketch_agg",
                           _builder(sketch_kind(kind, lg_k=lg_k, seed=seed)))
        spark.udf.register(f"{kind}_estimate",
                           estimate_udf(kind, seed=seed))
    spark.udf.register("theta_estimate_long",
                       estimate_udf("theta", as_long=True, seed=seed))

    value_kinds = {
        "tdigest": sketch_kind("tdigest", k=tdigest_k),
        "freq": sketch_kind("freqitems", max_map_size=freq_max_map_size),
        "countmin": sketch_kind("countmin", num_hashes=countmin_hashes,
                                num_buckets=countmin_buckets, seed=seed),
        "bloom": sketch_kind("bloom", num_bits=bloom_bits,
                             num_hashes=bloom_hashes, seed=seed),
    }
    for name, kd in value_kinds.items():
        spark.udf.register(f"{name}_sketch_agg", _builder(kd))

    def _blob_cache(deser):
        cache: dict[bytes, object] = {}

        def get(b):
            key = bytes(b)
            sk = cache.get(key)
            if sk is None:
                sk = cache[key] = deser(key)
            return sk

        return get

    # NULL semantics match Spark builtins: NULL in -> NULL out. A NULL
    # item must be checked BEFORE encoding — encode_values maps None to
    # b'', which is also the empty string's encoding, so skipping the
    # check would silently return the '' item's value. Nullable results
    # travel as pandas extension dtypes (Float64/Int64/boolean).

    @pandas_udf(DoubleType())
    def _tdigest_quantile(blobs: pd.Series, ranks: pd.Series) -> pd.Series:
        get = _blob_cache(value_kinds["tdigest"].deserialize)
        return pd.Series(
            [None if b is None or pd.isna(q) else get(b).quantile(float(q))
             for b, q in zip(blobs, ranks)], dtype="Float64")

    @pandas_udf(LongType())
    def _freq_estimate(blobs: pd.Series, items: pd.Series) -> pd.Series:
        get = _blob_cache(value_kinds["freq"].deserialize)
        return pd.Series(
            [None if b is None or pd.isna(i) else int(get(b).estimate(i))
             for b, i in zip(blobs, items)], dtype="Int64")

    def _probe_by_blob(blobs, items, probe, out):
        """Group row indices by blob, vectorize the probe per blob;
        NULL blob/item rows stay None in ``out``."""
        keys = encode_values(items)
        by_blob: dict[bytes, list[int]] = {}
        for i, b in enumerate(blobs):
            # pd.isna, not `is None`: a NULL numeric item arrives as NaN
            # through Arrow, a NULL string as None
            if b is not None and not pd.isna(items.iloc[i]):
                by_blob.setdefault(bytes(b), []).append(i)
        for key, idxs in by_blob.items():
            vals = probe(key, [keys[i] for i in idxs])
            for j, i in enumerate(idxs):
                out[i] = vals[j]
        return out

    @pandas_udf(LongType())
    def _countmin_estimate(blobs: pd.Series, items: pd.Series) -> pd.Series:
        get = _blob_cache(value_kinds["countmin"].deserialize)
        out = _probe_by_blob(
            blobs, items,
            lambda key, ks: [int(v) for v in get(key).estimate_keys(ks)],
            [None] * len(blobs))
        return pd.Series(out, dtype="Int64")

    @pandas_udf(BooleanType())
    def _bloom_contains(blobs: pd.Series, items: pd.Series) -> pd.Series:
        from datasketches_rust_spark.hashing import _grouped_by_length

        get = _blob_cache(value_kinds["bloom"].deserialize)

        def probe(key, ks):
            sk = get(key)
            vals = [None] * len(ks)
            for grp, mat in _grouped_by_length(ks):
                hits = sk.contains_keys(mat)
                for j, g in enumerate(grp):
                    vals[int(g)] = bool(hits[j])
            return vals

        out = _probe_by_blob(blobs, items, probe, [None] * len(blobs))
        return pd.Series(out, dtype="boolean")

    spark.udf.register("tdigest_quantile", _tdigest_quantile)
    spark.udf.register("freq_estimate", _freq_estimate)
    spark.udf.register("countmin_estimate", _countmin_estimate)
    spark.udf.register("bloom_contains", _bloom_contains)
