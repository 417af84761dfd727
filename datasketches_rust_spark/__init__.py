"""datasketches_rust_spark — a PySpark-native near-duplicate detection and
clustering engine built on the sketch algebra of Apache datasketches-rust.

Not a port: the reference (/root/reference, datasketches crate v0.3.0) is a
single-process Rust library of mergeable probabilistic sketches. This package
re-expresses that algebra Spark-first:

- sketch update/merge/estimate  -> vectorized numpy kernels wrapped in
  Arrow-batched pandas UDF aggregates (``agg.py``) following Spark's
  partial/final aggregation model (the reference's build/update/serialize/
  merge/estimate lifecycle, SURVEY.md §3).
- MinHash/KMV (theta ancestry) + LSH band hashing + SimHash + connected
  components -> the dedup pipeline (``pipeline.py``, ``operators/``).
- hashing contract: MurmurHash3-x64-128, seed 9001 (hash/mod.rs:61 in the
  reference) so the Spark pipeline and the single-node numpy oracle agree
  bit-for-bit.
"""

from datasketches_rust_spark.config import DedupConfig, spark_session

__all__ = ["DedupConfig", "spark_session"]
__version__ = "0.1.0"
