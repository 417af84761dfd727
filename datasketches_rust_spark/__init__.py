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

import os as _os


def _tune_malloc() -> None:
    """Make glibc retain freed heap memory instead of returning it to the
    kernel. The numpy kernels allocate large short-lived buffers every Arrow
    batch; with default malloc behavior each batch re-mmaps and re-faults
    hundreds of MB, which on virtualized kernels costs ~0.5 ms per 4 KiB
    page — orders of magnitude more than the arithmetic. Raising the mmap
    threshold and disabling trim means pages are faulted once per worker
    process and then reused for the lifetime of the executor.

    Applied (a) via mallopt for this process, (b) via env vars so every
    child process (JVM -> pyspark.daemon -> workers) inherits the behavior
    from startup.
    """
    _os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(1 << 30))
    _os.environ.setdefault("MALLOC_TRIM_THRESHOLD_", str(0x7FFFFFFF))
    try:
        import ctypes
        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 1 << 30)        # M_MMAP_THRESHOLD
        libc.mallopt(-1, 0x7FFFFFFF)     # M_TRIM_THRESHOLD
    except Exception:
        pass  # non-glibc platform: env vars above still cover children


_tune_malloc()

from datasketches_rust_spark.config import DedupConfig, spark_session  # noqa: E402

__all__ = ["DedupConfig", "spark_session"]
__version__ = "0.1.0"
