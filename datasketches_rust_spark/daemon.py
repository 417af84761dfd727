"""Custom PySpark worker daemon: preload heavy modules before forking.

Python workers are forked from the daemon process per task slot. By
default each forked worker then imports numpy/pandas/pyarrow and this
package on first UDF deserialization — on virtualized kernels where page
faults are ~1000x slower than usual, that import chain costs seconds to
tens of seconds PER WORKER (observed: 41 s worker init for a cold worker).

Importing everything here, in the daemon, means every forked worker
inherits the already-imported modules (copy-on-write, code pages shared):
worker init drops to milliseconds. Enabled via
``spark.python.daemon.module=datasketches_rust_spark.daemon`` in
config.spark_session — a standard public Spark config.
"""

import numpy                      # noqa: F401
import pandas                     # noqa: F401
import pyarrow                    # noqa: F401

import datasketches_rust_spark    # noqa: F401  (also applies mallopt tuning)
# the kernels the UDFs touch, so their module-level state is pre-faulted
from datasketches_rust_spark import agg, hashing            # noqa: F401
from datasketches_rust_spark.functions import text          # noqa: F401
from datasketches_rust_spark.sketches import (bloom, countmin,  # noqa: F401
                                              frequencies, hll, minhash,
                                              simhash, tdigest, theta)

from pyspark.daemon import manager

if __name__ == "__main__":
    manager()
