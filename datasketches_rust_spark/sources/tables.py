"""Format-pluggable table IO — the seam where the north_star's Iceberg
tables plug in.

A table ref is either
  - ``iceberg:<catalog.db.table>`` — read/written through Spark's catalog
    (``spark.read.table`` / ``DataFrame.writeTo``), which is how Iceberg
    tables are addressed once ``iceberg-spark-runtime`` + a catalog are on
    the session (snapshot isolation, hidden partitioning, schema
    evolution all come from the format, not from this engine), or
  - a filesystem path — parquet, the in-sandbox stand-in (this container
    ships no Iceberg jars; the checkpoint/lineage layout in
    plans/checkpoint.py maps 1:1 onto an Iceberg table + snapshot
    metadata, see its module docstring).

Every entry point that takes an input/output location routes through
``read_table`` / ``write_table``, so a cluster with Iceberg configured
runs the identical pipeline code against catalog tables by changing only
the ref strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_PREFIX = "iceberg:"
_EXT = "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"


def iceberg_available(spark: SparkSession) -> bool:
    """True when the session was launched with the Iceberg extension (the
    jars must be on the JVM classpath at startup — this cannot be
    retrofitted onto a running session, hence a capability probe rather
    than an import-try)."""
    ext = spark.conf.get("spark.sql.extensions", "") or ""
    return _EXT in ext


def _require_iceberg(spark: SparkSession, ref: str) -> str:
    if not iceberg_available(spark):
        raise RuntimeError(
            f"table ref {ref!r} addresses an Iceberg catalog table, but "
            f"this session lacks the Iceberg extension (launch with "
            f"--packages org.apache.iceberg:iceberg-spark-runtime-... and "
            f"spark.sql.extensions={_EXT}); use a parquet path ref to run "
            f"without Iceberg")
    return ref[len(ICEBERG_PREFIX):]


def read_table(spark: SparkSession, ref: str) -> DataFrame:
    if ref.startswith(ICEBERG_PREFIX):
        return spark.read.table(_require_iceberg(spark, ref))
    return spark.read.parquet(ref)


def write_bucketed_table(df: DataFrame, name: str, path: str,
                         buckets: int, key_cols: list[str],
                         sort: bool = True,
                         mode: str = "overwrite") -> None:
    """Write a BUCKETED (and by default sort-within-bucket) parquet
    table registered in the session catalog — the storage layout that
    makes repeated large-table equi-joins and aggregations on
    ``key_cols`` exchange-free: both sides of a join bucketed by the
    same keys into the same bucket count are read already
    co-partitioned, so the join plans with ZERO Exchange nodes (and
    zero Sort nodes when ``sort=True``) — at 100 TB this converts every
    fact-to-fact join on the bucket key from a full-data shuffle into a
    local merge per bucket. The Iceberg equivalent is a ``bucket(N,
    col)`` partition transform; this is the vanilla-Spark form
    (catalog-tracked external parquet table at ``path``).

    Trade-off a caller should know: bucket count is fixed at write time
    (pick it for the target cluster's task granularity), and writes
    shuffle into the buckets — you pay one exchange at ingest to delete
    one from every subsequent join/agg."""
    w = df.write.mode(mode).option("path", path) \
        .bucketBy(buckets, *key_cols)
    if sort:
        w = w.sortBy(*key_cols)
    w.format("parquet").saveAsTable(name)


def write_table(df: DataFrame, ref: str, mode: str = "overwrite",
                partition_by: list[str] | None = None) -> None:
    """mode: 'overwrite' (full replace) or 'append'. Iceberg writes are
    atomic snapshot commits; the parquet fallback inherits Spark's
    directory-commit semantics (the checkpoint layer adds its own
    write-then-rename meta for atomicity where it matters).

    ``partition_by`` lays the table out hive-style (one directory per
    partition value): any later read filtered on those columns prunes
    whole partitions at planning time (PartitionFilters in the scan —
    the listing never touches excluded directories), which is the
    difference between scanning a day and scanning 100 TB for
    time-ranged queries. Iceberg gets the same via its partition spec;
    pick LOW-cardinality columns (day, source), never high-cardinality
    ids (a million tiny directories is its own scale failure)."""
    if ref.startswith(ICEBERG_PREFIX):
        name = _require_iceberg(df.sparkSession, ref)
        w = df.writeTo(name)
        if mode == "append":
            w.append()
        else:
            w.createOrReplace()
        return
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(ref)


def zorder_value(col_a, col_b, bits: int = 16):
    """32-bit Morton / Z-order interleave of the low ``bits`` bits of
    two integer columns — the multi-dimensional clustering key behind
    Delta/Iceberg ``OPTIMIZE ZORDER BY (a, b)``: rows sorted by this
    value land in files whose (a, b) min/max zonemaps cover small
    RECTANGLES of key space, so a scan filtered on EITHER column (or
    both) prunes most files, where a plain sort on `a` clusters only
    `a` and leaves `b` zonemaps full-range. Built from 2*bits shift/and
    JVM expressions — whole-stage-codegen'd, no UDF. Production use on
    arbitrary-range keys first rank-codes each column to ``bits`` bits
    (equi-depth, e.g. via approx percentiles); callers with keys
    already < 2**bits (fixture tables here) can interleave directly.
    The layout write is ``df.repartitionByRange(n, z).sortWithinPartitions(z)``
    — one range exchange, then each output file is a z-contiguous run.
    """
    from pyspark.sql import functions as F
    a = (F.col(col_a) if isinstance(col_a, str) else col_a).cast("long") \
        .bitwiseAND(F.lit((1 << bits) - 1))
    b = (F.col(col_b) if isinstance(col_b, str) else col_b).cast("long") \
        .bitwiseAND(F.lit((1 << bits) - 1))
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(F.shiftleft(
            F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i + 1))
        z = z.bitwiseOR(F.shiftleft(
            F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i))
    return z
