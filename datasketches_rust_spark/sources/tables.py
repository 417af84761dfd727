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


def write_table(df: DataFrame, ref: str, mode: str = "overwrite") -> None:
    """mode: 'overwrite' (full replace) or 'append'. Iceberg writes are
    atomic snapshot commits; the parquet fallback inherits Spark's
    directory-commit semantics (the checkpoint layer adds its own
    write-then-rename meta for atomicity where it matters)."""
    if ref.startswith(ICEBERG_PREFIX):
        name = _require_iceberg(df.sparkSession, ref)
        w = df.writeTo(name)
        if mode == "append":
            w.append()
        else:
            w.createOrReplace()
        return
    df.write.mode(mode).parquet(ref)
