"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: full near-dup detection + clustering on the
                sf0.001 documents table (MinHash -> LSH -> exact-Jaccard
                verify -> connected components).
queries()     — one entry per implemented operator (SURVEY.md §2 +
                training-pipeline ops), from datasketches_rust_spark.queries.
oracle_sql()  — DuckDB-equivalent SQL for every SQL-expressible query.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from datasketches_rust_spark.config import DedupConfig
    from datasketches_rust_spark.pipeline import cluster_assignments

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    return cluster_assignments(docs, DedupConfig(), "doc_id", "text")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from datasketches_rust_spark.queries import QUERIES
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from datasketches_rust_spark.queries import ORACLE_SQL
    return dict(ORACLE_SQL)
