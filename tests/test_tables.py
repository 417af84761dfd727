"""Format-pluggable table IO (sources/tables.py): parquet refs round-trip;
iceberg: refs demand the Iceberg session extension with a clear error
(this sandbox ships no Iceberg jars — the ref syntax is the seam the
north_star's Iceberg tables plug into on a real cluster)."""

import pytest


def test_parquet_ref_roundtrip(spark, tmp_path):
    from datasketches_rust_spark.sources.tables import (read_table,
                                                        write_table)
    df = spark.range(100).withColumnRenamed("id", "x")
    ref = str(tmp_path / "t")
    write_table(df, ref)
    assert read_table(spark, ref).count() == 100
    write_table(df, ref, mode="append")
    assert read_table(spark, ref).count() == 200


def test_iceberg_ref_requires_extension(spark):
    from datasketches_rust_spark.sources.tables import (iceberg_available,
                                                        read_table)
    assert not iceberg_available(spark)  # sandbox has no Iceberg jars
    with pytest.raises(RuntimeError, match="Iceberg extension"):
        read_table(spark, "iceberg:main.db.images")


def _plan(df) -> str:
    import io
    from contextlib import redirect_stdout
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    """The 100 TB co-located-join artifact: two tables bucketed by the
    same key into the same bucket count join with ZERO Exchange (and
    zero Sort, since buckets are sorted at write) — vs two exchanges +
    two sorts for the identical data as plain parquet."""
    from pyspark.sql import functions as F

    from datasketches_rust_spark.sources.tables import write_bucketed_table

    left = spark.range(10000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a"))
    right = spark.range(10000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b"))
    write_bucketed_table(left, "t_bl", str(tmp_path / "bl"), 4, ["k"])
    write_bucketed_table(right, "t_br", str(tmp_path / "br"), 4, ["k"])
    left.write.parquet(str(tmp_path / "pl"))
    right.write.parquet(str(tmp_path / "pr"))

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        bj = spark.table("t_bl").join(spark.table("t_br"), "k") \
            .groupBy().agg(F.sum(F.col("a") + F.col("b")).alias("s"))
        pj = (spark.read.parquet(str(tmp_path / "pl"))
              .join(spark.read.parquet(str(tmp_path / "pr")), "k")
              .groupBy().agg(F.sum(F.col("a") + F.col("b")).alias("s")))
        bp, pp = _plan(bj), _plan(pj)
        # bucketed: NO exchange anywhere in the plan text, either in the
        # adaptive header or the initial plan (the 1-row final agg is a
        # SinglePartition exchange, not a hashpartitioning one)
        assert "SortMergeJoin" in bp
        assert "hashpartitioning(k#" not in bp, bp
        # plain parquet: the same join needs a hash exchange per side
        # (formatted mode prints exchange args on detail lines)
        assert pp.count("Arguments: hashpartitioning(k#") >= 2, pp
        # and results agree
        assert bj.collect() == pj.collect()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_bl")
        spark.sql("DROP TABLE IF EXISTS t_br")


def test_partitioned_write_prunes_at_plan_time(spark, tmp_path):
    """Hive-style partition layout: a filter on the partition column
    becomes a PartitionFilter (directory-level pruning at planning
    time), not a row-level PushedFilter over all data."""
    from pyspark.sql import functions as F

    from datasketches_rust_spark.sources.tables import (read_table,
                                                        write_table)

    df = spark.range(1000).select(
        "id", (F.col("id") % 10).cast("string").alias("day"))
    ref = str(tmp_path / "part_t")
    write_table(df, ref, partition_by=["day"])

    rd = read_table(spark, ref).where(F.col("day") == "3").select("id")
    plan = _plan(rd)
    assert "PartitionFilters" in plan and "day" in \
        plan.split("PartitionFilters", 1)[1].split("\n")[0]
    assert rd.count() == 100
    # and the scan's data schema no longer carries the partition col
    assert "ReadSchema: struct<id:bigint>" in plan
