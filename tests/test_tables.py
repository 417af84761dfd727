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
