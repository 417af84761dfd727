"""data_quality_report violation counting, pinned on crafted inputs —
the sf fixtures are clean (every n_bad = 0), so the driver's hash gate
proves cross-engine agreement but not the counting logic itself."""

from __future__ import annotations


def test_counts_each_violation_class(spark, tmp_path):
    from datasketches_rust_spark.queries import q_data_quality_report
    orders = [
        # (o_orderkey, o_custkey)
        (1, 10), (2, 10),
        (2, 20),          # duplicate PK 2
        (3, None),        # null FK
        (4, 99),          # orphan (no customer 99)
    ]
    customers = [(10, "a", "SEG"), (20, "b", "SEG")]
    lineitems = [
        # (l_orderkey, l_quantity, l_discount)
        (1, 10.0, 0.05),
        (1, 0.0, 0.05),    # quantity <= 0
        (2, 51.0, 0.05),   # quantity > 50
        (2, 5.0, 1.5),     # discount > 1
        (3, 5.0, -0.1),    # discount < 0
    ]
    spark.createDataFrame(orders, "o_orderkey long, o_custkey long") \
        .write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        customers, "c_custkey long, c_name string, c_mktsegment string") \
        .write.parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        lineitems, "l_orderkey long, l_quantity double, l_discount double") \
        .write.parquet(str(tmp_path / "lineitem.parquet"))

    got = {r["check"]: (r["n_bad"], r["n_total"]) for r in
           q_data_quality_report(spark, str(tmp_path)).collect()}
    assert got["null_custkey"] == (1, 5)
    assert got["pk_unique_orderkey"] == (1, 5)      # one extra key-2 row
    # orphans: custkey 99 (no such customer) AND the null-FK row (a
    # null key never matches in an anti join -> counted as orphan too)
    assert got["fk_orders_customer"] == (2, 5)
    assert got["quantity_in_(0,50]"] == (2, 5)
    assert got["discount_in_[0,1]"] == (2, 5)
