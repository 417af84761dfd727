"""Round-4 analytics classes pinned on constructed fixtures (the
DuckDB gate proves engine agreement; these prove the formulas compute
the statistic they claim): Kaplan-Meier hand-computed survival with
censoring, business-day counts vs brute force (+ inverted-interval
clamp), k-core peeling on a crafted graph, weighted median
conventions, and HHI extremes."""

import datetime as dt

from pyspark.sql import functions as F

D = dt.date


# -- Kaplan-Meier ------------------------------------------------------------

def test_kaplan_meier_hand_computed(spark, tmp_path):
    """4 customers: durations 10 (event), 10 (censored), 20 (event),
    30 (censored at corpus end). KM: S(10) = 1 - 1/4 = 0.75 (n=4,
    d=1); S(20) = 0.75 * (1 - 1/2) = 0.375 (n=2 after the dur-10 pair
    leaves, d=1). Censored rows consume risk but produce no factor."""
    from datasketches_rust_spark.queries import q_kaplan_meier_retention

    rows = []
    base = D(2020, 1, 1)

    def cust(key, first, last):
        rows.append((key * 10, key, "O", 100.0,
                     dt.datetime.combine(first, dt.time()), "1-URGENT"))
        if last != first:
            rows.append((key * 10 + 1, key, "O", 100.0,
                         dt.datetime.combine(last, dt.time()),
                         "1-URGENT"))

    cust(1, base, base + dt.timedelta(days=10))    # event (gap 120)
    cust(2, base + dt.timedelta(days=110),
         base + dt.timedelta(days=120))            # censored (gap 10)
    cust(3, base, base + dt.timedelta(days=20))    # event (gap 110)
    cust(4, base + dt.timedelta(days=100),
         base + dt.timedelta(days=130))            # censored (gap 0)
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string, "
              "o_totalprice double, o_orderdate timestamp, "
              "o_orderpriority string"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    got = {r["dur"]: r for r in
           q_kaplan_meier_retention(spark, str(tmp_path)).collect()}
    assert set(got) == {10, 20}
    assert got[10]["n_at_risk"] == 4 and got[10]["d_events"] == 1
    assert abs(got[10]["survival"] - 0.75) < 1e-12
    assert got[20]["n_at_risk"] == 2 and got[20]["d_events"] == 1
    assert abs(got[20]["survival"] - 0.375) < 1e-12


# -- business days -----------------------------------------------------------

def test_business_days_formula_vs_bruteforce(spark):
    expr = F.expr(
        "((b - a) div 7) * 5 + if((b - a) % 7 = 0, 0,"
        " size(filter(sequence(1, (b - a) % 7),"
        "             k -> ((a + 3) % 7 + k) % 7 <= 4)))")
    rows = [(a, a + s) for a in range(18260, 18274)
            for s in range(0, 16)]
    df = spark.createDataFrame(rows, "a int, b int")
    got = {(r["a"], r["b"]): r["bd"]
           for r in df.select("a", "b", expr.alias("bd")).collect()}

    def truth(a, b):
        return sum(1 for d in range(a + 1, b + 1) if (d + 3) % 7 <= 4)

    assert all(got[(a, b)] == truth(a, b) for a, b in got)


def test_sla_inverted_interval_clamped(spark, tmp_path):
    """ship before order (messy data) counts 0 business days — without
    the clamp Spark div (truncate) and DuckDB // (floor) disagree on
    the negative span, which the sf0.01 gate actually measured."""
    from datasketches_rust_spark.queries import q_sla_business_days

    ts = dt.datetime(2020, 1, 10)
    spark.createDataFrame(
        [(1, 1, "O", 10.0, ts, "1-URGENT")],
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, "
        "o_orderpriority string"
    ).write.parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O",
          dt.datetime(2020, 1, 3))],
        "l_orderkey long, l_partkey long, l_suppkey long, "
        "l_linenumber int, l_quantity double, l_extendedprice double, "
        "l_discount double, l_tax double, l_returnflag string, "
        "l_linestatus string, l_shipdate timestamp"
    ).write.parquet(str(tmp_path / "lineitem.parquet"))
    got = q_sla_business_days(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert got[0]["max_business_days"] == 0
    assert got[0]["n_breaches"] == 0


# -- k-core ------------------------------------------------------------------

def test_kcore_peels_chain_keeps_cycle():
    """Pure-structure check of the peeling semantics on a crafted
    graph: triangle {1,2,3} + pendant chain 3-4-5. The chain peels
    (5 has degree 1, then 4), the triangle survives with degree 2
    everywhere. Replayed in plain python with the same rule the Spark
    loop and the unrolled oracle share."""
    edges = {(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)}
    sym = edges | {(b, a) for a, b in edges}
    cur = set(sym)
    for _ in range(12):
        deg = {}
        for a, _b in cur:
            deg[a] = deg.get(a, 0) + 1
        keep = {v for v, d in deg.items() if d >= 2}
        nxt = {(a, b) for a, b in cur if a in keep and b in keep}
        if nxt == cur:
            break
        cur = nxt
    survivors = {a for a, _ in cur}
    assert survivors == {1, 2, 3}
    assert all(sum(1 for x, _ in cur if x == v) == 2 for v in survivors)


# -- weighted median ---------------------------------------------------------

def test_weighted_median_convention(spark):
    """lower weighted median = smallest value with 2*cumw >= totw:
    values 1,2,3 with weights 1,1,2 -> totw 4, cum 1,2,4 -> median 2
    (2*2 >= 4); shifting weight to 9,1,2 -> median 1."""
    from datasketches_rust_spark.operators.bucketed_rank import (
        with_global_ranks)

    for weights, want in [((1, 1, 2), 2), ((9, 1, 2), 1)]:
        rows = [("G", v, w) for v, w in zip((1, 2, 3), weights)]
        df = spark.createDataFrame(rows, "g string, v long, w long")
        cum = with_global_ranks(df, "v", [], partition_cols=("g",),
                                cum_cols={"cumw": "w"})
        tot = df.groupBy("g").agg(F.sum("w").alias("totw"))
        got = (cum.join(tot, "g")
               .where(F.col("cumw") * 2 >= F.col("totw"))
               .agg(F.min("v").alias("m")).collect()[0]["m"])
        assert got == want


# -- HHI ---------------------------------------------------------------------

def test_hhi_extremes():
    """monopoly -> 1e12 ppm^2; n equal players -> ~1e12/n (floored
    shares). Pure-arithmetic pin of the ppm-squared convention."""
    def hhi(cents_list):
        tot = sum(cents_list)
        shares = [c * 1_000_000 // tot for c in cents_list]
        return sum(s * s for s in shares)

    assert hhi([500]) == 10**12
    four = hhi([100, 100, 100, 100])
    assert abs(four - 10**12 // 4) <= 4 * 10**6


# -- Mann-Whitney / AUC -------------------------------------------------------

def test_mann_whitney_doubled_rank_formula():
    """The 2U identity replayed in plain python on crafted samples with
    heavy ties, against the probabilistic AUC definition
    P(pos > neg) + 0.5 P(pos == neg)."""
    def auc_exact(pos, neg):
        wins = sum(1 for p in pos for n in neg if p > n)
        ties = sum(1 for p in pos for n in neg if p == n)
        return (wins + 0.5 * ties) / (len(pos) * len(neg))

    def auc_ranksum(pos, neg):
        vals = sorted(set(pos + neg))
        r2, seen = 0, 0
        for v in vals:
            a = pos.count(v)
            b = neg.count(v)
            lo = seen + 1
            m = a + b
            r2 += a * (2 * lo + m - 1)
            seen += m
        u2 = r2 - len(pos) * (len(pos) + 1)
        return u2 / (2 * len(pos) * len(neg))

    cases = [
        ([3, 4, 5], [1, 2]),            # perfect separation -> 1.0
        ([1, 2], [3, 4, 5]),            # inverted -> 0.0
        ([2, 2, 2], [2, 2]),            # all tied -> 0.5
        ([1, 2, 2, 5], [2, 3, 3]),      # mixed ties
    ]
    for pos, neg in cases:
        assert abs(auc_ranksum(pos, neg) - auc_exact(pos, neg)) < 1e-12
    assert auc_ranksum([3, 4, 5], [1, 2]) == 1.0
    assert auc_ranksum([2, 2, 2], [2, 2]) == 0.5


# -- Cramer-von Mises --------------------------------------------------------

def test_cvm_scaled_statistic_hand_computed():
    """T_scaled = sum over values of (a+b) * (i*n2 - j*n1)^2 on a
    crafted pair of samples, vs a brute-force ECDF evaluation."""
    A = [1, 2, 2, 4]
    B = [2, 3]
    n1, n2 = len(A), len(B)
    vals = sorted(set(A + B))
    i = j = 0
    t_scaled = 0
    for v in vals:
        a = A.count(v)
        b = B.count(v)
        i += a
        j += b
        t_scaled += (a + b) * (i * n2 - j * n1) ** 2
    # brute force: same sum from raw ECDF fractions scaled by (n1*n2)^2
    i = j = 0
    brute = 0.0
    for v in vals:
        i += A.count(v)
        j += B.count(v)
        g = i / n1 - j / n2
        brute += (A.count(v) + B.count(v)) * (g * n1 * n2) ** 2
    assert abs(t_scaled - brute) < 1e-6
    assert t_scaled > 0  # the two samples genuinely differ
