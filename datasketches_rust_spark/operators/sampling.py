"""Weighted sampling WITHOUT replacement — the curation op behind
"keep K docs per source, longer docs proportionally more often"
(quality-weighted subsampling before tokenization).

Algorithm: Efraimidis–Spirakis A-ES (Inf. Process. Lett. 97(5), 2006).
Each row draws a uniform u in (0,1) and gets the key u^(1/w); the top-K
keys per stratum ARE a weight-proportional sample without replacement.
We order by the monotone-equivalent ln(u)/w (descending) instead of
u^(1/w) — same ranking, no pow() — and the uniform comes from a CONTENT
hash (first 8 hex chars of md5(id)), not rand(), so the sample is
reproducible run-to-run, engine-to-engine, and under task retries
(a rand()-keyed sample silently changes membership when a 100 TB stage
re-executes a lost partition — content-keyed sampling is the only
deterministic contract at scale).

Scale shape: the selection is a rank-limit window, which Spark 3.5+
plans with WindowGroupLimit(Partial) BELOW the stratum exchange — every
map task locally prunes to its own top-K per stratum before shuffling,
so the exchange moves O(n_partitions x n_strata x K) rows, not the
corpus, and no stratum is ever fully sorted. That physical guarantee
(plan-audited in tools/explain_plans.py) is why the window formulation
is safe here where the project elsewhere avoids corpus-keyed windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_TWO32 = 4294967296.0


def content_uniform(id_col: str) -> F.Column:
    """Deterministic uniform in (0,1): (u32 + 0.5) / 2^32 where u32 is
    the first 32 bits of md5(cast(id as string)). The +0.5 keeps the
    value strictly inside (0,1) so ln(u) is finite. Identical bit
    pattern in DuckDB via ('0x'||substr(md5(id::varchar),1,8))::bigint —
    the +0.5 add and the power-of-two divide are both exact in IEEE
    double, so the uniform (not just its distribution) crosses engines.
    """
    u32 = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8),
                 16, 10).cast("long")
    return (u32.cast("double") + F.lit(0.5)) / F.lit(_TWO32)


def weighted_sample_without_replacement(
        df: DataFrame, k: int, id_col: str, weight_col: str,
        strata_col: str | None = None,
        rank_col: str = "rk") -> DataFrame:
    """Top-K weight-proportional sample (without replacement) per
    stratum (global when ``strata_col`` is None). Rows with
    non-positive or NULL weight are excluded (they have zero inclusion
    probability under A-ES and ln(u)/w is undefined at w<=0).

    Returns the input columns plus ``rank_col`` (1..K within stratum,
    in descending-key order — rank 1 is the strongest draw). The A-ES
    key itself is deliberately NOT emitted: it is the one float in the
    computation, and both engines of the cross-engine gate derive the
    identical ordering from it without having to hash it.
    """
    kept = df.where(F.col(weight_col) > 0)
    key = (F.log(content_uniform(id_col))
           / F.col(weight_col).cast("double"))
    parts = [strata_col] if strata_col else []
    w = (Window.partitionBy(*parts)
         .orderBy(F.desc("__aes_key"), F.asc(id_col)))
    return (kept.withColumn("__aes_key", key)
            .withColumn(rank_col, F.row_number().over(w))
            .where(F.col(rank_col) <= F.lit(int(k)))
            .drop("__aes_key"))
