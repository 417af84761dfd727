"""LSH candidate-pair generation — the one big shuffle of the dedup
pipeline, so everything here is shaped around shuffle hygiene.

TWO formulations, chosen by band-keyspace size:

candidate_pairs (MinHash bands, ~2^64 keyspace — bucket keys near-unique):
  explode(bands)            -- narrow, stays in the scan stage
  repartition(band_key)     -- THE one band exchange (16-byte raw rows),
                               reused by both consumers below
  window over band_key      -- count(*)/min(__id) give bucket size + rep
                               with NO join and NO second exchange (a
                               standalone sizes groupBy shuffles ~data-
                               sized partials — near-unique keys defeat
                               map-side combine, measured ~900 MB per
                               2M-image trial; a co-located sizes JOIN
                               builds data-sized hash maps — measured
                               7.4 GB of spill)
  hot rows  -> star edges   -- row-level emission around the bucket min
  cold rows -> local pairs  -- exchange-free collect per bucket (bounded
                               by max_bucket_size) + JVM pair expression
  groupBy (id_a, id_b)      -- dedups pairs across bands AND evaluates the
                               >= min_band_matches prefilter via one
                               folded weight column (star edges = _STAR_W)

bucketed_pair_events (small keyspaces, e.g. SimHash pigeonhole bands with
2^16 x bands keys — see operators/visual.py): one repartition(band_key)
exchange feeds sizes (exchange-free aggregate, tiny result), a co-located
sizes join (build side = keyspace-sized, a few MB), row-level star-edge
emission for hot rows (streaming, no member list ever materialized), and
a bounded collect_list + JVM higher-order pair expression for cold rows.
A plain groupBy-sizes here would emit up to |keyspace| map-side partial
rows PER TASK — measured 470 MB of partials for 79 MB of band data.

Hot-bucket degrade (star topology): a bucket larger than
``max_bucket_size`` would contribute O(size^2) pairs — and for a near-dup
cluster of 10k+ members (boilerplate duplicated across a crawl) EVERY band
bucket is that cluster, so dropping hot buckets would drop the cluster
entirely. Star edges keep the component connected through the
representative with O(size) pairs, while the downstream exact verify still
rejects dissimilar hash collisions. Star edges bypass the
>= min_band_matches prefilter (a pair whose buckets are hot in every band
has zero cold collisions to count — the prefilter only applies to
cold-bucket evidence).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from datasketches_rust_spark.config import DedupConfig

# star-edge weight in candidate_pairs' folded prefilter column: must
# exceed any possible cold-collision count (<= num_bands, typically 32)
# and any sane min_band_matches; sums of it stay far from i64 overflow
_STAR_W = 1 << 30


def explode_bands(df: DataFrame, id_col: str, bands_col: str) -> DataFrame:
    """(__id, band_key) rows. The band index is already mixed into the key
    by sketches/minhash.band_hashes, so the single long IS the whole join
    key — band rows stay 16 bytes of payload through both LSH shuffles."""
    return df.select(
        F.col(id_col).alias("__id"),
        F.explode(F.col(bands_col)).alias("band_key"))


def _pairs_expr(members_col: str, fields: list[str]) -> Column:
    """All ordered pairs (i < j) from a SORTED array<struct> column, as an
    array of named structs — pure JVM higher-order functions, no Python.
    Struct order = first field = id, so id_a < id_b holds by
    construction."""
    names = [n for f in fields for n in (f"'{f}_a', x.{f}",)] + \
            [n for f in fields for n in (f"'{f}_b', y.{f}",)]
    return F.expr(
        f"flatten(transform({members_col}, (x, i) -> "
        f"transform(slice({members_col}, i + 2, "
        f"size({members_col}) - i - 1), "
        f"y -> named_struct({', '.join(names)}))))")


def bucketed_pair_events(ex: DataFrame, max_bucket_size: int,
                         payload: str | None = None) -> DataFrame:
    """Shared single-exchange candidate generation over (__id, band_key
    [, payload]) rows — see module docstring for the plan shape.

    Returns [id_a, id_b, __hot (, payload_a, payload_b)] — one row per
    band collision (NOT deduped across bands; callers aggregate), with
    hot buckets degraded to star edges around their min-id member.
    """
    cols = ["__id"] + ([payload] if payload else [])
    exr = ex.repartition("band_key")

    star = None
    if max_bucket_size > 0:
        agg = [F.count("*").alias("__n"), F.min("__id").alias("__rep")]
        if payload:
            agg.append(F.min_by(F.col(payload), F.col("__id"))
                       .alias("__rep_p"))
        sizes = exr.groupBy("band_key").agg(*agg)
        j = exr.join(sizes, "band_key")

        rep_first = F.col("__rep") < F.col("__id")
        star_cols = [F.least("__id", "__rep").alias("id_a"),
                     F.greatest("__id", "__rep").alias("id_b"),
                     F.lit(1).alias("__hot")]
        if payload:
            star_cols += [
                F.when(rep_first, F.col("__rep_p"))
                .otherwise(F.col(payload)).alias(f"{payload}_a"),
                F.when(rep_first, F.col(payload))
                .otherwise(F.col("__rep_p")).alias(f"{payload}_b")]
        star = (j.where((F.col("__n") > max_bucket_size)
                        & (F.col("__id") != F.col("__rep")))
                .select(*star_cols))
        cold = j.where(F.col("__n") <= max_bucket_size)
    else:
        cold = exr  # cap disabled: no sizes pass at all
    members = (cold.groupBy("band_key")
               .agg(F.array_sort(F.collect_list(F.struct(*cols)))
                    .alias("__m")))
    pair_cols = [F.col("__p.__id_a").alias("id_a"),
                 F.col("__p.__id_b").alias("id_b"),
                 F.lit(0).alias("__hot")]
    if payload:
        pair_cols += [F.col(f"__p.{payload}_a"), F.col(f"__p.{payload}_b")]
    pairs = (members
             .where(F.size("__m") >= 2)  # most buckets are singletons —
             # drop them before the higher-order pair expression evaluates
             .select(F.explode(_pairs_expr("__m", cols)).alias("__p"))
             .select(*pair_cols))
    return pairs.unionByName(star) if star is not None else pairs


def candidate_pairs(df: DataFrame, cfg: DedupConfig, id_col: str,
                    bands_col: str = "bands") -> DataFrame:
    """DataFrame[id_a, id_b] — unordered candidate pairs (id_a < id_b),
    distinct across bands.

    Cold buckets pair quadratically (bounded by max_bucket_size); hot
    buckets degrade to star edges around their min-id representative.
    A pair qualifies with >= cfg.min_band_matches cold-band collisions OR
    any star edge (see module docstring for why the prefilter must not
    count capped bands).
    """
    ex = explode_bands(df, id_col, bands_col)
    min_nb = max(getattr(cfg, "min_band_matches", 1), 1)
    return window_pair_candidates(ex, cfg.max_bucket_size, min_nb)


def window_pair_candidates(ex: DataFrame, max_bucket_size: int,
                           min_band_matches: int = 1) -> DataFrame:
    """The near-unique-keyspace (window) formulation over an already-
    exploded ``(__id, band_key)`` table — the shared core of
    ``candidate_pairs`` (MinHash 2^64 keys) and of any other banding
    whose keyspace is too large for the sizes-JOIN shape (e.g.
    hyperplane LSH at >= ~20 bits/band in operators/similarity.py,
    where the occupied-key count approaches the row count and a
    keyspace-sized build side stops being small). See the module
    docstring for the two-shape doctrine; semantics are identical to
    ``bucketed_pair_events`` + the caller-side prefilter."""
    min_nb = max(min_band_matches, 1)

    if max_bucket_size > 0:
        # ONE band exchange for everything. Bucket size and representative
        # come from an unbounded WINDOW (count/min over partition by
        # band_key) instead of a groupBy + join/broadcast: with
        # near-unique keys a standalone sizes groupBy gains nothing from
        # map-side combine (partials ~= data — measured ~900 MB of
        # shuffled partials per 2M-image trial in the r2 shape), a
        # co-located sizes JOIN builds data-sized hash maps (measured
        # 7.4 GB of spill), and Catalyst defeats naive exchange sharing
        # across join subtrees (anti-join pushdown below the repartition
        # + per-consumer inferred-isnotnull filters de-canonicalize the
        # copies — verified in-plan). The window formulation has no join
        # at all, so its two consumers (star rows, cold rows) are
        # canonically identical up to the post-window filter and the
        # repartition exchange is genuinely reused (ReusedExchange /
        # shared shuffle stage under AQE). Cost: one partition-local sort
        # of 16-byte rows per consumer; hot buckets buffer (and spill)
        # bucket_size x 16 B in the window frame, which replaces the r2
        # shape's extra 900 MB exchange + two more cache scans + explodes.
        exr = ex.repartition("band_key")
        w = Window.partitionBy("band_key")
        sized = exr.select(
            "__id", "band_key",
            F.count("*").over(w).alias("__n"),
            F.min("__id").over(w).alias("__rep"))
        # star edges qualify unconditionally, cold collisions count 1
        # each toward the >= min_band_matches prefilter: folding both
        # into ONE weight column (star weight >> any possible cold band
        # count) drops the second aggregate column the (id_a, id_b)
        # dedup shuffle used to carry (~100 MB per 2M-image trial).
        # __rep is the bucket min, so id_a = __rep < __id always holds.
        star = (sized.where((F.col("__n") > max_bucket_size)
                            & (F.col("__id") != F.col("__rep")))
                .select(F.col("__rep").alias("id_a"),
                        F.col("__id").alias("id_b"),
                        F.lit(_STAR_W).alias("__w")))
        # cold pairs: partition-local collect per bucket (bounded by
        # max_bucket_size) + JVM higher-order pair expression — the
        # groupBy runs exchange-free on the window's co-partitioned,
        # already-sorted output
        members = (sized.where(F.col("__n") <= max_bucket_size)
                   .groupBy("band_key")
                   .agg(F.array_sort(
                        F.collect_list(F.struct(F.col("__id"))))
                        .alias("__m")))
        events = (members
                  .where(F.size("__m") >= 2)  # most buckets are singletons
                  .select(F.explode(_pairs_expr("__m", ["__id"]))
                          .alias("__p"))
                  .select(F.col("__p.__id_a").alias("id_a"),
                          F.col("__p.__id_b").alias("id_b"),
                          F.lit(1).alias("__w"))
                  .unionByName(star))
    else:
        # cap disabled: plain band self-join, no sizes pass at all
        a = ex.alias("a")
        b = ex.alias("b")
        events = (a.join(b, ["band_key"])
                  .where(F.col("a.__id") < F.col("b.__id"))
                  .select(F.col("a.__id").alias("id_a"),
                          F.col("b.__id").alias("id_b"),
                          F.lit(1).alias("__w")))

    # ONE shuffle dedups pairs AND evaluates the prefilter: a true pair at
    # the jaccard threshold co-buckets in many cold bands, a false
    # candidate in ~1; star edges carry _STAR_W so they pass any min_nb.
    return (events.groupBy("id_a", "id_b")
            .agg(F.sum("__w").alias("__w"))
            .where(F.col("__w") >= min_nb)
            .select("id_a", "id_b"))


def hot_bucket_stats(df: DataFrame, cfg: DedupConfig, id_col: str,
                     bands_col: str = "bands") -> DataFrame:
    """Metrics: per-band bucket-size distribution + number of capped
    (star-degraded) buckets. Feeds the pipeline's lineage/metrics
    checkpoint."""
    ex = explode_bands(df, id_col, bands_col)
    sizes = ex.groupBy("band_key").count()
    return sizes.agg(
        F.count("*").alias("n_buckets"),
        F.max("count").alias("max_bucket"),
        F.expr("percentile(count, 0.999)").alias("p999_bucket"),
        F.sum(F.when(F.col("count") > cfg.max_bucket_size, 1)
              .otherwise(0)).alias("capped_buckets"))
