"""Grid-blocked spatial neighbor join (the geohash/S2-cell pattern).

The distance self-join "pairs within L2 distance R" is O(n^2) naively;
with cell size == R, every point within R of p lies in p's 3x3 cell
neighborhood, so blocking on the cell key turns the cross join into an
ordinary hash equi-join with a bounded x9 probe-side fanout and an
exact integer residual — the same candidates-then-verify architecture
as the LSH dedup pipelines, with GEOMETRY supplying the pigeonhole
guarantee instead of hashing.

Scale behavior (measured, tools/spatial_scale_probe.py, constant
density ~0.6 pts/cell, local[32] warm best-of-2): candidate volume is
N * 9 * density where density = points per cell is a DATA property,
constant as N grows with the mapped area (a bigger corpus covers more
territory, it does not pack the same square tighter), so the join is
LINEAR in N — validated across a 16x range: 2M pts 3.8s (526k pts/s),
8M 11.4s (702k), 32M 58.6s (546k; 62M directed pairs, no spill).
Parallelism at 32M: local[8] 132.7s -> local[32] 58.6s = 0.566
efficiency, at this box's measured ~0.52-0.55 shared-DRAM ceiling for
8->32 on ANY streaming workload (tools/hw_scaling_probe.py) — the same
ceiling the image/text pipelines hit; a real 4x executor scale-out
multiplies memory buses and does not. Skew is the same story as LSH
band keys: hash-uniform synthetic coords cannot produce hot cells,
REAL geodata can (cities) — there the cell key is exactly the shape
operators/skew.py's hot-list routing and AQE skew-split handle; cell
size stays == R (correctness), only the skew machinery changes.

No reference counterpart (datasketches-rust has no spatial operators);
this generalizes the candidate-generation architecture of
`operators/lsh.py` to metric blocking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def grid_neighbor_stats(pts: DataFrame, r: int,
                        id_col: str = "id",
                        x_col: str = "gx",
                        y_col: str = "gy") -> DataFrame:
    """Per-point neighbor stats within L2 distance ``r``.

    ``pts`` carries integer coordinates (id, x, y). Returns
    (id_col, n_within_r, min_dist2) for every point with at least one
    neighbor; squared distances stay integers, so results are exact
    and hash cross-engine. Cell size equals ``r`` — the 3x3 blocking
    is then pigeonhole-complete for the <= r ball.
    """
    # FLOOR division (integer-exact via pmod, which is non-negative) —
    # Spark's `div` truncates toward zero, which would make the
    # zero-straddling cell 2r-1 wide for signed coordinates and break
    # the "cell size == r" pigeonhole geometry there; floor keeps every
    # cell exactly r wide for any sign (identical to div on the
    # non-negative coords the registered queries use)
    cell = pts.select(
        F.col(id_col).alias("id"),
        F.col(x_col).alias("gx"), F.col(y_col).alias("gy"),
        F.expr(f"({x_col} - pmod({x_col}, {r})) div {r}").alias("cx"),
        F.expr(f"({y_col} - pmod({y_col}, {r})) div {r}").alias("cy"))
    probe = (cell.select(
        "id", "gx", "gy",
        F.explode(F.array(*[
            F.struct((F.col("cx") + dx).alias("bx"),
                     (F.col("cy") + dy).alias("by"))
            for dx in (-1, 0, 1) for dy in (-1, 0, 1)])).alias("b"))
        .select("id", "gx", "gy",
                F.col("b.bx").alias("bx"), F.col("b.by").alias("by")))
    build = cell.select(F.col("id").alias("id2"),
                        F.col("gx").alias("gx2"), F.col("gy").alias("gy2"),
                        F.col("cx").alias("bx"), F.col("cy").alias("by"))
    dx, dy = F.col("gx") - F.col("gx2"), F.col("gy") - F.col("gy2")
    d2 = dx * dx + dy * dy
    return (probe.join(build, ["bx", "by"])
            .where((F.col("id") != F.col("id2")) & (d2 <= r * r))
            .groupBy(F.col("id").alias(id_col))
            .agg(F.count("*").alias("n_within_r"),
                 F.min(d2).alias("min_dist2")))
