"""Scale validation for operators/spatial.py grid_neighbor_stats.

2,000,000 synthetic points on a realistically-sized map (GRID=45,000 so
density stays ~0.6 points/cell at cell size R=25 — density is a DATA
property; a bigger corpus maps more territory, it does not pack the
same square tighter), run at two parallelism levels for a scaling
datapoint. Coordinates are xxhash64-derived (cheap JVM-side at this
volume; the registered query uses md5 only because the DuckDB oracle
must re-derive them — no oracle here, so no md5 constraint).

Usage: python tools/spatial_scale_probe.py [n_points]
Prints one JSON line with row counts, pair volume, and wall times.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
# density (pts/cell) is held CONSTANT as N grows: the map edge scales
# with sqrt(N) — a bigger corpus covers more territory, it does not
# pack the same square tighter. 45k edge at 2M points ~ 0.6 pts/cell.
GRID, R = int(45_000 * (N / 2_000_000) ** 0.5), 25


def run(cpus: int) -> dict:
    from datasketches_rust_spark.config import spark_session
    from datasketches_rust_spark.operators.spatial import (
        grid_neighbor_stats)
    from pyspark.sql import functions as F

    spark = spark_session(f"spatial-probe-{cpus}", cpus=cpus,
                          shuffle_partitions=cpus)
    pts = (spark.range(N).select(
        F.col("id"),
        (F.xxhash64(F.concat(F.lit("gx:"), F.col("id").cast("string")))
         % GRID + GRID).cast("long").alias("r1"),
        (F.xxhash64(F.concat(F.lit("gy:"), F.col("id").cast("string")))
         % GRID + GRID).cast("long").alias("r2"))
        .select("id", (F.col("r1") % GRID).alias("gx"),
                (F.col("r2") % GRID).alias("gy")))
    trials = []
    for _ in range(3):   # trial 1 is the cold JVM/codegen draw
        t0 = time.time()
        out = grid_neighbor_stats(pts, R)
        n_rows, n_pairs = out.agg(
            F.count("*"), F.sum("n_within_r")).first()
        trials.append(round(time.time() - t0, 1))
    spark.stop()
    best = min(trials[1:])
    return {"cpus": cpus, "trials": trials, "warm_sec": best,
            "pts_per_sec": round(N / best),
            "rows_with_neighbors": n_rows,
            "directed_pairs": int(n_pairs)}


def main() -> None:
    levels = [run(int(c)) for c in (sys.argv[2].split(",") if len(sys.argv) > 2 else ("8", "32"))]
    eff = ((levels[0]["warm_sec"] / levels[-1]["warm_sec"])
           / (levels[-1]["cpus"] / levels[0]["cpus"])
           if len(levels) > 1 else None)
    print(json.dumps({"n_points": N, "grid": GRID, "r": R,
                      "levels": levels,
                      "scaling_eff": round(eff, 3) if eff else None}))


if __name__ == "__main__":
    main()
