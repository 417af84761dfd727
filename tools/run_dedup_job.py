"""spark-submit entry point for the image+caption dedup pipeline.

  spark-submit --master <cluster> \
      --py-files dist/datasketches_rust_spark.zip \
      tools/run_dedup_job.py \
      --input <parquet/iceberg path with the F1 schema> \
      --output <dir for (image_id, cluster_id)> \
      --checkpoint <dir for resumable stage checkpoints> \
      [--synthetic N]    # synthesize N rows instead of reading --input

Reads the session's master/executors from spark-submit (no master() here),
so the same script runs at N and 4N executors for the scaling measurement.
"""

from __future__ import annotations

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.appName("dsrs-dedup")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.skewJoin.enabled", "true")
             .config("spark.sql.execution.arrow.pyspark.enabled", "true")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
             # preload numpy/pandas/pyarrow + kernels pre-fork (ships in the
             # --py-files zip); also applies the malloc retention tuning in
             # every worker via the package import
             .config("spark.python.daemon.module",
                     "datasketches_rust_spark.daemon")
             .config("spark.executorEnv.MALLOC_MMAP_THRESHOLD_",
                     str(1 << 30))
             .config("spark.executorEnv.MALLOC_TRIM_THRESHOLD_",
                     str(0x7FFFFFFF))
             .getOrCreate())

    from datasketches_rust_spark.config import DedupConfig
    from datasketches_rust_spark.plans.checkpoint import \
        checkpointed_cluster_assignments

    cfg = DedupConfig()
    if args.synthetic:
        from datasketches_rust_spark.sources.images import images_spark_df
        images, _ = images_spark_df(spark, args.synthetic, seed=args.seed)
    else:
        # table refs: "iceberg:<catalog.db.table>" or a parquet path
        from datasketches_rust_spark.sources.tables import read_table
        images = read_table(spark, args.input)

    t0 = time.time()
    clusters, stages = checkpointed_cluster_assignments(
        spark, images, cfg, args.checkpoint)
    from datasketches_rust_spark.sources.tables import (read_table,
                                                         write_table)
    write_table(clusters, args.output)
    n = read_table(spark, args.output).count()
    dt = time.time() - t0
    print(json.dumps({"rows": n, "sec": round(dt, 2),
                      "rows_per_sec": round(n / dt, 1), "stages": stages,
                      "config_fingerprint": cfg.fingerprint()}))
    spark.stop()


if __name__ == "__main__":
    main()
