"""Per-stage profile of the image dedup pipeline via Spark's REST status
API: run once at the given core count, then dump every stage's wall time,
task count, and executor-core utilisation, plus job-boundary gaps (driver
serial time). This is how the serial floor that kills N->4N scaling gets
located.

Usage: python tools/profile_pipeline.py [cpus] [input_dir]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/dsrs_scaling_input"

    import os
    os.environ["SPARK_GRAFT_UI"] = "true"
    from datasketches_rust_spark.config import DedupConfig, spark_session
    from datasketches_rust_spark.pipeline_images import \
        image_cluster_assignments

    spark = spark_session("profile", cpus=cpus,
                          shuffle_partitions=max(32, cpus))
    spark.range(1000).selectExpr("sum(id)").collect()
    imgs = spark.read.parquet(path)
    n = imgs.count()
    tc = time.time()
    image_cluster_assignments(imgs, DedupConfig()).count()
    cold = time.time() - tc
    t0 = time.time()
    out = image_cluster_assignments(imgs, DedupConfig()).count()
    wall = time.time() - t0
    print(f"# n={n} rows_out={out} cold={cold:.1f}s warm={wall:.1f}s "
          f"cpus={cpus}")

    base = "http://localhost:4040/api/v1"
    apps = json.load(urllib.request.urlopen(f"{base}/applications"))
    app_id = apps[0]["id"]

    def get(what):
        return json.load(urllib.request.urlopen(
            f"{base}/applications/{app_id}/{what}"))

    def ts(s):  # "2026-08-17T07:00:00.000GMT" -> epoch seconds
        import datetime as dt
        return dt.datetime.strptime(
            s.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f").timestamp()

    stages = [s for s in get("stages?status=COMPLETE")
              if "completionTime" in s and "firstTaskLaunchedTime" in s
              and ts(s["submissionTime"]) >= t0]
    rows = []
    for s in stages:
        sub = ts(s["submissionTime"])
        comp = ts(s["completionTime"])
        stage_wall = comp - sub
        run = s["executorRunTime"] / 1000.0
        util = run / (stage_wall * cpus) if stage_wall > 0 else 0.0
        rows.append((stage_wall, s["stageId"], s["numCompleteTasks"],
                     run, util, s["name"].split("\n")[0][:70]))
    rows.sort(reverse=True)
    print("  wall_s stage tasks  exec_run_s  core_util  name")
    for w, sid, ntask, run, util, name in rows[:30]:
        print(f"  {w:6.1f} {sid:5d} {ntask:5d}  {run:10.1f}  "
              f"{util:9.2f}  {name}")

    # where did the time actually go in the slowest stages? taskSummary
    # gives quantiles of the per-task breakdown (all ms)
    print("\n  per-task medians/maxes for the 8 slowest stages (ms):")
    for w, sid, ntask, run, util, name in rows[:8]:
        try:
            summ = get(f"stages/{sid}/0/taskSummary"
                       "?quantiles=0.5,1.0")
        except Exception as e:
            print(f"  stage {sid}: taskSummary unavailable ({e})")
            continue
        srm = summ.get("shuffleReadMetrics", {})
        swm = summ.get("shuffleWriteMetrics", {})
        def mm(key, obj=summ):
            v = obj.get(key)
            return f"{v[0]:.0f}/{v[1]:.0f}" if v else "-"
        print(f"  stage {sid:4d} wall {w:5.1f}s: run {mm('executorRunTime')}"
              f" gc {mm('jvmGcTime')} sched {mm('schedulerDelay')}"
              f" deser {mm('executorDeserializeTime')}"
              f" fetchWait {mm('fetchWaitTime', srm)}"
              f" shufWrite {mm('writeTime', swm)}")
    total_stage_wall = sum(r[0] for r in rows)
    total_run = sum(r[3] for r in rows)
    print(f"# stage wall sum {total_stage_wall:.1f}s (overlaps possible), "
          f"executor run sum {total_run:.1f}s, "
          f"ideal at {cpus} cores {total_run / cpus:.1f}s")

    jobs = [j for j in get("jobs?status=succeeded")
            if "completionTime" in j and ts(j["submissionTime"]) >= t0]
    jobs.sort(key=lambda j: ts(j["submissionTime"]))
    print("\n  job  start_s  end_s  name   (relative to warm t0)")
    for j in jobs:
        sub, comp = ts(j["submissionTime"]), ts(j["completionTime"])
        print(f"  {j['jobId']:4d} {sub - t0:8.1f} {comp - t0:7.1f}  "
              f"{j['name'][:60]}")
    spark.stop()


if __name__ == "__main__":
    main()
