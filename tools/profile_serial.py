"""Profile scaling behavior of the image-dedup pipeline at one core count.

Motivation: the naive t = f + c/N fit on scaling_bench results suggested a
~58 s "serial floor" at 1M images. Task-level event-log accounting shows
the truth: at local[32] the warm pipeline runs at ~91% core occupancy —
there is no big scheduling floor. What the fit saw as "f" is WORK
INFLATION: the same warm trial burns ~575 task-cpu-seconds at local[2]
but ~1560 at local[32] (shared-DRAM contention + this kernel's serialized
page-fault path stretch every task). That distinction decides the fix:
occupancy gaps would call for fewer/restructured jobs; inflation calls
for lower memory traffic per row (smaller shuffle rows, cache-blocked
kernels) and for reporting the N->4N pair below the bandwidth wall.

This tool runs ONE cold + ONE warm trial at a chosen core count with
event logging, then prints, for the warm trial:
  - per-stage: wall, summed task cpu, ideal (cpu/cores), max task,
  - totals: wall, task-cpu-seconds, occupancy = cpu / (wall * cores).
Compare task-cpu totals across core counts to measure inflation.

Usage: python tools/profile_serial.py [n_images] [cpus]
Input must already exist (tools/scaling_bench.py synthesizes it).
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys

INPUT_DIR = "/tmp/dsrs_scaling_input"
EVDIR = "/tmp/spark-events"

_CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
cpus = int(sys.argv[1]); path = sys.argv[2]
import os
os.makedirs("/tmp/spark-events", exist_ok=True)
# eventLog confs must be present at JVM launch — inject via submit args
os.environ["PYSPARK_SUBMIT_ARGS"] = (
    "--conf spark.eventLog.enabled=true "
    "--conf spark.eventLog.dir=file:///tmp/spark-events "
    "--conf spark.eventLog.compress=false pyspark-shell")
os.environ.setdefault("SPARK_GRAFT_AQE", "false")
from datasketches_rust_spark.config import DedupConfig, spark_session
spark = spark_session("profile", cpus=cpus, shuffle_partitions=max(32, cpus))
from datasketches_rust_spark.pipeline_images import image_cluster_assignments
cfg = DedupConfig()
imgs = spark.read.parquet(path)
n = imgs.count()
marks = {}
for trial in ("cold", "warm"):
    t0 = time.time()
    image_cluster_assignments(imgs, cfg).count()
    t1 = time.time()
    marks[trial] = [t0 * 1000, t1 * 1000]   # ms epoch, matches event log
print(json.dumps({"n": n, "marks": marks,
                  "app_id": spark.sparkContext.applicationId}))
spark.stop()
"""


def _event_lines(appdir: str):
    """Yield lines from a plain event-log file or a Spark-4 rolling
    eventlog_v2_<appid>/ directory (zstd parts go through the zstd CLI)."""
    if os.path.isfile(appdir):
        with open(appdir) as f:
            yield from f
        return
    alt = os.path.join(os.path.dirname(appdir),
                       "eventlog_v2_" + os.path.basename(appdir))
    if not os.path.isdir(alt):
        raise FileNotFoundError(appdir)
    for part in sorted(glob.glob(os.path.join(alt, "events_*"))):
        if part.endswith(".zstd"):
            out = subprocess.run(["zstd", "-d", "-c", part],
                                 capture_output=True, text=True)
            yield from out.stdout.splitlines()
        else:
            with open(part) as f:
                yield from f


def parse_eventlog(path: str, lo: float, hi: float, cores: int) -> None:
    stages = {}
    task_cpu = {}
    task_max = {}
    task_bytes = {}   # sid -> [shuf_write, shuf_read, input, spill, py_cpu]
    for line in _event_lines(path):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        e = ev.get("Event")
        if e == "SparkListenerTaskEnd":
            ti = ev["Task Info"]
            if ti["Finish Time"] < lo or ti["Launch Time"] > hi:
                continue
            sid = ev["Stage ID"]
            d = (ti["Finish Time"] - ti["Launch Time"]) / 1000.0
            task_cpu[sid] = task_cpu.get(sid, 0.0) + d
            task_max[sid] = max(task_max.get(sid, 0.0), d)
            tm = ev.get("Task Metrics") or {}
            b = task_bytes.setdefault(sid, [0, 0, 0, 0])
            sw = tm.get("Shuffle Write Metrics") or {}
            b[0] += sw.get("Shuffle Bytes Written", 0)
            sr = tm.get("Shuffle Read Metrics") or {}
            b[1] += (sr.get("Remote Bytes Read", 0)
                     + sr.get("Local Bytes Read", 0))
            im = tm.get("Input Metrics") or {}
            b[2] += im.get("Bytes Read", 0)
            b[3] += (tm.get("Memory Bytes Spilled", 0)
                     + tm.get("Disk Bytes Spilled", 0))
        elif e == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            sub, com = si.get("Submission Time"), si.get("Completion Time")
            if sub is None or com is None or com < lo or sub > hi:
                continue
            stages[si["Stage ID"]] = {
                "name": si["Stage Name"].split("\n")[0][:60],
                "tasks": si["Number of Tasks"], "sub": sub, "com": com,
            }
    total_wall = (hi - lo) / 1000.0
    total_cpu = sum(task_cpu.get(s, 0.0) for s in stages)
    print(f"\nwarm window {total_wall:.1f}s x {cores} cores; "
          f"task-cpu {total_cpu:.1f}s; "
          f"occupancy {total_cpu / (total_wall * cores):.2f}")
    print(f"{'sid':>4} {'nt':>4} {'wall':>7} {'cpu_s':>8} {'ideal':>6} "
          f"{'maxtask':>7} {'swMB':>7} {'srMB':>7} {'inMB':>7} "
          f"{'splMB':>6}  name")
    mb = 1024 * 1024
    for sid in sorted(stages):
        s = stages[sid]
        wall = (s["com"] - s["sub"]) / 1000.0
        cpu = task_cpu.get(sid, 0.0)
        b = task_bytes.get(sid, [0, 0, 0, 0])
        print(f"{sid:>4} {s['tasks']:>4} {wall:>7.2f} {cpu:>8.1f} "
              f"{cpu / cores:>6.2f} {task_max.get(sid, 0.0):>7.2f} "
              f"{b[0] / mb:>7.1f} {b[1] / mb:>7.1f} {b[2] / mb:>7.1f} "
              f"{b[3] / mb:>6.1f}  {s['name']}")


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "--parse":
        # offline re-parse of an existing event log (whole app window):
        # python tools/profile_serial.py --parse <appdir-or-file> <cores>
        parse_eventlog(sys.argv[2], float("-inf"), float("inf"),
                       int(sys.argv[3]))
        return
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    os.makedirs(EVDIR, exist_ok=True)
    env = {**os.environ, "SPARK_GRAFT_CPUS": str(cpus),
           "SPARK_GRAFT_MAX_PARTITION_BYTES": "50331648",
           "SPARK_GRAFT_AQE": "false",
           "SPARK_GRAFT_UI": "false"}
    out = subprocess.run([sys.executable, "-c", _CHILD, str(cpus),
                          INPUT_DIR],
                         capture_output=True, text=True, timeout=7200,
                         env=env)
    lines = [l for l in out.stdout.strip().splitlines()
             if l.startswith("{")]
    if not lines:
        print(out.stdout[-3000:], file=sys.stderr)
        print(out.stderr[-3000:], file=sys.stderr)
        raise RuntimeError("child produced no JSON")
    res = json.loads(lines[-1])
    cold = (res["marks"]["cold"][1] - res["marks"]["cold"][0]) / 1000
    warm = (res["marks"]["warm"][1] - res["marks"]["warm"][0]) / 1000
    print(f"n={res['n']} cpus={cpus} cold={cold:.1f}s warm={warm:.1f}s")
    ev = os.path.join(EVDIR, res["app_id"])
    lo, hi = res["marks"]["warm"]
    parse_eventlog(ev, lo, hi, cpus)


if __name__ == "__main__":
    main()
