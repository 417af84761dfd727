"""Frame-audio-axis scaling-efficiency evidence (BASELINE.json
north_rule) — the N -> 4N treatment the image (SCALING_r03.json) and
text (SCALING_r03_text.json) axes already have, applied to the round-4
frame-level audio dedup pipeline
(pipeline_audio.audio_frame_cluster_assignments).

Protocol identical to tools/scaling_bench_text.py: synthesize the
frame-axis fixture once, then each parallelism level in its own JVM,
run sequentially and EXCLUSIVELY, 1 cold + WARM_TRIALS warm
executions, throughput = clips / best warm trial. The 2 -> 8-core pair
is the faithful single-box N -> 4N proxy (both levels below the
DRAM-bandwidth wall — tools/hw_scaling_probe.py); 8 -> 32 is reported
alongside with that hardware ceiling for context. AQE off, fixed scan
partitioning, zstd-1 codec — identical at all levels.

Sizing: n = 120k clips puts warm local[8] well past the >= 2 min floor
(CLAUDE.md: the text axis measured a FAKE 0.663 at 1M docs because a
~15-26 s per-job fixed floor dominated a 58 s run).

Usage:
  python tools/scaling_bench_audio_frames.py                 # all + merge
  python tools/scaling_bench_audio_frames.py --level 8 [n]   # one level
  python tools/scaling_bench_audio_frames.py --merge [n]
Level results land in /tmp/dsrs_scaling_aframes_l{N}.json;
default n = 120000.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

INPUT_DIR = os.environ.get("SPARK_GRAFT_SCALING_AFRAMES_INPUT",
                           "/tmp/dsrs_scaling_aframes_input")
LEVELS = (2, 8, 32)
PAIRS = ((2, 8), (8, 32))
PRIMARY_PAIR = (2, 8)
WARM_TRIALS = 2
DEFAULT_N = 120_000

_SYNTH = r"""
import json, sys
sys.path.insert(0, "/root/repo")
n = int(sys.argv[1]); out = sys.argv[2]
from datasketches_rust_spark.config import spark_session
from datasketches_rust_spark.sources.audio import audio_frames_spark_df
spark = spark_session("synth-aframes", cpus=32, shuffle_partitions=32)
clips, _ = audio_frames_spark_df(spark, n, seed=42, partitions=64)
clips.write.mode("overwrite").parquet(out)
print(json.dumps({"written": spark.read.parquet(out).count()}))
spark.stop()
"""

_CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
cpus = int(sys.argv[1]); path = sys.argv[2]; warm_trials = int(sys.argv[3])
from datasketches_rust_spark.config import spark_session
from datasketches_rust_spark.pipeline_audio import (
    audio_frame_cluster_assignments)
spark = spark_session("scaling-aframes", cpus=cpus,
                      shuffle_partitions=max(32, cpus))
spark.range(1000).selectExpr("sum(id)").collect()  # JVM warm-up
clips = spark.read.parquet(path)
n = clips.count()
runs = []
for trial in range(1 + warm_trials):
    t0 = time.time()
    n_out = audio_frame_cluster_assignments(clips).count()
    runs.append(round(time.time() - t0, 2))
warm = min(runs[1:])
print(json.dumps({
    "cpus": cpus, "n": n, "rows_out": n_out,
    "cold_sec": runs[0], "warm_secs": runs[1:], "warm_sec": warm,
    "cold_clips_per_sec": round(n / runs[0], 1),
    "warm_clips_per_sec": round(n / warm, 1)}))
spark.stop()
"""

_SYNTH_COUNT = r"""
import json, sys
try:
    import pyarrow.dataset as ds
    print(json.dumps({"rows": ds.dataset(sys.argv[1]).count_rows()}))
except Exception:
    print(json.dumps({"rows": -1}))
"""


def _run(code: str, *args: str, cpus: str = "32") -> dict:
    out = subprocess.run(
        [sys.executable, "-c", code, *args],
        capture_output=True, text=True, timeout=10800,
        env={**os.environ, "SPARK_GRAFT_CPUS": cpus,
             "SPARK_GRAFT_MAX_PARTITION_BYTES": "50331648",
             "SPARK_GRAFT_AQE": "false",
             "SPARK_DRIVER_MEMORY": os.environ.get(
                 "SPARK_DRIVER_MEMORY", "24g")})
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(out.stderr[-4000:])
    return json.loads(lines[-1])


def _ensure_input(n: int) -> None:
    if not os.path.exists(os.path.join(INPUT_DIR, "_SUCCESS")) or \
            _run(_SYNTH_COUNT, INPUT_DIR)["rows"] != n:
        print(f"synthesizing {n} clips -> {INPUT_DIR}", file=sys.stderr)
        _run(_SYNTH, str(n), INPUT_DIR)


def _level_path(cpus: int) -> str:
    return f"/tmp/dsrs_scaling_aframes_l{cpus}.json"


def run_level(cpus: int, n: int) -> dict:
    _ensure_input(n)
    r = _run(_CHILD, str(cpus), INPUT_DIR, str(WARM_TRIALS),
             cpus=str(cpus))
    with open(_level_path(cpus), "w") as f:
        json.dump(r, f, indent=1)
    return r


def merge(n: int) -> dict:
    levels = {}
    for cpus in LEVELS:
        with open(_level_path(cpus)) as f:
            levels[cpus] = json.load(f)
        if levels[cpus]["n"] != n:
            raise SystemExit(
                f"level file {_level_path(cpus)} measured n="
                f"{levels[cpus]['n']}, merge asked for n={n}")
    out = {
        "job": "audio_frame_dedup_clusters",
        "n_clips": n,
        "input": INPUT_DIR,
        "protocol": (f"1 cold + {WARM_TRIALS} warm trials per level, "
                     "separate JVMs, exclusive box, identical "
                     "input/config; throughput = n / best warm trial"),
        "levels": {f"local{c}": levels[c] for c in LEVELS},
        "pairs": {},
    }
    for lo, hi in PAIRS:
        eff = (levels[hi]["warm_clips_per_sec"]
               / levels[lo]["warm_clips_per_sec"]) / (hi / lo)
        out["pairs"][f"{lo}->{hi}"] = {
            "factor": hi // lo,
            "throughput_lo": levels[lo]["warm_clips_per_sec"],
            "throughput_hi": levels[hi]["warm_clips_per_sec"],
            "scaling_efficiency_warm": round(eff, 3),
            "scaling_efficiency_cold": round(
                (levels[hi]["cold_clips_per_sec"]
                 / levels[lo]["cold_clips_per_sec"]) / (hi / lo), 3),
        }
    lo, hi = PRIMARY_PAIR
    out["primary_pair"] = f"{lo}->{hi}"
    out["primary_pair_rationale"] = (
        "N->4N cores with both levels below this box's DRAM-bandwidth "
        "wall (tools/hw_scaling_probe.py: any streaming workload caps "
        "at ~2.1x for the 8->32 pair on shared memory buses a real 4x "
        "executor scale-out does not share)")
    return out


def main() -> None:
    args = sys.argv[1:]
    n = DEFAULT_N
    if "--level" in args:
        i = args.index("--level")
        cpus = int(args[i + 1])
        if len(args) > i + 2:
            n = int(args[i + 2])
        print(json.dumps(run_level(cpus, n), indent=1))
        return
    if "--merge" in args:
        i = args.index("--merge")
        if len(args) > i + 1:
            n = int(args[i + 1])
        print(json.dumps(merge(n), indent=1))
        return
    if args:
        n = int(args[0])
    for cpus in LEVELS:
        print(f"level local[{cpus}] ...", file=sys.stderr)
        r = run_level(cpus, n)
        print(json.dumps(r), file=sys.stderr)
    print(json.dumps(merge(n), indent=1))


if __name__ == "__main__":
    main()
