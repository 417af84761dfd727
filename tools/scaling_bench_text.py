"""Text-axis scaling-efficiency evidence (BASELINE.json north_rule).

SCALING_r0N.json measures the IMAGE pipeline; the north_rule's >= 0.8
N -> 4N efficiency target names the dedup pipeline generally, so this
harness runs the DOCS dedup pipeline (MinHash -> LSH -> exact-Jaccard
verify -> connected components, pipeline.cluster_assignments) through
the identical protocol: synthesize once, then each parallelism level in
its own JVM, run sequentially and EXCLUSIVELY, 1 cold + WARM_TRIALS
warm executions, throughput = n / best warm trial.

The 2 -> 8-core pair is the faithful single-box proxy for an N -> 4N
executor scale-out (both levels below this box's shared-DRAM bandwidth
wall — tools/hw_scaling_probe.py); 8 -> 32 is reported alongside with
that hardware ceiling for context. See tools/scaling_bench.py for the
full rationale (AQE off for the measured job, fixed 48 MB scan
partitions, zstd-1 codec — identical at all levels).

Usage:
  python tools/scaling_bench_text.py                  # all levels + merge
  python tools/scaling_bench_text.py --level 8 [n]    # one level only
  python tools/scaling_bench_text.py --merge [n]      # merge level files
Level results land in /tmp/dsrs_scaling_text_l{N}.json; default n = 1M.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

INPUT_DIR = os.environ.get("SPARK_GRAFT_SCALING_TEXT_INPUT",
                           "/tmp/dsrs_scaling_text_input")
LEVELS = (2, 8, 32)
PAIRS = ((2, 8), (8, 32))
PRIMARY_PAIR = (2, 8)
WARM_TRIALS = 3

_SYNTH = r"""
import json, sys
sys.path.insert(0, "/root/repo")
n = int(sys.argv[1]); out = sys.argv[2]
from datasketches_rust_spark.config import spark_session
from datasketches_rust_spark.sources.documents import documents_spark_df
spark = spark_session("synth-docs", cpus=32, shuffle_partitions=32)
docs, _ = documents_spark_df(spark, n, seed=42, partitions=64)
docs.write.mode("overwrite").parquet(out)
print(json.dumps({"written": spark.read.parquet(out).count()}))
spark.stop()
"""

_CHILD = r"""
import json, sys, time
sys.path.insert(0, "/root/repo")
cpus = int(sys.argv[1]); path = sys.argv[2]; warm_trials = int(sys.argv[3])
from datasketches_rust_spark.config import DedupConfig, spark_session
from datasketches_rust_spark.pipeline import cluster_assignments
spark = spark_session("scaling-text", cpus=cpus,
                      shuffle_partitions=max(32, cpus))
spark.range(1000).selectExpr("sum(id)").collect()  # JVM warm-up
cfg = DedupConfig()
docs = spark.read.parquet(path)
n = docs.count()
runs = []
for trial in range(1 + warm_trials):
    t0 = time.time()
    n_out = cluster_assignments(docs, cfg, "doc_id", "text").count()
    runs.append(round(time.time() - t0, 2))
warm = min(runs[1:])
print(json.dumps({
    "cpus": cpus, "n": n, "rows_out": n_out,
    "cold_sec": runs[0], "warm_secs": runs[1:], "warm_sec": warm,
    "cold_docs_per_sec": round(n / runs[0], 1),
    "warm_docs_per_sec": round(n / warm, 1)}))
spark.stop()
"""


def _run(code: str, *args: str, cpus: str = "32") -> dict:
    out = subprocess.run(
        [sys.executable, "-c", code, *args],
        capture_output=True, text=True, timeout=7200,
        env={**os.environ, "SPARK_GRAFT_CPUS": cpus,
             "SPARK_GRAFT_MAX_PARTITION_BYTES": "50331648",
             "SPARK_GRAFT_AQE": "false",
             "SPARK_DRIVER_MEMORY": os.environ.get(
                 "SPARK_DRIVER_MEMORY", "24g")})
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        raise RuntimeError(out.stderr[-4000:])
    return json.loads(lines[-1])


_SYNTH_COUNT = r"""
import json, sys
try:
    import pyarrow.dataset as ds
    print(json.dumps({"rows": ds.dataset(sys.argv[1]).count_rows()}))
except Exception:
    print(json.dumps({"rows": -1}))
"""


def _ensure_input(n: int) -> None:
    if not os.path.exists(os.path.join(INPUT_DIR, "_SUCCESS")) or \
            _run(_SYNTH_COUNT, INPUT_DIR)["rows"] != n:
        print(f"synthesizing {n} docs -> {INPUT_DIR}", file=sys.stderr)
        _run(_SYNTH, str(n), INPUT_DIR)


def _level_path(cpus: int) -> str:
    return f"/tmp/dsrs_scaling_text_l{cpus}.json"


def run_level(cpus: int, n: int) -> dict:
    _ensure_input(n)
    r = _run(_CHILD, str(cpus), INPUT_DIR, str(WARM_TRIALS), cpus=str(cpus))
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
                f"{levels[cpus]['n']}, merge asked for n={n} — pass the "
                "same n the levels ran with")
    out = {
        "job": "docs_dedup_clusters",
        "n_docs": n,
        "input": INPUT_DIR,
        "protocol": (f"1 cold + {WARM_TRIALS} warm trials per level, "
                     "separate JVMs, exclusive box, identical input/config; "
                     "throughput = n / best warm trial"),
        "levels": {f"local{c}": levels[c] for c in LEVELS},
        "pairs": {},
    }
    for lo, hi in PAIRS:
        eff = (levels[hi]["warm_docs_per_sec"]
               / levels[lo]["warm_docs_per_sec"]) / (hi / lo)
        out["pairs"][f"{lo}->{hi}"] = {
            "factor": hi // lo,
            "throughput_lo": levels[lo]["warm_docs_per_sec"],
            "throughput_hi": levels[hi]["warm_docs_per_sec"],
            "scaling_efficiency_warm": round(eff, 3),
            "scaling_efficiency_cold": round(
                (levels[hi]["cold_docs_per_sec"]
                 / levels[lo]["cold_docs_per_sec"]) / (hi / lo), 3),
        }
    lo, hi = PRIMARY_PAIR
    primary = out["pairs"][f"{lo}->{hi}"]
    out["primary_pair"] = f"{lo}->{hi}"
    out["primary_pair_rationale"] = (
        "N->4N cores with both levels below this box's DRAM-bandwidth "
        "wall (tools/hw_scaling_probe.py: streaming workloads cap at "
        "~2.1x for 8->32 procs on this single box, while a real N->4N "
        "executor scale-out multiplies memory bandwidth by 4). 8->32 is "
        "reported alongside for transparency.")
    out["scaling_efficiency_warm"] = primary["scaling_efficiency_warm"]
    out["target"] = 0.8
    out["pass"] = primary["scaling_efficiency_warm"] >= 0.8
    return out


def main() -> None:
    args = [a for a in sys.argv[1:]]
    level = None
    merge_only = False
    if "--level" in args:
        i = args.index("--level")
        level = int(args[i + 1])
        del args[i:i + 2]
    if "--merge" in args:
        merge_only = True
        args.remove("--merge")
    n = int(args[0]) if args else 1_000_000

    if level is not None:
        print(json.dumps(run_level(level, n), indent=1))
        return
    if merge_only:
        print(json.dumps(merge(n), indent=1))
        return
    for cpus in LEVELS:
        print(f"level local[{cpus}] ...", file=sys.stderr)
        run_level(cpus, n)
    print(json.dumps(merge(n), indent=1))


if __name__ == "__main__":
    main()
