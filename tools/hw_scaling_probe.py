"""Hardware scaling ceiling probe (no Spark): how far can ANY job scale
8 -> 32 workers on this box?

Runs the engine's own murmur3 kernel (hashing.hash_u64s) in N independent
OS processes over WARM buffers (no page faults, no I/O, no JVM) and
reports aggregate throughput at each worker count, twice:

  streaming:       200k-element batches — numpy temporaries stream
                   through DRAM, the memory-access pattern of real
                   Arrow-batch kernels.
  cache_resident:  8k-element batches — working set fits in L2, pure ALU.

Interpretation (measured 2026-08-17 on this sandbox, 32 physical cores,
steal ~0): cache-resident scales ~3.9x from 8->32 procs (near-ideal), but
streaming scales only ~2.1x — the box saturates DRAM bandwidth at well
under 32 cores' worth of streaming traffic. A real cluster going N -> 4N
EXECUTORS multiplies memory bandwidth by 4 (separate machines); a single
box cannot. Any bandwidth-heavy job therefore measures artificially low
N->4N efficiency on this sandbox at high core counts — which is why the
scaling evidence reports the 2->8-core pair (both levels far from the
bandwidth wall) alongside the 8->32 pair and this probe.

Usage: python tools/hw_scaling_probe.py  [> probe.json]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys

import numpy as np


def _worker(q, barrier, iters: int, n_elem: int) -> None:
    sys.path.insert(0, "/root/repo")
    from datasketches_rust_spark.hashing import hash_u64s
    data = np.arange(n_elem, dtype=np.uint64)
    hash_u64s(data)  # warm the buffers + JIT-ish numpy paths
    barrier.wait()
    import time
    t0 = time.time()
    for _ in range(iters):
        hash_u64s(data)
    q.put(time.time() - t0)


def _run(nproc: int, iters: int, n_elem: int) -> dict:
    import time
    q = mp.Queue()
    barrier = mp.Barrier(nproc + 1)
    ps = [mp.Process(target=_worker, args=(q, barrier, iters, n_elem))
          for _ in range(nproc)]
    for p in ps:
        p.start()
    barrier.wait()  # all workers warmed before the clock starts
    t0 = time.time()
    times = [q.get() for _ in ps]
    for p in ps:
        p.join()
    wall = time.time() - t0
    return {"procs": nproc,
            "wall_sec": round(wall, 2),
            "avg_worker_sec": round(float(np.mean(times)), 2),
            "mhash_per_sec": round(nproc * iters * n_elem / wall / 1e6, 1)}


def main() -> None:
    out = {}
    for label, n_elem, iters in (("streaming", 200_000, 400),
                                 ("cache_resident", 8_000, 8000)):
        r2 = _run(2, iters, n_elem)
        r8 = _run(8, iters, n_elem)
        r32 = _run(32, iters, n_elem)
        out[label] = {
            "local2": r2, "local8": r8, "local32": r32,
            "scaling_2_to_8": round(
                r8["mhash_per_sec"] / r2["mhash_per_sec"], 2),
            "scaling_8_to_32": round(
                r32["mhash_per_sec"] / r8["mhash_per_sec"], 2)}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
