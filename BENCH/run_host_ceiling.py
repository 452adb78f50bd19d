#!/usr/bin/env python
"""Host compute-scaling ceiling probe (no Spark, no IO, no python-UDF
machinery): N pure-numpy worker processes hash-mix uint64 arrays for a
fixed wall window; reports per-process and total throughput at 8 and 32
processes plus /proc/stat steal ticks.

Purpose: separate WHAT THE BOX CAN DO from what the pipeline's plan does.
On this sandbox's co-tenant vCPUs, per-process throughput drops when all
32 vCPUs are busy (hypervisor steal + shared L3), capping ANY workload's
8->32-thread scaling efficiency well below 1.0. The pipeline's measured
N->4N efficiency should be read against this ceiling, not against 1.0 —
on a real cluster each executor owns its cores and the ceiling is ~1.0.

Run: python BENCH/run_host_ceiling.py  (~1 min; keep the box otherwise idle)
"""

from __future__ import annotations

import json
import multiprocessing as mp
import time

import numpy as np

WINDOW_S = 10
# 32 KB: L1-resident -> measures compute cycles, not memory bandwidth
N_ELEMS = 4_000


def _burn(q: mp.Queue) -> None:
    a = np.random.RandomState(0).randint(0, 1 << 30, N_ELEMS).astype(np.uint64)
    t0 = time.time()
    it = 0
    while time.time() - t0 < WINDOW_S:
        b = (a * np.uint64(0x9E3779B97F4A7C15)) ^ (a >> np.uint64(13))
        a = b + np.uint64(1)
        it += 1
    q.put(it * N_ELEMS)


def _steal() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def measure(p: int) -> dict:
    s0 = _steal()
    q: mp.Queue = mp.Queue()
    procs = [mp.Process(target=_burn, args=(q,)) for _ in range(p)]
    for x in procs:
        x.start()
    for x in procs:
        x.join()
    els = [q.get() for _ in range(p)]
    return {
        "procs": p,
        "per_proc_melem_s": round(sum(els) / len(els) / WINDOW_S / 1e6, 1),
        "total_melem_s": round(sum(els) / WINDOW_S / 1e6, 1),
        "steal_ticks": _steal() - s0,
    }


def main() -> None:
    import os

    # busy-vCPU pair, default the saturated 8->32 (matching local[4] ->
    # local[16]: each python-UDF task burns ~2 threads). Override with
    # CLPSPARK_CEILING_PROCS=4,16 for the UNSATURATED local[2]->local[8]
    # calibration pair.
    raw = os.environ.get("CLPSPARK_CEILING_PROCS", "8,32")
    try:
        sizes = tuple(int(x) for x in raw.split(","))
    except ValueError:
        raise SystemExit(
            f"CLPSPARK_CEILING_PROCS={raw!r}: expected two comma-separated "
            "positive ints, e.g. 8,32")
    if len(sizes) != 2 or sizes[0] <= 0 or sizes[1] <= sizes[0]:
        raise SystemExit(
            f"CLPSPARK_CEILING_PROCS={raw!r}: expected exactly two positive "
            "ints with lo < hi, e.g. 8,32")
    lo, hi = measure(sizes[0]), measure(sizes[1])
    ceiling = (hi["total_melem_s"] / lo["total_melem_s"]
               / (sizes[1] / sizes[0]))
    print(json.dumps({
        f"p{sizes[0]}": lo,
        f"p{sizes[1]}": hi,
        f"compute_scaling_ceiling_{sizes[0]}_to_{sizes[1]}":
            round(ceiling, 3),
    }))


if __name__ == "__main__":
    main()
