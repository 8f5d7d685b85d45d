"""30-second host-health probe: memory-bandwidth scaling at 8 vs 32 pinned
workers, mirroring bench.py's cached-scan control without paying a Spark
session. Efficiency >=0.85 ~= a clean window worth spending on a real
--scaling sample; <=0.7 means the hypervisor is stealing and any engine
measurement taken now is noise (see BENCH/BASELINE.md control history).

Usage: python BENCH/host_probe.py  -> one JSON line
"""
import json
import os
import sys
import time
from multiprocessing import Process, Queue

import numpy as np

MB = 64  # per-worker array; big enough to defeat L2/L3, small enough to fork fast
SECS = 2.5


def _worker(core: int, q: Queue, nbytes: int) -> None:
    os.sched_setaffinity(0, {core})
    a = np.random.default_rng(core).random(nbytes // 8)
    # warm
    a.sum()
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < SECS:
        a.sum()
        n += 1
    dt = time.perf_counter() - t0
    q.put(n * a.nbytes / dt)


def _rand_worker(core: int, q: Queue, nbytes: int) -> None:
    """Random-gather probe: scattered DRAM loads over a working set far
    beyond LLC — the access pattern of the engine's sort/window stage
    (UnsafeExternalSorter pointer dereferences), which the streaming
    probes above cannot feel. The documented bimodal host regime
    (identical window tasks at ~4.4s vs ~15s; see BENCH/BASELINE.md)
    taxes exactly this pattern, so its 8->32 scaling is the regime
    detector the L2 compute probe is blind to."""
    os.sched_setaffinity(0, {core})
    rng = np.random.default_rng(core)
    a = rng.random(nbytes // 8)
    idx = rng.integers(0, a.size, 4 * 1024 * 1024)
    a[idx].sum()  # warm
    n = 0
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < SECS:
        a[idx].sum()
        n += 1
    dt = time.perf_counter() - t0
    q.put(n * idx.size / dt)  # random loads / sec


def measure(cores: list, nbytes: int, worker=_worker) -> float:
    q: Queue = Queue()
    ps = [Process(target=worker, args=(c, q, nbytes)) for c in cores]
    for p in ps:
        p.start()
    vals = [q.get(timeout=120) for _ in ps]
    for p in ps:
        p.join()
    return sum(vals)


def main() -> None:
    # compute probe: 256 KB array is L2-resident, so 32 pinned workers
    # scale ~4x over 8 on a clean host regardless of DRAM bandwidth —
    # deviation below ~0.9 is CPU steal / timer trouble, the signal that
    # poisons engine measurements.
    c8 = measure(list(range(8)), 256 * 1024)
    c32 = measure(list(range(32)), 256 * 1024)
    ceff = c32 / (4 * c8)
    # bandwidth probe: 64 MB arrays stream DRAM; its efficiency is the
    # hard memory ceiling a cached-scan workload shares. Low values here
    # with a clean compute probe = saturation, not steal.
    bw8 = measure(list(range(8)), MB * 1024 * 1024)
    bw32 = measure(list(range(32)), MB * 1024 * 1024)
    beff = bw32 / (4 * bw8)
    # random-access probe: 256 MB working set per worker, scattered
    # gathers — the sort/window-stage access pattern. Low rand_eff with
    # a clean compute probe = the memory-stall regime in which the
    # engine's exchange-heavy 32-thread runs inflate ~2x while the
    # streaming control stays clean.
    r8 = measure(list(range(8)), 256 * 1024 * 1024, worker=_rand_worker)
    r32 = measure(list(range(32)), 256 * 1024 * 1024, worker=_rand_worker)
    reff = r32 / (4 * r8)
    print(
        json.dumps(
            {
                "compute_eff": round(ceff, 3),
                "bandwidth_eff": round(beff, 3),
                "rand_eff": round(reff, 3),
                "gbps_8": round(bw8 / 1e9, 2),
                "gbps_32": round(bw32 / 1e9, 2),
                "mrps_8": round(r8 / 1e6, 1),
                "mrps_32": round(r32 / 1e6, 1),
                "clean": ceff >= 0.9,
                "ts": time.time(),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
