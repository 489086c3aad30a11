"""Aggregate memory-bandwidth probe — the attribution instrument for
pair-B scaling evidence (BENCH/BASELINE.md).

Runs N pinned processes, each repeatedly copying a 32 MB buffer (warm
pages, no allocation in the timed loop), and reports aggregate
read+write GB/s.  If the box's copy bandwidth does not scale 4x from
N to 4N cores, no bandwidth-bound pipeline on this box can either —
that ceiling belongs to the single shared memory system, not the code.

Usage: python scripts/membw_probe.py [cores ...]   (default 2 8 32)
"""

from __future__ import annotations

import multiprocessing as mp
import os
import sys
import time

import numpy as np

BUF_BYTES = 32_000_000
SECONDS = 4.0


def _worker(q, barrier, cpu: int) -> None:
    os.sched_setaffinity(0, {cpu})
    a = np.random.default_rng(cpu).integers(0, 255, size=BUF_BYTES, dtype=np.uint8)
    b = np.empty_like(a)
    np.copyto(b, a)  # fault in both buffers before timing
    barrier.wait()
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < SECONDS:
        np.copyto(b, a)
        n += 1
    q.put(n * a.nbytes * 2 / (time.perf_counter() - t0))


def measure(ncores: int) -> float:
    q: mp.Queue = mp.Queue()
    barrier = mp.Barrier(ncores)
    ps = [mp.Process(target=_worker, args=(q, barrier, i)) for i in range(ncores)]
    for p in ps:
        p.start()
    total = sum(q.get() for _ in ps)
    for p in ps:
        p.join()
    return total / 1e9


def main() -> None:
    sizes = [int(x) for x in sys.argv[1:]] or [2, 8, 32]
    results = {}
    for n in sizes:
        results[n] = measure(n)
        print(f"{n} cores: {results[n]:.1f} GB/s aggregate copy "
              f"({results[n]/n:.2f} GB/s/core)")
    ordered = sorted(results)
    for lo, hi in zip(ordered, ordered[1:]):
        if hi == 4 * lo:
            eff = results[hi] / (4 * results[lo])
            print(f"copy-bandwidth scaling efficiency {lo}->{hi}: {eff:.3f}")


if __name__ == "__main__":
    main()
