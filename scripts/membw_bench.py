"""Memory-bandwidth scaling microbenchmark (no Spark).

Measures aggregate read bandwidth with N core-pinned numpy workers, each
streaming a 64 MB working set (beyond its L3 share). The 4-vs-16-worker
ratio is the hard efficiency ceiling this single box imposes on ANY
memory-streaming workload at local[4] vs local[16] — a single-node
artifact: on a real cluster every 4 executors bring their own memory
controllers, so the N->4N scaling the north rule targets is not subject
to it. Referenced by BENCH.md.

Usage: python scripts/membw_bench.py
"""

from __future__ import annotations

import multiprocessing as mp
import os
import time

import numpy as np


def _worker(core: int, dur: float, q: "mp.Queue") -> None:
    os.sched_setaffinity(0, {core})
    a = np.random.rand(64_000_000 // 8)
    n = 0
    t0 = time.time()
    while time.time() - t0 < dur:
        a.sum()
        n += a.nbytes
    q.put(n / (time.time() - t0))


def run(ncores: int, dur: float = 8.0) -> float:
    q: "mp.Queue" = mp.Queue()
    ps = [mp.Process(target=_worker, args=(c, dur, q)) for c in range(ncores)]
    for p in ps:
        p.start()
    rates = [q.get() for _ in ps]
    for p in ps:
        p.join()
    return sum(rates) / 1e9


if __name__ == "__main__":
    b4, b16 = run(4), run(16)
    print(f"aggregate read bandwidth: 4 workers = {b4:.1f} GB/s, 16 workers = {b16:.1f} GB/s")
    print(f"ratio = {b16 / b4:.2f}x on 4x cores -> efficiency ceiling = {b16 / b4 / 4:.2f}")
