#!/usr/bin/env python
"""Host-scaling control: pure-CPU work in K independent processes.

Zero Spark, zero shared state, zero I/O — each worker hashes a private
buffer in a tight loop.  If THIS doesn't scale from K to 4K processes,
no engine on this host can: the measurement bounds the hardware's
(hypervisor's) achievable scaling, which is why the engine's
scaling-efficiency evidence (scripts/bench_scaling.py) defaults to the
1-vs-4 pair — the control shows the box sustains near-linear scaling
there and falls off past ~4-8 concurrent compute-bound processes
(vCPUs are oversubscribed / memory-bandwidth-bound).

Usage: python scripts/cpu_control.py [--levels 1,2,4,8,16,32] [--secs 6]
Prints one JSON line; append-friendly for BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import time
import zlib


def _worker(barrier, secs: float, out) -> None:
    buf = bytes(range(256)) * 256  # 64 KiB private buffer (L2-resident)
    barrier.wait()  # timing starts only after every worker is set up
    stop_t = time.monotonic() + secs
    n = 0
    crc = 0
    while time.monotonic() < stop_t:
        crc = zlib.crc32(buf, crc)
        n += 1
    out.put(n)


def _worker_mem(barrier, secs: float, out) -> None:
    """Memory-bandwidth-bound variant: stream-copy a 64 MiB buffer.

    Spark's shuffle/write path is closer to this than to the
    L2-resident crc loop — per-core bandwidth shrinks as concurrent
    streams saturate the memory controller, so this control bounds the
    scaling a shuffle-heavy stage can reach on this host.
    """
    import numpy as np

    src = np.arange(8 * 1024 * 1024, dtype=np.int64)  # 64 MiB
    dst = np.empty_like(src)
    np.copyto(dst, src)  # fault both buffers in before timing
    barrier.wait()
    stop_t = time.monotonic() + secs
    n = 0
    while time.monotonic() < stop_t:
        np.copyto(dst, src)
        n += 1
    out.put(n)


def measure(k: int, secs: float, kind: str = "cpu") -> float:
    """Aggregate work-rounds/sec across k processes."""
    fn = _worker if kind == "cpu" else _worker_mem
    q: mp.Queue = mp.Queue()
    barrier = mp.Barrier(k)
    procs = [mp.Process(target=fn, args=(barrier, secs, q)) for _ in range(k)]
    for p in procs:
        p.start()
    total = sum(q.get() for _ in procs)
    for p in procs:
        p.join()
    return total / secs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="1,2,4,8,16,32")
    ap.add_argument("--secs", type=float, default=6.0)
    ap.add_argument("--rounds", type=int, default=2,
                    help="repeat each level; max kept (noise only subtracts)")
    ap.add_argument("--kind", default="cpu", choices=["cpu", "mem"],
                    help="cpu: L2-resident crc loop; mem: 64MiB stream copy")
    args = ap.parse_args()
    levels = [int(x) for x in args.levels.split(",")]
    rates = {}
    for rnd in range(args.rounds):
        for k in levels:
            r = measure(k, args.secs, args.kind)
            rates[k] = max(rates.get(k, 0.0), r)
    base = rates[levels[0]]
    label = ("pure-CPU process-scaling control (crc32 loop)"
             if args.kind == "cpu"
             else "memory-bandwidth process-scaling control (64MiB stream copy)")
    result = {
        "metric": label,
        "rates_per_sec": {str(k): round(v, 0) for k, v in rates.items()},
        "speedup_vs_1": {str(k): round(rates[k] / base, 2) for k in levels},
        "efficiency_vs_1": {
            str(k): round(rates[k] / base / k, 3) for k in levels
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
