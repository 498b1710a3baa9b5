#!/usr/bin/env python
"""A/B the dedup strategies on a payload-heavy batch (the 100 TB question).

``window`` shuffles full payload rows once through the bucket-aligned
exchange (dedup + merge join + clustered write reuse that ONE exchange);
``rank_join`` never shuffles payload before the merge — it aggregates
(url, warc_ts, lsn) only, then joins winner ranks back against the
un-shuffled scan, paying a second tiny key shuffle instead of a payload
exchange.  Which wins depends on payload width vs the join's cost — this
measures both at html >= 4 KB so the decision is data, not argument.

Usage: python scripts/bench_dedup_modes.py [--events 200000]
       [--html-size 4096] [--cores 8] [--reps 2] [--rounds 2]
Prints one JSON line; appends a row to BASELINE.md unless --no-write.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_mode(mode: str, cores: int, events: int, html: int, reps: int) -> float:
    code = f"""
import json, sys
sys.path.insert(0, {REPO!r})
import os
os.environ["SPARK_GRAFT_DEDUP"] = {mode!r}
from giraffe_etl_spark.session import get_spark
from bench import run_cdc_bench
spark = get_spark("dedup-{mode}", cores={cores})
spark.sparkContext.setLogLevel("ERROR")
best = None
for rep in range({reps}):
    ev, apply_sec, wall = run_cdc_bench(
        spark, n_events={events}, batch_size={events}, html_size={html})
    if best is None or apply_sec < best:
        best = apply_sec
print("RESULT " + json.dumps({{"apply_sec": best}}))
spark.stop()
"""
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, cwd=REPO
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT "):
            return json.loads(line[len("RESULT "):])["apply_sec"]
    raise RuntimeError(f"mode {mode} failed:\n{out.stdout[-1500:]}\n{out.stderr[-3000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=200_000)
    ap.add_argument("--html-size", type=int, default=4096)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--rounds", type=int, default=2,
                    help="interleaved window/rank_join rounds; min per mode")
    ap.add_argument("--no-write", action="store_true")
    args = ap.parse_args()

    samples: dict[str, list[float]] = {"window": [], "rank_join": []}
    for rnd in range(args.rounds):
        for mode in ("window", "rank_join"):
            s = run_mode(mode, args.cores, args.events, args.html_size, args.reps)
            samples[mode].append(s)
            print(f"round {rnd} {mode}: {s:.2f}s", file=sys.stderr, flush=True)

    best = {m: min(v) for m, v in samples.items()}
    result = {
        "metric": "cdc dedup-mode A/B (payload-heavy)",
        "events": args.events,
        "html_size": args.html_size,
        "cores": args.cores,
        "window_sec": round(best["window"], 2),
        "rank_join_sec": round(best["rank_join"], 2),
        "samples": {m: [round(x, 2) for x in v] for m, v in samples.items()},
        "winner": min(best, key=best.get),
    }
    print(json.dumps(result))
    if not args.no_write:
        with open(os.path.join(REPO, "BASELINE.md"), "a") as f:
            f.write(
                f"\n<!-- bench_dedup_modes.py -->\n"
                f"| dedup A/B {args.events} ev x {args.html_size}B html, "
                f"local[{args.cores}] | window: {result['window_sec']}s | "
                f"rank_join: {result['rank_join_sec']}s | winner: "
                f"{result['winner']} |\n"
            )


if __name__ == "__main__":
    main()
