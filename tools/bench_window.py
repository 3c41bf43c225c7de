"""Calibration-bracketed suite bench: run bench.py inside a validated
clean window (same ALU-calibration protocol as tools/hunt_pair.py, which
documents the shared-VM noise model: co-tenant storms inflate walls up
to 10x and last minutes, so a suite time is only meaningful when the
window before AND after reads clean).

Protocol per attempt:
  1. pre-calibration (8-worker busy-loop, effective cores of 8)
  2. bench.py in a fresh subprocess (one JVM per measurement)
  3. 20 s settle + post-calibration (max of two samples 15 s apart —
     the post-JVM teardown tail under-reads, a real storm stays low)
A window is VALID when min(pre, post) >= GATE. Retries until valid or
--attempts exhausted; every attempt (valid or not) appends to
BENCH/suite_windows.jsonl so dirty-window walls stay visible.

Usage: python tools/bench_window.py [--gate 7.2] [--attempts 5]
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, HERE)

from hunt_pair import SETTLE_S, _base_rate, calibrate, calibrate_post  # noqa: E402

OUT = os.path.join(REPO, "BENCH", "suite_windows.jsonl")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gate", type=float, default=7.2)
    ap.add_argument("--attempts", type=int, default=5)
    args = ap.parse_args()

    base = _base_rate()
    print(f"base rate {base:.0f} ops/s", flush=True)
    for attempt in range(1, args.attempts + 1):
        pre = calibrate(base)
        print(f"[{attempt}] pre-calibration: {pre:.2f}/8", flush=True)
        if pre < args.gate:
            print("    dirty before start; waiting 60 s", flush=True)
            time.sleep(60)
            continue
        t0 = time.perf_counter()
        run = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True,
        )
        wall = time.perf_counter() - t0
        line = run.stdout.strip().splitlines()[-1] if run.stdout.strip() else ""
        try:
            bench = json.loads(line)
        except (json.JSONDecodeError, IndexError):
            print(f"    bench failed rc={run.returncode}: {run.stderr[-500:]}")
            sys.exit(1)
        time.sleep(SETTLE_S)
        post = calibrate_post(base)
        valid = min(pre, post) >= args.gate
        rec = {
            "ts": datetime.datetime.now(datetime.timezone.utc).isoformat(),
            "pre": round(pre, 2),
            "post": round(post, 2),
            "gate": args.gate,
            "valid": valid,
            "wall_s": round(wall, 1),
            "suite_s": bench.get("value"),
            "n_queries": len(bench.get("queries", {})),
            "turns_per_sec": bench.get("turns_per_sec"),
            "queries": bench.get("queries"),
        }
        with open(OUT, "a", encoding="utf-8") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(
            f"[{attempt}] window {pre:.2f}/{post:.2f} "
            f"{'VALID' if valid else 'dirty'}: suite {bench['value']}s / "
            f"{rec['n_queries']} q, {rec['turns_per_sec']} turns/s",
            flush=True,
        )
        if valid:
            return
    print("no valid window found", flush=True)
    sys.exit(2)


if __name__ == "__main__":
    main()
