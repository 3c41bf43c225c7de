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


def mem_rate(seconds: float = 3.0) -> float:
    """Memory-bandwidth probe (GB/s streamed by one process): the ALU
    busy-loop gate is register-only and blind to host memory-bandwidth
    co-tenancy — the round-3-documented blindspot that let a validated
    7.46/7.45 window carry a 4.6x-inflated suite (bandwidth-bound
    queries 10-35x, ALU-bound ~1x; see suite_windows.jsonl). Streaming
    a 512 MB float64 sum is the cheapest probe that sees it."""
    import numpy as np

    a = np.zeros(64_000_000, dtype=np.float64)  # 512 MB, cold pages zeroed
    a.sum()  # fault pages in before timing
    n = 0
    gb = a.nbytes / 1e9
    t0 = time.perf_counter()
    while time.perf_counter() - t0 < seconds:
        a.sum()
        n += 1
    return n * gb / (time.perf_counter() - t0)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gate", type=float, default=7.2)
    ap.add_argument("--mem-gate", type=float, default=0.7,
                    help="min fraction of the session-start memory rate")
    ap.add_argument("--attempts", type=int, default=5)
    args = ap.parse_args()

    base = _base_rate()
    mem_base = max(mem_rate() for _ in range(2))
    print(f"base rate {base:.0f} ops/s, mem base {mem_base:.1f} GB/s", flush=True)
    for attempt in range(1, args.attempts + 1):
        # bases are monotone maxima over the session: a base captured in
        # a slow moment makes every later gate read optimistically high
        # (observed: 9.01 "effective cores of 8"), so fold each attempt's
        # fresh single-thread/memory samples back into the denominators
        new_base = _base_rate(seconds=1.0, samples=1)
        if new_base > base:
            base = new_base
            print(f"    base raised to {base:.0f} ops/s", flush=True)
        pre = calibrate(base)
        mem_pre = mem_rate()
        if mem_pre > mem_base:
            mem_base = mem_pre
        print(
            f"[{attempt}] pre: {pre:.2f}/8 alu, {mem_pre:.1f} GB/s "
            f"({mem_pre / mem_base:.2f} of base)",
            flush=True,
        )
        if pre < args.gate or mem_pre < args.mem_gate * mem_base:
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
        mem_post = max(mem_rate(), mem_rate())
        valid = (
            min(pre, post) >= args.gate
            and min(mem_pre, mem_post) >= args.mem_gate * mem_base
        )
        rec = {
            "ts": datetime.datetime.now(datetime.timezone.utc).isoformat(),
            "pre": round(pre, 2),
            "post": round(post, 2),
            "mem_pre_gbs": round(mem_pre, 1),
            "mem_post_gbs": round(mem_post, 1),
            "mem_base_gbs": round(mem_base, 1),
            "gate": args.gate,
            "mem_gate": args.mem_gate,
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
            f"[{attempt}] window alu {pre:.2f}/{post:.2f}, "
            f"mem {mem_pre:.0f}/{mem_post:.0f} GB/s "
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
