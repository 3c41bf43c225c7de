"""End-of-round recorder: hunt for both-gates-clean windows (ALU +
memory-bandwidth, tools/bench_window.py protocol) and record, in order:

  1. the full suite (bench.py) — best validated window wins;
  2. 10x scale legs (sf0.01 vs sf0.1) for the late-round operators —
     a JIT warm-up pass runs each query once at sf0.01 BEFORE timing so
     the small leg doesn't carry the once-per-plan compile cost, then
     each leg is min-of-2; the leg pair is calibration-bracketed.

Appends suite records to BENCH/suite_windows.jsonl (via bench_window
conventions) and leg records to BENCH/tenx_r5.jsonl. Runs until both
are captured or --hours elapse.
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
sys.path.insert(0, REPO)

from bench_window import mem_rate  # noqa: E402
from hunt_pair import SETTLE_S, _base_rate, calibrate, calibrate_post  # noqa: E402

LEGS_OUT = os.path.join(REPO, "BENCH", "tenx_r5.jsonl")
SUITE_OUT = os.path.join(REPO, "BENCH", "suite_windows.jsonl")
NAMES = [
    "semdedup_embeddings",
    "dsir_documents",
    "bm25_documents",
    "conv_profile_transcripts",
]

LEG_SCRIPT = r"""
import json, sys, time
from avro_conversions_spark import get_spark
from avro_conversions_spark.operators.queries import QUERIES
names = json.loads(sys.argv[1])
spark = get_spark()
# JIT warm-up: one untimed pass per query at the SMALL scale
for n in names:
    QUERIES[n](spark, "/root/testdata/sf0.01").collect()
out = {}
for n in names:
    for sf, d in (("0.01", "/root/testdata/sf0.01"), ("0.1", "/root/testdata/sf0.1")):
        best = 1e9
        for _ in range(2):
            t0 = time.perf_counter()
            QUERIES[n](spark, d).collect()
            best = min(best, time.perf_counter() - t0)
        out.setdefault(n, {})[sf] = round(best, 2)
print("LEGS " + json.dumps(out))
spark.stop()
"""


def gates(base: float) -> tuple[float, float]:
    return calibrate(base), mem_rate()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gate", type=float, default=7.2)
    ap.add_argument("--mem-gate", type=float, default=0.7)
    ap.add_argument("--hours", type=float, default=3.0)
    args = ap.parse_args()
    deadline = time.time() + args.hours * 3600

    base = _base_rate()
    mem_base = max(mem_rate() for _ in range(2))
    print(f"bases: {base:.0f} ops/s, {mem_base:.1f} GB/s", flush=True)
    need_suite, need_legs = True, True

    while (need_suite or need_legs) and time.time() < deadline:
        nb = _base_rate(seconds=1.0, samples=1)
        base = max(base, nb)
        pre_alu, pre_mem = gates(base)
        mem_base = max(mem_base, pre_mem)
        clean = pre_alu >= args.gate and pre_mem >= args.mem_gate * mem_base
        print(
            f"pre: alu {pre_alu:.2f}/8 mem {pre_mem:.0f}/{mem_base:.0f} "
            f"{'CLEAN' if clean else 'dirty'} "
            f"(need suite={need_suite} legs={need_legs})",
            flush=True,
        )
        if not clean:
            time.sleep(90)
            continue

        if need_suite:
            t0 = time.perf_counter()
            run = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")],
                capture_output=True, text=True,
            )
            wall = time.perf_counter() - t0
            try:
                bench = json.loads(run.stdout.strip().splitlines()[-1])
            except (json.JSONDecodeError, IndexError):
                print(f"bench failed rc={run.returncode}", flush=True)
                continue
            time.sleep(SETTLE_S)
            post_alu = calibrate_post(base)
            post_mem = max(mem_rate(), mem_rate())
            valid = (
                min(pre_alu, post_alu) >= args.gate
                and min(pre_mem, post_mem) >= args.mem_gate * mem_base
            )
            rec = {
                "ts": datetime.datetime.now(datetime.timezone.utc).isoformat(),
                "pre": round(pre_alu, 2), "post": round(post_alu, 2),
                "mem_pre_gbs": round(pre_mem, 1),
                "mem_post_gbs": round(post_mem, 1),
                "mem_base_gbs": round(mem_base, 1),
                "gate": args.gate, "mem_gate": args.mem_gate,
                "valid": valid, "wall_s": round(wall, 1),
                "suite_s": bench.get("value"),
                "n_queries": len(bench.get("queries", {})),
                "turns_per_sec": bench.get("turns_per_sec"),
                "queries": bench.get("queries"),
            }
            with open(SUITE_OUT, "a", encoding="utf-8") as fh:
                fh.write(json.dumps(rec) + "\n")
            print(
                f"suite: {bench['value']}s/{rec['n_queries']}q "
                f"{rec['turns_per_sec']} t/s window {pre_alu:.2f}/{post_alu:.2f} "
                f"mem {pre_mem:.0f}/{post_mem:.0f} "
                f"{'VALID' if valid else 'dirty'}",
                flush=True,
            )
            if valid:
                need_suite = False
            continue  # re-gate before the legs

        if need_legs:
            t0 = time.perf_counter()
            run = subprocess.run(
                [sys.executable, "-c", LEG_SCRIPT, json.dumps(NAMES)],
                capture_output=True, text=True, cwd=REPO,
            )
            wall = time.perf_counter() - t0
            line = next(
                (l for l in run.stdout.splitlines() if l.startswith("LEGS ")), ""
            )
            if not line:
                print(f"legs failed rc={run.returncode}", flush=True)
                continue
            legs = json.loads(line[5:])
            time.sleep(SETTLE_S)
            post_alu = calibrate_post(base)
            post_mem = max(mem_rate(), mem_rate())
            valid = (
                min(pre_alu, post_alu) >= args.gate
                and min(pre_mem, post_mem) >= args.mem_gate * mem_base
            )
            rec = {
                "ts": datetime.datetime.now(datetime.timezone.utc).isoformat(),
                "pre": round(pre_alu, 2), "post": round(post_alu, 2),
                "mem_pre_gbs": round(pre_mem, 1),
                "mem_post_gbs": round(post_mem, 1),
                "valid": valid, "wall_s": round(wall, 1),
                "legs": legs,
                "ratios": {
                    n: round(v["0.1"] / v["0.01"], 2) for n, v in legs.items()
                },
            }
            with open(LEGS_OUT, "a", encoding="utf-8") as fh:
                fh.write(json.dumps(rec) + "\n")
            print(
                f"legs {'VALID' if valid else 'dirty'}: {rec['ratios']}",
                flush=True,
            )
            if valid:
                need_legs = False

    print(f"done: suite={'ok' if not need_suite else 'MISSING'} "
          f"legs={'ok' if not need_legs else 'MISSING'}", flush=True)


if __name__ == "__main__":
    main()
