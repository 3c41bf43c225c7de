"""Large-scale stress leg (VERDICT r3 #7): run the flagship engine + dedup
pipeline ONCE at ~10^8 turns and record peak JVM memory, shuffle-spill
disk, and any cliff (t-digest groups, winnow arrays, uniqueness
candidates).

Monitoring is external and honest: a sampler thread reads the JVM's
/proc RSS, the JVM heap via py4j Runtime, and the size of this session's
shuffle/blockmgr spill dirs every 2 s while the job runs.

Usage: python tools/stress_leg.py [n_convs]   (default 10_000_000 -> 1e8 turns)
Writes a JSON line + appends a section to BENCH/BASELINE.md is left to the
operator (numbers print to stdout).
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from avro_conversions_spark.session import get_spark  # noqa: E402
from bench_scaling import build_engine  # noqa: E402  (tools/ on path)

DATA = os.environ.get("ACS_STRESS_DATA", "/tmp/stress_leg_transcripts")


def jvm_pids() -> list[int]:
    out = subprocess.run(["pgrep", "-f", "java.*pyspark"], capture_output=True, text=True)
    pids = [int(p) for p in out.stdout.split()]
    if not pids:
        out = subprocess.run(["pgrep", "java"], capture_output=True, text=True)
        pids = [int(p) for p in out.stdout.split()]
    return pids


def rss_bytes(pid: int) -> int:
    try:
        with open(f"/proc/{pid}/status") as fh:
            for line in fh:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) * 1024
    except OSError:
        return 0
    return 0


def spill_bytes() -> int:
    total = 0
    for d in glob.glob("/tmp/blockmgr-*") + glob.glob("/tmp/spark-*"):
        out = subprocess.run(["du", "-sb", d], capture_output=True, text=True)
        try:
            total += int(out.stdout.split()[0])
        except (ValueError, IndexError):
            pass
    return total


class Monitor(threading.Thread):
    def __init__(self, spark):
        super().__init__(daemon=True)
        self.spark = spark
        self.stop_flag = False
        self.peak_rss = 0
        self.peak_heap = 0
        self.base_spill = spill_bytes()
        self.peak_spill = 0

    def run(self):
        rt = self.spark._jvm.java.lang.Runtime.getRuntime()
        pids = jvm_pids()
        while not self.stop_flag:
            self.peak_rss = max(self.peak_rss, sum(rss_bytes(p) for p in pids))
            try:
                self.peak_heap = max(
                    self.peak_heap, rt.totalMemory() - rt.freeMemory()
                )
            except Exception:
                pass
            self.peak_spill = max(self.peak_spill, spill_bytes() - self.base_spill)
            time.sleep(2)


def main() -> None:
    import shutil

    from pyspark.sql import functions as F

    from avro_conversions_spark import dedup
    from avro_conversions_spark.transcripts import transcripts

    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000

    if not os.path.exists(DATA) or os.environ.get("ACS_STRESS_REGEN") == "1":
        shutil.rmtree(DATA, ignore_errors=True)
        t0 = time.perf_counter()
        spark = get_spark(app_name="stress-gen", master="local[32]")
        transcripts(
            spark,
            n_convs=n_convs,
            turns_per_conv=10,
            corruptions={"role_invalid", "dangling_tool", "dup_key", "ts_regression"},
        ).write.mode("overwrite").parquet(DATA)
        print(f"generated in {time.perf_counter() - t0:.0f}s", flush=True)
        spark.stop()

    spark = get_spark(app_name="stress", master="local[32]", shuffle_partitions=128)
    df = spark.read.parquet(DATA)
    n = df.count()
    print(f"rows: {n:,}", flush=True)

    mon = Monitor(spark)
    mon.start()
    t0 = time.perf_counter()
    eng = build_engine(spark, rich=True)
    res = eng.run(df, run_id="stress")
    res.verdicts.collect()
    n_viol = res.violations.count()
    t_engine = time.perf_counter() - t0

    t1 = time.perf_counter()
    sig = dedup.with_minhash_signature(df, "text", num_hashes=8, hash_fn="xxhash")
    n_sig = (
        sig.agg(
            F.approx_count_distinct(
                F.concat_ws(
                    "_", F.transform(F.col("minhash_sig"), lambda x: x.cast("string"))
                )
            ).alias("n")
        ).collect()[0]["n"]
    )
    t_minhash = time.perf_counter() - t1
    mon.stop_flag = True
    mon.join(timeout=5)

    print(
        json.dumps(
            {
                "turns": n,
                "violations": n_viol,
                "distinct_signatures": n_sig,
                "engine_sec": round(t_engine, 1),
                "minhash_sec": round(t_minhash, 1),
                "turns_per_sec_engine": round(n / t_engine),
                "peak_rss_gib": round(mon.peak_rss / 2**30, 2),
                "peak_jvm_heap_gib": round(mon.peak_heap / 2**30, 2),
                "peak_spill_gib": round(mon.peak_spill / 2**30, 2),
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
