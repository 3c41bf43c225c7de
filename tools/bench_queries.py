"""Isolated per-query timing with repeats (guide §1.4): one Spark
session, each named query run ``--reps`` times through the same
toPandas sink bench.py uses (or a noop sink with --noop), reporting
all samples + min. Separate from the frozen bench.py by design.

Usage: python tools/bench_queries.py [--reps 3] [--noop] name [name ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

from avro_conversions_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    from avro_conversions_spark.operators.queries import QUERIES

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(app_name="bench_queries", master=f"local[{cpus}]")
    out = {}
    for name in args.names:
        samples = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            t0 = time.perf_counter()
            df = QUERIES[name](spark, args.sf_dir)
            if args.noop:
                df.write.format("noop").mode("overwrite").save()
            else:
                df.toPandas()
            samples.append(round(time.perf_counter() - t0, 3))
        out[name] = {"samples": samples, "min": min(samples)}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps({"all": out}))
    spark.stop()


if __name__ == "__main__":
    main()
