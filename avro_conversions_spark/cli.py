"""spark-submit entry point (north rule: `spark-submit --py-files`).

    spark-submit --py-files avro_conversions_spark.zip main.py \
        --input /path/to/transcripts \
        --spec constraints.json \
        --verdicts out/verdicts --violations out/violations \
        --ledger out/ledger --run-id nightly-2026-08-16 [--buckets 64]

The constraint spec is declarative JSON (the DSL's serialized form — the
analogue of supplying a write schema + read schema pair to the reference's
parser constructors):

{
  "key_cols": ["conv_id", "turn_idx"],
  "constraints": [
    {"kind": "not_null", "column": "conv_id"},
    {"kind": "enum", "column": "role",
     "symbols": ["system", "user", "assistant", "tool"]},
    {"kind": "enum", "column": "status", "symbols": ["ok"], "default": "ok"},
    {"kind": "range", "column": "turn_idx", "lo": 0, "hi": 2147483647},
    {"kind": "regex", "column": "conv_id", "pattern": "^conv-"},
    {"kind": "strlen", "column": "text", "lo": 1, "hi": 100000},
    {"kind": "decimal", "column": "amount", "precision": 10, "scale": 2},
    {"kind": "fixed_length", "column": "digest", "size": 16},
    {"kind": "unique", "columns": ["conv_id", "turn_idx"]},
    {"kind": "ref", "column": "tool", "dim_path": "/path/tool_catalog",
     "dim_column": "tool_name"},
    {"kind": "sequence", "conv_col": "conv_id", "idx_col": "turn_idx",
     "ts_col": "ts"},
    {"kind": "drift", "columns": ["turn_idx"], "baseline": "/path/base",
     "threshold": 0.1}
  ]
}
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession

from avro_conversions_spark.constraints import (
    ReferentialConstraint,
    SequenceConstraint,
    UniqueConstraint,
    decimal_fits,
    enum_in,
    fixed_length,
    not_null,
    range_check,
    regex_match,
    str_len_between,
)
from avro_conversions_spark.engine import ValidationEngine
from avro_conversions_spark.ledger import ParquetLedger, ResumableValidation


def engine_from_spec(spark: SparkSession, spec: dict) -> tuple[ValidationEngine, list]:
    row, uniq, ref, seq, drift = [], [], [], [], []
    for c in spec.get("constraints", []):
        kind = c["kind"]
        if kind == "not_null":
            row.append(not_null(c["column"]))
        elif kind == "enum":
            row.append(enum_in(c["column"], c["symbols"], c.get("default")))
        elif kind == "range":
            row.append(range_check(c["column"], c.get("lo"), c.get("hi")))
        elif kind == "regex":
            row.append(regex_match(c["column"], c["pattern"]))
        elif kind == "strlen":
            row.append(str_len_between(c["column"], c.get("lo", 0), c.get("hi")))
        elif kind == "decimal":
            row.append(decimal_fits(c["column"], c["precision"], c["scale"]))
        elif kind == "fixed_length":
            row.append(fixed_length(c["column"], c["size"]))
        elif kind == "unique":
            uniq.append(UniqueConstraint(tuple(c["columns"])))
        elif kind == "ref":
            dim = spark.read.parquet(c["dim_path"])
            ref.append(
                ReferentialConstraint(
                    c["column"], dim, c["dim_column"], broadcast=c.get("broadcast", True)
                )
            )
        elif kind == "sequence":
            seq.append(
                SequenceConstraint(
                    conv_col=c.get("conv_col", "conv_id"),
                    idx_col=c.get("idx_col", "turn_idx"),
                    ts_col=c.get("ts_col"),
                    start=c.get("start", 0),
                )
            )
        elif kind == "drift":
            from avro_conversions_spark.constraints.drift import DriftConstraint

            drift.append(
                DriftConstraint(c["columns"], c["baseline"], c.get("threshold", 0.1))
            )
        else:
            raise ValueError(f"unknown constraint kind {kind!r}")
    eng = ValidationEngine(
        row_constraints=row,
        unique_constraints=uniq,
        referential_constraints=ref,
        sequence_constraints=seq,
        key_cols=tuple(spec.get("key_cols", ("conv_id", "turn_idx"))),
    )
    return eng, drift


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="transcript-validator")
    ap.add_argument("--input", required=True, help="parquet path or table name")
    ap.add_argument("--spec", required=True, help="constraint spec JSON file")
    ap.add_argument("--verdicts", help="output parquet path for verdicts")
    ap.add_argument("--violations", help="output parquet path for violation rows")
    ap.add_argument("--ledger", help="watermark ledger path (enables resume)")
    ap.add_argument("--run-id", default="run-0")
    ap.add_argument("--buckets", type=int, default=16)
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("transcript-validator").getOrCreate()
    with open(args.spec) as f:
        spec = json.load(f)
    eng, drift = engine_from_spec(spark, spec)
    df = (
        spark.read.parquet(args.input)
        if "/" in args.input
        else spark.read.table(args.input)
    )

    if args.ledger:
        ledger = ParquetLedger(spark, args.ledger)
        rv = ResumableValidation(engine=eng, ledger=ledger, n_buckets=args.buckets)
        done = rv.run(df, args.run_id, args.verdicts, args.violations)
        print(json.dumps({"resumable": True, "partitions_validated": done}))
    else:
        res = eng.run(df, run_id=args.run_id)
        if args.verdicts:
            res.verdicts.write.mode("overwrite").parquet(args.verdicts)
        if args.violations:
            res.violations.write.mode("overwrite").parquet(args.violations)
        summary = {
            r["constraint"]: r["status"] for r in res.verdicts.collect()
        }
        print(json.dumps({"resumable": False, "verdicts": summary}))

    for d in drift:
        print(json.dumps({"drift": d.check(df)}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
