"""Synthesize a 10x (sf1-equivalent) dataset from the driver's sf0.1
parquet by unioning 10 key-shifted copies — referential integrity is
preserved (orders.o_custkey shifts with customer.c_custkey, lineitem's
order/part/supp keys shift with their parents), small dims (region,
nation) stay fixed, and text/embedding payloads repeat (which gives the
dedup operators a realistic 10-way duplicate load).  Output goes to
/tmp/testdata_sf1 (the brief forbids writing under /root/testdata).

Usage: python tools/make_sf1.py [out_dir]
Then:  SPARK_GRAFT_SF_DIR=/tmp/testdata_sf1 python bench.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from avro_conversions_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
COPIES = 10

# key columns to shift per table: {table: {column: stride_source_table}}
# stride = (max key of the stride-source's own key column) + 1, so shifted
# ranges never collide and children shift in lockstep with parents
KEYS = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {
        "o_orderkey": ("orders", "o_orderkey"),
        "o_custkey": ("customer", "c_custkey"),
    },
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    "events": {"event_id": ("events", "event_id")},
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}
SMALL_DIMS = ["region", "nation"]


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf1"
    spark = get_spark(app_name="make_sf1", master="local[32]")
    strides: dict[str, int] = {}
    for t, col in {
        "customer": "c_custkey",
        "supplier": "s_suppkey",
        "part": "p_partkey",
        "orders": "o_orderkey",
        "events": "event_id",
        "documents": "doc_id",
        "embeddings": "vec_id",
    }.items():
        strides[t] = (
            spark.read.parquet(f"{SRC}/{t}.parquet").agg(F.max(col)).collect()[0][0]
            + 1
        )

    os.makedirs(out, exist_ok=True)
    for t in SMALL_DIMS:
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
        print(f"{t}: copied")

    for t, cols in KEYS.items():
        df: DataFrame = spark.read.parquet(f"{SRC}/{t}.parquet")
        copies = df.crossJoin(
            spark.range(COPIES).withColumnRenamed("id", "_copy")
        )
        for col, (src_t, _src_c) in cols.items():
            copies = copies.withColumn(
                col, F.col(col) + F.col("_copy") * F.lit(strides[src_t])
            )
        copies.drop("_copy").repartition(32).write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
        n = spark.read.parquet(f"{out}/{t}.parquet").count()
        print(f"{t}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
