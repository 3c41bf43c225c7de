"""As-of join: for each left row, the latest right row with
right_ts <= left_ts per key — the operator Spark lacks natively
(SURVEY task brief: custom operators as compositions of DataFrame ops).

Implementation is the union+window technique, NOT a range join:

1. tag both sides and union them on (key, ts);
2. one window per key ordered by (ts, side-tag) carries the most recent
   right-side payload forward (`last(..., ignorenulls=True)`);
3. keep left rows, now annotated with the as-of right payload.

Scale properties: exactly ONE shuffle keyed on the join key (the window
sort), zero row multiplication — a range join would explode candidate
pairs and an equi-join can't express "latest at-or-before". Skew bounds
are per-key row counts (same bound as any per-key window; salt via
partitioning.py if a single key dominates).

Tie rule: right rows at ts equal to the left ts ARE visible (<=), and the
right side sorts before the left at equal ts so same-instant payloads
apply — matching DuckDB/QuestDB ASOF JOIN semantics used by the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    payload: list[str] | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """Annotate ``left`` with the latest preceding ``right`` payload."""
    # default payload: everything but the key — including the right-side
    # timestamp (callers usually want to know WHEN the as-of row happened)
    payload = payload or [c for c in right.columns if c != key]
    l_tag = left.select(
        F.col(key).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),  # left sorts AFTER right at equal ts
        F.struct(*left.columns).alias("_lrow"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in payload) + ">"
        ).alias("_rpay"),
    )
    r_tag = right.select(
        F.col(key).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{left.schema[c].dataType.simpleString()}" for c in left.columns) + ">"
        ).alias("_lrow"),
        F.struct(*payload).alias("_rpay"),
    )
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("_k")
        .orderBy("_ts", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    annotated = unioned.withColumn("_asof", F.last("_rpay", ignorenulls=True).over(w))
    out = annotated.where(F.col("_side") == 1).select(
        "_lrow.*", *[F.col(f"_asof.{c}").alias(f"{prefix}{c}") for c in payload]
    )
    return out
