"""Approximate-nearest-neighbor search over embedding columns.

- brute-force cosine top-k: exact baseline. The query set is broadcast
  (small side), so the corpus is scanned once with no shuffle of the
  corpus itself; per-query top-k via window rank over (query, corpus)
  scores. Cost O(|Q|·|C|) — correct tool when |Q| is small.
- LSH-bucketed ANN: random-hyperplane signatures (deterministic seeds)
  bucket the corpus; queries only score candidates sharing ≥1 band.
  This is the 100 TB path: corpus signature table is computed once and
  reusable; the probe join is bucket-local.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from avro_conversions_spark.functions.vectors import cosine, dot, norm, to_double


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors per query: (qid, rank, nid, cos).
    Deterministic tie-break on neighbor id."""
    q = queries.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")
    )
    c = corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("qid") != F.col("nid"))
        .select(
            "qid",
            "nid",
            F.round(cosine(F.col("qvec"), F.col("nvec")), 6).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "nid", "cos")
    )


def _hyperplane(dim: int, seed: int) -> list[float]:
    """Deterministic pseudo-random unit hyperplane (pure function of seed —
    reproducible across cluster sizes, unlike RNG-state approaches)."""
    # simple LCG; quality is adequate for LSH bucketing
    vals = []
    x = (seed * 2654435761 + 104729) % (2**31)
    for _ in range(dim):
        x = (1103515245 * x + 12345) % (2**31)
        vals.append((x / 2**31) * 2.0 - 1.0)
    n = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / n for v in vals]


def lsh_signature(df: DataFrame, vec_col: str, dim: int, n_planes: int = 16, seed: int = 7):
    """Add a bit-signature column from ``n_planes`` random hyperplanes."""
    planes = [_hyperplane(dim, seed + i) for i in range(n_planes)]
    bits = []
    for p in planes:
        plane = F.array(*[F.lit(v) for v in p])
        bits.append(F.when(dot(F.col(vec_col), plane) > 0, F.lit("1")).otherwise(F.lit("0")))
    return df.withColumn("sig", F.concat(*bits))


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 16,
    band_size: int = 4,
    seed: int = 7,
) -> DataFrame:
    """ANN top-k: score only corpus vectors sharing at least one signature
    band with the query. Returns (qid, rank, nid, cos) — a subset of the
    brute-force result with high recall at a fraction of the comparisons."""
    n_bands = n_planes // band_size
    c_sig = lsh_signature(
        corpus.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nvec")),
        "nvec", dim, n_planes, seed,
    )
    q_sig = lsh_signature(
        queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qvec")),
        "qvec", dim, n_planes, seed,
    )

    def banded(df: DataFrame, sig: str) -> DataFrame:
        bands = F.array(
            *[
                F.struct(
                    F.lit(i).alias("band"),
                    F.substring(F.col(sig), i * band_size + 1, band_size).alias("key"),
                )
                for i in range(n_bands)
            ]
        )
        return df.select("*", F.explode(bands).alias("b")).select(
            *df.columns, F.col("b.band").alias("band"), F.col("b.key").alias("band_key")
        ).drop(sig)

    cand = (
        banded(c_sig, "sig")
        .join(F.broadcast(banded(q_sig, "sig")), ["band", "band_key"])
        .where(F.col("qid") != F.col("nid"))
        .select("qid", "qvec", "nid", "nvec")
        .dropDuplicates(["qid", "nid"])
    )
    scored = cand.select(
        "qid", "nid", F.round(cosine(F.col("qvec"), F.col("nvec")), 6).alias("cos")
    )
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("qid", "rank", "nid", "cos")
    )
