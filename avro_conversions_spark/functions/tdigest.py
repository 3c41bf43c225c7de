"""t-digest quantile sketches via Arrow-batched pandas UDFs
(SURVEY.md §2.8 quantile-sketch row: "t-digest per north star → pandas
UDAF building t-digest per partition, merged on driver").

A compact pure-numpy t-digest (merging variant, Dunning & Ertl): centroids
are (mean, weight) pairs kept under a scale-function size bound. Per
logical bucket, ``applyInPandas`` builds one digest from that bucket's
rows (Arrow-vectorized, no per-row Python); the ≤ n_buckets digests merge
on the driver into one, from which quantiles are read. Digest size is
O(delta) — a 100 TB column reduces to n_buckets × delta centroids.

Compared to percentile_approx (GK): t-digest has relative accuracy at the
tails (q→0/1), which is what drift checks on latency-like columns need.
"""

from __future__ import annotations

from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _compress(means: np.ndarray, weights: np.ndarray, delta: int) -> tuple[np.ndarray, np.ndarray]:
    """Merge sorted centroids under the k1 scale-function bound."""
    order = np.argsort(means, kind="stable")
    means, weights = means[order], weights[order]
    total = weights.sum()
    out_m: list[float] = []
    out_w: list[float] = []
    q0 = 0.0
    q_limit = _k_inv(_k(q0, delta) + 1.0, delta)
    m_acc, w_acc = means[0], weights[0]
    for m, w in zip(means[1:], weights[1:]):
        q = q0 + (w_acc + w) / total
        if q <= q_limit:
            m_acc = (m_acc * w_acc + m * w) / (w_acc + w)
            w_acc += w
        else:
            out_m.append(m_acc)
            out_w.append(w_acc)
            q0 += w_acc / total
            q_limit = _k_inv(_k(q0, delta) + 1.0, delta)
            m_acc, w_acc = m, w
    out_m.append(m_acc)
    out_w.append(w_acc)
    return np.asarray(out_m), np.asarray(out_w)


def _k(q: float, delta: int) -> float:
    return delta / (2 * np.pi) * np.arcsin(2 * q - 1)


def _k_inv(k: float, delta: int) -> float:
    return (np.sin(k * 2 * np.pi / delta) + 1) / 2


def build_digest(values: np.ndarray, delta: int = 100) -> tuple[np.ndarray, np.ndarray]:
    values = values[~np.isnan(values)]
    if len(values) == 0:
        return np.array([]), np.array([])
    return _compress(values.astype("float64"), np.ones(len(values)), delta)


def merge_digests(
    digests: Iterable[tuple[np.ndarray, np.ndarray]], delta: int = 100
) -> tuple[np.ndarray, np.ndarray]:
    ms = [m for m, _ in digests if len(m)]
    ws = [w for _, w in digests if len(w)]
    if not ms:
        return np.array([]), np.array([])
    return _compress(np.concatenate(ms), np.concatenate(ws), delta)


def digest_quantile(means: np.ndarray, weights: np.ndarray, q: float) -> float:
    """Interpolated quantile from centroids (midpoint rule)."""
    if len(means) == 0:
        return float("nan")
    if len(means) == 1:
        return float(means[0])
    total = weights.sum()
    cum = np.cumsum(weights) - weights / 2.0
    target = q * total
    return float(np.interp(target, cum, means))


def tdigest_quantiles(
    df: DataFrame,
    column: str,
    probs: list[float] | None = None,
    delta: int = 100,
    n_buckets: int = 64,
) -> list[tuple[float, float]]:
    """Distributed t-digest: bucket rows by hash, applyInPandas builds one
    digest per bucket (vectorized), driver merges ≤ n_buckets digests and
    reads quantiles. Returns [(prob, value)]."""
    probs = probs or [0.25, 0.5, 0.75]

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        m, w = build_digest(pdf[column].to_numpy(dtype="float64"), delta)
        return pd.DataFrame(
            {"means": [m.tolist()], "weights": [w.tolist()]}
        )

    buckets = df.select(
        F.col(column).cast("double").alias(column),
        F.pmod(F.xxhash64(column), F.lit(n_buckets)).alias("_b"),
    )
    partials = buckets.groupBy("_b").applyInPandas(
        per_bucket, "means array<double>, weights array<double>"
    )
    rows = partials.collect()
    m, w = merge_digests(
        [(np.asarray(r["means"]), np.asarray(r["weights"])) for r in rows], delta
    )
    return [(p, digest_quantile(m, w, p)) for p in probs]
