"""t-digest quantile sketches via Arrow-batched pandas UDFs
(SURVEY.md §2.8 quantile-sketch row: "t-digest per north star → pandas
UDAF building t-digest per partition, merged on driver").

A compact pure-numpy t-digest (merging variant, Dunning & Ertl): centroids
are (mean, weight) pairs kept under a scale-function size bound. The
default path builds one digest per column per TASK via ``mapInPandas``
(Arrow-vectorized, no per-row Python, zero exchange) and merges the
O(tasks × columns) centroid partials on the driver; the reproducible
``partition_salt=False`` path buckets rows by value hash and builds one
digest per bucket via ``applyInPandas`` instead. Digest size is O(delta)
— a 100 TB column reduces to a handful of centroid partials per task.

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


def digest_cdf(means: np.ndarray, weights: np.ndarray, v: float) -> float:
    """CDF at v from centroids (midpoint rule, clamped to [0,1])."""
    if len(means) == 0:
        return float("nan")
    if len(means) == 1:
        return 0.0 if v < means[0] else 1.0
    total = weights.sum()
    cum = (np.cumsum(weights) - weights / 2.0) / total
    return float(np.clip(np.interp(v, means, cum, left=0.0, right=1.0), 0.0, 1.0))


def ks_from_digests(
    m_a: np.ndarray, w_a: np.ndarray, m_b: np.ndarray, w_b: np.ndarray
) -> float:
    """KS statistic D = max |CDF_a - CDF_b| over the union centroid grid —
    driver-side, two digests of O(delta) centroids each."""
    grid = np.union1d(m_a, m_b)
    if len(grid) == 0:
        return 0.0
    return float(
        max(abs(digest_cdf(m_a, w_a, v) - digest_cdf(m_b, w_b, v)) for v in grid)
    )


def tdigest_columns(
    df: DataFrame,
    columns: list[str],
    delta: int = 100,
    n_buckets: int = 64,
    partition_salt: bool = True,
) -> dict[str, tuple[np.ndarray, np.ndarray]]:
    """Per-column merged t-digests in ONE distributed pass over the
    constrained columns only; partial digests merge on the driver. A
    100 TB table reduces to O(columns × delta) centroids per task before
    any comparison.

    Determinism: with ``partition_salt=True`` (default) partials are
    built per input TASK (zero-exchange ``mapInPandas``), so the merged
    centroids — and quantile estimates, slightly — depend on physical
    input partitioning: identical data under different file splits or
    parallelism yields accuracy-equivalent but not bit-identical digests
    (the same contract the historical partition-id-salted bucketing had).
    Callers needing repartition-invariant (reproducible) digests pass
    ``partition_salt=False``: rows bucket by value hash and the digest is
    a pure function of the data multiset, at the cost of a full exchange
    and of constant-heavy columns concentrating into one pandas group
    (executor-memory risk at scale)."""
    if partition_salt:
        # Round 6 (guide §2.3/§4.1): partition-dependent digests don't
        # need a shuffle AT ALL — ``mapInPandas`` folds each task's rows
        # into one digest per column and only the O(columns × delta)
        # centroid partials ever leave the task. The historical path
        # exploded every row to (column, value) pairs and shuffled the
        # FULL table into applyInPandas hash-bucket groups; at 100 TB
        # that exchange was the whole cost of a snapshot. Centroid
        # detail remains partition-dependent exactly as the salted
        # contract documents (the salt's purpose — splitting
        # constant-heavy columns across groups — is moot here: tasks
        # never group by value). Each batch becomes a digest and folds
        # into the task accumulator, so task memory stays O(delta), and
        # iterative batch-merging only re-compresses — the same
        # operation driver-side merging performs anyway.
        proj = df.select(*[F.col(c).cast("double").alias(c) for c in columns])

        def per_partition(batches):
            accs: dict[str, tuple[np.ndarray, np.ndarray]] = {
                c: (np.array([]), np.array([])) for c in columns
            }
            for pdf in batches:
                for c in columns:
                    m, w = build_digest(pdf[c].to_numpy(dtype="float64"), delta)
                    if len(m):
                        accs[c] = merge_digests([accs[c], (m, w)], delta)
            yield pd.DataFrame(
                {
                    "column": list(columns),
                    "means": [accs[c][0].tolist() for c in columns],
                    "weights": [accs[c][1].tolist() for c in columns],
                }
            )

        partials = proj.mapInPandas(
            per_partition, "column string, means array<double>, weights array<double>"
        )
        by_col: dict[str, list[tuple[np.ndarray, np.ndarray]]] = {c: [] for c in columns}
        for r in partials.collect():
            by_col[r["column"]].append((np.asarray(r["means"]), np.asarray(r["weights"])))
        return {c: merge_digests(parts, delta) for c, parts in by_col.items()}

    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(c).alias("column"), F.col(c).cast("double").alias("v"))
                    for c in columns
                ]
            )
        ).alias("p")
    ).select("p.*")
    # partition_salt=False: the REPRODUCIBLE path — bucket by value hash
    # only, so the digest is a pure function of the data multiset
    # regardless of physical partitioning (pinned by
    # test_partition_salt_false_repartition_invariant). Costs the full
    # (column, value) exchange the salted path above avoids; callers
    # accept that a constant-heavy column concentrates into one pandas
    # group (executor-memory risk at scale).
    buckets = pairs.withColumn("_b", F.pmod(F.xxhash64("v"), F.lit(n_buckets)))

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        m, w = build_digest(pdf["v"].to_numpy(dtype="float64"), delta)
        return pd.DataFrame(
            {"column": [pdf["column"].iloc[0]], "means": [m.tolist()], "weights": [w.tolist()]}
        )

    partials = buckets.groupBy("column", "_b").applyInPandas(
        per_bucket, "column string, means array<double>, weights array<double>"
    )
    by_col: dict[str, list[tuple[np.ndarray, np.ndarray]]] = {c: [] for c in columns}
    for r in partials.collect():
        by_col[r["column"]].append((np.asarray(r["means"]), np.asarray(r["weights"])))
    return {c: merge_digests(parts, delta) for c, parts in by_col.items()}


def tdigest_quantiles(
    df: DataFrame,
    column: str,
    probs: list[float] | None = None,
    delta: int = 100,
    n_buckets: int = 64,
    partition_salt: bool = True,
) -> list[tuple[float, float]]:
    """Distributed t-digest: bucket rows by hash, applyInPandas builds one
    digest per bucket (vectorized), driver merges ≤ n_buckets digests and
    reads quantiles. Returns [(prob, value)].

    Same determinism caveat as ``tdigest_columns``: the default
    partition-id salt makes estimates accuracy-equivalent but not
    bit-identical across different physical partitionings; pass
    ``partition_salt=False`` for reproducible digests (at the cost of
    constant-heavy columns concentrating into one group)."""
    probs = probs or [0.25, 0.5, 0.75]

    if partition_salt:
        # zero-exchange per-task partials — see tdigest_columns (round 6)
        m, w = tdigest_columns(
            df.select(F.col(column).cast("double").alias(column)),
            [column],
            delta=delta,
            n_buckets=n_buckets,
            partition_salt=True,
        )[column]
        return [(p, digest_quantile(m, w, p)) for p in probs]

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        m, w = build_digest(pdf[column].to_numpy(dtype="float64"), delta)
        return pd.DataFrame(
            {"means": [m.tolist()], "weights": [w.tolist()]}
        )

    buckets = df.select(
        F.col(column).cast("double").alias(column),
        # value-hash bucketing (no salt): reproducible across physical
        # partitionings — see tdigest_columns' partition_salt=False path
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
