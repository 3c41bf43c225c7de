"""Connected-components duplicate clustering (round 5).

The Spark side is alternating large-star/small-star contraction (Kiveris
et al., SoCC 2014); ground truth here is a 20-line union-find — two
implementations that share nothing. Adversarial shapes:

- a 200-node chain: O(diameter) propagation would need 200 rounds, the
  contraction must finish well inside the 50-round guard;
- two cliques bridged at their MAXIMAL nodes: a min-neighbor parent
  forest has two local minima here, so naive pointer-doubling converges
  to the WRONG labels — the case that forces the star algorithm;
- the minimal local-min trap {(1,3),(2,3)};
- random multigraphs with self-loops and duplicate edges.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from avro_conversions_spark import dedup


def _uf(edges, nodes):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps: dict[int, list[int]] = {}
    for n in nodes:
        comps.setdefault(find(n), []).append(n)
    return {n: min(ms) for ms in comps.values() for n in ms}


def _check(spark, edges):
    edges = [(a, b) for a, b in edges if a != b]
    nodes = sorted({x for e in edges for x in e})
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["component"] for r in dedup.connected_components(df).collect()}
    want = _uf(edges, nodes)
    assert got == want


def test_chain_converges_logarithmically(spark):
    _check(spark, [(i, i + 1) for i in range(200)])


def test_bridged_cliques_defeat_local_minima(spark):
    a = [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
    b = [(i, j) for i in range(100, 105) for j in range(i + 1, 105)]
    _check(spark, a + b + [(14, 104)])  # bridge touches neither minimum


def test_minimal_local_min_trap(spark):
    _check(spark, [(1, 3), (2, 3)])


def test_random_graphs_with_noise(spark):
    rng = random.Random(11)
    for _ in range(3):
        n = rng.randint(20, 60)
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(rng.randint(10, 90))
        ]
        edges += edges[:5]  # duplicate edges
        edges += [(i, i) for i in range(0, n, 7)]  # self-loops
        if not [e for e in edges if e[0] != e[1]]:
            continue
        _check(spark, edges)


def test_nonconvergence_guard(spark):
    df = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(df, max_iterations=0)


def test_duplicate_clusters_labels_singletons(spark):
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog again and again"),
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "an entirely different document about winter mountain weather"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.duplicate_clusters(docs).collect()
    }
    assert out[0] == out[1] == 0  # identical texts merge to the min id
    assert out[2] == 2  # untouched singleton labels itself


def test_keep_best_prefers_quality_then_min_id(spark):
    docs = spark.createDataFrame(
        [(i, "irrelevant") for i in range(4)], "doc_id long, text string"
    )
    clusters = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 3)], "doc_id long, cluster_id long"
    )
    # doc 1 and 2 tie on the best score -> smaller doc_id (1) wins
    score = (
        F.when(F.col("doc_id") == 0, F.lit(0.1))
        .when(F.col("doc_id").isin(1, 2), F.lit(0.9))
        .otherwise(F.lit(0.5))
    )
    rows = {
        r["cluster_id"]: (r["kept_doc_id"], r["n_members"])
        for r in dedup.keep_best_per_cluster(docs, clusters, score).collect()
    }
    assert rows == {0: (1, 3), 3: (3, 1)}
