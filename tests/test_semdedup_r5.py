"""Round-5: SemDeDup semantic deduplication (clustering.semdedup) —
planted-structure tests. Oracle value parity at sf0.01 is covered by the
driver crosscheck (semdedup_embeddings); these pin the pruning contract
on hand-traceable inputs and the scale shape of the plan."""

from __future__ import annotations

from avro_conversions_spark import clustering


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = clustering.semdedup(df, **kw).collect()
    return {r["vec_id"]: r for r in out}


def test_semdedup_tight_cluster_keeps_exactly_one(spark):
    # two planted groups; ids 0,1 seed the clusters. Group A (ids 0,2,3,4)
    # all point along +x (cosine ~1 >> threshold): one survivor. Group B
    # (ids 1,5) along +y: one survivor. Survivor = farthest-from-centroid
    # member (the SemDeDup keep rule), ties by lower id.
    rows = [
        (0, [10.0, 0.0]),
        (1, [0.0, 10.0]),
        (2, [10.5, 0.0]),
        (3, [11.0, 0.0]),
        (4, [9.5, 0.0]),
        (5, [0.0, 10.4]),
    ]
    got = _run(spark, rows, k=2, iters=2, threshold=0.9, max_cluster=512)
    a = [i for i in (0, 2, 3, 4)]
    b = [i for i in (1, 5)]
    assert len({got[i]["cluster"] for i in a}) == 1
    assert len({got[i]["cluster"] for i in b}) == 1
    for grp in (a, b):
        keep = [i for i in grp if not got[i]["pruned"]]
        assert len(keep) == 1
        # the keeper is the member with max dist2 (lower id on ties)
        best = max(grp, key=lambda i: (got[i]["dist2"], -i))
        assert keep == [best]
    assert not any(got[i]["capped"] for i in got)


def test_semdedup_dissimilar_members_all_survive(spark):
    # one cluster of mutually (near-)orthogonal vectors: same cell, but
    # no pair crosses the cosine threshold -> nothing pruned
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0]),  # id 1 seeds the same region: k=1 anyway
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
    ]
    got = _run(spark, rows, k=1, iters=1, threshold=0.95, max_cluster=512)
    assert {r["cluster"] for r in got.values()} == {0}
    # ids 0,1 are identical (cosine 1.0 >= .95): one of THEM is pruned;
    # the orthogonal ids 2,3 must both survive
    assert not got[2]["pruned"] and not got[3]["pruned"]
    assert sorted([got[0]["pruned"], got[1]["pruned"]]) == [False, True]


def test_semdedup_malformed_vectors_never_prune(spark):
    # failure-as-rows: NULL / ragged / all-zero vectors get NULL cluster
    # (zero-norm: cosine undefined -> can neither dominate nor be pruned)
    rows = [
        (0, [5.0, 5.0]),
        (1, [5.0, 5.1]),
        (2, None),
        (3, [1.0]),
        (4, [0.0, 0.0]),
    ]
    got = _run(spark, rows, k=1, iters=1, threshold=0.5, max_cluster=512)
    assert got[2]["cluster"] is None and not got[2]["pruned"]
    assert got[3]["cluster"] is None and not got[3]["pruned"]
    # zero vector IS assignable (distance is defined) but cosine to it is
    # NULL, so it is never dominated and never dominates
    assert got[4]["cluster"] is not None and not got[4]["pruned"]
    assert sorted([got[0]["pruned"], got[1]["pruned"]]) == [False, True]


def test_semdedup_hot_cell_capped_still_keeps_survivor(spark):
    # a degenerate cell bigger than max_cluster: anchors are only the
    # max_cluster farthest members; everyone is flagged capped, pruning
    # still converges to >=1 survivor (the global farthest, rnk=1)
    rows = [(i, [10.0 + 0.1 * i, 0.0]) for i in range(6)]
    got = _run(spark, rows, k=1, iters=1, threshold=0.9, max_cluster=2)
    assert all(got[i]["capped"] for i in range(6))
    keep = [i for i in range(6) if not got[i]["pruned"]]
    best = max(range(6), key=lambda i: (got[i]["dist2"], -i))
    assert keep == [best]


def test_semdedup_pair_join_is_cluster_keyed(spark):
    # 100 TB shape: the candidate join must be an equi-join on the cell
    # id, never a corpus-global cartesian pair enumeration
    rows = [(i, [float(i % 7), float(i % 5)]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = clustering.semdedup(df, k=4, iters=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
