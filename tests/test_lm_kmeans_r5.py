"""Round-5 additions: bigram-LM perplexity scoring and deterministic
k-means semantic clustering. Planted-structure tests — oracle value
parity is covered by the driver crosscheck (lm_perplexity_documents,
kmeans_embeddings)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from avro_conversions_spark import clustering
from avro_conversions_spark.functions import lm as LM


# ------------------------------------------------------------------- LM


def _score_map(spark, ref_rows, doc_rows):
    ref = spark.createDataFrame(ref_rows, "doc_id long, text string")
    docs = spark.createDataFrame(doc_rows, "doc_id long, text string")
    model, ctx, vocab = LM.fit_bigram_lm(ref)
    out = LM.score_documents(docs, model, ctx, vocab).collect()
    return {r["doc_id"]: (r["n_bigrams"], r["avg_nll_bits"]) for r in out}


def test_lm_fluent_scores_below_gibberish(spark):
    ref = [
        (i, "the cat sat on the mat and the dog sat on the rug") for i in range(20)
    ] + [(100, "zq xv jkw pfft qqrr mzzt glorb")]
    scores = _score_map(spark, ref, ref)
    fluent = scores[0][1]
    gibberish = scores[100][1]
    assert fluent < gibberish


def test_lm_exact_hand_computed(spark):
    # corpus = one doc "a b a b": bigrams (a,b)x2? no — (a,b),(b,a),(a,b)
    # c12: (a,b)=2, (b,a)=1; ctx: a=2, b=1; V=2; k=0.5
    rows = [(1, "a b a b")]
    scores = _score_map(spark, rows, rows)
    n, nll = scores[1]
    assert n == 3
    p_ab = (2 + 0.5) / (2 + 0.5 * 2)
    p_ba = (1 + 0.5) / (1 + 0.5 * 2)
    expect = -(2 * math.log2(p_ab) + math.log2(p_ba)) / 3
    assert abs(nll - round(expect, 4)) < 1e-9


def test_lm_disjoint_corpus_finite(spark):
    # scoring docs whose bigrams/contexts the reference never saw must
    # hit both fallbacks (known-context floor, uniform 1/V) and stay finite
    ref = [(1, "a b a b")]
    docs = [(2, "a z"), (3, "q z q")]  # (a,z): known ctx a; (q,z): novel ctx
    scores = _score_map(spark, ref, docs)
    assert scores[2][0] == 1 and scores[3][0] == 2
    assert all(v[1] is not None and v[1] > 0 for v in scores.values())
    # known context must beat the uniform floor: p(a,z)=k/(c1+kV) vs 1/V...
    # with c1=2,V=2: p_known=0.5/3, p_novel=0.5/1.0... compute directly
    p_known = 0.5 / (2 + 0.5 * 2)
    p_novel = 0.5 / (0 + 0.5 * 2)
    assert abs(scores[2][1] - round(-math.log2(p_known), 4)) < 1e-9
    assert abs(scores[3][1] - round(-math.log2(p_novel), 4)) < 1e-9


def test_lm_short_docs_absent(spark):
    rows = [(1, "solo"), (2, "two tokens")]
    scores = _score_map(spark, rows, rows)
    assert 1 not in scores and scores[2][0] == 1


def test_lm_broadcast_plan(spark):
    ref = spark.createDataFrame([(1, "a b c a b")], "doc_id long, text string")
    model, ctx, vocab = LM.fit_bigram_lm(ref)
    out = LM.score_documents(ref, model, ctx, vocab, broadcast_lm=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2  # lm + ctx both broadcast


# --------------------------------------------------------------- k-means


def test_kmeans_separates_planted_clusters(spark):
    # 3 tight groups; ids 0..2 land one in each group so init spans them
    pts = []
    centers = [0.0, 10.0, 20.0]
    for g, c in enumerate(centers):
        pts.append((g, [c, c]))  # ids 0,1,2 = one seed per group
    nid = 3
    for g, c in enumerate(centers):
        for j in range(5):
            pts.append((nid, [c + 0.1 * (j + 1), c - 0.1 * j]))
            nid += 1
    df = spark.createDataFrame(pts, "vec_id long, embedding array<float>")
    got = {
        r["vec_id"]: r["cluster"]
        for r in clustering.kmeans_fit_assign(df, k=3, iters=3).collect()
    }
    for g in range(3):
        members = [got[i] for i in range(3 + g * 5, 3 + (g + 1) * 5)]
        assert len(set(members)) == 1 and members[0] == got[g] == g
    assert len({got[0], got[1], got[2]}) == 3


def test_kmeans_empty_cluster_and_ties_hand_traced(spark):
    # duplicate init points force an EMPTY cluster after iter 1; the trace
    # (see comments) is fully hand-computable including lower-id tie-breaks
    rows = [(0, [0.0]), (1, [0.0]), (2, [9.0]), (3, [1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = clustering.kmeans_fit_assign(df, k=3, iters=3, with_distance=True).collect()
    got = {r["vec_id"]: r["cluster"] for r in out}
    # init c=[0,0,9]; a1: ids 0,1,3 -> c0 (ties -> lower id), 2 -> c2
    # u1: c0=1/3, c1 EMPTY keeps 0.0, c2=9
    # a2: [0.0] pts -> c1 (exact 0), [1.0] -> c0; u2: c0=1, c1=0, c2=9
    # a3 + final: stable
    assert got == {0: 1, 1: 1, 2: 2, 3: 0}
    # converged layout: every point sits exactly on its final centroid
    assert all(r["dist2"] == 0.0 for r in out)


def test_kmeans_null_and_ragged_vectors_get_null_cluster(spark):
    # failure-as-rows: undefinable distances (NULL vector, wrong dims)
    # must yield NULL assignments, never an arbitrary argmin winner, and
    # must not poison the centroid update
    rows = [(0, [0.0, 0.0]), (1, [10.0, 10.0]), (2, None), (3, [5.0, 5.0]), (4, [1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {
        r["vec_id"]: (r["cluster"], r["dist2"])
        for r in clustering.kmeans_fit_assign(
            df, k=2, iters=2, with_distance=True
        ).collect()
    }
    assert out[2] == (None, None) and out[4] == (None, None)
    # valid points: c0=mean((0,0),(5,5))=(2.5,2.5) -> both at dist2 12.5
    assert out[0] == (0, 12.5) and out[3] == (0, 12.5) and out[1] == (1, 0.0)


def test_kmeans_assignment_is_shuffle_free(spark):
    rows = [(i, [float(i % 4), float(i % 3)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = clustering.kmeans_fit_assign(df, k=2, iters=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the RETURNED frame is the final assignment pass: a narrow map over
    # the input with driver-held literal centroids — no exchange at all
    assert "Exchange" not in plan


def test_kmeans_matches_final_nearest_centroid(spark):
    # self-consistency: every point's cluster is the true argmin distance
    # to the centroid set implied by re-running the update off the output
    import random

    rnd = random.Random(7)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(4)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    assigned = clustering.kmeans_fit_assign(df, k=4, iters=2)
    joined = assigned.join(df, "vec_id").collect()
    # recompute the iters=2 centroids in pure python
    data = {i: [float(x) for x in v] for i, v in rows}
    cents = [data[i] for i in range(4)]
    for _ in range(2):
        buckets: dict[int, list[list[float]]] = {}
        for i in sorted(data):
            d = [sum((a - b) ** 2 for a, b in zip(data[i], c)) for c in cents]
            buckets.setdefault(d.index(min(d)), []).append(data[i])
        cents = [
            [sum(col) / len(col) for col in zip(*buckets[c])] if c in buckets else cents[c]
            for c in range(4)
        ]
    for r in joined:
        v = [float(x) for x in r["embedding"]]
        d = [sum((a - b) ** 2 for a, b in zip(v, c)) for c in cents]
        assert r["cluster"] == d.index(min(d)), r["vec_id"]
