"""Round-5: BM25 full-text retrieval (similarity.bm25_search).
Hand-computed scores + edge cases; oracle value parity at sf0.01 is
covered by the driver crosscheck (bm25_documents)."""

from __future__ import annotations

import math

from avro_conversions_spark import similarity


def _search(spark, docs, queries, **kw):
    d = spark.createDataFrame(docs, "doc_id long, text string")
    q = spark.createDataFrame(queries, "query_id long, query string")
    return similarity.bm25_search(d, q, **kw).collect()


def test_bm25_hand_computed_scores(spark):
    # N=2, df(cat)=2, avgdl=2.5; k1=1.2, b=0.75
    rows = _search(
        spark, [(1, "cat cat dog"), (2, "cat fish")], [(10, "cat")]
    )
    got = {r["doc_id"]: (r["rank"], r["score"]) for r in rows}
    idf = math.log(1.0 + (2 - 2 + 0.5) / (2 + 0.5))
    s1 = idf * 2 / (2 + 1.2 * (0.25 + 0.75 * 3 / 2.5))
    s2 = idf * 1 / (1 + 1.2 * (0.25 + 0.75 * 2 / 2.5))
    assert got[1] == (1, round(s1, 4))
    assert got[2] == (2, round(s2, 4))


def test_bm25_rare_term_outranks_common(spark):
    # 'zebra' appears once in the corpus, 'the' everywhere: for the
    # query "the zebra", the zebra document must rank first
    docs = [(i, "the quick brown fox " + ("jumps" if i else "zebra")) for i in range(10)]
    rows = _search(spark, docs, [(1, "the zebra")])
    assert rows and min(rows, key=lambda r: r["rank"])["doc_id"] == 0


def test_bm25_unmatched_terms_and_queries(spark):
    # a query term missing from the corpus contributes nothing; a query
    # with NO matching terms returns no rows (never a crash/NaN)
    docs = [(1, "alpha beta"), (2, "beta gamma")]
    rows = _search(spark, docs, [(1, "alpha qqqq"), (2, "zzzz qqqq")])
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert 2 not in by_q
    assert [r["doc_id"] for r in sorted(by_q[1], key=lambda r: r["rank"])] == [1]


def test_bm25_duplicate_query_terms_count_once(spark):
    docs = [(1, "cat dog"), (2, "dog dog")]
    once = _search(spark, docs, [(1, "cat")])
    twice = _search(spark, docs, [(1, "cat cat")])
    assert [(r["doc_id"], r["score"]) for r in once] == [
        (r["doc_id"], r["score"]) for r in twice
    ]


def test_bm25_topk_bound_and_id_tiebreak(spark):
    # 20 identical docs -> identical scores; rank must be id order and
    # exactly topk rows survive the cut
    docs = [(i, "same text here") for i in range(20)]
    rows = _search(spark, docs, [(1, "same")], topk=5)
    got = sorted(rows, key=lambda r: r["rank"])
    assert [r["doc_id"] for r in got] == [0, 1, 2, 3, 4]
    assert len({r["score"] for r in got}) == 1


def test_bm25_topk_is_map_side_pruned(spark):
    # scale shape: the rank<=k filter must push below the window as a
    # Partial WindowGroupLimit — map tasks keep their local top-k per
    # query BEFORE the exchange, so a hot query never funnels the whole
    # scored corpus through one reducer
    d = spark.createDataFrame(
        [(i, f"w{i % 13} w{i % 7} common") for i in range(100)],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(1, "common w3")], "query_id long, query string")
    out = similarity.bm25_search(d, q, topk=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan
