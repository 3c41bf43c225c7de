"""Round-5: document chunking (sampling.chunk_documents). Hand-traced
placement tests — oracle parity at sf0.01 is covered by the driver
crosscheck (chunk_documents)."""

from __future__ import annotations

import pytest

from avro_conversions_spark import sampling


def _chunks(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sampling.chunk_documents(df, **kw).collect()
    res = {}
    for r in out:
        res.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["n_chunk_tokens"], r["chunk"])
        )
    return {k: sorted(v) for k, v in res.items()}


def test_chunk_placement_hand_traced(spark):
    # 10 tokens, window 4, stride 3: starts 0,3,6 -> n_chunks = 3
    # ((10-4+2)//3)+1 = 2+1 = 3; chunks [t0..t3],[t3..t6],[t6..t9]
    text = "a b c d e f g h i j"
    got = _chunks(spark, [(1, text)], window=4, stride=3)[1]
    assert got == [
        (0, 4, "a b c d"),
        (1, 4, "d e f g"),
        (2, 4, "g h i j"),
    ]


def test_chunk_tail_shorter_but_covered(spark):
    # 9 tokens, window 4, stride 3: starts 0,3,6 -> last chunk 3 tokens
    got = _chunks(spark, [(1, "a b c d e f g h i")], window=4, stride=3)[1]
    assert got[-1] == (2, 3, "g h i")
    # every token appears in some chunk
    covered = set(" ".join(c for _, _, c in got).split())
    assert covered == set("a b c d e f g h i".split())


def test_short_and_degenerate_docs(spark):
    rows = [(1, "a b"), (2, None), (3, ""), (4, "solo")]
    got = _chunks(spark, rows, window=4, stride=3)
    assert got[1] == [(0, 2, "a b")]  # short doc -> single whole chunk
    assert 2 not in got  # NULL text -> no chunks
    assert got[3] == [(0, 1, "")]  # empty text -> one empty-token chunk
    assert got[4] == [(0, 1, "solo")]


def test_chunk_invalid_params_rejected(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        sampling.chunk_documents(df, window=4, stride=5)
    with pytest.raises(ValueError):
        sampling.chunk_documents(df, window=0, stride=0)


def test_chunking_is_zero_exchange(spark):
    df = spark.createDataFrame(
        [(i, "w " * 200) for i in range(20)], "doc_id long, text string"
    )
    out = sampling.chunk_documents(df, window=64, stride=48)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
