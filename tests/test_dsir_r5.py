"""Round-5: DSIR importance-resampling data selection (curation.dsir_*).
Planted-structure tests — oracle value parity at sf0.01 is covered by the
driver crosscheck (dsir_documents)."""

from __future__ import annotations

from pyspark.sql import functions as F

from avro_conversions_spark import curation


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dsir_ranks_target_like_docs_above_offtarget(spark):
    # target distribution = legal boilerplate; raw corpus mixes
    # target-like docs with cooking docs. Importance weights must put
    # every target-like doc above every cooking doc.
    legal = "the party of the first part shall indemnify the party"
    cook = "stir the onions and garlic in hot olive oil until golden"
    target = _docs(spark, [(100 + i, legal) for i in range(5)])
    raw = _docs(
        spark,
        [(i, legal) for i in range(4)] + [(10 + i, cook) for i in range(4)],
    )
    w = {
        r["doc_id"]: r["weight"]
        for r in curation.dsir_weights(raw, target, n_buckets=64).collect()
    }
    assert len(w) == 8
    assert min(w[i] for i in range(4)) > max(w[10 + i] for i in range(4))


def test_dsir_select_takes_ceil_frac_by_weight_then_id(spark):
    legal = "claim one of the patent covers a method of the claim"
    cook = "bake the bread at two hundred degrees for one hour today"
    target = _docs(spark, [(99, legal)])
    raw = _docs(
        spark, [(i, legal) for i in range(3)] + [(10, cook), (11, cook)]
    )
    # 5 candidates, frac=0.5 -> ceil(2.5) = 3 selected: the 3 legal docs
    got = curation.dsir_select(raw, target, n_buckets=64, frac=0.5).collect()
    assert sorted(r["doc_id"] for r in got) == [0, 1, 2]
    # identical texts -> identical weights; id tie-break inside the cut
    got2 = curation.dsir_select(raw, target, n_buckets=64, frac=0.4).collect()
    assert sorted(r["doc_id"] for r in got2) == [0, 1]


def test_dsir_degenerate_texts_drop_out_not_crash(spark):
    # NULL, empty, and single-token texts have no bigram -> absent from
    # weights (failure-as-rows at the feature level), never an exception
    target = _docs(spark, [(9, "alpha beta gamma")])
    raw = _docs(
        spark,
        [(1, "alpha beta gamma"), (2, None), (3, ""), (4, "solo"), (5, "a b")],
    )
    w = curation.dsir_weights(raw, target, n_buckets=64).collect()
    ids = {r["doc_id"] for r in w}
    assert ids == {1, 5}
    n = {r["doc_id"]: r["n_bigrams"] for r in w}
    assert n[1] == 2 and n[5] == 1


def test_dsir_empty_target_is_uniform_prior_not_crash(spark):
    # an empty seed set degrades to the smoothing prior (tt=0): weights
    # are defined (pure prior-vs-raw ratio), nothing throws
    target = _docs(spark, []).where(F.lit(False))
    raw = _docs(spark, [(1, "x y z"), (2, "x y z")])
    w = curation.dsir_weights(raw, target, n_buckets=64).collect()
    assert len(w) == 2 and all(r["weight"] is not None for r in w)


def test_dsir_topk_plan_has_no_global_sort_exchange(spark):
    # scale shape: selection must compile to TakeOrderedAndProject (per-
    # partition heap + driver k-merge), never a range-partitioned sort
    target = _docs(spark, [(99, "p q r s")])
    raw = _docs(spark, [(i, f"p q r s t{i}") for i in range(30)])
    out = curation.dsir_select(raw, target, n_buckets=64, frac=0.1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan.lower()
