"""CCNet-style n-gram language-model perplexity scoring.

The classic web-corpus quality filter (CCNet, Wenzek et al. 2020;
Gopher, Rae et al. 2021 use the same signal) ranks documents by the
perplexity of a small LM: fluent prose scores low, boilerplate /
gibberish / keyword-stuffed pages score high, and the corpus is kept,
binned, or dropped by score. Here the LM is a bigram model with add-k
smoothing fit on the corpus itself (or any reference slice passed in) —
every probability is a ratio of integer counts, so the whole pipeline
is reproducible exactly by the DuckDB oracle up to a final log2.

Scale shape (the part that must survive 100 TB):
- FIT is one explode + groupBy(w1, w2) count — map-side partial
  aggregation bounds the shuffle by per-partition distinct bigrams,
  never the raw token stream (same argument as dedup/repetition);
  context totals are a second tiny agg over the LM table itself.
- SCORE is a key-partitioned join of document bigrams against the LM
  on (w1, w2) — both sides shuffle once on the same key. When the LM
  is pruned to a vocabulary that fits an executor (the production
  CCNet setup: a SMALL reference LM, not a corpus-sized one), pass
  ``broadcast_lm=True`` and the corpus side never shuffles at all.
- No Python in the data path: tokenization, bigram assembly
  (transform over sequence), counting, and log arithmetic are all
  pure Column expressions inside whole-stage codegen.

Tokenization mirrors functions/text.py (split on whitespace, lowered)
so the DuckDB oracle's string_split_regex reproduces tokens exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def doc_bigrams(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, w1, w2) — one row per consecutive token pair. Documents with
    fewer than two tokens contribute nothing (and are therefore absent
    from any downstream score — scoring needs at least one bigram)."""
    toks = df.select(
        F.col(id_col), F.split(F.lower(F.col(text_col)), r"\s+").alias("t")
    ).where(F.size("t") >= 2)
    pair = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.size("t") - 2),
            lambda i: F.struct(
                F.col("t")[i].alias("w1"), F.col("t")[i + 1].alias("w2")
            ),
        )
    )
    return toks.select(F.col(id_col), pair.alias("b")).select(
        id_col, "b.w1", "b.w2"
    )


def fit_bigram_lm(
    ref: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Fit the model on a reference corpus. Returns (lm, ctx, vocab):
    lm = (w1, w2, c12) bigram counts, ctx = (w1, c1) context totals,
    vocab = a 1-row frame holding the distinct-unigram count V (the
    smoothing denominator). All pure aggregates; nothing is collected."""
    ref_ids = ref.select(F.monotonically_increasing_id().alias("_rid"), text_col)
    big = doc_bigrams(ref_ids, id_col="_rid", text_col=text_col)
    lm = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    ctx = lm.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (
        ref_ids.select(
            F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("w")
        )
        .agg(F.count_distinct("w").cast("double").alias("v"))
    )
    return lm, ctx, vocab


def score_documents(
    docs: DataFrame,
    lm: DataFrame,
    ctx: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: float = 0.5,
    broadcast_lm: bool = False,
) -> DataFrame:
    """Per-document mean negative log2 bigram probability (bits/bigram —
    monotone in perplexity: ppl = 2^avg_nll_bits). Unseen bigrams fall
    back to the smoothed floor k/(c1 + kV) when the context is known,
    and to the uniform 1/V when even the context is novel — so scoring
    a corpus DISJOINT from the reference still yields finite scores.
    Output: (id, n_bigrams, avg_nll_bits rounded to 4dp)."""
    big = doc_bigrams(docs, id_col=id_col, text_col=text_col)
    lm_rhs = F.broadcast(lm) if broadcast_lm else lm
    ctx_rhs = F.broadcast(ctx) if broadcast_lm else ctx
    joined = (
        big.join(lm_rhs, ["w1", "w2"], "left")
        .join(ctx_rhs, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
    )
    num = F.coalesce(F.col("c12").cast("double"), F.lit(0.0)) + F.lit(add_k)
    den = F.coalesce(F.col("c1").cast("double"), F.lit(0.0)) + F.lit(add_k) * F.col("v")
    nll = -F.log2(num / den)
    return (
        joined.select(F.col(id_col), nll.alias("nll"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("nll"), 4).alias("avg_nll_bits"),
        )
    )
