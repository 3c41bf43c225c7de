"""Corpus-curation operators: benchmark decontamination and the composed
keep/drop pipeline a training-data build actually runs.

Both are table-level operators over the ``documents`` shape
(doc_id, text, lang, source, n_chars), composing the function surface in
``functions.text`` / ``functions.pii`` / ``stats`` / ``dedup`` into the
two decisions a 100 TB curation job makes: "is this document tainted by
an eval set?" and "does this document survive into training data, and if
not, why exactly?".
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from avro_conversions_spark.functions import text as TXT


def _distinct_grams(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, gram) with DISTINCT n-grams per document — decontamination is
    set overlap, instance multiplicity is irrelevant. Tokens are staged as
    a real column before the transform (CollapseProject discipline)."""
    toks = df.select(
        F.col(id_col), F.split(F.lower(F.col(text_col)), r"\s+").alias("_toks")
    )
    return toks.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(TXT.ngrams_from_tokens(F.col("_toks"), n))
        ).alias("gram"),
    )


def contamination_pairs(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination by n-gram collision — the published
    GPT-3/PaLM procedure (Brown et al. 2020 §C: drop training documents
    sharing a long n-gram with an eval example; 8 ≤ n ≤ 13).

    Returns (doc_id, bench_id, n_shared, bench_overlap_frac): one row per
    (corpus document, benchmark document) pair sharing ≥ ``min_shared``
    distinct n-grams, with the fraction of the benchmark document's
    distinct n-grams found in the corpus document — 1.0 means the eval
    example is wholly contained.

    Scale shape: the benchmark side is small by definition (eval sets are
    thousands of documents, the corpus is billions), so its exploded gram
    table is broadcast — the corpus side never shuffles; each corpus
    partition streams its grams through the broadcast hash join and only
    the (rare) collision rows reach the pair aggregation. Corpus grams
    are distinct-per-document (array_distinct before explode, row-local),
    so the join probe count is bounded by document vocabulary, not raw
    token count.
    """
    c = _distinct_grams(corpus, id_col, text_col, n)
    b = _distinct_grams(benchmark, id_col, text_col, n).withColumnsRenamed(
        {id_col: "bench_id"}
    )
    b_sizes = b.groupBy("bench_id").agg(F.count(F.lit(1)).alias("_bench_grams"))
    pairs = (
        c.join(F.broadcast(b), "gram")
        .groupBy(id_col, "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
    return pairs.join(F.broadcast(b_sizes), "bench_id").select(
        id_col,
        "bench_id",
        "n_shared",
        F.round(F.col("n_shared") / F.col("_bench_grams"), 4).alias(
            "bench_overlap_frac"
        ),
    )


# ordered drop reasons: the FIRST failing filter names the verdict, so the
# reason histogram is a pipeline funnel (each stage sees only survivors of
# the previous one) — the report shape curation jobs publish
CURATION_REASONS = ("too_short", "low_quality", "high_repetition", "duplicate")


def curate(
    df: DataFrame,
    min_tokens: int = 10,
    min_quality: float = 0.5,
    max_dup_ngram_frac: float = 0.3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The composed curation pipeline: every document in, every document
    out with a verdict — ``kept`` or the first failing filter's reason
    (ordered per CURATION_REASONS) — plus the signals the decision used.

    Stages (all single-scan projections except the two marked):
      1. too_short       — token_count < min_tokens
      2. low_quality     — composite quality_score < min_quality
      3. high_repetition — trigram dup_ngram_frac > max (explode + two-phase
                           agg, shuffle bounded by distinct grams/partition)
      4. duplicate       — same normalized-text fingerprint as a
                           lower-doc_id survivor (one hash-partition
                           min() per fingerprint; ties keep smallest id)

    Verdicts are computed for ALL documents (a dropped-too-short document
    still reports its quality), but the duplicate stage only dedups among
    documents that passed 1-3 — dropping a document and simultaneously
    letting it shadow a clean near-twin would double-drop; funnel order
    prevents that, and matches how production pipelines sequence cheap
    filters before dedup (FineWeb, RefinedWeb ordering).

    Returns (doc_id, verdict, n_tokens, quality, dup_ngram_frac,
    fingerprint).
    """
    text = F.col(text_col)
    base = df.select(
        F.col(id_col),
        TXT.token_count(text).cast("long").alias("n_tokens"),
        TXT.quality_score(text).alias("quality"),
        TXT.fingerprint(text).alias("fingerprint"),
    )
    from avro_conversions_spark.stats import repetition_stats

    rep = repetition_stats(df, text_col=text_col, id_col=id_col, n=3).select(
        id_col, "dup_ngram_frac"
    )
    # left join: documents too short for trigrams have null dup_ngram_frac
    # and can only fail earlier stages.
    # localCheckpoint (round 6): ``sig`` feeds BOTH the keeper aggregation
    # and the output join, and the two subtrees differ (one is filtered),
    # so ReuseExchange can't kick in — without materialization the whole
    # text pipeline (tokenize, quality score, fingerprint, trigram
    # explode + two-phase agg) executed twice per run. ``sig`` is the
    # narrow proxy of guide-§8: id + four scalars + a 32-char hash, never
    # the text.
    sig = base.join(rep, id_col, "left").localCheckpoint(eager=False)

    passes_123 = (
        (F.col("n_tokens") >= min_tokens)
        & (F.col("quality") >= min_quality)
        & (F.coalesce(F.col("dup_ngram_frac"), F.lit(0.0)) <= max_dup_ngram_frac)
    )
    # duplicate stage among stage-1-3 survivors: keeper = min doc_id per
    # fingerprint (two-phase hash agg, map-side partial min)
    keepers = (
        sig.where(passes_123)
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("_keep_id"))
    )
    out = sig.join(keepers, "fingerprint", "left")
    verdict: Column = (
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("quality") < min_quality, F.lit("low_quality"))
        .when(
            F.coalesce(F.col("dup_ngram_frac"), F.lit(0.0)) > max_dup_ngram_frac,
            F.lit("high_repetition"),
        )
        .when(F.col(id_col) != F.col("_keep_id"), F.lit("duplicate"))
        .otherwise(F.lit("kept"))
    )
    return out.select(
        id_col,
        verdict.alias("verdict"),
        "n_tokens",
        "quality",
        "dup_ngram_frac",
        "fingerprint",
    )


# --------------------------------------------------------------- DSIR


def bigram_buckets_from_tokens(toks: Column, n_buckets: int) -> Column:
    """Word-bigram md5 hash buckets (array<long>) from a token-array
    column, the DSIR feature map (Xie et al. 2023 use hashed
    unigram+bigram n-grams). Same md5-prefix arithmetic as
    sampling.hash_bucket / classifier.token_buckets, so a DuckDB oracle
    reproduces every bucket id. Empty array (never NULL-poison, never a
    descending-sequence trap) for texts with < 2 tokens.

    ``toks`` MUST be a staged real column, not an inlined split(...)
    expression: Spark does not CSE across lambda boundaries, so an
    inlined tokenizer re-runs per element_at call — measured 21.6 s vs
    2.3 s (9.5×) for the bucket scan on 5k docs at local[32]."""
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.pmod(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            " ", F.element_at(toks, i), F.element_at(toks, i + 1)
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long"),
            F.lit(n_buckets),
        ),
    )
    return F.when(n >= 2, grams).otherwise(
        F.array().cast("array<long>")
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    alpha: float = 0.5,
) -> DataFrame:
    """DSIR importance weights (Data Selection via Importance Resampling,
    Xie et al. 2023): fit hashed-bigram bag-of-words models of the
    ``target`` (curated seed) and ``raw`` corpora, then score every raw
    document by its log importance ratio

        weight(d) = Σ_b  cnt_d[b] · ( ln p_target[b] − ln p_raw[b] )

    with add-``alpha`` smoothing over ``n_buckets`` buckets. Returns
    (id_col, n_bigrams, weight) for every raw document with ≥ 1 bigram;
    weight is rounded to 4dp (absorbs float sum-order drift, same
    contract as the LM/classifier scores).

    Scale shape: both fits are explode → two-phase hash agg bounded by
    ``n_buckets`` distinct keys; the λ (log-ratio) table is ≤ n_buckets
    rows and joins the per-document counts via broadcast, so the corpus
    side never shuffles grams — the only corpus-sized exchange is the
    (doc, bucket) partial-count agg, itself bounded per document by
    distinct buckets, not token count.
    """
    def bg(df: DataFrame, cols: list[str]) -> DataFrame:
        staged = df.select(
            *cols, F.split(F.lower(F.col(text_col)), r"\s+").alias("_toks")
        )
        return staged.select(
            *cols,
            F.explode(
                bigram_buckets_from_tokens(F.col("_toks"), n_buckets)
            ).alias("bucket"),
        )

    bg_raw = bg(raw, [id_col])
    bg_tgt = bg(target, [])
    rcnt = bg_raw.groupBy("bucket").agg(F.count(F.lit(1)).cast("double").alias("rc"))
    tcnt = bg_tgt.groupBy("bucket").agg(F.count(F.lit(1)).cast("double").alias("tc"))
    tot_r = rcnt.agg(F.sum("rc").alias("tr"))
    tot_t = tcnt.agg(F.coalesce(F.sum("tc"), F.lit(0.0)).alias("tt"))
    b = float(n_buckets)
    lam = (
        rcnt.join(tcnt, "bucket", "left")
        .crossJoin(F.broadcast(tot_r))
        .crossJoin(F.broadcast(tot_t))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("tc"), F.lit(0.0)) + F.lit(alpha))
                    / (F.col("tt") + F.lit(alpha * b))
                )
                - F.log(
                    (F.col("rc") + F.lit(alpha)) / (F.col("tr") + F.lit(alpha * b))
                )
            ).alias("lam"),
        )
    )
    dc = bg_raw.groupBy(id_col, "bucket").agg(
        F.count(F.lit(1)).cast("double").alias("cnt")
    )
    return (
        dc.join(F.broadcast(lam), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("long").alias("n_bigrams"),
            F.round(F.sum(F.col("cnt") * F.col("lam")), 4).alias("weight"),
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    alpha: float = 0.5,
    frac: float = 0.1,
) -> DataFrame:
    """DSIR selection: keep the top ``frac`` of raw documents by
    importance weight (deterministic rank: weight desc, id asc — the
    paper's Gumbel-noise resampling replaced by a reproducible top-k, as
    befits an oracle-checked engine). Returns the selected rows only,
    ordered: (id_col, n_bigrams, weight).

    Scale shape: weights() output is one tiny row per document (id, two
    numbers) — persisted, counted, then top-k'd via sort+limit, which
    Spark executes as TakeOrderedAndProject: a per-partition heap of k
    followed by a k·P driver merge — no global sort exchange ever
    materializes the corpus ordering.
    """
    # localCheckpoint, not persist+unpersist: the count() that sizes k is
    # an action taken BEFORE the returned lazy top-k executes, so a
    # persist released in a finally block was always gone by the time the
    # consumer ran — the weights pipeline was computed twice (ADVICE r5).
    # An eager localCheckpoint materializes the tiny (id, n_bigrams,
    # weight) frame once; both the count and the consumer's
    # TakeOrderedAndProject read the materialized blocks.
    w = dsir_weights(
        raw, target, id_col=id_col, text_col=text_col,
        n_buckets=n_buckets, alpha=alpha,
    ).localCheckpoint(eager=True)
    total = w.count()
    k = int(-(-frac * total // 1))  # ceil without math import
    return w.orderBy(F.desc("weight"), F.asc(id_col)).limit(k)


def split_leakage(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    seed: int = 0,
) -> DataFrame:
    """Train/eval split-leakage audit: near-duplicate pairs that CROSS a
    split boundary. Deduplicating before splitting is the textbook fix
    for eval contamination (Lee et al. 2022 §6.2 measure the inflation
    when you don't); this operator measures the leak on an EXISTING
    split — every (a, b) candidate near-dup pair whose two sides landed
    in different splits, i.e. an eval example whose near-copy is in
    train.

    ``candidates``: (id_a, id_b) near-dup candidate pairs from any lens
    (MinHash-LSH banding, SimHash buckets, embedding cells). Splits are
    recomputed from (seed, id) via sampling.split_assign — pure hash
    arithmetic, so the audit needs no stored split column and the DuckDB
    oracle replays membership exactly.

    Returns (id_a, id_b, split_a, split_b) for crossing pairs only,
    id_a < id_b normalized.

    Scale shape: the split map is a projection of the (tiny per-row)
    id column; the audit is two broadcast-or-key joins of the candidate
    pair table against it — candidate pairs are LSH-bounded (never all
    pairs), and the filter keeps only the rare crossing rows.
    """
    from avro_conversions_spark import sampling

    splits = sampling.split_assign(
        df.select(id_col), id_col=id_col, weights=weights, seed=seed
    ).select(F.col(id_col).alias("_sid"), F.col("split").alias("_sp"))
    a = F.least(F.col("id_a"), F.col("id_b")).alias("id_a")
    b = F.greatest(F.col("id_a"), F.col("id_b")).alias("id_b")
    norm = candidates.select(a, b).where(F.col("id_a") != F.col("id_b")).distinct()
    out = (
        norm.join(splits, norm["id_a"] == splits["_sid"])
        .select("id_a", "id_b", F.col("_sp").alias("split_a"))
        .join(splits, F.col("id_b") == splits["_sid"])
        .select("id_a", "id_b", "split_a", F.col("_sp").alias("split_b"))
        .where(F.col("split_a") != F.col("split_b"))
    )
    return out
