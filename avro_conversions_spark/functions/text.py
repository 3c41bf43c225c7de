"""Text-analysis column functions for training-data pipelines.

All pure ``pyspark.sql.functions`` expressions (JVM-side, codegen'd) —
no Python in the data path. Each has an ANSI-SQL equivalent used by the
DuckDB oracle in __spark_entry__.py, so every function here is
cross-checked for value parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny deterministic stopword sets for the language-ID heuristic
STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "on"),
    "es": ("el", "la", "de", "que", "y", "en", "los", "se", "del", "las"),
    "de": ("der", "die", "und", "das", "von", "mit", "den", "ein", "für", "ist"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization of lowercased text."""
    return F.split(F.lower(text), r"\s+")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def char_count(text: Column) -> Column:
    return F.length(text)


# BPE-style pretokenizer (simplified GPT-2 shape, engine-portable): letter
# runs, digit runs, and single non-alphanumeric marks each count as one
# pretoken — the unit BPE merges operate on. Kept regex-portable so the
# DuckDB oracle reproduces counts exactly.
BPE_PRETOKEN_RX = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def bpe_token_count(text: Column) -> Column:
    """Approximate BPE pretoken count (task brief: 'token counting —
    whitespace + a BPE-ish regex'). An upper-bound proxy for LLM token
    budgets that needs no vocab file; JVM-side regexp_count."""
    return F.regexp_count(text, F.lit(BPE_PRETOKEN_RX))


def avg_token_len(text: Column) -> Column:
    """Mean token length — a cheap quality signal."""
    t = tokens(text)
    return F.aggregate(
        t, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    ) / F.size(t)


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are neither alphanumeric nor whitespace
    (portable definition: identical semantics in Spark and the SQL oracle,
    unlike Java's \\p{Punct}). Empty text → 0.0: under ANSI mode the bare
    division is a DIVIDE_BY_ZERO that would crash the whole job on one
    empty document — a failure-as-rows contract violation (round-5 edge
    probe); the oracles carry the same CASE guard."""
    stripped = F.regexp_replace(text, r"[a-zA-Z0-9\s]", "")
    return F.when(F.length(text) > 0, F.length(stripped) / F.length(text)).when(
        F.length(text) == 0, F.lit(0.0)
    )  # NULL text stays NULL (matches the SQL oracle's null algebra)


def stopword_hits(text: Column, lang: str) -> Column:
    """Number of *distinct* stopwords of ``lang`` present (set semantics,
    so the SQL oracle's list_intersect matches exactly)."""
    return F.size(
        F.array_intersect(tokens(text), F.lit(list(STOPWORDS[lang])))
    )


def langid(text: Column) -> Column:
    """Tiny n-gram-free language-ID heuristic: argmax of stopword hits with
    a deterministic tie order (en > es > de > und)."""
    en, es, de = (stopword_hits(text, l) for l in ("en", "es", "de"))
    return (
        F.when((en >= es) & (en >= de) & (en > 0), F.lit("en"))
        .when((es >= de) & (es > 0), F.lit("es"))
        .when(de > 0, F.lit("de"))
        .otherwise(F.lit("und"))
    )


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality score: long enough, words not too long/short,
    not punctuation-heavy. Deterministic, oracle-expressible. NULL text →
    NULL (explicitly: Spark's NULL-skipping least() and when().otherwise()
    would otherwise leak a meaningless 0.5 while the SQL oracle leaks a
    different 0.83 — pinned by the round-5 edge probe); empty text scores
    low but never throws (the bare punct-ratio division was an ANSI
    DIVIDE_BY_ZERO job-killer on one empty document)."""
    n_tok = token_count(text)
    length_ok = F.least(n_tok / F.lit(20.0), F.lit(1.0))
    word_len = avg_token_len(text)
    word_ok = F.when((word_len >= 3) & (word_len <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(text) * 5, F.lit(1.0))
    return F.when(
        text.isNotNull(), F.round((length_ok + word_ok + punct_ok) / 3, 4)
    )


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the normalized text (lowercase,
    punctuation stripped, whitespace collapsed). Collisions = near-exact
    duplicates under formatting noise."""
    norm = F.trim(
        F.regexp_replace(F.regexp_replace(F.lower(text), r"[^a-z0-9\s]", ""), r"\s+", " ")
    )
    return F.md5(norm)


KGRAM_MAX_LEN = 262_144  # 256 KiB of text → ≤256k-element gram array (~2 MB)


def kgram_truncated(text: Column, max_len: int = KGRAM_MAX_LEN) -> Column:
    """True when ``kgram_hashes`` will only scan a prefix of this document —
    the visible no-silent-caps flag that must ride alongside fingerprints
    produced from capped text."""
    return F.length(text) > max_len


def kgram_hashes(text: Column, k: int = 8, max_len: int = KGRAM_MAX_LEN) -> Column:
    """Rolling character k-gram hashes: H(i) = hash(substr(text, i, k)) for
    every position. md5-derived 32-bit values so the DuckDB oracle can
    reproduce them bit-for-bit; production swaps to xxhash64 like the
    MinHash path (dedup.py:15-18). Pure higher-order-function expression —
    O(len) per document, JVM-side.

    The scan is capped at ``max_len`` characters: the gram array
    materializes inside ONE row, so an uncapped multi-MB document would
    allocate a multi-million-element long array (8 B each) in executor
    memory — a cliff at 100 TB. The cap is never silent: surface
    ``kgram_truncated(text, max_len)`` next to the fingerprints (the same
    discipline as embedding_near_duplicates' bucket_capped flag). A
    256 KiB prefix is far past where winnowed fingerprints saturate for
    near-dup detection.

    Implementation note: the cap bounds ``n`` (the index sequence) rather
    than wrapping ``text`` in a substring — Spark does not CSE across
    lambda boundaries, so a ``substr(text, 1, max_len)`` referenced inside
    the per-element lambda would re-copy the prefix once per gram."""
    n = F.greatest(
        F.least(F.length(text), F.lit(max_len)) - k + 1, F.lit(1)
    )
    return F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.conv(
            F.substring(F.md5(text.substr(i, F.lit(k))), 1, 8), 16, 10
        ).cast("long"),
    )


def winnowed_fingerprints(grams: Column, w: int = 4) -> Column:
    """Winnowing (the MOSS scheme): minimum hash of every window of ``w``
    consecutive k-gram hashes, deduplicated and sorted. Guarantees any
    shared substring of length >= k + w - 1 yields a shared fingerprint —
    the rolling-hash document-fingerprinting primitive. Pass an
    ALREADY-MATERIALIZED gram-array column (Spark does not CSE across
    lambda boundaries; see shingles_from_tokens)."""
    n_win = F.greatest(F.size(grams) - w + 1, F.lit(1))
    return F.array_sort(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_win),
                lambda j: F.array_min(F.slice(grams, j, w)),
            )
        )
    )


def shingles_from_tokens(t: Column, n: int = 3) -> Column:
    """Distinct n-word shingles from an ALREADY-MATERIALIZED token-array
    column. Pass a real column (not an inline split() expression): each
    element_at in the lambda references ``t`` verbatim, and Spark does not
    eliminate common subexpressions across lambda boundaries — an inline
    split() would be re-evaluated 3× per shingle, turning shingling
    O(words²) per document (measured 16 s → <2 s on 260k shingles)."""
    idx = F.sequence(F.lit(0), F.greatest(F.size(t) - n, F.lit(0)))
    return F.array_distinct(
        F.when(
            F.size(t) >= n,
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", *[F.element_at(t, (i + j + 1).cast("int")) for j in range(n)]
                ),
            ),
        ).otherwise(F.array(F.concat_ws(" ", t)))
    )


def ngrams_from_tokens(t: Column, n: int) -> Column:
    """ALL n-gram instances (NOT distinct — unlike shingles_from_tokens,
    which deduplicates for set-based MinHash/Jaccard) from an
    already-materialized token-array column; empty array when the
    document has fewer than ``n`` tokens. Instance multiplicity is the
    point: repetition metrics count how often each n-gram recurs. Same
    CollapseProject discipline as shingles_from_tokens — pass a staged
    column, never an inline split()."""
    idx = F.sequence(F.lit(0), F.size(t) - n)
    return F.when(
        F.size(t) >= n,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", *[F.element_at(t, (i + j + 1).cast("int")) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct n-word shingles (the unit for MinHash / Jaccard dedup).
    Convenience form; hot paths should stage tokens as a column and call
    shingles_from_tokens (see its docstring)."""
    return shingles_from_tokens(tokens(text), n)
