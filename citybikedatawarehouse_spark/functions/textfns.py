"""Text-analysis column functions (north-star extension): tokenizing,
stopword/marker counting, quality components, fingerprinting.

All pure Catalyst expressions (regexp/array built-ins) — no UDFs, so
they run JVM-side inside whole-stage codegen and scale linearly with
the cluster. Patterns restricted to the regex subset where Java
(Spark) and RE2 (DuckDB oracle) agree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# language marker words for the n-gram/stopword language-ID heuristic;
# checked in this fixed order, ties broken by order
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "a"],
    "de": ["der", "und", "die", "ist", "das"],
    "fr": ["le", "et", "les", "est", "la"],
    "es": ["el", "y", "los", "es", "la"],
}

BPE_ISH_TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def words(text: Column | str) -> Column:
    """Whitespace tokenization (trim first: no empty edge tokens)."""
    text = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(text), r"\s+")


def word_count(text: Column | str) -> Column:
    return F.size(words(text)).cast("bigint")


def token_count_bpe_ish(text: Column | str) -> Column:
    """Sub-word-ish token count: alpha runs, digit runs, single
    punctuation — a cheap proxy for BPE token budgeting."""
    text = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_TOKEN_PATTERN), 0)).cast(
        "bigint"
    )


def marker_hits(text: Column | str, markers: list[str]) -> Column:
    """Count of whole-word occurrences of any marker."""
    text = F.col(text) if isinstance(text, str) else text
    pat = r"\b(" + "|".join(markers) + r")\b"
    return F.size(F.regexp_extract_all(text, F.lit(pat), 0)).cast("bigint")


def language_id(text: Column | str) -> Column:
    """Argmax of marker hits across LANG_MARKERS, fixed tie order;
    'und' (undetermined) when nothing matches."""
    text = F.col(text) if isinstance(text, str) else text
    hits = {lang: marker_hits(text, m) for lang, m in LANG_MARKERS.items()}
    best = F.greatest(*hits.values())
    expr = F.lit("und")
    # build reversed so earlier languages win ties
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when((hits[lang] > 0) & (hits[lang] == best), F.lit(lang)).otherwise(
            expr
        )
    return expr


def fingerprint(text: Column | str) -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted
    distinct word set — catches shuffled/reordered near-duplicates."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(words(text)))))


def winnow_fingerprint_pairs(
    docs: DataFrame,
    k: int = 8,
    w: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): md5 over every k-char window of the normalized text
    (the rolling-hash pass), then the minimum hash of each w-window
    of those — a position-robust fingerprint set whose density is
    ~2/(w+1) regardless of document length. Matching fingerprints
    across documents locate shared passages (plagiarism/near-dup
    evidence) via a plain equi-join on the output.

    Narrow, codegen-only pipeline — but staged across THREE
    projections on purpose: lambdas do not subexpression-eliminate,
    so the normalized text and the hash array must each be bound to
    a column before a transform() indexes into them, or they are
    recomputed per element (same trap as dedup_ops.shingles).

    Returns distinct (id, fingerprint) rows; texts shorter than k
    chars yield no rows."""
    s = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " "))
    staged = docs.select(id_col, s.alias("__s"))
    n_hash = F.length("__s") - k + 1
    hashes = F.when(
        n_hash >= 1,
        F.transform(
            F.sequence(F.lit(1), n_hash),
            lambda i: F.md5(F.substring(F.col("__s"), i, F.lit(k)).cast("binary")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    hashed = staged.select(id_col, hashes.alias("__h"))
    n_win = F.size("__h") - w + 1
    fps = F.when(
        n_win >= 1,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n_win),
                lambda j: F.array_min(F.slice(F.col("__h"), j, w)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return hashed.select(id_col, F.explode(fps).alias("fingerprint"))
