"""Text-analysis operators for large-scale training-data pipelines.

Not in the graph-streaming reference (its data plane is numeric edge
tuples only, SURVEY.md §2.11); these are the document-side operators a
100 TB corpus pipeline needs: tokenization, token counting, quality
scoring, language identification, and document fingerprinting.

Every operator here is a pure Catalyst expression (built-in
``pyspark.sql.functions`` + SQL lambda higher-order functions) — no
Python in the hot path, whole-stage-codegen friendly, and each has an
exact ANSI-SQL twin runnable in DuckDB (see ``__spark_entry__.py``
``oracle_sql``). Determinism rules used throughout so the Spark and
DuckDB results hash-match:

- doubles only as single-division ratios of exact integers (IEEE
  correctly-rounded, bit-identical on both engines);
- hashes via ``md5`` (identical hex on both engines), 60-bit integer
  hashes as ``conv(substr(md5(x), 1, 15), 16, 10)`` ≡ DuckDB
  ``('0x' || substr(md5(x), 1, 15))::UBIGINT``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Normalized whitespace tokenization: lower, trim, collapse runs of
# whitespace, split on single spaces. Mirrors DuckDB
# string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ').
TOKENS_EXPR = "split(regexp_replace(trim(lower({col})), '\\\\s+', ' '), ' ')"

# Small deterministic stopword list (shared with the SQL oracle).
STOPWORDS = ["the", "a", "an", "and", "of", "to", "is", "in", "it", "on"]

# Marker-word profiles for the n-gram-free language-ID heuristic.
# Tie-break order: en > es > fr.
LANG_MARKERS = {
    "en": ["the", "a", "and", "of", "is", "to", "in"],
    "es": ["el", "la", "de", "que", "y", "los", "un"],
    "fr": ["le", "la", "de", "et", "un", "les", "des"],
}


def _sql_list(words: list[str]) -> str:
    return ", ".join(f"'{w}'" for w in words)


def with_tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach a normalized ``tokens`` array column."""
    return docs.withColumn("tokens", F.expr(TOKENS_EXPR.format(col=text_col)))


def token_count(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens): whitespace token count per document.

    A plain projection — pushdown-friendly (only ``doc_id, text`` are
    read from the scan)."""
    return with_tokens(docs).select(
        "doc_id", F.size("tokens").cast("long").alias("n_tokens")
    )


def bpe_ish_token_count(docs: DataFrame) -> DataFrame:
    """(doc_id, n_subtokens): a BPE-ish regex token count — splits on
    word/number/punctuation boundaries the way byte-pair pretokenizers
    do. Still pure Catalyst (regexp_extract_all + size)."""
    # Spark SQL string literals process backslash escapes, so \s needs
    # double-escaping to reach the regex engine intact
    pat = "[a-z]+|[0-9]+|[^a-z0-9\\\\s]"
    return docs.select(
        "doc_id",
        F.size(F.expr(f"regexp_extract_all(lower(text), '{pat}', 0)"))
        .cast("long")
        .alias("n_subtokens"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Per-document quality features + bucket.

    (doc_id, n_chars, n_tokens, n_stopwords, n_punct, stopword_frac,
    quality_bucket) — length, stopword ratio and punctuation counts
    are the standard cheap quality filters for pretraining corpora.
    ``quality_bucket``: 2 = keep, 1 = review, 0 = drop, decided on
    integer thresholds only (hash-stable across engines)."""
    d = with_tokens(docs)
    d = d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        F.size("tokens").cast("long").alias("n_tokens"),
        F.expr(
            f"size(filter(tokens, t -> t IN ({_sql_list(STOPWORDS)})))"
        )
        .cast("long")
        .alias("n_stopwords"),
        (
            F.length("text")
            - F.length(F.regexp_replace("text", "[^a-zA-Z0-9 ]", ""))
        )
        .cast("long")
        .alias("n_punct"),
    )
    d = d.withColumn(
        "stopword_frac",
        F.col("n_stopwords").cast("double")
        / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double"),
    )
    return d.withColumn(
        "quality_bucket",
        F.when(
            (F.col("n_tokens") >= 20)
            & (F.col("n_tokens") <= 100000)
            & (F.col("n_punct") * 5 <= F.col("n_chars")),
            F.lit(2),
        )
        .when(F.col("n_tokens") >= 5, F.lit(1))
        .otherwise(F.lit(0))
        .cast("int"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Marker-word language identification.

    (doc_id, en_hits, es_hits, fr_hits, lang_pred). Counts per-language
    marker-token occurrences and takes the argmax (deterministic
    tie-break en > es > fr, 'und' when no markers hit). The heuristic
    is intentionally SQL-expressible so the DuckDB oracle can replicate
    it exactly; swap in a real n-gram model behind the same schema for
    production."""
    d = with_tokens(docs)
    hits = {
        lang: F.expr(
            f"size(filter(tokens, t -> t IN ({_sql_list(words)})))"
        ).cast("long")
        for lang, words in LANG_MARKERS.items()
    }
    d = d.select(
        "doc_id",
        hits["en"].alias("en_hits"),
        hits["es"].alias("es_hits"),
        hits["fr"].alias("fr_hits"),
    )
    return d.withColumn(
        "lang_pred",
        F.when(
            (F.col("en_hits") >= F.col("es_hits"))
            & (F.col("en_hits") >= F.col("fr_hits"))
            & (F.col("en_hits") > 0),
            F.lit("en"),
        )
        .when((F.col("es_hits") >= F.col("fr_hits")) & (F.col("es_hits") > 0), F.lit("es"))
        .when(F.col("fr_hits") > 0, F.lit("fr"))
        .otherwise(F.lit("und")),
    )


def fingerprint(docs: DataFrame, shingle_chars: int = 8) -> DataFrame:
    """(doc_id, fp): rolling-hash document fingerprint — the minimum
    md5 over all ``shingle_chars``-character sliding shingles (a
    1-hash MinHash, i.e. a winnowing-style content fingerprint).
    Documents shorter than one shingle hash the whole text."""
    n = shingle_chars
    expr = (
        f"array_min(transform(sequence(1, greatest(1, length(text) - {n - 1})),"
        f" i -> md5(substring(text, i, {n}))))"
    )
    return docs.select("doc_id", F.expr(expr).alias("fp"))


def repetition_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_distinct_tokens, n_bigrams,
    n_distinct_bigrams, distinct_token_frac, distinct_bigram_frac):
    Gopher-style repetition signals — low distinct-n-gram fractions
    mark boilerplate/generated text for corpus filtering.

    Pure Catalyst projection (zip_with over two shifted slices builds
    the bigram array — no explode, no shuffle); each fraction is ONE
    double division of two exact integers (hash-stable)."""
    d = with_tokens(docs).withColumn(
        "bigrams",
        F.expr(
            "zip_with(slice(tokens, 1, greatest(size(tokens) - 1, 0)),"
            " slice(tokens, 2, greatest(size(tokens) - 1, 0)),"
            " (a, b) -> concat(a, ' ', b))"
        ),
    )
    d = d.select(
        "doc_id",
        F.size("tokens").cast("long").alias("n_tokens"),
        F.size(F.array_distinct("tokens")).cast("long").alias("n_distinct_tokens"),
        F.size("bigrams").cast("long").alias("n_bigrams"),
        F.size(F.array_distinct("bigrams")).cast("long").alias("n_distinct_bigrams"),
    )
    return d.select(
        "*",
        (
            F.col("n_distinct_tokens").cast("double")
            / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double")
        ).alias("distinct_token_frac"),
        (
            F.col("n_distinct_bigrams").cast("double")
            / F.greatest(F.col("n_bigrams"), F.lit(1)).cast("double")
        ).alias("distinct_bigram_frac"),
    )


# PII patterns shared by pii_stats / redact_pii and their SQL twins.
# Kept to syntax with identical semantics in Java regex (Spark) and
# RE2 (DuckDB): character classes, bounded repetition, optional
# groups — no backreferences, no lookaround. Dict order is the
# redaction order.
PII_PATTERNS = {
    "email": "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}",
    "ssn": "[0-9]{3}-[0-9]{2}-[0-9]{4}",
    "phone": "\\+?[0-9]{1,2}[- ]?\\(?[0-9]{3}\\)?[- .][0-9]{3}[- .][0-9]{4}",
    "ipv4": "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}",
}


def pii_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_email, n_ssn, n_phone, n_ipv4, pii_total,
    redact_delta): per-document PII hit counts per pattern class plus
    the character-count change a full redaction would make
    (``redact_delta`` = len(original) - len(redacted), negative when
    the '<PII>' placeholder is longer than the match).

    Counts are non-overlapping leftmost matches — identical semantics
    in Java regex and RE2 for these patterns (verified by the DuckDB
    oracle hash). Patterns are passed as API literals, NOT through
    Spark SQL string literals (which eat backslashes)."""
    counts = [
        F.regexp_count(F.col(text_col), F.lit(p)).cast("long").alias(f"n_{k}")
        for k, p in PII_PATTERNS.items()
    ]
    d = docs.select("doc_id", F.col(text_col).alias("_t"), *counts)
    red = F.col("_t")
    for p in PII_PATTERNS.values():
        red = F.regexp_replace(red, p, "<PII>")
    total = sum((F.col(f"n_{k}") for k in PII_PATTERNS), F.lit(0).cast("long"))
    return d.select(
        "doc_id",
        *[f"n_{k}" for k in PII_PATTERNS],
        total.cast("long").alias("pii_total"),
        (F.length("_t") - F.length(red)).cast("long").alias("redact_delta"),
    )


def redact_pii(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace every PII_PATTERNS match in ``text_col`` with '<PII>'
    (in dict order — email before the digit patterns so addresses are
    consumed whole). Same projection the ``redact_delta`` stat is
    derived from."""
    red = F.col(text_col)
    for p in PII_PATTERNS.values():
        red = F.regexp_replace(red, p, "<PII>")
    return docs.withColumn(text_col, red)
