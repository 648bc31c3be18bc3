"""Text analysis operators for large-scale training-data pipelines.

All operators are pure JVM-side column expressions (no Python UDFs in
the hot path) over the ``documents`` schema
(doc_id, text, lang, source, n_chars — FIXTURES.md §A). At 100 TB
each is a narrow map over the parquet scan; only the aggregations
shuffle.

Every function here is deliberately expressible in ANSI SQL so the
DuckDB oracle can replay it exactly (single-space tokenization +
lambda list ops — no engine-specific regex/tokenizer divergence).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Marker stopwords per language for the marker-count language-ID
# heuristic. Deterministic scoring (no model).
LANG_MARKERS = {
    "en": ["the", "a", "of"],
    "de": ["der", "die", "das"],
    "fr": ["le", "la", "les"],
    "es": ["el", "los", "una"],
    "zh": ["de", "shi", "le"],
}

STOPWORDS = ["the", "a", "of", "and", "to"]


def tokens(text: Column) -> Column:
    """Single-space tokenization — identical in Spark (`split`) and
    DuckDB (`string_split`)."""
    return F.split(text, " ", -1)


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def occurrence_count(text: Column, word: str) -> Column:
    """Exact count of a token (split + filter, JVM lambda)."""
    return F.size(
        F.filter(tokens(text), lambda x: x == F.lit(word))
    ).cast("long")


def stopword_ratio(text: Column) -> Column:
    """Fraction of tokens that are stopwords."""
    sw = F.size(
        F.filter(tokens(text), lambda x: x.isin(STOPWORDS))
    ).cast("double")
    return sw / token_count(text).cast("double")


def distinct_token_ratio(text: Column) -> Column:
    """Lexical diversity: distinct tokens / total tokens."""
    return (
        F.size(F.array_distinct(tokens(text))).cast("double")
        / token_count(text).cast("double")
    )


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0,1]: length saturation +
    lexical diversity (C4/Gopher-style training-data filter rules,
    deterministic and SQL-replayable)."""
    n_tok = token_count(text)
    len_score = F.least(n_tok.cast("double") / F.lit(50.0), F.lit(1.0))
    div_score = distinct_token_ratio(text)
    return F.round((len_score + div_score) / F.lit(2.0), 6)


def lang_scores(text: Column) -> dict[str, Column]:
    """Deterministic per-language marker-token counts."""
    out = {}
    for lang, words in LANG_MARKERS.items():
        out[lang] = F.size(
            F.filter(tokens(text), lambda x: x.isin(words))
        ).cast("long")
    return out


def predict_lang(text: Column) -> Column:
    """argmax language by marker count, ties broken alphabetically —
    replayable in SQL via GREATEST + CASE."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in sorted(scores, reverse=True):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return F.when(best > 0, expr).otherwise(F.lit("und"))


def normalize_text(text: Column) -> Column:
    """Canonical text normalization for dedup/fingerprint pipelines:
    lowercase, non-alphanumeric → space, collapse runs of spaces,
    trim. Pure JVM regexp (whole-stage codegen); byte-identical to
    DuckDB ``regexp_replace(..., 'g')`` on ASCII inputs."""
    clean = F.regexp_replace(F.lower(text), "[^a-z0-9 ]", " ")
    return F.trim(F.regexp_replace(clean, " +", " "))


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the lower-cased text (content-
    defined key for exact dedup; md5 is identical across engines)."""
    return F.md5(F.lower(text))


def with_text_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the full text-analysis feature set as columns."""
    from dislib_spark.utils.base import fan_out

    t = F.col(text_col)
    return (
        fan_out(df).withColumn("n_tokens", token_count(t))
        .withColumn("stopword_ratio", F.round(stopword_ratio(t), 6))
        .withColumn("quality", quality_score(t))
        .withColumn("pred_lang", predict_lang(t))
        .withColumn("fingerprint", fingerprint(t))
    )


# BPE-ish subword pre-tokenizer: greedy left-to-right chunks of up to
# 4 letters / 3 digits, plus one token per other non-space char —
# the deterministic regex stand-in for a trained subword vocab (the
# real BPE apply is t30's mapInPandas; this one is pure JVM regexp
# AND replayable in DuckDB's regexp_extract_all, so fertility ratios
# built on it are full-oracle).
SUBWORD_RE = "[a-zA-Z]{1,4}|[0-9]{1,3}|[^a-zA-Z0-9 ]"


def subword_count(text: Column) -> Column:
    """Number of BPE-ish regex subword pieces in ``text`` — greedy
    fixed-width chunking is identical under Java regex and RE2, so
    the count replays exactly."""
    return F.regexp_count(text, F.lit(SUBWORD_RE)).cast("long")
