"""Text-analysis functions for the documents pipeline.

Everything except language-ID is a pure ``pyspark.sql.functions``
composition (codegen'd, SQL-oracle-expressible). Language-ID is a
stopword-profile heuristic — a deterministic score per language over
character/word evidence — kept JVM-side as well (a literal map +
array ops), no external model.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish token pattern: letter runs, digit runs, or single punctuation
TOKEN_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# small per-language stopword profiles (public, high-frequency words)
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "des", "dans", "que"],
    "es": ["el", "la", "los", "las", "y", "es", "un", "una", "en", "que"],
    "zh": ["的", "是", "在", "了", "和", "有", "我", "不", "这", "中"],
}


def tokens(col: Column | str, pattern: str = TOKEN_PATTERN) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(c, F.lit(pattern), 0)


def token_count(col: Column | str) -> Column:
    """BPE-ish token count (regex classes, not a learned vocab — the
    Spark-side plumbing is identical for a real tokenizer UDF)."""
    return F.size(tokens(col)).cast("bigint")


def word_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.split(F.trim(c), r"\s+")).cast("bigint")


def quality_metrics(df: DataFrame, text_col: str) -> DataFrame:
    """Per-document quality signals: length, token/word counts, mean
    word length, punctuation ratio, uppercase ratio, stopword ratio —
    the standard cheap filters of web-scale corpus cleaning."""
    c = F.col(text_col)
    words = F.split(F.trim(F.lower(c)), r"\s+")
    n_chars = F.length(c).cast("bigint")
    n_words = F.size(words).cast("bigint")
    n_punct = n_chars - F.length(F.regexp_replace(c, r"[^A-Za-z0-9\s]", ""))
    n_upper = n_chars - F.length(F.regexp_replace(c, r"[A-Z]", ""))
    en_stop = F.array(*[F.lit(w) for w in LANG_PROFILES["en"]])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(en_stop, w)))
    return df.select(
        "*",
        n_chars.alias("n_chars_m"),
        n_words.alias("n_words"),
        (F.length(F.array_join(words, "")).cast("double") / n_words).alias("mean_word_len"),
        (n_punct.cast("double") / n_chars).alias("punct_ratio"),
        (n_upper.cast("double") / n_chars).alias("upper_ratio"),
        (n_stop.cast("double") / n_words).alias("stopword_ratio"),
    )


def language_id(df: DataFrame, text_col: str, out_col: str = "lang_pred") -> DataFrame:
    """Heuristic language ID: score = count of profile stopwords
    present per language; argmax with deterministic tie-break on the
    language code. (The driver corpus is synthetic same-vocabulary
    text, so the interesting part is the operator shape: a literal
    profile broadcast into a codegen'd argmax — a real fastText-style
    model would slot in as a Pandas UDF with the same signature.)"""
    words = F.array_distinct(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
    scores = []
    for lang in sorted(LANG_PROFILES):
        prof = F.array(*[F.lit(w) for w in LANG_PROFILES[lang]])
        score = F.size(F.array_intersect(words, prof))
        scores.append(F.struct(score.alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scores))
    return df.withColumn(out_col, best["lang"]).withColumn(f"{out_col}_score", best["score"])
