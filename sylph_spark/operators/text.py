"""Text-analysis operators for training-data pipelines: quality features,
language-ID heuristic, token counting, fingerprinting. All built-in-function
expressions (whole-stage codegen); DataFrame-API versions of the
txt_* queries in ``__spark_entry__`` (DuckDB-verified there)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PUNCT = [".", ",", "!"]


def quality_features(
    df: DataFrame, id_col: str, text_col: str, min_chars: int = 100, max_chars: int = 5000
) -> DataFrame:
    """(id, n_tokens, punct_ratio, quality_ok): cheap quality scoring."""
    text = F.col(text_col)
    stripped = text
    for p in _PUNCT:
        stripped = F.replace(stripped, F.lit(p), F.lit(""))
    return df.select(
        F.col(id_col),
        F.size(F.split(F.trim(text), " +")).alias("n_tokens"),
        ((F.length(text) - F.length(stripped)) / F.length(text)).alias("punct_ratio"),
        F.when(F.length(text).between(min_chars, max_chars), 1)
        .otherwise(0)
        .alias("quality_ok"),
    )


def _hits(text, word: str):
    """occurrences of ``word`` via the length-replace trick (pure SQL)."""
    return (F.length(text) - F.length(F.replace(text, F.lit(word), F.lit("")))) / len(
        word
    )


# Stopword profiles: the highest-frequency closed-class words of each
# language, space-delimited so they match whole tokens only. Extend per
# deployment language mix — scoring is argmax over whatever profiles are
# passed, earlier entries winning ties.
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "is", "of", "to"],
    "fr": ["le", "la", "les", "et", "est"],
    "de": ["der", "die", "und", "ist", "nicht"],
    "es": ["el", "los", "que", "es", "una"],
}


def language_id(
    df: DataFrame,
    id_col: str,
    text_col: str,
    profiles: dict[str, list[str]] | None = None,
) -> DataFrame:
    """Stopword-profile language ID: per-language stopword hit counts over
    the lowercased, space-padded text (length-replace trick — pure built-in
    expressions, whole-stage codegen), argmax with ties broken by profile
    declaration order; 'other' when no profile scores a single hit."""
    profiles = profiles or LANG_PROFILES
    pt = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    scores = {
        lang: sum(_hits(pt, f" {w} ") for w in words)
        for lang, words in profiles.items()
    }
    langs = list(profiles)
    chain = None
    for lang in langs:
        cond = scores[lang] > 0
        for other in langs:
            if other != lang:
                cond = cond & (scores[lang] >= scores[other])
        chain = F.when(cond, lang) if chain is None else chain.when(cond, lang)
    return df.select(
        F.col(id_col), chain.otherwise("other").alias("pred_lang")
    )


def token_count(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace tokens + a BPE-ish subword proxy (chars/4 heuristic used
    widely for budget estimates)."""
    text = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(F.split(F.trim(text), " +")).alias("ws_tokens"),
        F.ceil(F.length(text) / 4).cast("long").alias("bpe_ish_tokens"),
    )


def text_fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Normalized-content fingerprint (md5 of lowercased text)."""
    return df.select(
        F.col(id_col),
        F.md5(F.lower(F.col(text_col))).alias("fp"),
        F.length(F.col(text_col)).alias("n_chars"),
    )
