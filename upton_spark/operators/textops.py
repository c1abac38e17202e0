"""Text analysis operators for training-data pipelines over ``documents``.

All hot-path math stays JVM-side (built-in expressions, whole-stage codegen);
Python appears only for the language-ID heuristic and the rolling-hash
fingerprint, both Arrow-batched. These are engine-side capabilities beyond
the reference (which only extracts text); they operate on the corpus the
crawl produces.
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

_STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "se", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "un", "du", "que"],
    "de": ["der", "die", "und", "das", "von", "zu", "den", "mit", "auf", "ist"],
}


def token_count_col(text: Column) -> Column:
    """Whitespace token count, fully JVM-side: tokens in trimmed text."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_ish_token_count_col(text: Column) -> Column:
    """BPE-ish subword proxy: count of word/number/punct fragments via the
    GPT-2-style pre-tokenizer regex family (letters runs, digit runs,
    punct runs)."""
    return F.size(F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0)))


def with_quality_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / punctuation / stopword-ratio quality features + a composite
    score — the standard webtext quality gate, all codegen expressions."""
    text = F.col(text_col)
    n_chars = F.length(text)
    n_tokens = token_count_col(text)
    n_punct = F.length(text) - F.length(F.regexp_replace(text, r"[.,;:!?\"'()]", ""))
    # ' the ' occurrences as a cheap English-stopword signal
    n_the = F.when(n_chars > 0,
                   (F.length(text) - F.length(F.regexp_replace(F.lower(text), r"\bthe\b", ""))) / 3
                   ).otherwise(F.lit(0))
    mean_token_len = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    return (
        df.withColumn("n_chars_calc", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn("n_punct", n_punct)
        .withColumn("punct_ratio", F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0))
        .withColumn("stopword_hits", n_the.cast("long"))
        .withColumn("mean_token_len", mean_token_len)
        .withColumn(
            "quality_score",
            F.when(
                (n_tokens >= 5) & (mean_token_len.between(2.0, 12.0)),
                1.0 - F.least(F.lit(1.0), F.col("punct_ratio") * 4),
            ).otherwise(0.0),
        )
    )


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-profile language guess (n-gram heuristic). Deterministic,
    Arrow-batched; not SQL-oracle-able (registered rows-only)."""

    @F.pandas_udf(T.StringType())
    def guess(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            if not t:
                out.append("und")
                continue
            words = set(t.lower().split()[:400])
            best, best_hits = "und", 0
            for lang, stops in _STOPWORDS.items():
                hits = sum(1 for s in stops if s in words)
                if hits > best_hits:
                    best, best_hits = lang, hits
            out.append(best if best_hits >= 2 else "und")
        return pd.Series(out)

    return df.withColumn("lang_guess", guess(F.col(text_col)))


def fingerprint(df: DataFrame, text_col: str = "text", window: int = 8) -> DataFrame:
    """Rolling-hash document fingerprint (winnowing-style): min CRC32 over
    token n-gram windows — robust to small edits, deterministic."""

    @F.pandas_udf(T.LongType())
    def fp(text: pd.Series) -> pd.Series:
        out = []
        for t in text:
            toks = (t or "").split()
            if len(toks) < window:
                out.append(zlib.crc32(" ".join(toks).encode()) & 0x7FFFFFFF)
                continue
            best = min(
                zlib.crc32(" ".join(toks[i : i + window]).encode())
                for i in range(len(toks) - window + 1)
            )
            out.append(best & 0x7FFFFFFF)
        return pd.Series(out, dtype="int64")

    return df.withColumn("fingerprint", fp(F.col(text_col)))
