"""Text analysis operators: normalization, fingerprinting, token counting,
quality scoring, language identification.

All pure Catalyst column expressions — no Python UDFs — so they stay inside
whole-stage codegen and scale linearly with input splits. Mirrors the
reference's text kernels (normalize_text utils.py:612-621, clean_summary
importer.py:717-723, content fingerprinting utils.py:623-726) generalized to
corpus scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker lists for the n-gram/stopword language heuristic.
# Deliberately small and deterministic — the point is the distributed
# scoring shape (score-per-language → argmax), not linguistic accuracy.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "fr": ("le", "la", "et", "les"),
    "es": ("el", "los", "y", "una"),
    "de": ("der", "und", "die", "das"),
}

# BPE-ish pre-tokenizer: word pieces, digit runs, single punctuation marks.
BPE_TOKEN_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def normalized(text: Column) -> Column:
    """Lowercase + whitespace-collapse + trim (utils.py:612-616 semantics)."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(text: Column) -> Column:
    """Deterministic content fingerprint of the normalized text — the
    corpus-scale analogue of the advisory content-id (utils.py:694-726)."""
    return F.md5(normalized(text))


def ws_token_count(text: Column) -> Column:
    """Whitespace token count (plain-space tokenizer, matching the shingle
    tokenizer in llm.dedup)."""
    return F.size(F.split(text, " "))


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count via the pre-tokenizer regex."""
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE))


def char_estimate_tokens(text: Column) -> Column:
    """chars/4 heuristic token estimate (ceiling)."""
    return F.ceil(F.length(text) / F.lit(4.0)).cast("bigint")


def marker_hits(text: Column, words: tuple[str, ...]) -> Column:
    """Number of marker-word occurrences (word-boundary matched)."""
    pattern = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(text), F.lit(pattern))


def language_scores(text: Column) -> dict[str, Column]:
    return {lang: marker_hits(text, ws) for lang, ws in LANG_MARKERS.items()}


def predicted_language(text: Column) -> Column:
    """argmax over language marker scores, ties broken by language code
    order, 'und' (undetermined) when no marker hits at all."""
    scores = language_scores(text)
    best = F.greatest(*scores.values())
    pred = F.lit("und")
    # build the when-chain in reverse so earlier languages win ties
    for lang in sorted(scores, reverse=True):
        pred = F.when(scores[lang] == best, F.lit(lang)).otherwise(pred)
    return F.when(best > 0, pred).otherwise(F.lit("und"))


def quality_metrics(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality metrics + composite score in [0, 1].

    Length, token stats, stopword ratio — the same class of signals the
    reference uses for data-quality ToDos (compute_advisory_todo.py), here
    as corpus quality scoring for training-data filtering.
    """
    text = F.col(text_col)
    n_tokens = ws_token_count(text)
    n_chars = F.length(text)
    avg_token_len = F.round((n_chars - (n_tokens - 1)) / n_tokens, 4)
    stop_ratio = F.round(marker_hits(text, LANG_MARKERS["en"]) / n_tokens, 4)
    score = F.round(
        F.least(F.lit(1.0), n_tokens / F.lit(64.0)) * 0.5
        + F.least(F.lit(1.0), stop_ratio * 4) * 0.25
        + F.when((avg_token_len >= 3) & (avg_token_len <= 8), 0.25).otherwise(0.0),
        4,
    )
    return df.select(
        F.col(id_col),
        n_tokens.cast("bigint").alias("n_tokens"),
        n_chars.cast("bigint").alias("n_chars"),
        avg_token_len.alias("avg_token_len"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )
