"""Text-analysis operators: token counting, quality scoring, language-ID,
document fingerprinting. All pure Catalyst column expressions (whole-stage
codegen; no Python), each with an exact SQL oracle.

Determinism notes: ratios are single double divisions of integers
(bit-identical across engines); nothing sums doubles across rows.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are", "was",
    "for", "on", "with", "as", "by", "at", "from", "it", "this", "that",
]

_PUNCT = ".,;:!?"


def token_count_col(text: str | Column = "text") -> Column:
    return F.size(F.split(text, " "))


def uniq_token_count_col(text: str | Column = "text") -> Column:
    return F.size(F.array_distinct(F.split(text, " ")))


def stopword_ratio_col(text: str | Column = "text") -> Column:
    toks = F.split(text, " ")
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*EN_STOPWORDS)))
    return n_stop.cast("double") / F.size(toks)


def punct_ratio_col(text: str | Column = "text") -> Column:
    stripped = F.translate(text, _PUNCT, "")
    return (F.length(text) - F.length(stripped)).cast("double") / F.length(text)


def quality_score_col(text: str | Column = "text",
                      as_millionths: bool = False) -> Column:
    """Composite quality score in [0,1]: length term + lexical diversity +
    stopword prose-likeness (a Gopher/C4-style heuristic mix).

    ``as_millionths`` returns ``floor(score*1e6 + 0.5)`` as BIGINT — the
    engine-portable form (round() half-way behaviour differs between
    engines exactly at .5 boundaries; floor of identical doubles cannot).
    """
    toks = F.split(text, " ")
    n = F.size(toks)
    length_term = F.least(n.cast("double") / F.lit(100.0), F.lit(1.0))
    diversity = F.size(F.array_distinct(toks)).cast("double") / n
    stop = stopword_ratio_col(text)
    score = (length_term * 0.4 + diversity * 0.3
             + F.least(stop * F.lit(3.0), F.lit(1.0)) * 0.3)
    if as_millionths:
        return F.floor(score * 1000000.0 + 0.5).cast("long")
    return F.round(score, 6)


def lang_id_col(text: str | Column = "text",
                threshold: float = 0.12) -> Column:
    """n-gram-free heuristic language ID: English stopword share of tokens
    plus an ASCII-share gate — 'en' / 'other' / 'non_latin'."""
    toks = F.split(text, " ")
    stop = stopword_ratio_col(text)
    ascii_share = (
        F.length(F.regexp_replace(text, "[^\\x00-\\x7F]", "")).cast("double")
        / F.length(text)
    )
    return (
        F.when(ascii_share < 0.5, F.lit("non_latin"))
        .when(stop >= threshold, F.lit("en"))
        .otherwise(F.lit("other"))
    )


def fingerprint_col(text: str | Column = "text") -> Column:
    """Whole-document fingerprint (md5)."""
    return F.md5(text)


def rolling_fingerprint_col(text: str | Column = "text",
                            window: int = 8) -> Column:
    """Winnowing-style document fingerprint: the minimum md5 over the
    document's word ``window``-grams — robust to local edits (published
    winnowing/MOSS idea, simplified to a single min-sample)."""
    toks = F.split(text, " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (window - 1), F.lit(1)))
    grams = F.transform(
        idx,
        lambda i: F.md5(F.concat_ws(
            " ", *[F.element_at(toks, F.least(i + j, F.size(toks)))
                   for j in range(window)]
        )),
    )
    return F.array_min(grams)
