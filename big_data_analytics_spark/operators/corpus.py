"""End-to-end training-corpus cleanup pipeline: quality filter →
language filter → exact dedup → near-dedup (the C4/RefinedWeb-style
preprocessing chain), composed from the text/dedup operators.

One function, one lazy plan per stage, stats reported per stage so a
100 TB run can audit what each filter removed (silently dropping data
is the cardinal sin of corpus pipelines).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from big_data_analytics_spark.operators.dedup import exact_dedup, lsh_dedup


@dataclass
class CorpusFilterReport:
    n_input: int
    n_after_quality: int
    n_after_language: int
    n_after_exact_dedup: int
    n_after_near_dedup: int

    def as_dict(self) -> dict[str, int]:
        return self.__dict__.copy()


def quality_predicate(text: Column,
                      min_chars: int = 50,
                      max_chars: int = 1_000_000,
                      min_tokens: int = 10,
                      max_punct_ratio: float = 0.3,
                      max_digit_ratio: float = 0.3) -> Column:
    """Heuristic keep-predicate over raw text (length bounds, token
    count, punctuation/digit density) — pure column expressions."""
    n = F.length(text)
    toks = F.split(F.trim(text), r"\s+")
    def ratio(pattern):
        return (n - F.length(F.regexp_replace(text, pattern, ""))).cast("double") \
            / F.greatest(n, F.lit(1))
    return (
        n.between(min_chars, max_chars)
        & (F.size(toks) >= min_tokens)
        & (ratio(r"[^a-zA-Z0-9 \t\n]") <= max_punct_ratio)
        & (ratio(r"[0-9]") <= max_digit_ratio)
    )


def clean_corpus(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id",
                 languages: tuple[str, ...] = ("en",),
                 lang_col: str | None = "lang",
                 near_dedup: bool = True,
                 lsh_threshold: float = 0.7,
                 **quality_kwargs) -> tuple[DataFrame, CorpusFilterReport]:
    """Run the full cleanup chain; returns (cleaned df, per-stage
    counts). ``lang_col=None`` skips the language stage (or plug the
    t3 heuristic upstream to synthesize one)."""
    n0 = docs.count()

    q = docs.filter(quality_predicate(F.col(text_col), **quality_kwargs))
    n1 = q.count()

    if lang_col is not None:
        q = q.filter(F.col(lang_col).isin(*languages))
    n2 = q.count()

    exact = exact_dedup(q, text_col, id_col)
    n3 = exact.count()

    if near_dedup:
        cleaned = lsh_dedup(exact, text_col, id_col,
                            num_hashes=64, bands=8, threshold=lsh_threshold)
    else:
        cleaned = exact
    n4 = cleaned.count()

    return cleaned, CorpusFilterReport(n0, n1, n2, n3, n4)
