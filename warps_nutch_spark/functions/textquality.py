"""Gopher document-level quality rules (Rae et al. 2021, "Scaling
Language Models: Methods, Analysis & Insights from Training Gopher",
Table A1) — the full battery beyond the repetition rules already in
``q_gopher_repetition`` (§A1.1):

- word count within [min_words, max_words] (50..100,000)
- mean word length within [3, 10] characters
- symbol-to-word ratio (``#`` and ``...``) <= 0.1
- < 90% of lines starting with a bullet point
- < 30% of lines ending with an ellipsis
- >= 80% of words containing at least one alphabetic character
- at least 2 of the 8 English stop words
  (the, be, to, of, and, that, have, with)

Spark shape: one projection, pure codegen — array-domain ``transform``
/ ``filter`` / ``aggregate`` over the token and line arrays, no UDF,
no shuffle. That is the right 100 TB form: a single scan computes
every rule.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]

#: rule thresholds (Rae et al. 2021 Table A1)
MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN = 3.0, 10.0
MAX_SYMBOL_WORD_RATIO = 0.1
MAX_BULLET_LINE_FRAC = 0.9
MAX_ELLIPSIS_LINE_FRAC = 0.3
MIN_ALPHA_WORD_FRAC = 0.8
MIN_STOPWORD_HITS = 2

#: word separators inside a line-joined document (space or newline)
TOKEN_SPLIT = "[ \n]"


def gopher_quality_cols(lines: str = "_lines") -> dict[str, Column]:
    """Quality-metric columns over a ``lines`` array column (the
    document split into lines). Words are the lines joined by newline
    and split on :data:`TOKEN_SPLIT` — so every rule, word-level and
    line-level, scores the SAME document.

    Returns named metric columns and the combined ``pass_gopher``
    predicate."""
    joined = F.array_join(F.col(lines), "\n")
    toks = F.split(joined, TOKEN_SPLIT)
    n_words = F.size(toks)
    tok_sql = f"split(array_join({lines}, '\\n'), '[ \\n]')"
    mean_word_len = F.round(
        F.expr(
            f"aggregate(transform({tok_sql}, w -> length(w)), 0L, (a, x) -> a + x)"
        ).cast("double")
        / n_words,
        6,
    )
    stop_hits = sum(
        F.array_contains(toks, w).cast("int") for w in GOPHER_STOPWORDS
    )
    alpha_word_frac = F.round(
        F.expr(f"size(filter({tok_sql}, w -> w rlike '[A-Za-z]'))").cast("double")
        / n_words,
        6,
    )
    n_lines = F.greatest(F.size(F.col(lines)), F.lit(1))
    bullet_line_frac = F.round(
        F.expr(f"size(filter({lines}, s -> s like '- %' or s like '• %'))").cast(
            "double"
        )
        / n_lines,
        6,
    )
    ellipsis_line_frac = F.round(
        F.expr(f"size(filter({lines}, s -> s like '%...' or s like '%…'))").cast(
            "double"
        )
        / n_lines,
        6,
    )
    n_hash = F.length(joined) - F.length(F.regexp_replace(joined, "#", ""))
    n_ellipsis = (
        F.length(joined) - F.length(F.regexp_replace(joined, r"\.\.\.", ""))
    ) / F.lit(3)
    symbol_word_ratio = F.round((n_hash + n_ellipsis).cast("double") / n_words, 6)
    pass_gopher = (
        n_words.between(MIN_WORDS, MAX_WORDS)
        & mean_word_len.between(MIN_MEAN_WORD_LEN, MAX_MEAN_WORD_LEN)
        & (symbol_word_ratio <= MAX_SYMBOL_WORD_RATIO)
        & (bullet_line_frac < MAX_BULLET_LINE_FRAC)
        & (ellipsis_line_frac < MAX_ELLIPSIS_LINE_FRAC)
        & (alpha_word_frac >= MIN_ALPHA_WORD_FRAC)
        & (stop_hits >= MIN_STOPWORD_HITS)
    )
    return {
        "word_count": n_words,
        "mean_word_len": mean_word_len,
        "symbol_word_ratio": symbol_word_ratio,
        "bullet_line_frac": bullet_line_frac,
        "ellipsis_line_frac": ellipsis_line_frac,
        "alpha_word_frac": alpha_word_frac,
        "stopword_hits": stop_hits,
        "pass_gopher": pass_gopher,
    }
