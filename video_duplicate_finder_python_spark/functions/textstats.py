"""Text-analysis column builders (training-data-pipeline extras).

All JVM-side Column expressions (whole-stage codegen, no UDFs): token
counting (whitespace + regex word extraction), quality scoring
(length / stopword-density heuristics), and a stopword-vote language-ID
heuristic. Each has an exact ANSI-SQL twin in __spark_entry__.oracle_sql().
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

STOPWORDS_EN = ("the", "a", "of", "and", "to", "in", "is", "it")
STOPWORDS_DE = ("der", "die", "das", "und", "ist", "nicht", "ein")
STOPWORDS_FR = ("le", "la", "les", "et", "est", "un", "une")

WORD_RE = "[a-z0-9]+"


def token_count(text: Column) -> Column:
    return F.size(F.split(text, " ")).cast("bigint")


def regex_token_count(text: Column) -> Column:
    """BPE-ish lower-alnum word extraction count."""
    return F.size(F.regexp_extract_all(F.lower(text), F.lit(WORD_RE), 0)).cast("bigint")


def _stop_hits(text: Column, words: tuple[str, ...]) -> Column:
    toks = F.split(text, " ")
    return F.size(F.filter(toks, lambda t: t.isin(*words))).cast("bigint")


def stopword_ratio(text: Column, words: tuple[str, ...] = STOPWORDS_EN) -> Column:
    toks = F.split(text, " ")
    return _stop_hits(text, words).cast("double") / F.size(toks).cast("double")


def quality_score(text: Column) -> Column:
    """Crude quality heuristic in [0,1]: length band + stopword presence.

    score = 0.5 * min(n_tokens, 200)/200 + 0.5 * min(stop_ratio*10, 1)
    (deterministic, expressible identically in SQL).
    """
    toks = F.size(F.split(text, " ")).cast("double")
    len_part = F.least(toks, F.lit(200.0)) / F.lit(200.0)
    stop_part = F.least(stopword_ratio(text) * 10.0, F.lit(1.0))
    return len_part * 0.5 + stop_part * 0.5


def repetition_score(text: Column) -> Column:
    """Gopher-style within-document repetition filter: the fraction of
    2-gram occurrences that are duplicates, 1 - distinct/total (Rae et al.
    2021's duplicate-n-gram family; published heuristic, from-scratch
    expression). Boilerplate-spam pages score near 1, clean prose near 0.

    Pure JVM: zip_with over two shifted slices builds the bigram array, so
    the whole thing stays in whole-stage codegen. Docs with <2 tokens
    score 0.0. The subtraction/division are single IEEE ops — bit-identical
    in any engine computing the same integer counts (DuckDB oracle twin in
    __spark_entry__.oracle_sql()["repetition_scores"]).
    """
    toks = F.split(text, " ")
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda x, y: F.concat(x, F.lit(" "), y),
    )
    frac = F.lit(1.0) - (
        F.size(F.array_distinct(bigrams)).cast("double")
        / F.size(bigrams).cast("double")
    )
    return F.when(n >= 2, frac).otherwise(F.lit(0.0))


def gopher_flags(
    text: Column,
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_rep_frac: float = 0.2,
) -> dict[str, Column]:
    """Composite Gopher-style document filter (Rae et al. 2021's rule
    family; published heuristics, from-scratch expressions): per-rule
    boolean flags plus the combined ``keep``. Every rule is an integer
    comparison or a single IEEE divide over integer counts, so the DuckDB
    oracle computes bit-identical booleans.

    Mean word length uses the single-space tokenization the rest of the
    engine uses: ``(n_chars - (n_tokens - 1)) / n_tokens`` (total chars
    minus separators, per token)."""
    n = F.size(F.split(text, " ")).cast("bigint")
    mean_wl = (F.length(text) - (n - F.lit(1))).cast("double") / n.cast("double")
    flags = {
        "too_short": n < F.lit(min_tokens),
        "too_long": n > F.lit(max_tokens),
        "bad_word_len": (mean_wl < F.lit(min_mean_word_len))
        | (mean_wl > F.lit(max_mean_word_len)),
        "no_stopwords": _stop_hits(text, STOPWORDS_EN) == F.lit(0),
        "repetitive": repetition_score(text) > F.lit(max_rep_frac),
    }
    keep = F.lit(True)
    for c in flags.values():
        keep = keep & ~c
    flags["keep"] = keep
    return flags


def lang_guess(text: Column) -> Column:
    """Stopword-vote language ID: argmax of (en, de, fr) hit counts, 'und'
    when all are zero; ties break en > de > fr (CASE order)."""
    en, de, fr = (
        _stop_hits(text, STOPWORDS_EN),
        _stop_hits(text, STOPWORDS_DE),
        _stop_hits(text, STOPWORDS_FR),
    )
    return (
        F.when((en >= de) & (en >= fr) & (en > 0), F.lit("en"))
        .when((de >= fr) & (de > 0), F.lit("de"))
        .when(fr > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )
