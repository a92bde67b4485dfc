"""Deterministic corpus sampling — hash-based Bernoulli, stratified
rates, and disjoint split assignment.

Training-data pipelines need reproducible sampling that does not depend
on partitioning, row order, executor count, or Spark's RNG (``df.sample``
is seed-stable only for a fixed partitioning — a repartitioned rerun
draws a different subset). These helpers key every decision on
``xxhash64(key, salt)`` alone: the same row gets the same decision in any
run, any cluster size, any engine that reproduces xxhash64 — so samples
are re-derivable from the raw table and auditable.

All pure-JVM column expressions (zero shuffle, zero UDF, codegen'd
filters that stack under pushdown); the scale cost of sampling a 100 TB
table is exactly one scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# denominator for rate quantization: rates are exact multiples of 1e-6
_DENOM = 1_000_000


def _bucket(key: Column, salt: str) -> Column:
    """Uniform bucket in [0, 1e6) from (key, salt) — the shared decision
    variable. Salting separates independent decisions on the same key
    (e.g. a 1% sample and a train/val split must not correlate)."""
    return F.pmod(F.xxhash64(key, F.lit(salt)), F.lit(_DENOM))


def hash_sample(
    df: DataFrame, rate: float, key_col: str = "url", salt: str = "sample"
) -> DataFrame:
    """Deterministic Bernoulli(rate) sample keyed on ``key_col``.

    Monotone in ``rate``: the 1% sample is a subset of the 10% sample at
    the same salt (buckets below 10_000 ⊂ buckets below 100_000) — so a
    pilot run's subset nests inside the production sample."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return df.where(_bucket(F.col(key_col), salt) < int(rate * _DENOM))


def stratified_sample(
    df: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    default_rate: float = 0.0,
    key_col: str = "url",
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum Bernoulli rates (e.g. ``{"en": 0.1, "de": 0.5}``);
    strata absent from ``rates`` get ``default_rate``. The rates map is
    folded into ONE literal CASE expression — no join, no broadcast, one
    codegen'd filter at the scan."""
    for k, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {k!r} must be in [0, 1], got {r}")
    threshold = F.lit(int(default_rate * _DENOM))
    for value, r in sorted(rates.items()):
        threshold = F.when(
            F.col(strata_col) == F.lit(value), F.lit(int(r * _DENOM))
        ).otherwise(threshold)
    return df.where(_bucket(F.col(key_col), salt) < threshold)


def assign_split(
    df: DataFrame,
    splits: dict[str, float] | None = None,
    key_col: str = "url",
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Append a deterministic split label (default 98/1/1
    train/validation/test). Splits are DISJOINT and EXHAUSTIVE by
    construction: consecutive bucket ranges of one decision variable —
    a row can never land in two splits, and fractions must sum to 1."""
    splits = splits or {"train": 0.98, "validation": 0.01, "test": 0.01}
    total = sum(splits.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split fractions must sum to 1, got {total}")
    b = _bucket(F.col(key_col), salt)
    expr = None
    upper = 0
    items = sorted(splits.items())
    for name, frac in items[:-1]:
        upper += int(frac * _DENOM)
        cond = b < F.lit(upper)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = items[-1][0]
    expr = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.withColumn(out_col, expr)


def budget_sample(
    df: DataFrame,
    budgets: dict[str, int],
    token_col: str = "n_tokens",
    strata_col: str = "lang",
    key_col: str = "url",
    salt: str = "budget",
) -> DataFrame:
    """Sample each stratum down to ~a token budget (e.g. "100M English
    tokens, 50M German") — the corpus-mixing step of training-data
    assembly.

    Two passes, both skew-free: (1) one map-side-combinable groupBy
    totals tokens per stratum; (2) each stratum's rate =
    min(1, budget / total) is folded into the same literal-CASE Bernoulli
    filter ``stratified_sample`` uses, so the selection is deterministic,
    partition-independent, and nested across re-runs with growing
    budgets. The hit is E[tokens] = budget with binomial concentration
    (relative error ~ 1/sqrt(docs selected): a fraction of a percent once
    a budget spans 10^4+ docs); exact-to-the-token packing would need a
    per-stratum global sort, which is the skew class this engine avoids
    everywhere else.

    Strata absent from ``budgets`` are dropped (rate 0).
    """
    totals = {
        r[strata_col]: r["_total"]
        for r in df.groupBy(strata_col)
        .agg(F.sum(token_col).alias("_total"))
        .collect()
        if r[strata_col] in budgets
    }
    rates = {
        s: min(1.0, budgets[s] / totals[s]) if totals.get(s) else 0.0
        for s in budgets
    }
    return stratified_sample(
        df, rates, strata_col=strata_col, default_rate=0.0, key_col=key_col, salt=salt
    )
