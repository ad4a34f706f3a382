"""Deterministic corpus sampling for training-data pipelines.

Beyond the reference's scope (patapsco has no sampler), but first-class
for assembling LLM training mixes at 100 TB: every published data recipe
(C4, The Pile, Gopher/MassiveText, RefinedWeb) draws per-source or
per-language subsets at fixed rates, and the draw must be DETERMINISTIC —
reproducible across runs, engines, partitionings, and cluster sizes —
which rules out ``DataFrame.sample`` (seeded per-partition, so the kept
set changes whenever the partitioning does).

The primitive here is hash-threshold selection: keep a row iff the first
8 hex chars of ``md5(salt ':' key)`` sort below the fraction's hex
threshold. Fixed-length lowercase-hex comparison is lexicographic =
numeric, md5 is engine-portable (identical in Spark and DuckDB — the
repo-wide oracle discipline, see operators/dedup.py), and the decision
depends only on (salt, key), never on placement: a row keeps or drops
identically on 1 executor or 1000, local[8] or local[32]. Changing
``salt`` redraws independently; the same salt at two fractions yields
NESTED samples (f1 < f2 ⇒ sample(f1) ⊆ sample(f2)) — the property that
lets a pipeline grow a subset without resampling from scratch.

Pure Catalyst: one md5 + one string compare per row, fused into the scan;
no shuffle, no UDF, no driver state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPACE = 16 ** 8  # first 8 md5 hex chars


def _threshold_hex(fraction: float) -> str:
    """Largest-prefix threshold: P(md5_prefix < threshold) = fraction."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    n = int(fraction * _HEX_SPACE)
    if n >= _HEX_SPACE:
        # 'g' sorts above every hex char: keep-all. A 9-char '100000000'
        # would break the fixed-length lexicographic=numeric equivalence.
        return "g"
    return format(n, "08x")


def _keep(key: Column, fraction: float, salt: str) -> Column:
    # NULL keys coalesce to '' so they get a real (shared) hash decision:
    # md5(concat(salt, NULL)) is NULL and NULL < threshold filters FALSE,
    # which silently dropped NULL-key rows even at fraction=1.0
    return (F.substring(F.md5(F.concat(F.lit(f"{salt}:"),
                                       F.coalesce(key.cast("string"),
                                                  F.lit("")))), 1, 8)
            < F.lit(_threshold_hex(fraction)))


def deterministic_sample(df: DataFrame, fraction: float, key_col: str,
                         salt: str = "s0") -> DataFrame:
    """Uniform deterministic sample: keep each row iff its key hashes
    below the fraction threshold. Same (salt, key) ⇒ same decision
    everywhere; E[|out|] = fraction·|df| with md5's uniformity."""
    return df.where(_keep(F.col(key_col), fraction, salt))


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: dict[str, float], key_col: str,
                      salt: str = "s0",
                      default_fraction: float = 0.0) -> DataFrame:
    """Per-stratum deterministic rates — the training-mix primitive
    (e.g. keep 50% of English, 10% of everything else). ``fractions``
    maps stratum value → fraction; strata absent from the map use
    ``default_fraction`` (0.0 = drop, the explicit-mix default). The
    per-stratum thresholds compile to one CASE expression — still a
    single scan-fused predicate, no join."""
    thr = F.lit(_threshold_hex(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(F.col(strata_col) == value,
                     F.lit(_threshold_hex(frac))).otherwise(thr)
    # NULL keys coalesce to '' for a real hash decision (same fix as _keep:
    # md5(concat(.., NULL)) is NULL and NULL < threshold filters FALSE,
    # silently dropping NULL-key rows even at fraction 1.0)
    prefix = F.substring(F.md5(F.concat(F.lit(f"{salt}:"),
                                        F.coalesce(
                                            F.col(key_col).cast("string"),
                                            F.lit("")))), 1, 8)
    return df.where(prefix < thr)


def temperature_fractions(df: DataFrame, strata_col: str, *,
                          alpha: float = 0.5,
                          budget_rows: int) -> dict[str, float]:
    """Temperature-scaled mixing weights — the multilingual / multi-source
    training-mix recipe (mBERT, XLM-R, mT5; published as exponentiated
    sampling p_s ∝ (n_s/N)^α): raising sizes to α < 1 upsamples rare
    strata relative to proportional sampling without letting any stratum
    dominate. Returns {stratum: keep fraction} such that expected kept
    rows ≈ ``budget_rows`` distributed ∝ (n_s/N)^α, each fraction capped
    at 1.0 (a rare stratum can't yield more rows than it has — the
    standard truncation; the budget is then slightly under-filled rather
    than silently re-normalized, so rates stay independent of other
    strata's caps and the draw stays nested under budget growth).

    Driver-bounded: one groupBy-count collect of #strata rows (languages /
    sources — dozens, never corpus-sized). Float determinism: the
    normalizer folds in sorted-stratum order, so fractions are
    bit-reproducible and SQL-replayable."""
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"alpha must be in (0, 1], got {alpha}")
    if budget_rows < 0:
        raise ValueError(f"budget_rows must be >= 0, got {budget_rows}")
    rows = df.groupBy(strata_col).count().collect()
    counts = {r[0]: int(r[1]) for r in rows if r[0] is not None}
    n = sum(counts.values())
    if n == 0:
        return {}
    w = {s: (counts[s] / n) ** alpha for s in counts}
    z = 0.0
    for s in sorted(w):
        z += w[s]
    return {s: min(1.0, budget_rows * w[s] / z / counts[s]) for s in counts}


def temperature_sample(df: DataFrame, strata_col: str, key_col: str, *,
                       alpha: float = 0.5, budget_rows: int,
                       salt: str = "t0") -> DataFrame:
    """Draw a temperature-α training mix of ≈``budget_rows`` rows:
    :func:`temperature_fractions` over the live strata, then the same
    deterministic md5-threshold selection as :func:`stratified_sample`
    (scan-fused CASE, no shuffle, placement-independent). Strata unseen
    at fraction time (concurrent appends) drop — the mix is pinned to the
    observed distribution, not whatever arrives later."""
    fr = temperature_fractions(df, strata_col, alpha=alpha,
                               budget_rows=budget_rows)
    return stratified_sample(df, strata_col, fr, key_col, salt=salt,
                             default_fraction=0.0)
