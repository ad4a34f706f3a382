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
    prefix = F.substring(F.md5(F.concat(F.lit(f"{salt}:"),
                                        F.col(key_col).cast("string"))), 1, 8)
    return df.where(prefix < thr)
