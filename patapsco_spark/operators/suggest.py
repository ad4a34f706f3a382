"""Query-assist surfaces over the term dictionary: autocomplete + spell.

A search frontend needs two query-time helpers the index already paid
for: prefix AUTOCOMPLETE ("dat" → "data", "database", …) and spell
SUGGESTION ("qeury" → "query") — both are reads of the term_stats
dictionary (term, df, cf), ranked by corpus evidence. They share the
retrieval layer's segment/snapshot gating (``read_term_stats``) so a
suggestion can never surface a term from an uncommitted append.

Ranking policy (stated, since suggesters are policy):
- completions: cf desc (corpus frequency — what users most likely mean),
  term asc on ties. df ships too so callers can re-rank by document
  coverage instead.
- spell: edit distance asc FIRST (closer beats commoner — Lucene's
  DirectSpellChecker default), then cf desc, term asc. The input term
  itself is excluded; ``min_cf`` screens hapax noise (OCR junk dominates
  a web dictionary's tail).

Scale shape: completions push a ``StartsWith`` filter into the parquet
scan (dictionary-encoded column — near-free) and take top-k via sort;
spell cannot push levenshtein, but pushes a LENGTH BAND (|len(term) -
len(q)| ≤ max_edits, a necessary condition for edit distance) plus a
first-character prefilter when ``prefix_lock`` (Lucene's prefixLength
analogue, default 1: typos rarely hit the first letter) — the remaining
candidates run JVM-side ``levenshtein`` (Catalyst built-in, no Python).
Both return driver-sized frames (k rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .indexer import read_term_stats
from .retrieve import load_index_meta


def _dictionary(spark: SparkSession, index_path: str) -> DataFrame:
    """(term, df, cf) over the committed segments of the live generation."""
    meta = load_index_meta(index_path)
    shard_base = int(meta.get("shard_base", 0))
    stats_base = int(meta.get("stats_base", shard_base))
    return read_term_stats(spark, index_path,
                           num_shards=int(meta["num_shards"]),
                           shard_base=stats_base)


def suggest_completions(spark: SparkSession, index_path: str, prefix: str,
                        k: int = 10) -> DataFrame:
    """Top-k dictionary terms extending ``prefix``: (term, df, cf) by
    (cf desc, term asc). Empty prefix is refused — that is "the whole
    dictionary sorted", a different (and driver-hostile) query."""
    if not prefix:
        raise ValueError("completion prefix must be non-empty")
    return (_dictionary(spark, index_path)
            .where(F.col("term").startswith(prefix))
            .orderBy(F.col("cf").desc(), F.col("term").asc())
            .limit(k))


def suggest_spelling(spark: SparkSession, index_path: str, term: str,
                     k: int = 5, max_edits: int = 2, min_cf: int = 2,
                     prefix_lock: int = 1) -> DataFrame:
    """Top-k spelling suggestions for ``term``: dictionary terms within
    ``max_edits`` Levenshtein edits, (distance asc, cf desc, term asc),
    the input itself excluded. ``prefix_lock`` first characters must
    match exactly (0 disables); ``min_cf`` drops tail noise."""
    if not term:
        raise ValueError("spell target must be non-empty")
    if max_edits < 1:
        raise ValueError("max_edits must be >= 1")
    d = _dictionary(spark, index_path)
    n = len(term)
    cand = d.where(
        (F.length("term") >= n - max_edits)
        & (F.length("term") <= n + max_edits)
        & (F.col("term") != term)
        & (F.col("cf") >= min_cf))
    if prefix_lock > 0:
        cand = cand.where(
            F.col("term").startswith(term[:prefix_lock]))
    return (cand.withColumn("distance", F.levenshtein(F.col("term"),
                                                      F.lit(term)))
            .where(F.col("distance") <= max_edits)
            .orderBy(F.col("distance").asc(), F.col("cf").desc(),
                     F.col("term").asc())
            .limit(k)
            .select("term", "distance", "df", "cf"))
