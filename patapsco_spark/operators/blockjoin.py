"""Parent-child block join: score child documents (passages, anchor
texts, product offers), then rank PARENTS by an aggregate of their
matching children's scores — Lucene's ``ToParentBlockJoinQuery`` with its
``ScoreMode`` family (max / total / avg / min), the standard way a web
index answers "best page by its best passage".

The reference retrieves whole documents only (one Lucene doc per HC4 doc,
/root/reference/patapsco/retrieve.py); passage-level evidence rollup is
the growth path every modern web/RAG stack needs, so it is built here as
a first-class operator.

Spark-first shape — no block-adjacency trick needed: Lucene stores parent
and children physically adjacent in one segment and joins via a bitset
walk, which is exactly the kind of hand-scheduled physical layout Catalyst
replaces. Here the child index is an ordinary sharded index whose external
ids encode the parent (``{parent}{sep}{ordinal}``); the retrieval kernel
runs once in ``matches_only`` mode (every matching child, exact scores,
distributed), and the rollup is ONE map-side-combinable groupBy on the
parent key + a per-query top-k window — two shuffles total, both on keys
that shrink the data (children → parents → k rows). Parent scores are
EXACT because no child top-k cut happens before the rollup (a depth-cut
cascade would silently under-count ``total``/``avg`` parents).

Child generation (:func:`passage_children`) is pure Catalyst
(split/sequence/slice/array_join — fuses into the scan, no Python), so at
100 TB the passage frame is never materialized except as the index build's
input stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import RetrieveConfig
from .queryparse import QueryPlan
from .retrieve import search

SCORE_MODES = ("max", "total", "avg", "min")


def passage_children(docs: DataFrame, window: int = 24, stride: int = 12,
                     id_col: str = "id", text_col: str = "text",
                     lang_col: str = "lang", sep: str = "#p") -> DataFrame:
    """Explode documents into overlapping token-window passages —
    (``{parent}{sep}{i}``, text, lang) rows ready for ``build_index``.

    Tokens are whitespace runs; passage ``i`` covers token positions
    ``[i·stride, i·stride + window)`` and passages start at every stride
    multiple strictly below the document length (an empty document yields
    one empty passage so the parent stays represented). Pure Catalyst:
    split → sequence → explode → slice → array_join; the parent id must
    not contain ``sep``.
    """
    if window <= 0 or stride <= 0:
        raise ValueError(f"window/stride must be positive, got "
                         f"{window}/{stride}")
    toks = F.filter(F.split(F.col(text_col), r"\s+"),
                    lambda x: x != F.lit(""))
    dl = F.size(toks)
    starts = F.sequence(F.lit(0), F.greatest(dl - 1, F.lit(0)),
                        F.lit(stride))
    return (docs
            .select(F.col(id_col).cast("string").alias("__pid"),
                    toks.alias("__toks"), F.col(lang_col).alias("lang"),
                    F.explode(starts).alias("__s"))
            .select(F.concat(F.col("__pid"), F.lit(sep),
                             (F.col("__s") / stride).cast("long"))
                    .alias(id_col),
                    F.array_join(F.slice("__toks", F.col("__s") + 1,
                                         window), " ").alias(text_col),
                    "lang"))


def block_join_topk(spark: SparkSession, child_index_path: str,
                    plans: list[QueryPlan],
                    cfg: RetrieveConfig | None = None, *,
                    score_mode: str = "max", sep: str = "#p") -> DataFrame:
    """Top-k PARENTS from a child index: (query_id, doc_id, best_child,
    n_children, rank, score) with rank starting at 0.

    ``score_mode`` is Lucene's ToParentBlockJoin ScoreMode: the parent
    score is the max / total / avg / min of its matching children's
    scores (ScoreMode.None is not offered — an unscored block join is
    just a semi-join, use ``match_set`` + a distinct on the parent).
    ``best_child`` is the highest-scoring matching child, ties broken by
    lowest child internal docid (Lucene's internal-docid tie-break);
    ``n_children`` counts matching children. Parents rank by
    (score desc, parent id asc) — parents are not index documents here,
    so there is no internal parent docid to tie-break on.

    ``total``/``avg`` sum floating-point child scores; summation order is
    Spark's aggregation order, so equality checks against a serial replay
    should compare within an ulp-scale tolerance (``max``/``min`` are
    order-free and exact)."""
    if score_mode not in SCORE_MODES:
        raise ValueError(f"unknown score_mode: {score_mode!r} "
                         f"(one of {SCORE_MODES})")
    cfg = cfg or RetrieveConfig()
    ms = search(spark, child_index_path, plans, cfg, matches_only=True)
    agg = {"max": F.max, "total": F.sum, "avg": F.avg,
           "min": F.min}[score_mode]("score").alias("score")
    parents = (ms
               .withColumn("__parent", F.substring_index("doc_id", sep, 1))
               .groupBy("query_id", "__parent")
               .agg(agg,
                    F.expr("max_by(doc_id, struct(score, -docid))")
                    .alias("best_child"),
                    F.count("*").alias("n_children")))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"),
                                               F.asc("__parent"))
    return (parents.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= cfg.k)
            .select("query_id", F.col("__parent").alias("doc_id"),
                    "best_child", "n_children",
                    (F.col("__rn") - 1).alias("rank"), "score")
            .orderBy("query_id", "rank"))
