"""Learning-to-rank feature extraction — per-(query, doc) feature frames
(Elasticsearch Learning-to-Rank plugin's feature logging / the classic
LETOR-style feature sets; public docs "Elasticsearch LTR featuresets",
Qin & Liu's LETOR benchmarks).

A ranking model is trained offline on (query, doc, features, label) rows;
producing the feature frame AT SCALE is the part that belongs to this
engine: every feature here is computed from the index artifacts the
engine already maintains — no raw-text re-scan, no per-query driver work.

Features per (query_id, doc_id) over the OR match set:

    bm25         full BM25 score (the engine's Lucene-quantized kernel)
    qld          full LMDirichlet score (same kernel, qld scorer)
    n_matched    distinct query terms present in the doc
    match_ratio  n_matched / |distinct query terms|
    sum_tf / max_tf / min_tf   over the matched terms' tfs
    dlq          the quantized document length the scorers used
    sum_idf      Σ idf over matched terms (fixed term-asc fold)

Spark-first shape (100 TB): two matches_only kernel passes (bm25 + qld —
exact scores, no depth cut) plus ONE posting decode for the term-level
aggregates (term_postings_frame: In-pushed terms, tombstone-masked);
everything downstream is combinable groupBys and broadcast joins of
query-bounded frames. Joins between the three per-doc frames key on
(query_id, docid) — hash-partitioned, no skew beyond the match sets
themselves. Float determinism: sum_idf folds term-asc; bm25/qld come
from the bit-replayable kernel — the whole frame is SQL-replayable
(oracle ``ltr_features``)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import RetrieveConfig, TextConfig
from .bm25f import term_postings_frame
from .queryparse import iter_term_clauses
from .retrieve import load_index_meta, process_queries, search


def ltr_features(spark: SparkSession, index_path: str,
                 queries: list[tuple[str, str]], *,
                 text_cfg: TextConfig | None = None, lang: str = "eng",
                 k1: float = 0.9, b: float = 0.4,
                 mu: float = 1000.0) -> DataFrame:
    """(query_id, doc_id, docid, bm25, qld, n_matched, match_ratio,
    sum_tf, max_tf, min_tf, dlq, sum_idf) for every (query, doc) pair in
    the OR match set. A doc whose qld score clamps to nothing still
    appears (qld coalesces to 0.0 — LMDirichlet's per-term max(0, ·) can
    zero a matching doc; silently dropping it would bias training
    labels)."""
    plans = process_queries(list(queries), text_cfg or TextConfig(),
                            lang=lang)
    qrows = sorted({(p.qid, t)
                    for p in plans for c in iter_term_clauses(p.clauses)
                    for t, _ in c.terms})
    if not qrows:
        raise ValueError("ltr_features needs at least one query term")
    n_qterms = {}
    for qid, _t in qrows:
        n_qterms[qid] = n_qterms.get(qid, 0) + 1

    bm25 = search(spark, index_path, plans,
                  RetrieveConfig(name="bm25", k1=k1, b=b),
                  matches_only=True).select(
        "query_id", "doc_id", "docid", F.col("score").alias("bm25"))
    qld = search(spark, index_path, plans,
                 RetrieveConfig(name="qld", mu=mu),
                 matches_only=True).select(
        "query_id", "docid", F.col("score").alias("qld"))

    # term-level aggregates from ONE posting decode; idf from the same
    # frame's per-term df (count of decoded docs = live df)
    meta = load_index_meta(index_path)
    num_docs = int(meta["num_docs"])
    tfr = term_postings_frame(spark, index_path,
                              sorted({t for _q, t in qrows}))
    dfs = tfr.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = dfs.select(
        "term",
        F.log(F.lit(1.0) + (F.lit(float(num_docs)) - F.col("df")
                            + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))
        .alias("idf"))
    qdf = spark.createDataFrame(qrows, "query_id string, term string")
    terms = (tfr.join(F.broadcast(qdf), "term")
             .join(F.broadcast(idf), "term")
             .groupBy("query_id", "docid")
             .agg(F.count(F.lit(1)).cast("int").alias("n_matched"),
                  F.sum("tf").cast("long").alias("sum_tf"),
                  F.max("tf").cast("int").alias("max_tf"),
                  F.min("tf").cast("int").alias("min_tf"),
                  F.max("dlq").cast("int").alias("dlq"),
                  F.aggregate(
                      F.array_sort(F.collect_list(
                          F.struct(F.col("term").alias("k"),
                                   F.col("idf").alias("v")))),
                      F.lit(0.0), lambda acc, x: acc + x["v"])
                  .alias("sum_idf")))

    nq = spark.createDataFrame(list(n_qterms.items()),
                               "query_id string, n_qterms int")
    return (bm25.join(qld, ["query_id", "docid"], "left")
            .join(terms, ["query_id", "docid"])
            .join(F.broadcast(nq), "query_id")
            .select("query_id", "doc_id", "docid", "bm25",
                    F.coalesce("qld", F.lit(0.0)).alias("qld"),
                    "n_matched",
                    (F.col("n_matched") / F.col("n_qterms"))
                    .alias("match_ratio"),
                    "sum_tf", "max_tf", "min_tf", "dlq", "sum_idf"))
