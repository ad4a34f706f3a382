"""Run evaluation — the rebuild of the reference's ``Scorer``
(/root/reference/patapsco/score.py:61-172), which drives pytrec_eval.
pytrec_eval is a C extension around trec_eval; we re-implement the measures
the reference configures (map, ndcg, ndcg', recall@k, P@k, judged@k) as pure
DataFrame plans so evaluation distributes with the run (a run is small —
≤ k·|queries| rows — but at 10^6 queries the groupBys still matter).

Reference semantics preserved exactly (score.py:114-121):
- run queries absent from the qrels are dropped;
- qrels queries absent from the run score 0 on every metric (empty run);
- ndcg' = restrict the run to judged docs (per query), then ndcg
  (score.py:140-161); if a query has no judged docs in the run, ndcg' = ndcg
  (i.e. 0 vs the non-empty ideal);
- means are arithmetic over all scored queries ("all" row).

trec_eval conventions: docs are (re)ranked by (score desc, doc_id **desc**)
— trec_eval's internal tie-break — gains are linear (DCG = Σ rel/log2(rank+1)),
AP divides by R = |{rel>0}| from the qrels, P@k divides by k, recall@k by R.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_METRICS = ("map", "ndcg", "ndcg_prime", "recall_100", "recall_1000",
                   "P_10")


def _ranked(run: DataFrame) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.desc("doc_id"))
    return run.withColumn("trec_rank", F.row_number().over(w))


def _dcg(col_rel: str, col_rank: str):
    return F.sum(F.col(col_rel) / F.log2(F.col(col_rank) + F.lit(1.0)))


def evaluate_run(run: DataFrame, qrels: DataFrame,
                 metrics: tuple[str, ...] = DEFAULT_METRICS) -> DataFrame:
    """(query_id, doc_id, score) run × (query_id, doc_id, relevance) qrels →
    one row per (query_id ∪ 'all') with one column per metric."""
    qrels = qrels.select("query_id", "doc_id",
                         F.col("relevance").cast("double").alias("rel"))
    qrel_queries = qrels.select("query_id").distinct()

    # reference: drop run queries not in qrels (inner-ish), keep qrels
    # queries with no run rows (they score 0) — a right outer at query level
    run = _ranked(run.join(qrel_queries, "query_id", "left_semi"))
    joined = (run.join(qrels, ["query_id", "doc_id"], "left")
              .withColumn("rel", F.coalesce("rel", F.lit(0.0))))

    # per-query qrels stats: R (num relevant), ideal DCG over ALL judged docs
    wq = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.desc("doc_id"))
    ideal = (qrels.withColumn("irank", F.row_number().over(wq))
             .groupBy("query_id")
             .agg(_dcg("rel", "irank").alias("idcg"),
                  F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)).alias("num_rel")))

    # AP: precision at each relevant hit / R
    wrank = (Window.partitionBy("query_id").orderBy("trec_rank")
             .rowsBetween(Window.unboundedPreceding, 0))
    per_doc = (joined
               .withColumn("cum_rel",
                           F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)).over(wrank))
               .withColumn("prec_at", F.col("cum_rel") / F.col("trec_rank")))

    # ndcg' ranking: judged docs only, re-ranked compactly (score.py:148-152)
    judged_only = joined.join(qrels.select("query_id", "doc_id"),
                              ["query_id", "doc_id"], "left_semi")
    wj = Window.partitionBy("query_id").orderBy("trec_rank")
    judged_ranked = judged_only.withColumn("jrank", F.row_number().over(wj))

    agg_main = per_doc.groupBy("query_id").agg(
        F.sum(F.when(F.col("rel") > 0, F.col("prec_at")).otherwise(0.0)).alias("ap_num"),
        _dcg("rel", "trec_rank").alias("dcg"),
        F.sum(F.when((F.col("rel") > 0) & (F.col("trec_rank") <= 100), 1)
              .otherwise(0)).alias("rel_at_100"),
        F.sum(F.when((F.col("rel") > 0) & (F.col("trec_rank") <= 1000), 1)
              .otherwise(0)).alias("rel_at_1000"),
        F.sum(F.when((F.col("rel") > 0) & (F.col("trec_rank") <= 10), 1)
              .otherwise(0)).alias("rel_at_10"),
    )
    agg_prime = judged_ranked.groupBy("query_id").agg(
        _dcg("rel", "jrank").alias("dcg_prime"))

    per_q = (ideal
             .join(agg_main, "query_id", "left")
             .join(agg_prime, "query_id", "left")
             .select(
                 "query_id",
                 F.when(F.col("num_rel") > 0,
                        F.coalesce("ap_num", F.lit(0.0)) / F.col("num_rel"))
                 .otherwise(0.0).alias("map"),
                 F.when(F.col("idcg") > 0,
                        F.coalesce("dcg", F.lit(0.0)) / F.col("idcg"))
                 .otherwise(0.0).alias("ndcg"),
                 F.when(F.col("idcg") > 0,
                        F.coalesce("dcg_prime", F.col("dcg"), F.lit(0.0)) / F.col("idcg"))
                 .otherwise(0.0).alias("ndcg_prime"),
                 F.when(F.col("num_rel") > 0,
                        F.coalesce("rel_at_100", F.lit(0)) / F.col("num_rel"))
                 .otherwise(0.0).alias("recall_100"),
                 F.when(F.col("num_rel") > 0,
                        F.coalesce("rel_at_1000", F.lit(0)) / F.col("num_rel"))
                 .otherwise(0.0).alias("recall_1000"),
                 (F.coalesce("rel_at_10", F.lit(0)) / F.lit(10.0)).alias("P_10"),
             ))

    keep = ["query_id"] + [m for m in metrics if m in per_q.columns]
    per_q = per_q.select(*keep)
    mean_row = per_q.groupBy(F.lit("all").alias("query_id")).agg(
        *[F.avg(m).alias(m) for m in keep[1:]])
    return per_q.unionByName(mean_row)
