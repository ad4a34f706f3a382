"""Run evaluation — the rebuild of the reference's ``Scorer``
(/root/reference/patapsco/score.py:61-172), which drives pytrec_eval.
pytrec_eval is a C extension around trec_eval; we re-implement the measures
the reference configures (map, ndcg, ndcg', ndcg_cut@k, recall@k, P@k) as
pure DataFrame plans so evaluation distributes with the run (a run is small —
≤ k·|queries| rows — but at 10^6 queries the groupBys still matter).

Reference semantics preserved exactly (score.py:61-172):
- metric names are normalized like the reference (``@`` → ``_``,
  ``ndcg'`` → ``ndcg_prime``, score.py:79-82) and validated up front — an
  unsupported measure raises ConfigError instead of being silently dropped;
- the run is truncated to the top ``depth`` (default 1000) docs per query
  before scoring — patapsco truncates runs to 1000 since 0.9.7
  (RELEASES.md), matching trec_eval's default run depth;
- run queries absent from the qrels are dropped;
- qrels queries absent from the run score 0 on every metric (empty run);
- topics whose qrels contain NO positive judgment (num_rel == 0) are
  excluded from evaluation entirely — trec_eval/pytrec_eval behavior —
  rather than contributing zeros to the mean;
- ndcg' = restrict the run to judged docs (per query), then ndcg
  (score.py:140-161); if a query has no judged docs in the run, ndcg' = ndcg
  (i.e. 0 vs the non-empty ideal);
- means are arithmetic over all scored queries ("all" row).

trec_eval conventions: docs are (re)ranked by (score desc, doc_id **desc**)
— trec_eval's internal tie-break — gains are linear (DCG = Σ rel/log2(rank+1)),
AP divides by R = |{rel>0}| from the qrels, P@k divides by k, recall@k by R,
ndcg_cut@k = DCG@k / IDCG@k (ideal also truncated at k).
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..config import ConfigError

DEFAULT_METRICS = ("map", "ndcg", "ndcg_prime", "recall_100", "recall_1000",
                   "P_10")

_CUT_FAMILY = re.compile(r"^(recall|P|ndcg_cut|judged|success)_(\d+)$")


def normalize_metrics(metrics) -> list[str]:
    """Reference preprocessing (score.py:79-82): '@' → '_', ndcg' → ndcg_prime."""
    out = []
    for m in metrics:
        m = m.replace("@", "_")
        out.append("ndcg_prime" if m == "ndcg'" else m)
    return out


def _parse_metrics(metrics: list[str]) -> dict[str, dict[int, str]]:
    """Validate and split into families; raises ConfigError on unknown."""
    fams: dict[str, dict[int, str]] = {"recall": {}, "P": {}, "ndcg_cut": {},
                                       "judged": {}, "success": {}}
    for m in metrics:
        if m in ("map", "ndcg", "ndcg_prime", "recip_rank", "Rprec", "bpref"):
            continue
        match = _CUT_FAMILY.match(m)
        if not match:
            raise ConfigError(
                f"unsupported metric '{m}'; supported: map, ndcg, ndcg' "
                f"(ndcg_prime), recip_rank, Rprec, bpref, recall_<k>, P_<k>, "
                f"ndcg_cut_<k>, judged_<k>, success_<k> "
                f"(also accepted with '@': recall@100, P@10, ...)")
        fams[match.group(1)][int(match.group(2))] = m
    return fams


def _ranked(run: DataFrame) -> DataFrame:
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.desc("doc_id"))
    return run.withColumn("trec_rank", F.row_number().over(w))


def _dcg(col_rel: str, col_rank: str, cut: int | None = None) -> Column:
    term = F.col(col_rel) / F.log2(F.col(col_rank) + F.lit(1.0))
    if cut is not None:
        term = F.when(F.col(col_rank) <= cut, term).otherwise(F.lit(0.0))
    return F.sum(term)


def _rel_at(cut: int) -> Column:
    return F.sum(F.when((F.col("rel") > 0) & (F.col("trec_rank") <= cut), 1)
                 .otherwise(0))


def evaluate_run(run: DataFrame, qrels: DataFrame,
                 metrics: tuple[str, ...] = DEFAULT_METRICS,
                 depth: int | None = 1000) -> DataFrame:
    """(query_id, doc_id, score) run × (query_id, doc_id, relevance) qrels →
    one row per (query_id ∪ 'all') with one column per metric.

    depth: run truncation before scoring (reference default 1000,
    RELEASES.md 0.9.7); None disables truncation."""
    metrics = normalize_metrics(list(metrics))
    fams = _parse_metrics(metrics)

    qrels = qrels.select("query_id", "doc_id",
                         F.col("relevance").cast("double").alias("rel"))
    qrel_queries = qrels.select("query_id").distinct()

    # reference: drop run queries not in qrels (inner-ish), keep qrels
    # queries with no run rows (they score 0) — a right outer at query level
    run = _ranked(run.join(qrel_queries, "query_id", "left_semi"))
    if depth is not None:
        run = run.where(F.col("trec_rank") <= depth)
    joined = (run.join(qrels, ["query_id", "doc_id"], "left")
              # judged ⟺ the (query, doc) pair appears in the qrels at ANY
              # grade (including 0 = judged non-relevant) — judged_k counts
              # these, rel-based metrics treat unjudged as rel 0
              .withColumn("judged", F.col("rel").isNotNull())
              .withColumn("rel", F.coalesce("rel", F.lit(0.0))))

    # per-query qrels stats: R (num relevant), ideal DCG over ALL judged docs
    # (+ cut ideals for ndcg_cut@k)
    wq = Window.partitionBy("query_id").orderBy(F.desc("rel"), F.desc("doc_id"))
    ideal_aggs = [_dcg("rel", "irank").alias("idcg"),
                  F.sum(F.when(F.col("rel") > 0, 1).otherwise(0)).alias("num_rel")]
    for k in fams["ndcg_cut"]:
        ideal_aggs.append(_dcg("rel", "irank", cut=k).alias(f"idcg_{k}"))
    ideal = (qrels.withColumn("irank", F.row_number().over(wq))
             .groupBy("query_id").agg(*ideal_aggs))

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

    main_aggs = [
        F.sum(F.when(F.col("rel") > 0, F.col("prec_at")).otherwise(0.0)).alias("ap_num"),
        _dcg("rel", "trec_rank").alias("dcg"),
        # rank of the first relevant hit → recip_rank (trec_eval: over the
        # depth-truncated run; 0 when no relevant doc is retrieved)
        F.min(F.when(F.col("rel") > 0, F.col("trec_rank"))).alias("first_rel"),
    ]
    for k in set(fams["recall"]) | set(fams["P"]):
        main_aggs.append(_rel_at(k).alias(f"rel_at_{k}"))
    for k in fams["ndcg_cut"]:
        main_aggs.append(_dcg("rel", "trec_rank", cut=k).alias(f"dcg_{k}"))
    for k in fams["judged"]:
        main_aggs.append(
            F.sum(F.when(F.col("judged") & (F.col("trec_rank") <= k), 1)
                  .otherwise(0)).alias(f"judged_at_{k}"))
    for k in fams["success"]:
        main_aggs.append(
            F.max(F.when((F.col("rel") > 0) & (F.col("trec_rank") <= k), 1)
                  .otherwise(0)).alias(f"success_at_{k}"))
    agg_main = per_doc.groupBy("query_id").agg(*main_aggs)
    # gated like Rprec/bpref: the judged-only semi-join + window + agg +
    # join is a full extra shuffle chain, and must not run when ndcg_prime
    # was not requested
    agg_prime = None
    if "ndcg_prime" in metrics:
        agg_prime = judged_ranked.groupBy("query_id").agg(
            _dcg("rel", "jrank").alias("dcg_prime"))

    # Rprec: relevant hits within the top num_rel ranks / num_rel — needs
    # the per-query R alongside each row, so its own (tiny) agg + join
    agg_rprec = None
    if "Rprec" in metrics:
        agg_rprec = (per_doc
                     .join(ideal.select("query_id", "num_rel"), "query_id")
                     .groupBy("query_id")
                     .agg(F.sum(F.when((F.col("rel") > 0) &
                                       (F.col("trec_rank") <= F.col("num_rel")),
                                       1).otherwise(0)).alias("rel_at_R")))

    # bpref (trec_eval m_bpref.c): over RETRIEVED JUDGED docs in rank order,
    # each relevant doc contributes 1 when no judged-nonrelevant doc ranks
    # above it, else 1 - min(nonrel_above, R)/min(N, R) with N = judged
    # nonrelevant in the QRELS; sum / R
    agg_bpref = None
    if "bpref" in metrics:
        n_nonrel = qrels.groupBy("query_id").agg(
            F.sum(F.when(F.col("rel") == 0, 1).otherwise(0)).alias("n_nonrel"))
        w_prev = (Window.partitionBy("query_id").orderBy("jrank")
                  .rowsBetween(Window.unboundedPreceding, -1))
        jb = judged_ranked.withColumn(
            "nonrel_above",
            F.coalesce(F.sum(F.when(F.col("rel") == 0, 1).otherwise(0))
                       .over(w_prev), F.lit(0)))
        agg_bpref = (jb.join(ideal.select("query_id", "num_rel"), "query_id")
                     .join(n_nonrel, "query_id")
                     .groupBy("query_id")
                     .agg(F.sum(F.when(
                         F.col("rel") > 0,
                         F.when(F.col("nonrel_above") == 0, F.lit(1.0))
                          .otherwise(F.lit(1.0) -
                                     F.least("nonrel_above", "num_rel") /
                                     F.least("n_nonrel", "num_rel")))
                         .otherwise(0.0)).alias("bpref_num")))

    cols: dict[str, Column] = {
        "map": F.when(F.col("num_rel") > 0,
                      F.coalesce("ap_num", F.lit(0.0)) / F.col("num_rel"))
                .otherwise(0.0),
        "ndcg": F.when(F.col("idcg") > 0,
                       F.coalesce("dcg", F.lit(0.0)) / F.col("idcg"))
                 .otherwise(0.0),
        "ndcg_prime": F.when(
            F.col("idcg") > 0,
            F.coalesce("dcg_prime", F.col("dcg"), F.lit(0.0)) / F.col("idcg"))
            .otherwise(0.0),
        "recip_rank": F.coalesce(F.lit(1.0) / F.col("first_rel"), F.lit(0.0)),
        "Rprec": F.when(F.col("num_rel") > 0,
                        F.coalesce("rel_at_R", F.lit(0)) / F.col("num_rel"))
                  .otherwise(0.0),
        "bpref": F.when(F.col("num_rel") > 0,
                        F.coalesce("bpref_num", F.lit(0.0)) / F.col("num_rel"))
                  .otherwise(0.0),
    }
    for k, name in fams["recall"].items():
        cols[name] = (F.when(F.col("num_rel") > 0,
                             F.coalesce(f"rel_at_{k}", F.lit(0)) / F.col("num_rel"))
                      .otherwise(0.0))
    for k, name in fams["P"].items():
        cols[name] = F.coalesce(f"rel_at_{k}", F.lit(0)) / F.lit(float(k))
    for k, name in fams["ndcg_cut"].items():
        cols[name] = (F.when(F.col(f"idcg_{k}") > 0,
                             F.coalesce(f"dcg_{k}", F.lit(0.0)) / F.col(f"idcg_{k}"))
                      .otherwise(0.0))
    for k, name in fams["judged"].items():
        cols[name] = F.coalesce(f"judged_at_{k}", F.lit(0)) / F.lit(float(k))
    for k, name in fams["success"].items():
        cols[name] = F.coalesce(f"success_at_{k}", F.lit(0)).cast("double")

    per_q = (ideal
             # trec_eval: topics with no positive judgment are NOT evaluated
             .where(F.col("num_rel") > 0)
             .join(agg_main, "query_id", "left"))
    if agg_prime is not None:
        per_q = per_q.join(agg_prime, "query_id", "left")
    if agg_rprec is not None:
        per_q = per_q.join(agg_rprec, "query_id", "left")
    if agg_bpref is not None:
        per_q = per_q.join(agg_bpref, "query_id", "left")
    per_q = per_q.select("query_id", *[cols[m].alias(m) for m in metrics])

    keep = [m for m in metrics]
    mean_row = per_q.groupBy(F.lit("all").alias("query_id")).agg(
        *[F.avg(m).alias(m) for m in keep])
    return per_q.unionByName(mean_row)
