"""RM3 pseudo-relevance feedback — the rebuild of the reference's
``rm3`` retrieval option (/root/reference/patapsco/retrieve.py:104-113;
config ``fb_terms=10, fb_docs=10, original_query_weight=0.5``,
/root/reference/patapsco/schema.py:175-180), which pyserini executes with
term vectors stored at index time (/root/reference/patapsco/index.py:51).

Our term-vector analogue is the ``analyzed/`` table the index build already
persists: (id, terms array) → per-doc tf by a JVM-side explode/groupBy.

Relevance model (Lavrenko & Croft RM1, interpolated to RM3 exactly as
Anserini's Rm3Reranker does):

    p(t|RM1) ∝ Σ_{d ∈ fb_docs(q)}  (tf_{t,d} / |d|) · score(q,d)
    keep top fb_terms terms (ties: term asc), rescale to unit L1
    p(t|RM3) = w·p(t|q) + (1-w)·p(t|RM1),   w = original_query_weight
    p(t|q)   = qtf_t / |q|

The feedback query then scores as Σ_t p(t|RM3)·BM25(t,d) — a per-term boost,
the DataFrame analogue of Lucene's BoostQuery-per-term feedback query.

Physical plan: pass-1 top-k is the normal sharded search; the feedback-doc
term fetch is a broadcast join of the tiny (q × fb_docs) result against the
``analyzed`` table (predicate-pushed on id); the model estimate is a
groupBy + window top-n; pass-2 reuses the sharded scorer with boosted
single-term clauses. Two passes over postings, no driver-side loops except
assembling the per-query plans (q × fb_terms rows — tiny by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import RetrieveConfig, TextConfig
from .queryparse import SHOULD, Clause, QueryPlan
from .retrieve import process_queries, search
from ..plans.pqread import read_parquet


def estimate_rm3_terms(spark: SparkSession, index_path: str,
                       fb_results: DataFrame, orig_terms: dict[str, list[str]],
                       fb_terms: int = 10,
                       original_query_weight: float = 0.5) -> DataFrame:
    """RM3 term weights per query: (query_id, term, weight).

    ``fb_results``: (query_id, doc_id, score) — the pass-1 feedback docs.
    ``orig_terms``: query_id → analyzed original query terms (with repeats).
    """
    analyzed = read_parquet(spark, f"{index_path}/analyzed").select("id", "terms", "dl")
    fb = fb_results.select("query_id", F.col("doc_id").alias("id"), "score")

    # tf per (query, fb-doc, term): count repeats within the doc's term
    # array; fb is tiny (q × fb_docs) → broadcast against the big table
    doc_tf = (F.broadcast(fb).join(analyzed, "id")
              .select("query_id", "id", "score", "dl", F.explode("terms").alias("term"))
              .groupBy("query_id", "id", "score", "dl", "term")
              .agg(F.count("*").alias("tf")))
    rm1 = (doc_tf
           .withColumn("contrib", F.col("tf") / F.col("dl") * F.col("score"))
           .groupBy("query_id", "term")
           .agg(F.sum("contrib").alias("w")))
    top = (rm1.withColumn(
               "rn", F.row_number().over(
                   Window.partitionBy("query_id").orderBy(F.desc("w"), F.asc("term"))))
           .where(F.col("rn") <= fb_terms))
    l1 = top.groupBy("query_id").agg(F.sum("w").alias("l1"))
    rm1n = (top.join(l1, "query_id")
            .select("query_id", "term", (F.col("w") / F.col("l1")).alias("p_rm1")))

    # original query model p(t|q) = qtf/|q|
    spark_rows = []
    for qid, terms in orig_terms.items():
        n = len(terms) or 1
        seen: dict[str, int] = {}
        for t in terms:
            seen[t] = seen.get(t, 0) + 1
        spark_rows.extend((qid, t, c / n) for t, c in seen.items())
    orig_df = spark.createDataFrame(spark_rows, "query_id string, term string, p_q double")

    w = float(original_query_weight)
    return (rm1n.join(orig_df, ["query_id", "term"], "full_outer")
            .select("query_id", "term",
                    (w * F.coalesce("p_q", F.lit(0.0)) +
                     (1.0 - w) * F.coalesce("p_rm1", F.lit(0.0))).alias("weight")))


def search_rm3(spark: SparkSession, index_path: str,
               queries: list[tuple[str, str]], cfg: RetrieveConfig | None = None,
               text_cfg: TextConfig | None = None, lang: str = "eng") -> DataFrame:
    """Two-pass RM3 retrieval: BM25 pass-1 → relevance model → boosted
    pass-2. Returns the standard result frame."""
    cfg = cfg or RetrieveConfig()
    text_cfg = text_cfg or TextConfig()
    plans = process_queries(queries, text_cfg, lang=lang)
    orig_terms = {p.qid: [t for c in p.clauses for t, _ in c.terms] for p in plans}

    pass1 = search(spark, index_path, plans,
                   RetrieveConfig(name="bm25", k=cfg.fb_docs, k1=cfg.k1, b=cfg.b))
    weights = estimate_rm3_terms(spark, index_path, pass1, orig_terms,
                                 fb_terms=cfg.fb_terms,
                                 original_query_weight=cfg.original_query_weight)
    rows = weights.collect()  # q × (fb_terms + |q|) rows — tiny by construction
    by_q: dict[str, list[tuple[str, float]]] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append((r["term"], float(r["weight"])))
    fb_plans = [
        QueryPlan(qid, [Clause(SHOULD, wt, [(term, 1.0)])
                        for term, wt in sorted(terms)])
        for qid, terms in by_q.items()
    ]
    return search(spark, index_path, fb_plans,
                  RetrieveConfig(name="bm25", k=cfg.k, k1=cfg.k1, b=cfg.b))


def estimate_rocchio_terms(spark: SparkSession, index_path: str,
                           fb_results: DataFrame,
                           orig_terms: dict[str, list[str]],
                           fb_terms: int = 10, alpha: float = 1.0,
                           beta: float = 0.75,
                           nr_results: DataFrame | None = None,
                           gamma: float = 0.0) -> DataFrame:
    """Rocchio (1971) feedback vector per query: (query_id, term, weight).

    The classic vector-space update (Manning, Raghavan & Schütze, IIR
    ch. 9; the same family Anserini exposes as its Rocchio reranker):

        q_new = α·q + β·(1/|Dr|)·Σ_{d∈Dr} d  −  γ·(1/|Dnr|)·Σ_{d∈Dnr} d

    with q the raw query tf vector and d the length-normalized document
    tf vector (tf_{t,d}/|d| — the same per-doc normalization RM3 uses,
    so both feedback models read one ``analyzed`` scan shape). Negative
    weights are clamped to 0 (IIR's convention), and the final vector is
    cut to the top ``fb_terms`` entries (weight desc, term asc).

    ``fb_results``/``nr_results``: (query_id, doc_id, score) frames of
    pseudo-relevant / pseudo-non-relevant docs; ``nr_results`` is only
    read when γ > 0. Physical plan mirrors estimate_rm3_terms: tiny
    result frames broadcast against the analyzed table, one explode +
    groupBy per side, no driver loops.
    """
    analyzed = read_parquet(spark, f"{index_path}/analyzed").select(
        "id", "terms", "dl")

    def centroid(results: DataFrame) -> DataFrame:
        """(query_id, term, c): mean length-normalized tf over the set."""
        fb = results.select("query_id", F.col("doc_id").alias("id"))
        n_by_q = fb.groupBy("query_id").agg(F.count("*").alias("n_fb"))
        doc_tf = (F.broadcast(fb).join(analyzed, "id")
                  .select("query_id", "id", "dl",
                          F.explode("terms").alias("term"))
                  .groupBy("query_id", "id", "dl", "term")
                  .agg(F.count("*").alias("tf")))
        return (doc_tf
                .withColumn("contrib", F.col("tf") / F.col("dl"))
                .groupBy("query_id", "term")
                .agg(F.sum("contrib").alias("s"))
                .join(F.broadcast(n_by_q), "query_id")
                .select("query_id", "term",
                        (F.col("s") / F.col("n_fb")).alias("c")))

    rel = centroid(fb_results)

    spark_rows = []
    for qid, terms in orig_terms.items():
        seen: dict[str, int] = {}
        for t in terms:
            seen[t] = seen.get(t, 0) + 1
        spark_rows.extend((qid, t, float(c)) for t, c in seen.items())
    orig_df = spark.createDataFrame(
        spark_rows, "query_id string, term string, qtf double")

    a, b_, g = float(alpha), float(beta), float(gamma)
    vec = (rel.join(orig_df, ["query_id", "term"], "full_outer")
           .select("query_id", "term",
                   (a * F.coalesce("qtf", F.lit(0.0)) +
                    b_ * F.coalesce("c", F.lit(0.0))).alias("weight")))
    if g > 0.0:
        if nr_results is None:
            raise ValueError("gamma > 0 needs nr_results "
                             "(pseudo-non-relevant docs)")
        nonrel = centroid(nr_results).select(
            "query_id", "term", F.col("c").alias("c_nr"))
        vec = (vec.join(nonrel, ["query_id", "term"], "full_outer")
               .select("query_id", "term",
                       (F.coalesce("weight", F.lit(0.0)) -
                        g * F.coalesce("c_nr", F.lit(0.0))).alias("weight")))
    top = (vec.where(F.col("weight") > 0)  # IIR: negative weights → 0
           .withColumn("rn", F.row_number().over(
               Window.partitionBy("query_id")
               .orderBy(F.desc("weight"), F.asc("term"))))
           .where(F.col("rn") <= fb_terms))
    return top.select("query_id", "term", "weight")


def search_rocchio(spark: SparkSession, index_path: str,
                   queries: list[tuple[str, str]],
                   cfg: RetrieveConfig | None = None,
                   text_cfg: TextConfig | None = None, lang: str = "eng",
                   alpha: float = 1.0, beta: float = 0.75,
                   gamma: float = 0.0, nr_docs: int = 10) -> DataFrame:
    """Two-pass Rocchio retrieval: BM25 pass-1 → Rocchio vector → weighted
    BM25 pass-2 (boost-per-term, same pass-2 shape as search_rm3).

    γ > 0 takes the pseudo-non-relevant set from the BOTTOM ``nr_docs``
    of a deeper pass-1 at depth fb_docs + nr_docs — the standard
    pseudo-feedback stand-in when no judgments exist."""
    cfg = cfg or RetrieveConfig()
    text_cfg = text_cfg or TextConfig()
    plans = process_queries(queries, text_cfg, lang=lang)
    orig_terms = {p.qid: [t for c in p.clauses for t, _ in c.terms]
                  for p in plans}

    depth = cfg.fb_docs + (nr_docs if gamma > 0.0 else 0)
    pass1 = search(spark, index_path, plans,
                   RetrieveConfig(name="bm25", k=depth, k1=cfg.k1, b=cfg.b))
    fb = pass1.where(F.col("rank") < cfg.fb_docs)
    nr = (pass1.where(F.col("rank") >= cfg.fb_docs)
          if gamma > 0.0 else None)
    weights = estimate_rocchio_terms(
        spark, index_path, fb, orig_terms, fb_terms=cfg.fb_terms,
        alpha=alpha, beta=beta, nr_results=nr, gamma=gamma)
    rows = weights.collect()  # q × fb_terms rows — tiny by construction
    by_q: dict[str, list[tuple[str, float]]] = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(
            (r["term"], float(r["weight"])))
    fb_plans = [
        QueryPlan(qid, [Clause(SHOULD, wt, [(term, 1.0)])
                        for term, wt in sorted(terms)])
        for qid, terms in by_q.items()
    ]
    return search(spark, index_path, fb_plans,
                  RetrieveConfig(name="bm25", k=cfg.k, k1=cfg.k1, b=cfg.b))
