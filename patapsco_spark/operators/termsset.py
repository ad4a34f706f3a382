"""terms_set query — per-document minimum-should-match (Elasticsearch
``terms_set`` / Lucene ``CoveringQuery``; public docs "terms set query").

The engine's global ``min_should_match`` (retrieve kernel) answers "at
least M of these terms" with ONE M for every document; terms_set reads M
from a stored per-document numeric field (ES's
``minimum_should_match_field``, canonically named ``required_matches``) —
the classic use: docs tagged with a variable-length list of required
skills/codes, matched only when the query covers each doc's own quota.

Scoring is the plain boolean OR sum over the MATCHED member terms (Lucene
CoveringQuery sums the sub-scorers that match, like BooleanQuery), so a
doc's score is identical to the engine's bm25 OR query — only admission
differs.

Spark-first shape (100 TB): ONE matches_only kernel pass scores every
member term as its own single-term query (those per-(term, doc) rows are
exactly the postings the OR query reads — no extra volume); one
combinable groupBy folds hit-count + score per doc in FIXED term-asc
order (bit-stable, SQL-replayable); the per-doc threshold joins from the
values frame and filters BEFORE the k-bounded rank window, so the window
sees only covered docs. No self-joins, no driver loops.

Reference anchor: the reference's boolean queries are Lucene classic
syntax only (/root/reference/patapsco/retrieve.py:79-82) — no per-doc
threshold exists there; this operator is web-engine surface beyond the
reference, consistent with the repo's ES-parity family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..config import RetrieveConfig, TextConfig
from .aggs import match_set_texts


def terms_set_topk(spark: SparkSession, index_path: str, terms: list[str],
                   values: DataFrame, msm_col: str, *, qid: str = "q1",
                   id_col: str = "doc_id",
                   text_cfg: TextConfig | None = None,
                   k1: float = 0.9, b: float = 0.4,
                   k: int = 1000) -> DataFrame:
    """(query_id, doc_id, docid, rank, score) for documents containing at
    least ``values.msm_col`` distinct members of ``terms`` (clamped to
    ≥ 1 — CoveringQuery treats sub-one thresholds as 1), scored as the
    BM25 OR sum over the matched members, rank 0-based, (score desc,
    docid asc) tie-break — the engine's top-k conventions.

    A document absent from ``values`` (or with a NULL threshold) never
    matches: the field IS the admission contract, and inventing a default
    would be the silent-wrong-answer class. Duplicate ``terms`` collapse
    (ES terms_set counts UNIQUE matched terms)."""
    members = sorted(set(terms))
    if not members:
        raise ValueError("terms_set needs at least one term")
    matches = match_set_texts(
        spark, index_path, [(t, t) for t in members],
        RetrieveConfig(name="bm25", k1=k1, b=b), text_cfg=text_cfg)
    agg = (matches.groupBy("doc_id", "docid")
           .agg(F.count(F.lit(1)).alias("cnt"),
                F.aggregate(
                    F.array_sort(F.collect_list(
                        F.struct(F.col("query_id").alias("k"),
                                 F.col("score").alias("v")))),
                    F.lit(0.0), lambda acc, x: acc + x["v"])
                .alias("score")))
    vals = values.select(F.col(id_col).cast("string").alias("doc_id"),
                         F.col(msm_col).cast("long").alias("_msm"))
    hit = (agg.join(vals, "doc_id")
           .where(F.col("_msm").isNotNull()
                  & (F.col("cnt") >= F.greatest(F.col("_msm"), F.lit(1)))))
    # per-bucket pre-cut before the global rank (round-5 verdict #2): the
    # unpartitioned window alone would single-partition an unbounded
    # match set (a match-all terms_set over the corpus); cutting to k
    # rows per docid-hash bucket first bounds the final window at
    # buckets × k rows — retrieve's per-shard cut + bounded merge shape.
    # The global top-k is invariant under the identical (score, docid)
    # order.
    nb = spark.sparkContext.defaultParallelism
    wb = (Window.partitionBy(F.pmod(F.xxhash64("docid"), F.lit(nb)))
          .orderBy(F.desc("score"), F.asc("docid")))
    pre = (hit.withColumn("_rn", F.row_number().over(wb))
           .where(F.col("_rn") <= k).drop("_rn"))
    w = Window.orderBy(F.desc("score"), F.asc("docid"))
    return (pre.withColumn("rank", F.row_number().over(w) - 1)
            .where(F.col("rank") < k)
            .select(F.lit(qid).alias("query_id"), "doc_id", "docid",
                    F.col("rank").cast("int"), "score")
            .orderBy("rank"))
