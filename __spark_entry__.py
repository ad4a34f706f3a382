"""Driver contract for the spark-graft builder (PySpark target).

Each ``queries()`` entry exercises one operator family from SURVEY.md §2 /
the training-data pipeline set, implemented in ``patapsco_spark``; the
matching ``oracle_sql()`` entry re-states the semantics in ANSI SQL for
DuckDB. Scores are rounded to 5-6 decimals in BOTH engines (identical
formulas; only last-ulp summation-order noise differs). Tie-breaks order by
the *string* form of doc_id everywhere, because the engine assigns internal
docids by lexicographic external-id order (Lucene tie-break parity).
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators import ann, dedup, textstats
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.queryparse import parse_query
from patapsco_spark.operators.retrieve import search, search_texts
from patapsco_spark.plans.pqread import read_parquet

# raw text config: lowercase only — keeps the DuckDB oracle expressible
# (stemming is not SQL); the stem/stopword chain is pinned by pytest goldens
RAW_TEXT = TextConfig(stem=None, stopwords=None, lowercase=True)

BM25_QUERY = "data query stream window"
QLD_QUERY = "table scan filter"
PSQ_CLAUSES = [(0, "data", 0.7), (0, "column", 0.3), (1, "window", 0.9), (1, "stream", 0.1)]
K = 20


def _index_path(sf_dir: str) -> str:
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    return os.path.join(tempfile.gettempdir(), f"pspark_idx_{tag}")


def _ensure_index(spark: SparkSession, sf_dir: str) -> str:
    path = _index_path(sf_dir)
    docs = (read_parquet(spark, f"{sf_dir}/documents.parquet")
            .select(F.col("doc_id").cast("string").alias("id"), "text", "lang"))
    build_index(spark, docs, path, IndexConfig(text=RAW_TEXT, num_shards=4),
                resume=True)
    return path


def _ensure_pos_index(spark: SparkSession, sf_dir: str) -> str:
    """Positions-enabled index (separate cache: different layout config)."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(), f"pspark_idxp_{tag}")
    docs = (read_parquet(spark, f"{sf_dir}/documents.parquet")
            .select(F.col("doc_id").cast("string").alias("id"), "text", "lang"))
    build_index(spark, docs, path,
                IndexConfig(text=RAW_TEXT, num_shards=4, positions=True),
                resume=True)
    return path


DEL_HEX = ("0", "1")  # md5('del-'||id)[0] ∈ {0,1} → ~1/8 of docs deleted


def _ensure_del_index(spark: SparkSession, sf_dir: str) -> str:
    """Index with Lucene-semantics tombstones: build (cached), then delete
    the deterministic md5-chosen subset. delete_docs is idempotent — on a
    warm cache the tombstones are already present and nothing is written."""
    from patapsco_spark.operators.deletes import delete_docs

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(), f"pspark_idxdel_{tag}")
    docs = (read_parquet(spark, f"{sf_dir}/documents.parquet")
            .select(F.col("doc_id").cast("string").alias("id"), "text", "lang"))
    build_index(spark, docs, path, IndexConfig(text=RAW_TEXT, num_shards=4),
                resume=True)
    del_ids = docs.select("id").where(
        F.substring(F.md5(F.concat(F.lit("del-"), F.col("id"))), 1, 1)
        .isin(*DEL_HEX))
    delete_docs(spark, path, del_ids, id_col="id")
    return path


def q_delete_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k over an index with ~1/8 of the docs tombstoned
    (operators/deletes.py). Lucene pre-merge delete semantics, pinned by
    the oracle: deleted docs are excluded from the results, but df / N /
    avgdl stay at the FULL-corpus values — the oracle computes full-corpus
    BM25 and filters the deleted ids out only at the final ranking, so a
    wrong implementation that rebuilds stats (or one that leaks deleted
    docs into top-k) both hash-mismatch."""
    from patapsco_spark.operators.retrieve import process_queries, search

    idx = _ensure_del_index(spark, sf_dir)
    plans = process_queries([("q1", BM25_QUERY)], RAW_TEXT, lang="eng",
                            mode="plain")
    return _as_result(search(spark, idx, plans, RetrieveConfig(k=K)))


def _delete_bm25_sql(query_terms: list[str], k1: float, b: float,
                     k: int) -> str:
    """Full-corpus BM25 stats, deleted ids filtered at ranking only."""
    hexes = ", ".join(f"'{h}'" for h in DEL_HEX)
    return _bm25_sql(query_terms, k1, b, k).replace(
        "FROM scores\n",
        "FROM scores\n"
        f"WHERE substr(md5('del-' || CAST(doc_id AS VARCHAR)), 1, 1) "
        f"NOT IN ({hexes})\n")


def q_page2_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page 2 of the flagship BM25 ranking via search-after (Lucene
    IndexSearcher.searchAfter): page 1's last (score, docid) is the
    cursor, and the engine must return exactly ranks K..2K-1 of the full
    ordering — the oracle replays it as OFFSET K, so an off-by-one at the
    cursor boundary, a tie-break inversion, or a pruner that discards
    below-cursor docs all hash-mismatch."""
    from patapsco_spark.operators.retrieve import process_queries, search

    idx = _ensure_index(spark, sf_dir)
    plans = process_queries([("q1", BM25_QUERY)], RAW_TEXT, lang="eng",
                            mode="plain")
    p1 = search(spark, idx, plans, RetrieveConfig(k=K)) \
        .orderBy("rank").collect()
    cursor = (p1[-1]["score"], p1[-1]["docid"])
    return _as_result(search(spark, idx, plans,
                             RetrieveConfig(k=K, after=cursor)))


def _page2_bm25_sql(query_terms: list[str], k1: float, b: float,
                    k: int) -> str:
    """Page 2 = the same full ranking with OFFSET k; rnk rebased to 0."""
    return (_bm25_sql(query_terms, k1, b, k)
            .replace("- 1)::BIGINT AS rnk", f"- 1 - {k})::BIGINT AS rnk")
            .replace(f"LIMIT {k}\n", f"LIMIT {k} OFFSET {k}\n"))


MLT_MIN_TF, MLT_MIN_DF, MLT_MAX_TERMS = 2, 5, 25


def q_mlt_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MoreLikeThis: the lowest-doc_id document's informative terms
    (tf ≥ 2, df ≥ 5, top 25 by tf·idf with term-asc ties) run as an OR
    query — operators/retrieve.more_like_this. The oracle replays term
    selection AND the BM25 ranking in SQL, so a wrong selection gate, a
    tie-break flip, or idf drift all hash-mismatch."""
    from patapsco_spark.operators.retrieve import more_like_this

    idx = _ensure_index(spark, sf_dir)
    like = (read_parquet(spark, f"{sf_dir}/documents.parquet")
            .orderBy("doc_id").select("text").first()[0])
    return _as_result(more_like_this(
        spark, idx, like, RAW_TEXT, min_tf=MLT_MIN_TF, min_df=MLT_MIN_DF,
        max_terms=MLT_MAX_TERMS, cfg=RetrieveConfig(k=K)))


def _mlt_bm25_sql(min_tf: int, min_df: int, max_terms: int, k1: float,
                  b: float, k: int) -> str:
    quant = _quant_sql("dl.dl")
    return f"""
WITH {_TOK_CTES},
src AS (
  SELECT text FROM documents
  WHERE doc_id = (SELECT min(doc_id) FROM documents)
),
ltf AS (
  SELECT term, count(*)::DOUBLE AS ltf FROM (
    SELECT unnest(string_split((SELECT text FROM src), ' ')) AS term)
  WHERE term <> '' GROUP BY term HAVING count(*) >= {min_tf}
),
alldf AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY term
),
qterms AS (
  SELECT l.term
  FROM ltf l JOIN alldf d USING (term) CROSS JOIN stats
  WHERE d.df >= {min_df}
  ORDER BY l.ltf * ln(1 + (stats.n - d.df + 0.5) / (d.df + 0.5)) DESC,
           l.term ASC
  LIMIT {max_terms}
),
dfs AS (
  SELECT term, df FROM alldf JOIN qterms USING (term)
),
scores AS (
  SELECT tf.doc_id,
         list_aggregate(list(
             ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * {quant} / stats.avgdl))
             ORDER BY tf.term), 'sum') AS score
  FROM tf
  JOIN qterms USING (term)
  JOIN dfs ON dfs.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM scores
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


HIT_COUNT_QUERIES = [
    ("q_or", "data query stream window"),
    ("q_bool", "+window -stream"),
    ("q_nested", "(data query) -window"),
]


def q_hit_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-hit-count collector (Lucene TotalHitCountCollector) for an OR
    query, a +/- boolean, and a nested group: per-shard match counting in
    the scoring kernel (one number per query×shard over Arrow), summed
    JVM-side. The oracle recounts each query's match set in SQL."""
    from patapsco_spark.operators.retrieve import process_queries, search

    idx = _ensure_index(spark, sf_dir)
    plans = process_queries(HIT_COUNT_QUERIES, RAW_TEXT, lang="eng",
                            mode="boolean")
    return (search(spark, idx, plans, RetrieveConfig(), count_only=True)
            .select("query_id", F.col("total_hits").cast("long")
                    .alias("total_hits")))


def _hit_counts_sql() -> str:
    return """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
t AS (SELECT DISTINCT doc_id, term FROM tok WHERE term <> ''),
m AS (SELECT doc_id,
             bool_or(term = 'data') AS has_data,
             bool_or(term = 'query') AS has_query,
             bool_or(term = 'stream') AS has_stream,
             bool_or(term = 'window') AS has_window
      FROM t GROUP BY doc_id)
SELECT 'q_or' AS query_id, count(*)::BIGINT AS total_hits FROM m
WHERE has_data OR has_query OR has_stream OR has_window
UNION ALL
SELECT 'q_bool', count(*)::BIGINT FROM m WHERE has_window AND NOT has_stream
UNION ALL
SELECT 'q_nested', count(*)::BIGINT FROM m
WHERE (has_data OR has_query) AND NOT has_window
"""


UPD_HEX = ("0", "1", "2", "3")  # md5('upd-'||id)[0] → ~1/4 of docs re-crawled
UPD_PREFIX = "refreshed crawl "


def _ensure_upd_index(spark: SparkSession, sf_dir: str) -> str:
    """Index where ~1/4 of the docs were re-crawled through update_docs
    (operators/deletes.py): the new version (text prefixed with two extra
    tokens) appends as fresh shards, the old copy is tombstoned, and corpus
    statistics count BOTH copies until a compaction — Lucene
    updateDocument semantics. Idempotent on a warm cache: build_index
    resumes, and update_docs' epoch replay guard skips the re-apply."""
    from patapsco_spark.operators.deletes import update_docs

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(), f"pspark_idxupd_{tag}")
    docs = (read_parquet(spark, f"{sf_dir}/documents.parquet")
            .select(F.col("doc_id").cast("string").alias("id"), "text", "lang"))
    build_index(spark, docs, path, IndexConfig(text=RAW_TEXT, num_shards=4),
                resume=True)
    upd = (docs.where(
               F.substring(F.md5(F.concat(F.lit("upd-"), F.col("id"))), 1, 1)
               .isin(*UPD_HEX))
           .withColumn("text", F.concat(F.lit(UPD_PREFIX), F.col("text"))))
    update_docs(spark, path, upd, IndexConfig(text=RAW_TEXT), epoch_id=1)
    return path


def q_upsert_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-k over an index where ~1/4 of the docs were upserted
    (operators/deletes.py update_docs). The oracle pins the exact Lucene
    pre-merge contract: N / df / avgdl count BOTH the old and new copy of
    every updated doc, the new copy is rankable with its new tf/dl, and
    the old copy can neither appear nor displace — an implementation that
    rebuilds stats, drops the old copy from df, or leaks it into top-k all
    hash-mismatch."""
    from patapsco_spark.operators.retrieve import process_queries, search

    idx = _ensure_upd_index(spark, sf_dir)
    plans = process_queries([("q1", BM25_QUERY)], RAW_TEXT, lang="eng",
                            mode="plain")
    return _as_result(search(spark, idx, plans, RetrieveConfig(k=K)))


def _upsert_bm25_sql(query_terms: list[str], k1: float, b: float,
                     k: int) -> str:
    """Versioned-corpus BM25: stats over original ∪ updated copies, the
    original copy of an updated id excluded at ranking only."""
    from patapsco_spark.functions.smallfloat import quantize_length_sql

    hexes = ", ".join(f"'{h}'" for h in UPD_HEX)
    vals = ", ".join(f"('{t}')" for t in query_terms)
    quant = quantize_length_sql("dl.dl")
    return f"""
WITH docs_v AS (
  SELECT doc_id, text, 0 AS ver,
         substr(md5('upd-' || CAST(doc_id AS VARCHAR)), 1, 1) IN ({hexes}) AS upd
  FROM documents
  UNION ALL
  SELECT doc_id, '{UPD_PREFIX}' || text, 1 AS ver, TRUE AS upd
  FROM documents
  WHERE substr(md5('upd-' || CAST(doc_id AS VARCHAR)), 1, 1) IN ({hexes})
),
tok AS (
  SELECT doc_id, ver, upd, unnest(string_split(text, ' ')) AS term FROM docs_v
),
tf AS (
  SELECT doc_id, ver, upd, term, count(*)::DOUBLE AS tf FROM tok
  WHERE term <> '' GROUP BY doc_id, ver, upd, term
),
dl AS (
  SELECT doc_id, ver, count(*)::BIGINT AS dl FROM tok WHERE term <> ''
  GROUP BY doc_id, ver
),
stats AS (
  SELECT (SELECT count(*) FROM docs_v)::DOUBLE AS n,
         CAST(CAST(sum(dl) AS DOUBLE) / (SELECT count(*) FROM docs_v) AS REAL)::DOUBLE AS avgdl
  FROM dl
),
qterms(term) AS (VALUES {vals}),
dfs AS (
  SELECT tf.term, count(*)::DOUBLE AS df FROM tf JOIN qterms USING (term)
  GROUP BY tf.term
),
scores AS (
  SELECT tf.doc_id,
         list_aggregate(list(
             ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * {quant} / stats.avgdl))
             ORDER BY tf.term), 'sum') AS score
  FROM tf
  JOIN qterms USING (term)
  JOIN dfs ON dfs.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id AND dl.ver = tf.ver
  CROSS JOIN stats
  WHERE NOT (tf.ver = 0 AND tf.upd)
  GROUP BY tf.doc_id, tf.ver
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM scores
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _as_result(df: DataFrame) -> DataFrame:
    return df.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("rank").cast("long").alias("rnk"),
        F.round("score", 5).alias("score"),
    )


def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _ensure_index(spark, sf_dir)
    res = search_texts(spark, idx, [("q1", BM25_QUERY)],
                       RetrieveConfig(k=K), text_cfg=RAW_TEXT)
    return _as_result(res)


FED_HEX = tuple("01234567")  # md5('fed-'||id)[0] splits the corpus in two


def _ensure_fed_indexes(spark: SparkSession, sf_dir: str) -> list:
    """Two independent index artifacts over a deterministic md5 split of
    the corpus — the multi-index federation fixture (crawl/tenant/time
    slices in production), cached/manifest-gated like _ensure_index."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    docs = (read_parquet(spark, f"{sf_dir}/documents.parquet")
            .select(F.col("doc_id").cast("string").alias("id"), "text", "lang"))
    in_a = (F.substring(F.md5(F.concat(F.lit("fed-"), F.col("id"))), 1, 1)
            .isin(*FED_HEX))
    paths = []
    for half, part in (("a", docs.where(in_a)), ("b", docs.where(~in_a))):
        p = os.path.join(tempfile.gettempdir(), f"pspark_idxfed{half}_{tag}")
        build_index(spark, part, p, IndexConfig(text=RAW_TEXT, num_shards=2),
                    resume=True)
        paths.append(p)
    return paths


def q_federated_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Federated multi-index BM25 (new r5; Lucene MultiReader / ES
    multi-index semantics, operators/federate.py): the corpus is split
    into two independent index artifacts, term statistics are combined
    BEFORE scoring (df/cf summed, N/avgdl recomputed), each index cuts
    top-k under the global stats, and the k-bounded union is re-ranked.
    The oracle is the SINGLE-CORPUS BM25 SQL — federation must reproduce
    it exactly, which is the whole semantic claim; a local-idf
    implementation hash-mismatches."""
    from patapsco_spark.operators.federate import search_federated_texts

    idxs = _ensure_fed_indexes(spark, sf_dir)
    res = search_federated_texts(spark, idxs, [("q1", BM25_QUERY)],
                                 RetrieveConfig(k=K), text_cfg=RAW_TEXT)
    return _as_result(res)


TITLE_TOKS = 4            # pseudo title field = the first 4 tokens of text
BM25F_W = {"title": 2.0, "body": 1.0}
BM25F_B = {"title": 0.4, "body": 0.4}


def _ensure_field_indexes(spark: SparkSession, sf_dir: str) -> dict:
    """One index per pseudo-field (title = first TITLE_TOKS tokens, body =
    the rest — a deterministic, SQL-replayable field split of the single
    text column), each cached/manifest-gated like _ensure_index. Per-field
    indexes are how BM25F composes here: the core indexer is unchanged and
    the field docid spaces align via the shared external-id total order."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    docs = (read_parquet(spark, f"{sf_dir}/documents.parquet")
            .select(F.col("doc_id").cast("string").alias("id"), "text", "lang"))
    toks = F.split(F.col("text"), " ")
    fields = {
        "title": F.array_join(F.slice(toks, 1, TITLE_TOKS), " "),
        "body": F.array_join(
            F.expr(f"slice(split(text, ' '), {TITLE_TOKS + 1}, "
                   f"greatest(size(split(text, ' ')) - {TITLE_TOKS}, 0))"),
            " "),
    }
    paths = {}
    for fld, expr in fields.items():
        p = os.path.join(tempfile.gettempdir(), f"pspark_idxf_{fld}_{tag}")
        build_index(spark, docs.select("id", expr.alias("text"), "lang"), p,
                    IndexConfig(text=RAW_TEXT, num_shards=4), resume=True)
        paths[fld] = p
    return paths


def q_bm25f_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25F fielded ranking (new r5; Robertson & Zaragoza 2009): title
    weighted 2×, per-field length normalization, saturation AFTER the
    field combine, document-level idf — composed over per-field indexes
    (operators/bm25f.py). The oracle replays the entire pipeline from the
    raw text: field split, per-field tf/dl/avgdl with the Lucene SmallFloat
    dl quantization, fixed fold orders (field asc, term asc)."""
    from patapsco_spark.operators.bm25f import search_bm25f

    idxs = _ensure_field_indexes(spark, sf_dir)
    res = search_bm25f(spark, idxs, [("q1", BM25_QUERY)], text_cfg=RAW_TEXT,
                       weights=BM25F_W, field_b=BM25F_B, k1=0.9, k=K)
    return _as_result(res)


DISMAX_TIE = 0.3


def q_dismax_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunction-max / multi_match best_fields (new r5; ES's default
    multi-field mode): each pseudo-field scored as an independent full
    BM25 query (own df/avgdl/norms), combined per doc as
    max + 0.3·(sum − max), title boosted 2×. The oracle replays both
    per-field BM25 runs from the raw text (per-field stats + SmallFloat
    quantization) and the exact combine with the field-ordered fold."""
    from patapsco_spark.operators.bm25f import search_dismax

    idxs = _ensure_field_indexes(spark, sf_dir)
    res = search_dismax(spark, idxs, [("q1", BM25_QUERY)], text_cfg=RAW_TEXT,
                        tie_breaker=DISMAX_TIE, boosts=BM25F_W,
                        k1=0.9, b=0.4, k=K)
    return _as_result(res)


CROSS_TIE = 0.2


def q_cross_fields_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-fields multi-field retrieval (new r5 s5; ES multi_match
    type=cross_fields / Lucene BlendedTermQuery): term-centric scoring —
    each term scored in each pseudo-field with a BLENDED df (max across
    fields), per-term dismax combine (tie 0.2), summed over terms. The
    third classic multi-field mode next to bm25f_topk (combine before
    saturation) and dismax_topk (per-field whole-query BM25). The oracle
    replays the field split, per-field tf/dl/avgdl with SmallFloat
    quantization, the blended-df idf, and both fixed fold orders."""
    from patapsco_spark.operators.bm25f import search_cross_fields

    idxs = _ensure_field_indexes(spark, sf_dir)
    res = search_cross_fields(spark, idxs, [("q1", BM25_QUERY)],
                              text_cfg=RAW_TEXT, tie_breaker=CROSS_TIE,
                              boosts=BM25F_W, k1=0.9, b=0.4, k=K)
    return _as_result(res)


def q_facet_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed facet counts (new r5; Lucene facets module): how many
    docs matching 'data query stream window' (OR) per document source —
    counted over the FULL matching set, not a top-k sample. Build-time
    sidecar = per-shard int32 code blobs (the norms_packed layout, gated on
    its manifest so repeat runs skip the build); query-time = one cogrouped
    kernel pass emitting O(#codes) rows per query×shard."""
    from patapsco_spark.operators.facets import (build_facet_sidecar,
                                                 facet_counts_texts)
    from patapsco_spark.plans import manifest as _mf

    idx = _ensure_index(spark, sf_dir)
    if _mf.read_manifest(f"{idx}/facets/source") is None:
        docs = read_parquet(spark, 
            os.path.join(sf_dir, "documents.parquet")).select(
            F.col("doc_id").cast("string").alias("id"), "source")
        build_facet_sidecar(spark, idx, docs, "source",
                            id_col="id", key_col="source")
    res = facet_counts_texts(spark, idx, [("q1", BM25_QUERY)], "source",
                             text_cfg=RAW_TEXT, mode="boolean")
    return res.select(F.col("key").alias("src"),
                      F.col("count").cast("long").alias("cnt"))


DV_LO, DV_HI = 150.0, 400.0


def _ensure_dv_sidecar(spark: SparkSession, sf_dir: str, idx: str) -> None:
    from patapsco_spark.operators.facets import build_value_sidecar
    from patapsco_spark.plans import manifest as _mf

    if _mf.read_manifest(f"{idx}/doc_values/n_chars") is None:
        docs = read_parquet(spark, 
            os.path.join(sf_dir, "documents.parquet")).select(
            F.col("doc_id").cast("string").alias("id"), "n_chars")
        build_value_sidecar(spark, idx, docs, "n_chars",
                            id_col="id", value_col="n_chars")


SV_RANGE = (150.0, 450.0)


def q_index_sorted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index-time sorted view (new r5, operators/sortedview.py — Lucene
    index sorting's early termination, Spark-shaped): corpus-wide top-k
    by n_chars desc restricted to a key range, served from the blocked
    permutation sidecar — the reader scans ceil(k/B) blocks per shard
    via a PUSHED block predicate (plan-guarded), never the corpus. The
    view build is manifest-gated like the other sidecars; a stale census
    (append/compaction since the build) refuses loudly."""
    from patapsco_spark.operators.sortedview import (build_sorted_view,
                                                     sorted_topk)
    from patapsco_spark.plans import manifest as _mf

    idx = _ensure_index(spark, sf_dir)
    _ensure_dv_sidecar(spark, sf_dir, idx)
    if _mf.read_manifest(f"{idx}/sorted_views/n_chars/desc") is None:
        build_sorted_view(spark, idx, "n_chars", ascending=False,
                          block_size=64)
    res = sorted_topk(spark, idx, "n_chars", k=K, value_range=SV_RANGE)
    return res.select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.col("rank").cast("long").alias("rnk"),
                      F.col("value").alias("n_chars"))


def q_dv_filtered_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-context retrieval executed INSIDE the scorer kernel (new r5;
    the ES bool.filter / per-segment doc-values-bitset shape): BM25 over
    'data query stream window' restricted to docs with n_chars ∈ [150,
    400] via the packed float64 sidecar — candidates are masked before the
    local top-k cut, so the filtered top-k is exact WITHOUT materializing
    the match set (search_filtered's shape), and scores keep the
    unrestricted corpus statistics (a filter never scores)."""
    idx = _ensure_index(spark, sf_dir)
    _ensure_dv_sidecar(spark, sf_dir, idx)
    plan = parse_query("q1", BM25_QUERY, mode="plain")
    res = search(spark, idx, [plan], RetrieveConfig(k=K),
                 dv_filter=("n_chars", DV_LO, DV_HI))
    return _as_result(res)


def q_dv_sort_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc-values sort (new r5; Lucene Sort over NumericDocValues): top-k
    docs matching 'data query stream window' (OR) ordered by n_chars desc
    — the SCALE path of sort_by_field: each shard's kernel emits only its
    k best from a packed float64 blob (built once, manifest-gated), so the
    full match set never materializes; one k-bounded window merges. Ties
    break on docid asc = external-id string order (oracle replays both)."""
    from patapsco_spark.operators.facets import sort_values_topk

    idx = _ensure_index(spark, sf_dir)
    _ensure_dv_sidecar(spark, sf_dir, idx)
    plan = parse_query("q1", BM25_QUERY, mode="plain")
    res = sort_values_topk(spark, idx, [plan], "n_chars", k=K)
    return res.select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.col("rank").cast("long").alias("rnk"),
                      F.col("value").alias("n_chars"))


def q_dv_filtered_facets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered aggregation (new r5; ES bool.filter + terms agg): facet
    counts per source over the 'data query stream window' match set
    RESTRICTED to n_chars ∈ [150, 400] — the doc-values range is a second
    blob mask inside the same facet-kernel pass, so the filter costs no
    join and no extra corpus scan (facets.facet_counts dv_filter)."""
    from patapsco_spark.operators.facets import (build_facet_sidecar,
                                                 facet_counts_texts)
    from patapsco_spark.plans import manifest as _mf

    idx = _ensure_index(spark, sf_dir)
    _ensure_dv_sidecar(spark, sf_dir, idx)
    if _mf.read_manifest(f"{idx}/facets/source") is None:
        docs = read_parquet(spark, 
            os.path.join(sf_dir, "documents.parquet")).select(
            F.col("doc_id").cast("string").alias("id"), "source")
        build_facet_sidecar(spark, idx, docs, "source",
                            id_col="id", key_col="source")
    res = facet_counts_texts(spark, idx, [("q1", BM25_QUERY)], "source",
                             text_cfg=RAW_TEXT, mode="boolean",
                             dv_filter=("n_chars", DV_LO, DV_HI))
    return res.select(F.col("key").alias("src"),
                      F.col("count").cast("long").alias("cnt"))


DECAY_ORIGIN, DECAY_SCALE = 300.0, 100.0


def q_dv_decay_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT function_score decay (new r5; ES function_score + gauss
    decay, executed ES's way): BM25 × gauss(n_chars; origin 300, scale
    100), the factor computed per CANDIDATE inside the scorer kernel from
    the packed sidecar — no rescore window, so unlike search_with_decay's
    documented depth-bounded cascade this path has zero cascade error.
    Missing values take factor 1.0 (ES missing-field)."""
    idx = _ensure_index(spark, sf_dir)
    _ensure_dv_sidecar(spark, sf_dir, idx)
    plan = parse_query("q1", BM25_QUERY, mode="plain")
    res = search(spark, idx, [plan], RetrieveConfig(k=K),
                 dv_boost=("n_chars", {"origin": DECAY_ORIGIN,
                                       "scale": DECAY_SCALE}))
    return _as_result(res)


DV_HIST_INTERVAL = 50.0


def q_dv_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES histogram aggregation executed on doc values (new r5): n_chars
    buckets (interval 50) over the FULL 'data query stream window' (OR)
    match set, counted inside the per-shard kernel from the packed float64
    blob — O(#buckets) rows per query×shard cross Arrow, one combinable
    sum folds shards (facets.value_histogram; the exact join-based
    aggs.field_histogram is the sidecar-less alternative)."""
    from patapsco_spark.operators.facets import value_histogram

    idx = _ensure_index(spark, sf_dir)
    _ensure_dv_sidecar(spark, sf_dir, idx)
    plan = parse_query("q1", BM25_QUERY, mode="plain")
    res = value_histogram(spark, idx, [plan], "n_chars", DV_HIST_INTERVAL)
    return res.select("bucket", F.col("count").cast("long").alias("cnt"))


COLLAPSE_DEPTH = 100


def q_collapse_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field collapsing (new r5; Lucene grouping / Elasticsearch collapse):
    BM25 top-100, then keep only the best hit per document ``source`` and
    re-rank the survivors — the standard one-result-per-site
    diversification a web-scale engine needs. The hits side is ≤100 rows so
    it broadcasts against the documents table; collapsing never changes
    scores, only which docs appear (pinned by the oracle replay)."""
    from patapsco_spark.operators.rerank import collapse_results

    idx = _ensure_index(spark, sf_dir)
    res = search_texts(spark, idx, [("q1", BM25_QUERY)],
                       RetrieveConfig(k=COLLAPSE_DEPTH), text_cfg=RAW_TEXT)
    docs = read_parquet(spark, os.path.join(sf_dir, "documents.parquet")).select(
        F.col("doc_id").cast("string").alias("doc_id"), "source")
    out = collapse_results(res, docs, "source", per_key=1, k=K)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("rank").cast("long").alias("rnk"),
        F.round("score", 5).alias("score"),
        F.col("source").alias("src"))


def q_qld_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _ensure_index(spark, sf_dir)
    res = search_texts(spark, idx, [("q1", QLD_QUERY)],
                       RetrieveConfig(name="qld", k=K), text_cfg=RAW_TEXT)
    return _as_result(res)


QLJM_LAMBDA = 0.1  # Lucene LMJelinekMercerSimilarity short-query default


def q_qljm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM Jelinek-Mercer top-k (new r5): the third Lucene LM similarity
    alongside bm25/qld — per-term ln(1 + ((1-λ)·tf/dl) / (λ·p(t|C))) with
    the same +1-smoothed collection model and quantized norms as qld
    (operators/retrieve.py scorer kernel, name='qljm')."""
    idx = _ensure_index(spark, sf_dir)
    res = search_texts(spark, idx, [("q1", QLD_QUERY)],
                       RetrieveConfig(name="qljm", k=K, lam=QLJM_LAMBDA),
                       text_cfg=RAW_TEXT)
    return _as_result(res)


def q_classic_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic TF-IDF top-k (new r5): Lucene ClassicSimilarity — per-term
    √tf · (1+ln((N+1)/(df+1)))² · 1/√dl over the SAME quantized norms the
    bm25/qld scorers read (Lucene 8+ shares one length norm across
    similarities), name='classic' in the scorer kernel."""
    idx = _ensure_index(spark, sf_dir)
    res = search_texts(spark, idx, [("q1", BM25_QUERY)],
                       RetrieveConfig(name="classic", k=K),
                       text_cfg=RAW_TEXT)
    return _as_result(res)


def q_dfr_inl2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DFR InL2 top-k (new r5): the divergence-from-randomness similarity
    I(n)L2 (Amati & van Rijsbergen, TOIS 2002; Lucene
    DFRSimilarity(In, L, H2)) — per-term (1/(tfn+1)) · tfn ·
    log2((N+1)/(df+0.5)) with normalization-2 length-normalized
    tfn = tf·log2(1 + c·avgdl/dl), c=1, over the same quantized norms as
    bm25/qld (operators/retrieve.py scorer kernel, name='dfr_inl2')."""
    idx = _ensure_index(spark, sf_dir)
    res = search_texts(spark, idx, [("q1", BM25_QUERY)],
                       RetrieveConfig(name="dfr_inl2", k=K),
                       text_cfg=RAW_TEXT)
    return _as_result(res)


def q_dfi_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DFI top-k (new r5): divergence from independence (Kocabaş, Dinçer &
    Karaoğlan, Inf. Retrieval 2014; Lucene DFISimilarity) with the
    standardized measure — per-term log2(1 + (tf-e)/√e) where
    e = cf·dl/total_tf is the chance expectation, and tf ≤ e contributes
    nothing (the paper's built-in stopword suppression; frequent terms
    only score where they are over-represented)."""
    idx = _ensure_index(spark, sf_dir)
    res = search_texts(spark, idx, [("q1", BM25_QUERY)],
                       RetrieveConfig(name="dfi", k=K),
                       text_cfg=RAW_TEXT)
    return _as_result(res)


def q_pl2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DFR PL2 top-k (new r5): the Poisson/Laplace/H2 divergence-from-
    randomness model (Amati & van Rijsbergen, TOIS 2002 — Terrier's
    default similarity) — per-term (1/(tfn+1)) · (tfn·log2(tfn/λ) +
    (λ−tfn)·log2 e + 0.5·log2(2π·tfn)) with λ = cf/N and normalization-2
    tfn = tf·log2(1 + c·avgdl/dl), per-term gain clamped at 0 (score
    non-negativity, the same convention as dfi's below-chance cutoff),
    over the same quantized norms as bm25/qld."""
    idx = _ensure_index(spark, sf_dir)
    res = search_texts(spark, idx, [("q1", BM25_QUERY)],
                       RetrieveConfig(name="pl2", k=K),
                       text_cfg=RAW_TEXT)
    return _as_result(res)


def q_f2exp_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Axiomatic F2EXP top-k (new r5): Fang & Zhai's axiomatic retrieval
    function (SIGIR 2005; Lucene AxiomaticF2EXP) — per-term
    ((N+1)/df)^0.35 · tf/(tf + s + s·dl/avgdl) with s=0.5, the axiomatic
    TFLN length normalization, over the same quantized norms."""
    idx = _ensure_index(spark, sf_dir)
    res = search_texts(spark, idx, [("q1", BM25_QUERY)],
                       RetrieveConfig(name="f2exp", k=K),
                       text_cfg=RAW_TEXT)
    return _as_result(res)


def q_ib_ll_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information-based LL top-k (new r5): Clinchant & Gaussier's
    log-logistic information model (SIGIR 2010; Lucene
    IBSimilarity(DistributionLL, LambdaDF, NormalizationH2)) — per-term
    ln(1 + tfn/λ) with λ = (df+1)/(N+1) and normalization-2 tfn, over
    the same quantized norms as the rest of the similarity family."""
    idx = _ensure_index(spark, sf_dir)
    res = search_texts(spark, idx, [("q1", BM25_QUERY)],
                       RetrieveConfig(name="ib_ll", k=K),
                       text_cfg=RAW_TEXT)
    return _as_result(res)


def q_bool_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BooleanSimilarity top-k (new r5 s5): Lucene's tenth similarity —
    every matching clause contributes exactly its boost, no tf/idf/norm
    (the filter-as-query scoring used for boost-composable boolean
    ranking). Bool scores are tiny integers, so ties dominate every k
    boundary; the ENGINE breaks them by internal docid (Lucene parity,
    pinned in pytest), which no external engine can replay — so this
    entry retrieves the full match set (k ≥ corpus) and presents the
    portable (score desc, doc_id asc) slice the oracle can reproduce."""
    idx = _ensure_index(spark, sf_dir)
    res = search_texts(spark, idx, [("q1", BM25_QUERY)],
                       RetrieveConfig(name="bool", k=1_000_000),
                       text_cfg=RAW_TEXT)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    out = (res.withColumn("rank", F.row_number().over(w) - 1)
           .where(F.col("rank") < K))
    return _as_result(out)


SYN_TERM, SYN_EQUIVS = "query", ("scan", "filter")


def q_synonym_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-time synonyms (new r5; Lucene SynonymQuery semantics): 'data
    query' with query≡{scan,filter} — the synonym group scores as ONE term
    (tf = Σ member tfs per doc, df = max member df), NOT an OR of
    independently-idf'd terms. The pseudo-term's postings build through
    the same blocked varbyte kernel as the index's own; the oracle replays
    the grouped tf/df and the exact two-component fold."""
    idx = _ensure_index(spark, sf_dir)
    res = search_texts(spark, idx, [("q1", f"data {SYN_TERM}")],
                       RetrieveConfig(k=K), text_cfg=RAW_TEXT,
                       synonyms={SYN_TERM: list(SYN_EQUIVS)})
    return _as_result(res)


RRF_C = 60


def q_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal Rank Fusion (new r5; Cormack et al. 2009) of two runs
    for the SAME query under incomparable score scales — BM25 and QLD —
    the standard hybrid-retrieval merge (rerank.rrf_fuse). The oracle
    recomputes BOTH runs (the existing full BM25 and QLD SQL replays as
    subqueries) and fuses rank-for-rank."""
    from patapsco_spark.operators.rerank import rrf_fuse

    idx = _ensure_index(spark, sf_dir)
    bm = search_texts(spark, idx, [("q1", BM25_QUERY)],
                      RetrieveConfig(k=K), text_cfg=RAW_TEXT)
    ql = search_texts(spark, idx, [("q1", BM25_QUERY)],
                      RetrieveConfig(name="qld", k=K), text_cfg=RAW_TEXT)
    fused = rrf_fuse([bm, ql], k=K, c=RRF_C)
    return fused.select(F.col("doc_id").cast("long").alias("doc_id"),
                        F.col("rank").cast("long").alias("rnk"),
                        F.round("score", 8).alias("score"))


LINEAR_W = (0.7, 0.3)


def q_hybrid_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear score fusion (new r5, rerank.linear_fuse): per-run min-max
    normalization then 0.7·BM25 + 0.3·QLD — the convex-blend hybrid next
    to RRF (Weaviate's relative-score fusion; keeps score magnitude where
    RRF keeps only rank). The oracle recomputes both runs UNROUNDED and
    replays the normalization and the weighted run-ordinal fold."""
    from patapsco_spark.operators.rerank import linear_fuse

    idx = _ensure_index(spark, sf_dir)
    bm = search_texts(spark, idx, [("q1", BM25_QUERY)],
                      RetrieveConfig(k=K), text_cfg=RAW_TEXT)
    ql = search_texts(spark, idx, [("q1", BM25_QUERY)],
                      RetrieveConfig(name="qld", k=K), text_cfg=RAW_TEXT)
    fused = linear_fuse([bm, ql], weights=list(LINEAR_W), k=K)
    return fused.select(F.col("doc_id").cast("long").alias("doc_id"),
                        F.col("rank").cast("long").alias("rnk"),
                        F.round("score", 6).alias("score"))


def q_suggest_completions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix autocomplete over the live term dictionary: terms starting
    's' ranked (cf desc, term asc), k=4 < the matching vocab size so the
    cap is exercised. Oracle recomputes (df, cf) from the documents
    tokenization and replays filter/rank/cap."""
    from patapsco_spark.operators.suggest import suggest_completions

    idx = _ensure_index(spark, sf_dir)
    return suggest_completions(spark, idx, "s", k=4)


def q_suggest_spelling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spell suggestion for the typo 'strean': dictionary terms within 2
    edits, first letter locked, ranked (distance asc, cf desc, term asc).
    Oracle replays the length band, prefix lock, min_cf screen, and
    levenshtein ranking in SQL."""
    from patapsco_spark.operators.suggest import suggest_spelling

    idx = _ensure_index(spark, sf_dir)
    return suggest_spelling(spark, idx, "strean", k=5)


_DICT_CTE = """
dict AS (
  SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
  FROM tf GROUP BY term
)"""


def _suggest_completions_sql() -> str:
    return f"""
WITH {_TOK_CTES.strip()},
{_DICT_CTE.strip()}
SELECT term, df, cf FROM dict
WHERE term LIKE 's%'
ORDER BY cf DESC, term ASC LIMIT 4"""


def _suggest_spelling_sql() -> str:
    q, max_edits, min_cf, k = "strean", 2, 2, 5
    return f"""
WITH {_TOK_CTES.strip()},
{_DICT_CTE.strip()}
SELECT term, levenshtein(term, '{q}')::INT AS distance, df, cf FROM dict
WHERE length(term) BETWEEN {len(q) - max_edits} AND {len(q) + max_edits}
  AND term <> '{q}' AND cf >= {min_cf} AND term LIKE '{q[0]}%'
  AND levenshtein(term, '{q}') <= {max_edits}
ORDER BY distance ASC, cf DESC, term ASC LIMIT {k}"""


SNIP_N, SNIP_LEN, SNIP_W = 120, 60, 10


def q_snippets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snippet extraction over a deterministic corpus: doc i is SNIP_LEN
    tokens, token p = 'hit' at the two md5-chosen positions (which may
    collide), else the position-unique filler 'f{p}'. One query ('hit'),
    every doc a result row. The oracle enumerates every width-SNIP_W
    window in SQL, replays the (max occurrences, earliest start) choice,
    and rebuilds the exact highlighted snippet text with ellipsis rules —
    window scoring, tie-break, <em> wrapping, and both truncation marks
    all pinned. See ``operators/snippets.py``."""
    from patapsco_spark.operators.snippets import make_snippets

    def gen(batches):
        import hashlib

        import pandas as pd

        def pos(s: str) -> int:
            return int(hashlib.md5(s.encode()).hexdigest()[:2],
                       16) % SNIP_LEN

        for pdf in batches:
            ids, texts = [], []
            for i in pdf["id"]:
                p1, p2 = pos(f"hit1-{i}"), pos(f"hit2-{i}")
                toks = ["hit" if p in (p1, p2) else f"f{p}"
                        for p in range(SNIP_LEN)]
                ids.append(f"d{i}")
                texts.append(" ".join(toks))
            yield pd.DataFrame({"doc_id": ids, "text": texts})

    store = spark.range(SNIP_N, numPartitions=8).mapInPandas(
        gen, schema="doc_id string, text string")
    results = store.select(F.lit("q1").alias("query_id"), "doc_id")
    return make_snippets(results, store, {"q1": ["hit"]}, window=SNIP_W)


def _snippets_sql() -> str:
    n, ln, w = SNIP_N, SNIP_LEN, SNIP_W
    return f"""
WITH idx AS (SELECT unnest(range(0, {n})) AS i),
hp AS (
  SELECT i,
         ('0x' || substr(md5('hit1-' || i), 1, 2))::BIGINT % {ln} AS p1,
         ('0x' || substr(md5('hit2-' || i), 1, 2))::BIGINT % {ln} AS p2
  FROM idx),
words AS (
  SELECT hp.i, p.p,
         CASE WHEN p.p IN (hp.p1, hp.p2) THEN 1 ELSE 0 END AS ishit,
         CASE WHEN p.p IN (hp.p1, hp.p2) THEN 'hit' ELSE 'f' || p.p END AS w
  FROM hp CROSS JOIN (SELECT unnest(range(0, {ln})) AS p) p),
wins AS (
  SELECT wd.i, s.s, sum(wd.ishit) AS sc
  FROM words wd JOIN (SELECT unnest(range(0, {ln - w + 1})) AS s) s
       ON wd.p >= s.s AND wd.p < s.s + {w}
  GROUP BY wd.i, s.s),
best AS (
  SELECT i, s, sc FROM (
    SELECT i, s, sc, row_number() OVER (PARTITION BY i
                                        ORDER BY sc DESC, s ASC) AS rn
    FROM wins) WHERE rn = 1),
snip AS (
  SELECT wd.i, b.s, b.sc,
         string_agg(CASE WHEN wd.ishit = 1 THEN '<em>hit</em>' ELSE wd.w END,
                    ' ' ORDER BY wd.p) AS body
  FROM words wd JOIN best b ON b.i = wd.i
       AND wd.p >= b.s AND wd.p < b.s + {w}
  GROUP BY wd.i, b.s, b.sc)
SELECT 'q1' AS query_id, 'd' || i AS doc_id,
       (CASE WHEN s > 0 THEN '… ' ELSE '' END) || body
       || (CASE WHEN s + {w} < {ln} THEN ' …' ELSE '' END) AS snippet,
       sc::INT AS n_matches
FROM snip"""


PRIOR_DEPTH, PRIOR_W = 200, 1.0


def q_bm25_prior_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage web ranking: BM25 text top-PRIOR_DEPTH, blended with a
    per-document static prior (md5-derived stand-in for log-PageRank,
    range [0, 3] — big enough to actually reorder), re-ranked to K. The
    oracle replays BOTH stages: full-corpus BM25, the depth cut on the
    text order, the additive blend, the final window — so depth
    semantics, join direction, and null-prior handling are all pinned.
    See :func:`patapsco_spark.operators.retrieve.search_with_prior`."""
    from patapsco_spark.operators.retrieve import (process_queries,
                                                   search_with_prior)

    idx = _ensure_index(spark, sf_dir)
    priors = (read_parquet(spark, f"{sf_dir}/documents.parquet")
              .select(F.col("doc_id").cast("string").alias("doc_id"),
                      (F.conv(F.substring(
                          F.md5(F.concat(F.lit("prior-"), F.col("doc_id")
                                         .cast("string"))), 1, 4), 16, 10)
                       .cast("double") / 65535.0 * 3.0).alias("prior")))
    plans = process_queries([("q1", BM25_QUERY)], RAW_TEXT, lang="eng",
                            mode="plain")
    res = search_with_prior(spark, idx, plans, priors,
                            RetrieveConfig(k=K), weight=PRIOR_W,
                            rescore_depth=PRIOR_DEPTH)
    return _as_result(res)


def _bm25_prior_sql(query_terms: list[str], k1: float, b: float,
                    k: int, depth: int, weight: float) -> str:
    """Replay the cascade: _bm25_sql's scores CTE → text-order depth cut
    → additive prior blend → final (blended desc, doc_id asc) top-k."""
    base = _bm25_sql(query_terms, k1, b, depth)
    head, _, _ = base.rpartition("SELECT doc_id,")
    return head + f""",
stage1 AS (
  SELECT doc_id, score FROM scores
  ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC LIMIT {depth}),
blended AS (
  SELECT doc_id,
         score + {weight} * (('0x' || substr(md5('prior-' || doc_id), 1, 4))
                             ::BIGINT::DOUBLE / 65535.0 * 3.0) AS score
  FROM stage1)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC,
                           CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM blended
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


RF_PIVOT, RF_BOOST = 2.0, 1.5


def q_index_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index statistics surface (new r5; the _stats/IndexReader read):
    live docs, vocabulary size, total tokens, max df, avgdl, live shard
    count — all from the committed snapshot (manifest + segment-gated
    term_stats), one columnar vocab-sized scan. Oracle recomputes every
    number from the raw corpus, incl. the float32 avgdl round-trip; the
    4-shard layout is the entry build's pinned config."""
    from patapsco_spark.operators.checkindex import index_stats

    idx = _ensure_index(spark, sf_dir)
    out = index_stats(spark, idx)
    return out.select("num_docs", "vocab_size", "total_tf", "max_df",
                      F.round("avgdl", 5).alias("avgdl"), "live_shards")


RESHARD_SHARDS = 14  # the split under test: 4 build shards → 14. The
# docs-per-shard is DERIVED from the corpus (ceil(num_docs/14)) so the
# same 4→14 split runs at every scale factor — the previous fixed
# dps=37 was tuned to the 500-doc gate (where it also meant 14 shards)
# and produced 1352 tiny shards at sf1.0: the timed cost became pure
# per-file/listing overhead, not resharding. Results are layout-
# independent (docid ORDER is preserved by the order-preserving
# renumber and the declared output carries no docid), so the oracle is
# unchanged at every sf.


def _ensure_resharded_index(spark: SparkSession, sf_dir: str) -> str:
    """A separate index artifact that has been resharded in place
    (streaming/incremental.reshard_index): built at 4 shards, then one
    full-merge generation flip to ceil(num_docs/RESHARD_SHARDS) docs per
    shard. Gated on
    the root manifest's docs_per_shard, so a warm call runs zero jobs."""
    from patapsco_spark.plans import manifest as _mf
    from patapsco_spark.streaming.incremental import reshard_index

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(), f"pspark_idxr_{tag}")
    docs = (read_parquet(spark, f"{sf_dir}/documents.parquet")
            .select(F.col("doc_id").cast("string").alias("id"), "text",
                    "lang"))
    build_index(spark, docs, path, IndexConfig(text=RAW_TEXT, num_shards=4),
                resume=True)
    meta = _mf.read_manifest(path)["config"]
    want = max(1, -(-int(meta["num_docs"]) // RESHARD_SHARDS))
    if int(meta["docs_per_shard"]) != want:
        reshard_index(spark, path, docs_per_shard=want)
    return path


def q_reshard_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resharding (new r5; the ES shrink/split analogue): the index's
    shard size is changed in place by a full-merge generation flip
    (docid order preserved, tf/dlq bytes carried), then the standard
    BM25 query runs against the resharded index. The oracle is the plain
    BM25 replay — identical results ARE the resharding correctness
    proof."""
    idx = _ensure_resharded_index(spark, sf_dir)
    res = search_texts(spark, idx, [("q1", BM25_QUERY)],
                       RetrieveConfig(k=K), text_cfg=RAW_TEXT)
    return _as_result(res)


TOP_HITS_N = 2
SLICE_ID, NUM_SLICES = 1, 3


def q_top_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terms+top_hits aggregation (new r5): per document source, the
    best 2 hits of the BM25 match set — one (query, bucket)-partitioned
    window, no global rank state. Oracle replays the full-match-set BM25
    scores and the per-source row_number cut."""
    from patapsco_spark.operators.aggs import match_set_texts, top_hits

    idx = _ensure_index(spark, sf_dir)
    matches = match_set_texts(spark, idx, [("q1", BM25_QUERY)],
                              RetrieveConfig(k=K), text_cfg=RAW_TEXT)
    fields = (read_parquet(spark, f"{sf_dir}/documents.parquet")
              .select(F.col("doc_id").cast("string").alias("doc_id"),
                      "source"))
    out = top_hits(matches, fields, "source", n=TOP_HITS_N)
    return out.select(F.col("source").alias("src"),
                      F.col("hit_rank").cast("long").alias("hit_rank"),
                      F.col("doc_id").cast("long").alias("doc_id"),
                      F.round("score", 5).alias("score"))


def q_sliced_scroll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES sliced scroll (new r5): deterministic md5-mod slice 1 of 3 of
    the BM25 match set — disjoint and exhaustive across slices (pinned in
    pytest), placement-independent unlike ES's shard-local slices. Oracle
    replays the hex-prefix mod in SQL."""
    from patapsco_spark.operators.aggs import match_set_texts, slice_matches

    idx = _ensure_index(spark, sf_dir)
    matches = match_set_texts(spark, idx, [("q1", BM25_QUERY)],
                              RetrieveConfig(k=K), text_cfg=RAW_TEXT)
    out = slice_matches(matches, SLICE_ID, NUM_SLICES)
    return (out.select(F.col("doc_id").cast("long").alias("doc_id"))
            .orderBy("doc_id"))


FILTER_PRED = "source IN ('src1','src3','src5','src7') AND n_chars >= 200"


def q_filtered_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES filter-context retrieval (new r5): BM25 over the full corpus
    statistics, candidates restricted by a structured predicate on the
    documents table (source membership + length bound) BEFORE the k cut —
    a doc ranked below k unfiltered can surface once better-scoring docs
    are filtered away. The oracle replays unrestricted BM25 then applies
    the same predicate before ranking."""
    from patapsco_spark.operators.retrieve import (process_queries,
                                                   search_filtered)

    idx = _ensure_index(spark, sf_dir)
    fields = (read_parquet(spark, f"{sf_dir}/documents.parquet")
              .select(F.col("doc_id").cast("string").alias("doc_id"),
                      "source", "n_chars"))
    plans = process_queries([("q1", BM25_QUERY)], RAW_TEXT, lang="eng",
                            mode="plain")
    res = search_filtered(spark, idx, plans, fields, FILTER_PRED,
                          RetrieveConfig(k=K))
    return _as_result(res)


PHRASE_SUGGEST_INPUT = "dat strem ag"  # → {data,dup} × {stream} × {a,agg}
PHRASE_SUGGEST_K, PHRASE_SUGGEST_MC = 3, 3


def q_phrase_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES phrase suggester (new r5): whole-query did-you-mean — per-token
    dictionary candidates (levenshtein ≤ 2, distance/cf/term ranked,
    capped), every combination scored by a stupid-backoff bigram LM over
    the corpus, top-3 by log-probability. Oracle replays the dictionary,
    the per-position candidate cuts, the bigram counts, and the exact
    backoff chain in SQL."""
    from patapsco_spark.operators.suggest import suggest_phrase

    idx = _ensure_index(spark, sf_dir)
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    out = suggest_phrase(spark, idx, PHRASE_SUGGEST_INPUT, docs,
                         k=PHRASE_SUGGEST_K,
                         max_candidates=PHRASE_SUGGEST_MC)
    return out.select("suggestion", F.round("logp", 6).alias("logp"))


CTX_PREFIX, CTX_PREV, CTX_MC = "s", "data", 50


def q_context_completions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-aware completion (new r5; search-as-you-type): dictionary
    completions of 's' re-ranked by the stupid-backoff bigram probability
    given the preceding word 'data' — corpus LM evidence instead of the
    ES context suggester's hand-assigned weights. Oracle replays the
    static pool cut, the bigram counts, and the exact backoff."""
    from patapsco_spark.operators.suggest import suggest_completions_context

    idx = _ensure_index(spark, sf_dir)
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    out = suggest_completions_context(spark, idx, CTX_PREFIX, CTX_PREV,
                                      docs, k=10, max_candidates=CTX_MC)
    return out.select("suggestion", F.round("prob", 6).alias("prob"), "cf")


RESCORE_QUERY, RESCORE_W, RESCORE_WIN = "stream window", 2.0, 200


def q_rescore_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES query rescorer (new r5, score_mode=total): primary BM25 keeps
    the top-200 window per query, a secondary BM25 query refines only
    that window as 1.0·primary + 2.0·secondary. Oracle replays both
    scorings, the primary-order window cut, and the weighted combine."""
    from patapsco_spark.operators.retrieve import process_queries
    from patapsco_spark.operators.retrieve import rescore as _rescore

    idx = _ensure_index(spark, sf_dir)
    pri = process_queries([("q1", BM25_QUERY)], RAW_TEXT, lang="eng")
    sec = process_queries([("q1", RESCORE_QUERY)], RAW_TEXT, lang="eng")
    res = _rescore(spark, idx, pri, sec, RetrieveConfig(k=K),
                   window=RESCORE_WIN, query_weight=1.0,
                   rescore_weight=RESCORE_W)
    return _as_result(res)


PINNED_IDS = ("42", "7")  # editorial promotions for the pinned query


def q_pinned_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES pinned query (new r5): docs 42 and 7 rank first in that exact
    order with descending synthetic scores (1e9 − slot), organic BM25
    below them unchanged with pins deduplicated out. Oracle replays the
    BM25 run, the pin ladder, and the union before one rank window."""
    from patapsco_spark.operators.retrieve import (process_queries,
                                                   search_pinned)

    idx = _ensure_index(spark, sf_dir)
    plans = process_queries([("q1", BM25_QUERY)], RAW_TEXT, lang="eng")
    res = search_pinned(spark, idx, plans, {"q1": list(PINNED_IDS)},
                        RetrieveConfig(k=K))
    return _as_result(res)


NEG_QUERY, NEG_BOOST = "stream", 0.5


def q_boosting_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES boosting query (new r5): rank by the positive BM25 query,
    demote (never exclude) docs also matching the negative query by
    0.5×. Oracle replays unrestricted BM25 then the conditional multiply
    before the rank window."""
    from patapsco_spark.operators.retrieve import (process_queries,
                                                   search_boosting)

    idx = _ensure_index(spark, sf_dir)
    pos = process_queries([("q1", BM25_QUERY)], RAW_TEXT, lang="eng")
    neg = process_queries([("q1", NEG_QUERY)], RAW_TEXT, lang="eng")
    res = search_boosting(spark, idx, pos, neg, RetrieveConfig(k=K),
                          negative_boost=NEG_BOOST)
    return _as_result(res)


def q_constant_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES constant_score (new r5): every doc matching the OR query scores
    exactly the boost; ties pinned by docid asc (= external-id string
    order). Oracle is the matched set ordered by CAST(doc_id AS VARCHAR)."""
    from patapsco_spark.operators.retrieve import (process_queries,
                                                   search_constant_score)

    idx = _ensure_index(spark, sf_dir)
    plans = process_queries([("q1", BM25_QUERY)], RAW_TEXT, lang="eng")
    res = search_constant_score(spark, idx, plans, RetrieveConfig(k=K),
                                boost=1.5)
    return _as_result(res)


def q_rank_feature_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES rank_feature saturation clause (new r5): BM25 text
    top-PRIOR_DEPTH plus boost·x/(x+pivot) over an md5-derived positive
    feature ((0, 10], a pagerank stand-in) — the saturation curve rewards
    feature growth with diminishing returns, unlike the raw additive
    prior. Oracle replays the depth cut and the exact saturation blend."""
    from patapsco_spark.operators.retrieve import (process_queries,
                                                   search_with_rank_feature)

    idx = _ensure_index(spark, sf_dir)
    feats = (read_parquet(spark, f"{sf_dir}/documents.parquet")
             .select(F.col("doc_id").cast("string").alias("doc_id"),
                     (F.conv(F.substring(
                         F.md5(F.concat(F.lit("feat-"), F.col("doc_id")
                                        .cast("string"))), 1, 4), 16, 10)
                      .cast("double") / 65535.0 * 10.0).alias("feature")))
    plans = process_queries([("q1", BM25_QUERY)], RAW_TEXT, lang="eng",
                            mode="plain")
    res = search_with_rank_feature(spark, idx, plans, feats,
                                   RetrieveConfig(k=K), fn="saturation",
                                   boost=RF_BOOST, pivot=RF_PIVOT,
                                   rescore_depth=PRIOR_DEPTH)
    return _as_result(res)


def _rank_feature_sql(query_terms: list[str], k1: float, b: float,
                      k: int, depth: int, pivot: float,
                      boost: float) -> str:
    """Replay the cascade: text depth cut → score + boost·x/(x+pivot)
    with x the same md5-derived feature expression."""
    base = _bm25_sql(query_terms, k1, b, depth)
    head, _, _ = base.rpartition("SELECT doc_id,")
    return head + f""",
stage1 AS (
  SELECT doc_id, score FROM scores
  ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC LIMIT {depth}),
blended AS (
  SELECT doc_id, score + {repr(float(boost))} * (x / (x + {repr(float(pivot))})) AS score
  FROM (SELECT doc_id, score,
               ('0x' || substr(md5('feat-' || doc_id), 1, 4))
               ::BIGINT::DOUBLE / 65535.0 * 10.0 AS x
        FROM stage1))
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC,
                           CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM blended
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


DECAY_SCALE, DECAY_RATE = 90.0, 0.5


def q_recency_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness ranking (new r5; Elasticsearch function_score decay
    semantics): BM25 text top-PRIOR_DEPTH, each candidate's score
    MULTIPLIED by a gauss decay of its age — factor 1 at age 0, exactly
    DECAY_RATE at DECAY_SCALE days — then re-ranked to K. Ages are
    md5-derived ([0, 365) days, deterministic) since the documents table
    carries no timestamp; the oracle replays both stages bit-for-bit:
    full-corpus BM25, the text-order depth cut, the same gauss constant,
    the multiply blend, the final window. See
    :func:`patapsco_spark.operators.retrieve.search_with_decay`."""
    from patapsco_spark.operators.retrieve import (process_queries,
                                                   search_with_decay)

    idx = _ensure_index(spark, sf_dir)
    ages = (read_parquet(spark, f"{sf_dir}/documents.parquet")
            .select(F.col("doc_id").cast("string").alias("doc_id"),
                    (F.conv(F.substring(
                        F.md5(F.concat(F.lit("age-"), F.col("doc_id")
                                       .cast("string"))), 1, 4), 16, 10)
                     .cast("double") / 65535.0 * 365.0).alias("age_days")))
    plans = process_queries([("q1", BM25_QUERY)], RAW_TEXT, lang="eng",
                            mode="plain")
    res = search_with_decay(spark, idx, plans, ages, RetrieveConfig(k=K),
                            origin=0.0, scale=DECAY_SCALE, decay=DECAY_RATE,
                            shape="gauss", mode="multiply",
                            rescore_depth=PRIOR_DEPTH, field_col="age_days")
    return _as_result(res)


def _recency_sql(query_terms: list[str], k1: float, b: float,
                 k: int, depth: int, scale: float, decay: float) -> str:
    """Replay the decay cascade: _bm25_sql's scores CTE → text-order depth
    cut → gauss multiply (same double constant 2σ² as the Spark side, so
    exp() agrees bit-for-bit) → final (blended desc, doc_id asc) top-k."""
    import math as _m
    two_sigma2 = repr(2.0 * (-(scale * scale) / (2.0 * _m.log(decay))))
    base = _bm25_sql(query_terms, k1, b, depth)
    head, _, _ = base.rpartition("SELECT doc_id,")
    return head + f""",
stage1 AS (
  SELECT doc_id, score FROM scores
  ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC LIMIT {depth}),
blended AS (
  SELECT doc_id,
         score * exp(-(age * age) / {two_sigma2}) AS score
  FROM (SELECT doc_id, score,
               ('0x' || substr(md5('age-' || doc_id), 1, 4))
               ::BIGINT::DOUBLE / 65535.0 * 365.0 AS age
        FROM stage1))
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC,
                           CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM blended
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


TV_IDS = ("7", "42", "123", "999999")  # last one unknown → no rows


def q_termvectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc term vectors read back from the index (new r5; Lucene
    TermVectors analogue): tf/dl of every indexed term of the requested
    ids plus the corpus df/cf a scorer would see, decoded from ONLY the
    varbyte blocks whose docid span can contain a target. The unknown id
    pins the no-rows behavior; the oracle replays tf/dl/df/cf from the
    raw text."""
    from patapsco_spark.operators.termvectors import doc_term_vectors

    idx = _ensure_index(spark, sf_dir)
    res = doc_term_vectors(spark, idx, list(TV_IDS))
    return res.select(F.col("doc_id").cast("long").alias("doc_id"), "term",
                      "tf", "dl", "df", "cf")


def _termvectors_sql(ids: tuple[str, ...]) -> str:
    # ALL requested ids go in — the join against the corpus drops unknown
    # ones, replaying the engine's no-rows-for-unknown-id behavior in SQL
    vals = ", ".join(f"({int(i)})" for i in ids)
    return f"""
WITH {_TOK_CTES},
sel(doc_id) AS (VALUES {vals}),
dtf AS (
  SELECT tf.doc_id, tf.term, tf.tf::INT AS tf FROM tf JOIN sel USING (doc_id)),
dls AS (
  SELECT dl.doc_id, dl.dl::INT AS dl FROM dl JOIN sel USING (doc_id)),
st AS (
  SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS cf
  FROM tf WHERE term IN (SELECT term FROM dtf) GROUP BY term)
SELECT d.doc_id::BIGINT AS doc_id, d.term, d.tf, l.dl, st.df, st.cf
FROM dtf d JOIN dls l ON l.doc_id = d.doc_id JOIN st USING (term)
"""


PASS_W, PASS_S = 24, 12


def _ensure_passage_index(spark: SparkSession, sf_dir: str) -> str:
    """Child (passage) index for the block join: overlapping PASS_W-token
    windows at PASS_S stride, ids ``{parent}#p{i}`` (separate cache —
    different corpus shape)."""
    from patapsco_spark.operators.blockjoin import passage_children

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(), f"pspark_idxbj_{tag}")
    docs = (read_parquet(spark, f"{sf_dir}/documents.parquet")
            .select(F.col("doc_id").cast("string").alias("id"), "text",
                    "lang"))
    children = passage_children(docs, window=PASS_W, stride=PASS_S)
    build_index(spark, children, path,
                IndexConfig(text=RAW_TEXT, num_shards=4), resume=True)
    return path


def q_blockjoin_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parent-child block join (new r5; Lucene ToParentBlockJoinQuery,
    ScoreMode.Max): BM25 over the passage index, EVERY matching passage
    kept (matches_only — no child depth cut, so parent scores are exact),
    parents ranked by their best passage. The oracle regenerates the
    passage windows, replays child BM25 with child-corpus stats, and the
    max rollup + best-child tie-break (lowest child id on score ties)."""
    from patapsco_spark.operators.blockjoin import block_join_topk
    from patapsco_spark.operators.retrieve import process_queries

    idx = _ensure_passage_index(spark, sf_dir)
    plans = process_queries([("q1", BM25_QUERY)], RAW_TEXT, lang="eng",
                            mode="plain")
    res = block_join_topk(spark, idx, plans, RetrieveConfig(k=K),
                          score_mode="max")
    return res.select(F.col("doc_id").cast("long").alias("doc_id"),
                      "best_child",
                      F.col("n_children").cast("long").alias("n_children"),
                      F.col("rank").cast("long").alias("rnk"),
                      F.round("score", 5).alias("score"))


def _blockjoin_sql(query_terms: list[str], k1: float, b: float, k: int,
                   w: int, stride: int) -> str:
    """Oracle for the max-mode block join: regenerate the passage windows
    (same starts rule: every stride multiple strictly below dl, one empty
    window for an empty doc), child BM25 with CHILD-corpus n/avgdl/df and
    the quantized child length, then max-rollup with the exact best-child
    tie-break (score desc, child-id string asc = lowest internal docid)."""
    vals = ", ".join(f"('{t}')" for t in query_terms)
    quant = _quant_sql("ch.cdl")
    kk1, bb = repr(float(k1)), repr(float(b))
    return f"""
WITH docarr AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS arr
  FROM documents),
tokpos AS (
  SELECT d.doc_id, p.i AS pos, d.arr[p.i + 1] AS term
  FROM docarr d, LATERAL (SELECT unnest(range(0, length(d.arr))) AS i)
       AS p(i)),
chld AS (
  SELECT d.doc_id, s.s, (s.s / {stride})::BIGINT AS ci,
         least({w}, length(d.arr) - s.s)::BIGINT AS cdl
  FROM docarr d,
       LATERAL (SELECT unnest(range(0, greatest(length(d.arr), 1),
                                    {stride})) AS s) AS s(s)),
cstats AS (
  SELECT count(*)::DOUBLE AS n,
         CAST(CAST(sum(cdl) AS DOUBLE) / count(*) AS REAL)::DOUBLE AS avgdl
  FROM chld),
qterms(term) AS (VALUES {vals}),
ctf AS (
  SELECT c.doc_id, c.ci, t.term, count(*)::DOUBLE AS tf
  FROM chld c JOIN tokpos t ON t.doc_id = c.doc_id
       AND t.pos >= c.s AND t.pos < c.s + {w}
  WHERE t.term IN (SELECT term FROM qterms)
  GROUP BY c.doc_id, c.ci, t.term),
dfs AS (SELECT term, count(*)::DOUBLE AS df FROM ctf GROUP BY term),
cscore AS (
  SELECT ctf.doc_id, ctf.ci,
         list_aggregate(list(
             ln(1 + (cstats.n - dfs.df + 0.5) / (dfs.df + 0.5))
             * ctf.tf / (ctf.tf + {kk1} * (1 - {bb} + {bb} * {quant}
                                           / cstats.avgdl))
             ORDER BY ctf.term), 'sum') AS score
  FROM ctf
  JOIN dfs ON dfs.term = ctf.term
  JOIN chld ch ON ch.doc_id = ctf.doc_id AND ch.ci = ctf.ci
  CROSS JOIN cstats
  GROUP BY ctf.doc_id, ctf.ci),
par AS (
  SELECT doc_id, max(score) AS score, count(*)::BIGINT AS n_children
  FROM cscore GROUP BY doc_id),
best AS (
  SELECT doc_id, best_child FROM (
    SELECT doc_id,
           doc_id::VARCHAR || '#p' || ci::VARCHAR AS best_child,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY score DESC,
                              (doc_id::VARCHAR || '#p' || ci::VARCHAR) ASC
                              ) AS rn
    FROM cscore) WHERE rn = 1)
SELECT p.doc_id::BIGINT AS doc_id, b.best_child, p.n_children,
       (row_number() OVER (ORDER BY p.score DESC,
                           CAST(p.doc_id AS VARCHAR) ASC) - 1)::BIGINT
       AS rnk,
       ROUND(p.score, 5) AS score
FROM par p JOIN best b USING (doc_id)
ORDER BY p.score DESC, CAST(p.doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def q_psq_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _ensure_index(spark, sf_dir)
    groups: dict[int, list[str]] = {}
    for cid, term, p in PSQ_CLAUSES:
        groups.setdefault(cid, []).append(f"{term}^{p}")
    qtext = "psq AND " + " AND ".join(f"({' '.join(g)})" for g in groups.values())
    plan = parse_query("q1", qtext, mode="psq")
    res = search(spark, idx, [plan], RetrieveConfig(k=K, k1=1.2, b=0.75))
    return _as_result(res)


def q_boolean_and_not(spark: SparkSession, sf_dir: str) -> DataFrame:
    idx = _ensure_index(spark, sf_dir)
    plan = parse_query("q1", "window AND stream NOT batch", mode="boolean")
    res = search(spark, idx, [plan], RetrieveConfig(k=K))
    return _as_result(res)


NESTED_QUERY = "(window OR stream) AND data NOT batch"


def q_boolean_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested boolean grouping (Lucene QueryParser semantics): docs must
    contain (window or stream) and data, and no batch; score = Σ BM25 of the
    MATCHING scoring terms — grouping changes matching, never per-term
    scores."""
    idx = _ensure_index(spark, sf_dir)
    plan = parse_query("q1", NESTED_QUERY, mode="boolean")
    res = search(spark, idx, [plan], RetrieveConfig(k=K))
    return _as_result(res)


MSM_TERMS, MSM_MIN = ["window", "stream", "data"], 2


def q_min_should_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene BooleanQuery.setMinimumNumberShouldMatch (new r5): query
    'window stream data' with min_should_match=2 — a doc qualifies only if
    at least 2 of the 3 SHOULD terms match it; score is still Σ BM25 over
    every matching query term (mm filters matching, never scores). Runs the
    dense kernel (the block-max pruner's bounds assume any-of-terms
    matching, so mm>1 disables it)."""
    idx = _ensure_index(spark, sf_dir)
    plan = parse_query("q1", " ".join(MSM_TERMS), mode="boolean")
    res = search(spark, idx, [plan],
                 RetrieveConfig(k=K, min_should_match=MSM_MIN))
    return _as_result(res)


HIST_INTERVAL = 200


def _bm25_match_set(spark: SparkSession, sf_dir: str):
    """Shared helper for the match-set aggregation entries: the FULL set of
    documents matching BM25_QUERY (OR semantics, matches_only kernel mode —
    no top-k cut) plus the documents frame for field lookups."""
    from patapsco_spark.operators.aggs import match_set_texts

    idx = _ensure_index(spark, sf_dir)
    matches = match_set_texts(spark, idx, [("q1", BM25_QUERY)],
                              text_cfg=RAW_TEXT)
    docs = read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
    return matches, docs


ADJ_FILTERS = ["data", "query", "stream", "window"]


def q_adjacency_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES adjacency_matrix aggregation (new r5 s5): four named single-term
    filters; one bucket per filter and per unordered pair with the
    intersection doc count, keys 'a' / 'a&b' sorted — co-occurrence
    analytics over match sets with NO self-join of the match set (pair
    expansion is per-doc over the collected filter names). The oracle
    replays the pair expansion as a name-ordered self-join of the
    distinct (filter, doc) sets."""
    from patapsco_spark.operators.aggs import adjacency_matrix, \
        match_set_texts

    idx = _ensure_index(spark, sf_dir)
    matches = match_set_texts(spark, idx, [(t, t) for t in ADJ_FILTERS],
                              text_cfg=RAW_TEXT)
    return (adjacency_matrix(matches)
            .select("key", F.col("doc_count").cast("long")
                    .alias("doc_count")))


def q_terms_set_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terms_set / Lucene CoveringQuery (new r5 s5): match docs
    containing at least required_matches DISTINCT members of BM25_QUERY,
    the threshold read per-doc from a stored field (derived here as
    2 + n_chars % 3 ∈ {2,3,4} — deterministic and SQL-replayable), scored
    as the BM25 OR sum over matched members. The oracle replays the
    per-term scores, the term-asc fold, the GREATEST(…, 1) clamp, and the
    admission filter."""
    from patapsco_spark.operators.termsset import terms_set_topk

    idx = _ensure_index(spark, sf_dir)
    docs = read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
    vals = docs.select(F.col("doc_id").cast("string").alias("doc_id"),
                       (F.lit(2) + F.col("n_chars") % 3).alias("req"))
    res = terms_set_topk(spark, idx, BM25_QUERY.split(), vals, "req",
                         text_cfg=RAW_TEXT, k=K)
    return _as_result(res)


def q_ltr_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTR feature extraction (new r5 s5; ES Learning-to-Rank feature
    logging / LETOR-style feature sets): one row per (query, doc) in the
    BM25_QUERY OR match set with bm25, qld, n_matched, match_ratio,
    sum/max/min tf, the quantized dl the scorers used, and the term-asc
    idf fold — the offline-training feature frame produced entirely from
    index artifacts. The oracle replays every column (both score kernels,
    the aggregates, the SmallFloat dl quantization)."""
    from patapsco_spark.operators.ltr import ltr_features

    idx = _ensure_index(spark, sf_dir)
    out = ltr_features(spark, idx, [("q1", BM25_QUERY)], text_cfg=RAW_TEXT)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.round("bm25", 5).alias("bm25"),
        F.round("qld", 5).alias("qld"),
        F.col("n_matched").cast("long").alias("n_matched"),
        F.round("match_ratio", 6).alias("match_ratio"),
        F.col("sum_tf").cast("long").alias("sum_tf"),
        F.col("max_tf").cast("long").alias("max_tf"),
        F.col("min_tf").cast("long").alias("min_tf"),
        F.col("dlq").cast("long").alias("dlq"),
        F.round("sum_idf", 5).alias("sum_idf"))


SAMPLE_SIZE, SAMPLE_PER_VALUE = 50, 3


def q_sampled_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES diversified_sampler + stats (new r5 s5): the 50 best-scoring
    BM25_QUERY matches with at most 3 per ``source`` (score-greedy,
    docid tie-break), then ES stats over n_chars of the sample — the
    standard de-biased-sample pattern for expensive child aggs. This
    entry uses a GLOBAL sample (docs_per_shard raised above the corpus)
    so the SQL oracle can replay both windows without knowing the
    engine's shard layout; the index-shard-local variant is pytest-pinned
    (test_aggs.py::test_sampler_per_shard)."""
    from patapsco_spark.operators.aggs import diversified_sampler, \
        field_stats

    matches, docs = _bm25_match_set(spark, sf_dir)
    sample = diversified_sampler(matches, docs, "source",
                                 shard_size=SAMPLE_SIZE,
                                 docs_per_shard=1 << 62,
                                 max_docs_per_value=SAMPLE_PER_VALUE)
    out = field_stats(sample, docs, "n_chars")
    return out.select(F.col("cnt").cast("long").alias("cnt"),
                      F.col("min_v").cast("long").alias("min_v"),
                      F.col("max_v").cast("long").alias("max_v"),
                      F.col("sum_v").cast("long").alias("sum_v"),
                      F.round("avg_v", 6).alias("avg_v"))


def q_sort_by_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-by-field (new r5; Lucene Sort / ES sort): top-K of the FULL
    match set for BM25_QUERY ordered by n_chars desc (doc_id-string asc
    tie-break) — recency/size ranking instead of score. The kernel runs in
    matches_only mode (no top-k cut); the sort is one row_number window
    over the distributed match set."""
    from patapsco_spark.operators.aggs import sort_by_field

    matches, docs = _bm25_match_set(spark, sf_dir)
    out = sort_by_field(matches, docs, "n_chars", k=K)
    return out.select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.col("rank").cast("long").alias("rnk"),
                      F.col("n_chars").cast("long").alias("n_chars"))


def q_match_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES stats aggregation (new r5) over the full BM25_QUERY match set:
    count/min/max/sum/avg of n_chars — one map-side-combinable groupBy."""
    from patapsco_spark.operators.aggs import field_stats

    matches, docs = _bm25_match_set(spark, sf_dir)
    out = field_stats(matches, docs, "n_chars")
    return out.select(F.col("cnt").cast("long").alias("cnt"),
                      F.col("min_v").cast("long").alias("min_v"),
                      F.col("max_v").cast("long").alias("max_v"),
                      F.col("sum_v").cast("long").alias("sum_v"),
                      F.round("avg_v", 6).alias("avg_v"))


def q_match_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES histogram aggregation (new r5) over the full BM25_QUERY match
    set: fixed-interval n_chars buckets (floor(v/200)*200), count per
    bucket, empty buckets omitted."""
    from patapsco_spark.operators.aggs import field_histogram

    matches, docs = _bm25_match_set(spark, sf_dir)
    out = field_histogram(matches, docs, "n_chars", interval=HIST_INTERVAL)
    return out.select(F.col("bucket").cast("long").alias("bucket"),
                      F.col("cnt").cast("long").alias("cnt"))


PCTL_PS = (0.25, 0.5, 0.75, 0.95)
KMV_K = 32


def q_match_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES percentiles aggregation (new r5) over the full BM25_QUERY match
    set — EXACT percentile_disc (smallest value whose cume_dist reaches p,
    always an actual data value), not ES's t-digest approximation, so the
    oracle replays it verbatim."""
    from patapsco_spark.operators.aggs import field_percentiles

    matches, docs = _bm25_match_set(spark, sf_dir)
    out = field_percentiles(matches, docs, "n_chars", list(PCTL_PS))
    return out.select("p", F.col("value").cast("double").alias("value"))


def q_match_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES cardinality aggregation (new r5): distinct n_chars values in the
    BM25_QUERY match set via a deterministic K-Minimum-Values sketch over
    md5 unit-interval hashes (mergeable + bounded-memory like ES's HLL++,
    but bit-replayable in SQL). Exact when fewer than KMV_K distinct
    values exist, (k−1)/h_(k) otherwise."""
    from patapsco_spark.operators.aggs import field_cardinality

    matches, docs = _bm25_match_set(spark, sf_dir)
    out = field_cardinality(matches, docs, "n_chars", k=KMV_K)
    return out.select(F.round("est", 6).alias("est"), "is_exact")


XSTATS_SIGMA = 2.0
# derived integer token count: spaces + 1 — the same fixed expression in
# Spark and the oracle, so every moment sum below stays integer-exact
# (built lazily: Column construction needs an active session)
def _ntok_spark():
    return (F.length("text") - F.length(F.regexp_replace("text", " ", ""))
            + F.lit(1)).cast("long")
_NTOK_SQL = "(length(d.text) - length(replace(d.text, ' ', '')) + 1)"
MTERMS_SIZE = 10
FILTERS_AGG = {"short": "n_chars < 300", "es_lang": "lang = 'es'",
               "bulky": "n_chars >= 1200"}


def q_match_extended_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES extended_stats aggregation (new r5 s5) over the BM25_QUERY match
    set: stats + sum_of_squares, population variance/std-dev, and the
    ±2σ bounds, all derived from two exact integer moments so the doubles
    are fixed expression trees the oracle replays bit-for-bit."""
    from patapsco_spark.operators.aggs import extended_stats

    matches, docs = _bm25_match_set(spark, sf_dir)
    out = extended_stats(matches, docs, "n_chars", sigma=XSTATS_SIGMA)
    return out.select(
        F.col("cnt").cast("long").alias("cnt"),
        F.col("min_v").cast("long").alias("min_v"),
        F.col("max_v").cast("long").alias("max_v"),
        F.col("sum_v").cast("long").alias("sum_v"),
        F.col("sum_sq").cast("long").alias("sum_sq"),
        F.round("avg_v", 6).alias("avg_v"),
        F.round("variance", 6).alias("variance"),
        F.round("std_dev", 6).alias("std_dev"),
        F.round("std_upper", 6).alias("std_upper"),
        F.round("std_lower", 6).alias("std_lower"))


def q_match_matrix_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES matrix_stats aggregation (new r5 s5) for the (n_chars, n_tokens)
    field pair over the BM25_QUERY match set: means, population variances,
    covariance, Pearson correlation — five integer moment sums in one
    map-side-combinable pass, then fixed double trees (unlike ES's
    order-dependent Welford streaming)."""
    from patapsco_spark.operators.aggs import matrix_stats

    matches, docs = _bm25_match_set(spark, sf_dir)
    docs = docs.withColumn("n_tokens", _ntok_spark())
    out = matrix_stats(matches, docs, "n_chars", "n_tokens")
    return out.select(
        F.col("cnt").cast("long").alias("cnt"),
        F.round("mean_a", 6).alias("mean_a"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round("var_a", 6).alias("var_a"),
        F.round("var_b", 6).alias("var_b"),
        F.round("covariance", 6).alias("covariance"),
        F.round("correlation", 6).alias("correlation"))


def q_match_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES weighted_avg aggregation (new r5 s5): n_chars weighted by
    n_tokens over the BM25_QUERY match set — Σvw/Σw with integer-exact
    sums, the one double being the final division."""
    from patapsco_spark.operators.aggs import weighted_avg

    matches, docs = _bm25_match_set(spark, sf_dir)
    docs = docs.withColumn("n_tokens", _ntok_spark())
    out = weighted_avg(matches, docs, "n_chars", "n_tokens")
    return out.select(
        F.col("sum_vw").cast("long").alias("sum_vw"),
        F.col("sum_w").cast("long").alias("sum_w"),
        F.round("wavg", 6).alias("wavg"))


def q_match_multi_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES multi_terms aggregation (new r5 s5): (lang, source) tuple
    buckets over the BM25_QUERY match set, top-10 by (count desc, keys
    asc) — one composite-key groupBy planned as TakeOrderedAndProject."""
    from patapsco_spark.operators.aggs import multi_terms

    matches, docs = _bm25_match_set(spark, sf_dir)
    out = multi_terms(matches, docs, ["lang", "source"], size=MTERMS_SIZE)
    return out.select("lang", "source", F.col("cnt").cast("long").alias("cnt"))


def q_match_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES filters aggregation (new r5 s5): three named predicate buckets
    (overlapping, like ES) + the other_bucket catch-all, all counted in a
    single sum(CASE WHEN) pass over the joined match set."""
    from patapsco_spark.operators.aggs import filters_agg

    matches, docs = _bm25_match_set(spark, sf_dir)
    out = filters_agg(matches, docs, dict(FILTERS_AGG),
                      other_bucket="other")
    return out.select("bucket", F.col("cnt").cast("long").alias("cnt"))


PCTL_RANK_VALUES = (200.0, 500.0, 1200.0)
RANGE_BUCKETS = ((None, 300.0), (300.0, 1200.0), (1200.0, None))
TOP_METRICS_SIZE = 3


def q_match_pctl_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES percentile_ranks aggregation (new r5 s5): the empirical CDF
    ×100 at three requested n_chars values — EXACT (integer count per
    value + one division) where ES t-digests."""
    from patapsco_spark.operators.aggs import percentile_ranks

    matches, docs = _bm25_match_set(spark, sf_dir)
    out = percentile_ranks(matches, docs, "n_chars",
                           list(PCTL_RANK_VALUES))
    return out.select("value", F.round("pct", 6).alias("pct"))


def q_match_range_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES range aggregation (new r5 s5): explicit [from, to) n_chars
    buckets (from inclusive, to exclusive — ES's convention), every
    requested bucket present even when empty, '*' open ends."""
    from patapsco_spark.operators.aggs import range_agg

    matches, docs = _bm25_match_set(spark, sf_dir)
    out = range_agg(matches, docs, "n_chars",
                    [tuple(r) for r in RANGE_BUCKETS])
    return out.select("bucket", F.col("cnt").cast("long").alias("cnt"))


def q_match_top_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES top_metrics aggregation (new r5 s5): source + token count read
    off the 3 largest matching docs by n_chars (sort desc, doc_id asc
    tie-break — deterministic, engine-replayable row selection)."""
    from patapsco_spark.operators.aggs import top_metrics

    matches, docs = _bm25_match_set(spark, sf_dir)
    docs = docs.withColumn("n_tokens", _ntok_spark())
    out = top_metrics(matches, docs, "n_chars", ["source", "n_tokens"],
                      size=TOP_METRICS_SIZE)
    return out.select(F.col("pos").cast("long").alias("pos"),
                      F.col("doc_id").cast("long").alias("doc_id"),
                      F.col("n_chars").cast("long").alias("n_chars"),
                      "source",
                      F.col("n_tokens").cast("long").alias("n_tokens"))


def q_match_value_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES value_count + missing aggregations (new r5 s5): non-NULL field
    values and the missing bucket over the match set, one left-join
    pass."""
    from patapsco_spark.operators.aggs import value_count

    matches, docs = _bm25_match_set(spark, sf_dir)
    out = value_count(matches, docs, "n_chars")
    return out.select(F.col("value_cnt").cast("long").alias("value_cnt"),
                      F.col("missing_cnt").cast("long")
                      .alias("missing_cnt"))


GEO_ORIGIN = (20.0, 10.0)
GEO_RADIUS_KM = 9000.0
GEO_ZOOM = 3


def _geo_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-doc coordinates: two independent md5 16-bit
    draws mapped to lat ∈ [-85, 85] (inside Web-Mercator's pole bound)
    and lon ∈ [-180, 180) — the repo's portable hash trick (same salt ':'
    key md5 the oracle replays via '0x'||substr(md5(...))), standing in
    for page geotags the synthetic corpus lacks."""
    def h16(salt: str):
        return (F.conv(F.substring(
            F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string"))),
            1, 4), 16, 10).cast("double") / F.lit(65535.0))

    return (read_parquet(spark, os.path.join(sf_dir, "documents.parquet"))
            .select(F.col("doc_id").cast("string").alias("doc_id"),
                    (h16("lat-") * 170.0 - 85.0).alias("lat"),
                    (h16("lon-") * 360.0 - 180.0).alias("lon")))


def q_geo_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES geo_distance sort + filter (new r5 s5): the 20 BM25_QUERY
    matches nearest to a fixed origin within 9000 km, by haversine
    great-circle distance over md5-derived per-doc coordinates — one
    join + closed-form math, TakeOrderedAndProject cut."""
    from patapsco_spark.operators.geo import geo_distance

    matches, _docs = _bm25_match_set(spark, sf_dir)
    out = geo_distance(matches, _geo_frame(spark, sf_dir), *GEO_ORIGIN,
                       k=K, radius_km=GEO_RADIUS_KM)
    return out.select(F.col("doc_id").cast("long").alias("doc_id"),
                      F.round("dist_km", 5).alias("dist_km"))


def q_geotile_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES geotile_grid aggregation (new r5 s5): BM25_QUERY match density
    per zoom-3 Web-Mercator slippy-map tile, top 10 buckets by (count
    desc, x asc, y asc) — integer tile keys from fixed ln/tan trees, so
    the bucket counts are engine-exact."""
    from patapsco_spark.operators.geo import geotile_grid

    matches, _docs = _bm25_match_set(spark, sf_dir)
    out = geotile_grid(matches, _geo_frame(spark, sf_dir), zoom=GEO_ZOOM,
                       size=10)
    return out.select(F.col("tile_x").cast("long").alias("tile_x"),
                      F.col("tile_y").cast("long").alias("tile_y"),
                      F.col("cnt").cast("long").alias("cnt"))


SIGTERMS_MIN_DOC = 3


def q_significant_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES significant_terms aggregation (new r5): terms disproportionately
    frequent in the BM25_QUERY match set vs the corpus, JLH-scored
    (fg%−bg%)×(fg%/bg%). Foreground re-analyzes ONLY matched docs (one
    bounded pass); background df comes from the index's term_stats — no
    corpus rescan."""
    from patapsco_spark.operators.aggs import significant_terms

    matches, docs = _bm25_match_set(spark, sf_dir)
    idx = _ensure_index(spark, sf_dir)
    store = docs.select(F.col("doc_id").cast("string").alias("id"), "text")
    out = significant_terms(spark, idx, matches, store, text_cfg=RAW_TEXT,
                            k=K, min_doc_count=SIGTERMS_MIN_DOC,
                            lang_col=None)
    return out.select("term", F.col("rank").cast("long").alias("rnk"),
                      "fg_cnt", "bg_df", "score")


PERC_QUERIES = [
    ("pq1", "data AND stream NOT window"),
    ("pq2", "query window"),                 # OR
    ("pq3", "stream NOT (data OR query)"),   # nested NOT group
]


def q_percolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percolation (new r5; Elasticsearch percolator analogue): match
    incoming documents against STORED boolean queries — the alerting /
    routing primitive of a live crawl. Every stored query compiles into a
    Catalyst predicate over the analyzed token array, so the whole
    percolation is ONE codegen projection per batch: no index, no shuffle,
    no join (plan-guarded in tests/test_percolate.py)."""
    from patapsco_spark.operators.percolate import percolate_texts
    from patapsco_spark.partitioning import widen_for_kernel

    # widen the narrow small-corpus scan HERE, not in the operator:
    # percolate itself is contractually shuffle-free (one fused
    # projection — plan-guarded), so the caller owns input parallelism
    docs = widen_for_kernel(
        read_parquet(spark, os.path.join(sf_dir, "documents.parquet")).select(
            F.col("doc_id").cast("string").alias("id"), "text"))
    out = percolate_texts(docs, PERC_QUERIES, text_cfg=RAW_TEXT,
                          lang_col=None)
    return (out.select(F.col("doc_id").cast("long").alias("doc_id"),
                       "query_id")
            .orderBy("doc_id", "query_id"))


WILDCARD_MUST, WILDCARD_PREFIX = "window", "s"


def q_wildcard_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix wildcard (new r4): 'window AND s*' — the 's' prefix expands
    against the index term dictionary at search time (one StringStartsWith-
    pushed term_stats read) into a SHOULD-group (Lucene's
    SCORING_BOOLEAN_REWRITE); docs must contain 'window' AND ≥1 expanded
    term, scoring BM25 over every matching query term."""
    idx = _ensure_index(spark, sf_dir)
    res = search_texts(spark, idx,
                       [("q1", f"{WILDCARD_MUST} AND {WILDCARD_PREFIX}*")],
                       RetrieveConfig(k=K), text_cfg=RAW_TEXT, mode="boolean")
    return _as_result(res)


WILDGEN_MUST, WILDGEN_PATTERN = "window", "s?a*"


def q_wildcard_general(spark: SparkSession, sf_dir: str) -> DataFrame:
    """General wildcard (new r5): 'window AND s?a*' — the pattern expands
    against the index term dictionary (literal-prefix StringStartsWith
    pushed to the term-sorted stats scan, full pattern as an anchored JVM
    regex, limit-bounded collect) into a SHOULD-group
    (SCORING_BOOLEAN_REWRITE); docs must contain 'window' AND ≥1 expanded
    term, scoring BM25 over every matching query term. Completes classic-
    QueryParser wildcard parity beyond trailing-* prefixes (leading
    wildcards stay rejected, Lucene's allowLeadingWildcard=false)."""
    idx = _ensure_index(spark, sf_dir)
    res = search_texts(spark, idx,
                       [("q1", f"{WILDGEN_MUST} AND {WILDGEN_PATTERN}")],
                       RetrieveConfig(k=K), text_cfg=RAW_TEXT, mode="boolean")
    return _as_result(res)


REGEXP_MUST, REGEXP_PAT = "window", "s(can|tream|ort)"


def q_regexp_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp query (new r5): 'window AND /s(can|tream|ort)/' — Lucene
    RegexpQuery via the classic parser's /regexp/ syntax. The ANCHORED
    pattern expands against the index term dictionary (literal-opening
    StringStartsWith pushed to the term-sorted stats scan, full pattern as
    a JVM rlike, limit-bounded collect) into a SHOULD-group
    (SCORING_BOOLEAN_REWRITE); docs must contain 'window' AND ≥1 expanded
    term, scoring BM25 over every matching query term."""
    idx = _ensure_index(spark, sf_dir)
    res = search_texts(spark, idx,
                       [("q1", f"{REGEXP_MUST} AND /{REGEXP_PAT}/")],
                       RetrieveConfig(k=K), text_cfg=RAW_TEXT, mode="boolean")
    return _as_result(res)


FUZZY_MUST, FUZZY_BASE, FUZZY_EDITS = "window", "lin", 2


def q_fuzzy_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy term (new r5): 'window AND lin~2' — 'lin' expands against the
    index term dictionary to every term within plain Levenshtein distance 2
    (length-range pushed to the term_stats scan, distance JVM-side,
    limit-bounded collect) into a SHOULD-group; docs must contain 'window'
    AND ≥1 expanded term, scoring BM25 over every matching query term.
    Closes round-4 parity gap #3 (the reference's classic QueryParser
    accepts term~, /root/reference/patapsco/retrieve.py:79-82)."""
    idx = _ensure_index(spark, sf_dir)
    res = search_texts(spark, idx,
                       [("q1", f"{FUZZY_MUST} AND {FUZZY_BASE}~{FUZZY_EDITS}")],
                       RetrieveConfig(k=K), text_cfg=RAW_TEXT, mode="boolean")
    return _as_result(res)


RANGE_LO, RANGE_HI = "slow", "table"


def q_range_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term range query (round 5): '[slow TO table]' — the last classic-
    QueryParser construct we rejected loudly. Expands against the term
    dictionary (range predicate pushed to the term-sorted stats scan,
    limit-bounded collect) into a SHOULD-group scored as Σ per-term BM25 —
    SCORING_BOOLEAN_REWRITE, a documented departure from Lucene
    TermRangeQuery's constant-score default, consistent with our
    wildcard/fuzzy rewrite."""
    idx = _ensure_index(spark, sf_dir)
    res = search_texts(spark, idx, [("q1", f"[{RANGE_LO} TO {RANGE_HI}]")],
                       RetrieveConfig(k=K), text_cfg=RAW_TEXT, mode="boolean")
    return _as_result(res)


PHRASE_WORDS = ["data", "stream"]
PHRASE_EXTRA = "window"


def q_phrase_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact positional phrase + a loose term: '"data stream" window'.
    Scored like Lucene PhraseQuery under BM25 (tf = phrase frequency,
    idf = Σ member idfs) over the positions sidecar — beyond the reference,
    whose index stores no positions (index.py:52)."""
    idx = _ensure_pos_index(spark, sf_dir)
    q = f'"{" ".join(PHRASE_WORDS)}" {PHRASE_EXTRA}'
    res = search_texts(spark, idx, [("q1", q)], RetrieveConfig(k=K),
                       text_cfg=RAW_TEXT, mode="boolean")
    return _as_result(res)


SLOP = 3


def q_sloppy_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sloppy proximity phrase (round 5): '"data stream"~3' — ordered
    anchored-greedy proximity over the positions sidecar (semantics and
    Lucene SloppyPhraseScorer departures documented at
    queryparse.Clause.slop). tf = matching anchors, idf = Σ member idfs,
    same BM25 plumbing as exact phrases; the oracle replays the greedy
    chain as correlated min() subqueries."""
    idx = _ensure_pos_index(spark, sf_dir)
    q = f'"{" ".join(PHRASE_WORDS)}"~{SLOP}'
    res = search_texts(spark, idx, [("q1", q)], RetrieveConfig(k=K),
                       text_cfg=RAW_TEXT, mode="boolean")
    return _as_result(res)


SPANFIRST_TERM, SPANFIRST_END, SPANFIRST_EXTRA = "data", 8, "stream"


def q_span_first_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene SpanFirstQuery (new r5): 'data' matching only within each
    document's first 8 tokens (lede/title-ish matching without a separate
    field) plus an unconstrained 'stream' term. The span clause rewrites to
    a positional pseudo-term — tf = qualifying occurrences, BM25 idf = the
    wrapped term's full-df idf (SpanWeight semantics) — and scores through
    the unchanged kernel (operators/retrieve.py _rewrite_spanfirst_plans)."""
    from patapsco_spark.operators.queryparse import span_first_plan
    idx = _ensure_pos_index(spark, sf_dir)
    plan = span_first_plan("q1", [(SPANFIRST_TERM, SPANFIRST_END)],
                           extra_terms=[SPANFIRST_EXTRA])
    res = search(spark, idx, [plan], RetrieveConfig(k=K))
    return _as_result(res)


def q_alias_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index alias resolution (new r5, plans/aliases.py — the ES
    zero-downtime reindex idiom): the query addresses a NAME, the atomic
    JSON registry resolves it to the concrete index, and scoring is
    byte-identical to addressing the index directly — the oracle is the
    plain BM25 replay, which only holds if the alias layer adds nothing
    to the scoring path. Swap atomicity + CAS cutover are pinned in
    tests/test_aliases.py."""
    from patapsco_spark.plans import aliases
    idx = _ensure_index(spark, sf_dir)
    reg = os.path.dirname(idx.rstrip("/"))
    aliases.set_alias(reg, "entry-prod", idx)
    res = search_texts(spark, aliases.resolve_alias(reg, "entry-prod"),
                       [("q1", BM25_QUERY)], RetrieveConfig(k=K),
                       text_cfg=RAW_TEXT)
    return _as_result(res)


NEAR_A, NEAR_B, NEAR_SLOP = "stream", "data", 2


def q_span_near_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered proximity (new r5): 'stream NEAR/2 data' in either order
    (Lucene SpanNearQuery(inOrder=false); the ordered variant is the
    sloppy-phrase syntax). tf = anchored count (first word's occurrences
    with any second-word occurrence within the window — departure from
    Lucene's minimal-interval counting documented at
    queryparse.Clause.near), idf = Σ member idfs like phrases."""
    from patapsco_spark.operators.queryparse import span_near_plan
    idx = _ensure_pos_index(spark, sf_dir)
    plan = span_near_plan("q1", [(NEAR_A, NEAR_B, NEAR_SLOP)])
    res = search(spark, idx, [plan], RetrieveConfig(k=K))
    return _as_result(res)


SPANNOT_A, SPANNOT_B, SPANNOT_SLOP = "data", "window", 2


def q_span_not_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SpanNotQuery (new r5): 'data' occurrences NOT within 2 intervening
    tokens of 'window' in either direction — exclusion shapes tf, never
    the weight (idf = the include term's alone; a doc with no 'window'
    keeps every occurrence). Semantics at queryparse.Clause.near_not."""
    from patapsco_spark.operators.queryparse import span_not_plan
    idx = _ensure_pos_index(spark, sf_dir)
    plan = span_not_plan("q1", [(SPANNOT_A, SPANNOT_B, SPANNOT_SLOP)])
    res = search(spark, idx, [plan], RetrieveConfig(k=K))
    return _as_result(res)


INTV_A, INTV_B, INTV_GAPS, INTV_NOT = "data", "stream", 3, "window"


def q_intervals_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene IntervalQuery (new r5 s5): ordered minimal intervals —
    'data' followed by 'stream' with ≤3 intervening tokens
    (Intervals.maxgaps(3, Intervals.ordered)), discarding intervals that
    contain 'window' (Intervals.notContaining). tf = MINIMAL interval
    count (q = first 'stream' after each 'data', no other 'data' between
    — Clarke/Cormack/Burkowski algebra, the exact count the engine's
    anchored sloppy phrases depart from), idf = Σ ordered-member idfs;
    the exclusion shapes tf only. Semantics: queryparse.Clause.gaps. The
    oracle replays the minimal-interval predicate as correlated
    subqueries over token positions."""
    from patapsco_spark.operators.queryparse import interval_plan
    idx = _ensure_pos_index(spark, sf_dir)
    plan = interval_plan("q1", [(INTV_A, INTV_B, INTV_GAPS, INTV_NOT)])
    res = search(spark, idx, [plan], RetrieveConfig(k=K))
    return _as_result(res)


INTV_CHAIN, INTV_CHAIN_GAPS = ["data", "query", "window"], 6


def q_intervals_chain_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """n-term ordered interval chain (new r5 s5; Lucene
    Intervals.maxgaps(6, Intervals.ordered(data, query, window))): the
    greedy earliest-after chain from each 'data', minimal-interval
    counting (a later start reaching the same chain end supersedes), a
    TOTAL gap budget across all links. Exercises the n>2 generalization
    of intervals_bm25's pair kernel. The oracle replays the chain as
    nested correlated min() subqueries and the minimality test as a
    self-anti-join of chain ends."""
    from patapsco_spark.operators.queryparse import interval_plan
    idx = _ensure_pos_index(spark, sf_dir)
    plan = interval_plan("q1", [(INTV_CHAIN, INTV_CHAIN_GAPS)])
    res = search(spark, idx, [plan], RetrieveConfig(k=K))
    return _as_result(res)


PP_WORDS, PP_PREFIX = ["data"], "str"


def q_phrase_prefix_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES match_phrase_prefix (new r5): 'data str…' — the fixed word in
    sequence with ANY dictionary term starting with 'str' at the next
    position (search-as-you-type over body text). The prefix expands
    against the term dictionary in term order (capped like Lucene's
    setMaxExpansions), the anchor count scores as a positional pseudo-term
    with idf = Σ fixed idfs + one SynonymQuery-style idf for the expansion
    set (df = max member df; departure from Lucene's Σ-over-expansions
    documented at queryparse.Clause.pprefix). The oracle replays the
    expansion, the anchor join, and the exact fold."""
    from patapsco_spark.operators.queryparse import phrase_prefix_plan
    idx = _ensure_pos_index(spark, sf_dir)
    plan = phrase_prefix_plan("q1", PP_WORDS, PP_PREFIX)
    res = search(spark, idx, [plan], RetrieveConfig(k=K))
    return _as_result(res)


def q_phrase_qld(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional phrase under QLD/LMDirichlet (exceeds the reference, which
    always degrades): the phrase pseudo-term scores through the standard
    formula with tf = phrase frequency and cf = corpus phrase frequency."""
    idx = _ensure_pos_index(spark, sf_dir)
    q = f'"{" ".join(PHRASE_WORDS)}" {PHRASE_EXTRA}'
    res = search_texts(spark, idx, [("q1", q)],
                       RetrieveConfig(name="qld", k=K),
                       text_cfg=RAW_TEXT, mode="boolean")
    return _as_result(res)


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    out = textstats.token_counts(docs)
    return out.select("doc_id",
                      F.col("n_tokens").cast("long"),
                      F.col("n_distinct").cast("long"),
                      F.col("n_chars").cast("long"))


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    out = textstats.quality_scores(docs)
    return out.select("doc_id", F.col("n_tokens").cast("long"),
                      "mean_word_len", "stopword_ratio", "alpha_ratio",
                      "distinct_ratio", F.round("quality", 6).alias("quality"))


def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return textstats.language_id(docs)


def q_bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-2 pre-tokenizer piece counts (round 5): the LLM-budget token
    estimate next to whitespace words, RE2-compatible pattern so the
    DuckDB oracle replays the identical regex (cross-engine agreement
    probed on apostrophes, CJK, runs of spaces)."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return textstats.bpe_token_counts(docs)


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level line dedup (round 5): RefinedWeb/Falcon-style boilerplate
    removal. The flat documents table has no newlines, so deterministic
    site chrome is injected by doc_id arithmetic (cookie banner on every
    3rd doc, footer on every 2nd) — the oracle replays the same injection
    literally; the operator must strip exactly those lines (each appears in
    ~n/3 and ~n/2 docs ≫ min_docs=50) and keep every original text line."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    injected = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.when(F.col("doc_id") % 3 == 0,
                   F.lit("COOKIE NOTICE: this site uses cookies")),
            F.col("text"),
            F.when(F.col("doc_id") % 2 == 0,
                   F.lit("Copyright 2026 Example Corp"))).alias("text"))
    return dedup.line_dedup(injected, min_docs=50)


def q_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr duplicated-substring removal (Lee et al. 2021, round 5):
    any 40-char span occurring verbatim >= 2 times corpus-wide is cut from
    every occurrence. A deterministic 52-char boilerplate tail is appended
    to every 7th doc so the hot-gram set is guaranteed non-empty at any SF;
    natural repeats in the synthetic text are removed identically by the
    Spark plan and the DuckDB oracle, so the injection only ensures the
    operator is exercised, not what it may match."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    injected = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.col("text"), F.lit(SUBSTR_BOILERPLATE)))
        .otherwise(F.col("text")).alias("text"))
    return dedup.substring_dedup(injected, k=40, min_count=2)


SUBSTR_BOILERPLATE = " SUBSCRIBE TO OUR NEWSLETTER FOR DAILY UPDATES NOW"

CLEAN_DUP_BODY = "shared landing page body with enough distinct tokens"


def q_clean_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composed corpus-cleaning recipe (round 5): line dedup → exact dedup
    → quality filter, reporting the per-stage survivor funnel. The
    injection makes every stage bite deterministically: cookie/footer
    chrome by doc_id arithmetic (removed by line dedup), and every 29th doc
    replaced by one shared body (sparse enough to stay under the hot-line
    threshold, so it reaches the dedup stage instead of being eaten as
    boilerplate) — duplicates HIDDEN by differing chrome
    that only become byte-identical after boilerplate removal, the classic
    real-web ordering dependence this recipe exists to handle."""
    from patapsco_spark.operators import recipes
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    injected = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.when(F.col("doc_id") % 3 == 0,
                   F.lit("COOKIE NOTICE: this site uses cookies")),
            F.when(F.col("doc_id") % 29 == 0,
                   F.lit(CLEAN_DUP_BODY)).otherwise(F.col("text")),
            F.when(F.col("doc_id") % 2 == 0,
                   F.lit("Copyright 2026 Example Corp"))).alias("text"))
    return recipes.clean_corpus_funnel(
        injected, line_min_docs=50, min_tokens=5, min_distinct_ratio=0.4)


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style PII redaction (round 5): emails/IPv4/intl-phone counted and
    replaced in a fixed order. PII is injected deterministically by doc_id
    arithmetic (the flat corpus has none) and the oracle replays injection
    + the identical RE2-compatible patterns + the same replace order."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    injected = docs.select(
        "doc_id",
        F.concat_ws(
            " ", F.col("text"),
            F.when(F.col("doc_id") % 4 == 0,
                   F.concat(F.lit("contact bob"), F.col("doc_id"),
                            F.lit("@example.com now"))),
            F.when(F.col("doc_id") % 5 == 0,
                   F.concat(F.lit("server 10.0."), F.col("doc_id") % 256,
                            F.lit(".1 up"))),
            F.when(F.col("doc_id") % 6 == 0,
                   F.lit("call +1 555 0199 today"))).alias("text"))
    return textstats.pii_scrub(injected)


def q_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText quality rule battery (round 5, late): per-doc
    booleans for the published A1.1 filters. The flat corpus has no lines
    or symbols, so bullet/ellipsis/symbol structure is injected by doc_id
    arithmetic (bullet header on every 5th doc, trailing-... teaser on
    every 7th, # spam on every 11th); the oracle replays the injection
    and the identical rule expressions."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    injected = docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.when(F.col("doc_id") % 5 == 0, F.lit("- top stories")),
            F.when(F.col("doc_id") % 11 == 0,
                   F.concat(F.lit("### trending #tags "), F.col("text")))
             .otherwise(F.col("text")),
            F.when(F.col("doc_id") % 7 == 0,
                   F.lit("read the full story..."))).alias("text"))
    return textstats.gopher_rules(injected)


def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR hashed-bigram importance log-weights (round 5, late): score
    every doc against a deterministic target slice (doc_id % 7 == 0 — a
    stand-in for 'wiki-like' curation targets). Bucketing uses the same
    engine-portable md5-prefix hash as the indexer, so the DuckDB oracle
    replays bucket counts exactly; the per-doc sum of per-bucket doubles
    is rounded to 6 places on both sides."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    target = docs.where(F.col("doc_id") % 7 == 0)
    return textstats.dsir_logweights(docs, target)


def q_ulm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-self unigram-LM perplexity per doc (round 5): the CCNet-style
    LM quality filter shape with a dependency-free LM. Exact SQL replay —
    the LM is the corpus's own term counts, so DuckDB recomputes it
    identically."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return textstats.ulm_perplexity(docs)


SB_LM_HEX = tuple("01234567")  # md5('lm-'||id)[0] → LM trained on ~half


def q_sb_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid-backoff trigram LM perplexity (Brants et al. 2007), CCNet
    filter shape: the LM counts come from a deterministic ~half of the
    corpus and EVERY doc is scored under them, so the held-out half
    genuinely exercises the backoff chain (trigram → alpha·bigram →
    alpha²·unigram, OOV hapax floor, doc-head positions at their own order
    unpenalized). The oracle replays the whole chain in SQL from the same
    split, so a wrong backoff weight, a missed doc-head case, OOV
    mishandling, or context/continuation count confusion all
    hash-mismatch."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    lm = docs.where(
        F.substring(F.md5(F.concat(F.lit("lm-"),
                                   F.col("doc_id").cast("string"))), 1, 1)
        .isin(*SB_LM_HEX))
    return textstats.sb_perplexity(docs, lm_docs=lm)


def q_language_id_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """9-language heuristic language ID (round 5): script detection +
    per-language stopword occurrence rates over the shipped Lucene lists
    (textstats.language_id_multi). The oracle embeds the same lists as IN
    literals and replays the same CASE order."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return textstats.language_id_multi(docs)


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return textstats.fingerprints(docs, shingle=5)


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (top-bigram coverage,
    duplicate-trigram fraction) — the boilerplate/spam filters of
    web-scale training-data pipelines."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return textstats.repetition_stats(docs).select(
        "doc_id", F.col("n_tokens").cast("long").alias("n_tokens"),
        "top_bigram", "top_bigram_frac", "dup_trigram_frac")


def q_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level top-100 bigrams (contamination/boilerplate lists)."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return textstats.top_ngrams(docs, n=2, k=100)


APPROX_TERMS_SIZE, APPROX_TERMS_SHARD_SIZE, APPROX_TERMS_SHARDS = 20, 25, 8


def q_approx_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES terms aggregation as it actually runs distributed (new r5,
    aggs.approx_top_terms): every md5-routed shard reports only its local
    top shard_size terms, partial counts sum, and each bucket carries
    doc_count_error_upper_bound — Σ cutoff over the shards that did NOT
    report it (the documented ES estimation contract). shard_size=25 over
    8 shards is deliberately tight so the bounds are non-trivial at test
    scale; the oracle replays the whole estimation, bounds included."""
    from pyspark.sql import Window

    from patapsco_spark.operators.aggs import approx_top_terms
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    items = (docs.select("doc_id",
                         F.explode(F.split("text", " ")).alias("term"))
             .where(F.col("term") != "").distinct())
    out = approx_top_terms(items, "term", size=APPROX_TERMS_SIZE,
                           shard_size=APPROX_TERMS_SHARD_SIZE,
                           n_shards=APPROX_TERMS_SHARDS, id_col="doc_id")
    w = Window.orderBy(F.desc("doc_count"), F.asc("term"))
    return out.withColumn("rnk", (F.row_number().over(w) - 1).cast("long"))


COMPOSITE_AFTER, COMPOSITE_SIZE = ("en", "src15"), 15


def q_composite_page(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES composite aggregation page (new r5, aggs.composite_buckets):
    (lang, source) buckets in key order, resuming strictly after
    ('en','src15') — the after-cursor compiles to one lexicographic
    predicate PUSHED BELOW the groupBy, so later pages skip earlier
    buckets' data at the scan when the table is laid out by the leading
    key. doc_count + avg chars per bucket."""
    from patapsco_spark.operators.aggs import composite_buckets
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    out = composite_buckets(
        docs, ["lang", "source"], size=COMPOSITE_SIZE,
        after=COMPOSITE_AFTER,
        metrics={"avg_chars": F.round(F.avg("n_chars"), 6)})
    return out.select("lang", "source",
                      F.col("doc_count").cast("long"), "avg_chars")


def q_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test n-gram decontamination (textstats.ngram_contamination,
    the GPT-3/Gopher 13-gram protocol at n=3 for this corpus's short docs):
    eval set = docs with doc_id % 97 == 0; per remaining doc, distinct
    3-grams, how many appear in the eval set, and the contamination
    ratio. Eval grams broadcast; corpus side is one narrow explode +
    map-side-combinable agg."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    ev = docs.where(F.col("doc_id") % 97 == 0)
    corpus = docs.where(F.col("doc_id") % 97 != 0)
    out = textstats.ngram_contamination(corpus, ev, n=3)
    return out.select(F.col("doc_id").cast("long").alias("doc_id"),
                      "n_grams", "n_hit", "contamination")


def q_url_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Web-ingestion URL operators (operators/weburl.py): deterministic
    messy URLs derived from doc_id (mixed case, default port, fragments,
    tracking params, permuted params, trailing slashes) → canonicalize →
    per-registered-domain rollup (pages, distinct canonicals, dup rate).
    The oracle replays every canonicalization rule in DuckDB SQL."""
    from patapsco_spark.operators.weburl import domain_stats

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    m3 = F.col("doc_id") % 3
    url = F.concat(
        F.lit("HTTP://WWW.Site"), (F.col("doc_id") % 7).cast("string"),
        F.lit(".COM:80/p/"), (F.col("doc_id") % 50).cast("string"),
        F.when(m3 == 0, F.lit("/?utm_source=feed&b=2&a=1"))
         .when(m3 == 1, F.lit("?a=1&utm_campaign=x&b=2#frag"))
         .otherwise(F.lit("/")))
    out = domain_stats(docs.select(url.alias("url")))
    return out.select("domain", "n_pages", "n_canonical", "dup_rate")


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    # report every hash group (the >1 filter may legitimately be empty on
    # synthetic data; group counts give a stronger correctness signal)
    return (docs.select(F.md5("text").alias("text_hash"), "doc_id")
            .groupBy("text_hash")
            .agg(F.count("*").alias("n_dups"),
                 F.min("doc_id").alias("canonical_id")))


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return dedup.minhash_signatures(docs, num_hashes=4).select(
        "doc_id", F.col("seed").cast("long").alias("seed"), "minhash")


def q_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # 3-word shingles: unigram sets don't discriminate on a small-vocab
    # corpus (every pair would match), and shingling is what web-scale
    # near-dup pipelines hash anyway
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return dedup.token_jaccard_pairs(docs, threshold=0.5, shingle=3)


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-chunk sequence packing (round 5): each doc's
    window assignment in the packed token stream at seq_len=512, laid out
    in doc_id order with a 1-token separator. The engine computes the
    global prefix sum scale-safely (range partitions + per-partition
    totals + broadcast bases, operators/packing.py); the oracle is the
    single-window SQL SUM OVER ORDER BY it must equal exactly."""
    from patapsco_spark.operators.packing import pack_sequences
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return pack_sequences(docs, seq_len=512)


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic training-mix sampling (round 5): per-language keep
    rates via portable md5-prefix thresholds (operators/sampling.py) —
    reproducible across runs, engines, and partitionings, unlike
    DataFrame.sample. Oracle replays the same CASE'd hex comparison."""
    from patapsco_spark.operators.sampling import stratified_sample
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    out = stratified_sample(docs, "lang",
                            {"en": 0.5, "zh": 0.2, "es": 0.2},
                            key_col="doc_id", salt="s0",
                            default_fraction=0.1)
    return out.select("doc_id", "lang")


TEMP_ALPHA, TEMP_BUDGET_SHARE = 0.5, 0.4


def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled language mixing (new r5; the mBERT/XLM-R/mT5
    exponentiated-sampling recipe p_s ∝ (n_s/N)^α): α=0.5 upsamples rare
    languages vs proportional draw, budget 40% of the corpus, md5-prefix
    selection. Returns per-language kept counts; the oracle recomputes
    counts → α-weights → sorted-order normalizer → capped fractions →
    the same hex-threshold comparison, entirely in SQL."""
    from patapsco_spark.operators.sampling import temperature_sample

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    budget = int(TEMP_BUDGET_SHARE * docs.count())
    out = temperature_sample(docs, "lang", "doc_id", alpha=TEMP_ALPHA,
                             budget_rows=budget, salt="t0")
    return (out.groupBy("lang").agg(F.count("*").cast("long").alias("kept"))
            .orderBy("lang"))


XDECON_T, XDECON_MOD = 0.8, 7


def q_cross_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy cross-corpus decontamination (new r5; the MinHash complement
    of the exact 13-gram probe, per GPT-3 appx C / The Pile / FineWeb):
    eval set = every 7th doc with its first token dropped (a
    lightly-edited benchmark copy that exact n-gram matching at large n
    can miss), candidates only inside cross-side LSH buckets, exact
    Jaccard verification ≥ 0.8. Oracle replays both corpora's shingles,
    banding, the side-asymmetric bucket join, and the verification."""
    from patapsco_spark.operators.dedup import cross_decontamination

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    toks = F.filter(F.split(F.trim(F.col("text")), r"\s+"),
                    lambda t: t != "")
    eval_docs = (docs.where(F.col("doc_id") % XDECON_MOD == 0)
                 .select("doc_id",
                         F.array_join(
                             F.slice(toks, 2,
                                     F.greatest(F.size(toks) - 1,
                                                F.lit(0))), " ")
                         .alias("text")))
    out = cross_decontamination(docs, eval_docs, threshold=XDECON_T,
                                num_hashes=16, bands=4, shingle=3)
    return (out.select(F.col("train_id").cast("long").alias("train_id"),
                       F.col("eval_id").cast("long").alias("eval_id"),
                       "jaccard")
            .orderBy("train_id", "eval_id"))


NB_LABEL_CHARS = 300
NB_TRAIN_HEXES = tuple("01234567")


def q_nb_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial-NB quality classifier (new r5; fastText/CCNet
    baseline): train unigram class counts on an md5-half split with a
    weak length label (n_chars ≥ 300), Laplace smoothing, score the
    held-out half with positive-class log-odds. The oracle recomputes
    the split, counts, smoothed log-ratios, OOV constant, and the
    term-ordered fold entirely in SQL."""
    from patapsco_spark.operators.textstats import nb_classifier_scores

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    label = F.col("n_chars") >= NB_LABEL_CHARS
    train = F.substring(
        F.md5(F.concat(F.lit("nb:"), F.col("doc_id").cast("string"))),
        1, 1).isin(list(NB_TRAIN_HEXES))
    out = nb_classifier_scores(docs, label, train)
    return (out.select(F.col("doc_id").cast("long").alias("doc_id"),
                       F.round("log_odds", 5).alias("log_odds"))
            .orderBy("doc_id"))


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster RESOLUTION (round 5): connected components over the
    exact-Jaccard pair frame, min-id representative per cluster — the step
    that turns pairwise output into a keep-one dedup decision (A~B and B~C
    collapse into one cluster even when A~C was never emitted). Oracle
    replays the pair SQL and closes it transitively with a recursive CTE."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    pairs = dedup.token_jaccard_pairs(docs, threshold=0.5, shingle=3)
    return dedup.dedup_clusters(pairs)


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-LSH near-dup pairs, exact-Jaccard-verified. Fully oracled:
    every hash in the chain is md5 (engine-portable), so DuckDB reproduces
    the minhashes, band buckets, candidate join, and verification exactly."""
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return dedup.near_duplicates_minhash(docs, threshold=0.5, shingle=3)


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return dedup.simhash64(docs)


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    out = ann.cosine_topk(emb.where(F.col("vec_id") != 0), list(qvec), k=10)
    return out.select(F.col("vec_id").cast("long"), "cosine")


def q_ann_sq8_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k over the int8 scalar-quantized store (round 5): per-vector
    symmetric scale, dequantize-and-score against the full-precision query
    (IVFADC's asymmetric-distance shape). The oracle replays quantize →
    dequantize → cosine exactly — round() ties break away from zero in
    both engines."""
    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    out = ann.sq8_topk(emb.where(F.col("vec_id") != 0), list(qvec), k=10)
    return out.select(F.col("vec_id").cast("long"), "cosine")


def q_ann_batch_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched exact ANN: top-5 per query for a broadcast batch of query
    vectors (vec_id 0-2) against the rest — the many-queries shape of
    embedding retrieval (one scan, per-query window top-k)."""
    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    queries = (emb.where(F.col("vec_id") < 3)
               .select(F.col("vec_id").alias("qid"),
                       F.col("embedding").alias("qvec")))
    out = ann.cosine_topk_many(emb.where(F.col("vec_id") >= 3), queries, k=5)
    return out.select(F.col("qid").cast("long"), F.col("vec_id").cast("long"),
                      F.col("rank").cast("long").alias("rnk"), "cosine")


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # approximate w.r.t. brute force (recall pinned in pytest), but fully
    # deterministic w.r.t. the algorithm — the oracle replays the seeded
    # hyperplanes, bucket signatures and Hamming<=1 probe in SQL
    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    out = ann.lsh_cosine_topk(emb.where(F.col("vec_id") != 0), list(qvec), k=10)
    return out.select(F.col("vec_id").cast("long"), "cosine")


def q_html_extract_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-identity invariant for the HTML→text extractor: render each
    document's text into a full html page, extract it back, emit
    (doc_id, n_chars, md5). The oracle computes the same directly from
    ``text`` — any extraction byte-drift breaks the md5 match."""
    from patapsco_spark.sources.webpages import extract_text_series, render_html_series

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet").select("doc_id", "text")

    def roundtrip(batches):
        import pandas as pd
        for pdf in batches:
            html = render_html_series(pdf["text"])
            yield pd.DataFrame({"doc_id": pdf["doc_id"],
                                "extracted": extract_text_series(html)})

    out = docs.mapInPandas(roundtrip, schema="doc_id long, extracted string")
    return out.select("doc_id", F.length("extracted").alias("n_chars"),
                      F.md5("extracted").alias("text_md5"))


WEBPAGES_N = 300
WEBPAGES_QUERIES = [("q1", "crawl web index"), ("q2", "stream window")]

WARC_N, WARC_FILES = 240, 4

def _stage_key(extra: str, *fns) -> str:
    """Cache key for driver-side staged fixtures: md5 over the generating
    functions' SOURCE plus every layout constant in ``extra`` — changing
    either the code or the constants rebuilds instead of silently reusing
    stale data."""
    import inspect

    src = "".join(inspect.getsource(f) for f in fns) + "|" + extra
    return hashlib.md5(src.encode()).hexdigest()[:10]


def _stage_warc_shards() -> str:
    """Synthesize WARC_FILES .warc.gz crawl shards (one gzip member per
    record, Common-Crawl layout) from the deterministic page corpus,
    driver-side, cached like _stage_webpages_oracle: keyed by an md5 of the
    generating functions' source so a serializer/synthesis change rebuilds
    instead of silently reusing stale shards; staged to tmp + atomic rename
    (the loser of a concurrent race just discards its copy)."""
    import shutil

    import numpy as np

    from patapsco_spark.sources import warc as _warc
    from patapsco_spark.sources.webpages import _synth_batch

    key = _stage_key(f"{WARC_N}/{WARC_FILES}", _warc.records_to_warc_bytes,
                     _warc.record_bytes, _synth_batch)
    d = os.path.join(tempfile.gettempdir(), f"pspark_warc_{WARC_N}_{key}")
    if not os.path.exists(os.path.join(d, "_STAGED")):
        tmp = f"{d}.tmp-{os.getpid()}"
        os.makedirs(tmp, exist_ok=True)
        per = WARC_N // WARC_FILES
        for i in range(WARC_FILES):
            pdf = _synth_batch(np.arange(i * per, (i + 1) * per))
            with open(os.path.join(tmp, f"shard-{i:05d}.warc.gz"),
                      "wb") as f:
                f.write(_warc.records_to_warc_bytes(pdf))
        open(os.path.join(tmp, "_STAGED"), "w").close()
        try:
            os.rename(tmp, d)
        except OSError:  # concurrent stager won the rename
            shutil.rmtree(tmp, ignore_errors=True)
    return d


def q_warc_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed crawl-format ingestion: .warc.gz shards → streamed record
    parse → HTTP-200/html filter → byte-identity text extraction. Emits
    (url, warc_iso, n_bytes, text_md5); the oracle recomputes all four
    driver-side from the same deterministic corpus WITHOUT the WARC layer,
    so any framing/decode/extraction drift in the distributed path breaks
    the match."""
    from patapsco_spark.sources.warc import read_warc, warc_to_pages

    d = _stage_warc_shards()
    pages = warc_to_pages(read_warc(spark, os.path.join(d, "*.warc.gz")))
    return pages.select(
        "url",
        F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss").alias("warc_iso"),
        F.length("html").cast("long").alias("n_bytes"),
        F.md5("text").alias("text_md5"))


LINK_N, LINK_MAXDEG, PR_ITERS, PR_DAMP = 200, 4, 5, 0.85


def _link_pages(spark: SparkSession) -> DataFrame:
    """LINK_N synthesized pages with deterministic md5-derived <a> anchors
    injected before </body>: page i gets deg_i = hex(md5('deg-i')[:2]) %
    LINK_MAXDEG links, the k-th targeting page hex(md5('link-i-k')[:8]) %
    LINK_N; md5 bytes 9-10 of the same hash pick a rel attribute (%5==0 →
    rel="nofollow noopener", dropped from the graph; %5==1 → noopener,
    kept). Every quantity is DuckDB-replayable (md5 over the same
    strings), so the oracle rebuilds the edge set without parsing html."""
    from patapsco_spark.sources.webpages import synthesize_pages

    pages = synthesize_pages(spark, LINK_N, partitions=8)

    def inject(batches):
        import hashlib

        import pandas as pd

        def page_url(j: int) -> str:
            return (f"https://example.org/"
                    f"{hashlib.md5(f'page-{j}'.encode()).hexdigest()[:8]}/{j}")

        def rel_attr(h: str) -> str:
            # md5 bytes 9-10 of the link hash drive the rel attribute:
            # %5==0 → nofollow (multi-token, DROPPED from the graph),
            # %5==1 → noopener (kept — rel-aware ≠ rel-phobic), else none
            sel = int(h[8:10], 16) % 5
            if sel == 0:
                return ' rel="nofollow noopener"'
            return ' rel="noopener"' if sel == 1 else ""

        for pdf in batches:
            out_html = []
            for url, blob in zip(pdf["url"], pdf["html"]):
                i = int(url.rsplit("/", 1)[1])
                deg = int(hashlib.md5(f"deg-{i}".encode())
                          .hexdigest()[:2], 16) % LINK_MAXDEG
                hashes = [hashlib.md5(f"link-{i}-{k}".encode()).hexdigest()
                          for k in range(deg)]
                anchors = "".join(
                    f'<a href="{page_url(int(h[:8], 16) % LINK_N)}"'
                    f'{rel_attr(h)}>l{k}</a>'
                    for k, h in enumerate(hashes))
                html = bytes(blob).decode("utf-8")
                out_html.append(
                    html.replace("</body>", anchors + "</body>")
                    .encode("utf-8"))
            yield pd.DataFrame({"url": pdf["url"], "html": out_html})

    return pages.select("url", "html").mapInPandas(
        inject, schema="url string, html binary")


def q_link_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor extraction → distinct (src, dst) edges over the injected-link
    corpus. The oracle derives the same edges from the md5 link rule alone
    — any extraction/resolution drift breaks the match."""
    from patapsco_spark.operators.linkgraph import link_edges

    return link_edges(_link_pages(spark))


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PR_ITERS damped PageRank iterations over the injected-link graph,
    all LINK_N pages as the vertex set (isolated pages hold rank). Ranks
    rounded to 7dp to absorb float summation order across engines; the
    oracle unrolls the same iterations as SQL CTEs."""
    from patapsco_spark.operators.linkgraph import link_edges, pagerank

    pages = _link_pages(spark)
    edges = link_edges(pages)
    # coverage is guaranteed by construction (targets are pages), so skip
    # the defensive endpoint anti-join — it would cost ~an extra iteration
    ranks = pagerank(edges, nodes=pages.select("url"),
                     iterations=PR_ITERS, damping=PR_DAMP,
                     validate_nodes=False)
    return ranks.select("node", F.round("rank", 7).alias("rank"))


HITS_ITERS = 5


def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities (new r5; Kleinberg 1999) over the injected
    link graph: HITS_ITERS power iterations with L2 normalization each
    half step, all pages as the vertex set. 7dp rounding absorbs float
    summation order, like pagerank; the oracle unrolls the same
    iterations as SQL CTEs."""
    from patapsco_spark.operators.linkgraph import hits, link_edges

    pages = _link_pages(spark)
    edges = link_edges(pages)
    out = hits(edges, nodes=pages.select("url"), iterations=HITS_ITERS,
               validate_nodes=False)
    return out.select("node", F.round("auth", 7).alias("auth"),
                      F.round("hub", 7).alias("hub"))


PMI_K, PMI_MIN = 50, 5


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PMI collocations (new r5; the word2phrase phrase-mining
    primitive): top-50 adjacent token pairs by pointwise mutual
    information, pair count floored at 5 to kill hapax noise. Oracle
    replays token/pair counts and the exact PMI expression."""
    from patapsco_spark.operators.textstats import pmi_collocations

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    out = pmi_collocations(docs, k=PMI_K, min_count=PMI_MIN)
    return out.select("w1", "w2", "pair_count",
                      F.round("pmi", 6).alias("pmi"))


def _link_edges_sql() -> str:
    """The md5 link rule as DuckDB SQL (edge set only — no html)."""
    return f"""
idx AS (SELECT unnest(range(0, {LINK_N})) AS i),
urls AS (
  SELECT i, 'https://example.org/' || substr(md5('page-' || i), 1, 8)
            || '/' || i AS url
  FROM idx
),
deg AS (
  SELECT i, ('0x' || substr(md5('deg-' || i), 1, 2))::BIGINT
            % {LINK_MAXDEG} AS d
  FROM idx
),
tgt AS (
  SELECT deg.i,
         ('0x' || substr(md5('link-' || deg.i || '-' || k.k), 1, 8))::BIGINT
         % {LINK_N} AS j,
         ('0x' || substr(md5('link-' || deg.i || '-' || k.k), 9, 2))::BIGINT
         % 5 AS rel5
  FROM deg JOIN (SELECT unnest(range(0, {LINK_MAXDEG - 1})) AS k) k
       ON k.k < deg.d
),
edges AS (
  SELECT DISTINCT us.url AS src, ut.url AS dst
  FROM tgt JOIN urls us ON us.i = tgt.i
           JOIN urls ut ON ut.i = tgt.j
  WHERE tgt.i <> tgt.j AND tgt.rel5 <> 0
)"""


def _pagerank_sql() -> str:
    """PR_ITERS PageRank iterations unrolled as CTEs (same semantics as
    operators.linkgraph.pagerank: damped, uniform dangling redistribution,
    vertex set = all LINK_N pages)."""
    n, d = LINK_N, PR_DAMP
    parts = [_link_edges_sql().lstrip(), f"""
nodes AS (SELECT url AS node FROM urls),
outdeg AS (SELECT src AS node, count(*)::DOUBLE AS od
           FROM edges GROUP BY src),
r0 AS (SELECT node, 1.0/{n} AS rank FROM nodes)"""]
    for it in range(1, PR_ITERS + 1):
        p = f"r{it - 1}"
        parts.append(f"""
c{it} AS (
  SELECT e.dst AS node, sum(r.rank / o.od) AS s
  FROM {p} r JOIN outdeg o ON o.node = r.node
             JOIN edges e ON e.src = r.node
  GROUP BY e.dst
),
d{it} AS (
  SELECT COALESCE(sum(r.rank), 0) AS dang
  FROM {p} r LEFT JOIN outdeg o ON o.node = r.node
  WHERE o.node IS NULL
),
r{it} AS (
  SELECT n.node,
         {(1 - d) / n} + {d} * (COALESCE(c.s, 0)
                                + (SELECT dang FROM d{it}) / {n}) AS rank
  FROM nodes n LEFT JOIN c{it} c ON c.node = n.node
)""")
    return ("WITH " + ",".join(parts) +
            f"\nSELECT node, round(rank, 7) AS rank FROM r{PR_ITERS}")


def _hits_sql() -> str:
    """HITS_ITERS power iterations unrolled as CTEs (same semantics as
    operators.linkgraph.hits: L2 normalization each half step, all pages
    as the vertex set, 0.0 for nodes the norm can't reach)."""
    parts = [_link_edges_sql().lstrip(), """
nodes AS (SELECT url AS node FROM urls),
h0 AS (SELECT node, 1.0 AS hub FROM nodes)"""]
    # deferred normalization like the engine (ONE final L2 per vector);
    # MATERIALIZED: each iteration is referenced twice (next half step +
    # final), and inlined CTE re-expansion grows exponentially with
    # iteration count (the first, per-step-normalized version of this
    # oracle never finished at 5 iterations without it)
    for it in range(1, HITS_ITERS + 1):
        p = f"h{it - 1}"
        parts.append(f"""
ar{it} AS MATERIALIZED (
  SELECT e.dst AS node, sum(h.hub) AS s
  FROM {p} h JOIN edges e ON e.src = h.node GROUP BY e.dst
),
a{it} AS MATERIALIZED (
  SELECT n.node, COALESCE(r.s, 0.0) AS auth
  FROM nodes n LEFT JOIN ar{it} r USING (node)
),
hr{it} AS MATERIALIZED (
  SELECT e.src AS node, sum(a.auth) AS s
  FROM a{it} a JOIN edges e ON e.dst = a.node GROUP BY e.src
),
h{it} AS MATERIALIZED (
  SELECT n.node, COALESCE(r.s, 0.0) AS hub
  FROM nodes n LEFT JOIN hr{it} r USING (node)
)""")
    n = HITS_ITERS
    parts.append(f"""
an AS (SELECT sqrt(sum(auth * auth)) AS anrm FROM a{n}),
hn AS (SELECT sqrt(sum(hub * hub)) AS hnrm FROM h{n})""")
    return ("WITH " + ",".join(parts) + f"""
SELECT n.node,
       round(CASE WHEN an.anrm > 0
                  THEN COALESCE(a.auth, 0.0) / an.anrm
                  ELSE 0.0 END, 7) AS auth,
       round(CASE WHEN hn.hnrm > 0
                  THEN COALESCE(h.hub, 0.0) / hn.hnrm
                  ELSE 0.0 END, 7) AS hub
FROM nodes n
LEFT JOIN a{n} a USING (node)
LEFT JOIN h{n} h USING (node)
CROSS JOIN an CROSS JOIN hn""")


def _pmi_sql(k: int, min_count: int) -> str:
    """Oracle for q_pmi_collocations: corpus token/adjacent-pair counts
    and the exact PMI expression, floored and top-k'd identically."""
    return f"""
WITH w AS (
  SELECT list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
  FROM documents
),
t AS (SELECT unnest(toks) AS w FROM w),
uni AS (SELECT w, count(*)::BIGINT AS c FROM t GROUP BY w),
nt AS (SELECT count(*)::BIGINT AS n FROM t),
pr AS (
  SELECT toks[i] AS a, toks[i + 1] AS b
  FROM (SELECT toks, generate_subscripts(toks, 1) AS i FROM w)
  WHERE i < len(toks)
),
np AS (SELECT count(*)::BIGINT AS n FROM pr),
pc AS (
  SELECT a AS w1, b AS w2, count(*)::BIGINT AS pair_count
  FROM pr GROUP BY 1, 2 HAVING count(*) >= {min_count}
)
SELECT w1, w2, pair_count,
       round(ln((pair_count / CAST(np.n AS DOUBLE))
                / ((u1.c / CAST(nt.n AS DOUBLE))
                   * (u2.c / CAST(nt.n AS DOUBLE)))), 6) AS pmi
FROM pc
JOIN uni u1 ON u1.w = pc.w1
JOIN uni u2 ON u2.w = pc.w2
CROSS JOIN nt CROSS JOIN np
ORDER BY ln((pair_count / CAST(np.n AS DOUBLE))
            / ((u1.c / CAST(nt.n AS DOUBLE))
               * (u2.c / CAST(nt.n AS DOUBLE)))) DESC, w1, w2
LIMIT {k}
"""


def _stage_cdx_expected() -> str:
    """Expected cdx_index rows (minus the surt key, which the oracle SQL
    derives from the url — the rule under test), computed driver-side:
    offsets by serializer arithmetic (cumulative record lengths per shard),
    never by parsing. Keyed by the serializer+synthesis source."""
    import numpy as np
    import pandas as pd

    from patapsco_spark.sources import warc as _warc
    from patapsco_spark.sources.webpages import _synth_batch

    key = _stage_key(f"{WARC_N}/{WARC_FILES}", _stage_cdx_expected,
                     _warc.record_bytes, _warc.records_to_warc_bytes,
                     _synth_batch)
    path = os.path.join(tempfile.gettempdir(),
                        f"pspark_cdxexp_{WARC_N}_{key}.parquet")
    if not os.path.exists(path):
        shard_dir = _stage_warc_shards()
        rows = []
        per = WARC_N // WARC_FILES
        for i in range(WARC_FILES):
            pdf = _synth_batch(np.arange(i * per, (i + 1) * per))
            fname = os.path.join(shard_dir, f"shard-{i:05d}.warc.gz")
            off = 0
            for r in pdf.itertuples(index=False):
                rows.append({
                    "url": r.url,
                    "warc_iso": r.warc_ts.strftime("%Y-%m-%dT%H:%M:%S"),
                    "http_status": 200,
                    "n_bytes": len(bytes(r.html)),
                    "warc_file": fname,
                    "warc_offset": off,
                })
                # gzip shards: pointers are COMPRESSED member offsets (the
                # CDX contract — seek there and inflate); one member per
                # record in this layout, so cumulative member lengths
                import gzip as _gzip
                off += len(_gzip.compress(
                    _warc.record_bytes(r.url, r.warc_ts, bytes(r.html)),
                    mtime=0))
        out = pd.DataFrame(rows)
        out["http_status"] = out["http_status"].astype("int32")
        out["n_bytes"] = out["n_bytes"].astype("int64")
        out["warc_offset"] = out["warc_offset"].astype("int64")
        tmp = f"{path}.tmp-{os.getpid()}"
        out.to_parquet(tmp, index=False)
        os.replace(tmp, path)
    return path


def q_cdx_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDX lookup index over the staged crawl shards: distributed parse →
    SURT keys → range-sorted (surt, warc_ts) rows with (file, offset)
    record pointers. The oracle derives surt in SQL from the url and takes
    offsets from serializer arithmetic, so both the key rule and the
    parser's stream accounting are pinned."""
    from patapsco_spark.operators.weburl import build_cdx
    from patapsco_spark.sources.warc import read_warc

    d = _stage_warc_shards()
    cdx = build_cdx(read_warc(spark, os.path.join(d, "*.warc.gz")))
    return cdx.select(
        "surt",
        F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss").alias("warc_iso"),
        "url", "http_status", "n_bytes", "warc_file", "warc_offset")


def _cdx_sql() -> str:
    """SURT derived from the url with DuckDB string/list functions (the
    synthesized urls exercise host reversal + path lowering; the query-
    param and port policies are pinned by tests/test_weburl.py directly)."""
    return f"""
WITH exp AS (SELECT * FROM read_parquet('{_stage_cdx_expected()}')),
surted AS (
  SELECT array_to_string(
           list_reverse(string_split(
             regexp_replace(lower(regexp_extract(
               url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1)),
               '^www\\.', ''), '.')), ',')
         || ')' ||
         lower(regexp_replace(regexp_extract(
           url, '://[^/?#]*([^?#]*)', 1), '/+$', '')) AS surt,
         warc_iso, url, http_status, n_bytes, warc_file, warc_offset
  FROM exp
)
SELECT * FROM surted
"""


HB_T = 4


def q_wet_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WET product roundtrip: synthesize pages → distributed WET export
    (one conversion-record shard per partition) → distributed parse back.
    Oracle compares url + md5(text bytes) against the driver-side corpus
    (no WET layer), pinning serializer, writer, and parser together."""
    from patapsco_spark.sources.warc import read_warc, write_wet
    from patapsco_spark.sources.webpages import synthesize_pages

    pages = synthesize_pages(spark, WARC_N, partitions=WARC_FILES)
    # per-call private dir: concurrent bench/oracle processes can never
    # interleave into each other's shards, and a WARC_FILES change can't
    # leave stale part files for the glob to pick up. The few-hundred-KB
    # dir must outlive the returned (lazy) DataFrame, so it is not cleaned
    # here — it dies with /tmp.
    out = tempfile.mkdtemp(prefix=f"pspark_wet_{WARC_N}_")
    write_wet(pages.select("url", "warc_ts", "text"), out,
              partitions=WARC_FILES)
    back = read_warc(spark, os.path.join(out, "part-*.warc.wet.gz"),
                     types=("conversion",))
    return back.select("url", F.md5("html").alias("text_md5"))


def q_anchor_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-TEXT aggregation over the injected-link corpus: per target
    page, (n_anchors, n_srcs, top_anchor) — the "anchor document" a web
    index attaches to a page from what OTHER pages call it. The injected
    anchors carry deterministic text l{k}, so the oracle replays the md5
    link rule WITH k and rolls up in SQL — any drift in the <a>…</a> pair
    extraction, tag stripping, or the frequency/tie-break rollup breaks
    the match."""
    from patapsco_spark.operators.linkgraph import (anchor_edges,
                                                    anchor_summaries)

    return anchor_summaries(anchor_edges(_link_pages(spark)))


def _anchor_sql() -> str:
    """anchor_texts oracle: the link rule with k kept (anchor text 'l'||k),
    self-links and rel=nofollow links dropped like the operator default,
    duplicates kept (each (i,k) is one anchor row), then the same
    two-level rollup."""
    return ("WITH " + _link_edges_sql().lstrip() + f""",
tgtk AS (
  SELECT deg.i, k.k,
         ('0x' || substr(md5('link-' || deg.i || '-' || k.k), 1, 8))::BIGINT
         % {LINK_N} AS j,
         ('0x' || substr(md5('link-' || deg.i || '-' || k.k), 9, 2))::BIGINT
         % 5 AS rel5
  FROM deg JOIN (SELECT unnest(range(0, {LINK_MAXDEG - 1})) AS k) k
       ON k.k < deg.d
),
anch AS (
  SELECT us.url AS src, ut.url AS dst, 'l' || tk.k AS anchor
  FROM tgtk tk JOIN urls us ON us.i = tk.i
               JOIN urls ut ON ut.i = tk.j
  WHERE tk.i <> tk.j AND tk.rel5 <> 0
),
pair AS (SELECT dst, anchor, count(*) AS n FROM anch GROUP BY dst, anchor),
top AS (
  SELECT dst, anchor AS top_anchor FROM (
    SELECT dst, anchor,
           row_number() OVER (PARTITION BY dst
                              ORDER BY n DESC, anchor ASC) AS rn
    FROM pair) WHERE rn = 1
),
stats AS (
  SELECT dst, count(*)::BIGINT AS n_anchors,
         count(DISTINCT src)::BIGINT AS n_srcs
  FROM anch GROUP BY dst
)
SELECT s.dst, s.n_anchors, s.n_srcs, t.top_anchor
FROM stats s JOIN top t USING (dst)""")


def q_anchor_blobs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked per-target anchor documents over the injected-link corpus:
    top-3 distinct anchor texts by (count desc, text asc), space-joined
    in rank order — the indexable blob with_anchor_text appends to each
    target's text field. top_k=3 (< the corpus' max distinct anchors per
    target) so the oracle must replay the CAP, not just the rollup."""
    from patapsco_spark.operators.linkgraph import anchor_blobs, anchor_edges

    return anchor_blobs(anchor_edges(_link_pages(spark)), top_k=3)


def _anchor_blobs_sql() -> str:
    """anchor_blobs oracle: same anch CTE as anchor_texts, then the
    rank/cap/string_agg pipeline in SQL."""
    head = _anchor_sql().split("pair AS")[0]  # WITH ... anch AS (...),
    return (head + """
pair AS (SELECT dst, anchor, count(*) AS n FROM anch GROUP BY dst, anchor),
ranked AS (
  SELECT dst, anchor, n,
         row_number() OVER (PARTITION BY dst
                            ORDER BY n DESC, anchor ASC) AS rn
  FROM pair)
SELECT dst, string_agg(anchor, ' ' ORDER BY rn) AS anchor_blob,
       count(*) AS n_anchor_terms
FROM ranked WHERE rn <= 3 GROUP BY dst""")


RECRAWL_N = 300


def q_latest_revision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-crawl re-capture collapse: RECRAWL_N synthesized pages plus
    injected re-crawls — page i gains a NEWER capture (+1 day) when
    md5-byte 8 % 4 == 0 and a STALE capture (-1 hour, which must lose)
    when % 4 == 1. latest_revision keeps the newest capture per canonical
    url; the output ships epoch seconds so the oracle replays the whole
    thing in integer arithmetic (no timestamp/timezone surface)."""
    from patapsco_spark.operators.weburl import latest_revision
    from patapsco_spark.sources.webpages import synthesize_pages

    pages = synthesize_pages(spark, RECRAWL_N, partitions=8)
    i = F.element_at(F.split("url", "/"), -1).cast("int")
    sel = (F.conv(F.substring(F.md5(F.concat(F.lit("page-"), i.cast("string"))),
                              17, 2), 16, 10).cast("int") % 4)
    newer = (pages.where(sel == 0)
             .withColumn("warc_ts", F.col("warc_ts")
                         + F.expr("INTERVAL 1 DAY")))
    stale = (pages.where(sel == 1)
             .withColumn("warc_ts", F.col("warc_ts")
                         - F.expr("INTERVAL 1 HOUR")))
    captures = pages.unionByName(newer).unionByName(stale)
    return (latest_revision(captures)
            .select("url", F.col("warc_ts").cast("long").alias("ts_epoch")))


def _latest_revision_sql() -> str:
    """latest_revision oracle: urls + warc_ts epoch replayed from the md5
    synthesis bytes (webpages._synth_batch: ts = 1_600_000_000 + bytes
    5..7 of md5('page-i')), winner = base + 86400 for the %4==0 cohort."""
    return f"""
WITH idx AS (SELECT unnest(range(0, {RECRAWL_N})) AS i),
b AS (
  SELECT 'https://example.org/' || substr(md5('page-' || i), 1, 8)
         || '/' || i AS url,
         1600000000
           + ('0x' || substr(md5('page-' || i), 11, 2))::BIGINT * 65536
           + ('0x' || substr(md5('page-' || i), 13, 2))::BIGINT * 256
           + ('0x' || substr(md5('page-' || i), 15, 2))::BIGINT AS ts,
         ('0x' || substr(md5('page-' || i), 17, 2))::BIGINT % 4 AS s
  FROM idx)
SELECT url, CASE WHEN s = 0 THEN ts + 86400 ELSE ts END AS ts_epoch FROM b"""


def q_revision_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-crawl change profile: the latest_revision capture corpus plus
    a CONTENT-CHANGE cohort — page i (md5-byte 8 % 4): 0 → re-captured +1d
    unchanged; 1 → stale re-capture -1h unchanged; 2 → re-captured +2d
    with MODIFIED html (one change); 3 → re-captured twice (+1d modified,
    +2d reverted to the original bytes) — the A→B→A oscillation where
    n_changes (2) exceeds n_versions - 1 (1). The oracle derives every
    count from the cohort selector alone — any drift in fingerprint
    ordering, the lag-transition count, or canonicalization breaks it."""
    from patapsco_spark.operators.weburl import revision_stats
    from patapsco_spark.sources.webpages import synthesize_pages

    pages = synthesize_pages(spark, RECRAWL_N, partitions=8)
    i = F.element_at(F.split("url", "/"), -1).cast("int")
    sel = (F.conv(F.substring(F.md5(F.concat(F.lit("page-"), i.cast("string"))),
                              17, 2), 16, 10).cast("int") % 4)
    marker = F.encode(F.lit("<!--rev2-->"), "utf-8")
    mutate = F.concat(F.col("html"), marker)

    def shifted(cond, interval: str, html_col):
        return (pages.where(cond)
                .withColumn("warc_ts", F.col("warc_ts") + F.expr(interval))
                .withColumn("html", html_col))

    captures = (pages
                .unionByName(shifted(sel == 0, "INTERVAL 1 DAY", F.col("html")))
                .unionByName(shifted(sel == 1, "INTERVAL -1 HOUR", F.col("html")))
                .unionByName(shifted(sel == 2, "INTERVAL 2 DAY", mutate))
                .unionByName(shifted(sel == 3, "INTERVAL 1 DAY", mutate))
                .unionByName(shifted(sel == 3, "INTERVAL 2 DAY", F.col("html"))))
    return (revision_stats(captures)
            .select("url", "n_captures", "n_versions", "n_changes",
                    F.col("first_ts").cast("long").alias("first_epoch"),
                    F.col("last_ts").cast("long").alias("last_epoch")))


def _revision_stats_sql() -> str:
    """revision_stats oracle: cohort counts in pure integer arithmetic
    (same synthesis replay as the latest_revision oracle)."""
    return f"""
WITH idx AS (SELECT unnest(range(0, {RECRAWL_N})) AS i),
b AS (
  SELECT 'https://example.org/' || substr(md5('page-' || i), 1, 8)
         || '/' || i AS url,
         1600000000
           + ('0x' || substr(md5('page-' || i), 11, 2))::BIGINT * 65536
           + ('0x' || substr(md5('page-' || i), 13, 2))::BIGINT * 256
           + ('0x' || substr(md5('page-' || i), 15, 2))::BIGINT AS ts,
         ('0x' || substr(md5('page-' || i), 17, 2))::BIGINT % 4 AS s
  FROM idx)
SELECT url,
       CASE WHEN s = 3 THEN 3 ELSE 2 END::BIGINT AS n_captures,
       CASE WHEN s IN (2, 3) THEN 2 ELSE 1 END::BIGINT AS n_versions,
       CASE s WHEN 2 THEN 1 WHEN 3 THEN 2 ELSE 0 END::BIGINT AS n_changes,
       CASE WHEN s = 1 THEN ts - 3600 ELSE ts END AS first_epoch,
       CASE s WHEN 0 THEN ts + 86400 WHEN 2 THEN ts + 172800
              WHEN 3 THEN ts + 172800 ELSE ts END AS last_epoch
FROM b"""


BOILER_N = 150


def q_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate removal over a deterministic corpus: page i carries
    3 + md5%4 body paragraphs (paragraph b = word 'w'||(md5%10) repeated
    5 + md5%20 times), one link-dense nav block (16 words of pure anchor
    text — long enough that length alone would KEEP it; only the link-
    density rule drops it), a 4-word footer, and a 2-word title. Expected
    main text = newline-join of paragraphs with >= 10 words, which the
    oracle rebuilds with repeat()/string_agg and md5s — any drift in
    segmentation, link-density math, thresholds, or join order breaks the
    match. See ``operators/boilerplate.py``."""
    from patapsco_spark.operators.boilerplate import extract_main_content

    def gen(batches):
        import hashlib

        import pandas as pd

        def b1(s: str) -> int:
            return int(hashlib.md5(s.encode()).hexdigest()[:2], 16)

        nav = "<div>" + "".join(
            f'<a href="/m{k}">menu item{k}</a> ' for k in range(8)) + "</div>"
        for pdf in batches:
            urls, htmls = [], []
            for i in pdf["id"]:
                n_body = 3 + b1(f"bpn-{i}") % 4
                paras = []
                for b in range(n_body):
                    w = f"w{b1(f'bp-{i}-{b}') % 10}"
                    n = 5 + b1(f"bpc-{i}-{b}") % 20
                    paras.append("<p>" + " ".join([w] * n) + "</p>")
                urls.append(f"https://bp.test/{i}")
                htmls.append(
                    (f"<html><head><title>Page {i}</title></head><body>"
                     f"{nav}{''.join(paras)}"
                     f"<p>© 2020 example corp</p></body></html>")
                    .encode("utf-8"))
            yield pd.DataFrame({"url": urls, "html": htmls})

    pages = spark.range(BOILER_N, numPartitions=8).mapInPandas(
        gen, schema="url string, html binary")
    return (extract_main_content(pages)
            .select("url",
                    F.md5(F.encode("main_text", "utf-8"))
                    .alias("content_md5"),
                    "n_blocks", "n_content_blocks"))


def _main_content_sql() -> str:
    """main_content oracle: rebuild each expected paragraph with repeat(),
    aggregate kept ones in block order, md5 the join. Block census: title
    + nav + footer + n_body paragraphs; content = paragraphs with n>=10
    (nav fails density, title/footer fail length)."""
    return f"""
WITH idx AS (SELECT unnest(range(0, {BOILER_N})) AS i),
pages AS (
  SELECT i, 3 + ('0x' || substr(md5('bpn-' || i), 1, 2))::BIGINT % 4
         AS n_body
  FROM idx),
paras AS (
  SELECT p.i, b.b,
         'w' || (('0x' || substr(md5('bp-' || p.i || '-' || b.b), 1, 2))
                 ::BIGINT % 10) AS w,
         5 + ('0x' || substr(md5('bpc-' || p.i || '-' || b.b), 1, 2))
             ::BIGINT % 20 AS n
  FROM pages p JOIN (SELECT unnest(range(0, 6)) AS b) b ON b.b < p.n_body),
kept AS (
  SELECT i, string_agg(rtrim(repeat(w || ' ', n::INT)), chr(10)
                       ORDER BY b) AS body,
         count(*) AS n_kept
  FROM paras WHERE n >= 10 GROUP BY i),
census AS (
  SELECT p.i, p.n_body, coalesce(k.body, '') AS body,
         coalesce(k.n_kept, 0) AS n_kept
  FROM pages p LEFT JOIN kept k ON k.i = p.i)
SELECT 'https://bp.test/' || i AS url,
       md5(body) AS content_md5,
       (n_body + 3)::INT AS n_blocks,
       n_kept::INT AS n_content_blocks
FROM census"""


SITEMAP_N = 18


def q_sitemap_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap-XML parsing over a deterministic corpus: sitemap j carries
    2 + md5%5 <url> entries; entry k has loc https://s{j}.test/p{k},
    lastmod 2024-01-(1+md5%28), changefreq from {daily,weekly,monthly} by
    md5%3, priority (md5%10)/10. The oracle restates every field from the
    md5 rule — parser drift (field scoping, CDATA/whitespace handling,
    float parse) breaks the match."""
    from patapsco_spark.operators.crawl import parse_sitemaps

    def gen(batches):
        import hashlib

        import pandas as pd

        def b1(s: str) -> int:
            return int(hashlib.md5(s.encode()).hexdigest()[:2], 16)

        freqs = ["daily", "weekly", "monthly"]
        for pdf in batches:
            urls, bodies = [], []
            for j in pdf["id"]:
                n = 2 + b1(f"smn-{j}") % 5
                ents = []
                for k in range(n):
                    h = b1(f"sm-{j}-{k}")
                    ents.append(
                        f"<url><loc> https://s{j}.test/p{k} </loc>"
                        f"<lastmod>2024-01-{1 + h % 28:02d}</lastmod>"
                        f"<changefreq>{freqs[h % 3]}</changefreq>"
                        f"<priority>{(h % 10) / 10:.1f}</priority></url>")
                urls.append(f"https://s{j}.test/sm.xml")
                bodies.append('<?xml version="1.0"?><urlset>'
                              + "".join(ents) + "</urlset>")
            yield pd.DataFrame({"url": urls, "body": bodies})

    sm = spark.range(SITEMAP_N, numPartitions=4).mapInPandas(
        gen, schema="url string, body string")
    return parse_sitemaps(sm)[0]


def _sitemap_urls_sql() -> str:
    return f"""
WITH idx AS (SELECT unnest(range(0, {SITEMAP_N})) AS j),
n AS (SELECT j, 2 + ('0x' || substr(md5('smn-' || j), 1, 2))::BIGINT % 5
             AS n FROM idx),
ent AS (
  SELECT n.j, k.k,
         ('0x' || substr(md5('sm-' || n.j || '-' || k.k), 1, 2))::BIGINT AS h
  FROM n JOIN (SELECT unnest(range(0, 6)) AS k) k ON k.k < n.n)
SELECT 'https://s' || j || '.test/sm.xml' AS sitemap,
       'https://s' || j || '.test/p' || k AS loc,
       '2024-01-' || lpad((1 + h % 28)::VARCHAR, 2, '0') AS lastmod,
       CASE h % 3 WHEN 0 THEN 'daily' WHEN 1 THEN 'weekly'
                  ELSE 'monthly' END AS changefreq,
       (h % 10) / 10.0 AS priority
FROM ent"""


ROBOTS_HOSTS, ROBOTS_CANDS = 24, 12


def _robots_corpus(spark: SparkSession):
    """Deterministic robots.txt + candidate-URL corpus: host j gets one of
    four policy shapes by md5('rb-j') byte 1 % 4 — (0) Disallow /private +
    Allow /private/pub (longest-match override), (1) Disallow / + Allow
    /public + Crawl-delay, (2) Disallow /tmp$ + /x*y (anchor + wildcard),
    (3) a group for ANOTHER agent only (so '*' sees no rules). Candidate
    i on host j picks one of eight paths by md5('cand-j-i') byte 1 % 8.
    Everything is md5-replayable, so the oracle states the expected
    verdict without parsing — parser/matcher drift breaks the match."""
    import hashlib

    from patapsco_spark.operators.crawl import parse_robots

    bodies = {
        0: "User-agent: *\nDisallow: /private\nAllow: /private/pub\n",
        1: "User-agent: *\nDisallow: /\nAllow: /public\nCrawl-delay: 1\n",
        2: "User-agent: *\nDisallow: /tmp$\nDisallow: /x*y\n",
        3: "User-agent: otherbot\nDisallow: /\n",
    }
    robots_rows, cand_rows = [], []
    for j in range(ROBOTS_HOSTS):
        host = f"h{j}.crawl.test"
        s = int(hashlib.md5(f"rb-{j}".encode()).hexdigest()[:2], 16) % 4
        robots_rows.append((host, bodies[s]))
        for i in range(ROBOTS_CANDS):
            c = int(hashlib.md5(f"cand-{j}-{i}".encode())
                    .hexdigest()[:2], 16) % 8
            path = [f"/private/doc{i}", f"/private/pub/{i}", f"/public/{i}",
                    f"/other/{i}", "/tmp", f"/tmp/{i}", f"/x{i}y",
                    f"/zz{i}"][c]
            cand_rows.append((f"https://{host}{path}",))
    robots = spark.createDataFrame(robots_rows, "host string, body string")
    cands = spark.createDataFrame(cand_rows, "url string").repartition(8)
    rules, _, _ = parse_robots(robots)
    return rules, cands


_ROBOTS_EXPECT_SQL = f"""
hosts AS (SELECT unnest(range(0, {ROBOTS_HOSTS})) AS j),
hs AS (SELECT j, ('0x' || substr(md5('rb-' || j), 1, 2))::BIGINT % 4 AS s
       FROM hosts),
cand AS (
  SELECT hs.j, hs.s, i.i,
         ('0x' || substr(md5('cand-' || hs.j || '-' || i.i), 1, 2))::BIGINT
         % 8 AS c
  FROM hs CROSS JOIN (SELECT unnest(range(0, {ROBOTS_CANDS})) AS i) i),
verdicts AS (
  SELECT 'https://h' || j || '.crawl.test' ||
         CASE c WHEN 0 THEN '/private/doc' || i
                WHEN 1 THEN '/private/pub/' || i
                WHEN 2 THEN '/public/' || i
                WHEN 3 THEN '/other/' || i
                WHEN 4 THEN '/tmp'
                WHEN 5 THEN '/tmp/' || i
                WHEN 6 THEN '/x' || i || 'y'
                ELSE '/zz' || i END AS url,
         'h' || j || '.crawl.test' AS host,
         CASE WHEN s = 3 THEN true
              WHEN s = 0 THEN c <> 0
              WHEN s = 1 THEN c = 2
              ELSE c NOT IN (4, 6) END AS allowed
  FROM cand)"""


def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 robots verdicts over the deterministic corpus: parse each
    host's robots.txt, compile rules to LIKE patterns, and judge every
    candidate URL (longest match wins, Allow beats Disallow on ties, no
    rules ⇒ allowed) — zero shuffles on the URL stream (broadcast rules +
    higher-order-function aggregate). See ``operators/crawl.py``."""
    from patapsco_spark.operators.crawl import robots_filter

    rules, cands = _robots_corpus(spark)
    return robots_filter(cands, rules, keep_denied=True)


def q_crawl_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness-partitioned fetch schedule: distinct candidates minus an
    md5-selected seen set, robots applied, then per-host slots by
    (md5-priority desc, url asc) truncated at 5 — the per-origin fetch
    queue a crawler drains one slot per politeness interval. The oracle
    replays dedup, verdicts, seen rule, priority and window in SQL."""
    from patapsco_spark.operators.crawl import crawl_frontier

    rules, cands = _robots_corpus(spark)
    cands = cands.distinct().withColumn(
        "pri", F.conv(F.substring(F.md5(F.concat(F.lit("pri-"), F.col("url"))),
                                  1, 4), 16, 10).cast("long"))
    seen = cands.where(
        F.conv(F.substring(F.md5(F.concat(F.lit("seen-"), F.col("url"))),
                           1, 2), 16, 10).cast("int") % 5 == 0)
    return crawl_frontier(cands, seen=seen, rules=rules,
                          priority_col="pri", per_host_limit=5) \
        .select("url", "host", "slot")


def _robots_filter_sql() -> str:
    return "WITH " + _ROBOTS_EXPECT_SQL.lstrip() + \
        "\nSELECT url, allowed FROM verdicts"


def _crawl_frontier_sql() -> str:
    return "WITH " + _ROBOTS_EXPECT_SQL.lstrip() + f""",
pool AS (
  SELECT DISTINCT url, host, allowed FROM verdicts),
live AS (
  SELECT url, host,
         ('0x' || substr(md5('pri-' || url), 1, 4))::BIGINT AS pri
  FROM pool
  WHERE allowed
    AND ('0x' || substr(md5('seen-' || url), 1, 2))::BIGINT % 5 <> 0),
slotted AS (
  SELECT url, host,
         row_number() OVER (PARTITION BY host
                            ORDER BY pri DESC, url ASC) AS slot
  FROM live)
SELECT url, host, slot::INT AS slot FROM slotted WHERE slot <= 5"""


def q_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperBall over the injected-link graph: HLL-approximate in-ball
    sizes and radius-HB_T-truncated harmonic centrality for every page.
    4dp rounding absorbs float summation order; the register protocol
    itself (md5 low-60 hash, m=64, rho over the 54-bit window) is integer-
    exact in both engines, so the oracle replays the ENTIRE algorithm —
    init, HB_T union rounds, estimator, harmonic accumulation — in SQL."""
    from patapsco_spark.operators.linkgraph import hyperball, link_edges

    pages = _link_pages(spark)
    out = hyperball(link_edges(pages), nodes=pages.select("url"), t=HB_T,
                    validate_nodes=False)  # coverage by construction
    return out.select("node",
                      F.round("reach_est", 4).alias("reach_est"),
                      F.round("harmonic", 4).alias("harmonic"))


def _hyperball_sql() -> str:
    """HyperBall unrolled as CTEs: sparse (node, j, r) register rows,
    register-wise max per round = HLL union, same literal constants as
    operators.linkgraph (alpha_64*m^2 = 2904.064, small-range threshold
    160, rho_max 55)."""
    est = """
SELECT node, {t} AS t,
       CASE WHEN 2904.064 / ((64.0 - count(*)) + sum(pow(2.0, -r))) <= 160.0
             AND count(*) < 64
            THEN 64.0 * ln(64.0 / (64 - count(*)))
            ELSE 2904.064 / ((64.0 - count(*)) + sum(pow(2.0, -r))) END AS est
FROM {src} GROUP BY node"""
    parts = [_link_edges_sql().lstrip(), """
nodes AS (SELECT url AS node FROM urls),
h0 AS (SELECT node, ('0x' || substr(md5(node), 1, 15))::BIGINT AS h
       FROM nodes),
g0 AS (SELECT node, (h % 64)::INT AS j,
              (CASE WHEN h // 64 = 0 THEN 55
                    ELSE 55 - length(bin(h // 64)) END)::INT AS r
       FROM h0)""",
             "e0 AS (" + est.format(t=0, src="g0") + ")"]
    for k in range(1, HB_T + 1):
        p = f"g{k - 1}"
        parts.append(f"""
g{k} AS (
  SELECT node, j, max(r) AS r FROM (
    SELECT e.dst AS node, c.j, c.r
    FROM {p} c JOIN edges e ON e.src = c.node
    UNION ALL SELECT node, j, r FROM {p}
  ) GROUP BY node, j
)""")
        parts.append(f"e{k} AS (" + est.format(t=k, src=f"g{k}") + ")")
    union = " UNION ALL ".join(f"SELECT * FROM e{k}"
                               for k in range(HB_T + 1))
    return ("WITH " + ",".join(parts) + f""",
allest AS ({union}),
deltas AS (
  SELECT node, t, est,
         lag(est) OVER (PARTITION BY node ORDER BY t) AS prev
  FROM allest
)
SELECT node,
       round(max(CASE WHEN t = {HB_T} THEN est END), 4) AS reach_est,
       round(sum(CASE WHEN t >= 1
                      THEN greatest(0.0, est - prev) / t END), 4)
       AS harmonic
FROM deltas GROUP BY node""")


def _stage_warc_expected() -> str:
    """Expected warc_ingest output, computed driver-side in pure pandas
    straight from the synthesized corpus (no WARC serialize/parse in the
    loop), parqueted for DuckDB."""
    import numpy as np
    import pandas as pd

    from patapsco_spark.sources.webpages import _synth_batch

    key = _stage_key(f"{WARC_N}/{WARC_FILES}", _synth_batch)
    path = os.path.join(tempfile.gettempdir(),
                        f"pspark_warcexp_{WARC_N}_{key}.parquet")
    if not os.path.exists(path):
        pdf = _synth_batch(np.arange(WARC_N))
        out = pd.DataFrame({
            "url": pdf["url"],
            "warc_iso": pdf["warc_ts"].dt.strftime("%Y-%m-%dT%H:%M:%S"),
            "n_bytes": [len(bytes(h)) for h in pdf["html"]],
            "text_md5": [hashlib.md5(t.encode()).hexdigest()
                         for t in pdf["text"]],
        })
        out["n_bytes"] = out["n_bytes"].astype("int64")
        tmp = f"{path}.tmp-{os.getpid()}"
        out.to_parquet(tmp, index=False)
        os.replace(tmp, path)
    return path


def q_webpages_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end north-star pipeline on the synthetic Common-Crawl-style
    table: synthesize → html→text → analyze → index → BM25 top-k.
    Oracle: the same corpus staged to parquet driver-side (synthesis and
    extraction are pure pandas functions) + the BM25 SQL over it."""
    from patapsco_spark.sources.webpages import index_webpages, synthesize_pages

    pages = synthesize_pages(spark, WEBPAGES_N, partitions=8)
    idx = os.path.join(tempfile.gettempdir(),
                       f"pspark_webidx_{hashlib.md5(sf_dir.encode()).hexdigest()[:8]}")
    index_webpages(spark, pages, idx,
                   IndexConfig(text=RAW_TEXT, num_shards=4), resume=True)
    res = search_texts(spark, idx, WEBPAGES_QUERIES,
                       RetrieveConfig(k=10), text_cfg=RAW_TEXT)
    return res.select("query_id", F.col("doc_id").alias("url"),
                      F.col("rank").cast("long").alias("rnk"),
                      F.round("score", 5).alias("score"))


RM3_FB_DOCS, RM3_FB_TERMS, RM3_OQW = 5, 8, 0.5


def q_rm3_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from patapsco_spark.operators.rm3 import search_rm3

    idx = _ensure_index(spark, sf_dir)
    res = search_rm3(spark, idx, [("q1", BM25_QUERY)],
                     RetrieveConfig(k=K, fb_docs=RM3_FB_DOCS,
                                    fb_terms=RM3_FB_TERMS,
                                    original_query_weight=RM3_OQW),
                     text_cfg=RAW_TEXT)
    return _as_result(res)


ROCCHIO_ALPHA, ROCCHIO_BETA = 1.0, 0.75


def q_rocchio_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rocchio pseudo-relevance feedback (new r5): the classic 1971
    vector-space update (Manning, Raghavan & Schütze, IIR ch. 9;
    Anserini's Rocchio reranker family) — q_new = α·q + β·centroid of
    the top fb_docs' length-normalized tf vectors, cut to fb_terms,
    negative weights clamped, rescored as a weighted-OR BM25 pass-2.
    Sits next to rm3_topk as the second feedback model over the SAME
    analyzed-table term vectors; the oracle replays both passes and the
    vector algebra in one SQL query."""
    from patapsco_spark.operators.rm3 import search_rocchio

    idx = _ensure_index(spark, sf_dir)
    res = search_rocchio(spark, idx, [("q1", BM25_QUERY)],
                         RetrieveConfig(k=K, fb_docs=RM3_FB_DOCS,
                                        fb_terms=RM3_FB_TERMS),
                         text_cfg=RAW_TEXT,
                         alpha=ROCCHIO_ALPHA, beta=ROCCHIO_BETA)
    return _as_result(res)


def q_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """trec_eval-semantics scoring (map/ndcg/ndcg'/recall@100/P@10 +
    recip_rank/judged@10/Rprec/bpref/success@10, the round-4 breadth
    additions) over a deterministic pseudo-run: per lang ("query"), top-30
    docs by a unique score; qrels = docs with n_chars % 3 == 0, graded
    doc_id % 3 — grade 0 rows are JUDGED NON-RELEVANT, which is what
    bpref/judged@10 discriminate on."""
    from pyspark.sql import Window
    from patapsco_spark.operators.evaluate import evaluate_run

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    scored = docs.select(
        F.col("lang").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
        (F.col("n_chars") + F.col("doc_id") / 100000.0).alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"))
    run = scored.withColumn("rn", F.row_number().over(w)).where("rn <= 30").drop("rn")
    qrels = docs.where("n_chars % 3 = 0").select(
        F.col("lang").alias("query_id"),
        F.col("doc_id").cast("string").alias("doc_id"),
        (F.col("doc_id") % 3).cast("int").alias("relevance"))
    metrics = ("map", "ndcg", "ndcg_prime", "recall_100", "P_10",
               "recip_rank", "judged_10", "Rprec", "bpref", "success_10")
    out = evaluate_run(run, qrels, metrics=metrics)
    return out.select("query_id",
                      *[F.round(m, 6).alias(m) for m in metrics])


def q_media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary payloads (synthetic codec) derived from
    the documents table; per-item kind, size, body digest."""
    from patapsco_spark.operators import multimodal as mm

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    media = mm.attach_media(docs)
    return mm.media_stats(media)


def q_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (UDTF-style explode in an Arrow kernel)."""
    from patapsco_spark.operators import multimodal as mm

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return mm.sample_frames(mm.attach_media(docs), every_n=10)


def q_image_resize_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    from patapsco_spark.operators import multimodal as mm

    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    return mm.resize_images(mm.attach_media(docs), target_width=64)


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    return ann.cosine_pairs(emb, threshold=0.4)


def q_embedding_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup resolution (round 5): connected components over the
    cosine near-dup pair graph — the embedding-space sibling of
    dedup_clusters (same min-label propagation; text near-dups and
    embedding near-dups both need pairs collapsed into keep-one sets)."""
    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    pairs = ann.cosine_pairs(emb, threshold=0.4)
    return dedup.dedup_clusters(pairs)


IVF_CELLS, IVF_ITERS, IVF_NPROBE, IVF_SEED = 8, 3, 3, 7


def _ensure_ivf(spark: SparkSession, sf_dir: str) -> str:
    """Persisted IVF artifact per sf_dir — the Lloyd build runs once and a
    warm query is read-only (centroids from manifest + nprobe-pruned scan),
    mirroring _ensure_index's resume discipline."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(), f"pspark_ivf_{tag}")
    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    ann.ivf_write(spark, emb.where(F.col("vec_id") != 0), path,
                  n_cells=IVF_CELLS, iters=IVF_ITERS, seed=IVF_SEED,
                  resume=True)
    return path


IVF_SPLIT_HEXES = tuple("01234567")  # md5-half: build vs appended gen


def _ensure_ivf_append(spark: SparkSession, sf_dir: str) -> str:
    """IVF artifact exercising the append path: built over the md5-half of
    the embeddings, the other half appended as generation 1 with frozen
    centroids (ann.ivf_append). Gated on the manifest's gens list, so a
    warm call runs zero build/append jobs."""
    from patapsco_spark.plans import manifest as _mf

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(), f"pspark_ivfa_{tag}")
    emb = (read_parquet(spark, f"{sf_dir}/embeddings.parquet")
           .where(F.col("vec_id") != 0))
    split = F.substring(
        F.md5(F.concat(F.lit("ivfsplit:"), F.col("vec_id").cast("string"))),
        1, 1).isin(list(IVF_SPLIT_HEXES))
    ann.ivf_write(spark, emb.where(split), path, n_cells=IVF_CELLS,
                  iters=IVF_ITERS, seed=IVF_SEED, resume=True)
    man = _mf.read_manifest(path)
    if len(man["metrics"].get("gens", [0])) < 2:
        ann.ivf_append(spark, emb.where(~split), path)
    return path


def q_ann_ivf_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF append (new r5; Faiss IndexIVF.add): index built on the md5-half
    of the vectors, the other half appended to the FROZEN centroids as a
    second committed generation — then the same nprobe query spans both
    generations. The oracle replays Lloyd on the train half only and the
    final all-vector assignment (= build + frozen-centroid append) in SQL."""
    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding") \
        .first()["embedding"]
    cents, assigned = ann.ivf_read(spark, _ensure_ivf_append(spark, sf_dir))
    out = ann.ivf_topk(assigned, cents, list(qvec), k=10, nprobe=IVF_NPROBE)
    return out.select(F.col("vec_id").cast("long"), "cosine")


SEMDEDUP_T = 0.42  # synthetic embeddings are near-random; 0.42 yields a
                   # non-trivial removal set (real corpora use 0.9+)


def q_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (new r5; Abbas et al. 2023): k-means-cluster the embeddings
    (the deterministic ivf_build Lloyd), then inside each cluster remove
    every vector with cosine ≥ threshold against a lower-id cluster-mate.
    Returns the removal evidence rows (vec_id, anchor_id, cos) — the oracle
    replays the whole pipeline: shared kmeans CTEs + within-cell pair join.
    Quadratic only WITHIN a cluster (one shuffle keyed on cell) — the
    SemDeDup scale design itself, so the cluster count GROWS with the
    corpus (the paper uses 50k clusters for LAION): n_cells = max(base,
    rows/250) keeps cells ~250 vectors wide at any scale. At the sf0.01
    correctness gate (500 rows) this is exactly IVF_CELLS, which is what
    the static oracle replays; the scaling only engages above ~2k rows
    (caught live: fixed 8 cells at the 20k-row sf1 bench made the
    within-cell pair join quadratic — 595 s)."""
    from patapsco_spark.operators.dedup import semdedup

    emb = (read_parquet(spark, f"{sf_dir}/embeddings.parquet")
           .where(F.col("vec_id") != 0))
    n_cells = max(IVF_CELLS, emb.count() // 250)
    _kept, removed = semdedup(emb, n_cells=n_cells, iters=IVF_ITERS,
                              threshold=SEMDEDUP_T, seed=IVF_SEED)
    return (removed.select(F.col("vec_id").cast("long").alias("vec_id"),
                           F.col("anchor_id").cast("long").alias("anchor_id"),
                           F.round("cos", 6).alias("cos"))
            .orderBy("vec_id"))


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF top-k: approximate w.r.t. brute force (recall pinned in pytest)
    but fully deterministic w.r.t. the algorithm — centroid init samples the
    first 200 vectors in md5(id) order with seeded-rng index literals, so
    the oracle replays the ENTIRE k-means (init, Lloyd assignments with
    (d2, cell) tie-breaks, per-dim means, empty-cell carry-over), the
    nprobe cell probe, and the exact re-rank in SQL. The index itself is a
    persisted artifact (ann.ivf_write) — a warm call runs ZERO Lloyd jobs."""
    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    cents, assigned = ann.ivf_read(spark, _ensure_ivf(spark, sf_dir))
    out = ann.ivf_topk(assigned, cents, list(qvec), k=10, nprobe=IVF_NPROBE)
    return out.select(F.col("vec_id").cast("long"), "cosine")


ANN_FILTER_MOD, ANN_FILTER_REM = 3, 1


def q_ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered kNN (new r5, ann.ivf_filtered_topk — ES knn+filter): the
    metadata predicate (vec_id % 3 == 1, a stand-in for any doc-attribute
    gate) applies INSIDE the probed IVF cells, with the Lucene-style
    selectivity escape to an exact filtered scan when the probe holds
    fewer than k matches. Oracle = the full k-means replay with the
    predicate and the escape CASE spliced into the candidate CTE."""
    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    cents, assigned = ann.ivf_read(spark, _ensure_ivf(spark, sf_dir))
    out = ann.ivf_filtered_topk(
        assigned, cents, list(qvec),
        F.col("vec_id") % ANN_FILTER_MOD == ANN_FILTER_REM,
        k=10, nprobe=IVF_NPROBE)
    return out.select(F.col("vec_id").cast("long"), "cosine")


def q_ann_ivfadc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVFADC (round 5): the persisted IVF index prunes cells, then the
    int8-quantized candidates score asymmetrically against the
    full-precision query — the composition trillion-vector stores run
    (prune which vectors, shrink bytes per vector). Oracle = the full IVF
    k-means replay with the SQ8 dequantize spliced into the scoring CTE."""
    emb = read_parquet(spark, f"{sf_dir}/embeddings.parquet")
    qvec = emb.where(F.col("vec_id") == 0).select("embedding").first()["embedding"]
    cents, assigned = ann.ivf_read(spark, _ensure_ivf(spark, sf_dir))
    out = ann.ivf_sq8_topk(assigned, cents, list(qvec), k=10,
                           nprobe=IVF_NPROBE)
    return out.select(F.col("vec_id").cast("long"), "cosine")


def q_topk_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    li = read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    w = Window.partitionBy("l_orderkey").orderBy(
        F.desc("l_extendedprice"), F.asc("l_linenumber"))
    return (li.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 2)
            .select(F.col("l_orderkey").cast("long"),
                    F.col("l_linenumber").cast("long"),
                    (F.col("rn") - 1).cast("long").alias("rnk")))


def q_lineitem_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_parquet(spark, f"{sf_dir}/lineitem.parquet")
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity").cast("double").alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_price"),
                 F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                 F.count("*").alias("n")))


def q_join_orders_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_parquet(spark, f"{sf_dir}/orders.parquet")
    c = read_parquet(spark, f"{sf_dir}/customer.parquet")
    n = read_parquet(spark, f"{sf_dir}/nation.parquet")
    return (o.join(c, o["o_custkey"] == c["c_custkey"])
            .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
            .groupBy("n_name")
            .agg(F.count("*").alias("n_orders"),
                 F.round(F.sum("o_totalprice"), 2).alias("revenue")))


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    return (ev.groupBy(F.col("user_id").cast("long").alias("user_id"),
                       F.date_format("ts", "yyyy-MM-dd HH").alias("hour"))
            .agg(F.count("*").alias("n"),
                 F.round(F.sum("value"), 5).alias("sum_value")))


RARE_MAX_DOC_COUNT, DH_OFFSET_MIN = 2, 330  # +05:30 fixed-offset zone


def q_rare_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES rare_terms (new r5, aggs.rare_terms): the long-tail complement
    of the terms agg — every BIGRAM appearing in ≤ 2 docs (unigrams have
    no tail in this Zipf-truncated vocabulary; bigrams do, which is the
    realistic shape — rare_terms exists for tail mining). ES approximates
    with a CuckooFilter to bound coordinator memory; the Spark tally is
    one map-side-combinable groupBy and EXACT (documented at the
    operator)."""
    from patapsco_spark.operators.aggs import rare_terms
    from patapsco_spark.partitioning import widen_for_kernel
    docs = widen_for_kernel(
        read_parquet(spark, f"{sf_dir}/documents.parquet"))
    items = (docs
             .select("doc_id", F.expr(
                 "filter(split(trim(text), ' '), x -> x != '')")
                 .alias("toks"))
             .select("doc_id", F.explode(F.expr(
                 "if(size(toks) >= 2, "
                 "transform(sequence(1, size(toks) - 1), "
                 "i -> concat_ws(' ', slice(toks, i, 2))), "
                 "cast(array() as array<string>))")).alias("term"))
             .distinct())
    return rare_terms(items, "term", max_doc_count=RARE_MAX_DOC_COUNT) \
        .select("term", F.col("doc_count").cast("long"))


def q_events_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES date_histogram with a CALENDAR interval (new r5,
    aggs.date_histogram): ISO-week buckets (Monday start, variable
    alignment to month edges) under a +05:30 fixed-offset time_zone — the
    ES offset-shift-then-truncate semantics a fixed-interval histogram
    (events_hourly) can't express."""
    from patapsco_spark.operators.aggs import date_histogram
    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    out = date_histogram(ev, "ts", interval="week",
                         offset_minutes=DH_OFFSET_MIN,
                         metrics={"sum_value": F.round(F.sum("value"), 5)})
    return out.select(F.date_format("bucket", "yyyy-MM-dd").alias("week"),
                      F.col("doc_count").cast("long"), "sum_value")


def q_pipeline_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES pipeline aggregations (new r5, aggs.cumulative_sum/derivative):
    second-order aggs consuming the weekly date_histogram's buckets — a
    running total and the bucket-over-bucket delta (first bucket NULL,
    the ES omit-not-zero convention). Window work over an already-tiny
    buckets frame; the scale question was settled by the parent agg."""
    from patapsco_spark.operators.aggs import (cumulative_sum,
                                               date_histogram, derivative,
                                               moving_avg)
    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    b = date_histogram(ev, "ts", interval="week",
                       offset_minutes=DH_OFFSET_MIN)
    b = b.select(F.date_format("bucket", "yyyy-MM-dd").alias("week"),
                 F.col("doc_count").cast("long"))
    out = moving_avg(derivative(cumulative_sum(b, "week", "doc_count"),
                                "week", "doc_count"),
                     "week", "doc_count", window=3)
    return out.select("week", "doc_count",
                      F.col("cum").cast("long"),
                      F.col("deriv").cast("long"),
                      F.round("mov", 6).alias("mov3"))


def q_pipeline_weekly2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rest of the ES pipeline-agg family (new r5 s5): serial_diff
    (lag-2 seasonal delta, NULL for the first two buckets), normalize
    percent_of_sum across the whole series, bucket_selector (the agg
    family's HAVING), and bucket_sort with a size cut — composed over the
    same weekly date_histogram buckets as pipeline_weekly. Selector runs
    AFTER normalize, so percentages are of the full series."""
    from patapsco_spark.operators.aggs import (bucket_selector, bucket_sort,
                                               date_histogram,
                                               normalize_buckets,
                                               serial_diff)
    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    b = date_histogram(ev, "ts", interval="week",
                       offset_minutes=DH_OFFSET_MIN)
    b = b.select(F.date_format("bucket", "yyyy-MM-dd").alias("week"),
                 F.col("doc_count").cast("long"))
    s = serial_diff(b, "week", "doc_count", lag=2, out_col="sdiff")
    n = normalize_buckets(s, "doc_count", "percent_of_sum", out_col="pct")
    f = bucket_selector(n, "doc_count >= 5")
    o = bucket_sort(f, [("doc_count", False), ("week", True)], size=8)
    return o.select("week", "doc_count",
                    F.col("sdiff").cast("long").alias("sdiff"),
                    F.round("pct", 6).alias("pct"))


def q_bucket_stats_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ES stats_bucket (new r5, aggs.bucket_stats): min/max/avg/sum/count
    of the per-source doc_count metric across all buckets of a terms
    aggregation — the *_bucket sibling family in one row."""
    from patapsco_spark.operators.aggs import bucket_stats
    docs = read_parquet(spark, f"{sf_dir}/documents.parquet")
    b = docs.groupBy("source").agg(F.count("*").alias("doc_count"))
    out = bucket_stats(b, "doc_count")
    return out.select(F.col("count").cast("long"),
                      F.col("min").cast("long"),
                      F.col("max").cast("long"),
                      F.round("avg", 6).alias("avg"),
                      F.col("sum").cast("long"))


SESSION_GAP = "8 hours"  # ≈ the median per-user inter-event gap at sf0.01
SESSION_GAP_US = 8 * 3600 * 1_000_000


def q_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (new r5): per-user sessions that merge events
    arriving at most SESSION_GAP apart (session_end = last event + gap,
    Spark's session_window contract; merge is gap-inclusive), top 20 by
    event count. The same sessionize plan runs on streams with
    watermark-bounded state (tests/test_session_windows.py); the oracle
    replays the islands with a lag/cumsum break at diff > gap."""
    from patapsco_spark.streaming.windows import sessionize

    ev = read_parquet(spark, f"{sf_dir}/events.parquet")
    s = sessionize(ev, gap=SESSION_GAP)
    # timestamps compare as full-precision wall-clock strings (tz-free —
    # the parquet ts is TIMESTAMP_NTZ, same convention as events_hourly)
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return (s.select(F.col("user_id").cast("long").alias("user_id"),
                     F.date_format("session_start", fmt).alias("start_ts"),
                     F.date_format("session_end", fmt).alias("end_ts"),
                     F.col("n").cast("long").alias("n"), "sum_value")
            .orderBy(F.desc("n"), "user_id", "start_ts").limit(20))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: BM25 top-k over the sf0.001 documents table."""
    return q_bm25_topk(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "bm25_topk": q_bm25_topk,
        "bm25f_topk": q_bm25f_topk,
        "dismax_topk": q_dismax_topk,
        "cross_fields_bm25": q_cross_fields_bm25,
        "federated_bm25": q_federated_bm25,
        "rrf_hybrid": q_rrf_hybrid,
        "synonym_bm25": q_synonym_bm25,
        "collapse_by_source": q_collapse_by_source,
        "percolate": q_percolate,
        "sort_by_field": q_sort_by_field,
        "match_stats": q_match_stats,
        "match_extended_stats": q_match_extended_stats,
        "match_matrix_stats": q_match_matrix_stats,
        "match_weighted_avg": q_match_weighted_avg,
        "match_multi_terms": q_match_multi_terms,
        "match_filters": q_match_filters,
        "match_pctl_ranks": q_match_pctl_ranks,
        "match_range_agg": q_match_range_agg,
        "match_top_metrics": q_match_top_metrics,
        "match_value_count": q_match_value_count,
        "geo_distance": q_geo_distance,
        "geotile_grid": q_geotile_grid,
        "adjacency_matrix": q_adjacency_matrix,
        "sampled_stats": q_sampled_stats,
        "terms_set_bm25": q_terms_set_bm25,
        "ltr_features": q_ltr_features,
        "match_histogram": q_match_histogram,
        "match_percentiles": q_match_percentiles,
        "match_cardinality": q_match_cardinality,
        "significant_terms": q_significant_terms,
        "facet_by_source": q_facet_by_source,
        "dv_sort_topk": q_dv_sort_topk,
        "dv_filtered_bm25": q_dv_filtered_bm25,
        "dv_histogram": q_dv_histogram,
        "dv_filtered_facets": q_dv_filtered_facets,
        "dv_decay_bm25": q_dv_decay_bm25,
        "page2_bm25": q_page2_bm25,
        "hit_counts": q_hit_counts,
        "mlt_bm25": q_mlt_bm25,
        "bm25_prior_topk": q_bm25_prior_topk,
        "recency_bm25": q_recency_bm25,
        "blockjoin_bm25": q_blockjoin_bm25,
        "termvectors": q_termvectors,
        "rank_feature_bm25": q_rank_feature_bm25,
        "filtered_bm25": q_filtered_bm25,
        "boosting_bm25": q_boosting_bm25,
        "pinned_bm25": q_pinned_bm25,
        "rescore_bm25": q_rescore_bm25,
        "phrase_suggest": q_phrase_suggest,
        "context_completions": q_context_completions,
        "top_hits_by_source": q_top_hits,
        "reshard_bm25": q_reshard_bm25,
        "index_stats": q_index_stats,
        "sliced_scroll": q_sliced_scroll,
        "constant_score": q_constant_score,
        "suggest_completions": q_suggest_completions,
        "suggest_spelling": q_suggest_spelling,
        "snippets": q_snippets,
        "phrase_bm25": q_phrase_bm25,
        "span_first_bm25": q_span_first_bm25,
        "phrase_prefix_bm25": q_phrase_prefix_bm25,
        "span_near_bm25": q_span_near_bm25,
        "intervals_bm25": q_intervals_bm25,
        "intervals_chain_bm25": q_intervals_chain_bm25,
        "span_not_bm25": q_span_not_bm25,
        "alias_bm25": q_alias_bm25,
        "hybrid_linear": q_hybrid_linear,
        "index_sorted_topk": q_index_sorted_topk,
        "sloppy_bm25": q_sloppy_bm25,
        "range_bm25": q_range_bm25,
        "phrase_qld": q_phrase_qld,
        "qld_topk": q_qld_topk,
        "qljm_topk": q_qljm_topk,
        "classic_topk": q_classic_topk,
        "dfr_inl2_topk": q_dfr_inl2_topk,
        "dfi_topk": q_dfi_topk,
        "pl2_topk": q_pl2_topk,
        "f2exp_topk": q_f2exp_topk,
        "ib_ll_topk": q_ib_ll_topk,
        "bool_topk": q_bool_topk,
        "psq_bm25": q_psq_bm25,
        "boolean_and_not": q_boolean_and_not,
        "boolean_nested": q_boolean_nested,
        "min_should_match": q_min_should_match,
        "wildcard_bm25": q_wildcard_bm25,
        "wildcard_general": q_wildcard_general,
        "regexp_bm25": q_regexp_bm25,
        "fuzzy_bm25": q_fuzzy_bm25,
        "delete_bm25": q_delete_bm25,
        "upsert_bm25": q_upsert_bm25,
        "token_stats": q_token_stats,
        "quality_scores": q_quality_scores,
        "language_id": q_language_id,
        "language_id_multi": q_language_id_multi,
        "bpe_token_stats": q_bpe_token_stats,
        "ulm_perplexity": q_ulm_perplexity,
        "sb_perplexity": q_sb_perplexity,
        "gopher_rules": q_gopher_rules,
        "dsir_weights": q_dsir_weights,
        "line_dedup": q_line_dedup,
        "substring_dedup": q_substring_dedup,
        "clean_funnel": q_clean_funnel,
        "pii_scrub": q_pii_scrub,
        "fingerprints": q_fingerprints,
        "repetition_stats": q_repetition_stats,
        "top_ngrams": q_top_ngrams,
        "approx_terms": q_approx_terms,
        "composite_page": q_composite_page,
        "rare_terms": q_rare_terms,
        "events_weekly": q_events_weekly,
        "pipeline_weekly": q_pipeline_weekly,
        "pipeline_weekly2": q_pipeline_weekly2,
        "bucket_stats_by_source": q_bucket_stats_by_source,
        "contamination_overlap": q_contamination_overlap,
        "url_domain_stats": q_url_domain_stats,
        "exact_dedup": q_exact_dedup,
        "minhash_signatures": q_minhash_signatures,
        "jaccard_pairs": q_jaccard_pairs,
        "dedup_clusters": q_dedup_clusters,
        "stratified_sample": q_stratified_sample,
        "temperature_mix": q_temperature_mix,
        "nb_quality": q_nb_quality,
        "cross_decontamination": q_cross_decontamination,
        "pack_sequences": q_pack_sequences,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "simhash": q_simhash,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_sq8_topk": q_ann_sq8_topk,
        "ann_batch_topk": q_ann_batch_topk,
        "ann_lsh_topk": q_ann_lsh_topk,
        "rm3_topk": q_rm3_topk,
        "rocchio_topk": q_rocchio_topk,
        "eval_metrics": q_eval_metrics,
        "html_extract_roundtrip": q_html_extract_roundtrip,
        "webpages_pipeline": q_webpages_pipeline,
        "warc_ingest": q_warc_ingest,
        "link_graph": q_link_graph,
        "anchor_texts": q_anchor_texts,
        "anchor_blobs": q_anchor_blobs,
        "latest_revision": q_latest_revision,
        "revision_stats": q_revision_stats,
        "robots_filter": q_robots_filter,
        "crawl_frontier": q_crawl_frontier,
        "main_content": q_main_content,
        "sitemap_urls": q_sitemap_urls,
        "pagerank": q_pagerank,
        "hits": q_hits,
        "pmi_collocations": q_pmi_collocations,
        "harmonic_centrality": q_harmonic_centrality,
        "cdx_index": q_cdx_index,
        "wet_export": q_wet_export,
        "media_stats": q_media_stats,
        "frame_samples": q_frame_samples,
        "image_resize_meta": q_image_resize_meta,
        "embedding_near_dup": q_embedding_near_dup,
        "embedding_dedup_clusters": q_embedding_dedup_clusters,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_filtered_topk": q_ann_filtered_topk,
        "ann_ivf_append": q_ann_ivf_append,
        "semdedup": q_semdedup,
        "ann_ivfadc_topk": q_ann_ivfadc_topk,
        "topk_window": q_topk_window,
        "lineitem_agg": q_lineitem_agg,
        "join_orders_by_nation": q_join_orders_by_nation,
        "events_hourly": q_events_hourly,
        "session_stats": q_session_stats,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

def _quant_sql(col: str) -> str:
    from patapsco_spark.functions.smallfloat import quantize_length_sql
    return quantize_length_sql(col)


def _sb_perplexity_sql(lm_hex: tuple[str, ...], alpha: float = 0.4) -> str:
    """Stupid-backoff trigram chain replayed in SQL: counts from the
    md5-chosen LM half, every doc scored, parenthesization mirroring the
    Spark expression tree for bit-stable doubles."""
    hexes = ", ".join(f"'{h}'" for h in lm_hex)
    a = repr(float(alpha))
    return rf"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\s+'), x -> x <> '') AS toks,
         substr(md5('lm-' || CAST(doc_id AS VARCHAR)), 1, 1) IN ({hexes}) AS in_lm
  FROM documents
),
t AS (
  SELECT doc_id, in_lm, toks[i] AS w,
         CASE WHEN i >= 2 THEN toks[i-1] END AS w1,
         CASE WHEN i >= 3 THEN toks[i-2] END AS w2
  FROM (SELECT doc_id, in_lm, toks, generate_subscripts(toks, 1) AS i FROM w)
),
c1 AS (SELECT w AS u_w, count(*)::DOUBLE AS c1 FROM t WHERE in_lm GROUP BY 1),
tot AS (SELECT SUM(c1) AS tot FROM c1),
c2 AS (SELECT w1 AS b_a, w AS b_b, count(*)::DOUBLE AS c2 FROM t
       WHERE in_lm AND w1 IS NOT NULL GROUP BY 1, 2),
c3 AS (SELECT w2 AS t_a, w1 AS t_b, w AS t_c, count(*)::DOUBLE AS c3 FROM t
       WHERE in_lm AND w2 IS NOT NULL GROUP BY 1, 2, 3),
scored AS (
  SELECT t.doc_id,
         -log2(CASE
            WHEN t.w2 IS NOT NULL THEN
              CASE WHEN c3.c3 IS NOT NULL THEN c3.c3 / cx.c2
                   WHEN c2.c2 IS NOT NULL THEN {a} * (c2.c2 / c1x.c1)
                   ELSE {a} * ({a} * (COALESCE(c1.c1, 1.0) / tot.tot)) END
            WHEN t.w1 IS NOT NULL THEN
              CASE WHEN c2.c2 IS NOT NULL THEN c2.c2 / c1x.c1
                   ELSE {a} * (COALESCE(c1.c1, 1.0) / tot.tot) END
            ELSE COALESCE(c1.c1, 1.0) / tot.tot END) AS nll
  FROM t
  LEFT JOIN c3 ON c3.t_a = t.w2 AND c3.t_b = t.w1 AND c3.t_c = t.w
  LEFT JOIN c2 cx ON cx.b_a = t.w2 AND cx.b_b = t.w1
  LEFT JOIN c2 ON c2.b_a = t.w1 AND c2.b_b = t.w
  LEFT JOIN c1 c1x ON c1x.u_w = t.w1
  LEFT JOIN c1 ON c1.u_w = t.w
  CROSS JOIN tot
),
per AS (SELECT doc_id, count(*)::BIGINT AS n_tokens, AVG(nll) AS ce
        FROM scored GROUP BY doc_id)
SELECT d.doc_id, COALESCE(p.n_tokens, 0) AS n_tokens,
       ROUND(p.ce, 6) AS sb_cross_entropy,
       ROUND(POW(2.0, p.ce), 4) AS sb_perplexity
FROM documents d LEFT JOIN per p USING (doc_id)
"""


_TOK_CTES = """
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok WHERE term <> ''
  GROUP BY doc_id, term
),
dl AS (
  SELECT doc_id, count(*)::BIGINT AS dl FROM tok WHERE term <> ''
  GROUP BY doc_id
),
stats AS (
  SELECT (SELECT count(*) FROM documents)::DOUBLE AS n,
         CAST(CAST(sum(dl) AS DOUBLE) / (SELECT count(*) FROM documents) AS REAL)::DOUBLE AS avgdl,
         sum(dl)::DOUBLE AS total_tf
  FROM dl
)
"""


def _bm25_sql(query_terms: list[str], k1: float, b: float, k: int,
              raw: bool = False) -> str:
    vals = ", ".join(f"('{t}')" for t in query_terms)
    quant = _quant_sql("dl.dl")
    return f"""
WITH {_TOK_CTES},
qterms(term) AS (VALUES {vals}),
dfs AS (
  SELECT tf.term, count(*)::DOUBLE AS df FROM tf JOIN qterms USING (term)
  GROUP BY tf.term
),
scores AS (
  SELECT tf.doc_id,
         list_aggregate(list(
             ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * {quant} / stats.avgdl))
             ORDER BY tf.term), 'sum') AS score
  FROM tf
  JOIN qterms USING (term)
  JOIN dfs ON dfs.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       {"score" if raw else "ROUND(score, 5) AS score"}
FROM scores
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _bm25f_sql(query_terms: list[str], weights: dict, bs: dict,
               k1: float, k: int, title_toks: int = 4) -> str:
    """Full SQL replay of q_bm25f_topk: the field split from the raw text
    (UNFILTERED token slices, '' dropped afterwards — Python split
    semantics), per-field tf/dl, per-field avgdl with the float32
    round-trip, SmallFloat dl quantization, the field combine folded in
    field-name order, document-level idf, and the term fold in term order
    — every float expression parenthesized exactly as the Spark plan."""
    vals = ", ".join(f"('{t}')" for t in query_terms)
    quant = _quant_sql("fdl.dl")
    w_t, w_b = repr(float(weights["title"])), repr(float(weights["body"]))
    ob_t, b_t = repr(1.0 - float(bs["title"])), repr(float(bs["title"]))
    ob_b, b_b = repr(1.0 - float(bs["body"])), repr(float(bs["body"]))
    return f"""
WITH qterms(term) AS (VALUES {vals}),
ftok AS (
  SELECT doc_id, 'title' AS fld,
         unnest(list_slice(string_split(text, ' '), 1, {title_toks})) AS term
  FROM documents
  UNION ALL
  SELECT doc_id, 'body' AS fld,
         unnest(list_slice(string_split(text, ' '), {title_toks + 1},
                           len(string_split(text, ' ')))) AS term
  FROM documents
),
ftf AS (
  SELECT doc_id, fld, term, count(*)::DOUBLE AS tf FROM ftok
  WHERE term <> '' GROUP BY doc_id, fld, term
),
fdl AS (
  SELECT doc_id, fld, count(*)::BIGINT AS dl FROM ftok
  WHERE term <> '' GROUP BY doc_id, fld
),
favg AS (
  SELECT fld, CAST(CAST(sum(dl) AS DOUBLE)
                   / (SELECT count(*) FROM documents) AS REAL)::DOUBLE AS avgdl
  FROM fdl GROUP BY fld
),
fnorm AS (
  SELECT ftf.doc_id, ftf.term, ftf.fld,
         CASE ftf.fld
           WHEN 'body' THEN {w_b} * ftf.tf / ({ob_b} + {b_b} * {quant} / fa.avgdl)
           ELSE {w_t} * ftf.tf / ({ob_t} + {b_t} * {quant} / fa.avgdl)
         END AS v
  FROM ftf
  JOIN qterms USING (term)
  JOIN fdl ON fdl.doc_id = ftf.doc_id AND fdl.fld = ftf.fld
  JOIN favg fa ON fa.fld = ftf.fld
),
tfn AS (
  SELECT doc_id, term, list_aggregate(list(v ORDER BY fld), 'sum') AS tfn
  FROM fnorm GROUP BY doc_id, term
),
dfs AS (
  SELECT term, count(*)::DOUBLE AS df FROM tfn GROUP BY term
),
scores AS (
  SELECT tfn.doc_id,
         list_aggregate(list(
             ln(1 + ((SELECT count(*) FROM documents)::DOUBLE - dfs.df + 0.5)
                     / (dfs.df + 0.5))
              * tfn.tfn / ({repr(float(k1))} + tfn.tfn)
             ORDER BY tfn.term), 'sum') AS score
  FROM tfn JOIN dfs ON dfs.term = tfn.term
  GROUP BY tfn.doc_id
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM scores
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _cross_fields_sql(query_terms: list[str], boosts: dict, tie: float,
                      k1: float, b: float, k: int,
                      title_toks: int = 4) -> str:
    """Full SQL replay of q_cross_fields_bm25: the field split, per-field
    tf/dl/avgdl (SmallFloat dl quantization, float32 avgdl round-trip),
    the BLENDED df (max across fields) feeding one idf per term, the
    per-term dismax with the field-ordered fold, and the term-ordered
    document fold — every float expression parenthesized exactly as the
    Spark plan in operators/bm25f.py search_cross_fields."""
    vals = ", ".join(f"('{t}')" for t in query_terms)
    quant = _quant_sql("fdl.dl")
    b_t, b_b = repr(float(boosts["title"])), repr(float(boosts["body"]))
    k1r, br, obr = repr(float(k1)), repr(float(b)), repr(1.0 - float(b))
    tier = repr(float(tie))
    return f"""
WITH qterms(term) AS (VALUES {vals}),
ftok AS (
  SELECT doc_id, 'title' AS fld,
         unnest(list_slice(string_split(text, ' '), 1, {title_toks})) AS term
  FROM documents
  UNION ALL
  SELECT doc_id, 'body' AS fld,
         unnest(list_slice(string_split(text, ' '), {title_toks + 1},
                           len(string_split(text, ' ')))) AS term
  FROM documents
),
ftf AS (
  SELECT doc_id, fld, term, count(*)::DOUBLE AS tf FROM ftok
  WHERE term <> '' GROUP BY doc_id, fld, term
),
fdl AS (
  SELECT doc_id, fld, count(*)::BIGINT AS dl FROM ftok
  WHERE term <> '' GROUP BY doc_id, fld
),
favg AS (
  SELECT fld, CAST(CAST(sum(dl) AS DOUBLE)
                   / (SELECT count(*) FROM documents) AS REAL)::DOUBLE AS avgdl
  FROM fdl GROUP BY fld
),
fdf AS (
  SELECT fld, ftf.term, count(*)::DOUBLE AS df
  FROM ftf JOIN qterms USING (term) GROUP BY fld, ftf.term
),
bdf AS (
  SELECT term, max(df) AS df FROM fdf GROUP BY term
),
tsc AS (
  SELECT ftf.doc_id, ftf.term, ftf.fld,
         ((CASE ftf.fld WHEN 'title' THEN {b_t} ELSE {b_b} END) * ftf.tf
          / (ftf.tf + {k1r} * ({obr} + {br} * {quant} / fa.avgdl)))
         * ln(1 + ((SELECT count(*) FROM documents)::DOUBLE - bdf.df + 0.5)
                  / (bdf.df + 0.5)) AS v
  FROM ftf
  JOIN qterms USING (term)
  JOIN bdf ON bdf.term = ftf.term
  JOIN fdl ON fdl.doc_id = ftf.doc_id AND fdl.fld = ftf.fld
  JOIN favg fa ON fa.fld = ftf.fld
),
tcomb AS (
  SELECT doc_id, term, max(v) AS mx,
         list_aggregate(list(v ORDER BY fld), 'sum') AS sm
  FROM tsc GROUP BY doc_id, term
),
dscore AS (
  SELECT doc_id,
         list_aggregate(list(mx + {tier} * (sm - mx) ORDER BY term),
                        'sum') AS score
  FROM tcomb GROUP BY doc_id
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC,
                           CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM dscore
ORDER BY 2
LIMIT {k}
"""


def _top_hits_sql(query_terms: list[str], k1: float, b: float,
                  n: int) -> str:
    """Oracle for q_top_hits: full-match-set BM25 scores joined to the
    source field, per-source rank window cut at n."""
    vals = ", ".join(f"('{t}')" for t in query_terms)
    quant = _quant_sql("dl.dl")
    return f"""
WITH {_TOK_CTES},
qterms(term) AS (VALUES {vals}),
dfs AS (
  SELECT tf.term, count(*)::DOUBLE AS df FROM tf JOIN qterms USING (term)
  GROUP BY tf.term
),
scores AS (
  SELECT tf.doc_id,
         list_aggregate(list(
             ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * {quant} / stats.avgdl))
             ORDER BY tf.term), 'sum') AS score
  FROM tf
  JOIN qterms USING (term)
  JOIN dfs ON dfs.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
),
hit AS (
  SELECT s.doc_id, s.score, d.source FROM scores s
  JOIN documents d USING (doc_id)
)
SELECT source AS src, (rn - 1)::BIGINT AS hit_rank, doc_id,
       ROUND(score, 5) AS score
FROM (
  SELECT *, row_number() OVER (PARTITION BY source
                               ORDER BY score DESC,
                                        CAST(doc_id AS VARCHAR) ASC) AS rn
  FROM hit
) WHERE rn <= {n}
ORDER BY src, hit_rank
"""


def _approx_terms_sql(size: int, shard_size: int, n_shards: int) -> str:
    """Oracle for q_approx_terms: replays the ENTIRE shard-estimation —
    md5-mod shard routing, per-shard top-shard_size cut, cutoff =
    smallest reported count only when the shard actually cut, partial-sum
    doc_count and err_bound = total_cutoff − Σ cutoff(reporting shards)."""
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
dt AS (SELECT DISTINCT doc_id, term FROM tok WHERE term <> ''),
sh AS (
  SELECT ('0x' || substr(md5(COALESCE(CAST(doc_id AS VARCHAR), '')), 1, 4))
           ::BIGINT % {n_shards} AS shard,
         term
  FROM dt
),
ps AS (SELECT shard, term, count(*)::BIGINT AS cnt FROM sh
       GROUP BY shard, term),
rk AS (SELECT shard, term, cnt,
              row_number() OVER (PARTITION BY shard
                                 ORDER BY cnt DESC, term ASC) AS rk
       FROM ps),
cut AS (SELECT shard,
               (CASE WHEN count(*) > {shard_size}
                     THEN min(CASE WHEN rk <= {shard_size} THEN cnt END)
                     ELSE 0 END)::BIGINT AS cutoff
        FROM rk GROUP BY shard),
tot AS (SELECT sum(cutoff)::BIGINT AS total_cutoff FROM cut),
comb AS (SELECT term, sum(cnt)::BIGINT AS doc_count,
                sum(cutoff)::BIGINT AS rep_cutoff
         FROM rk JOIN cut USING (shard)
         WHERE rk <= {shard_size} GROUP BY term)
SELECT term, doc_count,
       (tot.total_cutoff - comb.rep_cutoff)::BIGINT AS err_bound,
       (row_number() OVER (ORDER BY doc_count DESC, term ASC) - 1)::BIGINT AS rnk
FROM comb CROSS JOIN tot
ORDER BY doc_count DESC, term ASC
LIMIT {size}
"""


def _sliced_scroll_sql(query_terms: list[str], slice_id: int,
                       num_slices: int) -> str:
    """Oracle for q_sliced_scroll: the OR match set filtered by the same
    md5-hex-prefix mod as aggs.slice_matches."""
    return f"""
{_matchset_prefix(query_terms)}
SELECT doc_id FROM matched
WHERE ('0x' || substr(md5(COALESCE(CAST(doc_id AS VARCHAR), '')), 1, 4))
        ::BIGINT % {num_slices} = {slice_id}
ORDER BY doc_id
"""


def _phrase_suggest_sql(tokens: list[str], k: int, max_candidates: int,
                        max_edits: int = 2, min_cf: int = 2,
                        alpha: float = 0.4) -> str:
    """Oracle for q_phrase_suggest: dictionary + per-position candidate
    cuts + bigram counts + the stupid-backoff chain, with the log-prob
    sum left-associated exactly like the Python fold."""
    a = repr(float(alpha))
    cand_ctes, combo_from = [], []
    for i, tok in enumerate(tokens):
        n = len(tok)
        cand_ctes.append(f"""cand{i} AS (
  SELECT term FROM (
    SELECT term, levenshtein(term, '{tok}') AS dist, cf
    FROM dict
    WHERE length(term) BETWEEN {n - max_edits} AND {n + max_edits}
      AND cf >= {min_cf} AND term LIKE '{tok[0]}%'
      AND levenshtein(term, '{tok}') <= {max_edits}
    ORDER BY dist, cf DESC, term LIMIT {max_candidates})
)""")
        combo_from.append(f"cand{i} c{i}")

    def u(w: str) -> str:
        return (f"(CASE WHEN u_{w}.n IS NOT NULL THEN CAST(u_{w}.n AS DOUBLE)"
                f" / tot.total ELSE {a} / tot.total END)")

    parts = [f"ln({u('w0')})"]
    joins = ["LEFT JOIN c1 u_w0 ON u_w0.w = c0.term"]
    for i in range(1, len(tokens)):
        joins.append(f"LEFT JOIN c1 u_w{i} ON u_w{i}.w = c{i}.term")
        joins.append(f"LEFT JOIN bc b{i} ON b{i}.a = c{i-1}.term"
                     f" AND b{i}.b = c{i}.term")
        parts.append(
            f"(CASE WHEN b{i}.n IS NOT NULL THEN"
            f" ln(CAST(b{i}.n AS DOUBLE) / u_w{i-1}.n)"
            f" ELSE ln({a} * {u(f'w{i}')}) END)")
    logp = " + ".join(parts)
    suggestion = " || ' ' || ".join(f"c{i}.term" for i in range(len(tokens)))
    return f"""
WITH w AS (
  SELECT list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
  FROM documents
),
t AS (SELECT unnest(toks) AS term FROM w),
dict AS (SELECT term, count(*)::BIGINT AS cf FROM t GROUP BY term),
c1 AS (SELECT term AS w, count(*)::BIGINT AS n FROM t GROUP BY term),
tot AS (SELECT count(*)::BIGINT AS total FROM t),
big AS (
  SELECT toks[i] AS ba, toks[i + 1] AS bb
  FROM (SELECT toks, generate_subscripts(toks, 1) AS i FROM w)
  WHERE i < len(toks)
),
bc AS (SELECT ba AS a, bb AS b, count(*)::BIGINT AS n FROM big GROUP BY 1, 2),
{", ".join(cand_ctes)}
SELECT {suggestion} AS suggestion, ROUND({logp}, 6) AS logp
FROM {" CROSS JOIN ".join(combo_from)}
CROSS JOIN tot
{chr(10).join(joins)}
ORDER BY {logp} DESC, suggestion ASC
LIMIT {k}
"""


def _context_completions_sql(prefix: str, prev: str, max_candidates: int,
                             k: int, alpha: float = 0.4) -> str:
    """Oracle for q_context_completions: dictionary pool by (cf desc,
    term asc), bigram counts against the context word, and the exact
    stupid-backoff probability with the engine's tie order."""
    a = repr(float(alpha))
    return f"""
WITH w AS (
  SELECT list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
  FROM documents
),
t AS (SELECT unnest(toks) AS w FROM w),
dict AS (SELECT w AS term, count(*)::BIGINT AS cf FROM t GROUP BY w),
pool AS (
  SELECT term, cf FROM dict WHERE term LIKE '{prefix}%'
  ORDER BY cf DESC, term ASC LIMIT {max_candidates}
),
tot AS (SELECT count(*)::BIGINT AS n FROM t),
c1p AS (SELECT count(*)::BIGINT AS n FROM t WHERE w = '{prev}'),
pr AS (
  SELECT toks[i] AS a, toks[i + 1] AS b
  FROM (SELECT toks, generate_subscripts(toks, 1) AS i FROM w)
  WHERE i < len(toks)
),
bc AS (
  SELECT b, count(*)::BIGINT AS n FROM pr
  WHERE a = '{prev}' AND b IN (SELECT term FROM pool) GROUP BY b
),
scored AS (
  SELECT pool.term AS suggestion, pool.cf,
         CASE WHEN bc.n IS NOT NULL AND bc.n > 0
              THEN CAST(bc.n AS DOUBLE) / c1p.n
              ELSE {a} * (CASE WHEN pool.cf > 0
                               THEN CAST(pool.cf AS DOUBLE) / tot.n
                               ELSE {a} / tot.n END)
         END AS prob0
  FROM pool LEFT JOIN bc ON bc.b = pool.term
  CROSS JOIN tot CROSS JOIN c1p
)
SELECT suggestion, ROUND(prob0, 6) AS prob, cf
FROM scored
-- engine sorts by the UNROUNDED probability; prob0 keeps that order
ORDER BY prob0 DESC, cf DESC, suggestion ASC
LIMIT {k}
"""


def _rescore_sql(primary_terms: list[str], secondary_terms: list[str],
                 qw: float, rw: float, k1: float, b: float,
                 window: int, k: int) -> str:
    """Oracle for q_rescore_bm25: primary BM25 replay cut to the window
    by primary order, secondary BM25 replay over the same tf/dl/stats
    CTEs, then qw·primary + rw·COALESCE(secondary, 0) and the final
    rank window — parenthesized exactly as the Spark plan."""
    base = _bm25_sql(primary_terms, k1, b, window)
    head, _, _ = base.rpartition("SELECT doc_id,")
    vals2 = ", ".join(f"('{t}')" for t in sorted(set(secondary_terms)))
    quant = _quant_sql("dl.dl")
    qwr, rwr = repr(float(qw)), repr(float(rw))
    return head + f""",
stage1 AS (
  SELECT doc_id, score FROM scores
  ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC LIMIT {window}),
qt2(term) AS (VALUES {vals2}),
dfs2 AS (
  SELECT tf.term, count(*)::DOUBLE AS df FROM tf JOIN qt2 USING (term)
  GROUP BY tf.term
),
s2 AS (
  SELECT tf.doc_id,
         list_aggregate(list(
             ln(1 + (stats.n - dfs2.df + 0.5) / (dfs2.df + 0.5))
              * tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * {quant} / stats.avgdl))
             ORDER BY tf.term), 'sum') AS score
  FROM tf
  JOIN qt2 USING (term)
  JOIN dfs2 ON dfs2.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
),
blended AS (
  SELECT st.doc_id,
         {qwr} * st.score + {rwr} * COALESCE(s2.score, 0.0) AS score
  FROM stage1 st LEFT JOIN s2 USING (doc_id)
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC,
                           CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM blended
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _pinned_sql(query_terms: list[str], pinned_ids: tuple,
                k1: float, b: float, k: int) -> str:
    """Oracle for q_pinned_bm25: BM25 replay, pins removed from the
    organic set and re-added with the 1e9 − slot ladder, one rank
    window. Equivalent to the engine's organic-top-k-then-dedup: the
    final cut keeps k − |pins∩top-k| organic rows, which never reaches
    past the organic k-th."""
    vals = ", ".join(f"('{t}')" for t in query_terms)
    pvals = ", ".join(f"({int(d)}, {i})" for i, d in enumerate(pinned_ids))
    quant = _quant_sql("dl.dl")
    return f"""
WITH {_TOK_CTES},
qterms(term) AS (VALUES {vals}),
dfs AS (
  SELECT tf.term, count(*)::DOUBLE AS df FROM tf JOIN qterms USING (term)
  GROUP BY tf.term
),
scores AS (
  SELECT tf.doc_id,
         list_aggregate(list(
             ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * {quant} / stats.avgdl))
             ORDER BY tf.term), 'sum') AS score
  FROM tf
  JOIN qterms USING (term)
  JOIN dfs ON dfs.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
),
pins(doc_id, slot) AS (VALUES {pvals}),
pinr AS (
  SELECT p.doc_id, 1000000000.0 - p.slot AS score
  FROM pins p JOIN documents d USING (doc_id)
),
org AS (
  SELECT s.doc_id, s.score FROM scores s
  LEFT JOIN pins USING (doc_id) WHERE pins.doc_id IS NULL
),
u AS (SELECT * FROM pinr UNION ALL SELECT * FROM org)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC,
                           CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM u
ORDER BY 2
LIMIT {k}
"""


def _boosting_sql(query_terms: list[str], neg_term: str, neg_boost: float,
                  k1: float, b: float, k: int) -> str:
    """Oracle for q_boosting_bm25: the _bm25_sql replay with a
    conditional ``score * neg_boost`` for docs containing the negative
    term, applied before the rank window."""
    vals = ", ".join(f"('{t}')" for t in query_terms)
    quant = _quant_sql("dl.dl")
    nb = repr(float(neg_boost))
    return f"""
WITH {_TOK_CTES},
qterms(term) AS (VALUES {vals}),
dfs AS (
  SELECT tf.term, count(*)::DOUBLE AS df FROM tf JOIN qterms USING (term)
  GROUP BY tf.term
),
scores AS (
  SELECT tf.doc_id,
         list_aggregate(list(
             ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * {quant} / stats.avgdl))
             ORDER BY tf.term), 'sum') AS score
  FROM tf
  JOIN qterms USING (term)
  JOIN dfs ON dfs.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
),
neg AS (SELECT DISTINCT doc_id FROM tf WHERE term = '{neg_term}'),
demoted AS (
  SELECT s.doc_id,
         CASE WHEN n.doc_id IS NOT NULL THEN s.score * {nb}
              ELSE s.score END AS score
  FROM scores s LEFT JOIN neg n USING (doc_id)
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC,
                           CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM demoted
ORDER BY 2
LIMIT {k}
"""


def _constant_score_sql(query_terms: list[str], boost: float,
                        k: int) -> str:
    """Oracle for q_constant_score: the OR match set, docid-order ties
    (external-id string sort), fixed score."""
    vals = ", ".join(f"('{t}')" for t in query_terms)
    return f"""
WITH {_TOK_CTES},
qterms(term) AS (VALUES {vals}),
matched AS (SELECT DISTINCT tf.doc_id FROM tf JOIN qterms USING (term))
SELECT doc_id,
       (row_number() OVER (ORDER BY CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT
         AS rnk,
       {repr(float(boost))} AS score
FROM matched
ORDER BY 2
LIMIT {k}
"""


def _filtered_bm25_sql(query_terms: list[str], pred_sql: str,
                       k1: float, b: float, k: int) -> str:
    """Oracle for q_filtered_bm25: the unrestricted BM25 replay of
    _bm25_sql, with the filter predicate applied to the scored set BEFORE
    the rank window (WHERE precedes window evaluation in SQL) — exactly
    search_filtered's filter-then-top-k order."""
    vals = ", ".join(f"('{t}')" for t in query_terms)
    quant = _quant_sql("dl.dl")
    return f"""
WITH {_TOK_CTES},
qterms(term) AS (VALUES {vals}),
dfs AS (
  SELECT tf.term, count(*)::DOUBLE AS df FROM tf JOIN qterms USING (term)
  GROUP BY tf.term
),
scores AS (
  SELECT tf.doc_id,
         list_aggregate(list(
             ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * {quant} / stats.avgdl))
             ORDER BY tf.term), 'sum') AS score
  FROM tf
  JOIN qterms USING (term)
  JOIN dfs ON dfs.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id, rnk, score FROM (
  SELECT s.doc_id,
         (row_number() OVER (ORDER BY s.score DESC,
                             CAST(s.doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
         ROUND(s.score, 5) AS score
  FROM scores s JOIN documents d USING (doc_id)
  WHERE {pred_sql}
)
WHERE rnk < {k}
ORDER BY rnk
"""


def _dismax_sql(query_terms: list[str], boosts: dict, tie: float,
                k1: float, b: float, k: int, title_toks: int = 4) -> str:
    """Full SQL replay of q_dismax_topk: per-field independent BM25 (each
    field's own df/dl/avgdl, SmallFloat dl quantization, term-ordered
    fold), boost multiply, then max + tie·(sum − max) with the sum folded
    in field-name order — parenthesized exactly as the Spark plan."""
    vals = ", ".join(f"('{t}')" for t in query_terms)
    quant = _quant_sql("fdl.dl")
    b_t, b_b = repr(float(boosts["title"])), repr(float(boosts["body"]))
    k1r, br, tier = repr(float(k1)), repr(float(b)), repr(float(tie))
    return f"""
WITH qterms(term) AS (VALUES {vals}),
ftok AS (
  SELECT doc_id, 'title' AS fld,
         unnest(list_slice(string_split(text, ' '), 1, {title_toks})) AS term
  FROM documents
  UNION ALL
  SELECT doc_id, 'body' AS fld,
         unnest(list_slice(string_split(text, ' '), {title_toks + 1},
                           len(string_split(text, ' ')))) AS term
  FROM documents
),
ftf AS (
  SELECT doc_id, fld, term, count(*)::DOUBLE AS tf FROM ftok
  WHERE term <> '' GROUP BY doc_id, fld, term
),
fdl AS (
  SELECT doc_id, fld, count(*)::BIGINT AS dl FROM ftok
  WHERE term <> '' GROUP BY doc_id, fld
),
favg AS (
  SELECT fld, CAST(CAST(sum(dl) AS DOUBLE)
                   / (SELECT count(*) FROM documents) AS REAL)::DOUBLE AS avgdl
  FROM fdl GROUP BY fld
),
fdf AS (
  SELECT fld, ftf.term, count(*)::DOUBLE AS df
  FROM ftf JOIN qterms USING (term) GROUP BY fld, ftf.term
),
fscore AS (
  SELECT ftf.doc_id, ftf.fld,
         list_aggregate(list(
             ln(1 + ((SELECT count(*) FROM documents)::DOUBLE - fdf.df + 0.5)
                     / (fdf.df + 0.5))
              * ftf.tf
              / (ftf.tf + {k1r} * (1 - {br} + {br} * {quant} / fa.avgdl))
             ORDER BY ftf.term), 'sum') AS s
  FROM ftf
  JOIN qterms USING (term)
  JOIN fdf ON fdf.fld = ftf.fld AND fdf.term = ftf.term
  JOIN fdl ON fdl.doc_id = ftf.doc_id AND fdl.fld = ftf.fld
  JOIN favg fa ON fa.fld = ftf.fld
  GROUP BY ftf.doc_id, ftf.fld
),
boosted AS (
  SELECT doc_id, fld,
         s * (CASE fld WHEN 'title' THEN {b_t} ELSE {b_b} END) AS v
  FROM fscore
),
comb AS (
  SELECT doc_id, max(v) AS mx,
         list_aggregate(list(v ORDER BY fld), 'sum') AS sm
  FROM boosted GROUP BY doc_id
)
SELECT doc_id,
       (row_number() OVER (ORDER BY (mx + {tier} * (sm - mx)) DESC,
                           CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(mx + {tier} * (sm - mx), 5) AS score
FROM comb
ORDER BY 2
LIMIT {k}
"""


_MATCHED_CTE = """
matched AS (SELECT DISTINCT tf.doc_id FROM tf JOIN qterms USING (term))"""


def _matchset_prefix(query_terms: list[str]) -> str:
    vals = ", ".join(f"('{t}')" for t in query_terms)
    return f"WITH {_TOK_CTES},\nqterms(term) AS (VALUES {vals}),{_MATCHED_CTE}"


def _ltr_features_sql(query_terms: list[str], k1: float, b: float,
                      mu: int) -> str:
    """Oracle for q_ltr_features: both score kernels (the _bm25/_qld
    folds), the per-doc term aggregates, the quantized dl, and the
    term-asc idf fold — one row per matched doc, no rank cut."""
    qts = sorted(set(query_terms))
    vals = ", ".join(f"('{t}')" for t in qts)
    quant = _quant_sql("dl.dl")
    return f"""
WITH {_TOK_CTES},
qterms(term) AS (VALUES {vals}),
dfs AS (
  SELECT tf.term, count(*)::DOUBLE AS df FROM tf JOIN qterms USING (term)
  GROUP BY tf.term
),
cfs AS (
  SELECT tf.term, sum(tf.tf) AS cf FROM tf JOIN qterms USING (term)
  GROUP BY tf.term
),
bscore AS (
  SELECT tf.doc_id,
         list_aggregate(list(
             ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * {quant} / stats.avgdl))
             ORDER BY tf.term), 'sum') AS score
  FROM tf JOIN qterms USING (term) JOIN dfs ON dfs.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats
  GROUP BY tf.doc_id
),
qscore AS (
  SELECT tf.doc_id,
         list_aggregate(list(GREATEST(
             ln(1 + tf.tf / ({mu} * (cfs.cf + 1) / (stats.total_tf + 1)))
             + ln({mu} / ({quant} + {mu})), 0) ORDER BY tf.term), 'sum') AS score
  FROM tf JOIN qterms USING (term) JOIN cfs ON cfs.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats
  GROUP BY tf.doc_id
),
tagg AS (
  SELECT tf.doc_id, count(*)::BIGINT AS n_matched,
         sum(tf.tf)::BIGINT AS sum_tf, max(tf.tf)::BIGINT AS max_tf,
         min(tf.tf)::BIGINT AS min_tf,
         list_aggregate(list(
             ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
             ORDER BY tf.term), 'sum') AS sum_idf
  FROM tf JOIN qterms USING (term) JOIN dfs ON dfs.term = tf.term
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT b.doc_id,
       ROUND(b.score, 5) AS bm25,
       ROUND(COALESCE(q.score, 0.0), 5) AS qld,
       t.n_matched,
       ROUND(t.n_matched::DOUBLE / {len(qts)}, 6) AS match_ratio,
       t.sum_tf, t.max_tf, t.min_tf,
       {quant}::BIGINT AS dlq,
       ROUND(t.sum_idf, 5) AS sum_idf
FROM bscore b
LEFT JOIN qscore q ON q.doc_id = b.doc_id
JOIN tagg t ON t.doc_id = b.doc_id
JOIN dl ON dl.doc_id = b.doc_id
"""


def _terms_set_sql(query_terms: list[str], k1: float, b: float,
                   k: int) -> str:
    """Oracle for q_terms_set_bm25: per-(doc, term) single-term BM25, the
    term-asc fold, cnt = distinct matched members, admission
    cnt ≥ GREATEST(2 + n_chars % 3, 1), then the rank window."""
    vals = ", ".join(f"('{t}')" for t in sorted(set(query_terms)))
    quant = _quant_sql("dl.dl")
    return f"""
WITH {_TOK_CTES},
qterms(term) AS (VALUES {vals}),
dfs AS (
  SELECT tf.term, count(*)::DOUBLE AS df FROM tf JOIN qterms USING (term)
  GROUP BY tf.term
),
tsc AS (
  SELECT tf.doc_id, tf.term,
         ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
          * tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * {quant} / stats.avgdl))
          AS v
  FROM tf
  JOIN qterms USING (term)
  JOIN dfs ON dfs.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
),
agg AS (
  SELECT doc_id, count(*)::BIGINT AS cnt,
         list_aggregate(list(v ORDER BY term), 'sum') AS score
  FROM tsc GROUP BY doc_id
),
hit AS (
  SELECT a.doc_id, a.score FROM agg a JOIN documents d USING (doc_id)
  WHERE a.cnt >= GREATEST(2 + d.n_chars % 3, 1)
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM hit
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _sampled_stats_sql(query_terms: list[str], k1: float, b: float,
                       shard_size: int, max_per_value: int) -> str:
    """Oracle for q_sampled_stats: full-match-set BM25 scores (the
    _top_hits_sql scores CTE), the diversity window per source, the
    global sample window, then the stats row — both windows ordered
    (score desc, doc_id-string asc), the engine's docid tie-break."""
    vals = ", ".join(f"('{t}')" for t in query_terms)
    quant = _quant_sql("dl.dl")
    return f"""
WITH {_TOK_CTES},
qterms(term) AS (VALUES {vals}),
dfs AS (
  SELECT tf.term, count(*)::DOUBLE AS df FROM tf JOIN qterms USING (term)
  GROUP BY tf.term
),
scores AS (
  SELECT tf.doc_id,
         list_aggregate(list(
             ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * {quant} / stats.avgdl))
             ORDER BY tf.term), 'sum') AS score
  FROM tf
  JOIN qterms USING (term)
  JOIN dfs ON dfs.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
),
hit AS (
  SELECT s.doc_id, s.score, d.source, d.n_chars FROM scores s
  JOIN documents d USING (doc_id)
),
div AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY source
                                 ORDER BY score DESC,
                                          CAST(doc_id AS VARCHAR) ASC) AS rv
    FROM hit
  ) WHERE source IS NULL OR rv <= {max_per_value}
),
samp AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (ORDER BY score DESC,
                                          CAST(doc_id AS VARCHAR) ASC) AS rn
    FROM div
  ) WHERE rn <= {shard_size}
)
SELECT count(*)::BIGINT AS cnt,
       min(n_chars)::BIGINT AS min_v,
       max(n_chars)::BIGINT AS max_v,
       sum(n_chars)::BIGINT AS sum_v,
       ROUND(sum(n_chars)::DOUBLE / count(*), 6) AS avg_v
FROM samp
"""


def _adjacency_sql(filters: list[str]) -> str:
    """Oracle for q_adjacency_matrix: the distinct (filter, doc) match
    sets self-joined name-ordered — diagonal rows keep the bare name,
    off-diagonal rows the 'a&b' key — replaying the engine's per-doc pair
    expansion exactly (empty intersections appear in neither)."""
    vals = ", ".join(f"('{t}')" for t in filters)
    return f"""
WITH {_TOK_CTES},
flt(name) AS (VALUES {vals}),
matched AS (
  SELECT DISTINCT f.name, tf.doc_id
  FROM tf JOIN flt f ON tf.term = f.name
),
pairs AS (
  SELECT CASE WHEN m1.name = m2.name THEN m1.name
              ELSE m1.name || '&' || m2.name END AS key,
         m1.doc_id
  FROM matched m1
  JOIN matched m2 ON m1.doc_id = m2.doc_id AND m1.name <= m2.name
)
SELECT key, count(*)::BIGINT AS doc_count
FROM pairs GROUP BY key ORDER BY key
"""


def _dv_histogram_sql(query_terms: list[str], interval: float) -> str:
    """Oracle for the doc-values histogram: floor(n_chars / interval) ·
    interval buckets over the OR match set, NULL values unbucketed."""
    return f"""
{_matchset_prefix(query_terms)}
SELECT floor(d.n_chars / {interval}) * {interval} AS bucket,
       count(*)::BIGINT AS cnt
FROM matched m JOIN documents d USING (doc_id)
WHERE d.n_chars IS NOT NULL
GROUP BY bucket
ORDER BY bucket
"""


def _sort_by_field_sql(query_terms: list[str], k: int) -> str:
    """Oracle for sort-by-field: the OR match set ordered by n_chars desc,
    doc_id-string asc tie-break, cut to k."""
    return f"""
{_matchset_prefix(query_terms)}
SELECT doc_id, rnk, n_chars FROM (
  SELECT m.doc_id,
         (row_number() OVER (ORDER BY d.n_chars DESC,
                             CAST(m.doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
         d.n_chars::BIGINT AS n_chars
  FROM matched m JOIN documents d USING (doc_id)
) WHERE rnk < {k}
ORDER BY rnk
"""


def _dv_filtered_bm25_sql(query_terms: list[str], lo: float, hi: float,
                          k1: float, b: float, k: int) -> str:
    """Filter-context BM25 replay: membership restricted to n_chars ∈
    [lo, hi] (missing never matches), scores from the UNRESTRICTED corpus
    statistics — the exact per-term fold of _bm25_sql."""
    vals = ", ".join(f"('{t}')" for t in query_terms)
    quant = _quant_sql("dl.dl")
    return f"""
WITH {_TOK_CTES},
qterms(term) AS (VALUES {vals}),
dfs AS (
  SELECT tf.term, count(*)::DOUBLE AS df FROM tf JOIN qterms USING (term)
  GROUP BY tf.term
),
scores AS (
  SELECT tf.doc_id,
         list_aggregate(list(
             ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * {quant} / stats.avgdl))
             ORDER BY tf.term), 'sum') AS score
  FROM tf
  JOIN qterms USING (term)
  JOIN dfs ON dfs.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  JOIN documents doc ON doc.doc_id = tf.doc_id
  CROSS JOIN stats
  WHERE doc.n_chars IS NOT NULL AND doc.n_chars >= {lo} AND doc.n_chars <= {hi}
  GROUP BY tf.doc_id
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM scores
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _dv_decay_bm25_sql(query_terms: list[str], origin: float, scale: float,
                       k1: float, b: float, k: int) -> str:
    """Gauss-decay function_score replay: per-doc BM25 fold × exp(-(d²)/
    (2σ²)), d = greatest(|n_chars − origin| − 0, 0), σ² inlined from the
    same Python arithmetic the kernel runs; NULL n_chars → factor 1."""
    import math as _math
    sigma2 = -(scale * scale) / (2.0 * _math.log(0.5))
    vals = ", ".join(f"('{t}')" for t in query_terms)
    quant = _quant_sql("dl.dl")
    factor = (f"CASE WHEN doc.n_chars IS NULL THEN 1.0 ELSE "
              f"exp(-((greatest(abs(doc.n_chars - {origin!r}) - 0.0, 0.0) "
              f"* greatest(abs(doc.n_chars - {origin!r}) - 0.0, 0.0))) "
              f"/ (2.0 * {sigma2!r})) END")
    return f"""
WITH {_TOK_CTES},
qterms(term) AS (VALUES {vals}),
dfs AS (
  SELECT tf.term, count(*)::DOUBLE AS df FROM tf JOIN qterms USING (term)
  GROUP BY tf.term
),
scores AS (
  SELECT tf.doc_id,
         list_aggregate(list(
             ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * {quant} / stats.avgdl))
             ORDER BY tf.term), 'sum')
         * {factor} AS score
  FROM tf
  JOIN qterms USING (term)
  JOIN dfs ON dfs.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  LEFT JOIN documents doc ON doc.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id, doc.n_chars
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM scores
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _dv_sort_sql(query_terms: list[str], k: int) -> str:
    """Oracle for the doc-values sort: identical ordering contract to
    sort_by_field (n_chars desc, doc_id-string asc ties, missing values
    excluded), n_chars as DOUBLE — the sidecar stores float64."""
    return f"""
{_matchset_prefix(query_terms)}
SELECT doc_id, rnk, n_chars FROM (
  SELECT m.doc_id,
         (row_number() OVER (ORDER BY d.n_chars DESC,
                             CAST(m.doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
         d.n_chars::DOUBLE AS n_chars
  FROM matched m JOIN documents d USING (doc_id)
  WHERE d.n_chars IS NOT NULL
) WHERE rnk < {k}
ORDER BY rnk
"""


def _match_stats_sql(query_terms: list[str]) -> str:
    """Oracle for the ES-stats aggregation over the OR match set. The sum
    is integer-exact, so avg (= sum/count) is bit-deterministic."""
    return f"""
{_matchset_prefix(query_terms)}
SELECT count(*)::BIGINT AS cnt,
       min(d.n_chars)::BIGINT AS min_v,
       max(d.n_chars)::BIGINT AS max_v,
       sum(d.n_chars)::BIGINT AS sum_v,
       ROUND(sum(d.n_chars)::DOUBLE / count(*), 6) AS avg_v
FROM matched m JOIN documents d USING (doc_id)
"""


def _match_extended_stats_sql(query_terms: list[str], sigma: float) -> str:
    """Oracle for extended_stats: the identical two integer moments, then
    the same double tree (sum_sq/n − (sum/n)², sqrt, ±σ bounds)."""
    return f"""
{_matchset_prefix(query_terms)},
mo AS (
  SELECT count(*)::BIGINT AS cnt,
         min(d.n_chars)::BIGINT AS min_v,
         max(d.n_chars)::BIGINT AS max_v,
         sum(d.n_chars)::BIGINT AS sum_v,
         sum(d.n_chars * d.n_chars)::BIGINT AS sum_sq
  FROM matched m JOIN documents d USING (doc_id)
)
SELECT cnt, min_v, max_v, sum_v, sum_sq,
       ROUND(sum_v / cnt, 6) AS avg_v,
       ROUND(sum_sq / cnt - (sum_v / cnt) * (sum_v / cnt), 6) AS variance,
       ROUND(sqrt(sum_sq / cnt - (sum_v / cnt) * (sum_v / cnt)), 6)
         AS std_dev,
       ROUND(sum_v / cnt + {sigma} *
             sqrt(sum_sq / cnt - (sum_v / cnt) * (sum_v / cnt)), 6)
         AS std_upper,
       ROUND(sum_v / cnt - {sigma} *
             sqrt(sum_sq / cnt - (sum_v / cnt) * (sum_v / cnt)), 6)
         AS std_lower
FROM mo
"""


def _match_matrix_stats_sql(query_terms: list[str]) -> str:
    """Oracle for matrix_stats over (n_chars, n_tokens): five integer
    moment sums, then the same mean/variance/covariance/correlation
    double trees."""
    ntok = _NTOK_SQL
    return f"""
{_matchset_prefix(query_terms)},
mo AS (
  SELECT count(*)::BIGINT AS cnt,
         sum(d.n_chars)::BIGINT AS s_a,
         sum({ntok})::BIGINT AS s_b,
         sum(d.n_chars * d.n_chars)::BIGINT AS s_aa,
         sum({ntok} * {ntok})::BIGINT AS s_bb,
         sum(d.n_chars * {ntok})::BIGINT AS s_ab
  FROM matched m JOIN documents d USING (doc_id)
)
SELECT cnt,
       ROUND(s_a / cnt, 6) AS mean_a,
       ROUND(s_b / cnt, 6) AS mean_b,
       ROUND(s_aa / cnt - (s_a / cnt) * (s_a / cnt), 6) AS var_a,
       ROUND(s_bb / cnt - (s_b / cnt) * (s_b / cnt), 6) AS var_b,
       ROUND(s_ab / cnt - (s_a / cnt) * (s_b / cnt), 6) AS covariance,
       ROUND((s_ab / cnt - (s_a / cnt) * (s_b / cnt))
             / sqrt((s_aa / cnt - (s_a / cnt) * (s_a / cnt))
                    * (s_bb / cnt - (s_b / cnt) * (s_b / cnt))), 6)
         AS correlation
FROM mo
"""


def _match_weighted_avg_sql(query_terms: list[str]) -> str:
    """Oracle for weighted_avg: integer Σvw and Σw, one final division."""
    ntok = _NTOK_SQL
    return f"""
{_matchset_prefix(query_terms)}
SELECT sum(d.n_chars * {ntok})::BIGINT AS sum_vw,
       sum({ntok})::BIGINT AS sum_w,
       ROUND(sum(d.n_chars * {ntok})::BIGINT
             / sum({ntok})::BIGINT, 6) AS wavg
FROM matched m JOIN documents d USING (doc_id)
WHERE d.n_chars IS NOT NULL AND d.text IS NOT NULL
"""


def _match_multi_terms_sql(query_terms: list[str], size: int) -> str:
    """Oracle for multi_terms: composite-key counts, (cnt desc, keys asc)
    cut to size."""
    return f"""
{_matchset_prefix(query_terms)}
SELECT d.lang, d.source, count(*)::BIGINT AS cnt
FROM matched m JOIN documents d USING (doc_id)
GROUP BY d.lang, d.source
ORDER BY cnt DESC, d.lang ASC, d.source ASC
LIMIT {size}
"""


def _match_filters_sql(query_terms: list[str],
                       filters: dict[str, str], other: str) -> str:
    """Oracle for the filters aggregation: each named predicate replayed
    as a count(CASE WHEN) over the joined match set + the none-of-them
    other bucket, unpivoted to (bucket, cnt) rows."""
    names = sorted(filters)
    sel = ",\n         ".join(
        f"sum(CASE WHEN d.{filters[n]} THEN 1 ELSE 0 END)::BIGINT AS c_{i}"
        for i, n in enumerate(names))
    none_of = " AND ".join(f"NOT (d.{filters[n]})" for n in names)
    rows = ", ".join(f"('{n}', c_{i})" for i, n in enumerate(names))
    return f"""
{_matchset_prefix(query_terms)},
wide AS (
  SELECT {sel},
         sum(CASE WHEN {none_of} THEN 1 ELSE 0 END)::BIGINT AS c_other
  FROM matched m JOIN documents d USING (doc_id)
)
SELECT u.bucket, u.cnt
FROM wide, LATERAL (VALUES {rows}, ('{other}', c_other)) AS u(bucket, cnt)
ORDER BY u.bucket
"""


def _match_pctl_ranks_sql(query_terms: list[str],
                          values: tuple[float, ...]) -> str:
    """Oracle for percentile_ranks: one count(v <= x) per requested
    value, same ×100/n double tree."""
    les = ",\n         ".join(
        f"sum(CASE WHEN d.n_chars <= {float(v)} THEN 1 ELSE 0 END)"
        f"::BIGINT AS le_{i}" for i, v in enumerate(values))
    rows = ", ".join(
        f"({float(v)}, ROUND(le_{i} * 100.0 / n, 6))"
        for i, v in enumerate(values))
    return f"""
{_matchset_prefix(query_terms)},
wide AS (
  SELECT count(*)::BIGINT AS n,
         {les}
  FROM matched m JOIN documents d USING (doc_id)
)
SELECT u.value, u.pct
FROM wide, LATERAL (VALUES {rows}) AS u(value, pct)
ORDER BY u.value
"""


def _match_range_agg_sql(query_terms: list[str],
                         ranges: tuple[tuple, ...]) -> str:
    """Oracle for the range agg: [from, to) predicates replayed as
    sum(CASE WHEN), every bucket emitted (zeros included)."""
    def key(lo, hi):
        return (f"{'*' if lo is None else float(lo)}-"
                f"{'*' if hi is None else float(hi)}")

    def pred(lo, hi):
        parts = []
        if lo is not None:
            parts.append(f"d.n_chars >= {float(lo)}")
        if hi is not None:
            parts.append(f"d.n_chars < {float(hi)}")
        return " AND ".join(parts) or "TRUE"

    sel = ",\n         ".join(
        f"sum(CASE WHEN {pred(lo, hi)} THEN 1 ELSE 0 END)::BIGINT AS b_{i}"
        for i, (lo, hi) in enumerate(ranges))
    rows = ", ".join(f"('{key(lo, hi)}', b_{i})"
                     for i, (lo, hi) in enumerate(ranges))
    return f"""
{_matchset_prefix(query_terms)},
wide AS (
  SELECT {sel}
  FROM matched m JOIN documents d USING (doc_id)
)
SELECT u.bucket, u.cnt
FROM wide, LATERAL (VALUES {rows}) AS u(bucket, cnt)
ORDER BY u.bucket
"""


def _match_top_metrics_sql(query_terms: list[str], size: int) -> str:
    """Oracle for top_metrics: the same (n_chars desc, doc_id asc)
    row_number selection, metrics read off the selected rows."""
    ntok = _NTOK_SQL
    return f"""
{_matchset_prefix(query_terms)},
ranked AS (
  SELECT d.doc_id, d.n_chars, d.source, {ntok} AS n_tokens,
         row_number() OVER (ORDER BY d.n_chars DESC,
                            CAST(d.doc_id AS VARCHAR) ASC) AS pos
  FROM matched m JOIN documents d USING (doc_id)
)
SELECT pos::BIGINT AS pos, doc_id, n_chars, source, n_tokens::BIGINT
  AS n_tokens
FROM ranked WHERE pos <= {size}
ORDER BY pos
"""


def _match_value_count_sql(query_terms: list[str]) -> str:
    """Oracle for value_count/missing: NULL-aware counts over the left
    join (no NULLs in the synthetic table, so missing pins at 0 — the
    NULL path is pytest-covered)."""
    return f"""
{_matchset_prefix(query_terms)}
SELECT sum(CASE WHEN d.n_chars IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS value_cnt,
       sum(CASE WHEN d.n_chars IS NULL THEN 1 ELSE 0 END)::BIGINT
         AS missing_cnt
FROM matched m LEFT JOIN documents d USING (doc_id)
"""


_GEO_COORDS_SQL = """
geo AS (
  SELECT doc_id::VARCHAR AS doc_id,
         (('0x' || substr(md5('lat-' || doc_id), 1, 4))::BIGINT::DOUBLE
          / 65535.0 * 170.0 - 85.0) AS lat,
         (('0x' || substr(md5('lon-' || doc_id), 1, 4))::BIGINT::DOUBLE
          / 65535.0 * 360.0 - 180.0) AS lon
  FROM documents
)"""


def _geo_distance_sql(query_terms: list[str], origin_lat: float,
                      origin_lon: float, radius_km: float, k: int) -> str:
    """Oracle for geo_distance: identical md5 coordinate derivation +
    the same haversine tree (2R·asin(√(...)), radians via *π/180)."""
    r = "(pi() / 180.0)"
    return f"""
{_matchset_prefix(query_terms)},
{_GEO_COORDS_SQL.lstrip()},
d AS (
  SELECT m.doc_id,
         2.0 * 6371.0088 * asin(sqrt(
             sin(((g.lat - {origin_lat}) * {r}) / 2)
               * sin(((g.lat - {origin_lat}) * {r}) / 2)
             + cos({origin_lat} * {r}) * cos(g.lat * {r})
               * sin(((g.lon - {origin_lon}) * {r}) / 2)
               * sin(((g.lon - {origin_lon}) * {r}) / 2))) AS dist_km
  FROM matched m JOIN geo g USING (doc_id)
)
SELECT doc_id, ROUND(dist_km, 5) AS dist_km
FROM d WHERE dist_km <= {radius_km}
ORDER BY dist_km ASC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _geotile_grid_sql(query_terms: list[str], zoom: int, size: int) -> str:
    """Oracle for geotile_grid: same Mercator trees
    (x = ⌊(lon+180)/360·2^z⌋, y = ⌊(1 − ln(tan φ + 1/cos φ)/π)/2·2^z⌋),
    clamped to [0, 2^z)."""
    n = float(1 << zoom)
    hi = (1 << zoom) - 1
    r = "(pi() / 180.0)"
    return f"""
{_matchset_prefix(query_terms)},
{_GEO_COORDS_SQL.lstrip()},
t AS (
  SELECT greatest(0, least({hi},
             floor((g.lon + 180.0) / 360.0 * {n!r})::BIGINT))::BIGINT
           AS tile_x,
         greatest(0, least({hi},
             floor((1.0 - ln(tan(g.lat * {r}) + 1.0 / cos(g.lat * {r}))
                    / pi()) / 2.0 * {n!r})::BIGINT))::BIGINT AS tile_y
  FROM matched m JOIN geo g USING (doc_id)
)
SELECT tile_x, tile_y, count(*)::BIGINT AS cnt
FROM t GROUP BY tile_x, tile_y
ORDER BY cnt DESC, tile_x ASC, tile_y ASC
LIMIT {size}
"""


def _synonym_bm25_sql(plain_term: str, group: tuple[str, ...],
                      k1: float, b: float, k: int) -> str:
    """Oracle for SynonymQuery scoring: the group's per-doc tf is summed,
    its df is the max member df, and the score folds (plain component +
    group component) in clause order — each component the exact _bm25_sql
    expression, NULL sides coalesced to 0 (adding 0.0 is exact)."""
    vals = ", ".join(f"('{t}')" for t in sorted(group))
    quant = _quant_sql("dl.dl")
    kk1, bb = repr(float(k1)), repr(float(b))
    return f"""
WITH {_TOK_CTES},
syn(term) AS (VALUES {vals}),
gtf AS (
  SELECT tf.doc_id, sum(tf.tf) AS tf FROM tf JOIN syn USING (term)
  GROUP BY tf.doc_id
),
gdf AS (
  SELECT max(df)::DOUBLE AS df FROM (
    SELECT count(*) AS df FROM tf JOIN syn USING (term) GROUP BY tf.term)
),
dtf AS (SELECT doc_id, tf FROM tf WHERE term = '{plain_term}'),
ddf AS (SELECT count(*)::DOUBLE AS df FROM dtf),
sides AS (
  SELECT COALESCE(d.doc_id, g.doc_id) AS doc_id, d.tf AS ptf, g.tf AS stf
  FROM dtf d FULL OUTER JOIN gtf g ON d.doc_id = g.doc_id
),
scores AS (
  SELECT s.doc_id,
         COALESCE(ln(1 + (stats.n - ddf.df + 0.5) / (ddf.df + 0.5))
                  * s.ptf / (s.ptf + {kk1} * (1 - {bb} + {bb} * {quant} / stats.avgdl)), 0)
         + COALESCE(ln(1 + (stats.n - gdf.df + 0.5) / (gdf.df + 0.5))
                    * s.stf / (s.stf + {kk1} * (1 - {bb} + {bb} * {quant} / stats.avgdl)), 0)
         AS score
  FROM sides s
  JOIN dl ON dl.doc_id = s.doc_id
  CROSS JOIN stats CROSS JOIN ddf CROSS JOIN gdf
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM scores
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _rrf_sql(query_terms: list[str], k1: float, b: float, mu: int,
             k: int, c: int) -> str:
    """Oracle for RRF hybrid: both runs replayed by the existing full BM25
    and QLD SQL (as subqueries), fused 1/(c + rank + 1) in run-ordinal
    fold order, doc_id-string asc tie-break — the exact rrf_fuse plan."""
    bm = _bm25_sql(query_terms, k1, b, k).strip()
    ql = _qld_sql(query_terms, mu, k).strip()
    cc = repr(float(c))
    return f"""
WITH u AS (
  SELECT doc_id, 0 AS runid, 1.0 / ({cc} + rnk + 1.0) AS rr
  FROM ({bm}) bm_run
  UNION ALL
  SELECT doc_id, 1 AS runid, 1.0 / ({cc} + rnk + 1.0) AS rr
  FROM ({ql}) ql_run
),
fused AS (
  SELECT doc_id, list_aggregate(list(rr ORDER BY runid), 'sum') AS score
  FROM u GROUP BY doc_id
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 8) AS score
FROM fused
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _linear_fuse_sql(query_terms: list[str], k1: float, b: float, mu: int,
                     k: int, w0: float, w1: float) -> str:
    """Oracle for linear_fuse hybrid: both runs replayed UNROUNDED, each
    min-max normalized within its own k rows ((s−min)/(max−min), all-equal
    → 1.0), weighted and folded in run-ordinal order like rrf."""
    bm = _bm25_sql(query_terms, k1, b, k, raw=True).strip()
    ql = _qld_sql(query_terms, mu, k, raw=True).strip()
    return f"""
WITH u AS (
  SELECT doc_id, 0 AS runid,
         {repr(float(w0))} * (CASE WHEN max(score) OVER () = min(score) OVER ()
               THEN 1.0
               ELSE (score - min(score) OVER ())
                    / (max(score) OVER () - min(score) OVER ()) END) AS ws
  FROM ({bm}) bm_run
  UNION ALL
  SELECT doc_id, 1 AS runid,
         {repr(float(w1))} * (CASE WHEN max(score) OVER () = min(score) OVER ()
               THEN 1.0
               ELSE (score - min(score) OVER ())
                    / (max(score) OVER () - min(score) OVER ()) END) AS ws
  FROM ({ql}) ql_run
),
fused AS (
  SELECT doc_id, list_aggregate(list(ws ORDER BY runid), 'sum') AS score
  FROM u GROUP BY doc_id
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 6) AS score
FROM fused
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _match_percentiles_sql(query_terms: list[str],
                           ps: tuple[float, ...]) -> str:
    """Oracle for the exact percentile_disc rows — standard-SQL semantics
    (smallest value with cume_dist ≥ p) shared by Spark and DuckDB."""
    selects = " UNION ALL ".join(
        f"SELECT {repr(float(p))} AS p, percentile_disc({repr(float(p))}) "
        f"WITHIN GROUP (ORDER BY d.n_chars)::DOUBLE AS value "
        f"FROM matched m JOIN documents d USING (doc_id)"
        for p in ps)
    return f"""
{_matchset_prefix(query_terms)}
{selects}
ORDER BY p
"""


def _match_cardinality_sql(query_terms: list[str], k: int) -> str:
    """Oracle for the KMV cardinality sketch: the same md5 unit-interval
    hashes (15 hex digits = 60 bits, exactly representable in a double),
    k smallest, (k−1)/h_(k) — replayed value-for-value."""
    denom = repr(float(16 ** 15))
    return f"""
{_matchset_prefix(query_terms)},
dh AS (
  SELECT DISTINCT
         CAST(('0x' || substr(md5(CAST(d.n_chars AS VARCHAR)), 1, 15))
              AS UBIGINT)::DOUBLE / {denom} AS h
  FROM matched m JOIN documents d USING (doc_id)
),
topk AS (SELECT h FROM dh ORDER BY h LIMIT {k})
SELECT ROUND(CASE WHEN count(*) < {k} THEN count(*)::DOUBLE
             ELSE {repr(float(k - 1))} / max(h) END, 6) AS est,
       (count(*) < {k}) AS is_exact
FROM topk
"""


def _match_histogram_sql(query_terms: list[str], interval: int) -> str:
    """Oracle for the fixed-interval histogram over the OR match set."""
    return f"""
{_matchset_prefix(query_terms)}
SELECT (FLOOR(d.n_chars / {float(interval)}) * {interval})::BIGINT AS bucket,
       count(*)::BIGINT AS cnt
FROM matched m JOIN documents d USING (doc_id)
GROUP BY bucket
ORDER BY bucket
"""


def _significant_terms_sql(query_terms: list[str], k: int,
                           min_doc: int) -> str:
    """Oracle for significant_terms: fg counts from distinct (doc, term)
    over the match set, bg df over the corpus, the same JLH expression tree
    (all operands exact integers-in-doubles, so the doubles are
    bit-identical), ROUND-first ordering."""
    return f"""
{_matchset_prefix(query_terms)},
fgt AS (SELECT count(*)::DOUBLE AS fg_total FROM matched),
dterm AS (SELECT DISTINCT doc_id, term FROM tf),
fg AS (
  SELECT d.term, count(*)::DOUBLE AS fg_cnt
  FROM matched m JOIN dterm d USING (doc_id) GROUP BY d.term
),
bg AS (SELECT term, count(*)::DOUBLE AS bg_df FROM dterm GROUP BY term),
scored AS (
  SELECT f.term, f.fg_cnt, b.bg_df,
         (f.fg_cnt / fgt.fg_total - b.bg_df / stats.n)
          * ((f.fg_cnt / fgt.fg_total) / (b.bg_df / stats.n)) AS score
  FROM fg f JOIN bg b USING (term) CROSS JOIN fgt CROSS JOIN stats
  WHERE f.fg_cnt >= {min_doc}
)
SELECT term, rnk, fg_cnt, bg_df, score FROM (
  SELECT term,
         (row_number() OVER (ORDER BY ROUND(score, 6) DESC, term ASC)
          - 1)::BIGINT AS rnk,
         fg_cnt::BIGINT AS fg_cnt, bg_df::BIGINT AS bg_df,
         ROUND(score, 6) AS score
  FROM scored WHERE score > 0
) WHERE rnk < {k}
ORDER BY rnk
"""


def _percolate_sql() -> str:
    """Oracle for percolation: per-doc term-membership flags, then each
    stored query's boolean tree replayed as a WHERE clause (PERC_QUERIES
    pinned as literals — matched_any & must_ok & ~forbidden semantics)."""
    return """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
),
m AS (
  SELECT doc_id,
         bool_or(term = 'data')   AS t_data,
         bool_or(term = 'stream') AS t_stream,
         bool_or(term = 'window') AS t_window,
         bool_or(term = 'query')  AS t_query
  FROM tok WHERE term <> '' GROUP BY doc_id
)
SELECT doc_id, query_id FROM (
  SELECT doc_id, 'pq1' AS query_id FROM m
  WHERE t_data AND t_stream AND NOT t_window
  UNION ALL
  SELECT doc_id, 'pq2' FROM m WHERE t_query OR t_window
  UNION ALL
  SELECT doc_id, 'pq3' FROM m WHERE t_stream AND NOT (t_data OR t_query)
)
ORDER BY doc_id, query_id
"""


def _facet_by_source_sql(query_terms: list[str]) -> str:
    """Oracle for facet counts: distinct docs containing ≥1 query term,
    counted per source."""
    vals = ", ".join(f"('{t}')" for t in query_terms)
    return f"""
WITH {_TOK_CTES},
qterms(term) AS (VALUES {vals}),
matched AS (SELECT DISTINCT tf.doc_id FROM tf JOIN qterms USING (term))
SELECT d.source AS src, count(*)::BIGINT AS cnt
FROM matched m JOIN documents d ON d.doc_id = m.doc_id
GROUP BY d.source
ORDER BY cnt DESC, src ASC
"""


def _dv_filtered_facets_sql(query_terms: list[str], lo: float,
                            hi: float) -> str:
    """Oracle for filtered facet counts: the OR match set restricted to
    n_chars ∈ [lo, hi] (missing never passes), counted per source."""
    vals = ", ".join(f"('{t}')" for t in query_terms)
    return f"""
WITH {_TOK_CTES},
qterms(term) AS (VALUES {vals}),
matched AS (SELECT DISTINCT tf.doc_id FROM tf JOIN qterms USING (term))
SELECT d.source AS src, count(*)::BIGINT AS cnt
FROM matched m JOIN documents d ON d.doc_id = m.doc_id
WHERE d.n_chars IS NOT NULL AND d.n_chars >= {lo} AND d.n_chars <= {hi}
GROUP BY d.source
ORDER BY cnt DESC, src ASC
"""


def _collapse_by_source_sql(query_terms: list[str], k1: float, b: float,
                            depth: int, k: int) -> str:
    """Oracle for BM25 top-``depth`` collapsed to the best hit per document
    source, re-ranked, cut to ``k`` — replays the engine exactly: the same
    BM25 ranking (score desc, doc_id-as-string asc tie-break) cut at depth,
    one row_number window per source, then a re-rank window."""
    vals = ", ".join(f"('{t}')" for t in query_terms)
    quant = _quant_sql("dl.dl")
    return f"""
WITH {_TOK_CTES},
qterms(term) AS (VALUES {vals}),
dfs AS (
  SELECT tf.term, count(*)::DOUBLE AS df FROM tf JOIN qterms USING (term)
  GROUP BY tf.term
),
scores AS (
  SELECT tf.doc_id,
         list_aggregate(list(
             ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * {quant} / stats.avgdl))
             ORDER BY tf.term), 'sum') AS score
  FROM tf
  JOIN qterms USING (term)
  JOIN dfs ON dfs.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
),
top AS (
  SELECT doc_id, score FROM scores
  ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
  LIMIT {depth}
),
keyed AS (
  SELECT t.doc_id, t.score, d.source AS src,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY t.score DESC,
                                     CAST(t.doc_id AS VARCHAR) ASC) AS kr
  FROM top t JOIN documents d ON d.doc_id = t.doc_id
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score,
       src
FROM keyed WHERE kr = 1
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _wildcard_bm25_sql(must_term: str, like: str, k1: float, b: float,
                       k: int) -> str:
    """Oracle for 'must_term AND <wildcard>': the query term set is the
    must term plus every corpus term LIKE ``like`` — the engine's
    term-dictionary expansion translated to SQL (engine '*' = LIKE '%',
    engine '?' = LIKE '_'; a prefix wildcard 'te*' is LIKE 'te%'); a doc
    matches iff it contains the must term and ≥1 expanded term, scoring
    Σ BM25 over its matching query terms."""
    quant = _quant_sql("dl.dl")
    return f"""
WITH {_TOK_CTES},
qterms AS (
  SELECT '{must_term}' AS term
  UNION
  SELECT DISTINCT term FROM tf WHERE term LIKE '{like}'
),
dfs AS (
  SELECT tf.term, count(*)::DOUBLE AS df FROM tf JOIN qterms USING (term)
  GROUP BY tf.term
),
scores AS (
  SELECT tf.doc_id,
         list_aggregate(list(
             ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * {quant} / stats.avgdl))
             ORDER BY tf.term), 'sum') AS score,
         MAX(CASE WHEN tf.term = '{must_term}' THEN 1 ELSE 0 END) AS has_must,
         MAX(CASE WHEN tf.term <> '{must_term}' THEN 1 ELSE 0 END) AS has_wild
  FROM tf
  JOIN qterms USING (term)
  JOIN dfs ON dfs.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM scores WHERE has_must = 1 AND has_wild = 1
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _regexp_bm25_sql(must_term: str, pat: str, k1: float, b: float,
                     k: int) -> str:
    """Oracle for 'must_term AND /pat/': the query term set is the must
    term plus every corpus term whose WHOLE text matches ``pat`` (DuckDB
    regexp_full_match = the engine's anchored rlike, identical on the
    RE2/Java-regex common subset); a doc matches iff it contains the must
    term and ≥1 expanded term, scoring Σ BM25 over its matching terms."""
    quant = _quant_sql("dl.dl")
    return f"""
WITH {_TOK_CTES},
qterms AS (
  SELECT '{must_term}' AS term
  UNION
  SELECT DISTINCT term FROM tf WHERE regexp_full_match(term, '{pat}')
),
dfs AS (
  SELECT tf.term, count(*)::DOUBLE AS df FROM tf JOIN qterms USING (term)
  GROUP BY tf.term
),
scores AS (
  SELECT tf.doc_id,
         list_aggregate(list(
             ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * {quant} / stats.avgdl))
             ORDER BY tf.term), 'sum') AS score,
         MAX(CASE WHEN tf.term = '{must_term}' THEN 1 ELSE 0 END) AS has_must,
         MAX(CASE WHEN tf.term <> '{must_term}' THEN 1 ELSE 0 END) AS has_rx
  FROM tf
  JOIN qterms USING (term)
  JOIN dfs ON dfs.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM scores WHERE has_must = 1 AND has_rx = 1
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _fuzzy_bm25_sql(must_term: str, base: str, edits: int, k1: float,
                    b: float, k: int) -> str:
    """Oracle for 'must_term AND base~edits': the query term set is the
    must term plus every corpus term within plain Levenshtein distance
    ``edits`` of ``base`` (exactly the engine's dictionary expansion —
    DuckDB's levenshtein and Spark's F.levenshtein are both the plain
    distance); a doc matches iff it contains the must term and ≥1 expanded
    term, scoring Σ BM25 over its matching query terms."""
    quant = _quant_sql("dl.dl")
    return f"""
WITH {_TOK_CTES},
qterms AS (
  SELECT '{must_term}' AS term
  UNION
  SELECT DISTINCT term FROM tf WHERE levenshtein(term, '{base}') <= {edits}
),
dfs AS (
  SELECT tf.term, count(*)::DOUBLE AS df FROM tf JOIN qterms USING (term)
  GROUP BY tf.term
),
scores AS (
  SELECT tf.doc_id,
         list_aggregate(list(
             ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * {quant} / stats.avgdl))
             ORDER BY tf.term), 'sum') AS score,
         MAX(CASE WHEN tf.term = '{must_term}' THEN 1 ELSE 0 END) AS has_must,
         MAX(CASE WHEN tf.term <> '{must_term}' THEN 1 ELSE 0 END) AS has_fuzzy
  FROM tf
  JOIN qterms USING (term)
  JOIN dfs ON dfs.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM scores WHERE has_must = 1 AND has_fuzzy = 1
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _rm3_sql(query_terms: list[str], k1: float, b: float, k: int,
             fb_docs: int, fb_terms: int, oqw: float) -> str:
    """Full two-pass RM3 in SQL: BM25 pass-1 → top fb_docs → RM1 estimate
    (tf/dl · pass-1 score, top fb_terms, unit L1) → interpolate with the
    original query model → weighted BM25 pass-2."""
    vals = ", ".join(f"('{t}')" for t in query_terms)
    n_q = len(query_terms)
    quant = _quant_sql("dl.dl")
    bm25_part = (f"ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))"
                 f" * tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * {quant} / stats.avgdl))")
    return f"""
WITH {_TOK_CTES},
qterms(term) AS (VALUES {vals}),
dfs AS (
  SELECT tf.term, count(*)::DOUBLE AS df FROM tf JOIN qterms USING (term)
  GROUP BY tf.term
),
pass1 AS (
  SELECT tf.doc_id, list_aggregate(list({bm25_part} ORDER BY tf.term), 'sum') AS score
  FROM tf JOIN qterms USING (term) JOIN dfs ON dfs.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats
  GROUP BY tf.doc_id
),
fb AS (
  SELECT doc_id, score,
         row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) AS rn
  FROM pass1 QUALIFY rn <= {fb_docs}
),
rm1 AS (
  SELECT tf.term, list_aggregate(list(tf.tf / dl.dl * fb.score ORDER BY tf.doc_id), 'sum') AS w
  FROM fb JOIN tf ON tf.doc_id = fb.doc_id JOIN dl ON dl.doc_id = fb.doc_id
  GROUP BY tf.term
),
rm1top AS (
  SELECT term, w, row_number() OVER (ORDER BY w DESC, term ASC) AS rn
  FROM rm1 QUALIFY rn <= {fb_terms}
),
rm1n AS (
  SELECT term, w / (SELECT list_aggregate(list(w ORDER BY term), 'sum') FROM rm1top) AS p_rm1 FROM rm1top
),
orig AS (
  SELECT term, count(*)::DOUBLE / {n_q} AS p_q FROM qterms GROUP BY term
),
weights AS (
  SELECT COALESCE(r.term, o.term) AS term,
         {oqw} * COALESCE(o.p_q, 0) + (1 - {oqw}) * COALESCE(r.p_rm1, 0) AS weight
  FROM rm1n r FULL OUTER JOIN orig o ON r.term = o.term
),
dfs2 AS (
  SELECT tf.term, count(*)::DOUBLE AS df FROM tf JOIN weights USING (term)
  GROUP BY tf.term
),
pass2 AS (
  SELECT tf.doc_id,
         list_aggregate(list(
             weights.weight
              * ln(1 + (stats.n - dfs2.df + 0.5) / (dfs2.df + 0.5))
              * tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * {quant} / stats.avgdl))
             ORDER BY tf.term), 'sum') AS score
  FROM tf JOIN weights USING (term) JOIN dfs2 ON dfs2.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM pass2
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _rocchio_sql(query_terms: list[str], k1: float, b: float, k: int,
                 fb_docs: int, fb_terms: int, alpha: float,
                 beta: float) -> str:
    """Full two-pass Rocchio in SQL: BM25 pass-1 → top fb_docs → relevant
    centroid (mean tf/dl per term) → α·qtf + β·centroid, positive weights
    only, top fb_terms → weighted BM25 pass-2 (same pass-2 as _rm3_sql)."""
    vals = ", ".join(f"('{t}')" for t in query_terms)
    quant = _quant_sql("dl.dl")
    bm25_part = (f"ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))"
                 f" * tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * {quant} / stats.avgdl))")
    return f"""
WITH {_TOK_CTES},
qterms(term) AS (VALUES {vals}),
dfs AS (
  SELECT tf.term, count(*)::DOUBLE AS df FROM tf JOIN qterms USING (term)
  GROUP BY tf.term
),
pass1 AS (
  SELECT tf.doc_id, list_aggregate(list({bm25_part} ORDER BY tf.term), 'sum') AS score
  FROM tf JOIN qterms USING (term) JOIN dfs ON dfs.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats
  GROUP BY tf.doc_id
),
fb AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) AS rn
  FROM pass1 QUALIFY rn <= {fb_docs}
),
centroid AS (
  SELECT tf.term,
         list_aggregate(list(tf.tf / dl.dl ORDER BY tf.doc_id), 'sum')
           / (SELECT count(*) FROM fb) AS c
  FROM fb JOIN tf ON tf.doc_id = fb.doc_id JOIN dl ON dl.doc_id = fb.doc_id
  GROUP BY tf.term
),
orig AS (
  SELECT term, count(*)::DOUBLE AS qtf FROM qterms GROUP BY term
),
weights AS (
  SELECT COALESCE(r.term, o.term) AS term,
         {alpha} * COALESCE(o.qtf, 0) + {beta} * COALESCE(r.c, 0) AS weight,
         row_number() OVER (
             ORDER BY {alpha} * COALESCE(o.qtf, 0) + {beta} * COALESCE(r.c, 0) DESC,
                      COALESCE(r.term, o.term) ASC) AS rn
  FROM centroid r FULL OUTER JOIN orig o ON r.term = o.term
  WHERE {alpha} * COALESCE(o.qtf, 0) + {beta} * COALESCE(r.c, 0) > 0
  QUALIFY rn <= {fb_terms}
),
dfs2 AS (
  SELECT tf.term, count(*)::DOUBLE AS df FROM tf JOIN weights USING (term)
  GROUP BY tf.term
),
pass2 AS (
  SELECT tf.doc_id,
         list_aggregate(list(
             weights.weight
              * ln(1 + (stats.n - dfs2.df + 0.5) / (dfs2.df + 0.5))
              * tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * {quant} / stats.avgdl))
             ORDER BY tf.term), 'sum') AS score
  FROM tf JOIN weights USING (term) JOIN dfs2 ON dfs2.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM pass2
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _qld_sql(query_terms: list[str], mu: int, k: int,
             raw: bool = False) -> str:
    vals = ", ".join(f"('{t}')" for t in query_terms)
    quant = _quant_sql("dl.dl")
    return f"""
WITH {_TOK_CTES},
qterms(term) AS (VALUES {vals}),
cfs AS (
  SELECT tf.term, sum(tf.tf) AS cf FROM tf JOIN qterms USING (term)
  GROUP BY tf.term
),
scores AS (
  SELECT tf.doc_id,
         list_aggregate(list(GREATEST(
             ln(1 + tf.tf / ({mu} * (cfs.cf + 1) / (stats.total_tf + 1)))
             + ln({mu} / ({quant} + {mu})), 0) ORDER BY tf.term), 'sum') AS score
  FROM tf
  JOIN qterms USING (term)
  JOIN cfs ON cfs.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       {"score" if raw else "ROUND(score, 5) AS score"}
FROM scores
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _qljm_sql(query_terms: list[str], lam: float, k: int) -> str:
    """LM Jelinek-Mercer replay: parenthesization mirrors the scorer
    kernel's numpy expression tree exactly (((1-λ)·tf)·(1/dl) over the
    λ·((cf+1)/(total_tf+1)) collection model) for bit-stable doubles."""
    vals = ", ".join(f"('{t}')" for t in query_terms)
    quant = _quant_sql("dl.dl")
    return f"""
WITH {_TOK_CTES},
qterms(term) AS (VALUES {vals}),
cfs AS (
  SELECT tf.term, sum(tf.tf) AS cf FROM tf JOIN qterms USING (term)
  GROUP BY tf.term
),
scores AS (
  SELECT tf.doc_id,
         list_aggregate(list(
             ln(1 + ((1 - {lam}) * tf.tf * (1.0 / {quant}))
                    / ({lam} * ((cfs.cf + 1) / (stats.total_tf + 1))))
             ORDER BY tf.term), 'sum') AS score
  FROM tf
  JOIN qterms USING (term)
  JOIN cfs ON cfs.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM scores
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _classic_sql(query_terms: list[str], k: int) -> str:
    """Classic TF-IDF replay: √tf · idf² · 1/√dl with idf =
    1+ln((N+1)/(df+1)), parenthesized exactly as the kernel multiplies."""
    vals = ", ".join(f"('{t}')" for t in query_terms)
    quant = _quant_sql("dl.dl")
    idf = "(1 + ln((stats.n + 1) / (dfs.df + 1)))"
    return f"""
WITH {_TOK_CTES},
qterms(term) AS (VALUES {vals}),
dfs AS (
  SELECT tf.term, count(*)::DOUBLE AS df FROM tf JOIN qterms USING (term)
  GROUP BY tf.term
),
scores AS (
  SELECT tf.doc_id,
         list_aggregate(list(
             sqrt(tf.tf) * ({idf} * {idf}) * (1.0 / sqrt({quant}))
             ORDER BY tf.term), 'sum') AS score
  FROM tf
  JOIN qterms USING (term)
  JOIN dfs ON dfs.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM scores
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _span_near_sql(a: str, b: str, slop: int, k1: float, bb: float,
                   k: int) -> str:
    """Oracle for q_span_near_bm25: anchors = occurrences of ``a`` with
    any ``b`` within ``slop`` intervening tokens in either direction
    (|i−j| − 1 ≤ slop); idf = idf(a) + idf(b), the kernel's fold order."""
    quant = _quant_sql("dl.dl")
    return f"""
WITH {_TOK_CTES},
w AS (
  SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
  FROM documents
),
occ AS (
  SELECT doc_id, unnest(toks) AS t, generate_subscripts(toks, 1) AS i FROM w
),
anchors AS (
  SELECT o1.doc_id, count(*)::DOUBLE AS tf
  FROM occ o1
  WHERE o1.t = '{a}'
    AND EXISTS (SELECT 1 FROM occ o2
                WHERE o2.doc_id = o1.doc_id AND o2.t = '{b}'
                  AND abs(o1.i - o2.i) - 1 <= {slop})
  GROUP BY o1.doc_id
),
dfs AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf
  WHERE term IN ('{a}', '{b}') GROUP BY term
),
idfsum AS (
  SELECT (SELECT ln(1 + (stats.n - df + 0.5) / (df + 0.5))
          FROM dfs CROSS JOIN stats WHERE term = '{a}')
       + (SELECT ln(1 + (stats.n - df + 0.5) / (df + 0.5))
          FROM dfs CROSS JOIN stats WHERE term = '{b}') AS idf
),
scores AS (
  SELECT anchors.doc_id,
         idfsum.idf * anchors.tf
           / (anchors.tf + {k1} * (1 - {bb} + {bb} * {quant} / stats.avgdl))
           AS score
  FROM anchors
  JOIN dl ON dl.doc_id = anchors.doc_id
  CROSS JOIN stats CROSS JOIN idfsum
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM scores
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _intervals_sql(a: str, b: str, gaps: int, x: str, k1: float, bb: float,
                   k: int) -> str:
    """Oracle for q_intervals_bm25: minimal ordered intervals as
    correlated subqueries — for each occurrence of ``a`` at i, the
    candidate end is the FIRST ``b`` after i; the anchor counts iff the
    width fits ``gaps``, no other ``a`` lies strictly inside
    (minimality), and no ``x`` lies in the closed interval
    (not_containing); idf = idf(a) + idf(b), the kernel's fold order."""
    quant = _quant_sql("dl.dl")
    return f"""
WITH {_TOK_CTES},
w AS (
  SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
  FROM documents
),
occ AS (
  SELECT doc_id, unnest(toks) AS t, generate_subscripts(toks, 1) AS i FROM w
),
anchors AS (
  SELECT o1.doc_id, count(*)::DOUBLE AS tf
  FROM occ o1
  WHERE o1.t = '{a}'
    AND EXISTS (
      SELECT 1 FROM occ o2
      WHERE o2.doc_id = o1.doc_id AND o2.t = '{b}' AND o2.i > o1.i
        AND o2.i = (SELECT min(o3.i) FROM occ o3
                    WHERE o3.doc_id = o1.doc_id AND o3.t = '{b}'
                      AND o3.i > o1.i)
        AND o2.i - o1.i - 1 <= {gaps}
        AND NOT EXISTS (SELECT 1 FROM occ o4
                        WHERE o4.doc_id = o1.doc_id AND o4.t = '{a}'
                          AND o4.i > o1.i AND o4.i < o2.i)
        AND NOT EXISTS (SELECT 1 FROM occ o5
                        WHERE o5.doc_id = o1.doc_id AND o5.t = '{x}'
                          AND o5.i >= o1.i AND o5.i <= o2.i))
  GROUP BY o1.doc_id
),
dfs AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf
  WHERE term IN ('{a}', '{b}') GROUP BY term
),
idfsum AS (
  SELECT (SELECT ln(1 + (stats.n - df + 0.5) / (df + 0.5))
          FROM dfs CROSS JOIN stats WHERE term = '{a}')
       + (SELECT ln(1 + (stats.n - df + 0.5) / (df + 0.5))
          FROM dfs CROSS JOIN stats WHERE term = '{b}') AS idf
),
scores AS (
  SELECT anchors.doc_id,
         idfsum.idf * anchors.tf
           / (anchors.tf + {k1} * (1 - {bb} + {bb} * {quant} / stats.avgdl))
           AS score
  FROM anchors
  JOIN dl ON dl.doc_id = anchors.doc_id
  CROSS JOIN stats CROSS JOIN idfsum
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM scores
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _intervals_chain_sql(words: list[str], gaps: int, k1: float, bb: float,
                         k: int) -> str:
    """Oracle for q_intervals_chain_bm25: the greedy earliest-after chain
    as NESTED correlated min() subqueries (one level per word after the
    first), minimality as a chain-ends anti-join (a later start with the
    same end supersedes), width = end − start − (n−1) ≤ gaps; idf = Σ
    member idfs in the kernel's fold order."""
    quant = _quant_sql("dl.dl")
    n = len(words)

    def chain_expr(prev: str, level: int) -> str:
        if level == n:
            return prev
        al = f"o{level}"
        inner = (f"(SELECT min({al}.i) FROM occ {al} "
                 f"WHERE {al}.doc_id = s.doc_id AND {al}.t = "
                 f"'{words[level]}' AND {al}.i > {prev})")
        return chain_expr(inner, level + 1)

    q_expr = chain_expr("s.i", 1)
    idf_terms = " + ".join(
        f"(SELECT ln(1 + (stats.n - df + 0.5) / (df + 0.5)) "
        f"FROM dfs CROSS JOIN stats WHERE term = '{w}')" for w in words)
    in_list = ", ".join(f"'{w}'" for w in sorted(set(words)))
    return f"""
WITH {_TOK_CTES},
w AS (
  SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
  FROM documents
),
occ AS (
  SELECT doc_id, unnest(toks) AS t, generate_subscripts(toks, 1) AS i FROM w
),
chains AS (
  SELECT s.doc_id, s.i AS p, {q_expr} AS q
  FROM occ s WHERE s.t = '{words[0]}'
),
anchors AS (
  SELECT c.doc_id, count(*)::DOUBLE AS tf
  FROM chains c
  WHERE c.q IS NOT NULL AND c.q - c.p - {n - 1} <= {gaps}
    AND NOT EXISTS (SELECT 1 FROM chains c2
                    WHERE c2.doc_id = c.doc_id AND c2.p > c.p
                      AND c2.q = c.q)
  GROUP BY c.doc_id
),
dfs AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf
  WHERE term IN ({in_list}) GROUP BY term
),
idfsum AS (
  SELECT {idf_terms} AS idf
),
scores AS (
  SELECT anchors.doc_id,
         idfsum.idf * anchors.tf
           / (anchors.tf + {k1} * (1 - {bb} + {bb} * {quant} / stats.avgdl))
           AS score
  FROM anchors
  JOIN dl ON dl.doc_id = anchors.doc_id
  CROSS JOIN stats CROSS JOIN idfsum
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM scores
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _span_not_sql(a: str, b: str, slop: int, k1: float, bb: float,
                  k: int) -> str:
    """Oracle for q_span_not_bm25: anchors = occurrences of ``a`` with NO
    ``b`` within the window either direction; idf = idf(a) ONLY (the
    SpanNotQuery include-weight rule the kernel follows)."""
    quant = _quant_sql("dl.dl")
    return f"""
WITH {_TOK_CTES},
w AS (
  SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
  FROM documents
),
occ AS (
  SELECT doc_id, unnest(toks) AS t, generate_subscripts(toks, 1) AS i FROM w
),
anchors AS (
  SELECT o1.doc_id, count(*)::DOUBLE AS tf
  FROM occ o1
  WHERE o1.t = '{a}'
    AND NOT EXISTS (SELECT 1 FROM occ o2
                    WHERE o2.doc_id = o1.doc_id AND o2.t = '{b}'
                      AND abs(o1.i - o2.i) - 1 <= {slop})
  GROUP BY o1.doc_id
),
adf AS (SELECT count(*)::DOUBLE AS df FROM tf WHERE term = '{a}'),
scores AS (
  SELECT anchors.doc_id,
         ln(1 + (stats.n - adf.df + 0.5) / (adf.df + 0.5)) * anchors.tf
           / (anchors.tf + {k1} * (1 - {bb} + {bb} * {quant} / stats.avgdl))
           AS score
  FROM anchors
  JOIN dl ON dl.doc_id = anchors.doc_id
  CROSS JOIN stats CROSS JOIN adf
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM scores
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _phrase_prefix_sql(word: str, prefix: str, max_exp: int, k1: float,
                       b: float, k: int) -> str:
    """Oracle for q_phrase_prefix_bm25 (single fixed word): expansion =
    first max_exp dictionary terms with the prefix in term order; anchor
    tf = positions i with toks[i]=word and toks[i+1] ∈ expansion; idf =
    idf(word df) + idf(max expansion df) folded exactly like the kernel."""
    quant = _quant_sql("dl.dl")
    return f"""
WITH {_TOK_CTES},
w AS (
  SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
  FROM documents
),
occ AS (
  SELECT doc_id, unnest(toks) AS t, generate_subscripts(toks, 1) AS i FROM w
),
exp AS (
  SELECT term FROM (SELECT DISTINCT term FROM tf WHERE term LIKE '{prefix}%')
  ORDER BY term LIMIT {max_exp}
),
expdf AS (
  SELECT max(df) AS mdf FROM (
    SELECT tf.term, count(*)::DOUBLE AS df FROM tf JOIN exp USING (term)
    GROUP BY tf.term)
),
worddf AS (
  SELECT count(*)::DOUBLE AS df FROM tf WHERE term = '{word}'
),
anchors AS (
  SELECT o1.doc_id, count(*)::DOUBLE AS tf
  FROM occ o1
  JOIN occ o2 ON o2.doc_id = o1.doc_id AND o2.i = o1.i + 1
  JOIN exp ON exp.term = o2.t
  WHERE o1.t = '{word}'
  GROUP BY o1.doc_id
),
scores AS (
  SELECT anchors.doc_id,
         (ln(1 + (stats.n - worddf.df + 0.5) / (worddf.df + 0.5))
          + ln(1 + (stats.n - expdf.mdf + 0.5) / (expdf.mdf + 0.5)))
           * anchors.tf
           / (anchors.tf + {k1} * (1 - {b} + {b} * {quant} / stats.avgdl))
           AS score
  FROM anchors
  JOIN dl ON dl.doc_id = anchors.doc_id
  CROSS JOIN stats CROSS JOIN worddf CROSS JOIN expdf
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM scores
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _dfr_inl2_sql(query_terms: list[str], dfr_c: float, k: int) -> str:
    """DFR InL2 replay: tfn = tf·(ln(1 + c·avgdl/dl)·(1/ln 2)) and
    ((1/(tfn+1))·tfn)·(ln((N+1)/(df+0.5))·(1/ln 2)), parenthesized exactly
    as the scorer kernel multiplies (log2 is ln·(1/ln 2) on both sides)."""
    vals = ", ".join(f"('{t}')" for t in query_terms)
    quant = _quant_sql("dl.dl")
    tfn = (f"(tf.tf * (ln(1 + ({dfr_c} * stats.avgdl) / {quant})"
           f" * (1.0/ln(2))))")
    idf2 = "(ln((stats.n + 1) / (dfs.df + 0.5)) * (1.0/ln(2)))"
    return f"""
WITH {_TOK_CTES},
qterms(term) AS (VALUES {vals}),
dfs AS (
  SELECT tf.term, count(*)::DOUBLE AS df FROM tf JOIN qterms USING (term)
  GROUP BY tf.term
),
scores AS (
  SELECT tf.doc_id,
         list_aggregate(list(
             ((1.0 / ({tfn} + 1.0)) * {tfn}) * {idf2}
             ORDER BY tf.term), 'sum') AS score
  FROM tf
  JOIN qterms USING (term)
  JOIN dfs ON dfs.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM scores
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _dfi_sql(query_terms: list[str], k: int) -> str:
    """DFI (standardized) replay: e = (cf·dl)/total_tf over quantized dl;
    tf ≤ e contributes 0, else ln(1 + (tf-e)/√e)·(1/ln 2) — the CASE mirrors
    the kernel's np.where and the argument tree its numpy expression."""
    vals = ", ".join(f"('{t}')" for t in query_terms)
    quant = _quant_sql("dl.dl")
    e = f"((cfs.cf * {quant}) / stats.total_tf)"
    return f"""
WITH {_TOK_CTES},
qterms(term) AS (VALUES {vals}),
cfs AS (
  SELECT tf.term, sum(tf.tf) AS cf FROM tf JOIN qterms USING (term)
  GROUP BY tf.term
),
scores AS (
  SELECT tf.doc_id,
         list_aggregate(list(
             CASE WHEN (tf.tf - {e}) > 0
                  THEN ln(1.0 + (tf.tf - {e}) / sqrt({e})) * (1.0/ln(2))
                  ELSE 0.0 END
             ORDER BY tf.term), 'sum') AS score
  FROM tf
  JOIN qterms USING (term)
  JOIN cfs ON cfs.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM scores
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


_SIM_TOPK_TAIL = """
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM scores
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _pl2_sql(query_terms: list[str], dfr_c: float, k: int) -> str:
    """DFR PL2 replay: λ = cf/N, tfn = tf·(ln(1+c·avgdl/dl)·(1/ln 2)),
    per-term greatest(0, (1/(tfn+1))·(tfn·(ln(tfn/λ)·(1/ln 2)) +
    (λ−tfn)·(1/ln 2) + 0.5·(ln(2π·tfn)·(1/ln 2)))) — the op tree
    parenthesized exactly as the numpy kernel folds it."""
    vals = ", ".join(f"('{t}')" for t in query_terms)
    quant = _quant_sql("dl.dl")
    tfn = (f"(tf.tf * (ln(1 + ({dfr_c} * stats.avgdl) / {quant})"
           f" * (1.0/ln(2))))")
    lam = "(cfs.cf / stats.n)"
    g = (f"((1.0 / ({tfn} + 1.0)) * ({tfn} * (ln({tfn} / {lam})"
         f" * (1.0/ln(2))) + ({lam} - {tfn}) * (1.0/ln(2))"
         f" + 0.5 * (ln(2.0 * pi() * {tfn}) * (1.0/ln(2)))))")
    return f"""
WITH {_TOK_CTES},
qterms(term) AS (VALUES {vals}),
cfs AS (
  SELECT tf.term, sum(tf.tf) AS cf FROM tf JOIN qterms USING (term)
  GROUP BY tf.term
),
scores AS (
  SELECT tf.doc_id,
         list_aggregate(list(
             greatest({g}, 0.0)
             ORDER BY tf.term), 'sum') AS score
  FROM tf
  JOIN qterms USING (term)
  JOIN cfs ON cfs.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
{_SIM_TOPK_TAIL.format(k=k)}"""


def _f2exp_sql(query_terms: list[str], ax_s: float, ax_k: float,
               k: int) -> str:
    """Axiomatic F2EXP replay: ((N+1)/df)^k · tf/(tf + s + (s·dl)/avgdl),
    the division/addition order mirroring the kernel's numpy expression."""
    vals = ", ".join(f"('{t}')" for t in query_terms)
    quant = _quant_sql("dl.dl")
    return f"""
WITH {_TOK_CTES},
qterms(term) AS (VALUES {vals}),
dfs AS (
  SELECT tf.term, count(*)::DOUBLE AS df FROM tf JOIN qterms USING (term)
  GROUP BY tf.term
),
scores AS (
  SELECT tf.doc_id,
         list_aggregate(list(
             pow((stats.n + 1.0) / dfs.df, {ax_k}) * tf.tf
              / (tf.tf + {ax_s} + {ax_s} * {quant} / stats.avgdl)
             ORDER BY tf.term), 'sum') AS score
  FROM tf
  JOIN qterms USING (term)
  JOIN dfs ON dfs.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
{_SIM_TOPK_TAIL.format(k=k)}"""


def _ib_ll_sql(query_terms: list[str], dfr_c: float, k: int) -> str:
    """IB LL·DF·H2 replay: λ = (df+1)/(N+1), tfn as the shared
    normalization-2 tree, per-term ln(1 + tfn/λ)."""
    vals = ", ".join(f"('{t}')" for t in query_terms)
    quant = _quant_sql("dl.dl")
    tfn = (f"(tf.tf * (ln(1 + ({dfr_c} * stats.avgdl) / {quant})"
           f" * (1.0/ln(2))))")
    lam = "((dfs.df + 1.0) / (stats.n + 1.0))"
    return f"""
WITH {_TOK_CTES},
qterms(term) AS (VALUES {vals}),
dfs AS (
  SELECT tf.term, count(*)::DOUBLE AS df FROM tf JOIN qterms USING (term)
  GROUP BY tf.term
),
scores AS (
  SELECT tf.doc_id,
         list_aggregate(list(
             ln(1.0 + {tfn} / {lam})
             ORDER BY tf.term), 'sum') AS score
  FROM tf
  JOIN qterms USING (term)
  JOIN dfs ON dfs.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
{_SIM_TOPK_TAIL.format(k=k)}"""


def _bool_sql(query_terms: list[str], k: int) -> str:
    """BooleanSimilarity replay: one boost (1.0) per matching query-term
    clause — count of matching qterm rows per doc (duplicate query terms
    are separate clauses, exactly like the Spark plan)."""
    vals = ", ".join(f"('{t}')" for t in query_terms)
    return f"""
WITH {_TOK_CTES},
qterms(term) AS (VALUES {vals}),
scores AS (
  SELECT tf.doc_id, count(*)::DOUBLE AS score
  FROM tf JOIN qterms USING (term)
  GROUP BY tf.doc_id
)
{_SIM_TOPK_TAIL.format(k=k)}"""


def _psq_sql(clauses: list[tuple[int, str, float]], k1: float, b: float, k: int) -> str:
    vals = ", ".join(f"({cid}, '{t}', {p})" for cid, t, p in clauses)
    quant = _quant_sql("dl.dl")
    return f"""
WITH {_TOK_CTES},
clauses(cid, term, p) AS (VALUES {vals}),
dfs AS (
  SELECT tf.term, count(*)::DOUBLE AS df FROM tf
  WHERE tf.term IN (SELECT term FROM clauses) GROUP BY tf.term
),
edf AS (
  SELECT c.cid, list_aggregate(list(c.p * dfs.df ORDER BY c.term), 'sum') AS edf
  FROM clauses c JOIN dfs ON dfs.term = c.term GROUP BY c.cid
),
etf AS (
  SELECT tf.doc_id, c.cid, list_aggregate(list(c.p * tf.tf ORDER BY c.term), 'sum') AS etf
  FROM tf JOIN clauses c ON c.term = tf.term GROUP BY tf.doc_id, c.cid
),
scores AS (
  SELECT etf.doc_id,
         list_aggregate(list(
             ln(1 + (stats.n - edf.edf + 0.5) / (edf.edf + 0.5))
              * etf.etf / (etf.etf + {k1} * (1 - {b} + {b} * {quant} / stats.avgdl))
             ORDER BY cid), 'sum') AS score
  FROM etf
  JOIN edf USING (cid)
  JOIN dl ON dl.doc_id = etf.doc_id
  CROSS JOIN stats
  GROUP BY etf.doc_id
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM scores
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _phrase_bm25_sql(phrase: list[str], extra: str, k1: float, b: float,
                     k: int) -> str:
    """Positional phrase + loose term under Lucene-BM25 semantics: phrase
    tf from consecutive token positions, phrase idf = Σ member idfs."""
    quant = _quant_sql("dl.dl")
    phrase_in = ", ".join(f"'{w}'" for w in phrase)
    consec = " AND ".join(f"toks[i+{j}] = '{w}'" for j, w in enumerate(phrase))
    return f"""
WITH {_TOK_CTES},
w AS (
  SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
  FROM documents
),
ph AS (
  SELECT doc_id, count(*)::DOUBLE AS tf FROM (
    SELECT doc_id FROM (
      SELECT doc_id, toks, generate_subscripts(toks, 1) AS i FROM w)
    WHERE i <= len(toks) - {len(phrase) - 1} AND {consec})
  GROUP BY doc_id
),
dfs AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf
  WHERE term IN ({phrase_in}, '{extra}') GROUP BY term
),
phidf AS (
  SELECT list_aggregate(list(ln(1 + (stats.n - df + 0.5) / (df + 0.5)) ORDER BY term), 'sum') AS idf
  FROM dfs CROSS JOIN stats WHERE term IN ({phrase_in})
),
phscore AS (
  SELECT ph.doc_id,
         phidf.idf * ph.tf / (ph.tf + {k1} * (1 - {b} + {b} * {quant} / stats.avgdl)) AS s
  FROM ph JOIN dl ON dl.doc_id = ph.doc_id CROSS JOIN stats CROSS JOIN phidf
),
wscore AS (
  SELECT tf.doc_id,
         ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
           * tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * {quant} / stats.avgdl)) AS s
  FROM tf JOIN dfs ON dfs.term = tf.term AND tf.term = '{extra}'
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats
),
scores AS (
  SELECT doc_id, list_aggregate(list(s ORDER BY ord), 'sum') AS score
  FROM (SELECT doc_id, s, 0 AS ord FROM phscore
        UNION ALL SELECT doc_id, s, 1 AS ord FROM wscore) GROUP BY doc_id
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM scores
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _span_first_sql(term: str, end: int, extra: str, k1: float, b: float,
                    k: int) -> str:
    """SpanFirstQuery replay: span tf counts the term's occurrences at
    1-based positions ≤ end (the sidecar is 0-based with p < end — the two
    cancel), span idf = the wrapped term's FULL-df idf; the extra term
    scores as plain BM25; fold order = clause order (span first)."""
    quant = _quant_sql("dl.dl")
    return f"""
WITH {_TOK_CTES},
w AS (
  SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
  FROM documents
),
sf AS (
  SELECT doc_id, count(*)::DOUBLE AS tf FROM (
    SELECT doc_id, unnest(toks) AS t, generate_subscripts(toks, 1) AS i FROM w)
  WHERE t = '{term}' AND i <= {end}
  GROUP BY doc_id
),
dfs AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf
  WHERE term IN ('{term}', '{extra}') GROUP BY term
),
sfidf AS (
  SELECT ln(1 + (stats.n - df + 0.5) / (df + 0.5)) AS idf
  FROM dfs CROSS JOIN stats WHERE term = '{term}'
),
sfscore AS (
  SELECT sf.doc_id,
         sfidf.idf * sf.tf / (sf.tf + {k1} * (1 - {b} + {b} * {quant} / stats.avgdl)) AS s
  FROM sf JOIN dl ON dl.doc_id = sf.doc_id CROSS JOIN stats CROSS JOIN sfidf
),
wscore AS (
  SELECT tf.doc_id,
         ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
           * tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * {quant} / stats.avgdl)) AS s
  FROM tf JOIN dfs ON dfs.term = tf.term AND tf.term = '{extra}'
  JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats
),
scores AS (
  SELECT doc_id, list_aggregate(list(s ORDER BY ord), 'sum') AS score
  FROM (SELECT doc_id, s, 0 AS ord FROM sfscore
        UNION ALL SELECT doc_id, s, 1 AS ord FROM wscore) GROUP BY doc_id
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM scores
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _range_bm25_sql(lo: str, hi: str, k1: float, b: float, k: int) -> str:
    """Oracle for '[lo TO hi]' (inclusive): query terms = every corpus term
    in the lexicographic range, scoring Σ per-term BM25 over a doc's
    matching terms — exactly the engine's SCORING_BOOLEAN_REWRITE group."""
    quant = _quant_sql("dl.dl")
    return f"""
WITH {_TOK_CTES},
qterms AS (
  SELECT DISTINCT term FROM tf WHERE term >= '{lo}' AND term <= '{hi}'
),
dfs AS (
  SELECT tf.term, count(*)::DOUBLE AS df FROM tf JOIN qterms USING (term)
  GROUP BY tf.term
),
scores AS (
  SELECT tf.doc_id,
         list_aggregate(list(
             ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * {quant} / stats.avgdl))
             ORDER BY tf.term), 'sum') AS score
  FROM tf
  JOIN qterms USING (term)
  JOIN dfs ON dfs.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM scores
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _sloppy_bm25_sql(phrase: list[str], slop: int, k1: float, b: float,
                     k: int) -> str:
    """Sloppy proximity phrase under BM25: tf via the SAME ordered
    anchored-greedy chain as the engine (retrieve._rewrite_phrase_plans
    sloppy branch), replayed as correlated min() subqueries — from each
    first-word position, each later word links to its earliest position
    after the previous link; an anchor matches iff last-first-(k-1) ≤ slop.
    1-based SQL positions vs the sidecar's 0-based cancel in differences."""
    quant = _quant_sql("dl.dl")
    phrase_in = ", ".join(f"'{w}'" for w in phrase)
    n = len(phrase)
    # c{j} carries (doc_id, p1, p{j}): the anchor and the latest link — all
    # any later stage or the final width check needs
    chain = [f"c1 AS (SELECT doc_id, i AS p1 FROM pos WHERE term = '{phrase[0]}')"]
    for j in range(2, n + 1):
        chain.append(
            f"c{j} AS (SELECT c.doc_id, c.p1,\n"
            f"  (SELECT min(p.i) FROM pos p WHERE p.doc_id = c.doc_id\n"
            f"   AND p.term = '{phrase[j - 1]}' AND p.i > c.p{j - 1}) AS p{j}\n"
            f"  FROM c{j - 1} c)")
    chain_sql = ",\n".join(chain)
    return f"""
WITH {_TOK_CTES},
w AS (
  SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
  FROM documents
),
pos AS (
  SELECT doc_id, unnest(toks) AS term, generate_subscripts(toks, 1) AS i
  FROM w
),
{chain_sql},
ph AS (
  SELECT doc_id, count(*)::DOUBLE AS tf FROM c{n}
  WHERE p{n} IS NOT NULL AND p{n} - p1 - {n - 1} <= {slop}
  GROUP BY doc_id
),
dfs AS (
  SELECT term, count(*)::DOUBLE AS df FROM tf
  WHERE term IN ({phrase_in}) GROUP BY term
),
phidf AS (
  SELECT list_aggregate(list(ln(1 + (stats.n - df + 0.5) / (df + 0.5)) ORDER BY term), 'sum') AS idf
  FROM dfs CROSS JOIN stats
),
scores AS (
  SELECT ph.doc_id,
         phidf.idf * ph.tf / (ph.tf + {k1} * (1 - {b} + {b} * {quant} / stats.avgdl)) AS score
  FROM ph JOIN dl ON dl.doc_id = ph.doc_id CROSS JOIN stats CROSS JOIN phidf
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM scores
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _phrase_qld_sql(phrase: list[str], extra: str, mu: int, k: int) -> str:
    """Positional phrase + loose term under QLD: phrase tf from consecutive
    token positions, phrase cf = corpus phrase frequency; each component is
    max(ln(1 + tf/(mu·(cf+1)/(total_tf+1))) + ln(mu/(dlq+mu)), 0)."""
    quant = _quant_sql("dl.dl")
    consec = " AND ".join(f"toks[i+{j}] = '{w}'" for j, w in enumerate(phrase))
    comp = (f"GREATEST(ln(1 + {{tf}} / ({mu} * ({{cf}} + 1) / (stats.total_tf + 1)))"
            f" + ln({mu} / ({quant} + {mu})), 0)")
    return f"""
WITH {_TOK_CTES},
w AS (
  SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
  FROM documents
),
ph AS (
  SELECT doc_id, count(*)::DOUBLE AS tf FROM (
    SELECT doc_id FROM (
      SELECT doc_id, toks, generate_subscripts(toks, 1) AS i FROM w)
    WHERE i <= len(toks) - {len(phrase) - 1} AND {consec})
  GROUP BY doc_id
),
phcf AS (SELECT COALESCE(SUM(tf), 0) AS cf FROM ph),
wcf AS (SELECT SUM(tf.tf) AS cf FROM tf WHERE tf.term = '{extra}'),
phscore AS (
  SELECT ph.doc_id, {comp.format(tf="ph.tf", cf="phcf.cf")} AS s
  FROM ph JOIN dl ON dl.doc_id = ph.doc_id CROSS JOIN stats CROSS JOIN phcf
),
wscore AS (
  SELECT tf.doc_id, {comp.format(tf="tf.tf", cf="wcf.cf")} AS s
  FROM tf JOIN dl ON dl.doc_id = tf.doc_id CROSS JOIN stats CROSS JOIN wcf
  WHERE tf.term = '{extra}'
),
scores AS (
  SELECT doc_id, list_aggregate(list(s ORDER BY ord), 'sum') AS score
  FROM (SELECT doc_id, s, 0 AS ord FROM phscore
        UNION ALL SELECT doc_id, s, 1 AS ord FROM wscore) GROUP BY doc_id
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM scores
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _boolean_and_not_sql(must: list[str], must_not: list[str], k: int) -> str:
    # score = sum of BM25 over the MUST terms; docs must contain all MUST
    # terms and none of the MUST_NOT terms
    vals = ", ".join(f"('{t}')" for t in must)
    nvals = ", ".join(f"('{t}')" for t in must_not)
    quant = _quant_sql("dl.dl")
    return f"""
WITH {_TOK_CTES},
qterms(term) AS (VALUES {vals}),
nterms(term) AS (VALUES {nvals}),
dfs AS (
  SELECT tf.term, count(*)::DOUBLE AS df FROM tf JOIN qterms USING (term)
  GROUP BY tf.term
),
matched AS (
  SELECT tf.doc_id,
         list_aggregate(list(
             ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + 0.9 * (1 - 0.4 + 0.4 * {quant} / stats.avgdl))
             ORDER BY tf.term), 'sum') AS score,
         count(DISTINCT tf.term) AS n_must
  FROM tf
  JOIN qterms USING (term)
  JOIN dfs ON dfs.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
),
ok AS (
  SELECT m.* FROM matched m
  WHERE m.n_must = (SELECT count(*) FROM qterms)
    AND NOT EXISTS (SELECT 1 FROM tf t JOIN nterms USING (term)
                    WHERE t.doc_id = m.doc_id)
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM ok
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _min_should_match_sql(terms: list[str], mm: int, k1: float, b: float,
                          k: int) -> str:
    """All-SHOULD query with minimumNumberShouldMatch=mm: a doc qualifies
    iff it contains at least mm distinct query terms; score = Σ BM25 over
    the matching terms (identical to the plain-OR score on qualifying
    docs)."""
    vals = ", ".join(f"('{t}')" for t in terms)
    quant = _quant_sql("dl.dl")
    return f"""
WITH {_TOK_CTES},
qterms(term) AS (VALUES {vals}),
dfs AS (
  SELECT tf.term, count(*)::DOUBLE AS df FROM tf JOIN qterms USING (term)
  GROUP BY tf.term
),
matched AS (
  SELECT tf.doc_id,
         list_aggregate(list(
             ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * {quant} / stats.avgdl))
             ORDER BY tf.term), 'sum') AS score,
         count(DISTINCT tf.term) AS n_should
  FROM tf
  JOIN qterms USING (term)
  JOIN dfs ON dfs.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM matched
WHERE n_should >= {mm}
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _boolean_nested_sql(group_terms: list[str], must_term: str,
                        not_term: str, k1: float, b: float, k: int) -> str:
    """(g1 OR g2) AND must NOT not — Lucene BooleanQuery: match requires any
    group term AND the must term AND no not-term; score sums BM25 over the
    matching scoring terms (group members where present + the must term)."""
    gvals = ", ".join(f"('{t}')" for t in group_terms)
    quant = _quant_sql("dl.dl")
    return f"""
WITH {_TOK_CTES},
qterms(term) AS (VALUES {gvals}, ('{must_term}')),
dfs AS (
  SELECT tf.term, count(*)::DOUBLE AS df FROM tf JOIN qterms USING (term)
  GROUP BY tf.term
),
scored AS (
  SELECT tf.doc_id,
         list_aggregate(list(
             ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * {quant} / stats.avgdl))
             ORDER BY tf.term), 'sum') AS score,
         BOOL_OR(tf.term IN ({gvals.replace("(", "").replace(")", "")})) AS has_group,
         BOOL_OR(tf.term = '{must_term}') AS has_must
  FROM tf
  JOIN qterms USING (term)
  JOIN dfs ON dfs.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY tf.doc_id
),
ok AS (
  SELECT s.* FROM scored s
  WHERE s.has_group AND s.has_must
    AND NOT EXISTS (SELECT 1 FROM tf t
                    WHERE t.doc_id = s.doc_id AND t.term = '{not_term}')
)
SELECT doc_id,
       (row_number() OVER (ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM ok
ORDER BY score DESC, CAST(doc_id AS VARCHAR) ASC
LIMIT {k}
"""


def _stage_webpages_oracle() -> str:
    """Materialize the webpages_pipeline corpus as (doc_id, text) parquet for
    DuckDB, driver-side. Synthesis (_synth_batch), html→text extraction and
    the RAW analysis chain (pre_normalize → lower → whitespace split) are all
    pure pandas functions, so the oracle input is built without Spark and is
    bit-identical to what the engine indexes. Idempotent: keyed by row count
    AND an md5 of the generating functions' source (a later-round change to
    synthesis/extraction/normalization invalidates the cache instead of
    silently comparing against stale data); written atomically (tmp+rename)."""
    import inspect

    import numpy as np
    import pandas as pd

    from patapsco_spark.functions.normalize import pre_normalize_series
    from patapsco_spark.sources.webpages import _synth_batch, extract_text_series

    src = "".join(inspect.getsource(f) for f in
                  (_synth_batch, extract_text_series, pre_normalize_series))
    key = hashlib.md5(src.encode()).hexdigest()[:10]
    path = os.path.join(tempfile.gettempdir(),
                        f"pspark_weboracle_{WEBPAGES_N}_{key}.parquet")
    if not os.path.exists(path):
        pdf = _synth_batch(np.arange(WEBPAGES_N))
        normed = pre_normalize_series(extract_text_series(pdf["html"]))
        toks = normed.str.lower().str.split()
        out = pd.DataFrame({"doc_id": pdf["url"],
                            "text": toks.map(" ".join)})
        tmp = f"{path}.tmp-{os.getpid()}"
        out.to_parquet(tmp, index=False)
        os.replace(tmp, path)
    return path


def _webpages_bm25_sql(queries: list[tuple[str, str]], k1: float, b: float,
                       k: int) -> str:
    """Multi-query BM25 over the staged webpages corpus (same formulas and
    quantization as _bm25_sql, parameterized by (query_id, term) pairs)."""
    path = _stage_webpages_oracle()
    vals = ", ".join(f"('{qid}', '{t}')" for qid, q in queries for t in q.split())
    quant = _quant_sql("dl.dl")
    return f"""
WITH wp AS (SELECT doc_id, text FROM read_parquet('{path}')),
tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM wp),
tf AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tok WHERE term <> ''
  GROUP BY doc_id, term
),
dl AS (
  SELECT doc_id, count(*)::BIGINT AS dl FROM tok WHERE term <> ''
  GROUP BY doc_id
),
stats AS (
  SELECT (SELECT count(*) FROM wp)::DOUBLE AS n,
         CAST(CAST(sum(dl) AS DOUBLE) / (SELECT count(*) FROM wp) AS REAL)::DOUBLE AS avgdl
  FROM dl
),
qterms(query_id, term) AS (VALUES {vals}),
dfs AS (
  SELECT tf.term, count(*)::DOUBLE AS df
  FROM tf WHERE tf.term IN (SELECT DISTINCT term FROM qterms)
  GROUP BY tf.term
),
scores AS (
  SELECT q.query_id, tf.doc_id,
         list_aggregate(list(
             ln(1 + (stats.n - dfs.df + 0.5) / (dfs.df + 0.5))
              * tf.tf / (tf.tf + {k1} * (1 - {b} + {b} * {quant} / stats.avgdl))
             ORDER BY tf.term), 'sum') AS score
  FROM tf
  JOIN qterms q USING (term)
  JOIN dfs ON dfs.term = tf.term
  JOIN dl ON dl.doc_id = tf.doc_id
  CROSS JOIN stats
  GROUP BY q.query_id, tf.doc_id
)
SELECT query_id, doc_id AS url,
       (row_number() OVER (PARTITION BY query_id
                           ORDER BY score DESC, doc_id ASC) - 1)::BIGINT AS rnk,
       ROUND(score, 5) AS score
FROM scores
QUALIFY rnk < {k}
ORDER BY query_id, rnk
"""


_SIMHASH_SQL = r"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok WHERE term <> ''
  GROUP BY doc_id, term
),
th AS (
  -- first 15 md5 hex chars = the same 60-bit term hash as Spark's
  -- conv(substring(md5(term),1,15), 16, 10)
  SELECT doc_id, tf, ('0x' || substring(md5(term), 1, 15))::BIGINT AS h FROM tf
),
bits AS (
  SELECT doc_id, i, SUM(CASE WHEN (h >> i) & 1 = 1 THEN tf ELSE -tf END) AS s
  FROM th CROSS JOIN (SELECT unnest(range(0, 60)) AS i) b
  GROUP BY doc_id, i
)
SELECT doc_id,
       SUM(CASE WHEN s > 0 THEN 1::BIGINT << i ELSE 0::BIGINT END)::BIGINT AS simhash
FROM bits GROUP BY doc_id
"""


def _ann_lsh_sql(k: int = 10, n_bits: int = 8, seed: int = 42,
                 dim: int = 64) -> str:
    """Exact SQL replay of the LSH-pruned cosine top-k: the hyperplanes are
    seeded-numpy (deterministic), so their values are embedded as literals;
    bucket signatures, the Hamming≤1 probe set, and the exact re-rank are
    all recomputed in SQL. This makes the 'approximate' path fully oracled —
    approximate w.r.t. brute force, deterministic w.r.t. the algorithm."""
    import numpy as np

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bits, dim))
    vals = ", ".join(f"({i}, {j + 1}, {planes[i, j]!r})"
                     for i in range(n_bits) for j in range(dim))
    return f"""
WITH planes(i, j, p) AS (VALUES {vals}),
ex AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS j
  FROM embeddings
),
sigs AS (
  SELECT vec_id, SUM(CASE WHEN d > 0 THEN 1 << i ELSE 0 END)::BIGINT AS sig
  FROM (SELECT ex.vec_id, planes.i, SUM(ex.v * planes.p) AS d
        FROM ex JOIN planes ON planes.j = ex.j
        GROUP BY ex.vec_id, planes.i)
  GROUP BY vec_id
),
qsig AS (SELECT sig FROM sigs WHERE vec_id = 0),
cand AS (
  SELECT s.vec_id FROM sigs s, qsig
  WHERE s.vec_id <> 0 AND bit_count(xor(s.sig, qsig.sig)) <= 1
),
qx AS (
  SELECT CAST(unnest(e) AS DOUBLE) AS qv, generate_subscripts(e, 1) AS j
  FROM (SELECT embedding AS e FROM embeddings WHERE vec_id = 0)
),
dots AS (
  SELECT ex.vec_id, SUM(ex.v * qx.qv) AS dot, SUM(ex.v * ex.v) AS n2
  FROM ex JOIN qx USING (j)
  WHERE ex.vec_id IN (SELECT vec_id FROM cand)
  GROUP BY ex.vec_id
),
qn AS (SELECT SQRT(SUM(qv * qv)) AS qn FROM qx)
SELECT vec_id, ROUND(dot / (SQRT(n2) * qn.qn), 6) AS cosine
FROM dots, qn
ORDER BY dot / (SQRT(n2) * qn.qn) DESC, vec_id ASC
LIMIT {k}
"""


def _dots_cte(quantized: bool) -> str:
    """Candidate scoring CTE for the IVF oracle: full-precision cosine, or
    (quantized=True, the IVFADC path) int8 dequantize-then-cosine with the
    engine's exact double operation order (see ann_sq8_topk oracle)."""
    if not quantized:
        return """dots AS (
  SELECT ex.vec_id, SUM(ex.v * qx.qv) AS dot, SUM(ex.v * ex.v) AS n2
  FROM ex JOIN qx USING (j)
  WHERE ex.vec_id IN (SELECT vec_id FROM cand)
  GROUP BY ex.vec_id
)"""
    return """scales AS (
  SELECT vec_id, GREATEST(MAX(ABS(v)), 1e-30) AS m
  FROM ex WHERE vec_id IN (SELECT vec_id FROM cand) GROUP BY vec_id
),
deq AS (
  SELECT ex.vec_id, ROUND(ex.v * 127.0 / s.m, 0) * (s.m / 127.0) AS dv, ex.j
  FROM ex JOIN scales s USING (vec_id)
),
dots AS (
  SELECT deq.vec_id, SUM(deq.dv * qx.qv) AS dot, SUM(deq.dv * deq.dv) AS n2
  FROM deq JOIN qx USING (j)
  GROUP BY deq.vec_id
)"""


def _ivf_kmeans_ctes(n_cells: int, iters: int, seed: int,
                     train_pred: str = "TRUE") -> list[str]:
    """The shared kmeans-replay CTE chain (base/ex/ord/init → Lloyd rounds
    → final assignment ``afin``) used by the IVF top-k, IVFADC, semdedup
    AND ivf-append oracles — one replay of ann.ivf_build, four consumers.
    ``train_pred`` restricts the TRAINING set (sample order, init, Lloyd
    assignments and means); the final assignment ``afin`` always covers
    ALL vectors — with a real predicate that is exactly ivf_append's
    frozen-centroid assignment of the held-out generation."""
    import numpy as np

    from patapsco_spark.operators.ann import ivf_sample_size

    S = ivf_sample_size(n_cells)
    rng = np.random.default_rng(seed)
    idx = rng.choice(S, size=n_cells, replace=False)  # 0-based into sample
    init_vals = ", ".join(f"({c}, {int(i) + 1})" for c, i in enumerate(idx))

    ctes = [f"""base AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id <> 0),
tb AS (SELECT vec_id FROM base WHERE {train_pred}),
ex AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS j
  FROM base
),
tex AS (SELECT ex.* FROM ex JOIN tb USING (vec_id)),
ord AS (
  SELECT vec_id, row_number() OVER (ORDER BY md5(vec_id::VARCHAR)) AS rk
  FROM tb
),
init(cell, rk) AS (VALUES {init_vals}),
cent0 AS (
  SELECT init.cell, ex.j, ex.v AS c
  FROM init JOIN ord USING (rk) JOIN ex ON ex.vec_id = ord.vec_id
)"""]
    prev = "cent0"
    for it in range(1, iters + 1):
        ctes.append(f"""d{it} AS (
  SELECT tex.vec_id, ct.cell, SUM((tex.v - ct.c) * (tex.v - ct.c)) AS d2
  FROM tex JOIN {prev} ct ON ct.j = tex.j GROUP BY tex.vec_id, ct.cell
),
a{it} AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
    FROM d{it}) WHERE rn = 1
),
m{it} AS (
  SELECT a.cell, tex.j, AVG(tex.v) AS c
  FROM a{it} a JOIN tex USING (vec_id) GROUP BY a.cell, tex.j
),
cent{it} AS (
  SELECT c0.cell, c0.j, COALESCE(m.c, c0.c) AS c
  FROM {prev} c0 LEFT JOIN m{it} m ON m.cell = c0.cell AND m.j = c0.j
)""")
        prev = f"cent{it}"
    ctes.append(f"""dfin AS (
  SELECT ex.vec_id, ct.cell, SUM((ex.v - ct.c) * (ex.v - ct.c)) AS d2
  FROM ex JOIN {prev} ct ON ct.j = ex.j GROUP BY ex.vec_id, ct.cell
),
afin AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id ORDER BY d2, cell) AS rn
    FROM dfin) WHERE rn = 1
)""")
    return ctes


def _semdedup_sql(threshold: float, n_cells: int = IVF_CELLS,
                  iters: int = IVF_ITERS, seed: int = IVF_SEED) -> str:
    """Exact SQL replay of dedup.semdedup's removal evidence: the shared
    kmeans CTEs give the final cell assignment; inside each cell every
    higher-id vector with cosine ≥ threshold against a lower-id mate is
    removed, its reported anchor = the lowest such (anchor_id, cos) pair
    (matching the engine's min-struct pick)."""
    ctes = _ivf_kmeans_ctes(n_cells, iters, seed)
    ctes.append("""nrm AS (
  SELECT vec_id, SQRT(SUM(v * v)) AS n2 FROM ex GROUP BY vec_id
),
pairs AS (
  SELECT a.vec_id AS ia, b.vec_id AS ib, SUM(xa.v * xb.v) AS dot
  FROM afin a JOIN afin b ON a.cell = b.cell AND a.vec_id < b.vec_id
  JOIN ex xa ON xa.vec_id = a.vec_id
  JOIN ex xb ON xb.vec_id = b.vec_id AND xb.j = xa.j
  GROUP BY a.vec_id, b.vec_id
),
sims AS (
  SELECT ia, ib,
         CASE WHEN na.n2 = 0 OR nb.n2 = 0 THEN 0.0
              ELSE dot / (na.n2 * nb.n2) END AS cos
  FROM pairs JOIN nrm na ON na.vec_id = ia JOIN nrm nb ON nb.vec_id = ib
)""")
    return f"""
WITH {", ".join(ctes)}
SELECT vec_id, anchor_id, cos FROM (
  SELECT ib::BIGINT AS vec_id, ia::BIGINT AS anchor_id, ROUND(cos, 6) AS cos,
         row_number() OVER (PARTITION BY ib ORDER BY ia, cos) AS rn
  FROM sims WHERE cos >= {threshold}
) WHERE rn = 1
ORDER BY vec_id
"""


def _ann_ivf_sql(k: int = 10, n_cells: int = IVF_CELLS, iters: int = IVF_ITERS,
                 nprobe: int = IVF_NPROBE, seed: int = IVF_SEED,
                 quantized: bool = False, train_pred: str = "TRUE",
                 filter_pred: str | None = None) -> str:
    """Exact SQL replay of the IVF top-k (see q_ann_ivf_topk): the seeded
    init indices into the md5-ordered 200-vector sample are embedded as
    literals; Lloyd iterations, the final assignment, the nprobe probe and
    the cosine re-rank are all recomputed in SQL. Matches the engine up to
    last-ulp AVG summation order (scores rounded to 6, like every oracle).

    Validity precondition: the base table must have ≥ ivf_sample_size
    (=200) non-query vectors — the engine then draws rng.choice(200, …),
    exactly the literals embedded here. Every driver sf dir satisfies this
    (500-2000 embeddings); smaller ad-hoc corpora fall back to
    rng.choice(len(sample)) in the engine, which this replay does not
    model (covered by the pytest recall checks instead)."""
    ctes = _ivf_kmeans_ctes(n_cells, iters, seed, train_pred=train_pred)
    prev = f"cent{iters}"
    ctes.append(f"""qx AS (
  SELECT CAST(unnest(e) AS DOUBLE) AS qv, generate_subscripts(e, 1) AS j
  FROM (SELECT embedding AS e FROM embeddings WHERE vec_id = 0)
),
probe AS (
  SELECT ct.cell FROM {prev} ct JOIN qx ON qx.j = ct.j
  GROUP BY ct.cell ORDER BY SUM((qx.qv - ct.c) * (qx.qv - ct.c)), ct.cell
  LIMIT {nprobe}
),
cand AS (
  SELECT vec_id FROM afin WHERE cell IN (SELECT cell FROM probe){"" if filter_pred is None else f'''
    AND ({filter_pred})
  UNION
  -- selectivity escape (ann.ivf_filtered_topk): when the probed cells
  -- hold fewer than k matching candidates, take the WHOLE filtered set
  SELECT vec_id FROM afin
  WHERE ({filter_pred})
    AND (SELECT count(*) FROM afin
         WHERE ({filter_pred})
           AND cell IN (SELECT cell FROM probe)) < {k}'''}
),
{_dots_cte(quantized)},
qn AS (SELECT SQRT(SUM(qv * qv)) AS qn FROM qx)""")
    return f"""
WITH {", ".join(ctes)}
SELECT vec_id, ROUND(dot / (SQRT(n2) * qn.qn), 6) AS cosine
FROM dots, qn
ORDER BY dot / (SQRT(n2) * qn.qn) DESC, vec_id ASC
LIMIT {k}
"""


def _lang_multi_sql() -> str:
    """language_id_multi oracle: same lists (loaded from the shipped
    resources — single source of truth), same script regexps, same CASE
    order; Latin rates compared UNROUNDED like the engine, rounded only
    for output."""
    from patapsco_spark.functions.stopwords import load_stopwords

    def inlist(lang: str) -> str:
        return ", ".join("'" + w.replace("'", "''") + "'"
                         for w in sorted(load_stopwords("lucene", lang)))

    def rate(lang: str) -> str:
        return (f"CAST(count(*) FILTER (WHERE lower(t.term) IN "
                f"({inlist(lang)})) AS DOUBLE) / GREATEST(count(t.term), 1)")

    def script(block: str) -> str:
        return (f"CAST(length(regexp_replace(d.text, '[^{block}]', '', 'g'))"
                f" AS DOUBLE) / GREATEST(length(d.text), 1)")

    cjk = "\\x{4e00}-\\x{9fff}"
    hangul = "\\x{ac00}-\\x{d7af}"
    hebrew = "\\x{0590}-\\x{05ff}"
    cyrillic = "\\x{0400}-\\x{04ff}"
    arabic = "\\x{0600}-\\x{06ff}"
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents
), t AS (SELECT doc_id, term FROM tok WHERE term <> ''),
per AS (
  SELECT d.doc_id,
         {rate('eng')} AS eng_rate,
         {rate('spa')} AS spa_rate,
         {rate('ind')} AS ind_rate,
         {rate('ara')} AS ara_rate,
         {rate('fas')} AS fas_rate,
         {script(cjk)} AS cjk_ratio,
         {script(hangul)} AS hangul_ratio,
         {script(hebrew)} AS hebrew_ratio,
         {script(cyrillic)} AS cyrillic_ratio,
         {script(arabic)} AS arabic_ratio
  FROM documents d LEFT JOIN t ON t.doc_id = d.doc_id
  GROUP BY d.doc_id, d.text
)
SELECT doc_id, ROUND(eng_rate, 6) AS eng_rate, ROUND(spa_rate, 6) AS spa_rate,
       ROUND(ind_rate, 6) AS ind_rate,
       CASE WHEN cjk_ratio > 0.25 THEN 'zho'
            WHEN hangul_ratio > 0.25 THEN 'kor'
            WHEN hebrew_ratio > 0.25 THEN 'heb'
            WHEN cyrillic_ratio > 0.25 THEN 'rus'
            WHEN arabic_ratio > 0.25 THEN
                 CASE WHEN fas_rate > ara_rate THEN 'fas' ELSE 'ara' END
            WHEN eng_rate >= 0.12 AND eng_rate >= spa_rate
                 AND eng_rate >= ind_rate THEN 'eng'
            WHEN spa_rate >= 0.12 AND spa_rate >= ind_rate THEN 'spa'
            WHEN ind_rate >= 0.12 THEN 'ind'
            ELSE 'und' END AS lang_guess
FROM per
"""


def _pii_scrub_sql() -> str:
    """pii_scrub oracle: the SAME patterns (single source of truth in
    textstats.PII_*) and the same email → ip → phone replace order."""
    from patapsco_spark.operators.textstats import (
        PII_EMAIL, PII_IP, PII_PHONE)
    em, ip, ph = (p.replace("'", "''") for p in (PII_EMAIL, PII_IP,
                                                 PII_PHONE))
    return f"""
WITH src AS (
  SELECT doc_id,
         concat_ws(' ', text,
           CASE WHEN doc_id % 4 = 0 THEN 'contact bob'
                || CAST(doc_id AS VARCHAR) || '@example.com now' END,
           CASE WHEN doc_id % 5 = 0 THEN 'server 10.0.'
                || CAST(doc_id % 256 AS VARCHAR) || '.1 up' END,
           CASE WHEN doc_id % 6 = 0 THEN 'call +1 555 0199 today' END
         ) AS text
  FROM documents
)
SELECT doc_id,
       len(regexp_extract_all(text, '{em}'))::BIGINT AS n_emails,
       len(regexp_extract_all(text, '{ip}'))::BIGINT AS n_ips,
       len(regexp_extract_all(text, '{ph}'))::BIGINT AS n_phones,
       regexp_replace(
         regexp_replace(
           regexp_replace(text, '{em}', '[EMAIL]', 'g'),
           '{ip}', '[IP]', 'g'),
         '{ph}', '[PHONE]', 'g') AS clean_text
FROM src
"""


def _bpe_token_stats_sql() -> str:
    """bpe_token_stats oracle: the SAME pre-tokenizer regex (single source
    of truth in textstats.BPE_PIECE_PATTERN), SQL-escaped."""
    from patapsco_spark.operators.textstats import BPE_PIECE_PATTERN
    pat = BPE_PIECE_PATTERN.replace("'", "''")
    return f"""
WITH per AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{pat}')) AS n_pieces,
         len(list_filter(string_split(trim(text), ' '), x -> x <> '')) AS n_words
  FROM documents
)
SELECT doc_id, n_pieces, n_words,
       ROUND(CAST(n_pieces AS DOUBLE) / GREATEST(n_words, 1), 6) AS fertility
FROM per
"""


def oracle_sql() -> dict[str, str]:
    from patapsco_spark.functions.stopwords import LUCENE_ENGLISH_STOPWORDS

    stop_list = ", ".join(f"'{w}'" for w in sorted(LUCENE_ENGLISH_STOPWORDS))
    return {
        "bm25_topk": _bm25_sql(BM25_QUERY.split(), 0.9, 0.4, K),
        "bm25f_topk": _bm25f_sql(BM25_QUERY.split(), BM25F_W, BM25F_B,
                                 0.9, K, title_toks=TITLE_TOKS),
        "cross_fields_bm25": _cross_fields_sql(
            BM25_QUERY.split(), BM25F_W, CROSS_TIE, 0.9, 0.4, K),
        "dismax_topk": _dismax_sql(BM25_QUERY.split(), BM25F_W, DISMAX_TIE,
                                   0.9, 0.4, K, title_toks=TITLE_TOKS),
        "filtered_bm25": _filtered_bm25_sql(BM25_QUERY.split(), FILTER_PRED,
                                            0.9, 0.4, K),
        "boosting_bm25": _boosting_sql(BM25_QUERY.split(), NEG_QUERY,
                                       NEG_BOOST, 0.9, 0.4, K),
        "pinned_bm25": _pinned_sql(BM25_QUERY.split(), PINNED_IDS,
                                   0.9, 0.4, K),
        "context_completions": _context_completions_sql(
            CTX_PREFIX, CTX_PREV, CTX_MC, 10),
        "phrase_suggest": _phrase_suggest_sql(PHRASE_SUGGEST_INPUT.split(),
                                              PHRASE_SUGGEST_K,
                                              PHRASE_SUGGEST_MC),
        "rescore_bm25": _rescore_sql(BM25_QUERY.split(),
                                     RESCORE_QUERY.split(), 1.0, RESCORE_W,
                                     0.9, 0.4, RESCORE_WIN, K),
        "top_hits_by_source": _top_hits_sql(BM25_QUERY.split(), 0.9, 0.4,
                                            TOP_HITS_N),
        # identical-to-bm25_topk output against the RESHARDED index — the
        # oracle equality is the shard-size-change correctness proof
        "reshard_bm25": _bm25_sql(BM25_QUERY.split(), 0.9, 0.4, K),
        "index_stats": f"""
WITH {_TOK_CTES}
SELECT (SELECT count(*) FROM documents)::BIGINT AS num_docs,
       (SELECT count(DISTINCT term) FROM tf)::BIGINT AS vocab_size,
       (SELECT sum(dl) FROM dl)::BIGINT AS total_tf,
       (SELECT max(df) FROM (SELECT count(*) AS df FROM tf GROUP BY term))
         ::BIGINT AS max_df,
       ROUND((SELECT avgdl FROM stats), 5) AS avgdl,
       4::BIGINT AS live_shards
""",
        "sliced_scroll": _sliced_scroll_sql(BM25_QUERY.split(), SLICE_ID,
                                            NUM_SLICES),
        "constant_score": _constant_score_sql(BM25_QUERY.split(), 1.5, K),
        # federation must reproduce single-corpus scoring EXACTLY — the
        # oracle is the plain BM25 replay over the unsplit documents
        "federated_bm25": _bm25_sql(BM25_QUERY.split(), 0.9, 0.4, K),
        "page2_bm25": _page2_bm25_sql(BM25_QUERY.split(), 0.9, 0.4, K),
        "hit_counts": _hit_counts_sql(),
        "mlt_bm25": _mlt_bm25_sql(MLT_MIN_TF, MLT_MIN_DF, MLT_MAX_TERMS,
                                  0.9, 0.4, K),
        "recency_bm25": _recency_sql(BM25_QUERY.split(), 0.9, 0.4, K,
                                     PRIOR_DEPTH, DECAY_SCALE, DECAY_RATE),
        "blockjoin_bm25": _blockjoin_sql(BM25_QUERY.split(), 0.9, 0.4, K,
                                         PASS_W, PASS_S),
        "termvectors": _termvectors_sql(TV_IDS),
        "rank_feature_bm25": _rank_feature_sql(BM25_QUERY.split(), 0.9, 0.4,
                                               K, PRIOR_DEPTH, RF_PIVOT,
                                               RF_BOOST),
        "bm25_prior_topk": _bm25_prior_sql(BM25_QUERY.split(), 0.9, 0.4,
                                           K, PRIOR_DEPTH, PRIOR_W),
        "suggest_completions": _suggest_completions_sql(),
        "suggest_spelling": _suggest_spelling_sql(),
        "snippets": _snippets_sql(),
        "qld_topk": _qld_sql(QLD_QUERY.split(), 1000, K),
        "qljm_topk": _qljm_sql(QLD_QUERY.split(), QLJM_LAMBDA, K),
        "classic_topk": _classic_sql(BM25_QUERY.split(), K),
        "dfr_inl2_topk": _dfr_inl2_sql(BM25_QUERY.split(), 1.0, K),
        "dfi_topk": _dfi_sql(BM25_QUERY.split(), K),
        "pl2_topk": _pl2_sql(BM25_QUERY.split(), 1.0, K),
        "f2exp_topk": _f2exp_sql(BM25_QUERY.split(), 0.5, 0.35, K),
        "ib_ll_topk": _ib_ll_sql(BM25_QUERY.split(), 1.0, K),
        "bool_topk": _bool_sql(BM25_QUERY.split(), K),
        "rrf_hybrid": _rrf_sql(BM25_QUERY.split(), 0.9, 0.4, 1000, K, RRF_C),
        "hybrid_linear": _linear_fuse_sql(BM25_QUERY.split(), 0.9, 0.4,
                                          1000, K, *LINEAR_W),
        "synonym_bm25": _synonym_bm25_sql("data", (SYN_TERM,) + SYN_EQUIVS,
                                          0.9, 0.4, K),
        "rm3_topk": _rm3_sql(BM25_QUERY.split(), 0.9, 0.4, K,
                             RM3_FB_DOCS, RM3_FB_TERMS, RM3_OQW),
        "rocchio_topk": _rocchio_sql(BM25_QUERY.split(), 0.9, 0.4, K,
                                     RM3_FB_DOCS, RM3_FB_TERMS,
                                     ROCCHIO_ALPHA, ROCCHIO_BETA),
        "psq_bm25": _psq_sql(PSQ_CLAUSES, 1.2, 0.75, K),
        "boolean_and_not": _boolean_and_not_sql(["window", "stream"], ["batch"], K),
        "boolean_nested": _boolean_nested_sql(["window", "stream"], "data",
                                              "batch", 0.9, 0.4, K),
        "min_should_match": _min_should_match_sql(MSM_TERMS, MSM_MIN,
                                                  0.9, 0.4, K),
        "collapse_by_source": _collapse_by_source_sql(
            BM25_QUERY.split(), 0.9, 0.4, COLLAPSE_DEPTH, K),
        "percolate": _percolate_sql(),
        "sort_by_field": _sort_by_field_sql(BM25_QUERY.split(), K),
        "match_stats": _match_stats_sql(BM25_QUERY.split()),
        "adjacency_matrix": _adjacency_sql(ADJ_FILTERS),
        "sampled_stats": _sampled_stats_sql(BM25_QUERY.split(), 0.9, 0.4,
                                            SAMPLE_SIZE, SAMPLE_PER_VALUE),
        "terms_set_bm25": _terms_set_sql(BM25_QUERY.split(), 0.9, 0.4, K),
        "ltr_features": _ltr_features_sql(BM25_QUERY.split(), 0.9, 0.4,
                                          1000),
        "match_histogram": _match_histogram_sql(BM25_QUERY.split(),
                                                HIST_INTERVAL),
        "match_percentiles": _match_percentiles_sql(BM25_QUERY.split(),
                                                    PCTL_PS),
        "match_cardinality": _match_cardinality_sql(BM25_QUERY.split(),
                                                    KMV_K),
        "match_extended_stats": _match_extended_stats_sql(
            BM25_QUERY.split(), XSTATS_SIGMA),
        "match_matrix_stats": _match_matrix_stats_sql(BM25_QUERY.split()),
        "match_weighted_avg": _match_weighted_avg_sql(BM25_QUERY.split()),
        "match_multi_terms": _match_multi_terms_sql(BM25_QUERY.split(),
                                                    MTERMS_SIZE),
        "match_filters": _match_filters_sql(BM25_QUERY.split(),
                                            dict(FILTERS_AGG), "other"),
        "match_pctl_ranks": _match_pctl_ranks_sql(BM25_QUERY.split(),
                                                  PCTL_RANK_VALUES),
        "match_range_agg": _match_range_agg_sql(BM25_QUERY.split(),
                                                RANGE_BUCKETS),
        "match_top_metrics": _match_top_metrics_sql(BM25_QUERY.split(),
                                                    TOP_METRICS_SIZE),
        "match_value_count": _match_value_count_sql(BM25_QUERY.split()),
        "geo_distance": _geo_distance_sql(BM25_QUERY.split(), *GEO_ORIGIN,
                                          GEO_RADIUS_KM, K),
        "geotile_grid": _geotile_grid_sql(BM25_QUERY.split(), GEO_ZOOM, 10),
        "significant_terms": _significant_terms_sql(
            BM25_QUERY.split(), K, SIGTERMS_MIN_DOC),
        "facet_by_source": _facet_by_source_sql(BM25_QUERY.split()),
        "dv_sort_topk": _dv_sort_sql(BM25_QUERY.split(), K),
        "index_sorted_topk": f"""
SELECT doc_id, rnk, n_chars FROM (
  SELECT doc_id,
         (row_number() OVER (ORDER BY n_chars DESC,
                             CAST(doc_id AS VARCHAR) ASC) - 1)::BIGINT AS rnk,
         n_chars::DOUBLE AS n_chars
  FROM documents
  WHERE n_chars IS NOT NULL
    AND n_chars >= {SV_RANGE[0]} AND n_chars <= {SV_RANGE[1]}
) WHERE rnk < {K}
ORDER BY rnk
""",
        "dv_filtered_bm25": _dv_filtered_bm25_sql(BM25_QUERY.split(),
                                                  DV_LO, DV_HI,
                                                  0.9, 0.4, K),
        "dv_histogram": _dv_histogram_sql(BM25_QUERY.split(),
                                          DV_HIST_INTERVAL),
        "dv_filtered_facets": _dv_filtered_facets_sql(BM25_QUERY.split(),
                                                      DV_LO, DV_HI),
        "dv_decay_bm25": _dv_decay_bm25_sql(BM25_QUERY.split(),
                                            DECAY_ORIGIN, DECAY_SCALE,
                                            0.9, 0.4, K),
        "wildcard_bm25": _wildcard_bm25_sql(WILDCARD_MUST,
                                            WILDCARD_PREFIX + "%",
                                            0.9, 0.4, K),
        "wildcard_general": _wildcard_bm25_sql(
            WILDGEN_MUST,
            WILDGEN_PATTERN.replace("*", "%").replace("?", "_"),
            0.9, 0.4, K),
        "regexp_bm25": _regexp_bm25_sql(REGEXP_MUST, REGEXP_PAT,
                                        0.9, 0.4, K),
        "fuzzy_bm25": _fuzzy_bm25_sql(FUZZY_MUST, FUZZY_BASE, FUZZY_EDITS,
                                      0.9, 0.4, K),
        "delete_bm25": _delete_bm25_sql(BM25_QUERY.split(), 0.9, 0.4, K),
        "upsert_bm25": _upsert_bm25_sql(BM25_QUERY.split(), 0.9, 0.4, K),
        "phrase_bm25": _phrase_bm25_sql(PHRASE_WORDS, PHRASE_EXTRA, 0.9, 0.4, K),
        "span_first_bm25": _span_first_sql(SPANFIRST_TERM, SPANFIRST_END,
                                           SPANFIRST_EXTRA, 0.9, 0.4, K),
        "sloppy_bm25": _sloppy_bm25_sql(PHRASE_WORDS, SLOP, 0.9, 0.4, K),
        "phrase_prefix_bm25": _phrase_prefix_sql(PP_WORDS[0], PP_PREFIX,
                                                 50, 0.9, 0.4, K),
        "span_near_bm25": _span_near_sql(NEAR_A, NEAR_B, NEAR_SLOP,
                                         0.9, 0.4, K),
        "span_not_bm25": _span_not_sql(SPANNOT_A, SPANNOT_B, SPANNOT_SLOP,
                                       0.9, 0.4, K),
        "intervals_bm25": _intervals_sql(INTV_A, INTV_B, INTV_GAPS,
                                         INTV_NOT, 0.9, 0.4, K),
        "intervals_chain_bm25": _intervals_chain_sql(
            INTV_CHAIN, INTV_CHAIN_GAPS, 0.9, 0.4, K),
        # alias resolution must be scoring-transparent: plain BM25 replay
        "alias_bm25": _bm25_sql(BM25_QUERY.split(), 0.9, 0.4, K),
        "range_bm25": _range_bm25_sql(RANGE_LO, RANGE_HI, 0.9, 0.4, K),
        "phrase_qld": _phrase_qld_sql(PHRASE_WORDS, PHRASE_EXTRA, 1000, K),
        "simhash": _SIMHASH_SQL,
        "webpages_pipeline": _webpages_bm25_sql(WEBPAGES_QUERIES, 0.9, 0.4, 10),
        "warc_ingest": (
            "SELECT url, warc_iso, n_bytes, text_md5 "
            f"FROM read_parquet('{_stage_warc_expected()}')"),
        "link_graph": ("WITH " + _link_edges_sql().lstrip() +
                       "\nSELECT src, dst FROM edges"),
        "anchor_texts": _anchor_sql(),
        "anchor_blobs": _anchor_blobs_sql(),
        "latest_revision": _latest_revision_sql(),
        "revision_stats": _revision_stats_sql(),
        "robots_filter": _robots_filter_sql(),
        "crawl_frontier": _crawl_frontier_sql(),
        "main_content": _main_content_sql(),
        "sitemap_urls": _sitemap_urls_sql(),
        "pagerank": _pagerank_sql(),
        "hits": _hits_sql(),
        "pmi_collocations": _pmi_sql(PMI_K, PMI_MIN),
        "harmonic_centrality": _hyperball_sql(),
        "cdx_index": _cdx_sql(),
        "wet_export": (
            "SELECT url, text_md5 "
            f"FROM read_parquet('{_stage_warc_expected()}')"),
        "token_stats": """
WITH tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents)
SELECT d.doc_id,
       count(t.term)::BIGINT AS n_tokens,
       count(DISTINCT t.term)::BIGINT AS n_distinct,
       length(d.text)::BIGINT AS n_chars
FROM documents d LEFT JOIN tok t ON t.doc_id = d.doc_id AND t.term <> ''
GROUP BY d.doc_id, d.text
""",
        "quality_scores": f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents
), t AS (SELECT doc_id, term FROM tok WHERE term <> ''),
per AS (
  SELECT d.doc_id,
         count(t.term)::BIGINT AS n_tokens,
         ROUND(CAST(SUM(length(t.term)) AS DOUBLE) / count(t.term), 6) AS mean_word_len,
         ROUND(CAST(count(*) FILTER (WHERE lower(t.term) IN ({stop_list})) AS DOUBLE)
               / GREATEST(count(t.term), 1), 6) AS stopword_ratio,
         ROUND(CAST(length(regexp_replace(d.text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
               / GREATEST(length(d.text), 1), 6) AS alpha_ratio,
         ROUND(CAST(count(DISTINCT t.term) AS DOUBLE) / GREATEST(count(t.term), 1), 6)
           AS distinct_ratio
  FROM documents d LEFT JOIN t ON t.doc_id = d.doc_id
  GROUP BY d.doc_id, d.text
)
SELECT *, ROUND(
    (CASE WHEN mean_word_len BETWEEN 2 AND 12 THEN 0.25 ELSE 0 END)
  + (CASE WHEN stopword_ratio >= 0.05 THEN 0.25 ELSE 0 END)
  + (CASE WHEN alpha_ratio >= 0.5 THEN 0.25 ELSE 0 END)
  + (CASE WHEN distinct_ratio >= 0.2 THEN 0.25 ELSE 0 END), 6) AS quality
FROM per
""",
        "language_id_multi": _lang_multi_sql(),
        "bpe_token_stats": _bpe_token_stats_sql(),
        "gopher_rules": r"""
WITH src AS (
  SELECT doc_id,
         concat_ws(chr(10),
           CASE WHEN doc_id % 5 = 0 THEN '- top stories' END,
           CASE WHEN doc_id % 11 = 0 THEN '### trending #tags ' || text
                ELSE text END,
           CASE WHEN doc_id % 7 = 0 THEN 'read the full story...' END) AS text
  FROM documents
),
tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
  FROM src
),
t AS (SELECT doc_id, term FROM tok WHERE term <> ''),
ts AS (
  SELECT s.doc_id,
         count(t.term)::BIGINT AS n_words,
         ROUND(COALESCE(SUM(length(t.term)), 0)::DOUBLE
               / GREATEST(count(t.term), 1), 6) AS mean_word_len,
         ROUND(CAST(count(*) FILTER (WHERE regexp_matches(t.term, '[A-Za-z]'))
               AS DOUBLE) / GREATEST(count(t.term), 1), 6) AS alpha_word_frac,
         count(DISTINCT CASE WHEN lower(t.term) IN
               ('the','be','to','of','and','that','have','with')
               THEN lower(t.term) END)::BIGINT AS stop_hits
  FROM src s LEFT JOIN t ON t.doc_id = s.doc_id
  GROUP BY s.doc_id
),
ls AS (
  SELECT doc_id,
         len(list_filter(string_split(text, chr(10)),
                         l -> trim(l) <> '')) AS nl,
         len(list_filter(string_split(text, chr(10)),
                         l -> regexp_matches(trim(l), '^[-•*]'))) AS nb,
         len(list_filter(string_split(text, chr(10)),
                         l -> regexp_matches(trim(l), '(\.\.\.|…)$'))) AS ne,
         len(regexp_extract_all(text, '#'))
           + len(regexp_extract_all(text, '\.\.\.')) AS n_sym
  FROM src
),
feat AS (
  SELECT ts.doc_id, ts.n_words, ts.mean_word_len,
         ROUND(CAST(ls.n_sym AS DOUBLE) / GREATEST(ts.n_words, 1), 6)
           AS symbol_ratio,
         ROUND(CAST(ls.nb AS DOUBLE) / GREATEST(ls.nl, 1), 6) AS bullet_frac,
         ROUND(CAST(ls.ne AS DOUBLE) / GREATEST(ls.nl, 1), 6)
           AS ellipsis_frac,
         ts.alpha_word_frac, ts.stop_hits
  FROM ts JOIN ls USING (doc_id)
)
SELECT *,
  (n_words >= 50 AND n_words <= 100000) AS words_ok,
  (mean_word_len >= 3 AND mean_word_len <= 10) AS wordlen_ok,
  (symbol_ratio <= 0.1) AS symbol_ok,
  (bullet_frac < 0.9) AS bullet_ok,
  (ellipsis_frac < 0.3) AS ellipsis_ok,
  (alpha_word_frac >= 0.8) AS alpha_ok,
  (stop_hits >= 2) AS stops_ok,
  (n_words >= 50 AND n_words <= 100000
   AND mean_word_len >= 3 AND mean_word_len <= 10
   AND symbol_ratio <= 0.1 AND bullet_frac < 0.9 AND ellipsis_frac < 0.3
   AND alpha_word_frac >= 0.8 AND stop_hits >= 2) AS pass_all
FROM feat
""",
        "dsir_weights": r"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\s+'),
                     x -> x <> '') AS ts
  FROM documents
),
big AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(ts)),
                               i -> ts[i] || ' ' || ts[i+1])) AS bg
  FROM toks WHERE len(ts) >= 2
),
h AS (
  -- the indexer's engine-portable 60-bit md5-prefix hash, mod 4096 buckets
  SELECT doc_id, ('0x' || substring(md5(bg), 1, 15))::BIGINT % 4096 AS h
  FROM big
),
raw_cnt AS (SELECT h, count(*)::DOUBLE AS cr FROM h GROUP BY h),
tgt_cnt AS (SELECT h, count(*)::DOUBLE AS ct FROM h
            WHERE doc_id % 7 = 0 GROUP BY h),
tot AS (SELECT (SELECT SUM(cr) FROM raw_cnt) AS nr,
               (SELECT COALESCE(SUM(ct), 0) FROM tgt_cnt) AS nt),
ratio AS (
  SELECT r.h,
         ln((COALESCE(t.ct, 0) + 1.0) / (tot.nt + 4096.0))
       - ln((r.cr + 1.0) / (tot.nr + 4096.0)) AS lr
  FROM raw_cnt r LEFT JOIN tgt_cnt t USING (h) CROSS JOIN tot
),
per AS (
  SELECT h.doc_id, count(*)::BIGINT AS n_bigrams, SUM(ratio.lr) AS lw
  FROM h JOIN ratio USING (h)
  GROUP BY h.doc_id
)
SELECT d.doc_id, COALESCE(p.n_bigrams, 0)::BIGINT AS n_bigrams,
       ROUND(COALESCE(p.lw, 0.0), 6) AS log_weight
FROM documents d LEFT JOIN per p USING (doc_id)
""",
        "line_dedup": r"""
WITH src AS (
  SELECT doc_id,
         concat_ws(chr(10),
                   CASE WHEN doc_id % 3 = 0
                        THEN 'COOKIE NOTICE: this site uses cookies' END,
                   text,
                   CASE WHEN doc_id % 2 = 0
                        THEN 'Copyright 2026 Example Corp' END) AS text
  FROM documents
),
lines AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
  FROM src
),
keyed AS (
  SELECT doc_id, pos, line,
         CASE WHEN trim(line) <> '' THEN md5(trim(line)) END AS lkey
  FROM lines
),
hot AS (
  SELECT lkey FROM keyed WHERE lkey IS NOT NULL
  GROUP BY lkey HAVING count(DISTINCT doc_id) >= 50
),
kept AS (
  SELECT k.* FROM keyed k
  WHERE k.lkey IS NULL OR k.lkey NOT IN (SELECT lkey FROM hot)
),
clean AS (
  SELECT doc_id, count(*)::BIGINT AS n_kept,
         string_agg(line, chr(10) ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id
),
base AS (
  SELECT doc_id, len(string_split(text, chr(10)))::BIGINT AS n_lines FROM src
)
SELECT b.doc_id, b.n_lines,
       (b.n_lines - COALESCE(c.n_kept, 0))::BIGINT AS n_removed,
       COALESCE(c.clean_text, '') AS clean_text
FROM base b LEFT JOIN clean c USING (doc_id)
""",
        "substring_dedup": rf"""
WITH base AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN text || '{SUBSTR_BOILERPLATE}' ELSE text END AS t
  FROM documents
),
b2 AS (
  SELECT doc_id, COALESCE(t, '') AS t,
         len(COALESCE(t, ''))::BIGINT AS n_chars
  FROM base
),
grams AS (
  SELECT doc_id, unnest(range(1, len(t) - 40 + 2)) AS p
  FROM b2 WHERE len(t) >= 40
),
g2 AS (
  SELECT g.doc_id, g.p::INT AS p, substr(b.t, g.p::INT, 40) AS gram
  FROM grams g JOIN b2 b USING (doc_id)
),
hot AS (SELECT gram FROM g2 GROUP BY gram HAVING count(*) >= 2),
marks AS (SELECT doc_id, p FROM g2 WHERE gram IN (SELECT gram FROM hot)),
flags AS (
  SELECT doc_id, p,
         CASE WHEN lag(p) OVER w IS NULL
                OR p - lag(p) OVER w > 40 THEN 1 ELSE 0 END AS newisl
  FROM marks WINDOW w AS (PARTITION BY doc_id ORDER BY p)
),
isl AS (
  SELECT doc_id, p,
         SUM(newisl) OVER (PARTITION BY doc_id ORDER BY p
                           ROWS UNBOUNDED PRECEDING) AS island
  FROM flags
),
spans AS (
  SELECT doc_id, island, min(p) AS s, max(p) + 40 AS e
  FROM isl GROUP BY doc_id, island
),
rem AS (
  SELECT doc_id, SUM(e - s)::BIGINT AS n_removed FROM spans GROUP BY doc_id
),
segs AS (
  SELECT doc_id, s, e,
         lag(e, 1, 1) OVER (PARTITION BY doc_id ORDER BY s) AS prev_e
  FROM spans
),
pieces AS (
  SELECT sg.doc_id,
         string_agg(substr(b.t, sg.prev_e, sg.s - sg.prev_e), ''
                    ORDER BY sg.s) AS head,
         max(sg.e) AS last_e
  FROM segs sg JOIN b2 b USING (doc_id)
  GROUP BY sg.doc_id
)
SELECT b.doc_id, b.n_chars,
       COALESCE(r.n_removed, 0)::BIGINT AS n_removed,
       CASE WHEN p.doc_id IS NULL THEN b.t
            ELSE COALESCE(p.head, '')
                 || substr(b.t, p.last_e, b.n_chars - p.last_e + 1)
       END AS clean_text
FROM b2 b LEFT JOIN rem r USING (doc_id) LEFT JOIN pieces p USING (doc_id)
""",
        "pii_scrub": _pii_scrub_sql(),
        "clean_funnel": rf"""
WITH src AS (
  SELECT doc_id,
         concat_ws(chr(10),
                   CASE WHEN doc_id % 3 = 0
                        THEN 'COOKIE NOTICE: this site uses cookies' END,
                   CASE WHEN doc_id % 29 = 0
                        THEN '{CLEAN_DUP_BODY}' ELSE text END,
                   CASE WHEN doc_id % 2 = 0
                        THEN 'Copyright 2026 Example Corp' END) AS text
  FROM documents
),
lines AS (
  SELECT doc_id,
         unnest(string_split(text, chr(10))) AS line,
         unnest(range(1, len(string_split(text, chr(10))) + 1)) AS pos
  FROM src
),
keyed AS (
  SELECT doc_id, pos, line,
         CASE WHEN trim(line) <> '' THEN md5(trim(line)) END AS lkey
  FROM lines
),
hot AS (
  SELECT lkey FROM keyed WHERE lkey IS NOT NULL
  GROUP BY lkey HAVING count(DISTINCT doc_id) >= 50
),
kept AS (
  SELECT k.* FROM keyed k
  WHERE k.lkey IS NULL OR k.lkey NOT IN (SELECT lkey FROM hot)
),
cleaned AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text
  FROM kept GROUP BY doc_id
  HAVING trim(string_agg(line, chr(10) ORDER BY pos)) <> ''
),
deduped AS (
  SELECT doc_id, text FROM (
    SELECT doc_id, text,
           min(doc_id) OVER (PARTITION BY md5(text)) AS keep
    FROM cleaned) WHERE keep = doc_id
),
tokd AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\s+'),
                     x -> x <> '') AS toks
  FROM deduped
),
final AS (
  SELECT doc_id FROM tokd
  WHERE len(toks) >= 5 AND len(list_distinct(toks)) > 0.4 * len(toks)
)
SELECT * FROM (
  SELECT 0::BIGINT AS stage_no, 'input' AS stage,
         (SELECT count(*) FROM src)::BIGINT AS docs_out
  UNION ALL SELECT 1::BIGINT, 'line_dedup',
         (SELECT count(*) FROM cleaned)::BIGINT
  UNION ALL SELECT 2::BIGINT, 'exact_dedup',
         (SELECT count(*) FROM deduped)::BIGINT
  UNION ALL SELECT 3::BIGINT, 'quality',
         (SELECT count(*) FROM final)::BIGINT
) ORDER BY stage_no
""",
        "ulm_perplexity": r"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS term
  FROM documents
), t AS (SELECT doc_id, term FROM tok WHERE term <> ''),
lm AS (SELECT term, count(*)::BIGINT AS cnt FROM t GROUP BY term),
tot AS (SELECT SUM(cnt) AS tot FROM lm),
per AS (
  SELECT t.doc_id, count(*)::BIGINT AS n_tokens,
         AVG(log2(tot.tot) - log2(l.cnt)) AS ce
  FROM t JOIN lm l USING (term) CROSS JOIN tot
  GROUP BY t.doc_id
)
SELECT d.doc_id,
       COALESCE(p.n_tokens, 0) AS n_tokens,
       ROUND(p.ce, 6) AS cross_entropy,
       ROUND(POW(2.0, p.ce), 4) AS perplexity
FROM documents d LEFT JOIN per p USING (doc_id)
""",
        "sb_perplexity": _sb_perplexity_sql(SB_LM_HEX),
        "language_id": f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text,' ')) AS term FROM documents
), t AS (SELECT doc_id, term FROM tok WHERE term <> ''),
per AS (
  SELECT d.doc_id,
         ROUND(CAST(count(*) FILTER (WHERE lower(t.term) IN ({stop_list})) AS DOUBLE)
               / GREATEST(count(t.term), 1), 6) AS eng_stop_ratio,
         CAST(length(regexp_replace(d.text, '[^\\x{{4e00}}-\\x{{9fff}}]', '', 'g')) AS DOUBLE)
               / GREATEST(length(d.text), 1) AS cjk_ratio
  FROM documents d LEFT JOIN t ON t.doc_id = d.doc_id
  GROUP BY d.doc_id, d.text
)
SELECT doc_id, eng_stop_ratio,
       CASE WHEN cjk_ratio > 0.25 THEN 'zho'
            WHEN eng_stop_ratio >= 0.12 THEN 'eng'
            ELSE 'und' END AS lang_guess
FROM per
""",
        "fingerprints": """
WITH base AS (
  SELECT doc_id, list_filter(string_split(text,' '), x -> x <> '') AS toks, text
  FROM documents
),
pos AS (
  SELECT doc_id, toks, generate_subscripts(toks, 1) AS i FROM base
),
sh AS (
  SELECT doc_id, md5(array_to_string(list_slice(toks, i, i + 4), ' ')) AS h
  FROM pos WHERE i <= len(toks) - 4
),
long_docs AS (
  SELECT doc_id, min(h) AS fingerprint FROM sh GROUP BY doc_id
),
short_docs AS (
  SELECT doc_id, md5(text) AS fingerprint FROM base WHERE len(toks) < 5
)
SELECT * FROM long_docs UNION ALL SELECT * FROM short_docs
""",
        "repetition_stats": """
WITH w AS (
  SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
  FROM documents
),
base AS (
  SELECT doc_id, toks, len(toks)::BIGINT AS n_tokens,
         CASE WHEN len(toks) >= 3 THEN
           ROUND(1.0 - CAST(len(list_distinct(list_transform(
                 range(1, len(toks) - 1),
                 i -> array_to_string(list_slice(toks, i, i + 2), ' ')))) AS DOUBLE)
               / GREATEST(len(toks) - 2, 1), 6)
         ELSE 0.0 END AS dup_trigram_frac
  FROM w
),
big AS (
  SELECT doc_id,
         unnest(CASE WHEN len(toks) >= 2 THEN
           list_transform(range(1, len(toks)),
                          i -> array_to_string(list_slice(toks, i, i + 1), ' '))
         ELSE [] END) AS bigram
  FROM w
),
cnts AS (
  SELECT doc_id, bigram, count(*)::BIGINT AS cnt FROM big GROUP BY doc_id, bigram
),
top AS (
  SELECT doc_id, bigram AS top_bigram, cnt FROM (
    SELECT *, row_number() OVER (PARTITION BY doc_id
                                 ORDER BY cnt DESC, bigram ASC) AS rn
    FROM cnts) WHERE rn = 1
)
SELECT b.doc_id, b.n_tokens, t.top_bigram,
       ROUND(COALESCE(t.cnt * 2.0 / GREATEST(b.n_tokens, 1), 0.0), 6) AS top_bigram_frac,
       b.dup_trigram_frac
FROM base b LEFT JOIN top t USING (doc_id)
""",
        "approx_terms": _approx_terms_sql(APPROX_TERMS_SIZE,
                                          APPROX_TERMS_SHARD_SIZE,
                                          APPROX_TERMS_SHARDS),
        "composite_page": f"""
SELECT lang, source, count(*)::BIGINT AS doc_count,
       ROUND(avg(n_chars), 6) AS avg_chars
FROM documents
WHERE lang IS NOT NULL AND source IS NOT NULL
  AND (lang > '{COMPOSITE_AFTER[0]}'
       OR (lang = '{COMPOSITE_AFTER[0]}'
           AND source > '{COMPOSITE_AFTER[1]}'))
GROUP BY lang, source
ORDER BY lang, source
LIMIT {COMPOSITE_SIZE}
""",
        "top_ngrams": """
WITH w AS (
  SELECT list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
  FROM documents
),
grams AS (
  SELECT unnest(CASE WHEN len(toks) >= 2 THEN
    list_transform(range(1, len(toks)),
                   i -> array_to_string(list_slice(toks, i, i + 1), ' '))
  ELSE [] END) AS ngram
  FROM w
)
SELECT ngram, count(*)::BIGINT AS cnt FROM grams GROUP BY ngram
ORDER BY cnt DESC, ngram ASC LIMIT 100
""",
        "contamination_overlap": """
WITH tok AS (
  SELECT doc_id, list_filter(string_split(trim(text), ' '), t -> t <> '') AS w
  FROM documents
),
g AS (
  SELECT doc_id,
         CASE WHEN len(w) >= 3
              THEN list_distinct([array_to_string(w[i:i+2], ' ')
                                  for i in range(1, len(w) - 1)])
              ELSE [] END AS grams
  FROM tok
),
evg AS (
  SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 97 = 0
),
cg AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 97 <> 0),
per AS (
  SELECT cg.doc_id, count(*) AS n_grams,
         SUM(CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
  FROM cg LEFT JOIN evg e USING (gram) GROUP BY cg.doc_id
)
SELECT d.doc_id, COALESCE(p.n_grams, 0)::BIGINT AS n_grams,
       COALESCE(p.n_hit, 0)::BIGINT AS n_hit,
       CASE WHEN COALESCE(p.n_grams, 0) > 0
            THEN CAST(p.n_hit AS DOUBLE) / p.n_grams ELSE 0.0 END
         AS contamination
FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
LEFT JOIN per p USING (doc_id)
""",
        "url_domain_stats": """
WITH base AS (
  SELECT 'HTTP://WWW.Site' || CAST(doc_id % 7 AS VARCHAR) || '.COM:80/p/' ||
         CAST(doc_id % 50 AS VARCHAR) ||
         CASE CAST(doc_id % 3 AS INT)
           WHEN 0 THEN '/?utm_source=feed&b=2&a=1'
           WHEN 1 THEN '?a=1&utm_campaign=x&b=2#frag'
           ELSE '/' END AS url
  FROM documents
),
nofrag AS (SELECT regexp_replace(trim(url), '#.*$', '') AS u FROM base),
pre AS (
  SELECT u, lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)', 1))
           AS prefix0
  FROM nofrag
),
parts AS (
  SELECT u,
         regexp_replace(regexp_replace(prefix0, '^(http://[^/:]+):80$', '\\1'),
                        '^(https://[^/:]+):443$', '\\1') AS prefix,
         substring(u, length(prefix0) + 1) AS rest
  FROM pre
),
canon AS (
  SELECT prefix || regexp_replace(regexp_replace(rest, '\\?.*$', ''), '/+$', '')
           || CASE WHEN qs <> '' THEN '?' || qs ELSE '' END AS canonical,
         lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)', 1))
           AS host
  FROM (
    SELECT u, prefix, rest,
           array_to_string(list_sort(list_filter(
             string_split(regexp_extract(rest, '\\?(.*)$', 1), '&'),
             p -> p <> '' AND NOT regexp_matches(
               p, '^(utm_[^=]*|fbclid|gclid|msclkid|ref|ref_src)='))), '&')
             AS qs
    FROM parts)
),
dom AS (
  SELECT canonical,
         CASE WHEN len(labels) >= 3 AND
                   array_to_string(labels[len(labels)-1:len(labels)], '.') IN
                   ('co.uk','org.uk','ac.uk','gov.uk','com.au','net.au',
                    'org.au','co.jp','ne.jp','or.jp','com.br','com.cn',
                    'com.mx','com.tr','com.ar','co.in','co.kr','co.za','co.nz')
              THEN array_to_string(labels[len(labels)-2:len(labels)], '.')
              WHEN len(labels) >= 2
              THEN array_to_string(labels[len(labels)-1:len(labels)], '.')
              ELSE host END AS domain
  FROM (SELECT canonical, host, string_split(host, '.') AS labels FROM canon)
),
per AS (SELECT domain, canonical, count(*) AS c FROM dom
        GROUP BY domain, canonical)
SELECT domain, SUM(c)::BIGINT AS n_pages, COUNT(*)::BIGINT AS n_canonical,
       ROUND(1.0 - COUNT(*) / CAST(SUM(c) AS DOUBLE), 6) AS dup_rate
FROM per GROUP BY domain
""",
        "eval_metrics": """
WITH run0 AS (
  SELECT lang AS query_id, CAST(doc_id AS VARCHAR) AS doc_id,
         n_chars + doc_id / 100000.0 AS score,
         row_number() OVER (PARTITION BY lang
                            ORDER BY n_chars + doc_id/100000.0 DESC) AS rn
  FROM documents
), run AS (SELECT query_id, doc_id, score FROM run0 WHERE rn <= 30),
qrels AS (
  SELECT lang AS query_id, CAST(doc_id AS VARCHAR) AS doc_id,
         CAST(doc_id % 3 AS INT) AS rel
  FROM documents WHERE n_chars % 3 = 0
),
ideal AS (
  SELECT query_id,
         SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS num_rel,
         SUM(rel / log2(irank + 1.0)) AS idcg
  FROM (SELECT query_id, rel,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY rel DESC, doc_id DESC) AS irank
        FROM qrels)
  GROUP BY query_id
),
ranked AS (
  SELECT r.query_id, r.doc_id, COALESCE(q.rel, 0) AS rel,
         q.rel IS NOT NULL AS judged,
         row_number() OVER (PARTITION BY r.query_id
                            ORDER BY r.score DESC, r.doc_id DESC) AS trec_rank
  FROM run r LEFT JOIN qrels q USING (query_id, doc_id)
),
perdoc AS (
  SELECT *,
         SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY query_id ORDER BY trec_rank) AS cum_rel
  FROM ranked
),
jranked AS (
  SELECT query_id, rel,
         row_number() OVER (PARTITION BY query_id ORDER BY trec_rank) AS jrank
  FROM ranked WHERE judged
),
agg AS (
  SELECT query_id,
         SUM(CASE WHEN rel > 0 THEN CAST(cum_rel AS DOUBLE)/trec_rank ELSE 0 END) AS ap_num,
         SUM(rel / log2(trec_rank + 1.0)) AS dcg,
         SUM(CASE WHEN rel > 0 AND trec_rank <= 100 THEN 1 ELSE 0 END) AS rel100,
         SUM(CASE WHEN rel > 0 AND trec_rank <= 10 THEN 1 ELSE 0 END) AS rel10,
         MIN(CASE WHEN rel > 0 THEN trec_rank END) AS first_rel,
         SUM(CASE WHEN judged AND trec_rank <= 10 THEN 1 ELSE 0 END) AS judged10,
         MAX(CASE WHEN rel > 0 AND trec_rank <= 10 THEN 1 ELSE 0 END) AS succ10
  FROM perdoc GROUP BY query_id
),
aggr AS (
  SELECT p.query_id,
         SUM(CASE WHEN p.rel > 0 AND p.trec_rank <= i.num_rel THEN 1 ELSE 0 END) AS rel_at_R
  FROM perdoc p JOIN ideal i USING (query_id) GROUP BY p.query_id
),
nn AS (
  SELECT query_id, SUM(CASE WHEN rel = 0 THEN 1 ELSE 0 END) AS n_nonrel
  FROM qrels GROUP BY query_id
),
jc AS (
  SELECT query_id, rel,
         COALESCE(SUM(CASE WHEN rel = 0 THEN 1 ELSE 0 END)
           OVER (PARTITION BY query_id ORDER BY jrank
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS nonrel_above
  FROM jranked
),
aggb AS (
  SELECT jc.query_id,
         SUM(CASE WHEN jc.rel > 0 THEN
               CASE WHEN jc.nonrel_above = 0 THEN 1.0
                    ELSE 1.0 - CAST(LEAST(jc.nonrel_above, i.num_rel) AS DOUBLE)
                               / LEAST(nn.n_nonrel, i.num_rel) END
             ELSE 0 END) AS bpref_num
  FROM jc JOIN ideal i USING (query_id) JOIN nn USING (query_id)
  GROUP BY jc.query_id
),
aggp AS (
  SELECT query_id, SUM(rel / log2(jrank + 1.0)) AS dcg_prime
  FROM jranked GROUP BY query_id
),
perq AS (
  SELECT i.query_id,
         CASE WHEN i.num_rel > 0 THEN COALESCE(a.ap_num, 0)/i.num_rel ELSE 0 END AS map,
         CASE WHEN i.idcg > 0 THEN COALESCE(a.dcg, 0)/i.idcg ELSE 0 END AS ndcg,
         CASE WHEN i.idcg > 0 THEN COALESCE(p.dcg_prime, a.dcg, 0)/i.idcg ELSE 0 END AS ndcg_prime,
         CASE WHEN i.num_rel > 0 THEN COALESCE(a.rel100, 0)/CAST(i.num_rel AS DOUBLE)
              ELSE 0 END AS recall_100,
         COALESCE(a.rel10, 0)/10.0 AS P_10,
         COALESCE(1.0 / a.first_rel, 0) AS recip_rank,
         COALESCE(a.judged10, 0)/10.0 AS judged_10,
         CASE WHEN i.num_rel > 0 THEN COALESCE(r2.rel_at_R, 0)/CAST(i.num_rel AS DOUBLE)
              ELSE 0 END AS "Rprec",
         CASE WHEN i.num_rel > 0 THEN COALESCE(b.bpref_num, 0)/i.num_rel
              ELSE 0 END AS bpref,
         CAST(COALESCE(a.succ10, 0) AS DOUBLE) AS success_10
  FROM ideal i LEFT JOIN agg a USING (query_id) LEFT JOIN aggp p USING (query_id)
       LEFT JOIN aggr r2 USING (query_id) LEFT JOIN aggb b USING (query_id)
  WHERE i.num_rel > 0
)
SELECT query_id, ROUND(map,6) AS map, ROUND(ndcg,6) AS ndcg,
       ROUND(ndcg_prime,6) AS ndcg_prime, ROUND(recall_100,6) AS recall_100,
       ROUND(P_10,6) AS P_10, ROUND(recip_rank,6) AS recip_rank,
       ROUND(judged_10,6) AS judged_10, ROUND("Rprec",6) AS "Rprec",
       ROUND(bpref,6) AS bpref, ROUND(success_10,6) AS success_10
FROM perq
UNION ALL
SELECT 'all', ROUND(AVG(map),6), ROUND(AVG(ndcg),6), ROUND(AVG(ndcg_prime),6),
       ROUND(AVG(recall_100),6), ROUND(AVG(P_10),6), ROUND(AVG(recip_rank),6),
       ROUND(AVG(judged_10),6), ROUND(AVG("Rprec"),6), ROUND(AVG(bpref),6),
       ROUND(AVG(success_10),6) FROM perq
""",
        "media_stats": """
SELECT doc_id,
  CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
  16 + strlen(text) AS n_bytes, md5(text) AS body_md5
FROM documents
""",
        "frame_samples": """
WITH v AS (SELECT doc_id, 10 + strlen(text) % 240 AS n_frames
           FROM documents WHERE doc_id % 3 = 2)
SELECT doc_id, CAST(unnest(range(0, n_frames, 10)) AS INT) AS frame_idx,
       CAST(unnest(range(0, n_frames, 10)) * 40 AS BIGINT) AS ts_ms
FROM v
""",
        "image_resize_meta": """
WITH im AS (SELECT doc_id, strlen(text) AS L, text
            FROM documents WHERE doc_id % 3 = 0),
dims AS (
  SELECT doc_id, text,
         CAST(32 + L % 480 AS INT) AS width,
         CAST(32 + (L*7) % 360 AS INT) AS height
  FROM im
)
SELECT doc_id, width, height, 64 AS out_width,
  GREATEST(1, CAST(floor(height * 64.0 / width + 0.5) AS INT)) AS out_height,
  md5(text || '|64x' ||
      GREATEST(1, CAST(floor(height * 64.0 / width + 0.5) AS INT))) AS resized_md5
FROM dims
""",
        "embedding_near_dup": """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cosine
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
""",
        "embedding_dedup_clusters": """
WITH RECURSIVE pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
  WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.4
),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
walk(src, node) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT wk.src, e.b FROM walk wk JOIN edges e ON wk.node = e.a
),
comp AS (SELECT src AS doc_id, MIN(node) AS cluster FROM walk GROUP BY src)
SELECT doc_id, cluster,
       COUNT(*) OVER (PARTITION BY cluster) AS cluster_size
FROM comp
""",
        "html_extract_roundtrip": """
SELECT doc_id, length(text) AS n_chars, md5(text) AS text_md5 FROM documents
""",
        "exact_dedup": """
SELECT md5(text) AS text_hash, count(*)::BIGINT AS n_dups,
       min(doc_id) AS canonical_id
FROM documents GROUP BY md5(text)
""",
        "minhash_signatures": """
WITH tok AS (
  SELECT DISTINCT doc_id, unnest(string_split(text,' ')) AS term FROM documents
), t AS (SELECT doc_id, term FROM tok WHERE term <> ''),
seeds(seed) AS (VALUES (0),(1),(2),(3))
SELECT doc_id, seed::BIGINT AS seed,
       min(md5(seed::VARCHAR || ':' || term)) AS minhash
FROM t CROSS JOIN seeds
GROUP BY doc_id, seed
""",
        "jaccard_pairs": """
WITH w AS (
  SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
  FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_transform(range(1, len(toks) - 1),
                                  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
              ELSE [] END AS shingles
  FROM w
), t AS (SELECT DISTINCT doc_id, unnest(shingles) AS term FROM sh),
sizes AS (SELECT doc_id, count(*) AS sz FROM t GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM t a JOIN t b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT id_a, id_b,
       ROUND(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5
""",
        "pack_sequences": """
WITH s AS (
  SELECT doc_id,
         len(list_filter(string_split(trim(text), ' '), x -> x <> '')) AS n_tokens
  FROM documents
), o AS (
  SELECT doc_id, n_tokens,
         -- DuckDB SUM(BIGINT) widens to HUGEINT; cast back for dtype parity
         CAST(COALESCE(SUM(n_tokens + 1) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS "offset"
  FROM s
)
SELECT doc_id, n_tokens, "offset",
       "offset" // 512 AS first_seq,
       GREATEST("offset", "offset" + n_tokens - 1) // 512 AS last_seq
FROM o
""",
        "cross_decontamination": f"""
-- cross-corpus MinHash decontamination replay: eval = every {XDECON_MOD}th
-- doc minus its first token; shingle→minhash→band as in minhash_lsh_pairs;
-- candidates only across sides; exact Jaccard >= {XDECON_T}
WITH trw AS (
  SELECT 't:' || CAST(doc_id AS VARCHAR) AS uid,
         list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
  FROM documents
),
evw AS (
  SELECT 'e:' || CAST(doc_id AS VARCHAR) AS uid,
         list_slice(toks, 2, len(toks)) AS toks
  FROM (SELECT doc_id,
               list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
        FROM documents WHERE doc_id % {XDECON_MOD} = 0)
),
w AS (SELECT * FROM trw UNION ALL SELECT * FROM evw),
sh AS (
  SELECT uid,
         CASE WHEN len(toks) >= 3
              THEN list_transform(range(1, len(toks) - 1),
                                  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
              ELSE [] END AS shingles
  FROM w
),
t AS (SELECT DISTINCT uid, unnest(shingles) AS term FROM sh),
sizes AS (SELECT uid, count(*) AS sz FROM t GROUP BY uid),
seeds(seed) AS (VALUES (0),(1),(2),(3),(4),(5),(6),(7),(8),(9),(10),(11),(12),(13),(14),(15)),
mh AS (
  SELECT uid, seed, min(md5(seed::VARCHAR || ':' || term)) AS minhash
  FROM t CROSS JOIN seeds GROUP BY uid, seed
),
banded AS (
  SELECT uid, seed // 4 AS band,
         md5(array_to_string(list_sort(list(seed::VARCHAR || ':' || minhash)), '|')) AS bucket
  FROM mh GROUP BY uid, seed // 4
),
cand AS (
  SELECT DISTINCT a.uid AS ua, b.uid AS ub
  FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.uid LIKE 't:%' AND b.uid LIKE 'e:%'
),
inter AS (
  SELECT c.ua, c.ub, count(*) AS i
  FROM cand c
  JOIN t ta ON ta.uid = c.ua
  JOIN t tb ON tb.uid = c.ub AND tb.term = ta.term
  GROUP BY c.ua, c.ub
)
SELECT CAST(substring(ua, 3) AS BIGINT) AS train_id,
       CAST(substring(ub, 3) AS BIGINT) AS eval_id,
       ROUND(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.uid = ua
JOIN sizes sb ON sb.uid = ub
WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= {XDECON_T}
ORDER BY 1, 2
""",
        "nb_quality": f"""
-- NB classifier replay: md5-half split, weak length label, per-class
-- token/doc counts, Laplace log-ratios, OOV constant, term-ordered fold
WITH base AS (
  SELECT doc_id, text, (n_chars >= {NB_LABEL_CHARS}) AS y,
         substring(md5('nb:' || CAST(doc_id AS VARCHAR)), 1, 1)
           IN ({", ".join(f"'{h}'" for h in NB_TRAIN_HEXES)}) AS tr
  FROM documents
),
tokc AS (
  SELECT doc_id, y, tr, term FROM (
    SELECT doc_id, y, tr, unnest(string_split(text, ' ')) AS term FROM base
  ) WHERE term <> ''
),
scal AS (
  SELECT
    (SELECT count(DISTINCT doc_id) FROM tokc WHERE tr AND y)::DOUBLE AS d1,
    (SELECT count(DISTINCT doc_id) FROM tokc WHERE tr AND NOT y)::DOUBLE AS d0,
    (SELECT count(*) FROM tokc WHERE tr AND y)::BIGINT AS t1,
    (SELECT count(*) FROM tokc WHERE tr AND NOT y)::BIGINT AS t0,
    (SELECT count(DISTINCT term) FROM tokc WHERE tr)::BIGINT AS v
),
tc AS (
  SELECT term,
         sum(CASE WHEN y THEN 1 ELSE 0 END) AS c1,
         sum(CASE WHEN NOT y THEN 1 ELSE 0 END) AS c0
  FROM tokc WHERE tr GROUP BY term
),
llr AS (
  SELECT term,
         ln((c1 + 1.0) / CAST(s.t1 + s.v AS DOUBLE))
           - ln((c0 + 1.0) / CAST(s.t0 + s.v AS DOUBLE)) AS llr
  FROM tc CROSS JOIN scal s
),
ev AS (
  SELECT doc_id, term, count(*)::DOUBLE AS tf FROM tokc
  WHERE NOT tr GROUP BY doc_id, term
),
contrib AS (
  SELECT ev.doc_id, ev.term,
         ev.tf * COALESCE(l.llr, (SELECT ln(1.0 / (t1 + v))
                                    - ln(1.0 / (t0 + v)) FROM scal)) AS v
  FROM ev LEFT JOIN llr l USING (term)
)
SELECT doc_id,
       ROUND((SELECT ln(d1 / d0) FROM scal)
             + list_aggregate(list(v ORDER BY term), 'sum'), 5) AS log_odds
FROM contrib GROUP BY doc_id
ORDER BY doc_id
""",
        "temperature_mix": f"""
-- temperature mixing replay: counts → (n_s/N)^α weights → normalizer
-- folded in sorted-stratum order (bit-identical to the Python fold) →
-- capped fractions → md5 hex-prefix thresholds → per-language kept counts
WITH c AS (
  SELECT lang AS s, count(*)::DOUBLE AS c FROM documents
  WHERE lang IS NOT NULL GROUP BY lang
),
n AS (SELECT sum(c) AS n FROM c),
wts AS (SELECT s, c.c, power(c.c / n.n, {TEMP_ALPHA}) AS w
        FROM c CROSS JOIN n),
z AS (SELECT list_aggregate(list(w ORDER BY s), 'sum') AS z FROM wts),
fr AS (SELECT s, least(1.0, trunc({TEMP_BUDGET_SHARE} * n.n) * w / z.z / c)
              AS f
       FROM wts CROSS JOIN n CROSS JOIN z),
thr AS (SELECT s, CASE WHEN f >= 1.0 THEN 'g'
                       ELSE printf('%08x',
                                   CAST(trunc(f * 4294967296.0) AS BIGINT))
                  END AS t
        FROM fr)
SELECT d.lang, count(*)::BIGINT AS kept
FROM documents d JOIN thr ON thr.s = d.lang
WHERE substring(md5('t0:' || COALESCE(CAST(d.doc_id AS VARCHAR), '')),
                1, 8) < thr.t
GROUP BY d.lang
ORDER BY d.lang
""",
        "stratified_sample": """
-- md5-prefix thresholds: fraction f keeps rows whose first 8 md5 hex chars
-- sort below format(int(f * 16^8), '08x'); 0.5→80000000, 0.2→33333333,
-- default 0.1→19999999 (lexicographic = numeric for fixed-length hex)
SELECT doc_id, lang FROM documents
WHERE substring(md5('s0:' || CAST(doc_id AS VARCHAR)), 1, 8) <
      CASE WHEN lang = 'en' THEN '80000000'
           WHEN lang = 'zh' THEN '33333333'
           WHEN lang = 'es' THEN '33333333'
           ELSE '19999999' END
""",
        "dedup_clusters": """
WITH RECURSIVE w AS (
  SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
  FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_transform(range(1, len(toks) - 1),
                                  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
              ELSE [] END AS shingles
  FROM w
), t AS (SELECT DISTINCT doc_id, unnest(shingles) AS term FROM sh),
sizes AS (SELECT doc_id, count(*) AS sz FROM t GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM t a JOIN t b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
),
pairs AS (
  SELECT id_a, id_b FROM inter
  JOIN sizes sa ON sa.doc_id = id_a
  JOIN sizes sb ON sb.doc_id = id_b
  WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5
),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION ALL SELECT id_b, id_a FROM pairs),
-- transitive closure: every node reachable from src (UNION dedups, so the
-- walk terminates); component = min reachable node, matching the engine's
-- min-label propagation exactly
walk(src, node) AS (
  SELECT DISTINCT a, a FROM edges
  UNION
  SELECT wk.src, e.b FROM walk wk JOIN edges e ON wk.node = e.a
),
comp AS (SELECT src AS doc_id, MIN(node) AS cluster FROM walk GROUP BY src)
SELECT doc_id, cluster,
       COUNT(*) OVER (PARTITION BY cluster) AS cluster_size
FROM comp
""",
        "ann_lsh_topk": _ann_lsh_sql(),
        "ann_ivf_topk": _ann_ivf_sql(),
        "ann_filtered_topk": _ann_ivf_sql(filter_pred=(
            f"vec_id % {ANN_FILTER_MOD} = {ANN_FILTER_REM}")),
        "ann_ivf_append": _ann_ivf_sql(train_pred=(
            "substring(md5('ivfsplit:' || CAST(vec_id AS VARCHAR)), 1, 1)"
            " IN (" + ", ".join(f"'{h}'" for h in IVF_SPLIT_HEXES) + ")")),
        "ann_ivfadc_topk": _ann_ivf_sql(quantized=True),
        "semdedup": _semdedup_sql(SEMDEDUP_T),
        "minhash_lsh_pairs": """
WITH w AS (
  SELECT doc_id, list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
  FROM documents
), sh AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3
              THEN list_transform(range(1, len(toks) - 1),
                                  i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
              ELSE [] END AS shingles
  FROM w
), t AS (SELECT DISTINCT doc_id, unnest(shingles) AS term FROM sh),
sizes AS (SELECT doc_id, count(*) AS sz FROM t GROUP BY doc_id),
seeds(seed) AS (VALUES (0),(1),(2),(3),(4),(5),(6),(7),(8),(9),(10),(11),(12),(13),(14),(15)),
mh AS (
  SELECT doc_id, seed, min(md5(seed::VARCHAR || ':' || term)) AS minhash
  FROM t CROSS JOIN seeds GROUP BY doc_id, seed
),
banded AS (
  -- band key = md5 over 'seed:minhash' strings in LEXICOGRAPHIC seed order,
  -- exactly Spark's array_sort(collect_list(concat_ws(':', seed, minhash)))
  SELECT doc_id, seed // 4 AS band,
         md5(array_to_string(list_sort(list(seed::VARCHAR || ':' || minhash)), '|')) AS bucket
  FROM mh GROUP BY doc_id, seed // 4
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.id_a, c.id_b, count(*) AS i
  FROM cand c
  JOIN t ta ON ta.doc_id = c.id_a
  JOIN t tb ON tb.doc_id = c.id_b AND tb.term = ta.term
  GROUP BY c.id_a, c.id_b
)
SELECT id_a, id_b,
       ROUND(CAST(i AS DOUBLE) / (sa.sz + sb.sz - i), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(i AS DOUBLE) / (sa.sz + sb.sz - i) >= 0.5
""",
        "ann_batch_topk": """
WITH qx AS (
  SELECT vec_id AS qid, CAST(unnest(embedding) AS DOUBLE) AS qv,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings WHERE vec_id < 3
),
ex AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings WHERE vec_id >= 3
),
qn AS (SELECT qid, SQRT(SUM(qv * qv)) AS qn FROM qx GROUP BY qid),
dots AS (
  SELECT qx.qid, ex.vec_id, SUM(ex.v * qx.qv) AS dot, SUM(ex.v * ex.v) AS n2
  FROM ex JOIN qx USING (i) GROUP BY qx.qid, ex.vec_id
),
scored AS (
  SELECT d.qid, d.vec_id, d.dot / (SQRT(d.n2) * qn.qn) AS cosine
  FROM dots d JOIN qn USING (qid)
)
SELECT qid, vec_id,
       (row_number() OVER (PARTITION BY qid
                           ORDER BY cosine DESC, vec_id ASC) - 1)::BIGINT AS rnk,
       ROUND(cosine, 6) AS cosine
FROM scored
QUALIFY rnk < 5
""",
        "ann_sq8_topk": """
WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0),
qx AS (SELECT CAST(unnest(e) AS DOUBLE) AS qv, generate_subscripts(e, 1) AS i FROM q),
scales AS (
  -- m and scale kept as SEPARATE values computed in the engine's exact
  -- operation order (codes use v*127/m, dequant uses code*(m/127)) — a
  -- refactored-but-equivalent expression can differ by 1 ulp and flip a
  -- rounding tie, which is visible at 6 cosine decimals
  SELECT vec_id,
         GREATEST(MAX(ABS(CAST(v AS DOUBLE))), 1e-30) AS m
  FROM (SELECT vec_id, unnest(embedding) AS v FROM embeddings WHERE vec_id <> 0)
  GROUP BY vec_id
),
deq AS (
  SELECT e.vec_id,
         ROUND(CAST(e.v AS DOUBLE) * 127.0 / s.m, 0) * (s.m / 127.0) AS dv,
         e.i
  FROM (SELECT vec_id, unnest(embedding) AS v,
               generate_subscripts(embedding, 1) AS i
        FROM embeddings WHERE vec_id <> 0) e
  JOIN scales s USING (vec_id)
),
dots AS (
  SELECT vec_id, SUM(dv * qv) AS dot, SUM(dv * dv) AS n2
  FROM deq JOIN qx USING (i) GROUP BY vec_id
),
qn AS (SELECT SQRT(SUM(qv * qv)) AS qn FROM qx)
SELECT vec_id, ROUND(dot / (SQRT(n2) * qn.qn), 6) AS cosine
FROM dots, qn
ORDER BY dot / (SQRT(n2) * qn.qn) DESC, vec_id ASC
LIMIT 10
""",
        "ann_cosine_topk": """
WITH q AS (SELECT embedding AS e FROM embeddings WHERE vec_id = 0),
qx AS (SELECT CAST(unnest(e) AS DOUBLE) AS qv, generate_subscripts(e, 1) AS i FROM q),
ex AS (
  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings WHERE vec_id <> 0
),
dots AS (
  SELECT vec_id, SUM(v * qv) AS dot, SUM(v * v) AS n2
  FROM ex JOIN qx USING (i) GROUP BY vec_id
),
qn AS (SELECT SQRT(SUM(qv * qv)) AS qn FROM qx)
SELECT vec_id, ROUND(dot / (SQRT(n2) * qn.qn), 6) AS cosine
FROM dots, qn
ORDER BY dot / (SQRT(n2) * qn.qn) DESC, vec_id ASC
LIMIT 10
""",
        "topk_window": """
SELECT l_orderkey::BIGINT AS l_orderkey, l_linenumber::BIGINT AS l_linenumber,
       (row_number() OVER (PARTITION BY l_orderkey
                           ORDER BY l_extendedprice DESC, l_linenumber ASC) - 1)::BIGINT AS rnk
FROM lineitem
QUALIFY rnk <= 1
""",
        "lineitem_agg": """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_price,
       ROUND(AVG(l_discount), 6) AS avg_disc,
       count(*)::BIGINT AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
        "join_orders_by_nation": """
SELECT n.n_name,
       count(*)::BIGINT AS n_orders,
       ROUND(SUM(o.o_totalprice), 2) AS revenue
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
        "rare_terms": f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
  FROM documents
),
bg AS (
  SELECT doc_id, unnest(toks[1:len(toks)-1]) AS a,
         unnest(toks[2:len(toks)]) AS b
  FROM w WHERE len(toks) >= 2
),
dt AS (SELECT DISTINCT doc_id, a || ' ' || b AS term FROM bg)
SELECT term, count(*)::BIGINT AS doc_count
FROM dt GROUP BY term
HAVING count(*) <= {RARE_MAX_DOC_COUNT}
ORDER BY doc_count, term
""",
        "events_weekly": f"""
SELECT strftime(date_trunc('week', ts + INTERVAL {DH_OFFSET_MIN} MINUTE),
                '%Y-%m-%d') AS week,
       count(*)::BIGINT AS doc_count,
       ROUND(SUM(value), 5) AS sum_value
FROM events WHERE ts IS NOT NULL
GROUP BY 1 ORDER BY 1
""",
        "pipeline_weekly": f"""
WITH b AS (
  SELECT strftime(date_trunc('week', ts + INTERVAL {DH_OFFSET_MIN} MINUTE),
                  '%Y-%m-%d') AS week,
         count(*)::BIGINT AS doc_count
  FROM events WHERE ts IS NOT NULL GROUP BY 1
)
SELECT week, doc_count,
       (sum(doc_count) OVER (ORDER BY week
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))::BIGINT AS cum,
       (doc_count - lag(doc_count) OVER (ORDER BY week))::BIGINT AS deriv,
       ROUND(avg(doc_count) OVER (ORDER BY week
          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 6) AS mov3
FROM b ORDER BY week
""",
        "pipeline_weekly2": f"""
WITH b AS (
  SELECT strftime(date_trunc('week', ts + INTERVAL {DH_OFFSET_MIN} MINUTE),
                  '%Y-%m-%d') AS week,
         count(*)::BIGINT AS doc_count
  FROM events WHERE ts IS NOT NULL GROUP BY 1
),
s AS (
  SELECT week, doc_count,
         (doc_count - lag(doc_count, 2) OVER (ORDER BY week))::BIGINT
           AS sdiff,
         doc_count * 100.0 / sum(doc_count) OVER () AS pct
  FROM b
)
SELECT week, doc_count, sdiff, ROUND(pct, 6) AS pct
FROM s WHERE doc_count >= 5
ORDER BY doc_count DESC, week ASC
LIMIT 8
""",
        "bucket_stats_by_source": """
WITH b AS (
  SELECT source, count(*)::BIGINT AS doc_count FROM documents GROUP BY source
)
SELECT count(doc_count)::BIGINT AS count,
       min(doc_count)::BIGINT AS min,
       max(doc_count)::BIGINT AS max,
       ROUND(avg(doc_count), 6) AS avg,
       sum(doc_count)::BIGINT AS sum
FROM b
""",
        "events_hourly": """
SELECT user_id::BIGINT AS user_id,
       strftime(ts, '%Y-%m-%d %H') AS hour,
       count(*)::BIGINT AS n,
       ROUND(SUM(value), 5) AS sum_value
FROM events GROUP BY user_id, strftime(ts, '%Y-%m-%d %H')
""",
        "session_stats": f"""
WITH x AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch_us(ts) - epoch_us(lag(ts) OVER w)
                      > {SESSION_GAP_US} THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM x
),
g AS (
  SELECT user_id::BIGINT AS user_id,
         strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS start_ts,
         strftime(max(ts) + to_microseconds({SESSION_GAP_US}::BIGINT),
                  '%Y-%m-%d %H:%M:%S.%f') AS end_ts,
         count(*)::BIGINT AS n,
         ROUND(sum(value), 5) AS sum_value
  FROM s GROUP BY user_id, sid
)
SELECT * FROM g ORDER BY n DESC, user_id, start_ts LIMIT 20
""",
    }
