"""Block-max pruner A/B identity: ``pruning='always'`` must return exactly
the dense scorer's (query_id, doc_id, rank, score) output.

The pruned path's docstring guarantee (retrieve._BlockMaxPruner: "Scores are
exactly the dense scorer's") was previously unpinned — the default
``pruning='auto'`` threshold (20M matched postings) is far above any test
corpus, so no test ever executed the pruner. This pins the invariant across
k values, weighted/duplicate-term (RM3-style) plans, and multi-shard layouts
so future edits can't silently break retrieval at production scale only.
"""

import hashlib

import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.queryparse import Clause, QueryPlan, SHOULD
from patapsco_spark.operators.retrieve import search, search_texts

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)

VOCAB = ("data query stream window table scan filter join sort hash merge "
         "batch spark index term page crawl web text token").split()


def _mk_docs(n=400, words=40):
    """Deterministic pseudo-random corpus (md5-driven, Zipf-ish head terms)."""
    docs = []
    for i in range(n):
        toks = []
        for k in range(words):
            b = hashlib.md5(f"{i}:{k}".encode()).digest()
            # skewed pick: low bytes hit the vocab head more often
            toks.append(VOCAB[(b[0] * b[1]) % len(VOCAB) if b[2] % 3 else b[0] % 4])
        docs.append((f"d{i:04d}", " ".join(toks), "eng"))
    return docs


@pytest.fixture(scope="module")
def ab_index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("idx_ab"))
    df = spark.createDataFrame(_mk_docs(), "id string, text string, lang string")
    build_index(spark, df, path, IndexConfig(text=RAW, num_shards=3))
    return path


def _rows(df):
    return [(r["query_id"], r["doc_id"], r["rank"], round(r["score"], 9))
            for r in df.collect()]


@pytest.mark.parametrize("k", [5, 25, 1000])
def test_pruned_equals_dense_plain(spark, ab_index, k):
    queries = [("q1", "data stream window"), ("q2", "crawl web"),
               ("q3", "table"), ("q4", "absentterm data")]
    got = {}
    for mode in ("always", "never"):
        res = search_texts(spark, ab_index, queries,
                           RetrieveConfig(k=k, pruning=mode), text_cfg=RAW)
        got[mode] = _rows(res)
    assert got["always"] == got["never"]
    assert len(got["always"]) > 0


@pytest.mark.parametrize("k", [5, 1000])
def test_pruned_equals_dense_weighted_duplicate_terms(spark, ab_index, k):
    """RM3-style plan: weighted SHOULD clauses incl. a duplicated term
    (weights must add, and the pruner's bound must account for the boosts)."""
    plan = QueryPlan("rm3", [
        Clause(SHOULD, 0.5, [("data", 1.0)]),
        Clause(SHOULD, 0.3, [("stream", 1.0)]),
        Clause(SHOULD, 0.2, [("data", 1.0)]),     # duplicate term
        Clause(SHOULD, 0.15, [("window", 1.0)]),
        Clause(SHOULD, 0.05, [("scan", 1.0)]),
    ], "plain")
    got = {}
    for mode in ("always", "never"):
        res = search(spark, ab_index, [plan], RetrieveConfig(k=k, pruning=mode))
        got[mode] = _rows(res)
    assert got["always"] == got["never"]
    assert len(got["always"]) > 0


def test_auto_threshold_routes_to_pruner(spark, ab_index):
    """pruning='auto' with a tiny min-postings threshold must take the pruned
    path and still match the dense output (guards the routing logic)."""
    queries = [("q1", "data stream window table")]
    res_auto = search_texts(spark, ab_index, queries,
                            RetrieveConfig(k=10, pruning="auto",
                                           pruning_min_postings=1),
                            text_cfg=RAW)
    res_dense = search_texts(spark, ab_index, queries,
                             RetrieveConfig(k=10, pruning="never"), text_cfg=RAW)
    assert _rows(res_auto) == _rows(res_dense)
