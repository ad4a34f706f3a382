"""Lucene BooleanQuery.setMinimumNumberShouldMatch semantics
(RetrieveConfig.min_should_match): a doc qualifies only if at least mm of
the TOP-level SHOULD clauses individually match it; MUST clauses still all
have to match and MUST_NOT clauses never count toward mm. Scores are
unchanged — mm only filters matching, never per-term contributions — so the
qualifying docs must score exactly as in the plain (mm=0) run: an
independently computable identity we pin here, same shape as the nested-
boolean score-identity test.

Reference surface: patapsco drives Lucene's classic QueryParser
(/root/reference/patapsco/retrieve.py:79-82); minimumNumberShouldMatch is
the standard Lucene BooleanQuery knob applied after parsing.
"""

import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.queryparse import parse_query
from patapsco_spark.operators.retrieve import search_texts

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)

DOCS = [
    ("m1", "alpha zeta zeta zeta zeta", "eng"),        # a         (1 should)
    ("m2", "alpha beta zeta zeta zeta", "eng"),        # a, b      (2)
    ("m3", "alpha beta gamma zeta zeta", "eng"),       # a, b, c   (3)
    ("m4", "beta gamma zeta zeta zeta", "eng"),        # b, c      (2)
    ("m5", "gamma zeta zeta zeta zeta", "eng"),        # c         (1)
    ("m6", "delta alpha beta zeta zeta", "eng"),       # a, b + delta
    ("m7", "delta zeta zeta zeta zeta", "eng"),        # delta only
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("msm") / "idx")
    df = spark.createDataFrame(DOCS, "id string, text string, lang string")
    build_index(spark, df, path, IndexConfig(text=RAW, num_shards=2))
    return path


def _hits(spark, idx, q, mm=0, k=10):
    res = search_texts(spark, idx, [("q", q)],
                       RetrieveConfig(k=k, min_should_match=mm),
                       text_cfg=RAW, mode="boolean")
    return {r["doc_id"]: r["score"] for r in res.collect()}


QUERY = "alpha beta gamma"  # three top-level SHOULD clauses


def test_mm2_filters_single_term_matches(spark, idx):
    base = _hits(spark, idx, QUERY)           # plain OR: m1..m6
    got = _hits(spark, idx, QUERY, mm=2)
    assert set(got) == {"m2", "m3", "m4", "m6"}
    # mm filters matching only — scores identical to the plain run
    for d, s in got.items():
        assert s == pytest.approx(base[d], rel=1e-12)


def test_mm3_requires_all(spark, idx):
    got = _hits(spark, idx, QUERY, mm=3)
    assert set(got) == {"m3"}


def test_mm_leq_1_is_plain_or(spark, idx):
    base = _hits(spark, idx, QUERY)
    assert _hits(spark, idx, QUERY, mm=1) == base
    assert _hits(spark, idx, QUERY, mm=0) == base


def test_mm_above_clause_count_matches_nothing(spark, idx):
    # Lucene: minShouldMatch greater than the number of optional clauses
    # means the query can never be satisfied
    assert _hits(spark, idx, QUERY, mm=4) == {}


def test_must_unaffected_and_not_counts_zero(spark, idx):
    # +delta alpha beta with mm=2: doc must contain delta AND >=2 of the
    # SHOULD clauses -> only m6 (delta, alpha, beta); m7 has delta but no
    # should matches
    got = _hits(spark, idx, "+delta alpha beta", mm=2)
    assert set(got) == {"m6"}
    # MUST_NOT never counts toward mm: alpha beta -gamma, mm=2 -> docs with
    # both alpha and beta and no gamma (m2, m6); m3 has all three but gamma
    # is forbidden
    got = _hits(spark, idx, "alpha beta -gamma", mm=2)
    assert set(got) == {"m2", "m6"}


def test_mm_with_nested_group_counts_group_as_one(spark, idx):
    # (alpha OR beta) gamma with mm=2: the group is ONE should clause -> a
    # doc needs the group (any member) AND gamma. m3 (a,b,c) and m4 (b,c)
    # qualify; m2 (a,b) has only the group.
    got = _hits(spark, idx, "(alpha beta) gamma", mm=2)
    assert set(got) == {"m3", "m4"}


def test_mm_disables_pruner_but_not_correctness_on_plain_or(spark, idx):
    # sanity: the mm>1 path (dense eval, pruner off) agrees with the
    # pruner path on the docs it keeps, via the score-identity above; here
    # pin that parse_query plans are shared (no mm-specific parse)
    plan = parse_query("q", QUERY, mode="boolean")
    assert all(not c.group for c in plan.clauses)
