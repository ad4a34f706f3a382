"""Field collapsing (operators/rerank.collapse_results) — Lucene grouping
module / Elasticsearch ``collapse`` semantics: keep the best ``per_key``
hits per (query, key), re-rank the survivors 0-based, optional cut to k.
Collapsing changes which docs appear, never their scores.
"""

import pytest
from pyspark.sql import functions as F

from patapsco_spark.operators.rerank import collapse_results

RES = [
    # query_id, doc_id, rank, score
    ("q1", "d1", 0, 9.0),   # site A
    ("q1", "d2", 1, 8.0),   # site A
    ("q1", "d3", 2, 7.0),   # site B
    ("q1", "d4", 3, 6.0),   # site B
    ("q1", "d5", 4, 5.0),   # site C
    ("q2", "d2", 0, 4.0),   # site A
    ("q2", "d3", 1, 3.0),   # site B
]
KEYS = [("d1", "A"), ("d2", "A"), ("d3", "B"), ("d4", "B"), ("d5", "C")]


@pytest.fixture(scope="module")
def frames(spark):
    res = spark.createDataFrame(
        RES, "query_id string, doc_id string, rank int, score double")
    keys = spark.createDataFrame(KEYS, "doc_id string, site string")
    return res, keys


def _rows(df):
    return [(r["query_id"], r["doc_id"], r["rank"], r["score"])
            for r in df.collect()]


def test_best_per_key_survives(spark, frames):
    res, keys = frames
    got = _rows(collapse_results(res, keys, "site"))
    assert got == [
        ("q1", "d1", 0, 9.0),   # best of A
        ("q1", "d3", 1, 7.0),   # best of B
        ("q1", "d5", 2, 5.0),   # only C
        ("q2", "d2", 0, 4.0),
        ("q2", "d3", 1, 3.0),
    ]


def test_per_key_2_and_k_cut(spark, frames):
    res, keys = frames
    got = _rows(collapse_results(res, keys, "site", per_key=2, k=3))
    # per_key=2 keeps everything here (no site has >2 hits per query);
    # k=3 cuts q1 to its top 3 re-ranked rows
    assert got == [
        ("q1", "d1", 0, 9.0),
        ("q1", "d2", 1, 8.0),
        ("q1", "d3", 2, 7.0),
        ("q2", "d2", 0, 4.0),
        ("q2", "d3", 1, 3.0),
    ]


def test_scores_unchanged_and_tie_break(spark, frames):
    res, keys = frames
    # equal scores inside one key: doc_id asc wins (deterministic,
    # matching the engine's string tie-break)
    tied = spark.createDataFrame(
        [("q1", "d9", 0, 2.0), ("q1", "d8", 1, 2.0)],
        "query_id string, doc_id string, rank int, score double")
    k2 = spark.createDataFrame([("d8", "A"), ("d9", "A")],
                               "doc_id string, site string")
    got = _rows(collapse_results(tied, k2, "site"))
    assert got == [("q1", "d8", 0, 2.0)]


def test_plan_broadcasts_hits_side(spark, frames):
    res, keys = frames
    plan = collapse_results(res, keys, "site")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
