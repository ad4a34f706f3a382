"""Reciprocal Rank Fusion (rerank.rrf_fuse): brute-force golden, rank-only
invariance (scores must not matter), and the tie-break rule."""

import math

from pyspark.sql import functions as F

from patapsco_spark.operators.rerank import rrf_fuse

RUN_A = [("q1", "d1", 0), ("q1", "d2", 1), ("q1", "d3", 2),
         ("q2", "d9", 0)]
RUN_B = [("q1", "d3", 0), ("q1", "d1", 1), ("q1", "d4", 2)]
SCHEMA = "query_id string, doc_id string, rank int"


def _brute(runs, c=60):
    acc = {}
    for run in runs:
        for q, d, r in run:
            acc[(q, d)] = acc.get((q, d), 0.0) + 1.0 / (c + r + 1.0)
    return acc


def test_rrf_golden(spark):
    a = spark.createDataFrame(RUN_A, SCHEMA)
    b = spark.createDataFrame(RUN_B, SCHEMA)
    got = {(r["query_id"], r["doc_id"]): (r["rank"], r["score"])
           for r in rrf_fuse([a, b], k=10).collect()}
    want = _brute([RUN_A, RUN_B])
    assert got.keys() == want.keys()
    for key, (_, s) in got.items():
        assert math.isclose(s, want[key], rel_tol=1e-15)
    # d1: 1/61 + 1/62 beats d3: 1/63 + 1/61
    order = [d for (q, d), (r, _) in sorted(got.items(), key=lambda kv: kv[1][0])
             if q == "q1"]
    assert order[0] == "d1" and order[1] == "d3"


def test_rrf_ignores_scores(spark):
    """Fusion is rank-only: attaching wild scores must not change output."""
    a = spark.createDataFrame(RUN_A, SCHEMA)
    b = spark.createDataFrame(RUN_B, SCHEMA)
    a2 = a.withColumn("score", F.col("rank") * -1000.0)
    base = rrf_fuse([a, b], k=10).collect()
    noisy = rrf_fuse([a2, b], k=10).collect()
    assert [tuple(r) for r in base] == [tuple(r) for r in noisy]


def test_rrf_tiebreak_and_k(spark):
    """Docs appearing in one run only, at the same rank, tie exactly →
    doc_id asc breaks; k cuts after the tie-break."""
    a = spark.createDataFrame([("q1", "zz", 0)], SCHEMA)
    b = spark.createDataFrame([("q1", "aa", 0)], SCHEMA)
    rows = rrf_fuse([a, b], k=1).collect()
    assert [(r["doc_id"], r["rank"]) for r in rows] == [("aa", 0)]


SCORED = "query_id string, doc_id string, rank int, score double"
LIN_A = [("q1", "d1", 0, 10.0), ("q1", "d2", 1, 5.0), ("q1", "d3", 2, 0.0)]
LIN_B = [("q1", "d3", 0, 2.0), ("q1", "d1", 1, 1.0)]


def test_linear_fuse_golden(spark):
    from patapsco_spark.operators.rerank import linear_fuse
    a = spark.createDataFrame(LIN_A, SCORED)
    b = spark.createDataFrame(LIN_B, SCORED)
    got = {r["doc_id"]: r["score"]
           for r in linear_fuse([a, b], weights=[0.7, 0.3], k=10).collect()}
    # run A norms: d1=1.0, d2=0.5, d3=0.0; run B: d3=1.0, d1=0.0
    assert math.isclose(got["d1"], 0.7 * 1.0 + 0.3 * 0.0, rel_tol=1e-15)
    assert math.isclose(got["d2"], 0.7 * 0.5, rel_tol=1e-15)
    assert math.isclose(got["d3"], 0.3 * 1.0, rel_tol=1e-15)


def test_linear_fuse_degenerate_run_normalizes_to_one(spark):
    from patapsco_spark.operators.rerank import linear_fuse
    a = spark.createDataFrame(
        [("q1", "d1", 0, 3.0), ("q1", "d2", 1, 3.0)], SCORED)
    got = {r["doc_id"]: r["score"]
           for r in linear_fuse([a], weights=[1.0], k=10).collect()}
    assert got == {"d1": 1.0, "d2": 1.0}


def test_linear_fuse_keeps_magnitude_where_rrf_flattens(spark):
    """The discriminating property: a dominant top hit stays dominant
    under linear fusion, while RRF sees only adjacent ranks."""
    from patapsco_spark.operators.rerank import linear_fuse
    a = spark.createDataFrame(
        [("q1", "d1", 0, 100.0), ("q1", "d2", 1, 1.0), ("q1", "d3", 2, 0.0)],
        SCORED)
    got = {r["doc_id"]: r["score"]
           for r in linear_fuse([a], weights=[1.0], k=10).collect()}
    assert got["d1"] - got["d2"] > 0.9  # 1.0 vs 0.01
    rr = {r["doc_id"]: r["score"] for r in rrf_fuse([a], k=10).collect()}
    assert rr["d1"] - rr["d2"] < 0.001  # 1/61 vs 1/62


def test_linear_fuse_validation(spark):
    from patapsco_spark.operators.rerank import linear_fuse
    import pytest
    a = spark.createDataFrame(LIN_A, SCORED)
    with pytest.raises(ValueError, match="at least one run"):
        linear_fuse([])
    with pytest.raises(ValueError, match="one weight per run"):
        linear_fuse([a], weights=[0.5, 0.5])
