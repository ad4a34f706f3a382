"""span_near(in_order=false) — unordered proximity over the positions
sidecar (Lucene SpanNearQuery; the anchored-counting departure from
Lucene's minimal-interval counting is documented at
queryparse.Clause.near). The ordered complement is the sloppy-phrase
syntax '"a b"~N' (test_phrase.py).
"""

import math

import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.queryparse import ParseError, span_near_plan
from patapsco_spark.operators.retrieve import search

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)

DOCS = [
    ("d1", "red fox jumps high today", "eng"),    # red fox adjacent
    ("d2", "fox red jumps high today", "eng"),    # REVERSED adjacent
    ("d3", "red fox red fox jumps", "eng"),       # two anchors
    ("d4", "tail red wind fox jumps", "eng"),     # 1 intervening token
    ("d5", "nothing relevant here at all", "eng"),
]


@pytest.fixture(scope="module")
def near_index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("idxnear"))
    df = spark.createDataFrame(DOCS, "id string, text string, lang string")
    build_index(spark, df, path,
                IndexConfig(text=RAW, num_shards=2, positions=True))
    return path


def _run(spark, idx, plan, **cfg):
    res = search(spark, idx, [plan], RetrieveConfig(k=10, **cfg))
    return {r["doc_id"]: r["score"] for r in res.collect()}


def _idf(n, df):
    return math.log(1 + (n - df + 0.5) / (df + 0.5))


def test_unordered_catches_both_orders(spark, near_index):
    rows = _run(spark, near_index, span_near_plan("q", [("red", "fox", 0)]))
    # d2 is fox-before-red: the ordered sloppy phrase misses it, NEAR
    # must not; d4's pair has one intervening token (> slop 0)
    assert set(rows) == {"d1", "d2", "d3"}


def test_scores_hand_computed(spark, near_index):
    rows = _run(spark, near_index, span_near_plan("q", [("red", "fox", 0)]))
    idf = _idf(5, 4) + _idf(5, 4)  # red df=4, fox df=4, N=5
    def bm25(tf):  # every doc has dl=5=avgdl → K = 0.9
        return idf * tf / (tf + 0.9)
    assert rows["d1"] == pytest.approx(bm25(1), rel=1e-9)
    assert rows["d2"] == pytest.approx(bm25(1), rel=1e-9)
    assert rows["d3"] == pytest.approx(bm25(2), rel=1e-9)  # two anchors


def test_slop_widens_the_window(spark, near_index):
    rows = _run(spark, near_index, span_near_plan("q", [("red", "fox", 1)]))
    assert set(rows) == {"d1", "d2", "d3", "d4"}


def test_no_cooccurrence_matches_nothing(spark, near_index):
    rows = _run(spark, near_index,
                span_near_plan("q", [("red", "nothing", 2)]))
    assert rows == {}


def test_positions_required(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("idxnearflat"))
    frame = spark.createDataFrame(DOCS, "id string, text string, lang string")
    build_index(spark, frame, path, IndexConfig(text=RAW, num_shards=2))
    with pytest.raises(ValueError, match="positions sidecar"):
        _run(spark, path, span_near_plan("q", [("red", "fox", 0)]))


def test_builder_validation(spark, near_index):
    with pytest.raises(ParseError, match="slop must be >= 0"):
        span_near_plan("q", [("red", "fox", -1)])
    with pytest.raises(ParseError, match="single terms"):
        span_near_plan("q", [("red fox", "x", 1)])
    with pytest.raises(ValueError, match="distinct terms"):
        _run(spark, near_index, span_near_plan("q", [("red", "red", 1)]))


class TestSpanNot:
    def test_exclusion_window(self, spark, near_index):
        from patapsco_spark.operators.queryparse import span_not_plan
        # red NOT adjacent to fox: d1/d2/d3's reds all have an adjacent
        # fox; only d4's red (1 intervening token) survives slop=0
        rows = _run(spark, near_index,
                    span_not_plan("q", [("red", "fox", 0)]))
        assert set(rows) == {"d4"}
        idf = _idf(5, 4)  # include-term idf ONLY (SpanNotQuery weight)
        assert rows["d4"] == pytest.approx(idf * 1 / (1 + 0.9), rel=1e-9)

    def test_doc_without_exclude_keeps_all_occurrences(self, spark,
                                                       near_index):
        from patapsco_spark.operators.queryparse import span_not_plan
        # 'jumps' NOT within 1 of 'today': d1/d2 have today 2 tokens away
        # (1 intervening ≤ slop → excluded); d3/d4 have NO 'today' at all
        # and must keep their occurrence
        rows = _run(spark, near_index,
                    span_not_plan("q", [("jumps", "today", 1)]))
        assert set(rows) == {"d3", "d4"}
        # and with slop=0 the window shrinks: d1/d2 re-qualify
        rows0 = _run(spark, near_index,
                     span_not_plan("q", [("jumps", "today", 0)]))
        assert set(rows0) == {"d1", "d2", "d3", "d4"}
