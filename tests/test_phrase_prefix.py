"""match_phrase_prefix — phrase with a prefix-expanded last position
(ES match_phrase_prefix / Lucene MultiPhrasePrefixQuery; the reference's
Lucene index stores no positions, so this strictly exceeds it).

Semantics pinned here: tf counts anchors where the fixed words run in
sequence and ANY dictionary term starting with the prefix sits at the
next position; BM25 idf = Σ fixed idfs + ONE SynonymQuery-style idf for
the expansion set (df = max member df — the departure from Lucene's
Σ-over-every-expansion is documented at queryparse.Clause.pprefix).
"""

import math

import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.queryparse import ParseError, phrase_prefix_plan
from patapsco_spark.operators.retrieve import search

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)

DOCS = [
    ("d1", "data stream processing is hard", "eng"),    # data str... once
    ("d2", "data strategy beats data stream", "eng"),   # twice
    ("d3", "stream data is reversed here", "eng"),      # wrong order
    ("d4", "data structure and data model", "eng"),     # structure matches
    ("d5", "no match in this one at all", "eng"),
]


@pytest.fixture(scope="module")
def pp_index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("idxpp"))
    df = spark.createDataFrame(DOCS, "id string, text string, lang string")
    build_index(spark, df, path,
                IndexConfig(text=RAW, num_shards=2, positions=True))
    return path


def _run(spark, idx, plan, **cfg):
    res = search(spark, idx, [plan], RetrieveConfig(k=10, **cfg))
    return {r["doc_id"]: r["score"] for r in res.collect()}


def _idf(n, df):
    return math.log(1 + (n - df + 0.5) / (df + 0.5))


def _bm25(tf, dl, avgdl, idf, k1=0.9, b=0.4):
    return idf * tf / (tf + k1 * (1 - b + b * dl / avgdl))


def test_matches_in_order_completions_only(spark, pp_index):
    plan = phrase_prefix_plan("q", ["data"], "str")
    rows = _run(spark, pp_index, plan)
    # d3 has both words but "data" is not followed by a str-term
    assert set(rows) == {"d1", "d2", "d4"}


AVGDL = 27 / 5  # d5 has 7 tokens, the rest 5


def test_tf_and_idf_hand_computed(spark, pp_index):
    plan = phrase_prefix_plan("q", ["data"], "str")
    rows = _run(spark, pp_index, plan)
    # dictionary str-terms: strategy(df=1), stream(df=3), structure(df=1)
    # → synonym-set df = max = 3; fixed 'data' df = 4; N=5
    idf = _idf(5, 4) + _idf(5, 3)
    assert rows["d2"] == pytest.approx(_bm25(2, 5, AVGDL, idf), rel=1e-6)
    assert rows["d1"] == pytest.approx(_bm25(1, 5, AVGDL, idf), rel=1e-6)
    assert rows["d4"] == pytest.approx(_bm25(1, 5, AVGDL, idf), rel=1e-6)


def test_two_fixed_words(spark, pp_index):
    # "beats data str..." — only d2 has the three-slot chain
    plan = phrase_prefix_plan("q", ["beats", "data"], "str")
    rows = _run(spark, pp_index, plan)
    assert set(rows) == {"d2"}


def test_max_expansions_truncates_in_term_order(spark, pp_index):
    # cap behavior is exercised through search by shrinking the module
    # constant (the rewrite reads it at call time)
    import patapsco_spark.operators.retrieve as R
    old = R.MAX_PHRASE_PREFIX_EXPANSIONS
    try:
        # cap=1 admits only the FIRST str-term in term order: 'strategy'
        # (strategy < stream < structure) → only d2's "data strategy"
        R.MAX_PHRASE_PREFIX_EXPANSIONS = 1
        plan = phrase_prefix_plan("q", ["data"], "str")
        rows = _run(spark, pp_index, plan)
        assert set(rows) == {"d2"}
        idf = _idf(5, 4) + _idf(5, 1)  # set df = df(strategy) = 1
        assert rows["d2"] == pytest.approx(
            _bm25(1, 5, AVGDL, idf), rel=1e-6)
    finally:
        R.MAX_PHRASE_PREFIX_EXPANSIONS = old


def test_no_completion_matches_nothing(spark, pp_index):
    plan = phrase_prefix_plan("q", ["data"], "zzz")
    assert _run(spark, pp_index, plan) == {}


def test_positions_required(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("idxppflat"))
    frame = spark.createDataFrame(DOCS, "id string, text string, lang string")
    build_index(spark, frame, path, IndexConfig(text=RAW, num_shards=2))
    with pytest.raises(ValueError, match="positions sidecar"):
        _run(spark, path, phrase_prefix_plan("q", ["data"], "str"))


def test_builder_validation(spark):
    with pytest.raises(ParseError, match="at least one fixed word"):
        phrase_prefix_plan("q", [], "str")
    with pytest.raises(ParseError, match="literal"):
        phrase_prefix_plan("q", ["data"], "st*")
    with pytest.raises(ParseError, match="single terms"):
        phrase_prefix_plan("q", ["data x"], "str")
