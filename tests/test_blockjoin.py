"""Parent-child block join (operators/blockjoin.py): passage explosion
boundaries, ToParentBlockJoin ScoreMode rollups, best-child tie-break."""

import math

import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.functions.smallfloat import quantize_length
from patapsco_spark.operators.blockjoin import (block_join_topk,
                                                passage_children)
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.retrieve import process_queries

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)


def _children(spark, docs, **kw):
    df = spark.createDataFrame([(i, t, "eng") for i, t in docs],
                               "id string, text string, lang string")
    out = passage_children(df, **kw).collect()
    return {r["id"]: r["text"] for r in out}


def test_passage_boundaries(spark):
    """Windows start at every stride multiple strictly below dl; the last
    window may be short; w=4 s=2 over 7 tokens → starts 0,2,4,6."""
    got = _children(spark, [("d", "a b c d e f g")], window=4, stride=2)
    assert got == {"d#p0": "a b c d", "d#p1": "c d e f",
                   "d#p2": "e f g", "d#p3": "g"}


def test_passage_short_and_empty_docs(spark):
    """A doc shorter than one window yields one passage; an empty doc
    yields one empty passage (the parent stays represented)."""
    got = _children(spark, [("s", "a b"), ("e", "")], window=4, stride=2)
    assert got == {"s#p0": "a b", "e#p0": ""}


def test_passage_bad_args(spark):
    df = spark.createDataFrame([("d", "a", "eng")],
                               "id string, text string, lang string")
    with pytest.raises(ValueError):
        passage_children(df, window=0)
    with pytest.raises(ValueError):
        passage_children(df, stride=0)


DOCS = [
    ("p1", "hit x x x x x hit hit x x x x"),  # passages: [hit..], [hit hit..]
    ("p2", "x x x x x x hit x x x x x"),
    ("p3", "x x x x x x x x x x x x"),
]
K1, B = 0.9, 0.4


@pytest.fixture(scope="module")
def cidx(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("bj") / "idx")
    df = spark.createDataFrame([(i, t, "eng") for i, t in DOCS],
                               "id string, text string, lang string")
    children = passage_children(df, window=6, stride=6)
    build_index(spark, children, p, IndexConfig(text=RAW, num_shards=2))
    return p


def _bm25(tf, df, dl, n, avgdl):
    import numpy as np
    dlq = float(quantize_length(np.array([dl], dtype="int64"))[0])
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    return idf * tf / (tf + K1 * (1 - B + B * dlq / avgdl))


def _child_scores():
    """Child corpus: 6 passages of 6 tokens (w=s=6, 12-token docs).
    'hit' appears in p1#p0 (tf 1), p1#p1 (tf 2), p2#p1 (tf 1)."""
    n, avgdl, df = 6, 6.0, 3
    return {"p1#p0": _bm25(1, df, 6, n, avgdl),
            "p1#p1": _bm25(2, df, 6, n, avgdl),
            "p2#p1": _bm25(1, df, 6, n, avgdl)}


def _run(spark, cidx, score_mode):
    plans = process_queries([("q1", "hit")], RAW, lang="eng")
    res = block_join_topk(spark, cidx, plans, RetrieveConfig(k=10, k1=K1, b=B),
                          score_mode=score_mode)
    return {r["doc_id"]: (r["best_child"], r["n_children"], r["score"],
                          r["rank"]) for r in res.collect()}


def test_scoremode_max_golden(spark, cidx):
    got = _run(spark, cidx, "max")
    cs = _child_scores()
    assert set(got) == {"p1", "p2"}
    bc1, n1, s1, _ = got["p1"]
    assert (bc1, n1) == ("p1#p1", 2)
    assert math.isclose(s1, cs["p1#p1"], rel_tol=1e-12)
    bc2, n2, s2, _ = got["p2"]
    assert (bc2, n2) == ("p2#p1", 1)
    assert math.isclose(s2, cs["p2#p1"], rel_tol=1e-12)


def test_scoremode_total_avg_min(spark, cidx):
    cs = _child_scores()
    want = {"total": cs["p1#p0"] + cs["p1#p1"],
            "avg": (cs["p1#p0"] + cs["p1#p1"]) / 2,
            "min": min(cs["p1#p0"], cs["p1#p1"])}
    for mode, w in want.items():
        got = _run(spark, cidx, mode)
        assert math.isclose(got["p1"][2], w, rel_tol=1e-9), mode


def test_best_child_tiebreak_lowest_docid(spark, cidx):
    """p1#p0 and p2#p1 have IDENTICAL scores (same tf/dl); within p1,
    min-mode's best_child is still max_by score — on the exact tie
    between p1#p0's score and itself there is nothing to break, so pin
    the cross-parent invariant instead: equal-scored parents order by
    parent id asc."""
    got = _run(spark, cidx, "min")
    # p1 min-score == p2's only child score → tie; p1 < p2 lexically
    assert got["p1"][3] == 0 and got["p2"][3] == 1
    assert math.isclose(got["p1"][2], got["p2"][2], rel_tol=1e-12)


def test_bad_score_mode(spark, cidx):
    with pytest.raises(ValueError):
        _run(spark, cidx, "geometric")
