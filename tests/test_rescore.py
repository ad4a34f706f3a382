"""Query rescorer (operators/retrieve.py:rescore): weighted total combine
against hand math, window cut by PRIMARY order (a secondary favorite
below the window never surfaces), missing-secondary keeps weighted
primary, and validation."""

import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.retrieve import (process_queries, rescore,
                                               search_texts)

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)

DOCS = [
    ("d1", "apple apple apple pad"),      # top primary
    ("d2", "apple apple bonus pad"),      # mid primary, secondary hit
    ("d3", "apple pad pad pad"),          # low primary
    ("d4", "bonus bonus bonus bonus"),    # secondary-only: no primary match
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("rescore") / "idx")
    df = spark.createDataFrame([(d, t, "eng") for d, t in DOCS],
                               "id string, text string, lang string")
    build_index(spark, df, p, IndexConfig(text=RAW, num_shards=2))
    return p


def _plans(q):
    return process_queries([("q1", q)], RAW)


def _scores(spark, idx, q, k=10):
    res = search_texts(spark, idx, [("q1", q)], RetrieveConfig(k=k),
                       text_cfg=RAW)
    return {r["doc_id"]: r["score"] for r in res.collect()}


def test_total_combine_matches_hand_math(spark, idx):
    pri = _scores(spark, idx, "apple")
    sec = _scores(spark, idx, "bonus")
    out = rescore(spark, idx, _plans("apple"), _plans("bonus"),
                  RetrieveConfig(k=10), window=10,
                  query_weight=1.0, rescore_weight=3.0)
    rows = {r["doc_id"]: r["score"] for r in out.collect()}
    # only primary matches can appear; d4 (secondary-only) never surfaces
    assert set(rows) == set(pri)
    for d in rows:
        want = 1.0 * pri[d] + 3.0 * sec.get(d, 0.0)
        assert rows[d] == pytest.approx(want, abs=1e-12), d
    # the secondary must actually reorder: d2 overtakes d1
    ranked = [r["doc_id"] for r in out.orderBy("rank").collect()]
    assert ranked[0] == "d2"


def test_window_bounds_cascade(spark, idx):
    # window=2 keeps d1, d2 by primary; d3's secondary can't rescue it
    out = rescore(spark, idx, _plans("apple"), _plans("bonus"),
                  RetrieveConfig(k=2), window=2, rescore_weight=100.0)
    assert {r["doc_id"] for r in out.collect()} == {"d1", "d2"}


def test_window_validation(spark, idx):
    with pytest.raises(ValueError, match="window"):
        rescore(spark, idx, _plans("apple"), _plans("bonus"),
                RetrieveConfig(k=10), window=5)
