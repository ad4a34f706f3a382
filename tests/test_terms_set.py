"""terms_set query (operators/termsset.py): per-document
minimum-should-match from a stored field — admission vs a brute
reference, score identity with the plain OR query, the ≥1 clamp, and
the missing/NULL-threshold contract."""

import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.retrieve import search_texts
from patapsco_spark.operators.termsset import terms_set_topk

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)

# (id, text, required_matches)
DOCS = [
    ("t1", "alpha beta gamma pad pad", 3),   # 3 hits ≥ 3 → match
    ("t2", "alpha beta pad pad pad", 3),     # 2 hits < 3 → no
    ("t3", "alpha beta pad pad pad", 2),     # match
    ("t4", "alpha pad pad pad pad", 0),      # clamps to 1 → match
    ("t5", "gamma pad pad pad pad", None),   # NULL threshold → never
    ("t7", "pad pad pad pad pad", 1),        # 0 hits → no
]
TERMS = ["alpha", "beta", "gamma"]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tset") / "idx")
    df = spark.createDataFrame([(d[0], d[1], "eng") for d in DOCS],
                               "id string, text string, lang string")
    build_index(spark, df, path, IndexConfig(text=RAW, num_shards=2))
    return path


@pytest.fixture(scope="module")
def values(spark):
    return spark.createDataFrame([(d[0], d[2]) for d in DOCS],
                                 "doc_id string, required_matches long")


def test_admission(spark, idx, values):
    res = terms_set_topk(spark, idx, TERMS, values, "required_matches",
                         text_cfg=RAW, k=10).collect()
    assert {r["doc_id"] for r in res} == {"t1", "t3", "t4"}
    # ranks contiguous from 0, score-desc
    assert [r["rank"] for r in res] == [0, 1, 2]
    scores = [r["score"] for r in res]
    assert scores == sorted(scores, reverse=True)


def test_score_identity_with_or_query(spark, idx, values):
    """An admitted doc's score equals the plain bm25 OR query's score —
    CoveringQuery sums exactly the matching sub-scorers."""
    res = {r["doc_id"]: r["score"]
           for r in terms_set_topk(spark, idx, TERMS, values,
                                   "required_matches", text_cfg=RAW, k=10)
           .collect()}
    ref = {r["doc_id"]: r["score"]
           for r in search_texts(spark, idx, [("q", " ".join(TERMS))],
                                 RetrieveConfig(k=10),
                                 text_cfg=RAW).collect()}
    for did, s in res.items():
        assert s == pytest.approx(ref[did], rel=1e-12), did


def test_doc_missing_from_values_never_matches(spark, idx, values):
    sub = values.where("doc_id <> 't1'")
    res = terms_set_topk(spark, idx, TERMS, sub, "required_matches",
                         text_cfg=RAW, k=10).collect()
    assert "t1" not in {r["doc_id"] for r in res}


def test_duplicate_terms_collapse(spark, idx, values):
    res1 = terms_set_topk(spark, idx, TERMS, values, "required_matches",
                          text_cfg=RAW, k=10).collect()
    res2 = terms_set_topk(spark, idx, TERMS + TERMS, values,
                          "required_matches", text_cfg=RAW, k=10).collect()
    assert [(r["doc_id"], r["score"]) for r in res1] == \
           [(r["doc_id"], r["score"]) for r in res2]


def test_empty_terms_refused(spark, idx, values):
    with pytest.raises(ValueError, match="at least one term"):
        terms_set_topk(spark, idx, [], values, "required_matches")
