"""top_hits and slice_matches (operators/aggs.py): per-bucket heads with
score/doc_id tie-break, n validation; slices are disjoint, exhaustive,
and placement-independent."""

import pytest
from pyspark.sql import functions as F

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.aggs import (match_set_texts, slice_matches,
                                           top_hits)
from patapsco_spark.operators.indexer import build_index

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)

DOCS = [
    ("d1", "apple apple apple", "a"),
    ("d2", "apple apple pad", "a"),
    ("d3", "apple pad pad", "a"),
    ("d4", "apple pad pad pad", "b"),
    ("d5", "apple pad pad pad pad", "b"),
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("tophits") / "idx")
    df = spark.createDataFrame([(d, t, "eng") for d, t, _ in DOCS],
                               "id string, text string, lang string")
    build_index(spark, df, p, IndexConfig(text=RAW, num_shards=2))
    return p


@pytest.fixture(scope="module")
def matches(spark, idx):
    return match_set_texts(spark, idx, [("q1", "apple")],
                           RetrieveConfig(k=10), text_cfg=RAW)


@pytest.fixture(scope="module")
def fields(spark):
    return spark.createDataFrame([(d, g) for d, _, g in DOCS],
                                 "doc_id string, grp string")


def test_per_bucket_heads(spark, matches, fields):
    out = top_hits(matches, fields, "grp", n=2)
    rows = [(r["grp"], r["hit_rank"], r["doc_id"]) for r in out.collect()]
    # bucket a: d1 (3x apple) then d2 (2x); bucket b: d4 (shorter) then d5
    assert rows == [("a", 0, "d1"), ("a", 1, "d2"),
                    ("b", 0, "d4"), ("b", 1, "d5")]
    with pytest.raises(ValueError, match="n must be positive"):
        top_hits(matches, fields, "grp", n=0)


def test_slices_disjoint_and_exhaustive(spark, matches):
    n = 3
    parts = [set(r["doc_id"] for r in
                 slice_matches(matches, i, n).collect()) for i in range(n)]
    allm = {r["doc_id"] for r in matches.collect()}
    assert set().union(*parts) == allm
    for i in range(n):
        for j in range(i + 1, n):
            assert not parts[i] & parts[j]


def test_slice_placement_independent(spark, matches):
    a = {r["doc_id"] for r in slice_matches(matches, 1, 3).collect()}
    b = {r["doc_id"] for r in
         slice_matches(matches.repartition(7), 1, 3).collect()}
    assert a == b
    with pytest.raises(ValueError, match="slice_id"):
        slice_matches(matches, 3, 3)
