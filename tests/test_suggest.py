"""Autocomplete + spell suggestion over the term dictionary
(operators/suggest.py)."""
from __future__ import annotations

import pytest

from patapsco_spark.config import IndexConfig, TextConfig
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.suggest import (suggest_completions,
                                              suggest_spelling)

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)

DOCS = [
    ("1", "stream stream stream scan", "eng"),
    ("2", "stream scan stone query", "eng"),
    ("3", "query data steam", "eng"),     # 'steam' is a real term 1 edit off
    ("4", "strange data data", "eng"),
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("sugg_idx"))
    df = spark.createDataFrame(DOCS, "id string, text string, lang string")
    build_index(spark, df, path, IndexConfig(text=RAW, num_shards=2))
    return path


class TestCompletions:
    def test_ranked_by_cf_then_term(self, spark, idx):
        got = [(r.term, r.cf) for r in
               suggest_completions(spark, idx, "st", k=10).collect()]
        # cf: stream 4, steam 1, stone 1, strange 1 (ties alphabetical)
        assert got == [("stream", 4), ("steam", 1), ("stone", 1),
                       ("strange", 1)]

    def test_k_caps(self, spark, idx):
        assert suggest_completions(spark, idx, "st", k=2).count() == 2

    def test_empty_prefix_refused(self, spark, idx):
        with pytest.raises(ValueError, match="non-empty"):
            suggest_completions(spark, idx, "")

    def test_pushdown_reaches_scan(self, spark, idx):
        plan = suggest_completions(spark, idx, "st")._jdf \
            .queryExecution().executedPlan().toString()
        assert "StringStartsWith" in plan


class TestSpelling:
    def test_distance_first_then_cf(self, spark, idx):
        got = [(r.term, r.distance) for r in
               suggest_spelling(spark, idx, "strean", k=5,
                                min_cf=1).collect()]
        # 1 edit: stream (cf 4); 2 edits: steam; strange is 3 edits (out)
        assert got == [("stream", 1), ("steam", 2)]

    def test_min_cf_screens_tail(self, spark, idx):
        got = [r.term for r in
               suggest_spelling(spark, idx, "strean", k=5,
                                min_cf=2).collect()]
        assert got == ["stream"]

    def test_input_term_excluded(self, spark, idx):
        got = [r.term for r in
               suggest_spelling(spark, idx, "stream", k=5,
                                min_cf=1).collect()]
        assert "stream" not in got and "steam" in got

    def test_prefix_lock(self, spark, idx):
        # typo in the first letter: lock=1 misses, lock=0 finds
        assert suggest_spelling(spark, idx, "ttream", min_cf=1).count() == 0
        got = [r.term for r in suggest_spelling(
            spark, idx, "ttream", min_cf=1, prefix_lock=0).collect()]
        assert got[0] == "stream"

    def test_validation(self, spark, idx):
        with pytest.raises(ValueError, match="non-empty"):
            suggest_spelling(spark, idx, "")
        with pytest.raises(ValueError, match="max_edits"):
            suggest_spelling(spark, idx, "x", max_edits=0)
