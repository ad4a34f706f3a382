"""Composed corpus-cleaning recipe (operators/recipes.py): line dedup →
exact dedup → quality, plus the per-stage survivor funnel."""

import pytest

from patapsco_spark.operators.recipes import clean_corpus, clean_corpus_funnel

BANNER = "COOKIES ACCEPT NOW"


@pytest.fixture(scope="module")
def docs(spark):
    # d1/d2: same body hidden under different chrome (dedup only possible
    # AFTER boilerplate removal); d3 unique; d4 low-quality repetition;
    # d5 chrome-only; d6 too short
    return spark.createDataFrame([
        (1, f"{BANNER}\nalpha beta gamma delta epsilon"),
        (2, f"alpha beta gamma delta epsilon\n{BANNER}"),
        (3, f"{BANNER}\nzeta eta theta iota kappa"),
        (4, "spam spam spam spam spam spam"),
        (5, BANNER),
        (6, "tiny doc"),
    ], "doc_id long, text string")


class TestCleanCorpus:
    def test_survivors(self, spark, docs):
        got = {r["doc_id"]: r["text"]
               for r in clean_corpus(docs, line_min_docs=3,
                                     min_tokens=3,
                                     min_distinct_ratio=0.4).collect()}
        # d2 collapses into d1 (identical after chrome removal, min id
        # survives); d4 fails the distinct-ratio screen; d5 empties out;
        # d6 fails min_tokens
        assert got == {1: "alpha beta gamma delta epsilon",
                       3: "zeta eta theta iota kappa"}

    def test_funnel_counts(self, spark, docs):
        rows = clean_corpus_funnel(docs, line_min_docs=3, min_tokens=3,
                                   min_distinct_ratio=0.4).collect()
        got = [(r["stage_no"], r["stage"], r["docs_out"]) for r in rows]
        assert got == [(0, "input", 6), (1, "line_dedup", 5),
                       (2, "exact_dedup", 4), (3, "quality", 2)]
