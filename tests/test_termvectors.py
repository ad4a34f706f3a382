"""Term vectors read back from the index (operators/termvectors.py):
tf/dl/df/cf per (doc, term), unknown ids silent, tombstoned ids excluded
with search-identical visibility."""

from collections import Counter

import pytest

from patapsco_spark.config import IndexConfig, TextConfig
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.termvectors import doc_term_vectors

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)

DOCS = [
    ("d1", "apple banana apple cherry"),
    ("d2", "banana banana date"),
    ("d3", "apple date date date"),
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("tv") / "idx")
    df = spark.createDataFrame([(i, t, "eng") for i, t in DOCS],
                               "id string, text string, lang string")
    # docs_per_shard small enough that d1's postings span >1 block would
    # need a bigger corpus; block pruning is still exercised (1 block)
    build_index(spark, df, p, IndexConfig(text=RAW, num_shards=2))
    return p


def test_vectors_golden(spark, idx):
    rows = doc_term_vectors(spark, idx, ["d1", "d3"]).collect()
    got = {(r["doc_id"], r["term"]): (r["tf"], r["dl"], r["df"], r["cf"])
           for r in rows}
    texts = dict(DOCS)
    corpus = Counter(w for _, t in DOCS for w in t.split())
    dfs = Counter(w for _, t in DOCS for w in set(t.split()))
    want = {}
    for d in ("d1", "d3"):
        toks = texts[d].split()
        for w, tf in Counter(toks).items():
            want[(d, w)] = (tf, len(toks), dfs[w], corpus[w])
    assert got == want


def test_unknown_id_no_rows(spark, idx):
    assert doc_term_vectors(spark, idx, ["nope"]).collect() == []
    assert doc_term_vectors(spark, idx, []).collect() == []


def test_tombstoned_id_excluded(spark, tmp_path):
    from patapsco_spark.operators.deletes import delete_docs

    p = str(tmp_path / "idx")
    df = spark.createDataFrame([(i, t, "eng") for i, t in DOCS],
                               "id string, text string, lang string")
    build_index(spark, df, p, IndexConfig(text=RAW, num_shards=1))
    del_ids = spark.createDataFrame([("d2",)], "id string")
    delete_docs(spark, p, del_ids, id_col="id")
    rows = doc_term_vectors(spark, p, ["d1", "d2"]).collect()
    assert {r["doc_id"] for r in rows} == {"d1"}
