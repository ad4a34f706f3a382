"""Query-time synonyms (Lucene SynonymQuery semantics): tf summed across
members, df = max member df — NOT an OR of independently-idf'd terms."""

import math

import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.functions.smallfloat import quantize_length
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.retrieve import search_texts

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)

DOCS = [
    ("d1", "car pad pad pad"),
    ("d2", "auto auto pad pad pad"),
    ("d3", "car auto pad pad"),
    ("d4", "truck pad pad pad pad"),
    ("d5", "pad pad pad pad pad pad"),
]
K1, B = 0.9, 0.4
SYN = {"car": ["auto"]}


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("syn") / "idx")
    df = spark.createDataFrame([(i, t, "eng") for i, t in DOCS],
                               "id string, text string, lang string")
    build_index(spark, df, p, IndexConfig(text=RAW, num_shards=2))
    return p


def _bm25(tf, df, dl, n, avgdl):
    import numpy as np
    dlq = float(quantize_length(np.array([dl], dtype="int64"))[0])
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    return idf * tf / (tf + K1 * (1 - B + B * dlq / avgdl))


def test_synonym_query_golden(spark, idx):
    """'car' with synonym 'auto': tf(car)+tf(auto) per doc, df = max(df)."""
    import numpy as np
    res = search_texts(spark, idx, [("q1", "car")],
                       RetrieveConfig(k=10, k1=K1, b=B), text_cfg=RAW,
                       synonyms=SYN).collect()
    got = {r["doc_id"]: r["score"] for r in res}
    n = len(DOCS)
    avgdl = float(np.float32(sum(len(t.split()) for _, t in DOCS) / n))
    df = 2  # max(df(car)=2, df(auto)=2)
    want = {
        "d1": _bm25(1, df, 4, n, avgdl),
        "d2": _bm25(2, df, 5, n, avgdl),
        "d3": _bm25(2, df, 4, n, avgdl),
    }
    assert got.keys() == want.keys()
    for d, s in got.items():
        assert math.isclose(s, want[d], rel_tol=1e-12), d


def test_synonym_differs_from_or(spark, idx):
    """The OR query scores each member with its own idf and never sums tfs
    into one saturation — results must differ."""
    syn = {r["doc_id"]: r["score"]
           for r in search_texts(spark, idx, [("q1", "car")],
                                 RetrieveConfig(k=10, k1=K1, b=B),
                                 text_cfg=RAW, synonyms=SYN).collect()}
    orq = {r["doc_id"]: r["score"]
           for r in search_texts(spark, idx, [("q1", "car auto")],
                                 RetrieveConfig(k=10, k1=K1, b=B),
                                 text_cfg=RAW).collect()}
    assert syn.keys() == orq.keys()
    assert any(not math.isclose(syn[d], orq[d], rel_tol=1e-9) for d in syn)


def test_synonyms_compose_with_boolean(spark, idx):
    """Pseudo-terms respect MUST/MUST_NOT like any term: 'car NOT truck'
    with the synonym still matches d1..d3, never d4."""
    res = search_texts(spark, idx, [("q1", "car NOT truck")],
                       RetrieveConfig(k=10), text_cfg=RAW, mode="boolean",
                       synonyms=SYN).collect()
    assert {r["doc_id"] for r in res} == {"d1", "d2", "d3"}


def test_unindexed_synonym_group_falls_back(spark, idx):
    """A group whose members are all unindexed keeps the literal term:
    matching nothing, not erroring."""
    res = search_texts(spark, idx, [("q1", "zzz")],
                       RetrieveConfig(k=10), text_cfg=RAW,
                       synonyms={"zzz": ["yyy"]}).collect()
    assert res == []


def test_synonyms_do_not_touch_phrases(spark, tmp_path_factory):
    """Phrase members stay literal: '"car pad"' must not match docs where
    only 'auto pad' appears."""
    spark_docs = [("p1", "car pad x y"), ("p2", "auto pad x y")]
    p = str(tmp_path_factory.mktemp("synp") / "idx")
    df = spark.createDataFrame([(i, t, "eng") for i, t in spark_docs],
                               "id string, text string, lang string")
    build_index(spark, df, p,
                IndexConfig(text=RAW, num_shards=1, positions=True))
    res = search_texts(spark, p, [("q1", '"car pad"')],
                       RetrieveConfig(k=10), text_cfg=RAW, mode="boolean",
                       synonyms=SYN).collect()
    assert {r["doc_id"] for r in res} == {"p1"}
