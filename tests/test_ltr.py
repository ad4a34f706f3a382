"""LTR feature extraction (operators/ltr.py): every feature checked
against a brute Python reference over the corpus; score columns against
the engine's own scorers (the bit-replayable kernels)."""

import math

import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.ltr import ltr_features
from patapsco_spark.operators.retrieve import search_texts

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)

DOCS = [
    ("l1", "alpha beta beta pad pad", "eng"),
    ("l2", "alpha pad pad pad pad", "eng"),
    ("l3", "beta gamma pad pad pad", "eng"),
    ("l4", "pad pad pad pad pad", "eng"),
]
QUERIES = [("q1", "alpha beta"), ("q2", "gamma")]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ltr") / "idx")
    df = spark.createDataFrame(DOCS, "id string, text string, lang string")
    build_index(spark, df, path, IndexConfig(text=RAW, num_shards=2))
    return path


@pytest.fixture(scope="module")
def feats(spark, idx):
    out = ltr_features(spark, idx, QUERIES, text_cfg=RAW)
    return {(r["query_id"], r["doc_id"]): r.asDict() for r in out.collect()}


def test_match_set_and_term_aggregates(feats):
    toks = {d[0]: d[1].split() for d in DOCS}
    n = len(DOCS)
    for (q, qtext) in QUERIES:
        qterms = sorted(set(qtext.split()))
        for did, tk in toks.items():
            matched = [t for t in qterms if t in tk]
            if not matched:
                assert (q, did) not in feats
                continue
            row = feats[(q, did)]
            tfs = [tk.count(t) for t in matched]
            assert row["n_matched"] == len(matched)
            assert row["match_ratio"] == pytest.approx(
                len(matched) / len(qterms))
            assert row["sum_tf"] == sum(tfs)
            assert row["max_tf"] == max(tfs)
            assert row["min_tf"] == min(tfs)
            assert row["dlq"] == 5  # all docs 5 tokens, quantize = identity
            idf = sum(
                math.log(1 + (n - sum(1 for v in toks.values() if t in v)
                              + 0.5)
                         / (sum(1 for v in toks.values() if t in v) + 0.5))
                for t in matched)
            assert row["sum_idf"] == pytest.approx(idf, rel=1e-12)


def test_score_columns_match_engine_scorers(spark, idx, feats):
    for name, col in (("bm25", "bm25"), ("qld", "qld")):
        ref = {(r["query_id"], r["doc_id"]): r["score"]
               for r in search_texts(spark, idx, QUERIES,
                                     RetrieveConfig(name=name, k=10),
                                     text_cfg=RAW).collect()}
        for key, row in feats.items():
            # qld can clamp a matching doc to 0 — absent from top-k output
            want = ref.get(key, 0.0)
            assert row[col] == pytest.approx(want, abs=1e-12), (col, key)


def test_empty_query_refused(spark, idx):
    with pytest.raises(ValueError, match="at least one query term"):
        ltr_features(spark, idx, [("q", "")], text_cfg=RAW)
