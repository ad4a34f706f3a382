"""End-to-end run on patapsco's OWN sample dataset and config
(/root/reference/samples/configs/eng_basic.yml over
samples/data/eng_mini_{docs,topics,qrels}) — the HC4-style query set the
north star names. The reference files are read in place as inputs (public
data, not copied into this repo).

Config parity with eng_basic.yml: whitespace tokenize, porter stem,
lowercase, lucene stopwords (reference default, schema.py:42), BM25 k=5,
mock rerank, scoring against the sample qrels.
"""

import os

import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.evaluate import evaluate_run
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.rerank import mock_rerank
from patapsco_spark.operators.retrieve import search_texts
from patapsco_spark.sources.trec import (
    read_hc4_docs,
    read_hc4_topics,
    read_qrels,
    topics_to_query_texts,
)

SAMPLES = "/root/reference/samples/data"
CFG = TextConfig(tokenize="whitespace", stem="porter", stopwords="lucene",
                 lowercase=True)

pytestmark = pytest.mark.skipif(
    not os.path.exists(f"{SAMPLES}/eng_mini_docs.jsonl"),
    reason="reference samples not present")


@pytest.fixture(scope="module")
def sample_index(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("mini") / "idx")
    docs = read_hc4_docs(spark, f"{SAMPLES}/eng_mini_docs.jsonl", lang="eng")
    build_index(spark, docs, path, IndexConfig(text=CFG, num_shards=2),
                resume=False)
    return path


@pytest.fixture(scope="module")
def sample_queries(spark):
    topics = read_hc4_topics(spark, f"{SAMPLES}/eng_mini_topics.jsonl",
                             "eng", "original")
    return [(r["query_id"], r["text"])
            for r in topics_to_query_texts(topics, fields=("title",)).collect()]


def test_full_sample_run(spark, sample_index, sample_queries):
    assert len(sample_queries) >= 2  # Flooding, Dissidents…
    res = search_texts(spark, sample_index, sample_queries,
                       RetrieveConfig(k=5), text_cfg=CFG)
    res = mock_rerank(spark, sample_index, res).cache()
    rows = res.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs = sorted(rs, key=lambda r: r["rank"])
        assert len(rs) <= 5
        scores = [r.score for r in rs]
        assert scores == sorted(scores, reverse=True)

    # the sample qrels mark one highly-relevant doc (rel=3) for topic 001
    # ("Flooding") — a correct BM25 over this corpus must surface it
    qrels = read_qrels(spark, f"{SAMPLES}/eng_mini_qrels")
    rel3 = {(r.query_id, r.doc_id) for r in
            qrels.where("relevance >= 3").collect()}
    got_pairs = {(r.query_id, r.doc_id) for r in rows}
    assert any(p in got_pairs for p in rel3)

    # scoring stage runs over the sample qrels and yields sane metrics
    scores = {r["query_id"]: r.asDict() for r in
              evaluate_run(res.select("query_id", "doc_id", "score"),
                           qrels).collect()}
    assert "all" in scores
    assert 0.0 <= scores["all"]["ndcg"] <= 1.0
    assert scores["001"]["ndcg"] > 0  # the flooding doc was found


def test_sample_run_deterministic(spark, sample_index, sample_queries):
    a = search_texts(spark, sample_index, sample_queries[:1],
                     RetrieveConfig(k=5), text_cfg=CFG).collect()
    b = search_texts(spark, sample_index, sample_queries[:1],
                     RetrieveConfig(k=5), text_cfg=CFG).collect()
    assert [(r.doc_id, r.score) for r in a] == [(r.doc_id, r.score) for r in b]
