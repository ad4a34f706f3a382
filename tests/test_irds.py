"""Contract tests for the ir_datasets readers (S4/S10/S15) using a stand-in
module — the real package is absent here, exactly like a bare reference
install (it's an optional extra there: /root/reference/setup.py). The
stand-in mirrors the ir_datasets API surface the readers touch:
load(name) → dataset with docs_iter/queries_iter/qrels_iter and *_lang."""

import sys
import types
from collections import namedtuple

import pytest

from patapsco_spark.sources import irds

Doc = namedtuple("Doc", "doc_id text")
Query = namedtuple("Query", "query_id text description")
Qrel = namedtuple("Qrel", "query_id doc_id relevance iteration")


class FakeDataset:
    def __init__(self, docs=(), queries=(), qrels=(), lang="en"):
        self._docs, self._queries, self._qrels = docs, queries, qrels
        self._lang = lang

    def docs_iter(self):
        return iter(self._docs)

    def queries_iter(self):
        return iter(self._queries)

    def qrels_iter(self):
        return iter(self._qrels)

    def docs_lang(self):
        return self._lang

    def queries_lang(self):
        return self._lang


@pytest.fixture()
def fake_irds(monkeypatch):
    docs = [Doc(f"d{i}", f"text number {i} stream window") for i in range(7)]
    queries = [Query("q1", "stream window", "about streams"),
               Query("q2", "other", None)]
    qrels = [Qrel("q1", "d1", 1, "0"), Qrel("q1", "d2", 0, "0")]
    mod = types.ModuleType("ir_datasets")
    mod.load = lambda name: FakeDataset(docs, queries, qrels)
    monkeypatch.setitem(sys.modules, "ir_datasets", mod)
    return mod


def test_not_installed_raises_gated_error(monkeypatch):
    monkeypatch.setitem(sys.modules, "ir_datasets", None)  # forces ImportError
    with pytest.raises(NotImplementedError, match="pip install ir_datasets"):
        irds._load("msmarco-passage")


def test_stage_docs_chunks_and_reads(spark, fake_irds, tmp_path):
    out = str(tmp_path / "staged")
    df = irds.stage_irds_docs(spark, "fake/corpus", out, lang="eng",
                              chunk_rows=3)
    rows = {r["id"]: (r["text"], r["lang"]) for r in df.collect()}
    assert len(rows) == 7
    assert rows["d3"] == ("text number 3 stream window", "eng")
    # 7 docs at chunk_rows=3 → 3 bounded part files (driver memory cap)
    import glob
    assert len(glob.glob(f"{out}/part-*.parquet")) == 3
    # idempotent: second call reuses the staged table
    df2 = irds.stage_irds_docs(spark, "fake/corpus", out, lang="eng")
    assert df2.count() == 7


def test_stage_docs_feeds_index_and_retrieval(spark, fake_irds, tmp_path):
    from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
    from patapsco_spark.operators.indexer import build_index
    from patapsco_spark.operators.retrieve import search_texts

    raw = TextConfig(stem=None, stopwords=None, lowercase=True)
    docs = irds.stage_irds_docs(spark, "fake/corpus", str(tmp_path / "st"),
                                lang="eng", chunk_rows=3)
    idx = str(tmp_path / "idx")
    build_index(spark, docs, idx, IndexConfig(text=raw, num_shards=2))
    res = search_texts(spark, idx, [("q", "number")], RetrieveConfig(k=3),
                       text_cfg=raw)
    assert len(res.collect()) == 3


def test_lang_mismatch_raises(spark, fake_irds, tmp_path):
    with pytest.raises(ValueError, match="not rus but eng"):
        irds.stage_irds_docs(spark, "fake/corpus", str(tmp_path / "x"),
                             lang="rus")


def test_topics_and_qrels(spark, fake_irds):
    topics = {r["query_id"]: (r["title"], r["desc"])
              for r in irds.irds_topics(spark, "fake/corpus", lang="eng").collect()}
    assert topics == {"q1": ("stream window", "about streams"),
                      "q2": ("other", None)}
    qrels = {(r["query_id"], r["doc_id"]): r["relevance"]
             for r in irds.irds_qrels(spark, "fake/corpus").collect()}
    assert qrels == {("q1", "d1"): 1, ("q1", "d2"): 0}
