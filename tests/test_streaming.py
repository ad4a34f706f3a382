"""Incremental index maintenance: batch append semantics + the Structured
Streaming foreachBatch sink (file source, availableNow trigger)."""

import json
import time

import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.retrieve import search_texts
from patapsco_spark.streaming.incremental import append_batch, stream_index

CFG = TextConfig(stem=None, stopwords=None, lowercase=True)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "id string, text string, lang string")


class TestAppendBatch:
    def test_append_extends_results(self, spark, tmp_path):
        idx = str(tmp_path / "idx")
        build_index(spark, _docs(spark, [
            ("a1", "stream window join", "eng"),
            ("a2", "filter scan table", "eng")]), idx,
            IndexConfig(text=CFG, num_shards=1), resume=False)

        meta = append_batch(spark, _docs(spark, [
            ("b1", "stream stream window", "eng"),
            ("b2", "cache probe vector", "eng")]), idx,
            IndexConfig(text=CFG), epoch_id=0)
        assert meta["num_docs"] == 4

        res = search_texts(spark, idx, [("q", "stream")],
                           RetrieveConfig(k=10), text_cfg=CFG)
        ids = {r.doc_id for r in res.collect()}
        assert ids == {"a1", "b1"}  # old and new docs both retrievable

    def test_epoch_idempotence(self, spark, tmp_path):
        idx = str(tmp_path / "idx2")
        build_index(spark, _docs(spark, [("a1", "x y", "eng")]), idx,
                    IndexConfig(text=CFG, num_shards=1), resume=False)
        batch = _docs(spark, [("b1", "x z", "eng")])
        m1 = append_batch(spark, batch, idx, IndexConfig(text=CFG), epoch_id=7)
        m2 = append_batch(spark, batch, idx, IndexConfig(text=CFG), epoch_id=7)
        assert m1["num_docs"] == 2
        assert m2["num_docs"] == 2  # replay was a no-op

    def test_docids_do_not_collide(self, spark, tmp_path):
        idx = str(tmp_path / "idx3")
        build_index(spark, _docs(spark, [("a1", "x", "eng"), ("a2", "y", "eng")]),
                    idx, IndexConfig(text=CFG, num_shards=1), resume=False)
        append_batch(spark, _docs(spark, [("b1", "z", "eng")]), idx,
                     IndexConfig(text=CFG), epoch_id=0)
        norms = spark.read.parquet(f"{idx}/norms")
        docids = [r.docid for r in norms.select("docid").collect()]
        assert len(docids) == len(set(docids)) == 3


class TestStreamIndex:
    def test_file_stream_ingestion(self, spark, tmp_path):
        src = tmp_path / "feed"
        src.mkdir()
        idx = str(tmp_path / "sidx")
        build_index(spark, _docs(spark, [("seed", "stream window", "eng")]),
                    idx, IndexConfig(text=CFG, num_shards=1), resume=False)

        for i, text in enumerate(["stream table scan", "window cache probe"]):
            with open(src / f"batch{i}.jsonl", "w") as f:
                f.write(json.dumps({"id": f"s{i}", "text": text, "lang": "eng"}) + "\n")

        stream = (spark.readStream
                  .schema("id string, text string, lang string")
                  .json(str(src)))
        q = stream_index(spark, stream, idx, checkpoint=str(tmp_path / "ckpt"),
                         cfg=IndexConfig(text=CFG))
        q.awaitTermination(120)

        res = search_texts(spark, idx, [("q", "stream")],
                           RetrieveConfig(k=10), text_cfg=CFG)
        ids = {r.doc_id for r in res.collect()}
        assert ids == {"seed", "s0"}
