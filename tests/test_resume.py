"""Resume / lineage semantics — the engine analogue of patapsco's
``.complete``-gated plan pruning and part_N bookkeeping
(/root/reference/patapsco/job.py:672-685,903-908; tests/test_job.py plan
tests are the model).

Executor-loss *within* a stage is Spark's own task-retry domain (all our
kernels are deterministic, so retries are safe); what the engine must add —
and what these tests pin — is stage-level exact resume: a partially
completed run (some stage outputs present and valid, later ones missing or
stale) recomputes only what is missing.
"""

import time

import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.retrieve import search_texts
from patapsco_spark.plans import manifest as mf

CFG = TextConfig(stem=None, stopwords=None)


def _docs(spark, n=40):
    rows = [(f"d{i:03d}", f"alpha beta gamma{i % 7} delta", "eng")
            for i in range(n)]
    return spark.createDataFrame(rows, "id string, text string, lang string")


class TestResume:
    def test_partial_loss_rebuilds_only_missing_stages(self, spark, tmp_path):
        idx = str(tmp_path / "idx")
        docs = _docs(spark)
        build_index(spark, docs, idx, IndexConfig(text=CFG, num_shards=2),
                    resume=False)
        analyzed_manifest_before = mf.read_manifest(f"{idx}/analyzed")

        # simulate loss of the postings output after the analyzed stage
        import shutil
        shutil.rmtree(f"{idx}/postings")

        build_index(spark, docs, idx, IndexConfig(text=CFG, num_shards=2),
                    resume=True)
        # analyzed stage untouched (same manifest timestamp — not recomputed)
        analyzed_manifest_after = mf.read_manifest(f"{idx}/analyzed")
        assert analyzed_manifest_before["written_at"] == \
            analyzed_manifest_after["written_at"]
        # postings rebuilt and queries work
        assert mf.read_manifest(f"{idx}/postings") is not None
        res = search_texts(spark, idx, [("q", "alpha")],
                           RetrieveConfig(k=5), text_cfg=CFG)
        assert res.count() == 5

    def test_config_change_invalidates_stages(self, spark, tmp_path):
        idx = str(tmp_path / "idx2")
        docs = _docs(spark)
        build_index(spark, docs, idx, IndexConfig(text=CFG, num_shards=2),
                    resume=False)
        before = mf.read_manifest(f"{idx}/analyzed")["written_at"]
        # different text config → analysis must recompute even with resume
        cfg2 = IndexConfig(text=TextConfig(stem="porter", stopwords=None),
                           num_shards=2)
        build_index(spark, docs, idx, cfg2, resume=True)
        after = mf.read_manifest(f"{idx}/analyzed")["written_at"]
        assert before != after

    def test_lineage_records_cover_all_rows(self, spark, tmp_path):
        idx = str(tmp_path / "idx3")
        docs = _docs(spark, n=35)
        build_index(spark, docs, idx, IndexConfig(text=CFG, num_shards=3),
                    resume=False)
        lineage = mf.read_manifest(f"{idx}/analyzed")["lineage"]
        assert sum(r["rows"] for r in lineage) == 35
        # per-partition key ranges are disjoint and ordered
        recs = sorted(lineage, key=lambda r: r["min_key"])
        for a, b in zip(recs, recs[1:]):
            assert a["max_key"] <= b["min_key"]

    def test_deterministic_docids_across_partitionings(self, spark, tmp_path):
        """Same corpus, different input partitioning → identical docids
        (the rank-identity prerequisite)."""
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        build_index(spark, _docs(spark).repartition(2), a,
                    IndexConfig(text=CFG, num_shards=2), resume=False)
        build_index(spark, _docs(spark).repartition(7), b,
                    IndexConfig(text=CFG, num_shards=2), resume=False)
        na = {(r.id, r.docid) for r in
              spark.read.parquet(f"{a}/norms").collect()}
        nb = {(r.id, r.docid) for r in
              spark.read.parquet(f"{b}/norms").collect()}
        assert na == nb
