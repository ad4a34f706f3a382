"""PSQ translation-table loading semantics (reference formats.py:113-143)
and the doc-store / rerank stage (reference database.py + rerank.py)."""

import os
import stat

import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.rerank import (
    attach_doc_text,
    doc_store,
    lookup_docs,
    mock_rerank,
    shell_rerank,
)
from patapsco_spark.operators.retrieve import search, search_texts
from patapsco_spark.sources.psq import (
    normalize_psq_entry,
    parse_psq_table,
    psq_plan_from_tokens,
)

CFG = TextConfig(stem=None, stopwords=None, lowercase=True)


class TestPsqTable:
    def test_normalize_renormalizes_and_floors(self):
        entry = {"a": 8.0, "b": 2.0, "tiny": 1e-7}
        out = normalize_psq_entry(entry, cum_thresh=1.0)
        # tiny is floored AFTER normalization; with cum_thresh >= 1 there is
        # no second renormalization (reference behavior, formats.py:113-130)
        assert set(out) == {"a", "b"}
        assert out["a"] == pytest.approx(8.0 / (10 + 1e-7))
        assert out["b"] == pytest.approx(2.0 / (10 + 1e-7))

    def test_cumulative_threshold_inclusive(self):
        # probs 0.6, 0.3, 0.1 — cumsum crosses 0.85 at the 2nd item →
        # keep 2 items, renormalized
        entry = {"x": 6.0, "y": 3.0, "z": 1.0}
        out = normalize_psq_entry(entry, cum_thresh=0.85)
        assert set(out) == {"x", "y"}
        assert out["x"] == pytest.approx(6 / 9)
        assert out["y"] == pytest.approx(3 / 9)

    def test_threshold_never_crossed_keeps_all(self):
        entry = {"x": 1.0, "y": 1.0}
        out = normalize_psq_entry(entry, cum_thresh=1.0)
        assert out == {"x": 0.5, "y": 0.5}

    def test_parse_table_caps_and_normalizes(self, tmp_path):
        import json
        table = {"gato": {"cat": 0.8, "feline": 0.2},
                 "perro": {f"t{i}": 1.0 for i in range(1500)}}
        p = tmp_path / "t.json"
        p.write_text(json.dumps(table))
        out = parse_psq_table(str(p), threshold=1.0)
        assert len(out["perro"]) <= 1024
        assert sum(out["gato"].values()) == pytest.approx(1.0)

    def test_plan_projection_and_oov(self):
        table = parse_psq_table({"gato": {"cat": 0.8, "feline": 0.2}}, 1.0)
        plan = psq_plan_from_tokens("q1", ["Gato", "zzz"], table)
        assert plan.mode == "psq"
        assert plan.clauses[0].terms == [("cat", 0.8), ("feline", 0.2)]
        assert plan.clauses[1].terms == [("zzz", 1.0)]

    def test_psq_plan_searches(self, spark, tmp_path):
        idx = str(tmp_path / "idx")
        docs = spark.createDataFrame(
            [("d1", "cat feline whiskers", "eng"), ("d2", "dog bone", "eng")],
            "id string, text string, lang string")
        build_index(spark, docs, idx, IndexConfig(text=CFG, num_shards=1),
                    resume=False)
        table = parse_psq_table({"gato": {"cat": 0.8, "feline": 0.2}}, 1.0)
        plan = psq_plan_from_tokens("q1", ["gato"], table)
        res = search(spark, idx, [plan], RetrieveConfig(k=5)).collect()
        assert [r.doc_id for r in res] == ["d1"]


class TestDocStoreRerank:
    @pytest.fixture(scope="class")
    def idx(self, spark, tmp_path_factory):
        path = str(tmp_path_factory.mktemp("rrk") / "idx")
        docs = spark.createDataFrame(
            [("d1", "stream window join", "eng"),
             ("d2", "window filter scan", "eng"),
             ("d3", "cache probe vector", "eng")],
            "id string, text string, lang string")
        build_index(spark, docs, path, IndexConfig(text=CFG, num_shards=1),
                    resume=False)
        return path

    def test_doc_store_lookup(self, spark, idx):
        got = {r.id: r.original_text
               for r in lookup_docs(spark, idx, ["d1", "d3"]).collect()}
        assert got == {"d1": "stream window join", "d3": "cache probe vector"}

    def test_mock_rerank_identity(self, spark, idx):
        res = search_texts(spark, idx, [("q", "window")],
                           RetrieveConfig(k=5), text_cfg=CFG)
        before = sorted((r.doc_id, r["rank"], r.score) for r in res.collect())
        after = sorted((r.doc_id, r["rank"], r.score)
                       for r in mock_rerank(spark, idx, res).collect())
        assert before == after

    def test_attach_doc_text(self, spark, idx):
        res = search_texts(spark, idx, [("q", "window")],
                           RetrieveConfig(k=5), text_cfg=CFG)
        joined = attach_doc_text(res, doc_store(spark, idx))
        texts = {r.doc_id: r.original_text for r in joined.collect()}
        assert texts["d1"] == "stream window join"

    def test_shell_rerank_contract(self, spark, idx, tmp_path):
        script = tmp_path / "rerank.sh"
        # reverse the scores: new score = 1000 - rank (python for portability)
        script.write_text(
            "#!/bin/sh\n"
            'python -c "\n'
            "import json, sys\n"
            "inp, out = sys.argv[1], sys.argv[2]\n"
            "rows = [json.loads(l) for l in open(inp)]\n"
            "with open(out, 'w') as f:\n"
            "    for r in rows:\n"
            "        f.write(f\\\"{r['query_id']} Q0 {r['doc_id']} {r['rank']} {1000 + r['rank']} rr\\n\\\")\n"
            '" "$4" "$5"\n')
        script.chmod(script.stat().st_mode | stat.S_IEXEC)
        res = search_texts(spark, idx, [("q", "window")],
                           RetrieveConfig(k=5), text_cfg=CFG)
        out = shell_rerank(spark, idx, res, str(script),
                           extra_args={"alpha": "0.5"})
        rows = sorted(out.collect(), key=lambda r: r["rank"])
        # scores were reversed: former last is now first
        orig = sorted(res.collect(), key=lambda r: r["rank"])
        assert rows[0].doc_id == orig[-1].doc_id

    def test_shell_rerank_distributed_identical(self, spark, idx, tmp_path):
        """The per-query-group applyInPandas path must produce exactly the
        driver path's output (same script, multi-query run)."""
        script = tmp_path / "rerank2.sh"
        script.write_text(
            "#!/bin/sh\n"
            'python -c "\n'
            "import json, sys\n"
            "inp, out = sys.argv[1], sys.argv[2]\n"
            "rows = [json.loads(l) for l in open(inp)]\n"
            "with open(out, 'w') as f:\n"
            "    for r in rows:\n"
            "        f.write(f\\\"{r['query_id']} Q0 {r['doc_id']} {r['rank']} {1000 + r['rank']} rr\\n\\\")\n"
            '" "$4" "$5"\n')
        script.chmod(script.stat().st_mode | stat.S_IEXEC)
        res = search_texts(spark, idx, [("q1", "window"), ("q2", "cache scan")],
                           RetrieveConfig(k=5), text_cfg=CFG)
        driver = sorted(((r["query_id"], r["doc_id"], r["rank"], r["score"])
                         for r in shell_rerank(spark, idx, res, str(script)).collect()))
        dist = sorted(((r["query_id"], r["doc_id"], r["rank"], r["score"])
                       for r in shell_rerank(spark, idx, res, str(script),
                                             distributed=True).collect()))
        assert driver == dist and len(driver) > 0

    def test_shell_rerank_distributed_count_mismatch_fails_job(self, spark, idx, tmp_path):
        script = tmp_path / "bad2.sh"
        script.write_text("#!/bin/sh\n: > \"$5\"\n")
        script.chmod(script.stat().st_mode | stat.S_IEXEC)
        res = search_texts(spark, idx, [("q", "window")],
                           RetrieveConfig(k=5), text_cfg=CFG)
        with pytest.raises(Exception, match="!= input rows"):
            shell_rerank(spark, idx, res, str(script), distributed=True).collect()

    def test_shell_rerank_count_mismatch_raises(self, spark, idx, tmp_path):
        script = tmp_path / "bad.sh"
        script.write_text("#!/bin/sh\n: > \"$5\"\n")  # writes empty output
        script.chmod(script.stat().st_mode | stat.S_IEXEC)
        res = search_texts(spark, idx, [("q", "window")],
                           RetrieveConfig(k=5), text_cfg=CFG)
        with pytest.raises(RuntimeError, match="!= input rows"):
            shell_rerank(spark, idx, res, str(script))
