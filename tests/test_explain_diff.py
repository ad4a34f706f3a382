"""explain() score decomposition (R7) and the normalization diff report (T4)."""

import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.functions.normalize import compare_strings, normalization_report
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.retrieve import explain, process_queries, search_texts

CFG = TextConfig(stem=None, stopwords=None)


def test_compare_strings_opcodes():
    # one deletion, one replacement, one insertion
    assert compare_strings("ab​c", "abc") == {"del ​": 1}
    assert compare_strings("naive", "naïve") == {"i → ï": 1}
    assert compare_strings("abc", "abxc") == {"ins x": 1}


def test_normalization_report_distributed(spark):
    df = spark.createDataFrame(
        [("a​b",), ("a​b",), ("clean",)], "text string")
    got = {r.change: r["count"] for r in normalization_report(df).collect()}
    assert got == {"del ​": 2}


def test_explain_sums_to_search_score(spark, tmp_path):
    idx = str(tmp_path / "idx")
    docs = spark.createDataFrame(
        [("d1", "stream window stream join", "eng"),
         ("d2", "window filter scan table", "eng"),
         ("d3", "stream cache probe", "eng")],
        "id string, text string, lang string")
    build_index(spark, docs, idx, IndexConfig(text=CFG, num_shards=2),
                resume=False)
    res = search_texts(spark, idx, [("q1", "stream window")],
                       RetrieveConfig(k=3), text_cfg=CFG)
    rows = {r.doc_id: r.score for r in res.collect()}
    plan = process_queries([("q1", "stream window")], CFG)[0]
    exp = explain(spark, idx, plan, list(rows)).collect()
    by_doc: dict[str, float] = {}
    for r in exp:
        by_doc[r.doc_id] = by_doc.get(r.doc_id, 0.0) + r.contribution
    for doc_id, score in rows.items():
        assert by_doc[doc_id] == pytest.approx(score, abs=1e-12)
    # components are populated
    assert all(r.tf > 0 and r.idf > 0 and r.df > 0 for r in exp)
