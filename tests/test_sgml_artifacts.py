"""SGML/XML sources and patapsco jsonl artifact round-trips."""

import json

import pytest

from patapsco_spark.sources.artifacts import (
    read_docs_artifact,
    read_queries_artifact,
    read_results_artifact,
    write_docs_artifact,
    write_queries_artifact,
    write_results_artifact,
)
from patapsco_spark.sources.sgml import (
    parse_sgml_doc,
    read_sgml_docs,
    read_sgml_topics,
    read_xml_topics,
    strip_non_digits,
)

SGML = """<DOC>
<DOCNO>AA-1</DOCNO>
<DOCID>AA-1</DOCID>
<DATE>20200601</DATE>
<HEADLINE>First headline</HEADLINE>
<BYLINE>Nobody</BYLINE>
<TEXT>
Body of the first document.
</TEXT>
</DOC>
<DOC>
<DOCNO>BB-2</DOCNO>
<HEADLINE>Second headline</HEADLINE>
<TEXT>Body two.</TEXT>
</DOC>
"""

TOPICS_SGML = """<top>
<num> C141 </num>
<title> First title </title>
<desc> First description. </desc>
<narr> First narrative. </narr>
</top>

<top>
<num> C142 </num>
<title> Second title </title>
<desc> Second description. </desc>
</top>
"""

TOPICS_XML = """<?xml version="1.0" encoding="UTF-8"?>
<topics>
<topic lang="en">
<identifier>7-XY</identifier>
<title>T one</title>
<description>D one</description>
<narrative>N one</narrative>
</topic>
<topic lang="ru">
<identifier>8-XY</identifier>
<title>T two</title>
<description>D two</description>
<narrative>N two</narrative>
</topic>
</topics>
"""


class TestSgml:
    def test_parse_sgml_doc_tag_order_and_strip(self):
        doc_id, text = parse_sgml_doc(SGML.split("</DOC>")[0])
        # tag order headline < date per DOC_TEXT_TAGS ordering in reference:
        # headline, …, date, …, text — date IS in the text-tags list
        assert doc_id == "AA-1"
        assert text == "First headline 20200601 Body of the first document."

    def test_read_sgml_docs_distributed(self, spark, tmp_path):
        p = tmp_path / "docs.sgml"
        p.write_text(SGML)
        rows = {r.id: r.text for r in read_sgml_docs(spark, str(p)).collect()}
        assert set(rows) == {"AA-1", "BB-2"}
        assert rows["BB-2"] == "Second headline Body two."

    def test_sgml_topics(self, spark, tmp_path):
        p = tmp_path / "topics.txt"
        p.write_text(TOPICS_SGML)
        rows = sorted(read_sgml_topics(spark, str(p)).collect(),
                      key=lambda r: r.id)
        assert [(r.id, r.title, r.report) for r in rows] == [
            ("141", "First title", "First narrative."),
            ("142", "Second title", None)]

    def test_xml_topics_lang_filter(self, spark, tmp_path):
        p = tmp_path / "topics.xml"
        p.write_text(TOPICS_XML)
        rows = read_xml_topics(spark, str(p), lang_filter="ru").collect()
        assert [(r.id, r.lang, r.title) for r in rows] == [("8", "ru", "T two")]

    def test_strip_non_digits(self):
        assert strip_non_digits("EN-C141x") == "141"


class TestArtifacts:
    def test_docs_roundtrip(self, spark, tmp_path):
        docs = spark.createDataFrame(
            [("d1", "eng", "text one", "2020-01-01"), ("d2", "eng", "t2", None)],
            "id string, lang string, text string, date string")
        path = str(tmp_path / "docs")
        write_docs_artifact(docs, path)
        back = read_docs_artifact(spark, path)
        assert sorted((r.id, r.text, r.date) for r in back.collect()) == \
            [("d1", "text one", "2020-01-01"), ("d2", "t2", None)]

    def test_queries_roundtrip(self, spark, tmp_path):
        q = spark.createDataFrame(
            [("q1", "eng", "inform retriev", "information retrieval", None)],
            "id string, lang string, query string, text string, report string")
        path = str(tmp_path / "queries")
        write_queries_artifact(q, path)
        back = read_queries_artifact(spark, path).collect()
        assert back[0].query == "inform retriev"
        assert back[0].text == "information retrieval"

    def test_results_nested_roundtrip(self, spark, tmp_path):
        queries = spark.createDataFrame(
            [("q1", "eng", "a b", "a b", None), ("q2", "eng", "c", "c", None)],
            "id string, lang string, query string, text string, report string")
        results = spark.createDataFrame(
            [("q1", "d2", 1, 0.5), ("q1", "d1", 0, 0.9), ("q2", "d3", 0, 0.7)],
            "query_id string, doc_id string, rank int, score double")
        path = str(tmp_path / "results")
        write_results_artifact(results, queries, path, system="sys",
                               doc_lang="rus")
        # nested form: one json object per query, results sorted by rank
        nested = read_results_artifact(spark, path, flatten=False).collect()
        by_q = {r.query.id: r for r in nested}
        assert [x.doc_id for x in by_q["q1"].results] == ["d1", "d2"]
        assert by_q["q1"].doc_lang == "rus" and by_q["q1"].system == "sys"
        # flattened form matches the input rows
        flat = read_results_artifact(spark, path)
        assert sorted((r.query_id, r.doc_id, r.rank, r.score)
                      for r in flat.collect()) == \
            [("q1", "d1", 0, 0.9), ("q1", "d2", 1, 0.5), ("q2", "d3", 0, 0.7)]

    def test_results_artifact_is_patapsco_shaped(self, spark, tmp_path):
        """Every line must parse as the reference's Results json shape."""
        queries = spark.createDataFrame(
            [("q1", "eng", "a", "a", None)],
            "id string, lang string, query string, text string, report string")
        results = spark.createDataFrame(
            [("q1", "d1", 0, 1.5)],
            "query_id string, doc_id string, rank int, score double")
        path = str(tmp_path / "res2")
        write_results_artifact(results, queries, path)
        import glob
        lines = []
        for f in glob.glob(f"{path}/part*"):
            lines += open(f).read().splitlines()
        obj = json.loads(lines[0])
        assert set(obj) == {"query", "doc_lang", "system", "results"}
        assert set(obj["query"]) >= {"id", "lang", "query", "text"}
        assert obj["results"][0] == {"doc_id": "d1", "rank": 0, "score": 1.5}
