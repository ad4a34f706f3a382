"""Web-pages source: deterministic synthesis, HTML→text byte-identity,
partitioning invariance, and end-to-end ingestion into the index.

Mirrors the reference's reader tests (tests/test_docs.py) in spirit: golden
in/out pairs for the extraction kernel, then pipeline-level assertions.
"""

import pandas as pd
import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.retrieve import search_texts
from patapsco_spark.sources.webpages import (
    extract_pages,
    extract_text_series,
    html_to_text,
    index_webpages,
    render_html_series,
    synthesize_pages,
)


class TestHtmlToText:
    def test_strips_script_style_comments(self):
        doc = ("<html><head><style>p{}</style>"
               "<script>var a = '<p>x</p>';</script></head>"
               "<body><!-- hidden -->Hello <b>world</b></body></html>")
        assert html_to_text(doc) == "Hello world"

    def test_block_tags_become_newlines(self):
        doc = "<div>one</div><p>two</p>three<br>four"
        assert html_to_text(doc) == "one\ntwo\nthree\nfour"

    def test_entities_unescaped(self):
        assert html_to_text("<p>a &amp; b &lt;c&gt; &#39;d&#39;</p>") == "a & b <c> 'd'"

    def test_inline_tags_space_collapse(self):
        assert html_to_text("x<span>  y  </span>z") == "x y z"

    def test_blank_lines_dropped(self):
        assert html_to_text("<p></p><p>a</p><p>  </p><p>b</p>") == "a\nb"

    def test_render_extract_roundtrip(self):
        texts = pd.Series(["alpha beta\ngamma", "a & b <tag> 'q'", "one"])
        titles = pd.Series(["T1", "T & 2", None])
        html = render_html_series(texts, titles)
        got = extract_text_series(html)
        want = pd.Series(["T1\nalpha beta\ngamma", "T & 2\na & b <tag> 'q'", "one"])
        assert list(got) == list(want)

    def test_bytes_input_and_bad_utf8(self):
        s = pd.Series([b"<p>ok</p>", b"<p>bad \xff byte</p>", None])
        got = list(extract_text_series(s))
        assert got[0] == "ok"
        assert got[1] == "bad � byte"
        assert got[2] == ""


@pytest.mark.usefixtures("spark")
class TestSynthesizePages:
    def test_schema_and_determinism(self, spark):
        df = synthesize_pages(spark, 50, partitions=4)
        assert df.columns == ["url", "warc_ts", "html", "text", "lang"]
        a = sorted(df.collect(), key=lambda r: r.url)
        b = sorted(synthesize_pages(spark, 50, partitions=7).collect(),
                   key=lambda r: r.url)
        assert a == b  # partitioning-invariant content

    def test_extraction_byte_identical_per_url(self, spark):
        """The BASELINE.json per-row invariant: extracted text == stored text
        for every url."""
        pages = synthesize_pages(spark, 80, partitions=4)
        ext = extract_pages(pages).withColumnRenamed("text", "extracted")
        joined = ext.join(pages.select("url", "text"), "url")
        bad = joined.where("extracted <> text").count()
        assert bad == 0
        assert joined.count() == 80

    def test_index_and_query_webpages(self, spark, tmp_path):
        pages = synthesize_pages(spark, 60, partitions=4)
        idx = str(tmp_path / "webidx")
        meta = index_webpages(spark, pages, idx,
                              IndexConfig(text=TextConfig(stem=None, stopwords=None),
                                          num_shards=2), resume=False)
        assert meta["num_docs"] == 60
        res = search_texts(spark, idx, [("q1", "data stream window")],
                           RetrieveConfig(k=5),
                           text_cfg=TextConfig(stem=None, stopwords=None))
        rows = res.collect()
        assert 0 < len(rows) <= 5
        assert all(r.score > 0 for r in rows)
        assert [r.rank for r in rows] == sorted(r.rank for r in rows)
