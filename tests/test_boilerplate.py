"""Boilerplate removal (operators/boilerplate.py)."""
from __future__ import annotations

from patapsco_spark.operators.boilerplate import (
    classify_blocks, extract_main_content, main_content)

NAV = ('<div><a href="/a">home page link</a> <a href="/b">about us page</a>'
       ' <a href="/c">contact form here</a> <a href="/d">site map page</a>'
       '</div>')
PARA = "<p>" + " ".join(f"word{k}" for k in range(15)) + "</p>"
FOOTER = "<p>© 2020 example corp</p>"


def test_para_kept_nav_and_footer_dropped():
    doc = f"<html><body>{NAV}{PARA}{FOOTER}</body></html>"
    blocks = classify_blocks(doc)
    assert [g for _, g in blocks] == [False, True, False]
    # nav is long enough (12 words) — dropped by link density alone
    assert len(blocks[0][0].split()) >= 10
    assert main_content(doc) == " ".join(f"word{k}" for k in range(15))


def test_link_density_partial():
    # 12 words, 2 linked -> low density, kept
    doc = ('<p>one two three four five six seven eight nine ten '
           '<a href="/x">eleven twelve</a></p>')
    assert classify_blocks(doc)[0][1] is True


def test_min_words_threshold():
    doc = "<p>only four words here</p>"
    assert classify_blocks(doc)[0][1] is False
    assert classify_blocks(doc, min_words=4)[0][1] is True


def test_script_style_comments_gone():
    doc = ("<script>var a = 'ten words of junk inside a script tag';</script>"
           "<style>p{color:red}</style><!-- note -->" + PARA)
    assert main_content(doc) == PARA[3:-4]


def test_entities_and_inline_tags():
    doc = ("<p>alpha &amp; beta gamma <b>delta</b> epsilon zeta eta theta "
           "iota kappa</p>")
    text, good = classify_blocks(doc)[0]
    assert good and "&amp;" not in text and "alpha & beta" in text


def test_empty_and_none_html(spark):
    pages = spark.createDataFrame(
        [("u1", None), ("u2", b""), ("u3", f"<html>{PARA}</html>".encode())],
        "url string, html binary")
    got = {r.url: r for r in extract_main_content(pages).collect()}
    assert got["u1"].main_text == "" and got["u1"].n_blocks == 0
    assert got["u2"].main_text == ""
    assert got["u3"].n_content_blocks == 1


def test_dataframe_counts(spark):
    doc = f"<html><body>{NAV}{PARA}{FOOTER}</body></html>"
    pages = spark.createDataFrame([("u", doc.encode())],
                                  "url string, html binary")
    row = extract_main_content(pages).collect()[0]
    assert (row.n_blocks, row.n_content_blocks) == (3, 1)
    assert row.main_text == " ".join(f"word{k}" for k in range(15))


def test_thresholds_are_parameters(spark):
    doc = f"<html><body>{FOOTER}</body></html>"
    pages = spark.createDataFrame([("u", doc.encode())],
                                  "url string, html binary")
    row = extract_main_content(pages, min_words=2).collect()[0]
    assert row.n_content_blocks == 1
