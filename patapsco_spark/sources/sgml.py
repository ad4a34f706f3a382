"""TREC SGML / XML sources — rebuilds of the reference's parsers
(/root/reference/patapsco/util/formats.py:15-93) and their readers
(/root/reference/patapsco/docs.py:42-59, topics.py:96-137):

- SGML documents (S2): ``<DOC>…</DOC>`` records; the text is the
  space-joined, stripped contents of the first occurrence of each tag in
  [headline, title, hl, head, ttl, dd, date, lp, leadpara, text].
  Distributed: the scan splits records on the ``<DOC>`` delimiter
  (``textinputformat.record.delimiter``) so a 100 TB SGML dump parallelizes
  per split; tag extraction is regex-based inside an Arrow kernel (the
  reference uses BeautifulSoup's lenient html.parser; for well-formed TREC
  collections the tag grammar below matches its output, pinned by tests).
- Hamshahri documents: ``.DID``-delimited plain text records.
- SGML topics (S6): ``<top>`` blocks with num/title/desc/narr (optional
  prefix like ``EN-``); ``strip_non_digits`` on ids mirrors
  topics.py:111.
- XML topics (S7): one ``<topic lang=…>`` element per topic.

Topic files are tiny — parsed driver-side into a DataFrame, like the
reference's in-memory topic lists.
"""

from __future__ import annotations

import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DOC_TEXT_TAGS = ["headline", "title", "hl", "head", "ttl", "dd", "date",
                 "lp", "leadpara", "text"]

_TAG_RES = {t: re.compile(rf"<{t}\b[^>]*>(.*?)</{t}\s*>", re.S | re.I)
            for t in DOC_TEXT_TAGS}
_DOCNO_RE = re.compile(r"<docno\b[^>]*>(.*?)</docno\s*>", re.S | re.I)
_INNER_TAG_RE = re.compile(r"<[^>]+>")


def _sgml_text(tag_body: str) -> str:
    """get_text() equivalent for a tag body: drop nested tags, strip."""
    return _INNER_TAG_RE.sub("", tag_body).strip()


def parse_sgml_doc(record: str) -> tuple[str, str] | None:
    m = _DOCNO_RE.search(record)
    if not m:
        return None
    doc_id = _sgml_text(m.group(1))
    parts = []
    for t in DOC_TEXT_TAGS:
        hit = _TAG_RES[t].search(record)
        if hit:
            parts.append(_sgml_text(hit.group(1)))
    return doc_id, " ".join(parts)


def read_sgml_docs(spark: SparkSession, path: str, lang: str = "eng") -> DataFrame:
    """Distributed TREC SGML scan → (id, lang, text)."""
    rdd = (spark.sparkContext
           .newAPIHadoopFile(
               path,
               "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
               "org.apache.hadoop.io.LongWritable",
               "org.apache.hadoop.io.Text",
               conf={"textinputformat.record.delimiter": "<DOC>"})
           .map(lambda kv: kv[1]))
    records = spark.createDataFrame(rdd.map(lambda r: (r,)), "record string")

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [parse_sgml_doc(r) for r in pdf["record"]]
            rows = [r for r in rows if r is not None]
            yield pd.DataFrame(rows or None, columns=["id", "text"])

    out = records.mapInPandas(extract, schema="id string, text string")
    return out.select("id", F.lit(lang).alias("lang"), "text")


def strip_non_digits(s: str) -> str:
    """Reference topic-id normalization (topics.py:111)."""
    return re.sub(r"\D", "", s)


def parse_sgml_topics(path: str, encoding: str = "utf8",
                      sgml_prefix: str | None = None):
    """Yield (num, title, desc, narr) from a TREC <top> file."""
    prefix = sgml_prefix or ""
    with open(path, encoding=encoding) as f:
        text = f.read()
    blocks = re.findall(r"<top>(.*?)</top>", text, re.S | re.I)
    for block in blocks:
        def field(tag, optional=False):
            m = re.search(rf"<{tag}\s*>(.*?)</{tag}\s*>", block, re.S | re.I)
            if m is None:
                if optional:
                    return None
                raise ValueError(f"missing <{tag}> in topic block")
            return m.group(1).strip()
        yield (field("num"), field(prefix + "title"),
               field(prefix + "desc"), field(prefix + "narr", optional=True))


def parse_xml_topics(path: str, encoding: str = "utf8"):
    """Yield (id, lang, title, desc, narr) from an XML topics file."""
    from xml.etree import ElementTree
    with open(path, encoding=encoding) as f:
        root = ElementTree.fromstring(f.read())
    for topic in root:
        yield (topic.find("identifier").text.strip(),
               topic.attrib["lang"],
               topic.find("title").text.strip(),
               topic.find("description").text.strip(),
               topic.find("narrative").text.strip())


def read_sgml_topics(spark: SparkSession, path: str, lang: str = "eng",
                     sgml_prefix: str | None = None,
                     strip_ids: bool = True) -> DataFrame:
    rows = [((strip_non_digits(num) if strip_ids else num), lang, title, desc, narr)
            for num, title, desc, narr in parse_sgml_topics(path, sgml_prefix=sgml_prefix)]
    return spark.createDataFrame(
        rows, "id string, lang string, title string, desc string, report string")


def read_xml_topics(spark: SparkSession, path: str,
                    lang_filter: str | None = None,
                    strip_ids: bool = True) -> DataFrame:
    rows = [((strip_non_digits(i) if strip_ids else i), lg, t, d, n)
            for i, lg, t, d, n in parse_xml_topics(path)
            if lang_filter is None or lg == lang_filter]
    return spark.createDataFrame(
        rows, "id string, lang string, title string, desc string, report string")


def read_hamshahri_docs(spark: SparkSession, path: str, lang: str = "fas") -> DataFrame:
    """.DID-delimited Hamshahri corpus (formats.py:35-52); record-split on
    the .DID marker for distributed scanning."""
    rdd = (spark.sparkContext
           .newAPIHadoopFile(
               path,
               "org.apache.hadoop.mapreduce.lib.input.TextInputFormat",
               "org.apache.hadoop.io.LongWritable",
               "org.apache.hadoop.io.Text",
               conf={"textinputformat.record.delimiter": ".DID"})
           .map(lambda kv: kv[1]))

    def parse(rec: str):
        lines = rec.strip().split("\n")
        if not lines or not lines[0].strip():
            return None
        doc_id = lines[0].strip().lstrip("\t ").split("\t")[-1].strip()
        body = [ln.strip() for ln in lines[3:]]  # skip date + category lines
        return doc_id, " ".join(b for b in body if b).strip()

    rows = rdd.map(parse).filter(lambda r: r is not None and r[0])
    df = spark.createDataFrame(rows, "id string, text string")
    return df.select("id", F.lit(lang).alias("lang"), "text")