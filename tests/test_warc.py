"""WARC source: serializer/parser roundtrip, distributed read (stream and
binaryFile modes), malformed-input refusal, and the page-table bridge."""

import gzip
import io
import os

import pandas as pd
import pytest

from patapsco_spark.sources.warc import (
    parse_warc_bytes, parse_warc_stream, read_warc, record_bytes,
    records_to_warc_bytes, warc_to_pages)
from patapsco_spark.sources.webpages import _synth_batch, extract_text_series


def _pages(n):
    import numpy as np
    return _synth_batch(np.arange(n))


def test_roundtrip_plain_and_gzip():
    pdf = _pages(6)
    for compress in (False, True):
        buf = records_to_warc_bytes(pdf, compress=compress)
        recs = list(parse_warc_bytes(buf, source="t"))
        assert len(recs) == 6
        assert [r["url"] for r in recs] == list(pdf["url"])
        assert [bytes(r["html"]) for r in recs] == [
            bytes(h) for h in pdf["html"]]
        assert all(r["http_status"] == 200 for r in recs)
        assert all(r["content_type"].startswith("text/html") for r in recs)
        # WARC-Date is second-precision; synthesis timestamps already are
        assert [r["warc_ts"] for r in recs] == [
            t.to_pydatetime() for t in pdf["warc_ts"]]


def test_serializer_deterministic():
    pdf = _pages(3)
    assert records_to_warc_bytes(pdf) == records_to_warc_bytes(pdf)


def test_offsets_are_record_starts():
    pdf = _pages(4)
    buf = records_to_warc_bytes(pdf, compress=False)
    recs = list(parse_warc_bytes(buf, source="t"))
    for r in recs:
        assert buf[r["warc_offset"]:r["warc_offset"] + 5] == b"WARC/"


def test_non_response_records_skipped():
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 4\r\n"
            b"\r\nabcd\r\n\r\n")
    buf = info + records_to_warc_bytes(_pages(2), compress=False)
    recs = list(parse_warc_bytes(buf, source="t"))
    assert len(recs) == 2
    both = list(parse_warc_bytes(buf, source="t",
                                 types=("warcinfo", "response")))
    assert len(both) == 3 and both[0]["warc_type"] == "warcinfo"


@pytest.mark.parametrize("mutate, msg", [
    (lambda b: b[:-20], "truncated"),
    (lambda b: b.replace(b"WARC/1.0", b"HARC/1.0", 1), "version line"),
    (lambda b: b.replace(b"Content-Length:", b"Content-Hength:", 1),
     "Content-Length"),
])
def test_malformed_raises(mutate, msg):
    buf = mutate(records_to_warc_bytes(_pages(2), compress=False))
    with pytest.raises(ValueError, match=msg):
        list(parse_warc_bytes(buf, source="t"))


def test_http_block_parse_failures():
    bad = record_bytes("http://x/", pd.Timestamp("2020-01-01"), b"ok")
    bad = bad.replace(b"HTTP/1.1 200 OK", b"HTTP/1.1 XX")
    with pytest.raises(ValueError, match="status line"):
        list(parse_warc_bytes(bad, source="t"))


def _write_shards(tmp_path, n_files=3, per_file=5):
    paths = []
    for i in range(n_files):
        import numpy as np
        pdf = _synth_batch(np.arange(i * per_file, (i + 1) * per_file))
        p = os.path.join(str(tmp_path), f"shard-{i:05d}.warc.gz")
        with open(p, "wb") as f:
            f.write(records_to_warc_bytes(pdf))
        paths.append(p)
    return paths


@pytest.mark.parametrize("mode", ["stream", "binary"])
def test_distributed_read(spark, tmp_path, mode):
    _write_shards(tmp_path)
    df = read_warc(spark, os.path.join(str(tmp_path), "*.warc.gz"),
                   mode=mode)
    rows = df.orderBy("url").collect()
    assert len(rows) == 15
    exp = _pages(15).sort_values("url").reset_index(drop=True)
    assert [r.url for r in rows] == list(exp["url"])
    assert [bytes(r.html) for r in rows] == [bytes(h) for h in exp["html"]]
    assert all(os.path.basename(r.warc_file).startswith("shard-")
               for r in rows)


def test_read_empty_glob_raises(spark, tmp_path):
    with pytest.raises(ValueError, match="no WARC files"):
        read_warc(spark, os.path.join(str(tmp_path), "nope-*.warc.gz"))


def test_warc_to_pages_extraction_identity(spark, tmp_path):
    """warc → pages → text must equal the synthesized text byte-for-byte
    (the north-star per-url invariant, through the crawl format)."""
    _write_shards(tmp_path, n_files=2, per_file=4)
    pages = warc_to_pages(
        read_warc(spark, os.path.join(str(tmp_path), "*.warc.gz")))
    got = {r.url: r.text for r in pages.collect()}
    exp = _pages(8)
    exp_text = dict(zip(exp["url"], exp["text"]))
    assert got == exp_text


def test_warc_to_pages_filters_non_html(spark, tmp_path):
    pdf = _pages(3).assign(
        content_type=["text/html; charset=UTF-8", "image/png",
                      "text/plain"],
        http_status=[200, 200, 404])
    p = os.path.join(str(tmp_path), "mixed.warc.gz")
    with open(p, "wb") as f:
        f.write(records_to_warc_bytes(pdf))
    pages = warc_to_pages(read_warc(spark, p))
    assert pages.count() == 1  # png dropped by type, 404 by status


def test_streaming_warc_ingestion(spark, tmp_path):
    """Crawl shards landing in a directory → streaming parse →
    incremental index appends, exactly once across restarts: the second
    query run (same checkpoint) must index ONLY the newly-landed shard."""
    from pyspark.sql import functions as F

    from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
    from patapsco_spark.operators.retrieve import search_texts
    from patapsco_spark.plans import manifest as mf
    from patapsco_spark.sources.warc import read_warc_stream, warc_to_pages
    from patapsco_spark.streaming.incremental import stream_index

    from patapsco_spark.operators.indexer import build_index

    cfg = IndexConfig(text=TextConfig(stem=None, stopwords=None,
                                      lowercase=True))
    feed = tmp_path / "feed"
    feed.mkdir()
    idx = str(tmp_path / "warcidx")
    ckpt = str(tmp_path / "ckpt")
    import numpy as np

    # appends extend an existing index (a Lucene segment flush needs a
    # directory); seed it with one doc
    seed = spark.createDataFrame([("seed://0", "crawl seed page", "eng")],
                                 "url string, text string, lang string")
    build_index(spark, seed, idx, cfg, id_col="url", resume=False)

    def land(shard_i, lo, hi):
        pdf = _synth_batch(np.arange(lo, hi))
        with open(feed / f"crawl-{shard_i:05d}.warc.gz", "wb") as f:
            f.write(records_to_warc_bytes(pdf))
        return pdf

    def ingest():
        stream = read_warc_stream(spark, str(feed) + "/*.warc.gz")
        pages = warc_to_pages(stream).withColumn("lang", F.lit("eng"))
        q = stream_index(spark, pages, idx, checkpoint=ckpt, cfg=cfg,
                         id_col="url", text_col="text")
        q.awaitTermination(180)

    land(0, 0, 5)
    ingest()
    man1 = mf.read_manifest(idx)["config"]
    assert man1["num_docs"] == 6

    pdf2 = land(1, 5, 10)
    ingest()
    man2 = mf.read_manifest(idx)["config"]
    assert man2["num_docs"] == 11  # exactly once: 11, not 6 + 10

    # a shard-2 page is retrievable by a word from its own text
    target = pdf2.iloc[2]
    word = target["text"].split("\n")[1].split()[0]
    res = search_texts(spark, idx, [("q", word)], RetrieveConfig(k=10),
                       text_cfg=cfg.text)
    assert target["url"] in {r.doc_id for r in res.collect()}


def test_gzip_offsets_are_seekable_member_starts(tmp_path):
    """A CDX-style consumer must be able to seek to warc_offset in the
    RAW .warc.gz and inflate exactly that record."""
    pdf = _pages(5)
    buf = records_to_warc_bytes(pdf, compress=True)
    recs = list(parse_warc_bytes(buf, source="t"))
    assert len(recs) == 5
    for r in recs:
        # seek to the pointer and inflate: the FIRST record there must be
        # this one (gzip.decompress inflates all remaining members, so we
        # just check the head — no fragile member-boundary scanning)
        raw = gzip.decompress(buf[r["warc_offset"]:])
        first = next(iter(parse_warc_bytes(raw, source="m")))
        assert first["url"] == r["url"]


def test_unicode_url_roundtrip():
    ts = pd.Timestamp("2021-03-04 05:06:07")
    buf = record_bytes("https://example.org/café/中文", ts,
                       b"<p>x</p>")
    (rec,) = list(parse_warc_bytes(buf, source="t"))
    assert rec["url"] == "https://example.org/café/中文"


def test_warc11_fractional_and_offset_dates():
    import datetime
    for raw_date, exp in [
        (b"2024-05-01T12:00:00.123456Z",
         datetime.datetime(2024, 5, 1, 12, 0, 0, 123456)),
        (b"2024-05-01T14:00:00+02:00",
         datetime.datetime(2024, 5, 1, 12, 0, 0)),
    ]:
        buf = record_bytes("http://x/", pd.Timestamp("2020-01-01"), b"ok")
        buf = buf.replace(b"2020-01-01T00:00:00Z", raw_date)
        # fix the framing: header length changed
        # (recompute via serializer is simpler: build by hand)
        head, _, rest = buf.partition(b"\r\n\r\n")
        old_len = int([ln for ln in head.split(b"\r\n")
                       if ln.startswith(b"Content-Length")][0].split(b":")[1])
        (rec,) = list(parse_warc_stream(io.BufferedReader(io.BytesIO(buf)),
                                        source="t"))
        assert rec["warc_ts"] == exp and old_len > 0


def test_lineage_paths_consistent_across_modes(spark, tmp_path):
    _write_shards(tmp_path, n_files=1, per_file=3)
    glob = os.path.join(str(tmp_path), "*.warc.gz")
    stream_files = {r.warc_file
                    for r in read_warc(spark, glob, mode="stream").collect()}
    binary_files = {r.warc_file
                    for r in read_warc(spark, glob, mode="binary").collect()}
    assert stream_files == binary_files
    for p in binary_files:
        assert not p.startswith("file:")
        assert os.path.exists(p)


def test_wet_roundtrip_and_distributed_write(spark, tmp_path):
    """pages → WET conversion records → parse back: text byte-identical;
    the distributed writer's manifest accounts for every record."""
    from patapsco_spark.sources.warc import (pages_to_wet_bytes, write_wet)

    pdf = _pages(6)
    buf = pages_to_wet_bytes(pdf[["url", "warc_ts", "text"]])
    recs = list(parse_warc_bytes(buf, source="t", types=("conversion",)))
    assert [r["url"] for r in recs] == list(pdf["url"])
    assert [bytes(r["html"]).decode() for r in recs] == list(pdf["text"])

    pages = spark.createDataFrame(pdf[["url", "warc_ts", "text"]])
    out = str(tmp_path / "wet")
    man = write_wet(pages, out, partitions=3)
    assert sum(m["n_records"] for m in man) == 6
    assert all(m["path"].endswith(".warc.wet.gz") for m in man)
    got = {}
    for m in man:
        with open(m["path"], "rb") as f:
            for r in parse_warc_bytes(f.read(), source=m["path"],
                                      types=("conversion",)):
                got[r["url"]] = bytes(r["html"]).decode()
    assert got == dict(zip(pdf["url"], pdf["text"]))


def test_wat_roundtrip(spark, tmp_path):
    """pages → WAT metadata records → parse: links match the anchor
    extractor, title matches the <title> block, JSON bytes deterministic."""
    import json

    from patapsco_spark.operators.linkgraph import extract_links_series
    from patapsco_spark.sources.warc import pages_to_wat_bytes, write_wat

    pdf = _pages(4)
    # inject anchors so links are non-trivial
    pdf = pdf.assign(html=[
        h.replace(b"</body>",
                  f'<a href="https://t{i}.example/p">x</a></body>'.encode())
        for i, h in enumerate(pdf["html"])])
    buf = pages_to_wat_bytes(pdf)
    assert buf == pages_to_wat_bytes(pdf)  # deterministic
    recs = list(parse_warc_bytes(buf, source="t", types=("metadata",)))
    assert [r["url"] for r in recs] == list(pdf["url"])
    exp_links = extract_links_series(pdf["html"], pdf["url"])
    for i, r in enumerate(recs):
        meta = json.loads(bytes(r["html"]))
        assert meta["links"] == exp_links[i]
        assert meta["links"][-1] == f"https://t{i}.example/p"
        assert meta["title"].startswith("Page ")

    pages = spark.createDataFrame(pdf[["url", "warc_ts", "html"]])
    man = write_wat(pages, str(tmp_path / "wat"), partitions=2)
    assert sum(m["n_records"] for m in man) == 4
    assert all(m["path"].endswith(".warc.wat.gz") for m in man)
