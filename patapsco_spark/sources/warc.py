"""WARC (Web ARChive, ISO 28500) source — Common Crawl's native layout.

The north-star input is an Iceberg/parquet table of Common-Crawl-style
pages, but the crawl itself ships as ``.warc.gz`` shards (one gzip member
per record, ~1 GB per file, ~64k files per monthly crawl). This module
turns that raw layout into the engine's page table
(:data:`~patapsco_spark.sources.webpages.PAGES_SCHEMA`) without any
external WARC library:

- :func:`records_to_warc_bytes` — deterministic serializer (one gzip member
  per record, Common-Crawl-style), used by tests and the oracle-checked
  ``warc_ingest`` entry query to synthesize crawl files from the
  deterministic page corpus.
- :func:`parse_warc_stream` — incremental record parser over any readable
  byte stream; handles plain and multi-member-gzip input, ``warcinfo`` /
  ``request`` / ``metadata`` / ``response`` record types, and HTTP response
  framing inside ``response`` blocks. Malformed framing raises — a
  truncated crawl shard is data loss, never a silent short read.
- :func:`read_warc` — the distributed reader.

Scale design: a ``.warc.gz`` cannot be byte-range split (the gzip members
carry no index; Common Crawl's CDX index is a separate dataset), so the
parallel unit is the FILE — exactly how the crawl is sharded for
consumption. ``mode="stream"`` distributes the path list and each task
streams its files through the parser with bounded memory (an Arrow batch
is emitted every :data:`BATCH_RECORDS` records / :data:`BATCH_BYTES`
payload bytes, so a 1 GB shard never materializes at once).
``mode="binary"`` routes through Spark's ``binaryFile`` source instead —
whole-file rows, any Hadoop-supported scheme (s3a://, hdfs://) — for
object stores where task-side ``open()`` cannot reach the data. Each
output row carries (warc_file, warc_offset) lineage — the CDX-style
pointer that makes any record re-fetchable and any partition resumable.

Reference parity: patapsco ingests pre-extracted jsonl
(/root/reference/patapsco/docs.py:62-99) and has no crawl-format stage;
this source exists for the north star's Common-Crawl framing.
"""

from __future__ import annotations

import glob as _glob
import gzip
import io
import zlib
from datetime import datetime, timezone
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_SCHEMA = ("url string, warc_ts timestamp, warc_type string, "
               "http_status int, content_type string, html binary, "
               "warc_file string, warc_offset long")

# Arrow batch bounds for the streaming reader (records OR payload bytes,
# whichever trips first — keeps executor memory flat on huge-page shards)
BATCH_RECORDS = 2048
BATCH_BYTES = 32 << 20

_CRLF = b"\r\n"
_GZIP_MAGIC = b"\x1f\x8b"


# ---------------------------------------------------------------------------
# Serializer (deterministic; one gzip member per record like Common Crawl)
# ---------------------------------------------------------------------------

def _warc_date(ts) -> str:
    """pandas/py datetime → WARC-Date (ISO8601 Z, second precision)."""
    t = pd.Timestamp(ts)
    if t.tzinfo is not None:
        t = t.tz_convert("UTC").tz_localize(None)
    return t.strftime("%Y-%m-%dT%H:%M:%SZ")


def _record_id(url: str, wtype: str = "response") -> str:
    """Deterministic per-(record-type, url) id — ISO 28500 requires record
    ids be unique, so derived records (conversion/metadata) MUST NOT reuse
    the response record's id they refer to."""
    import hashlib
    salt = "" if wtype == "response" else f"{wtype}:"
    return hashlib.md5((salt + url).encode()).hexdigest()


def _record(wtype: str, url: str, ts, ctype: str, block: bytes,
            refers_to: str | None = None) -> bytes:
    """One framed WARC record (uncompressed): shared header block + body +
    the two terminating CRLFs. Headers are utf-8 — the spec's encoding —
    so IRI target urls serialize instead of crashing."""
    refers = (f"WARC-Refers-To: <urn:uuid:{refers_to}>\r\n"
              if refers_to else "")
    head = (
        "WARC/1.0\r\n"
        f"WARC-Type: {wtype}\r\n"
        f"WARC-Record-ID: <urn:uuid:{_record_id(url, wtype)}>\r\n"
        f"{refers}"
        f"WARC-Date: {_warc_date(ts)}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"Content-Type: {ctype}\r\n"
        f"Content-Length: {len(block)}\r\n\r\n").encode("utf-8")
    return head + block + b"\r\n\r\n"


def record_bytes(url: str, ts, html: bytes, http_status: int = 200,
                 content_type: str = "text/html; charset=UTF-8") -> bytes:
    """One WARC response record: WARC headers + an HTTP/1.1 response block,
    framed per ISO 28500 (Content-Length counts the block)."""
    http = (f"HTTP/1.1 {http_status} OK\r\n"
            f"Content-Type: {content_type}\r\n"
            f"Content-Length: {len(html)}\r\n\r\n").encode("ascii") + html
    return _record("response", url, ts,
                   "application/http; msgtype=response", http)


def records_to_warc_bytes(pdf: pd.DataFrame, compress: bool = True) -> bytes:
    """Rows (url, warc_ts, html[, http_status, content_type]) → one WARC
    file's bytes. ``compress=True`` emits one gzip member PER RECORD
    (mtime pinned to 0 so the bytes are deterministic), the Common-Crawl
    layout that lets a CDX offset seek straight to a record."""
    out = io.BytesIO()
    has_status = "http_status" in pdf.columns
    has_ct = "content_type" in pdf.columns
    for row in pdf.itertuples(index=False):
        raw = record_bytes(
            row.url, row.warc_ts,
            bytes(row.html) if row.html is not None else b"",
            http_status=int(row.http_status) if has_status else 200,
            content_type=(row.content_type if has_ct
                          else "text/html; charset=UTF-8"))
        if compress:
            out.write(gzip.compress(raw, mtime=0))
        else:
            out.write(raw)
    return out.getvalue()


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------

def _read_exact(stream, n: int, what: str) -> bytes:
    buf = stream.read(n)
    if len(buf) != n:
        raise ValueError(
            f"truncated WARC: expected {n} bytes for {what}, got {len(buf)}")
    return buf


def _parse_http_block(block: bytes) -> tuple[int | None, str | None, bytes]:
    """HTTP response block → (status, content-type, body). A block that
    doesn't start with HTTP/ is returned whole as the body (some archives
    store raw payloads in response records)."""
    if not block.startswith(b"HTTP/"):
        return None, None, block
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        raise ValueError("malformed HTTP block in WARC response record: "
                         "no header/body separator")
    head, body = block[:sep], block[sep + 4:]
    lines = head.split(_CRLF)
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError) as e:
        raise ValueError(
            f"malformed HTTP status line in WARC record: {lines[0]!r}") from e
    ctype = None
    for ln in lines[1:]:
        k, _, v = ln.partition(b":")
        if k.strip().lower() == b"content-type":
            ctype = v.strip().decode("latin-1")
            break
    return status, ctype, body


def parse_warc_stream(stream, source: str = "<stream>",
                      types: tuple[str, ...] = ("response",)
                      ) -> Iterator[dict]:
    """Incremental WARC record iterator over a readable binary stream of
    UNCOMPRESSED warc bytes. Yields dicts matching :data:`WARC_SCHEMA`
    (warc_offset = record start offset in this stream). Records whose
    WARC-Type is not in ``types`` are skipped (their payload is still
    length-framed, so skipping is an O(Content-Length) read, no scan).
    Raises ValueError on framing violations instead of resyncing — a
    corrupt crawl shard must surface, not shrink."""
    if not hasattr(stream, "readline"):
        stream = io.BufferedReader(stream)
    offset = 0
    while True:
        pos = offset
        line = stream.readline()
        if not line:
            return
        offset += len(line)
        # tolerate extra record-separator CRLFs before the version line
        if line in (_CRLF, b"\n"):
            continue
        if not line.startswith(b"WARC/"):
            raise ValueError(
                f"{source}: expected WARC/ version line at offset {pos}, "
                f"got {line[:40]!r}")
        headers: dict[str, str] = {}
        while True:
            ln = stream.readline()
            if not ln:
                raise ValueError(f"{source}: truncated WARC header block")
            offset += len(ln)
            if ln in (_CRLF, b"\n"):
                break
            k, sep, v = ln.partition(b":")
            if not sep:
                raise ValueError(
                    f"{source}: malformed WARC header line {ln[:60]!r}")
            # WARC headers are utf-8 (ISO 28500 §4); replace, don't crash,
            # on stray bytes
            headers[k.strip().decode("utf-8", errors="replace").lower()] = (
                v.strip().decode("utf-8", errors="replace"))
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError(
                f"{source}: WARC record at {pos} has no valid "
                "Content-Length") from e
        block = _read_exact(stream, clen, f"record block at {pos}")
        offset += clen
        # consume the two separator CRLFs (lenient about a missing final one
        # at EOF — some writers drop it on the last record)
        tail = stream.read(4)
        offset += len(tail)
        if tail not in (b"\r\n\r\n", b"", b"\r\n"):
            raise ValueError(
                f"{source}: bad record separator after offset {pos}: "
                f"{tail!r}")
        wtype = headers.get("warc-type", "")
        if wtype not in types:
            continue
        ts = None
        if "warc-date" in headers:
            # WARC/1.0 second precision and WARC/1.1 fractional/offset
            # forms are all valid — fromisoformat covers both; normalize
            # to naive UTC
            ts = datetime.fromisoformat(
                headers["warc-date"].replace("Z", "+00:00"))
            if ts.tzinfo is not None:
                ts = ts.astimezone(timezone.utc).replace(tzinfo=None)
        status, ctype, body = (None, None, block)
        if headers.get("content-type", "").startswith("application/http"):
            status, ctype, body = _parse_http_block(block)
        yield {
            "url": headers.get("warc-target-uri"),
            "warc_ts": ts,
            "warc_type": wtype,
            "http_status": status,
            "content_type": ctype,
            "html": body,
            "warc_file": source,
            "warc_offset": pos,
        }


def _iter_gzip_members(stream, chunk_size: int = 1 << 20,
                       source: str = "<stream>"
                       ) -> Iterator[tuple[int, bytes]]:
    """Multi-member gzip → (member_start_raw_offset, decompressed_bytes)
    per member. Incremental (``chunk_size`` raw bytes in flight), O(total
    bytes) — and it yields the COMPRESSED offset of each member, which is
    what a CDX pointer must store for a range read to work."""
    raw_pos = 0
    buf = b""
    while True:
        if not buf:
            buf = stream.read(chunk_size)
            if not buf:
                return
        start = raw_pos
        d = zlib.decompressobj(wbits=31)
        out = []
        while True:
            out.append(d.decompress(buf))
            if d.eof:
                raw_pos += len(buf) - len(d.unused_data)
                buf = d.unused_data
                yield start, b"".join(out)
                break
            raw_pos += len(buf)
            buf = stream.read(chunk_size)
            if not buf:
                raise ValueError(f"{source}: truncated gzip member")


def parse_warc_auto(stream, source: str = "<stream>",
                    types: tuple[str, ...] = ("response",)
                    ) -> Iterator[dict]:
    """Sniff plain vs gzip and parse. For gzip input, ``warc_offset`` is
    the RAW (compressed) offset of the record's gzip member — seek there
    and inflate to re-read the record, the CDX contract; with Common
    Crawl's one-member-per-record layout every record gets its own
    offset (records sharing a member share its start). Plain input keeps
    byte offsets per record."""
    if not hasattr(stream, "peek"):
        stream = io.BufferedReader(stream)
    if stream.peek(2)[:2] == _GZIP_MAGIC:
        for start, data in _iter_gzip_members(stream, source=source):
            for rec in parse_warc_stream(
                    io.BufferedReader(io.BytesIO(data)),
                    source=source, types=types):
                rec["warc_offset"] = start
                yield rec
    else:
        yield from parse_warc_stream(stream, source=source, types=types)


def parse_warc_bytes(buf: bytes, source: str = "<bytes>",
                     types: tuple[str, ...] = ("response",)
                     ) -> Iterator[dict]:
    """Parse a whole WARC file held in memory (plain or gzip); same
    offset semantics as :func:`parse_warc_auto`."""
    yield from parse_warc_auto(io.BufferedReader(io.BytesIO(buf)),
                               source=source, types=types)


# ---------------------------------------------------------------------------
# Distributed reader
# ---------------------------------------------------------------------------

def _batched(recs: Iterator[dict]) -> Iterator[pd.DataFrame]:
    rows, nbytes = [], 0
    for r in recs:
        rows.append(r)
        nbytes += len(r["html"] or b"")
        if len(rows) >= BATCH_RECORDS or nbytes >= BATCH_BYTES:
            yield pd.DataFrame(rows)
            rows, nbytes = [], 0
    if rows:
        yield pd.DataFrame(rows)


def _lineage_path(p: str) -> str:
    """Normalize binaryFile's 'file:...' URIs to plain paths so warc_file
    lineage is identical across stream/binary/streaming modes (and
    directly open()-able); non-local schemes keep their URI."""
    if p.startswith("file:"):
        from urllib.parse import unquote, urlparse
        return unquote(urlparse(p).path)
    return p


def _content_kernel(types: tuple[str, ...]):
    """mapInPandas kernel over (path, content) whole-file rows."""
    def from_content(batches: Iterator[pd.DataFrame]
                     ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                yield from _batched(
                    parse_warc_bytes(bytes(content),
                                     source=_lineage_path(path),
                                     types=types))
    return from_content


# binaryFile's fixed schema (streaming sources must state it up front)
_BINARYFILE_SCHEMA = ("path string, modificationTime timestamp, "
                      "length long, content binary")


def read_warc_stream(spark: SparkSession, path_glob: str,
                     types: tuple[str, ...] = ("response",)) -> DataFrame:
    """Streaming WARC reader: a Structured Streaming DataFrame of records
    from crawl shards as they LAND in a directory — the continuous-
    ingestion front end for ``streaming.incremental.stream_index`` (new
    .warc.gz file → parsed records → appended index shards, exactly-once
    via the stream checkpoint + epoch manifests).

    Built on the ``binaryFile`` file-stream source, so each discovered
    shard arrives as one whole-file row (the streaming analogue of
    ``mode="binary"``; 1 GB-class shards need the binaryFile maxLength cap
    raised, same caveat as the batch path). File discovery, offset
    tracking, and replay-on-failure are the source's checkpoint contract —
    a shard is parsed exactly once per query lifetime."""
    raw = (spark.readStream.format("binaryFile")
           .schema(_BINARYFILE_SCHEMA)
           .load(path_glob))
    return raw.select("path", "content").mapInPandas(
        _content_kernel(types), schema=WARC_SCHEMA)


def read_warc(spark: SparkSession, paths, mode: str = "stream",
              types: tuple[str, ...] = ("response",),
              partitions: int | None = None) -> DataFrame:
    """Distributed WARC read → DataFrame(:data:`WARC_SCHEMA`).

    ``paths``: a glob / list of globs. ``mode="stream"`` (default)
    distributes the expanded path list and each task streams its files —
    constant memory, POSIX-reachable paths (local disk, NFS, fuse mounts).
    ``mode="binary"`` uses Spark's ``binaryFile`` source — any Hadoop
    scheme, whole file per row (Spark caps binaryFile rows at
    ``spark.sql.sources.binaryFile.maxLength``; Common-Crawl-sized 1 GB
    shards need stream mode or a raised cap).

    Empty expansion raises — a crawl read that silently matches zero files
    is the fail-on-empty contract every other source here follows
    (/root/reference/patapsco/docs.py glob validation parity).
    """
    if isinstance(paths, str):
        paths = [paths]
    if mode == "binary":
        df = spark.read.format("binaryFile").load(list(paths))
        return df.select("path", "content").mapInPandas(
            _content_kernel(types), schema=WARC_SCHEMA)
    if mode != "stream":
        raise ValueError(f"mode must be 'stream' or 'binary', got {mode!r}")
    files: list[str] = []
    for p in paths:
        files.extend(sorted(_glob.glob(p)))
    if not files:
        raise ValueError(f"no WARC files match {paths!r}")
    parts = partitions or min(len(files),
                              spark.sparkContext.defaultParallelism)
    pdf = spark.createDataFrame(pd.DataFrame({"path": files}))

    def from_paths(batches: Iterator[pd.DataFrame]
                   ) -> Iterator[pd.DataFrame]:
        for b in batches:
            for path in b["path"]:
                with open(path, "rb") as raw:
                    yield from _batched(
                        parse_warc_auto(raw, source=path, types=types))

    # round-robin, NOT hash-on-path: with ~as many files as partitions,
    # hashing leaves ~1/e of tasks empty and stacks multiple 1 GB shards
    # on others (balls into bins); round-robin deals one-ish file per task
    return (pdf.repartition(parts)
            .mapInPandas(from_paths, schema=WARC_SCHEMA))


def warc_to_pages(warc_df: DataFrame, extract: bool = True) -> DataFrame:
    """WARC rows → the engine's page table
    (url, warc_ts, html, text, lang). Keeps only HTTP-200 responses with an
    html/text content type (the Common-Crawl WET-generation filter shape).
    ``extract=True`` fills ``text`` via the byte-identity extractor;
    ``lang`` is left NULL for the language_id operator downstream."""
    from .webpages import extract_text_series

    ok = warc_df.where(
        (F.col("http_status") == 200) &
        (F.coalesce(F.col("content_type"), F.lit(""))
         .rlike("^(text/html|text/plain|application/xhtml)")))
    base = ok.select("url", "warc_ts", "html",
                     F.lit(None).cast("string").alias("lang"))
    if not extract:
        return base.select("url", "warc_ts", "html",
                           F.lit(None).cast("string").alias("text"), "lang")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.assign(text=extract_text_series(pdf["html"]))
            yield pdf[["url", "warc_ts", "html", "text", "lang"]]

    return base.mapInPandas(
        run, schema=("url string, warc_ts timestamp, html binary, "
                     "text string, lang string"))


# ---------------------------------------------------------------------------
# WET (extracted-text conversion records) — the WARC-family text product
# ---------------------------------------------------------------------------

def conversion_record_bytes(url: str, ts, text: str) -> bytes:
    """One WARC 'conversion' record (the WET layout): text/plain block
    holding the extracted text, WARC-Refers-To the source response record.
    Its own record id is salted by type (_record_id) — a WET record must
    never collide with the response record it refers to."""
    return _record("conversion", url, ts, "text/plain",
                   text.encode("utf-8"), refers_to=_record_id(url))


def pages_to_wet_bytes(pdf: pd.DataFrame, compress: bool = True) -> bytes:
    """Rows (url, warc_ts, text) → one WET file's bytes (one gzip member
    per record when compressed, like the WARC serializer)."""
    out = io.BytesIO()
    for row in pdf.itertuples(index=False):
        raw = conversion_record_bytes(row.url, row.warc_ts, row.text or "")
        out.write(gzip.compress(raw, mtime=0) if compress else raw)
    return out.getvalue()


def _write_record_shards(df: DataFrame, out_dir: str, suffix: str,
                         to_bytes, partitions: int | None) -> list[dict]:
    """Shared distributed shard writer: one ``part-NNNNN.{suffix}`` per
    partition, written task-side with bounded memory (each Arrow batch is
    serialized and flushed, never the whole partition). Returns the
    per-file manifest [(path, n_records, n_bytes), ...] — the action that
    materializes the write (one collected row per FILE, not per record).
    Local/POSIX-reachable out_dir (same reach contract as read_warc's
    stream mode)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    if partitions:
        df = df.repartition(partitions)

    def dump(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import os as _os

        from pyspark import TaskContext
        ctx = TaskContext.get()
        pid = ctx.partitionId()
        path = _os.path.join(out_dir, f"part-{pid:05d}.{suffix}")
        # write to an attempt-unique tmp and rename: a speculative or
        # retried attempt can never interleave bytes into the final shard,
        # and the last completed attempt wins atomically
        tmp = f"{path}.tmp-{ctx.taskAttemptId()}"
        n_rec = n_bytes = 0
        with open(tmp, "wb") as f:
            for pdf in batches:
                buf = to_bytes(pdf)
                f.write(buf)
                n_rec += len(pdf)
                n_bytes += len(buf)
        if n_rec == 0:
            _os.remove(tmp)  # no empty shards
            return
        _os.replace(tmp, path)
        yield pd.DataFrame([{"path": path, "n_records": n_rec,
                             "n_bytes": n_bytes}])

    man = df.mapInPandas(
        dump, schema="path string, n_records long, n_bytes long").collect()
    return [r.asDict() for r in man]


def write_wet(pages: DataFrame, out_dir: str,
              partitions: int | None = None) -> list[dict]:
    """Distributed WET export: conversion-record shards from
    (url, warc_ts, text) rows. See :func:`_write_record_shards`."""
    return _write_record_shards(pages.select("url", "warc_ts", "text"),
                                out_dir, "warc.wet.gz", pages_to_wet_bytes,
                                partitions)


# ---------------------------------------------------------------------------
# WAT (metadata records: per-page links + title as JSON) — the third
# member of Common Crawl's WARC/WAT/WET product family
# ---------------------------------------------------------------------------

def metadata_record_bytes(url: str, ts, meta: dict) -> bytes:
    """One WARC 'metadata' record: a canonical-JSON block (sorted keys,
    minimal separators — deterministic bytes) describing the page."""
    import json
    body = json.dumps(meta, sort_keys=True,
                      separators=(",", ":")).encode("utf-8")
    return _record("metadata", url, ts, "application/json", body,
                   refers_to=_record_id(url))


def pages_to_wat_bytes(pdf: pd.DataFrame, compress: bool = True) -> bytes:
    """Rows (url, warc_ts, html) → one WAT file's bytes: per page, the
    extracted outlinks (same anchor rules as the link-graph operator) and
    <title> as a JSON metadata record."""
    import re as _re

    from ..operators.linkgraph import extract_links_series
    # WAT metadata lists EVERY outlink (Common Crawl keeps nofollow links
    # in WAT records); only graph building drops non-endorsing rels
    links = extract_links_series(pdf["html"], pdf["url"],
                                 drop_rel=frozenset())
    title_re = _re.compile(rb"<title[^>]*>(.*?)</title>", _re.S | _re.I)
    out = io.BytesIO()
    for row, ls in zip(pdf.itertuples(index=False), links):
        blob = bytes(row.html) if row.html is not None else b""
        m = title_re.search(blob)
        title = (m.group(1).decode("utf-8", errors="replace").strip()
                 if m else "")
        raw = metadata_record_bytes(
            row.url, row.warc_ts, {"links": ls, "title": title, "url": row.url})
        out.write(gzip.compress(raw, mtime=0) if compress else raw)
    return out.getvalue()


def write_wat(pages: DataFrame, out_dir: str,
              partitions: int | None = None) -> list[dict]:
    """Distributed WAT export: metadata-record shards from
    (url, warc_ts, html) rows. See :func:`_write_record_shards`."""
    return _write_record_shards(pages.select("url", "warc_ts", "html"),
                                out_dir, "warc.wat.gz", pages_to_wat_bytes,
                                partitions)
