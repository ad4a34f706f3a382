"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata, processed by Arrow-batched kernels.

This is beyond the reference's scope (patapsco is text-only) but first-class
for a web-scale training-data pipeline. The *Spark plumbing* here is real —
schemas, partitioning, ``mapInPandas`` signatures, batch shapes, metadata
propagation — while the actual codecs are pluggable:

- with Pillow/librosa/av installed, ``decode_fn`` hooks run the real codec;
- in this container (no media libs) the default is the **synthetic codec**:
  payloads carry a 16-byte header ``MMv1 | kind | width/rate | height/dur``
  followed by raw bytes, and "decoding" parses that header — deterministic,
  byte-exact, and honest about being a stub (a real deployment swaps one
  function, not the pipeline).

Operators:
- :func:`attach_media` — derive a media table from a text corpus
  (deterministic payloads; used by tests/benchmarks; no external data)
- :func:`media_stats` — per-item kind, byte size, payload digest
- :func:`resize_images` — target-width resize: output dims computed
  exactly, pixel transform stubbed via the synthetic codec
- :func:`sample_frames` — video frame sampling: emits one row per sampled
  frame index (UDTF-style explode inside the kernel)
- :func:`audio_windows` — fixed-length windowing over audio samples:
  (start_ms, end_ms) rows per clip
"""

from __future__ import annotations

import hashlib
import struct
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAGIC = b"MMv1"
KINDS = ("image", "audio", "video")
HEADER = struct.Struct("4sBxxxii")  # magic, kind, a, b


def encode_payload(kind: str, a: int, b: int, body: bytes) -> bytes:
    """Synthetic-codec container: header(kind, dims/rate) + body bytes."""
    return HEADER.pack(MAGIC, KINDS.index(kind), a, b) + body


def decode_header(payload: bytes) -> tuple[str, int, int, bytes]:
    magic, kind, a, b = HEADER.unpack_from(payload)
    if magic != MAGIC:
        raise ValueError("not a synthetic-codec payload")
    return KINDS[kind], a, b, payload[HEADER.size:]


def attach_media(docs: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text") -> DataFrame:
    """Deterministic media table derived from a text corpus:
    (id, kind, payload binary, meta struct). kind cycles by id; dims/rates
    derive from the text length, body = utf-8 text bytes."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col]
            texts = pdf[text_col].fillna("")
            kinds, payloads, a_, b_ = [], [], [], []
            for i, t in zip(ids, texts):
                kind = KINDS[int(i) % 3]
                body = t.encode("utf-8")
                if kind == "image":      # width, height from text length
                    a, b = 32 + len(body) % 480, 32 + (len(body) * 7) % 360
                elif kind == "audio":    # sample rate, duration_ms
                    a, b = 16000, 200 + (len(body) * 13) % 9800
                else:                    # fps, n_frames
                    a, b = 25, 10 + len(body) % 240
                kinds.append(kind)
                payloads.append(encode_payload(kind, a, b, body))
                a_.append(a)
                b_.append(b)
            yield pd.DataFrame({id_col: ids, "kind": kinds,
                                "payload": payloads, "a": a_, "b": b_})

    out = docs.select(id_col, text_col).mapInPandas(
        kernel, schema=f"{id_col} long, kind string, payload binary, a int, b int")
    return out.select(
        id_col, "kind", "payload",
        F.struct(F.col("a"), F.col("b")).alias("meta"))


def media_stats(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """(id, kind, n_bytes, body_md5) — JVM-side where possible; the body
    digest skips the header so it equals md5(original text bytes)."""
    hdr = HEADER.size
    return media.select(
        id_col, "kind",
        F.length("payload").alias("n_bytes"),
        F.md5(F.expr(f"substring(payload, {hdr + 1}, length(payload))"))
        .alias("body_md5"))


def resize_images(media: DataFrame, target_width: int = 64,
                  id_col: str = "doc_id",
                  decode_fn: Callable | None = None) -> DataFrame:
    """Resize plumbing: exact output-dimension arithmetic + a per-item
    digest of the (stub-)resized content. ``decode_fn(payload) -> ndarray``
    plugs a real decoder; default = synthetic codec."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for i, payload in zip(pdf[id_col], pdf["payload"]):
                kind, w, h, body = decode_header(bytes(payload))
                if kind != "image":
                    continue
                out_w = target_width
                # floor(x + 0.5): identical in SQL (ROUND half-away) and
                # here — Python round() would banker's-round .5 cases
                out_h = max(1, int(h * target_width / w + 0.5))
                if decode_fn is not None:  # pragma: no cover - real codec
                    arr = decode_fn(bytes(payload))
                    digest = hashlib.md5(arr.tobytes()).hexdigest()
                else:
                    digest = hashlib.md5(
                        body + f"|{out_w}x{out_h}".encode()).hexdigest()
                rows.append((int(i), w, h, out_w, out_h, digest))
            yield pd.DataFrame(rows or None, columns=[
                id_col, "width", "height", "out_width", "out_height",
                "resized_md5"])

    return media.where(F.col("kind") == "image").select(id_col, "payload") \
        .mapInPandas(kernel, schema=f"{id_col} long, width int, height int, "
                                    "out_width int, out_height int, "
                                    "resized_md5 string")


def sample_frames(media: DataFrame, every_n: int = 10,
                  id_col: str = "doc_id") -> DataFrame:
    """Video frame sampling: one output row per sampled frame (frame_idx,
    timestamp_ms) — the UDTF-ish explode shape real decoders need."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, fidx, ts = [], [], []
            for i, payload in zip(pdf[id_col], pdf["payload"]):
                kind, fps, n_frames, _ = decode_header(bytes(payload))
                if kind != "video":
                    continue
                for f in range(0, n_frames, every_n):
                    ids.append(int(i))
                    fidx.append(f)
                    ts.append(int(f * 1000 / fps))
            yield pd.DataFrame({id_col: pd.Series(ids, dtype="int64"),
                                "frame_idx": pd.Series(fidx, dtype="int32"),
                                "ts_ms": pd.Series(ts, dtype="int64")})

    return media.where(F.col("kind") == "video").select(id_col, "payload") \
        .mapInPandas(kernel, schema=f"{id_col} long, frame_idx int, ts_ms long")


def audio_windows(media: DataFrame, window_ms: int = 1000,
                  id_col: str = "doc_id") -> DataFrame:
    """Fixed windows over audio clips: (start_ms, end_ms) per window."""
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, s_, e_ = [], [], []
            for i, payload in zip(pdf[id_col], pdf["payload"]):
                kind, _rate, dur_ms, _ = decode_header(bytes(payload))
                if kind != "audio":
                    continue
                for s in range(0, dur_ms, window_ms):
                    ids.append(int(i))
                    s_.append(s)
                    e_.append(min(s + window_ms, dur_ms))
            yield pd.DataFrame({id_col: pd.Series(ids, dtype="int64"),
                                "start_ms": pd.Series(s_, dtype="int64"),
                                "end_ms": pd.Series(e_, dtype="int64")})

    return media.where(F.col("kind") == "audio").select(id_col, "payload") \
        .mapInPandas(kernel, schema=f"{id_col} long, start_ms long, end_ms long")
