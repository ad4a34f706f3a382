"""Boilerplate removal — block-level main-content extraction from HTML.

Web-text corpora (C4, CCNet, RefinedWeb, Dolma) do not train on raw
page text: navigation bars, footers, cookie banners and link farms are
stripped FIRST, by classifying each block-level segment of the page and
keeping only content-like blocks. This is the jusText/Readability family
of heuristics (Pomikálek 2011: block segmentation + length and link-
density features); the implementation here is a deterministic, documented
subset — no context-passing reclassification, no stopword-list feature —
so the same inputs always yield the same bytes on any host:

1. Drop ``<script>/<style>`` bodies and HTML comments.
2. Segment on block-level tags (the same tag list the HTML→text extractor
   treats as line breaks — one source of truth in ``sources/webpages``).
3. Per block: text (inline tags stripped, entities unescaped, whitespace
   collapsed) and ``link density`` = anchor-text chars / total chars,
   computed BEFORE tag stripping.
4. A block is content iff ``word_count >= min_words`` (default 10) and
   ``link_density <= max_link_density`` (default 0.30). A navbar is
   link-dense however long; a footer is short however link-free.

``main_content`` is the newline-join of content blocks, so the output is
a drop-in replacement for the raw extracted ``text`` column everywhere
downstream (indexing, dedup, quality scoring).

Departures from full jusText, on purpose: no NEAR-GOOD context promotion
(their para-context rules need two passes and a stopword list; measured
gains are small next to the length+link-density core), no per-language
stopword density. The thresholds are parameters, not constants baked in.

Scale shape: one Arrow pass over the page stream (mapInPandas), no
shuffle, no driver state — the classifier is a pure per-row function, so
it fuses with whatever scan/filter precedes it and parallelizes to any
executor count.

No reference analogue (patapsco ingests pre-extracted jsonl); this is
part of the north star's Common-Crawl ingestion framing, next to
``sources/webpages.py``'s exact extractor.
"""

from __future__ import annotations

import html as _html
import re
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

# one source of truth for what counts as a block boundary
from ..sources.webpages import _BLOCK_TAGS, _RE_COMMENT, _RE_SCRIPT, _RE_SPACES

_RE_BLOCK_SPLIT = re.compile(rf"</?(?:{_BLOCK_TAGS})\b[^>]*>", re.I)
_RE_ANCHOR = re.compile(r"<a\s[^>]*>(.*?)</a\s*>", re.I | re.S)
_RE_TAG = re.compile(r"<[^>]+>")


def _block_text(seg: str) -> str:
    """Inline-tag strip + entity unescape + whitespace collapse."""
    s = _RE_TAG.sub(" ", seg)
    s = _html.unescape(s)
    return _RE_SPACES.sub(" ", s.replace("\n", " ")).strip()


def classify_blocks(doc: str, min_words: int = 10,
                    max_link_density: float = 0.30) -> list[tuple[str, bool]]:
    """HTML → [(block_text, is_content)] for every non-empty block, in
    document order. Pure function of the html string and thresholds."""
    s = _RE_SCRIPT.sub(" ", doc)
    s = _RE_COMMENT.sub(" ", s)
    out = []
    for seg in _RE_BLOCK_SPLIT.split(s):
        text = _block_text(seg)
        if not text:
            continue
        link_chars = sum(len(_block_text(m)) for m in _RE_ANCHOR.findall(seg))
        density = link_chars / len(text) if text else 0.0
        good = (len(text.split()) >= min_words
                and density <= max_link_density)
        out.append((text, good))
    return out


def main_content(doc: str, min_words: int = 10,
                 max_link_density: float = 0.30) -> str:
    """HTML → newline-joined content blocks (the boilerplate-free text)."""
    return "\n".join(t for t, good in classify_blocks(
        doc, min_words, max_link_density) if good)


def extract_main_content(pages: DataFrame, url_col: str = "url",
                         html_col: str = "html", min_words: int = 10,
                         max_link_density: float = 0.30) -> DataFrame:
    """(url, html, …) → (url, main_text, n_blocks, n_content_blocks).

    One Arrow pass, no shuffle; ``main_text`` replaces the raw extracted
    text for downstream indexing/dedup/quality, and the block counts feed
    corpus-quality dashboards (pages whose content fraction is ~0 are
    link farms)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts, n_blocks, n_good = [], [], []
            for blob in pdf[html_col]:
                doc = (bytes(blob).decode("utf-8", errors="replace")
                       if isinstance(blob, (bytes, bytearray))
                       else (blob or ""))
                blocks = classify_blocks(doc, min_words, max_link_density)
                texts.append("\n".join(t for t, g in blocks if g))
                n_blocks.append(len(blocks))
                n_good.append(sum(1 for _, g in blocks if g))
            yield pd.DataFrame({
                "url": pdf[url_col], "main_text": texts,
                "n_blocks": pd.Series(n_blocks, dtype="int32"),
                "n_content_blocks": pd.Series(n_good, dtype="int32")})

    return pages.select(url_col, html_col).mapInPandas(
        run, schema=("url string, main_text string, "
                     "n_blocks int, n_content_blocks int"))
