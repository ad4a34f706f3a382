"""The document/query analysis chain as one vectorized kernel.

Pipeline order is load-bearing and mirrors the reference exactly
(/root/reference/patapsco/docs.py:236-258):

    pre_normalize → tokenize → identify stopword indices (on unstemmed
    tokens) → stem → remove stopwords by index → lowercase

The reference lowercases the space-joined string; we lowercase token-wise,
which is equivalent under whitespace tokenization (lowercasing never
introduces whitespace). The same chain processes queries
(/root/reference/patapsco/topics.py:338-359) — a strict-check in the
reference guarantees docs and queries share one config (job.py:952-962).

Exposed as:
- :func:`analyze_tokens_batch` — pandas-level kernel (testable w/o Spark)
- :func:`analyze_documents`   — Spark wrapper producing
  ``(id, lang, terms, dl[, original_text][, term_pos])``

IPC note (round-5 hot-path work): for the default chain (whitespace
tokenize + lowercase, no stopwords, no stemmer) every printable-ASCII row
is processed **entirely JVM-side** (:func:`_analyze_catalyst`) — the
pre-normalization chain provably reduces to space-run collapapse on that
character class (fix_encoding is identity below 0x80, there are no control
or format chars in \\x20-\\x7E+\\n, ASCII is NFC-invariant, and JVM
``lower``/``split`` agree with CPython on ASCII). Only rows containing
anything outside ``[\\x20-\\x7E\\n]`` cross the Arrow boundary into the
pandas kernel. Byte-identity of the two routes is pinned by
tests/test_fast_path.py on a corpus mixing both classes.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from ..config import TextConfig
from .normalize import pre_normalize_series
from .stem import make_stemmer
from .stopwords import identify_stopword_indices, load_stopwords, remove_by_index
from .tokenize import make_tokenizer


def analyze_tokens_batch(text: pd.Series, cfg: TextConfig, lang: str = "eng",
                         pre_normalized: bool = False,
                         with_positions: bool = False):
    """Series[str] raw text → Series[list[str]] final index terms.

    ``pre_normalized=True`` skips the pre-normalization pass (caller already
    ran it — avoids normalizing twice when the normalized text is also kept
    as a column).

    ``with_positions=True`` returns ``(terms, positions)`` where positions
    carries each kept token's PRE-REMOVAL index in the tokenized stream —
    Lucene's position-increment semantics (StopFilter leaves a gap where a
    stopword was removed, so PhraseQuery "data stream" does NOT match
    "data the stream"). ``positions`` is None when the chain cannot drop
    tokens (then positions ≡ 0..n-1 and the caller may use an arange)."""
    tokenizer = make_tokenizer(cfg.tokenize, lang)
    stemmer = make_stemmer(cfg.stem, lang) if (cfg.stem is None or lang == "eng" or cfg.stem != "porter") else None
    stops = None
    if cfg.stopwords:
        try:
            stops = load_stopwords(cfg.stopwords, lang, cfg.stopword_dir)
        except (ValueError, OSError):
            # no list shipped for this language and no resource dir given —
            # treat as "no stopwords" rather than failing the whole batch
            stops = None

    normed = text if pre_normalized else pre_normalize_series(text)

    # fast path: whitespace tokenize + lowercase only. Lowering the whole
    # string before splitting is equivalent to lowering each token (Python
    # str.lower never introduces or removes whitespace for any codepoint
    # that str.split treats as a separator), and runs as two vectorized
    # pandas string ops instead of a per-token Python loop.
    if (cfg.tokenize == "whitespace" and stops is None and stemmer is None
            and cfg.lowercase):
        out = normed.str.lower().str.split()
        return (out, None) if with_positions else out

    tokens = tokenizer(normed)
    positions: pd.Series | None = None

    if stops is not None:
        if with_positions:
            def proc_pos(toks: list[str]) -> tuple[list[str], list[int]]:
                idx = identify_stopword_indices(toks, stops)
                drop = set(idx)
                stemmed = _stem_list(stemmer, toks) if stemmer is not None else toks
                return (remove_by_index(stemmed, idx),
                        [i for i in range(len(toks)) if i not in drop])
            pairs = tokens.map(proc_pos)
            tokens = pairs.map(lambda p: p[0])
            positions = pairs.map(lambda p: p[1])
        elif stemmer is not None:
            def proc(toks: list[str]) -> list[str]:
                idx = identify_stopword_indices(toks, stops)
                return remove_by_index(_stem_list(stemmer, toks), idx)
            tokens = tokens.map(proc)
        else:
            tokens = tokens.map(
                lambda toks: remove_by_index(toks, identify_stopword_indices(toks, stops))
            )
    elif stemmer is not None:
        tokens = stemmer(tokens)

    if cfg.lowercase:
        tokens = tokens.map(lambda toks: [t.lower() for t in toks])
    return (tokens, positions) if with_positions else tokens


def _stem_list(stemmer, tokens: list[str]) -> list[str]:
    # stemmer operates on a Series of token lists; reuse it on a single list
    return stemmer(pd.Series([tokens])).iloc[0]


def analyze_batch(pdf: pd.DataFrame, cfg: TextConfig, id_col: str = "id",
                  text_col: str = "text", lang_col: str | None = "lang",
                  with_positions: bool = False,
                  store_raw: bool = True) -> pd.DataFrame:
    """Full analysis of one Arrow batch → analyzed-docs rows.

    Rejects over-long documents (reference MAX_TEXT_LEN, docs.py:245-247) by
    dropping them; callers count rejects via ``df.observe``/filters upstream.
    Language-gated processing: batches may mix languages; we group by lang so
    each group runs its language's tokenizer/stopword list.
    ``with_positions=True`` adds a ``term_pos`` column of each kept token's
    pre-removal stream index (Lucene position increments — see
    :func:`analyze_tokens_batch`).
    """
    keep = pdf[text_col].fillna("").str.len() <= cfg.max_text_len
    pdf = pdf[keep]
    out_parts = []
    if lang_col is not None and lang_col in pdf.columns:
        groups = pdf.groupby(lang_col, sort=False, dropna=False)
    else:
        groups = [("eng", pdf)]
    for lang, grp in groups:
        if grp.empty:
            continue
        lang = lang if isinstance(lang, str) and lang else "eng"
        normed = pre_normalize_series(grp[text_col])
        got = analyze_tokens_batch(normed, cfg, lang=_lang_key(lang),
                                   pre_normalized=True,
                                   with_positions=with_positions)
        if with_positions:
            terms, poss = got
            if poss is None:  # nothing removable: positions ≡ 0..n-1
                poss = terms.map(lambda t: list(range(len(t))))
        else:
            terms = got
        part = pd.DataFrame({
            "id": grp[id_col].astype(str),
            "lang": lang,
            "terms": terms,
            "dl": terms.map(len).astype("int64"),
        })
        if store_raw:
            part["original_text"] = normed
        if with_positions:
            part["term_pos"] = poss.to_numpy()
        out_parts.append(part)
    if not out_parts:
        empty = pd.DataFrame({
            "id": pd.Series(dtype=str), "lang": pd.Series(dtype=str),
            "terms": pd.Series(dtype=object), "dl": pd.Series(dtype="int64"),
        })
        if store_raw:
            empty["original_text"] = pd.Series(dtype=str)
        if with_positions:
            empty["term_pos"] = pd.Series(dtype=object)
        return empty
    return pd.concat(out_parts, ignore_index=True)


_LANG_ALIASES = {
    "en": "eng", "ru": "rus", "zh": "zho", "fa": "fas", "ar": "ara",
    "ko": "kor", "es": "spa", "he": "heb", "id": "ind", "de": "deu", "fr": "fra",
}


def _lang_key(lang: str) -> str:
    """ISO 639-1 → 639-3 for the languages the reference registers
    (LangStandardizer, /root/reference/patapsco/util/__init__.py:322-356)."""
    return _LANG_ALIASES.get(lang, lang)


def analyzed_schema(with_positions: bool = False,
                    store_raw: bool = True) -> str:
    s = "id string, lang string, terms array<string>, dl long"
    if store_raw:
        s += ", original_text string"
    if with_positions:
        s += ", term_pos array<int>"
    return s


# kept for import compatibility (round ≤4 name); proc_text was dropped in
# round 5 — it had zero consumers and doubled the Python→JVM Arrow bytes
ANALYZED_SCHEMA = analyzed_schema()
ANALYZED_SCHEMA_POS = analyzed_schema(with_positions=True)

# the character class on which the JVM chain is provably byte-identical to
# the Python chain: printable ASCII + newline. \A..\z (not ^..$): Java $
# also matches before a trailing \r (a line terminator to Java but not to
# Python re), which would mis-route "abc\r" into the fast path.
_FAST_ASCII_RE = "\\A[\\x20-\\x7E\\n]*\\z"


def catalyst_fast_eligible(cfg: TextConfig) -> bool:
    """True when the configured chain is whitespace tokenize + lowercase
    only — the chain :func:`_analyze_catalyst` reproduces exactly on
    printable-ASCII rows. Stopword removal / stemming / other tokenizers
    always route through the pandas kernel."""
    return (cfg.tokenize == "whitespace" and cfg.stem is None
            and cfg.stopwords is None and cfg.lowercase)


def _analyze_catalyst(df, cfg: TextConfig, id_col: str, text_col: str,
                      lang_col: str | None, with_positions: bool,
                      store_raw: bool):
    """Pure-Catalyst analysis of printable-ASCII rows (default chain only).

    On ``[\\x20-\\x7E\\n]*`` the reference chain reduces to: collapse
    space runs → split on whitespace → lowercase. All three agree between
    JVM and CPython on this class (test_fast_path pins it), so these rows
    never cross the Arrow boundary — whole-stage-codegen instead of a
    Python worker round trip.
    """
    from pyspark.sql import functions as F

    text = F.coalesce(F.col(text_col), F.lit(""))
    normed = F.regexp_replace(text, " +", " ")
    toks = F.split(F.lower(normed), "[ \n]+")
    terms = F.filter(toks, lambda x: x != F.lit(""))
    lang = (F.lit("eng") if lang_col is None or lang_col not in df.columns
            else F.coalesce(F.nullif(F.col(lang_col), F.lit("")), F.lit("eng")))
    out = [F.col(id_col).cast("string").alias("id"), lang.alias("lang"),
           terms.alias("terms"), F.size(terms).cast("long").alias("dl")]
    if store_raw:
        out.append(normed.alias("original_text"))
    if with_positions:
        dl = F.size(terms)
        out.append(
            F.when(dl > 0, F.sequence(F.lit(0), dl - F.lit(1)))
             .otherwise(F.array().cast("array<int>")).alias("term_pos"))
    return df.select(*out)


def analyze_documents(df, cfg: TextConfig, id_col: str = "id",
                      text_col: str = "text", lang_col: str | None = "lang",
                      batch_transform=None, extra_cols: tuple[str, ...] = (),
                      with_positions: bool = False, store_raw: bool = True,
                      allow_catalyst: bool = True):
    """Spark DataFrame of raw docs → analyzed docs.

    Default chain + ``allow_catalyst``: rows are routed by an ASCII
    predicate — printable-ASCII rows run entirely in Catalyst (zero Arrow
    traffic), the rest through the Arrow-batched pandas kernel, unioned
    back. The source is scanned once per branch (the predicate can't
    prune at the parquet level), a deliberate trade: a second columnar
    decode is far cheaper than shipping every row across the JVM↔Python
    boundary — the measured ceiling on this host and the per-row cost
    that survives a 1000-executor scale-up.

    Other chains: one Arrow-batched pass; no per-row Python UDFs.
    ``batch_transform`` (a pandas DataFrame → DataFrame function, e.g.
    html→text extraction) is FUSED into the pandas kernel when the whole
    batch needs Python anyway; under the Catalyst fast path it runs as an
    extraction-only kernel (minimal output: id, lang, text) so the
    analysis itself still happens JVM-side. ``extra_cols`` are additional
    input columns the transform needs. ``store_raw=False`` drops the
    ``original_text`` column — the pure-index build (the reference's doc
    database is a separate task, index.py vs database.py) then ships only
    the term arrays back from Python.
    """
    schema = analyzed_schema(with_positions, store_raw)

    if allow_catalyst and catalyst_fast_eligible(cfg):
        if batch_transform is not None:
            df = _transform_only(df, batch_transform, id_col, text_col,
                                 lang_col, extra_cols)
        from pyspark.sql import functions as F
        is_ascii = F.coalesce(F.col(text_col), F.lit("")).rlike(_FAST_ASCII_RE)
        fast = _analyze_catalyst(
            df.where(is_ascii &
                     (F.length(F.coalesce(F.col(text_col), F.lit("")))
                      <= cfg.max_text_len)),
            cfg, id_col, text_col, lang_col, with_positions, store_raw)
        slow_src = df.where(~is_ascii)

        def run_slow(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                yield analyze_batch(pdf, cfg, id_col=id_col, text_col=text_col,
                                    lang_col=lang_col,
                                    with_positions=with_positions,
                                    store_raw=store_raw)

        cols = [c for c in (id_col, text_col, lang_col) if c and c in df.columns]
        slow = slow_src.select(*cols).mapInPandas(run_slow, schema=schema)
        return fast.unionByName(slow)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if batch_transform is not None:
                pdf = batch_transform(pdf)
            yield analyze_batch(pdf, cfg, id_col=id_col, text_col=text_col,
                                lang_col=lang_col,
                                with_positions=with_positions,
                                store_raw=store_raw)

    cols = [c for c in (id_col, text_col, lang_col, *extra_cols)
            if c and c in df.columns]
    return df.select(*cols).mapInPandas(run, schema=schema)


def _transform_only(df, batch_transform, id_col: str, text_col: str,
                    lang_col: str | None, extra_cols: tuple[str, ...]):
    """Run ``batch_transform`` (e.g. html→text) as an extraction-only
    kernel emitting the minimal ``(id, lang, text)`` columns — the Arrow
    return payload is just the extracted text, and the analysis chain
    downstream stays JVM-side for ASCII rows."""
    out_cols = [id_col] + ([lang_col] if lang_col and lang_col in df.columns
                           else []) + [text_col]
    schema = ", ".join(f"`{c}` string" for c in out_cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            got = batch_transform(pdf)
            out = pd.DataFrame({c: got[c].astype(str) if c == id_col
                                else got[c] for c in out_cols})
            yield out

    in_cols = [c for c in (id_col, text_col, lang_col, *extra_cols)
               if c and c in df.columns]
    return df.select(*in_cols).mapInPandas(run, schema=schema)
