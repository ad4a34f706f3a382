"""Tokenizers as batch (pandas Series) kernels.

Semantics source: /root/reference/patapsco/text.py:93-160.

- ``whitespace``: Python ``str.split()`` — split on runs of *Unicode*
  whitespace, drop empties. Note Spark's ``F.split(col, r'\\s+')`` is NOT
  equivalent (JVM regex whitespace class differs on Unicode spaces and
  leading separators produce an empty first token), so we stay in pandas.
- ``ngram``: character n-grams, n=2 for CJK (zho/jpn/kor) else 5. The
  reference additionally sentence-segments with spaCy before n-gramming;
  spaCy is not available here, so we n-gram over newline-delimited segments
  (a documented approximation, gated by config).
- ``moses`` / ``jieba`` / ``stanza`` / ``spacy`` tokenizers require external
  models/packages not present in this environment; they raise a clear
  NotImplementedError at construction while keeping the config surface.
"""

from __future__ import annotations

import pandas as pd

CJK_LANGS = {"zho", "jpn", "kor"}


def whitespace_tokenize_series(s: pd.Series) -> pd.Series:
    """Series[str] → Series[list[str]] with Python str.split semantics."""
    # pandas .str.split() with no pattern == Python str.split(): Unicode
    # whitespace runs, no empty tokens.
    return s.fillna("").str.split()


def ngram_tokenize_series(s: pd.Series, lang: str) -> pd.Series:
    n = 2 if lang in CJK_LANGS else 5

    def grams(text: str) -> list[str]:
        out = []
        for seg in text.split("\n"):
            out.extend(seg[i : i + n] for i in range(len(seg) - n + 1))
        return out

    return s.fillna("").map(grams)


def load_plugin_kernel(spec: str, lang: str):
    """Resolve a ``plugin:module.attr`` config value to a batch kernel.

    The attr must be either the kernel itself (``Series → Series``) or, if
    it is marked with ``takes_lang = True``, a factory ``lang → kernel``.
    Resolution happens lazily INSIDE the Arrow kernel on each executor, so
    the plugin module only needs to be importable there (ship it exactly
    like the engine package: ``spark-submit --py-files``) — the config
    string stays JSON-serializable for manifests/resume. This is the
    engine's analogue of the reference's optional tokenizer/stemmer
    packages (/root/reference/patapsco/text.py:98-133,344-386), which it
    loads only when installed."""
    import importlib

    path = spec.split(":", 1)[1]
    mod, _, attr = path.rpartition(".")
    if not mod:
        raise ValueError(f"plugin spec '{spec}' must be 'plugin:module.attr'")
    fn = getattr(importlib.import_module(mod), attr)
    return fn(lang) if getattr(fn, "takes_lang", False) else fn


def make_tokenizer(name: str, lang: str):
    """Return Series[str] → Series[list[str]] for the configured tokenizer."""
    if name == "whitespace":
        return whitespace_tokenize_series
    if name == "ngram":
        return lambda s: ngram_tokenize_series(s, lang)
    if name == "cjk_bigram":
        # in-repo dictionary+bigram CJK kernel (kernels/cjk.py) — the
        # dependency-free stand-in for jieba, also reachable as
        # plugin:patapsco_spark.kernels.cjk_bigram_tokenizer
        from ..kernels.cjk import cjk_bigram_tokenizer
        return cjk_bigram_tokenizer(lang)
    if name == "moses_lite":
        # in-repo Moses-rule kernel (kernels/moses.py) — the dependency-free
        # stand-in for sacremoses, also reachable as
        # plugin:patapsco_spark.kernels.moses_lite_tokenizer
        from ..kernels.moses import moses_lite_tokenizer
        return moses_lite_tokenizer(lang)
    if name.startswith("plugin:"):
        return load_plugin_kernel(name, lang)
    if name in ("moses", "jieba", "stanza", "spacy"):
        raise NotImplementedError(
            f"tokenizer '{name}' needs external models/packages not present in "
            "this environment; wire your own Series[str]->Series[list[str]] "
            "kernel with tokenize='plugin:your_module.your_tokenizer' "
            "(same contract; module must be importable on executors)"
            + ("; for Chinese, the in-repo tokenize='cjk_bigram' kernel "
               "(dictionary forward-maximum-matching + bigram fallback) "
               "works without external packages" if name == "jieba" else "")
            + ("; the in-repo tokenize='moses_lite' kernel (Moses rule "
               "pipeline, no sentence model) works without external "
               "packages" if name == "moses" else "")
        )
    raise ValueError(f"unknown tokenizer: {name}")
