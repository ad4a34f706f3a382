"""Example plugin kernels demonstrating the ``plugin:module.attr`` contract
for install-gated tokenizers/stemmers (T6/T7/T9/T10/T12).

The reference loads sacremoses/jieba/stanza/spacy/parsivar when installed
(/root/reference/patapsco/text.py:98-133,163-243,344-386); this engine gates
them behind the same config names and lets a user wire any batch kernel via

    TextConfig(tokenize="plugin:patapsco_spark.testing.comma_tokenizer",
               stem="plugin:patapsco_spark.testing.suffix_stemmer")

The module holding the kernel must be importable on executors (ship it with
``spark-submit --py-files``, like the engine package itself). A kernel is a
pandas ``Series → Series`` function; mark it ``takes_lang = True`` to receive
the language code first (factory form), mirroring the reference's per-lang
model loading.
"""

from __future__ import annotations

import pandas as pd


def comma_tokenizer(s: pd.Series) -> pd.Series:
    """Series[str] → Series[list[str]]: split on commas (deliberately NOT
    whitespace so tests can prove this kernel, not the default, ran)."""
    return s.fillna("").map(lambda t: [x for x in t.split(",") if x])


def suffix_stemmer(s: pd.Series) -> pd.Series:
    """Series[list[str]] → Series[list[str]]: strip one trailing 'x'."""
    return s.map(lambda toks: [t[:-1] if t.endswith("x") else t for t in toks])


def lang_tagging_tokenizer(lang: str):
    """Factory form (``takes_lang``): tokens prefixed with the language code,
    proving per-lang factory resolution inside the executor kernel."""
    def kernel(s: pd.Series) -> pd.Series:
        return s.fillna("").map(lambda t: [f"{lang}:{x}" for x in t.split()])
    return kernel


lang_tagging_tokenizer.takes_lang = True
