"""Contract tests for install-gated tokenizer/stemmer plug-ins (T6/T7/T9/
T10/T12): a user-supplied ``plugin:module.attr`` kernel must flow through
``analyze_documents`` and retrieval end-to-end, resolved lazily on executors.

Reference behavior being modeled: patapsco's TokenizerStemmerFactory
constructs sacremoses/jieba/stanza/spacy/parsivar kernels when installed
(/root/reference/patapsco/text.py:430-524; tests/test_text.py:143-334). The
packages are absent from this container — same as a bare reference install —
so these tests prove the gating contract with stand-in kernels instead.
"""

import pandas as pd
import pytest

from patapsco_spark.config import ConfigError, IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.functions.analyze import analyze_tokens_batch
from patapsco_spark.functions.stem import make_stemmer
from patapsco_spark.functions.tokenize import make_tokenizer
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.retrieve import search_texts

PLUG_TOK = "plugin:patapsco_spark.testing.comma_tokenizer"
PLUG_STEM = "plugin:patapsco_spark.testing.suffix_stemmer"
PLUG_TOK_LANG = "plugin:patapsco_spark.testing.lang_tagging_tokenizer"


def test_gated_names_raise_with_plugin_pointer():
    for name in ("moses", "jieba", "stanza", "spacy"):
        with pytest.raises(NotImplementedError, match="plugin:"):
            make_tokenizer(name, "zho")
    for name in ("parsivar", "stanza", "spacy"):
        with pytest.raises(NotImplementedError, match="plugin:"):
            make_stemmer(name, "fas")


def test_plugin_tokenizer_batch_kernel():
    cfg = TextConfig(tokenize=PLUG_TOK, stem=None, stopwords=None, lowercase=False)
    out = analyze_tokens_batch(pd.Series(["a,b two words,c"]), cfg, lang="zho")
    assert list(out.iloc[0]) == ["a", "b two words", "c"]


def test_plugin_stemmer_batch_kernel():
    cfg = TextConfig(tokenize="whitespace", stem=PLUG_STEM, stopwords=None,
                     lowercase=True)
    # chain order is stem THEN lowercase (reference docs.py:236-258), so the
    # upper-case 'BOX' is untouched by the suffix stemmer and only lowered
    out = analyze_tokens_batch(pd.Series(["BOX fix nox"]), cfg, lang="fas")
    assert list(out.iloc[0]) == ["box", "fi", "no"]


def test_plugin_factory_receives_lang():
    cfg = TextConfig(tokenize=PLUG_TOK_LANG, stem=None, stopwords=None,
                     lowercase=False)
    out = analyze_tokens_batch(pd.Series(["hello there"]), cfg, lang="rus")
    assert list(out.iloc[0]) == ["rus:hello", "rus:there"]


def test_unknown_plugin_attr_fails_loudly():
    with pytest.raises(AttributeError):
        make_tokenizer("plugin:patapsco_spark.testing.nope", "eng")
    with pytest.raises(ValueError, match="module.attr"):
        make_tokenizer("plugin:nomodulepath", "eng")


def test_plugin_kernels_flow_through_index_and_retrieval(spark, tmp_index):
    """End-to-end: index built with a comma tokenizer + suffix stemmer must
    retrieve on the PLUGIN's terms — 'red fox' is ONE comma-token here, and
    'box' stems to 'bo' — proving the kernels ran inside the executor-side
    analysis, not just driver-side."""
    docs = [
        ("d1", "red fox,box", "zho"),
        ("d2", "red,fox", "zho"),
        ("d3", "box,other", "zho"),
    ]
    df = spark.createDataFrame(docs, "id string, text string, lang string")
    cfg = TextConfig(tokenize=PLUG_TOK, stem=PLUG_STEM, stopwords=None,
                     lowercase=True)
    build_index(spark, df, tmp_index, IndexConfig(text=cfg, num_shards=2))

    # query goes through the same plugin chain: "box" → token ["box"] → "bo"
    res = search_texts(spark, tmp_index, [("q1", "box")],
                       RetrieveConfig(k=10), text_cfg=cfg, lang="zho")
    hits = {r["doc_id"] for r in res.collect()}
    assert hits == {"d1", "d3"}

    # "red fox" is a single comma-token: only d1 has it verbatim
    res2 = search_texts(spark, tmp_index, [("q2", "red fox")],
                        RetrieveConfig(k=10), text_cfg=cfg, lang="zho")
    assert {r["doc_id"] for r in res2.collect()} == {"d1"}


def test_compat_validation_still_applies():
    with pytest.raises(ConfigError):
        TextConfig(tokenize="ngram", stem="porter").validate()
    # plugin names pass the reference compat matrix untouched
    TextConfig(tokenize=PLUG_TOK, stem=PLUG_STEM).validate("zho")
