"""In-repo lemma_lite English lemmatizer (round-5 breadth: narrows the
stanza/spaCy neural-lemmatization gate T9/T10 from "plugin contract
proven" to "kernel included", the round-4 moses_lite/parsivar_lite move).
Unit semantics, registration/plugin parity, config gates, and
index→retrieve end-to-end."""

import pandas as pd
import pytest

from patapsco_spark.config import (ConfigError, IndexConfig, RetrieveConfig,
                                   TextConfig)
from patapsco_spark.functions.stem import make_stemmer
from patapsco_spark.kernels.lemma import lemma_lite, lemma_tokens
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.retrieve import search_texts


class TestLemmaRules:
    def test_irregular_verbs(self):
        assert lemma_lite("went") == "go"
        assert lemma_lite("thought") == "think"
        assert lemma_lite("made") == "make"
        assert lemma_lite("was") == "be"
        assert lemma_lite("are") == "be"
        assert lemma_lite("has") == "have"
        assert lemma_lite("used") == "use"

    def test_irregular_nouns(self):
        assert lemma_lite("children") == "child"
        assert lemma_lite("feet") == "foot"
        assert lemma_lite("criteria") == "criterion"
        assert lemma_lite("analyses") == "analysis"
        assert lemma_lite("movies") == "movie"
        assert lemma_lite("shoes") == "shoe"

    def test_possessive_strip_survives_fallthrough(self):
        # regression: "table's" matched no suffix rule after the 's strip
        # and the fall-through returned the ORIGINAL token, so whether a
        # possessive was stripped depended arbitrarily on the stem's shape
        assert lemma_lite("table's") == "table"
        assert lemma_lite("company's") == "company"
        assert lemma_lite("bob's") == "bob"          # short-stem early path
        assert lemma_lite("children's") == "child"   # strip, then irregular
        assert lemma_lite("women's") == "woman"

    def test_plural_detachment(self):
        assert lemma_lite("studies") == "study"
        assert lemma_lite("classes") == "class"
        assert lemma_lite("houses") == "house"      # ses→+e, not ses→s
        assert lemma_lite("sizes") == "size"
        assert lemma_lite("beaches") == "beach"
        assert lemma_lite("dishes") == "dish"
        assert lemma_lite("boxes") == "box"
        assert lemma_lite("heroes") == "hero"
        assert lemma_lite("wolves") == "wolf"
        # regression: blanket ves->f mangled the -ve verb class
        assert lemma_lite("moves") == "move"
        assert lemma_lite("gives") == "give"
        assert lemma_lite("believes") == "believe"
        assert lemma_lite("shelves") == "shelf"
        assert lemma_lite("knives") == "knife"
        assert lemma_lite("women") == "woman"
        assert lemma_lite("dogs") == "dog"
        assert lemma_lite("toes") == "toe"          # len<6 skips oes→o

    def test_verbal_detachment_porter_restoration(self):
        assert lemma_lite("making") == "make"       # CVC e-restore
        assert lemma_lite("running") == "run"       # de-double
        assert lemma_lite("hoping") == "hope"
        assert lemma_lite("hoped") == "hope"
        assert lemma_lite("stopped") == "stop"
        assert lemma_lite("falling") == "fall"      # ll never de-doubled
        assert lemma_lite("guessing") == "guess"
        assert lemma_lite("studying") == "study"    # ying→y
        assert lemma_lite("studied") == "study"     # ied→y
        assert lemma_lite("created") == "create"    # at→+e
        assert lemma_lite("going") == "go"
        assert lemma_lite("having") == "have"

    def test_guards(self):
        # vowel-in-stem guard: ing/ed words that are not inflections
        assert lemma_lite("thing") == "thing"
        assert lemma_lite("bring") == "bring"
        # no-change set and suffix guards
        assert lemma_lite("news") == "news"
        assert lemma_lite("series") == "series"
        assert lemma_lite("during") == "during"
        assert lemma_lite("this") == "this"
        assert lemma_lite("physics") == "physics"
        assert lemma_lite("glass") == "glass"       # ss guard
        assert lemma_lite("status") == "status"     # us guard
        assert lemma_lite("basis") == "basis"       # is guard
        # iest len guard (priest) and the deliberate no-strip of bare er/est
        assert lemma_lite("happiest") == "happy"
        assert lemma_lite("priest") == "priest"
        assert lemma_lite("water") == "water"
        assert lemma_lite("soldier") == "soldier"

    def test_token_list_and_cache_idempotent(self):
        toks = ["The", "children", "were", "running"]
        assert lemma_tokens(toks) == ["The", "child", "be", "run"]
        assert lemma_tokens(toks) == ["The", "child", "be", "run"]


class TestRegistration:
    def test_factory_and_plugin_parity(self):
        k1 = make_stemmer("lemma_lite", "eng")
        k2 = make_stemmer(
            "plugin:patapsco_spark.kernels.lemma_lite_lemmatizer", "eng")
        s = pd.Series([["children", "running"], None])
        for k in (k1, k2):
            out = k(s)
            assert list(out.iloc[0]) == ["child", "run"]
            assert list(out.iloc[1]) == []

    def test_lang_gate(self):
        with pytest.raises(ValueError):
            make_stemmer("lemma_lite", "fas")
        with pytest.raises(ConfigError):
            TextConfig(stem="lemma_lite").validate("zho")
        TextConfig(stem="lemma_lite").validate("eng")

    def test_spacy_gate_mentions_lite(self):
        with pytest.raises(NotImplementedError, match="lemma_lite"):
            make_stemmer("spacy", "eng")


class TestEndToEnd:
    def test_index_and_retrieve_lemmatized(self, spark, tmp_path):
        """Docs indexed with whitespace + lemma_lite; queries whose surface
        forms differ from the docs (plural / inflected / irregular) must
        match through the shared lemma — the full T9/T10-lite path."""
        cfg = TextConfig(tokenize="whitespace", stem="lemma_lite",
                         stopwords=None, lowercase=True)
        docs = spark.createDataFrame([
            ("d1", "the children were running to school", "eng"),
            ("d2", "wolves hunt in packs at night", "eng"),
            ("d3", "she thought about the analyses all day", "eng"),
        ], "id string, text string, lang string")
        idx = str(tmp_path / "lidx")
        build_index(spark, docs, idx, IndexConfig(text=cfg, num_shards=2),
                    resume=False)
        for qtext, want in [("child runs", "d1"), ("wolf pack", "d2"),
                            ("think analysis", "d3")]:
            res = search_texts(spark, idx, [("q", qtext)],
                               RetrieveConfig(k=3), text_cfg=cfg, lang="eng")
            rows = res.collect()
            assert rows and rows[0]["doc_id"] == want, qtext
