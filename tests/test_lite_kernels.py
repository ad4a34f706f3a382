"""In-repo moses_lite tokenizer + parsivar_lite Farsi stemmer (round-4
breadth: narrows the sacremoses gate T6 and the parsivar gate T12 from
"plugin contract proven" to "kernel included"). Unit semantics,
registration/plugin parity, config gates, and index→retrieve end-to-end."""

import pandas as pd
import pytest

from patapsco_spark.config import (ConfigError, IndexConfig, RetrieveConfig,
                                   TextConfig)
from patapsco_spark.functions.stem import make_stemmer
from patapsco_spark.functions.tokenize import make_tokenizer
from patapsco_spark.kernels.farsi import farsi_stem
from patapsco_spark.kernels.moses import tokenize_text
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.retrieve import search_texts


class TestMosesRules:
    def test_punct_and_numbers(self):
        assert tokenize_text("Hello, world!") == ["Hello", ",", "world", "!"]
        # comma inside a number is NOT a separator; dollar pads
        assert tokenize_text("I paid $1,000.50 today.") == \
            ["I", "paid", "$", "1,000.50", "today", "."]

    def test_nonbreaking_prefixes_and_acronyms(self):
        assert tokenize_text("Mr. Smith met Dr. Jones.") == \
            ["Mr.", "Smith", "met", "Dr.", "Jones", "."]
        assert tokenize_text("the U.S. and A. agree.") == \
            ["the", "U.S.", "and", "A.", "agree", "."]

    def test_multidot_survives(self):
        assert tokenize_text("wait... what") == ["wait", "...", "what"]

    def test_english_contractions(self):
        assert tokenize_text("it's a test, isn't it?") == \
            ["it", "'s", "a", "test", ",", "isn", "'t", "it", "?"]
        assert tokenize_text("1990's hits") == ["1990", "'s", "hits"]

    def test_romance_elision(self):
        assert tokenize_text("l'eau est froide", "fra") == \
            ["l'", "eau", "est", "froide"]

    def test_quote_apostrophes_pad(self):
        assert tokenize_text("'quoted' text") == ["'", "quoted", "'", "text"]

    def test_hyphens_kept(self):
        assert tokenize_text("state-of-the-art co-design") == \
            ["state-of-the-art", "co-design"]

    def test_series_kernel_and_none(self):
        k = make_tokenizer("moses_lite", "eng")
        out = k(pd.Series(["Hello, world!", None]))
        assert list(out.iloc[0]) == ["Hello", ",", "world", "!"]
        assert list(out.iloc[1]) == []


class TestFarsiStem:
    def test_plurals(self):
        assert farsi_stem("کتابها") == "کتاب"
        assert farsi_stem("کتاب‌ها") == "کتاب"       # ZWNJ-joined
        assert farsi_stem("شهرها") == "شهر"
        assert farsi_stem("اطلاعات") == "اطلاع"

    def test_comparatives(self):
        assert farsi_stem("بزرگتر") == "بزرگ"
        assert farsi_stem("بزرگترین") == "بزرگ"

    def test_fused_plural_possessive(self):
        assert farsi_stem("خانه‌هایمان") == "خانه"
        assert farsi_stem("کتاب‌هایتان") == "کتاب"

    def test_animate_plural_beats_phantom_clitic(self):
        # دوستان = دوست + ان, NOT دوس + تان
        assert farsi_stem("دوستان") == "دوست"
        assert farsi_stem("ایرانیان") == "ایرانی"

    def test_euphonic_gaf(self):
        assert farsi_stem("بندگان") == "بنده"

    def test_short_tokens_untouched(self):
        assert farsi_stem("ما") == "ما"
        assert farsi_stem("کتاب") == "کتاب"


class TestRegistration:
    def test_moses_first_class_and_plugin_agree(self):
        a = make_tokenizer("moses_lite", "eng")
        b = make_tokenizer(
            "plugin:patapsco_spark.kernels.moses_lite_tokenizer", "eng")
        s = pd.Series(["Mr. Smith can't come."])
        assert list(a(s).iloc[0]) == list(b(s).iloc[0])

    def test_farsi_first_class_and_plugin_agree(self):
        a = make_stemmer("parsivar_lite", "fas")
        b = make_stemmer(
            "plugin:patapsco_spark.kernels.parsivar_lite_stemmer", "fas")
        s = pd.Series([["کتابها", "بزرگترین"]])
        assert list(a(s).iloc[0]) == list(b(s).iloc[0]) == ["کتاب", "بزرگ"]

    def test_gated_names_point_here(self):
        with pytest.raises(NotImplementedError, match="moses_lite"):
            make_tokenizer("moses", "eng")
        with pytest.raises(NotImplementedError, match="parsivar_lite"):
            make_stemmer("parsivar", "fas")

    def test_config_gates(self):
        with pytest.raises(ConfigError, match="Farsi"):
            TextConfig(stem="parsivar_lite").validate("eng")
        with pytest.raises(ConfigError, match="zho"):
            TextConfig(tokenize="moses_lite").validate("zho")
        TextConfig(tokenize="moses_lite", stem="parsivar_lite",
                   stopwords=None).validate("fas")
        with pytest.raises(ValueError, match="zho"):
            make_tokenizer("moses_lite", "zho")


class TestEndToEnd:
    def test_index_and_retrieve_farsi(self, spark, tmp_path):
        """Farsi docs indexed with moses_lite + parsivar_lite; a query whose
        surface form differs (plural/comparative) from the doc must still
        match through the shared stem — the full T6+T12 path."""
        cfg = TextConfig(tokenize="moses_lite", stem="parsivar_lite",
                         stopwords=None, lowercase=True)
        docs = spark.createDataFrame([
            ("f1", "کتاب‌های بزرگ در کتابخانه", "fas"),
            ("f2", "دوستان ما به مدرسه می‌روند", "fas"),
            ("f3", "هوای امروز بسیار خوب است", "fas"),
        ], "id string, text string, lang string")
        idx = str(tmp_path / "fidx")
        build_index(spark, docs, idx, IndexConfig(text=cfg, num_shards=2),
                    resume=False)
        # query uses singular کتاب; doc has plural کتاب‌های — stem matches
        res = search_texts(spark, idx, [("q", "کتاب بزرگتر")],
                           RetrieveConfig(k=3), text_cfg=cfg, lang="fas")
        rows = res.collect()
        assert rows and rows[0]["doc_id"] == "f1"
        res2 = search_texts(spark, idx, [("q", "دوست")],
                            RetrieveConfig(k=3), text_cfg=cfg, lang="fas")
        rows2 = res2.collect()
        assert rows2 and rows2[0]["doc_id"] == "f2"
