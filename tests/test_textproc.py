"""Golden tests for the text kernels, ported from the reference's test intent
(/root/reference/tests/test_util_normalize.py, tests/test_text.py).

All non-ASCII characters appear as \\uXXXX escapes on purpose."""

import pandas as pd
import pytest

from patapsco_spark.config import ConfigError, TextConfig
from patapsco_spark.functions import normalize as nz
from patapsco_spark.functions.analyze import analyze_tokens_batch
from patapsco_spark.functions.stem import porter_stem
from patapsco_spark.functions.stopwords import (
    LUCENE_ENGLISH_STOPWORDS,
    identify_stopword_indices,
    remove_by_index,
)
from patapsco_spark.functions.tokenize import (
    ngram_tokenize_series,
    whitespace_tokenize_series,
)


class TestNormalize:
    def test_newlines_kept(self):
        assert nz.pre_normalize("line1\nline2") == "line1\nline2"

    def test_spaces_tabs(self):
        assert nz.update_spaces("a\t\tb") == "a b"

    def test_multiple_spaces(self):
        assert nz.update_spaces("a    b") == "a b"

    def test_other_spaces(self):
        spaces = [chr(c) for c in (0x000D, 0x0020, 0x2009, 0x200A, 0x2028, 0x2029, 0x3000)]
        for space in spaces:
            assert nz.update_spaces(f"a{space}b") == "a b"

    def test_remove_rtl(self):
        assert nz.remove_format_chars("a" + chr(0x200E) + "b") == "ab"
        assert nz.remove_format_chars("a" + chr(0x202C) + "b") == "ab"

    def test_remove_control_chars(self):
        assert nz.remove_control_chars("a" + chr(0xFEFF) + "b") == "ab"

    def test_fix_encoding_golden(self):
        # the reference's own golden (test_util_normalize.py:54-56)
        text = "But we" + chr(0xE2) + chr(0x80) + chr(0x99) + "ve come out the other side of it"
        assert nz.fix_encoding(text) == "But we" + chr(0x2019) + "ve come out the other side of it"

    def test_fix_encoding_leaves_real_accents(self):
        assert nz.fix_encoding("caf" + chr(0xE9) + " au lait") == "caf" + chr(0xE9) + " au lait"
        assert nz.fix_encoding("plain ascii") == "plain ascii"

    def test_nfc(self):
        assert nz.nfc(chr(0x43) + chr(0x327)) == chr(0xC7)  # combine diacritics
        assert nz.nfc(chr(0x2160)) != "I"  # no compatibility folding
        assert nz.nfc(chr(0xFF0C)) == chr(0xFF0C)  # fullwidth preserved

    def test_full_chain_golden(self):
        got = nz.pre_normalize("we" + chr(0xE2) + chr(0x80) + chr(0x99) + "ve  seen" + chr(0x200E) + " " + chr(0x43) + chr(0x327) + "a")
        assert got == "we" + chr(0x2019) + "ve seen " + chr(0xC7) + "a"

    def test_chain_series_matches_scalar(self):
        vals = [
            "hello   world",
            "we" + chr(0xE2) + chr(0x80) + chr(0x99) + "ve",
            "a" + chr(0x200E) + "b c",
            "line1\nline2\tx",
            None,
        ]
        got = nz.pre_normalize_series(pd.Series(vals))
        for v, g in zip(vals, got):
            assert g == nz.pre_normalize(v or "")


class TestTokenize:
    def test_whitespace(self):
        s = pd.Series(["  a  b\tc\n d ", "", "single"])
        out = whitespace_tokenize_series(s).tolist()
        assert out == [["a", "b", "c", "d"], [], ["single"]]

    def test_whitespace_unicode_spaces(self):
        # Python str.split splits on U+3000 ideographic space; JVM \\s+ wouldn't
        out = whitespace_tokenize_series(pd.Series(["a" + chr(0x3000) + "b"])).tolist()
        assert out == [["a", "b"]]

    def test_ngram_eng(self):
        out = ngram_tokenize_series(pd.Series(["abcdef"]), "eng").tolist()
        assert out == [["abcde", "bcdef"]]

    def test_ngram_cjk(self):
        out = ngram_tokenize_series(pd.Series([chr(0x4E2D)+chr(0x6587)+chr(0x5206)+chr(0x8BCD)]), "zho").tolist()
        g = [chr(0x4E2D)+chr(0x6587), chr(0x6587)+chr(0x5206), chr(0x5206)+chr(0x8BCD)]
        assert out == [g]


class TestStopwords:
    def test_identify_then_remove_ordering(self):
        # reference semantics: identify on raw tokens, remove post-stem by
        # index — dedup-free and tested on the unstemmed form
        tokens = ["The", "running", "of", "the", "bulls"]
        idx = identify_stopword_indices(tokens, LUCENE_ENGLISH_STOPWORDS)
        assert idx == [0, 2, 3]
        stemmed = [porter_stem(t) for t in tokens]
        assert remove_by_index(stemmed, idx) == ["run", "bull"]

    def test_no_dedup(self):
        tokens = ["cat", "cat", "the"]
        idx = identify_stopword_indices(tokens, LUCENE_ENGLISH_STOPWORDS)
        assert remove_by_index(tokens, idx) == ["cat", "cat"]


class TestPorter:
    GOLDENS = {
        # classic published pairs
        "caresses": "caress", "ponies": "poni", "caress": "caress",
        "cats": "cat", "feed": "feed", "agreed": "agre", "plastered": "plaster",
        "bled": "bled", "motoring": "motor", "sing": "sing",
        "conflated": "conflat", "troubled": "troubl", "sized": "size",
        "hopping": "hop", "tanned": "tan", "falling": "fall",
        "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
        "filing": "file", "happy": "happi", "relational": "relat",
        "conditional": "condit", "rational": "ration", "valenci": "valenc",
        "hesitanci": "hesit", "digitizer": "digit", "conformabli": "conform",
        "radicalli": "radic", "differentli": "differ", "vileli": "vile",
        "analogousli": "analog", "vietnamization": "vietnam",
        "predication": "predic", "operator": "oper", "feudalism": "feudal",
        "decisiveness": "decis", "hopefulness": "hope", "callousness": "callous",
        "formaliti": "formal", "sensitiviti": "sensit", "sensibiliti": "sensibl",
        "triplicate": "triplic", "formative": "form", "formalize": "formal",
        "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
        "goodness": "good", "revival": "reviv", "allowance": "allow",
        "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
        "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
        "replacement": "replac", "adjustment": "adjust", "dependent": "depend",
        "adoption": "adopt", "homologou": "homolog", "communism": "commun",
        "activate": "activ", "angulariti": "angular", "homologous": "homolog",
        "effective": "effect", "bowdlerize": "bowdler", "probate": "probat",
        "rate": "rate", "cease": "ceas", "controll": "control", "roll": "roll",
        # NLTK-extension behaviors
        "sky": "sky", "skies": "sky", "dying": "die", "lying": "lie",
        "tying": "tie", "news": "news", "innings": "inning",
        "ties": "tie", "cries": "cri", "died": "die",
        # index/retrieve anchor terms (CACM golden query "inform retriev")
        "information": "inform", "retrieval": "retriev",
    }

    def test_goldens(self):
        for word, want in self.GOLDENS.items():
            assert porter_stem(word) == want, word

    def test_short_tokens_passthrough(self):
        assert porter_stem("a") == "a"
        assert porter_stem("ab") == "ab"

    def test_pathological_y_run(self):
        # must not blow the stack (reference guards RecursionError)
        porter_stem("y" * 5000)


class TestAnalyzeChain:
    def test_full_chain(self):
        cfg = TextConfig(tokenize="whitespace", stem="porter", stopwords="lucene")
        out = analyze_tokens_batch(
            pd.Series(["The Running of the bulls", "information   retrieval systems"]),
            cfg, lang="eng",
        ).tolist()
        # note: stemming runs BEFORE lowercasing (reference order,
        # docs.py:253-257), so an all-caps "BULLS" would stay "bulls"
        assert out == [["run", "bull"], ["inform", "retriev", "system"]]

    def test_no_stem_no_stop(self):
        cfg = TextConfig(stem=None, stopwords=None, lowercase=True)
        out = analyze_tokens_batch(pd.Series(["Gato Felino"]), cfg).tolist()
        assert out == [["gato", "felino"]]

    def test_lowercase_off(self):
        cfg = TextConfig(stem=None, stopwords=None, lowercase=False)
        out = analyze_tokens_batch(pd.Series(["Gato Felino"]), cfg).tolist()
        assert out == [["Gato", "Felino"]]

    def test_config_validation(self):
        with pytest.raises(ConfigError):
            TextConfig(tokenize="ngram", stem="porter").validate()
        with pytest.raises(ConfigError):
            TextConfig(stem="porter").validate(lang="rus")
        TextConfig(tokenize="whitespace", stem="porter").validate(lang="eng")
