"""In-repo CJK dictionary+bigram tokenizer (round-3 verdict #8): narrows the
jieba gate (T7) from "plugin contract proven" to "kernel included". Unit
semantics + plugin-contract loading + index→retrieve end-to-end."""

import pandas as pd
import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.functions.tokenize import make_tokenizer
from patapsco_spark.kernels.cjk import DEFAULT_LEXICON, cjk_bigram_tokenizer
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.retrieve import search_texts

TOK = cjk_bigram_tokenizer("zho")


def toks(text):
    return list(TOK(pd.Series([text])).iloc[0])


class TestSegmentation:
    def test_dictionary_words_win(self):
        # 搜索引擎 (search engine) is itself in the lexicon — longest match
        # beats its sub-words 搜索 and 引擎
        assert toks("搜索引擎") == ["搜索引擎"]
        assert toks("信息检索系统") == ["信息检索", "系统"]

    def test_oov_runs_bigram(self):
        # no dictionary entry covers 鲸鱼游泳 → overlapping bigrams
        assert toks("鲸鱼游泳") == ["鲸鱼", "鱼游", "游泳"]
        # single leftover char emits itself
        assert toks("鲸") == ["鲸"]

    def test_mixed_dictionary_and_oov(self):
        # 我们(dict) + 爱(single OOV char) + 北京(dict)
        assert toks("我们爱北京") == ["我们", "爱", "北京"]

    def test_mixed_script_keeps_latin_words(self):
        assert toks("用 Spark 做信息检索") == ["用", "Spark", "做", "信息检索"]

    def test_empty_and_none(self):
        assert toks("") == []
        out = TOK(pd.Series([None]))
        assert list(out.iloc[0]) == []

    def test_custom_lexicon_and_file(self, tmp_path):
        k = cjk_bigram_tokenizer("zho", lexicon={"鲸鱼"})
        assert list(k(pd.Series(["鲸鱼游泳"])).iloc[0]) == ["鲸鱼", "游泳"]
        p = tmp_path / "user.dict"
        p.write_text("游泳\n", encoding="utf-8")
        k2 = cjk_bigram_tokenizer("zho", extra_lexicon_path=str(p))
        assert list(k2(pd.Series(["游泳时间"])).iloc[0]) == ["游泳", "时间"]

    def test_hangul_and_kana_covered(self):
        assert toks("한국어") == ["한국", "국어"]
        assert toks("ひらがな") == ["ひら", "らが", "がな"]


class TestRegistration:
    def test_first_class_name_and_plugin_path_agree(self):
        a = make_tokenizer("cjk_bigram", "zho")
        b = make_tokenizer(
            "plugin:patapsco_spark.kernels.cjk_bigram_tokenizer", "zho")
        s = pd.Series(["我们用搜索引擎找数据"])
        assert list(a(s).iloc[0]) == list(b(s).iloc[0])

    def test_jieba_gate_points_here(self):
        with pytest.raises(NotImplementedError, match="cjk_bigram"):
            make_tokenizer("jieba", "zho")

    def test_default_lexicon_is_multichar(self):
        assert all(len(w) >= 2 for w in DEFAULT_LEXICON)


class TestEndToEnd:
    def test_index_and_retrieve_chinese(self, spark, tmp_path):
        """Chinese docs indexed with the kernel; a Chinese query (processed
        through the SAME chain) must rank the on-topic doc first — the full
        T7 path: analyze → postings → BM25."""
        cfg = TextConfig(tokenize="cjk_bigram", stem=None, stopwords=None,
                         lowercase=True)
        docs = spark.createDataFrame([
            ("z1", "我们用搜索引擎做信息检索", "zho"),
            ("z2", "他们喜欢学习语言模型", "zho"),
            ("z3", "今天天气很好我们去公园", "zho"),
            ("z4", "分布式数据库系统的索引与查询", "zho"),
        ], "id string, text string, lang string")
        idx = str(tmp_path / "zidx")
        build_index(spark, docs, idx, IndexConfig(text=cfg, num_shards=2),
                    resume=False)
        res = search_texts(spark, idx, [("q", "搜索引擎")],
                           RetrieveConfig(k=4), text_cfg=cfg, lang="zho")
        rows = res.collect()
        assert rows and rows[0]["doc_id"] == "z1"
        res2 = search_texts(spark, idx, [("q", "数据库索引")],
                            RetrieveConfig(k=4), text_cfg=cfg, lang="zho")
        rows2 = res2.collect()
        assert rows2 and rows2[0]["doc_id"] == "z4"
