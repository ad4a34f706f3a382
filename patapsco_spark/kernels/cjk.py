"""Dictionary-backed CJK bigram tokenizer — a pure-Python, dependency-free
kernel narrowing the reference's jieba gate (T7) from "contract proven" to
"kernel included".

The reference tokenizes Chinese with jieba when installed
(/root/reference/patapsco/text.py:135-160); absent that package, this
kernel implements the classic CLIR recipe that jieba's simplest mode also
reduces to:

1. split the text into CJK runs and non-CJK runs (non-CJK tokenizes by
   whitespace, so mixed zh/en web text keeps its Latin terms whole);
2. within a CJK run, FORWARD MAXIMUM MATCHING against a lexicon (longest
   dictionary word wins, scanning left to right — jieba's DAG degenerates
   to exactly this greedy walk when every word has equal weight);
3. stretches not covered by any dictionary word fall back to OVERLAPPING
   CHARACTER BIGRAMS (a lone char emits itself) — the n=2 n-gram scheme
   CLIR evaluations use for Chinese when no segmenter is available, and
   what this engine's ``ngram`` tokenizer does for CJK wholesale.

Deterministic (no model weights), batch-vectorized at the Series level like
every other kernel, and lexicon-extensible: pass ``lexicon=`` to the
factory, or point ``extra_lexicon_path`` at a UTF-8 one-word-per-line file
(the jieba user-dict convention).

Usable two ways:
- ``TextConfig(tokenize="cjk_bigram")`` — first-class name;
- ``TextConfig(tokenize="plugin:patapsco_spark.kernels.cjk_bigram_tokenizer")``
  — through the generic plugin gate (what an external package would use).
"""

from __future__ import annotations

import re

import pandas as pd

# CJK Unified Ideographs (+ext A), Hiragana/Katakana, Hangul syllables —
# the script ranges the reference's CJK gate keys on (text.py:58-66 uses
# lang codes; we detect by script so mixed-script docs segment correctly)
_CJK_RANGES = (
    "㐀-䶿"   # CJK ext A
    "一-鿿"   # CJK unified
    "぀-ヿ"   # hiragana + katakana
    "가-힯"   # hangul
)
_CJK_RUN = re.compile(f"([{_CJK_RANGES}]+)")

# a small built-in lexicon of common multi-char words so the kernel is
# useful out of the box; real deployments extend it (jieba ships ~350k
# entries — shipping a corpus-scale dictionary is a data file concern, not
# an engine concern)
DEFAULT_LEXICON = frozenset({
    "中国", "美国", "日本", "北京", "上海", "香港", "台湾",
    "我们", "你们", "他们", "大家", "自己",
    "今天", "明天", "昨天", "现在", "时间", "时候",
    "可以", "不能", "没有", "知道", "觉得", "喜欢",
    "什么", "怎么", "为什么", "因为", "所以", "但是", "如果",
    "工作", "学习", "学校", "老师", "学生", "朋友", "公司",
    "问题", "办法", "事情", "东西", "地方", "世界", "国家",
    "数据", "系统", "网络", "计算机", "软件", "程序", "互联网",
    "搜索", "引擎", "搜索引擎", "信息", "检索", "信息检索",
    "分布式", "数据库", "索引", "查询", "文档", "语言", "模型",
})


def _segment_run(run: str, lexicon: frozenset[str], max_word: int) -> list[str]:
    """One CJK run → tokens: greedy longest dictionary match, bigram the
    uncovered stretches."""
    out: list[str] = []
    pending_start = 0  # start of the current not-in-dictionary stretch
    i, n = 0, len(run)

    def flush(upto: int) -> None:
        seg = run[pending_start:upto]
        if not seg:
            return
        if len(seg) == 1:
            out.append(seg)
        else:
            out.extend(seg[j:j + 2] for j in range(len(seg) - 1))

    while i < n:
        match = None
        for L in range(min(max_word, n - i), 1, -1):  # longest first, ≥2
            cand = run[i:i + L]
            if cand in lexicon:
                match = cand
                break
        if match is not None:
            flush(i)
            out.append(match)
            i += len(match)
            pending_start = i
        else:
            i += 1
    flush(n)
    return out


def cjk_bigram_tokenizer(lang: str, lexicon=None,
                         extra_lexicon_path: str | None = None):
    """Factory (``takes_lang`` plugin contract): lang → Series kernel.

    ``lang`` is accepted for contract parity but segmentation keys on
    script, not language code — a 'zho' doc with embedded English tokenizes
    both parts correctly."""
    lex = frozenset(lexicon) if lexicon is not None else DEFAULT_LEXICON
    if extra_lexicon_path:
        with open(extra_lexicon_path, encoding="utf-8") as f:
            lex = lex | {w.strip() for w in f if w.strip()}
    max_word = max((len(w) for w in lex), default=2)

    def tokenize(text: str) -> list[str]:
        out: list[str] = []
        for part in _CJK_RUN.split(text or ""):
            if not part:
                continue
            if _CJK_RUN.fullmatch(part):
                out.extend(_segment_run(part, lex, max_word))
            else:
                out.extend(part.split())
        return out

    def kernel(s: pd.Series) -> pd.Series:
        return s.fillna("").map(tokenize)

    return kernel


cjk_bigram_tokenizer.takes_lang = True
