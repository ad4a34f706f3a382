"""Porter stemmer — from-scratch implementation of the published algorithm.

The reference stems with nltk's PorterStemmer in its default
NLTK_EXTENSIONS mode with ``to_lowercase=False`` and a RecursionError
passthrough (/root/reference/patapsco/text.py:35-52). nltk is not available
here, so this module implements Porter (1980, "An algorithm for suffix
stripping") including the publicly documented NLTK departures (irregular-form
pool, 4-letter *ies*/*ied* handling, step-1c consonant-before-y condition,
*bli*/*fulli*/*logi* step-2 rules, 2-letter cvc extension) so stems agree
with the reference pipeline for English.

Per-token work is unavoidable for stemming (Lucene does the same per token in
Java); we amortize it with an LRU cache keyed by token — Zipfian vocabularies
hit the cache for almost every occurrence — and only ever run inside Arrow
batch kernels (mapInPandas), never as a per-row Spark UDF.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd

_VOWELS = frozenset("aeiou")

_POOL = {}
for _stem_, _forms in {
    "sky": ["sky", "skies"],
    "die": ["dying"],
    "lie": ["lying"],
    "tie": ["tying"],
    "news": ["news"],
    "inning": ["innings", "inning"],
    "outing": ["outings", "outing"],
    "canning": ["cannings", "canning"],
    "howe": ["howe"],
    "proceed": ["proceed"],
    "exceed": ["exceed"],
    "succeed": ["succeed"],
}.items():
    for _f in _forms:
        _POOL[_f] = _stem_


def _is_consonant(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        # y is a consonant at position 0, else a consonant iff the previous
        # letter is NOT a consonant; resolve runs of y's iteratively instead
        # of recursing (the reference guards nltk's recursion with a
        # RecursionError passthrough — we just don't recurse)
        j = i
        while j > 0 and word[j - 1] == "y":
            j -= 1
        if j == 0:
            # y at 0 is a consonant; alternates along the run
            return (i % 2) == 0
        base = word[j - 1] not in _VOWELS  # non-y char: plain consonant test
        val = base
        for _ in range(i - j + 1):
            val = not val
        return val
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences in the c/v representation."""
    if not stem:
        return 0
    cv = [_is_consonant(stem, i) for i in range(len(stem))]
    m = 0
    prev = cv[0]
    # collapse runs, count transitions vowel-run -> consonant-run
    for cur in cv[1:]:
        if cur and not prev:
            m += 1
        prev = cur
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_consonant(stem, i) for i in range(len(stem)))


def _ends_double_consonant(word: str) -> bool:
    return len(word) >= 2 and word[-1] == word[-2] and _is_consonant(word, len(word) - 1)


def _ends_cvc(word: str) -> bool:
    if (
        len(word) >= 3
        and _is_consonant(word, len(word) - 3)
        and not _is_consonant(word, len(word) - 2)
        and _is_consonant(word, len(word) - 1)
        and word[-1] not in ("w", "x", "y")
    ):
        return True
    # NLTK extension: 2-letter words like "ax"
    return len(word) == 2 and not _is_consonant(word, 0) and _is_consonant(word, 1)


def _apply_rules(word: str, rules) -> str:
    for suffix, repl, cond in rules:
        if suffix == "*d":
            if _ends_double_consonant(word):
                stem = word[:-2]
                if cond is None or cond(stem):
                    return stem + repl
                return word
        elif word.endswith(suffix):
            stem = word[: len(word) - len(suffix)] if suffix else word
            if cond is None or cond(stem):
                return stem + repl
            return word
    return word


def _step1a(word: str) -> str:
    if word.endswith("ies") and len(word) == 4:
        return word[:-3] + "ie"
    return _apply_rules(word, [
        ("sses", "ss", None),
        ("ies", "i", None),
        ("ss", "ss", None),
        ("s", "", None),
    ])


def _step1b(word: str) -> str:
    if word.endswith("ied"):
        return word[:-3] + ("ie" if len(word) == 4 else "i")
    if word.endswith("eed"):
        stem = word[:-3]
        return stem + "ee" if _measure(stem) > 0 else word
    intermediate = None
    for suffix in ("ed", "ing"):
        if word.endswith(suffix):
            stem = word[: -len(suffix)]
            if _has_vowel(stem):
                intermediate = stem
            break
    if intermediate is None:
        return word
    return _apply_rules(intermediate, [
        ("at", "ate", None),
        ("bl", "ble", None),
        ("iz", "ize", None),
        ("*d", intermediate[-1] if intermediate else "",
         lambda st: intermediate[-1] not in ("l", "s", "z")),
        ("", "e", lambda st: _measure(st) == 1 and _ends_cvc(st)),
    ])


def _step1c(word: str) -> str:
    return _apply_rules(word, [
        ("y", "i", lambda st: len(st) > 1 and _is_consonant(st, len(st) - 1)),
    ])


def _m_pos(stem: str) -> bool:
    return _measure(stem) > 0


def _step2(word: str) -> str:
    if word.endswith("alli") and _m_pos(word[:-4]):
        return _step2(word[:-4] + "al")
    return _apply_rules(word, [
        ("ational", "ate", _m_pos),
        ("tional", "tion", _m_pos),
        ("enci", "ence", _m_pos),
        ("anci", "ance", _m_pos),
        ("izer", "ize", _m_pos),
        ("bli", "ble", _m_pos),
        ("alli", "al", _m_pos),
        ("entli", "ent", _m_pos),
        ("eli", "e", _m_pos),
        ("ousli", "ous", _m_pos),
        ("ization", "ize", _m_pos),
        ("ation", "ate", _m_pos),
        ("ator", "ate", _m_pos),
        ("alism", "al", _m_pos),
        ("iveness", "ive", _m_pos),
        ("fulness", "ful", _m_pos),
        ("ousness", "ous", _m_pos),
        ("aliti", "al", _m_pos),
        ("iviti", "ive", _m_pos),
        ("biliti", "ble", _m_pos),
        ("fulli", "ful", _m_pos),
        ("logi", "log", lambda st: _m_pos(word[:-3])),
    ])


def _step3(word: str) -> str:
    return _apply_rules(word, [
        ("icate", "ic", _m_pos),
        ("ative", "", _m_pos),
        ("alize", "al", _m_pos),
        ("iciti", "ic", _m_pos),
        ("ical", "ic", _m_pos),
        ("ful", "", _m_pos),
        ("ness", "", _m_pos),
    ])


def _m_gt1(stem: str) -> bool:
    return _measure(stem) > 1


def _step4(word: str) -> str:
    return _apply_rules(word, [
        ("al", "", _m_gt1),
        ("ance", "", _m_gt1),
        ("ence", "", _m_gt1),
        ("er", "", _m_gt1),
        ("ic", "", _m_gt1),
        ("able", "", _m_gt1),
        ("ible", "", _m_gt1),
        ("ant", "", _m_gt1),
        ("ement", "", _m_gt1),
        ("ment", "", _m_gt1),
        ("ent", "", _m_gt1),
        ("ion", "", lambda st: _m_gt1(st) and st[-1:] in ("s", "t")),
        ("ou", "", _m_gt1),
        ("ism", "", _m_gt1),
        ("ate", "", _m_gt1),
        ("iti", "", _m_gt1),
        ("ous", "", _m_gt1),
        ("ive", "", _m_gt1),
        ("ize", "", _m_gt1),
    ])


def _step5a(word: str) -> str:
    if word.endswith("e"):
        stem = word[:-1]
        m = _measure(stem)
        if m > 1:
            return stem
        if m == 1 and not _ends_cvc(stem):
            return stem
    return word


def _step5b(word: str) -> str:
    if word.endswith("ll") and _measure(word[:-1]) > 1:
        return word[:-1]
    return word


@lru_cache(maxsize=262144)
def porter_stem(token: str) -> str:
    """Stem one token (no lowercasing — the pipeline lowercases afterwards,
    matching the reference call with ``to_lowercase=False``)."""
    if token in _POOL:
        return _POOL[token]
    if len(token) <= 2:
        return token
    try:
        w = _step1a(token)
        w = _step1b(w)
        w = _step1c(w)
        w = _step2(w)
        w = _step3(w)
        w = _step4(w)
        w = _step5a(w)
        return _step5b(w)
    except RecursionError:  # reference passthrough (text.py:48-52)
        return token


def stem_tokens(tokens: list[str]) -> list[str]:
    return [porter_stem(t) for t in tokens]


def stem_series(s: pd.Series) -> pd.Series:
    """Series[list[str]] → Series[list[str]]."""
    return s.map(stem_tokens)


def make_stemmer(name: str | None, lang: str):
    if name in (None, "none", False):
        return None
    if name == "porter":
        if lang != "eng":
            raise ValueError("Porter stemmer only supports English")
        return stem_series
    if name == "lemma_lite":
        # in-repo Morphy-style English lemmatizer (kernels/lemma.py) — the
        # dependency-free stand-in for spaCy/stanza lemmatization, also
        # reachable as plugin:patapsco_spark.kernels.lemma_lite_lemmatizer
        from ..kernels.lemma import lemma_lite_lemmatizer
        return lemma_lite_lemmatizer(lang)
    if name == "parsivar_lite":
        # in-repo light Farsi affix stripper (kernels/farsi.py) — the
        # dependency-free stand-in for parsivar, also reachable as
        # plugin:patapsco_spark.kernels.parsivar_lite_stemmer
        from ..kernels.farsi import parsivar_lite_stemmer
        return parsivar_lite_stemmer(lang)
    if name.startswith("plugin:"):
        from .tokenize import load_plugin_kernel
        return load_plugin_kernel(name, lang)
    if name in ("parsivar", "stanza", "spacy"):
        raise NotImplementedError(
            f"stemmer '{name}' needs external packages not present in this "
            "environment; wire your own Series[list[str]]->Series[list[str]] "
            "kernel with stem='plugin:your_module.your_stemmer' "
            "(same contract; module must be importable on executors)"
            + ("; the in-repo stem='parsivar_lite' kernel (rule-based affix "
               "stripping, no verb dictionaries) works without external "
               "packages" if name == "parsivar" else
               "; the in-repo stem='lemma_lite' kernel (Morphy-style "
               "exception table + suffix detachment, English) works "
               "without external packages")
        )
    raise ValueError(f"unknown stemmer: {name}")
