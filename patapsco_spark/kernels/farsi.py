"""Light rule-based Farsi (Persian) stemmer — a pure-Python,
dependency-free kernel narrowing the reference's parsivar gate (T12) from
"contract proven" to "kernel included".

The reference stems Farsi with ``parsivar.FindStems`` when installed
(/root/reference/patapsco/text.py:55-66). Parsivar couples a rule-based
affix stripper with verb-stem dictionaries; this kernel implements the
affix-stripping family of that design (the approach is public — light
Persian stemmers of this shape appear throughout the CLIR literature)
without the dictionaries:

1. ZWNJ handling — the zero-width non-joiner (U+200C) that attaches
   suffixes in written Persian (``کتاب‌ها``) is treated as a suffix
   boundary first, then removed;
2. ordered suffix stripping with a minimum-stem guard (≥2 chars left):
   superlative/comparative ``ترین/تر``, plural+possessive fusions
   (``هایمان/هایتان/هایشان/هایم/هایت/هایش``), plurals
   (``هایی/های/ها/ات/ان``), then standalone possessive clitics
   (``مان/تان/شان``);
3. the euphonic-``گ`` plural rule: ``بندگان`` → strip ``ان`` → ``بندگ``
   → restore the elided ``ه`` → ``بنده``.

Single-character clitics (``م/ت/ش/ی``) are deliberately NOT stripped — a
dictionary-free stemmer over-conflates badly on those. Because the verb
dictionaries are absent, output is NOT token-identical to parsivar; the
``parsivar`` config name therefore stays plugin-gated and this ships as
``parsivar_lite``.

Usable two ways:
- ``TextConfig(stem="parsivar_lite")`` (lang must be ``fas``);
- ``TextConfig(stem="plugin:patapsco_spark.kernels.parsivar_lite_stemmer")``.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd

ZWNJ = "‌"

# ordered: longest / most-specific first so fusions strip atomically.
# The animate plural ``ان`` outranks the bare ``مان/تان/شان`` clitics:
# ``دوستان`` (friends) must not strip a phantom ``تان`` — plural ``ان`` is
# far more frequent in web text than plural-less person clitics, and the
# common fused forms (``هایتان``…) are matched atomically above anyway.
_SUFFIXES = (
    "هایمان", "هایتان", "هایشان",
    "هایم", "هایت", "هایش",
    "ترین", "هایی",
    "های", "ان",
    "مان", "تان", "شان",
    "ها", "تر", "ات",
)

_MIN_STEM = 2


def _strip_suffixes(word: str) -> str:
    changed = True
    while changed:
        changed = False
        for suf in _SUFFIXES:
            if word.endswith(suf) and len(word) - len(suf) >= _MIN_STEM:
                word = word[: -len(suf)]
                if suf == "ان" and word.endswith("گ") and len(word) >= 3:
                    # euphonic گ inserted before the animate plural:
                    # the underlying stem ends in ه (بندگان → بنده)
                    word = word[:-1] + "ه"
                changed = True
                break
    return word


@lru_cache(maxsize=262144)
def farsi_stem(token: str) -> str:
    """Stem one Farsi token."""
    if ZWNJ in token:
        # suffixes attached with ZWNJ strip at the boundary; remaining
        # ZWNJs (true compounds: می‌رود) are dropped to one written form
        parts = token.split(ZWNJ)
        while len(parts) > 1 and parts[-1] in _SUFFIXES:
            parts.pop()
        token = "".join(parts)
    if len(token) <= _MIN_STEM:
        return token
    return _strip_suffixes(token)


def stem_tokens(tokens: list[str]) -> list[str]:
    return [farsi_stem(t) for t in tokens]


def parsivar_lite_stemmer(lang: str):
    """Factory: lang → Series[list[str]] → Series[list[str]] batch kernel."""
    if lang != "fas":
        # mirrors the reference's FarsiStemmer lang gate
        # (/root/reference/patapsco/text.py:58-60)
        raise ValueError("parsivar_lite stemmer only supports Farsi (fas)")

    def kernel(s: pd.Series) -> pd.Series:
        return s.map(stem_tokens)

    return kernel


parsivar_lite_stemmer.takes_lang = True
