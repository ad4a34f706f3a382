"""Rule-based Moses-style word tokenizer — a pure-Python, dependency-free
kernel narrowing the reference's sacremoses gate (T6) from "contract
proven" to "kernel included".

The reference tokenizes most languages with sacremoses when installed
(/root/reference/patapsco/text.py:98-118); absent that package, this
kernel re-implements the published Moses ``tokenizer.perl`` rule pipeline
(the algorithm is public: Koehn et al., the Moses SMT toolkit) as a chain
of staged regex transforms:

1. whitespace normalization, control-char removal;
2. pad every symbol that is not alphanumeric / space / one of the
   specially-handled ``. ' , -`` (hyphens stay attached, as in
   non-aggressive Moses);
3. multi-dot runs (``...``) survive as single tokens;
4. commas split EXCEPT between digits (``1,000`` stays whole);
5. apostrophes: English mode splits contractions the Moses way
   (``don't`` → ``don 't``, ``1990's`` → ``1990 's``); Romance mode
   splits after the elided article (``l'eau`` → ``l' eau``); any other
   apostrophe context pads;
6. trailing periods split off a token unless the prefix is a known
   nonbreaking prefix (``Mr. Dr. etc.``…), a dotted acronym (``U.S.``),
   or a single capital initial (``A.``).

Differences vs the reference stack, documented honestly: no spaCy
sentence pre-segmentation (period handling is token-local instead) and
the nonbreaking-prefix list is the common-English subset, not the full
per-language Moses share/ files. So this is ``moses_lite`` — the
``moses`` name stays plugin-gated for deployments that install the real
package and need token-identity with it.

Usable two ways:
- ``TextConfig(tokenize="moses_lite")`` — first-class name;
- ``TextConfig(tokenize="plugin:patapsco_spark.kernels.moses_lite_tokenizer")``
  — through the generic plugin gate.
"""

from __future__ import annotations

import re

import pandas as pd

# Moses ships per-language nonbreaking_prefix.* files; this is the
# high-frequency English subset (titles, latin abbreviations, months,
# corporate suffixes). A period after these stays attached.
NONBREAKING_PREFIXES_EN = frozenset(
    "Mr Mrs Ms Dr Prof Rev Hon St Gen Rep Sen Capt Col Sgt Lt Adm Gov "
    "Pres Supt Det Insp Messrs Mmes Msgr Fr Br "
    "Jr Sr vs etc al eg ie cf ca approx no No pp p "
    "Inc Ltd Co Corp Mt Ft "
    "Jan Feb Mar Apr Jun Jul Aug Sep Sept Oct Nov Dec "
    "a b c d e f g h i j k l m n o p q r s t u v w x y z".split()
)

# languages whose apostrophe elides an article onto the NEXT word
_ROMANCE = {"fra", "ita", "cat", "glg"}

_CTRL = re.compile(r"[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]")
_WS = re.compile(r"\s+")
# pad everything that is not word-char / space / specially handled .',-
# (underscore is not [:alnum:] in Moses, so un-shield it explicitly)
_SYMBOL = re.compile(r"([^\w\s.',\-]|_)", re.UNICODE)
_MULTIDOT = re.compile(r"(\.{2,})")
_COMMA_L = re.compile(r"([^\d]),")          # comma after a non-digit
_COMMA_R = re.compile(r",([^\d])")          # comma before a non-digit
_APO_EN_CONTR = re.compile(r"([^\W\d_])'([^\W\d_])", re.UNICODE)
_APO_EN_POSS = re.compile(r"(\d)'(s)")
_APO_ROMANCE = re.compile(r"([^\W\d_])'([^\W\d_])", re.UNICODE)
# "other" = apostrophe not between word chars (digits count: 1990's is
# handled by the possessive rule, not padded as a quote)
_APO_OTHER = re.compile(r"(?<!\w)'|'(?!\w)", re.UNICODE)
_ACRONYM = re.compile(r"^(?:[^\W\d_]\.)+$", re.UNICODE)
_INITIAL = re.compile(r"^[A-Z]$")


def _split_trailing_period(tok: str) -> list[str]:
    """Moses's word-final period rule, token-local."""
    if not tok.endswith(".") or tok == "." or set(tok) == {"."}:
        return [tok]
    pre = tok[:-1]
    if _ACRONYM.match(tok):          # U.S.  e.g.-style dotted acronyms
        return [tok]
    if pre in NONBREAKING_PREFIXES_EN or _INITIAL.match(pre):
        return [tok]
    if "." in pre:                   # inner dot: version numbers, domains
        return [tok]
    return [pre, "."]


def tokenize_text(text: str, lang: str = "eng") -> list[str]:
    """One document → Moses-style tokens."""
    t = _CTRL.sub("", text)
    t = _SYMBOL.sub(r" \1 ", t)
    t = _MULTIDOT.sub(r" \1 ", t)
    t = _COMMA_L.sub(r"\1 , ", t)
    t = _COMMA_R.sub(r" , \1", t)
    if t.endswith(","):
        t = t[:-1] + " , "
    # pad quote-ish apostrophes FIRST (only non-letter contexts match), so
    # the word-internal splits below aren't re-padded by this rule
    t = _APO_OTHER.sub(" ' ", t)
    if lang in _ROMANCE:
        t = _APO_ROMANCE.sub(r"\1' \2", t)      # l'eau -> l' eau
    else:
        t = _APO_EN_CONTR.sub(r"\1 '\2", t)     # don't -> don 't
        t = _APO_EN_POSS.sub(r"\1 '\2", t)      # 1990's -> 1990 's
    out: list[str] = []
    for tok in _WS.sub(" ", t).strip().split(" "):
        if tok:
            out.extend(_split_trailing_period(tok))
    return out


def moses_lite_tokenizer(lang: str):
    """Factory: lang → Series[str] → Series[list[str]] batch kernel."""
    if lang == "zho":
        # mirrors the reference's MosesTokenizer.not_supported gate
        # (/root/reference/patapsco/text.py:103): whole-script CJK text has
        # no spaces for the rules to work with — use cjk_bigram instead.
        raise ValueError("moses_lite does not support zho; use tokenize="
                         "'cjk_bigram' or 'ngram' for Chinese")

    def kernel(s: pd.Series) -> pd.Series:
        return s.fillna("").map(lambda text: tokenize_text(text, lang))

    return kernel


moses_lite_tokenizer.takes_lang = True
