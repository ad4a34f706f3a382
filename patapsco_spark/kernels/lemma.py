"""Light rule-based English lemmatizer — a pure-Python, dependency-free
kernel narrowing the reference's neural-lemmatization gate (T9 stanza /
T10 spaCy) from "plugin contract proven" to "kernel included", the same
move round 4 made for T6/T7/T12 (moses_lite, cjk_bigram, parsivar_lite).

The reference lemmatizes with stanza or spaCy pipelines when installed
(/root/reference/patapsco/text.py:163-243,344-386). Both ultimately rest
on the PUBLISHED WordNet "Morphy" design (morphy(7WN); also NLTK's
WordNetLemmatizer and spaCy's rule lemmatizer): an irregular-form
exception table consulted first, then ordered suffix-detachment rules.
Morphy validates every candidate against the WordNet lexicon; no lexicon
ships here, so this kernel makes the detachment cascade deterministic
instead:

1. exception table — frequent irregular verbs (went→go, thought→think,
   made→make, …) and nouns (children→child, feet→foot, criteria→
   criterion, analyses→analysis, …), plus a no-change guard set for
   words a suffix rule would mangle (news, series, during, morning, …);
2. plural detachment with orthographic guards — ies→y, sses→ss,
   ses/zes→+e (houses→house, sizes→size), ches/shes/xes→strip es,
   oes→o (len≥6, so shoes falls through to the plain s-rule), ves→ve
   (moves→move; f/fe plurals like wolves/knives are exceptions),
   men→man, then final s (len≥4, never after ss/us/is);
3. verbal ed/ing detachment with Porter's published step-1b restoration
   (hoping→hope via CVC e-restore, running→run via de-doubling,
   vowel-in-stem guard so thing/bring survive), ying→y, ied→y;
4. superlative iest→y (len≥7 so priest survives); bare er/est are NOT
   stripped — without a lexicon they mangle far more nouns (paper,
   water, soldier) than they fix comparatives.

Because the lexicon-validation step is replaced by fixed priorities and
guards, output is NOT token-identical to spaCy or stanza; the ``spacy`` /
``stanza`` config names therefore stay plugin-gated and this ships as
``lemma_lite``.

Usable two ways:
- ``TextConfig(stem="lemma_lite")`` (lang must be ``eng``);
- ``TextConfig(stem="plugin:patapsco_spark.kernels.lemma_lite_lemmatizer")``.
"""

from __future__ import annotations

from functools import lru_cache

import pandas as pd

_VOWELS = set("aeiou")

# irregular forms → lemma (verbs + nouns); consulted before any rule
_EXCEPTIONS = {
    # be / have / do / go
    "am": "be", "is": "be", "are": "be", "was": "be", "were": "be",
    "been": "be", "has": "have", "had": "have", "did": "do", "does": "do",
    "done": "do", "goes": "go", "went": "go", "gone": "go",
    # frequent irregular verbs (past / participle)
    "said": "say", "made": "make", "took": "take", "taken": "take",
    "came": "come", "saw": "see", "seen": "see", "knew": "know",
    "known": "know", "got": "get", "gotten": "get", "gave": "give",
    "given": "give", "found": "find", "thought": "think", "told": "tell",
    "became": "become", "left": "leave", "felt": "feel",
    "brought": "bring", "began": "begin", "begun": "begin",
    "kept": "keep", "held": "hold", "wrote": "write", "written": "write",
    "stood": "stand", "heard": "hear", "meant": "mean", "met": "meet",
    "ran": "run", "paid": "pay", "sat": "sit", "spoke": "speak",
    "spoken": "speak", "led": "lead", "grew": "grow", "grown": "grow",
    "lost": "lose", "fell": "fall", "fallen": "fall", "sent": "send",
    "built": "build", "understood": "understand", "drew": "draw",
    "drawn": "draw", "broke": "break", "broken": "break",
    "spent": "spend", "rose": "rise", "risen": "rise", "drove": "drive",
    "driven": "drive", "bought": "buy", "wore": "wear", "worn": "wear",
    "chose": "choose", "chosen": "choose", "ate": "eat", "eaten": "eat",
    "flew": "fly", "flown": "fly", "won": "win", "sold": "sell",
    "caught": "catch", "taught": "teach", "fought": "fight",
    "sought": "seek", "threw": "throw", "thrown": "throw",
    "used": "use",
    # -ie verbs whose ying/ied forms the rules cannot recover
    "dying": "die", "died": "die", "dies": "die",
    "lying": "lie", "lied": "lie",
    "tying": "tie", "tied": "tie",
    # irregular noun plurals (beyond the men→man / ves→f rules)
    "children": "child", "feet": "foot", "teeth": "tooth",
    "geese": "goose", "mice": "mouse", "oxen": "ox",
    "wives": "wife", "knives": "knife", "lives": "life",
    "leaves": "leaf", "selves": "self", "halves": "half",
    "loaves": "loaf", "thieves": "thief", "scarves": "scarf",
    "wolves": "wolf", "calves": "calf", "shelves": "shelf",
    "hooves": "hoof", "elves": "elf", "dwarves": "dwarf",
    "wharves": "wharf", "sheaves": "sheaf",
    # Greco-Latin plurals
    "criteria": "criterion", "phenomena": "phenomenon",
    "analyses": "analysis", "crises": "crisis", "theses": "thesis",
    "hypotheses": "hypothesis", "bases": "basis",
    "indices": "index", "matrices": "matrix", "vertices": "vertex",
    "appendices": "appendix",
    # -s / -es forms a rule would mangle
    "buses": "bus", "gases": "gas", "viruses": "virus",
    "shoes": "shoe", "caches": "cache", "niches": "niche",
    "movies": "movie", "cookies": "cookie", "zombies": "zombie",
}

# words no rule may touch (plural-looking non-plurals, -ing nouns, …)
_NO_CHANGE = frozenset({
    "news", "series", "species", "always", "perhaps", "whereas",
    "lens", "bias", "atlas", "canvas", "chaos", "cosmos",
    "physics", "economics", "politics", "mathematics", "statistics",
    "ethics", "athletics", "pants", "scissors", "trousers", "clothes",
    "means", "headquarters", "proceeds", "savings", "premises",
    "besides", "hers", "ours", "yours", "theirs", "this", "thus",
    "during", "morning", "evening", "ceiling", "nothing", "something",
    "anything", "everything", "spring", "string", "sibling", "darling",
})


def _has_vowel(s: str) -> bool:
    return any(c in _VOWELS or c == "y" for c in s)


def _ends_cvc(s: str) -> bool:
    """Porter's *o condition: final consonant-vowel-consonant where the
    last consonant is not w, x or y — the e-restoration trigger."""
    if len(s) < 3:
        return False
    c1, v, c2 = s[-3], s[-2], s[-1]
    return (c1 not in _VOWELS and v in _VOWELS and
            c2 not in _VOWELS and c2 not in "wxy")


def _post_strip(stem: str) -> str:
    """Porter step-1b restoration after removing ed/ing (published rules):
    at/bl/iz → +e; doubled final consonant (not l/s/z) → de-double;
    short CVC stem → +e."""
    if stem.endswith(("at", "bl", "iz")):
        return stem + "e"
    if (len(stem) >= 2 and stem[-1] == stem[-2] and
            stem[-1] not in _VOWELS and stem[-1] not in "lsz"):
        return stem[:-1]
    if _ends_cvc(stem):
        return stem + "e"
    return stem


@lru_cache(maxsize=262144)
def lemma_lite(token: str) -> str:
    """Lemmatize one (already-cased) token. Lowercase-insensitive lookup;
    the pipeline lowercases afterwards, matching the stemmer contract."""
    w = token.lower()
    if w in _EXCEPTIONS:
        return _EXCEPTIONS[w]
    if w in _NO_CHANGE or len(w) <= 3:
        return token
    if w.endswith("'s"):
        w = w[:-2]
        if len(w) <= 3:
            return w
        # the strip must survive the fall-through: "table's" matches no
        # later suffix rule, and returning the ORIGINAL token would keep
        # the possessive in the index while queries lemmatize to "table"
        token = w
        # re-check irregulars on the stripped form: children's -> child
        if w in _EXCEPTIONS:
            return _EXCEPTIONS[w]
    # --- plural detachment (ordered, first match wins) ---
    if w.endswith("ies") and len(w) >= 5:
        return w[:-3] + "y"
    if w.endswith("sses"):
        return w[:-2]
    if w.endswith(("ses", "zes")) and len(w) >= 5:
        return w[:-1]                       # houses→house, sizes→size
    if w.endswith(("ches", "shes")) and len(w) >= 6:
        return w[:-2]
    if w.endswith("xes"):
        return w[:-2]
    if w.endswith("oes") and len(w) >= 6:
        return w[:-2]                       # heroes→hero; shoes → s-rule
    if w.endswith("ves") and len(w) >= 5:
        # ves→ve, NOT ves→f: the -ve VERB class (moves, gives, serves,
        # believes…) vastly outnumbers f-plurals, and a blanket f-rule
        # mangled all of them (moves→mof) — f/fe plurals (wolves, knives,
        # shelves…) are enumerated in _EXCEPTIONS instead
        return w[:-1]                       # moves→move, gives→give
    if w.endswith("men"):
        return w[:-2] + "an"                # women→woman
    # --- verbal detachment with Porter step-1b restoration ---
    if w.endswith("ying") and len(w) >= 6:
        return w[:-4] + "y"                 # studying→study
    if w.endswith("ied") and len(w) >= 5:
        return w[:-3] + "y"                 # studied→study
    if w.endswith("ing") and len(w) >= 5 and _has_vowel(w[:-3]):
        return _post_strip(w[:-3])          # making→make, running→run
    if w.endswith("ed") and len(w) >= 4 and _has_vowel(w[:-2]):
        return _post_strip(w[:-2])          # hoped→hope, stopped→stop
    # --- superlative (len guard keeps priest intact) ---
    if w.endswith("iest") and len(w) >= 7:
        return w[:-4] + "y"                 # happiest→happy
    # --- plain plural s (never after ss/us/is) ---
    if (w.endswith("s") and len(w) >= 4 and
            not w.endswith(("ss", "us", "is"))):
        return w[:-1]
    return token


def lemma_tokens(tokens: list[str]) -> list[str]:
    return [lemma_lite(t) for t in tokens]


def lemma_lite_lemmatizer(lang: str):
    """Series[list[str]] → Series[list[str]] kernel factory (the stemmer
    plugin contract, functions/stem.py)."""
    if lang != "eng":
        raise ValueError("lemma_lite only supports English")

    def kernel(s: pd.Series) -> pd.Series:
        return s.map(lambda toks: lemma_tokens(toks) if toks is not None
                     else [])

    return kernel


# plugin:… resolution calls the attr with lang only when marked (the
# factory contract in functions/tokenize.load_plugin_kernel)
lemma_lite_lemmatizer.takes_lang = True
