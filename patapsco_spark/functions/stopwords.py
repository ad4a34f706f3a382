"""Stop-word identification/removal with the reference's ordering semantics.

Semantics (/root/reference/patapsco/text.py:389-427 and call sites
docs.py:253-256): stopwords are *identified by index* on the raw (unstemmed)
tokens — case-insensitively unless the tokens are already lowercased — and
*removed by index after stemming*. A naive ``array_except`` is wrong twice
(it dedups, and it would test the stemmed token), so the kernel carries the
index set across the stem step.

The built-in English list is Lucene's classic ``ENGLISH_STOP_WORDS_SET``
(public Apache Lucene constant). Other languages load from a user-supplied
directory laid out as ``{source}/{lang}.txt`` with ``#`` comment lines.
"""

from __future__ import annotations

import pathlib

# org.apache.lucene.analysis.en.EnglishAnalyzer#ENGLISH_STOP_WORDS_SET
LUCENE_ENGLISH_STOPWORDS = frozenset(
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with".split()
)

_BUILTIN: dict[tuple[str, str], frozenset[str]] = {
    ("lucene", "eng"): LUCENE_ENGLISH_STOPWORDS,
}


def load_stopwords(source: str, lang: str, resource_dir: str | None = None) -> frozenset[str]:
    if resource_dir is not None:
        path = pathlib.Path(resource_dir) / source / f"{lang}.txt"
        with open(path, encoding="utf-8") as fp:
            return frozenset(w.strip() for w in fp if w.strip() and w[0] != "#")
    try:
        return _BUILTIN[(source, lang)]
    except KeyError:
        raise ValueError(
            f"no built-in stopword list for ({source}, {lang}); pass "
            "resource_dir pointing at {source}/{lang}.txt files"
        ) from None


def identify_stopword_indices(tokens: list[str], stop_words: frozenset[str],
                              is_lower: bool = False) -> list[int]:
    if is_lower:
        return [i for i, t in enumerate(tokens) if t in stop_words]
    return [i for i, t in enumerate(tokens) if t.lower() in stop_words]


def remove_by_index(tokens: list[str], indices: list[int]) -> list[str]:
    if not indices:
        return tokens
    drop = set(indices)
    return [t for i, t in enumerate(tokens) if i not in drop]
