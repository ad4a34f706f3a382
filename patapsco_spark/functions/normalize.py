"""Text normalization kernels — the byte-identical invariant surface.

Re-implements the semantics of patapsco's normalization chain
(/root/reference/patapsco/util/normalize.py:253-271): for every input string,

    pre_normalize  = NFC( strip_format_chars( drop_nonprintable(
                         collapse_spaces( fix_encoding(text) ))))
    post_normalize = lowercase (config-gated, Python ``str.lower`` semantics)

The chain runs inside vectorized pandas UDFs (Arrow batches); per-element
work uses ``str.translate`` tables and ``unicodedata.normalize`` exactly as
CPython defines them, so output is byte-identical to the reference for every
input — this is the BASELINE.json per-row invariant. We deliberately do NOT
use Spark's JVM ``lower()``/``regexp_replace`` here: JVM lowercasing and
regex whitespace classes differ from Python's on a handful of codepoints.

``fix_encoding`` uses ftfy when installed; otherwise a conservative built-in
mojibake repair (UTF-8 bytes mis-decoded as cp1252/latin-1 — the only
corruption class patapsco handles, see normalize.py module docstring in the
reference) that fixes the reference's own golden
(/root/reference/tests/test_util_normalize.py:54-56).
"""

from __future__ import annotations

import re
import unicodedata
from functools import lru_cache

import pandas as pd

try:  # pragma: no cover - exercised only when ftfy is installed
    import ftfy

    def fix_encoding(text: str) -> str:
        return ftfy.fix_encoding(text)

except ImportError:
    ftfy = None

    # chars that correspond to a single high byte under "sloppy cp1252":
    # cp1252 where the 5 undefined bytes fall back to their latin-1 meaning.
    @lru_cache(maxsize=1)
    def _sloppy_cp1252_reverse() -> dict[str, int]:
        rev: dict[str, int] = {}
        for b in range(0x80, 0x100):
            # latin-1 identity first...
            rev[chr(b)] = b
            # ...and the cp1252 meaning (overrides/adds for 0x80-0x9F);
            # mojibake in the wild comes from either decoder, so accept both
            try:
                rev[bytes([b]).decode("cp1252")] = b
            except UnicodeDecodeError:
                pass
        return rev

    _MOJIBAKE_RUN = None

    def _mojibake_run_re():
        global _MOJIBAKE_RUN
        if _MOJIBAKE_RUN is None:
            chars = "".join(re.escape(c) for c in _sloppy_cp1252_reverse())
            _MOJIBAKE_RUN = re.compile(f"[{chars}]{{2,}}")
        return _MOJIBAKE_RUN

    def _fix_run(m: re.Match) -> str:
        run = m.group(0)
        rev = _sloppy_cp1252_reverse()
        raw = bytes(rev[c] for c in run)
        # only accept a real multi-byte UTF-8 interpretation
        if not any(b >= 0xC2 for b in raw):
            return run
        try:
            fixed = raw.decode("utf-8")
        except UnicodeDecodeError:
            return run
        return fixed if fixed != run else run

    def fix_encoding(text: str) -> str:
        """Repair UTF-8-read-as-cp1252 mojibake (ftfy fallback).

        Finds maximal runs of characters that all map to single high bytes
        under sloppy cp1252 and re-decodes the run as UTF-8 when that yields
        a strictly valid multi-byte interpretation. Genuine single accented
        characters (e.g. lone ``é``) are not valid multi-byte UTF-8 and pass
        through unchanged, mirroring ftfy's "only fix when plausible" rule.
        """
        if not text or all(ord(c) < 0x80 for c in text):
            return text
        for _ in range(3):  # handle doubly-encoded mojibake to a fixed point
            fixed = _mojibake_run_re().sub(_fix_run, text)
            if fixed == text:
                return text
            text = fixed
        return text


# format/control characters stripped by the reference chain
# (/root/reference/patapsco/util/normalize.py:208-213): RTL/LTR marks and
# embeddings, Arabic shaping controls, variation selectors, joiners,
# no-break space, soft hyphen, zero-width chars.
_FORMAT_RANGES = [
    (0x200E, 0x200F),
    (0x202A, 0x202E),
    (0x2066, 0x206B),
    (0x061C, 0x061C),
    (0x206C, 0x206F),
    (0xFE01, 0xFE0F),
    (0x00A0, 0x00A0),
    (0x00AD, 0x00AD),
    (0x200B, 0x200D),
    (0x2060, 0x2063),
]

_FORMAT_TRANS = {cp: None for lo, hi in _FORMAT_RANGES for cp in range(lo, hi + 1)}

# any whitespace except newline, one-or-more → single space (Python \s
# semantics: Unicode whitespace)
_SPACE_RE = re.compile(r"[^\S\n]+")


def update_spaces(text: str) -> str:
    return _SPACE_RE.sub(" ", text)


def remove_control_chars(text: str) -> str:
    return "".join(c for c in text if c.isprintable() or c == "\n")


def remove_format_chars(text: str) -> str:
    return text.translate(_FORMAT_TRANS)


def nfc(text: str) -> str:
    return unicodedata.normalize("NFC", text)


def pre_normalize(text: str) -> str:
    """Full pre-normalization chain; order matters and matches the reference."""
    if text is None:
        return None
    text = fix_encoding(text)
    text = update_spaces(text)
    text = remove_control_chars(text)
    text = remove_format_chars(text)
    return nfc(text)


_ASCII_ONLY = re.compile(r"^[\x20-\x7E\n]*$")


def pre_normalize_series(s: pd.Series) -> pd.Series:
    """Vectorized pre-normalization over an Arrow batch column.

    Fast path: pure printable-ASCII strings (the overwhelming majority of
    web text after extraction) only need whitespace collapsing, which pandas
    does natively; the full per-string chain runs only on the minority that
    contain non-ASCII or control characters.
    """
    s = s.fillna("")
    ascii_mask = s.str.match(_ASCII_ONLY)
    out = s.copy()
    if ascii_mask.any():
        out[ascii_mask] = s[ascii_mask].str.replace(_SPACE_RE, " ", regex=True)
    rest = ~ascii_mask
    if rest.any():
        out[rest] = s[rest].map(pre_normalize)
    return out


def post_normalize_series(s: pd.Series, lowercase: bool = True) -> pd.Series:
    """Post-normalization (indexing-time lowercase), Python semantics."""
    if not lowercase:
        return s
    # pandas Series.str.lower() uses CPython str.lower → byte-identical
    return s.str.lower()


# language-gated dispatch: the reference registers 9 language normalizers
# (/root/reference/patapsco/util/normalize.py:183-202) which all currently
# share the generic chain; the hook is kept so language-specific rules can
# be added without changing callers.
_LANG_NORMALIZERS: dict[str, object] = {}


def normalize_series(s: pd.Series, lang: pd.Series | None = None,
                     lowercase: bool = True) -> pd.Series:
    """pre_normalize then post_normalize, optionally language-gated."""
    out = pre_normalize_series(s)
    return post_normalize_series(out, lowercase=lowercase)


def compare_strings(s1: str, s2: str) -> dict[str, int]:
    """Single-character edit counts between original and normalized text —
    the reference's normalization-diff report
    (/root/reference/patapsco/util/normalize.py:160-180)."""
    import collections
    import difflib

    changes: collections.Counter = collections.Counter()
    for tag, i1, i2, j1, j2 in difflib.SequenceMatcher(None, s1, s2).get_opcodes():
        if tag == "delete" and i2 - i1 == 1:
            changes[f"del {s1[i1:i2]}"] += 1
        elif tag == "replace" and i2 - i1 <= 2 and j2 - j1 == 1:
            changes[f"{s1[i1:i2]} → {s2[j1:j2]}"] += 1
        elif tag == "insert" and j2 - j1 == 1:
            changes[f"ins {s2[j1:j2]}"] += 1
    return dict(changes)


def normalization_report(df, text_col: str = "text"):
    """Corpus-wide normalization-change counts as a DataFrame:
    (change, count) — the distributed version of the reference's per-doc
    Counter merging (docs.py:250-251, 265-269)."""
    import pandas as pd
    from pyspark.sql import functions as F

    def run(batches):
        for pdf in batches:
            normed = pre_normalize_series(pdf[text_col])
            rows: dict[str, int] = {}
            for a, b in zip(pdf[text_col].fillna(""), normed):
                if a != b:
                    for k, v in compare_strings(a, b).items():
                        rows[k] = rows.get(k, 0) + v
            yield pd.DataFrame({"change": list(rows), "count": list(rows.values())}) \
                if rows else pd.DataFrame({"change": pd.Series(dtype=str),
                                           "count": pd.Series(dtype="int64")})

    return (df.select(text_col).mapInPandas(run, schema="change string, count long")
            .groupBy("change").agg(F.sum("count").alias("count")))
