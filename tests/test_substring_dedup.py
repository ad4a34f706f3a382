"""Exact duplicated-substring removal (Lee et al. 2021 ExactSubstr,
re-expressed as a pure-Catalyst k-gram plan) — semantics pinned against a
brute-force Python reference on crafted and randomized corpora."""

import random

import pytest

from patapsco_spark.operators.dedup import substring_dedup


def brute(texts: dict, k: int, min_count: int = 2) -> dict:
    """Reference implementation: every k-gram occurring >= min_count times
    corpus-wide (within-doc repeats count) is cut from every occurrence,
    overlapping windows merged."""
    from collections import Counter

    c = Counter()
    for t in texts.values():
        t = t or ""
        for i in range(len(t) - k + 1):
            c[t[i:i + k]] += 1
    out = {}
    for d, t in texts.items():
        t = t or ""
        marks = [i for i in range(len(t) - k + 1)
                 if c[t[i:i + k]] >= min_count]
        iv = []
        for p in marks:
            if iv and p <= iv[-1][1]:
                iv[-1] = (iv[-1][0], p + k)
            else:
                iv.append((p, p + k))
        removed = sum(e - s for s, e in iv)
        prev, parts = 0, []
        for s, e in iv:
            parts.append(t[prev:s])
            prev = e
        parts.append(t[prev:])
        out[d] = (len(t), removed, "".join(parts))
    return out


def run(spark, texts: dict, k: int, min_count: int = 2) -> dict:
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string")
    rows = substring_dedup(df, k=k, min_count=min_count).collect()
    return {r["doc_id"]: (r["n_chars"], r["n_removed"], r["clean_text"])
            for r in rows}


class TestSubstringDedup:
    def test_cross_doc_span_removed_from_both(self, spark):
        texts = {1: "xxx_SHARED DUPLICATED SPAN_yyy",
                 2: "aaaa_SHARED DUPLICATED SPAN_bb",
                 3: "totally unrelated doc text here"}
        assert run(spark, texts, k=12) == brute(texts, 12)
        # and the span really is gone from both carriers
        got = run(spark, texts, k=12)
        assert "SHARED DUPLICATED SPAN" not in got[1][2]
        assert "SHARED DUPLICATED SPAN" not in got[2][2]
        assert got[3] == (31, 0, texts[3])

    def test_within_doc_repeat_counts(self, spark):
        texts = {1: "abcdefghijklmnop MIDDLE abcdefghijklmnop"}
        got = run(spark, texts, k=16)
        assert got == brute(texts, 16)
        assert got[1][1] > 0  # both occurrences cut

    def test_short_and_null_docs_kept(self, spark):
        texts = {1: "tiny", 2: None, 3: ""}
        got = run(spark, {1: "tiny", 2: None, 3: ""}, k=10)
        assert got[1] == (4, 0, "tiny")
        assert got[2] == (0, 0, "")
        assert got[3] == (0, 0, "")

    def test_overlapping_windows_merge(self, spark):
        # two docs share a 20-char run; with k=10 the 11 marked windows
        # inside it must merge into ONE removed span of exactly 20 chars
        shared = "0123456789ABCDEFGHIJ"
        texts = {1: "L-" + shared + "-R", 2: "l~" + shared + "~r"}
        got = run(spark, texts, k=10)
        assert got == brute(texts, 10)
        assert got[1] == (24, 20, "L--R")

    def test_min_count_threshold(self, spark):
        shared = "SPAN-THAT-REPEATS!"
        texts = {1: "a" + shared, 2: "b" + shared, 3: "c" + shared}
        # appears 3x: survives min_count=4, cut at min_count=3
        kept = run(spark, texts, k=len(shared), min_count=4)
        assert all(v[1] == 0 for v in kept.values())
        cut = run(spark, texts, k=len(shared), min_count=3)
        assert cut == brute(texts, len(shared), 3)
        assert all(v[1] >= len(shared) for v in cut.values())

    def test_randomized_matches_brute_force(self, spark):
        rng = random.Random(42)
        texts = {}
        for d in range(12):
            # small alphabet => plenty of genuine k-gram collisions
            texts[d] = "".join(rng.choice("abc ") for _ in range(60))
        for k in (3, 5, 8):
            assert run(spark, texts, k=k) == brute(texts, k)

    def test_param_validation(self, spark):
        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            substring_dedup(df, k=0)
        with pytest.raises(ValueError):
            substring_dedup(df, min_count=1)
