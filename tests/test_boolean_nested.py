"""Nested boolean query grouping — Lucene QueryParser semantics for
parenthesized sub-queries (the reference reaches these via Lucene
QueryParser + luqum, /root/reference/patapsco/topics.py:362-414; round-2
silently mis-parsed parens as term characters).

Scoring oracle: Lucene BooleanQuery sums the scores of MATCHING scoring
clauses only; a sub-query clause matches iff its own boolean constraints
hold and contributes boost × its internal score. So `(a OR b) AND c` must
score exactly like the flat disjunction `a b c` on the docs that satisfy
the constraint — an independently computable identity we pin here.
"""

import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.queryparse import (
    MUST, MUST_NOT, SHOULD, parse_query)
from patapsco_spark.operators.retrieve import search_texts

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)

DOCS = [
    ("n1", "alpha gamma zeta zeta zeta", "eng"),       # a, c
    ("n2", "beta gamma zeta zeta zeta", "eng"),        # b, c
    ("n3", "alpha beta gamma zeta zeta", "eng"),       # a, b, c
    ("n4", "alpha zeta zeta zeta zeta", "eng"),        # a only — no c
    ("n5", "gamma zeta zeta zeta zeta", "eng"),        # c only
    ("n6", "delta alpha beta zeta zeta", "eng"),       # a, b, no c
    ("n7", "delta zeta zeta zeta zeta", "eng"),
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("nested") / "idx")
    df = spark.createDataFrame(DOCS, "id string, text string, lang string")
    build_index(spark, df, path, IndexConfig(text=RAW, num_shards=2))
    return path


def _hits(spark, idx, q, mode="boolean"):
    res = search_texts(spark, idx, [("q", q)], RetrieveConfig(k=10),
                       text_cfg=RAW, mode=mode)
    return {r["doc_id"]: r["score"] for r in res.collect()}


class TestParser:
    def test_group_and_term(self):
        plan = parse_query("q", "(alpha OR beta) AND gamma", mode="boolean")
        g, c = plan.clauses
        assert g.group is not None and g.occur == MUST  # AND promotes group
        assert [t for t, _ in g.group[0].terms] == ["alpha"]
        assert g.group[0].occur == SHOULD and g.group[1].occur == SHOULD
        assert c.occur == MUST and c.terms == [("gamma", 1.0)]

    def test_nested_not_group(self):
        plan = parse_query("q", "delta NOT (alpha AND beta)", mode="boolean")
        d, g = plan.clauses
        assert d.terms == [("delta", 1.0)]
        assert g.occur == MUST_NOT and g.group is not None
        assert all(c.occur == MUST for c in g.group)

    def test_group_boost_and_prefix(self):
        plan = parse_query("q", '+(alpha beta)^2 -gamma', mode="boolean")
        g, c = plan.clauses
        assert g.occur == MUST and g.boost == 2.0 and len(g.group) == 2
        assert c.occur == MUST_NOT

    def test_double_nesting(self):
        plan = parse_query("q", "((alpha OR beta) AND gamma) OR delta",
                           mode="boolean")
        outer, d = plan.clauses
        assert outer.group is not None
        inner = outer.group[0]
        assert inner.group is not None and inner.occur == MUST
        assert outer.group[1].terms == [("gamma", 1.0)]
        assert d.terms == [("delta", 1.0)]

    def test_dangling_hyphen_is_dropped_not_prohibiting(self):
        # "data - stream" (hyphen from a raw topic title): the bare '-' must
        # be dropped, NOT flip 'stream' to MUST_NOT — only '-(' / '+('
        # prefix a group
        plan = parse_query("q", "data - stream", mode="boolean")
        assert [(c.occur, c.terms) for c in plan.clauses] == [
            (SHOULD, [("data", 1.0)]), (SHOULD, [("stream", 1.0)])]
        plan2 = parse_query("q", "data -(a b) + c", mode="boolean")
        assert plan2.clauses[1].occur == MUST_NOT  # group prefix still works
        assert plan2.clauses[2].occur == SHOULD    # dangling '+' dropped

    def test_dangling_hyphen_consumes_pending_occur(self):
        # round-3 advice: a dropped dangling '+'/'-' must also CONSUME any
        # pending AND/NOT occur — "window AND - stream" must not propagate
        # MUST onto 'stream' past the dropped hyphen (round-2 behavior)
        plan = parse_query("q", "window AND - stream", mode="boolean")
        assert [(c.occur, c.terms) for c in plan.clauses] == [
            (MUST, [("window", 1.0)]), (SHOULD, [("stream", 1.0)])]
        plan2 = parse_query("q", "alpha NOT - stream", mode="boolean")
        assert [(c.occur, c.terms) for c in plan2.clauses] == [
            (SHOULD, [("alpha", 1.0)]), (SHOULD, [("stream", 1.0)])]

    def test_flat_queries_unchanged(self):
        plan = parse_query("q", "window AND stream NOT batch", mode="boolean")
        w, s, b = plan.clauses
        assert (w.occur, s.occur, b.occur) == (MUST, MUST, MUST_NOT)
        assert all(c.group is None for c in plan.clauses)


class TestScoring:
    def test_group_and_matches_constraint(self, spark, idx):
        got = _hits(spark, idx, "(alpha OR beta) AND gamma")
        assert set(got) == {"n1", "n2", "n3"}

    def test_group_and_scores_equal_flat_disjunction(self, spark, idx):
        """On constraint-satisfying docs the nested score must equal the flat
        SHOULD-sum of the same terms (Lucene sums matching clauses; the
        grouping changes matching, never per-term scores)."""
        nested = _hits(spark, idx, "(alpha OR beta) AND gamma")
        flat = _hits(spark, idx, "alpha beta gamma", mode="plain")
        for d, s in nested.items():
            assert s == pytest.approx(flat[d], rel=1e-9)

    def test_nested_not_excludes_conjunction_only(self, spark, idx):
        # NOT (alpha AND beta): only docs with BOTH alpha and beta excluded
        got = _hits(spark, idx, "delta NOT (alpha AND beta)")
        assert set(got) == {"n7"}  # n6 has alpha+beta → excluded
        both = _hits(spark, idx, "delta NOT (alpha AND zzz)")
        assert set(both) == {"n6", "n7"}  # conjunction can't match → no excl

    def test_group_boost_scales_group_only(self, spark, idx):
        base = _hits(spark, idx, "(alpha beta) gamma")
        boosted = _hits(spark, idx, "(alpha beta)^2 gamma")
        flat_g = _hits(spark, idx, "gamma", mode="plain")
        for d in base:
            g = flat_g.get(d, 0.0)
            assert boosted[d] - g == pytest.approx(2 * (base[d] - g), rel=1e-9)

    def test_double_nested_or(self, spark, idx):
        got = _hits(spark, idx, "((alpha OR beta) AND gamma) OR delta")
        assert set(got) == {"n1", "n2", "n3", "n6", "n7"}

    def test_explain_decomposes_nested_scores_exactly(self, spark, idx):
        """explain() must gate nested-group components on group matching and
        scale by ancestor boosts so per-doc contributions sum to the search
        score; clause labels are nesting paths."""
        from collections import defaultdict

        from patapsco_spark.operators.retrieve import explain

        q = "(alpha OR beta)^2 AND gamma"
        hits = _hits(spark, idx, q)
        plan = parse_query("q", q, mode="boolean")
        exp = explain(spark, idx, plan, list(hits)).collect()
        sums = defaultdict(float)
        labels = set()
        for r in exp:
            sums[r["doc_id"]] += r["contribution"]
            labels.add(r["clause"])
        for d, s in hits.items():
            assert sums[d] == pytest.approx(s, rel=1e-9)
        assert any("." in lb for lb in labels)  # nested path labels present
