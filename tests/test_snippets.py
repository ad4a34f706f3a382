"""Snippet extraction + highlighting (operators/snippets.py)."""
from __future__ import annotations

from patapsco_spark.operators.snippets import (best_window, make_snippets,
                                               render_snippet)


class TestBestWindow:
    def test_short_doc_is_whole(self):
        assert best_window(["a", "b", "hit"], {"hit"}, 10) == (0, 1)

    def test_densest_window_wins(self):
        toks = ["x"] * 10 + ["hit"] + ["x"] * 10 + ["hit", "y", "hit"] + ["x"] * 10
        s, score = best_window(toks, {"hit"}, 5)
        assert score == 2
        assert s <= 21 and s + 5 > 23  # window covers both trailing hits

    def test_tie_prefers_earliest(self):
        toks = ["hit"] + ["x"] * 10 + ["hit"] + ["x"] * 10
        assert best_window(toks, {"hit"}, 3) == (0, 1)

    def test_case_insensitive_match(self):
        assert best_window(["HIT"], {"hit"}, 5) == (0, 1)


class TestRender:
    def test_highlight_and_ellipses(self):
        toks = ["a", "b", "hit", "c", "d", "e"]
        assert render_snippet(toks, {"hit"}, 1, 3) == "… b <em>hit</em> c …"
        assert render_snippet(toks, {"hit"}, 0, 6) == "a b <em>hit</em> c d e"


class TestMakeSnippets:
    def test_end_to_end(self, spark):
        results = spark.createDataFrame(
            [("q1", "d1"), ("q1", "d2"), ("q2", "d1")],
            "query_id string, doc_id string")
        store = spark.createDataFrame(
            [("d1", "alpha beta gamma delta beta"),
             ("d2", "nothing to see here"),
             ("d3", "never joined")],
            "doc_id string, text string")
        out = make_snippets(results, store,
                            {"q1": ["beta"], "q2": ["delta"]}, window=3)
        rows = {(r.query_id, r.doc_id): r for r in out.collect()}
        assert set(rows) == {("q1", "d1"), ("q1", "d2"), ("q2", "d1")}
        # betas sit at positions 1 and 4 — no width-3 window holds both;
        # earliest max-scoring window wins
        assert rows[("q1", "d1")].n_matches == 1
        assert rows[("q1", "d1")].snippet == "alpha <em>beta</em> gamma …"
        assert rows[("q1", "d2")].n_matches == 0
        # earliest window containing delta starts at position 1
        assert rows[("q2", "d1")].snippet == "… beta gamma <em>delta</em> …"

    def test_store_never_shuffled(self, spark):
        results = spark.createDataFrame([("q1", "d1")],
                                        "query_id string, doc_id string")
        store = spark.createDataFrame([("d1", "x")],
                                      "doc_id string, text string")
        plan = make_snippets(results, store, {"q1": ["x"]})._jdf \
            .queryExecution().executedPlan().toString()
        assert plan.count("BroadcastHashJoin") >= 2
        # the only shuffle is the tiny hit-id distinct feeding the
        # broadcast; the store side goes scan → semi-join directly
        assert plan.count("Exchange hashpartitioning") <= 1
