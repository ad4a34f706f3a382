"""Extended Lucene QueryParser syntax (round-3 verdict #4): the reference's
classic QueryParser (/root/reference/patapsco/retrieve.py:79-82) accepts
wildcards, fuzzy, fielded and range queries. This engine SCORES trailing-*
prefix wildcards (search-time expansion against the term dictionary →
SHOULD-group, Lucene's SCORING_BOOLEAN_REWRITE) and raises ParseError for
the rest — round-3 behavior treated all of them as literal terms that
silently matched nothing.
"""

import pytest

from patapsco_spark.config import IndexConfig, RetrieveConfig, TextConfig
from patapsco_spark.operators.indexer import build_index
from patapsco_spark.operators.queryparse import (
    MUST, MUST_NOT, SHOULD, ParseError, parse_query)
from patapsco_spark.operators.retrieve import (
    _expand_prefix_plans, search_texts)

RAW = TextConfig(stem=None, stopwords=None, lowercase=True)

DOCS = [
    ("w1", "stream streaming gamma gamma gamma", "eng"),
    ("w2", "stream strong gamma gamma gamma", "eng"),
    ("w3", "streams gamma gamma gamma gamma", "eng"),
    ("w4", "gamma delta delta delta delta", "eng"),
    ("w5", "strategy gamma delta delta delta", "eng"),
]


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("wild") / "idx")
    df = spark.createDataFrame(DOCS, "id string, text string, lang string")
    build_index(spark, df, path, IndexConfig(text=RAW, num_shards=2))
    return path


def _hits(spark, idx, q, k=10):
    res = search_texts(spark, idx, [("q", q)], RetrieveConfig(k=k),
                       text_cfg=RAW, mode="boolean")
    return {r["doc_id"]: r["score"] for r in res.collect()}


class TestParseErrors:
    def test_proximity_and_bad_fuzzy_raise(self):
        # round 5: term~ / term~N AND phrase proximity "a b"~N are now
        # SUPPORTED; what still raises is bare ~, distances > 2, float
        # similarity/slop
        plan = parse_query("q", '"stream gamma"~3', mode="boolean")
        assert plan.clauses[0].slop == 3 and plan.clauses[0].phrase
        with pytest.raises(ParseError, match="integer"):
            parse_query("q", '"stream gamma"~1.5', mode="boolean")
        with pytest.raises(ParseError, match="fuzzy"):
            parse_query("q", "alpha AND ~2", mode="boolean")
        with pytest.raises(ParseError, match="edit distance"):
            parse_query("q", "stream~3", mode="boolean")
        with pytest.raises(ParseError, match="float similarity"):
            parse_query("q", "stream~0.8", mode="boolean")
        with pytest.raises(ParseError, match="wildcard and fuzzy"):
            parse_query("q", "stre*~2", mode="boolean")

    def test_fielded_raises(self):
        with pytest.raises(ParseError, match="fielded"):
            parse_query("q", "title:stream", mode="boolean")

    def test_prefixed_phrases_parse(self):
        # regression: the tokenizer's phrase alternative had no [+-]?
        # prefix, so '-"a b"' fell through to the bare-term branch and
        # became literal junk terms ('-"a', 'b"') — valid Lucene syntax
        # silently matching the wrong thing
        p = parse_query("q", '-"cookie banner" keep', mode="boolean")
        assert p.clauses[0].occur == MUST_NOT and p.clauses[0].phrase
        assert [t for t, _ in p.clauses[0].terms] == ["cookie", "banner"]
        p = parse_query("q", '+"exact phrase"^2 other', mode="boolean")
        assert (p.clauses[0].occur == MUST and p.clauses[0].phrase
                and p.clauses[0].boost == 2.0)
        p = parse_query("q", '-"a b"~2 c', mode="boolean")
        assert p.clauses[0].occur == MUST_NOT and p.clauses[0].slop == 2

    def test_glued_range_raises(self):
        # regression: 'foo[a TO b]' tokenized into LITERAL fragments
        # ('foo[a', 'TO', 'b]') and silently matched nothing — brackets
        # inside a term token must refuse loudly like ':' and '~'
        for q in ("foo[a TO b]", "foo{a TO b}", "weird]term", "x[y"):
            with pytest.raises(ParseError, match="range brackets"):
                parse_query("q", q, mode="boolean")

    def test_range_parses_fielded_range_raises(self):
        # round 5: bare term ranges are now SCORED; fielded ranges still
        # raise (single-field index), and malformed brackets raise loudly
        plan = parse_query("q", "[alpha TO gamma]", mode="boolean")
        assert plan.clauses[0].trange == ("alpha", "gamma", True, True)
        plan = parse_query("q", "{alpha TO gamma]", mode="boolean")
        assert plan.clauses[0].trange == ("alpha", "gamma", False, True)
        with pytest.raises(ParseError, match="fielded"):
            parse_query("q", "date:{2020 TO 2021}", mode="boolean")
        with pytest.raises(ParseError, match="malformed range"):
            parse_query("q", "[alpha gamma]", mode="boolean")

    def test_leading_wildcards_raise(self):
        # round 5: general wildcards (st?eam, st*am) now PARSE; what still
        # raises is a LEADING wildcard (Lucene allowLeadingWildcard=false
        # default) and bare match-all
        with pytest.raises(ParseError, match="leading wildcard"):
            parse_query("q", "*eam", mode="boolean")
        with pytest.raises(ParseError, match="leading wildcard"):
            parse_query("q", "?tream", mode="boolean")
        with pytest.raises(ParseError, match="match-all"):
            parse_query("q", "alpha OR *", mode="boolean")

    def test_general_wildcards_parse(self):
        plan = parse_query("q", "st?eam AND st*am", mode="boolean")
        a, b = plan.clauses
        assert a.wild == "st?eam" and not a.prefix and a.occur == MUST
        assert b.wild == "st*am" and b.occur == MUST
        # trailing-only * stays on the dedicated prefix path
        plan2 = parse_query("q", "stre*", mode="boolean")
        assert plan2.clauses[0].prefix and plan2.clauses[0].wild is None
        # trailing * PLUS another wildcard char is a general pattern
        plan3 = parse_query("q", "s?re*", mode="boolean")
        assert plan3.clauses[0].wild == "s?re*" and not plan3.clauses[0].prefix

    def test_prefix_wildcard_parses(self):
        plan = parse_query("q", "stre* AND gamma", mode="boolean")
        w, g = plan.clauses
        assert w.prefix and w.terms == [("stre", 1.0)] and w.occur == MUST
        assert not g.prefix
        # boost survives on a wildcard
        plan2 = parse_query("q", "stre*^2", mode="boolean")
        assert plan2.clauses[0].prefix and plan2.clauses[0].boost == 2.0

    def test_quoted_phrase_protects_specials(self):
        # inside quotes nothing is wildcard/fielded syntax
        plan = parse_query("q", '"stream gamma"', mode="boolean")
        assert plan.clauses[0].phrase


class TestPrefixScoring:
    def test_expansion_equals_explicit_or(self, spark, idx):
        """'stre*' must score exactly like the explicit disjunction of the
        matching index terms (stream, streaming, streams, strategy — NOT
        strong), grouped — the SCORING_BOOLEAN_REWRITE identity."""
        got = _hits(spark, idx, "stre*")
        want = _hits(spark, idx, "(stream OR streaming OR streams)")
        assert got == want and set(got) == {"w1", "w2", "w3"}

    def test_prefix_as_must_filters(self, spark, idx):
        got = _hits(spark, idx, "delta AND stre*")
        assert set(got) == set()  # no doc has both delta and stre*
        got2 = _hits(spark, idx, "gamma AND str*")
        assert set(got2) == {"w1", "w2", "w3", "w5"}

    def test_prefix_no_match_is_empty_not_error(self, spark, idx):
        assert _hits(spark, idx, "zzz*") == {}
        # as MUST it excludes everything rather than matching nothing-ly
        assert _hits(spark, idx, "gamma AND zzz*") == {}
        # as SHOULD next to a real term it contributes nothing
        got = _hits(spark, idx, "delta OR zzz*")
        assert set(got) == {"w4", "w5"}

    def test_too_many_expansions_raises(self, spark, idx):
        plans = [parse_query("q", "g*", mode="boolean")]
        with pytest.raises(ParseError, match="expands to more than"):
            _expand_prefix_plans(spark, idx, plans, num_shards=2,
                                 max_expansions=0)


class TestGeneralWildcardScoring:
    def test_inner_star_equals_explicit_or(self, spark, idx):
        """'st*ng' must score exactly like the explicit disjunction of the
        matching index terms (streaming, strong) — same
        SCORING_BOOLEAN_REWRITE identity as the prefix path."""
        got = _hits(spark, idx, "st*ng")
        want = _hits(spark, idx, "(streaming OR strong)")
        assert got == want and set(got) == {"w1", "w2"}

    def test_question_mark_single_char(self, spark, idx):
        # ? is exactly ONE character: s?ream matches stream only (not
        # streams/streaming — the $-anchored regex), str?am likewise
        got = _hits(spark, idx, "s?ream")
        want = _hits(spark, idx, "stream")
        assert got == want and set(got) == {"w1", "w2"}
        assert _hits(spark, idx, "stream?") == _hits(spark, idx, "streams")

    def test_mixed_pattern_and_must(self, spark, idx):
        # s?r*gy -> strategy; as MUST it filters
        got = _hits(spark, idx, "delta AND s?r*gy")
        assert set(got) == {"w5"}

    def test_regex_metachars_in_pattern_are_literal(self, spark, idx):
        # a '.' in the pattern is a literal dot, not regex-any: 'strea.'
        # would otherwise match 'stream'
        assert _hits(spark, idx, "gamma AND strea.?") == {}

    def test_no_match_is_empty_not_error(self, spark, idx):
        assert _hits(spark, idx, "zz?q*") == {}
        got = _hits(spark, idx, "delta OR zz?q*")
        assert set(got) == {"w4", "w5"}

    def test_wildcard_cap_raises(self, spark, idx):
        plans = [parse_query("q", "g?mma*", mode="boolean")]
        with pytest.raises(ParseError, match="expands to more than"):
            _expand_prefix_plans(spark, idx, plans, num_shards=2,
                                 max_expansions=0)


class TestRegexpParsing:
    def test_regexp_parses_with_occur_and_boost(self):
        plan = parse_query("q", '-/gamma/ AND /str(eam|ong)/^2',
                           mode="boolean")
        n, r = plan.clauses
        assert n.occur == MUST_NOT and n.regex == "gamma"
        assert r.regex == "str(eam|ong)" and r.boost == 2.0 and r.occur == MUST

    def test_bad_regexps_raise(self):
        with pytest.raises(ParseError, match="does not compile"):
            parse_query("q", "/st(/", mode="boolean")
        with pytest.raises(ParseError, match="unterminated"):
            parse_query("q", "/stream", mode="boolean")

    def test_slash_inside_term_is_literal(self):
        # only /.../-delimited tokens are regexps (Lucene classic parser
        # semantics); a path-ish token stays a literal term
        plan = parse_query("q", "a/b", mode="boolean")
        assert plan.clauses[0].regex is None
        assert plan.clauses[0].terms == [("a/b", 1.0)]


class TestRegexpScoring:
    def test_alternation_equals_explicit_or(self, spark, idx):
        got = _hits(spark, idx, "/str(eam|ong)/")
        want = _hits(spark, idx, "(stream OR strong)")
        assert got == want and set(got) == {"w1", "w2"}

    def test_regexp_is_anchored(self, spark, idx):
        # Lucene RegexpQuery matches the WHOLE term: /tream/ matches
        # nothing even though 'tream' is a substring of three terms
        assert _hits(spark, idx, "/tream/") == {}
        got = _hits(spark, idx, "/s.reams?/")
        want = _hits(spark, idx, "(stream OR streams)")
        assert got == want

    def test_no_literal_prefix_full_scan_path(self, spark, idx):
        # pattern opening with a metachar cannot push StringStartsWith —
        # still correct via the anchored rlike over the dictionary
        got = _hits(spark, idx, "/.*amma/")
        assert got == _hits(spark, idx, "gamma")

    def test_regexp_as_must_not(self, spark, idx):
        # /str.*/ sweeps strategy too, so w5 is excluded along with w1-w3
        got = _hits(spark, idx, "gamma NOT /str.*/")
        assert set(got) == {"w4"}

    def test_regexp_cap_raises(self, spark, idx):
        plans = [parse_query("q", "/g.mma/", mode="boolean")]
        with pytest.raises(ParseError, match="expands to more than"):
            _expand_prefix_plans(spark, idx, plans, num_shards=2,
                                 max_expansions=0)


class TestFuzzyParsing:
    def test_fuzzy_parses(self):
        p = parse_query("q", "stream~", mode="boolean")
        assert p.clauses[0].fuzzy == 2
        assert p.clauses[0].terms == [("stream", 1.0)]
        assert parse_query("q", "stream~1", mode="boolean").clauses[0].fuzzy == 1
        assert parse_query("q", "stream~0", mode="boolean").clauses[0].fuzzy == 0

    def test_fuzzy_with_occur_and_boost(self):
        p = parse_query("q", "+stream~1^3", mode="boolean")
        c = p.clauses[0]
        assert c.occur == MUST and c.boost == 3.0 and c.fuzzy == 1


class TestFuzzyScoring:
    def test_fuzzy_equals_explicit_or(self, spark, idx):
        """'stream~2' must score exactly like the explicit disjunction of
        the dictionary terms within Levenshtein distance 2 (stream,
        streams — NOT strong at 3, NOT streaming at 3)."""
        got = _hits(spark, idx, "stream~2")
        want = _hits(spark, idx, "(stream OR streams)")
        assert got == want and set(got) == {"w1", "w2", "w3"}

    def test_fuzzy_as_must_filters(self, spark, idx):
        got = _hits(spark, idx, "delta AND stream~1")
        assert set(got) == set()
        got2 = _hits(spark, idx, "gamma AND stream~1")
        assert set(got2) == {"w1", "w2", "w3"}

    def test_fuzzy_no_match_is_empty_not_error(self, spark, idx):
        assert _hits(spark, idx, "zzzzzzzz~1") == {}
        assert _hits(spark, idx, "gamma AND zzzzzzzz~1") == {}
        got = _hits(spark, idx, "delta OR zzzzzzzz~1")
        assert set(got) == {"w4", "w5"}

    def test_fuzzy_zero_is_exact(self, spark, idx):
        assert _hits(spark, idx, "strong~0") == _hits(spark, idx, "strong")

    def test_fuzzy_cap_raises(self, spark, idx):
        from patapsco_spark.operators.retrieve import _expand_multiterm_plans
        plans = [parse_query("q", "gamma~2", mode="boolean")]
        with pytest.raises(ParseError, match="expands to more than"):
            _expand_multiterm_plans(spark, idx, plans, num_shards=2,
                                    max_expansions=0)


class TestRangeScoring:
    # vocab: delta gamma strategy stream streaming streams strong
    def test_inclusive_range(self, spark, idx):
        # [strategy TO streaming]: strategy, stream, streaming
        hits = _hits(spark, idx, "[strategy TO streaming]")
        assert set(hits) == {"w1", "w2", "w5"}

    def test_exclusive_bounds(self, spark, idx):
        # {strategy TO streaming}: stream only
        hits = _hits(spark, idx, "{strategy TO streaming}")
        assert set(hits) == {"w1", "w2"}

    def test_open_bounds(self, spark, idx):
        assert set(_hits(spark, idx, "[streams TO *]")) == {"w2", "w3"}
        assert set(_hits(spark, idx, "[* TO delta]")) == {"w4", "w5"}

    def test_range_equals_expanded_or(self, spark, idx):
        # SCORING_BOOLEAN_REWRITE: score-identical to the explicit OR group
        rng = _hits(spark, idx, "[strategy TO streaming]")
        explicit = _hits(spark, idx, "(strategy OR stream OR streaming)")
        assert rng == explicit

    def test_range_as_must_and_must_not(self, spark, idx):
        # 'strategy' < 'stream': [strategy TO stream] = {strategy, stream};
        # only w5 has delta AND a term in that range
        assert set(_hits(spark, idx, "delta AND [strategy TO stream]")) \
            == {"w5"}
        assert set(_hits(spark, idx, "gamma -[delta TO delta]")) \
            == {"w1", "w2", "w3"}

    def test_empty_range_matches_nothing(self, spark, idx):
        assert _hits(spark, idx, "[zz TO zzz]") == {}
        # ...and as a SHOULD alongside a live term it contributes nothing
        assert set(_hits(spark, idx, "delta [zz TO zzz]")) == {"w4", "w5"}
