"""Query parsing → structured clause plans.

The reference emits three query syntaxes (engine syntax strings consumed by
Lucene, /root/reference/patapsco/topics.py:338-497):

- plain:   "inform retriev"                        (QueryGenerator)
- boolean: "Flooding AND Mexico", "a^0.8 b^0.4"    (LuceneQueryGenerator)
- PSQ:     "psq AND (gato^0.8 felino^0.2) AND (…)" (PSQGenerator)
- quoted phrases parse to ``Clause(phrase=True)`` — positional scoring when
  the index has a positions sidecar, bag-of-words degrade otherwise

We parse all three into one structured plan — a list of clauses

    Clause(occur = SHOULD|MUST|MUST_NOT, boost, terms = [(term, prob), ...])

scored as Lucene's BooleanQuery does: score = Σ over *matching* scoring
clauses; MUST clauses filter, MUST_NOT clauses exclude. A multi-(term,prob)
clause is a PSQ clause scored on *expected* statistics
(etf = Σ p·tf, edf = Σ p·df — Darwish & Oard's probabilistic structured
queries), which reproduces the reference's pinned PSQ goldens
(/root/reference/tests/test_psq.py:48-66).

"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

SHOULD, MUST, MUST_NOT = "SHOULD", "MUST", "MUST_NOT"


class ParseError(ValueError):
    """A Lucene QueryParser construct this engine cannot score. The
    reference's classic QueryParser (/root/reference/patapsco/retrieve.py:79-82)
    accepts wildcards, fuzzy, proximity, fielded and range queries; as of
    round 5 we score general wildcards (``te*``, ``te?t``, ``t*st`` — any
    pattern with a literal first character), fuzzy ``term~N``, phrase
    proximity ``"a b"~N`` and term ranges ``[a TO b]`` (all expanded or
    rewritten against the index at search time) and refuse the rest —
    fielded queries, LEADING wildcards (Lucene's allowLeadingWildcard=false
    default raises too), bare ``~``/``*`` — LOUDLY.
    Round-3 verdict: treating ``title:foo`` etc. as literal terms was a
    silent-wrong-answer class (the literal just matches nothing)."""


@dataclass
class Clause:
    occur: str = SHOULD
    boost: float = 1.0
    terms: list[tuple[str, float]] = field(default_factory=list)
    # True for a quoted phrase: scored as an exact positional phrase when the
    # index carries the positions sidecar (IndexConfig.positions=True),
    # degrading to bag-of-words otherwise — the reference ALWAYS degrades
    # (its index stores DOCS_AND_FREQS, no positions, index.py:52), so the
    # positional path strictly exceeds reference parity.
    phrase: bool = False
    # a parenthesized sub-query ("(a OR b) AND c"): terms is empty and the
    # clause matches iff the sub-clauses' boolean constraints hold, scoring
    # boost × Σ matching sub-clause scores — Lucene's nested BooleanQuery
    # (the reference reaches this through Lucene QueryParser + luqum,
    # /root/reference/patapsco/topics.py:362-414)
    group: list["Clause"] | None = None
    # True for a trailing-* prefix wildcard ("te*"): terms holds [(prefix,
    # 1.0)]; search-time expansion against the index term dictionary rewrites
    # it to a SHOULD-group over the matching terms (Lucene's
    # SCORING_BOOLEAN_REWRITE for multi-term queries), capped at
    # MAX_PREFIX_EXPANSIONS like Lucene's BooleanQuery.maxClauseCount
    prefix: bool = False
    # max edit distance for a fuzzy term ("term~" / "term~N", round-5):
    # terms holds [(base, 1.0)]; search-time expansion rewrites it to a
    # SHOULD-group over dictionary terms within Levenshtein distance N
    # (length-range pushed to the term_stats scan, distance computed
    # JVM-side). N∈{0,1,2} like Lucene FuzzyQuery's LEVENSHTEIN_MAXIMUM_
    # SUPPORTED_DISTANCE; departure from Lucene documented at the expansion
    # site (plain Levenshtein, no transpositions; boolean rewrite, not
    # TopTermsBlended). None = not fuzzy.
    fuzzy: int | None = None
    # proximity slop for a quoted phrase ('"a b"~N', round-5): maximum
    # extra width allowed around the in-order match. 0 = exact phrase.
    # Semantics are ORDERED anchored-greedy proximity (SpanNearQuery
    # inOrder=true shape): from each occurrence of the first word, chain
    # each later word to its EARLIEST position after the previous link; the
    # anchor matches iff last - first - (n_words-1) ≤ slop, and tf = the
    # number of matching anchors. Documented departures from Lucene's
    # SloppyPhraseScorer: no unordered/transposed matches (Lucene allows
    # them at slop ≥ 2) and integer match counts instead of Σ 1/(1+slop_i)
    # weights — Lucene's greedy repeat-handling is order-dependent and not
    # replayable declaratively; this definition is exact, reduces to the
    # exact-phrase count at slop=0, and is SQL-replayable (the oracle runs
    # the same chain as correlated min() subqueries).
    slop: int = 0
    # term range query ('[a TO b]' / '{a TO b}' / mixed, round-5):
    # (lo, hi, lo_inclusive, hi_inclusive), either bound None for the open
    # '*'. Expanded at search time against the term dictionary (range
    # predicate pushed to the term_stats scan) into a SHOULD-group —
    # SCORING_BOOLEAN_REWRITE, matching our wildcard/fuzzy choice and
    # documented as a departure from Lucene TermRangeQuery's default
    # constant-score rewrite. Bounds are matched RAW against indexed terms
    # (the classic parser does not analyze range bounds either).
    trange: tuple | None = None
    # general wildcard pattern ('te?t', 't*st', 'te*t*' — round 5): the raw
    # pattern; terms holds [(pattern, 1.0)] as a placeholder. Expanded at
    # search time against the term dictionary (the literal prefix before the
    # first wildcard char pushes StringStartsWith to the term-sorted stats
    # scan; the full pattern filters JVM-side as an anchored regex) into a
    # SHOULD-group — SCORING_BOOLEAN_REWRITE, same as prefix/fuzzy/range.
    # The first character must be literal: Lucene's classic parser rejects
    # leading wildcards by default (allowLeadingWildcard=false) and a
    # leading-* scan could not prune anything at 10^8 terms. Pure trailing-*
    # patterns take the dedicated prefix path (pushdown only, no regex).
    wild: str | None = None
    # regexp query ('/pat/', round 5 — Lucene RegexpQuery via the classic
    # parser's /regexp/ syntax): the pattern between the slashes; terms
    # holds [(pattern, 1.0)] as a placeholder. Expanded at search time
    # against the term dictionary into a SHOULD-group
    # (SCORING_BOOLEAN_REWRITE). The match is ANCHORED (the whole term must
    # match, like Lucene RegexpQuery). Documented departure: the pattern
    # language is Java regex (Spark ``rlike``), not Lucene's RegExp class —
    # identical for the common subset (literals, ., [...], *, +, ?, |,
    # grouping); Lucene's optional operators (~ complement, # empty, @
    # any-string) are off by default there and unsupported here, and the
    # pattern cannot contain '/' or whitespace (analyzed terms contain
    # neither). When the
    # pattern opens with literal characters they push StringStartsWith to
    # the term-sorted stats scan; otherwise the expansion is one full
    # dictionary scan per batch — the same cost class as Lucene's automaton
    # walk over its terms index, and still never a postings scan.
    regex: str | None = None
    # span-first constraint (Lucene SpanFirstQuery, round 5): the clause's
    # single term matches only at token positions < ``first`` (0-based, so
    # first=N means "within the document's first N tokens" — title-ish /
    # lede matching without a separate field). Programmatic only, like
    # Lucene (the classic parser has no span syntax). Search rewrites it to
    # a pseudo-term whose positional postings carry tf = the count of
    # qualifying occurrences (the positions sidecar is REQUIRED — there is
    # no reference bag-of-words degrade to mirror, so a positions-less
    # index refuses loudly). Scoring matches the engine's phrase
    # convention: BM25 idf = the underlying term's idf (SpanWeight builds
    # its SimWeight from the wrapped term's stats); QLD scores the
    # pseudo-term's own (df, cf). None = unconstrained.
    first: int | None = None
    # phrase-prefix (ES match_phrase_prefix / Lucene MultiPhrasePrefixQuery,
    # round 5): ``terms`` holds the FIXED leading words and ``pprefix`` the
    # prefix the LAST position must start with — "search-as-you-type" over
    # body text ('"data str"' matching "data stream", "data strategy", …).
    # Programmatic only (phrase_prefix_plan); quoted-phrase syntax keeps
    # its all-literal contract (see _check_term_token). Search expands the
    # prefix against the term dictionary in term order, capped at
    # MAX_PHRASE_PREFIX_EXPANSIONS like Lucene's setMaxExpansions (the cap
    # truncates silently — Lucene stops collecting, it does not throw),
    # and rewrites to a pseudo-term whose positional postings carry
    # tf = |{anchors: fixed words in sequence, any expansion at the last
    # slot}|. BM25 idf = Σ fixed-word idfs + ONE SynonymQuery-style idf for
    # the expansion set (df = max member df) — a documented departure from
    # Lucene MultiPhraseQuery, which sums idf over EVERY expanded term and
    # so scores higher the more terms the cap happens to admit. QLD scores
    # the pseudo-term's own (df, cf). None = not a phrase-prefix clause.
    pprefix: str | None = None
    # unordered proximity (Lucene SpanNearQuery(inOrder=false), round 5):
    # ``terms`` holds exactly TWO words and ``near`` the slop — the clause
    # matches docs where the words co-occur within ``near`` intervening
    # tokens IN EITHER ORDER ("a NEAR/3 b"). tf = anchors: occurrences of
    # the FIRST word with any occurrence of the second within the window
    # (the anchored counting convention this engine documents for ordered
    # sloppy phrases at Clause.slop; Lucene counts minimal intervals,
    # which can differ when occurrences cluster — departure documented
    # here once, at the semantics' source of truth). BM25 idf = Σ member
    # idfs (SpanWeight over both terms' stats, like phrases); QLD scores
    # the pseudo-term's own (df, cf). Programmatic only
    # (span_near_plan); None = not a proximity clause.
    near: int | None = None
    # with ``near`` set, True inverts the window test (Lucene
    # SpanNotQuery with pre/post slop): tf counts FIRST-word occurrences
    # with NO second-word occurrence within the window — "data, but not
    # near advertisement". The exclusion term shapes tf only; BM25 idf is
    # the INCLUDE term's idf alone (SpanNotQuery scores from the include
    # span's weight). A doc containing the first word and no second word
    # at all keeps every occurrence.
    near_not: bool = False
    # ordered minimal intervals (Lucene IntervalQuery,
    # Intervals.maxgaps(g, Intervals.ordered(w1, …, wn)) — round 5):
    # ``terms`` holds TWO OR MORE words (repeats allowed); the clause
    # matches docs containing the words in order with at most ``gaps``
    # TOTAL intervening non-member tokens (q − p − (n−1) ≤ gaps). tf
    # counts MINIMAL intervals: the greedy chain from each first-word
    # position p takes each later word at its earliest position after the
    # previous link, ending at q; chains are monotone in p, so (p, q) is
    # minimal iff no later first-word occurrence chains to the same q —
    # the textbook minimal-interval semantics (Clarke, Cormack &
    # Burkowski 1995 "An algebra for structured text search"; Lucene's
    # IntervalIterator), i.e. the exact count the Clause.slop docs note
    # Lucene uses where this engine's sloppy phrases count anchors. BM25
    # idf = Σ member idfs (SpanWeight convention, like near); QLD scores
    # the pseudo-term's own (df, cf). Programmatic only (interval_plan);
    # None = not an interval clause.
    gaps: int | None = None
    # with ``gaps`` set, an optional exclusion term (Lucene
    # Intervals.notContaining): a minimal interval (p, q) is discarded
    # when any occurrence x of this term lies INSIDE it (p ≤ x ≤ q,
    # endpoints included — Lucene's containment test). Shapes tf only;
    # contributes no weight (the non_containing filter has no SimWeight).
    intv_not: str | None = None
    # with ``gaps`` set, an optional REQUIRED containment term (Lucene
    # Intervals.containing): a minimal interval (p, q) counts only when
    # some occurrence x of this term lies inside it (p ≤ x ≤ q). The
    # positive complement of intv_not; like it, shapes tf only and never
    # weighs (Lucene's filtered interval sources score from the wrapped
    # source's terms). Both filters may be set on one clause.
    intv_has: str | None = None


@dataclass
class QueryPlan:
    qid: str
    clauses: list[Clause]
    mode: str = "plain"


def iter_term_clauses(clauses: list[Clause]):
    """All leaf (term-bearing) clauses, descending through nested groups."""
    for c in clauses:
        if c.group:
            yield from iter_term_clauses(c.group)
        else:
            yield c


def plan_plain(qid: str, terms: list[str]) -> QueryPlan:
    """One SHOULD clause per term occurrence — duplicate query terms add up,
    exactly like Lucene's WhitespaceAnalyzer query parsing."""
    return QueryPlan(qid, [Clause(SHOULD, 1.0, [(t, 1.0)]) for t in terms], "plain")


def span_first_plan(qid: str, spec: list[tuple[str, int]],
                    extra_terms: list[str] | None = None) -> QueryPlan:
    """SpanFirstQuery plan builder (programmatic, like Lucene's span API):
    one SHOULD clause per (term, end) pair matching the term only at token
    positions < end, plus optional unconstrained SHOULD terms. Requires an
    index with the positions sidecar (search refuses loudly otherwise)."""
    clauses = []
    for term, end in spec:
        if end < 1:
            raise ParseError(f"span_first end must be >= 1, got {end}")
        if not term or " " in term:
            raise ParseError(f"span_first takes a single term, got {term!r}")
        clauses.append(Clause(SHOULD, 1.0, [(term, 1.0)], first=int(end)))
    for t in extra_terms or []:
        clauses.append(Clause(SHOULD, 1.0, [(t, 1.0)]))
    return QueryPlan(qid, clauses, "span_first")


def span_near_plan(qid: str, pairs: list[tuple[str, str, int]],
                   extra_terms: list[str] | None = None) -> QueryPlan:
    """Unordered-proximity plan builder: one SHOULD clause per
    (word_a, word_b, slop) matching the pair within ``slop`` intervening
    tokens in either order (Lucene SpanNearQuery(inOrder=false) — the
    ordered variant is the '"a b"~N' sloppy-phrase syntax), plus optional
    unconstrained SHOULD terms. Requires the positions sidecar."""
    clauses = []
    for a, b, slop in pairs:
        for w in (a, b):
            if not w or " " in w:
                raise ParseError(
                    f"span_near takes single terms, got {w!r}")
        if slop < 0:
            raise ParseError(f"span_near slop must be >= 0, got {slop}")
        clauses.append(Clause(SHOULD, 1.0, [(a, 1.0), (b, 1.0)],
                              near=int(slop)))
    for t in extra_terms or []:
        clauses.append(Clause(SHOULD, 1.0, [(t, 1.0)]))
    return QueryPlan(qid, clauses, "span_near")


def span_not_plan(qid: str, pairs: list[tuple[str, str, int]],
                  extra_terms: list[str] | None = None) -> QueryPlan:
    """SpanNotQuery plan builder: one SHOULD clause per
    (include_word, exclude_word, slop) matching include occurrences with
    NO exclude occurrence within ``slop`` intervening tokens in either
    direction (see Clause.near_not). Requires the positions sidecar."""
    plan = span_near_plan(qid, pairs, extra_terms)
    for c in plan.clauses:
        if c.near is not None:
            c.near_not = True
    return QueryPlan(qid, plan.clauses, "span_not")


def interval_plan(qid: str, specs: list[tuple],
                  extra_terms: list[str] | None = None,
                  containing: str | None = None) -> QueryPlan:
    """IntervalQuery plan builder (programmatic, like the span builders):
    one SHOULD clause per spec — ``(w1, w2, max_gaps[, not_containing])``
    for the pair form, or ``([w1, …, wn], max_gaps[, not_containing])``
    with a word LIST for n-term ordered chains (n ≥ 2, repeats allowed) —
    ordered minimal intervals with a total-gap cap, an optional exclusion
    term, and an optional REQUIRED ``containing`` term applied to every
    spec (see Clause.gaps / intv_not / intv_has), plus optional
    unconstrained SHOULD terms. Requires the positions sidecar (search
    refuses loudly otherwise)."""
    clauses = []
    for spec in specs:
        pair_form = False
        if spec and isinstance(spec[0], (list, tuple)):
            if len(spec) == 2:
                words, g = spec
                x = None
            elif len(spec) == 3:
                words, g, x = spec
            else:
                raise ParseError(
                    f"interval list spec must be (words, max_gaps"
                    f"[, not_containing]), got {spec!r}")
            words = tuple(words)
            if len(words) < 2:
                raise ParseError(
                    f"interval needs at least two ordered words, "
                    f"got {words!r}")
        elif len(spec) == 3:
            a, b, g = spec
            words, x, pair_form = (a, b), None, True
        elif len(spec) == 4:
            a, b, g, x = spec
            words, pair_form = (a, b), True
        else:
            raise ParseError(
                f"interval spec must be (a, b, max_gaps[, not_containing])"
                f" or (words, max_gaps[, not_containing]), got {spec!r}")
        for w in words + ((x,) if x is not None else ()) + \
                ((containing,) if containing is not None else ()):
            if not w or " " in w:
                raise ParseError(f"interval takes single terms, got {w!r}")
        if pair_form and words[0] == words[1]:
            raise ParseError(
                f"interval needs two distinct terms, got {words[0]!r} "
                f"twice (use the list form for deliberate repeats)")
        if x in words:
            raise ParseError(
                f"interval not_containing term {x!r} collides with a "
                f"member: the interval endpoints always contain it")
        if containing is not None and containing == x:
            raise ParseError(
                f"containing and not_containing both {x!r}: no interval "
                f"can satisfy both")
        if g < 0:
            raise ParseError(f"interval max_gaps must be >= 0, got {g}")
        clauses.append(Clause(SHOULD, 1.0, [(w, 1.0) for w in words],
                              gaps=int(g), intv_not=x, intv_has=containing))
    for t in extra_terms or []:
        clauses.append(Clause(SHOULD, 1.0, [(t, 1.0)]))
    return QueryPlan(qid, clauses, "interval")


def phrase_prefix_plan(qid: str, words: list[str], prefix: str,
                       extra_terms: list[str] | None = None) -> QueryPlan:
    """match_phrase_prefix plan builder (programmatic, like span_first):
    ONE SHOULD clause matching ``words`` in sequence with any
    term starting with ``prefix`` at the following position, plus optional
    unconstrained SHOULD terms. Requires the positions sidecar. A bare
    prefix (no fixed words) is a prefix query — use 'pre*' wildcard syntax
    for that, this builder refuses it."""
    if not words:
        raise ParseError(
            "phrase_prefix needs at least one fixed word before the "
            "prefix; for a bare prefix use the 'pre*' wildcard syntax")
    for w in words:
        if not w or " " in w:
            raise ParseError(f"phrase_prefix words must be single terms, "
                             f"got {w!r}")
    if not prefix or any(ch in prefix for ch in "*?~ "):
        raise ParseError(f"phrase_prefix prefix must be a literal "
                         f"non-empty string, got {prefix!r}")
    clauses = [Clause(SHOULD, 1.0, [(w, 1.0) for w in words],
                      pprefix=prefix)]
    for t in extra_terms or []:
        clauses.append(Clause(SHOULD, 1.0, [(t, 1.0)]))
    return QueryPlan(qid, clauses, "phrase_prefix")


_PSQ_GROUP = re.compile(r"\(([^)]*)\)")
_WEIGHTED = re.compile(r"^(.*?)\^(\d+(?:\.\d+)?(?:[eE]-?\d+)?)$")


def plan_psq(qid: str, query: str) -> QueryPlan:
    """Parse the reference PSQ syntax: ``psq AND (t^p ...) AND (t^p ...)``
    (format produced at /root/reference/patapsco/topics.py:441-442)."""
    body = query.strip()
    if body.startswith("psq"):
        body = body[3:]
    clauses = []
    for grp in _PSQ_GROUP.findall(body):
        terms = []
        for tok in grp.split():
            m = _WEIGHTED.match(tok)
            if m:
                terms.append((m.group(1), float(m.group(2))))
            else:
                terms.append((tok, 1.0))
        if terms:
            clauses.append(Clause(SHOULD, 1.0, terms))
    return QueryPlan(qid, clauses, "psq")


_BOOST_TOK = re.compile(r"\^\d+(?:\.\d+)?(?:[eE]-?\d+)?$")

_FUZZY_TOK = re.compile(r"^(.+?)~(\d+(?:\.\d+)?)?$")


def _parse_fuzzy(tok: str) -> tuple[str, int] | None:
    """``term~`` / ``term~N`` → (base, max_edits). Lucene semantics: bare
    ``~`` means 2; N must be an integer in {0, 1, 2} (FuzzyQuery throws on
    larger, and the classic float-similarity syntax ``term~0.8`` is gone
    since Lucene 4 — both refused loudly here). Returns None when the token
    carries no fuzzy suffix."""
    m = _FUZZY_TOK.match(tok)
    if not m:
        return None
    base, n = m.group(1), m.group(2)
    if n is None:
        return base, 2
    if "." in n:
        raise ParseError(
            f"fuzzy query {tok!r}: float similarity syntax was removed in "
            "Lucene 4; use an integer edit distance (term~1 / term~2)")
    edits = int(n)
    if edits > 2:
        raise ParseError(
            f"fuzzy query {tok!r}: max supported edit distance is 2 "
            "(Lucene FuzzyQuery LEVENSHTEIN_MAXIMUM_SUPPORTED_DISTANCE)")
    return base, edits


def _check_term_token(tok: str) -> None:
    """Refuse (loudly) the classic-QueryParser constructs we don't score —
    see ParseError. Called on a bare term token (prefix/boost/fuzzy-suffix
    stripped). Words INSIDE a quoted phrase deliberately bypass this check:
    Lucene's classic parser treats phrase contents as literal analyzed text
    ('"te* foo"' matches the literal token te*, not a wildcard), and so do
    we."""
    if "~" in tok:
        raise ParseError(
            f"fuzzy query {tok!r} is not supported here "
            "(term~ / term~N fuzzy and \"a b\"~N phrase proximity ARE "
            "supported; a bare '~' or '~' inside a term is not)")
    if ":" in tok:
        raise ParseError(
            f"fielded query {tok!r} is not supported (the index has a "
            "single 'contents' field, like the reference index)")
    if tok == "*":
        raise ParseError("bare '*' (match-all) is not supported")
    if tok and tok[0] in "*?":
        raise ParseError(
            f"leading wildcard in {tok!r} is not supported (Lucene's "
            "classic parser rejects it too — allowLeadingWildcard defaults "
            "to false — and a leading-wildcard scan cannot prune the term "
            "dictionary)")
    if any(b in tok for b in "[]{}"):
        # range syntax glued to adjacent text ('foo[a TO b]') tokenizes
        # into literal fragments ('foo[a', 'TO', 'b]') because the range
        # alternative only matches at a token start — refuse loudly
        # rather than silently scoring the fragments as terms
        raise ParseError(
            f"term {tok!r} contains range brackets: ranges must be "
            "standalone tokens ('[a TO b]' / '{a TO b}'), not glued to "
            "adjacent text")


def plan_boolean(qid: str, query: str) -> QueryPlan:
    """Parse the Lucene-classic boolean syntax the reference exercises
    (samples/data/eng_mini_lucene_queries.jsonl and Lucene QueryParser via
    luqum, /root/reference/patapsco/topics.py:362-414): AND/OR/NOT, +term,
    -term, term^boost, "quoted phrases", and parenthesized sub-queries —
    ``(a OR b) AND c``, nested arbitrarily, with group boosts ``(a b)^2``
    and group prefixes ``+(...)`` / ``-(...)``. Default operator is OR
    (SHOULD); AND promotes its left neighbor to MUST, both matching Lucene's
    QueryParser, applied independently at every nesting level.
    """
    # a quoted phrase keeps any ^boost suffix attached ("a b"^3 is ONE token
    # — a bare alternation would split off '^3' and silently drop the boost);
    # parens are their own tokens so "(a" splits into "(" and "a"
    # range tokens contain spaces, so they get their own (earlier) branch;
    # +/- occur prefixes and ^boost suffixes stay attached like phrases
    toks = re.findall(
        r'[+-]?[\[\{][^\]\}]*[\]\}](?:\^[\d.eE-]+)?'
        # [+-]? on the phrase alternative: without it, '-"a b"' fell to the
        # bare-term branch and tokenized into literal junk ('-"a', 'b"') —
        # a valid Lucene prefixed phrase silently matching the wrong thing
        r'|[+-]?"[^"]*"(?:~[\d.]+)?(?:\^[\d.eE-]+)?'
        # /regexp/ tokens keep their parens ('/str(eam|ong)/' is ONE token,
        # not four); the pattern itself cannot contain '/' or whitespace
        r'|[+-]?/[^\s/]+/(?:\^[\d.eE-]+)?|\(|\)|[^\s()]+',
        query)
    pos = 0

    def parse_level(depth: int) -> list[Clause]:
        nonlocal pos
        clauses: list[Clause] = []
        pending_occur: str | None = None
        while pos < len(toks):
            tok = toks[pos]
            if tok == ")":
                if depth == 0:
                    pos += 1  # stray close paren: lenient skip
                    continue
                return clauses  # caller consumes the ')'
            up = tok.upper()
            if up == "AND":
                # promote previous clause (term OR group) to MUST, mark next
                if clauses and clauses[-1].occur == SHOULD:
                    clauses[-1].occur = MUST
                pending_occur = MUST
                pos += 1
                continue
            if up == "OR":
                pending_occur = SHOULD
                pos += 1
                continue
            if up == "NOT":
                pending_occur = MUST_NOT
                pos += 1
                continue
            if tok in ("+", "-"):
                # bare prefix directly before '(' — "+(a b)" tokenizes as
                # '+' '(' ... — applies to the group. A dangling '+'/'-'
                # NOT followed by '(' (e.g. a hyphen in "data - stream") is
                # dropped AND consumes any pending occur, as Lucene's parser
                # and the round-2 parser did — "window AND - stream" must
                # not propagate MUST onto "stream" past the dropped hyphen.
                if pos + 1 < len(toks) and toks[pos + 1] == "(":
                    pending_occur = MUST if tok == "+" else MUST_NOT
                else:
                    pending_occur = None
                pos += 1
                continue
            if tok == "(":
                pos += 1
                sub = parse_level(depth + 1)
                if pos < len(toks) and toks[pos] == ")":
                    pos += 1
                boost = 1.0
                if pos < len(toks) and _BOOST_TOK.fullmatch(toks[pos]):
                    boost = float(toks[pos][1:])
                    pos += 1
                occur = pending_occur or SHOULD
                pending_occur = None
                if sub:
                    clauses.append(Clause(occur, boost, [], group=sub))
                continue
            occur = pending_occur or SHOULD
            pending_occur = None
            boost = 1.0
            if tok.startswith("+") and len(tok) > 1:
                occur, tok = MUST, tok[1:]
            elif tok.startswith("-") and len(tok) > 1:
                occur, tok = MUST_NOT, tok[1:]
            m = _WEIGHTED.match(tok)
            if m:
                tok, boost = m.group(1), float(m.group(2))
            rm = re.match(r'^([\[\{])\s*([^\s\]\}]+)\s+TO\s+([^\s\]\}]+)'
                          r'\s*([\]\}])$', tok)
            if rm or (tok and tok[0] in "[{"):
                if not rm:
                    raise ParseError(
                        f"malformed range query {tok!r}: expected "
                        "'[lower TO upper]' / '{lower TO upper}' "
                        "(either bound may be *)")
                lo = None if rm.group(2) == "*" else rm.group(2)
                hi = None if rm.group(3) == "*" else rm.group(3)
                clauses.append(Clause(occur, boost, [],
                                      trange=(lo, hi, rm.group(1) == "[",
                                              rm.group(4) == "]")))
                pos += 1
                continue
            if len(tok) > 2 and tok.startswith("/") and tok.endswith("/"):
                pat = tok[1:-1]
                try:
                    re.compile(pat)
                except re.error as exc:
                    raise ParseError(
                        f"regexp query {tok!r} does not compile: {exc}")
                clauses.append(Clause(occur, boost, [(pat, 1.0)], regex=pat))
                pos += 1
                continue
            if tok.startswith("/") and len(tok) > 1:
                raise ParseError(
                    f"unterminated regexp query {tok!r}: expected /pattern/ "
                    "(whitespace inside a regexp is not supported — analyzed "
                    "terms cannot contain it either)")
            slop = 0
            sm = re.match(r'^("[^"]*")~([\d.]+)$', tok)
            if sm:
                if "." in sm.group(2):
                    raise ParseError(
                        f"phrase slop in {tok!r} must be an integer "
                        '("a b"~2); float slop is not supported')
                tok, slop = sm.group(1), int(sm.group(2))
            if tok.startswith('"') and tok.endswith('"'):
                words = tok.strip('"').split()
                if words:
                    # Lucene drops the slop on a single-word "phrase"
                    clauses.append(Clause(occur, boost, [(w, 1.0) for w in words],
                                          phrase=len(words) > 1,
                                          slop=slop if len(words) > 1 else 0))
            elif tok:
                fz = _parse_fuzzy(tok)
                if fz is not None:
                    base, edits = fz
                    _check_term_token(base)
                    if "*" in base or "?" in base:
                        raise ParseError(
                            f"cannot combine wildcard and fuzzy in {tok!r}")
                    clauses.append(Clause(occur, boost, [(base, 1.0)],
                                          fuzzy=edits))
                else:
                    _check_term_token(tok)
                    if tok.endswith("*") and "?" not in tok \
                            and "*" not in tok[:-1]:
                        # pure trailing-*: prefix path, pushdown only
                        clauses.append(Clause(occur, boost, [(tok[:-1], 1.0)],
                                              prefix=True))
                    elif "*" in tok or "?" in tok:
                        clauses.append(Clause(occur, boost, [(tok, 1.0)],
                                              wild=tok))
                    else:
                        clauses.append(Clause(occur, boost, [(tok, 1.0)]))
            pos += 1
        return clauses

    return QueryPlan(qid, parse_level(0), "boolean")


def parse_query(qid: str, query: str, mode: str = "plain",
                terms: list[str] | None = None) -> QueryPlan:
    if mode == "plain":
        return plan_plain(qid, terms if terms is not None else query.split())
    if mode == "psq" or query.strip().startswith("psq AND"):
        return plan_psq(qid, query)
    if mode == "boolean":
        return plan_boolean(qid, query)
    raise ValueError(f"unknown query mode: {mode}")
