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


@dataclass
class QueryPlan:
    qid: str
    clauses: list[Clause]
    mode: str = "plain"


def plan_plain(qid: str, terms: list[str]) -> QueryPlan:
    """One SHOULD clause per term occurrence — duplicate query terms add up,
    exactly like Lucene's WhitespaceAnalyzer query parsing."""
    return QueryPlan(qid, [Clause(SHOULD, 1.0, [(t, 1.0)]) for t in terms], "plain")


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


def plan_boolean(qid: str, query: str) -> QueryPlan:
    """Parse the Lucene-classic boolean subset the reference exercises
    (samples/data/eng_mini_lucene_queries.jsonl): AND/OR/NOT, +term, -term,
    term^boost, "quoted phrases" (bag-of-words). Default operator is OR
    (SHOULD), matching Lucene's QueryParser default.
    """
    # a quoted phrase keeps any ^boost suffix attached ("a b"^3 is ONE token
    # — a bare alternation would split off '^3' and silently drop the boost)
    toks = re.findall(r'"[^"]*"(?:\^[\d.eE-]+)?|\S+', query)
    clauses: list[Clause] = []
    pending_occur: str | None = None
    i = 0
    while i < len(toks):
        tok = toks[i]
        up = tok.upper()
        if up == "AND":
            # promote previous clause to MUST and mark next as MUST
            if clauses and clauses[-1].occur == SHOULD:
                clauses[-1].occur = MUST
            pending_occur = MUST
            i += 1
            continue
        if up == "OR":
            pending_occur = SHOULD
            i += 1
            continue
        if up == "NOT":
            pending_occur = MUST_NOT
            i += 1
            continue
        occur = pending_occur or SHOULD
        pending_occur = None
        boost = 1.0
        if tok.startswith("+"):
            occur, tok = MUST, tok[1:]
        elif tok.startswith("-"):
            occur, tok = MUST_NOT, tok[1:]
        m = _WEIGHTED.match(tok)
        if m:
            tok, boost = m.group(1), float(m.group(2))
        if tok.startswith('"') and tok.endswith('"'):
            words = tok.strip('"').split()
            if words:
                clauses.append(Clause(occur, boost, [(w, 1.0) for w in words],
                                      phrase=len(words) > 1))
        elif tok:
            clauses.append(Clause(occur, boost, [(tok, 1.0)]))
        i += 1
    return QueryPlan(qid, clauses, "boolean")


def parse_query(qid: str, query: str, mode: str = "plain",
                terms: list[str] | None = None) -> QueryPlan:
    if mode == "plain":
        return plan_plain(qid, terms if terms is not None else query.split())
    if mode == "psq" or query.strip().startswith("psq AND"):
        return plan_psq(qid, query)
    if mode == "boolean":
        return plan_boolean(qid, query)
    raise ValueError(f"unknown query mode: {mode}")
