"""PSQ translation tables and query generation — the rebuild of
``parse_psq_table``/``normalize_psq_entry``
(/root/reference/patapsco/util/formats.py:113-143) and ``PSQGenerator``
(/root/reference/patapsco/topics.py:417-497).

A translation table maps source-language terms to target-language
(term → probability) dicts. Loading semantics preserved exactly:

1. cap each entry at 1024 targets (Lucene clause limit), dropping from the
   END of the file's dict order;
2. normalize to sum 1, drop probabilities ≤ 1e-5;
3. cumulative cut: keep the most-probable terms whose cumulative mass first
   exceeds ``threshold`` (0.97), inclusive; renormalize the survivors.

Query generation: each (lowercased) query token projects to its translation
clause — an out-of-vocabulary token passes through with prob None → weight
1.0; tokens are capped at 1023 clauses (1 reserved for the psq marker).
Clause weighting at retrieval scores *expected* term statistics
(etf = Σ p·tf), matching the reference's bundled PSQIndexSearcher and its
pinned goldens.

Tables are small (query-language vocabulary) — driver-side load + Spark
broadcast is the right distribution strategy; the scorer receives the
already-projected clause plans, so executors never see the table.
"""

from __future__ import annotations

import json

from ..operators.queryparse import SHOULD, Clause, QueryPlan

LUCENE_CLAUSE_LIMIT = 1024


def normalize_psq_entry(entry: dict[str, float], cum_thresh: float = 0.97,
                        elem_thresh: float = 1e-5) -> dict[str, float]:
    """Renormalize + threshold one source term's translations (reference
    semantics, formats.py:113-130, including the strictly-greater elem
    threshold and inclusive cumulative cut)."""
    total = sum(entry.values())
    probs = {w: p / total for w, p in entry.items()}
    probs = {w: p for w, p in probs.items() if p > elem_thresh}
    ordered = sorted(probs.items(), key=lambda kv: kv[1], reverse=True)
    if cum_thresh < 1:
        cum = 0.0
        cut = len(ordered)
        for i, (_, p) in enumerate(ordered):
            cum += p
            if cum > cum_thresh:
                cut = i + 1
                break
        ordered = ordered[:cut]
        total = sum(p for _, p in ordered)
        ordered = [(w, p / total) for w, p in ordered]
    return dict(ordered)


def parse_psq_table(path_or_dict: str | dict, threshold: float = 0.97) -> dict:
    """Load a translation table (json path or dict): cap 1024 targets per
    source term, then normalize each entry."""
    if isinstance(path_or_dict, dict):
        table = {k: dict(v) for k, v in path_or_dict.items()}
    else:
        with open(path_or_dict) as fp:
            table = json.load(fp)
    for k, v in table.items():
        while len(v) > LUCENE_CLAUSE_LIMIT:
            v.pop(list(v.keys())[-1])
    return {k: normalize_psq_entry(v, cum_thresh=threshold) for k, v in table.items()}


def psq_plan_from_tokens(qid: str, tokens: list[str], table: dict,
                         prob_format: bool = True) -> QueryPlan:
    """Project analyzed query tokens through the table into a PSQ clause
    plan (one clause per source token, AND-combined like the reference's
    ``psq AND (...) AND (...)`` syntax). OOV tokens keep themselves at
    weight 1.0. Probabilities are rounded to 4 decimals when
    ``prob_format`` — the reference serializes ``^{prob:.4f}`` into the
    query string, so the executed weights are the rounded ones."""
    tokens = tokens[:LUCENE_CLAUSE_LIMIT - 1]  # 1 reserved for psq marker
    clauses = []
    for tok in tokens:
        tok = tok.lower()
        entry = table.get(tok)
        if entry:
            terms = [(t, round(p, 4) if prob_format else p)
                     for t, p in entry.items()]
        else:
            terms = [(tok, 1.0)]
        clauses.append(Clause(SHOULD, 1.0, terms))
    return QueryPlan(qid, clauses, "psq")
