"""Result snippets — best-window extraction + term highlighting.

The serving-side step after top-k retrieval: for each (query, hit) pair,
show the passage of the document that best explains WHY it matched, with
the query terms marked. Policy (stated, since snippeting is policy):

- Window = ``window`` consecutive whitespace tokens (default 30).
- Best window = most query-term OCCURRENCES (matching on the lowercased
  token), earliest start on ties — total-occurrence scoring keeps the
  kernel one prefix-sum pass; unique-term coverage is a documented
  departure from e.g. Lucene's UnifiedHighlighter passage scorer.
- Matched tokens are wrapped in ``<em>…</em>`` in the emitted snippet;
  ellipses mark truncation at either end.

Scale shape: the doc-store is corpus-sized, so it is never shuffled or
broadcast whole — the ≤k×|queries| result ids reduce it with a broadcast
LEFT-SEMI join (one map-side scan), then the window kernel runs as one
Arrow pass over the reduced frame joined back to the hits. Same
big-table discipline as ``retrieve.search_with_prior``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def best_window(tokens: list[str], terms: set[str],
                window: int) -> tuple[int, int]:
    """(start, n_matches) of the best window: most matches, earliest tie.
    ``terms`` must be lowercased; matching lowers each token once."""
    n = len(tokens)
    hits = [1 if t.lower() in terms else 0 for t in tokens]
    if n <= window:
        return 0, sum(hits)
    best_s, best_score = 0, sum(hits[:window])
    score = best_score
    for s in range(1, n - window + 1):
        score += hits[s + window - 1] - hits[s - 1]
        if score > best_score:
            best_s, best_score = s, score
    return best_s, best_score


def render_snippet(tokens: list[str], terms: set[str], start: int,
                   window: int) -> str:
    """Window text with matches wrapped in <em>…</em> and truncation
    marked by leading/trailing ellipses."""
    end = min(len(tokens), start + window)
    parts = [f"<em>{t}</em>" if t.lower() in terms else t
             for t in tokens[start:end]]
    body = " ".join(parts)
    if start > 0:
        body = "… " + body
    if end < len(tokens):
        body = body + " …"
    return body


def make_snippets(results: DataFrame, doc_store: DataFrame,
                  query_terms: dict[str, list[str]], window: int = 30,
                  id_col: str = "doc_id", text_col: str = "text"
                  ) -> DataFrame:
    """(query_id, doc_id, …) hits × (doc_id, text) store →
    (query_id, doc_id, snippet, n_matches).

    ``query_terms`` maps query_id → its (analyzed) terms; it is
    driver-sized (queries × terms) and ships inside the kernel closure.
    Hits whose doc is missing from the store are dropped (an inner join —
    a store that lost a doc should fail loudly downstream via count
    checks, not emit empty snippets)."""
    terms_by_q = {q: {t.lower() for t in ts}
                  for q, ts in query_terms.items()}
    hits = results.select("query_id", id_col)
    reduced = doc_store.select(F.col(id_col),
                               F.col(text_col).alias("__text")) \
        .join(F.broadcast(hits.select(id_col).distinct()), id_col, "leftsemi")
    joined = hits.join(F.broadcast(reduced), id_col)

    w = int(window)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            snips, counts = [], []
            for q, text in zip(pdf["query_id"], pdf["__text"]):
                terms = terms_by_q.get(q, set())
                tokens = (text or "").split()
                s, score = best_window(tokens, terms, w)
                snips.append(render_snippet(tokens, terms, s, w))
                counts.append(score)
            yield pd.DataFrame({
                "query_id": pdf["query_id"], "doc_id": pdf[id_col],
                "snippet": snips,
                "n_matches": pd.Series(counts, dtype="int32")})

    return joined.select("query_id", F.col(id_col), "__text").mapInPandas(
        run, schema="query_id string, doc_id string, snippet string, "
                    "n_matches int")
