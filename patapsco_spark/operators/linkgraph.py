"""Web link graph + PageRank — the Common-Crawl host-graph workload.

Common Crawl publishes a host- and domain-level web graph (nodes = hosts,
edges = hyperlinks) and its PageRank/harmonic-centrality rankings as a
first-class dataset alongside the WARC shards; a crawl-scale engine needs
the same pipeline: extract anchors from raw html, canonicalize, roll up to
host/domain edges, and run an iterative centrality. All stages here are
DataFrame-native:

- :func:`extract_links_series` — vectorized anchor extraction (pandas over
  Arrow batches; regex once-compiled, relative hrefs resolved against the
  page url with ``urljoin``).
- :func:`link_edges` — pages → distinct (src, dst) edge table. One explode
  + one distinct (a single shuffle on the edge pair).
- :func:`anchor_edges` / :func:`anchor_summaries` — the anchor-TEXT side
  of the same extraction: (src, dst, anchor) rows for every well-formed
  ``<a href>…</a>`` pair, rolled up per target into (n_anchors, n_srcs,
  top_anchor). Anchor text is the classic external evidence a web index
  attaches to a target page (what OTHER pages call it); Common Crawl's
  WAT records carry the same ``text`` field per link.
- :func:`domain_edges` — edge rollup to registered domains with counts
  (the CC domain-graph shape), reusing the weburl registered-domain rules.
- :func:`pagerank` — damped PageRank with uniform dangling-mass
  redistribution, the textbook semantics:

      r'(u) = (1-d)/N + d * (Σ_{v→u} r(v)/outdeg(v) + dangling/N)

  Each iteration is one join (contributions) + one groupBy (fan-in sum);
  the dangling mass is a 1-row aggregate CROSS-JOINED back in (broadcast —
  never a driver collect inside the loop). Iterative lineage is truncated
  with ``localCheckpoint`` every ``truncate_every`` iterations, the
  standard Spark pattern for fixed-point loops (without it the plan tree
  doubles per iteration and the optimizer, not the data, becomes the
  bottleneck). Scale notes: edges are hash-partitioned on ``src`` once and
  the per-iteration join reuses that partitioning for the rank side;
  celebrity in-degree skew lands in the fan-in groupBy, which is
  map-side-combinable (a sum), so skew costs network, not correctness —
  AQE's skew-join split covers the contribution join.

No reference analogue (patapsco has no graph stage); this exists for the
north star's Common-Crawl framing, next to sources/warc.py.
"""

from __future__ import annotations

import re
from typing import Iterator
from urllib.parse import urljoin

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F

_RE_ATAG = re.compile(rb"<a\s([^>]*)>", re.I)
_RE_HREF_ATTR = re.compile(rb"""href\s*=\s*["']?([^"'\s>]+)""", re.I)
_RE_REL_ATTR = re.compile(
    rb"""rel\s*=\s*(?:"([^"]*)"|'([^']*)'|([^\s>]+))""", re.I)

# graph semantics: rel tokens that mean "this link is not an endorsement"
# — nofollow (classic), plus Google's 2019 refinements ugc and sponsored.
# Web-graph builders drop these edges; WAT metadata keeps every link.
NON_ENDORSING_REL = frozenset({"nofollow", "ugc", "sponsored"})


def _href_rel(attrs: bytes) -> tuple[str | None, frozenset[str]]:
    """<a> attribute blob → (href or None, lowercase rel token set)."""
    hm = _RE_HREF_ATTR.search(attrs)
    if hm is None:
        return None, frozenset()
    href = hm.group(1).decode("utf-8", errors="replace")
    rm = _RE_REL_ATTR.search(attrs)
    if rm is None:
        return href, frozenset()
    raw = next(g for g in rm.groups() if g is not None)
    return href, frozenset(
        raw.decode("utf-8", errors="replace").lower().split())


def extract_links_series(html: pd.Series, base_urls: pd.Series,
                         drop_rel: frozenset[str] = NON_ENDORSING_REL
                         ) -> pd.Series:
    """Series[bytes html], Series[str url] → Series[list[str]] absolute
    http(s) link targets, document order, within-page duplicates kept
    (edge weighting happens downstream). Links whose ``rel`` attribute
    carries any token in ``drop_rel`` are skipped — the web-graph default
    drops nofollow/ugc/sponsored (non-endorsing) links; pass
    ``frozenset()`` to keep everything (the WAT-metadata semantics)."""
    def links(args) -> list[str]:
        blob, base = args
        if blob is None:
            return []
        out = []
        for m in _RE_ATAG.finditer(bytes(blob)):
            href, rel = _href_rel(m.group(1))
            if href is None or (rel & drop_rel):
                continue
            if href.startswith(("javascript:", "mailto:", "#")):
                continue
            absu = urljoin(base or "", href)
            if absu.startswith(("http://", "https://")):
                out.append(absu)
        return out
    return pd.Series(map(links, zip(html, base_urls)), index=html.index)


def link_edges(pages: DataFrame, url_col: str = "url",
               html_col: str = "html", keep_self: bool = False,
               drop_rel: frozenset[str] = NON_ENDORSING_REL) -> DataFrame:
    """Pages → distinct (src, dst) hyperlink edges. Anchor extraction is
    one Arrow pass; distinct is the single shuffle (keyed on the pair, so
    it also co-locates for any following src-keyed join). ``drop_rel``
    links (nofollow/ugc/sponsored by default) never become edges."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "src": pdf[url_col],
                "dsts": extract_links_series(pdf[html_col], pdf[url_col],
                                             drop_rel=drop_rel),
            })

    edges = (pages.select(url_col, html_col)
             .mapInPandas(run, schema="src string, dsts array<string>")
             .select("src", F.explode("dsts").alias("dst")))
    if not keep_self:
        edges = edges.where(F.col("src") != F.col("dst"))
    return edges.distinct()


_RE_APAIR = re.compile(rb"""<a\s([^>]*)>(.*?)</a\s*>""", re.I | re.S)
_RE_TAG = re.compile(rb"<[^>]*>")


def extract_anchor_series(html: pd.Series, base_urls: pd.Series,
                          max_text_len: int = 200,
                          drop_rel: frozenset[str] = NON_ENDORSING_REL
                          ) -> pd.Series:
    """Series[bytes html], Series[str url] → Series[list[(dst, text)]] for
    every WELL-FORMED ``<a href=…>…</a>`` pair, document order, duplicates
    kept. Same href filtering/resolution as :func:`extract_links_series`
    (javascript:/mailto:/# skipped, relative hrefs resolved, http(s) only).
    Anchor text = inner bytes with nested tags stripped, whitespace
    collapsed, truncated to ``max_text_len`` chars; HTML entities are left
    as written (&amp; stays &amp;). ``rel`` handling matches
    :func:`extract_links_series` (nofollow/ugc/sponsored dropped by
    default). Parser honesty: anchors with no closing ``</a>`` contribute
    an edge via extract_links_series but NO text row here — same class of
    bounded regex parsing as the href extractor."""
    def anchors(args) -> list:
        blob, base = args
        if blob is None:
            return []
        out = []
        for m in _RE_APAIR.finditer(bytes(blob)):
            href, rel = _href_rel(m.group(1))
            if href is None or (rel & drop_rel):
                continue
            if href.startswith(("javascript:", "mailto:", "#")):
                continue
            absu = urljoin(base or "", href)
            if not absu.startswith(("http://", "https://")):
                continue
            text = " ".join(
                _RE_TAG.sub(b"", m.group(2))
                .decode("utf-8", errors="replace").split())[:max_text_len]
            if text:
                out.append((absu, text))
        return out
    return pd.Series(map(anchors, zip(html, base_urls)), index=html.index)


def anchor_edges(pages: DataFrame, url_col: str = "url",
                 html_col: str = "html", keep_self: bool = False,
                 max_text_len: int = 200,
                 drop_rel: frozenset[str] = NON_ENDORSING_REL) -> DataFrame:
    """Pages → (src, dst, anchor) rows, one per non-empty-text anchor,
    within-page duplicates KEPT (each is an independent piece of anchor
    evidence — frequency is the signal :func:`anchor_summaries` counts).
    One Arrow pass, no shuffle here; aggregation happens downstream."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows_src, rows_dst, rows_txt = [], [], []
            for src, pairs in zip(
                    pdf[url_col],
                    extract_anchor_series(pdf[html_col], pdf[url_col],
                                          max_text_len, drop_rel=drop_rel)):
                for dst, text in pairs:
                    rows_src.append(src)
                    rows_dst.append(dst)
                    rows_txt.append(text)
            yield pd.DataFrame({"src": rows_src, "dst": rows_dst,
                                "anchor": rows_txt})

    edges = (pages.select(url_col, html_col)
             .mapInPandas(run, schema="src string, dst string, anchor string"))
    if not keep_self:
        edges = edges.where(F.col("src") != F.col("dst"))
    return edges


def anchor_summaries(edges: DataFrame) -> DataFrame:
    """(src, dst, anchor) rows → one row per target: (dst, n_anchors,
    n_srcs, top_anchor) where top_anchor is the most frequent anchor text
    pointing at dst (ties broken lexicographically — deterministic across
    engines). This is the "anchor document" a web index attaches to a page.

    Scale shape: the (dst, anchor) count is map-side combinable; the
    top-anchor window runs over that ALREADY-AGGREGATED pair frame (one
    row per distinct text per target — bounded), never the raw edge
    stream, so a celebrity target costs a big fan-in sum, not a window
    over 10^9 rows. n_srcs is a partial-distinct agg on (dst, src). All
    Catalyst; two shuffles keyed on dst plus the pair agg."""
    pair = edges.groupBy("dst", "anchor").agg(F.count("*").alias("_n"))
    w = Window.partitionBy("dst").orderBy(F.col("_n").desc(),
                                          F.col("anchor").asc())
    top = (pair.withColumn("_rn", F.row_number().over(w))
           .where(F.col("_rn") == 1)
           .select("dst", F.col("anchor").alias("top_anchor")))
    stats = (edges.groupBy("dst")
             .agg(F.count("*").alias("n_anchors"),
                  F.count_distinct("src").alias("n_srcs")))
    return stats.join(top, "dst")


def anchor_blobs(edges: DataFrame, top_k: int = 20) -> DataFrame:
    """(src, dst, anchor) rows → (dst, anchor_blob, n_anchor_terms): the
    per-target "anchor document" as an indexable string — the top_k most
    frequent distinct anchor texts pointing at dst (count desc, text asc),
    space-joined in rank order.

    top_k is the celebrity bound: a page with 10^7 in-links still yields
    a ≤top_k-term blob, because ranking runs on the PRE-AGGREGATED
    (dst, anchor) pair frame (one row per distinct text — map-side
    combinable count), never the raw edge stream, and dedup-then-cap is
    exactly what web indexes do with anchor spam (a million identical
    "click here" anchors add one term, not a million)."""
    pair = edges.groupBy("dst", "anchor").agg(F.count("*").alias("_n"))
    w = Window.partitionBy("dst").orderBy(F.col("_n").desc(),
                                          F.col("anchor").asc())
    ranked = (pair.withColumn("_rn", F.row_number().over(w))
              .where(F.col("_rn") <= top_k))
    return (ranked.groupBy("dst")
            .agg(F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_rn", "anchor"))),
                    lambda s: s["anchor"]),
                " ").alias("anchor_blob"),
                F.count("*").alias("n_anchor_terms")))


def with_anchor_text(pages: DataFrame, url_col: str = "url",
                     text_col: str = "text", html_col: str = "html",
                     top_k: int = 20, keep_self: bool = False,
                     drop_rel: frozenset[str] = NON_ENDORSING_REL
                     ) -> DataFrame:
    """Append each page's anchor document to its ``text_col`` — the
    web-index composition where a page is indexed under what OTHER pages
    call it (the reason a homepage ranks for its brand name even when the
    page itself never says it). Pages with no in-links pass through
    unchanged; augmented pages gain a final line holding the ranked
    anchor blob from :func:`anchor_blobs`.

    Feed the RESULT to ``build_index(..., text_col=...)``: anchor terms
    then share the page's BM25 field (tf adds, norms include the blob
    words), the single-field analogue of BM25F's anchor field. Plan: one
    Arrow extraction pass + the two bounded rollup shuffles, then one
    url-keyed join (both sides hash-partition on the same key)."""
    blobs = anchor_blobs(
        anchor_edges(pages, url_col=url_col, html_col=html_col,
                     keep_self=keep_self, drop_rel=drop_rel), top_k)
    joined = pages.join(blobs, pages[url_col] == blobs["dst"], "left")
    aug = F.when(F.col("anchor_blob").isNotNull(),
                 F.concat(F.coalesce(F.col(text_col), F.lit("")),
                          F.lit("\n"), F.col("anchor_blob"))) \
        .otherwise(F.col(text_col))
    return (joined.withColumn(text_col, aug)
            .drop("dst", "anchor_blob", "n_anchor_terms"))


def domain_edges(edges: DataFrame) -> DataFrame:
    """(src, dst) page edges → (src_domain, dst_domain, n_links) registered-
    domain rollup (the Common-Crawl domain-graph shape). Self-edges after
    rollup (intra-domain links) are kept — CC's graph drops them only at
    ranking time."""
    from .weburl import host_of, registered_domain

    return (edges
            .select(registered_domain(host_of(F.col("src")))
                    .alias("src_domain"),
                    registered_domain(host_of(F.col("dst")))
                    .alias("dst_domain"))
            .groupBy("src_domain", "dst_domain")
            .agg(F.count("*").alias("n_links")))


def _vertex_set(edges: DataFrame, nodes: DataFrame | None,
                validate: bool = True) -> DataFrame:
    """Vertex frame; an EXPLICIT nodes set must cover every edge endpoint —
    a silently-smaller set would drop rank mass / leak registers to
    uninitialized nodes, so it is an error, not a filter. ``validate=False``
    skips the one-off anti-join check when the caller guarantees coverage."""
    if nodes is None:
        return (edges.select(F.col("src").alias("node"))
                .union(edges.select(F.col("dst").alias("node")))
                .distinct())
    nodes = nodes.toDF("node")
    if validate:
        endpoints = (edges.select(F.col("src").alias("node"))
                     .union(edges.select(F.col("dst").alias("node"))))
        missing = (endpoints.join(nodes, "node", "left_anti")
                   .limit(1).collect())
        if missing:
            raise ValueError(
                f"nodes set does not cover edge endpoint "
                f"{missing[0].node!r}; pass the full vertex set (or "
                f"validate=False only when coverage is guaranteed)")
    return nodes


def pagerank(edges: DataFrame, nodes: DataFrame | None = None,
             iterations: int = 10, damping: float = 0.85,
             truncate_every: int = 4,
             validate_nodes: bool = True) -> DataFrame:
    """Damped PageRank over a (src, dst) edge table → (node, rank).

    ``nodes``: 1-column frame of the full vertex set; defaults to the union
    of edge endpoints (pass it explicitly when isolated pages must hold
    rank — e.g. every url in the crawl). Rank mass is conserved at 1.0
    every iteration (uniform dangling redistribution), so Σrank is a free
    invariant check. Deterministic up to float summation order; callers
    comparing across engines should round (see the entry query).
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    if not 0.0 <= damping <= 1.0:
        raise ValueError(f"damping must be in [0, 1], got {damping}")
    # pin the edge table once — without this, an expensive upstream lineage
    # (e.g. anchor extraction) would re-execute inside EVERY iteration's
    # contribution join
    edges = edges.select("src", "dst").localCheckpoint(eager=False)
    nodes = _vertex_set(edges, nodes, validate=validate_nodes)
    # one shuffle up front; the per-iteration contribution join then reuses
    # this partitioning on the edge side (no edge re-shuffle in the loop)
    nodes = nodes.repartition("node").localCheckpoint(eager=False)
    outdeg = (edges.groupBy(F.col("src").alias("node"))
              .agg(F.count("*").alias("outdeg"))
              .localCheckpoint(eager=False))
    n_nodes = nodes.count()
    if n_nodes == 0:
        raise ValueError("pagerank over an empty graph")
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    base = (1.0 - damping) / n_nodes
    for it in range(iterations):
        rk = ranks.join(outdeg, "node", "left")
        contribs = (rk.where(F.col("outdeg").isNotNull())
                    .join(edges, rk["node"] == edges["src"])
                    .groupBy(F.col("dst").alias("node"))
                    .agg(F.sum(F.col("rank") / F.col("outdeg")).alias("s")))
        dang = (rk.where(F.col("outdeg").isNull())
                .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dang")))
        ranks = (nodes.join(contribs, "node", "left")
                 .crossJoin(F.broadcast(dang))
                 .select("node",
                         (F.lit(base) + F.lit(damping) *
                          (F.coalesce(F.col("s"), F.lit(0.0)) +
                           F.col("dang") / F.lit(float(n_nodes))))
                         .alias("rank")))
        if (it + 1) % truncate_every == 0 and it + 1 < iterations:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


# ---------------------------------------------------------------------------
# HyperBall (Boldi & Vigna 2013): neighborhood function + harmonic centrality
# ---------------------------------------------------------------------------

# Fixed HLL layout shared with the SQL oracle: m=64 registers (b=6), node
# hash = low 60 bits of md5 (15 hex chars — engine-portable, unlike
# xxhash64 which DuckDB lacks), register index = h mod 64, rank rho =
# leading-zero count of the remaining 54-bit window + 1 (so rho in
# [1, 55]). alpha_64 * m^2 = 0.709 * 4096, written as the literal both
# engines parse to the same double.
HB_M = 64
HB_ALPHA_M2 = 2904.064
HB_RHO_MAX = 55


def _hb_init(nodes: DataFrame) -> DataFrame:
    """One (node, j, r) register row per node — the HLL counter of {node}.
    Absent (node, j) pairs mean register value 0 (sparse representation:
    early-iteration counters hold few registers, so the per-iteration
    shuffle carries only live registers, never m * |V| rows)."""
    h = F.conv(F.substring(F.md5("node"), 1, 15), 16, 10).cast("long")
    return (nodes
            .select("node", h.alias("h"))
            .select("node",
                    (F.col("h") % HB_M).cast("int").alias("j"),
                    F.when(F.expr(f"h div {HB_M}") == 0,
                           F.lit(HB_RHO_MAX))
                    .otherwise(F.lit(HB_RHO_MAX) -
                               F.length(F.bin(F.expr(f"h div {HB_M}"))))
                    .cast("int").alias("r")))


def _hb_estimate(regs: DataFrame, t: int) -> DataFrame:
    """Sparse registers → per-node HLL cardinality estimate at radius t
    (raw estimator with the standard linear-counting small-range
    correction; identical literal constants in the SQL oracle)."""
    agg = regs.groupBy("node").agg(
        F.count("*").cast("double").alias("cnt"),
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("sumpow"))
    z = (F.lit(float(HB_M)) - F.col("cnt")) + F.col("sumpow")
    raw = F.lit(HB_ALPHA_M2) / z
    small = F.lit(float(HB_M)) * F.log(
        F.lit(float(HB_M)) / (F.lit(float(HB_M)) - F.col("cnt")))
    est = F.when((raw <= F.lit(2.5 * HB_M)) & (F.col("cnt") < HB_M),
                 small).otherwise(raw)
    return agg.select("node", F.lit(t).alias("t"), est.alias("est"))


def hyperball(edges: DataFrame, nodes: DataFrame | None = None,
              t: int = 4, direction: str = "in",
              validate_nodes: bool = True) -> DataFrame:
    """HyperBall: HLL-approximate neighborhood function and t-truncated
    harmonic centrality for every node — the algorithm behind Common
    Crawl's published host rankings (Boldi & Vigna, "In-Core Computation
    of Geometric Centralities with HyperBall", 2013).

    ``direction="in"`` grows balls along REVERSED edges, so after round
    k a node's counter holds {u : d(u→node) <= k} and

        harmonic(v) = sum_{k=1..t} max(0, |B(v,k)| - |B(v,k-1)|) / k

    is the harmonic centrality truncated at radius t (the full sum once t
    reaches the graph diameter). ``direction="out"`` gives forward
    reachability counts instead.

    Scale shape: counters are sparse (node, j, r) register rows; one
    iteration = one join (counters flow along edges) + one
    map-side-combinable (node, j) max — register-wise max IS the HLL
    union, so no counter ever materializes as a blob, and in-degree skew
    is absorbed by partial aggregation exactly like a word count. Registers
    are eagerly localCheckpoint-ed per round (the fixed-point-loop lineage
    rule). Unlike exact distributed BFS the state is O(|V| * m) bounded —
    the property that lets the real HyperBall rank 10^12-node graphs.

    Returns (node, reach_est, harmonic): the |B(v,t)| estimate and the
    truncated harmonic centrality. Estimates are deterministic functions
    of the register protocol (md5-derived, partitioning-independent) —
    pinned against a pure-Python reference in tests and replayed in SQL
    by the harmonic_centrality oracle.
    """
    if t < 1:
        raise ValueError(f"t must be >= 1, got {t}")
    if direction not in ("in", "out"):
        raise ValueError(f"direction must be 'in' or 'out', got {direction!r}")
    edges = edges.select("src", "dst")
    # counters flow src→dst below, so with ORIGINAL edges a node's counter
    # accumulates exactly the nodes that can REACH it — the in-ball. The
    # out-ball (forward reachability) needs the transpose.
    if direction == "out":
        edges = edges.select(F.col("dst").alias("src"),
                             F.col("src").alias("dst"))
    # counters flow src -> dst each round; pin the edge lineage once
    edges = edges.localCheckpoint(eager=False)
    nodes = _vertex_set(edges, nodes, validate=validate_nodes)
    regs = _hb_init(nodes).localCheckpoint(eager=True)
    ests = [_hb_estimate(regs, 0)]
    for k in range(1, t + 1):
        inc = (edges.join(regs.withColumnRenamed("node", "src"), "src")
               .select(F.col("dst").alias("node"), "j", "r"))
        regs = (regs.unionByName(inc)
                .groupBy("node", "j").agg(F.max("r").alias("r"))
                .localCheckpoint(eager=True))
        ests.append(_hb_estimate(regs, k))
    allest = ests[0]
    for e in ests[1:]:
        allest = allest.unionByName(e)
    w = Window.partitionBy("node").orderBy("t")
    deltas = allest.withColumn("prev", F.lag("est").over(w))
    return (deltas.groupBy("node").agg(
        F.max(F.when(F.col("t") == t, F.col("est"))).alias("reach_est"),
        F.sum(F.when(F.col("t") >= 1,
                     F.greatest(F.lit(0.0),
                                F.col("est") - F.col("prev")) /
                     F.col("t"))).alias("harmonic")))


def hits(edges: DataFrame, nodes: DataFrame | None = None,
         iterations: int = 10,
         validate_nodes: bool = True) -> DataFrame:
    """HITS hubs-and-authorities (Kleinberg 1999, "Authoritative sources
    in a hyperlinked environment") over a (src, dst) edge table →
    (node, auth, hub) — the link-analysis complement of :func:`pagerank`:
    a page is a good AUTHORITY when good hubs point at it and a good HUB
    when it points at good authorities, the two scores reinforcing
    mutually. Power iteration; scores converge to the principal singular
    pair of the adjacency matrix.

    Normalization is DEFERRED to one final L2 step instead of Kleinberg's
    per-iteration rescale — mathematically identical output (per-step
    normalization only rescales, and the final L2 cancels every scale
    factor), and it turns the loop into a single lazy plan: no mid-loop
    norm jobs, so no O(iterations²) lineage re-execution — the whole
    computation is 2 scalar-norm jobs + 1 result materialization
    regardless of iteration count. The trade is documented float range:
    raw sums grow as ||A||₂^(2·iters), so hundreds of iterations on
    high-degree graphs would overflow doubles — at the ≤20 iterations
    HITS needs for convergence, growth tops out around degree^(2·20),
    far inside double range for any real web graph.

    Same scale shape as pagerank otherwise: the edge table is pinned once
    (localCheckpoint) so expensive upstream lineage never re-executes;
    each half-iteration is ONE edge join + one combinable sum keyed on
    the receiving endpoint. Deterministic up to float summation order —
    cross-engine comparisons round (the entry query uses 7dp, like
    pagerank's)."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    edges = edges.select("src", "dst").localCheckpoint(eager=False)
    nodes = _vertex_set(edges, nodes, validate=validate_nodes)
    nodes = nodes.repartition("node").localCheckpoint(eager=False)
    if nodes.count() == 0:
        raise ValueError("hits over an empty graph")

    hub = nodes.select("node", F.lit(1.0).alias("hub"))
    auth = None
    for _ in range(iterations):
        a_raw = (hub.join(edges, hub["node"] == edges["src"])
                 .groupBy(F.col("dst").alias("node"))
                 .agg(F.sum("hub").alias("auth")))
        auth = (nodes.join(a_raw, "node", "left")
                .select("node", F.coalesce("auth", F.lit(0.0)).alias("auth")))
        h_raw = (auth.join(edges, auth["node"] == edges["dst"])
                 .groupBy(F.col("src").alias("node"))
                 .agg(F.sum("auth").alias("hub")))
        hub = (nodes.join(h_raw, "node", "left")
               .select("node", F.coalesce("hub", F.lit(0.0)).alias("hub")))

    a_nrm = auth.agg(F.sqrt(F.sum(F.col("auth") * F.col("auth")))
                     .alias("anrm"))
    h_nrm = hub.agg(F.sqrt(F.sum(F.col("hub") * F.col("hub")))
                    .alias("hnrm"))
    return (nodes.join(auth, "node", "left").join(hub, "node", "left")
            .crossJoin(F.broadcast(a_nrm)).crossJoin(F.broadcast(h_nrm))
            .select("node",
                    F.when(F.col("anrm") > 0,
                           F.coalesce("auth", F.lit(0.0)) / F.col("anrm"))
                    .otherwise(F.lit(0.0)).alias("auth"),
                    F.when(F.col("hnrm") > 0,
                           F.coalesce("hub", F.lit(0.0)) / F.col("hnrm"))
                    .otherwise(F.lit(0.0)).alias("hub")))
