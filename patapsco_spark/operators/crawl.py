"""robots.txt rules + politeness-partitioned crawl frontier.

A crawl-scale engine sits next to a crawler: before a URL is fetched (or a
stored capture is admitted into a corpus that honors robots), the host's
robots.txt verdict applies, and fetches are sequenced per host so no origin
is hammered. Both stages here are DataFrame-native and SQL-replayable:

- :func:`parse_robots` — robots.txt bodies → a RULES table
  (host, pattern, like_pat, pattern_len, allow) for one agent per the
  RFC 9309 group-selection rules (most specific ``User-agent`` group wins,
  ``*`` as fallback; rules from multiple groups naming the same agent are
  merged), plus per-host ``crawl_delay`` and ``sitemap`` side tables.
  Patterns support the RFC's ``*`` wildcard and ``$`` end anchor by
  compiling each to a SQL ``LIKE`` pattern at parse time (``*`` → ``%``,
  ``$`` → anchored end, ``%_\\`` escaped) — so MATCHING is pure Catalyst
  (and replayable in any SQL engine), while parsing is one Arrow pass over
  the (host, body) table.
- :func:`robots_filter` — URLs × rules → per-URL verdict with RFC 9309
  precedence: the longest matching pattern wins, ``Allow`` beats
  ``Disallow`` on equal length, no match ⇒ allowed. The rules side is tiny
  next to the URL stream (one host's rules ≤ KBs), so it broadcasts; the
  only shuffle is the per-URL best-rule aggregation, and URLs of
  robots-less hosts skip even that via the broadcast left join's null arm.
- :func:`crawl_frontier` — candidate URLs → a per-host fetch schedule:
  anti-join the seen set on canonical url, apply robots, then assign each
  surviving URL its per-host fetch ``slot`` by (priority desc, url asc) —
  a deterministic total order. Partitioning by host IS the politeness
  model: one host's queue lands in one task, slots are its fetch sequence
  (multiply by the host's crawl-delay for wall-clock pacing), and the
  host-hash shuffle spreads origins across executors. Per-key state is
  bounded by ``per_host_limit`` (frontier caps per politeness round), so
  a celebrity host costs a truncated window, not unbounded memory.

No reference analogue (patapsco ingests already-crawled jsonl); this
exists for the north star's Common-Crawl framing, next to linkgraph.py
and sources/warc.py.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .weburl import canonicalize_url, host_of

RULES_SCHEMA = ("host string, pattern string, like_pat string, "
                "pattern_len int, allow boolean")
DELAY_SCHEMA = "host string, crawl_delay double"
SITEMAP_SCHEMA = "host string, sitemap string"


def _like_pattern(pat: str) -> str:
    """robots path pattern → SQL LIKE pattern: escape LIKE metachars,
    ``*`` → ``%``, trailing unescaped ``$`` anchors the end (no trailing
    ``%``). A lone ``$`` elsewhere is literal per RFC 9309."""
    anchored = pat.endswith("$")
    body = pat[:-1] if anchored else pat
    out = []
    for ch in body:
        if ch in ("%", "_", "\\"):
            out.append("\\" + ch)
        elif ch == "*":
            out.append("%")
        else:
            out.append(ch)
    if not anchored:
        out.append("%")
    return "".join(out)


def parse_robots_body(host: str, body: str, agent: str = "*"
                      ) -> tuple[list, list, list]:
    """One robots.txt → (rule rows, delay rows, sitemap rows) for ``agent``.

    Group selection per RFC 9309: collect groups by their User-agent
    lines; if any group names ``agent`` (case-insensitive exact token),
    those groups apply, else the ``*`` groups. Sitemap lines are
    group-independent. Unknown directives are ignored; a blank line does
    NOT end a group (only a new User-agent after rules does)."""
    agent = agent.lower()
    groups: list[dict] = []   # {"agents": [...], "rules": [...], "delay": x}
    cur: dict | None = None
    expecting_agents = False
    sitemaps: list[str] = []
    for raw in (body or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key, val = key.strip().lower(), val.strip()
        if key == "sitemap":
            if val:
                sitemaps.append(val)
            continue
        if key == "user-agent":
            if cur is None or not expecting_agents:
                cur = {"agents": [], "rules": [], "delay": None}
                groups.append(cur)
                expecting_agents = True
            cur["agents"].append(val.lower())
            continue
        expecting_agents = False
        if cur is None:
            continue  # rules before any User-agent line: no group, ignored
        if key in ("allow", "disallow"):
            if val:  # empty Disallow means "allow all" — no rule row
                cur["rules"].append((val, key == "allow"))
        elif key == "crawl-delay":
            try:
                cur["delay"] = float(val)
            except ValueError:
                pass
    chosen = [g for g in groups if agent in g["agents"]]
    if not chosen:
        chosen = [g for g in groups if "*" in g["agents"]]
    rules, delays = [], []
    for g in chosen:
        for pat, allow in g["rules"]:
            rules.append((host, pat, _like_pattern(pat), len(pat), allow))
        if g["delay"] is not None:
            delays.append((host, g["delay"]))
    # several chosen groups may carry delays; keep the strictest (max)
    if delays:
        delays = [(host, max(d for _, d in delays))]
    return rules, delays, [(host, s) for s in sitemaps]


def parse_robots(robots: DataFrame, agent: str = "*",
                 host_col: str = "host", body_col: str = "body"
                 ) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(host, body) robots.txt table → (rules, delays, sitemaps)
    DataFrames (schemas above). One Arrow pass; the three outputs share
    the parse via a single exploded pass each (parsing twice would also
    be correct — bodies are KB-sized — but this keeps one code path)."""
    def run_rules(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for h, b in zip(pdf[host_col], pdf[body_col]):
                rows.extend(parse_robots_body(h, b, agent)[0])
            yield pd.DataFrame(
                rows, columns=["host", "pattern", "like_pat",
                               "pattern_len", "allow"])

    def run_delays(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for h, b in zip(pdf[host_col], pdf[body_col]):
                rows.extend(parse_robots_body(h, b, agent)[1])
            yield pd.DataFrame(rows, columns=["host", "crawl_delay"])

    def run_maps(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for h, b in zip(pdf[host_col], pdf[body_col]):
                rows.extend(parse_robots_body(h, b, agent)[2])
            yield pd.DataFrame(rows, columns=["host", "sitemap"])

    src = robots.select(host_col, body_col)
    return (src.mapInPandas(run_rules, schema=RULES_SCHEMA),
            src.mapInPandas(run_delays, schema=DELAY_SCHEMA),
            src.mapInPandas(run_maps, schema=SITEMAP_SCHEMA))


def _match_path(url_col: str = "url") -> Column:
    """The robots match target: path plus '?'-joined query when present
    (the de-facto Googlebot semantics), '/' when the URL has no path."""
    path = F.coalesce(F.parse_url(F.col(url_col), F.lit("PATH")), F.lit(""))
    path = F.when(path == "", "/").otherwise(path)
    query = F.parse_url(F.col(url_col), F.lit("QUERY"))
    return F.when(query.isNull(), path).otherwise(
        F.concat(path, F.lit("?"), query))


def robots_filter(urls: DataFrame, rules: DataFrame,
                  url_col: str = "url", keep_denied: bool = False
                  ) -> DataFrame:
    """URLs × parsed rules → RFC 9309 verdict per URL.

    Precedence: among matching rules for the URL's host, longest
    ``pattern`` wins; ``Allow`` beats ``Disallow`` at equal length; no
    matching rule (or no rules for the host) ⇒ allowed.

    Returns ``urls``' columns plus ``allowed`` when ``keep_denied``, else
    only the allowed rows (no extra column). Plan shape: ZERO shuffles on
    the URL stream — rules roll up to one array row per host (tiny: a
    host's rules are KBs; even 10^8 robots'd hosts make a side table next
    to a 10^12-URL stream), broadcast-joined on host, and the best match
    is a JVM-side filter+aggregate over the ≤rules-per-host array, so the
    verdict fuses into the page scan. Duplicate input rows keep their
    multiplicity (no groupBy on the stream)."""
    per_host = rules.groupBy("host").agg(
        F.collect_list(F.struct("like_pat", "pattern_len", "allow"))
        .alias("__rules"))
    best = F.expr(r"""
        aggregate(
          filter(__rules, r -> __path LIKE r.like_pat ESCAPE '\\'),
          cast(null as struct<pattern_len: int, allow_i: int>),
          (acc, r) -> CASE
            WHEN acc IS NULL OR struct(r.pattern_len, cast(r.allow as int))
                                > struct(acc.pattern_len, acc.allow_i)
            THEN named_struct('pattern_len', r.pattern_len,
                              'allow_i', cast(r.allow as int))
            ELSE acc END)""")
    out = (urls.withColumn("__path", _match_path(url_col))
           .withColumn("host", host_of(url_col))
           .join(F.broadcast(per_host), "host", "left")
           .withColumn("__best", best))
    allowed = F.coalesce(F.col("__best.allow_i") == 1, F.lit(True))
    if keep_denied:
        return out.select(*urls.columns, allowed.alias("allowed"))
    return out.where(allowed).select(*urls.columns)


_RE_SM_URL = None  # compiled lazily below (module import stays cheap)


def parse_sitemap_body(body: str) -> tuple[list, list]:
    """One sitemap XML → (url entries, child sitemap locs).

    Handles both document kinds: ``<urlset>`` (leaf — ``<url>`` entries
    with loc/lastmod/changefreq/priority) and ``<sitemapindex>`` (index —
    ``<sitemap><loc>`` children a crawler must fetch next). Bounded regex
    parsing (same honesty class as the link extractor): entries missing
    ``<loc>`` are skipped, optional fields come back None/NaN. CDATA
    wrappers and surrounding whitespace are stripped from every field."""
    import re as _re
    global _RE_SM_URL
    if _RE_SM_URL is None:
        _RE_SM_URL = {
            "url": _re.compile(r"<url\s*>(.*?)</url\s*>", _re.S | _re.I),
            "smap": _re.compile(r"<sitemap\s*>(.*?)</sitemap\s*>",
                                _re.S | _re.I),
            "loc": _re.compile(r"<loc\s*>(.*?)</loc\s*>", _re.S | _re.I),
            "lastmod": _re.compile(r"<lastmod\s*>(.*?)</lastmod\s*>",
                                   _re.S | _re.I),
            "freq": _re.compile(r"<changefreq\s*>(.*?)</changefreq\s*>",
                                _re.S | _re.I),
            "pri": _re.compile(r"<priority\s*>(.*?)</priority\s*>",
                               _re.S | _re.I),
        }
    r = _RE_SM_URL

    def clean(s: str | None) -> str | None:
        if s is None:
            return None
        s = s.strip()
        if s.startswith("<![CDATA[") and s.endswith("]]>"):
            s = s[9:-3].strip()
        return s

    def field(rx, blob: str) -> str | None:
        m = rx.search(blob)
        return clean(m.group(1)) if m else None

    entries, children = [], []
    body = body or ""
    for m in r["url"].finditer(body):
        blob = m.group(1)
        loc = field(r["loc"], blob)
        if not loc:
            continue
        pri = field(r["pri"], blob)
        try:
            pri_f = float(pri) if pri is not None else None
        except ValueError:
            pri_f = None
        entries.append((loc, field(r["lastmod"], blob),
                        field(r["freq"], blob), pri_f))
    for m in r["smap"].finditer(body):
        loc = field(r["loc"], m.group(1))
        if loc:
            children.append(loc)
    return entries, children


SITEMAP_SCHEMA_URLS = ("sitemap string, loc string, lastmod string, "
                       "changefreq string, priority double")


def parse_sitemaps(sitemaps: DataFrame, url_col: str = "url",
                   body_col: str = "body"
                   ) -> tuple[DataFrame, DataFrame]:
    """(url, body) sitemap table → (url entries, child sitemap locs).

    One Arrow pass each; the children frame feeds the next fetch round of
    a sitemap-index walk (the iteration is the caller's loop — depth is
    tiny, the spec caps an index at 50k children)."""
    def run_urls(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for u, b in zip(pdf[url_col], pdf[body_col]):
                rows.extend((u, *e) for e in parse_sitemap_body(b)[0])
            yield pd.DataFrame(rows, columns=[
                "sitemap", "loc", "lastmod", "changefreq", "priority"])

    def run_children(batches: Iterator[pd.DataFrame]
                     ) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for u, b in zip(pdf[url_col], pdf[body_col]):
                rows.extend((u, c) for c in parse_sitemap_body(b)[1])
            yield pd.DataFrame(rows, columns=["sitemap", "child"])

    src = sitemaps.select(url_col, body_col)
    return (src.mapInPandas(run_urls, schema=SITEMAP_SCHEMA_URLS),
            src.mapInPandas(run_children, schema="sitemap string, child string"))


def crawl_frontier(candidates: DataFrame, seen: DataFrame | None = None,
                   rules: DataFrame | None = None,
                   url_col: str = "url", priority_col: str | None = None,
                   per_host_limit: int | None = None) -> DataFrame:
    """Candidate URLs → per-host politeness schedule (url, host, slot).

    Stages: canonical-url anti-join against ``seen`` (discovery dedup),
    :func:`robots_filter` when ``rules`` is given, then per host a
    deterministic fetch order — ``priority_col`` desc (when given), url
    asc — truncated at ``per_host_limit``. ``slot`` is the URL's
    1-indexed position in its host's fetch queue: a crawler fetching one
    URL per host per politeness interval fetches slot-1 URLs first, and
    host-hash partitioning keeps each origin's queue in one task."""
    df = candidates
    if seen is not None:
        df = (df.withColumn("__canon", canonicalize_url(url_col))
              .join(seen.select(canonicalize_url(url_col).alias("__canon"))
                    .distinct(),
                    "__canon", "left_anti")
              .drop("__canon"))
    if rules is not None:
        df = robots_filter(df, rules, url_col=url_col)
    df = df.withColumn("host", host_of(url_col))
    order = ([F.col(priority_col).desc()] if priority_col else []) + \
        [F.col(url_col).asc()]
    w = Window.partitionBy("host").orderBy(*order)
    out = df.withColumn("slot", F.row_number().over(w))
    if per_host_limit is not None:
        out = out.where(F.col("slot") <= per_host_limit)
    return out
