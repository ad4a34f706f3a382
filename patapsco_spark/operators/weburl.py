"""URL canonicalization + domain-level operators for web-corpus pipelines.

Common-Crawl-style ingestion dedups first on the CANONICAL URL (the same
page is crawled as ``http://Site.com/a?utm_source=x`` and
``https://site.com/a`` endlessly) and filters/samples at the REGISTERED
DOMAIN level (per-domain quality priors, host caps). These operators are
pure Catalyst column expressions — JVM regex/array ops, no Python UDFs —
so they fuse into the page scan via whole-stage codegen and run at I/O
speed at 100 TB.

Canonicalization rules (each documented because "canonical" is a policy,
not a fact):
- scheme and host lowercase; explicit default ports dropped
  (``:80`` for http, ``:443`` for https);
- the fragment is dropped;
- known tracking query parameters are dropped (``utm_*``, ``fbclid``,
  ``gclid``, ``msclkid``, ``ref``, ``ref_src``);
- remaining query parameters are sorted (param order is almost never
  semantic; sorting merges permuted duplicates);
- trailing slashes are stripped (``/a/`` ≡ ``/a``, host root ``/`` ≡ none);
- ``www.`` is KEPT — stripping it conflates genuinely distinct hosts on
  some origins, and the Common Crawl index keeps it too.

``registered_domain`` uses the last-two-labels heuristic with a small list
of common two-level public suffixes (``co.uk``-style) taking three. The
full Public Suffix List is a data file concern: pass ``extra_suffixes`` to
extend it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

TRACKING_PARAM_RE = "^(utm_[^=]*|fbclid|gclid|msclkid|ref|ref_src)="

# common two-level public suffixes (registered domain = 3 labels there)
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "com.tr", "com.ar",
    "co.in", "co.kr", "co.za", "co.nz",
)


def canonicalize_url(url: Column | str) -> Column:
    """URL → canonical form (rules in the module docstring)."""
    u = F.trim(F.col(url) if isinstance(url, str) else url)
    u = F.regexp_replace(u, "#.*$", "")                      # drop fragment
    # scheme://host[:port] prefix, lowercased; rest kept verbatim
    prefix = F.lower(F.regexp_extract(u, "^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)", 1))
    rest = u.substr(F.length(prefix) + F.lit(1), F.length(u))
    prefix = F.regexp_replace(prefix, "^(http://[^/:]+):80$", "$1")
    prefix = F.regexp_replace(prefix, "^(https://[^/:]+):443$", "$1")
    path = F.regexp_replace(rest, r"\?.*$", "")
    path = F.regexp_replace(path, "/+$", "")                 # trailing slash
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE)))
    qs = F.array_join(params, "&")
    return F.concat(prefix, path,
                    F.when(qs != "", F.concat(F.lit("?"), qs))
                     .otherwise(F.lit("")))


def host_of(url: Column | str) -> Column:
    u = F.col(url) if isinstance(url, str) else url
    return F.lower(F.regexp_extract(F.trim(u),
                                    "^[A-Za-z][A-Za-z0-9+.-]*://([^/:?#]+)", 1))


def registered_domain(host: Column,
                      extra_suffixes: tuple[str, ...] = ()) -> Column:
    """Host → registered domain (eTLD+1 heuristic; see module docstring)."""
    suffixes = tuple(TWO_LEVEL_SUFFIXES) + tuple(extra_suffixes)
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.array_join(F.slice(labels, F.greatest(n - 1, F.lit(1)), 2), ".")
    last3 = F.array_join(F.slice(labels, F.greatest(n - 2, F.lit(1)), 3), ".")
    return F.when((n >= 3) & last2.isin(*suffixes), last3).otherwise(
        F.when(n >= 2, last2).otherwise(host))


def domain_stats(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Per-registered-domain rollup: page count, distinct canonical URLs,
    and the duplicate rate (1 - distinct/total) — the signal behind
    per-domain crawl caps and dup-heavy-domain filters.

    Exact distinct via two-level aggregation (groupBy (domain, canonical)
    then (domain)) — both shuffles are map-side combinable and keyed no
    wider than the domain, unlike a countDistinct expand."""
    d = pages.select(
        registered_domain(host_of(url_col)).alias("domain"),
        canonicalize_url(url_col).alias("canonical"))
    per_url = d.groupBy("domain", "canonical").agg(
        F.count("*").alias("n_pages"))
    return (per_url.groupBy("domain")
            .agg(F.sum("n_pages").cast("long").alias("n_pages"),
                 F.count("*").cast("long").alias("n_canonical"))
            .withColumn("dup_rate",
                        F.round(F.lit(1.0) - F.col("n_canonical") /
                                F.col("n_pages"), 6)))


def dedup_by_canonical_url(pages: DataFrame, url_col: str = "url",
                           order_col: str | None = None) -> DataFrame:
    """Keep ONE page per canonical URL — web dedup step 1 (before any
    content hashing). The survivor is the minimum ``order_col`` (default:
    the raw URL string, so the choice is deterministic); ties break on the
    raw URL. One shuffle on the canonical key, rank inside each group —
    the skew ceiling is the most-duplicated URL, which canonical-URL
    groups keep small (unlike domain keys)."""
    order = order_col or url_col
    w = (Window.partitionBy("__canonical")
         .orderBy(F.col(order).asc(), F.col(url_col).asc()))
    return (pages.withColumn("__canonical", canonicalize_url(url_col))
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn", "__canonical"))


def latest_revision(pages: DataFrame, url_col: str = "url",
                    ts_col: str = "warc_ts",
                    content_col: str | None = None) -> DataFrame:
    """Re-crawl collapse: keep the NEWEST capture per canonical URL — the
    cross-crawl dedup every multi-snapshot corpus (Common Crawl monthly
    dumps) runs before content dedup, so a page recrawled 12 times
    contributes its latest revision once. Survivor order: ``ts_col``
    descending, then raw URL ascending, then (when ``content_col`` is
    given) md5 of the content ascending — a total order, so byte-identical
    reruns keep the byte-identical row even when a crawler logged two
    captures at the same second. Same single-shuffle shape as
    :func:`dedup_by_canonical_url` (which keeps the MINIMUM order key —
    use that for first-capture semantics)."""
    keys = [F.col(ts_col).desc(), F.col(url_col).asc()]
    if content_col is not None:
        keys.append(F.md5(F.col(content_col)).asc())
    w = Window.partitionBy("__canonical").orderBy(*keys)
    return (pages.withColumn("__canonical", canonicalize_url(url_col))
            .withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") == 1)
            .drop("__rn", "__canonical"))


def revision_stats(pages: DataFrame, url_col: str = "url",
                   ts_col: str = "warc_ts",
                   content_col: str = "html") -> DataFrame:
    """Cross-crawl change profile per canonical URL — the companion query
    to :func:`latest_revision`: over a multi-snapshot corpus (Common Crawl
    monthly dumps), how often was each page re-captured and how often did
    its content actually change? Output one row per canonical url:

    - ``n_captures`` — captures collapsing to this canonical url
    - ``n_versions`` — distinct content fingerprints (md5 of content)
    - ``n_changes``  — capture-to-capture transitions whose fingerprint
      differs from the previous capture's, captures ordered by
      (ts asc, raw url asc, fingerprint asc) — a total order, so reruns
      count identically even with same-second captures
    - ``first_ts`` / ``last_ts`` — capture time span

    ``n_changes`` can be smaller than ``n_versions - 1`` only when content
    oscillates A→B→A (2 versions, 2 changes) — both signals matter to a
    recrawl scheduler (change_rate drives revisit priority à la Cho &
    Garcia-Molina's freshness work).

    Scale shape: the lag window and the groupBy share the canonical-url
    key, so Catalyst reuses one hash exchange; per-key state is bounded by
    captures-per-url (≤ hundreds of snapshots even for a 10-year archive).
    """
    w = (Window.partitionBy("__canonical")
         .orderBy(F.col(ts_col).asc(), F.col(url_col).asc(),
                  F.col("__fp").asc()))
    df = (pages.withColumn("__canonical", canonicalize_url(url_col))
          .withColumn("__fp", F.md5(F.col(content_col)))
          .withColumn("__prev", F.lag("__fp").over(w)))
    changed = (F.col("__prev").isNotNull()
               & (F.col("__prev") != F.col("__fp"))).cast("long")
    return (df.groupBy(F.col("__canonical").alias("url"))
            .agg(F.count("*").alias("n_captures"),
                 F.count_distinct("__fp").alias("n_versions"),
                 F.sum(changed).alias("n_changes"),
                 F.min(ts_col).alias("first_ts"),
                 F.max(ts_col).alias("last_ts")))


def surt(url: Column | str) -> Column:
    """URL → SURT key (Sort-friendly URI Reordering Transform), the sort/
    lookup key of CDX crawl indexes: host labels reversed and comma-joined,
    then ``)`` and the lowercased path+query, e.g.
    ``https://www.Example.com:443/A/b?q=1#f`` → ``com,example)/a/b?q=1``.

    Policy (heritrix/pywb "massaged" SURT, the form Common Crawl's index
    files sort by): scheme dropped, default AND explicit ports dropped,
    ONE leading ``www.`` stripped (unlike canonicalize_url above — the
    CDX key merges www/apex on purpose; the canonical URL does not),
    fragment dropped, tracking params dropped + rest sorted (same query
    policy as canonicalize_url), whole key lowercased. The lowering happens
    BEFORE canonicalization so the query-param sort is case-insensitive —
    otherwise '?B=2&a=1' and '?b=2&a=1' would sort differently and produce
    two keys for captures the lowercased key exists to merge. Pure
    Catalyst."""
    u = F.col(url) if isinstance(url, str) else url
    canon = canonicalize_url(F.lower(u))
    host = F.regexp_replace(host_of(canon), r"^www\.", "")
    pathq = F.regexp_extract(
        canon, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?]*(.*)$", 1)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    return F.concat(rev, F.lit(")"), pathq)


def build_cdx(warc_df: DataFrame) -> DataFrame:
    """WARC records (read_warc output) → the CDX lookup index: one row per
    record keyed by (surt, warc_ts) with the (warc_file, warc_offset)
    pointer that seeks straight back to the record. Globally range-sorted
    on the key — ``repartitionByRange`` samples the key distribution so
    hot domains spread across partitions instead of hashing into one, and
    each output file is internally sorted: exactly the layout a binary-
    search CDX reader (or a min/max-pruned parquet scan) needs."""
    idx = warc_df.select(
        surt(F.col("url")).alias("surt"),
        "warc_ts", "url", "http_status", "content_type",
        F.length("html").cast("long").alias("n_bytes"),
        "warc_file", "warc_offset")
    return (idx.repartitionByRange("surt", "warc_ts")
            .sortWithinPartitions("surt", "warc_ts"))
