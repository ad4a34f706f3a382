"""Link-graph extraction + PageRank: anchor parsing, edge building, domain
rollup, and iteration-exact agreement with a dense numpy reference."""

from collections import defaultdict

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from patapsco_spark.operators.linkgraph import (
    anchor_blobs, anchor_edges, anchor_summaries, domain_edges,
    extract_links_series, link_edges, pagerank, with_anchor_text)


def test_extract_links_resolution_and_filters():
    html = pd.Series([
        (b'<a href="https://a.example/x">A</a> '
         b"<a href='/rel'>r</a> "
         b'<a href="sub/page.html">s</a> '
         b'<a href="javascript:void(0)">j</a> '
         b'<a href="mailto:x@y">m</a> '
         b'<a href="#frag">f</a> '
         b'<a class="z" href="ftp://no">p</a>'),
        None,
        b"no links here",
    ])
    base = pd.Series(["https://host.example/dir/page", "https://b/", "https://c/"])
    got = extract_links_series(html, base)
    assert got[0] == ["https://a.example/x",
                      "https://host.example/rel",
                      "https://host.example/dir/sub/page.html"]
    assert got[1] == [] and got[2] == []


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, h.encode()) for u, h in rows], "url string, html binary")


def test_link_edges_distinct_and_self_drop(spark):
    pages = _pages(spark, [
        ("https://a/", '<a href="https://b/">1</a><a href="https://b/">2</a>'
                       '<a href="https://a/">self</a>'),
        ("https://b/", '<a href="https://a/">x</a>'),
    ])
    got = {(r.src, r.dst) for r in link_edges(pages).collect()}
    assert got == {("https://a/", "https://b/"), ("https://b/", "https://a/")}
    with_self = {(r.src, r.dst)
                 for r in link_edges(pages, keep_self=True).collect()}
    assert ("https://a/", "https://a/") in with_self


def test_domain_edges_rollup(spark):
    edges = spark.createDataFrame(
        [("https://x.foo.com/1", "https://bar.co.uk/p"),
         ("https://y.foo.com/2", "https://z.bar.co.uk/q"),
         ("https://foo.com/3", "https://foo.com/4")],
        "src string, dst string")
    got = {(r.src_domain, r.dst_domain): r.n_links
           for r in domain_edges(edges).collect()}
    assert got == {("foo.com", "bar.co.uk"): 2, ("foo.com", "foo.com"): 1}


def _ref_pagerank(edges, nodes, iterations, d):
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    adj = defaultdict(list)
    for s, t in edges:
        adj[idx[s]].append(idx[t])
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        nr = np.full(n, (1.0 - d) / n)
        dang = sum(r[i] for i in range(n) if not adj[i])
        nr += d * dang / n
        for i, ts in adj.items():
            for t in ts:
                nr[t] += d * r[i] / len(ts)
        r = nr
    return {nodes[i]: r[i] for i in range(n)}


def _hash_graph(n_nodes=24, seed="pr"):
    """Deterministic digraph with dangling + isolated nodes + in-degree skew
    (node 0 is a celebrity target)."""
    import hashlib
    nodes = [f"n{i}" for i in range(n_nodes)]
    edges = []
    for i in range(n_nodes - 4):  # last 4 nodes: dangling or isolated
        h = hashlib.md5(f"{seed}-{i}".encode()).digest()
        for k in range(1 + h[0] % 3):
            j = h[k + 1] % n_nodes
            if h[k + 4] % 3 == 0:
                j = 0
            if j != i:
                edges.append((f"n{i}", f"n{j}"))
    return nodes, sorted(set(edges))


@pytest.mark.parametrize("iterations", [1, 7])
def test_pagerank_matches_dense_reference(spark, iterations):
    nodes, edges = _hash_graph()
    e = spark.createDataFrame(edges, "src string, dst string")
    nd = spark.createDataFrame([(n,) for n in nodes], "node string")
    got = {r.node: r.rank
           for r in pagerank(e, nodes=nd, iterations=iterations,
                             truncate_every=3).collect()}
    exp = _ref_pagerank(edges, nodes, iterations, 0.85)
    assert set(got) == set(exp)
    for n in nodes:
        assert got[n] == pytest.approx(exp[n], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_two_node_cycle(spark):
    e = spark.createDataFrame([("a", "b"), ("b", "a")],
                              "src string, dst string")
    got = {r.node: r.rank for r in pagerank(e, iterations=20).collect()}
    assert got["a"] == pytest.approx(0.5, abs=1e-12)
    assert got["b"] == pytest.approx(0.5, abs=1e-12)


def test_pagerank_default_nodes_from_edges(spark):
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    got = {r.node: r.rank for r in pagerank(e, iterations=3).collect()}
    assert set(got) == {"a", "b"}
    assert got["b"] > got["a"]


def test_pagerank_validations(spark):
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="iterations"):
        pagerank(e, iterations=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank(e, damping=1.5)
    empty = e.where("1=0")
    with pytest.raises(ValueError, match="empty graph"):
        pagerank(empty)


# ---------------------------------------------------------------------------
# HyperBall
# ---------------------------------------------------------------------------

import hashlib
import math

from patapsco_spark.operators.linkgraph import hyperball


def _ref_hyperball(edges, nodes, t, direction="in"):
    """Pure-Python replay of the exact register protocol (m=64, md5 low-60
    hash, rho over the 54-bit window) — NOT an exact set count; estimates
    must match the Spark output to float precision."""
    if direction == "out":
        edges = [(d, s) for s, d in edges]
    succ = {}
    for s, d in edges:
        succ.setdefault(s, set()).add(d)

    def init_regs(n):
        h = int(hashlib.md5(n.encode()).hexdigest()[:15], 16)
        j, w = h % 64, h // 64
        return {j: 55 if w == 0 else 55 - w.bit_length()}

    def estimate(regs):
        cnt = len(regs)
        z = (64.0 - cnt) + sum(2.0 ** -r for r in sorted(regs))
        raw = 2904.064 / z
        if raw <= 160.0 and cnt < 64:
            return 64.0 * math.log(64.0 / (64 - cnt))
        return raw

    regs = {n: init_regs(n) for n in nodes}
    ests = {n: [estimate(regs[n])] for n in nodes}
    for _ in range(t):
        new = {n: dict(regs[n]) for n in nodes}
        for s, ds in succ.items():
            if s not in regs:
                continue
            for d in ds:
                tgt = new.setdefault(d, {})
                for j, r in regs[s].items():
                    tgt[j] = max(tgt.get(j, 0), r)
        regs = new
        for n in nodes:
            ests[n].append(estimate(regs[n]))
    out = {}
    for n in nodes:
        hc = sum(max(0.0, ests[n][k] - ests[n][k - 1]) / k
                 for k in range(1, t + 1))
        out[n] = (ests[n][t], hc)
    return out


@pytest.mark.parametrize("direction", ["in", "out"])
def test_hyperball_matches_protocol_reference(spark, direction):
    nodes, edges = _hash_graph()
    e = spark.createDataFrame(edges, "src string, dst string")
    nd = spark.createDataFrame([(n,) for n in nodes], "node string")
    got = {r.node: (r.reach_est, r.harmonic)
           for r in hyperball(e, nodes=nd, t=3,
                              direction=direction).collect()}
    exp = _ref_hyperball(edges, nodes, 3, direction=direction)
    assert set(got) == set(exp)
    for n in nodes:
        assert got[n][0] == pytest.approx(exp[n][0], rel=1e-9)
        assert got[n][1] == pytest.approx(exp[n][1], rel=1e-9)


def test_hyperball_partitioning_independent(spark):
    nodes, edges = _hash_graph(n_nodes=16)
    nd = spark.createDataFrame([(n,) for n in nodes], "node string")
    outs = []
    for parts in (1, 7):
        e = spark.createDataFrame(edges, "src string, dst string") \
                 .repartition(parts)
        outs.append({r.node: (round(r.reach_est, 9), round(r.harmonic, 9))
                     for r in hyperball(e, nodes=nd, t=3).collect()})
    assert outs[0] == outs[1]


def test_hyperball_chain_growth(spark):
    """a→b→c→d: the in-ball of d grows by one node per round and the
    estimate tracks true cardinality closely in the linear-counting
    regime (tiny sets, m=64)."""
    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d")], "src string, dst string")
    got = {r.node: r for r in hyperball(e, t=3).collect()}
    assert got["d"].reach_est == pytest.approx(4.0, rel=0.15)
    assert got["a"].reach_est == pytest.approx(1.0, rel=0.10)
    # harmonic(d) ~ 1/1 + 1/2 + 1/3; HLL noise stays well inside 25%
    assert got["d"].harmonic == pytest.approx(1.8333, rel=0.25)
    assert got["a"].harmonic == pytest.approx(0.0, abs=0.2)


def test_hyperball_validations(spark):
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="t must be"):
        hyperball(e, t=0)
    with pytest.raises(ValueError, match="direction"):
        hyperball(e, direction="sideways")


def test_nodes_must_cover_endpoints(spark):
    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    partial = spark.createDataFrame([("a",)], "node string")
    with pytest.raises(ValueError, match="does not cover"):
        pagerank(e, nodes=partial, iterations=1)
    with pytest.raises(ValueError, match="does not cover"):
        hyperball(e, nodes=partial, t=1)


def test_anchor_edges_text_extraction(spark):
    pages = _pages(spark, [
        ("https://a/",
         '<a href="https://b/">  Go <b>HERE</b>\n now </a>'   # tags stripped, ws collapsed
         '<a href="https://b/">Go HERE now</a>'               # duplicate text kept
         '<a href="https://c/"><img src="x.png"></a>'          # empty text -> dropped
         '<a href="https://a/">self</a>'                        # self edge dropped
         '<a href="javascript:void(0)">skip</a>'
         '<a href="/rel">relative</a>'
         '<a href="https://d/">dangling'),                      # no </a> -> no text row
        ("https://b/", '<a href="https://a/">Back</a>'),
    ])
    rows = anchor_edges(pages).collect()
    got = sorted((r.src, r.dst, r.anchor) for r in rows)
    assert got == [
        ("https://a/", "https://a/rel", "relative"),
        ("https://a/", "https://b/", "Go HERE now"),
        ("https://a/", "https://b/", "Go HERE now"),
        ("https://b/", "https://a/", "Back"),
    ]
    with_self = anchor_edges(pages, keep_self=True).collect()
    assert ("https://a/", "https://a/", "self") in {
        (r.src, r.dst, r.anchor) for r in with_self}


def test_anchor_edges_truncation():
    from patapsco_spark.operators.linkgraph import extract_anchor_series
    html = pd.Series([('<a href="https://b/">' + "x" * 500 + "</a>").encode()])
    got = extract_anchor_series(html, pd.Series(["https://a/"]),
                                max_text_len=16)
    assert got[0] == [("https://b/", "x" * 16)]


def test_anchor_summaries(spark):
    edges = spark.createDataFrame(
        [("s1", "d1", "blue"), ("s1", "d1", "blue"), ("s2", "d1", "red"),
         ("s2", "d1", "azul"),                       # tie red/azul at 1 -> azul? no: blue wins at 2
         ("s3", "d2", "b"), ("s4", "d2", "a")],      # tie at 1 -> lexicographic "a"
        "src string, dst string, anchor string")
    got = {r.dst: r for r in anchor_summaries(edges).collect()}
    assert got["d1"].n_anchors == 4 and got["d1"].n_srcs == 2
    assert got["d1"].top_anchor == "blue"
    assert got["d2"].n_anchors == 2 and got["d2"].n_srcs == 2
    assert got["d2"].top_anchor == "a"


def test_rel_nofollow_dropped(spark):
    html = ('<a href="https://b/" rel="nofollow">no</a>'
            '<a href="https://c/" rel="nofollow noopener">multi</a>'
            '<a href="https://d/" rel=nofollow>bare</a>'
            '<a href="https://e/" rel=\'ugc\'>ugc</a>'
            '<a href="https://f/" rel="sponsored">sp</a>'
            '<a href="https://g/" rel="noopener">kept</a>'
            '<a href="https://h/">plain</a>')
    pages = _pages(spark, [("https://a/", html)])
    edges = {r.dst for r in link_edges(pages).collect()}
    assert edges == {"https://g/", "https://h/"}
    # anchor extraction applies the same rel policy
    anchors = {r.dst for r in anchor_edges(pages).collect()}
    assert anchors == {"https://g/", "https://h/"}
    # WAT semantics: drop_rel=frozenset() keeps every link
    all_links = extract_links_series(
        pd.Series([html.encode()]), pd.Series(["https://a/"]),
        drop_rel=frozenset())[0]
    assert len(all_links) == 7


def test_anchor_blobs_rank_and_cap(spark):
    edges = spark.createDataFrame(
        [("s1", "d1", "blue"), ("s2", "d1", "blue"), ("s3", "d1", "red"),
         ("s4", "d1", "apple"), ("s5", "d1", "red"), ("s6", "d1", "zed")],
        "src string, dst string, anchor string")
    got = {r.dst: r for r in anchor_blobs(edges, top_k=3).collect()}
    # counts: blue 2, red 2, apple 1, zed 1 -> blue red apple (tie: asc)
    assert got["d1"].anchor_blob == "blue red apple"
    assert got["d1"].n_anchor_terms == 3


def test_with_anchor_text_augments_target(spark):
    pages = _pages(spark, [
        ("https://a/", '<p>source page words</p>'
                       '<a href="https://b/">zebra crossing</a>'),
        ("https://b/", "<p>target page about nothing</p>"),
    ]).withColumn("text", F.lit("base text"))
    out = {r.url: r.text for r in with_anchor_text(pages).collect()}
    assert out["https://b/"] == "base text\nzebra crossing"
    assert out["https://a/"] == "base text"          # no in-links: unchanged


def test_anchor_text_reaches_the_index(spark, tmp_path):
    from patapsco_spark.config import IndexConfig
    from patapsco_spark.operators.indexer import build_index
    from patapsco_spark.operators.retrieve import search_texts
    pages = _pages(spark, [
        ("https://a/", '<p>alpha beta</p><a href="https://b/">zebra</a>'),
        ("https://b/", "<p>gamma delta</p>"),
    ]).withColumn("text", F.when(F.col("url") == "https://a/", "alpha beta")
                  .otherwise("gamma delta")) \
      .withColumn("lang", F.lit("eng"))
    aug = with_anchor_text(pages)
    idx = str(tmp_path / "idx")
    build_index(spark, aug, idx, IndexConfig(num_shards=1),
                id_col="url", text_col="text")
    hits = search_texts(spark, idx, [("q1", "zebra")]).collect()
    assert [h.doc_id for h in hits] == ["https://b/"]
