"""robots.txt rules + crawl frontier (operators/crawl.py)."""
from __future__ import annotations

import pytest

from patapsco_spark.operators.crawl import (
    _like_pattern, crawl_frontier, parse_robots, parse_robots_body,
    robots_filter)


class TestLikePattern:
    def test_prefix(self):
        assert _like_pattern("/a/b") == "/a/b%"

    def test_wildcard_and_anchor(self):
        assert _like_pattern("/x*y") == "/x%y%"
        assert _like_pattern("/tmp$") == "/tmp"
        assert _like_pattern("/a*b$") == "/a%b"

    def test_metachars_escaped(self):
        assert _like_pattern("/100%_x") == "/100\\%\\_x%"
        assert _like_pattern("/a\\b") == "/a\\\\b%"

    def test_inner_dollar_literal(self):
        assert _like_pattern("/a$b") == "/a$b%"


class TestParseRobotsBody:
    def test_group_selection_specific_beats_star(self):
        body = ("User-agent: *\nDisallow: /all\n"
                "User-agent: mybot\nDisallow: /mine\n")
        rules, _, _ = parse_robots_body("h", body, agent="mybot")
        assert [(r[1], r[4]) for r in rules] == [("/mine", False)]
        rules, _, _ = parse_robots_body("h", body, agent="other")
        assert [(r[1], r[4]) for r in rules] == [("/all", False)]

    def test_stacked_user_agents_share_rules(self):
        body = "User-agent: a\nUser-agent: b\nDisallow: /x\n"
        for agent in ("a", "b"):
            rules, _, _ = parse_robots_body("h", body, agent)
            assert len(rules) == 1

    def test_multiple_groups_same_agent_merge(self):
        body = ("User-agent: *\nDisallow: /a\n"
                "User-agent: *\nDisallow: /b\n")
        rules, _, _ = parse_robots_body("h", body)
        assert sorted(r[1] for r in rules) == ["/a", "/b"]

    def test_empty_disallow_is_no_rule(self):
        rules, _, _ = parse_robots_body("h", "User-agent: *\nDisallow:\n")
        assert rules == []

    def test_comments_and_blank_lines(self):
        body = ("# header\nUser-agent: *  # inline\n\n"
                "Disallow: /a # trailing\n")
        rules, _, _ = parse_robots_body("h", body)
        assert [r[1] for r in rules] == ["/a"]

    def test_crawl_delay_and_sitemap(self):
        body = ("Sitemap: https://h/sm.xml\nUser-agent: *\n"
                "Crawl-delay: 2.5\nDisallow: /x\n")
        rules, delays, maps = parse_robots_body("h", body)
        assert delays == [("h", 2.5)]
        assert maps == [("h", "https://h/sm.xml")]

    def test_rules_before_any_group_ignored(self):
        rules, _, _ = parse_robots_body("h", "Disallow: /early\n")
        assert rules == []

    def test_case_insensitive_keys_and_agent(self):
        body = "USER-AGENT: MyBot\nDISALLOW: /x\n"
        rules, _, _ = parse_robots_body("h", body, agent="mybot")
        assert [r[1] for r in rules] == ["/x"]


ROBOTS = [
    ("a.com", "User-agent: *\nDisallow: /private\nAllow: /private/pub\n"),
    ("b.com", ("User-agent: greedy\nDisallow: /\n"
               "User-agent: *\nDisallow: /tmp$\nDisallow: /x*y\n")),
    ("d.com", "User-agent: *\nDisallow: /\nAllow: /public\n"),
]


@pytest.fixture(scope="module")
def rules(spark):
    r, _, _ = parse_robots(
        spark.createDataFrame(ROBOTS, "host string, body string"))
    return r.cache()


class TestRobotsFilter:
    def test_verdicts(self, spark, rules):
        cases = {
            "https://a.com/private/doc": False,
            "https://a.com/private/pub/1": True,   # longest match: Allow
            "https://a.com/open": True,
            "https://b.com/tmp": False,            # $ anchor: exact only
            "https://b.com/tmp/2": True,
            "https://b.com/xAAy": False,           # * wildcard
            "https://b.com/xz": True,
            "https://d.com/anything": False,       # Disallow /
            "https://d.com/public/x": True,        # Allow beats / on length
            "https://c.com/no-robots": True,       # no rules for host
        }
        urls = spark.createDataFrame([(u,) for u in cases], "url string")
        got = {r.url: r.allowed
               for r in robots_filter(urls, rules, keep_denied=True).collect()}
        assert got == cases

    def test_filter_drops_denied_rows(self, spark, rules):
        urls = spark.createDataFrame(
            [("https://a.com/private/doc",), ("https://a.com/ok",)],
            "url string")
        kept = [r.url for r in robots_filter(urls, rules).collect()]
        assert kept == ["https://a.com/ok"]

    def test_duplicate_rows_keep_multiplicity(self, spark, rules):
        urls = spark.createDataFrame(
            [("https://c.com/x",)] * 3, "url string")
        assert robots_filter(urls, rules).count() == 3

    def test_query_string_matched(self, spark):
        r, _, _ = parse_robots(spark.createDataFrame(
            [("q.com", "User-agent: *\nDisallow: /s?id=\n")],
            "host string, body string"))
        urls = spark.createDataFrame(
            [("https://q.com/s?id=1",), ("https://q.com/s",)], "url string")
        got = {x.url: x.allowed
               for x in robots_filter(urls, r, keep_denied=True).collect()}
        assert got == {"https://q.com/s?id=1": False,
                       "https://q.com/s": True}

    def test_no_shuffle_on_url_stream(self, spark, rules):
        urls = spark.createDataFrame([("https://a.com/x",)], "url string")
        plan = robots_filter(urls, rules)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastExchange" in plan
        # the ONLY shuffle is the tiny per-host rules rollup feeding the
        # broadcast; the URL stream itself goes scan → project → join
        assert plan.count("Exchange hashpartitioning") <= 1


class TestCrawlFrontier:
    def test_slots_and_limit(self, spark):
        cand = spark.createDataFrame(
            [("https://h1/a", 1), ("https://h1/b", 9), ("https://h1/c", 9),
             ("https://h2/z", 0)],
            "url string, pri int")
        out = crawl_frontier(cand, priority_col="pri",
                             per_host_limit=2).collect()
        by_host = {}
        for r in out:
            by_host.setdefault(r.host, []).append((r.slot, r.url))
        # pri desc, url asc: b(9) slot1, c(9) slot2; a truncated
        assert sorted(by_host["h1"]) == [(1, "https://h1/b"),
                                        (2, "https://h1/c")]
        assert by_host["h2"] == [(1, "https://h2/z")]

    def test_seen_anti_join_is_canonical(self, spark):
        cand = spark.createDataFrame(
            [("https://h1/a?utm_source=x",), ("https://h1/b",)], "url string")
        seen = spark.createDataFrame([("https://h1/a",)], "url string")
        out = [r.url for r in crawl_frontier(cand, seen=seen).collect()]
        assert out == ["https://h1/b"]

    def test_robots_applied(self, spark, rules):
        cand = spark.createDataFrame(
            [("https://a.com/private/doc",), ("https://a.com/ok",)],
            "url string")
        out = [r.url for r in crawl_frontier(cand, rules=rules).collect()]
        assert out == ["https://a.com/ok"]


class TestSitemaps:
    def test_urlset_fields(self, spark):
        from patapsco_spark.operators.crawl import parse_sitemaps
        body = """<?xml version="1.0"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc> https://a.com/1 </loc><lastmod>2024-01-02</lastmod>
       <changefreq>daily</changefreq><priority>0.8</priority></url>
  <url><loc><![CDATA[https://a.com/2]]></loc></url>
  <url><lastmod>2024-01-01</lastmod></url>
  <url><loc>https://a.com/3</loc><priority>bogus</priority></url>
</urlset>"""
        sm = spark.createDataFrame([("https://a.com/sm.xml", body)],
                                   "url string, body string")
        urls, children = parse_sitemaps(sm)
        rows = {r.loc: r for r in urls.collect()}
        assert set(rows) == {"https://a.com/1", "https://a.com/2",
                             "https://a.com/3"}
        assert rows["https://a.com/1"].lastmod == "2024-01-02"
        assert rows["https://a.com/1"].changefreq == "daily"
        assert rows["https://a.com/1"].priority == 0.8
        assert rows["https://a.com/2"].lastmod is None
        assert rows["https://a.com/3"].priority is None
        assert children.count() == 0

    def test_sitemapindex_children(self, spark):
        from patapsco_spark.operators.crawl import parse_sitemaps
        body = ("<sitemapindex>"
                "<sitemap><loc>https://a.com/sm1.xml</loc></sitemap>"
                "<sitemap><loc>https://a.com/sm2.xml</loc></sitemap>"
                "</sitemapindex>")
        sm = spark.createDataFrame([("https://a.com/sm.xml", body)],
                                   "url string, body string")
        urls, children = parse_sitemaps(sm)
        assert urls.count() == 0
        assert sorted(r.child for r in children.collect()) == [
            "https://a.com/sm1.xml", "https://a.com/sm2.xml"]
