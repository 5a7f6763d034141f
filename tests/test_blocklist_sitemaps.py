"""Unit tests for the URL category blocklist fold and robots.txt
Sitemap: discovery — the two frontier-input gates added after round-2
certification."""

from pyspark.sql import functions as F

from distributed_web_crawler_spark.functions.urls import blocklist_category
from distributed_web_crawler_spark.operators.sitemap import (
    robots_sitemap_urls,
)

RULES = (
    ("ok", "shop.example.com", "/safe"),
    ("adult", "shop.example.com", ""),
    ("ads", "example.com", "/promo"),
    ("tracker", "t.example.net", ""),
)


def _cats(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = (df.select("url", blocklist_category(F.col("url"), RULES)
                      .alias("cat")).collect())
    return {r["url"]: r["cat"] for r in rows}


def test_blocklist_first_match_wins_and_suffix_semantics(spark):
    got = _cats(spark, [
        "http://shop.example.com/safe/x",    # exemption rule fires first
        "http://shop.example.com/other",     # falls through to adult
        "http://a.shop.example.com/other",   # dot-suffix match on subdomain
        "http://www.example.com/promo/1",    # suffix rule + path prefix
        "http://www.example.com/news",       # path prefix misses
        "http://notexample.com/promo",       # 'notexample.com' is NOT a
                                             # suffix match for example.com
        "http://t.example.net/anything",
        "not a url",                         # unparseable host -> null
    ])
    assert got["http://shop.example.com/safe/x"] == "ok"
    assert got["http://shop.example.com/other"] == "adult"
    assert got["http://a.shop.example.com/other"] == "adult"
    assert got["http://www.example.com/promo/1"] == "ads"
    assert got["http://www.example.com/news"] is None
    assert got["http://notexample.com/promo"] is None
    assert got["http://t.example.net/anything"] == "tracker"
    assert got["not a url"] is None


def test_blocklist_empty_path_url_matches_empty_prefix(spark):
    # path_of returns '' (not '/') for a bare authority URL; an
    # empty path_prefix must still match it
    got = _cats(spark, ["http://shop.example.com"])
    assert got["http://shop.example.com"] == "adult"


def test_robots_sitemap_discovery_edges(spark):
    txt = ("User-agent: *\n"
           "Sitemap: http://h1.example.com/sitemap.xml\n"
           "Disallow: /x\n"
           "  SITEMAP:https://cdn.example.org/sm.xml\n"   # case + no space
           "Sitemap: /relative.xml\n"                      # invalid: dropped
           "Sitemap: ftp://files.example.org/s.xml\n"      # non-http: dropped
           "Sitemap: http://h1.example.com/sitemap.xml\n"  # dup: collapsed
           "NotSitemap: http://h1.example.com/decoy.xml\n")
    df = spark.createDataFrame([("h1.example.com", txt)],
                               "host string, robots_txt string")
    got = {(r["host"], r["sitemap_url"])
           for r in robots_sitemap_urls(df).collect()}
    assert got == {
        ("h1.example.com", "http://h1.example.com/sitemap.xml"),
        ("h1.example.com", "https://cdn.example.org/sm.xml"),
    }


def test_robots_sitemap_no_directives_yields_no_rows(spark):
    df = spark.createDataFrame(
        [("h2.example.com", "User-agent: *\nDisallow: /")],
        "host string, robots_txt string")
    assert robots_sitemap_urls(df).count() == 0


def test_sitemap_index_spec_rules(spark):
    from distributed_web_crawler_spark.operators.sitemap import (
        parse_sitemap_index,
    )
    xml = ("<sitemapindex>"
           "<sitemap><loc>http://h.example.com/sm/a.xml</loc>"
           "<lastmod>2023-12-01</lastmod></sitemap>"
           "<sitemap><loc>http://h.example.com/sm/b.xml</loc></sitemap>"
           "<sitemap><loc>http://evil.org/sm/x.xml</loc></sitemap>"
           "<sitemap><lastmod>2023-01-01</lastmod></sitemap>"
           "<sitemap><loc>http://h.example.com/sm/a.xml</loc>"
           "<lastmod>2024-06-06</lastmod></sitemap>"
           "</sitemapindex>")
    df = spark.createDataFrame([("h.example.com", xml)],
                               "host string, xml string")
    got = {(r["host"], r["sitemap_url"], str(r["lastmod"]))
           for r in parse_sitemap_index(df).collect()}
    # cross-host and loc-less dropped; duplicate loc keeps the FIRST
    # entry's lastmod (2023-12-01, not 2024-06-06)
    assert got == {
        ("h.example.com", "http://h.example.com/sm/a.xml", "2023-12-01"),
        ("h.example.com", "http://h.example.com/sm/b.xml", "None"),
    }


def test_blocklist_empty_rules_blocks_nothing(spark):
    df = spark.createDataFrame([("http://x.example.com/a",)], "url string")
    got = df.select(blocklist_category(F.col("url"), ()).alias("c"))
    assert got.collect()[0]["c"] is None


def test_robots_group_rules_rfc9309_edges(spark):
    """RFC 9309 group parser on hostile documents: CRLF endings, rules
    before any group (ignored), case-insensitive directives and UA
    tokens, comment stripping, consecutive-UA group sharing vs
    rule-then-UA group splitting, and combine-on-equal-specificity."""
    from distributed_web_crawler_spark.operators.robots import (
        robots_group_rules,
    )

    def rules(txt, ua="MyBot"):
        df = spark.createDataFrame([(txt,)], "t string")
        row = df.select(robots_group_rules(F.col("t"), ua).alias("r")) \
            .collect()[0]
        return [(r["allow"], r["pattern"]) for r in row["r"]]

    # CRLF + case + comments; star group loses to the exact token
    txt = ("Disallow: /orphan\r\n"           # pre-group rule: ignored
           "USER-AGENT: *\r\n"
           "DISALLOW: /a # trailing comment\r\n"
           "user-agent: mybot\r\n"
           "allow: /b\r\n"
           "Disallow:\r\n")                  # empty pattern: no rule
    assert rules(txt) == [(True, "/b")]
    # star fallback for a UA nothing matches exactly
    assert rules(txt, "OtherBot") == [(False, "/a")]
    # consecutive UA lines share a group; a UA AFTER rules starts a new
    # one — 'mybot' in the second group must not inherit '/x'
    txt2 = ("User-agent: a\nUser-agent: b\nDisallow: /x\n"
            "User-agent: mybot\nDisallow: /y\n")
    assert rules(txt2) == [(False, "/y")]
    # two equally-specific matching groups combine in document order
    txt3 = ("User-agent: mybot\nDisallow: /1\n\n"
            "User-agent: mybot\nAllow: /2\n")
    assert rules(txt3) == [(False, "/1"), (True, "/2")]
    # no UA line at all -> no group -> empty rules
    assert rules("Disallow: /z\n") == []
    assert rules("") == []
    # ONLY foreign-agent groups (no '*', no token match): RFC 9309
    # §2.2.1 applies NO rules — neither the foreign group's nor the
    # pre-group orphan rule may leak through the cur(-1)==best(-1) path
    txt4 = ("Disallow: /pre\n"
            "User-agent: googlebot\nDisallow: /secret\n")
    assert rules(txt4) == []
    assert rules("User-agent: googlebot\nDisallow: /secret\n") == []
