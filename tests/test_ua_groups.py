"""UA-specific robots group selection in the crawl loop
(CrawlConfig.robots_ua_groups): the Python fetcher/golden mirror must be
bit-equal to the Catalyst robots_group_rules fold, the rendered
synthetic robots.txt must reproduce the legacy '*' rule functions, and
the tier must both HAVE POWER (a UA group changes the visit sequence)
and keep golden parity + resume."""

from pyspark.sql import functions as F

from distributed_web_crawler_spark.config import CrawlConfig, SynthWebConfig
from distributed_web_crawler_spark.crawl.driver import Crawler
from distributed_web_crawler_spark.crawl.synthweb import (
    robots_allow_for_host,
    robots_crawl_delay_for_host,
    robots_disallow_for_host,
    robots_txt_for_host,
    seed_urls,
    sitemap_urls_for_host,
)
from distributed_web_crawler_spark.golden import golden_crawl
from distributed_web_crawler_spark.operators.robots import (
    parse_group_directives_py,
    robots_group_rules,
)

EDGE_TEXTS = [
    "",
    "Disallow: /orphan\nUser-agent: googlebot\nDisallow: /secret\n",
    ("Disallow: /pre\r\nUSER-AGENT: *\r\nDISALLOW: /a # c\r\n"
     "user-agent: mybot\r\nallow: /b\r\nDisallow:\r\n"),
    "User-agent: a\nUser-agent: b\nDisallow: /x\nUser-agent: mybot\n"
    "Disallow: /y\n",
    "User-agent: mybot\nDisallow: /1\n\nUser-agent: mybot\nAllow: /2\n",
    "User-agent: *\nCrawl-delay: 5\nUser-agent: mybot\nDisallow: /m\n",
    "User-agent: mybot\nCrawl-delay: bogus\nCrawl-delay: 2.5\n"
    "Disallow: /d\nSitemap: http://h.example.com/s.xml\n",
    "User-agent: MYBOT\nUser-agent: other\nDisallow: /shared\n",
]


def test_python_mirror_matches_catalyst_group_rules(spark):
    """parse_group_directives_py's rule selection must equal the
    robots_group_rules fold on every edge text and on every rendered
    synthetic document — the in-loop tier and the board operator are the
    same semantics."""
    synth = SynthWebConfig(n_hosts=12, robots_every=2, robots_ua_every=2,
                           crawl_delay_every=4, sitemap_every=3,
                           robots_ua_token="mybot")
    texts = list(EDGE_TEXTS) + [
        robots_txt_for_host(synth.host_name(i), synth) for i in range(12)]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    for ua in ("mybot", "otherbot"):
        rows = (df.select(robots_group_rules(F.col("t"), ua).alias("r"))
                .collect())
        catalyst = [[(x["allow"], x["pattern"]) for x in row["r"]]
                    for row in rows]
        mirror = [parse_group_directives_py(t, ua)[0] for t in texts]
        assert catalyst == mirror


def test_rendered_text_star_parse_equals_legacy_rule_functions():
    """Parsing robots_txt_for_host with '*' selection reproduces the
    legacy per-host rule functions exactly — so the non-UA path is
    unchanged by the textual model."""
    synth = SynthWebConfig(n_hosts=12, robots_every=2, robots_allow=("/ok",),
                           crawl_delay_every=4, sitemap_every=3)
    for i in range(12):
        h = synth.host_name(i)
        rules, delay, sitemaps = parse_group_directives_py(
            robots_txt_for_host(h, synth), "someotherbot")
        assert [p for ok, p in rules if not ok] == \
            robots_disallow_for_host(h, synth)
        assert [p for ok, p in rules if ok] == robots_allow_for_host(h, synth)
        assert delay == robots_crawl_delay_for_host(h, synth)
        assert sitemaps == sitemap_urls_for_host(h, synth)


SYNTH = SynthWebConfig(n_hosts=10, base_pages_per_host=24, robots_every=2,
                       robots_ua_every=1)
CFG_UA = CrawlConfig(max_depth=3, host_budget_per_round=3, max_rounds=4,
                     allowed_domains=(r".*\.example\.com",),
                     url_seen_shards=4, bloom_bits_per_shard=1 << 14,
                     robots_matching="rfc9309", robots_ua_groups=True)
CFG_STAR = CrawlConfig(**{**CFG_UA.__dict__, "robots_ua_groups": False})
SEEDS = seed_urls(SYNTH, 3)


def test_ua_group_divergence_has_power():
    """With UA groups served (robots_ua_every=1), selecting them must
    CHANGE the crawl: the UA group blocks /p/* (allowing /p/2*), the '*'
    group only /private + /p/3 — if the visit sequences agree the tier
    is dead code."""
    g_ua = golden_crawl(SEEDS, CFG_UA, SYNTH)
    g_star = golden_crawl(SEEDS, CFG_STAR, SYNTH)
    assert g_ua.visits != g_star.visits
    # and the difference is the UA rules: some /p/ page on a rule-bearing
    # host is visited under '*' but not under the UA group
    ua_urls = {u for (_, _, u) in g_ua.visits}
    star_urls = {u for (_, _, u) in g_star.visits}
    assert star_urls - ua_urls


def test_ua_group_engine_matches_golden_and_resumes(spark, tmp_path):
    root = str(tmp_path / "ua")
    c = Crawler(spark, CFG_UA, SYNTH, root)
    c.bootstrap(SEEDS)
    c.run(max_rounds=2)
    # resume with a fresh Crawler over the same store (new robots state
    # reads, new fetcher construction — the ua pairing must re-derive)
    c2 = Crawler(spark, CFG_UA, SYNTH, root)
    c2.run()
    g = golden_crawl(SEEDS, CFG_UA, SYNTH)
    assert c2.visit_sequence() == g.visits
    assert c2.url_seen_set() == g.stored_urls
