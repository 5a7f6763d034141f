"""Engine-level revalidation epochs: conditional refetch of the crawl's
own store, latest-epoch-wins views, and isolation from crawl round
numbering / golden parity."""

from pyspark.sql import functions as F

from distributed_web_crawler_spark.config import CrawlConfig, SynthWebConfig
from distributed_web_crawler_spark.crawl.driver import Crawler
from distributed_web_crawler_spark.crawl.synthweb import seed_urls


# NB: the drift predicate must be a lambda/closure (serialized by value);
# a module-level function pickles by reference to the test module, which
# executors cannot import
_pred = lambda u: u.endswith(("1", "5"))  # noqa: E731


def _crawl(spark, tmp_path):
    synth = SynthWebConfig(n_hosts=6, base_pages_per_host=12)
    cfg = CrawlConfig(max_depth=2, host_budget_per_round=3, max_rounds=3,
                      allowed_domains=(r".*\.example\.com",),
                      url_seen_shards=2, bloom_bits_per_shard=1 << 13)
    c = Crawler(spark, cfg, synth, str(tmp_path))
    c.bootstrap(seed_urls(synth, 3))
    c.run()
    return c, cfg, synth


def test_revalidate_verdicts_refresh_and_latest_wins(spark, tmp_path):
    c, cfg, synth = _crawl(spark, tmp_path)
    stored = c.url_seen_set()
    n_changed = sum(1 for u in stored if _pred(u))
    assert 0 < n_changed < len(stored), "predicate must split the corpus"
    before = {r["url"]: r for r in
              c.pages().select("url", "bytes", "caption",
                               "content_hash").collect()}
    rounds_before = c.store.committed_rounds()

    r1 = c.revalidate(changed=_pred)
    assert r1["epoch"] == 0
    assert r1.get("changed", 0) == n_changed
    assert r1.get("unchanged", 0) == len(stored) - n_changed
    assert "failed" not in r1 and "refreshed" not in r1

    # crawl surfaces untouched: round markers, pages bytes
    assert c.store.committed_rounds() == rounds_before
    after_pages = {r["url"]: r for r in
                   c.pages().select("url", "content_hash").collect()}
    assert all(after_pages[u]["content_hash"] == before[u]["content_hash"]
               for u in stored)

    from distributed_web_crawler_spark.crawl.synthweb import (
        content_hash_py,
    )
    rp = {r["url"]: r for r in c.refreshed_pages().collect()}
    for u in stored:
        row = rp[u]
        if _pred(u):
            assert row["refreshed"] and row["reval_epoch"] == 0
            assert bytes(row["bytes"]) != bytes(before[u]["bytes"])
            assert row["caption"] != before[u]["caption"]
            assert row["content_hash"] == content_hash_py(
                bytes(row["bytes"]), row["caption"])
        else:
            assert not row["refreshed"]
            assert bytes(row["bytes"]) == bytes(before[u]["bytes"])
            assert row["content_hash"] == before[u]["content_hash"]

    # epoch 1, same drift: everything validates against the REFRESHED
    # hashes -> all 304, no payload rewrites
    r2 = c.revalidate(changed=_pred)
    assert r2["epoch"] == 1
    assert r2.get("unchanged", 0) == len(stored)
    assert "changed" not in r2

    # the verdict history accumulates per epoch (Cho-estimator input)
    rv = c.revalidations()
    assert rv.count() == 2 * len(stored)
    assert (rv.where((F.col("reval_epoch") == 1)
                     & (F.col("verdict") != "unchanged")).count() == 0)

    # a fresh driver over the same store sees identical refreshed state
    c2 = Crawler(spark, cfg, synth, str(tmp_path))
    rp2 = {r["url"]: r["content_hash"]
           for r in c2.refreshed_pages().collect()}
    assert rp2 == {u: rp[u]["content_hash"] for u in rp}

    # the closed loop: Cho estimates learned from the engine's own
    # verdict history rank drifted URLs above stable ones
    iv = {r["url"]: r for r in c.recrawl_intervals().collect()}
    assert set(iv) == stored
    for u in stored:
        assert iv[u]["n_obs"] == 2
        assert iv[u]["n_changes"] == (1 if _pred(u) else 0)
        if _pred(u):
            assert (iv[u]["lambda_hat"]
                    > max(iv[v]["lambda_hat"] for v in stored
                          if not _pred(v)))
            assert iv[u]["next_interval_days"] < 90.0


def test_register_views_sql_surface(spark, tmp_path):
    """spark.sql over the registered views answers the engine's own
    surfaces, including revalidation state."""
    c, _, _ = _crawl(spark, tmp_path)
    c.revalidate(changed=_pred)
    names = c.register_views()
    assert {"crawl_pages", "crawl_stored", "crawl_lineage",
            "crawl_revalidations", "crawl_refreshed_pages"} <= set(names)
    n_pages = spark.sql("SELECT count(*) AS n FROM crawl_pages") \
        .collect()[0]["n"]
    assert n_pages == len(c.url_seen_set())
    agg = {r["verdict"]: r["n"] for r in spark.sql(
        "SELECT verdict, count(*) AS n FROM crawl_revalidations "
        "GROUP BY verdict").collect()}
    assert agg.get("changed", 0) > 0 and agg.get("unchanged", 0) > 0
    n_ref = spark.sql("SELECT count(*) AS n FROM crawl_refreshed_pages "
                      "WHERE refreshed").collect()[0]["n"]
    assert n_ref == agg["changed"]


def test_revalidate_drift_back_detected_as_change(spark, tmp_path):
    """If the web drifts BACK to the original content after a refresh,
    the next epoch must see a change (validator is the refreshed hash),
    and latest-wins must surface the original payload again."""
    c, _, _ = _crawl(spark, tmp_path)
    orig = {r["url"]: r["content_hash"]
            for r in c.pages().select("url", "content_hash").collect()}
    c.revalidate(changed=_pred)                    # drift to v1
    r = c.revalidate(changed=None)                 # web back at v0
    n_changed = sum(1 for u in orig if _pred(u))
    assert r.get("changed", 0) == n_changed
    rp = {row["url"]: row for row in c.refreshed_pages().collect()}
    for u, h in orig.items():
        assert rp[u]["content_hash"] == h          # back to original
        if _pred(u):
            assert rp[u]["refreshed"] and rp[u]["reval_epoch"] == 1


def test_partial_epoch_over_pick_list(spark, tmp_path):
    """A planner-picked subset drives the epoch; URLs outside the pick
    list are untouched and a later full epoch still sees their ORIGINAL
    validators (partial epochs compose via latest-wins)."""
    c, _, _ = _crawl(spark, tmp_path)
    stored = sorted(c.url_seen_set())
    pick, rest = stored[: len(stored) // 2], stored[len(stored) // 2:]
    r = c.revalidate(changed=lambda u: True, urls=pick)
    assert r.get("changed", 0) == len(pick)
    rv = c.revalidations()
    assert rv.count() == len(pick)          # epoch covers the pick only
    rp = {row["url"]: row["refreshed"]
          for row in c.refreshed_pages().collect()}
    assert all(rp[u] for u in pick) and not any(rp[u] for u in rest)
    # full epoch, same drift: pick already at v1 (unchanged), rest moves
    r2 = c.revalidate(changed=lambda u: True)
    assert r2.get("unchanged", 0) == len(pick)
    assert r2.get("changed", 0) == len(rest)


def test_epoch_compaction_preserves_state_and_history_stats(spark,
                                                            tmp_path):
    """With compact_every_rounds=2, four epochs of alternating drift
    compact twice; the latest-wins views and the Cho statistics must be
    identical to the uncompacted semantics, across a fresh driver."""
    synth = SynthWebConfig(n_hosts=6, base_pages_per_host=12)
    cfg = CrawlConfig(max_depth=2, host_budget_per_round=3, max_rounds=3,
                      allowed_domains=(r".*\.example\.com",),
                      url_seen_shards=2, bloom_bits_per_shard=1 << 13,
                      compact_every_rounds=2)
    c = Crawler(spark, cfg, synth, str(tmp_path))
    c.bootstrap(seed_urls(synth, 3))
    c.run()
    stored = c.url_seen_set()
    orig = {r["url"]: r["content_hash"]
            for r in c.pages().select("url", "content_hash").collect()}

    c.revalidate(changed=_pred)              # e0: pred → v1
    c.revalidate(changed=None)               # e1: pred back to v0  [compact]
    c.revalidate(changed=_pred)              # e2: pred → v1 again
    r3 = c.revalidate(changed=_pred)         # e3: all 304          [compact]
    assert r3.get("unchanged", 0) == len(stored)

    assert c.store.exists("reval_compact", 1)
    assert c.store.exists("reval_compact", 3)
    assert c.store.exists("reval_pages_compact", 3)

    n_pred = sum(1 for u in stored if _pred(u))
    iv = {r["url"]: r for r in c.recrawl_intervals().collect()}
    for u in stored:
        assert iv[u]["n_obs"] == 4
        assert iv[u]["n_changes"] == (3 if _pred(u) else 0)

    # latest-wins payload state: pred URLs at v1, rest original
    c2 = Crawler(spark, cfg, synth, str(tmp_path))  # fresh driver
    rp = {r["url"]: r for r in c2.refreshed_pages().collect()}
    assert sum(1 for u in stored if rp[u]["refreshed"]) == n_pred
    for u in stored:
        if _pred(u):
            assert rp[u]["content_hash"] != orig[u]
            assert rp[u]["reval_epoch"] == 2    # last CHANGE epoch
        else:
            assert rp[u]["content_hash"] == orig[u]

    # validators come from the compacted stats: one more no-drift epoch
    # sees everything unchanged
    r4 = c2.revalidate(changed=_pred)
    assert r4.get("unchanged", 0) == len(stored)


def test_sitemap_recrawl_picks_close_the_discovery_loop(spark, tmp_path):
    """The sitemap table persisted by the discovery tier drives recrawl
    planning on the engine's own store: sitemap_recrawl_picks verdicts
    match a from-first-principles recomputation (lastmod is a pure
    function of the loc in the synthetic web), and feeding the
    fetch_needed picks into revalidate() runs a partial epoch over
    exactly the stored 'modified' rows ('new' rows drop at the
    semi-join). A fresh driver over the same store computes identical
    picks (the table is committed state, not session state)."""
    from distributed_web_crawler_spark.crawl import synthweb as W

    synth = SynthWebConfig(n_hosts=10, base_pages_per_host=24,
                           sitemap_every=2, sitemap_index_every=2,
                           sitemap_lastmod_every=3, robots_every=3,
                           max_out_links=3)
    cfg = CrawlConfig(max_depth=4, host_budget_per_round=3, max_rounds=6,
                      allowed_domains=(r".*\.example\.com",),
                      url_seen_shards=2, bloom_bits_per_shard=1 << 12,
                      sitemap_discovery=True)
    c = Crawler(spark, cfg, synth, str(tmp_path))
    c.bootstrap(W.seed_urls(synth, 3))
    c.run()

    picks = c.sitemap_recrawl_picks()
    rows = {r["url"]: r for r in picks.collect()}
    stored = c.url_seen_set()

    expect = {}
    for i in range(synth.n_hosts):
        for u in W.sitemap_entries_py(synth.host_name(i), synth):
            lm = W.sitemap_lastmod_py(u, synth)
            expect[u] = ("new" if u not in stored
                         else "modified" if lm == "9999-01-01"
                         else "fresh")
    assert {u: r["verdict"] for u, r in rows.items()} == expect
    # all three verdicts genuinely occur, or the test has no power
    assert {"new", "modified", "fresh"} <= set(expect.values())
    assert all(r["fetch_needed"] == (r["verdict"] in ("new", "modified"))
               for r in rows.values())
    # entries carry their sitemap metadata through the store
    assert all(r["priority"] == 0.5 for r in rows.values())

    # partial epoch over the picks: exactly the stored 'modified' rows
    n_mod = sum(1 for v in expect.values() if v == "modified")
    assert n_mod > 0
    r1 = c.revalidate(urls=picks.where("fetch_needed"))
    assert r1 == {"epoch": 0, "unchanged": n_mod}  # static web: all 304

    # fresh driver, same store → identical picks
    c2 = Crawler(spark, cfg, synth, str(tmp_path))
    rows2 = {r["url"]: r["verdict"]
             for r in c2.sitemap_recrawl_picks().collect()}
    assert rows2 == {u: r["verdict"] for u, r in rows.items()}

    # a store that never ran discovery has no sitemap table
    synth0 = SynthWebConfig(n_hosts=6, base_pages_per_host=12)
    cfg0 = CrawlConfig(max_depth=2, host_budget_per_round=3, max_rounds=2,
                      url_seen_shards=2, bloom_bits_per_shard=1 << 12)
    c0 = Crawler(spark, cfg0, synth0, str(tmp_path) + "_nosm")
    c0.bootstrap(W.seed_urls(synth0, 2))
    c0.run()
    assert c0.sitemap_recrawl_picks() is None


def test_feed_recrawl_picks_close_the_discovery_loop(spark, tmp_path):
    """The feed_entries table persisted by the feed discovery tier
    drives recrawl planning exactly like sitemap lastmod:
    feed_recrawl_picks verdicts match a from-first-principles
    recomputation (entry `updated` is a pure function of the loc), the
    fetch_needed picks run a partial epoch over exactly the stored
    'modified' rows, and a fresh driver over the same store computes
    identical picks."""
    from distributed_web_crawler_spark.crawl import synthweb as W

    synth = SynthWebConfig(n_hosts=8, base_pages_per_host=20,
                           feed_every=2, robots_every=3, max_out_links=3)
    cfg = CrawlConfig(max_depth=4, host_budget_per_round=3, max_rounds=8,
                      allowed_domains=(r".*\.example\.com",),
                      url_seen_shards=2, bloom_bits_per_shard=1 << 12,
                      feed_discovery=True)
    c = Crawler(spark, cfg, synth, str(tmp_path))
    c.bootstrap(W.seed_urls(synth, 3))
    c.run()

    picks = c.feed_recrawl_picks()
    rows = {r["url"]: r for r in picks.collect()}
    stored = c.url_seen_set()

    # expected: every entry of every feed the engine actually attempted
    # (the committed `feeds` state — its correctness is pinned by the
    # golden-parity test), verdict from the loc-pure updated value
    attempted = [r["feed_url"] for r in
                 c.store.read(spark, "feeds").collect()]
    expect = {}
    for fu in attempted:
        for u, upd in W.feed_entries_py(fu, synth):
            expect[u] = ("new" if u not in stored
                         else "modified" if upd.startswith("9999")
                         else "fresh")
    assert {u: r["verdict"] for u, r in rows.items()} == expect
    assert {"new", "modified", "fresh"} <= set(expect.values())
    assert all(r["fetch_needed"] == (r["verdict"] in ("new", "modified"))
               for r in rows.values())

    # partial epoch over the picks: exactly the stored 'modified' rows
    n_mod = sum(1 for v in expect.values() if v == "modified")
    assert n_mod > 0
    r1 = c.revalidate(urls=picks.where("fetch_needed"))
    assert r1 == {"epoch": 0, "unchanged": n_mod}  # static web: all 304

    # fresh driver, same store → identical picks
    c2 = Crawler(spark, cfg, synth, str(tmp_path))
    rows2 = {r["url"]: r["verdict"]
             for r in c2.feed_recrawl_picks().collect()}
    assert rows2 == {u: r["verdict"] for u, r in rows.items()}

    # a store that never ran feed discovery has no feed_entries table
    synth0 = SynthWebConfig(n_hosts=6, base_pages_per_host=12)
    cfg0 = CrawlConfig(max_depth=2, host_budget_per_round=3, max_rounds=2,
                       url_seen_shards=2, bloom_bits_per_shard=1 << 12)
    c0 = Crawler(spark, cfg0, synth0, str(tmp_path) + "_nofeed")
    c0.bootstrap(W.seed_urls(synth0, 2))
    c0.run()
    assert c0.feed_recrawl_picks() is None
