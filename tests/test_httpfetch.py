"""Drive the FULL crawl loop over real sockets: a loopback http.server
serves deterministic HTML with relative + absolute links, and the engine
crawls it with the production HTTP fetcher (crawl/httpfetch.py) — gates,
politeness, dedup, URL-seen, X3 resolution and the payload sink all run
unchanged on real HTTP responses."""

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from distributed_web_crawler_spark.config import CrawlConfig
from distributed_web_crawler_spark.crawl.driver import Crawler
from distributed_web_crawler_spark.crawl.httpfetch import (
    HttpFetcherConfig,
    extract_links_html,
    make_http_fetcher,
)

# tiny site: /p/0 → /p/1 (relative), /p/2 (root-relative), /p/3 (absolute);
# /p/1 and /p/2 share identical bodies (content dedup); /p/9 404s
PAGES = {
    "/p/0": '<html><a href="1">one</a> <a href="/p/2">two</a> '
            '<a href="HOST/p/3">three</a> <a href="/p/9">gone</a></html>',
    "/p/1": "<html><body>same body</body></html>",
    "/p/2": "<html><body>same body</body></html>",
    "/p/3": '<html><a href="../p/0">back</a></html>',
}


class _Handler(BaseHTTPRequestHandler):
    def do_GET(self):
        body = PAGES.get(self.path)
        if body is None:
            self.send_error(404)
            return
        host = f"http://{self.headers['Host']}"
        payload = body.replace("HOST", host).encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def site():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_extract_links_html():
    links = extract_links_html(
        b'<a href="a">x</a><A HREF="/b">y</A><a name="no-href">z</a>')
    assert links == ["a", "/b"]


def test_http_crawl_end_to_end(spark, tmp_path, site):
    cfg = CrawlConfig(max_depth=3, host_budget_per_round=10, max_rounds=4,
                      url_seen_shards=2, bloom_bits_per_shard=1 << 12)
    fetcher = make_http_fetcher(HttpFetcherConfig(timeout_sec=5.0,
                                                  concurrency=4))
    c = Crawler(spark, cfg, None, str(tmp_path), fetcher=fetcher)
    c.bootstrap([f"{site}/p/0"])
    stats = c.run()

    # /p/0 fetched; /p/1,/p/2,/p/3 discovered via relative/root/absolute
    # hrefs; /p/9 404s (fetch_failed); /p/2 deduped against /p/1's body
    urls = c.url_seen_set()
    assert f"{site}/p/0" in urls
    assert f"{site}/p/3" in urls
    assert (f"{site}/p/1" in urls) ^ (f"{site}/p/2" in urls), \
        "identical bodies must store exactly one winner"
    assert stats["fetched"] >= 4          # 0,1,2,3 attempted
    assert stats["stored"] == 3           # one of 1/2 deduped

    rows = {r["url"]: r for r in
            c.pages().select("url", "http_status", "content_type",
                             "fetch_time").collect()}
    assert all(r["http_status"] == 200 for r in rows.values())
    assert all(r["content_type"] == "text/html" for r in rows.values())


def test_parse_robots_txt_star_section_only():
    from distributed_web_crawler_spark.crawl.httpfetch import parse_robots_txt
    txt = """# comment
User-agent: googlebot
Disallow: /only-google
User-agent: *
Disallow: /private
Disallow:
Disallow: /p/3   # trailing comment
User-agent: other
Disallow: /only-other
"""
    assert parse_robots_txt(txt) == ["/private", "/p/3"]


def test_parse_robots_directives_crawl_delay():
    from distributed_web_crawler_spark.crawl.httpfetch import (
        parse_robots_directives,
    )

    rules, delay, sitemaps, _allows = parse_robots_directives(
        "User-agent: googlebot\nCrawl-delay: 99\n\n"
        "User-agent: *\nDisallow: /private\n"
        "Crawl-delay: 2.5  # seconds\nDisallow: /tmp\n")
    assert rules == ["/private", "/tmp"]
    assert delay == 2.5
    assert sitemaps == []
    rules, delay, sitemaps, _allows = parse_robots_directives(
        "User-agent: *\nCrawl-delay: bogus\nCrawl-delay: -3\n")
    assert rules == [] and delay is None and sitemaps == []


def test_parse_robots_directives_sitemaps():
    """Sitemap: is a non-group record (RFC 9309 §2.3): collected from any
    section, case-insensitive, absolute http(s) only, duplicates dropped
    first-seen — matching operators/sitemap.robots_sitemap_urls."""
    from distributed_web_crawler_spark.crawl.httpfetch import (
        parse_robots_directives,
    )

    rules, delay, sitemaps, _allows = parse_robots_directives(
        "Sitemap: http://a.com/s1.xml\n"
        "User-agent: googlebot\nSITEMAP: https://a.com/s2.xml\n"
        "User-agent: *\nDisallow: /x\n"
        "sitemap : http://a.com/s1.xml\n"     # duplicate, dropped
        "Sitemap: /relative.xml\n")           # relative, invalid
    assert rules == ["/x"]
    assert sitemaps == ["http://a.com/s1.xml", "https://a.com/s2.xml"]


class _CountingHandler(BaseHTTPRequestHandler):
    """HTTP/1.1 keep-alive server counting connections vs requests."""
    protocol_version = "HTTP/1.1"
    connections = 0
    requests = 0
    _lock = threading.Lock()

    def setup(self):  # one setup() per accepted connection
        super().setup()
        with self._lock:
            type(self).connections += 1

    def do_GET(self):
        with self._lock:
            type(self).requests += 1
        if self.path == "/r":
            self.send_response(302)
            self.send_header("Location", "/p/0")
            self.send_header("Content-Length", "0")
            self.end_headers()
            return
        payload = f"<html><body>{self.path}</body></html>".encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/html")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def log_message(self, *a):
        pass


def test_keepalive_connection_reuse():
    """The fetcher must reuse sockets across requests to the same host:
    N requests over a keep-alive server open ≤ concurrency connections,
    not one per request; redirects resolve on the same pool."""
    import pandas as pd

    srv = ThreadingHTTPServer(("127.0.0.1", 0), _CountingHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        urls = [f"{base}/p/{i}" for i in range(11)] + [f"{base}/r"]
        n = len(urls)
        batch = pd.DataFrame({
            "url": urls, "host": ["127.0.0.1"] * n, "depth": [0] * n,
            "parent_url": [None] * n, "priority": [1] * n,
        })
        fetcher = make_http_fetcher(
            HttpFetcherConfig(timeout_sec=5.0, concurrency=2))
        (out,) = list(fetcher(iter([batch])))
        assert out["fetched"].all()
        # the /r redirect costs one extra request (302 then the target GET)
        assert _CountingHandler.requests == n + 1
        assert 1 <= _CountingHandler.connections <= 2, \
            f"expected <=concurrency conns, got {_CountingHandler.connections}"
    finally:
        srv.shutdown()


def test_fetch_one_out_of_range_port_returns_none():
    """A malformed href like :99999 must be a failed fetch, not an
    uncaught ValueError that kills the whole Arrow task."""
    from distributed_web_crawler_spark.crawl.httpfetch import (
        _ConnPool,
        _fetch_one,
    )

    cfg = HttpFetcherConfig(timeout_sec=2.0)
    assert _fetch_one("http://127.0.0.1:99999/x", cfg, _ConnPool(cfg)) is None


def test_injected_synth_fetcher_keeps_synthetic_robots(spark, tmp_path):
    """Wrapping/injecting the SYNTHETIC fetcher (synth_cfg provided) must
    not silently switch robots to real HTTP — the synthetic rules are what
    the golden model evaluates. Only synth_cfg=None defaults robots to the
    real-HTTP fetcher."""
    from distributed_web_crawler_spark.config import (
        CrawlConfig,
        SynthWebConfig,
    )
    from distributed_web_crawler_spark.operators.extract import (
        make_synth_fetcher,
    )

    synth = SynthWebConfig(n_hosts=4)
    c = Crawler(spark, CrawlConfig(), synth, str(tmp_path / "a"),
                fetcher=make_synth_fetcher(synth))
    assert c.robots_fetcher is None
    c2 = Crawler(spark, CrawlConfig(), None, str(tmp_path / "b"),
                 fetcher=make_synth_fetcher(synth))
    assert c2.robots_fetcher is not None


class _ETagHandler(BaseHTTPRequestHandler):
    """Versioned pages with strong ETags: bump VERSIONS[path] to change a
    page; a matching If-None-Match gets a bodyless 304."""
    VERSIONS = {"/a": 1, "/b": 1, "/c": 1, "/stale": 1}

    def do_GET(self):
        v = self.VERSIONS.get(self.path)
        if v is None:
            self.send_error(404)
            return
        etag = f'"{self.path}-v{v}"'
        if self.headers.get("If-None-Match") == etag:
            self.send_response(304)
            self.send_header("ETag", etag)
            self.end_headers()
            return
        body = f"<html>content of {self.path} v{v}</html>".encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/html")
        self.send_header("ETag", etag)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


def test_revalidation_end_to_end(spark):
    """Conditional-GET recrawl over real sockets: store a first fetch's
    payloads+validators, mutate one page server-side, then revalidate —
    unchanged pages cost a bodyless 304, the mutated page returns new
    content, a stale validator yields a 'refreshed' (200, same hash),
    and a vanished page is 'failed'."""
    import pandas as pd

    from distributed_web_crawler_spark.crawl.httpfetch import (
        make_http_revalidating_fetcher,
    )
    from distributed_web_crawler_spark.pipeline.recrawl import (
        REVALIDATE_SCHEMA,
        revalidate_merge,
    )
    from pyspark.sql import functions as F

    _ETagHandler.VERSIONS = {"/a": 1, "/b": 1, "/c": 1, "/stale": 1}
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _ETagHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        fetcher = make_http_revalidating_fetcher(
            HttpFetcherConfig(timeout_sec=5.0, concurrency=4))

        # first fetch: no validators — everything 200, capture validators
        first = pd.concat(list(fetcher(iter([pd.DataFrame({
            "url": [f"{base}{p}" for p in ("/a", "/b", "/c", "/stale")],
        })]))))
        assert first["fetched"].all() and not first["not_modified"].any()
        assert first["etag"].notna().all()

        # build the stored table; /stale keeps a WRONG validator
        stored_pd = first[["url", "bytes", "etag"]].copy()
        stored_pd.loc[stored_pd["url"] == f"{base}/stale", "etag"] = '"bogus"'
        stored = (spark.createDataFrame(stored_pd)
                  .select("url", F.sha2("bytes", 256).alias("content_hash"),
                          "etag"))
        old_hashes = {r["url"]: r["content_hash"]
                      for r in stored.collect()}
        old_etags = dict(zip(stored_pd["url"], stored_pd["etag"]))

        _ETagHandler.VERSIONS["/b"] += 1  # /b changes server-side

        cand_pd = stored_pd[["url", "etag"]].copy()
        cand_pd["last_modified"] = None
        gone = pd.DataFrame({"url": [f"{base}/gone"], "etag": [None],
                             "last_modified": [None]})
        cand = spark.createDataFrame(pd.concat([cand_pd, gone]))
        verdicts = cand.mapInPandas(
            lambda it: fetcher(it), REVALIDATE_SCHEMA)
        stored_all = stored.unionByName(spark.createDataFrame(
            [(f"{base}/gone", "deadbeef", None)],
            "url string, content_hash string, etag string"))
        out = {r["url"]: r for r in
               revalidate_merge(stored_all, verdicts).collect()}

        assert out[f"{base}/a"]["verdict"] == "unchanged"
        assert out[f"{base}/c"]["verdict"] == "unchanged"
        assert out[f"{base}/a"]["http_status"] == 304
        assert out[f"{base}/b"]["verdict"] == "changed"
        assert out[f"{base}/b"]["content_hash"] != old_hashes[f"{base}/b"]
        st = out[f"{base}/stale"]
        assert st["verdict"] == "refreshed"
        assert st["content_hash"] == old_hashes[f"{base}/stale"]
        assert st["etag"] == '"/stale-v1"' != old_etags[f"{base}/stale"]
        g = out[f"{base}/gone"]
        assert g["verdict"] == "failed"
        assert g["content_hash"] == "deadbeef"  # stored copy stands
    finally:
        srv.shutdown()


def test_engine_revalidation_over_real_http(spark, tmp_path):
    """Crawler.revalidate with the REAL HTTP conditional fetcher: epoch 0
    re-fetches (stored validators are synthetic hash-prefixes the server
    doesn't know) but recognizes unchanged content by hash ('refreshed',
    validators upgraded to the server's ETags, no payload staged);
    epoch 1 sends those ETags and gets pure 304s; after a server-side
    change, epoch 2 detects exactly it and refreshed_pages serves the
    new body."""
    from distributed_web_crawler_spark.crawl.httpfetch import (
        make_http_revalidating_fetcher,
    )

    _ETagHandler.VERSIONS = {"/a": 1, "/b": 1, "/c": 1, "/stale": 1}
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _ETagHandler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        cfg = CrawlConfig(max_depth=1, host_budget_per_round=10,
                          max_rounds=1, url_seen_shards=2,
                          bloom_bits_per_shard=1 << 12)
        hcfg = HttpFetcherConfig(timeout_sec=5.0, concurrency=4)
        c = Crawler(spark, cfg, None, str(tmp_path),
                    fetcher=make_http_fetcher(hcfg))
        c.bootstrap([f"{base}{p}" for p in _ETagHandler.VERSIONS])
        stats = c.run()
        assert stats["stored"] == 4
        rfetch = make_http_revalidating_fetcher(hcfg)

        r0 = c.revalidate(fetcher=rfetch)
        assert r0 == {"epoch": 0, "refreshed": 4}
        # no payload staged; validators upgraded to the server's ETags
        assert all(not r["refreshed"]
                   for r in c.refreshed_pages().collect())
        etags = {r["url"]: r["etag"] for r in c.revalidations().collect()}
        assert all(v.startswith('"/') for v in etags.values())

        r1 = c.revalidate(fetcher=rfetch)
        assert r1 == {"epoch": 1, "unchanged": 4}

        _ETagHandler.VERSIONS["/b"] += 1
        r2 = c.revalidate(fetcher=rfetch)
        assert r2 == {"epoch": 2, "unchanged": 3, "changed": 1}
        rp = {r["url"]: r for r in c.refreshed_pages().collect()}
        changed = rp[f"{base}/b"]
        assert changed["refreshed"] and changed["reval_epoch"] == 2
        assert b"v2" in bytes(changed["bytes"])
        assert sum(1 for r in rp.values() if r["refreshed"]) == 1
    finally:
        srv.shutdown()


def test_http_sitemap_discovery_end_to_end(spark, tmp_path):
    """The discovery tier over real sockets on the DEFAULT port (robots
    state is keyed by hostname, so the production robots/sitemap
    fetchers need port-80 URLs): a loopback site serves robots.txt with
    a Disallow rule and a Sitemap: declaration; the engine — production
    HTTP page fetcher, production robots fetcher, production sitemap
    fetcher, no synthetic web anywhere — must honor the rule and fetch
    an orphan page reachable only through the sitemap."""
    import socket

    site_pages = {
        "/p/0": '<html><a href="/p/1">one</a> '
                '<a href="/private/x">blocked</a></html>',
        "/p/1": "<html><body>leaf</body></html>",
        "/p/7": "<html><body>orphan - only the sitemap knows</body></html>",
        "/private/x": "<html><body>disallowed</body></html>",
    }
    robots = ("User-agent: *\nDisallow: /private\n"
              "Sitemap: http://127.0.0.1/sitemap.xml\n")
    sitemap = ("<?xml version=\"1.0\"?><urlset>"
               "<url><loc>http://127.0.0.1/p/7</loc></url>"
               "<url><loc>http://elsewhere.org/p/0</loc></url>"
               "</urlset>")

    class _H(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/robots.txt":
                body, ctype = robots.encode(), "text/plain"
            elif self.path == "/sitemap.xml":
                body, ctype = sitemap.encode(), "application/xml"
            elif self.path in site_pages:
                body, ctype = site_pages[self.path].encode(), "text/html"
            else:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    try:
        srv = ThreadingHTTPServer(("127.0.0.1", 80), _H)
    except (OSError, socket.error) as e:
        pytest.skip(f"cannot bind port 80: {e}")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        cfg = CrawlConfig(max_depth=3, host_budget_per_round=10,
                          max_rounds=4, url_seen_shards=2,
                          bloom_bits_per_shard=1 << 12,
                          sitemap_discovery=True)
        fetcher = make_http_fetcher(HttpFetcherConfig(timeout_sec=5.0,
                                                      concurrency=4))
        c = Crawler(spark, cfg, None, str(tmp_path), fetcher=fetcher)
        c.bootstrap(["http://127.0.0.1/p/0"])
        c.run()
        urls = c.url_seen_set()
        assert "http://127.0.0.1/p/7" in urls, \
            "sitemap-only orphan was never fetched"
        assert "http://127.0.0.1/p/0" in urls
        assert "http://127.0.0.1/private/x" not in urls, \
            "robots Disallow ignored on the real-HTTP path"
        # cross-host sitemap entry dropped by the same-host spec rule
        assert not any("elsewhere.org" in u for u in urls)
        fr = c.store.read(spark, "frontier")
        sm = fr.where(fr.parent_url == "http://127.0.0.1/sitemap.xml") \
               .collect()
        assert {r["url"] for r in sm} == {"http://127.0.0.1/p/7"}
        assert all(r["depth"] == 0 and r["priority"] == 1 for r in sm)
    finally:
        srv.shutdown()


def test_http_gzipped_sitemap_index_end_to_end(spark, tmp_path):
    """Two-level + gzip over real sockets: robots declares a GZIPPED
    sitemap index (magic-sniffed, not extension-matched); the engine
    gunzips it, fetches the child sitemap it points at, and reaches the
    orphan page only that child lists. Also pins the one-level nesting
    rule: a child that is itself an index contributes nothing."""
    import gzip
    import socket

    site_pages = {
        "/p/0": '<html><a href="/p/1">one</a></html>',
        "/p/1": "<html><body>leaf</body></html>",
        "/p/9": "<html><body>orphan via gz index</body></html>",
    }
    robots = ("User-agent: *\n"
              "Sitemap: http://127.0.0.1/sitemap_index.xml.gz\n")
    index = ("<?xml version=\"1.0\"?><sitemapindex>"
             "<sitemap><loc>http://127.0.0.1/sm_child.xml</loc></sitemap>"
             "<sitemap><loc>http://127.0.0.1/sm_nested_index.xml</loc>"
             "</sitemap></sitemapindex>")
    child = ("<?xml version=\"1.0\"?><urlset>"
             "<url><loc>http://127.0.0.1/p/9</loc></url></urlset>")
    nested = ("<?xml version=\"1.0\"?><sitemapindex>"
              "<sitemap><loc>http://127.0.0.1/sm_child2.xml</loc>"
              "</sitemap></sitemapindex>")
    child2 = ("<?xml version=\"1.0\"?><urlset>"
              "<url><loc>http://127.0.0.1/p/13</loc></url></urlset>")

    class _H(BaseHTTPRequestHandler):
        def do_GET(self):
            if self.path == "/robots.txt":
                body, ctype = robots.encode(), "text/plain"
            elif self.path == "/sitemap_index.xml.gz":
                body, ctype = (gzip.compress(index.encode()),
                               "application/gzip")
            elif self.path == "/sm_child.xml":
                body, ctype = child.encode(), "application/xml"
            elif self.path == "/sm_nested_index.xml":
                body, ctype = nested.encode(), "application/xml"
            elif self.path == "/sm_child2.xml":
                body, ctype = child2.encode(), "application/xml"
            elif self.path in site_pages:
                body, ctype = site_pages[self.path].encode(), "text/html"
            else:
                self.send_error(404)
                return
            self.send_response(200)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):
            pass

    try:
        srv = ThreadingHTTPServer(("127.0.0.1", 80), _H)
    except (OSError, socket.error) as e:
        pytest.skip(f"cannot bind port 80: {e}")
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        cfg = CrawlConfig(max_depth=3, host_budget_per_round=10,
                          max_rounds=4, url_seen_shards=2,
                          bloom_bits_per_shard=1 << 12,
                          sitemap_discovery=True)
        fetcher = make_http_fetcher(HttpFetcherConfig(timeout_sec=5.0,
                                                      concurrency=4))
        c = Crawler(spark, cfg, None, str(tmp_path), fetcher=fetcher)
        c.bootstrap(["http://127.0.0.1/p/0"])
        c.run()
        urls = c.url_seen_set()
        assert "http://127.0.0.1/p/9" in urls, \
            "gzipped-index orphan never fetched"
        # nested (level-2) index dropped: its child's URL never enqueued
        assert "http://127.0.0.1/p/13" not in urls
        fr = c.store.read(spark, "frontier")
        sm = fr.where(fr.parent_url ==
                      "http://127.0.0.1/sitemap_index.xml.gz").collect()
        assert {r["url"] for r in sm} == {"http://127.0.0.1/p/9"}
    finally:
        srv.shutdown()
