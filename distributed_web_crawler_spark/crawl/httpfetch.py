"""Production HTTP fetcher: the reference's Jsoup fetch + ``a[href]``
extraction (reference: core/WebCrawler.java:324-345), as an Arrow-batch
fetcher with the same injectable interface as the synthetic one
(operators/extract.make_synth_fetcher) — drop it into ``Crawler(...,
fetcher=make_http_fetcher(cfg))`` and every other stage (gates, politeness,
robots, dedup, URL-seen, X3 resolution, payload sink) is unchanged.

Shape notes (SURVEY.md §2.11, O10):
- the reference fans a batch out over virtual threads
  (core/WebCrawler.java:135-165); here the SAME concurrency lives *inside*
  each Arrow batch as a thread pool of blocking urllib fetches — I/O-bound
  threads release the GIL, so one Python worker overlaps
  ``concurrency`` in-flight requests while other cores run their own
  batches;
- link extraction uses the stdlib HTMLParser collecting every ``<a href>``
  RAW — relative hrefs are resolved downstream by the Catalyst X3 resolver
  against the discovering page, exactly where Jsoup's ``abs:href`` logic
  lands in our plan;
- timeouts/user-agent mirror the reference defaults (30 s page fetch,
  core/WebCrawler.java:326; configurable UA);
- failures (DNS, timeout, non-2xx, oversized body) yield ``fetched=False``
  rows, the engine's analog of the reference's catch-and-log
  (core/WebCrawler.java:436-439).

The sandbox has no outbound network; tests exercise this fetcher against a
loopback ``http.server`` (tests/test_httpfetch.py), which drives the full
crawl loop over real sockets and real HTML.
"""

from __future__ import annotations

import threading
from collections.abc import Iterator
from dataclasses import dataclass
from html.parser import HTMLParser


@dataclass(frozen=True)
class HttpFetcherConfig:
    user_agent: str = "SparkCrawler/1.0"
    timeout_sec: float = 30.0          # reference: core/WebCrawler.java:326
    concurrency: int = 16              # in-flight requests per Arrow batch
    max_body_bytes: int = 8 << 20      # drop pathological bodies


_FEED_TYPES = ("application/rss+xml", "application/atom+xml")


class _LinkCollector(HTMLParser):
    """Every <a href> value, raw (the reference collects
    select("a[href]"), core/WebCrawler.java:339-345; dedup and
    resolution happen downstream: D3 array_distinct, X3 resolver) —
    plus autodiscovered feed declarations (<link rel="alternate"
    type="application/rss+xml|atom+xml" href>), collected separately
    for the feed discovery tier (rel is token-matched per the HTML
    microsyntax, type parameter-stripped per MIME)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.links: list[str] = []
        self.feeds: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.links.append(v)
        elif tag == "link":
            d = {k: v for k, v in attrs if v}
            rel = (d.get("rel") or "").lower().split()
            mime = (d.get("type") or "").split(";")[0].strip().lower()
            if "alternate" in rel and mime in _FEED_TYPES and d.get("href"):
                self.feeds.append(d["href"])


def _collect_html(body: bytes, encoding: str = "utf-8") -> _LinkCollector:
    p = _LinkCollector()
    try:
        p.feed(body.decode(encoding, errors="replace"))
        p.close()  # flush links buffered in incomplete trailing markup
    except Exception:
        pass
    return p


def extract_links_html(body: bytes, encoding: str = "utf-8") -> list[str]:
    return _collect_html(body, encoding).links


def extract_feeds_html(body: bytes, base_url: str,
                       encoding: str = "utf-8") -> list[str]:
    """Feed declarations resolved ABSOLUTE against the (post-redirect)
    document location — feed URLs skip the frontier's X3 resolver (they
    are fetched directly, not enqueued), so relative hrefs must resolve
    here, in-worker, where the base is at hand."""
    from urllib.parse import urljoin

    return [urljoin(base_url, h)
            for h in _collect_html(body, encoding).feeds]


class _ConnPool:
    """Per-THREAD keep-alive ``http.client`` connections keyed by
    (scheme, host, port). Connections live in a ``threading.local`` so no
    socket is ever shared between pool threads (http.client is not
    thread-safe), and they persist across Arrow batches within one fetch
    task — a steady crawl re-fetches the same polite-budget hosts every
    round, so socket + TLS setup amortizes across requests instead of
    being paid per URL (the round-1..2 fetcher opened one connection per
    request)."""

    def __init__(self, cfg: HttpFetcherConfig):
        self.cfg = cfg
        self._local = threading.local()

    def _conns(self) -> dict:
        try:
            return self._local.conns
        except AttributeError:
            self._local.conns = {}
            return self._local.conns

    def get(self, scheme: str, host: str, port: int | None):
        import http.client

        key = (scheme, host, port)
        conn = self._conns().get(key)
        if conn is None:
            cls = (http.client.HTTPSConnection if scheme == "https"
                   else http.client.HTTPConnection)
            conn = cls(host, port, timeout=self.cfg.timeout_sec)
            self._conns()[key] = conn
        return conn

    def drop(self, scheme: str, host: str, port: int | None) -> None:
        conn = self._conns().pop((scheme, host, port), None)
        if conn is not None:
            try:
                conn.close()
            except OSError:
                pass


def _fetch_one(url: str, cfg: HttpFetcherConfig, pool: _ConnPool,
               etag: str | None = None,
               last_modified: str | None = None) -> dict | None:
    """One GET → page dict (None ⇔ failure), over the thread's keep-alive
    pool. Runs on a pool thread; socket I/O releases the GIL. Redirects
    follow up to 5 hops (urlopen's behavior in the pre-keep-alive
    fetcher); a request that fails on a reused socket retries ONCE on a
    fresh connection — a keep-alive peer may have closed between
    requests, which is indistinguishable from a stale socket.

    etag / last_modified (from a prior fetch of this URL) make the GET
    conditional: If-None-Match / If-Modified-Since ride the FIRST hop
    only (a redirect target is a different resource — its copy must not
    be validated against the origin's validators), and a 304 comes back
    as a dict with not_modified=True and no payload. Every 200 dict
    carries the response's own etag/last_modified so the caller can
    store validators for the next revalidation round."""
    import http.client
    from urllib.parse import urljoin, urlsplit

    requested = url
    for _hop in range(10):  # urlopen's redirect ceiling, preserved
        try:
            parts = urlsplit(url)
            # .port raises lazily on out-of-range ports ("http://h:99999/")
            # — one malformed href in 10^10 must not kill the fetch task
            key = (parts.scheme, parts.hostname, parts.port)
        except ValueError:
            return None
        if parts.scheme not in ("http", "https") or not parts.hostname:
            return None
        target = parts.path or "/"
        if parts.query:
            target += "?" + parts.query
        headers = {"User-Agent": cfg.user_agent}
        if _hop == 0:
            if etag:
                headers["If-None-Match"] = etag
            if last_modified:
                headers["If-Modified-Since"] = last_modified
        resp = body = None
        for attempt in (0, 1):
            conn = pool.get(*key)
            try:
                conn.request("GET", target, headers=headers)
                resp = conn.getresponse()
                body = resp.read(cfg.max_body_bytes + 1)
                if (len(body) <= cfg.max_body_bytes
                        and resp.length not in (None, 0)):
                    # premature EOF: Content-Length promised more bytes
                    # than the socket delivered. http.client's
                    # read(amt) returns the SHORT body without raising,
                    # so without this check a truncated transfer would
                    # be stored as a complete page (Jsoup raises
                    # IOException here — core/WebCrawler.java:324-331's
                    # catch treats it as a failed fetch). The cap path
                    # (len == max+1) legitimately leaves resp.length
                    # unread and is handled below.
                    raise http.client.IncompleteRead(body, resp.length)
                break
            except (http.client.HTTPException, OSError, ValueError):
                pool.drop(*key)
                if attempt:
                    return None
        status = resp.status
        truncated = len(body) > cfg.max_body_bytes
        if truncated:
            pool.drop(*key)  # truncated read leaves unread bytes on the wire
        elif resp.will_close:
            pool.drop(*key)
        if status == 304:
            # only meaningful as an answer to the conditional headers we
            # sent on hop 0; a 304 to an UNconditional GET (broken server
            # / stale proxy) is a failed fetch, not an empty stored page
            if _hop != 0 or not (etag or last_modified):
                return None
            return {
                "image_id": None, "bytes": None, "w": None, "h": None,
                "fmt": None, "caption": None, "phash": None, "links": [],
                "http_status": 304, "content_type": None,
                "final_url": None, "feeds": [],
                "not_modified": True,
                "etag": resp.getheader("ETag"),
                "last_modified": resp.getheader("Last-Modified"),
            }
        loc = resp.getheader("Location")
        if 300 <= status < 400 and loc:
            # follow BEFORE the size cap: urlopen discarded oversized
            # redirect bodies and followed; only final bodies are capped
            url = urljoin(url, loc)
            continue
        if status >= 300 or truncated:
            return None
        ctype = resp.getheader("Content-Type", "") or ""
        break
    else:
        return None  # redirect chain too long
    is_html = "html" in ctype.lower()
    return {
        "image_id": None,
        "bytes": bytes(body),
        "w": None,
        "h": None,
        "fmt": "html" if is_html else (ctype.split("/")[-1].split(";")[0]
                                       or None),
        "caption": None,
        "phash": None,
        "links": extract_links_html(body) if is_html else [],
        "feeds": extract_feeds_html(body, url) if is_html else [],
        "http_status": int(status),
        "content_type": ctype.split(";")[0] or None,
        "final_url": url if url != requested else None,
        "not_modified": False,
        "etag": resp.getheader("ETag"),
        "last_modified": resp.getheader("Last-Modified"),
    }


def parse_robots_directives(
        text: str,
        user_agent: str | None = None,
) -> tuple[list[str], float | None, list[str], list[str]]:
    """(disallow paths, crawl-delay, sitemap URLs, allow patterns) —
    disallow/allow/crawl-delay for user-agent:* with reference semantics
    (core/WebCrawler.java:509-528): only the ``*`` section's rules apply,
    Disallow matched later as URL substrings (bug-for-bug, F6).
    Crawl-delay (seconds, float; last * directive wins) feeds the per-host
    politeness budget override — the reference's crawl_state.crawl_delay
    intent (schema.cql:19-24). `Sitemap:` lines are non-group records
    (RFC 9309 §2.3): collected regardless of user-agent section,
    case-insensitive, absolute http(s) URLs only, first-seen order with
    duplicates dropped — matching operators/sitemap.robots_sitemap_urls.
    Allow patterns feed the rfc9309 matching tier
    (CrawlConfig.robots_matching); the substring tier ignores them like
    the reference ignores Allow lines."""
    if user_agent is not None:
        # RFC 9309 group selection (CrawlConfig.robots_ua_groups): the
        # exact product token beats '*'; shared mirror of the Catalyst
        # robots_group_rules fold
        from ..operators.robots import parse_group_directives_py

        grules, gdelay, gsitemaps = parse_group_directives_py(
            text, user_agent)
        return ([p for ok, p in grules if not ok], gdelay, gsitemaps,
                [p for ok, p in grules if ok])
    rules: list[str] = []
    allows: list[str] = []
    delay: float | None = None
    sitemaps: list[str] = []
    in_star = False
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line:
            continue
        low = line.lower()
        if ":" in low and low.split(":", 1)[0].strip() == "sitemap":
            u = line.split(":", 1)[1].strip()
            if u.startswith(("http://", "https://")) and u not in sitemaps:
                sitemaps.append(u)
            continue
        if low.startswith("user-agent:"):
            in_star = line.split(":", 1)[1].strip() == "*"
        elif low.startswith("disallow:") and in_star:
            path = line.split(":", 1)[1].strip()
            if path:
                rules.append(path)
        elif low.startswith("allow:") and in_star:
            path = line.split(":", 1)[1].strip()
            if path:
                allows.append(path)
        elif low.startswith("crawl-delay:") and in_star:
            try:
                d = float(line.split(":", 1)[1].strip())
            except ValueError:
                continue
            if d > 0:
                delay = d
    return rules, delay, sitemaps, allows


def parse_robots_txt(text: str) -> list[str]:
    """Disallow paths only (see parse_robots_directives)."""
    return parse_robots_directives(text)[0]


def make_http_robots_fetcher(cfg: HttpFetcherConfig | None = None,
                             user_agent: str | None = None):
    """S7 over real HTTP: GET {scheme}://{host}/robots.txt per distinct
    host (10 s timeout like the reference, core/WebCrawler.java:465); any
    failure ⇒ allow-all (core/WebCrawler.java:470-473). Same contract as
    operators/robots.make_robots_fetcher.

    The frontier keys robots state by HOST (like the reference's
    robotsCache, core/WebCrawler.java:34), which — also like the
    reference, whose java.net.URL.getHost() does the same — drops the
    port, so a robots.txt served only on a non-default port is not
    reachable (allow-all). The scheme is likewise not tracked per host;
    we try http then https, which covers both plain and TLS-only hosts
    on default ports."""
    import pandas as pd

    cfg = cfg or HttpFetcherConfig()

    def fetch_rules(
            host: str) -> tuple[list[str], float | None, list[str],
                                list[str]]:
        import urllib.error
        import urllib.request

        if not host:
            return [], None, [], []
        # https first: an https-only site's robots.txt must not be taken
        # from whatever a middlebox/CDN happens to serve on cleartext port
        # 80 — only if https fails (refused OR timed out: a firewall that
        # silently DROPs 443 on a plain-http host must not suppress the
        # reachable http attempt) does the http attempt run. Worst case an
        # unreachable host costs one 10 s timeout per scheme, once,
        # cached in host state thereafter.
        for scheme in ("https", "http"):
            req = urllib.request.Request(
                f"{scheme}://{host}/robots.txt",
                headers={"User-Agent": cfg.user_agent})
            try:
                with urllib.request.urlopen(req, timeout=10.0) as resp:
                    if resp.status >= 300:
                        continue
                    return parse_robots_directives(
                        resp.read(1 << 20).decode("utf-8",
                                                  errors="replace"),
                        user_agent=user_agent)
            except (urllib.error.URLError, TimeoutError, OSError, ValueError):
                continue
        return [], None, [], []

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=cfg.concurrency) as pool:
            for pdf in batches:
                fetched = list(pool.map(fetch_rules, pdf["host"]))
                yield pd.DataFrame({
                    "host": pdf["host"],
                    "robots_disallow": [r for r, _, _, _ in fetched],
                    "robots_allow": [a for _, _, _, a in fetched],
                    "crawl_delay": pd.array([d for _, d, _, _ in fetched],
                                            dtype="Float64"),
                    "sitemaps": [sm for _, _, sm, _ in fetched],
                })

    return fetch


def make_http_sitemap_fetcher(cfg: HttpFetcherConfig | None = None):
    """Sitemap-document fetcher over real HTTP: input batches carry
    (host, sitemap_url); each row becomes one GET (10 s timeout, 1 MiB
    cap — the spec's 50 MB limit is a server obligation, the cap is our
    defense). Failure ⇒ null xml, which parse_sitemaps yields no entries
    for — discovery degrades to link-following, never fails the round.
    Same contract as operators/sitemap.make_synth_sitemap_fetcher."""
    import pandas as pd

    cfg = cfg or HttpFetcherConfig()

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=cfg.concurrency) as pool:
            for pdf in batches:
                yield pd.DataFrame({
                    "host": pdf["host"],
                    "sitemap_url": pdf["sitemap_url"],
                    "xml": pd.Series(
                        list(pool.map(lambda u: _fetch_xml_doc(u, cfg),
                                      pdf["sitemap_url"])),
                        dtype="object"),
                })

    return fetch


def _fetch_xml_doc(url: str, cfg: HttpFetcherConfig) -> str | None:
    """One XML document GET (sitemaps, feeds): 10 s timeout, 1 MiB wire
    cap, gzip sniffed by magic (not extension, so Content-Encoding
    mislabels don't matter) with decompression capped at 8 MiB — the
    zip-bomb defense; max_length stops mid-stream, and no partial
    garbage reaches the parser because oversize is then rejected."""
    import urllib.error
    import urllib.request
    import zlib

    req = urllib.request.Request(
        url, headers={"User-Agent": cfg.user_agent})
    try:
        with urllib.request.urlopen(req, timeout=10.0) as resp:
            if resp.status >= 300:
                return None
            raw = resp.read(1 << 20)
    except (urllib.error.URLError, TimeoutError, OSError, ValueError):
        return None
    if raw[:2] == b"\x1f\x8b":
        try:
            d = zlib.decompressobj(16 + zlib.MAX_WBITS)
            raw = d.decompress(raw, 8 << 20)
            if not d.eof and d.unconsumed_tail:
                return None  # truncated by the cap: oversize
        except zlib.error:
            return None
    return raw.decode("utf-8", errors="replace")


def make_http_feed_fetcher(cfg: HttpFetcherConfig | None = None):
    """Feed-document fetcher over real HTTP: input batches carry
    (feed_url); one GET each via _fetch_xml_doc (timeout/cap/gzip rules
    shared with sitemap documents). Failure ⇒ null xml — discovery
    degrades to link-following, never fails the round. Same contract as
    operators/feeds.make_synth_feed_fetcher."""
    import pandas as pd

    cfg = cfg or HttpFetcherConfig()

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=cfg.concurrency) as pool:
            for pdf in batches:
                yield pd.DataFrame({
                    "feed_url": pdf["feed_url"],
                    "xml": pd.Series(
                        list(pool.map(lambda u: _fetch_xml_doc(u, cfg),
                                      pdf["feed_url"])),
                        dtype="object"),
                })

    return fetch


def make_http_revalidating_fetcher(cfg: HttpFetcherConfig | None = None):
    """Arrow-batch CONDITIONAL fetcher for recrawl rounds: input batches
    carry (url, etag, last_modified) — the validators stored by the prior
    fetch — and each row becomes one conditional GET. A 304 costs headers
    only (not_modified=True, no payload moves); a 200 returns the new
    payload plus the response's own validators for the next round. Output
    schema is pipeline.recrawl.REVALIDATE_SCHEMA; revalidate_merge() folds
    these verdicts back into the stored page table."""
    import pandas as pd

    cfg = cfg or HttpFetcherConfig()

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from concurrent.futures import ThreadPoolExecutor

        conns = _ConnPool(cfg)
        with ThreadPoolExecutor(max_workers=cfg.concurrency) as pool:
            for pdf in batches:
                pages = list(pool.map(
                    lambda t: _fetch_one(t[0], cfg, conns,
                                         etag=t[1] or None,
                                         last_modified=t[2] or None),
                    zip(pdf["url"],
                        pdf.get("etag", pd.Series([None] * len(pdf))),
                        pdf.get("last_modified",
                                pd.Series([None] * len(pdf))))))
                yield pd.DataFrame({
                    "url": pdf["url"].to_numpy(),
                    "fetched": [p is not None for p in pages],
                    "not_modified": [bool(p and p["not_modified"])
                                     for p in pages],
                    "http_status": pd.array(
                        [None if p is None else p["http_status"]
                         for p in pages], dtype="Int32"),
                    "bytes": pd.Series(
                        [None if p is None else p["bytes"] for p in pages],
                        dtype="object"),
                    "content_type": pd.Series(
                        [None if p is None else p["content_type"]
                         for p in pages], dtype="object"),
                    "etag": pd.Series(
                        [None if p is None else p["etag"] for p in pages],
                        dtype="object"),
                    "last_modified": pd.Series(
                        [None if p is None else p["last_modified"]
                         for p in pages], dtype="object"),
                })

    return fetch


def make_http_fetcher(cfg: HttpFetcherConfig | None = None):
    """Arrow-batch fetcher over real HTTP; same contract as
    make_synth_fetcher (FETCH_SCHEMA columns, fetched=False on failure)."""
    import pandas as pd

    cfg = cfg or HttpFetcherConfig()
    int_cols = {"w": "Int32", "h": "Int32", "phash": "Int64",
                "http_status": "Int32"}
    page_cols = ("image_id", "bytes", "w", "h", "fmt", "caption", "phash",
                 "links", "http_status", "content_type", "final_url",
                 "feeds")

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from concurrent.futures import ThreadPoolExecutor

        from ..operators.extract import FETCH_SCHEMA

        conns = _ConnPool(cfg)  # built worker-side (thread-locals don't pickle)
        with ThreadPoolExecutor(max_workers=cfg.concurrency) as pool:
            for pdf in batches:
                pages = list(pool.map(lambda u: _fetch_one(u, cfg, conns),
                                      pdf["url"]))
                data = {
                    "url": pdf["url"].to_numpy(),
                    "host": pdf["host"].to_numpy(),
                    "depth": pdf["depth"].to_numpy(),
                    "parent_url": pdf["parent_url"].to_numpy(),
                    "priority": pdf["priority"].to_numpy(),
                    "fetched": [p is not None for p in pages],
                }
                for col in page_cols:
                    vals = [None if p is None else p[col] for p in pages]
                    dtype = int_cols.get(col)
                    data[col] = (pd.array(vals, dtype=dtype) if dtype
                                 else pd.Series(vals, dtype="object"))
                yield pd.DataFrame(
                    data, columns=[f.name for f in FETCH_SCHEMA])

    return fetch
