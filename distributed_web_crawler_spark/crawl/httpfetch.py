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

from collections.abc import Iterator
from dataclasses import dataclass
from html.parser import HTMLParser


@dataclass(frozen=True)
class HttpFetcherConfig:
    user_agent: str = "SparkCrawler/1.0"
    timeout_sec: float = 30.0          # reference: core/WebCrawler.java:326
    concurrency: int = 16              # in-flight requests per Arrow batch
    max_body_bytes: int = 8 << 20      # drop pathological bodies


class _LinkCollector(HTMLParser):
    """Every <a href> value, raw (the reference collects
    select("a[href]"), core/WebCrawler.java:339-345; dedup and
    resolution happen downstream: D3 array_distinct, X3 resolver)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.links: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.links.append(v)


def extract_links_html(body: bytes, encoding: str = "utf-8") -> list[str]:
    p = _LinkCollector()
    try:
        p.feed(body.decode(encoding, errors="replace"))
        p.close()  # flush links buffered in incomplete trailing markup
    except Exception:
        pass
    return p.links


def _fetch_one(url: str, cfg: HttpFetcherConfig) -> dict | None:
    """One blocking GET → page dict (None ⇔ failure). Runs on a pool
    thread; urllib releases the GIL during socket I/O."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(url, headers={"User-Agent": cfg.user_agent})
    try:
        with urllib.request.urlopen(req, timeout=cfg.timeout_sec) as resp:
            status = resp.status
            ctype = resp.headers.get("Content-Type", "") or ""
            body = resp.read(cfg.max_body_bytes + 1)
            if status >= 300 or len(body) > cfg.max_body_bytes:
                return None
    except (urllib.error.URLError, OSError, ValueError):
        return None
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
        "http_status": int(status),
        "content_type": ctype.split(";")[0] or None,
    }


def parse_robots_directives(text: str) -> tuple[list[str], float | None]:
    """(disallow paths, crawl-delay) for user-agent:*, reference semantics
    (core/WebCrawler.java:509-528): only the ``*`` section's rules apply,
    Disallow matched later as URL substrings (bug-for-bug, F6).
    Crawl-delay (seconds, float; last * directive wins) feeds the per-host
    politeness budget override — the reference's crawl_state.crawl_delay
    intent (schema.cql:19-24)."""
    rules: list[str] = []
    delay: float | None = None
    in_star = False
    for line in text.splitlines():
        line = line.split("#", 1)[0].strip()
        if not line:
            continue
        low = line.lower()
        if low.startswith("user-agent:"):
            in_star = line.split(":", 1)[1].strip() == "*"
        elif low.startswith("disallow:") and in_star:
            path = line.split(":", 1)[1].strip()
            if path:
                rules.append(path)
        elif low.startswith("crawl-delay:") and in_star:
            try:
                d = float(line.split(":", 1)[1].strip())
            except ValueError:
                continue
            if d > 0:
                delay = d
    return rules, delay


def parse_robots_txt(text: str) -> list[str]:
    """Disallow paths only (see parse_robots_directives)."""
    return parse_robots_directives(text)[0]


def make_http_robots_fetcher(cfg: HttpFetcherConfig | None = None):
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

    def fetch_rules(host: str) -> tuple[list[str], float | None]:
        import socket
        import urllib.error
        import urllib.request

        if not host:
            return [], None
        # https first: an https-only site's robots.txt must not be taken
        # from whatever a middlebox/CDN happens to serve on cleartext port
        # 80 — only if https fails (e.g. plain-http-only host refusing 443)
        # does the http attempt run.
        for scheme in ("https", "http"):
            req = urllib.request.Request(
                f"{scheme}://{host}/robots.txt",
                headers={"User-Agent": cfg.user_agent})
            try:
                with urllib.request.urlopen(req, timeout=10.0) as resp:
                    if resp.status >= 300:
                        continue
                    return parse_robots_directives(
                        resp.read(1 << 20).decode("utf-8", errors="replace"))
            except urllib.error.URLError as e:
                # a TIMEOUT means the host is unreachable — https would
                # hang another 10 s for nothing; only non-timeout failures
                # (e.g. port 80 refused on a TLS-only host) try https
                if isinstance(getattr(e, "reason", None), socket.timeout):
                    return [], None
                continue
            except TimeoutError:
                return [], None
            except (OSError, ValueError):
                continue
        return [], None

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=cfg.concurrency) as pool:
            for pdf in batches:
                fetched = list(pool.map(fetch_rules, pdf["host"]))
                yield pd.DataFrame({
                    "host": pdf["host"],
                    "robots_disallow": [rules for rules, _ in fetched],
                    "crawl_delay": pd.array([d for _, d in fetched],
                                            dtype="Float64"),
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
                 "links", "http_status", "content_type")

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from concurrent.futures import ThreadPoolExecutor

        from ..operators.extract import FETCH_SCHEMA

        with ThreadPoolExecutor(max_workers=cfg.concurrency) as pool:
            for pdf in batches:
                pages = list(pool.map(lambda u: _fetch_one(u, cfg),
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
