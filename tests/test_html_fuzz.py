"""Malformed-HTML hardening of the real-HTTP path (VERDICT r4 next-round
#6). The reference leans on Jsoup's tolerance
(core/WebCrawler.java:324-345); the engine's stdlib-HTMLParser extractor
(crawl/httpfetch.py) must shrug off the same garbage: unclosed tags,
broken entities, nested/garbage attributes, tag soup, truncated markup,
mixed encodings, binary noise — no task death, ``fetched=False`` on the
rows that genuinely fail (oversized, truncated transfers), and link
agreement with a tolerant regex mirror on recoverable markup."""

import html as _html
import random
import re
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import pytest

from distributed_web_crawler_spark.config import CrawlConfig
from distributed_web_crawler_spark.crawl.driver import Crawler
from distributed_web_crawler_spark.crawl.httpfetch import (
    HttpFetcherConfig,
    extract_feeds_html,
    extract_links_html,
    make_http_fetcher,
)

# -- pure-function fuzz ------------------------------------------------------

NASTY = [
    # unclosed tags everywhere
    b'<html><body><div><a href="/x">x<a href="/y">y</div>',
    # broken entities (bare &, bad numeric, overlong numeric)
    b'<a href="/ok">&amp x &#xZZ; &#99999999999999; &notarealent;</a>',
    # garbage + duplicate + valueless attributes
    b'<a class class= ="" href="/g" href="/dup" data-\x01="v">g</a>',
    # nested anchors (HTML forbids them; parser must not die)
    b'<a href="/outer"><a href="/inner">i</a></a>',
    # tag soup / angle noise
    b'<<<><a href="/soup">s</a>>>><b><i></b></i><>',
    # truncated mid-tag and mid-attribute
    b'<a href="/pre">p</a><a href="/tru',
    b'<a href="/pre2">p</a><div class="unterminated',
    # unclosed comment swallowing a tail (links before survive)
    b'<a href="/before">b</a><!-- unterminated comment <a href="/in">',
    # unclosed script: CDATA mode to EOF (no links from inside)
    b'<a href="/real">r</a><script>var a = "<a href=/fake>";',
    # invalid UTF-8 sequences around a valid link
    b'\xff\xfe<a href="/enc">\xc3\x28\xa0\xa1e</a>\x80\x81',
    # null bytes and control characters
    b'<a\x00 href="/nul">\x00n\x07</a>',
    # doctype/pi garbage
    b'<!DOCTYPE \x02 html PUBLIC "-//junk><?php echo ?><a href="/d">d</a>',
    # enormous attribute value
    b'<a href="/big" title="' + b"A" * 100_000 + b'">big</a>',
    # deeply nested unclosed divs
    b"<div>" * 2000 + b'<a href="/deep">d</a>',
]


def test_nasty_corpus_never_raises_and_finds_survivor_links():
    for body in NASTY:
        links = extract_links_html(body)
        feeds = extract_feeds_html(body, "http://h.example.com/p/0")
        assert isinstance(links, list)
        assert all(isinstance(x, str) for x in links)
        assert isinstance(feeds, list)
    # spot semantics on the recoverable ones
    assert extract_links_html(NASTY[0]) == ["/x", "/y"]
    assert "/ok" in extract_links_html(NASTY[1])
    assert extract_links_html(NASTY[3]) == ["/outer", "/inner"]
    assert "/before" in extract_links_html(NASTY[7])
    assert "/in" not in extract_links_html(NASTY[7])
    assert extract_links_html(NASTY[8]) == ["/real"]
    assert "/enc" in extract_links_html(NASTY[9])
    assert "/deep" in extract_links_html(NASTY[13])


A_HREF_RE = re.compile(
    rb"""<a\b[^>]*?\bhref\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""",
    re.I | re.S)


def _mirror_links(body: bytes) -> list[str]:
    """Tolerant regex mirror of the extractor: every <a href> value in
    document order, quotes stripped, character references decoded (the
    HTMLParser convert_charrefs behavior)."""
    out = []
    for m in A_HREF_RE.finditer(body):
        v = m.group(2) if m.group(2) is not None else (
            m.group(3) if m.group(3) is not None else m.group(4))
        out.append(_html.unescape(v.decode("utf-8", errors="replace")))
    return out


def _messy_page(rng: random.Random) -> bytes:
    """Structurally messy but regex-unambiguous HTML: quoted hrefs,
    surrounded by unclosed tags, stray closers, garbage attributes,
    entity noise in TEXT (not in hrefs), random whitespace."""
    frags = []
    for i in range(rng.randrange(1, 12)):
        href = f"/l/{rng.randrange(100)}?a=1&amp;b=2"
        # unterminated in-tag quotes are excluded: a dangling quote
        # swallows the href, which is genuinely ambiguous markup (the
        # NASTY corpus covers the no-crash property for those)
        junk_attr = rng.choice(
            ["", " data-x", ' class="a b"', " disabled",
             ' title="&bogus;"'])
        frags.append(f'<a{junk_attr} href="{href}" >t{i}</a>')
        frags.append(rng.choice(
            ["<div>", "</span>", "<p><p>", "&amp dangling &#xQQ;",
             "<b><i>mis</b>nested</i>", "<br/><hr>", ""]))
    return ("<html><body>" + " ".join(frags)).encode()


def test_extractor_agrees_with_tolerant_mirror_on_fuzzed_corpus():
    rng = random.Random(42)
    for _ in range(200):
        body = _messy_page(rng)
        assert extract_links_html(body) == _mirror_links(body)


def test_random_bytes_never_raise():
    rng = random.Random(7)
    for n in (0, 1, 17, 255, 4096):
        for _ in range(20):
            body = bytes(rng.randrange(256) for _ in range(n))
            assert isinstance(extract_links_html(body), list)
    # random printable soup with angle brackets
    alphabet = '<>="\'&;/ab \n\t!-'
    for _ in range(200):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randrange(400)))
        assert isinstance(extract_links_html(s.encode()), list)


# -- end-to-end over real sockets -------------------------------------------

MAX_BODY = 4096

GOOD_LINKS = ['<a href="/p/enc">enc</a>', '<a href="/p/soup">soup</a>',
              '<a href="/p/big">big</a>', '<a href="/p/cut">cut</a>',
              '<a href="/p/bin">bin</a>']

FUZZ_PAGES = {
    # root: unclosed tags + broken entities, links to every other page
    "/p/0": ("<html><body><div>" + " &amp ".join(GOOD_LINKS)
             + "<!-- unterminated").encode(),
    # declared utf-8, actually latin-1 high-bit bytes around a link
    "/p/enc": b'caf\xe9 <a href="/p/leaf">l</a> na\xefve<div',
    # tag soup leaf
    "/p/soup": b'<<<>>><a href="/p/leaf">l</a><b></i>',
    "/p/leaf": b"<html>leaf</html>",
    # served complete but over the fetcher's max_body_bytes cap
    "/p/big": b'<a href="/p/leaf">x</a>' + b"B" * (2 * MAX_BODY),
    # binary garbage with an html content-type
    "/p/bin": bytes(range(256)) * 4,
}


class _FuzzHandler(BaseHTTPRequestHandler):
    def do_GET(self):
        if self.path == "/p/cut":
            # truncated transfer: promise 1000 bytes, send 40, hang up
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.send_header("Content-Length", "1000")
            self.end_headers()
            self.wfile.write(b'<a href="/p/leaf">cut</a>' + b"x" * 15)
            self.wfile.flush()
            self.connection.close()
            return
        body = FUZZ_PAGES.get(self.path)
        if body is None:
            self.send_error(404)
            return
        self.send_response(200)
        self.send_header("Content-Type", "text/html; charset=utf-8")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def fuzz_site():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _FuzzHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_malformed_site_crawl_no_task_death(spark, tmp_path, fuzz_site):
    cfg = CrawlConfig(max_depth=3, host_budget_per_round=10, max_rounds=4,
                      url_seen_shards=2, bloom_bits_per_shard=1 << 12)
    fetcher = make_http_fetcher(HttpFetcherConfig(
        timeout_sec=5.0, concurrency=4, max_body_bytes=MAX_BODY))
    c = Crawler(spark, cfg, None, str(tmp_path), fetcher=fetcher)
    c.bootstrap([f"{fuzz_site}/p/0"])
    stats = c.run()

    # every link on the mangled root was discovered (the unterminated
    # comment sits AFTER the links; close() flushes the trailing
    # buffer): 5 children enqueued from /p/0, all 5 polled next round
    assert stats["per_round"][0]["discovered"] == 5
    assert stats["per_round"][1]["polled"] == 5

    stored = {r["url"] for r in c.pages().select("url").collect()}
    # recoverable pages stored, and the mixed-encoding page still
    # yielded its link (decoded with replacement, href is ASCII)
    assert f"{fuzz_site}/p/enc" in stored
    assert f"{fuzz_site}/p/soup" in stored
    assert f"{fuzz_site}/p/bin" in stored
    assert f"{fuzz_site}/p/leaf" in stored
    # oversized and truncated transfers FAILED (fetched=False path):
    # never stored, counted as fetch_failed, crawl completed anyway
    assert f"{fuzz_site}/p/big" not in stored
    assert f"{fuzz_site}/p/cut" not in stored
    assert sum(p.get("fetch_failed", 0) for p in stats["per_round"]) >= 2
    # binary page produced no links (leaf discovered via enc/soup only)
    bin_links = (c.pages().where(f"url = '{fuzz_site}/p/bin'")
                 .select("links").first()["links"])
    assert bin_links == []
