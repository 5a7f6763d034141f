"""Sitemap ingestion: parse sitemap XML bodies into frontier candidates.

The reference discovers URLs only by parsing anchor tags out of fetched
pages (service/WebPageFetcher.java link extraction); sitemaps are the
other standard discovery source a production crawler feeds its frontier
from (sitemaps.org protocol, referenced by robots.txt `Sitemap:` lines).
This operator turns a table of fetched sitemap documents into (host, url,
lastmod, priority) frontier candidates.

Everything is pure Catalyst — regexp over the body, `transform` over the
matched entry blocks — so the parse rides the scan: no shuffle, no
Python, bytes column pruned. Per the sitemaps.org spec, a <url> entry is
dropped unless it carries a <loc>, and a loc that escapes the sitemap's
own host is ignored (cross-host submission is not allowed without
cross-site verification, which a crawler should not assume).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ENTRY_RE = "(?s)<url>(.*?)</url>"

# the five predefined XML entities, &amp; LAST so a double-escaped
# '&amp;lt;' decodes one level (to '&lt;'), never to '<' — the spec
# REQUIRES loc URLs to be entity-escaped (sitemaps.org "Sitemap file
# location"), so a conformant sitemap's '?a=1&b=2' arrives as
# '?a=1&amp;b=2' and must decode before the URL joins the frontier
_XML_ENTITIES = (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                 ("&apos;", "'"), ("&amp;", "&"))


def _xml_unescape(col):
    for ent, ch in _XML_ENTITIES:
        col = F.replace(col, F.lit(ent), F.lit(ch))
    return col


def _field(block, tag: str):
    return F.regexp_extract(block, f"(?s)<{tag}>(.*?)</{tag}>", 1)


def parse_sitemaps(sitemaps: DataFrame, host_col: str = "host",
                   xml_col: str = "xml") -> DataFrame:
    """Explode sitemap XML into (host, url, lastmod, priority) candidates.

    - one output row per <url> entry that has a non-empty <loc> on the
      sitemap's own host (http or https);
    - lastmod parses as a DATE (null when absent/unparseable), priority
      as DOUBLE (null when absent) — both optional per the spec;
    - duplicate locs within one host collapse to the entry seen first in
      document order (min struct over entry index — deterministic).
    """
    host = F.col(host_col)
    entries = F.expr(
        f"regexp_extract_all({xml_col}, '{_ENTRY_RE}', 1)")
    exploded = (sitemaps
                .select(host.alias("host"),
                        F.posexplode(entries).alias("entry_idx", "block")))
    loc = _xml_unescape(_field(F.col("block"), "loc"))
    same_host = (loc.startswith(F.concat(F.lit("http://"), F.col("host"),
                                         F.lit("/"))) |
                 loc.startswith(F.concat(F.lit("https://"), F.col("host"),
                                         F.lit("/"))))
    parsed = (exploded
              .select("host", "entry_idx",
                      loc.alias("url"),
                      # try_cast, not to_date/cast: ANSI mode raises on a
                      # malformed lastmod; the spec says ignore it
                      _field(F.col("block"), "lastmod")
                      .try_cast("date").alias("lastmod"),
                      _field(F.col("block"), "priority")
                      .try_cast("double").alias("priority"))
              .where((F.length("url") > 0) & same_host))
    # first entry wins per (host, url): one partial-agg shuffle on the key.
    # min(struct) not min_by: entry_idx can collide when a host ships
    # several sitemap files, and the struct min stays total-ordered
    # (deterministic) under collisions where min_by would tie-break
    # arbitrarily; the sort-agg cost is bounded by entries-per-url.
    return (parsed
            .groupBy("host", "url")
            .agg(F.min(F.struct("entry_idx", "lastmod", "priority"))
                 .alias("_w"))
            .select("host", "url", F.col("_w.lastmod").alias("lastmod"),
                    F.col("_w.priority").alias("priority")))


def robots_sitemap_urls(robots: DataFrame, host_col: str = "host",
                        robots_col: str = "robots_txt") -> DataFrame:
    """Discover sitemap locations from robots.txt `Sitemap:` directives.

    Per the sitemaps.org protocol (and RFC 9309 §2.3's allowance for
    non-group records), `Sitemap:` lines are case-insensitive, live
    outside user-agent groups, may appear multiple times, and carry an
    ABSOLUTE URL — a relative value is invalid and dropped. Cross-host
    values are legal here (robots.txt is exactly how cross-host sitemap
    submission is authorized), so unlike `parse_sitemaps` no same-host
    check applies. Output: one (host, sitemap_url) row per distinct
    directive, first-seen document order collapsed by min line index.

    Scale shape: split/filter/transform over the robots text column ride
    the scan (map-only, codegen); the only exchange is the per-host
    distinct on (host, sitemap_url) — robots tables are host-grain, so
    that aggregation is tiny next to any frontier."""
    lines = F.split(F.col(robots_col), "\n")
    directives = F.filter(
        lines, lambda l: F.trim(l).rlike("(?i)^sitemap\\s*:"))
    urls = F.transform(
        directives,
        lambda l: F.trim(F.regexp_replace(F.trim(l),
                                          "(?i)^sitemap\\s*:", "")))
    from ..functions.urls import is_http_url
    exploded = (robots
                .select(F.col(host_col).alias("host"),
                        F.posexplode(urls).alias("line_idx", "sitemap_url"))
                .where(is_http_url(F.col("sitemap_url"))))
    return (exploded.groupBy("host", "sitemap_url")
            .agg(F.min("line_idx").alias("_first"))
            .select("host", "sitemap_url"))


# -- crawl-loop integration (CrawlConfig.sitemap_discovery) ------------------

SITEMAP_DOC_SCHEMA = "host string, sitemap_url string, xml string"


def make_synth_sitemap_fetcher(synth_cfg):
    """Sitemap-document fetcher over the synthetic web: (host, sitemap_url)
    → (host, sitemap_url, xml), xml null on failure. Pure function of the
    URL, like every synthetic fetcher, so the distributed fetch and the
    golden mirror agree with zero shared state. Real-HTTP twin:
    crawl/httpfetch.make_http_sitemap_fetcher."""
    import pandas as pd

    from ..crawl.synthweb import sitemap_xml_for_url

    def fetch(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "host": pdf["host"],
                "sitemap_url": pdf["sitemap_url"],
                "xml": pd.Series(
                    [sitemap_xml_for_url(u, synth_cfg)
                     for u in pdf["sitemap_url"]], dtype="object"),
            })

    return fetch


def sitemap_frontier_candidates(
        robots_new: DataFrame, cfg, fetcher, round_ts_ms: int,
        cached: list | None = None) -> tuple[DataFrame, DataFrame]:
    """The discovery tier executed inside the crawl round: newly fetched
    robots rows → their `Sitemap:` declarations → one document fetch per
    distinct (host, sitemap_url) → spec-rule parse (parse_sitemaps:
    loc required, same-host only, first-entry-wins) → link gates (F3
    allow / F4 exclude — the same predicates discovered links pass in
    extract_children) → depth-0 frontier candidate rows (parent = the
    sitemap URL, priority 1 like a seed).

    Returns ``(candidates, entries)``: candidates are the frontier-shaped
    rows finish_round merges with link children; entries keep the parsed
    per-URL sitemap metadata (host, url, lastmod, priority, sitemap_url)
    the frontier schema drops — the driver persists them as the `sitemap`
    table, feeding lastmod-driven recrawl planning
    (Crawler.sitemap_recrawl_picks → revalidate).

    A declared document may be a sitemap INDEX (<sitemapindex> — the
    protocol's 50k-URL/50MB split): its child-sitemap pointers parse
    under the same spec rules (parse_sitemap_index) and fetch in one
    more host-grain pass; children that are themselves indexes are
    dropped (the protocol allows exactly one nesting level).

    Scale shape: everything here is HOST-grain — robots_new is ≤ the
    round's new hosts, sitemap documents fetch once per host per robots
    generation (the TTL refetch path re-reads them), and the parse's only
    exchange is parse_sitemaps' (host, url) first-wins aggregate over
    entry rows (plus parse_sitemap_index's pointer-grain twin for index
    hosts). Nothing frontier-scale is touched; the candidates join
    the frontier through the same D4 seen-check as link children."""
    from ..functions.urls import (
        combined_allow_pattern,
        combined_exclude_pattern,
    )

    docs = (robots_new
            .where(F.size(F.coalesce(F.col("sitemaps"),
                                     F.array())) > 0)
            .select("host", F.explode("sitemaps").alias("sitemap_url"))
            .dropDuplicates(["host", "sitemap_url"])
            .mapInPandas(fetcher, SITEMAP_DOC_SCHEMA)
            .where(F.col("xml").isNotNull()))
    # persisted: the doc table feeds the entry parse, the index
    # expansion, AND the parentage lookup below — uncached, a NON-PURE
    # fetcher (real HTTP) would execute several times and could
    # disagree with itself
    docs = docs.persist()
    if cached is not None:
        cached.append(docs)
    is_index = F.col("xml").contains("<sitemapindex")
    # level 2: fetch the index hosts' child sitemaps (skipping any child
    # that was itself robots-declared — already fetched above); a child
    # that turns out to be ANOTHER index is out of protocol and dropped
    child_docs = (parse_sitemap_index(docs.where(is_index))
                  .select("host", "sitemap_url")
                  .join(docs.select("host", "sitemap_url"),
                        ["host", "sitemap_url"], "left_anti")
                  .mapInPandas(fetcher, SITEMAP_DOC_SCHEMA)
                  .where(F.col("xml").isNotNull() &
                         ~F.col("xml").contains("<sitemapindex"))
                  .persist())
    if cached is not None:
        cached.append(child_docs)
    flat = docs.where(~is_index).unionByName(child_docs)
    cands = parse_sitemaps(flat, host_col="host", xml_col="xml")
    # parse_sitemaps collapses to (host, url); parentage rejoins per host
    # — a url's host equals its sitemap's host (same-host rule), and the
    # min() keeps parentage deterministic when a host ships several
    # sitemap files
    parent = (docs.groupBy("host")
              .agg(F.min("sitemap_url").alias("parent_url")))
    allow_re = combined_allow_pattern(cfg.allowed_domains)
    excl_re = combined_exclude_pattern(cfg.exclude_patterns)
    out = cands.join(parent, "host")
    if allow_re is not None:
        out = out.where(F.col("host").rlike(allow_re))       # F3 on entries
    if excl_re is not None:
        out = out.where(~F.col("url").rlike(excl_re))        # F4 on entries
    candidates = out.select(
        "url", "host",
        F.lit(0).alias("depth"),           # host-declared, like a seed
        "parent_url",
        F.lit(round_ts_ms).alias("discovered_at_ms"),
        F.lit(1).alias("priority"),
        F.lit(0).alias("retry_count"),
        F.lit(None).cast("long").alias("scheduled_for_ms"),
    )
    entries = out.select("host", "url", "lastmod",
                         F.col("priority").alias("sitemap_priority"),
                         F.col("parent_url").alias("sitemap_url"))
    return candidates, entries


_INDEX_ENTRY_RE = "(?s)<sitemap>(.*?)</sitemap>"


def parse_sitemap_index(indexes: DataFrame, host_col: str = "host",
                        xml_col: str = "xml") -> DataFrame:
    """Explode sitemap INDEX files (sitemaps.org <sitemapindex>) into
    (host, sitemap_url, lastmod) child-sitemap pointers — the protocol's
    nesting level: large sites split their URL space across child
    sitemaps (50k-URL / 50 MB caps per file) behind one index.

    Spec rules mirrored from `parse_sitemaps`: a <sitemap> entry needs a
    non-empty <loc> on the index's own host; lastmod is optional
    (try_cast date); duplicate locs collapse first-entry-wins. The
    caller feeds the resolved children back through `parse_sitemaps`
    (one fetch round per nesting level — the index is discovery-grain,
    so the loop is 2 tiny rounds, not a frontier-scale iteration).

    Scale shape: identical to `parse_sitemaps` — regexp explode rides
    the scan, one (host, url) min-agg exchange at discovery grain."""
    host = F.col(host_col)
    entries = F.expr(
        f"regexp_extract_all({xml_col}, '{_INDEX_ENTRY_RE}', 1)")
    exploded = (indexes
                .select(host.alias("host"),
                        F.posexplode(entries).alias("entry_idx", "block")))
    loc = _xml_unescape(_field(F.col("block"), "loc"))
    same_host = (loc.startswith(F.concat(F.lit("http://"), F.col("host"),
                                         F.lit("/"))) |
                 loc.startswith(F.concat(F.lit("https://"), F.col("host"),
                                         F.lit("/"))))
    parsed = (exploded
              .select("host", "entry_idx",
                      loc.alias("sitemap_url"),
                      _field(F.col("block"), "lastmod")
                      .try_cast("date").alias("lastmod"))
              .where((F.length("sitemap_url") > 0) & same_host))
    return (parsed.groupBy("host", "sitemap_url")
            .agg(F.min(F.struct("entry_idx", "lastmod")).alias("_w"))
            .select("host", "sitemap_url",
                    F.col("_w.lastmod").alias("lastmod")))
