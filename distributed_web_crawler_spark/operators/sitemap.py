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

_ENTRY_RE = "<url>(.*?)</url>"


def _field(block, tag: str):
    return F.regexp_extract(block, f"<{tag}>(.*?)</{tag}>", 1)


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
    loc = _field(F.col("block"), "loc")
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


_INDEX_ENTRY_RE = "<sitemap>(.*?)</sitemap>"


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
    loc = _field(F.col("block"), "loc")
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
