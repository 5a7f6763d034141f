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
