"""Feed discovery tier for the crawl loop (cfg.feed_discovery): fetched
pages' autodiscovered Atom feeds become depth-0 frontier candidates.

The third discovery source next to anchor links (the reference's only
one — core/WebCrawler.java:339-345) and robots-declared sitemaps
(operators/sitemap.py). Unlike sitemaps, which ride the HOST-grain
robots fetch, feeds are PAGE-grain: a feed URL only surfaces once a
page declaring it is actually fetched — and feeds have NO same-host
rule (a page may legally point at an off-host feed, and a feed at
off-host entries), so candidates pass only the engine's own F3/F4
gates plus http-URL validity.

Scale shape: declarations collapse to DISTINCT feed URLs before
anything fetches — a section feed is fetched once however many of its
pages declare it, and once per CRAWL, not per round (the anti-join
against accumulated feed state, which broadcasts: feed tables are
section-grain, ≪ frontier). Entry parsing's only exchange is
parse_atom_feeds' (feed_url, entry_id) first-wins aggregate at entry
grain, plus the per-url min(feed_url) parentage agg; the merge into
the frontier is the same broadcast anti-join + union as sitemap
candidates. Nothing frontier-scale shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEED_DOC_SCHEMA = "feed_url string, xml string"


def make_synth_feed_fetcher(synth_cfg, version: int = 0):
    """Feed-document fetcher over the synthetic web: (feed_url) →
    (feed_url, xml), xml null on failure. Pure function of the URL,
    like every synthetic fetcher; ``version`` selects which feed
    content the web is serving (drift — synthweb.feed_version_at_round).
    Real-HTTP twin: crawl/httpfetch.make_http_feed_fetcher."""
    import pandas as pd

    from ..crawl.synthweb import feed_xml_for_url

    def fetch(batches):
        for pdf in batches:
            yield pd.DataFrame({
                "feed_url": pdf["feed_url"],
                "xml": pd.Series(
                    [feed_xml_for_url(u, synth_cfg, version)
                     for u in pdf["feed_url"]], dtype="object"),
            })

    return fetch


def feed_frontier_candidates(
        declared: DataFrame, known: DataFrame | None, cfg, fetcher,
        round_ts_ms: int,
        cached: list | None = None,
        round_no: int = 0) -> tuple[DataFrame, DataFrame,
                                    DataFrame]:
    """The discovery tier executed inside the crawl round: the round's
    fetched pages' feed declarations → one document fetch per distinct
    NEW feed URL (never attempted in any prior round — fetch-once
    semantics, the robots-cache posture; a dead feed URL is attempted
    once and remembered) → RFC 4287 entry parse (parse_atom_feeds: id
    required, dup ids first-wins, entities decoded) → http-validity +
    F3 allow / F4 exclude gates → depth-0 frontier candidate rows
    (parent = the feed URL, priority 1 like a seed; a URL listed by
    several feeds parents to min(feed_url), deterministic).

    Returns ``(candidates, entries, attempted)``: candidates merge with
    link children in finish_round (before the sitemap override — the
    sitemap identity wins a same-round collision); entries keep the
    per-URL feed metadata (feed_url, url, updated date) the frontier
    schema drops, persisted as the `feed_entries` table for
    update-driven recrawl planning; attempted is the (feed_url) delta
    the driver appends to feed state."""
    from ..functions.urls import (
        combined_allow_pattern,
        combined_exclude_pattern,
        host_of,
        is_http_url,
    )
    from .html_links import parse_atom_feeds

    new = declared.dropDuplicates(["feed_url"])
    if known is not None:
        fresh = known
        if cfg.feed_ttl_rounds > 0:
            # TTL re-poll (cfg.feed_ttl_rounds): only attempts within
            # the TTL suppress a refetch — latest attempt per feed wins
            # (one feed-grain agg on the broadcast-sized state side);
            # rows with unknown age (pre-TTL stores) count as expired
            fresh = (known
                     .groupBy("feed_url")
                     .agg(F.max(F.coalesce(F.col("fetched_round"),
                                           F.lit(-(1 << 30))))
                          .alias("_last"))
                     .where(F.col("_last")
                            > F.lit(round_no - cfg.feed_ttl_rounds)))
        new = new.join(F.broadcast(fresh.select("feed_url").distinct()),
                       "feed_url", "left_anti")
    new = new.persist()
    if cached is not None:
        cached.append(new)
    # persisted: docs feed the entry parse AND (via `new`) the state
    # delta; a non-pure fetcher (real HTTP) must execute once
    docs = (new.mapInPandas(fetcher, FEED_DOC_SCHEMA)
            .where(F.col("xml").isNotNull()).persist())
    if cached is not None:
        cached.append(docs)
    parsed = parse_atom_feeds(docs, feed_col="feed_url", xml_col="xml")
    ent = (parsed
           .where(F.length("link") > 0)
           .where(is_http_url(F.col("link")))
           .withColumn("host", host_of(F.col("link")))
           .where(F.col("host").isNotNull()))
    allow_re = combined_allow_pattern(cfg.allowed_domains)
    excl_re = combined_exclude_pattern(cfg.exclude_patterns)
    if allow_re is not None:
        ent = ent.where(F.col("host").rlike(allow_re))          # F3
    if excl_re is not None:
        ent = ent.where(~F.col("link").rlike(excl_re))          # F4
    entries = ent.select("feed_url", F.col("link").alias("url"), "host",
                         F.col("updated_date").alias("updated"))
    candidates = (entries
                  .groupBy("url", "host")
                  .agg(F.min("feed_url").alias("parent_url"))
                  .select(
                      "url", "host",
                      F.lit(0).alias("depth"),     # feed-listed: seed-like
                      "parent_url",
                      F.lit(round_ts_ms).alias("discovered_at_ms"),
                      F.lit(1).alias("priority"),
                      F.lit(0).alias("retry_count"),
                      F.lit(None).cast("long").alias("scheduled_for_ms")))
    return candidates, entries, new.select("feed_url")
