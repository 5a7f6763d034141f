"""spark-submit entry point: run (or resume) a BSP crawl against a store dir.

Usage (see tools/spark_submit_crawl.sh for the --py-files packaging):

    spark-submit --master local[8] --py-files dist/dwcs.zip \
        tools/run_crawl.py --store /tmp/crawl_store --rounds 4 \
        --hosts 150 --pages-per-host 900 --budget 40 --seeds 64

All engine state lives in the store dir; re-running the same command in a
fresh process resumes from the last committed round snapshot (the
reference's offset-commit barrier, queue/KafkaUrlQueue.java:105-112,
re-expressed as table snapshots). Prints one JSON stats line.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--store", required=True)
    ap.add_argument("--rounds", type=int, default=4)
    ap.add_argument("--hosts", type=int, default=150)
    ap.add_argument("--pages-per-host", type=int, default=900)
    ap.add_argument("--budget", type=int, default=40)
    ap.add_argument("--seeds", type=int, default=64)
    ap.add_argument("--max-depth", type=int, default=8)
    ap.add_argument("--shards", type=int, default=32)
    ap.add_argument("--inject", default=None,
                    help="comma-separated URLs to enqueue mid-crawl "
                         "(the reference's POST /api/crawler/urls): "
                         "staged for the next round, deduped against "
                         "the URL-seen state, then run() proceeds")
    ap.add_argument("--revalidate", action="store_true",
                    help="after the crawl, run one conditional-refetch "
                         "epoch over everything stored (Crawler."
                         "revalidate); --drift-suffixes picks which "
                         "URLs the synthetic web mutates first")
    ap.add_argument("--drift-suffixes", default=None,
                    help="comma-separated URL suffixes the synthetic "
                         "web serves at version 1 during --revalidate "
                         "(e.g. '1,5'); empty = unchanged web")
    ap.add_argument("--training-manifest", default=None, metavar="DIR",
                    help="after the crawl, write the image training "
                         "manifest (Crawler.training_manifest: curation "
                         "-> dedup -> variant collapse -> aspect-bucket "
                         "batches over the store) as parquet to DIR")
    ap.add_argument("--batch-size", type=int, default=4,
                    help="--training-manifest batch size (drop_last)")
    ap.add_argument("--priority-mode", default="constant",
                    choices=("constant", "inlink"),
                    help="frontier ordering: reference-parity constant "
                         "priority, or backlink-count (Cho et al. WWW'98)")
    ap.add_argument("--frontier-cap", type=int, default=0,
                    help="frontier eviction: keep at most N rows per "
                         "round under (priority, host, url); 0 = off")
    ap.add_argument("--robots-matching", default="substring",
                    choices=("substring", "rfc9309"),
                    help="robots semantics: reference-parity substring "
                         "containment, or RFC 9309 wildcard matching "
                         "(longest match, allow wins ties)")
    ap.add_argument("--robots-ua-groups", action="store_true",
                    help="RFC 9309 UA-specific group selection: the "
                         "robots fetch honors a group published for "
                         "--robots-user-agent (exact token beats *); "
                         "pair with --robots-matching rfc9309")
    ap.add_argument("--robots-user-agent", default="sparkcrawler",
                    help="product token for --robots-ua-groups")
    ap.add_argument("--robots-ua-every", type=int, default=0,
                    help="synthetic web: every k-th rule-bearing host "
                         "publishes a UA-specific robots group (used "
                         "with --robots-ua-groups; 0 = none)")
    ap.add_argument("--frontier-cap-mode", default="canonical",
                    choices=("canonical", "hostfair"),
                    help="eviction order under --frontier-cap: canonical "
                         "(priority, host, url) smallest, or hostfair "
                         "waterfilled per-host quota (no host starved "
                         "by cap order)")
    ap.add_argument("--robots-ttl", type=int, default=0,
                    help="robots cache TTL in rounds (0 = cache forever)")
    ap.add_argument("--sitemap-discovery", action="store_true",
                    help="fetch+parse robots-declared sitemaps and enqueue "
                         "their entries as depth-0 frontier candidates")
    ap.add_argument("--sitemap-every", type=int, default=4,
                    help="synthetic web: every k-th host publishes a "
                         "sitemap (used with --sitemap-discovery)")
    ap.add_argument("--feed-discovery", action="store_true",
                    help="fetch+parse page-autodiscovered Atom feeds and "
                         "enqueue their entries as depth-0 candidates")
    ap.add_argument("--feed-every", type=int, default=4,
                    help="synthetic web: every k-th host publishes "
                         "section feeds (used with --feed-discovery)")
    ap.add_argument("--feed-ttl", type=int, default=0,
                    help="feed re-poll TTL in rounds (0 = fetch once "
                         "per crawl)")
    ap.add_argument("--sitemap-index-every", type=int, default=0,
                    help="synthetic web: every k-th sitemap host serves "
                         "a two-level /sitemap_index.xml layout instead "
                         "(0 = all flat)")
    ap.add_argument("--expire-state", action="store_true",
                    help="after the crawl, delete compaction-absorbed "
                         "state dirs (Crawler.expire_state)")
    ap.add_argument("--status", action="store_true",
                    help="print the store's live status JSON (commit "
                         "markers + heartbeat; the reference's GET "
                         "/status) and exit — no SparkSession, safe "
                         "while another process crawls")
    ap.add_argument("--stop", action="store_true",
                    help="request a graceful stop of the crawl running "
                         "on this store (the reference's POST stop): the "
                         "loop finishes its in-flight round, commits it, "
                         "and exits; prints status JSON and exits")
    ap.add_argument("--export-wds", default=None, metavar="DIR",
                    help="after the crawl, export the training-manifest "
                         "survivors as WebDataset tar shards + member "
                         "index (Crawler.export_training_shards) to DIR")
    ap.add_argument("--wds-shards", type=int, default=4,
                    help="--export-wds tar shard count")
    args = ap.parse_args()

    if args.status or args.stop:
        # Spark-free control path: operates purely on the store's
        # filesystem (markers / control files), from any process
        from distributed_web_crawler_spark.crawl.driver import (
            crawl_status,
            request_stop,
        )

        if args.stop:
            request_stop(args.store)
        print(json.dumps(crawl_status(args.store)))
        return

    # imports resolve from --py-files (or PYTHONPATH when run directly)
    from pyspark.sql import SparkSession

    from distributed_web_crawler_spark.config import (
        CrawlConfig,
        SynthWebConfig,
    )
    from distributed_web_crawler_spark.crawl.driver import Crawler
    from distributed_web_crawler_spark.crawl.synthweb import seed_urls

    spark = SparkSession.builder.appName("dwcs_crawl").getOrCreate()
    synth = SynthWebConfig(n_hosts=args.hosts,
                           base_pages_per_host=args.pages_per_host,
                           robots_ua_every=args.robots_ua_every,
                           robots_ua_token=args.robots_user_agent,
                           sitemap_every=(args.sitemap_every
                                          if args.sitemap_discovery else 0),
                           feed_every=(args.feed_every
                                       if args.feed_discovery else 0),
                           sitemap_index_every=(args.sitemap_index_every
                                                if args.sitemap_discovery
                                                else 0))
    cfg = CrawlConfig(max_depth=args.max_depth,
                      host_budget_per_round=args.budget,
                      max_rounds=args.rounds,
                      url_seen_shards=args.shards,
                      priority_mode=args.priority_mode,
                      frontier_cap=args.frontier_cap,
                      frontier_cap_mode=args.frontier_cap_mode,
                      robots_ttl_rounds=args.robots_ttl,
                      robots_matching=args.robots_matching,
                      robots_ua_groups=args.robots_ua_groups,
                      robots_user_agent=args.robots_user_agent,
                      sitemap_discovery=args.sitemap_discovery,
                      feed_discovery=args.feed_discovery,
                      feed_ttl_rounds=args.feed_ttl)
    crawler = Crawler(spark, cfg, synth, args.store)
    if crawler.store.last_round() is None:
        crawler.bootstrap(seed_urls(synth, args.seeds))
    if args.inject:
        crawler.inject([u for u in args.inject.split(",") if u])
    stats = crawler.run(args.rounds)
    stats.pop("per_round", None)
    if args.revalidate:
        sfx = tuple(s for s in (args.drift_suffixes or "").split(",") if s)
        changed = (lambda u, _s=sfx: u.endswith(_s)) if sfx else None
        stats["revalidation"] = crawler.revalidate(changed=changed)
    if args.training_manifest:
        manifest = crawler.training_manifest(
            batch_size=args.batch_size, refreshed=args.revalidate)
        if manifest is not None:
            manifest.write.mode("overwrite").parquet(args.training_manifest)
            out = spark.read.parquet(args.training_manifest)
            stats["training_manifest"] = {
                "rows": out.count(),
                "batches": out.select("bucket", "shard", "batch_id")
                              .distinct().count(),
                "path": args.training_manifest,
            }
    if args.export_wds:
        receipts = crawler.export_training_shards(
            args.export_wds, n_tar_shards=args.wds_shards,
            batch_size=args.batch_size, refreshed=args.revalidate)
        if receipts is not None:
            rows = receipts.collect()
            stats["wds_export"] = {
                "shards": len(rows),
                "members": sum(r.n_members for r in rows),
                "tar_bytes": sum(r.tar_bytes for r in rows),
                "path": args.export_wds,
            }
    if args.expire_state:
        stats["expired"] = crawler.expire_state()
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
