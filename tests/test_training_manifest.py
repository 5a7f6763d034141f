"""Crawl→training handoff (Crawler.training_manifest): the image
training manifest built from the engine's OWN committed store — the
BASELINE.json loop (seed list → politeness-budgeted fetch → dedup'd
image+caption store → dataloader gather list) closed in one surface.
Stage values are oracle-checked via image_training_mix; these pin the
engine wiring."""

from collections import Counter

from distributed_web_crawler_spark.config import (
    CrawlConfig,
    SynthWebConfig,
)
from distributed_web_crawler_spark.crawl.driver import Crawler
from distributed_web_crawler_spark.crawl.synthweb import seed_urls

SYNTH = SynthWebConfig(n_hosts=10, base_pages_per_host=20)
CFG = CrawlConfig(max_depth=3, host_budget_per_round=4, max_rounds=3,
                  allowed_domains=(r".*\.example\.com",),
                  url_seen_shards=4, bloom_bits_per_shard=1 << 14)


def test_training_manifest_from_committed_store(spark, tmp_path):
    c = Crawler(spark, CFG, SYNTH, str(tmp_path))
    c.bootstrap(seed_urls(SYNTH, 4))
    c.run()
    m = c.training_manifest(batch_size=2, n_shards=2)
    rows = m.collect()
    assert rows, "a real crawl must yield a non-empty manifest"
    ids = [r["image_id"] for r in rows]
    assert len(ids) == len(set(ids)), "one manifest row per image"
    stored = {r["image_id"] for r in
              c.pages().select("image_id").collect()}
    assert set(ids) <= stored, "manifest ids come from the store"
    assert len(set(ids)) < len(stored), \
        "curation/dedup must prune something on this corpus"
    # drop_last layout: every (bucket, shard) count is a batch multiple
    per = Counter((r["bucket"], r["shard"]) for r in rows)
    assert all(n % 2 == 0 for n in per.values())
    # refreshed view with no revalidation epochs = same manifest
    r2 = sorted(map(tuple, c.training_manifest(
        batch_size=2, n_shards=2, refreshed=True).collect()))
    assert r2 == sorted(map(tuple, rows))


def test_training_manifest_empty_store_is_none(spark, tmp_path):
    c = Crawler(spark, CFG, SYNTH, str(tmp_path))
    assert c.training_manifest() is None
