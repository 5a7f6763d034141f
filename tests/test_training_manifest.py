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


def test_training_manifest_reflects_revalidation_drift(spark, tmp_path):
    """refreshed=True builds the manifest from the revalidation-merged
    payload view: drifted URLs contribute their NEW image_ids, and the
    stale pre-drift ids drop out of the gather list."""
    synth = SynthWebConfig(n_hosts=6, base_pages_per_host=12)
    cfg = CrawlConfig(max_depth=2, host_budget_per_round=3, max_rounds=3,
                      allowed_domains=(r".*\.example\.com",),
                      url_seen_shards=2, bloom_bits_per_shard=1 << 13)
    c = Crawler(spark, cfg, synth, str(tmp_path))
    c.bootstrap(seed_urls(synth, 3))
    c.run()
    pred = lambda u: u.endswith(("1", "5"))  # noqa: E731
    r = c.revalidate(changed=pred)
    assert r.get("changed", 0) > 0
    stale = c.training_manifest(batch_size=1, n_shards=1)
    fresh = c.training_manifest(batch_size=1, n_shards=1, refreshed=True)
    stale_ids = {x["image_id"] for x in stale.collect()}
    fresh_ids = {x["image_id"] for x in fresh.collect()}
    assert stale_ids != fresh_ids, "drift must change the manifest"
    rp = c.refreshed_pages()
    refreshed_ids = {x["image_id"] for x in
                     rp.where("refreshed").select("image_id").collect()}
    pre_drift_ids = {x["image_id"] for x in
                     c.pages().join(rp.where("refreshed").select("url"),
                                    "url", "left_semi")
                     .select("image_id").collect()}
    assert fresh_ids & refreshed_ids, "new payloads enter the manifest"
    assert not (fresh_ids & (pre_drift_ids - refreshed_ids)), \
        "stale pre-drift payloads must not appear in the refreshed manifest"


def test_export_training_shards_roundtrip(spark, tmp_path):
    """Crawl → manifest → WebDataset tar shards: the archived members
    are exactly the manifest's survivors (payload + caption per image),
    payload bytes match the store, and the published parquet index
    describes the files the tar reader actually sees."""
    from distributed_web_crawler_spark.sources.wds import parse_wds

    c = Crawler(spark, CFG, SYNTH, str(tmp_path / "store"))
    c.bootstrap(seed_urls(SYNTH, 4))
    c.run()
    out = str(tmp_path / "wds")
    receipts = c.export_training_shards(out, n_tar_shards=2,
                                        batch_size=2, n_shards=2)
    manifest_ids = {r["image_id"] for r in
                    c.training_manifest(batch_size=2, n_shards=2)
                    .select("image_id").collect()}
    assert receipts is not None
    assert sum(r.n_members for r in receipts.collect()) \
        == 2 * len(manifest_ids)

    parsed = {r.member_name: (r.shard, r.data_offset, bytes(r.data))
              for r in parse_wds(spark, out).collect()}
    store = {r.image_id: r for r in
             c.pages().select("image_id", "bytes", "fmt", "caption")
             .dropDuplicates(["image_id"]).collect()}
    assert {n.rsplit(".", 1)[0] for n in parsed} == manifest_ids
    for iid in manifest_ids:
        row = store[iid]
        assert parsed[f"{iid}.{row.fmt}"][2] == bytes(row.bytes)
        assert parsed[f"{iid}.txt"][2].decode() == row.caption

    idx = {r.member_name: (r.shard, r.data_offset) for r in
           spark.read.parquet(f"{out}/index").collect()}
    assert {n: v[:2] for n, v in parsed.items()} == idx


def test_export_training_shards_empty_store_is_none(spark, tmp_path):
    c = Crawler(spark, CFG, SYNTH, str(tmp_path))
    assert c.export_training_shards(str(tmp_path / "wds")) is None
