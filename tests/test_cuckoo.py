"""Cuckoo-filter URL-seen backend: no false negatives (incl. through the
eviction path at high load), FP bounded, DELETE works, the sharded engine
path equals the exact anti-join, and a full crawl on the cuckoo backend
keeps golden parity."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from distributed_web_crawler_spark.config import CrawlConfig
from distributed_web_crawler_spark.functions import cuckoo as C
from distributed_web_crawler_spark.operators.dedup import (
    build_bloom_shards,
    filter_unseen_urls,
)

NB = 1 << 10  # 1024 buckets x 4 slots


def _hashes(n, seed):
    rng = np.random.default_rng(seed)
    return (rng.integers(-(2 ** 62), 2 ** 62, n, dtype=np.int64),
            rng.integers(-(2 ** 62), 2 ** 62, n, dtype=np.int64))


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2 ** 31), st.integers(1, 300))
def test_no_false_negatives(seed, n):
    h1, h2 = _hashes(n, seed)
    filt = C.insert(C.empty_filter(NB), h1, h2, NB)
    assert C.probe(filt, h1, h2, NB).all()


def test_no_false_negatives_at_high_load_exercises_eviction():
    # 3600 keys into 4096 slots (88% load): the wave pass saturates and
    # the kick loop must relocate fingerprints without losing any
    h1, h2 = _hashes(3600, 7)
    filt = C.insert(C.empty_filter(NB), h1, h2, NB)
    assert C.probe(filt, h1, h2, NB).all()


def test_fp_rate_bounded():
    h1, h2 = _hashes(2000, 1)  # ~49% load
    filt = C.insert(C.empty_filter(NB), h1, h2, NB)
    p1, p2 = _hashes(20000, 2)
    fp = C.probe(filt, p1, p2, NB).mean()
    # 8 candidate slots x 16-bit fingerprints, half occupied → ~0.006%
    assert fp < 0.01


def test_delete_removes_and_keeps_others():
    h1, h2 = _hashes(400, 5)
    filt = C.insert(C.empty_filter(NB), h1, h2, NB)
    filt = C.delete(filt, h1[:200], h2[:200], NB)
    assert C.probe(filt, h1[200:], h2[200:], NB).all()  # kept: no FN
    # deleted: only fingerprint-collision residue may remain
    assert C.probe(filt, h1[:200], h2[:200], NB).mean() < 0.05


def test_insert_past_design_load_raises():
    h1, h2 = _hashes(200, 9)
    with pytest.raises(RuntimeError, match="design load"):
        C.insert(C.empty_filter(16), h1, h2, 16)  # 64 slots, 200 keys


def test_sharded_cuckoo_matches_exact_anti_join(spark):
    cfg = CrawlConfig(url_seen_shards=4, url_seen_backend="cuckoo",
                      cuckoo_buckets_per_shard=1 << 10)
    seen = spark.createDataFrame(
        [(f"http://h{i % 7}.example.com/p/{i}",) for i in range(500)],
        "url string")
    cands = spark.createDataFrame(
        [(f"http://h{i % 7}.example.com/p/{i}",) for i in range(400, 900)],
        "url string")
    filters = build_bloom_shards(seen, cfg)
    assert filters.count() == 4
    got = {r["url"] for r in
           filter_unseen_urls(cands, seen, filters, cfg).collect()}
    want = {r["url"] for r in
            cands.join(seen, "url", "left_anti").collect()}
    assert got == want


def test_incremental_extend_cuckoo(spark):
    cfg = CrawlConfig(url_seen_shards=4, url_seen_backend="cuckoo",
                      cuckoo_buckets_per_shard=1 << 10)
    u1 = spark.createDataFrame([(f"http://a.com/{i}",) for i in range(100)],
                               "url string")
    u2 = spark.createDataFrame([(f"http://b.com/{i}",) for i in range(100)],
                               "url string")
    f1 = build_bloom_shards(u1, cfg)
    f12 = build_bloom_shards(u2, cfg, existing=f1)
    both = u1.unionByName(u2)
    assert filter_unseen_urls(both, both, f12, cfg).count() == 0
    n = {r["shard"]: r["n_items"] for r in f12.collect()}
    assert sum(n.values()) == 200


def test_crawl_golden_parity_on_cuckoo_backend(spark, tmp_path):
    from distributed_web_crawler_spark.config import SynthWebConfig
    from distributed_web_crawler_spark.crawl.driver import Crawler
    from distributed_web_crawler_spark.crawl.synthweb import seed_urls
    from distributed_web_crawler_spark.golden import golden_crawl

    synth = SynthWebConfig(n_hosts=6, base_pages_per_host=12)
    cfg = CrawlConfig(max_depth=3, host_budget_per_round=2, max_rounds=4,
                      allowed_domains=(r".*\.example\.com",),
                      url_seen_shards=4, url_seen_backend="cuckoo",
                      cuckoo_buckets_per_shard=1 << 12)
    seeds = seed_urls(synth, 3)
    c = Crawler(spark, cfg, synth, str(tmp_path / "store"))
    c.bootstrap(seeds)
    c.run()
    assert c.visit_sequence() == golden_crawl(seeds, cfg, synth).visits


def test_evict_makes_urls_fetchable_again(spark):
    from distributed_web_crawler_spark.operators.dedup import (
        evict_filter_shards)
    cfg = CrawlConfig(url_seen_shards=4, url_seen_backend="cuckoo",
                      cuckoo_buckets_per_shard=1 << 10)
    urls = [(f"http://h{i % 5}.example.com/p/{i}",) for i in range(300)]
    seen = spark.createDataFrame(urls, "url string")
    filters = build_bloom_shards(seen, cfg)
    retire = spark.createDataFrame(urls[:120], "url string")
    keep_seen = spark.createDataFrame(urls[120:], "url string")
    # evict from the filter AND from the exact table (the caller contract)
    filters2 = evict_filter_shards(filters, retire, cfg)
    got = {r["url"] for r in
           filter_unseen_urls(seen, keep_seen, filters2, cfg).collect()}
    assert got == {u for (u,) in urls[:120]}  # retired URLs fetchable again
    n = {r["shard"]: r["n_items"] for r in filters2.collect()}
    assert sum(n.values()) == 180


def test_evict_on_bloom_backend_raises(spark):
    from distributed_web_crawler_spark.operators.dedup import (
        evict_filter_shards)
    cfg = CrawlConfig(url_seen_shards=4)
    seen = spark.createDataFrame([("http://a.com/1",)], "url string")
    filters = build_bloom_shards(seen, cfg)
    with pytest.raises(ValueError, match="cuckoo"):
        evict_filter_shards(filters, seen, cfg)
