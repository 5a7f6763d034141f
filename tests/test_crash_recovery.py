"""Kill-before-commit recovery: a round whose staged table directories
all exist but whose atomic marker rename never happened (the crash window
of tables/snapshot_store.commit_mark) must be invisible to a resuming
engine, which redoes the round IN PLACE over the orphaned staging and
lands on the exact uninterrupted-crawl state — the north-rule "killed job
resumes mid-crawl with identical ordering" claim, exercised at the
marker grain rather than the between-rounds grain test_resume_identical
covers.
"""

from __future__ import annotations

import os

from distributed_web_crawler_spark.config import CrawlConfig, SynthWebConfig
from distributed_web_crawler_spark.crawl.driver import Crawler
from distributed_web_crawler_spark.crawl.synthweb import seed_urls
from distributed_web_crawler_spark.golden import golden_crawl

SYNTH = SynthWebConfig(n_hosts=10, base_pages_per_host=20)
CFG = CrawlConfig(max_depth=3, host_budget_per_round=2, max_rounds=3,
                  allowed_domains=(r".*\.example\.com",),
                  url_seen_shards=4, bloom_bits_per_shard=1 << 14)
SEEDS = 3


def test_crash_before_commit_marker_redoes_round_identically(
        spark, tmp_path):
    store = str(tmp_path / "store")
    c1 = Crawler(spark, CFG, SYNTH, store)
    seeds = seed_urls(SYNTH, SEEDS)
    c1.bootstrap(seeds)
    c1.run()
    last = c1.store.last_round()

    # simulate dying INSIDE the final round's commit window: every staged
    # table dir for it is on disk, but no marker of any kind got renamed
    commits = os.path.join(store, "_commits")
    removed = [f for f in os.listdir(commits)
               if f.endswith(f"-{last}.json")]
    assert removed  # the round marker at minimum
    for f in removed:
        os.remove(os.path.join(commits, f))
    # marker round-k commits round k-1's execution (whose output frontier
    # is round k): the orphans are pages/round=k-1 and frontier/round=k
    assert os.path.isdir(
        os.path.join(store, "tables", "pages", f"round={last - 1}"))
    assert os.path.isdir(
        os.path.join(store, "tables", "frontier", f"round={last}"))

    # a fresh engine sees one round less and redoes the round in place
    c2 = Crawler(spark, CFG, SYNTH, store)
    assert c2.store.last_round() == last - 1
    stats = c2.run()
    assert stats["rounds"] == 1

    golden = golden_crawl(seeds, CFG, SYNTH)
    assert c2.visit_sequence() == golden.visits
    # no double-counted payload from the orphaned shards
    assert c2.pages().count() == len(golden.visits)
    assert c2.pages().select("url").distinct().count() == \
        len(golden.visits)
