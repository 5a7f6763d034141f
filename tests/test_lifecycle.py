"""Lifecycle control (reference controller/CrawlerController.java:30-80):
graceful stop at the round barrier, cross-process status, one-shot stop
semantics, and the prefix/resume invariant — a stopped store must be
byte-equivalent to an uninterrupted run's prefix and resume seamlessly."""

import json
import os
import subprocess
import sys
import threading
import time

import pytest

from distributed_web_crawler_spark.config import CrawlConfig, SynthWebConfig
from distributed_web_crawler_spark.crawl.driver import (
    Crawler,
    clear_stop,
    crawl_status,
    request_stop,
    stop_requested,
)
from distributed_web_crawler_spark.crawl.synthweb import seed_urls

SYNTH = SynthWebConfig(n_hosts=10, base_pages_per_host=20)
CFG = CrawlConfig(max_depth=4, host_budget_per_round=2, max_rounds=8,
                  allowed_domains=(r".*\.example\.com",),
                  url_seen_shards=4, bloom_bits_per_shard=1 << 14)
SEEDS = seed_urls(SYNTH, 3)


def test_stop_file_roundtrip(tmp_path):
    root = str(tmp_path)
    assert not stop_requested(root)
    path = request_stop(root)
    assert os.path.exists(path) and stop_requested(root)
    assert clear_stop(root)
    assert not stop_requested(root)
    assert not clear_stop(root)  # idempotent


def test_status_on_empty_store(tmp_path):
    st = crawl_status(str(tmp_path))
    assert st["last_committed_marker"] is None
    assert st["rounds_processed"] == 0
    assert st["totals"] == {} and st["heartbeat"] is None
    assert st["stop_requested"] is False


def test_graceful_stop_prefix_resume_and_live_status(spark, tmp_path):
    full_root = str(tmp_path / "full")
    stop_root = str(tmp_path / "stopped")

    # uninterrupted reference run
    full = Crawler(spark, CFG, SYNTH, full_root)
    full.bootstrap(SEEDS)
    full_stats = full.run()
    assert full_stats["stopped"] is False
    assert full_stats["rounds"] >= 5  # long enough to stop mid-way

    # same crawl, with another "process" (thread touching only the
    # filesystem, like tools/run_crawl.py --stop) requesting a stop once
    # two rounds have committed
    c = Crawler(spark, CFG, SYNTH, stop_root)
    c.bootstrap(SEEDS)
    live: dict = {}

    def watcher():
        while crawl_status(stop_root)["rounds_processed"] < 2:
            time.sleep(0.1)
        live["status_mid_run"] = crawl_status(stop_root)
        request_stop(stop_root)

    t = threading.Thread(target=watcher)
    t.start()
    stats = c.run()
    t.join()

    assert stats["stopped"] is True
    assert stats["rounds"] < full_stats["rounds"]
    # live status (taken while the loop ran) saw the heartbeat + counts
    mid = live["status_mid_run"]
    assert mid["heartbeat"] is not None and mid["heartbeat"]["pid"] > 0
    assert mid["totals"].get("fetched", 0) > 0
    # stop was consumed (one-shot) and status reflects the stop point
    assert not stop_requested(stop_root)
    st = c.status()
    assert st["rounds_processed"] == stats["rounds"]

    # prefix invariant: the stopped store's visits equal the
    # uninterrupted run's visits restricted to its committed rounds
    k = stats["rounds"]
    want_prefix = [v for v in full.visit_sequence() if v[0] < k]
    assert c.visit_sequence() == want_prefix

    # resume completes the crawl identically to the uninterrupted run
    resumed = c.run()
    assert resumed["stopped"] is False
    assert c.visit_sequence() == full.visit_sequence()
    assert c.url_seen_set() == full.url_seen_set()


def test_run_crawl_cli_status_and_stop(tmp_path):
    """--status / --stop are Spark-free and run in well under a second."""
    root = str(tmp_path)
    env = dict(os.environ, PYTHONPATH="/root/repo")
    out = subprocess.run(
        [sys.executable, "/root/repo/tools/run_crawl.py",
         "--store", root, "--status"],
        capture_output=True, text=True, env=env, timeout=60)
    assert out.returncode == 0, out.stderr
    st = json.loads(out.stdout.strip().splitlines()[-1])
    assert st["last_committed_marker"] is None

    out = subprocess.run(
        [sys.executable, "/root/repo/tools/run_crawl.py",
         "--store", root, "--stop"],
        capture_output=True, text=True, env=env, timeout=60)
    assert out.returncode == 0, out.stderr
    st = json.loads(out.stdout.strip().splitlines()[-1])
    assert st["stop_requested"] is True
    assert stop_requested(root)
