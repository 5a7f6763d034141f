"""The north_rule submission shape, end-to-end: package the engine as a
zip, run a crawl via ``spark-submit --py-files`` (a separate JVM + Python
driver from the test session), resume it with a second spark-submit, and
check the committed store against the golden model from THIS process —
proving the artifact users submit is the same engine the tests verify.
"""

from __future__ import annotations

import json
import os
import subprocess

from distributed_web_crawler_spark.config import CrawlConfig, SynthWebConfig
from distributed_web_crawler_spark.crawl.driver import Crawler
from distributed_web_crawler_spark.crawl.synthweb import seed_urls
from distributed_web_crawler_spark.golden import golden_crawl

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "tools", "spark_submit_crawl.sh")

ARGS = ["--hosts", "8", "--pages-per-host", "20", "--budget", "3",
        "--seeds", "4", "--max-depth", "2", "--shards", "4"]


def _submit(store: str, rounds: int) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS="4")
    env.pop("PYTHONPATH", None)  # imports must resolve from --py-files
    out = subprocess.run(
        [SCRIPT, "--store", store, "--rounds", str(rounds), *ARGS],
        capture_output=True, text=True, timeout=240, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    stats_lines = [l for l in out.stdout.splitlines()
                   if l.startswith("{") and "fetched" in l]
    assert stats_lines, out.stdout[-2000:]
    return json.loads(stats_lines[-1])


def test_spark_submit_crawl_resume_and_golden_parity(spark, tmp_path):
    store = str(tmp_path / "store")

    first = _submit(store, rounds=2)
    assert first["rounds"] == 2 and first["fetched"] > 0

    # same command, higher round budget: a fresh driver JVM resumes from
    # the committed snapshots and crawls ONLY the remaining rounds
    second = _submit(store, rounds=4)
    assert second["rounds"] == 2  # rounds 2..3, not a restart

    # the committed store must equal the golden model for the SAME
    # config, read back from this (third) process
    synth = SynthWebConfig(n_hosts=8, base_pages_per_host=20)
    cfg = CrawlConfig(max_depth=2, host_budget_per_round=3, max_rounds=4,
                      url_seen_shards=4)
    crawler = Crawler(spark, cfg, synth, store)
    golden = golden_crawl(seed_urls(synth, 4), cfg, synth)
    assert crawler.visit_sequence() == golden.visits
    # fetched counts include failed fetches; stored visits can't exceed it
    assert first["fetched"] + second["fetched"] >= len(golden.visits)
