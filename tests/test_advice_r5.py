"""Round-5 advice fixes pinned:

1. CrawlConfig rejects robots_ua_groups without the rfc9309 matching
   tier (UA-group patterns carry '*'/'$' syntax the substring tier
   treats as literals — silently wrong, now loudly wrong).
2. training_mix_report forwards quality_bar (and the other gate params)
   into training_mix_stages AND its own reject predicate, so the stage
   counts and the reject breakdown can never disagree.
3. frontier_from_json parses Jackson ISO_INSTANT with VARIABLE fraction
   precision (none / 3 / 6 / 9 digits), not only the bridge's own
   3-digit form — real reference-produced Kafka records use
   Instant.now() nanos and whole-second instants.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_web_crawler_spark.config import CrawlConfig
from distributed_web_crawler_spark.pipeline import text as ptext
from distributed_web_crawler_spark.sources.kafka_bridge import (
    frontier_from_json,
)


def test_ua_groups_requires_rfc9309():
    with pytest.raises(ValueError, match="rfc9309"):
        CrawlConfig(robots_ua_groups=True)
    with pytest.raises(ValueError, match="rfc9309"):
        CrawlConfig(robots_ua_groups=True, robots_matching="substring")
    # the documented pairing constructs fine
    CrawlConfig(robots_ua_groups=True, robots_matching="rfc9309")


def test_bad_robots_matching_rejected():
    with pytest.raises(ValueError, match="robots_matching"):
        CrawlConfig(robots_matching="regex")


@pytest.fixture(scope="module")
def mix_docs(spark):
    # texts spanning both sides of quality bars 0.5 and 0.8, two langs
    rows = [
        (i, "src%d" % (i % 2),
         ("the quick brown fox jumps over the lazy dog and then some "
          "more plain english words follow here today. " * (1 + i % 4))
         if i % 5 != 4 else "zzz qqq xxx 123 !!! ###")
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


@pytest.mark.parametrize("bar", [0.5, 0.8])
def test_training_mix_report_bar_consistency(mix_docs, bar):
    rep = {(r["kind"], r["key"]): r["rows"]
           for r in ptext.training_mix_report(
               mix_docs, quality_bar=bar).collect()}
    # the gate partitions the raw corpus: gated + all rejects == raw
    rejects = sum(v for (k, _), v in rep.items() if k == "reject")
    assert rep[("stage", "gated")] + rejects == rep[("stage", "raw")]
    # and the stage counts really track the bar independently computed
    stages = ptext.training_mix_stages(mix_docs, quality_bar=bar)
    assert rep[("stage", "gated")] == stages["gated"].count()


def test_report_bars_actually_differ(mix_docs):
    g = {b: {(r["kind"], r["key"]): r["rows"]
             for r in ptext.training_mix_report(
                 mix_docs, quality_bar=b).collect()}
         for b in (0.0, 0.99)}
    assert g[0.0][("stage", "gated")] > g[0.99][("stage", "gated")], \
        "quality_bar must reach the gate (hardcoded bar would tie these)"


def test_instant_parse_variable_fractions(spark):
    cases = [
        # (json fragment timestamp, expected ms)
        ("2023-11-14T22:13:20Z", 1_700_000_000_000),
        ("2023-11-14T22:13:20.1Z", 1_700_000_000_100),
        ("2023-11-14T22:13:20.123Z", 1_700_000_000_123),
        ("2023-11-14T22:13:20.123456Z", 1_700_000_000_123),
        ("2023-11-14T22:13:20.123456789Z", 1_700_000_000_123),
    ]
    values = spark.createDataFrame(
        [('{"url":"http://h.example.com/p/%d","depth":1,'
          '"discoveredAt":"%s","priority":1,"retryCount":0,'
          '"scheduledFor":"%s"}' % (i, ts, ts),)
         for i, (ts, _) in enumerate(cases)],
        "value string")
    out = frontier_from_json(values).orderBy("url").collect()
    for (ts, want), row in zip(cases, out):
        assert row["discovered_at_ms"] == want, ts
        assert row["scheduled_for_ms"] == want, ts
        assert row["host"] == "h.example.com"
