"""One BSP crawl round — the flagship dataflow (SURVEY.md §3.1).

Reference lifecycle per batch (core/WebCrawler.java:99-133):
poll → shouldCrawl chain → fetch → hash → dedup probe → store →
extract+filter links → enqueue children → offset-commit barrier.

Spark restatement (all stages lazy until the round's actions):

    frontier(round=r)                          # snapshot scan, 1 directory
      → gates F1-F4/F7 (Catalyst when-chain)
      → robots F6 (broadcast join + exists)
      → politeness F5 (per-host window budget)
      → salted repartition O7 → fetch S6 (mapInPandas)
      → sha2 D2 → within-round winner + anti-join D1
      → store pages
      → explode E1/E2 + link filters F8 → URL-seen anti-join D4
      → next frontier (deferred ∪ children)
      → lineage aggregates A3

The round function is pure dataflow: state in, DataFrames out. Persistence
and the commit barrier live in crawl/driver.py.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import CrawlConfig
from ..operators.dedup import (
    content_hash_col,
    dedup_content,
    filter_unseen_urls,
)
from ..operators.extract import extract_children, fetch_pages
from ..operators.gates import apply_gates
from ..operators.politeness import apply_politeness, salted_repartition_for_fetch
from ..operators.robots import filter_robots, resolve_robots

N_LINEAGE_SHARDS = 32

FRONTIER_COLS = ["url", "host", "depth", "parent_url", "discovered_at_ms",
                 "priority", "retry_count", "scheduled_for_ms", "round"]


@dataclass
class RoundState:
    """Accumulated state visible to round r (all committed before r)."""
    robots: DataFrame | None       # (host, robots_disallow)
    seen_hashes: DataFrame | None  # (content_hash,)
    seen_urls: DataFrame | None    # (url,) — every URL ever enqueued
    blooms: DataFrame | None       # (shard, filter_bytes, n_items)


@dataclass
class RoundResult:
    stored: DataFrame         # new pages rows (round=r)
    next_frontier: DataFrame  # frontier rows (round=r+1)
    lineage: DataFrame        # (round, host_shard, metric, value)
    robots_new: DataFrame     # newly fetched robots rows
    cached: list              # persisted DataFrames to release post-commit


def _host_shard() -> F.Column:
    return F.pmod(F.xxhash64("host"), F.lit(N_LINEAGE_SHARDS)).cast("int")


def _metric(df: DataFrame, metric: str, round_no: int) -> DataFrame:
    return (df.groupBy(_host_shard().alias("host_shard"))
            .agg(F.count("*").alias("value"))
            .select(F.lit(round_no).alias("round"), "host_shard",
                    F.lit(metric).alias("metric"), "value"))


def run_round(spark: SparkSession, frontier: DataFrame, state: RoundState,
              cfg: CrawlConfig, fetcher, synth_cfg, round_no: int) -> RoundResult:
    ts = cfg.round_ts_ms(round_no)
    next_ts = cfg.round_ts_ms(round_no + 1)

    # -- decision chain (R1): gates → robots → politeness -------------------
    gated = apply_gates(frontier, cfg, ts)
    robots_full, robots_new = resolve_robots(
        spark, gated.where(F.col("decision") == "PASS"), state.robots, synth_cfg)
    decided = apply_politeness(filter_robots(gated, robots_full), cfg)
    decided = decided.persist()  # consumed by 4 branches below

    selected = decided.where(F.col("decision") == "PASS")
    deferred = (
        decided.where(F.col("decision") == "DEFER_POLITENESS")
        .withColumn("retry_count", F.col("retry_count") + 1)      # R2
        .withColumn("scheduled_for_ms", F.lit(next_ts))
        .unionByName(decided.where(F.col("decision") == "DEFER_SCHED"))
        .select(*[c for c in FRONTIER_COLS if c != "round"])
        .withColumn("round", F.lit(round_no + 1))
    )

    # -- fetch + hash + dedup + store ---------------------------------------
    n_fetch_parts = cfg.fetch_partitions or spark.sparkContext.defaultParallelism
    fetched = fetch_pages(
        salted_repartition_for_fetch(selected, cfg, n_fetch_parts), fetcher)
    fetched = fetched.persist()
    fetched_ok = (
        fetched.where(F.col("fetched"))
        .withColumn("content_hash", content_hash_col())            # D2
        .withColumn("fetch_time_ms", F.lit(ts))
        .withColumn("round", F.lit(round_no))
    )
    stored = dedup_content(fetched_ok, state.seen_hashes).persist()  # D1

    # -- children: explode + filters + URL-seen -----------------------------
    children = extract_children(stored, cfg, ts)                   # E1/E2/F8
    new_urls = filter_unseen_urls(children, state.seen_urls,
                                  state.blooms, cfg)               # D4
    next_frontier = deferred.unionByName(
        new_urls.withColumn("round", F.lit(round_no + 1))
        .select(*FRONTIER_COLS))

    # -- lineage A3 ----------------------------------------------------------
    lineage = (
        _metric(frontier, "polled", round_no)
        .unionByName(_metric(decided.where(F.col("decision").startswith("REJECT")),
                             "rejected", round_no))
        .unionByName(_metric(decided.where(F.col("decision").startswith("DEFER")),
                             "deferred", round_no))
        .unionByName(_metric(fetched.where(~F.col("fetched")),
                             "fetch_failed", round_no))
        .unionByName(_metric(fetched.where(F.col("fetched")),
                             "fetched", round_no))
        .unionByName(_metric(stored, "stored", round_no))
        .unionByName(_metric(new_urls, "discovered", round_no))
    )

    return RoundResult(stored=stored, next_frontier=next_frontier,
                       lineage=lineage, robots_new=robots_new,
                       cached=[decided, fetched, stored])
