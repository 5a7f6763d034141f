"""Table-maintenance planners: small-file compaction + snapshot expiry.

The crawl engine appends a round-partitioned snapshot per BSP round
(tables/snapshot_store.py — the reference's commit barrier,
queue/KafkaUrlQueue.java:105-112, re-expressed as table snapshots). Any
long-running append-only table accretes two maintenance debts that real
Iceberg deployments service with RewriteDataFiles (binPack) and
ExpireSnapshots; the container has no Iceberg jars (SURVEY §6), so these
planners produce the same *plan* relationally — the RoundCatalog seam
(tables/catalog.py) is where a real Iceberg action would execute it.

Both planners are pure DataFrame ops over the *manifest* grain (one row
per data file / per snapshot), not the data grain: at 100 TB the manifest
is ~10^6-10^7 rows, so a per-partition window over it is trivially cheap
compared to touching the data even once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compaction_plan(files: DataFrame, target_bytes: int,
                    small_ratio: float = 0.75) -> DataFrame:
    """Small-file compaction plan: pack each partition's small files into
    ~target_bytes output groups.

    Candidates are files below ``small_ratio * target_bytes`` (Iceberg's
    binPack min-file-size default is 75% of the target; larger files are
    already compact and must not be rewritten). Within a partition,
    candidates are ordered by (size desc, file_id) and grouped by a
    running cumulative-sum next-fit: group = floor(bytes_before /
    target). True first-fit-decreasing is inherently sequential; the
    sorted next-fit is the one-window-pass variant — ONE shuffle on the
    partition key, no iteration, no driver loop — and over-fills a group
    by at most one file.

    Returns one row per candidate file: (partition_key, file_id,
    size_bytes, group_id) — the executable rewrite plan. Integer sizes ⇒
    both engines bin identically (no float cumsum drift).
    """
    small = files.where(
        F.col("size_bytes") < int(small_ratio * target_bytes))
    win = (Window.partitionBy("partition_key")
           .orderBy(F.desc("size_bytes"), "file_id")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    before = F.sum("size_bytes").over(win) - F.col("size_bytes")
    return small.select(
        "partition_key", "file_id", "size_bytes",
        F.floor(before / F.lit(target_bytes)).alias("group_id"))


def snapshot_expiry(snapshots: DataFrame, keep_last: int,
                    keep_every: int) -> DataFrame:
    """Snapshot-retention plan: keep the ``keep_last`` most recent
    snapshots plus every ``keep_every``-th (archive points); mark the
    rest 'expire' with their reclaimable bytes.

    The recency cutoff is a 1-row max aggregate broadcast back (no global
    window/sort over the manifest — the same no-global-window contract as
    the IVF centroid pick), so the plan is one partial agg + one map-side
    projection. Returns (snapshot_id, action, bytes).
    """
    cutoff = snapshots.agg(
        (F.max("snapshot_id") - keep_last).alias("_cut"))
    keep = (F.col("snapshot_id") > F.col("_cut")) | \
           (F.col("snapshot_id") % keep_every == 0)
    return (snapshots.join(F.broadcast(cutoff))
            .select("snapshot_id",
                    F.when(keep, F.lit("keep")).otherwise("expire")
                    .alias("action"),
                    "bytes"))
