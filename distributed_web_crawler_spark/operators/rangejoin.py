"""Bucketized range join: points × half-open intervals as a HASH join.

A naive `p.value BETWEEN r.lo AND r.hi` has no equi-key, so Spark plans a
BroadcastNestedLoopJoin — O(points × ranges) comparisons, the classic
interval-join scale cliff (IP→geo lookups, latency-SLA brackets,
size-class tagging). The standard rewrite: explode each interval into the
fixed-width buckets it overlaps, bucket the points once, hash-join on the
bucket, re-check the exact predicate as the join residual. Cost becomes
O(points + ranges × span/width) rows through a shuffle/broadcast hash
join, and the rewrite is LOSSLESS — the residual keeps semantics
identical to the naive join (the oracle states the naive form).

Skew notes for 100 TB: a pathologically wide interval fans out into
span/width bucket rows (bounded, linear in its width); a hot bucket is an
ordinary hash-join skew cell that AQE's skew-join splitting handles. Pick
bucket_width near the median interval width so most intervals land in
1-2 buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_bucket_join(points: DataFrame, ranges: DataFrame,
                      value_col: str = "value", lo_col: str = "lo",
                      hi_col: str = "hi",
                      bucket_width: int = 16) -> DataFrame:
    """Inner-join every point row to every interval row with
    lo <= value < hi (half-open). Returns points' columns + ranges'
    columns. Intervals may overlap — a point matches each containing
    interval."""
    w = F.lit(bucket_width)
    # floor(hi/w) may add one unmatchable bucket when hi sits exactly on
    # a boundary — harmless: the residual predicate rejects it
    exploded = ranges.withColumn(
        "_bucket",
        F.explode(F.sequence(
            F.floor(F.col(lo_col) / w).cast("long"),
            F.floor(F.col(hi_col) / w).cast("long"))))
    bucketed = points.withColumn(
        "_bucket", F.floor(F.col(value_col) / w).cast("long"))
    out = (bucketed.join(
        exploded,
        (bucketed["_bucket"] == exploded["_bucket"])
        & (F.col(value_col) >= F.col(lo_col))
        & (F.col(value_col) < F.col(hi_col))))
    return out.select(*[points[c] for c in points.columns],
                      *[ranges[c] for c in ranges.columns])
