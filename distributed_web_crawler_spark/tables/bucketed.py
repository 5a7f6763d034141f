"""Bucketed-table writes: co-located joins with ZERO exchange.

The seen-state compaction (crawl/driver._compact_state) hash-partitions
by ``pmod(xxhash64(key), P)`` — but plain parquet carries no bucket
metadata, so Spark still shuffles both sides of the steady-state
re-check join. Writing through ``bucketBy`` records the hash layout in
the catalog: every later equi-join or aggregation on the bucket key
scans co-located buckets and plans with NO Exchange on the bucketed
side (pinned by tests/test_plans.py::test_bucketed_join_no_exchange).
This is the parquet-catalog stand-in for Iceberg's ``bucket(P, key)``
transform + storage-partitioned join named in tables/catalog.py; at
100 TB it removes the full history-side shuffle every round.

Spark requires bucketed data to go through ``saveAsTable`` (bucket
metadata lives in the session catalog, not the files), so callers pass
a table name and optionally an explicit path for an external table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(spark: SparkSession, df: DataFrame, name: str,
                   key: str, n_buckets: int, path: str | None = None,
                   sort: bool = True) -> DataFrame:
    """Write `df` bucketed (and per-file sorted) by `key`; returns the
    catalog-backed table, ready for exchange-free joins on `key`."""
    w = (df.write.format("parquet").mode("overwrite")
         .bucketBy(n_buckets, key))
    if sort:
        w = w.sortBy(key)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)
    return spark.table(name)
