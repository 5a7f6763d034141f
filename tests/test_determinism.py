"""Partition-order determinism regressions.

Queries that aggregate floating-point values must quantize each value to
an INTEGER micro-unit BEFORE the sum: Spark's partition evaluation order
is nondeterministic and DuckDB's differs, so summing rounded DOUBLES can
drift in the last ulps and flip a round(·, 6) at a boundary — exactly
the lm_perplexity flake caught by a full-sweep run on 2026-08-18 (green
solo, red in-sweep). These tests re-run each previously-affected query
under several shuffle-partition settings and require bit-identical
results."""

import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

FIXED = ["lm_perplexity", "zipf_fit", "bm25_search", "mix_weights"]


def _snapshot(spark, name, partitions):
    spark.conf.set("spark.sql.shuffle.partitions", str(partitions))
    try:
        df = entrymod.queries()[name](spark, SF).toPandas()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "8")
    df = df[sorted(df.columns)]
    df = df.sort_values(sorted(df.columns), ignore_index=True)
    return pd.util.hash_pandas_object(df).sum()


@pytest.mark.parametrize("name", FIXED)
def test_float_aggregates_are_partition_order_invariant(spark, name):
    hashes = {_snapshot(spark, name, p) for p in (3, 8, 31)}
    assert len(hashes) == 1, f"{name} varies with partitioning"
