"""Unit invariants for operators.redirects.resolve_redirects and
pipeline.multimodal.aspect_bucket_batches (values are oracle-checked via
redirect_resolve / aspect_bucket; these pin the algorithmic properties)."""

import pytest
from pyspark.sql import functions as F

from distributed_web_crawler_spark.operators.redirects import (
    resolve_redirects)
from distributed_web_crawler_spark.pipeline.multimodal import (
    aspect_bucket_batches)


def _resolve(spark, edges, max_hops=8):
    df = spark.createDataFrame(edges, "src string, dst string")
    rows = resolve_redirects(df, max_hops=max_hops).collect()
    return {r["src"]: (r["final_url"], r["hops"], r["capped"]) for r in rows}


def test_chain_resolves_to_terminal(spark):
    got = _resolve(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    assert got == {"a": ("d", 3, False),
                   "b": ("d", 2, False),
                   "c": ("d", 1, False)}


def test_loop_is_capped_and_chain_into_loop_too(spark):
    got = _resolve(spark, [("x", "y"), ("y", "x"), ("pre", "x")],
                   max_hops=8)
    assert got["x"] == ("x", 8, True)      # 8 hops around a 2-cycle
    assert got["y"] == ("y", 8, True)
    assert got["pre"][2] is True           # enters the loop -> capped
    assert got["pre"][1] == 8


def test_duplicate_observations_tolerated(spark):
    got = _resolve(spark, [("a", "b"), ("a", "b"), ("b", "c")])
    assert got["a"] == ("c", 2, False)


def test_chain_exactly_at_cap_resolves(spark):
    edges = [(f"n{i}", f"n{i+1}") for i in range(8)]  # n0 -> ... -> n8
    got = _resolve(spark, edges, max_hops=8)
    assert got["n0"] == ("n8", 8, False)


def test_doubling_join_count_is_logarithmic(spark):
    df = spark.createDataFrame([("a", "b")], "src string, dst string")
    plan = resolve_redirects(df, max_hops=8)._jdf.queryExecution() \
        .optimizedPlan().toString()
    # every doubling iteration ran eagerly against checkpointed inputs,
    # so the returned plan holds ONLY the terminal-test join over the
    # materialized pointer table — not the 2^k - 1 unrolled join tree
    # a lazy self-join recursion would build; and no cartesian anywhere
    assert plan.count("Join") == 1
    assert plan.count("LogicalRDD") >= 2  # checkpointed inputs
    assert "Cartesian" not in plan


def test_aspect_buckets_are_exact_integer_ladder(spark):
    rows = [("i1", 20, 10),   # r=2.0      -> wide2
            ("i2", 19, 10),   # r=1.9      -> wide
            ("i3", 4, 3),     # r=4/3      -> wide  (3w >= 4h boundary)
            ("i4", 13, 10),   # r=1.3      -> square
            ("i5", 3, 4),     # r=3/4      -> tall  (4w > 3h false)
            ("i6", 6, 11),    # r=0.545..  -> tall
            ("i7", 5, 10),    # r=0.5      -> tall2 (2w > h false)
            ("i8", 10, 10)]   # r=1        -> square
    df = spark.createDataFrame(rows, "image_id string, w int, h int")
    got = {r["image_id"]: r["bucket"]
           for r in aspect_bucket_batches(df, batch_size=1, n_shards=1)
           .collect()}
    assert got == {"i1": "wide2", "i2": "wide", "i3": "wide",
                   "i4": "square", "i5": "tall", "i6": "tall",
                   "i7": "tall2", "i8": "square"}


def test_drop_last_leaves_only_full_batches(spark):
    # 10 square images, batch_size 4, single shard -> 2 full batches,
    # the 2-image tail dropped
    rows = [(f"img-{i:02d}", 10, 10) for i in range(10)]
    df = spark.createDataFrame(rows, "image_id string, w int, h int")
    out = aspect_bucket_batches(df, batch_size=4, n_shards=1)
    sizes = (out.groupBy("bucket", "shard", "batch_id")
             .agg(F.count(F.lit(1)).alias("n")).collect())
    assert len(sizes) == 2
    assert all(r["n"] == 4 for r in sizes)
    kept = {r["image_id"] for r in out.collect()}
    assert kept == {f"img-{i:02d}" for i in range(8)}  # id-ordered layout


def test_batches_deterministic_across_shuffles(spark):
    rows = [(f"im{i:03d}", 8 + i % 9, 8 + (i * 7) % 9) for i in range(64)]
    df = spark.createDataFrame(rows, "image_id string, w int, h int")
    a = sorted(map(tuple, aspect_bucket_batches(df, 4, 4).collect()))
    b = sorted(map(tuple,
                   aspect_bucket_batches(df.repartition(13), 4, 4)
                   .collect()))
    assert a == b
