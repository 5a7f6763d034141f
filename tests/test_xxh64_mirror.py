"""The Python XXH64 mirror must agree bit-for-bit with Spark's xxhash64
for every call shape the oracles use: single string, single long, int
literal, and multi-column chains (long,long,int) / (lit int, string)."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from distributed_web_crawler_spark.functions.xxh64 import hash_bytes, xxhash64

TEXT = st.text(min_size=0, max_size=80)
LONGS = st.integers(min_value=-(2 ** 63), max_value=2 ** 63 - 1)
INTS = st.integers(min_value=-(2 ** 31), max_value=2 ** 31 - 1)


def test_known_vector():
    # reference xxHash test vector: XXH64("") seed 0
    assert hash_bytes(b"", 0) == 0xEF46DB3751D8E999


@settings(max_examples=20, deadline=None)
@given(st.lists(st.tuples(TEXT, LONGS, INTS), min_size=1, max_size=40))
def test_mirror_matches_spark(spark, rows):
    rows = [(f"{i}:{s}", l, n) for i, (s, l, n) in enumerate(rows)]
    df = spark.createDataFrame(rows, "s string, l long, i int")
    got = df.select(
        "s", "l", "i",
        F.xxhash64("s").alias("hs"),
        F.xxhash64("l").alias("hl"),
        F.xxhash64("i").alias("hi"),
        F.xxhash64("l", "l", F.lit(3)).alias("hchain"),
        F.xxhash64(F.lit(1), "s").alias("hseeded"),
    ).collect()
    for r in got:
        assert r["hs"] == xxhash64(r["s"])
        assert r["hl"] == xxhash64(r["l"])
        assert r["hi"] == xxhash64(("i32", r["i"]))
        assert r["hchain"] == xxhash64(r["l"], r["l"], ("i32", 3))
        assert r["hseeded"] == xxhash64(("i32", 1), r["s"])
