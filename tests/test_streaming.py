"""Structured Streaming surface: availableNow drain equals the batch agg."""

from pyspark.sql import functions as F

from distributed_web_crawler_spark.streaming import tumbling_counts_stream

SF_DIR = "/root/testdata/sf0.001"


def test_stream_tumbling_equals_batch(spark):
    streamed = tumbling_counts_stream(spark, SF_DIR)
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.unix_micros(F.col("w.start")).alias("win_start_us"),
                "event_type", "n")
    )
    key = lambda r: (r["win_start_us"], r["event_type"])  # noqa: E731
    s = sorted(streamed.collect(), key=key)
    b = sorted(batch.collect(), key=key)
    assert len(s) > 0
    assert [tuple(r) for r in s] == [tuple(r) for r in b]


def test_stream_sliding_equals_batch(spark):
    from distributed_web_crawler_spark.streaming import sliding_counts_stream
    streamed = sliding_counts_stream(spark, SF_DIR)
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"),
                 "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.unix_micros(F.col("w.start")).alias("win_start_us"),
                "event_type", "n")
    )
    key = lambda r: (r["win_start_us"], r["event_type"])  # noqa: E731
    s = sorted(streamed.collect(), key=key)
    b = sorted(batch.collect(), key=key)
    assert len(s) > len(set(r["win_start_us"] // 3_600_000_000 for r in s)), \
        "sliding windows must overlap (more windows than hours)"
    assert [tuple(r) for r in s] == [tuple(r) for r in b]
