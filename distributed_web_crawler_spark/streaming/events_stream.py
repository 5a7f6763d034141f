"""Structured Streaming surface: event-time tumbling windows + watermark.

The reference is a continuous Kafka consumer, not an event-time stream
processor (SURVEY.md §2.12) — our engine's batch-iterative rounds replace
that model. This module is the forward-looking streaming analog for the
training-data side: the same tumbling aggregation the batch engine runs
(`queries.events_tumbling`), expressed as a file-source stream with an
event-time watermark, so a production deployment can point it at an
arriving-parquet directory (or swap the source for Kafka) unchanged.

Scale notes: the aggregation is a streaming partial-agg → state-store
shuffle on (window, event_type) — the same single-shuffle shape as the
batch plan; the watermark bounds state. `availableNow` drains the backlog
as one checkpointable run (the batch-equivalence property the test
asserts).
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_COUNTER = itertools.count()


def _drain_windowed_counts(spark: SparkSession, sf_dir: str,
                           window_col, watermark: str,
                           name: str) -> DataFrame:
    """Shared plumbing for the windowed-count streams: file-source stream
    over the events parquet, event-time watermark, per-(window, type)
    counts, drained with trigger(availableNow) into a memory sink.
    Complete output mode ⇒ result equals the batch aggregation bit-for-bit
    (single drain, no dropped-late rows), which is exactly what the DuckDB
    oracles check."""
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    agg = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(sf_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(window_col.alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.unix_micros(F.col("w.start")).alias("win_start_us"),
                "event_type", "n")
    )
    qname = f"{name}_{next(_COUNTER)}"
    query = (agg.writeStream.outputMode("complete")
             .format("memory").queryName(qname)
             .trigger(availableNow=True).start())
    query.awaitTermination()
    return spark.table(qname)


def windowed_counts_update_query(spark: SparkSession, source_dir: str,
                                 schema, window: str = "1 hour",
                                 watermark: str = "1 hour"):
    """Long-running update-mode variant over an arriving-files directory —
    the unbounded-deployment shape, where the watermark actually DROPS
    data: once a trigger's watermark (max event time of prior triggers
    minus the delay) passes a window's end, that window's state is evicted
    and later rows for it are discarded, never re-emitted. The availableNow
    drains above are the backlog/batch-parity shape where a single trigger
    can never drop (tested in test_streaming.py both ways).

    Returns (StreamingQuery, memory-sink table name); the caller drives
    triggers (`processAllAvailable`) and stops the query."""
    qname = f"events_updates_{next(_COUNTER)}"
    agg = (
        spark.readStream.schema(schema).parquet(source_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.unix_micros(F.col("w.start")).alias("win_start_us"),
                "event_type", "n")
    )
    query = (agg.writeStream.outputMode("update")
             .format("memory").queryName(qname).start())
    return query, qname


def tumbling_counts_stream(spark: SparkSession, sf_dir: str,
                           window: str = "1 hour",
                           watermark: str = "2 hours") -> DataFrame:
    """Tumbling per-event-type counts via Structured Streaming."""
    return _drain_windowed_counts(spark, sf_dir, F.window("ts", window),
                                  watermark, "events_stream_tumbling")


def sliding_counts_stream(spark: SparkSession, sf_dir: str,
                          window: str = "1 hour", slide: str = "30 minutes",
                          watermark: str = "2 hours") -> DataFrame:
    """Sliding event-time windows (each event lands in window/slide
    overlapping windows — Spark aligns window starts to the epoch grid);
    state is window/slide × the tumbling size but still
    watermark-bounded."""
    return _drain_windowed_counts(spark, sf_dir,
                                  F.window("ts", window, slide),
                                  watermark, "events_stream_sliding")


def interval_join_stream(spark: SparkSession, sf_dir: str,
                         lookback: str = "10 minutes",
                         watermark: str = "2 hours") -> DataFrame:
    """Stream-stream inner interval join: every (click, view) pair for the
    same user with view.ts in [click.ts - lookback, click.ts].

    Both sides carry an event-time watermark and the join condition bounds
    the time skew, so Spark can evict buffered state once the watermark
    passes a row's ts + lookback — the state-bounded shape that survives
    an unbounded deployment (an unbounded stream-stream join without the
    time-range condition buffers both streams forever). Inner-join results
    emit as found, so one availableNow drain in append mode equals the
    batch interval join bit-for-bit — which is what the DuckDB oracle
    checks."""
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema

    def src() -> DataFrame:
        return (spark.readStream.schema(schema)
                .option("pathGlobFilter", "events.parquet").parquet(sf_dir)
                .withColumn("ts", F.col("ts").cast("timestamp")))

    clicks = (src().where(F.col("event_type") == "click")
              .select(F.col("event_id").alias("click_id"),
                      F.col("user_id").alias("c_user"),
                      F.col("ts").alias("c_ts"))
              .withWatermark("c_ts", watermark))
    views = (src().where(F.col("event_type") == "view")
             .select(F.col("user_id").alias("v_user"),
                     F.col("ts").alias("v_ts"),
                     F.col("value").alias("view_value"))
             .withWatermark("v_ts", watermark))
    joined = clicks.join(
        views,
        F.expr(f"c_user = v_user AND v_ts <= c_ts "
               f"AND v_ts >= c_ts - INTERVAL {lookback}"))
    out = joined.select(
        "click_id", F.col("c_user").alias("user_id"),
        F.unix_micros("c_ts").alias("click_ts_us"),
        F.unix_micros("v_ts").alias("view_ts_us"), "view_value")
    qname = f"events_stream_join_{next(_COUNTER)}"
    query = (out.writeStream.outputMode("append")
             .format("memory").queryName(qname)
             .trigger(availableNow=True).start())
    query.awaitTermination()
    return spark.table(qname)


def static_enriched_stream(spark: SparkSession, sf_dir: str,
                           window: str = "1 hour",
                           watermark: str = "2 hours") -> DataFrame:
    """Stream–static join: the event stream enriched with a batch dim
    table (user geography) before the windowed aggregation.

    The static side joins as an ordinary broadcast hash join inside every
    micro-batch — no state store is involved for the join (only the
    windowed agg keeps state), which is why stream-static enrichment is
    the cheap, unconditionally-safe join flavor in Structured Streaming
    (versus stream-stream, which must buffer both sides). One availableNow
    drain in complete mode equals the batch join+agg bit-for-bit — what
    the DuckDB oracle checks."""
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    nations = (spark.read.parquet(f"{sf_dir}/nation.parquet")
               .select(F.col("n_nationkey").cast("long").alias("nk"),
                       F.col("n_name").alias("nation")))
    agg = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(sf_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withColumn("nk", F.col("user_id") % 25)
        .join(F.broadcast(nations), "nk")
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "nation")
        .agg(F.count("*").alias("n"))
        .select(F.unix_micros(F.col("w.start")).alias("win_start_us"),
                "nation", "n")
    )
    qname = f"events_stream_enrich_{next(_COUNTER)}"
    query = (agg.writeStream.outputMode("complete")
             .format("memory").queryName(qname)
             .trigger(availableNow=True).start())
    query.awaitTermination()
    return spark.table(qname)


def watermark_dedup_stream(spark: SparkSession, sf_dir: str,
                           watermark: str = "24 hours") -> DataFrame:
    """Built-in bounded-state streaming dedup:
    ``dropDuplicatesWithinWatermark`` keeps one arrival per key and —
    unlike the unbounded first-seen operator in streaming/stateful.py —
    EXPIRES a key's state once the watermark passes its event time +
    delay, so state is O(keys active in the watermark window), not
    O(keys ever). That expiry is exactly what an endless deployment
    needs (and what the expiry pytest proves: a key reappearing after
    its state expired is emitted again).

    Output is the KEY COLUMNS ONLY: which physical row survives a
    duplicate group is arrival-order-dependent, the key set is not —
    key-only projection makes the drain deterministic, and one
    availableNow drain equals batch SELECT DISTINCT (the oracle)."""
    path = f"{sf_dir}/events.parquet"
    schema = spark.read.parquet(path).schema
    out = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet").parquet(sf_dir)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    qname = f"events_stream_dedup_{next(_COUNTER)}"
    query = (out.writeStream.outputMode("append")
             .format("memory").queryName(qname)
             .trigger(availableNow=True).start())
    query.awaitTermination()
    return spark.table(qname)
