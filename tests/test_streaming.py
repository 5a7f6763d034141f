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


def test_update_mode_watermark_drops_late_row(spark, tmp_path):
    """Two file triggers: the second contains a row whose event time is
    older than the watermark established by the first — its window's state
    was evicted, so the row is dropped and the window's count never grows.
    Hand-computed expected update stream."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime, timezone

    from distributed_web_crawler_spark.streaming import (
        windowed_counts_update_query,
    )

    def t(h, m=0):
        return datetime(2024, 1, 1, h, m, tzinfo=timezone.utc)

    def us(h):
        return int(t(h).timestamp()) * 1_000_000

    def write(name, rows):
        pq.write_table(
            pa.table({"ts": pa.array([r[0] for r in rows],
                                     pa.timestamp("us", tz="UTC")),
                      "event_type": pa.array([r[1] for r in rows])}),
            str(tmp_path / name))

    # trigger 1: window 10:00 gets 2 rows; the 13:00 row advances the
    # watermark to 12:00 (max event time - 1h), past window-end 11:00
    write("b1.parquet", [(t(10, 0), "a"), (t(10, 30), "a"), (t(13, 0), "a")])
    query, qname = windowed_counts_update_query(
        spark, str(tmp_path), "ts timestamp, event_type string",
        window="1 hour", watermark="1 hour")
    try:
        query.processAllAvailable()
        # trigger 2: 10:45 is later than the 12:00 watermark -> dropped;
        # 13:30 is on time -> window 13:00 updates to 2
        write("b2.parquet", [(t(10, 45), "a"), (t(13, 30), "a")])
        query.processAllAvailable()
    finally:
        query.stop()

    got = sorted((r["win_start_us"], r["event_type"], r["n"])
                 for r in spark.table(qname).collect())
    assert got == sorted([
        (us(10), "a", 2),   # trigger 1 update
        (us(13), "a", 1),   # trigger 1 update
        (us(13), "a", 2),   # trigger 2 update; NO (us(10), "a", 3) row
    ])


def test_stateful_first_seen_suppresses_across_batches(spark, tmp_path):
    """applyInPandasWithState first-seen dedup: batch 2 re-sends users 1/2
    — state suppresses them; only the new user 3 emits, with the
    deterministic (ts, event_id) arg-min row per user."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime, timezone

    from distributed_web_crawler_spark.streaming import first_seen_stream

    def t(m):
        return datetime(2024, 1, 1, 0, m, tzinfo=timezone.utc)

    def write(name, rows):  # (event_id, ts, user_id, event_type)
        pq.write_table(pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us", tz="UTC")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
        }), str(tmp_path / name))

    write("b1.parquet", [(10, t(5), 1, "view"), (11, t(2), 1, "click"),
                         (12, t(7), 2, "view")])
    schema = "event_id long, ts timestamp, user_id long, event_type string"
    stream = spark.readStream.schema(schema).parquet(str(tmp_path))
    out = first_seen_stream(stream)
    qname = "first_seen_test"
    query = (out.writeStream.outputMode("append")
             .format("memory").queryName(qname).start())
    try:
        query.processAllAvailable()
        write("b2.parquet", [(20, t(1), 1, "error"),   # user 1: seen -> drop
                             (21, t(9), 2, "click"),   # user 2: seen -> drop
                             (22, t(4), 3, "view")])   # user 3: new -> emit
        query.processAllAvailable()
    finally:
        query.stop()

    got = sorted((r["user_id"], r["event_id"], r["event_type"])
                 for r in spark.table(qname).collect())
    assert got == [(1, 11, "click"),   # batch-1 arg-min by (ts, event_id)
                   (2, 12, "view"),
                   (3, 22, "view")]    # batch 2 emits ONLY the new user


def test_pii_scrub_composes_with_readstream(spark, tmp_path):
    """Curation ops are plain Catalyst expressions, so the SAME operator
    runs unchanged over readStream — the batch/streaming parity Spark's
    incremental execution promises for stateless transforms."""
    from distributed_web_crawler_spark.pipeline import text as ptext

    rows = [(1, "mail bob@corp.example.org now"),
            (2, "server 10.1.2.3 up"),
            (3, "nothing sensitive")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.parquet(str(tmp_path / "in"))
    stream = (spark.readStream.schema(df.schema)
              .parquet(str(tmp_path / "in")))
    q = (ptext.pii_scrub(stream).writeStream.format("memory")
         .queryName("pii_stream").outputMode("append")
         .trigger(availableNow=True).start())
    q.processAllAvailable()
    q.awaitTermination(120)
    got = {r["doc_id"]: r["clean_text"]
           for r in spark.sql("SELECT * FROM pii_stream").collect()}
    want = {r["doc_id"]: r["clean_text"]
            for r in ptext.pii_scrub(df).collect()}
    assert got == want
    assert got[1] == "mail [EMAIL] now" and got[2] == "server [IPV4] up"


def test_stream_interval_join_equals_batch(spark):
    from distributed_web_crawler_spark.streaming import interval_join_stream
    streamed = interval_join_stream(spark, SF_DIR, lookback="60 minutes")
    ev = (spark.read.parquet(f"{SF_DIR}/events.parquet")
          .withColumn("ts", F.col("ts").cast("timestamp")))
    c = (ev.where(F.col("event_type") == "click")
         .select(F.col("event_id").alias("click_id"),
                 F.col("user_id"), F.col("ts").alias("c_ts")))
    v = (ev.where(F.col("event_type") == "view")
         .select(F.col("user_id").alias("v_user"),
                 F.col("ts").alias("v_ts"),
                 F.col("value").alias("view_value")))
    batch = (c.join(v, (F.col("user_id") == F.col("v_user"))
                    & (F.col("v_ts") <= F.col("c_ts"))
                    & (F.col("v_ts") >= F.col("c_ts")
                       - F.expr("INTERVAL 60 MINUTES")))
             .select("click_id", "user_id",
                     F.unix_micros("c_ts").alias("click_ts_us"),
                     F.unix_micros("v_ts").alias("view_ts_us"),
                     "view_value"))
    key = lambda r: (r["click_id"], r["view_ts_us"])  # noqa: E731
    s = sorted(streamed.collect(), key=key)
    b = sorted(batch.collect(), key=key)
    assert len(s) > 0
    assert [tuple(r) for r in s] == [tuple(r) for r in b]


def test_append_mode_checkpoint_restart_exactly_once(spark, tmp_path):
    """Append-mode windowed agg → parquet sink, stopped and restarted
    twice from the same checkpoint: window state and the watermark carry
    across process boundaries, every finalized window is emitted EXACTLY
    once (no duplicates after restart), and nothing finalized is lost —
    the resumability contract a production stream relies on."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime, timezone

    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
    (tmp_path / "src").mkdir()

    def t(h, m=0):
        return datetime(2024, 1, 1, h, m, tzinfo=timezone.utc)

    def us(h):
        return int(t(h).timestamp()) * 1_000_000

    def write(name, rows):
        pq.write_table(pa.table({
            "ts": pa.array([r[0] for r in rows],
                           pa.timestamp("us", tz="UTC")),
            "event_type": pa.array([r[1] for r in rows])}),
            f"{src}/{name}")

    def run_once():
        agg = (spark.readStream.schema("ts timestamp, event_type string")
               .parquet(src)
               .withWatermark("ts", "1 hour")
               .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
               .agg(F.count("*").alias("n"))
               .select(F.unix_micros("w.start").alias("win_start_us"),
                       "event_type", "n"))
        q = (agg.writeStream.outputMode("append").format("parquet")
             .option("path", out).option("checkpointLocation", ck)
             .start())
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return sorted(map(tuple, spark.read.parquet(out).collect()))

    write("b1.parquet", [(t(10), "a"), (t(10, 30), "a"), (t(12, 30), "b")])
    assert run_once() == [(us(10), "a", 2)]
    write("b2.parquet", [(t(13, 30), "b")])
    # restart: [10,11) must NOT re-emit; [12,13) finalizes one trigger later
    assert run_once() == [(us(10), "a", 2)]
    write("b3.parquet", [(t(15), "c")])
    assert run_once() == [(us(10), "a", 2), (us(12), "b", 1),
                          (us(13), "b", 1)]


def test_watermark_dedup_state_expires_and_reemits(spark, tmp_path):
    """dropDuplicatesWithinWatermark is BOUNDED-state dedup: a key whose
    state expired (watermark moved past its event time + delay) is
    emitted AGAIN on reappearance — unlike the unbounded first-seen
    operator. Two file triggers, hand-computed append output."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime, timezone

    def t(h, m=0):
        return datetime(2024, 1, 1, h, m, tzinfo=timezone.utc)

    def write(name, rows):
        pq.write_table(
            pa.table({"ts": pa.array([r[0] for r in rows],
                                     pa.timestamp("us", tz="UTC")),
                      "k": pa.array([r[1] for r in rows])}),
            str(tmp_path / name))

    # trigger 1: "dup" twice (one emission); "adv" at 13:00 pushes the
    # watermark to 12:00 (delay 1h), expiring dup's 10:00 state
    write("b1.parquet", [(t(10, 0), "dup"), (t(10, 30), "dup"),
                         (t(13, 0), "adv")])
    stream = (spark.readStream.schema("ts timestamp, k string")
              .parquet(str(tmp_path))
              .withWatermark("ts", "1 hour")
              .dropDuplicatesWithinWatermark(["k"])
              .select("k"))
    qname = "wm_dedup_expiry"
    query = (stream.writeStream.outputMode("append")
             .format("memory").queryName(qname)
             .option("checkpointLocation", str(tmp_path / "_ckpt"))
             .start())
    try:
        query.processAllAvailable()
        batch1 = sorted(r["k"] for r in spark.table(qname).collect())
        assert batch1 == ["adv", "dup"]          # dup deduped within batch
        # trigger 2: dup reappears AFTER its state expired -> re-emitted;
        # adv (state still live: 13:00 + 1h > watermark) stays suppressed
        write("b2.parquet", [(t(13, 30), "dup"), (t(13, 40), "adv")])
        query.processAllAvailable()
    finally:
        query.stop()
    got = sorted(r["k"] for r in spark.table(qname).collect())
    assert got == ["adv", "dup", "dup"]
