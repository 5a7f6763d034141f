"""Fetch S6 + link extraction E1/E2 + link filters F8.

The reference fetches one page per virtual thread with Jsoup
(core/WebCrawler.java:324-327), extracts ``a[href]`` into a set
(core/WebCrawler.java:339-345), and builds child requests with depth+1
(core/WebCrawler.java:418-426).

Spark shape: the fetch is an Arrow-batched ``mapInPandas`` over the round's
politeness-selected, skew-salted partitions — the batch boundary is where a
production fetcher would run its async HTTP pool (the reference's
virtual-thread fan-out, core/WebCrawler.java:135-165, lives *inside* the
batch here). Tests inject the deterministic synthetic fetcher. Extraction
is ``array_distinct`` (D3) + ``explode`` (the canonical UDTF shape) +
Catalyst-only link filters.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..config import CrawlConfig
from ..functions.urls import (
    combined_allow_pattern,
    combined_exclude_pattern,
    host_of,
    is_http_url,
)

FETCH_SCHEMA = T.StructType([
    T.StructField("url", T.StringType()),
    T.StructField("host", T.StringType()),
    T.StructField("depth", T.IntegerType()),
    T.StructField("parent_url", T.StringType()),
    T.StructField("priority", T.IntegerType()),
    T.StructField("fetched", T.BooleanType()),
    T.StructField("image_id", T.StringType()),
    T.StructField("bytes", T.BinaryType()),
    T.StructField("w", T.IntegerType()),
    T.StructField("h", T.IntegerType()),
    T.StructField("fmt", T.StringType()),
    T.StructField("caption", T.StringType()),
    T.StructField("phash", T.LongType()),
    T.StructField("links", T.ArrayType(T.StringType())),
    T.StructField("http_status", T.IntegerType()),
    T.StructField("content_type", T.StringType()),
])


def make_synth_fetcher(synth_cfg):
    """Deterministic fetcher for tests/bench: page content is a pure
    function of the URL (crawl/synthweb.py), so the fetch stage needs no
    I/O, no joins, and no shared state — it scales linearly with
    partitions. Failure (bad URL / 404) ⇒ fetched=False, which the engine
    drops and counts, mirroring the reference's catch-and-log
    (core/WebCrawler.java:436-439)."""
    from ..crawl.synthweb import page_for_url

    page_cols = ("image_id", "bytes", "w", "h", "fmt", "caption", "phash",
                 "links", "http_status", "content_type")
    # nullable integer columns must be built as pandas extension arrays —
    # a rows-of-dicts DataFrame with mixed None/int coerces to float64 and
    # silently corrupts 64-bit values (phash) through Arrow
    int_cols = {"w": "Int32", "h": "Int32", "phash": "Int64",
                "http_status": "Int32"}

    def fetch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pages = [page_for_url(u, synth_cfg) for u in pdf["url"]]
            data = {
                "url": pdf["url"].to_numpy(),
                "host": pdf["host"].to_numpy(),
                "depth": pdf["depth"].to_numpy(),
                "parent_url": pdf["parent_url"].to_numpy(),
                "priority": pdf["priority"].to_numpy(),
                "fetched": [p is not None for p in pages],
            }
            for col in page_cols:
                vals = [None if p is None else p[col] for p in pages]
                dtype = int_cols.get(col)
                data[col] = pd.array(vals, dtype=dtype) if dtype else \
                    pd.Series(vals, dtype="object")
            yield pd.DataFrame(data, columns=[f.name for f in FETCH_SCHEMA])

    return fetch


def fetch_pages(selected: DataFrame, fetcher) -> DataFrame:
    """S6 over the selected frontier rows. Input columns: url, host, depth,
    parent_url, priority."""
    cols = ["url", "host", "depth", "parent_url", "priority"]
    return selected.select(*cols).mapInPandas(fetcher, FETCH_SCHEMA)


def extract_children(stored: DataFrame, cfg: CrawlConfig,
                     round_ts_ms: int) -> DataFrame:
    """E1+E2+F8: stored pages → deduped, validity-filtered child requests.

    Duplicate-content pages never reach this operator — the reference skips
    extraction for duplicates (core/WebCrawler.java:333-345 ordering)."""
    allow_re = combined_allow_pattern(cfg.allowed_domains)
    excl_re = combined_exclude_pattern(cfg.exclude_patterns)

    children = (
        stored
        .select(F.col("url").alias("parent_url"), "depth",
                F.explode(F.array_distinct("links")).alias("url"))  # E1+D3
        .where(is_http_url(F.col("url")))                           # F8
        .withColumn("host", host_of(F.col("url")))
    )
    if allow_re is not None:
        children = children.where(F.col("host").rlike(allow_re))    # F3 on links
    if excl_re is not None:
        children = children.where(~F.col("url").rlike(excl_re))     # F4 on links
    # E2: child request projection (depth+1, parent, deterministic clock)
    children = children.select(
        "url", "host",
        (F.col("depth") + 1).cast("int").alias("depth"),
        "parent_url",
        F.lit(round_ts_ms).alias("discovered_at_ms"),
        F.lit(1).alias("priority"),                                  # reference hard-codes 1
        F.lit(0).alias("retry_count"),
        F.lit(None).cast("long").alias("scheduled_for_ms"),
    )
    # one URL may be discovered by many parents in the same round; keep one
    # deterministic winner (min depth, then min parent) — reference would
    # enqueue all (D4 gap), north_rule dedups
    from pyspark.sql import Window
    w = Window.partitionBy("url").orderBy("depth", "parent_url")
    return (children.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn"))
