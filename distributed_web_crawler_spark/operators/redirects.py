"""Redirect-chain resolution: follow HTTP 3xx edges to the terminal URL.

The reference follows redirects inline during fetch (Jsoup's
followRedirects default inside WebPageFetcher — reference
src/main/java/com/crawler/service/WebPageFetcher.java), so a redirected
URL is recorded under its final location. In a batch engine the redirect
map is a TABLE (src_url -> dst_url observed at fetch time), and resolving
every source to its terminal target is a graph problem, not a per-row
loop.

Pointer doubling (a.k.a. path doubling) resolves every chain of length
<= max_hops in ceil(log2(max_hops)) self-joins: after iteration k each
unresolved row points 2^k hops ahead. Each iteration is ONE hash join of
the shrinking pointer table against itself on a single key — at 100 TB
that is ceil(log2(max_hops)) shuffles total (crawlers cap redirect chains
at 5-10 hops, so 3-4 joins), versus max_hops joins for naive iteration
and an unbounded recursion for a transitive closure. Rows that resolve
early stop growing their join side only logically (the table width is
constant); AQE re-plans each join on the runtime size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def resolve_redirects(edges: DataFrame, max_hops: int = 8,
                      src: str = "src", dst: str = "dst") -> DataFrame:
    """Resolve each redirect source to its terminal URL.

    edges: one row per observed redirect (src -> dst); a URL with no
    outgoing edge is terminal. The map must be functional — at most one
    dst per src (dedupe upstream with max_by(dst, fetch_ts) if the same
    src was observed redirecting differently across rounds); duplicate
    identical observations are tolerated (deduped here). Returns one row per DISTINCT src with
    (src, final_url, hops, capped): final_url is the first URL reached
    that has no outgoing edge, hops counts edges traversed, and capped
    marks chains still unresolved after max_hops (redirect loops or
    over-long chains — a crawler records these as fetch errors).

    Exactly ceil(log2(max_hops)) + 1 jobs' worth of plan, no driver
    iteration on data values: the loop bound depends only on max_hops.
    The effective cap rounds up to the next power of two (doubling
    advances in 2^k jumps); the reported hops column saturates at
    max_hops for capped rows.
    """
    if max_hops < 1:
        raise ValueError("max_hops must be >= 1")
    # pointer table: node -> (nxt, hops). Deduped: an observed redirect
    # map may repeat (src, dst) across rounds.
    ptr = (edges.select(F.col(src).alias("node"), F.col(dst).alias("nxt"))
           .distinct()
           .withColumn("hops", F.lit(1).cast("long"))
           # each doubling self-joins ptr against itself: without lineage
           # truncation Catalyst UNROLLS the recursion (2^k scan leaves,
           # 2^k - 1 joins — doubling would buy nothing). Checkpointing
           # makes every iteration exactly one join over materialized
           # inputs, the same pattern as assign_clusters
           # (pipeline/dedup.py:458).
           .localCheckpoint(eager=True))
    steps = 1
    while steps < max_hops:
        a, b = ptr.alias("a"), ptr.alias("b")
        ptr = (a.join(b, F.col("a.nxt") == F.col("b.node"), "left")
               .select(
                   F.col("a.node").alias("node"),
                   F.coalesce(F.col("b.nxt"), F.col("a.nxt")).alias("nxt"),
                   # cap the accumulated count so a loop can't overflow
                   F.least(F.col("a.hops") + F.coalesce(F.col("b.hops"),
                                                        F.lit(0)),
                           F.lit(2 * max_hops).cast("long")).alias("hops"))
               .localCheckpoint(eager=True))
        steps *= 2
    # terminal test: one more self-join — nxt still has an outgoing edge
    # only for loops / chains longer than max_hops.
    out = ptr.select("node").distinct()
    return (ptr.join(out.select(F.col("node").alias("_o")),
                     ptr["nxt"] == F.col("_o"), "left")
            .select(F.col("node").alias(src),
                    F.col("nxt").alias("final_url"),
                    F.least(F.col("hops"),
                            F.lit(max_hops).cast("long")).alias("hops"),
                    F.col("_o").isNotNull().alias("capped")))
