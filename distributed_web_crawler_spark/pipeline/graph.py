"""Iterative graph analytics over the crawl link graph.

The reference extracts links per page (parser/JsoupLinkExtractor.java) but
ships no graph analytics; host-level PageRank is the canonical downstream
consumer of that link table (crawl prioritization / spam scoring), so it is
implemented here as the engine's iterative-algorithm showcase.

Scale shape (the part that matters at 10^9 hosts):
- the edge table is hash-partitioned by dst ONCE outside the loop and
  cached; every iteration's contribution aggregate then needs NO exchange
  (HashPartitioning(dst) satisfies the groupBy's clustering).
- the rank vector (one row per node) is broadcast into the edge scan each
  iteration — the edges, the 100 TB side, never move.
- the rank vector is localCheckpoint-ed every iteration. This is not just
  lineage hygiene: if iteration k+1's plan still references iteration k's
  (which references the cached edges), Spark's self-join deduplication
  rewrites the cached relation's exprIds and the rewritten copy no longer
  advertises its dst partitioning — every iteration then re-exchanges.
  Cutting the lineage keeps each iteration's plan identical and
  exchange-free (pinned by tests/test_plans.py).

Exactness contract (what makes the DuckDB oracle hash-match): when
`damping` is a dyadic rational (0.5 here), n_nodes and every out-degree
are powers of two, every intermediate double is exactly representable, so
floating-point summation order — which neither engine pins — cannot
change a single bit. General (non-dyadic) parameters still converge
identically in value terms, just not bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(nodes: DataFrame, edges: DataFrame, n_nodes: int,
             iterations: int = 6, damping: float = 0.5,
             checkpoint_every: int = 1) -> DataFrame:
    """PageRank over (nodes.node, edges.src/dst), multi-edges respected.

    r_0 = 1/n;  r_{k+1}(v) = (1-d)/n + d * sum_{u->v} r_k(u)/outdeg(u).
    Dangling mass is dropped (both engines drop it identically). Returns
    (node, rank).
    """
    teleport = (1.0 - damping) / n_nodes

    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # materialize both loop-invariant tables once: the edge side
    # pre-partitioned by dst (so the per-iteration contribution aggregate
    # needs no exchange), the node side because every iteration's teleport
    # join re-reads it
    edeg = (edges.join(deg, "src")
            .repartition(F.col("dst"))
            .persist())
    nodes = nodes.persist()
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for it in range(iterations):
        contrib = (edeg
                   .join(F.broadcast(ranks),
                         edeg["src"] == ranks["node"])
                   .groupBy("dst")
                   .agg(F.sum(F.col("rank") / F.col("outdeg"))
                        .alias("incoming")))
        # contrib is one row per node — broadcast it back onto the node
        # table rather than shuffling either side
        ranks = (nodes.join(F.broadcast(contrib),
                            nodes["node"] == contrib["dst"], "left")
                 .select(nodes["node"],
                         (F.lit(teleport)
                          + F.lit(damping)
                          * F.coalesce(F.col("incoming"), F.lit(0.0)))
                         .alias("rank")))
        if (it + 1) % checkpoint_every == 0 and it + 1 < iterations:
            # materialize the (tiny) rank vector: constant-size plans and
            # the exchange-free aggregate — see module docstring
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


# deterministic 4-regular host-graph construction (each multiplier is odd,
# hence a bijection mod a power-of-two node count: in-degree is exactly 4
# too, and out-degree is exactly 4 — the pagerank() exactness contract)
HOST_EDGE_FNS = ((5, 1), (7, 3), (11, 5), (13, 7))


def host_graph(documents: DataFrame, n_nodes: int = 32) -> tuple[DataFrame,
                                                                 DataFrame]:
    """Node set discovered from data (distinct doc_id % n), out-edges a
    pure function of the node id — the SQL-restatable stand-in for a real
    host-link table, with the power-of-two degree the oracle needs."""
    nodes = (documents
             .select((F.col("doc_id") % n_nodes).alias("node"))
             .distinct())
    edges = None
    for a, b in HOST_EDGE_FNS:
        e = nodes.select(F.col("node").alias("src"),
                         ((F.col("node") * a + b) % n_nodes).alias("dst"))
        edges = e if edges is None else edges.unionAll(e)
    return nodes, edges
