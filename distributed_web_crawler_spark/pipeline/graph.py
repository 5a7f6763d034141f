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


# irregular edge subset for HITS/BFS: drop edge (a, b) from src when
# (src + 3a + b) % 5 == 0 — in/out-degrees then vary 2..4, so hub and
# authority scores genuinely differ across nodes (a regular graph would
# converge to the uniform vector immediately)
def _keep_edge(src_col, a: int, b: int):
    return (src_col + 3 * a + b) % 5 != 0


def irregular_graph(documents: DataFrame,
                    n_nodes: int = 32) -> tuple[DataFrame, DataFrame]:
    """host_graph minus a deterministic edge subset — the variable-degree
    link graph HITS and BFS need. Same SQL-restatable construction."""
    nodes = (documents
             .select((F.col("doc_id") % n_nodes).alias("node"))
             .distinct())
    edges = None
    for a, b in HOST_EDGE_FNS:
        e = (nodes.where(_keep_edge(F.col("node"), a, b))
             .select(F.col("node").alias("src"),
                     ((F.col("node") * a + b) % n_nodes).alias("dst")))
        edges = e if edges is None else edges.unionAll(e)
    return nodes, edges


def hits(nodes: DataFrame, edges: DataFrame, iterations: int = 4,
         checkpoint_every: int = 1) -> DataFrame:
    """HITS hubs & authorities, DIVISION-FREE: the classical per-iteration
    L2 normalization only rescales, so it is deferred entirely — scores
    stay exact integer-valued doubles (bounded by 16^iterations « 2^53),
    which makes cross-engine summation order irrelevant and the unrolled
    SQL oracle bit-exact. One final max-normalization (same integers both
    engines ⇒ same quotient) produces comparable [0, 1] scores.

    Shuffle shape mirrors pagerank(): the edge table is cached twice,
    pre-partitioned by dst (authority agg) and by src (hub agg); the
    score vectors — one row per node — broadcast into the edge scan each
    half-step, so the edges never move after the initial partition.

    Returns (node, authority, hub) with scores rounded to 6dp."""
    e_dst = edges.repartition(F.col("dst")).persist()
    e_src = edges.repartition(F.col("src")).persist()
    nodes = nodes.persist()
    hubs = nodes.select("node", F.lit(1.0).alias("h"))
    auths = None
    for it in range(iterations):
        a_in = (e_dst.join(F.broadcast(hubs),
                           e_dst["src"] == hubs["node"])
                .groupBy("dst").agg(F.sum("h").alias("a_sum")))
        auths = (nodes.join(F.broadcast(a_in),
                            nodes["node"] == a_in["dst"], "left")
                 .select(nodes["node"],
                         F.coalesce(F.col("a_sum"), F.lit(0.0)).alias("a")))
        h_in = (e_src.join(F.broadcast(auths),
                           e_src["dst"] == auths["node"])
                .groupBy("src").agg(F.sum("a").alias("h_sum")))
        hubs = (nodes.join(F.broadcast(h_in),
                           nodes["node"] == h_in["src"], "left")
                .select(nodes["node"],
                        F.coalesce(F.col("h_sum"), F.lit(0.0)).alias("h")))
        if (it + 1) % checkpoint_every == 0 and it + 1 < iterations:
            auths = auths.localCheckpoint(eager=True)
            hubs = hubs.localCheckpoint(eager=True)
    scores = auths.join(hubs, "node")
    # final rescale: 1-row max aggregate broadcast back (a global window
    # here would force a single-partition exchange — the known anti-shape)
    maxes = scores.agg(F.max("a").alias("a_max"), F.max("h").alias("h_max"))
    return (scores.crossJoin(F.broadcast(maxes))
            .select("node",
                    F.round(F.col("a") / F.col("a_max"), 6)
                    .alias("authority"),
                    F.round(F.col("h") / F.col("h_max"), 6).alias("hub")))


def seed_distance(nodes: DataFrame, edges: DataFrame, seed_mod: int = 8,
                  iterations: int = 6) -> DataFrame:
    """BFS crawl-depth from the seed set (node % seed_mod == 0) by
    iterative min-plus relaxation: dist_{k+1}(v) = min(dist_k(v),
    min over u→v of dist_k(u) + 1). Pure integer arithmetic — bit-exact
    against the unrolled SQL oracle; unreached nodes report -1.

    Same broadcast-vector/partitioned-edges shape as pagerank(): the
    distance vector (one row per node) broadcasts, edges never move."""
    e_dst = edges.repartition(F.col("dst")).persist()
    nodes = nodes.persist()
    dist = nodes.select(
        "node",
        F.when(F.col("node") % seed_mod == 0, F.lit(0))
        .otherwise(F.lit(None).cast("int")).alias("dist"))
    for it in range(iterations):
        inc = (e_dst.join(F.broadcast(dist.where(F.col("dist").isNotNull())),
                          e_dst["src"] == F.col("node"))
               .groupBy("dst").agg(F.min(F.col("dist") + 1).alias("d_in")))
        dist = (nodes.join(F.broadcast(inc),
                           nodes["node"] == inc["dst"], "left")
                .join(F.broadcast(dist.select(F.col("node").alias("_n"),
                                              F.col("dist").alias("_d"))),
                      nodes["node"] == F.col("_n"))
                .select(nodes["node"],
                        F.least(F.col("_d"), F.col("d_in")).alias("dist")))
        if it + 1 < iterations:
            dist = dist.localCheckpoint(eager=True)
    return dist.select("node",
                       F.coalesce(F.col("dist"), F.lit(-1)).alias("dist"))


def degree_stats(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Per-node link-graph degree report: out-degree, in-degree and the
    count of reciprocated out-edges (u→v with v→u present) — the
    hub/spam-shape diagnostic read next to PageRank. Two partial-agg
    shuffles plus one edge self-join on the reversed key; the node table
    never fans out. Returns (node, out_deg, in_deg, reciprocal)."""
    outd = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg"))
    ind = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("in_deg"))
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = (edges.intersect(rev)
             .groupBy(F.col("src").alias("node"))
             .agg(F.count(F.lit(1)).alias("reciprocal")))
    z = F.lit(0).cast("long")
    return (nodes.join(outd, "node", "left")
            .join(ind, "node", "left")
            .join(recip, "node", "left")
            .select("node",
                    F.coalesce("out_deg", z).alias("out_deg"),
                    F.coalesce("in_deg", z).alias("in_deg"),
                    F.coalesce("reciprocal", z).alias("reciprocal")))


def two_hop_reach(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Distinct nodes reachable in one or two hops (self excluded) —
    the neighborhood-size signal behind crawl-frontier fanout estimates
    and friend-of-friend features. One edge self-join keyed on the
    middle node, a distinct, one count agg; at 10^9 edges the self-join
    is the documented O(Σ deg_in(v)·deg_out(v)) cost and skewed middle
    nodes would be df-capped exactly like hot shingles in
    ngram_jaccard_pairs. Returns (node, reach)."""
    a, b = edges.alias("a"), edges.alias("b")
    hop2 = (a.join(b, F.col("a.dst") == F.col("b.src"))
            .select(F.col("a.src").alias("src"),
                    F.col("b.dst").alias("dst")))
    reach = (edges.select("src", "dst").unionAll(hop2)
             .where(F.col("src") != F.col("dst"))
             .distinct()
             .groupBy(F.col("src").alias("node"))
             .agg(F.count(F.lit(1)).alias("reach")))
    return (nodes.join(reach, "node", "left")
            .select("node",
                    F.coalesce("reach", F.lit(0).cast("long"))
                    .alias("reach")))


def canonical_edges(edges: DataFrame) -> DataFrame:
    """Undirected edge set: one row per unordered endpoint pair (u < v),
    self-loops dropped — the dedup shuffle every undirected graph metric
    shares."""
    return (edges.where(F.col("src") != F.col("dst"))
            .select(F.least("src", "dst").alias("u"),
                    F.greatest("src", "dst").alias("v"))
            .distinct())


def triangle_counts(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Per-node triangle participation over the undirected link graph —
    the clustering/link-farm density signal next to degree stats.

    Degree-ordered orientation (each undirected edge points from its
    lower-(degree, node) endpoint to the higher) makes every triangle a
    unique wedge a→b, a→c closed by b→c, and bounds per-node wedge
    fan-out by O(sqrt(|E|)) on any graph — the standard remedy for the
    high-degree-hub skew that kills a naive edge self-join at 10^9
    edges. Two hash joins on oriented endpoints, one closing semi-join,
    one explode-free 3-way count. The oracle enumerates the same
    triangle set under plain node-id orientation (the set is
    orientation-invariant). Returns (node, triangles)."""
    und = canonical_edges(edges)
    deg = (und.select(F.col("u").alias("node"))
           .unionAll(und.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count(F.lit(1)).alias("deg")))
    o = (und
         .join(deg.select(F.col("node").alias("u"),
                          F.col("deg").alias("du")), "u")
         .join(deg.select(F.col("node").alias("v"),
                          F.col("deg").alias("dv")), "v")
         .select(F.when(F.col("du") <= F.col("dv"), F.col("u"))
                 .otherwise(F.col("v")).alias("a"),
                 F.when(F.col("du") <= F.col("dv"), F.col("v"))
                 .otherwise(F.col("u")).alias("b")))
    w1 = o.select(F.col("a"), F.col("b"))
    w2 = o.select(F.col("a"), F.col("b").alias("c"))
    tri = (w1.join(w2, "a")
           .where(F.col("b") != F.col("c"))
           .join(o.select(F.col("a").alias("b"), F.col("b").alias("c")),
                 ["b", "c"], "semi"))
    cnt = (tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
           .groupBy("node").agg(F.count(F.lit(1)).alias("triangles")))
    return (nodes.join(cnt, "node", "left")
            .select("node",
                    F.coalesce("triangles", F.lit(0).cast("long"))
                    .alias("triangles")))


def degree_histogram(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """log2-bucketed in/out degree distribution — the power-law shape
    check a web-graph audit starts with. Buckets are computed as
    length(bin(deg)) - 1 (integer floor(log2), no float boundary at
    exact powers of two; deg 0 → bucket -1), so both engines bucket
    identically. Two partial-agg shuffles for the degrees, one for the
    histogram. Returns (direction, bucket, n_nodes)."""
    outd = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_deg"))
    ind = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("in_deg"))
    z = F.lit(0).cast("long")
    degs = (nodes.join(outd, "node", "left").join(ind, "node", "left")
            .select("node",
                    F.coalesce("out_deg", z).alias("out_deg"),
                    F.coalesce("in_deg", z).alias("in_deg")))
    rows = degs.select(F.explode(F.array(
        F.struct(F.lit("out").alias("direction"),
                 F.col("out_deg").alias("deg")),
        F.struct(F.lit("in").alias("direction"),
                 F.col("in_deg").alias("deg")))).alias("r")).select("r.*")
    bucket = (F.when(F.col("deg") == 0, F.lit(-1))
              .otherwise(F.length(F.bin(F.col("deg"))) - 1)
              .cast("int"))
    return (rows.select("direction", bucket.alias("bucket"))
            .groupBy("direction", "bucket")
            .agg(F.count(F.lit(1)).alias("n_nodes")))


def anchor_text_rollup(edges: DataFrame, anchor_col: str = "anchor") -> DataFrame:
    """Per-target anchor-text signal: for every dst page, the inlink
    count, the distinct-anchor count, and the modal anchor text with its
    frequency (ties broken lexicographically). The classic web-graph
    relevance feature (anchor text describes the *target*, per the
    original Google paper) the reference's link extractor feeds but never
    aggregates.

    Scale shape: two hash aggregates — groupBy(dst, anchor) with map-side
    partial counts, then groupBy(dst) where the modal pick is a
    `min_by(anchor, struct(-cnt, anchor))` single-row agg buffer (NO
    per-dst sort, NO window over the inlink fan-in, so a 10^8-inlink hub
    costs one combine chain, not a sort). Returns
    (dst, inlinks, distinct_anchors, top_anchor, top_anchor_count)."""
    per_anchor = (edges.groupBy("dst", F.col(anchor_col).alias("anchor"))
                  .agg(F.count(F.lit(1)).alias("cnt")))
    key = F.struct((-F.col("cnt")).alias("neg"), F.col("anchor"))
    return (per_anchor.groupBy("dst")
            .agg(F.sum("cnt").cast("long").alias("inlinks"),
                 F.count(F.lit(1)).alias("distinct_anchors"),
                 F.min_by("anchor", key).alias("top_anchor"),
                 F.max("cnt").cast("long").alias("top_anchor_count")))
