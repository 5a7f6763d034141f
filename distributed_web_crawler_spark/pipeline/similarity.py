"""Approximate-nearest-neighbor search over `embeddings.embedding`.

Baseline: brute-force cosine top-k per query — broadcast the (small) query
set against every vector, dot products via JVM higher-order functions
(`zip_with` + `aggregate`, whole-stage codegen), rank with a per-query
window. One shuffle (the window), no Python.

Scale path (IVF): k-means-free inverted file — centroids are a
deterministic sample of the corpus, every vector is assigned to its nearest
centroid once (broadcast join), and a query probes only its `nprobe`
closest lists. Recall trades against nprobe; probing all lists equals brute
force. At 10^10 vectors the assignment is the only full scan; each query
touches ~nprobe/n_lists of the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _unit(col) -> F.Column:
    norm = F.sqrt(F.aggregate(col, F.lit(0.0), lambda a, x: a + x * x))
    return F.transform(col, lambda x: x / norm)


def _cos(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def brute_force_topk(embeddings: DataFrame, queries: DataFrame,
                     k: int = 5) -> DataFrame:
    """Top-k cosine neighbors per query (excluding self).

    queries: (query_id, embedding). Returns (query_id, vec_id, cosine, rank).
    """
    corpus = embeddings.select(
        "vec_id", _unit(F.col("embedding")).alias("unit"))
    q = queries.select(
        "query_id", _unit(F.col("embedding")).alias("q_unit"))
    scored = (
        corpus.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id",
                F.round(_cos(F.col("q_unit"), F.col("unit")), 6).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))


def ivf_assign(embeddings: DataFrame, n_lists: int = 16) -> tuple[DataFrame, DataFrame]:
    """Deterministic centroids (every ⌈n/n_lists⌉-th vector by vec_id) and
    list assignment of every vector to its max-cosine centroid."""
    w = Window.orderBy("vec_id")
    total = embeddings.count()
    step = max(1, total // n_lists)
    centroids = (
        embeddings.withColumn("_rn", F.row_number().over(w))
        .where((F.col("_rn") - 1) % step == 0).limit(n_lists)
        .select(F.col("vec_id").alias("list_id"),
                _unit(F.col("embedding")).alias("c_unit"))
    )
    corpus = embeddings.select("vec_id", _unit(F.col("embedding")).alias("unit"))
    scored = corpus.join(F.broadcast(centroids))
    w2 = Window.partitionBy("vec_id").orderBy(
        F.col("sim").desc(), F.col("list_id"))
    assigned = (
        scored.withColumn("sim", _cos(F.col("unit"), F.col("c_unit")))
        .withColumn("_r", F.row_number().over(w2)).where(F.col("_r") == 1)
        .select("vec_id", "list_id", "unit")
    )
    return centroids, assigned


def ivf_topk(embeddings: DataFrame, queries: DataFrame, k: int = 5,
             n_lists: int = 16, nprobe: int = 4) -> DataFrame:
    """ANN top-k probing the nprobe nearest inverted lists per query."""
    centroids, assigned = ivf_assign(embeddings, n_lists)
    q = queries.select("query_id", _unit(F.col("embedding")).alias("q_unit"))
    qc = q.join(F.broadcast(centroids))
    w = Window.partitionBy("query_id").orderBy(
        F.col("csim").desc(), F.col("list_id"))
    probe_lists = (
        qc.withColumn("csim", _cos(F.col("q_unit"), F.col("c_unit")))
        .withColumn("_r", F.row_number().over(w)).where(F.col("_r") <= nprobe)
        .select("query_id", "q_unit", "list_id")
    )
    scored = (
        probe_lists.join(assigned, "list_id")
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id",
                F.round(_cos(F.col("q_unit"), F.col("unit")), 6).alias("cosine"))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w2))
            .where(F.col("rank") <= k))
