"""Corpus deduplication operators (training-data pipeline).

Five families over the `documents` / `embeddings` tables, each designed
around its shuffle profile at 100 TB:

- exact: hash-groupBy — one shuffle on a 64-hex key, map-side combine free.
- n-gram Jaccard: shingle-explode + self-join on shingle. The join key is
  the shingle hash; hot shingles are capped by document frequency before
  the join (a shingle in >max_df docs generates O(df²) candidate pairs —
  dropping them bounds the blowup and barely affects recall).
- MinHash + LSH: per-doc signatures via `min(xxhash64(shingle, band_seed))`
  aggregates (JVM-side, no UDF), banded into buckets; bucket-join emits
  candidates, exact Jaccard verifies. Shuffle is O(docs × bands), never
  O(docs²).
- SimHash: 64-bit signature via numpy in one applyInPandas; near-dups are
  bucket-joined on rotated prefix bands (Hamming ≤ k search).
- Embedding cosine: brute-force for small sets; random-hyperplane LSH
  bucketing as the scale path (pipeline/similarity.py shares the planes).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


# --------------------------------------------------------------------------
# exact
# --------------------------------------------------------------------------

def exact_dedup(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Keep the min-doc_id representative per identical text (md5 key —
    same operator shape as crawl D1)."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy("doc_id")
    return (documents.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn"))


# --------------------------------------------------------------------------
# shingles + n-gram Jaccard
# --------------------------------------------------------------------------

def shingles(documents: DataFrame, n: int = 3,
             text_col: str = "text") -> DataFrame:
    """(doc_id, shingle) pairs: word n-grams, distinct per doc. Built from
    explode + slice over the token array — JVM-side."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    df = documents.select(
        "doc_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
                lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
            )
        ).alias("shingle"),
    ).where(F.size(toks) >= n)
    return df.distinct()


def ngram_jaccard_pairs(documents: DataFrame, n: int = 3,
                        threshold: float = 0.5, max_df: int = 100,
                        text_col: str = "text") -> DataFrame:
    """Near-duplicate pairs (a<b) with Jaccard(shingles) ≥ threshold.

    Self-join on shingle with a document-frequency cap; Jaccard from
    |∩| / (|A|+|B|-|∩|). Returns (doc_a, doc_b, jaccard)."""
    sh = shingles(documents, n, text_col)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    dfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    sh_capped = sh.join(dfreq.where(F.col("df") <= max_df), "shingle", "inner") \
                  .select("doc_id", "shingle")
    a = sh_capped.alias("a")
    b = sh_capped.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("n_common"))
    )
    return (
        common
        .join(sizes.withColumnRenamed("doc_id", "doc_a")
              .withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn("jaccard", F.round(
            F.col("n_common") /
            (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

def minhash_signatures(documents: DataFrame, num_hashes: int = 16,
                       n: int = 3, text_col: str = "text") -> DataFrame:
    """num_hashes column-wise min-aggregates of seeded xxhash64 over the
    doc's shingles — one shuffle, no Python."""
    sh = shingles(documents, n, text_col)
    aggs = [F.min(F.xxhash64("shingle", F.lit(i))).alias(f"mh{i}")
            for i in range(num_hashes)]
    return sh.groupBy("doc_id").agg(*aggs)


def minhash_lsh_verified(documents: DataFrame, num_hashes: int = 16,
                         bands: int = 4, n: int = 3, threshold: float = 0.5,
                         text_col: str = "text") -> DataFrame:
    """LSH candidates ∩ exact-Jaccard verification (the production shape)."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(documents, num_hashes, n, text_col)
    stacked = sigs.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(
                F.lit(bnd).alias("band_no"),
                F.hash(*[F.col(f"mh{bnd * rows_per_band + i}")
                         for i in range(rows_per_band)]).alias("bkt"))
            for bnd in range(bands)])).alias("bb"),
    ).select("doc_id", "bb.band_no", "bb.bkt")
    a, b = stacked.alias("a"), stacked.alias("b")
    cands = (
        a.join(b, (F.col("a.band_no") == F.col("b.band_no"))
               & (F.col("a.bkt") == F.col("b.bkt"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sh = shingles(documents, n, text_col)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    n_common = (
        cands.join(sh_a, "doc_a").join(sh_b, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b").agg(F.count("*").alias("n_common"))
    )
    return (
        n_common
        .join(sizes.withColumnRenamed("doc_id", "doc_a")
              .withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn("jaccard", F.round(
            F.col("n_common") /
            (F.col("n_a") + F.col("n_b") - F.col("n_common")), 6))
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

SIMHASH_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("simhash", T.LongType()),
])


def simhash_signatures(documents: DataFrame,
                       text_col: str = "text") -> DataFrame:
    """64-bit SimHash per doc: sign of per-bit sums of token hashes.
    Token hashes come from xxhash64 JVM-side; the bit math is vectorized
    numpy over Arrow batches (one applyInPandas per doc-partition)."""
    toks = (documents
            .select("doc_id", F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), r"\s+")).alias("tok"))
            .withColumn("th", F.xxhash64("tok")))

    def sig(key, pdf: pd.DataFrame) -> pd.DataFrame:
        h = pdf["th"].to_numpy().astype(np.uint64)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & 1).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        val = 0
        for i in range(63, -1, -1):
            val = (val << 1) | int(votes[i] > 0)
        val = val - (1 << 64) if val >= (1 << 63) else val
        return pd.DataFrame({"doc_id": [key[0]],
                             "simhash": pd.array([val], dtype="Int64")})

    return toks.groupBy("doc_id").applyInPandas(sig, SIMHASH_SCHEMA)


def simhash_neardup_pairs(documents: DataFrame, max_hamming: int = 8,
                          text_col: str = "text") -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming, candidate
    generation via 4 16-bit prefix bands (any pair within Hamming 3 shares
    ≥1 exact band; wider distances trade recall for the bounded join)."""
    sigs = simhash_signatures(documents, text_col)
    bands = sigs.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("band_no"),
                     F.shiftright("simhash", i * 16).bitwiseAND(F.lit(0xFFFF))
                     .alias("bkt"))
            for i in range(4)])).alias("bb"),
    ).select("doc_id", "simhash", "bb.band_no", "bb.bkt")
    a, b = bands.alias("a"), bands.alias("b")
    cands = (
        a.join(b, (F.col("a.band_no") == F.col("b.band_no"))
               & (F.col("a.bkt") == F.col("b.bkt"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.col("a.simhash").alias("sh_a"),
                F.col("b.simhash").alias("sh_b"))
        .distinct()
    )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (cands.withColumn("hamming", hamming)
            .where(F.col("hamming") <= max_hamming)
            .select("doc_a", "doc_b", "hamming"))


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------

def embedding_neardup_pairs(embeddings: DataFrame, threshold: float = 0.95,
                            use_lsh: bool = False, n_planes: int = 8,
                            plane_seed: int = 7) -> DataFrame:
    """Pairs (a<b) with cosine ≥ threshold over `embedding:array<float>`.

    Brute force: O(n²) crossJoin with JVM higher-order dot products — fine
    for verification scale. use_lsh=True buckets by random-hyperplane sign
    bits first (candidates share a bucket), the 100 TB path; recall <1 for
    pairs straddling a plane — raise n_planes/permutations to trade."""
    norm = F.sqrt(F.aggregate("embedding", F.lit(0.0),
                              lambda acc, x: acc + x * x))
    e = embeddings.select(
        F.col("vec_id"),
        F.transform("embedding",
                    lambda x: x / norm).alias("unit"),
    )
    if use_lsh:
        rng = np.random.default_rng(plane_seed)
        # deterministic planes; dim read lazily from first row is an action,
        # so planes are sized generously and sliced by zip_with semantics
        dim = len(embeddings.select("embedding").first()["embedding"])
        planes = rng.standard_normal((n_planes, dim)).tolist()
        sign_bits = [
            (F.aggregate(F.zip_with("unit", F.array(*[F.lit(float(v)) for v in p]),
                                    lambda a_, b_: a_ * b_),
                         F.lit(0.0), lambda acc, x: acc + x) > 0).cast("int")
            for p in planes
        ]
        bucket = sum((bit * F.lit(2 ** i) for i, bit in enumerate(sign_bits)),
                     F.lit(0))
        e = e.withColumn("bucket", bucket)
        a, b = e.alias("a"), e.alias("b")
        joined = a.join(b, (F.col("a.bucket") == F.col("b.bucket"))
                        & (F.col("a.vec_id") < F.col("b.vec_id")))
    else:
        a, b = e.alias("a"), e.alias("b")
        joined = a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
    cos = F.aggregate(
        F.zip_with(F.col("a.unit"), F.col("b.unit"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)
    return (joined
            .select(F.col("a.vec_id").alias("vec_a"),
                    F.col("b.vec_id").alias("vec_b"),
                    F.round(cos, 6).alias("cosine"))
            .where(F.col("cosine") >= threshold))
