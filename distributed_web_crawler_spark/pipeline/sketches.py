"""Sketch-and-sample operators for corpus statistics at 100 TB scale:
mergeable HyperLogLog distinct counting, count-min heavy-hitter
estimation, and weighted reservoir sampling (Efraimidis-Spirakis).

All three answer the same scale question — "how do you summarize a
column you cannot afford to shuffle exactly?" — with bounded state:

* HLL registers are a fixed m-row table per group; the register build
  is a partial-aggregatable max, so the shuffle carries at most
  groups x m rows regardless of input size, and sketches for disjoint
  data unite by max — the property that lets per-partition /
  per-day sketches roll up without touching raw data again.
* A count-min sketch is a fixed d x w grid of additive counters, so
  the build is a map-side-combinable sum; point estimates then read
  d cells.  Estimates only ever OVER-count (collisions add), never
  under — asserted in tests.
* Weighted reservoir sampling keys every row by ln(u)/weight with a
  deterministic per-row uniform u and keeps the per-group top-k — a
  single partial top-k (WindowGroupLimit), no global sort, and the
  hash-derived u makes the "random" sample reproducible and
  oracle-checkable.

Everything is pure Catalyst (built-in functions only — no UDFs); hash
randomness comes from ``xxhash64``, mirrored bit-exactly in
functions/xxh64.py so DuckDB oracles can restate the relational part
over mirrored hash VALUES.

Reference parity: the reference keeps exact per-URL / per-domain state
in Cassandra (pages PK + idx_content_hash, /root/reference/
schema.cql:6-17; crawl_state, schema.cql:19-24); these sketches are the
bounded-memory analogs a 10^10-URL frontier needs for the same
questions (how many distinct? which hosts are hot? which rows to keep?)
once exact per-key state stops fitting.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens

# Registers are capped so 2^(CAP - reg) stays in BIGINT headroom:
# sum over m=256 buckets of 2^40 is 2^48, exactly representable both as
# BIGINT and as a double (< 2^53) — the harmonic sum is computed in
# INTEGER arithmetic so no engine's float-summation order can perturb it.
_HLL_RHO_CAP = 40


def ngram_rows(documents: DataFrame, n: int = 3,
               text_col: str = "text") -> DataFrame:
    """(source, gram) rows: every n-token window of every document.
    Documents shorter than n tokens emit nothing (the shingles()
    contract in pipeline/dedup.py)."""
    t = tokens(F.lower(F.col(text_col)))
    grams = F.when(
        F.size(t) >= n,
        F.transform(F.sequence(F.lit(1), F.size(t) - n + 1),
                    lambda i: F.concat_ws(" ", F.slice(t, i, n))))
    return documents.select("source", F.explode(grams).alias("gram"))


def _hll_rho(h: Column, p: int) -> Column:
    """Leading-zero rank of the (64-p)-bit suffix of hash h, computed
    exactly with integer bit-length (length(bin(w))) — no float log2,
    whose rounding at exact powers of two differs per engine."""
    w = F.shiftrightunsigned(h, p)
    return F.when(w == 0, F.lit(65 - p)).otherwise(
        F.lit(65 - p) - F.length(F.bin(w)))


def hll_distinct(documents: DataFrame, n: int = 3, p: int = 8,
                 text_col: str = "text") -> DataFrame:
    """Per-source approximate distinct n-gram count via an explicit
    HyperLogLog sketch (Flajolet et al. 2007), next to the exact answer
    so the estimate is auditable: (source, exact_distinct,
    hll_estimate, rel_error).

    Plan shape: one token explode feeds BOTH aggregates; the sketch
    side shuffles at most groups x 2^p register rows (max is
    partial-aggregated map-side), the exact side is the plain distinct
    shuffle the sketch exists to avoid at scale.  The estimate math
    (harmonic mean + small-range linear counting) runs on an integer
    harmonic sum — sum(2^(CAP-reg)) as BIGINT — so it is bit-exact
    across engines; only the final ln() carries 1-ulp latitude,
    absorbed by round(.., 6).
    """
    m = 1 << p
    # alpha_m * m^2, computed once in Python and embedded as the same
    # literal in the oracle SQL so both engines divide by one constant.
    alpha_m2 = (0.7213 / (1.0 + 1.079 / m)) * m * m
    grams = ngram_rows(documents, n=n, text_col=text_col)
    h = F.xxhash64("gram")
    regs = (grams
            .select("source",
                    h.bitwiseAND(F.lit(m - 1)).alias("bucket"),
                    F.least(_hll_rho(h, p), F.lit(_HLL_RHO_CAP))
                    .alias("rho"))
            .groupBy("source", "bucket")
            .agg(F.max("rho").alias("reg")))
    pow2 = F.pow(F.lit(2.0), F.lit(_HLL_RHO_CAP) - F.col("reg"))
    agg = (regs.groupBy("source")
           .agg(F.count(F.lit(1)).alias("present"),
                F.sum(pow2.cast("long")).alias("s_int")))
    zeros = F.lit(m) - F.col("present")
    s_full = F.col("s_int") + zeros * F.lit(1 << _HLL_RHO_CAP)
    s = s_full.cast("double") / F.lit(float(1 << _HLL_RHO_CAP))
    e_raw = F.lit(alpha_m2) / s
    est = F.when((e_raw <= F.lit(2.5 * m)) & (zeros > 0),
                 F.lit(float(m)) * F.log(F.lit(float(m))
                                         / zeros.cast("double"))
                 ).otherwise(e_raw)
    sketch = agg.select("source", F.round(est, 6).alias("hll_estimate"))
    exact = (grams.groupBy("source")
             .agg(F.countDistinct("gram").alias("exact_distinct")))
    return (exact.join(sketch, "source")
            .select("source", "exact_distinct", "hll_estimate",
                    F.round((F.col("hll_estimate")
                             - F.col("exact_distinct").cast("double"))
                            / F.col("exact_distinct").cast("double"), 6)
                    .alias("rel_error")))


def cms_heavy_hitters(documents: DataFrame, d: int = 4, w: int = 16,
                      k: int = 20, text_col: str = "text") -> DataFrame:
    """Token heavy hitters with a count-min sketch estimate beside the
    exact count: (token, exact_count, cms_estimate, overestimate).

    The sketch is d rows x w columns of additive counters; each token
    occurrence increments cell (r, xxhash64(token, r) mod w) for every
    row r, and a point estimate is the MIN over the d cells — an upper
    bound on the true count (Cormode-Muthukrishnan 2005).  w is kept
    deliberately small here so collisions (and hence visible
    overestimates) actually occur at test scale.

    Plan shape: the exact frequency table is computed once (one token
    shuffle with map-side partial counts) and REUSED three ways — as
    the sketch increments (sum of per-token counts == sum of
    occurrence increments), as the top-k candidate list
    (TakeOrderedAndProject, no global sort), and as the ground truth
    column.  The probe joins candidates to the <= d*w-cell sketch,
    which Spark broadcasts.  At 100 TB the sketch build is one
    map-side-combinable pass; nothing driver-side ever holds more than
    the d x w grid.
    """
    tok = (documents
           .select(F.explode(tokens(F.lower(F.col(text_col))))
                   .alias("token"))
           .where(F.col("token") != ""))
    freq = tok.groupBy("token").agg(F.count(F.lit(1)).alias("exact_count"))
    cols = F.array(*[
        F.pmod(F.xxhash64("token", F.lit(r).cast("long")), F.lit(w))
        for r in range(d)])
    hashed = freq.select("token", "exact_count",
                         F.posexplode(cols).alias("r", "col"))
    sketch = (hashed.groupBy("r", "col")
              .agg(F.sum("exact_count").alias("cell")))
    cand = (freq.orderBy(F.desc("exact_count"), "token").limit(k)
            .select("token", "exact_count",
                    F.posexplode(cols).alias("r", "col")))
    return (cand.join(F.broadcast(sketch), ["r", "col"])
            .groupBy("token", "exact_count")
            .agg(F.min("cell").alias("cms_estimate"))
            .select("token", "exact_count", "cms_estimate",
                    (F.col("cms_estimate") - F.col("exact_count"))
                    .alias("overestimate")))


def weighted_reservoir(documents: DataFrame, k: int = 8,
                       weight_col: str = "n_chars",
                       denom: int = 1 << 30) -> DataFrame:
    """Per-source weighted sample without replacement of k documents,
    P(doc) proportional to its weight: the Efraimidis-Spirakis A-Res
    scheme keeps the k largest values of u^(1/weight), here ranked in
    the equivalent log domain ln(u)/weight (monotone, and float-safe
    at tiny exponents).

    The per-row uniform u = (pmod(xxhash64(doc_id), denom)+1)/denom is
    hash-derived, so the sample is deterministic, reproducible across
    retries/partitionings, and exactly mirrorable by the oracle.  Keys
    are quantized to 1e-9 before ranking with a doc_id tie-break (the
    repo-wide cross-engine float-ranking contract), since ln() has
    1-ulp latitude between engines.

    Plan shape: one projection + one per-group top-k
    (WindowGroupLimit): rank k is a running partial top-k per
    partition, never a global sort — the same shape as L3 priority
    ordering.  Returns (source, doc_id, weight, samp_key, wr_rank).
    """
    from pyspark.sql import Window

    u = ((F.pmod(F.xxhash64("doc_id"), F.lit(denom)) + 1)
         / F.lit(float(denom)))
    key = F.round(F.log(u) / F.col(weight_col).cast("double"), 9)
    win = Window.partitionBy("source").orderBy(F.desc("samp_key"), "doc_id")
    return (documents
            .select("source", "doc_id",
                    F.col(weight_col).alias("weight"),
                    key.alias("samp_key"))
            .withColumn("wr_rank", F.row_number().over(win))
            .where(F.col("wr_rank") <= k))
