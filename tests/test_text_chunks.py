"""Invariants for pmi_collocations, chunk_texts and label_centroid_drift
(values oracle-checked; these pin reconstruction fidelity and plan
shapes)."""

import math

import pyspark.sql.functions as F
import pytest

from distributed_web_crawler_spark.pipeline.similarity import (
    label_centroid_drift)
from distributed_web_crawler_spark.pipeline.text import (
    chunk_texts, pmi_collocations)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_chunk_texts_reconstructs_the_shard_stream(spark, docs):
    """Concatenating a shard's chunks in chunk order must reproduce the
    shard's documents laid end to end in doc order — the manifest is a
    faithful dataloader program. Every non-final chunk carries exactly
    ctx_len tokens."""
    out = chunk_texts(docs, ctx_len=64, n_shards=4).collect()
    by_shard: dict = {}
    maxc = {}
    for r in out:
        by_shard.setdefault(r.shard, {})[r.chunk_id] = r
        maxc[r.shard] = max(maxc.get(r.shard, -1), r.chunk_id)
    toks = {r.doc_id: r.text.strip(" ").split()
            for r in docs.select("doc_id", "text").collect()}
    for shard, chunks in by_shard.items():
        assert sorted(chunks) == list(range(maxc[shard] + 1))
        stream = " ".join(chunks[c].text for c in sorted(chunks))
        want = " ".join(" ".join(toks[d]) for d in sorted(toks)
                        if d % 4 == shard)
        # tokens() keeps the empty token a blank doc yields; rejoining
        # with single spaces is identical on both paths
        assert stream.split(" ") == want.split(" ")
        for c, r in chunks.items():
            if c < maxc[shard]:
                assert r.n_tokens == 64


def test_pmi_matches_closed_form(spark):
    """Corpus engineered so one bigram is maximally associated and one
    is independent; PMI must match the hand-computed values."""
    rows = [(1, "x y " * 10), (2, "a b " * 5 + "a c " * 5)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {(r.w1, r.w2): r for r in
           pmi_collocations(docs, min_count=5).collect()}
    for pair in (("x", "y"), ("a", "b"), ("a", "c")):
        r = got[pair]
        want = round(math.log(r.c_big * 38 / (r.c_w1 * r.c_w2)), 6)
        assert abs(r.pmi - want) < 1e-9
    # 'a' splits its right context between b and c, so c(a,b) carries
    # half the mass of c(x,y) at the same marginal structure
    assert got[("a", "b")].c_big * 2 == got[("x", "y")].c_big


def test_centroid_drift_single_label_is_zero(spark):
    emb = spark.range(32).select(
        F.col("id").alias("vec_id"), F.lit(0).alias("label"),
        F.transform(F.sequence(F.lit(1), F.lit(8)),
                    lambda i: (F.col("id") % 7 + i).cast("float") / 10.0)
        .alias("embedding"))
    rows = label_centroid_drift(emb, dim=8).collect()
    assert len(rows) == 1
    assert rows[0].centroid_cosine == 1.0 and rows[0].drift == 0.0


def test_centroid_drift_plan_has_no_explode(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = (label_centroid_drift(emb, dim=64)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Generate" not in plan          # no posexplode row blowup
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_span_corruption_reconstructs_and_masks_per_full_block(spark):
    import re

    from distributed_web_crawler_spark.pipeline.text import (
        span_corruption,
    )
    toks40 = " ".join(f"w{i}" for i in range(40))
    toks10 = " ".join(f"s{i}" for i in range(10))
    df = spark.createDataFrame([(1, toks40), (2, toks10)],
                               "doc_id long, text string")
    got = {r["doc_id"]: r
           for r in span_corruption(df, span_len=3, block=16).collect()}
    r1 = got[1]
    # 40 tokens / block 16 -> 2 full blocks, one 3-token span each
    assert r1["n_tokens"] == 40 and r1["n_masked"] == 6
    assert "<extra_id_0>" in r1["input_text"]
    assert "<extra_id_1>" in r1["input_text"]
    # target lists each sentinel followed by exactly its hidden tokens;
    # splicing targets back into the input reconstructs the original
    spans = {}
    parts = re.split(r"(<extra_id_[0-9]+>)", r1["target_text"])
    for i in range(1, len(parts), 2):
        spans[parts[i]] = parts[i + 1].strip()
    rebuilt = r1["input_text"]
    for sent, body in spans.items():
        rebuilt = rebuilt.replace(sent, body)
    assert rebuilt == toks40
    # sub-block document passes through untouched
    r2 = got[2]
    assert r2["input_text"] == toks10
    assert r2["target_text"] == "" and r2["n_masked"] == 0


def test_fim_transform_reconstructs_original(spark):
    from distributed_web_crawler_spark.pipeline.text import fim_transform

    rows = [(i, " ".join(f"t{i}_{j}" for j in range(12)))
            for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = fim_transform(df, rate_denom=2).collect()
    originals = dict(rows)
    n_applied = 0
    for r in got:
        if not r["fim_applied"]:
            assert r["text"] == originals[r["doc_id"]]
            continue
        n_applied += 1
        t = r["text"]
        assert t.startswith("<fim_prefix> ")
        body = t[len("<fim_prefix> "):]
        prefix, rest = body.split(" <fim_suffix> ", 1)
        suffix, middle = rest.split(" <fim_middle> ", 1)
        rebuilt = " ".join(x for x in (prefix, middle, suffix) if x)
        assert rebuilt == originals[r["doc_id"]], r["doc_id"]
    # the hash gate applies FIM to roughly half the docs (not 0, not all)
    assert 0 < n_applied < len(got)


def test_epoch_expansion_respects_repeat_factors(spark):
    from distributed_web_crawler_spark.pipeline.text import (
        epoch_expansion,
        mixture_weights,
    )
    # skewed corpus: srcA 2 docs, srcB 20 docs
    rows = ([(i, "srcA", f"a{i}") for i in range(2)]
            + [(100 + i, "srcB", f"b{i}") for i in range(20)])
    df = spark.createDataFrame(rows, "doc_id long, source string, "
                               "text string")
    mw = {r["source"]: r["repeat_factor"]
          for r in mixture_weights(df, alpha=0.3).collect()}
    assert mw["srcA"] > 1.0 > mw["srcB"]  # tail upsampled, head damped
    out = epoch_expansion(df, alpha=0.3).collect()
    per = {}
    for r in out:
        per.setdefault(r["doc_id"], []).append(r["copy_idx"])
    # copy_idx is always the dense 1..n prefix
    for copies in per.values():
        assert sorted(copies) == list(range(1, len(copies) + 1))
    # every document's copy count is floor(rf) or floor(rf)+1
    import math
    for r in out:
        rf = mw["srcA" if r["doc_id"] < 100 else "srcB"]
        assert len(per[r["doc_id"]]) in (math.floor(rf),
                                         math.floor(rf) + 1)
    # order keys are distinct across the whole stream (a usable shuffle)
    keys = [r["order_key"] for r in out]
    assert len(set(keys)) == len(keys)


def test_ffd_packing_invariants(spark):
    """sequence_packing_ffd: every bin respects capacity, offsets within
    a bin are the prefix sums of its members in FFD placement order
    (disjoint token spans), no document splits across bins, oversize
    documents truncate to ctx_len, and the result is run-to-run
    deterministic."""
    from distributed_web_crawler_spark.pipeline import text as ptext

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ctx = 64
    out = ptext.sequence_packing_ffd(docs, ctx_len=ctx, n_shards=4)
    rows = out.collect()
    assert len(rows) == docs.count()
    by_bin = {}
    for r in rows:
        assert 0 < r["packed_tokens"] <= ctx
        assert r["packed_tokens"] == min(r["n_tokens"], ctx)
        by_bin.setdefault((r["shard"], r["bin_id"]), []).append(r)
    for members in by_bin.values():
        members.sort(key=lambda r: r["offset_in_bin"])
        used = 0
        for r in members:
            assert r["offset_in_bin"] == used   # contiguous, disjoint
            used += r["packed_tokens"]
        assert used <= ctx
    again = ptext.sequence_packing_ffd(docs, ctx_len=ctx,
                                       n_shards=4).collect()
    key = lambda r: (r["doc_id"],)  # noqa: E731
    assert sorted(rows, key=key) == sorted(again, key=key)


def test_ffd_beats_or_ties_naive_bin_count(spark):
    """FFD must use no more bins than one-document-per-bin and no fewer
    than the token-volume lower bound ceil(total/ctx) per shard."""
    import math

    from pyspark.sql import functions as F

    from distributed_web_crawler_spark.pipeline import text as ptext

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    ctx = 64
    out = ptext.sequence_packing_ffd(docs, ctx_len=ctx, n_shards=4)
    per_shard = (out.groupBy("shard")
                 .agg((F.max("bin_id") + 1).alias("bins"),
                      F.sum("packed_tokens").alias("toks"),
                      F.count("*").alias("n")).collect())
    for r in per_shard:
        assert math.ceil(r["toks"] / ctx) <= r["bins"] <= r["n"]


def test_epoch_shuffle_determinism_and_epoch_power(spark):
    """epoch_shuffle: identical across re-runs, a bijection over the
    corpus, positions are 1..|shard| per shard, and a DIFFERENT epoch
    yields a genuinely different order (the permutation has power)."""
    from distributed_web_crawler_spark.pipeline import text as ptext

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = ptext.epoch_shuffle(docs, epoch=1, n_shards=4).collect()
    b = ptext.epoch_shuffle(docs, epoch=1, n_shards=4).collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted(a, key=key) == sorted(b, key=key)
    assert len({r["doc_id"] for r in a}) == len(a) == docs.count()
    per_shard = {}
    for r in a:
        per_shard.setdefault(r["shard"], []).append(r["position"])
    for ps in per_shard.values():
        assert sorted(ps) == list(range(1, len(ps) + 1))
    c = ptext.epoch_shuffle(docs, epoch=2, n_shards=4).collect()
    order1 = [r["doc_id"] for r in sorted(a, key=lambda r:
                                          (r["shard"], r["position"]))]
    order2 = [r["doc_id"] for r in sorted(c, key=lambda r:
                                          (r["shard"], r["position"]))]
    assert order1 != order2
