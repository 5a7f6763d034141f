"""Unit coverage for caption alignment, SCD2 merge, fertility, Wilson."""

import math

from distributed_web_crawler_spark.pipeline.similarity import (
    caption_alignment,
)
from distributed_web_crawler_spark.pipeline.text import (
    source_quality_bounds, tokenizer_fertility,
)
from distributed_web_crawler_spark.tables.scd import scd2_merge


def test_caption_alignment_pairs_and_drops_unpaired_tail(spark):
    rows = [(0, [1.0, 0.0], 3), (1, [1.0, 0.0], 3),   # aligned, same label
            (2, [1.0, 0.0], 1), (3, [-1.0, 0.0], 2),  # anti-aligned
            (4, [0.0, 1.0], 5)]                       # unpaired tail
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    got = {r.pair_id: r for r in caption_alignment(df, 0.1).collect()}
    assert set(got) == {0, 1}  # pair 2 (vec 4) dropped: no caption row
    assert got[0].cosine == 1.0 and got[0].aligned and got[0].label_match
    assert got[1].cosine == -1.0 and not got[1].aligned
    assert not got[1].label_match


def test_scd2_merge_all_four_branches(spark):
    old = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "key long, v long")
    new = spark.createDataFrame(
        [(1, 10), (2, 99), (4, 40)], "key long, v long")
    out = scd2_merge(old, new, "key", "v").collect()
    rows = {(r.key, r.content, r.valid_from, r.valid_to, r.is_current)
            for r in out}
    assert rows == {
        (1, 10, 0, None, True),    # unchanged -> carried open row
        (2, 20, 0, 1, False),      # changed   -> closed ...
        (2, 99, 1, None, True),    # ... + new open
        (3, 30, 0, 1, False),      # deleted   -> closed only
        (4, 40, 1, None, True),    # inserted  -> open only
    }


def test_scd2_exactly_one_current_row_per_live_key(spark):
    old = spark.createDataFrame([(i, i % 5) for i in range(50)],
                                "key long, v long")
    new = spark.createDataFrame([(i, (i * 3) % 5) for i in range(10, 60)],
                                "key long, v long")
    out = scd2_merge(old, new, "key", "v").toPandas()
    cur = out[out.is_current]
    assert cur.key.is_unique
    assert set(cur.key) == set(range(10, 60))  # live = new snapshot keys


def test_tokenizer_fertility_hand_check(spark):
    docs = spark.createDataFrame(
        [(0, "ab cd, ef", "en", "s1", 9), (1, "xyz", "en", "s1", 3)],
        "doc_id long, text string, lang string, source string, n_chars long")
    r = tokenizer_fertility(docs).collect()[0]
    # doc0: 3 words, subtokens = 3 alnum runs + 1 punct = 4; doc1: 1 & 1
    assert (r.words, r.subtokens, r.fertility) == (4, 5, round(5 / 4, 6))
    assert r.chars_per_subtoken == round(12 / 5, 6)


def test_wilson_bound_matches_closed_form_and_orders_small_sources(spark):
    docs = spark.createDataFrame(
        # s_small: 3/3 pass; s_big: 950/1000 pass — Wilson must flip them
        [(i, "the and for with that this " * 20, "en",
          "s_small" if i < 3 else "s_big", 100)
         for i in range(1003)]
        + [(2000 + i, "!!!", "und", "s_big", 3) for i in range(50)],
        "doc_id long, text string, lang string, source string, n_chars long")
    got = {r.source: r for r in source_quality_bounds(docs).collect()}
    assert got["s_small"].pass_rate == 1.0
    assert got["s_big"].pass_rate < 1.0

    def wilson(p, n, z=1.96):
        return ((p + z * z / (2 * n)
                 - z * math.sqrt((p * (1 - p) + z * z / (4 * n)) / n))
                / (1 + z * z / n))

    for s in ("s_small", "s_big"):
        r = got[s]
        assert abs(r.wilson_lb - wilson(r.passes / r.n_docs, r.n_docs)) < 1e-6
    assert got["s_big"].wilson_lb > got["s_small"].wilson_lb
