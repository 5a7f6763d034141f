"""Synthetic web invariants: determinism, codec fidelity, parity of the
python hash with Spark's sha2 (the D1/D2 correctness hinge)."""

import numpy as np

from distributed_web_crawler_spark.config import SynthWebConfig
from distributed_web_crawler_spark.crawl import synthweb as W

CFG = SynthWebConfig()


def test_page_pure_function_of_url():
    url = CFG.url(0, 0)
    a, b = W.page_for_url(url, CFG), W.page_for_url(url, CFG)
    assert a["bytes"] == b["bytes"]
    assert a["links"] == b["links"]
    assert a["caption"] == b["caption"]
    assert a["phash"] == b["phash"]


def test_bad_urls_fail_fetch():
    assert W.page_for_url("not a url", CFG) is None
    assert W.page_for_url("http://outside.other.org/x", CFG) is None
    assert W.page_for_url(CFG.url(0, 10 ** 6), CFG) is None  # 404


def test_codec_lossless_and_lossy_psnr():
    checked = {"png": 0, "jpeg": 0}
    for i in range(CFG.n_hosts):
        for j in range(min(4, CFG.n_pages(i))):
            url = CFG.url(i, j)
            page = W.page_for_url(url, CFG)
            orig = W.original_pixels_for_url(url, CFG)
            dec, fmt = W.decode_image(page["bytes"])
            assert fmt == page["fmt"]
            assert dec.shape == (page["h"], page["w"]) == orig.shape
            if fmt == "png":
                assert np.array_equal(dec, orig)  # lossless allclose
            else:
                assert W.psnr(orig, dec) >= 40.0  # input_hint lossy bound
            checked[fmt] += 1
    assert checked["png"] > 0 and checked["jpeg"] > 0


def test_duplicate_groups_exist():
    hashes = {}
    for i in range(CFG.n_hosts):
        for j in range(CFG.n_pages(i)):
            p = W.page_for_url(CFG.url(i, j), CFG)
            hashes.setdefault(
                W.content_hash_py(p["bytes"], p["caption"]), []).append((i, j))
    dup_groups = [v for v in hashes.values() if len(v) > 1]
    assert dup_groups, "synthetic web must contain duplicate content"


def test_content_hash_matches_spark_sha2(spark):
    from pyspark.sql import functions as F
    pages = [W.page_for_url(CFG.url(i, 0), CFG) for i in range(4)]
    df = spark.createDataFrame(
        [(p["bytes"], p["caption"]) for p in pages], "bytes binary, caption string")
    got = [r[0] for r in df.select(
        F.sha2(F.concat("bytes", F.encode("caption", "utf-8")), 256)).collect()]
    want = [W.content_hash_py(p["bytes"], p["caption"]) for p in pages]
    assert got == want


def test_robots_substring_semantics():
    host = CFG.host_name(5)  # 5 % robots_every == 0, host > 0
    rules = W.robots_disallow_for_host(host, CFG)
    assert rules == list(CFG.robots_disallow)
    assert W.robots_disallow_for_host(CFG.host_name(1), CFG) == []
    # substring match blocks /p/3 and /p/30 alike (reference bug preserved)
    assert any(p in f"http://{host}/p/30" for p in rules)
