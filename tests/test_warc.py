"""WARC segmentation: pointer-parse semantics the oracle can't probe."""

import hashlib

import pytest

from distributed_web_crawler_spark.sources.warc import (
    _parse_blob, build_warc_record, parse_warc,
)


def test_body_containing_warc_magic_is_not_split():
    # delimiter-splitting parsers break here; Content-Length must win
    body = "prefix\r\n\r\nWARC/1.0\r\nWARC-Type: response\r\n\r\nsuffix"
    blob = build_warc_record("http://a/1", body) + \
        build_warc_record("http://a/2", "tail")
    recs = list(_parse_blob(7, blob))
    assert [r[1] for r in recs] == ["http://a/1", "http://a/2"]
    assert recs[0][2] == len(body)
    assert recs[0][4] == hashlib.sha256(body.encode()).hexdigest()
    assert recs[1][3] == len(build_warc_record("http://a/1", body))


def test_truncated_record_raises():
    blob = build_warc_record("http://a/1", "hello")[:-6]  # cuts into body
    with pytest.raises(ValueError, match="truncated record at"):
        list(_parse_blob(0, blob))
    hdr_cut = blob[:blob.index("\r\n\r\n")]  # no header terminator at all
    with pytest.raises(ValueError, match="truncated record header"):
        list(_parse_blob(0, hdr_cut))


def test_bad_magic_raises():
    with pytest.raises(ValueError, match="bad WARC magic"):
        list(_parse_blob(0, "HTTP/1.1 200 OK\r\n\r\n"))


def test_parse_warc_dataframe_roundtrip(spark):
    blob = "".join(build_warc_record(f"http://h/{i}", "x" * (i + 1))
                   for i in range(5))
    out = parse_warc(spark.createDataFrame(
        [(0, blob)], "blob_id long, data string")).collect()
    assert len(out) == 5
    assert [r.content_length for r in out] == [1, 2, 3, 4, 5]
    assert out[0].rec_offset == 0
    # offsets are strictly increasing and match the record sizes
    for a, b, i in zip(out, out[1:], range(1, 5)):
        assert b.rec_offset - a.rec_offset == \
            len(build_warc_record(f"http://h/{i - 1}", "x" * i))


def test_warc_export_roundtrip_and_index(spark, tmp_path):
    """Export shards to real files, re-ingest with parse_warc, and check
    the relational cdx index (warc_export_index) describes the files
    EXACTLY: same shard membership, offsets, lengths, and per-record
    body hashes — export → ingest is the identity."""
    import hashlib

    from pyspark.sql import functions as F

    from distributed_web_crawler_spark.sources.warc import (
        export_warc_shards,
        parse_warc,
        warc_export_index,
    )

    rows = [(f"https://h{i % 3}.example.com/p/{i}",
             f"body {i} " + "x" * (i * 7 % 50) +
             ("WARC/1.0\r\n" if i % 4 == 0 else ""))  # magic inside body
            for i in range(23)]
    # row-per-fetch stores carry the SAME uri twice with different
    # bodies — offsets must still be a total order shared by index and
    # writer (tie-break on the record hash)
    rows += [(rows[0][0], "refetched body, different content"),
             (rows[5][0], "another refetch")]
    pages = spark.createDataFrame(rows, "uri string, body string")
    out = str(tmp_path / "warc")

    receipts = {r["shard"]: r for r in
                export_warc_shards(pages, out, n_shards=3).collect()}
    idx = warc_export_index(pages, n_shards=3).collect()
    assert {r["shard"] for r in idx} == set(receipts)
    assert sum(r["n_records"] for r in receipts.values()) == len(rows)

    # read the files back through the segmenter
    blobs = []
    for shard, rec in receipts.items():
        with open(rec["path"], encoding="utf-8", newline="") as f:
            data = f.read()
        assert len(data) == rec["total_chars"]
        blobs.append((shard, data))
    parsed = parse_warc(
        spark.createDataFrame(blobs, "blob_id long, data string")).collect()

    from distributed_web_crawler_spark.sources.warc import (
        build_warc_record,
    )
    rec_to_body = {
        hashlib.sha256(build_warc_record(u, b).encode()).hexdigest():
        hashlib.sha256(b.encode()).hexdigest() for u, b in rows}
    got = {(r["blob_id"], r["rec_offset"]): r for r in parsed}
    assert len(got) == len(rows)
    for r in idx:
        p = got[(r["shard"], r["rec_offset"])]   # seek via the cdx
        assert p["uri"] == r["uri"]
        assert p["content_length"] == r["content_length"]
        # the record at that offset is the exact record the index row
        # describes — duplicate URIs land at distinct, correct offsets
        assert p["body_sha256"] == rec_to_body[r["record_sha256"]]
