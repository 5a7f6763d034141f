"""WARC-style record segmentation: turn concatenated crawl-archive blobs
into one row per response record.

The reference stores each fetched page as its own row (crawler/
PageProcessor.java -> Cassandra pages table); real web-scale corpora
arrive instead as concatenated WARC files (Common Crawl), so the engine
needs a record segmenter as a *source*. Implemented as `mapInPandas`:
blobs stay whole inside one Arrow batch, the parse is pointer-driven off
each record's ``Content-Length`` header (the only correct way — bodies
may legally contain the ``WARC/1.0`` magic, so delimiter splitting is
wrong), and each record emits its byte offset so downstream point reads
can seek straight into the archive.

Scale shape: map-only (no shuffle); one task per input split of blobs;
the Python cost is one linear scan per blob with O(records) small-string
slices — the same shape as a JVM WARC InputFormat. Offsets make the
output a valid external index over the raw archive (the "cdx" file
Common Crawl ships next to every WARC).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

OUT_SCHEMA = ("blob_id long, uri string, content_length long, "
              "rec_offset long, body_sha256 string")

_MAGIC = "WARC/1.0\r\n"
_HDR_END = "\r\n\r\n"


def _parse_blob(blob_id: int, data: str):
    """Pointer-driven record walk; yields (uri, clen, offset, sha)."""
    pos, n = 0, len(data)
    while pos < n:
        if not data.startswith(_MAGIC, pos):
            raise ValueError(f"bad WARC magic at offset {pos}")
        hdr_end = data.find(_HDR_END, pos)
        if hdr_end < 0:
            raise ValueError(f"truncated record header at offset {pos}")
        headers = {}
        for line in data[pos + len(_MAGIC):hdr_end].split("\r\n"):
            k, _, v = line.partition(": ")
            headers[k] = v
        clen = int(headers["Content-Length"])
        body_start = hdr_end + len(_HDR_END)
        body = data[body_start:body_start + clen]
        if len(body) != clen:
            raise ValueError(f"truncated record at offset {pos}")
        yield (blob_id, headers["WARC-Target-URI"], clen, pos,
               hashlib.sha256(body.encode()).hexdigest())
        pos = body_start + clen + len(_HDR_END)  # record trailer CRLFCRLF


def parse_warc(blobs: DataFrame, blob_id_col: str = "blob_id",
               data_col: str = "data") -> DataFrame:
    """(blob_id, data) -> one row per WARC response record with its
    byte offset into the blob and the body's sha256."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [rec for bid, data in
                    zip(pdf[blob_id_col], pdf[data_col])
                    for rec in _parse_blob(int(bid), data)]
            yield pd.DataFrame(rows, columns=[
                "blob_id", "uri", "content_length", "rec_offset",
                "body_sha256"])
    return blobs.mapInPandas(run, OUT_SCHEMA)


def build_warc_record(uri: str, body: str) -> str:
    """Golden-side record builder (tests + blob synthesis mirror)."""
    return (f"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: {uri}"
            f"\r\nContent-Length: {len(body)}\r\n\r\n{body}\r\n\r\n")


def warc_export_index(pages: DataFrame, uri_col: str = "uri",
                      body_col: str = "body",
                      n_shards: int = 4) -> DataFrame:
    """The cdx index of a WARC export, computed WITH the shard layout and
    entirely JVM-side: record text restates build_warc_record as a concat
    expression, shard = pmod(xxhash64(uri), n_shards) (content-addressed,
    rebalance-stable), and rec_offset is the running record-length sum in
    (uri) order within the shard — so the index rows are exactly what a
    reader needs to seek into the shard files export_warc_shards writes,
    without ever re-reading them.

    Scale shape: one shard-keyed exchange feeds both the window (offsets)
    and the export grouping — index and archive come out of the SAME
    shuffle. Lengths/offsets are in the string-codepoint space the
    segmenter (parse_warc) also uses, so export → ingest round-trips
    exactly. Reference analog: the crawler stores pages row-per-fetch
    (storage layer, schema.cql pages table); WARC shards are the
    interchange/archival layout Common Crawl publishes."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    uri, body = F.col(uri_col), F.col(body_col)
    rec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "),
        uri, F.lit("\r\nContent-Length: "),
        F.length(body).cast("string"), F.lit("\r\n\r\n"),
        body, F.lit("\r\n\r\n"))
    base = pages.select(
        F.pmod(F.xxhash64(uri), F.lit(n_shards)).alias("shard"),
        uri.alias("uri"), F.length(body).alias("content_length"),
        F.length(rec).alias("rec_len"),
        F.sha2(rec, 256).alias("record_sha256"))
    # tie-break duplicate URIs (row-per-fetch stores) on the record hash
    # so the offset order is total and IDENTICAL to the shard writer's;
    # equal (uri, sha) ⇒ byte-identical records ⇒ order immaterial
    w = Window.partitionBy("shard").orderBy("uri", "record_sha256")
    return base.select(
        "shard", "uri",
        (F.sum("rec_len").over(w) - F.col("rec_len")).alias("rec_offset"),
        "content_length", "record_sha256")


def export_warc_shards(pages: DataFrame, out_dir: str,
                       uri_col: str = "uri", body_col: str = "body",
                       n_shards: int = 4) -> DataFrame:
    """The export sink itself: one WARC file per shard, records in (uri)
    order, written worker-side (attempt-unique tmp + atomic rename — the
    blob-sink discipline of operators/extract.py). Returns the receipt
    table (shard, path, n_records, total_chars); warc_export_index over
    the same input IS the cdx for these files, and parse_warc reads them
    back (round-trip pinned in tests)."""
    import os

    from pyspark.sql import functions as F

    def write_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
        shard = int(key[0])
        # same total order as the index window: (uri, record sha256)
        recs = [build_warc_record(u, b)
                for u, b in zip(pdf["uri"], pdf["body"])]
        pdf = pdf.assign(_rec=recs, _sha=[
            hashlib.sha256(r.encode()).hexdigest() for r in recs])
        pdf = pdf.sort_values(["uri", "_sha"], ignore_index=True)
        data = "".join(pdf["_rec"])
        path = os.path.join(out_dir, f"shard-{shard:05d}.warc")
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w", encoding="utf-8", newline="") as f:
            f.write(data)
        os.replace(tmp, path)
        return pd.DataFrame({"shard": [shard], "path": [path],
                             "n_records": [len(pdf)],
                             "total_chars": [len(data)]})

    os.makedirs(out_dir, exist_ok=True)
    keyed = pages.select(
        F.pmod(F.xxhash64(F.col(uri_col)), F.lit(n_shards)).alias("shard"),
        F.col(uri_col).alias("uri"), F.col(body_col).alias("body"))
    return keyed.groupBy("shard").applyInPandas(
        write_group,
        "shard long, path string, n_records long, total_chars long")
