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
