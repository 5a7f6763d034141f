"""JSONL ingestion with corrupt-record quarantine.

Crawl sidecar data (seed lists, label files, API dumps) arrives as JSON
Lines with a known fraction of mangled rows; the loader must parse
schema-on-read AND keep the broken lines (quarantine, never drop — the
lakehouse bronze-layer contract). Pure Catalyst: one `from_json` per
line (JVM Jackson parse, whole-stage codegen, no Python), corruptness
detected as a NULL parse result, the raw line retained only for
quarantined rows so the healthy 99.9% of a 100 TB ingest doesn't carry
its input bytes twice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def parse_jsonl(lines: DataFrame, schema: str,
                line_col: str = "line") -> DataFrame:
    """(.., line) -> (.., <schema fields>, is_corrupt, raw). `raw` is
    NULL for clean rows and the offending input for corrupt ones.
    Corruptness comes from PERMISSIVE mode's columnNameOfCorruptRecord
    channel — a malformed line yields all-null data fields plus the raw
    input in the corrupt column (from_json never returns a NULL struct,
    so `parsed.isNull()` would misclassify everything as clean)."""
    line = F.col(line_col)
    parsed = F.from_json(
        line, schema + ", _corrupt_record STRING",
        {"mode": "PERMISSIVE",
         "columnNameOfCorruptRecord": "_corrupt_record"})
    raw = parsed["_corrupt_record"]
    fields = [parsed[f].alias(f) for f in
              [c.split()[0] for c in schema.split(",")]]
    return (lines.select("*", *fields,
                         raw.isNotNull().alias("is_corrupt"),
                         raw.alias("raw"))
            .drop(line_col))
