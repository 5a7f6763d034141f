"""RoundCatalog: the storage interface the crawl engine is written
against — and the executable seam where real Iceberg drops in.

BASELINE.json mandates Iceberg table maintenance; this container has no
Iceberg runtime jars, so ``tables/snapshot_store.SnapshotStore`` is the
parquet implementation of this interface (the minimal snapshot-commit
subset: staged round writes + an atomic marker rename as the commit
point). Everything in the engine — the driver loop, state reads,
compaction, every test — talks only to this Protocol, so an Iceberg
implementation is a drop-in: construct ``Crawler(..., store=IcebergCatalog
(...))`` and nothing else changes.

Mapping each method to the Iceberg implementation it stands in for:

=================  ========================================================
method             Iceberg equivalent
=================  ========================================================
stage_write        ``df.writeTo(f"{table}").append()`` on a table
                   partitioned by ``round`` (identity transform); the data
                   files land in an uncommitted snapshot
commit_round       one atomic multi-table catalog commit (Iceberg REST /
                   Nessie transaction, or per-table ``commit`` + a tag
                   ``round-<r>`` on the snapshot) — replaces the marker
                   rename
read(name, rounds) ``spark.read.option("snapshot-ref", f"round-<r>")`` or
                   a ``WHERE round IN (...)`` that manifest pruning turns
                   into an O(files-in-round) plan — replaces the explicit
                   directory list
round_dir          not needed: the in-worker payload sink becomes a normal
                   ``writeTo(...).append()`` whose AddedFiles commit with
                   the round's snapshot
committed_rounds/  snapshot-log / tag listing on the catalog
last_round/
round_meta         snapshot summary properties (``commit_round``'s meta
                   dict maps to snapshot summary key/values)
exists             table/partition existence via catalog metadata
=================  ========================================================

The seen-state compaction tables (driver._compact_state) are written
hash-bucketed by ``pmod(xxhash64(key), P)`` — exactly an Iceberg
``bucket(P, key)`` transform — so under Iceberg the per-round compaction
rewrite becomes ``rewrite_data_files`` table maintenance and the exact
re-check anti-join upgrades to a storage-partitioned join (no shuffle of
the history side).
"""

from __future__ import annotations

from typing import Protocol, runtime_checkable

from pyspark.sql import DataFrame, SparkSession


@runtime_checkable
class RoundCatalog(Protocol):
    """Round-snapshotted multi-table storage with an atomic commit point.

    Invariants every implementation must provide (north_rule checkpoint
    semantics, enforced by the resume/compaction tests):

    - writes staged for round r are invisible to ``read`` until
      ``commit_round(r)`` returns;
    - ``commit_round`` is atomic: a crash before it leaves no trace a
      reader can see, a crash after it leaves round r fully readable;
    - re-staging an uncommitted round overwrites cleanly (idempotent
      round re-runs).
    """

    def committed_rounds(self) -> list[int]: ...

    def committed_marks(self, kind: str) -> list[int]: ...

    def commit_mark(self, kind: str, seq: int,
                    meta: dict | None = None) -> None: ...

    def last_round(self) -> int | None: ...

    def round_meta(self, round_no: int) -> dict | None: ...

    def commit_round(self, round_no: int, meta: dict | None = None) -> None: ...

    def round_dir(self, name: str, round_no: int,
                  create: bool = False) -> str: ...

    def stage_write(self, name: str, df: DataFrame, round_no: int,
                    partition_by: list[str] | None = None) -> str: ...

    def read(self, spark: SparkSession, name: str,
             rounds: list[int] | None = None) -> DataFrame | None: ...

    def read_round(self, spark: SparkSession, name: str,
                   round_no: int) -> DataFrame | None: ...

    def exists(self, name: str, round_no: int) -> bool: ...
