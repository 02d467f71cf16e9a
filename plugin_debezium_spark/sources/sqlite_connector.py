"""Live CDC capture from a real database: SQLite + audit triggers.

The reference's six connectors (S4) wrap Debezium's embedded engine
around live servers this sandbox cannot run — EXCEPT one: SQLite is a
real, transactional SQL database available in-process. This module is
the live-tested instantiation of the engine-generic trigger-audit
capture protocol (sources/dbapi_connector.py — consistent snapshot,
lake-resident offsets, deterministic LSN mint); since round 6 the
machinery itself lives there behind the ``Dialect`` interface and this
module keeps the original SQLite-flavored API as a thin wrapper.

Capture protocol (Debezium's consistent-snapshot contract,
AbstractDebeziumTask parity):

1. ``install_cdc`` creates the audit table + triggers (idempotent).
2. First ``capture_to_log`` opens ``BEGIN IMMEDIATE`` (write-locks the
   db), reads the snapshot SELECT and the audit high-water mark M in
   the SAME transaction — every change ≤ M is inside the snapshot,
   every change > M is not — then emits snapshot rows as op='r'
   envelopes and tails audit rows > M. A provisional offset lands as
   soon as the snapshot rows are durable, before tailing (ADVICE r5).
3. Later calls resume from the offset stored beside the log.

LSN minting keeps the log contract (unique, total-ordered): snapshot
rows take lsn 0..n-1, audit id a takes lsn = n_snapshot + a (audit ids
are 1-based and never reused).

Reference parity: io.kestra.plugin.debezium.AbstractDebeziumTask
(capture loop), mysql/Capture.java:74-95 (connector config head).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import SparkSession

from plugin_debezium_spark.sources.dbapi_connector import (
    DbApiSource,
    SqliteDialect,
    _offset_path,  # noqa: F401  (re-export: tests + tools use it)
)
from plugin_debezium_spark.sources import dbapi_connector as _generic

AUDIT_TABLE = SqliteDialect.audit_table
_DIALECT = SqliteDialect()


@dataclass
class SqliteSource:
    """One captured table: the north-rule shape by default."""

    db_path: str
    table: str = "repofiles"
    key_cols: tuple[str, ...] = ("repo", "path", "commit")
    payload_cols: tuple[str, ...] = ("repo", "path", "commit", "lang", "content")

    def _generic(self) -> DbApiSource:
        return DbApiSource(
            dialect=_DIALECT,
            dsn=self.db_path,
            table=self.table,
            key_cols=self.key_cols,
            payload_cols=self.payload_cols,
        )


def install_cdc(src: SqliteSource) -> None:
    """Create the audit table + one trigger per op (idempotent).
    ts is wall-clock ms; ordering authority is the audit id."""
    _generic.install_cdc(src._generic())


def capture_to_log(
    spark: SparkSession,
    src: SqliteSource,
    log_dir: str,
    bucket_size: int = 100_000,
    fetch_batch: int = 100_000,
    snapshot_mode: str = "INITIAL",
) -> dict:
    """Snapshot (first call) + tail the audit log into the envelope
    log at ``log_dir``. Resumes from the log's own offset. Returns
    capture counters. See dbapi_connector.capture_to_log for the
    protocol and its scale shape."""
    return _generic.capture_to_log(
        spark,
        src._generic(),
        log_dir,
        bucket_size=bucket_size,
        fetch_batch=fetch_batch,
        snapshot_mode=snapshot_mode,
    )
