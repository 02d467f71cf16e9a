"""Declared-type audit over EVERY registered DuckDB oracle.

Round-5 lesson (VERDICT r5 "what's wrong" #1-3): two oracles shipped
with un-cast HUGEINT aggregate columns (`sum(...)` in DuckDB widens
BIGINT -> HUGEINT) and went driver hash-red even though the VALUES
agreed — the driver's hasher distinguishes HUGEINT from Spark BIGINT,
while duckdb-python converts HUGEINT to plain int before any local
value-compare sees it. A value check is structurally blind to this
class; the DECLARED relation types are not.

This test binds every oracle (window + tail twins) against sf0.001
views and fails if any output column's declared DuckDB type is
HUGEINT / UHUGEINT / DECIMAL. Binding only — no oracle is executed.
"""

from __future__ import annotations

import os

import duckdb
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_SMALL", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

BANNED = ("HUGEINT", "DECIMAL")  # UHUGEINT matches the HUGEINT substring


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield c
    c.close()


def _all_oracles() -> dict[str, str]:
    from plugin_debezium_spark.queries import ORACLES

    return dict(ORACLES)


def test_no_oracle_emits_driver_divergent_types(con):
    offenders = {}
    for name, sql in _all_oracles().items():
        rel = con.sql(sql)  # binds/plans; does not execute
        bad = [
            f"{c}:{t}"
            for c, t in zip(rel.columns, (str(t).upper() for t in rel.types))
            if any(b in t for b in BANNED)
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "oracles emitting HUGEINT/DECIMAL columns (cast to ::BIGINT / "
        f"::DOUBLE — the driver's hasher distinguishes them): {offenders}"
    )
