"""Live-database CDC end to end: a real SQLite database with audit
triggers → consistent snapshot + change tail → envelope log → the
distributed engine → lake table state equal to the database's own
current state. This is S4 executed against an actual database, not a
config mapping.
"""

from __future__ import annotations

import sqlite3

from pyspark.sql import functions as F

from plugin_debezium_spark.plans.lake import LakeTable
from plugin_debezium_spark.sources.sqlite_connector import (
    SqliteSource,
    capture_to_log,
    install_cdc,
)
from plugin_debezium_spark.streaming.engine import EngineConfig, run


def _mk_db(path: str, n: int = 300) -> None:
    con = sqlite3.connect(path)
    con.execute(
        """CREATE TABLE repofiles (
           repo TEXT, path TEXT, "commit" TEXT, lang TEXT, content TEXT,
           PRIMARY KEY (repo, path, "commit"))"""
    )
    con.executemany(
        "INSERT INTO repofiles VALUES (?,?,?,?,?)",
        [
            (
                f"r{i % 7}",
                f"src/f{i}.py",
                f"c{i}",
                "py",
                f"def f{i}(): return {i}",
            )
            for i in range(n)
        ],
    )
    con.commit()
    con.close()


def _db_state(path: str) -> set[tuple]:
    con = sqlite3.connect(path)
    rows = set(
        tuple(r)
        for r in con.execute(
            'SELECT repo, path, "commit", lang, content FROM repofiles'
        )
    )
    con.close()
    return rows


def _table_state(spark, table_dir: str) -> set[tuple]:
    return set(
        tuple(r)
        for r in LakeTable(spark, table_dir)
        .read()
        .select("repo", "path", "commit", "lang", "content")
        .collect()
    )


def test_sqlite_live_cdc_end_to_end(spark, tmp_path):
    db = str(tmp_path / "live.db")
    log = str(tmp_path / "log")
    tbl = str(tmp_path / "tbl")
    _mk_db(db)
    src = SqliteSource(db_path=db)
    install_cdc(src)

    # changes BEFORE the snapshot: must be folded into it, not replayed
    con = sqlite3.connect(db)
    con.execute("UPDATE repofiles SET content = 'pre-snap' WHERE repo = 'r0'")
    con.commit()

    s1 = capture_to_log(spark, src, log, bucket_size=500)
    assert s1["snapshot_rows"] == 300
    # pre-snapshot changes are ≤ the high-water mark: already folded
    # into the snapshot image, never delivered again as tail events
    assert s1["change_rows"] == 0

    cfg = EngineConfig(log_dir=log, table_dir=tbl, max_events_per_batch=500)
    out = run(spark, cfg)
    assert out["batches_applied"] >= 1
    assert _table_state(spark, tbl) == _db_state(db)

    # live mutations: updates, deletes, inserts, delete-then-reinsert
    con.execute("UPDATE repofiles SET content = 'v2' WHERE repo = 'r1'")
    con.execute("DELETE FROM repofiles WHERE repo = 'r2'")
    con.executemany(
        "INSERT INTO repofiles VALUES (?,?,?,?,?)",
        [(f"rn{i}", f"new/{i}.py", f"n{i}", "py", f"new {i}") for i in range(40)],
    )
    con.execute(
        """INSERT INTO repofiles VALUES
           ('r2', 'back/again.py', 'cb', 'py', 'reborn')"""
    )
    con.commit()
    con.close()

    s2 = capture_to_log(spark, src, log, bucket_size=500)
    assert s2["snapshot_rows"] == 0 and s2["change_rows"] > 0
    run(spark, cfg)
    assert _table_state(spark, tbl) == _db_state(db)

    # idempotence: nothing new to capture, nothing new to apply
    s3 = capture_to_log(spark, src, log, bucket_size=500)
    assert s3 == {
        "snapshot_rows": 0,
        "change_rows": 0,
        "last_audit_id": s2["last_audit_id"],
    }
    assert run(spark, cfg)["batches_applied"] == 0

    # the engine saw true before-images (trigger OLD capture): the
    # update events carry the previous content
    env = spark.read.parquet(log).filter("op = 'u'")
    assert env.count() > 0
    bad = env.filter(
        ~F.get_json_object("before_json", "$.content").isNotNull()
    ).count()
    assert bad == 0


def test_sqlite_capture_crash_replay_converges(spark, tmp_path):
    """At-least-once capture, exactly-once apply: a crash between the
    log append and the offset write re-delivers the same audit rows —
    but the LSN mint is deterministic (n_snap + audit id), so the
    replayed events are row-identical and the engine's LWW absorbs
    them; final state still equals the database."""
    import json as _json

    from plugin_debezium_spark.sources.sqlite_connector import _offset_path

    db = str(tmp_path / "live.db")
    log = str(tmp_path / "log")
    tbl = str(tmp_path / "tbl")
    _mk_db(db, n=100)
    src = SqliteSource(db_path=db)
    install_cdc(src)
    capture_to_log(spark, src, log, bucket_size=500)

    con = sqlite3.connect(db)
    con.execute("UPDATE repofiles SET content = 'v2' WHERE repo = 'r3'")
    con.execute("DELETE FROM repofiles WHERE repo = 'r4'")
    con.commit()
    con.close()
    capture_to_log(spark, src, log, bucket_size=500)

    # simulate the crash: roll the offset back as if the second
    # capture died after appending but before the pointer swap
    with open(_offset_path(log)) as f:
        o = _json.load(f)
    o["last_audit"] = 1  # pre-snapshot era
    with open(_offset_path(log), "w") as f:
        _json.dump(o, f)
    s = capture_to_log(spark, src, log, bucket_size=500)
    assert s["change_rows"] > 0  # re-delivered

    run(spark, EngineConfig(log_dir=log, table_dir=tbl, max_events_per_batch=500))
    assert _table_state(spark, tbl) == _db_state(db)
