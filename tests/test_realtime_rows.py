"""Per-row realtime delivery (stream_rows) — the reference's
RealtimeTrigger contract (AbstractDebeziumRealtimeTrigger.java:117-186):
every change event emitted once, shaped, in commit order, with
at-least-once offset commits (ChangeConsumer.java:86-89,116-119)."""

import json

import pytest

from plugin_debezium_spark.sources.genlog import LogSpec, write_log
from plugin_debezium_spark.streaming.engine import EngineConfig
from plugin_debezium_spark.streaming.realtime import stream_rows
from tests.golden import read_log_pandas

SPEC = LogSpec(n_events=2_000, n_keys=300, n_snapshot=200, epoch_size=500)


@pytest.fixture(scope="module")
def log_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("rtlog"))
    write_log(spark, d, SPEC)
    return d


def _cfg(log_dir, tmp_path, **kw):
    return EngineConfig(
        log_dir=log_dir,
        table_dir=str(tmp_path / "tbl"),
        max_events_per_batch=500,
        **kw,
    )


def test_emits_every_event_in_lsn_order(spark, log_dir, tmp_path):
    ck = str(tmp_path / "ck.json")
    rows = list(stream_rows(spark, _cfg(log_dir, tmp_path), ck))
    pdf = read_log_pandas(log_dir)
    lsns = [r["lsn"] for r in rows]
    assert lsns == sorted(pdf["lsn"].tolist())  # all, once, in order
    # image choice parity (P2): delete rows carry the BEFORE image,
    # everything else the after image
    by_lsn = {r["lsn"]: r for r in rows}
    sample = pdf.iloc[:: max(1, len(pdf) // 50)]
    for ev in sample.itertuples(index=False):
        row = by_lsn[ev.lsn]
        img = ev.before_json if ev.op == "d" else ev.after_json
        expect = None if img is None else json.loads(img).get("content")
        assert row["content"] == expect
        assert row["deleted"] is (ev.op == "d")
    # evolution shows up in emitted rows: the final epoch's schema
    # carries size_bytes (FIXTURES v2+), the first epoch's does not
    assert "size_bytes" in rows[-1].asDict()
    assert "size_bytes" not in rows[0].asDict()
    # on_each_batch committed through the final epoch
    assert json.loads(open(ck).read())["last_lsn"] == max(lsns)


def test_resume_is_at_least_once_on_epoch_boundary(spark, log_dir, tmp_path):
    ck = str(tmp_path / "ck.json")
    cfg = _cfg(log_dir, tmp_path)
    gen = stream_rows(spark, cfg, ck)
    first = [next(gen)["lsn"] for _ in range(700)]  # stop mid-epoch
    gen.close()
    committed = json.loads(open(ck).read())["last_lsn"]
    assert committed < max(first)  # the partial epoch was NOT committed
    second = [r["lsn"] for r in stream_rows(spark, cfg, ck)]
    pdf = read_log_pandas(log_dir)
    # restart re-delivers exactly the uncommitted tail: union is
    # complete, overlap is the partial epoch's already-seen prefix
    assert second == sorted(x for x in pdf["lsn"] if x > committed)
    assert set(first) | set(second) == set(pdf["lsn"].tolist())


def test_schema_only_pins_and_emits_nothing_historical(
    spark, log_dir, tmp_path
):
    ck = str(tmp_path / "ck.json")
    cfg = _cfg(log_dir, tmp_path, snapshot_mode="SCHEMA_ONLY")
    rows = list(stream_rows(spark, cfg, ck))
    assert rows == []  # everything in the log predates the pin
    pdf = read_log_pandas(log_dir)
    assert json.loads(open(ck).read())["last_lsn"] == int(pdf["lsn"].max())


def test_raw_wrap_and_metadata_shapes(spark, log_dir, tmp_path):
    cfg = _cfg(log_dir, tmp_path)
    raw_rows = []
    for r in stream_rows(
        spark, cfg, str(tmp_path / "ck_raw.json"), fmt="raw"
    ):
        raw_rows.append(r)
        if len(raw_rows) >= 5:
            break
    assert set(raw_rows[0].asDict()) == {"key", "value"}
    assert raw_rows[0]["value"]["op"] == "r"

    meta_rows = []
    for r in stream_rows(
        spark,
        cfg,
        str(tmp_path / "ck_meta.json"),
        fmt="wrap",
        metadata_field="metadata",
        metadata_properties={"stream": "data"},
        key_mode="drop",
    ):
        meta_rows.append(r)
        if len(meta_rows) >= 5:
            break
    d = meta_rows[0].asDict()
    assert "record" in d and "key" not in d
    m = d["metadata"].asDict()
    assert m["operation"] == "r" and m["stream"] == "data"
    assert m["lsn"] == meta_rows[0]["lsn"]


def test_on_stop_commit_mode(spark, log_dir, tmp_path):
    ck = str(tmp_path / "ck.json")
    cfg = _cfg(log_dir, tmp_path)
    import os

    gen = stream_rows(spark, cfg, ck, commit_mode="on_stop")
    for _ in range(700):
        next(gen)
    assert not os.path.exists(ck)  # nothing committed mid-run
    gen.close()
    committed = json.loads(open(ck).read())["last_lsn"]
    assert 0 < committed < SPEC.n_events - 1  # last DRAINED epoch only


def test_stream_rows_applies_column_transforms(spark, log_dir, tmp_path):
    """Per-row delivery masks too (Debezium masks in the connector,
    upstream of the trigger): emitted images never carry plaintext of
    a masked column, deletes' before images included."""
    cfg = _cfg(log_dir, tmp_path, column_mask={"lang": 2},
               column_truncate={"content": 5})
    rows = []
    for r in stream_rows(spark, cfg, str(tmp_path / "ck.json")):
        rows.append(r)
        if len(rows) >= 50:
            break
    assert all(
        r["lang"] in (None, "**") and
        (r["content"] is None or len(r["content"]) <= 5)
        for r in rows
    )

    import pytest

    with pytest.raises(ValueError, match="key columns"):
        next(
            stream_rows(
                spark,
                _cfg(log_dir, tmp_path, column_mask={"repo": 2}),
                str(tmp_path / "ck2.json"),
            )
        )


def test_stream_rows_refuses_nonstring_transform_target(
    spark, log_dir, tmp_path
):
    """ingest_transforms' character-column rule applies to per-row
    delivery too: a configured transform column PRESENT in the epoch's
    inferred schema but typed non-string fails loudly instead of
    silently emitting unmasked (the batch/realtime paths must not
    diverge on a compliance feature). Columns absent from an epoch are
    still skipped — size_bytes only exists from the evolution epoch
    on, and the early epochs must pass through."""
    cfg = _cfg(log_dir, tmp_path, column_mask={"size_bytes": 2})
    with pytest.raises(ValueError, match="string columns only"):
        for _ in stream_rows(spark, cfg, str(tmp_path / "ck3.json")):
            pass
