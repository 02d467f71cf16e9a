"""Feature-composition replay: the round-6 capture features running
TOGETHER on one engine config — snapshot select-override + capture-side
masking + MOR merge + transaction-aligned epochs + a mid-stream stop/
resume. Each feature has its own suite; this guards the intersections
(transform-after-decode vs MOR delta append, override filter vs
tx-aligned epoch cuts, resume offsets vs all of the above)."""

import hashlib
import json

from plugin_debezium_spark.plans.lake import LakeTable
from plugin_debezium_spark.sources.genlog import LogSpec, write_log
from plugin_debezium_spark.streaming.engine import EngineConfig, run
from tests.golden import golden_final_state, read_log_pandas


def test_composed_capture_features_match_golden(spark, tmp_path):
    log = str(tmp_path / "log")
    write_log(
        spark,
        log,
        LogSpec(n_events=3_000, n_keys=500, n_snapshot=300, epoch_size=800),
    )
    cfg = EngineConfig(
        log_dir=log,
        table_dir=str(tmp_path / "tbl"),
        max_events_per_batch=800,
        snapshot_overrides={
            "kestra.repofiles": "get_json_object(after_json, '$.lang') <> 'go'"
        },
        column_truncate={"content": 12},
        column_mask={"lang": 2},
        merge_mode="mor",
        tx_align=True,
    )
    first = run(
        spark,
        EngineConfig(**{**cfg.__dict__, "max_batches": 2}),
    )
    assert first["batches_applied"] == 2
    out = run(spark, cfg)  # resume to the end
    assert out["batches_applied"] >= 1

    pdf = read_log_pandas(log)
    keep = pdf.apply(
        lambda r: r["op"] != "r"
        or json.loads(r["after_json"]).get("lang") != "go",
        axis=1,
    )
    g = golden_final_state(pdf[keep])
    rows = {
        (r["repo"], r["path"], r["commit"]): r
        for r in LakeTable(spark, cfg.table_dir).read().collect()
    }
    assert len(rows) == len(g)
    for rec in g.to_dict("records"):
        row = rows[(rec["repo"], rec["path"], rec["commit"])]
        want = None if rec["content"] is None else rec["content"][:12]
        assert row["content"] == want
        assert row["lang"] == (None if rec["lang"] is None else "**")
        assert row["content_sha256"] == (
            None
            if want is None
            else hashlib.sha256(want.encode()).hexdigest()
        )
    # exactly-once still holds under the whole composition
    again = run(spark, cfg)
    assert again["batches_applied"] == 0
