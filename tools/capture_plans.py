"""Capture .explain('formatted') for declared driver queries.

Usage:
    python tools/capture_plans.py <suffix> [sf_dir] [name ...]

Writes plans/r07/<query>_<suffix>.txt for each requested query
(default: every NON-engine query — the cdc_replay_* / cdc_sqlite_live
family executes the whole engine during query construction, so their
returned frame is just a lake-table read; capture those explicitly by
name if an optimization changes their read plan).

The explain is captured WITHOUT executing the query (plan-only), so
this is cheap for pure-plan queries.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# queries that RUN the engine (or a driver-side loop) while the query
# function builds its result frame — skipped by default
ENGINE_QUERIES = {
    "cdc_replay_final_state",
    "cdc_replay_mor",
    "cdc_replay_snapshot_never",
    "cdc_replay_snapshot_only",
    "cdc_replay_incremental",
    "cdc_replay_evolution",
    "cdc_replay_truncate",
    "cdc_replay_tx_aligned",
    "cdc_sqlite_live",
    "cdc_replay_diff",
}


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:]

    from plugin_debezium_spark.session import get_spark

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    if not names:
        names = [n for n in queries if n not in ENGINE_QUERIES]

    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r07",
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("capture-plans")
    for name in names:
        fn = queries[name]
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
