"""Pure-pandas golden applier (FIXTURES.md §3) — the oracle the engine's
final table state is compared against row-for-row on sha256(content).

Deliberately the dumbest possible implementation: iterate the log in
LSN order, apply each event to a dict keyed by (repo, path, commit).
"""

from __future__ import annotations

import hashlib
import json

import pandas as pd
import pyarrow.dataset as ds


def read_log_pandas(log_dir: str) -> pd.DataFrame:
    t = ds.dataset(log_dir, format="parquet", partitioning="hive").to_table()
    return t.to_pandas().sort_values("lsn").reset_index(drop=True)


def golden_final_state(log_pdf: pd.DataFrame) -> pd.DataFrame:
    state: dict[tuple, dict] = {}
    for row in log_pdf.itertuples(index=False):
        key = (row.key["repo"], row.key["path"], row.key["commit"])
        if row.op == "t":
            # TRUNCATE: table-wide delete at this point in the log
            state.clear()
            continue
        if row.op == "d":
            state.pop(key, None)
            continue
        after = json.loads(row.after_json)
        rec = dict(after)
        content = rec.get("content")
        rec["content_sha256"] = (
            None
            if content is None
            else hashlib.sha256(content.encode("utf-8")).hexdigest()
        )
        rec["_lsn"] = row.lsn
        rec["_ts_ms"] = row.ts_ms
        state[key] = rec
    return pd.DataFrame(list(state.values()))


def golden_key_hashes(log_pdf: pd.DataFrame) -> set[tuple]:
    g = golden_final_state(log_pdf)
    if g.empty:
        return set()
    return set(
        zip(g["repo"], g["path"], g["commit"], g["content_sha256"], strict=True)
    )
