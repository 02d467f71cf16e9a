"""LWW dedupe equivalence: aggregate path == window path == salted
two-phase path (SURVEY.md §2.5 A2)."""

import pandas as pd
from pyspark.sql import functions as F

from plugin_debezium_spark.operators.dedupe import dedupe_window, latest_by_key

KEYS = ("repo", "path", "commit")


def _events(spark):
    rows = []
    # hot key with many versions, ties on ts_ms
    for i in range(50):
        rows.append(("hot/r", "a.py", "c1", i, 1000 + i // 2, f"v{i}"))
    rows.append(("cold/r", "b.py", "c2", 100, 999, "only"))
    rows.append(("cold/r", "b.py", "c3", 101, 999, "other-commit"))
    pdf = pd.DataFrame(
        rows, columns=["repo", "path", "commit", "lsn", "ts_ms", "content"]
    )
    return spark.createDataFrame(pdf)


def _norm(df):
    return sorted(
        tuple(r)
        for r in df.select(
            "repo", "path", "commit", "lsn", "ts_ms", "content"
        ).collect()
    )


def test_agg_equals_window(spark):
    df = _events(spark)
    assert _norm(latest_by_key(df, KEYS)) == _norm(dedupe_window(df, KEYS))


def test_salted_equals_unsalted(spark):
    df = _events(spark)
    assert _norm(latest_by_key(df, KEYS)) == _norm(
        latest_by_key(df, KEYS, n_salts=7)
    )


def test_lww_picks_max_lsn(spark):
    out = latest_by_key(_events(spark), KEYS)
    hot = out.filter(F.col("repo") == "hot/r").collect()
    assert len(hot) == 1
    assert hot[0]["lsn"] == 49 and hot[0]["content"] == "v49"


def test_twopass_equals_onepass(spark):
    """latest_by_key_twopass ≡ latest_by_key when the order column is
    unique (the log contract)."""
    import pandas as pd

    from plugin_debezium_spark.operators.dedupe import (
        latest_by_key,
        latest_by_key_twopass,
    )

    rows = [
        ("r1", "p1", "c1", f"v{i}", i, i) for i in range(10)
    ] + [("r2", "p2", "c2", f"w{i}", 100 + i, 100 + i) for i in range(5)]
    df = spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["repo", "path", "commit", "content", "lsn", "ts_ms"]
        )
    )
    one = {tuple(r) for r in latest_by_key(df).collect()}
    two = {
        tuple(r)
        for r in latest_by_key_twopass(df)
        .select("repo", "path", "commit", "content")  # align col order
        .collect()
    }
    one_aligned = {
        (r[0], r[1], r[2], r[3]) for r in one
    }
    assert two == one_aligned
