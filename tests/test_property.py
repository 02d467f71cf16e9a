"""Property-based check: for ANY event stream and ANY batch split, the
engine's merge semantics equal a trivial python dict model.

Goes beyond the reference's example-based e2e tests (SURVEY.md §5: it
has no property tests) — hypothesis explores orderings and op mixes a
fixed fixture can't, incl. delete-then-reinsert, multiple updates per
key in one batch, and out-of-order batch delivery (lww_guard mode).
"""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import types as T

from plugin_debezium_spark.plans.lake import LakeTable
from plugin_debezium_spark.plans.merge import merge_batch

SCHEMA = T.StructType(
    [
        T.StructField("repo", T.StringType(), True),
        T.StructField("path", T.StringType(), True),
        T.StructField("commit", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("_lsn", T.LongType(), True),
        T.StructField("_ts_ms", T.LongType(), True),
        T.StructField("_deleted", T.BooleanType(), True),
    ]
)

# an event: (key_id 0..5, op, payload version)
events_strategy = st.lists(
    st.tuples(st.integers(0, 5), st.sampled_from(["c", "u", "d"])),
    min_size=1,
    max_size=24,
)
split_strategy = st.integers(1, 4)
shuffle_batches = st.booleans()


def _python_model(events):
    state = {}
    for lsn, (k, op) in enumerate(events):
        if op == "d":
            state.pop(k, None)
        else:
            state[k] = f"v{lsn}"
    return state


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(events=events_strategy, n_batches=split_strategy, reverse=shuffle_batches)
def test_merge_equals_python_model(spark, tmp_path_factory, events, n_batches, reverse):
    tmp = tmp_path_factory.mktemp("prop")
    t = LakeTable.create(spark, str(tmp / "t"), SCHEMA, n_buckets=4)

    rows = [
        (f"r{k}", f"p{k}", "c0", None if op == "d" else f"v{lsn}", lsn, lsn, op)
        for lsn, (k, op) in enumerate(events)
    ]
    # split into contiguous LSN batches; optionally deliver them in
    # REVERSE order (exercises the out-of-order lww_guard + tombstones)
    size = max(1, len(rows) // n_batches)
    batches = [rows[i : i + size] for i in range(0, len(rows), size)]
    order = list(reversed(batches)) if reverse else batches
    # in-order delivery additionally exercises the ordered fast path
    # (lww_guard off) — both paths must match the model
    guard = True if reverse else (n_batches % 2 == 0)
    for i, b in enumerate(order):
        df = spark.createDataFrame(
            pd.DataFrame(
                b,
                columns=[
                    "repo", "path", "commit", "content", "_lsn", "_ts_ms", "op",
                ],
            ),
            schema="repo string, path string, commit string, content string,"
            " _lsn long, _ts_ms long, op string",
        )
        merge_batch(
            t, df, epoch_id=i, last_lsn=max(r[4] for r in b), lww_guard=guard
        )

    got = {
        r["repo"]: r["content"]
        for r in t.read().collect()
    }
    want = {f"r{k}": v for k, v in _python_model(events).items()}
    assert got == want


def _uf_components(n_nodes, edges):
    """Reference union-find: node -> min id of its component."""
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    out = {}
    for x in range(n_nodes):
        r = find(x)
        out[x] = min(out.get(r, r), r)
    return {x: find(x) for x in range(n_nodes)}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    n_nodes=st.integers(min_value=1, max_value=24),
    edges=st.lists(
        st.tuples(st.integers(0, 23), st.integers(0, 23)), max_size=40
    ),
)
def test_connected_components_equals_union_find(spark, n_nodes, edges):
    """Distributed min-label propagation == classic union-find on
    arbitrary random graphs (self-loops and out-of-range edges
    filtered the same way on both sides)."""
    from plugin_debezium_spark.operators.neardup import (
        connected_components,
    )

    edges = [(a, b) for a, b in edges if a != b and a < n_nodes and b < n_nodes]
    expect = _uf_components(n_nodes, edges)
    nodes = spark.createDataFrame(
        pd.DataFrame({"id": list(range(n_nodes))})
    )
    if edges:
        pairs = spark.createDataFrame(
            pd.DataFrame(edges, columns=["id_a", "id_b"])
        )
    else:
        pairs = spark.createDataFrame(
            [], T.StructType([T.StructField("id_a", T.LongType()),
                              T.StructField("id_b", T.LongType())])
        )
    got = {
        r["id"]: r["cluster"]
        for r in connected_components(pairs, nodes=nodes).collect()
    }
    assert got == expect


# --- packing: any token multiset tiles the stream exactly -------------

pack_tokens_strategy = st.lists(
    st.integers(0, 40), min_size=1, max_size=60
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(toks=pack_tokens_strategy, block=st.integers(1, 17))
def test_pack_sequences_tiles_any_corpus(spark, toks, block):
    """For ANY per-doc token counts and ANY block size: offsets tile
    the concatenated stream with no gaps/overlaps, zero-token docs
    have NULL bounds, block spans match chunker arithmetic."""
    from pyspark.sql import functions as F

    from plugin_debezium_spark.operators.packing import pack_sequences

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(toks)], "doc_id long, n long"
    )
    rows = pack_sequences(
        docs, block_tokens=block, tokens=F.col("n"), bucket_bits=4
    ).collect()
    assert len(rows) == len(toks)
    pos = 0
    for r in sorted(rows, key=lambda r: (r["tok_offset"], r["doc_id"])):
        assert r["n_tokens"] == toks[r["doc_id"]]
        if r["n_tokens"] == 0:
            assert r["first_block"] is None and r["last_block"] is None
            continue
        assert r["tok_offset"] == pos
        assert r["first_block"] == pos // block
        assert r["last_block"] == (pos + r["n_tokens"] - 1) // block
        pos += r["n_tokens"]
    assert pos == sum(toks)


# --- quotas: any grouping equals the single-window top-N --------------


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    groups=st.lists(st.integers(0, 3), min_size=1, max_size=40),
    n=st.integers(1, 4),
    n_salts=st.integers(1, 5),
)
def test_top_n_per_group_equals_window_any_grouping(spark, groups, n, n_salts):
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from plugin_debezium_spark.operators.quotas import top_n_per_group

    df = spark.createDataFrame(
        [(i, f"g{g}") for i, g in enumerate(groups)],
        "doc_id long, grp string",
    )
    ok = F.sha2(F.col("doc_id").cast("string"), 256)
    w = Window.partitionBy("grp").orderBy(ok, "doc_id")
    want = sorted(
        tuple(r)
        for r in df.withColumn("qrank", F.row_number().over(w))
        .filter(F.col("qrank") <= n)
        .collect()
    )
    got = sorted(
        tuple(r)
        for r in top_n_per_group(
            df, "grp", n, ok, "doc_id", n_salts=n_salts
        ).collect()
    )
    assert got == want
