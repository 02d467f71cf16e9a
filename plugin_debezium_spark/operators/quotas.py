"""Per-group quotas: keep at most N rows per group, deterministically.

The crawl-pipeline primitive behind per-domain caps, per-language
budgets, and per-source stratified sampling: "at most N documents per
domain, chosen reproducibly". The naive Spark form — one row_number
window partitioned by the group — puts EVERY row of a group in one
window partition; at 10^10 docs a hot domain holding 10^9 rows is a
single-task straggler. This is the salted two-phase form:

1. salt = sha(id) % n_salts; rank within (group, salt) and keep N —
   window partitions shrink to group_size / n_salts, and the salt is
   content-addressed so phase 1 is deterministic under any input
   partitioning.
2. rank the ≤ n_salts × N survivors per group and keep N — bounded
   window partitions regardless of group skew.

Selection = global top-N by (order_col, id) per group, identical to
the single-window form (each group's true top-N all survive phase 1:
a row dropped in phase 1 has N better rows in its own salt bucket,
hence N better rows in the group). Raise n_salts for hotter groups;
both windows stay bounded.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from plugin_debezium_spark.operators.neardup import sha_bigint


def top_n_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    order_col: str | Column,
    id_col: str,
    n_salts: int = 16,
    rank_name: str = "qrank",
) -> DataFrame:
    """At most ``n`` rows per ``group_col`` value: the global top-N by
    (``order_col`` asc, ``id_col`` asc — a deterministic total order;
    pass a content-addressed sha expression as ``order_col`` for a
    reproducible unbiased sample). Output = input columns +
    ``rank_name`` (1..n within the group)."""
    if n < 1:
        raise ValueError(f"n must be >= 1: {n}")
    oc = F.col(order_col) if isinstance(order_col, str) else order_col
    base = df.withColumn("_oc", oc).withColumn(
        "_salt", F.pmod(sha_bigint(F.col(id_col).cast("string")), n_salts)
    )
    w1 = Window.partitionBy(group_col, "_salt").orderBy("_oc", id_col)
    w2 = Window.partitionBy(group_col).orderBy("_oc", id_col)
    return (
        base.withColumn("_r1", F.row_number().over(w1))
        .filter(F.col("_r1") <= n)
        .withColumn(rank_name, F.row_number().over(w2))
        .filter(F.col(rank_name) <= n)
        .drop("_oc", "_salt", "_r1")
    )
