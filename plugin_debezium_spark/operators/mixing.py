"""Dataset mixing: deterministic stratified up/down-sampling.

Training-data pipelines assemble a corpus from heterogeneous sources
with TARGET MIX WEIGHTS ("2x epochs of wikipedia, 0.3x of crawl") —
the last step before tokenization. Beyond the reference's CDC scope
but first-class here, same rationale as the dedup suite (a 100 TB
ingest lake feeds training).

The op is content-addressed (sha256 of salt||id), so the sample is
stable across runs, engines, partitionings, and corpus growth — the
property `df.sample()` lacks — and every derivation is integer
arithmetic (per-ten-thousand weights), so the DuckDB oracle
reproduces it bit-for-bit.

Scale shape: NO shuffle at all — a literal CASE maps the stratum to
its weight, one sha per row decides the fractional copy, and
posexplode of a tiny sequence materializes up-sampled epochs. At
10^10 rows this is a single narrow map stage that chains onto
whatever partitioning the downstream writer wants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from plugin_debezium_spark.operators.neardup import sha_bigint


def mix_by_weights(
    df: DataFrame,
    weights: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix:v1",
) -> DataFrame:
    """Sample/repeat each stratum to its target weight.

    weight w means each row of the stratum appears floor(w) times,
    plus one more with probability frac(w) — decided by
    sha256(salt||id) mod 10000 against round(frac(w)*10000), so the
    decision is per-row deterministic and exactly reproducible.
    Strata absent from ``weights`` get weight 0 (dropped): mixing is
    an explicit allowlist, not a passthrough.

    Output: the input rows with an added ``copy`` column (1..n for
    up-sampled strata — distinct rows, so downstream shuffles/writes
    treat epochs independently). w <= 1 never emits copy > 1.
    """
    w_expr = None
    for name, w in weights.items():
        wi = int(round(w * 10000))
        if wi < 0:
            raise ValueError(f"negative weight for stratum {name!r}")
        cond = F.col(strata_col) == F.lit(name)
        w_expr = (
            F.when(cond, F.lit(wi))
            if w_expr is None
            else w_expr.when(cond, F.lit(wi))
        )
    if w_expr is None:
        raise ValueError("weights must name at least one stratum")
    w_expr = w_expr.otherwise(F.lit(0))
    bucket = (
        sha_bigint(
            F.concat(F.lit(salt), F.col(id_col).cast("string"))
        )
        % 10000
    )
    n_copies = F.expr("_wi div 10000") + F.when(
        bucket < F.pmod(F.col("_wi"), F.lit(10000)), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        df.withColumn("_wi", w_expr)
        .withColumn("_n", n_copies.cast("long"))
        .filter(F.col("_n") > 0)
        .select(
            "*",
            F.explode(
                F.sequence(F.lit(1).cast("long"), F.col("_n"))
            ).alias("copy"),
        )
        .drop("_wi", "_n")
    )
