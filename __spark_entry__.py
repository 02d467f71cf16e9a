"""Driver contract for the spark-graft builder (PySpark target).

entry() runs the flagship end-to-end replay (envelope log → decode →
LWW dedupe → snapshot-atomic MERGE → final table) on sf0.001.
queries()/oracle_sql() cover the SURVEY.md §2 operator inventory plus
the training-data pipeline suite; each oracle is DuckDB SQL over the
same parquet tables.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full CDC replay through the engine at sf0.001."""
    from plugin_debezium_spark.queries import cdc_replay_final_state

    return cdc_replay_final_state(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from plugin_debezium_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from plugin_debezium_spark.queries import ORACLES

    return dict(ORACLES)
