"""Polling-trigger surface (SURVEY.md §3.2).

The reference's Trigger.evaluate() builds a Capture task from its own
fields every `interval` and produces an execution only when records
arrived (mysql/Trigger.java:64-112; 0 records → no execution,
:105-107). Spark-native equivalent: a poll loop around the batch
engine — each evaluation is one bounded replay; "no new offsets" means
no execution.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import SparkSession

from plugin_debezium_spark.streaming.engine import EngineConfig, run


@dataclass
class PollingTrigger:
    """Evaluate the capture on an interval (default 60s like the
    reference, AbstractDebeziumTrigger.java:24-25)."""

    cfg: EngineConfig
    interval_s: float = 60.0

    def evaluate(self, spark: SparkSession) -> dict | None:
        """One evaluation: replay whatever is new. Returns the run
        output when records were applied, None otherwise (the
        reference's no-execution case)."""
        out = run(spark, self.cfg)
        return out if out["batches_applied"] > 0 else None

    def poll(
        self, spark: SparkSession, max_evaluations: int | None = None
    ) -> list[dict]:
        """Blocking poll loop (tests pass max_evaluations; production
        would run unbounded under a scheduler)."""
        executions = []
        n = 0
        while max_evaluations is None or n < max_evaluations:
            res = self.evaluate(spark)
            if res is not None:
                executions.append(res)
            n += 1
            if max_evaluations is None or n < max_evaluations:
                time.sleep(self.interval_s)
        return executions
