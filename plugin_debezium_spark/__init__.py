"""plugin_debezium_spark — a brand-new PySpark-native CDC ingest engine.

Capabilities mirror kestra-io/plugin-debezium (the reference at
/root/reference, studied for behavior only): capture a change stream of
Debezium envelopes (op c/u/d/r/t, before/after images, source LSN +
ts_ms), convert/filter/shape rows, route per table, and deliver into a
snapshot-atomic lake table with last-writer-wins MERGE, schema
evolution, salted skew handling, checkpointed offsets and idempotent
epoch commits for exactly-once replay.

Architecture is Spark-first: everything is a DataFrame plan optimized
by Catalyst; Python touches rows only through vectorized Arrow/pandas
UDFs. The change log is a lake dataset (Parquet partitioned by
lsn_bucket), not a socket — micro-batches are LSN ranges, so partition
pruning gives the reference's "resume after offset" for free.
"""

__version__ = "0.1.0"

from plugin_debezium_spark.session import get_spark  # noqa: F401
