"""Debezium temporal/decimal converter matrix (mirrors the reference's
MapConverterTest.java:27-86 value assertions)."""

import datetime
from decimal import Decimal

import pandas as pd

from plugin_debezium_spark.functions import temporal as TP


def test_temporal_matrix(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "days": [19723],  # 2024-01-01
                "ms": [1704067200123],  # 2024-01-01T00:00:00.123Z
                "us": [1704067200123456],
                "ns": [1704067200123456789],
                "tod_us": [6 * 3600 * 1_000_000 + 30 * 60 * 1_000_000],
                "yr": [2024],
                "ziso": ["2024-01-01T05:30:00+05:30"],
                "ztime": ["10:15:30+02:00"],
                "dur_us": [90 * 1_000_000],
                "dec": ["12.34"],
            }
        )
    )
    row = df.select(
        TP.debezium_date("days").alias("d"),
        TP.timestamp_ms("ms").alias("tms"),
        TP.micro_timestamp("us").alias("tus"),
        TP.nano_timestamp("ns").alias("tns"),
        TP.micro_time("tod_us").alias("tod"),
        TP.year_date("yr").alias("y"),
        TP.zoned_timestamp("ziso").alias("z"),
        TP.zoned_time("ztime").alias("zt"),
        TP.micro_duration("dur_us").alias("dur"),
        TP.decimal_str("dec", 5, 2).alias("dc"),
    ).collect()[0]

    assert row["d"] == datetime.date(2024, 1, 1)
    assert row["tms"] == datetime.datetime(2024, 1, 1, 0, 0, 0, 123000)
    assert row["tus"] == datetime.datetime(2024, 1, 1, 0, 0, 0, 123456)
    assert row["tns"] == datetime.datetime(2024, 1, 1, 0, 0, 0, 123456)
    assert row["tod"] == "06:30:00.000000"
    assert row["y"] == datetime.date(2024, 1, 1)
    # +05:30 normalizes to UTC session zone -> midnight UTC
    assert row["z"] == datetime.datetime(2024, 1, 1, 0, 0, 0)
    # time-only with offset → UTC time-of-day, date-independent
    assert row["zt"] == "08:15:30.000000"
    assert row["dur"] == datetime.timedelta(seconds=90)
    assert row["dc"] == Decimal("12.34")
    assert "io.debezium.time.MicroTimestamp" in TP.DEBEZIUM_CONVERTERS
