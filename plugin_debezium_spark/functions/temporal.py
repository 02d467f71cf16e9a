"""Debezium temporal/decimal type converters (SURVEY.md §1.2 P7).

The reference's MapConverter turns Debezium logical types — integers
carrying epoch-days/millis/micros/nanos, ISO strings for zoned values
— into Java temporal objects (MapConverter.java:60-142). These are the
Spark-native equivalents, applied to decoded payload columns when a
source schema marks them with Debezium logical type names.

Mapping parity (reference file:line → here):
  io.debezium.time.Date        :60-64  → debezium_date (epoch days)
  Timestamp (ms)               :114-118→ timestamp_ms
  MicroTimestamp (µs)          :84-88  → micro_timestamp
  NanoTimestamp (ns)           :102-106→ nano_timestamp (µs truncation)
  Time/MicroTime/NanoTime      :78-112 → *_time as HH:mm:ss.SSSSSS
                                          strings (Spark has no TimeType)
  Year                         :120-124→ year_date (Jan 1 of year)
  ZonedTimestamp/ZonedTime     :126-136→ zoned_timestamp (UTC session)
  MicroDuration                :72-76  → micro_duration (day-time interval)
  Decimal                      :138-142→ decimal_str cast
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def debezium_date(col) -> Column:
    """int epoch-days → DateType."""
    return F.date_add(F.to_date(F.lit("1970-01-01")), _c(col).cast("int"))


def timestamp_ms(col) -> Column:
    return F.timestamp_millis(_c(col).cast("long"))


def micro_timestamp(col) -> Column:
    return F.timestamp_micros(_c(col).cast("long"))


def nano_timestamp(col) -> Column:
    """ns → TimestampType; sub-µs truncates (documented lossy edge,
    same as the reference's Instant truncation to nanos vs our µs).
    Integer division: a double round-trip corrupts epoch-ns (>2^53)."""
    return F.timestamp_micros(F.expr(f"{_name(col)} div 1000"))


def time_ms(col) -> Column:
    """ms-of-day → 'HH:mm:ss.SSS' string (no TimeType in Spark)."""
    return F.date_format(F.timestamp_millis(_c(col).cast("long")), "HH:mm:ss.SSS")


def micro_time(col) -> Column:
    return F.date_format(
        F.timestamp_micros(_c(col).cast("long")), "HH:mm:ss.SSSSSS"
    )


def nano_time(col) -> Column:
    return F.date_format(
        F.timestamp_micros(F.expr(f"{_name(col)} div 1000")), "HH:mm:ss.SSSSSS"
    )


def year_date(col) -> Column:
    """int year → DateType(y, 1, 1) (reference Year → LocalDate)."""
    return F.make_date(_c(col).cast("int"), F.lit(1), F.lit(1))


def zoned_timestamp(col) -> Column:
    """ISO-8601 datetime string with offset → TimestampType normalized
    to the UTC session zone."""
    return F.to_timestamp(_c(col))


def zoned_time(col) -> Column:
    """ISO time-of-day string with offset ('10:15:30+02:00') →
    UTC-normalized 'HH:mm:ss.SSSSSS' string. to_timestamp anchors
    time-only strings to the CURRENT date, so only the time-of-day is
    kept — the offset arithmetic is date-independent, making the
    output deterministic (the reference maps ZonedTime to OffsetTime,
    a time-of-day type)."""
    return F.date_format(F.to_timestamp(_c(col)), "HH:mm:ss.SSSSSS")


def micro_duration(col) -> Column:
    """long µs → DayTimeIntervalType."""
    return F.expr(
        f"make_dt_interval(0, 0, 0, {_name(col)} / 1000000.0)"
    )


def nano_duration(col) -> Column:
    """long ns → DayTimeIntervalType (reference MapConverter.java:90-94
    → Duration.ofNanos). Sub-µs truncates — Spark's day-time interval
    stores µs; integer div first so big epochs don't round in double."""
    return F.expr(
        f"make_dt_interval(0, 0, 0, ({_name(col)} div 1000) / 1000000.0)"
    )


# ISO-8601 period (P1Y2M3W4D, optionally with a time part) — the shape
# io.debezium.time.Interval carries and MapConverter.java:66-70 parses
# with java.time.Period.
_PERIOD_RE = (
    r"^P(?:(\d+)Y)?(?:(\d+)M)?(?:(\d+)W)?(?:(\d+)D)?"
    r"(?:T(?:(\d+)H)?(?:(\d+)M)?(?:(\d+(?:\.\d+)?)S)?)?$"
)


def interval_period(col) -> Column:
    """ISO-8601 interval string → struct(years, months, days, micros).
    Spark exposes no Period type to Parquet/Arrow, so the components
    are kept exact in a struct (weeks fold into days, the time part
    into micros) — lossless, unlike forcing a day-time interval."""
    c = _c(col)

    def g(i):  # regexp group as long, absent ('') → 0 (ANSI-safe)
        x = F.regexp_extract(c, _PERIOD_RE, i)
        return F.coalesce(F.nullif(x, F.lit("")).cast("long"), F.lit(0))

    def gnum(i):  # fractional seconds group as double
        x = F.regexp_extract(c, _PERIOD_RE, i)
        return F.coalesce(
            F.when(x == "", None).otherwise(x).cast("double"), F.lit(0.0)
        )

    years = g(1)
    months = g(2)
    days = g(3) * 7 + g(4)
    micros = (
        g(5) * 3_600_000_000 + g(6) * 60_000_000
        + F.round(gnum(7) * 1_000_000).cast("long")
    )
    return F.when(
        c.isNull(), F.lit(None).cast("struct<years:long,months:long,days:long,micros:long>")
    ).when(
        # malformed period must FAIL the record like the reference's
        # Period.parse (MapConverter.java:66-70) — regexp_extract on a
        # non-match returns '' for every group, which would silently
        # store an all-zero interval ("P-1Y" → 0 years = corrupt data)
        ~c.rlike(_PERIOD_RE),
        F.raise_error(
            F.concat(F.lit("Conversion error: invalid ISO-8601 period: "), c)
        ).cast("struct<years:long,months:long,days:long,micros:long>"),
    ).otherwise(
        F.struct(
            years.alias("years"),
            months.alias("months"),
            days.alias("days"),
            micros.alias("micros"),
        )
    )


def decimal_str(col, precision: int = 38, scale: int = 9) -> Column:
    return _c(col).cast(f"decimal({precision},{scale})")


def _name(col) -> str:
    return col if isinstance(col, str) else str(col._jc)  # pragma: no cover


# registry keyed by Debezium logical-type name (what a Connect schema
# carries in `name`), for schema-registry-driven decode
DEBEZIUM_CONVERTERS = {
    "io.debezium.time.Date": debezium_date,
    "io.debezium.time.Timestamp": timestamp_ms,
    "io.debezium.time.MicroTimestamp": micro_timestamp,
    "io.debezium.time.NanoTimestamp": nano_timestamp,
    "io.debezium.time.Time": time_ms,
    "io.debezium.time.MicroTime": micro_time,
    "io.debezium.time.NanoTime": nano_time,
    "io.debezium.time.Year": year_date,
    "io.debezium.time.ZonedTimestamp": zoned_timestamp,
    "io.debezium.time.ZonedTime": zoned_time,
    "io.debezium.time.MicroDuration": micro_duration,
    "io.debezium.time.NanoDuration": nano_duration,
    "io.debezium.time.Interval": interval_period,
    "org.apache.kafka.connect.data.Decimal": decimal_str,
    # Debezium's time.precision.mode=connect emits the Kafka Connect
    # logical names instead; wire semantics are identical (epoch days /
    # ms-of-day / epoch ms). The reference's MapConverter.java:58-120
    # only switches on the io.debezium.time names — these aliases are
    # a beyond-reference nicety so connect-mode dumps decode too.
    "org.apache.kafka.connect.data.Date": debezium_date,
    "org.apache.kafka.connect.data.Time": time_ms,
    "org.apache.kafka.connect.data.Timestamp": timestamp_ms,
}
