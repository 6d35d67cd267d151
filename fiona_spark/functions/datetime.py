"""RFC3339 datetime parity functions (SURVEY.md section 2.8).

The reference parses date/time/datetime strings with hand-written
regexes (`fiona/rfc3339.py:30-122`) and normalizes timezone-aware
datetimes to GMT on write (`fiona/rfc3339.py:2-5`,
`fiona/ogrext.pyx:533-547`).  Spark equivalents, all JVM-side:

  * parse_datetime: RFC3339 string -> TimestampType, offset-aware
    inputs converted to UTC (the session TZ is UTC in
    fiona_spark.session.get_spark, so naive strings are taken as UTC —
    matching Fiona's treat-unqualified-as-local-then-GMT-normalize only
    in the UTC-session case, which the engine pins).
  * parse_date / parse_time: DateType / canonical string.
  * format_rfc3339: timestamp -> the reference's text form.

Fractional seconds: Fiona keeps microseconds (`rfc3339.py` group 7);
Spark timestamps are microsecond-precision — no loss either way.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# Spark's to_timestamp handles: yyyy-MM-dd HH:mm:ss[.SSSSSS][XXX]
# RFC3339 uses 'T'; normalize it first, plus a trailing 'Z'.


def _norm(col) -> Column:
    c = F.regexp_replace(col, "[Tt]", " ")
    return F.regexp_replace(c, "[Zz]$", "+00:00")


def parse_datetime(col) -> Column:
    """RFC3339 datetime string -> UTC timestamp (tz-offsets applied)."""
    return F.to_timestamp(_norm(col))


def parse_date(col) -> Column:
    return F.to_date(col)


def parse_time(col) -> Column:
    """Time-of-day strings stay strings (Spark has no TimeType); output
    is canonical HH:mm:ss[.ffffff] with any offset folded to UTC by
    anchoring on the epoch date."""
    ts = F.to_timestamp(F.concat(F.lit("1970-01-01 "), _norm(col)))
    return F.date_format(ts, "HH:mm:ss.SSSSSS")


def format_rfc3339(col, kind: str = "datetime") -> Column:
    """Timestamp/date -> RFC3339 text as the reference writes it
    (GMT-normalized, 'T' separator for datetimes)."""
    if kind == "datetime":
        return F.date_format(col, "yyyy-MM-dd'T'HH:mm:ss.SSSSSS'Z'")
    if kind == "date":
        return F.date_format(col, "yyyy-MM-dd")
    raise ValueError(f"unknown kind {kind!r}")
