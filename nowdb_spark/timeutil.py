"""Nanosecond time policy.

The reference stores DATE/TIME as int64 nanoseconds since the Unix
epoch (reference: types/types.h:70-71), with range constants
DAWN/DUSK = int64 min/max (types/time.h:27-28) and ISO-8601 literal
formats %Y-%m-%dT%H:%M:%S / %Y-%m-%d (types/time.h:36-37).

Spark's TimestampType is microsecond precision, so to stay
bit-compatible we keep stamps as LongType ns inside the engine and
convert at the presentation / extraction edge.  These helpers build
Column expressions for both directions plus the time-component
extractors of the nowdb scalar surface (reference: fun/expr.h:479-494).
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import Column
from pyspark.sql import functions as F

NS_PER_US = 1_000
NS_PER_MS = 1_000_000
NS_PER_SEC = 1_000_000_000

# int64 min/max — nowdb's dawn()/dusk() (types/time.h:27-28)
DAWN = -(2**63)
DUSK = 2**63 - 1

ISO_FULL = "%Y-%m-%dT%H:%M:%S"
ISO_DATE = "%Y-%m-%d"


def int_div_floor(col: Column, n: int) -> Column:
    """Exact floor-division of a Long column by n.

    `col / n` in Spark is double true-division — casting an i64 ns
    stamp (~1.7e18) to double loses the low bits, so the quotient can
    be off by one. Subtract the pmod remainder (long-exact), then the
    decimal division is exact.
    """
    exact = col - F.pmod(col, F.lit(n))
    return (exact.cast("decimal(38,0)") / n).cast("long")


def ns_to_us(ns: Column) -> Column:
    """i64 ns since epoch → i64 µs (floor, exact)."""
    return int_div_floor(ns, NS_PER_US)


def ns_to_ts(ns: Column) -> Column:
    """i64 ns since epoch → TimestampType (µs precision, truncating)."""
    return F.timestamp_micros(ns_to_us(ns))


def ts_to_ns(ts: Column) -> Column:
    """TimestampType → i64 ns since epoch (µs-exact)."""
    return F.unix_micros(ts) * NS_PER_US


def parse_time_literal(text: str) -> int:
    """Parse a nowdb time literal ('YYYY-MM-DD[THH:MM:SS[.frac]]') to ns."""
    text = text.strip()
    for fmt in (ISO_FULL + ".%f", ISO_FULL, ISO_DATE):
        try:
            dt = _dt.datetime.strptime(text, fmt).replace(tzinfo=_dt.timezone.utc)
            # floor-divide the whole µs offset: int(dt.timestamp())
            # truncates toward zero, which for pre-epoch fractional
            # literals would ADD the positive microsecond component
            # ('1969-12-31T23:59:59.5' must be -0.5e9 ns, not +0.5e9)
            epoch = _dt.datetime(1970, 1, 1, tzinfo=_dt.timezone.utc)
            us = (dt - epoch) // _dt.timedelta(microseconds=1)
            return us * NS_PER_US
        except ValueError:
            continue
    raise ValueError(f"not a time literal: {text!r}")


# --- component extractors over an ns-Long column --------------------
# (reference SQL names: year month mday wday yday hour minute second
#  milli micro nano epoch — fun/expr.h:479-494)

def _as_ts(ns: Column) -> Column:
    return ns_to_ts(ns)


def year(ns: Column) -> Column:
    return F.year(_as_ts(ns))


def month(ns: Column) -> Column:
    return F.month(_as_ts(ns))


def mday(ns: Column) -> Column:
    return F.dayofmonth(_as_ts(ns))


def wday(ns: Column) -> Column:
    # nowdb follows struct tm: 0=Sunday..6=Saturday; Spark dayofweek is
    # 1=Sunday..7=Saturday.
    return F.dayofweek(_as_ts(ns)) - 1


def yday(ns: Column) -> Column:
    return F.dayofyear(_as_ts(ns))


def hour(ns: Column) -> Column:
    return F.hour(_as_ts(ns))


def minute(ns: Column) -> Column:
    return F.minute(_as_ts(ns))


def second(ns: Column) -> Column:
    return F.second(_as_ts(ns))


def milli(ns: Column) -> Column:
    """Millisecond-of-second (0..999)."""
    return (F.pmod(ns, F.lit(NS_PER_SEC)) / NS_PER_MS).cast("long")


def micro(ns: Column) -> Column:
    """Microsecond-of-millisecond (0..999)."""
    return (F.pmod(ns, F.lit(NS_PER_MS)) / NS_PER_US).cast("long")


def nano(ns: Column) -> Column:
    """Nanosecond-of-microsecond (0..999)."""
    return F.pmod(ns, F.lit(NS_PER_US)).cast("long")


def epoch(ns: Column) -> Column:
    """Whole seconds since the Unix epoch (floor, exact)."""
    return int_div_floor(ns, NS_PER_SEC)


def now() -> Column:
    """Current time as ns-Long (µs-exact, like the reference's clock call)."""
    return F.unix_micros(F.current_timestamp()) * NS_PER_US


def dawn() -> Column:
    return F.lit(DAWN)


def dusk() -> Column:
    return F.lit(DUSK)
