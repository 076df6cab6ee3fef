"""Time policy: int64 stamps with a configurable unit and epoch.

The reference stores DATE/TIME as int64 units since a configurable
epoch (reference: types/types.h:70-71).  By default a unit is one
nanosecond and the epoch is the Unix epoch; a server may reconfigure
both process-globally (types/time.h:48-95: `nowdb_time_setPerSec`
takes units-per-second, default 1e9; `nowdb_time_setEpoch` takes the
offset of the Unix epoch expressed in the current unit, added when
converting from system time — so an epoch one second AFTER the Unix
epoch is `setEpoch(-1_000_000_000)`).  Range constants DAWN/DUSK are
int64 min/max (types/time.h:27-28); ISO-8601 literal formats are
%Y-%m-%dT%H:%M:%S / %Y-%m-%d (types/time.h:36-37).

Spark's TimestampType is microsecond precision, so to stay
bit-compatible we keep stamps as LongType inside the engine and
convert at the presentation / extraction edge.  These helpers build
Column expressions for both directions plus the time-component
extractors of the nowdb scalar surface (reference: fun/expr.h:479-494).

Like the reference, unit/epoch are process-global and meant to be set
once at startup, before any data is written: stored stamps and the
day-bucket partition values derived from them are raw int64s — data
written under one configuration must not be read under another (the
reference shares this property; time.h documents the set-before-use
discipline).
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

# --- process-global unit/epoch (time.h:48-95, time.c:58) ------------

_per_sec: int = NS_PER_SEC   # units per second (default: nanosecond)
_epoch: int = 0              # Unix-epoch offset in current units


def set_per_sec(unit: int) -> None:
    """nowdb_time_setPerSec: set the unit as units-per-second.

    The reference converts with integer `NANOPERSEC/persec`
    (time.c:96,121), so the unit must divide one nanosecond-second
    evenly; same constraint here.  Set the unit BEFORE the epoch
    (time.h's documented discipline) and before any data is written.
    """
    if unit <= 0 or NS_PER_SEC % unit:
        raise ValueError(f"units-per-second must divide {NS_PER_SEC}: {unit}")
    global _per_sec
    _per_sec = int(unit)


def get_per_sec() -> int:
    """nowdb_time_getPerSec."""
    return _per_sec


def set_epoch(epoch: int) -> None:
    """nowdb_time_setEpoch: offset of the Unix epoch in current units.

    The offset is ADDED when converting from system time, so an epoch
    starting one second after the Unix epoch is set as -1 second
    (time.h:49-65).  Reset to 0 before setting a new value.
    """
    global _epoch
    if epoch != 0 and _epoch != 0:
        raise ValueError("epoch already set; reset with set_epoch(0) first")
    _epoch = int(epoch)


def get_epoch() -> int:
    """nowdb_time_getEpoch (0 = Unix epoch)."""
    return _epoch


def units_per_day() -> int:
    return 86_400 * _per_sec


def day_bucket(stamp: Column) -> Column:
    """Stamp → day-bucket index for partitioned writes and pruning.

    Raw `stamp // units_per_day` — under a non-Unix epoch the buckets
    are day-length spans offset from UTC midnight, which is fine: the
    same expression prunes them (write and read must share the
    configuration, per the module policy above).
    """
    return int_div_floor(stamp, units_per_day())


def _ns_per_unit() -> int:
    return NS_PER_SEC // _per_sec


def int_div_floor(col: Column, n: int) -> Column:
    """Exact floor-division of a Long column by n.

    `col / n` in Spark is double true-division — casting an i64 ns
    stamp (~1.7e18) to double loses the low bits, so the quotient can
    be off by one. Subtract the pmod remainder (long-exact), then the
    decimal division is exact.
    """
    exact = col - F.pmod(col, F.lit(n))
    return (exact.cast("decimal(38,0)") / n).cast("long")


def to_unix_ns(stamp: Column) -> Column:
    """Stamp (configured unit/epoch) → i64 ns since the Unix epoch.

    Identity under the default configuration, so default plans carry
    no extra expression nodes.
    """
    if _epoch:
        stamp = stamp - F.lit(_epoch)
    if _per_sec != NS_PER_SEC:
        stamp = stamp * F.lit(_ns_per_unit())
    return stamp


def from_unix_ns(ns: int) -> int:
    """i64 ns since the Unix epoch → stamp (floor to the unit grid)."""
    return ns // _ns_per_unit() + _epoch


def ns_to_us(stamp: Column) -> Column:
    """Stamp → i64 µs since the Unix epoch (floor, exact)."""
    return int_div_floor(to_unix_ns(stamp), NS_PER_US)


def ns_to_ts(stamp: Column) -> Column:
    """Stamp → TimestampType (µs precision, truncating)."""
    return F.timestamp_micros(ns_to_us(stamp))


def ts_to_ns(ts: Column) -> Column:
    """TimestampType → stamp (µs-exact, floor to the unit grid)."""
    ns = F.unix_micros(ts) * NS_PER_US
    if _per_sec != NS_PER_SEC:
        ns = int_div_floor(ns, _ns_per_unit())
    if _epoch:
        ns = ns + F.lit(_epoch)
    return ns


def parse_time_literal(text: str) -> int:
    """Parse a nowdb time literal ('YYYY-MM-DD[THH:MM:SS[.frac]]') to a
    stamp in the configured unit/epoch."""
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
            return from_unix_ns(us * NS_PER_US)
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
    return (F.pmod(to_unix_ns(ns), F.lit(NS_PER_SEC)) / NS_PER_MS).cast("long")


def micro(ns: Column) -> Column:
    """Microsecond-of-millisecond (0..999)."""
    return (F.pmod(to_unix_ns(ns), F.lit(NS_PER_MS)) / NS_PER_US).cast("long")


def nano(ns: Column) -> Column:
    """Nanosecond-of-microsecond (0..999)."""
    return F.pmod(to_unix_ns(ns), F.lit(NS_PER_US)).cast("long")


def epoch(ns: Column) -> Column:
    """Whole seconds since the Unix epoch (floor, exact)."""
    return int_div_floor(to_unix_ns(ns), NS_PER_SEC)


def now() -> Column:
    """Current time as a stamp (µs-exact, like the reference's clock call)."""
    return ts_to_ns(F.current_timestamp())


def dawn() -> Column:
    return F.lit(DAWN)


def dusk() -> Column:
    return F.lit(DUSK)


# --- physical-encoding normalization --------------------------------

def stamp_col_to_ns(col: Column, dtype) -> Column:
    """Rewrite one column of any physical stamp encoding to Long ns.

    The engine's stamp policy is int64 nanoseconds (types/types.h:70-71),
    but parquet files arrive in three physical encodings:

      * INT64 / TIMESTAMP(NANOS): already Long ns (with
        ``spark.sql.legacy.parquet.nanosAsLong`` for the NANOS case) —
        passed through unchanged;
      * TIMESTAMP (instant / LTZ): ``unix_micros`` — an epoch instant,
        timezone-free by construction;
      * TIMESTAMP_NTZ (e.g. parquet ``timestamp[us]`` with
        isAdjustedToUTC=false, what pandas/pyarrow writers emit):
        wall-clock diff against the NTZ epoch literal via
        ``timestamp_diff`` — deliberately NOT a cast to TimestampType,
        which would re-interpret the wall clock in the session timezone
        and break on non-UTC drivers.

    All three yield identical Longs for the same stored instant, so
    results are independent of both file encoding and session tz.
    """
    from pyspark.sql import types as T

    if isinstance(dtype, T.TimestampNTZType):
        ntz_epoch = F.to_timestamp_ntz(F.lit("1970-01-01 00:00:00"))
        return F.timestamp_diff("MICROSECOND", ntz_epoch, col) * F.lit(NS_PER_US)
    if isinstance(dtype, T.TimestampType):
        return F.unix_micros(col) * F.lit(NS_PER_US)
    return col


def normalize_stamps(df, columns=None):
    """Normalize timestamp-typed columns of ``df`` to Long ns stamps.

    ``columns=None`` rewrites every TimestampType/TimestampNTZType
    column; pass an explicit list to restrict (engine mounts restrict
    to the columns the user declared ``time``).  Long columns are left
    untouched, so the call is idempotent and safe across all physical
    encodings (see stamp_col_to_ns).
    """
    from pyspark.sql import types as T

    targets = {
        f.name for f in df.schema.fields
        if (columns is None or f.name in columns)
        and isinstance(f.dataType, (T.TimestampType, T.TimestampNTZType))
    }
    if not targets:
        return df
    return df.select(*[
        stamp_col_to_ns(F.col(f.name), f.dataType).alias(f.name)
        if f.name in targets else F.col(f.name)
        for f in df.schema.fields
    ])
