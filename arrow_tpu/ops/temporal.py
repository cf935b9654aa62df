"""Temporal field-extraction + rounding kernels.

Reference: ``cpp/src/arrow/compute/kernels/scalar_temporal_unary.cc`` /
``scalar_temporal_binary.cc`` (year/month/day/... extraction, ISO/US week
calendars, floor/ceil/round_temporal).

TPU-native: all extraction is pure int64 civil-calendar arithmetic
(Howard Hinnant's days-from-civil / civil-from-days algorithms — closed
form, branch-free, vectorizes perfectly on the VPU; no libc timezone
calls). Timezone-naive semantics (UTC), like the reference without a tz.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import datatype as dt
from ..core.array import Array
from ..compute.registry import Kind, NullHandling, register_function

__all__ = ["DayOfWeekOptions", "WeekOptions", "RoundTemporalOptions"]

_I64 = jnp.int64


class DayOfWeekOptions:
    def __init__(self, count_from_zero: bool = True, week_start: int = 1):
        self.count_from_zero = count_from_zero
        self.week_start = week_start  # 1=Monday .. 7=Sunday


class WeekOptions:
    def __init__(self, week_starts_monday: bool = True,
                 count_from_zero: bool = False,
                 first_week_is_fully_in_year: bool = False):
        self.week_starts_monday = week_starts_monday
        self.count_from_zero = count_from_zero
        self.first_week_is_fully_in_year = first_week_is_fully_in_year


class RoundTemporalOptions:
    def __init__(self, multiple: int = 1, unit: str = "day",
                 week_starts_monday: bool = True,
                 ceil_is_strictly_greater: bool = False,
                 calendar_based_origin: bool = False):
        self.multiple = multiple
        self.unit = unit
        self.week_starts_monday = week_starts_monday
        self.ceil_is_strictly_greater = ceil_is_strictly_greater
        self.calendar_based_origin = calendar_based_origin


# ---- civil calendar (vectorized Hinnant algorithms) ---------------------------

def civil_from_days(z: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """days-since-epoch -> (year, month, day), proleptic Gregorian."""
    z = z.astype(_I64) + 719468
    era = jnp.floor_divide(z, 146097)
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    m = mp + jnp.where(mp < 10, 3, -9)
    y = y + jnp.where(m <= 2, 1, 0)
    return y, m, d


def days_from_civil(y: jax.Array, m: jax.Array, d: jax.Array) -> jax.Array:
    y = y.astype(_I64) - jnp.where(m <= 2, 1, 0)
    era = jnp.floor_divide(y, 400)
    yoe = y - era * 400
    doy = (153 * (m + jnp.where(m > 2, -3, 9)) + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


_UNIT_NS = {"s": 1_000_000_000, "ms": 1_000_000, "us": 1_000, "ns": 1}
_DAY_NS = 86_400 * 1_000_000_000


def _unit_of(t: dt.DataType) -> Optional[int]:
    """ns per storage unit; None for date32 (days)."""
    if isinstance(t, dt.Date32Type):
        return None
    if isinstance(t, dt.Date64Type):
        return _UNIT_NS["ms"]
    if isinstance(t, (dt.TimestampType, dt.Time32Type, dt.Time64Type,
                      dt.DurationType)):
        return _UNIT_NS[t.unit]
    raise TypeError(f"not a temporal type: {t}")


def _days_and_tod_ns(a: Array) -> Tuple[jax.Array, jax.Array]:
    """(days since epoch, time-of-day in ns >= 0)."""
    t = a.type
    v = a.values.astype(_I64)
    if isinstance(t, dt.Date32Type):
        return v, jnp.zeros_like(v)
    if isinstance(t, (dt.Time32Type, dt.Time64Type)):
        return jnp.zeros_like(v), v * _unit_of(t)
    ns_per = _unit_of(t)
    per_day = _DAY_NS // ns_per
    days = jnp.floor_divide(v, per_day)
    tod = (v - days * per_day) * ns_per
    return days, tod


def _iso_weekday(z: jax.Array) -> jax.Array:
    """ISO weekday 1=Mon..7=Sun (1970-01-01 was a Thursday)."""
    return jnp.mod(z + 3, 7) + 1


def _iso_year_week(z: jax.Array, sunday_start: bool
                   ) -> Tuple[jax.Array, jax.Array]:
    """ISO (or US Sunday-start) year + week via the mid-week-day trick."""
    if sunday_start:
        wd = jnp.mod(z + 4, 7) + 1  # 1=Sun..7=Sat
    else:
        wd = _iso_weekday(z)
    z_mid = z + (4 - wd)            # Thursday (ISO) / Wednesday (US)
    y, _, _ = civil_from_days(z_mid)
    jan1 = days_from_civil(y, jnp.ones_like(y), jnp.ones_like(y))
    week = (z_mid - jan1) // 7 + 1
    return y, week


def _field(a: Array, name: str, options=None) -> Array:
    days, tod = _days_and_tod_ns(a)
    if name in ("year", "month", "day", "quarter", "is_leap_year",
                "day_of_year"):
        y, m, d = civil_from_days(days)
        if name == "year":
            out = y
        elif name == "month":
            out = m
        elif name == "day":
            out = d
        elif name == "quarter":
            out = (m - 1) // 3 + 1
        elif name == "day_of_year":
            out = days - days_from_civil(y, jnp.ones_like(y),
                                         jnp.ones_like(y)) + 1
        else:
            leap = (jnp.mod(y, 4) == 0) & ((jnp.mod(y, 100) != 0) |
                                           (jnp.mod(y, 400) == 0))
            return Array(dt.bool_, leap, a.validity, length=a.length)
    elif name == "day_of_week":
        opts = options or DayOfWeekOptions()
        wd0 = jnp.mod(days + 3, 7)  # 0=Mon..6=Sun
        shifted = jnp.mod(wd0 - (opts.week_start - 1), 7)
        out = shifted + (0 if opts.count_from_zero else 1)
    elif name in ("iso_year", "iso_week", "us_year", "us_week"):
        y, w = _iso_year_week(days, sunday_start=name.startswith("us"))
        out = y if name.endswith("year") else w
    elif name == "hour":
        out = tod // (3600 * 1_000_000_000)
    elif name == "minute":
        out = (tod // (60 * 1_000_000_000)) % 60
    elif name == "second":
        out = (tod // 1_000_000_000) % 60
    elif name == "millisecond":
        out = (tod // 1_000_000) % 1000
    elif name == "microsecond":
        out = (tod // 1_000) % 1000
    elif name == "nanosecond":
        out = tod % 1000
    elif name == "subsecond":
        frac = (tod % 1_000_000_000).astype(jnp.float64) / 1e9
        return Array(dt.float64, frac, a.validity, length=a.length)
    else:
        raise KeyError(name)
    return Array(dt.int64, out.astype(jnp.int64), a.validity,
                 length=a.length)


for _name in ["year", "month", "day", "quarter", "day_of_year", "hour",
              "minute", "second", "millisecond", "microsecond",
              "nanosecond", "subsecond", "is_leap_year", "iso_year",
              "iso_week", "us_year", "us_week"]:
    register_function(_name, Kind.SCALAR, 1)(
        lambda args, options, _n=_name: _field(args[0], _n, options))

register_function("day_of_week", Kind.SCALAR, 1,
                  options_class=DayOfWeekOptions)(
    lambda args, options: _field(args[0], "day_of_week", options))


@register_function("week", Kind.SCALAR, 1, options_class=WeekOptions)
def _week(args, options):
    opts = options or WeekOptions()
    if opts.count_from_zero or opts.first_week_is_fully_in_year:
        raise NotImplementedError("non-default WeekOptions")
    (a,) = args
    days, _ = _days_and_tod_ns(a)
    _, w = _iso_year_week(days, sunday_start=not opts.week_starts_monday)
    return Array(dt.int64, w.astype(jnp.int64), a.validity, length=a.length)


@register_function("year_month_day", Kind.SCALAR, 1,
                   null_handling=NullHandling.COMPUTED)
def _year_month_day(args, options):
    """Arrow emits struct<year,month,day>; this engine emits a 3-column
    Batch (structs surface as batches here)."""
    from ..core.batch import Batch
    from ..core.schema import Field, Schema
    (a,) = args
    days, _ = _days_and_tod_ns(a)
    y, m, d = civil_from_days(days)
    schema = Schema((Field("year", dt.int64, True),
                     Field("month", dt.int64, True),
                     Field("day", dt.int64, True)))
    return Batch(schema, [
        Array(dt.int64, y, a.validity, length=a.length),
        Array(dt.int64, m, a.validity, length=a.length),
        Array(dt.int64, d, a.validity, length=a.length)], a.length)


# ---- temporal rounding ---------------------------------------------------------

_ROUND_UNIT_NS = {
    "nanosecond": 1, "microsecond": 1_000, "millisecond": 1_000_000,
    "second": 1_000_000_000, "minute": 60 * 1_000_000_000,
    "hour": 3600 * 1_000_000_000, "day": _DAY_NS, "week": 7 * _DAY_NS,
}


def _round_temporal(a: Array, options, mode: str) -> Array:
    opts = options or RoundTemporalOptions()
    if opts.unit not in _ROUND_UNIT_NS:
        raise NotImplementedError(f"round_temporal unit {opts.unit!r} "
                                  "(month/quarter/year are calendar-based)")
    t = a.type
    ns_per = _unit_of(t) or _DAY_NS
    scale_ns = _ROUND_UNIT_NS[opts.unit] * max(int(opts.multiple), 1)
    if scale_ns % ns_per != 0 and ns_per % scale_ns != 0:
        raise ValueError("rounding unit finer than storage unit")
    scale = max(scale_ns // ns_per, 1)
    v = a.values.astype(_I64)
    if opts.unit == "week":
        # weeks anchor on Monday (or Sunday): epoch was a Thursday
        anchor = 4 if opts.week_starts_monday else 3
        shift = anchor * (_DAY_NS // ns_per)
        v = v + shift
    if mode == "floor":
        out = jnp.floor_divide(v, scale) * scale
    elif mode == "ceil":
        out = -jnp.floor_divide(-v, scale) * scale
        if opts.ceil_is_strictly_greater:
            out = jnp.where(out == v, out + scale, out)
    else:
        out = jnp.floor_divide(v + scale // 2, scale) * scale
    if opts.unit == "week":
        out = out - shift
    return Array(t, out.astype(a.values.dtype), a.validity, length=a.length)


for _m in ("floor", "ceil", "round"):
    register_function(f"{_m}_temporal", Kind.SCALAR, 1,
                      options_class=RoundTemporalOptions)(
        lambda args, options, _mm=_m: _round_temporal(args[0], options,
                                                      _mm))


class StrftimeOptions:
    def __init__(self, format: str = "%Y-%m-%dT%H:%M:%S",
                 locale: str = "C"):
        self.format = format
        self.locale = locale


class StrptimeOptions:
    def __init__(self, format: str = "%Y-%m-%dT%H:%M:%S", unit: str = "us",
                 error_is_null: bool = False):
        self.format = format
        self.unit = unit
        self.error_is_null = error_is_null


@register_function("strftime", Kind.SCALAR, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=StrftimeOptions)
def _strftime(args, options):
    """Timestamp -> formatted string. HOST-BOUNDARY kernel: text
    formatting is not device work (the reference also just calls libc);
    runs at materialization edges, not inside jit. Routed through
    pyarrow's own strftime (the reference implementation) with a python
    fallback for formats it rejects."""
    import datetime as _dtm
    import numpy as np_
    (a,) = args
    opts = options or StrftimeOptions()
    if "%f" not in opts.format:
        # pc.strftime has no %f (its %S already carries subseconds);
        # everything else matches python strftime
        try:
            import pyarrow.compute as _pc
            from ..core.interop import array_to_pyarrow
            from ..core.array import array as make_array
            out = _pc.strftime(array_to_pyarrow(a), format=opts.format)
            return make_array(out, capacity=a.capacity)
        except Exception:
            pass
    t = a.type
    days, tod = _days_and_tod_ns(a)
    days_h = np_.asarray(jax.device_get(days))
    tod_h = np_.asarray(jax.device_get(tod))
    valid = np_.asarray(jax.device_get(a.validity)) \
        if a.validity is not None else None
    n = len(a)
    outs = []
    epoch = _dtm.datetime(1970, 1, 1)
    for i in range(n):
        if valid is not None and not valid[i]:
            outs.append(None)
            continue
        ts = epoch + _dtm.timedelta(days=int(days_h[i]),
                                    microseconds=int(tod_h[i]) // 1000)
        outs.append(ts.strftime(opts.format))
    from ..core.array import array as make_array
    import pyarrow as pa
    return make_array(pa.array(outs, type=pa.string()),
                      capacity=a.capacity)


@register_function("strptime", Kind.SCALAR, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=StrptimeOptions)
def _strptime(args, options):
    """String -> timestamp. HOST-BOUNDARY kernel (see strftime)."""
    import datetime as _dtm
    (a,) = args
    opts = options or StrptimeOptions()
    if "%f" not in opts.format:
        # %f is python-only (glibc strptime rejects it); any other pc
        # failure falls back to the python path, which re-raises parse
        # errors with the right error_is_null semantics itself
        try:
            import pyarrow.compute as _pc
            from ..core.interop import array_to_pyarrow
            from ..core.array import array as make_array
            out = _pc.strptime(array_to_pyarrow(a), format=opts.format,
                               unit=opts.unit,
                               error_is_null=opts.error_is_null)
            return make_array(out, capacity=a.capacity)
        except Exception:
            pass
    vals = a.to_pylist()
    epoch = _dtm.datetime(1970, 1, 1)
    scale = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[opts.unit]
    out = []
    for v in vals:
        if v is None:
            out.append(None)
            continue
        try:
            ts = _dtm.datetime.strptime(v, opts.format)
            out.append(int((ts - epoch).total_seconds() * scale))
        except ValueError:
            if opts.error_is_null:
                out.append(None)
            else:
                raise
    import numpy as np_
    from ..core.array import Array as _Arr
    t = dt.timestamp(opts.unit)
    buf = np_.zeros((a.capacity,), np_.int64)
    validity = np_.zeros((a.capacity,), np_.bool_)
    for i, v in enumerate(out):
        if v is not None:
            buf[i] = v
            validity[i] = True
    has_null = any(v is None for v in out)
    return _Arr(t, jnp.asarray(buf),
                jnp.asarray(validity) if has_null else None,
                length=len(out))


# ---- temporal difference kernels ("*_between", scalar_temporal_binary.cc) ---

_BETWEEN_UNIT_NS = {
    "hours": 3600 * 10**9, "minutes": 60 * 10**9, "seconds": 10**9,
    "milliseconds": 10**6, "microseconds": 10**3, "nanoseconds": 1,
}


def _register_between():
    def make(name):
        def _exec(args, options, _n=name):
            a, b = args
            da, ta = _days_and_tod_ns(a)
            db, tb = _days_and_tod_ns(b)
            if _n == "days":
                out = db - da
            elif _n == "weeks":
                # week-boundary crossings, Monday start (epoch day 4 was
                # the first Monday)
                out = jnp.floor_divide(db.astype(jnp.int64) - 4, 7) - \
                    jnp.floor_divide(da.astype(jnp.int64) - 4, 7)
            elif _n == "years":
                out = _field(b, "year", None).values - \
                    _field(a, "year", None).values
            elif _n == "quarters":
                ya = _field(a, "year", None).values
                yb = _field(b, "year", None).values
                qa = _field(a, "quarter", None).values
                qb = _field(b, "quarter", None).values
                out = (yb * 4 + qb) - (ya * 4 + qa)
            else:
                u = _BETWEEN_UNIT_NS[_n]
                ta_t = da.astype(jnp.int64) * (86_400 * 10**9) + ta
                tb_t = db.astype(jnp.int64) * (86_400 * 10**9) + tb
                out = jnp.floor_divide(tb_t, u) - jnp.floor_divide(ta_t, u)
            validity = None
            for x in (a, b):
                if x.validity is not None:
                    validity = x.validity if validity is None else \
                        (validity & x.validity)
            return Array(dt.int64, out.astype(jnp.int64), validity,
                         length=a.length)
        return _exec

    for n in ["years", "quarters", "weeks", "days", "hours", "minutes",
              "seconds", "milliseconds", "microseconds", "nanoseconds"]:
        register_function(f"{n}_between", Kind.SCALAR, 2,
                          null_handling=NullHandling.COMPUTED)(make(n))


_register_between()


# ---- interval-producing *_between (scalar_temporal_binary.cc:178-275) ------

def _between_validity(a: Array, b: Array):
    validity = None
    for x in (a, b):
        if x.validity is not None:
            validity = x.validity if validity is None else \
                (validity & x.validity)
    return validity


def _interval_struct(t, comps, validity, length, cap):
    children = tuple(
        Array(ft, v.astype(ft.storage_np), None, length=length)
        for (_n, ft), v in zip(t.fields, comps))
    return Array(t, jnp.zeros((cap,), jnp.uint8), validity, length=length,
                 children=children)


@register_function("month_interval_between", Kind.SCALAR, 2,
                   null_handling=NullHandling.COMPUTED)
def _month_interval_between(args, options):
    """MonthsBetween (scalar_temporal_binary.cc:178): calendar month
    index difference as a month_interval."""
    a, b = args
    da, _ = _days_and_tod_ns(a)
    db, _ = _days_and_tod_ns(b)
    ya, ma, _ = civil_from_days(da)
    yb, mb, _ = civil_from_days(db)
    out = (yb * 12 + mb) - (ya * 12 + ma)
    return Array(dt.month_interval, out.astype(jnp.int32),
                 _between_validity(a, b), length=a.length)


@register_function("day_time_interval_between", Kind.SCALAR, 2,
                   null_handling=NullHandling.COMPUTED)
def _day_time_interval_between(args, options):
    """DayTimeBetween (scalar_temporal_binary.cc:253): whole-day
    difference + time-of-day millisecond difference."""
    a, b = args
    da, ta = _days_and_tod_ns(a)
    db, tb = _days_and_tod_ns(b)
    days = (db - da).astype(jnp.int32)
    millis = (tb // 1_000_000 - ta // 1_000_000).astype(jnp.int32)
    return _interval_struct(dt.day_time_interval, (days, millis),
                            _between_validity(a, b), a.length, a.capacity)


@register_function("month_day_nano_interval_between", Kind.SCALAR, 2,
                   null_handling=NullHandling.COMPUTED)
def _month_day_nano_interval_between(args, options):
    """MonthDayNanoBetween (scalar_temporal_binary.cc:224): calendar
    month difference, day-of-month difference, time-of-day nanosecond
    difference."""
    a, b = args
    da, ta = _days_and_tod_ns(a)
    db, tb = _days_and_tod_ns(b)
    ya, ma, dda = civil_from_days(da)
    yb, mb, ddb = civil_from_days(db)
    months = ((yb * 12 + mb) - (ya * 12 + ma)).astype(jnp.int32)
    days = (ddb - dda).astype(jnp.int32)
    nanos = (tb - ta).astype(jnp.int64)
    return _interval_struct(dt.month_day_nano_interval,
                            (months, days, nanos),
                            _between_validity(a, b), a.length, a.capacity)


@register_function("iso_calendar", Kind.SCALAR, 1,
                   null_handling=NullHandling.COMPUTED)
def _iso_calendar(args, options):
    """struct<iso_year, iso_week, iso_day_of_week> (temporal.cc
    ISOCalendar)."""
    (a,) = args
    days, _ = _days_and_tod_ns(a)
    y, w = _iso_year_week(days, sunday_start=False)
    dow = jnp.mod(days + 3, 7) + 1       # ISO: 1=Mon..7=Sun
    cap = a.capacity
    t = dt.struct([("iso_year", dt.int64), ("iso_week", dt.int64),
                   ("iso_day_of_week", dt.int64)])
    children = [Array(dt.int64, v.astype(jnp.int64), a.validity,
                      length=a.length)
                for v in (y, w, dow)]
    return Array(t, jnp.zeros((cap,), jnp.uint8), a.validity,
                 length=a.length, children=children)


# ---- timezone kernels (HOST-BOUNDARY: the tz database lives on the host;
# the reference links its own tzdb the same way, temporal.cc) ------------

class AssumeTimezoneOptions:
    def __init__(self, timezone: str = "UTC", ambiguous: str = "raise",
                 nonexistent: str = "raise"):
        self.timezone = timezone
        self.ambiguous = ambiguous
        self.nonexistent = nonexistent


def _ts_scale(unit: str) -> int:
    return {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]


def _host_ts_map(a, fn, out_type):
    """Map each timestamp value (as utc-naive datetime) through fn."""
    import datetime as _dtm
    import numpy as np_
    t = a.type
    scale = _ts_scale(t.unit)
    vals = np_.asarray(jax.device_get(a.values))[:len(a)]
    valid = np_.asarray(jax.device_get(a.validity))[:len(a)] \
        if a.validity is not None else None
    epoch = _dtm.datetime(1970, 1, 1)
    buf = np_.zeros((a.capacity,), np_.int64)
    for i, v in enumerate(vals):
        if valid is not None and not valid[i]:
            continue
        us = int(v) * (10**6 // scale) if scale <= 10**6 \
            else int(v) // (scale // 10**6)
        buf[i] = fn(epoch + _dtm.timedelta(microseconds=us))
    return buf


@register_function("assume_timezone", Kind.SCALAR, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=AssumeTimezoneOptions)
def _assume_timezone(args, options):
    """Naive wall time -> instant in options.timezone
    (``temporal.cc`` AssumeTimezone)."""
    from zoneinfo import ZoneInfo
    (a,) = args
    tz = ZoneInfo(options.timezone)
    scale = _ts_scale(a.type.unit)
    import datetime as _dtm
    epoch = _dtm.datetime(1970, 1, 1, tzinfo=_dtm.timezone.utc)

    def conv(naive):
        aware = naive.replace(tzinfo=tz)
        return round((aware - epoch).total_seconds() * scale)
    buf = _host_ts_map(a, conv, None)
    out_t = dt.timestamp(a.type.unit, options.timezone)
    return Array(out_t, jnp.asarray(buf), a.validity, length=a.length)


@register_function("local_timestamp", Kind.SCALAR, 1,
                   null_handling=NullHandling.COMPUTED)
def _local_timestamp(args, options):
    """Instant -> naive local wall time in the column's timezone."""
    from zoneinfo import ZoneInfo
    import datetime as _dtm
    (a,) = args
    tz = ZoneInfo(a.type.tz or "UTC")
    scale = _ts_scale(a.type.unit)
    epoch = _dtm.datetime(1970, 1, 1)

    def conv(utc_naive):
        aware = utc_naive.replace(tzinfo=_dtm.timezone.utc).astimezone(tz)
        return round((aware.replace(tzinfo=None) - epoch
                      ).total_seconds() * scale)
    buf = _host_ts_map(a, conv, None)
    out_t = dt.timestamp(a.type.unit)
    return Array(out_t, jnp.asarray(buf), a.validity, length=a.length)


@register_function("is_dst", Kind.SCALAR, 1,
                   null_handling=NullHandling.COMPUTED)
def _is_dst(args, options):
    """Daylight-savings flag of each instant in the column's timezone."""
    from zoneinfo import ZoneInfo
    import datetime as _dtm
    import numpy as np_
    (a,) = args
    tz = ZoneInfo(a.type.tz or "UTC")

    def conv(utc_naive):
        aware = utc_naive.replace(tzinfo=_dtm.timezone.utc).astimezone(tz)
        return 1 if aware.dst() else 0
    buf = _host_ts_map(a, conv, None)
    return Array(dt.bool_, jnp.asarray(buf != 0), a.validity,
                 length=a.length)
