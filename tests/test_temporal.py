"""Temporal kernels vs the pyarrow oracle (reference:
scalar_temporal_test.cc)."""

import datetime as dtm

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow_tpu as at
from arrow_tpu import compute as atc

from oracle import assert_array_equal

FIELDS = ["year", "month", "day", "quarter", "day_of_week", "day_of_year",
          "iso_year", "iso_week", "us_year", "us_week", "hour", "minute",
          "second", "millisecond", "microsecond", "is_leap_year",
          "subsecond"]


def rand_timestamps(rng, n, unit="us", null_prob=0.15):
    vals = rng.integers(-2_000_000_000, 4_000_000_000, n)  # ~1906..2096 (s)
    scale = {"s": 1, "ms": 10**3, "us": 10**6, "ns": 10**9}[unit]
    vals = vals * scale + rng.integers(0, scale, n)
    out = pa.array(vals, type=pa.int64()).cast(pa.timestamp(unit))
    if null_prob:
        mask = rng.random(n) < null_prob
        out = pa.array([None if m else v for m, v in
                        zip(mask, out.to_pylist())],
                       type=pa.timestamp(unit))
    return out


@pytest.mark.parametrize("fn", FIELDS)
@pytest.mark.parametrize("unit", ["s", "us"])
def test_fields_timestamp(rng, fn, unit):
    a = rand_timestamps(rng, 300, unit=unit)
    expected = getattr(pc, fn)(a)
    got = atc.call_function(fn, [at.array(a)])
    assert_array_equal(got, expected, msg=f"{fn}[{unit}]")


@pytest.mark.parametrize("fn", ["year", "month", "day", "day_of_week",
                                "iso_week", "us_week", "day_of_year",
                                "is_leap_year"])
def test_fields_date32(rng, fn):
    days = rng.integers(-40000, 40000, 200)
    a = pa.array(days, type=pa.int32()).cast(pa.date32())
    expected = getattr(pc, fn)(a)
    got = atc.call_function(fn, [at.array(a)])
    assert_array_equal(got, expected, msg=f"{fn}[date32]")


def test_day_of_week_options():
    a = pa.array([dtm.date(2024, 1, 1 + i) for i in range(14)],
                 type=pa.date32())
    for cfz, ws in [(True, 1), (False, 1), (True, 7), (False, 3)]:
        expected = pc.day_of_week(a, count_from_zero=cfz, week_start=ws)
        got = atc.call_function("day_of_week", [at.array(a)],
                                count_from_zero=cfz, week_start=ws)
        assert_array_equal(got, expected, msg=f"dow {cfz} {ws}")


def test_week_sunday_start(rng):
    days = rng.integers(0, 30000, 150)
    a = pa.array(days, type=pa.int32()).cast(pa.date32())
    for monday in [True, False]:
        expected = pc.week(a, week_starts_monday=monday)
        got = atc.call_function("week", [at.array(a)],
                                week_starts_monday=monday)
        assert_array_equal(got, expected, msg=f"week monday={monday}")


def test_time_fields(rng):
    vals = rng.integers(0, 86_400_000, 100)
    a = pa.array(vals, type=pa.int32()).cast(pa.time32("ms"))
    for fn in ["hour", "minute", "second", "millisecond"]:
        assert_array_equal(atc.call_function(fn, [at.array(a)]),
                           getattr(pc, fn)(a), msg=fn)


@pytest.mark.parametrize("mode", ["floor_temporal", "ceil_temporal",
                                  "round_temporal"])
@pytest.mark.parametrize("mult,unit", [(1, "hour"), (15, "minute"),
                                       (1, "day"), (30, "second")])
def test_round_temporal(rng, mode, mult, unit):
    a = rand_timestamps(rng, 200, unit="us")
    expected = getattr(pc, mode)(a, multiple=mult, unit=unit)
    got = atc.call_function(mode, [at.array(a)], multiple=mult, unit=unit)
    assert_array_equal(got, expected, msg=f"{mode} {mult}{unit}")


def test_year_month_day(rng):
    a = rand_timestamps(rng, 50, unit="s")
    got = atc.call_function("year_month_day", [at.array(a)])
    # oracle note: pc.year_month_day emits zeroed structs for pre-epoch
    # timestamps (pyarrow bug) — compare against the field kernels instead
    assert got.column("year").to_pylist() == pc.year(a).to_pylist()
    assert got.column("month").to_pylist() == pc.month(a).to_pylist()
    assert got.column("day").to_pylist() == pc.day(a).to_pylist()


def test_between_family_and_iso_calendar():
    import datetime as dtm
    from arrow_tpu.compute import call_function as cf
    a = pa.array([dtm.datetime(2020, 1, 31, 23),
                  dtm.datetime(2021, 3, 1, 5), None])
    b = pa.array([dtm.datetime(2020, 3, 1, 1),
                  dtm.datetime(2021, 3, 2, 4), dtm.datetime(2022, 1, 1)])
    for fn in ["years_between", "quarters_between", "weeks_between",
               "days_between", "hours_between", "minutes_between",
               "seconds_between", "milliseconds_between",
               "microseconds_between"]:
        got = cf(fn, [at.array(a), at.array(b)]).to_pylist()
        assert got == getattr(pc, fn)(a, b).to_pylist(), fn
    d = pa.array([dtm.date(2020, 1, 31), dtm.date(2020, 3, 1), None])
    assert cf("iso_calendar", [at.array(d)]).to_pylist() == \
        pc.iso_calendar(d).to_pylist()
