"""Scalar kernels vs the pyarrow oracle — golden values + randomized
property tests (reference test style: vector_selection_test.cc JSON literals
+ RandomArrayGenerator oracle checks)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow_tpu as at
from arrow_tpu import compute as atc

from oracle import assert_array_equal, random_numeric_array

NUMERIC_TYPES = [pa.int8(), pa.int16(), pa.int32(), pa.int64(),
                 pa.uint8(), pa.uint16(), pa.uint32(), pa.uint64(),
                 pa.float32(), pa.float64()]

BINARY_ARITH = ["add", "subtract", "multiply"]
COMPARE = ["equal", "not_equal", "less", "less_equal", "greater",
           "greater_equal"]


@pytest.mark.parametrize("fn", BINARY_ARITH)
@pytest.mark.parametrize("ta", [pa.int32(), pa.int64(), pa.uint16(),
                                pa.float64()])
@pytest.mark.parametrize("tb", [pa.int8(), pa.uint32(), pa.float32()])
def test_binary_arith_oracle(rng, fn, ta, tb):
    n = 333
    # small magnitudes: avoid int overflow divergence in promotion tests
    a = random_numeric_array(rng, n, ta, null_prob=0.2, small=True)
    b = random_numeric_array(rng, n, tb, null_prob=0.2, small=True)
    expected = getattr(pc, fn)(a, b)
    got = atc.call_function(fn, [at.array(a), at.array(b)])
    assert_array_equal(got, expected, msg=f"{fn}({ta},{tb})")


@pytest.mark.parametrize("fn", COMPARE)
def test_compare_oracle(rng, fn):
    n = 500
    for ta, tb in [(pa.int64(), pa.int64()), (pa.int32(), pa.float64()),
                   (pa.uint8(), pa.int16())]:
        a = random_numeric_array(rng, n, ta, null_prob=0.15)
        b = random_numeric_array(rng, n, tb, null_prob=0.15)
        expected = getattr(pc, fn)(a, b)
        got = atc.call_function(fn, [at.array(a), at.array(b)])
        assert_array_equal(got, expected, msg=f"{fn}({ta},{tb})")


def test_arith_with_scalar(rng):
    a = random_numeric_array(rng, 100, pa.int64(), null_prob=0.1)
    got = atc.call_function("add", [at.array(a), 5])
    assert_array_equal(got, pc.add(a, 5))
    got = atc.call_function("less", [at.array(a), 0])
    assert_array_equal(got, pc.less(a, 0))


def test_divide_floats(rng):
    a = random_numeric_array(rng, 64, pa.float64(), null_prob=0.1)
    b = random_numeric_array(rng, 64, pa.float64(), null_prob=0.1)
    assert_array_equal(atc.call_function("divide", [at.array(a), at.array(b)]),
                       pc.divide(a, b))


def test_int_divide_truncates():
    a = pa.array([7, -7, 7, -7, None], type=pa.int64())
    b = pa.array([2, 2, -2, -2, 3], type=pa.int64())
    assert_array_equal(atc.call_function("divide",
                                         [at.array(a), at.array(b)]),
                       pc.divide(a, b))


@pytest.mark.parametrize("fn", ["and", "or", "xor", "and_kleene",
                                "or_kleene", "and_not", "and_not_kleene"])
def test_boolean_oracle(rng, fn):
    vals = [True, False, None]
    a = pa.array([vals[i % 3] for i in range(27)])
    b = pa.array([vals[(i // 3) % 3] for i in range(27)])
    expected = getattr(pc, fn)(a, b)
    got = atc.call_function(fn, [at.array(a), at.array(b)])
    assert_array_equal(got, expected, msg=fn)


def test_invert():
    a = pa.array([True, None, False])
    assert_array_equal(atc.call_function("invert", [at.array(a)]),
                       pc.invert(a))


@pytest.mark.parametrize("fn", ["is_null", "is_valid", "is_nan", "is_finite",
                                "is_inf"])
def test_validity_kernels(fn):
    a = pa.array([1.0, None, float("nan"), float("inf"), -1.0])
    expected = getattr(pc, fn)(a)
    got = atc.call_function(fn, [at.array(a)])
    assert_array_equal(got, expected, msg=fn)


def test_if_else_oracle(rng):
    n = 200
    cond = pa.array((rng.random(n) < 0.5).tolist(),
                    type=pa.bool_())
    cond = pa.array([None if rng.random() < 0.1 else c.as_py()
                     for c in cond], type=pa.bool_())
    left = random_numeric_array(rng, n, pa.int64(), null_prob=0.1)
    right = random_numeric_array(rng, n, pa.int64(), null_prob=0.1)
    expected = pc.if_else(cond, left, right)
    got = atc.call_function("if_else",
                            [at.array(cond), at.array(left),
                             at.array(right)])
    assert_array_equal(got, expected)


def test_coalesce_and_fill_null(rng):
    a = pa.array([1, None, None, 4], type=pa.int64())
    b = pa.array([None, 2, None, 40], type=pa.int64())
    assert_array_equal(
        atc.call_function("coalesce", [at.array(a), at.array(b)]),
        pc.coalesce(a, b))
    assert_array_equal(
        atc.call_function("fill_null", [at.array(a), 9]),
        pc.fill_null(a, 9))


def test_unary_math_oracle(rng):
    a = pa.array(np.abs(rng.standard_normal(100)) + 0.1)
    for fn in ["sqrt", "abs", "negate", "sign"]:  # IEEE-exact ops
        expected = getattr(pc, fn)(a)
        got = atc.call_function(fn, [at.array(a)])
        assert_array_equal(got, expected, msg=fn)
    for fn in ["ln", "exp", "log10", "sin", "cos", "tanh"]:
        # transcendentals: XLA libm vs Arrow libm differ in last ulps
        expected = getattr(pc, fn)(a)
        got = atc.call_function(fn, [at.array(a)])
        assert_array_equal(got, expected, msg=fn, rtol=1e-13)


def test_round_oracle():
    a = pa.array([1.45, 2.5, -1.5, 3.14159, None])
    assert_array_equal(
        atc.call_function("round", [at.array(a)]),
        pc.round(a))
    from arrow_tpu.ops.scalar_arithmetic import RoundOptions
    assert_array_equal(
        atc.call_function("round", [at.array(a)],
                          options=RoundOptions(ndigits=2)),
        pc.round(a, ndigits=2))


def test_cast_numeric(rng):
    a = random_numeric_array(rng, 100, pa.int64(), null_prob=0.1)
    a = pc.bit_wise_and(a, 127)
    got = atc.cast(at.array(a), at.float32)
    assert_array_equal(got, pc.cast(a, pa.float32()))
    got = atc.cast(at.array(a), at.int16)
    assert_array_equal(got, pc.cast(a, pa.int16(), safe=False))


def test_cast_dictionary_decode():
    d = pa.array(["a", "b", "a", None, "c"]).dictionary_encode()
    got = atc.cast(at.array(d), at.string)
    assert_array_equal(got, pc.cast(d, pa.string()))


def test_min_max_element_wise(rng):
    a = random_numeric_array(rng, 100, pa.int64())
    b = random_numeric_array(rng, 100, pa.int64())
    assert_array_equal(
        atc.call_function("max_element_wise", [at.array(a), at.array(b)]),
        pc.max_element_wise(a, b))


def test_cast_int_to_string(rng):
    from arrow_tpu.ops.scalar_cast import CastOptions
    import arrow_tpu.core.datatype as dt
    vals = list(rng.integers(-10**17, 10**17, 300)) + [
        0, -1, -9223372036854775808, 9223372036854775807, None]
    a = pa.array([None if v is None else int(v) for v in vals],
                 type=pa.int64())
    got = atc.call_function("cast", [at.array(a)],
                            options=CastOptions(dt.string))
    assert_array_equal(got, a.cast(pa.string()), msg="int->string")


def test_cast_string_to_int(rng):
    from arrow_tpu.ops.scalar_cast import CastOptions
    import arrow_tpu.core.datatype as dt
    s = pa.array(["123", "-456", "+7", "0", None, "bad", "",
                  "9223372036854775807", "00042"])
    got = atc.call_function("cast", [at.array(s)],
                            options=CastOptions(dt.int64))
    assert got.to_pylist() == [123, -456, 7, 0, None, None, None,
                               9223372036854775807, 42]


def test_cast_string_to_float(rng):
    import math
    from arrow_tpu.ops.scalar_cast import CastOptions
    import arrow_tpu.core.datatype as dt
    vals = ["1.5", "-2.25", "3", ".5", "1e3", "-1.5e-2", "2.5E4", None,
            "inf", "-inf", "nan", "123456.789", "0.000001", "-0"]
    s = pa.array(vals)
    got = atc.call_function("cast", [at.array(s)],
                            options=CastOptions(dt.float64)).to_pylist()
    exp = s.cast(pa.float64()).to_pylist()
    for g, e in zip(got, exp):
        if e is None:
            assert g is None
        elif math.isnan(e):
            assert math.isnan(g)
        elif math.isinf(e):
            assert g == e
        else:
            assert abs(g - e) <= 1e-12 * max(1.0, abs(e)), (g, e)
    # parse failures are NULL here (the reference's safe cast raises —
    # unchecked-cast divergence, documented)
    bad = atc.call_function("cast", [at.array(pa.array(["x", ""]))],
                            options=CastOptions(dt.float64))
    assert bad.to_pylist() == [None, None]


# ---- temporal / string / bool casts (scalar_cast_temporal.cc parity) --------

def _cast(vals_pa, target):
    from arrow_tpu.ops.scalar_cast import CastOptions
    return atc.call_function(
        "cast", [at.array(vals_pa)],
        options=CastOptions(target)).to_pyarrow()


def test_cast_timestamp_unit_scaling():
    from arrow_tpu.core import datatype as dt
    a = pa.array([1, -1, 1699999999], type=pa.timestamp("s"))
    assert _cast(a, dt.timestamp("ms")).equals(a.cast(pa.timestamp("ms")))
    b = pa.array([1500, -1500], type=pa.timestamp("ms"))
    # downscale truncates toward zero (C++ integer division)
    assert _cast(b, dt.timestamp("s")).equals(
        b.cast(pa.timestamp("s"), safe=False))


def test_cast_timestamp_to_date_and_time_floors():
    from arrow_tpu.core import datatype as dt
    ts = pa.array([86400_000_000, -1, 123_456_789], type=pa.timestamp("us"))
    for tgt_at, tgt_pa in [(dt.date32, pa.date32()),
                           (dt.date64, pa.date64()),
                           (dt.time32("ms"), pa.time32("ms")),
                           (dt.time64("us"), pa.time64("us"))]:
        assert _cast(ts, tgt_at).equals(ts.cast(tgt_pa, safe=False))


def test_cast_date_duration_units():
    from arrow_tpu.core import datatype as dt
    d = pa.array([0, 1, -1], type=pa.date32())
    assert _cast(d, dt.timestamp("us")).equals(d.cast(pa.timestamp("us")))
    assert _cast(d, dt.date64).equals(d.cast(pa.date64()))
    du = pa.array([1500, -1500], type=pa.duration("ms"))
    assert _cast(du, dt.duration("s")).equals(
        du.cast(pa.duration("s"), safe=False))
    assert _cast(du, dt.duration("ns")).equals(du.cast(pa.duration("ns")))


def test_cast_bool_string_roundtrip():
    from arrow_tpu.core import datatype as dt
    bl = pa.array([True, False, None])
    assert _cast(bl, dt.string).equals(bl.cast(pa.string()))
    s = pa.array(["1", "true", "FALSE", "0", None])
    assert _cast(s, dt.bool_).equals(s.cast(pa.bool_()))


def test_cast_float_to_string():
    from arrow_tpu.core import datatype as dt
    f = pa.array([1.5, 0.1, -2.25, float("nan"), float("inf"), None])
    assert _cast(f, dt.string).equals(f.cast(pa.string()))


def test_cast_string_to_temporal():
    from arrow_tpu.core import datatype as dt
    st = pa.array(["2023-01-15 10:30:00", "1969-12-31 23:00:00"])
    assert _cast(st, dt.timestamp("us")).equals(st.cast(pa.timestamp("us")))
    sd = pa.array(["2023-01-15", "1969-12-31"])
    assert _cast(sd, dt.date32).equals(sd.cast(pa.date32()))


def test_cast_timestamp_to_string():
    from arrow_tpu.core import datatype as dt
    tsv = pa.array([0, 1_700_000_000_000_000], type=pa.timestamp("us"))
    assert _cast(tsv, dt.string).equals(tsv.cast(pa.string()))
    d = pa.array([0, 19737], type=pa.date32())
    assert _cast(d, dt.string).equals(d.cast(pa.string()))
