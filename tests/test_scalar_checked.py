"""Checked (`*_checked`) kernels vs the pyarrow oracle.

Reference: cpp/src/arrow/compute/kernels/scalar_arithmetic.cc:339 — checked
variants raise ArrowInvalid on overflow / divide-by-zero / domain errors
where the unchecked variants wrap or yield NaN/inf. Both the success values
AND the raised messages are oracle-compared: every case runs through
pyarrow first, and we assert identical outcome (equal arrays, or
ArrowInvalid with the same message).
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import jax
import jax.numpy as jnp

import arrow_tpu as at
from arrow_tpu import compute as atc
from arrow_tpu.utils import errors

from oracle import assert_array_equal, random_numeric_array


def oracle_checked(fn, pa_args, rtol=0.0, **kwargs):
    """Run `fn` through pyarrow and arrow_tpu; assert identical outcome —
    same values, or ArrowInvalid with the same message."""
    pa_err = pa_res = None
    try:
        pa_res = getattr(pc, fn)(*pa_args, **kwargs)
    except pa.lib.ArrowInvalid as e:
        pa_err = str(e)
    at_args = []
    for a in pa_args:
        if isinstance(a, pa.Array):
            at_args.append(at.array(a))
        elif isinstance(a, pa.Scalar):
            from arrow_tpu.core.datatype import from_pyarrow_type
            t = from_pyarrow_type(a.type)
            at_args.append(atc.Scalar(a.as_py() if a.is_valid else None, t,
                                      is_valid=a.is_valid))
        else:
            at_args.append(a)
    try:
        at_res = atc.call_function(fn, at_args, **kwargs)
    except errors.ArrowInvalid as e:
        assert pa_err is not None, \
            f"{fn}: arrow_tpu raised {e!r}, pyarrow returned {pa_res}"
        assert str(e) == pa_err, f"{fn}: message {e!r} != oracle {pa_err!r}"
        return None
    assert pa_err is None, \
        f"{fn}: pyarrow raised {pa_err!r}, arrow_tpu returned a value"
    assert_array_equal(at_res, pa_res, msg=fn, rtol=rtol)
    return at_res


BINARY = ["add_checked", "subtract_checked", "multiply_checked",
          "divide_checked"]
INT_TYPES = [pa.int8(), pa.int16(), pa.int32(), pa.int64(),
             pa.uint8(), pa.uint16(), pa.uint32(), pa.uint64()]


@pytest.mark.parametrize("fn", BINARY)
@pytest.mark.parametrize("t", [pa.int8(), pa.uint8(), pa.int64(),
                               pa.uint64(), pa.float64()])
def test_binary_checked_success(rng, fn, t):
    a = random_numeric_array(rng, 211, t, null_prob=0.2, small=True)
    b = random_numeric_array(rng, 211, t, null_prob=0.2, small=True)
    if fn == "divide_checked":
        # keep the success path clean: no zero divisors
        bv = b.to_numpy(zero_copy_only=False)
        bv = np.where((bv == 0) | np.isnan(bv.astype("float64")), 1, bv)
        b = pa.array(bv.astype(t.to_pandas_dtype()), type=t,
                     mask=np.asarray([v is None for v in b.to_pylist()]))
    oracle_checked(fn, [a, b])


@pytest.mark.parametrize("fn", ["add_checked", "subtract_checked",
                                "multiply_checked"])
@pytest.mark.parametrize("t", INT_TYPES)
def test_binary_checked_overflow_fuzz(rng, fn, t):
    """Full-range random ints: a mix of overflow and success cases, each
    compared against the oracle outcome."""
    for trial in range(8):
        a = random_numeric_array(rng, 64, t, null_prob=0.1)
        b = random_numeric_array(rng, 64, t, null_prob=0.1)
        oracle_checked(fn, [a, b])


def test_divide_checked_errors():
    oracle_checked("divide_checked",
                   [pa.array([1, 2], pa.int32()), pa.array([1, 0],
                                                           pa.int32())])
    imin = np.iinfo(np.int64).min
    oracle_checked("divide_checked",
                   [pa.array([imin], pa.int64()), pa.array([-1], pa.int64())])
    # error under a null slot is NOT an error
    oracle_checked("divide_checked",
                   [pa.array([1, None], pa.int32()),
                    pa.array([None, 0], pa.int32())])
    # float divide by zero is inf, not an error... except it IS an error
    # for divide_checked per Arrow semantics — oracle decides
    oracle_checked("divide_checked",
                   [pa.array([1.0, 2.0]), pa.array([0.0, 1.0])])


def test_negate_abs_checked():
    for t in [pa.int8(), pa.int32(), pa.int64()]:
        imin = np.iinfo(t.to_pandas_dtype()).min
        oracle_checked("negate_checked", [pa.array([imin, 5, None], t)])
        oracle_checked("abs_checked", [pa.array([imin, -5, None], t)])
        oracle_checked("negate_checked", [pa.array([1, -2, None], t)])
        oracle_checked("abs_checked", [pa.array([1, -2, None], t)])
    oracle_checked("negate_checked", [pa.array([1.5, -2.5])])
    # unsigned negate_checked has no kernel in Arrow
    with pytest.raises(Exception):
        atc.call_function("negate_checked",
                          [at.array(pa.array([1], pa.uint32()))])


def test_power_checked():
    oracle_checked("power_checked", [pa.array([2, 3, None], pa.int64()),
                                     pa.array([10, 4, 2], pa.int64())])
    oracle_checked("power_checked", [pa.array([2], pa.int64()),
                                     pa.array([-1], pa.int64())])
    oracle_checked("power_checked", [pa.array([2], pa.int64()),
                                     pa.array([63], pa.int64())])
    oracle_checked("power_checked", [pa.array([2], pa.int32()),
                                     pa.array([31], pa.int32())])
    oracle_checked("power_checked", [pa.array([-1, 0, 1], pa.int64()),
                                     pa.array([100, 0, 200], pa.int64())])
    oracle_checked("power_checked", [pa.array([2.0]), pa.array([-2.0])])


def test_power_checked_fuzz(rng):
    for t in [pa.int8(), pa.uint16(), pa.int64()]:
        base = random_numeric_array(rng, 64, t, null_prob=0.1, small=True)
        npt = t.to_pandas_dtype()
        exp = pa.array(rng.integers(0, 70, size=64, dtype=npt), type=t)
        oracle_checked("power_checked", [base, exp])


def test_shift_checked():
    a = pa.array([1, 2, 4, None], pa.int32())
    # Arrow's bound is numeric_limits<T>::digits: 31 for int32, 32 for uint32
    oracle_checked("shift_left_checked", [a, pa.array([1, 30, 2, 3],
                                                      pa.int32())])
    oracle_checked("shift_left_checked", [a, pa.array([1, 31, 2, 3],
                                                      pa.int32())])
    u = pa.array([1, 2, 4, None], pa.uint32())
    oracle_checked("shift_left_checked", [u, pa.array([1, 31, 2, 3],
                                                      pa.uint32())])
    oracle_checked("shift_left_checked", [u, pa.array([1, 32, 2, 3],
                                                      pa.uint32())])
    oracle_checked("shift_right_checked", [a, pa.array([-1, 1, 2, 3],
                                                       pa.int32())])
    oracle_checked("shift_right_checked", [a, pa.array([0, 1, 2, 3],
                                                       pa.int32())])


FLOAT_DOMAIN = [
    ("sqrt_checked", [4.0, 2.25]), ("sqrt_checked", [-1.0]),
    ("ln_checked", [1.0, 2.7]), ("ln_checked", [0.0]),
    ("ln_checked", [-3.0]),
    ("log2_checked", [8.0]), ("log2_checked", [0.0]),
    ("log10_checked", [100.0]), ("log10_checked", [-1.0]),
    ("log1p_checked", [0.5]), ("log1p_checked", [-1.0]),
    ("log1p_checked", [-2.0]),
    ("sin_checked", [0.5]), ("sin_checked", [float("inf")]),
    ("cos_checked", [0.5]), ("cos_checked", [float("-inf")]),
    ("tan_checked", [0.5]), ("tan_checked", [float("inf")]),
    ("asin_checked", [0.5]), ("asin_checked", [2.0]),
    ("acos_checked", [0.5]), ("acos_checked", [-2.0]),
    ("atanh_checked", [0.5]), ("atanh_checked", [1.0]),
    ("acosh_checked", [2.0]), ("acosh_checked", [0.5]),
]


@pytest.mark.parametrize("fn,vals", FLOAT_DOMAIN)
def test_float_domain_checked(fn, vals):
    oracle_checked(fn, [pa.array(vals + [None], pa.float64())], rtol=1e-15)


def test_float_checked_int_input():
    # int input promotes to float64 for transcendentals
    oracle_checked("sqrt_checked", [pa.array([4, 9, None], pa.int32())],
                   rtol=1e-15)
    oracle_checked("ln_checked", [pa.array([1, 10], pa.int64())],
                   rtol=1e-15)


def test_logb_checked():
    oracle_checked("logb_checked", [pa.array([8.0, 16.0]),
                                    pa.array([2.0, 4.0])], rtol=1e-15)
    oracle_checked("logb_checked", [pa.array([8.0]), pa.array([0.0])])
    oracle_checked("logb_checked", [pa.array([-8.0]), pa.array([2.0])])


@pytest.mark.parametrize("fn", ["cumulative_sum_checked",
                                "cumulative_prod_checked"])
@pytest.mark.parametrize("t", [pa.int32(), pa.int64(), pa.uint8(),
                               pa.float64()])
def test_cumulative_checked_success(rng, fn, t):
    vals = [1, 2, None, 3] if fn.endswith("sum_checked") else \
        [1, 2, None, 2]
    a = pa.array(vals, t)
    for skip_nulls in (False, True):
        oracle_checked(fn, [a], skip_nulls=skip_nulls, rtol=1e-12)


def test_cumulative_checked_overflow():
    oracle_checked("cumulative_sum_checked",
                   [pa.array([100, 100, 100], pa.int8())])
    oracle_checked("cumulative_prod_checked",
                   [pa.array([16, 16], pa.int8())])
    oracle_checked("cumulative_sum_checked",
                   [pa.array([100, 100], pa.int8())], start=100)
    big = np.iinfo(np.int64).max
    oracle_checked("cumulative_sum_checked",
                   [pa.array([big, 1], pa.int64())])
    oracle_checked("cumulative_sum_checked",
                   [pa.array([big, None, 1], pa.int64())], skip_nulls=False)
    # unchecked wraps silently — sanity-contrast
    got = atc.call_function("cumulative_sum",
                            [at.array(pa.array([100, 100, 100], pa.int8()))])
    assert got.to_pyarrow().to_pylist() == \
        pc.cumulative_sum(pa.array([100, 100, 100], pa.int8())).to_pylist()


def test_pairwise_diff_checked(rng):
    a = pa.array([5, 3, None, 100], pa.int8())
    oracle_checked("pairwise_diff_checked", [a])
    oracle_checked("pairwise_diff_checked",
                   [pa.array([-100, 100], pa.int8())])
    oracle_checked("pairwise_diff_checked",
                   [pa.array([-100, 100], pa.int8())], period=-1)
    b = random_numeric_array(rng, 100, pa.int64(), null_prob=0.2)
    oracle_checked("pairwise_diff_checked", [b], period=3)


def test_checked_with_scalar():
    a = pa.array([120, 1], pa.int8())
    oracle_checked("add_checked", [a, pa.scalar(10, pa.int8())])
    oracle_checked("add_checked", [a, pa.scalar(1, pa.int8())])
    oracle_checked("add_checked", [a, pa.scalar(None, pa.int8())])


def test_deferred_error_in_jit():
    """Inside jit, checked kernels defer through errors.collect(); the
    encoded code raises host-side via raise_code (this is how acero stages
    carry data-dependent errors out of a compiled stage)."""
    a = at.array(pa.array([100, 100], pa.int8()))
    msgs = {}

    @jax.jit
    def step(arr):
        # the scope lives inside the traced function: flags are tracers of
        # THIS trace, and the encoded code is threaded out as a jit output
        with errors.collect() as scope:
            out = atc.call_function("add_checked", [arr, arr])
            msgs["m"] = scope.messages()
            return out, scope.encode()

    out, code = step(a)
    with pytest.raises(errors.ArrowInvalid, match="overflow"):
        errors.raise_code(code, msgs["m"])

    ok = at.array(pa.array([1, 2], pa.int8()))
    out, code = step(ok)
    errors.raise_code(code, msgs["m"])  # no error
    assert out.to_pyarrow().to_pylist() == [2, 4]


def test_checked_in_acero_plan():
    """A plan stage containing a checked kernel carries the deferred flag
    out of its compiled program and raises ArrowInvalid host-side (the
    ExecPlan-abort analog of filter_node.cc error propagation)."""
    from arrow_tpu.acero import (Declaration, FilterNodeOptions,
                                 ProjectNodeOptions, TableSourceNodeOptions)
    from arrow_tpu.compute.expressions import call, field, literal

    t = pa.table({"x": pa.array([100, 3, None], pa.int8())})
    decl = Declaration.from_sequence([
        Declaration("table_source", TableSourceNodeOptions(t)),
        Declaration("project",
                    ProjectNodeOptions(
                        [call("add_checked", [field("x"), field("x")])],
                        ["s"])),
    ])
    with pytest.raises(errors.ArrowInvalid, match="overflow"):
        decl.to_table()

    ok = pa.table({"x": pa.array([10, 3, None], pa.int8())})
    decl = Declaration.from_sequence([
        Declaration("table_source", TableSourceNodeOptions(ok)),
        Declaration("project",
                    ProjectNodeOptions(
                        [call("add_checked", [field("x"), field("x")])],
                        ["s"])),
    ])
    assert decl.to_pyarrow().column("s").to_pylist() == [20, 6, None]

    # a filter whose mask uses a checked kernel: nulls and error rows
    decl = Declaration.from_sequence([
        Declaration("table_source", TableSourceNodeOptions(ok)),
        Declaration("filter", FilterNodeOptions(
            call("greater",
                 [call("multiply_checked", [field("x"), literal(10)]),
                  literal(50)]))),
    ])
    assert decl.to_pyarrow().column("x").to_pylist() == [10]


def test_jit_without_scope_errors():
    a = at.array(pa.array([1], pa.int8()))
    with pytest.raises(NotImplementedError, match="collect"):
        jax.jit(lambda x: atc.call_function("add_checked", [x, x]))(a)
