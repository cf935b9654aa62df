"""Randomized property tests vs the pyarrow oracle (VERDICT r3
missing #4; reference pattern: ``testing/random.h:627`` +
``aggregate_test.cc:412``): draw (kernel x dtype x null-density x
capacity-padding x slicing) at random — seeded, so every failure
reproduces — and compare against pyarrow for the hottest ~30 functions.

The example-based suites pin exact shapes/types per test; this harness
finds the cross-product bugs they can't (e.g. a kernel correct at
capacity==length but reading padding rows when capacity > length, or a
dtype promoted differently under nulls)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow_tpu as at
from arrow_tpu.compute import call_function

from oracle import assert_array_equal, random_numeric_array

NUMERIC = [pa.int8(), pa.int16(), pa.int32(), pa.int64(),
           pa.uint8(), pa.uint16(), pa.uint32(), pa.uint64(),
           pa.float32(), pa.float64()]
SIGNED = [pa.int8(), pa.int16(), pa.int32(), pa.int64(),
          pa.float32(), pa.float64()]
FLOATS = [pa.float32(), pa.float64()]
INTS = [pa.int8(), pa.int16(), pa.int32(), pa.int64(),
        pa.uint8(), pa.uint16(), pa.uint32(), pa.uint64()]

# (name, arity, eligible dtypes, needs_small_values, rtol)
UNARY = [
    ("negate", SIGNED, True, 0.0),
    ("abs", SIGNED, True, 0.0),
    ("sign", NUMERIC, False, 0.0),
    ("is_null", NUMERIC, False, 0.0),
    ("is_valid", NUMERIC, False, 0.0),
    ("is_nan", FLOATS, False, 0.0),
    ("is_finite", FLOATS, False, 0.0),
    ("unique", INTS + [pa.bool_()], False, 0.0),
    ("exp", FLOATS, True, 1e-6),
    ("ln", FLOATS, True, 1e-6),
    ("sqrt", FLOATS, False, 1e-6),
    ("floor", FLOATS, False, 0.0),
    ("ceil", FLOATS, False, 0.0),
    ("round", FLOATS, False, 0.0),
    ("bit_wise_not", INTS, False, 0.0),
]
BINARY = [
    ("add", NUMERIC, True, 0.0),
    ("subtract", SIGNED, True, 0.0),
    ("multiply", NUMERIC, True, 0.0),
    ("equal", NUMERIC, False, 0.0),
    ("not_equal", NUMERIC, False, 0.0),
    ("less", NUMERIC, False, 0.0),
    ("less_equal", NUMERIC, False, 0.0),
    ("greater", NUMERIC, False, 0.0),
    ("greater_equal", NUMERIC, False, 0.0),
    ("min_element_wise", NUMERIC, False, 0.0),
    ("max_element_wise", NUMERIC, False, 0.0),
    ("bit_wise_and", INTS, False, 0.0),
    ("bit_wise_or", INTS, False, 0.0),
    ("bit_wise_xor", INTS, False, 0.0),
    ("and", [pa.bool_()], False, 0.0),
    ("or", [pa.bool_()], False, 0.0),
    ("and_kleene", [pa.bool_()], False, 0.0),
    ("or_kleene", [pa.bool_()], False, 0.0),
]
AGGS = [
    ("sum", NUMERIC, True, 1e-5),
    ("min", NUMERIC, False, 0.0),
    ("max", NUMERIC, False, 0.0),
    ("mean", NUMERIC, True, 1e-5),
    ("count", NUMERIC, False, 0.0),
]


def _rand_arr(rng, n, t, null_prob):
    if pa.types.is_boolean(t):
        vals = rng.integers(0, 2, size=n).astype(bool)
        mask = rng.random(n) < null_prob if null_prob else None
        return pa.array(vals, type=t, mask=mask)
    return random_numeric_array(rng, n, t, null_prob=null_prob,
                                small=bool(rng.integers(0, 2)))


def _lift(pa_arr, rng):
    """pyarrow array -> device Array with randomized capacity padding."""
    n = len(pa_arr)
    pad = int(rng.choice([0, 1, 7, 64]))
    return at.array(pa_arr, capacity=n + pad)


def _maybe_slice(rng, pa_arr):
    """Random prefix/suffix slice (offset handling)."""
    n = len(pa_arr)
    if n < 8 or rng.random() < 0.5:
        return pa_arr
    off = int(rng.integers(0, n // 4))
    ln = int(rng.integers(n // 2, n - off))
    sl = pa_arr.slice(off, ln)
    # rebase the slice: our interop lifts offset-0 arrays
    return pa.concat_arrays([sl])


@pytest.mark.parametrize("seed", range(6))
def test_random_unary_oracle(seed):
    rng = np.random.default_rng(1000 + seed)
    for trial in range(12):
        name, types, small, rtol = UNARY[
            int(rng.integers(0, len(UNARY)))]
        t = types[int(rng.integers(0, len(types)))]
        n = int(rng.integers(1, 300))
        null_prob = float(rng.choice([0.0, 0.1, 0.5]))
        src = _maybe_slice(rng, _rand_arr(rng, n, t, null_prob))
        try:
            want = getattr(pc, name)(src)
        except pa.ArrowInvalid:
            continue   # oracle rejects (e.g. negate overflow) — skip draw
        got = call_function(name, [_lift(src, rng)])
        if name == "unique":
            # order-insensitive set compare (our unique is
            # first-appearance like Arrow's, but be robust)
            assert sorted(got.to_pylist(), key=lambda v: (v is None, v)) \
                == sorted(want.to_pylist(),
                          key=lambda v: (v is None, v)), \
                (name, t, seed, trial)
            continue
        # XLA flushes f32 subnormals to zero (TPU-native semantics);
        # transcendental underflow therefore compares with a tiny atol
        assert_array_equal(got, want, msg=f"{name}/{t}/s{seed}t{trial}",
                           rtol=rtol, atol=1e-30 if rtol else 0.0)


@pytest.mark.parametrize("seed", range(6))
def test_random_binary_oracle(seed):
    rng = np.random.default_rng(2000 + seed)
    for trial in range(12):
        name, types, small, rtol = BINARY[
            int(rng.integers(0, len(BINARY)))]
        t = types[int(rng.integers(0, len(types)))]
        n = int(rng.integers(1, 300))
        np_a = float(rng.choice([0.0, 0.2]))
        np_b = float(rng.choice([0.0, 0.2]))
        a = _rand_arr(rng, n, t, np_a)
        b = _rand_arr(rng, n, t, np_b)
        try:
            want = getattr(pc, name)(a, b)
        except pa.ArrowInvalid:
            continue
        # scalar kernels require ONE shared capacity across args
        pad = int(rng.choice([0, 1, 7, 64]))
        got = call_function(name, [at.array(a, capacity=n + pad),
                                   at.array(b, capacity=n + pad)])
        assert_array_equal(got, want, msg=f"{name}/{t}/s{seed}t{trial}",
                           rtol=rtol)


@pytest.mark.parametrize("seed", range(6))
def test_random_selection_oracle(seed):
    """filter/take with random masks/indices, nulls in both the values
    AND the selector, at padded capacities."""
    from arrow_tpu.ops.selection import FilterOptions
    rng = np.random.default_rng(3000 + seed)
    for trial in range(8):
        t = NUMERIC[int(rng.integers(0, len(NUMERIC)))]
        n = int(rng.integers(1, 400))
        vals = _rand_arr(rng, n, t, float(rng.choice([0.0, 0.3])))
        mask = _rand_arr(rng, n, pa.bool_(),
                         float(rng.choice([0.0, 0.3])))
        nsb = str(rng.choice(["drop", "emit_null"]))
        want = pc.filter(vals, mask, null_selection_behavior=nsb)
        got = call_function("filter", [_lift(vals, rng), _lift(mask, rng)],
                            FilterOptions(nsb))
        assert_array_equal(got, want, msg=f"filter/{t}/{nsb}/s{seed}")

        k = int(rng.integers(0, 2 * n))
        idx = pa.array(rng.integers(0, n, k), type=pa.int32())
        want = pc.take(vals, idx)
        got = call_function("take", [_lift(vals, rng), _lift(idx, rng)])
        assert_array_equal(got, want, msg=f"take/{t}/s{seed}")


@pytest.mark.parametrize("seed", range(6))
def test_random_scalar_agg_oracle(seed):
    rng = np.random.default_rng(4000 + seed)
    for trial in range(10):
        name, types, small, rtol = AGGS[int(rng.integers(0, len(AGGS)))]
        t = types[int(rng.integers(0, len(types)))]
        n = int(rng.integers(1, 500))
        src = _rand_arr(rng, n, t, float(rng.choice([0.0, 0.25, 1.0])))
        want = getattr(pc, name)(src)
        got = call_function(name, [_lift(src, rng)])
        gv, wv = got.as_py(), want.as_py()
        if wv is None or gv is None:
            assert gv == wv, (name, t, seed, trial, gv, wv)
        elif rtol and isinstance(wv, float):
            assert np.isclose(gv, wv, rtol=rtol, equal_nan=True), \
                (name, t, seed, trial, gv, wv)
        else:
            assert gv == wv or (isinstance(wv, float) and
                                np.isnan(wv) and np.isnan(gv)), \
                (name, t, seed, trial, gv, wv)


@pytest.mark.parametrize("seed", range(4))
def test_random_sort_oracle(seed):
    rng = np.random.default_rng(5000 + seed)
    for trial in range(6):
        t = NUMERIC[int(rng.integers(0, len(NUMERIC)))]
        n = int(rng.integers(2, 400))
        src = _rand_arr(rng, n, t, float(rng.choice([0.0, 0.2])))
        order = str(rng.choice(["ascending", "descending"]))
        npl = str(rng.choice(["at_start", "at_end"]))
        want = pc.array_sort_indices(src, order=order,
                                     null_placement=npl)
        from arrow_tpu.ops.sorting import ArraySortOptions
        got = call_function("array_sort_indices", [_lift(src, rng)],
                            ArraySortOptions(order, npl))
        # ties may break differently under the unstable device sort;
        # compare the SORTED VALUES and null positions instead
        gv = pc.take(src, pa.array(got.to_pylist(), type=pa.uint64()))
        wv = pc.take(src, want)
        assert_array_equal(at.array(gv, capacity=len(gv)), wv,
                           msg=f"sort/{t}/{order}/{npl}/s{seed}")
