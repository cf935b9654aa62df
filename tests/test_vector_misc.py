"""Cumulative / pairwise / replace / fill-null kernels vs the pyarrow
oracle (reference: vector_cumulative_ops / vector_pairwise /
vector_replace kernel tests)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow_tpu as at
from arrow_tpu import compute as atc

from oracle import assert_array_equal, random_numeric_array

CUM = ["cumulative_sum", "cumulative_prod", "cumulative_min",
       "cumulative_max"]


@pytest.mark.parametrize("fn", CUM)
@pytest.mark.parametrize("skip_nulls", [False, True])
@pytest.mark.parametrize("t", [pa.int32(), pa.int64(), pa.float64()])
def test_cumulative_oracle(rng, fn, skip_nulls, t):
    a = random_numeric_array(rng, 137, t, null_prob=0.2, small=True)
    expected = getattr(pc, fn)(a, skip_nulls=skip_nulls)
    got = atc.call_function(fn, [at.array(a)], skip_nulls=skip_nulls)
    # float scans: XLA's parallel-scan grouping legitimately differs from
    # Arrow's strictly sequential accumulation in the last ulps
    rtol = 1e-12 if pa.types.is_floating(t) else 0.0
    assert_array_equal(got, expected, msg=f"{fn} skip={skip_nulls}",
                       rtol=rtol)


def test_cumulative_start(rng):
    a = pa.array([1, 2, None, 4], type=pa.int64())
    for fn, start in [("cumulative_sum", 10), ("cumulative_prod", 3),
                      ("cumulative_min", 2), ("cumulative_max", 3)]:
        expected = getattr(pc, fn)(a, start=start, skip_nulls=True)
        got = atc.call_function(fn, [at.array(a)], start=start,
                                skip_nulls=True)
        assert_array_equal(got, expected, msg=fn)


@pytest.mark.parametrize("skip_nulls", [False, True])
def test_cumulative_mean(rng, skip_nulls):
    a = random_numeric_array(rng, 100, pa.int64(), null_prob=0.25,
                             small=True)
    expected = pc.cumulative_mean(a, skip_nulls=skip_nulls)
    got = atc.call_function("cumulative_mean", [at.array(a)],
                            skip_nulls=skip_nulls)
    assert_array_equal(got, expected, msg="cumulative_mean")


@pytest.mark.parametrize("period", [1, 2, -1])
@pytest.mark.parametrize("t", [pa.int64(), pa.float64()])
def test_pairwise_diff(rng, period, t):
    a = random_numeric_array(rng, 90, t, null_prob=0.2, small=True)
    expected = pc.pairwise_diff(a, period=period)
    got = atc.call_function("pairwise_diff", [at.array(a)], period=period)
    assert_array_equal(got, expected, msg=f"pairwise_diff({period})")


def test_replace_with_mask():
    a = pa.array([1, 2, None, 4, 5], type=pa.int64())
    m = pa.array([True, False, None, True, False])
    r = pa.array([100, 200], type=pa.int64())
    expected = pc.replace_with_mask(a, m, r)
    got = atc.call_function("replace_with_mask",
                            [at.array(a), at.array(m), at.array(r)])
    assert_array_equal(got, expected, msg="replace_with_mask")


def test_replace_with_mask_null_replacement():
    a = pa.array([1, 2, 3], type=pa.int64())
    m = pa.array([True, True, False])
    r = pa.array([None, 9], type=pa.int64())
    expected = pc.replace_with_mask(a, m, r)
    got = atc.call_function("replace_with_mask",
                            [at.array(a), at.array(m), at.array(r)])
    assert_array_equal(got, expected, msg="replace null repl")


@pytest.mark.parametrize("fn", ["fill_null_forward", "fill_null_backward"])
def test_fill_null_directional(rng, fn):
    a = pa.array([None, 2, None, None, 5, None], type=pa.int64())
    expected = getattr(pc, fn)(a)
    got = atc.call_function(fn, [at.array(a)])
    assert_array_equal(got, expected, msg=fn)
    b = random_numeric_array(rng, 200, pa.float64(), null_prob=0.4)
    assert_array_equal(atc.call_function(fn, [at.array(b)]),
                       getattr(pc, fn)(b), msg=fn + " random")


def test_indices_nonzero():
    a = pa.array([0, 1, None, 3, 0], type=pa.int64())
    expected = pc.indices_nonzero(a)
    got = atc.call_function("indices_nonzero", [at.array(a)])
    assert_array_equal(got, expected, msg="indices_nonzero")
