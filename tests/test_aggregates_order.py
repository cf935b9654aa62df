"""Order-statistic / misc scalar aggregates vs the pyarrow oracle
(reference tests: aggregate_test.cc typed suites + randomized oracle)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow_tpu as at
from arrow_tpu import compute as atc

from oracle import random_numeric_array

NUMERIC = [pa.int32(), pa.int64(), pa.uint16(), pa.float32(), pa.float64()]


@pytest.mark.parametrize("t", NUMERIC)
@pytest.mark.parametrize("null_prob", [0.0, 0.3])
def test_min_max(rng, t, null_prob):
    a = random_numeric_array(rng, 211, t, null_prob=null_prob)
    exp = pc.min_max(a).as_py()
    got = atc.call_function("min_max", [at.array(a)]).as_py()
    assert got == exp


def test_min_max_all_null():
    a = pa.array([None, None], type=pa.int64())
    got = atc.call_function("min_max", [at.array(a)]).as_py()
    assert got == pc.min_max(a).as_py() == {"min": None, "max": None}


@pytest.mark.parametrize("fn", ["first", "last"])
def test_first_last(rng, fn):
    a = pa.array([None, 3, 7, None, 5, None], type=pa.int64())
    assert atc.call_function(fn, [at.array(a)]).as_py() == \
        getattr(pc, fn)(a).as_py()


def test_first_last_struct():
    a = pa.array([None, 3.5, 7.25, None], type=pa.float64())
    assert atc.call_function("first_last", [at.array(a)]).as_py() == \
        pc.first_last(a).as_py()


def test_index():
    a = pa.array([9, 7, None, 7, 1], type=pa.int64())
    for v in (7, 1, 42):
        got = atc.call_function("index", [at.array(a)], value=v)
        assert got.as_py() == pc.index(a, v).as_py()


@pytest.mark.parametrize("t", [pa.int64(), pa.float64()])
def test_count_distinct(rng, t):
    a = random_numeric_array(rng, 300, t, null_prob=0.25, small=True)
    got = atc.call_function("count_distinct", [at.array(a)])
    assert got.as_py() == pc.count_distinct(a).as_py()
    got_all = atc.call_function("count_distinct", [at.array(a)], mode="all")
    assert got_all.as_py() == pc.count_distinct(a, mode="all").as_py()


@pytest.mark.parametrize("interp", ["linear", "lower", "higher", "nearest",
                                    "midpoint"])
@pytest.mark.parametrize("t", [pa.int64(), pa.float64()])
def test_quantile(rng, t, interp):
    a = random_numeric_array(rng, 257, t, null_prob=0.2)
    qs = [0.0, 0.25, 0.5, 0.61, 1.0]
    exp = pc.quantile(a, q=qs, interpolation=interp)
    got = atc.call_function("quantile", [at.array(a)], q=qs,
                            interpolation=interp)
    assert got.to_pyarrow().type == exp.type, (got.to_pyarrow().type,
                                               exp.type)
    np.testing.assert_allclose(
        np.asarray(got.to_pylist(), dtype=np.float64),
        np.asarray(exp.to_pylist(), dtype=np.float64), rtol=1e-12)


def test_quantile_empty_and_null():
    a = pa.array([None, None], type=pa.float64())
    got = atc.call_function("quantile", [at.array(a)])
    assert got.to_pylist() == [None]


def test_median_tdigest(rng):
    a = random_numeric_array(rng, 501, pa.float64(), null_prob=0.1)
    got = atc.call_function("approximate_median", [at.array(a)])
    # ours is exact (tdigest with delta->inf); pyarrow's sketch drifts, so
    # the truth reference is the exact median
    exact = np.median([x for x in a.to_pylist() if x is not None])
    np.testing.assert_allclose(got.as_py(), exact, rtol=1e-12)
    gq = atc.call_function("tdigest", [at.array(a)], q=[0.25, 0.75])
    eq = pc.quantile(a, q=[0.25, 0.75]).to_pylist()
    np.testing.assert_allclose(gq.to_pylist(), eq, rtol=1e-12)


def test_mode(rng):
    a = pa.array([3, 1, 3, None, 1, 3, 7, 1], type=pa.int64())
    exp = pc.mode(a, n=3).to_pylist()
    got = atc.call_function("mode", [at.array(a)], n=3)
    got_l = [{"mode": m, "count": c} for m, c in zip(
        got.column("mode").to_pylist(), got.column("counts"
        if "counts" in got.column_names else "count").to_pylist())]
    assert got_l == exp


@pytest.mark.parametrize("fn", ["skew", "kurtosis"])
@pytest.mark.parametrize("null_prob", [0.0, 0.2])
def test_skew_kurtosis(rng, fn, null_prob):
    a = random_numeric_array(rng, 333, pa.float64(), null_prob=null_prob)
    exp = getattr(pc, fn)(a).as_py()
    got = atc.call_function(fn, [at.array(a)]).as_py()
    np.testing.assert_allclose(got, exp, rtol=1e-10)
