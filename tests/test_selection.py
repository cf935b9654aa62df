"""filter/take vs the pyarrow oracle (reference: vector_selection_test.cc)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow_tpu as at
from arrow_tpu import compute as atc
from arrow_tpu.compute import FilterOptions

from oracle import assert_array_equal, random_numeric_array


def _random_mask(rng, n, true_prob=0.5, null_prob=0.0):
    vals = rng.random(n) < true_prob
    if null_prob:
        mask = rng.random(n) < null_prob
        return pa.array(vals, mask=mask)
    return pa.array(vals)


@pytest.mark.parametrize("t", [pa.int64(), pa.int32(), pa.float64(),
                               pa.bool_(), pa.uint8()])
@pytest.mark.parametrize("null_prob", [0.0, 0.3])
@pytest.mark.parametrize("sel", [0.0, 0.01, 0.5, 0.99, 1.0])
def test_filter_primitive(rng, t, null_prob, sel):
    n = 512
    a = random_numeric_array(rng, n, t, null_prob=null_prob)
    m = _random_mask(rng, n, true_prob=sel)
    got = atc.call_function("filter", [at.array(a), at.array(m)])
    assert_array_equal(got, pc.filter(a, m), msg=f"filter {t} sel={sel}")


@pytest.mark.parametrize("behavior", ["drop", "emit_null"])
def test_filter_null_mask(rng, behavior):
    n = 300
    a = random_numeric_array(rng, n, pa.int64(), null_prob=0.2)
    m = _random_mask(rng, n, null_prob=0.3)
    got = atc.call_function(
        "filter", [at.array(a), at.array(m)],
        options=FilterOptions(null_selection_behavior=behavior))
    expected = pc.filter(a, m, null_selection_behavior=behavior)
    assert_array_equal(got, expected, msg=behavior)


def test_filter_string(rng):
    a = pa.array(["foo", None, "b", "", "longer_string", "x"] * 20)
    m = _random_mask(rng, len(a), 0.5)
    got = atc.call_function("filter", [at.array(a), at.array(m)])
    assert_array_equal(got, pc.filter(a, m))


def test_filter_dictionary(rng):
    a = pa.array(["a", "b", None, "c"] * 25).dictionary_encode()
    m = _random_mask(rng, len(a), 0.5)
    got = atc.call_function("filter", [at.array(a), at.array(m)])
    assert_array_equal(got, pc.filter(a, m))


def test_take_primitive(rng):
    n = 256
    a = random_numeric_array(rng, n, pa.int64(), null_prob=0.2)
    idx = pa.array(rng.integers(0, n, size=100), type=pa.int32())
    got = atc.call_function("take", [at.array(a), at.array(idx)])
    assert_array_equal(got, pc.take(a, idx))


def test_take_with_null_indices(rng):
    a = pa.array([10, 20, 30, 40], type=pa.int64())
    idx = pa.array([0, None, 3, 1, None], type=pa.int32())
    got = atc.call_function("take", [at.array(a), at.array(idx)])
    assert_array_equal(got, pc.take(a, idx))


def test_take_string(rng):
    a = pa.array(["alpha", "b", None, "", "gamma"])
    idx = pa.array([4, 0, 0, None, 2, 1], type=pa.int32())
    got = atc.call_function("take", [at.array(a), at.array(idx)])
    assert_array_equal(got, pc.take(a, idx))


def test_filter_batch_shares_indices(rng):
    n = 400
    t = pa.table({
        "a": random_numeric_array(rng, n, pa.int64(), null_prob=0.1),
        "b": random_numeric_array(rng, n, pa.float64(), null_prob=0.1),
        "s": pa.array([f"s{i % 17}" for i in range(n)]),
    })
    m = _random_mask(rng, n, 0.4)
    b = at.Batch.from_pyarrow(t.to_batches()[0])
    got = atc.filter_batch(b, at.array(m))
    expected = t.filter(m).to_batches()[0] if t.filter(m).num_rows else None
    got_pa = got.to_pyarrow()
    assert got_pa.to_pydict() == t.filter(m).to_pydict()


def test_filter_json_golden():
    # golden cases in the reference style (vector_selection_test.cc:96-123)
    a = at.array_from_json(at.int64, "[9, 8, 7, 6, 5]")
    m = at.array_from_json(at.bool_, "[true, false, true, null, true]")
    out = atc.call_function("filter", [a, m])
    assert out.to_pylist() == [9, 7, 5]
    out = atc.call_function(
        "filter", [a, m],
        options=FilterOptions(null_selection_behavior="emit_null"))
    assert out.to_pylist() == [9, 7, None, 5]


def test_take_indices_from_mask():
    m = at.array_from_json(at.bool_, "[true, false, true, true, false]")
    idx = atc.get_take_indices(m)
    assert idx.to_pylist() == [0, 2, 3]


def test_filter_impl_search_matches(rng):
    """The searchsorted compaction path (TPU default) must match the
    scatter path bit-for-bit."""
    import os
    import arrow_tpu.ops.selection as sel
    n = 3000
    t = pa.table({
        "i": random_numeric_array(rng, n, pa.int64(), null_prob=0.2),
        "s": pa.array([None if rng.random() < 0.1 else f"r{i % 37}"
                       for i in range(n)]),
    })
    m = pa.array([None if rng.random() < 0.1 else bool(x)
                  for x in rng.integers(0, 2, n)])
    b = at.Batch.from_pyarrow(t.combine_chunks().to_batches()[0])
    mask = at.array(m)
    old = os.environ.get("ARROW_TPU_FILTER_IMPL")
    try:
        for null_sel in ["drop", "emit_null"]:
            outs = []
            for impl in ["scatter", "search", "sort"]:
                os.environ["ARROW_TPU_FILTER_IMPL"] = impl
                out = sel.filter_batch(
                    b, mask, sel.FilterOptions(null_sel)).to_pyarrow()
                outs.append(out)
            assert outs[0].equals(outs[1]), f"{null_sel}: search != scatter"
            assert outs[0].equals(outs[2]), f"{null_sel}: sort != scatter"
    finally:
        if old is None:
            os.environ.pop("ARROW_TPU_FILTER_IMPL", None)
        else:
            os.environ["ARROW_TPU_FILTER_IMPL"] = old
