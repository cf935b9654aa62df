"""sort_indices / rank / select_k vs the pyarrow oracle
(reference: vector_sort_test.cc)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow_tpu as at
from arrow_tpu import compute as atc
from arrow_tpu.ops.sorting import (ArraySortOptions, RankOptions,
                                   SelectKOptions, SortKey, SortOptions)

from oracle import assert_array_equal, random_numeric_array


@pytest.mark.parametrize("t", [pa.int64(), pa.int32(), pa.uint16(),
                               pa.float64(), pa.float32(), pa.bool_()])
@pytest.mark.parametrize("order", ["ascending", "descending"])
@pytest.mark.parametrize("nulls", [0.0, 0.25])
def test_sort_indices_array(rng, t, order, nulls):
    n = 777
    a = random_numeric_array(rng, n, t, null_prob=nulls)
    got = atc.call_function("array_sort_indices", [at.array(a)],
                            options=ArraySortOptions(order=order))
    expected = pc.array_sort_indices(a, order=order)
    assert_array_equal(got, expected, msg=f"{t} {order}")


@pytest.mark.parametrize("placement", ["at_start", "at_end"])
def test_sort_null_placement(rng, placement):
    a = random_numeric_array(rng, 300, pa.int64(), null_prob=0.3)
    got = atc.call_function(
        "array_sort_indices", [at.array(a)],
        options=ArraySortOptions(order="ascending",
                                 null_placement=placement))
    expected = pc.array_sort_indices(a, order="ascending",
                                     null_placement=placement)
    assert_array_equal(got, expected, msg=placement)


def test_sort_nan_ordering():
    a = pa.array([3.0, float("nan"), 1.0, None, float("-inf"),
                  float("inf"), float("nan"), -0.0, 0.0])
    got = atc.call_function("array_sort_indices", [at.array(a)])
    expected = pc.array_sort_indices(a)
    assert_array_equal(got, expected)


def test_sort_indices_multikey(rng):
    n = 1500
    t = pa.table({
        "a": pa.array(rng.integers(0, 10, n)),
        "b": random_numeric_array(rng, n, pa.float64(), null_prob=0.2),
        "c": random_numeric_array(rng, n, pa.int32(), null_prob=0.1),
    })
    opts = SortOptions([SortKey("a", "ascending"),
                        SortKey("b", "descending"),
                        SortKey("c", "ascending")])
    b = at.Batch.from_pyarrow(t.to_batches()[0])
    got = atc.call_function("sort_indices", [b], options=opts)
    expected = pc.sort_indices(
        t, sort_keys=[("a", "ascending"), ("b", "descending"),
                      ("c", "ascending")])
    assert_array_equal(got, expected)


def test_sort_stability(rng):
    # equal keys keep input order (stable like std::stable_sort)
    t = pa.table({"a": [1, 1, 1, 0, 0, 1, 0]})
    b = at.Batch.from_pyarrow(t.to_batches()[0])
    got = atc.call_function("sort_indices", [b],
                            options=SortOptions([SortKey("a")]))
    assert got.to_pylist() == [3, 4, 6, 0, 1, 2, 5]


def test_sort_dictionary_by_value():
    # dictionary sorts by decoded value, not by index
    d = pa.array(["pear", "apple", "zebra", None, "apple"])
    enc = d.dictionary_encode()
    a = at.array(enc)
    got = atc.call_function("array_sort_indices", [a])
    expected = pc.array_sort_indices(d)  # oracle on decoded values
    assert_array_equal(got, expected)


def test_select_k(rng):
    n = 500
    a = random_numeric_array(rng, n, pa.int64(), null_prob=0.1)
    got = atc.call_function(
        "select_k_unstable", [at.array(a)],
        options=SelectKOptions(10, [("", "descending")]))
    expected = pc.select_k_unstable(
        a, options=pc.SelectKOptions(10, [("", "descending")]))
    # unstable: compare selected VALUES, not indices
    got_vals = pc.take(a, got.to_pyarrow())
    exp_vals = pc.take(a, expected)
    assert got_vals.to_pylist() == exp_vals.to_pylist()


@pytest.mark.parametrize("tie", ["first", "min", "max", "dense"])
def test_rank(rng, tie):
    n = 400
    a = random_numeric_array(rng, n, pa.int32(), null_prob=0.15)
    a = pc.bit_wise_and(a, 15)  # force ties
    got = atc.call_function("rank", [at.array(a)],
                            options=RankOptions(
                                [SortKey("", "ascending")],
                                tiebreaker=tie))
    expected = pc.rank(a, sort_keys="ascending", tiebreaker=tie)
    assert_array_equal(got, expected, msg=tie)


def test_sort_then_take_roundtrip(rng):
    """order_by materialization: sort_indices + take == pyarrow sort_by."""
    n = 800
    t = pa.table({
        "k": random_numeric_array(rng, n, pa.int64(), null_prob=0.2),
        "v": random_numeric_array(rng, n, pa.float64(), null_prob=0.2),
    })
    b = at.Batch.from_pyarrow(t.to_batches()[0])
    idx = atc.call_function("sort_indices", [b],
                            options=SortOptions([SortKey("k", "descending")]))
    from arrow_tpu.ops.scalar_cast import CastOptions
    idx32 = atc.call_function("cast", [idx],
                              options=CastOptions(at.int32))
    sorted_b = atc.take_batch(b, idx32)
    expected = t.sort_by([("k", "descending")])
    assert sorted_b.to_pyarrow().to_pydict() == expected.to_pydict()


def test_sort_empty():
    a = at.array([], type=at.int64)
    got = atc.call_function("array_sort_indices", [a])
    assert got.to_pylist() == []


def test_rank_quantile_and_normal():
    from arrow_tpu.compute import call_function as cf
    x = pa.array([3.0, 1.0, 2.0, None, 2.0])
    np.testing.assert_allclose(
        cf("rank_quantile", [at.array(x)]).to_pylist(),
        pc.rank_quantile(x).to_pylist())
    np.testing.assert_allclose(
        cf("rank_normal", [at.array(x)]).to_pylist(),
        pc.rank_normal(x).to_pylist(), rtol=1e-12)


def test_sort_raw_string_keys(rng):
    """vector_sort.cc sorts string columns; prefix-word lanes + host
    maxlen probe make it exact (was NotImplementedError through r2)."""
    import pyarrow as pa
    import arrow_tpu as at
    words = ["b", "a", "cc", "c", "aa", "x" * 40 + "b", "x" * 40 + "a",
             "", "zz", "za"]
    vals = [words[i] for i in rng.integers(0, len(words), 400)]
    mask = rng.random(400) < 0.1
    arr = pa.array([None if m else v for v, m in zip(vals, mask)])
    t = pa.table({"s": arr, "v": pa.array(range(400))})
    for order in ("ascending", "descending"):
        got = at.Table.from_pyarrow(t).sort_by([("s", order)]).to_pyarrow()
        assert got["s"].to_pylist() == \
            t.sort_by([("s", order)])["s"].to_pylist(), order
