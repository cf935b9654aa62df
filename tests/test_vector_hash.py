"""unique / value_counts / dictionary_encode / is_in / index_in vs the
pyarrow oracle (reference tests: vector_hash_test.cc, scalar_set_lookup
tests)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow_tpu as at
from arrow_tpu import compute as atc

from oracle import assert_array_equal, random_numeric_array

NUMERIC = [pa.int8(), pa.int32(), pa.int64(), pa.uint16(), pa.uint64(),
           pa.float32(), pa.float64()]


@pytest.mark.parametrize("t", NUMERIC)
@pytest.mark.parametrize("null_prob", [0.0, 0.3])
def test_unique_numeric(rng, t, null_prob):
    n = 500
    # few distinct values -> real duplicates
    base = random_numeric_array(rng, 17, t, small=True)
    vals = base.take(pa.array(rng.integers(0, 17, n)))
    if null_prob:
        mask = rng.random(n) < null_prob
        vals = pa.array([None if m else v.as_py()
                         for m, v in zip(mask, vals)], type=t)
    expected = pc.unique(vals)
    got = atc.call_function("unique", [at.array(vals)])
    assert_array_equal(got, expected, msg=f"unique({t})")


def test_unique_bool_and_empty():
    a = pa.array([True, None, False, True, None], type=pa.bool_())
    assert_array_equal(atc.call_function("unique", [at.array(a)]),
                       pc.unique(a))
    e = pa.array([], type=pa.int64())
    got = atc.call_function("unique", [at.array(e)])
    assert got.to_pylist() == []


def test_unique_strings(rng):
    vals = ["pear", "apple", None, "apple", "banana", "pear", "",
            "longer-string-that-differs-in-the-middle-AAAA-tail",
            "longer-string-that-differs-in-the-middle-BBBB-tail", None]
    a = pa.array(vals, type=pa.string())
    expected = pc.unique(a)
    got = atc.call_function("unique", [at.array(a)])
    assert_array_equal(got, expected, msg="unique(string)")


def test_value_counts(rng):
    n = 400
    vals = pa.array(rng.integers(0, 13, n), type=pa.int64())
    expected = pc.value_counts(vals)
    got = atc.call_function("value_counts", [at.array(vals)])
    assert got.column("values").to_pylist() == \
        expected.field("values").to_pylist()
    assert got.column("counts").to_pylist() == \
        expected.field("counts").to_pylist()


def test_value_counts_with_nulls(rng):
    vals = pa.array([1, None, 2, 1, None, None, 3], type=pa.int32())
    expected = pc.value_counts(vals)
    got = atc.call_function("value_counts", [at.array(vals)])
    assert got.column("values").to_pylist() == \
        expected.field("values").to_pylist()
    assert got.column("counts").to_pylist() == \
        expected.field("counts").to_pylist()


@pytest.mark.parametrize("t", [pa.int64(), pa.float64()])
def test_dictionary_encode(rng, t):
    n = 300
    vals = random_numeric_array(rng, 11, t, small=True).take(
        pa.array(rng.integers(0, 11, n)))
    vals = pa.array([None if rng.random() < 0.2 else v.as_py()
                     for v in vals], type=t)
    expected = pc.dictionary_encode(vals)
    got = atc.call_function("dictionary_encode", [at.array(vals)])
    got_pa = got.to_pyarrow()
    assert got_pa.type == pa.dictionary(pa.int32(), t)
    assert got_pa.to_pylist() == expected.to_pylist()
    assert got_pa.dictionary.to_pylist() == expected.dictionary.to_pylist()


def test_dictionary_encode_strings():
    vals = pa.array(["b", "a", None, "b", "c", "a"], type=pa.string())
    expected = pc.dictionary_encode(vals)
    got = atc.call_function("dictionary_encode", [at.array(vals)])
    got_pa = got.to_pyarrow()
    assert got_pa.to_pylist() == expected.to_pylist()
    assert got_pa.dictionary.to_pylist() == expected.dictionary.to_pylist()


# ---- set lookup --------------------------------------------------------------

@pytest.mark.parametrize("t", [pa.int32(), pa.int64(), pa.float64()])
def test_is_in_oracle(rng, t):
    n = 300
    a = random_numeric_array(rng, n, t, null_prob=0.2, small=True)
    value_set = pa.array([1, 5, 9, None], type=t)
    expected = pc.is_in(a, value_set=value_set)
    got = atc.call_function("is_in", [at.array(a)], value_set=value_set)
    assert_array_equal(got, expected, msg=f"is_in({t})")


def test_is_in_skip_nulls(rng):
    a = pa.array([1, None, 2, 3, None], type=pa.int64())
    value_set = pa.array([1, None], type=pa.int64())
    expected = pc.is_in(a, value_set=value_set, skip_nulls=True)
    got = atc.call_function("is_in", [at.array(a)], value_set=value_set,
                            skip_nulls=True)
    assert_array_equal(got, expected, msg="is_in skip_nulls")


@pytest.mark.parametrize("with_null_in_set", [False, True])
def test_index_in_oracle(rng, with_null_in_set):
    a = pa.array([7, None, 3, 7, 5, 100], type=pa.int64())
    vals = [3, 7, None] if with_null_in_set else [3, 7]
    value_set = pa.array(vals, type=pa.int64())
    expected = pc.index_in(a, value_set=value_set)
    got = atc.call_function("index_in", [at.array(a)], value_set=value_set)
    assert_array_equal(got, expected, msg="index_in")


def test_index_in_first_occurrence():
    # duplicate entries in value_set: index of FIRST occurrence
    a = pa.array([5, 6], type=pa.int64())
    value_set = pa.array([6, 5, 5, 6], type=pa.int64())
    expected = pc.index_in(a, value_set=value_set)
    got = atc.call_function("index_in", [at.array(a)], value_set=value_set)
    assert_array_equal(got, expected, msg="index_in dup set")


def test_is_in_strings():
    a = pa.array(["a", "zz", None, "b", "a"], type=pa.string())
    value_set = pa.array(["a", "b"], type=pa.string())
    expected = pc.is_in(a, value_set=value_set)
    got = atc.call_function("is_in", [at.array(a)], value_set=value_set)
    assert_array_equal(got, expected, msg="is_in strings")


def test_is_in_dictionary():
    a = pa.array(["x", "y", "x", None, "z"]).dictionary_encode()
    value_set = pa.array(["x", "z"])
    expected = pc.is_in(a, value_set=value_set)
    got = atc.call_function("is_in", [at.array(a)], value_set=value_set)
    assert_array_equal(got, expected, msg="is_in dictionary")
