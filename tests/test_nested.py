"""List arrays + nested kernels + grouped list aggregate
(reference: vector_nested.cc, GroupedListImpl)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow_tpu as at
from arrow_tpu import compute as atc
from oracle import assert_array_equal


def lists_sample():
    return pa.array([[1, 2], [], None, [3], [4, 5, 6]],
                    type=pa.list_(pa.int64()))


def test_list_roundtrip():
    a = lists_sample()
    arr = at.array(a)
    assert arr.to_pyarrow().to_pylist() == a.to_pylist()


def test_list_value_length():
    a = lists_sample()
    got = atc.call_function("list_value_length", [at.array(a)])
    assert_array_equal(got, pc.list_value_length(a))


def test_list_flatten():
    a = lists_sample()
    got = atc.call_function("list_flatten", [at.array(a)])
    assert_array_equal(got, pc.list_flatten(a))


def test_list_parent_indices():
    a = lists_sample()
    got = atc.call_function("list_parent_indices", [at.array(a)])
    assert_array_equal(got, pc.list_parent_indices(a))


def test_list_flatten_strings():
    a = pa.array([["ab", "c"], None, ["", "xyz"]],
                 type=pa.list_(pa.string()))
    got = atc.call_function("list_flatten", [at.array(a)])
    assert_array_equal(got, pc.list_flatten(a))


def test_group_by_list(rng):
    n = 300
    t = pa.table({"k": pa.array(rng.integers(0, 7, n)),
                  "v": pa.array([None if rng.random() < 0.2 else int(x)
                                 for x in rng.integers(0, 50, n)],
                                type=pa.int64())})
    from arrow_tpu.ops.hash_aggregate import AggregateSpec, HashAggregate
    tt = at.Table.from_pyarrow(t, max_rows_per_batch=128)
    ha = HashAggregate(tt.schema, ["k"], [AggregateSpec("list", "v")],
                       max_groups=16)
    state = ha.init_state()
    for b in tt.batches:
        state = ha.consume(state, b)
    got = ha.finalize(state).to_pyarrow()
    exp = t.group_by("k").aggregate([("v", "list")])
    gd = dict(zip(got["k"].to_pylist(), got["v_list"].to_pylist()))
    ed = dict(zip(exp["k"].to_pylist(), exp["v_list"].to_pylist()))
    assert gd == ed
