"""Core columnar model: pyarrow roundtrips, JSON literals, padding discipline."""

import numpy as np
import pyarrow as pa
import pytest

import arrow_tpu as at


ROUNDTRIP_CASES = [
    ([1, 2, None, 4], at.int64),
    ([1, None, 3], at.int32),
    ([0, 255, None], at.uint8),
    ([1.5, None, -3.25], at.float64),
    ([1.5, 2.5, 3.5], at.float32),
    ([True, None, False], at.bool_),
    (["hello", None, "", "world"], at.string),
    ([b"ab", None, b"c"], at.binary),
    ([None, None], at.int16),
    ([], at.int64),
]


@pytest.mark.parametrize("values,type_", ROUNDTRIP_CASES,
                         ids=lambda v: str(v)[:30])
def test_roundtrip(values, type_):
    a = at.array(values, type=type_)
    assert a.to_pylist() == values
    assert len(a) == len(values)


def test_dictionary_roundtrip():
    d = pa.array(["a", "b", "a", None, "c"]).dictionary_encode()
    a = at.array(d)
    assert a.to_pylist() == ["a", "b", "a", None, "c"]
    assert isinstance(a.type, at.types.DictionaryType)


def test_null_count_and_masks():
    a = at.array([1, None, 3, None], type=at.int64, capacity=16)
    assert a.null_count() == 2
    assert a.capacity == 16
    pm = np.asarray(a.present_mask())
    assert pm[:4].tolist() == [True, False, True, False]
    assert not pm[4:].any()  # padding is not present


def test_json_literals():
    a = at.array_from_json(at.int32, "[1, null, 3]")
    assert a.to_pylist() == [1, None, 3]
    b = at.batch_from_json(
        at.schema([("x", at.int64), ("s", at.string)]),
        '[{"x": 1, "s": "a"}, {"x": null, "s": "b"}]')
    assert b.to_pydict() == {"x": [1, None], "s": ["a", "b"]}


def test_batch_roundtrip_and_select():
    b = at.batch({"x": [1, 2, None], "y": [1.0, None, 3.0]})
    assert b.to_pydict() == {"x": [1, 2, None], "y": [1.0, None, 3.0]}
    s = b.select(["y"])
    assert s.to_pydict() == {"y": [1.0, None, 3.0]}
    b2 = b.set_column("z", at.array([7, 8, 9], type=at.int32, capacity=16))
    assert b2.to_pydict()["z"] == [7, 8, 9]


def test_table_multibatch():
    t = pa.table({"k": list(range(1000)),
                  "v": np.arange(1000, dtype=np.float64)})
    tt = at.Table.from_pyarrow(t, max_rows_per_batch=256)
    assert len(tt.batches) == 4
    assert tt.to_pyarrow().equals(t.combine_chunks())


def test_schema_api():
    s = at.schema([("a", at.int64), ("b", at.string, False)])
    assert s.names == ("a", "b")
    assert not s.field("b").nullable
    assert s.get_field_index("b") == 1
    assert s.get_field_index("zz") == -1
    pa_s = s.to_pyarrow()
    assert at.Schema.from_pyarrow(pa_s).equals(s)


def test_capacity_padding_is_pow2_bucketed():
    a = at.array(list(range(100)), type=at.int64)
    assert a.capacity == 128
    a = at.array(list(range(129)), type=at.int64)
    assert a.capacity == 256


def test_batch_is_pytree():
    import jax
    b = at.batch({"x": [1, 2, 3], "y": [1.0, None, 3.0]})
    leaves = jax.tree_util.tree_leaves(b)
    assert len(leaves) >= 3
    b2 = jax.tree_util.tree_map(lambda x: x, b)
    assert b2.to_pydict() == b.to_pydict()


def test_table_api_parity_methods(rng):
    """append_column / set_column / cast / drop_null / combine_chunks /
    equals (pyarrow Table surface, table.pxi)."""
    import pyarrow.compute as pc
    t0 = pa.table({"a": pa.array([1, None, 3], pa.int64()),
                   "b": pa.array([1.5, 2.5, None])})
    t = at.Table.from_pyarrow(t0, max_rows_per_batch=2)

    t2 = t.append_column("c", pa.array([7, 8, 9]))
    assert t2.to_pyarrow().equals(
        t0.append_column("c", pa.array([7, 8, 9])))

    t3 = t.set_column(0, "a2", pa.array([4, 5, 6]))
    assert t3.column_names[0] == "a2"
    assert t3["a2"].to_pylist() == [4, 5, 6]

    from arrow_tpu.core import datatype as dt
    from arrow_tpu.core.schema import Field, Schema
    target = Schema((Field("a", dt.float64, True),
                     Field("b", dt.float32, True)))
    t4 = t.cast(target)
    assert t4["a"].to_pylist() == [1.0, None, 3.0]

    t5 = t.drop_null()
    assert t5.to_pyarrow().equals(t0.drop_null())

    t6 = t.combine_chunks()
    assert len(t6.batches) == 1 and t6.equals(t0)
    assert t.equals(t0) and not t2.equals(t0)
