"""Union layouts (sparse + dense) + nested take/filter
(reference: Columnar.rst union section; vector_selection take/filter over
nested layouts)."""

import numpy as np
import pyarrow as pa

import arrow_tpu as at
from arrow_tpu.ops.ree import run_end_decode_array, run_end_encode_array
from arrow_tpu.ops.selection import filter_array, take_array


def _sparse_union():
    codes = pa.array([0, 1, 0, 1], type=pa.int8())
    c0 = pa.array([1, 2, None, 4])
    c1 = pa.array(["a", "b", "c", "d"])
    return pa.UnionArray.from_sparse(codes, [c0, c1],
                                     field_names=["i", "s"])


def _dense_union():
    codes = pa.array([0, 1, 1, 0, 0], type=pa.int8())
    off = pa.array([0, 0, 1, 1, 2], type=pa.int32())
    c0 = pa.array([10, 20, 30])
    c1 = pa.array(["x", None])
    return pa.UnionArray.from_dense(codes, off, [c0, c1],
                                    field_names=["i", "s"])


def test_sparse_union_roundtrip():
    su = _sparse_union()
    arr = at.array(su)
    assert arr.to_pyarrow().equals(su)


def test_dense_union_roundtrip():
    du = _dense_union()
    arr = at.array(du)
    assert arr.to_pyarrow().equals(du)


def test_sparse_union_take():
    su = _sparse_union()
    arr = at.array(su)
    out = take_array(arr, at.array(np.array([3, 0, 2], dtype=np.int32)))
    assert out.to_pyarrow().to_pylist() == \
        [su[3].as_py(), su[0].as_py(), su[2].as_py()]


def test_dense_union_take_and_filter():
    du = _dense_union()
    arr = at.array(du)
    out = take_array(arr, at.array(np.array([4, 1, 0], dtype=np.int32)))
    assert out.to_pyarrow().to_pylist() == \
        [du[4].as_py(), du[1].as_py(), du[0].as_py()]
    f = filter_array(arr, at.array([True, False, True, False, True]))
    assert f.to_pyarrow().to_pylist() == \
        [du[0].as_py(), du[2].as_py(), du[4].as_py()]


def test_struct_take():
    st = pa.array([{"x": 1}, {"x": None}, None, {"x": 4}],
                  type=pa.struct([("x", pa.int64())]))
    out = take_array(at.array(st),
                     at.array(np.array([2, 0, 3], dtype=np.int32)))
    ref = st.take(pa.array([2, 0, 3], type=pa.int32()))
    assert out.to_pyarrow().equals(ref)


def test_list_take_matches_pyarrow():
    lt = pa.array([[1, 2], [3], None, [4, 5, 6]])
    idx = pa.array([3, 2, 0], type=pa.int32())
    out = take_array(at.array(lt), at.array(idx))
    assert out.to_pyarrow().to_pylist() == lt.take(idx).to_pylist()


def test_list_filter_matches_pyarrow():
    lt = pa.array([[1, 2], [3], None, [4, 5, 6]])
    m = pa.array([True, True, True, False])
    out = filter_array(at.array(lt), at.array(m))
    assert out.to_pyarrow().to_pylist() == lt.filter(m).to_pylist()


def test_ree_take_type_stable():
    a = at.array([1, 1, 2, 2, 2, 3])
    ree = run_end_encode_array(a)
    out = take_array(ree, at.array(np.array([5, 0, 3, 1], dtype=np.int32)))
    assert out.type == ree.type
    assert run_end_decode_array(out).to_pylist() == [3, 1, 2, 1]
