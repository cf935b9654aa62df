"""pivot_wider / hash_pivot_wider + struct-column kernels vs the pyarrow
oracle (reference: aggregate_pivot.cc, hash_aggregate_pivot.cc,
scalar_nested.cc make_struct/struct_field)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow_tpu as at
import arrow_tpu.compute as atc
from arrow_tpu.acero import Declaration
from arrow_tpu.acero.options import (AggregateNodeOptions,
                                     TableSourceNodeOptions)
from arrow_tpu.ops.agg_options import PivotWiderOptions
from arrow_tpu.ops.hash_aggregate import AggregateSpec


def _run_hash_pivot(pa_table, keys, key_names, max_batch_rows=None,
                    behavior="ignore"):
    t = at.table(pa_table)
    opts = PivotWiderOptions(key_names=key_names,
                             unexpected_key_behavior=behavior)
    src = TableSourceNodeOptions(t)
    if max_batch_rows:
        src = TableSourceNodeOptions(t, max_batch_rows=max_batch_rows)
    decl = Declaration(
        "aggregate",
        AggregateNodeOptions(
            [AggregateSpec("hash_pivot_wider", ("k", "v"), opts)],
            keys=keys),
        inputs=[Declaration("table_source", src)])
    return decl.to_table().to_pyarrow()


def _oracle_hash_pivot(pa_table, keys, key_names, behavior="ignore"):
    b = (pc.PivotWiderOptions.Defaults() if False else
         pc.PivotWiderOptions(key_names=key_names,
                              unexpected_key_behavior=behavior))
    return pa_table.group_by(keys, use_threads=False).aggregate(
        [(("k", "v"), "pivot_wider", b)])


def _sorted(t):
    return t.sort_by("g")


def test_hash_pivot_wider_basic():
    pt = pa.table({"g": [1, 1, 2, 3], "k": ["h", "w", "w", "h"],
                   "v": [11, 12, 13, 14]})
    out = _run_hash_pivot(pt, ["g"], ["h", "w"])
    ref = _oracle_hash_pivot(pt, ["g"], ["h", "w"])
    assert _sorted(out).equals(_sorted(ref))


def test_hash_pivot_wider_null_values():
    pt = pa.table({"g": [1, 1, 1, 2, 2],
                   "k": ["h", "w", "w", "h", "w"],
                   "v": [11, None, 5, None, 13]})
    out = _run_hash_pivot(pt, ["g"], ["h", "w"])
    ref = _oracle_hash_pivot(pt, ["g"], ["h", "w"])
    assert _sorted(out).equals(_sorted(ref))


def test_hash_pivot_wider_null_key_raises():
    # a null pivot key is an error in the reference (pivot_internal.cc
    # NullKeyName) — the pyarrow oracle raises ArrowKeyError too
    pt = pa.table({"g": [1, 1], "k": ["h", None], "v": [1, 2]})
    with pytest.raises(Exception, match="cannot be null"):
        _oracle_hash_pivot(pt, ["g"], ["h", "w"])
    with pytest.raises(RuntimeError, match="cannot be null"):
        _run_hash_pivot(pt, ["g"], ["h", "w"])


def test_hash_pivot_wider_unexpected_ignored():
    pt = pa.table({"g": [1, 1, 2], "k": ["h", "zzz", "w"],
                   "v": [1, 2, 3]})
    out = _run_hash_pivot(pt, ["g"], ["h", "w"])
    ref = _oracle_hash_pivot(pt, ["g"], ["h", "w"])
    assert _sorted(out).equals(_sorted(ref))


def test_hash_pivot_wider_unexpected_raises():
    pt = pa.table({"g": [1, 1, 2], "k": ["h", "zzz", "w"],
                   "v": [1, 2, 3]})
    with pytest.raises(RuntimeError, match="unexpected pivot key"):
        _run_hash_pivot(pt, ["g"], ["h", "w"], behavior="raise")


def test_hash_pivot_wider_duplicate_raises():
    pt = pa.table({"g": [1, 1], "k": ["h", "h"], "v": [1, 2]})
    with pytest.raises(RuntimeError, match="duplicate"):
        _run_hash_pivot(pt, ["g"], ["h", "w"])


def test_hash_pivot_wider_multi_batch_merge():
    rng = np.random.default_rng(7)
    n = 300
    g = rng.integers(0, 60, n)
    kpool = np.array(["a", "b", "c", "d"])
    k = kpool[rng.integers(0, 4, n)]
    # ensure no duplicate (g, k) pairs: keep first occurrence only
    seen = set()
    keep = []
    for i in range(n):
        key = (int(g[i]), str(k[i]))
        keep.append(key not in seen)
        seen.add(key)
    keep = np.asarray(keep)
    pt = pa.table({"g": g[keep], "k": k[keep],
                   "v": rng.normal(size=int(keep.sum()))})
    out = _run_hash_pivot(pt, ["g"], ["a", "b", "c", "d"],
                          max_batch_rows=32)
    ref = _oracle_hash_pivot(pt, ["g"], ["a", "b", "c", "d"])
    assert _sorted(out).equals(_sorted(ref))


def test_hash_pivot_wider_float_and_bool_values():
    pt = pa.table({"g": [1, 2], "k": ["x", "y"], "v": [True, False]})
    out = _run_hash_pivot(pt, ["g"], ["x", "y"])
    ref = _oracle_hash_pivot(pt, ["g"], ["x", "y"])
    assert _sorted(out).equals(_sorted(ref))


def test_scalar_pivot_wider():
    s = atc.pivot_wider(
        at.array(["h", "w"]), at.array([1, 2]),
        options=PivotWiderOptions(key_names=["h", "w", "d"]))
    assert s.as_py() == {"h": 1, "w": 2, "d": None}
    ref = pc.pivot_wider(pa.array(["h", "w"]), pa.array([1, 2]),
                         key_names=["h", "w", "d"])
    assert s.as_py() == ref.as_py()


def test_scalar_pivot_wider_duplicate_raises():
    with pytest.raises(RuntimeError, match="duplicate"):
        atc.pivot_wider(at.array(["h", "h"]), at.array([1, 2]),
                        options=PivotWiderOptions(key_names=["h"]))


# ---- struct columns ---------------------------------------------------------

def test_struct_interop_roundtrip():
    a = pa.array([{"x": 1, "y": "a"}, {"x": None, "y": "b"}, None,
                  {"x": 4, "y": None}],
                 type=pa.struct([("x", pa.int64()), ("y", pa.string())]))
    arr = at.array(a)
    assert arr.to_pyarrow().equals(a)


def test_make_struct_matches_pyarrow():
    x = pa.array([1, 2, None])
    y = pa.array(["a", None, "c"])
    out = atc.make_struct(at.array(x), at.array(y),
                          field_names=["x", "y"]).to_pyarrow()
    ref = pc.make_struct(x, y, field_names=["x", "y"])
    assert out.equals(ref)


def test_struct_field_matches_pyarrow():
    a = pa.array([{"x": 1, "y": "a"}, None, {"x": 3, "y": None}],
                 type=pa.struct([("x", pa.int64()), ("y", pa.string())]))
    for ix in (0, 1):
        out = atc.struct_field(at.array(a), indices=ix).to_pyarrow()
        ref = pc.struct_field(a, indices=ix)
        assert out.equals(ref), (ix, out, ref)
