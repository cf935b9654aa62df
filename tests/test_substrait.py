"""Substrait consumer tests (reference: engine/substrait serde tests —
JSON-form plans into the engine, results vs direct pyarrow)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from arrow_tpu.engine import run_query


def _sel(i):
    return {"selection": {"directReference": {"structField": {"field": i}},
                          "rootReference": {}}}


def _fn_ext(anchor, name):
    return {"extensionFunction": {"functionAnchor": anchor, "name": name}}


def test_substrait_filter_project(rng):
    t = pa.table({"a": pa.array(rng.integers(0, 100, 500)),
                  "b": pa.array(rng.standard_normal(500))})
    plan = {
        "extensions": [_fn_ext(1, "gt:any_any"), _fn_ext(2, "add:i64_i64")],
        "relations": [{"root": {
            "input": {"project": {
                "common": {"emit": {"outputMapping": [0, 2]}},
                "input": {"filter": {
                    "input": {"read": {
                        "baseSchema": {"names": ["a", "b"]},
                        "namedTable": {"names": ["t"]},
                    }},
                    "condition": {"scalarFunction": {
                        "functionReference": 1,
                        "arguments": [{"value": _sel(0)},
                                      {"value": {"literal": {"i64": "50"}}}],
                    }},
                }},
                "expressions": [{"scalarFunction": {
                    "functionReference": 2,
                    "arguments": [{"value": _sel(0)},
                                  {"value": {"literal": {"i64": "1"}}}],
                }}],
            }},
            "names": ["a", "a_plus_1"],
        }}],
    }
    got = run_query(plan, named_tables={"t": t}).to_pyarrow()
    exp = t.filter(pc.greater(t["a"], 50))
    assert got["a"].to_pylist() == exp["a"].to_pylist()
    assert got["a_plus_1"].to_pylist() == \
        pc.add(exp["a"], 1).to_pylist()
    assert got.column_names == ["a", "a_plus_1"]


def test_substrait_aggregate_sort(rng):
    t = pa.table({"k": pa.array(rng.integers(0, 8, 400)),
                  "v": pa.array(rng.standard_normal(400))})
    plan = {
        "extensions": [_fn_ext(7, "sum:fp64")],
        "relations": [{"root": {
            "input": {"sort": {
                "input": {"aggregate": {
                    "input": {"read": {
                        "baseSchema": {"names": ["k", "v"]},
                        "namedTable": {"names": ["t"]}}},
                    "groupings": [{"groupingExpressions": [_sel(0)]}],
                    "measures": [{"measure": {
                        "functionReference": 7,
                        "arguments": [{"value": _sel(1)}]}}],
                }},
                "sorts": [{"expr": _sel(0),
                           "direction": "SORT_DIRECTION_ASC_NULLS_LAST"}],
            }},
            "names": ["k", "v_sum"],
        }}],
    }
    got = run_query(plan, named_tables={"t": t}).to_pyarrow()
    exp = t.group_by("k").aggregate([("v", "sum")]).sort_by(
        [("k", "ascending")])
    assert got["k"].to_pylist() == exp["k"].to_pylist()
    np.testing.assert_allclose(got["v_sum"].to_pylist(),
                               exp["v_sum"].to_pylist(), rtol=1e-12)


def test_substrait_join(rng):
    l = pa.table({"k": pa.array([1, 2, 3, 4]), "lv": pa.array([10, 20, 30, 40])})
    r = pa.table({"k2": pa.array([2, 4]), "rv": pa.array([200, 400])})
    plan = {
        "extensions": [_fn_ext(3, "equal:any_any")],
        "relations": [{"root": {
            "input": {"join": {
                "left": {"read": {"baseSchema": {"names": ["k", "lv"]},
                                  "namedTable": {"names": ["l"]}}},
                "right": {"read": {"baseSchema": {"names": ["k2", "rv"]},
                                   "namedTable": {"names": ["r"]}}},
                "type": "JOIN_TYPE_INNER",
                "expression": {"scalarFunction": {
                    "functionReference": 3,
                    "arguments": [{"value": _sel(0)}, {"value": _sel(2)}],
                }},
            }},
            "names": ["k", "lv", "k2", "rv"],
        }}],
    }
    got = run_query(plan, named_tables={"l": l, "r": r}).to_pyarrow()
    got = got.sort_by([("k", "ascending")])
    assert got["k"].to_pylist() == [2, 4]
    assert got["rv"].to_pylist() == [200, 400]
