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


# ---- binary wire format (engine/substrait_pb.py) --------------------------

_CMP_URI = ("https://github.com/substrait-io/substrait/blob/main/"
            "extensions/functions_comparison.yaml")
_ARITH_URI = ("https://github.com/substrait-io/substrait/blob/main/"
              "extensions/functions_arithmetic.yaml")


def _binary_filter_plan():
    return {
        "extensionUris": [{"extensionUriAnchor": 1, "uri": _CMP_URI}],
        "extensions": [{"extensionFunction": {
            "extensionUriReference": 1, "functionAnchor": 1,
            "name": "gt"}}],
        "version": {"minorNumber": 44},
        "relations": [{"root": {
            "input": {"filter": {
                "input": {"read": {
                    "baseSchema": {"names": ["a", "b"], "struct": {
                        "types": [{"i64": {"nullability": 1}},
                                  {"fp64": {"nullability": 1}}]}},
                    "namedTable": {"names": ["t"]}}},
                "condition": {"scalarFunction": {
                    "functionReference": 1,
                    "outputType": {"bool": {"nullability": 1}},
                    "arguments": [{"value": _sel(0)},
                                  {"value": {"literal": {"i64": 90}}}]}},
            }},
            "names": ["a", "b"]}}],
    }


def test_substrait_binary_pyarrow_oracle(rng):
    """Our encoder's field numbers validated by pyarrow's generated
    bindings: the SAME binary plan runs through pyarrow.substrait
    run_query and through our engine, results must agree."""
    import pyarrow.substrait as ps
    from arrow_tpu.engine.substrait_pb import decode_plan, encode_plan
    t = pa.table({"a": pa.array(np.arange(100, dtype=np.int64)),
                  "b": pa.array(np.arange(100, dtype=np.float64))})
    plan = _binary_filter_plan()
    buf = encode_plan(plan)

    exp = ps.run_query(buf, table_provider=lambda names, *_: t).read_all()
    got = run_query(buf, named_tables={"t": t}).to_pyarrow()
    assert got["a"].to_pylist() == exp["a"].to_pylist()
    assert got["b"].to_pylist() == exp["b"].to_pylist()

    # decode(encode(x)) preserves the consumed structure
    rt = decode_plan(buf)
    assert rt["relations"][0]["root"]["names"] == ["a", "b"]
    cond = rt["relations"][0]["root"]["input"]["filter"]["condition"]
    assert cond["scalarFunction"]["arguments"][1]["value"]["literal"][
        "i64"] == 90


def test_substrait_binary_extended_expression_decode():
    """Decode REAL substrait bytes produced by pyarrow (not our own
    encoder): field numbers for Expression/Literal/Type/extensions."""
    import pyarrow.compute as _pc
    import pyarrow.substrait as ps
    from arrow_tpu.engine.substrait_pb import decode_message
    schema = pa.schema([("x", pa.int64()), ("y", pa.float64())])
    buf = bytes(ps.serialize_expressions(
        [_pc.field("y") > 2.5], ["gt_y"], schema))
    m = decode_message(buf, "ExtendedExpression")
    assert m["baseSchema"]["names"] == ["x", "y"]
    types = m["baseSchema"]["struct"]["types"]
    assert "i64" in types[0] and "fp64" in types[1]
    fns = [e["extensionFunction"]["name"] for e in m["extensions"]]
    assert any(f.startswith("gt") for f in fns)
    e = m["referredExpr"][0]["expression"]["scalarFunction"]
    args = e["arguments"]
    assert args[0]["value"]["selection"]["directReference"][
        "structField"].get("field", 0) == 1
    assert abs(args[1]["value"]["literal"]["fp64"] - 2.5) < 1e-12


def test_substrait_binary_aggregate(rng):
    """Binary aggregate+sort plan through both engines."""
    import pyarrow.substrait as ps
    from arrow_tpu.engine.substrait_pb import encode_plan
    t = pa.table({"k": pa.array(rng.integers(0, 8, 400)),
                  "v": pa.array(rng.standard_normal(400))})
    plan = {
        "extensionUris": [{"extensionUriAnchor": 1, "uri": _ARITH_URI}],
        "extensions": [{"extensionFunction": {
            "extensionUriReference": 1, "functionAnchor": 7,
            "name": "sum"}}],
        "version": {"minorNumber": 44},
        "relations": [{"root": {
            "input": {"aggregate": {
                "input": {"read": {
                    "baseSchema": {"names": ["k", "v"], "struct": {
                        "types": [{"i64": {"nullability": 1}},
                                  {"fp64": {"nullability": 1}}]}},
                    "namedTable": {"names": ["t"]}}},
                "groupings": [{"groupingExpressions": [_sel(0)]}],
                "measures": [{"measure": {
                    "functionReference": 7, "phase":
                        "AGGREGATION_PHASE_INITIAL_TO_RESULT",
                    "outputType": {"fp64": {"nullability": 1}},
                    "arguments": [{"value": _sel(1)}]}}],
            }},
            "names": ["k", "v_sum"]}}],
    }
    buf = encode_plan(plan)
    got = run_query(buf, named_tables={"t": t}).to_pyarrow() \
        .sort_by([("k", "ascending")])
    exp = ps.run_query(buf, table_provider=lambda names, *_: t).read_all()
    exp = exp.rename_columns(["k", "v_sum"]).sort_by([("k", "ascending")])
    assert got["k"].to_pylist() == exp["k"].to_pylist()
    np.testing.assert_allclose(got["v_sum"].to_pylist(),
                               exp["v_sum"].to_pylist(), rtol=1e-9)


def test_substrait_cross_and_set(rng):
    """CrossRel (cartesian product — beyond the reference's consumer,
    which rejects it) and SetRel union_all / union_distinct."""
    from arrow_tpu.engine.substrait_pb import encode_plan
    a = pa.table({"x": pa.array([1, 2, 3])})
    b = pa.table({"y": pa.array([10, 20])})

    def read(name, names, ts):
        return {"read": {"baseSchema": {"names": names, "struct": {
            "types": ts}}, "namedTable": {"names": [name]}}}

    i64 = {"i64": {"nullability": 1}}
    cross_plan = {"version": {"minorNumber": 44}, "relations": [{"root": {
        "input": {"cross": {"left": read("a", ["x"], [i64]),
                            "right": read("b", ["y"], [i64])}},
        "names": ["x", "y"]}}]}
    got = run_query(encode_plan(cross_plan),
                    named_tables={"a": a, "b": b}).to_pyarrow()
    assert got.num_rows == 6
    pairs = sorted(zip(got["x"].to_pylist(), got["y"].to_pylist()))
    assert pairs == sorted((x, y) for x in [1, 2, 3] for y in [10, 20])

    c = pa.table({"x": pa.array([2, 3, 4])})
    for op, want in [("SET_OP_UNION_ALL", [1, 2, 2, 3, 3, 4]),
                     ("SET_OP_UNION_DISTINCT", [1, 2, 3, 4])]:
        set_plan = {"version": {"minorNumber": 44}, "relations": [{"root": {
            "input": {"set": {"inputs": [read("a", ["x"], [i64]),
                                         read("c", ["x"], [i64])],
                              "op": op}},
            "names": ["x"]}}]}
        got = run_query(encode_plan(set_plan),
                        named_tables={"a": a, "c": c}).to_pyarrow()
        assert sorted(got["x"].to_pylist()) == want, op


def test_substrait_virtual_table():
    """ReadRel.virtual_table: literal rows inline in the plan."""
    from arrow_tpu.engine.substrait_pb import encode_plan
    plan = {"version": {"minorNumber": 44}, "relations": [{"root": {
        "input": {"read": {
            "baseSchema": {"names": ["a", "b"], "struct": {"types": [
                {"i64": {"nullability": 1}},
                {"string": {"nullability": 1}}]}},
            "virtualTable": {"values": [
                {"fields": [{"i64": 1}, {"string": "x"}]},
                {"fields": [{"i64": 2}, {"string": "y"}]},
            ]}}},
        "names": ["a", "b"]}}]}
    got = run_query(encode_plan(plan)).to_pyarrow()
    assert got["a"].to_pylist() == [1, 2]
    assert got["b"].to_pylist() == ["x", "y"]


# ---- producer + extension registration (round-3 breadth) -------------------

def test_substrait_producer_roundtrip_pyarrow_oracle(rng):
    """declaration_to_substrait: our engine BUILDS a binary plan that
    pyarrow.substrait executes (serde.cc SerializePlan parity) — and our
    own consumer round-trips it to the same result."""
    import pyarrow.substrait as ps
    from arrow_tpu.acero import (Declaration, FilterNodeOptions,
                                 ProjectNodeOptions,
                                 TableSourceNodeOptions)
    from arrow_tpu.compute.expressions import field
    from arrow_tpu.engine import declaration_to_substrait, run_query

    t = pa.table({"a": pa.array(rng.integers(0, 100, 300)),
                  "b": pa.array(rng.standard_normal(300))})
    decl = Declaration.from_sequence([
        Declaration("table_source", TableSourceNodeOptions(t)),
        Declaration("filter", FilterNodeOptions(field("a") > 40)),
        Declaration("project", ProjectNodeOptions(
            [field("a"), field("b") * 2.0], ["a", "b2"])),
    ])
    buf, tables = declaration_to_substrait(decl, binary=True)
    assert isinstance(buf, bytes) and len(tables) == 1

    exp = t.filter(pc.greater(t["a"], 40))
    ours = run_query(buf, named_tables=tables).to_pyarrow()
    assert ours["a"].to_pylist() == exp["a"].to_pylist()
    np.testing.assert_allclose(ours["b2"].to_pylist(),
                               pc.multiply(exp["b"], 2.0).to_pylist())

    got = ps.run_query(
        buf, table_provider=lambda names, *_: tables[names[0]]
    ).read_all()
    assert got.column_names == ["a", "b2"]
    assert got["a"].to_pylist() == exp["a"].to_pylist()
    np.testing.assert_allclose(got["b2"].to_pylist(),
                               pc.multiply(exp["b"], 2.0).to_pylist())


def test_substrait_producer_agg_join_sort(rng):
    """Producer over aggregate/join/sort/fetch; consumer round-trip."""
    from arrow_tpu.acero import (AggregateNodeOptions, AggregateSpec,
                                 Declaration, FetchNodeOptions,
                                 HashJoinNodeOptions, OrderByNodeOptions,
                                 TableSourceNodeOptions)
    from arrow_tpu.engine import declaration_to_substrait, run_query

    l = pa.table({"k": pa.array(rng.integers(0, 20, 400)),
                  "v": pa.array(rng.standard_normal(400))})
    r = pa.table({"k2": pa.array(np.arange(20)),
                  "w": pa.array(np.arange(20) * 10.0)})
    decl = Declaration.from_sequence([
        Declaration("hashjoin", HashJoinNodeOptions(
            "inner", left_keys=["k"], right_keys=["k2"],
            left_output=["k", "v"], right_output=["w"]),
            inputs=[
                Declaration("table_source", TableSourceNodeOptions(l)),
                Declaration("table_source", TableSourceNodeOptions(r)),
            ]),
        Declaration("aggregate", AggregateNodeOptions(
            [AggregateSpec("sum", "v", name="v_sum"),
             AggregateSpec("max", "w", name="w_max")], keys=["k"])),
        Declaration("order_by", OrderByNodeOptions([("k", "ascending")])),
        Declaration("fetch", FetchNodeOptions(0, 10)),
    ])
    plan, tables = declaration_to_substrait(decl)
    got = run_query(plan, named_tables=tables).to_pyarrow()

    j = l.join(r, keys="k", right_keys="k2", join_type="inner")
    exp = j.group_by("k").aggregate([("v", "sum"), ("w", "max")]) \
        .sort_by([("k", "ascending")]).slice(0, 10)
    assert got.num_rows == exp.num_rows
    assert got["k"].to_pylist() == exp["k"].to_pylist()
    np.testing.assert_allclose(got["v_sum"].to_pylist(),
                               exp["v_sum"].to_pylist(), rtol=1e-6)
    np.testing.assert_allclose(got["w_max"].to_pylist(),
                               exp["w_max"].to_pylist())


def test_substrait_register_udf_uri():
    """register_substrait_function: custom extension URI + name maps to
    a registry function (ExtensionIdRegistry parity,
    extension_set.cc)."""
    from arrow_tpu.engine import run_query
    from arrow_tpu.engine.substrait import (_USER_FUNCTIONS,
                                            register_substrait_function)
    t = pa.table({"x": pa.array([1.0, 4.0, 9.0, None])})
    plan = {
        "extensionUris": [{"extensionUriAnchor": 3,
                           "uri": "urn:example:my_udfs.yaml"}],
        "extensions": [{"extensionFunction": {
            "extensionUriReference": 3, "functionAnchor": 9,
            "name": "my_square_root:fp64"}}],
        "relations": [{"root": {
            "input": {"project": {
                "common": {"emit": {"outputMapping": [1]}},
                "input": {"read": {"baseSchema": {"names": ["x"]},
                                   "namedTable": {"names": ["t"]}}},
                "expressions": [{"scalarFunction": {
                    "functionReference": 9,
                    "arguments": [{"value": _sel(0)}]}}],
            }},
            "names": ["sx"]}}],
    }
    with pytest.raises(NotImplementedError):
        run_query(plan, named_tables={"t": t})
    register_substrait_function("my_square_root", "sqrt",
                                uri="urn:example:my_udfs.yaml")
    try:
        got = run_query(plan, named_tables={"t": t}).to_pyarrow()
        np.testing.assert_allclose(
            got["sx"].to_pylist()[:3], [1.0, 2.0, 3.0], rtol=1e-6)
        assert got["sx"].to_pylist()[3] is None
    finally:
        _USER_FUNCTIONS.clear()


def test_substrait_emit_on_filter_and_join(rng):
    """RelCommon.emit honored on non-project rels (the reference honors
    emit everywhere, relation_internal.cc)."""
    from arrow_tpu.engine import run_query
    t = pa.table({"a": pa.array([1, 5, 9]), "b": pa.array([2., 4., 6.])})
    plan = {
        "extensions": [_fn_ext(1, "gt:any_any")],
        "relations": [{"root": {
            "input": {"filter": {
                "common": {"emit": {"outputMapping": [1]}},
                "input": {"read": {"baseSchema": {"names": ["a", "b"]},
                                   "namedTable": {"names": ["t"]}}},
                "condition": {"scalarFunction": {
                    "functionReference": 1,
                    "arguments": [{"value": _sel(0)},
                                  {"value": {"literal": {"i64": "2"}}}],
                }},
            }},
            "names": ["bb"]}}],
    }
    got = run_query(plan, named_tables={"t": t}).to_pyarrow()
    assert got.column_names == ["bb"]
    assert got["bb"].to_pylist() == [4.0, 6.0]
