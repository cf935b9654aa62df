"""Substrait plan consumer (JSON form).

Reference: ``cpp/src/arrow/engine/substrait/serde.cc`` (DeserializePlan)
and ``relation_internal.cc`` (rel -> acero Declaration). The reference
consumes protobuf; this engine consumes the **protobuf JSON form** of a
Substrait plan (the canonical text encoding — protoc-generated bindings
aren't baked into the image, and the JSON form is what engines exchange
in tests). Supported rels: read (named table / local ATB+parquet files),
filter, project, aggregate, sort, fetch, join; expressions: field
selections, literals, scalar functions mapped through the standard
extension URIs (functions_comparison/arithmetic/boolean).
"""

from __future__ import annotations

import json
from typing import Dict, List, Optional

from ..acero import (AggregateNodeOptions, Declaration, FetchNodeOptions,
                     FilterNodeOptions, HashJoinNodeOptions,
                     OrderByNodeOptions, ProjectNodeOptions,
                     TableSourceNodeOptions)
from ..compute.expressions import Expression, call, field as field_ref, \
    literal

__all__ = ["substrait_to_declaration", "run_query"]

# substrait function name -> registry function (standard extension yamls)
_FUNCTION_MAP = {
    "gt": "greater", "gte": "greater_equal", "lt": "less",
    "lte": "less_equal", "equal": "equal", "not_equal": "not_equal",
    "and": "and_kleene", "or": "or_kleene", "not": "invert",
    "add": "add", "subtract": "subtract", "multiply": "multiply",
    "divide": "divide", "modulus": "mod", "power": "power",
    "abs": "abs", "negate": "negate",
    "is_null": "is_null", "is_not_null": "is_valid",
    "sum": "sum", "min": "min", "max": "max", "avg": "mean",
    "count": "count", "count_all": "count_all", "any_value": "one",
}


class _Ctx:
    def __init__(self, plan: dict, named_tables: Dict):
        self.named_tables = named_tables or {}
        self.functions: Dict[int, str] = {}
        for ext in plan.get("extensions", []):
            f = ext.get("extensionFunction")
            if f:
                name = f.get("name", "")
                base = name.split(":", 1)[0]
                self.functions[int(f.get("functionAnchor", 0))] = base


def _literal_value(lit: dict):
    for k in ("boolean", "i8", "i16", "i32", "i64", "fp32", "fp64",
              "string", "date"):
        if k in lit:
            v = lit[k]
            if k.startswith("i") and isinstance(v, str):
                v = int(v)
            return v
    if "null" in lit:
        return None
    raise NotImplementedError(f"substrait literal {sorted(lit)}")


def _expr(e: dict, ctx: _Ctx, input_fields: List[str]) -> Expression:
    if "selection" in e:
        sel = e["selection"]
        idx = int(sel.get("directReference", {}).get("structField", {})
                  .get("field", 0))
        return field_ref(input_fields[idx])
    if "literal" in e:
        return literal(_literal_value(e["literal"]))
    if "scalarFunction" in e:
        f = e["scalarFunction"]
        anchor = int(f.get("functionReference", 0))
        base = ctx.functions.get(anchor)
        if base is None or base not in _FUNCTION_MAP:
            raise NotImplementedError(
                f"substrait function anchor {anchor} ({base!r})")
        args = [_expr(a["value"], ctx, input_fields)
                for a in f.get("arguments", []) if "value" in a]
        return call(_FUNCTION_MAP[base], args)
    if "cast" in e:
        from ..core import datatype as dt
        from ..ops.scalar_cast import CastOptions
        c = e["cast"]
        inner = _expr(c["input"], ctx, input_fields)
        t = _substrait_type(c["type"])
        return call("cast", [inner], options=CastOptions(t))
    raise NotImplementedError(f"substrait expression {sorted(e)}")


def _substrait_type(t: dict):
    from ..core import datatype as dt
    mapping = {"bool": dt.bool_, "i8": dt.int8, "i16": dt.int16,
               "i32": dt.int32, "i64": dt.int64, "fp32": dt.float32,
               "fp64": dt.float64, "string": dt.string, "date": dt.date32}
    for k, v in mapping.items():
        if k in t:
            return v
    raise NotImplementedError(f"substrait type {sorted(t)}")


def _rel_fields(rel: dict, ctx: _Ctx) -> List[str]:
    """Output field names of a rel (for positional field references)."""
    if "read" in rel:
        return list(rel["read"]["baseSchema"]["names"])
    if "filter" in rel:
        return _rel_fields(rel["filter"]["input"], ctx)
    if "fetch" in rel:
        return _rel_fields(rel["fetch"]["input"], ctx)
    if "sort" in rel:
        return _rel_fields(rel["sort"]["input"], ctx)
    if "project" in rel:
        base = _rel_fields(rel["project"]["input"], ctx)
        n = len(rel["project"].get("expressions", []))
        names = base + [f"expr{i}" for i in range(n)]
        emit = rel["project"].get("common", {}).get("emit", {}) \
            .get("outputMapping")
        return [names[i] for i in emit] if emit else names
    if "aggregate" in rel:
        agg = rel["aggregate"]
        base = _rel_fields(agg["input"], ctx)
        names = []
        for g in agg.get("groupings", []):
            for ge in g.get("groupingExpressions", []):
                idx = int(ge.get("selection", {})
                          .get("directReference", {})
                          .get("structField", {}).get("field", 0))
                names.append(base[idx])
        for i, _m in enumerate(agg.get("measures", [])):
            names.append(f"agg{i}")
        return names
    if "join" in rel:
        j = rel["join"]
        return _rel_fields(j["left"], ctx) + _rel_fields(j["right"], ctx)
    if "cross" in rel:
        c = rel["cross"]
        return _rel_fields(c["left"], ctx) + _rel_fields(c["right"], ctx)
    if "set" in rel:
        return _rel_fields(rel["set"]["inputs"][0], ctx)
    raise NotImplementedError(f"substrait rel {sorted(rel)}")


def _rel(rel: dict, ctx: _Ctx) -> Declaration:
    if "read" in rel:
        r = rel["read"]
        if "namedTable" in r:
            name = r["namedTable"]["names"][0]
            table = ctx.named_tables[name]
            return Declaration("table_source",
                               TableSourceNodeOptions(table))
        if "virtualTable" in r:
            import pyarrow as pa
            names = list(r["baseSchema"]["names"])
            rows = []
            for sl in r["virtualTable"].get("values", []):
                rows.append([_literal_value(f)
                             for f in sl.get("fields", [])])
            cols = {n: [row[i] if i < len(row) else None for row in rows]
                    for i, n in enumerate(names)}
            return Declaration("table_source",
                               TableSourceNodeOptions(pa.table(cols)))
        if "localFiles" in r:
            from .. import dataset as ds
            items = r["localFiles"]["items"]
            paths = [i["uriFile"].replace("file://", "") for i in items]
            frags = []
            for p in paths:
                ext = p.rsplit(".", 1)[-1]
                frags.append(ds.Fragment(p, ext))
            d = ds.FileSystemDataset(frags)
            from ..acero import ScanNodeOptions
            return Declaration("scan", ScanNodeOptions(d))
        raise NotImplementedError("substrait read kind")
    if "filter" in rel:
        f = rel["filter"]
        inp = _rel(f["input"], ctx)
        fields = _rel_fields(f["input"], ctx)
        return Declaration("filter", FilterNodeOptions(
            _expr(f["condition"], ctx, fields)), [inp])
    if "project" in rel:
        p = rel["project"]
        inp = _rel(p["input"], ctx)
        fields = _rel_fields(p["input"], ctx)
        exprs = [field_ref(n) for n in fields]
        exprs += [_expr(e, ctx, fields) for e in p.get("expressions", [])]
        names = fields + [f"expr{i}"
                          for i in range(len(p.get("expressions", [])))]
        emit = p.get("common", {}).get("emit", {}).get("outputMapping")
        if emit:
            exprs = [exprs[i] for i in emit]
            names = [names[i] for i in emit]
        return Declaration("project", ProjectNodeOptions(exprs, names),
                           [inp])
    if "aggregate" in rel:
        a = rel["aggregate"]
        inp = _rel(a["input"], ctx)
        fields = _rel_fields(a["input"], ctx)
        keys = []
        for g in a.get("groupings", []):
            for ge in g.get("groupingExpressions", []):
                idx = int(ge.get("selection", {}).get("directReference", {})
                          .get("structField", {}).get("field", 0))
                keys.append(fields[idx])
        specs = []
        for i, m in enumerate(a.get("measures", [])):
            mf = m["measure"]
            anchor = int(mf.get("functionReference", 0))
            base = ctx.functions.get(anchor)
            fn = _FUNCTION_MAP.get(base)
            if fn is None:
                raise NotImplementedError(f"substrait measure {base!r}")
            args = mf.get("arguments", [])
            target = None
            if args:
                idx = int(args[0]["value"].get("selection", {})
                          .get("directReference", {})
                          .get("structField", {}).get("field", 0))
                target = fields[idx]
            from ..acero import AggregateSpec
            specs.append(AggregateSpec(fn, target, name=f"agg{i}"))
        return Declaration("aggregate",
                           AggregateNodeOptions(specs, keys), [inp])
    if "sort" in rel:
        s = rel["sort"]
        inp = _rel(s["input"], ctx)
        fields = _rel_fields(s["input"], ctx)
        keys = []
        for sf in s.get("sorts", []):
            idx = int(sf["expr"].get("selection", {})
                      .get("directReference", {})
                      .get("structField", {}).get("field", 0))
            direction = sf.get("direction",
                               "SORT_DIRECTION_ASC_NULLS_LAST")
            order = "descending" if "DESC" in direction else "ascending"
            keys.append((fields[idx], order))
        return Declaration("order_by", OrderByNodeOptions(keys), [inp])
    if "fetch" in rel:
        f = rel["fetch"]
        inp = _rel(f["input"], ctx)
        return Declaration("fetch", FetchNodeOptions(
            int(f.get("offset", 0)), int(f.get("count", 0))), [inp])
    if "join" in rel:
        j = rel["join"]
        left = _rel(j["left"], ctx)
        right = _rel(j["right"], ctx)
        lf = _rel_fields(j["left"], ctx)
        rf = _rel_fields(j["right"], ctx)
        jt = {"JOIN_TYPE_INNER": "inner", "JOIN_TYPE_LEFT": "left outer",
              "JOIN_TYPE_RIGHT": "right outer",
              "JOIN_TYPE_OUTER": "full outer",
              "JOIN_TYPE_LEFT_SEMI": "left semi",
              "JOIN_TYPE_LEFT_ANTI": "left anti"}[
            j.get("type", "JOIN_TYPE_INNER")]
        # equality condition: equal(field_l, field_r)
        cond = j["expression"]["scalarFunction"]["arguments"]
        all_fields = lf + rf
        lidx = int(cond[0]["value"]["selection"]["directReference"]
                   ["structField"].get("field", 0))
        ridx = int(cond[1]["value"]["selection"]["directReference"]
                   ["structField"].get("field", 0))
        lkey, rkey = all_fields[lidx], all_fields[ridx]
        return Declaration("hashjoin", HashJoinNodeOptions(
            jt, [lkey], [rkey]), [left, right])
    if "cross" in rel:
        c = rel["cross"]
        from ..acero.options import ExecNodeOptions
        return Declaration("cross_join", ExecNodeOptions(),
                           [_rel(c["left"], ctx), _rel(c["right"], ctx)])
    if "set" in rel:
        s = rel["set"]
        inputs = [_rel(r, ctx) for r in s["inputs"]]
        op = s.get("op", "SET_OP_UNION_ALL")
        if isinstance(op, int):
            op = {5: "SET_OP_UNION_DISTINCT", 6: "SET_OP_UNION_ALL"}.get(
                op, op)
        union = Declaration("union", None, inputs)
        if op == "SET_OP_UNION_ALL" or op == 6:
            return union
        if op == "SET_OP_UNION_DISTINCT" or op == 5:
            names = _rel_fields(s["inputs"][0], ctx)
            return Declaration("aggregate",
                               AggregateNodeOptions([], keys=names),
                               [union])
        raise NotImplementedError(f"substrait set op {op!r}")
    raise NotImplementedError(f"substrait rel {sorted(rel)}")


def substrait_to_declaration(plan, named_tables: Optional[Dict] = None
                             ) -> Declaration:
    """Substrait plan (binary protobuf / JSON string / dict / bytes)
    -> Declaration. Binary wire-format plans (the ecosystem's native
    encoding, ``serde.cc`` DeserializePlan) decode through
    engine/substrait_pb.py into the same JSON form."""
    if isinstance(plan, memoryview):
        plan = bytes(plan)
    if isinstance(plan, (bytes, bytearray)):
        if plan.lstrip()[:1] == b"{":
            plan = plan.decode()
        else:
            from .substrait_pb import decode_plan
            plan = decode_plan(bytes(plan))
    if isinstance(plan, str):
        plan = json.loads(plan)
    ctx = _Ctx(plan, named_tables)
    rels = plan.get("relations", [])
    if not rels:
        raise ValueError("substrait plan has no relations")
    root = rels[0].get("root", rels[0].get("rel"))
    rel = root.get("input", root) if "input" in root else root
    decl = _rel(rel, ctx)
    names = root.get("names")
    if names:
        fields = _rel_fields(rel, ctx)
        decl = Declaration("project", ProjectNodeOptions(
            [field_ref(f) for f in fields], list(names)), [decl])
    return decl


def run_query(plan, named_tables: Optional[Dict] = None):
    """DeserializePlan + execute -> Table (pyarrow.substrait.run_query
    analog)."""
    return substrait_to_declaration(plan, named_tables).to_table()
