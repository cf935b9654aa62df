"""Comparison + boolean + validity + select kernels.

Reference: ``scalar_compare.cc`` (comparisons, min/max elementwise),
``scalar_boolean.cc`` (Kleene logic), ``scalar_validity.cc``,
``scalar_if_else.cc`` (if_else / case_when / coalesce).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import datatype as dt
from ..core.array import Array
from ..compute.registry import (Kind, NullHandling, register_function)
from ..compute.scalar import Scalar
from .kernel_utils import (capacity_of, length_of, output_like, promote_args,
                           values_of)

__all__ = []


# ---- comparisons ------------------------------------------------------------

def _comparable_values(args):
    """Promote comparison operands. Supports numeric, bool, temporal and
    dictionary-decoded inputs."""
    types = [a.type for a in args]
    if all(isinstance(t, dt.BoolType) for t in types):
        return [values_of(a) for a in args]
    if all(t.is_numeric for t in types):
        vals, _ = promote_args(args)
        return vals
    if all(t.is_temporal for t in types) and len(set(types)) == 1:
        return [values_of(a) for a in args]
    if all(isinstance(t, dt.DecimalType) for t in types) and \
            len({(t.precision, t.scale) for t in types}) == 1:
        if types[0].wide:
            # two-limb: map to comparable (hi, lo) handled by _cmp_wide
            return None
        # same (precision, scale): scaled int64 storage compares directly
        return [values_of(a) for a in args]
    if all(isinstance(t, dt.DictionaryType) for t in types):
        raise NotImplementedError(
            "compare on dictionary: decode first (cast)")
    raise TypeError(f"cannot compare {types}")


def _is_stringy(a):
    t = a.type
    if isinstance(t, dt.DictionaryType):
        t = t.value_type
    return t.is_varlen


def _cmp_wide(name, va, vb):
    """Lexicographic (hi signed, lo unsigned) comparison of two-limb
    (cap, 2) [lo, hi] decimal storage (util/decimal.h int128 order)."""
    ha, la = va[:, 1], va[:, 0].astype(jnp.uint64)
    hb, lb = vb[:, 1], vb[:, 0].astype(jnp.uint64)
    eq = (ha == hb) & (la == lb)
    lt = (ha < hb) | ((ha == hb) & (la < lb))
    return {"equal": eq, "not_equal": ~eq, "less": lt,
            "less_equal": lt | eq, "greater": ~(lt | eq),
            "greater_equal": ~lt}[name]


def _compare(name, op):
    @register_function(name, Kind.SCALAR, 2)
    def _fn(args, options, _op=op, _name=name):
        if any(_is_stringy(a) for a in args):
            # exact lexicographic byte comparison (ops/strings.py)
            from .strings import compare_varlen
            return output_like(compare_varlen(_name, args[0], args[1]),
                               dt.bool_, args)
        va_vb = _comparable_values(args)
        if va_vb is None:           # wide (two-limb) decimals
            return output_like(
                _cmp_wide(_name, values_of(args[0]), values_of(args[1])),
                dt.bool_, args)
        va, vb = va_vb
        return output_like(_op(va, vb), dt.bool_, args)
    return _fn


_compare("equal", lambda a, b: a == b)
_compare("not_equal", lambda a, b: a != b)
_compare("less", lambda a, b: a < b)
_compare("less_equal", lambda a, b: a <= b)
_compare("greater", lambda a, b: a > b)
_compare("greater_equal", lambda a, b: a >= b)


# ---- boolean ---------------------------------------------------------------

def _bool_vals(a, cap):
    v = values_of(a)
    if v.ndim == 0:
        v = jnp.full((cap,), v, dtype=jnp.bool_)
    return v.astype(jnp.bool_)


def _valid_mask(a, cap):
    if isinstance(a, Scalar):
        return jnp.full((cap,), a.is_valid, dtype=jnp.bool_)
    return a.validity if a.validity is not None else \
        jnp.ones((cap,), dtype=jnp.bool_)


@register_function("and", Kind.SCALAR, 2)
def _and(args, options):
    cap = capacity_of(args)
    return output_like(_bool_vals(args[0], cap) & _bool_vals(args[1], cap),
                       dt.bool_, args)


@register_function("or", Kind.SCALAR, 2)
def _or(args, options):
    cap = capacity_of(args)
    return output_like(_bool_vals(args[0], cap) | _bool_vals(args[1], cap),
                       dt.bool_, args)


@register_function("xor", Kind.SCALAR, 2)
def _xor(args, options):
    cap = capacity_of(args)
    return output_like(_bool_vals(args[0], cap) ^ _bool_vals(args[1], cap),
                       dt.bool_, args)


@register_function("invert", Kind.SCALAR, 1)
def _invert(args, options):
    cap = capacity_of(args)
    return output_like(~_bool_vals(args[0], cap), dt.bool_, args)


@register_function("and_not", Kind.SCALAR, 2)
def _and_not(args, options):
    cap = capacity_of(args)
    return output_like(_bool_vals(args[0], cap) & ~_bool_vals(args[1], cap),
                       dt.bool_, args)


@register_function("and_kleene", Kind.SCALAR, 2,
                   null_handling=NullHandling.COMPUTED)
def _and_kleene(args, options):
    cap = capacity_of(args)
    av, bv = _bool_vals(args[0], cap), _bool_vals(args[1], cap)
    a_ok, b_ok = _valid_mask(args[0], cap), _valid_mask(args[1], cap)
    # false dominates null; null otherwise unless both valid
    values = ((~a_ok) | av) & ((~b_ok) | bv)
    validity = (a_ok & ~av) | (b_ok & ~bv) | (a_ok & b_ok)
    return Array(dt.bool_, values, validity, length=length_of(args))


@register_function("or_kleene", Kind.SCALAR, 2,
                   null_handling=NullHandling.COMPUTED)
def _or_kleene(args, options):
    cap = capacity_of(args)
    av, bv = _bool_vals(args[0], cap), _bool_vals(args[1], cap)
    a_ok, b_ok = _valid_mask(args[0], cap), _valid_mask(args[1], cap)
    values = (a_ok & av) | (b_ok & bv)
    validity = (a_ok & av) | (b_ok & bv) | (a_ok & b_ok)
    return Array(dt.bool_, values, validity, length=length_of(args))


@register_function("and_not_kleene", Kind.SCALAR, 2,
                   null_handling=NullHandling.COMPUTED)
def _and_not_kleene(args, options):
    cap = capacity_of(args)
    av, bv = _bool_vals(args[0], cap), _bool_vals(args[1], cap)
    a_ok, b_ok = _valid_mask(args[0], cap), _valid_mask(args[1], cap)
    nbv = ~bv
    values = ((~a_ok) | av) & ((~b_ok) | nbv)
    validity = (a_ok & ~av) | (b_ok & bv) | (a_ok & b_ok)
    return Array(dt.bool_, values, validity, length=length_of(args))


# ---- validity ----------------------------------------------------------------

@register_function("is_null", Kind.SCALAR, 1,
                   null_handling=NullHandling.OUTPUT_NOT_NULL)
def _is_null(args, options):
    (a,) = args
    cap = capacity_of(args)
    if isinstance(a, Array) and a.validity is not None:
        out = ~a.validity
    else:
        out = jnp.zeros((cap,), dtype=jnp.bool_)
    return output_like(out, dt.bool_, args)


@register_function("is_valid", Kind.SCALAR, 1,
                   null_handling=NullHandling.OUTPUT_NOT_NULL)
def _is_valid(args, options):
    (a,) = args
    cap = capacity_of(args)
    if isinstance(a, Array) and a.validity is not None:
        out = a.validity
    else:
        out = jnp.ones((cap,), dtype=jnp.bool_)
    return output_like(out, dt.bool_, args)


@register_function("is_nan", Kind.SCALAR, 1)
def _is_nan(args, options):
    (a,) = args
    v = values_of(a)
    out = jnp.isnan(v) if a.type.is_floating else jnp.zeros_like(
        v, dtype=jnp.bool_)
    return output_like(out, dt.bool_, args)


@register_function("is_finite", Kind.SCALAR, 1)
def _is_finite(args, options):
    (a,) = args
    v = values_of(a)
    out = jnp.isfinite(v) if a.type.is_floating else jnp.ones_like(
        v, dtype=jnp.bool_)
    return output_like(out, dt.bool_, args)


@register_function("is_inf", Kind.SCALAR, 1)
def _is_inf(args, options):
    (a,) = args
    v = values_of(a)
    out = jnp.isinf(v) if a.type.is_floating else jnp.zeros_like(
        v, dtype=jnp.bool_)
    return output_like(out, dt.bool_, args)


@register_function("true_unless_null", Kind.SCALAR, 1)
def _true_unless_null(args, options):
    cap = capacity_of(args)
    return output_like(jnp.ones((cap,), dtype=jnp.bool_), dt.bool_, args)


# ---- if_else / coalesce -----------------------------------------------------

def _common_type_of(args):
    types = [a.type for a in args]
    if all(t == types[0] for t in types):
        return types[0]
    if all(t.is_numeric for t in types):
        from .kernel_utils import common_numeric_type
        return common_numeric_type(types)
    raise TypeError(f"no common type among {types}")


@register_function("if_else", Kind.SCALAR, 3,
                   null_handling=NullHandling.COMPUTED)
def _if_else(args, options):
    cond, left, right = args
    cap = capacity_of(args)
    out_t = _common_type_of([left, right])
    cv = _bool_vals(cond, cap)
    lv = values_of(left, out_t)
    rv = values_of(right, out_t)
    if lv.ndim == 0:
        lv = jnp.full((cap,), lv)
    if rv.ndim == 0:
        rv = jnp.full((cap,), rv)
    values = jnp.where(cv, lv, rv)
    c_ok = _valid_mask(cond, cap)
    l_ok = _valid_mask(left, cap)
    r_ok = _valid_mask(right, cap)
    validity = c_ok & jnp.where(cv, l_ok, r_ok)
    return Array(out_t, values, validity, length=length_of(args))


@register_function("coalesce", Kind.SCALAR, -1,
                   null_handling=NullHandling.COMPUTED)
def _coalesce(args, options):
    if not args:
        raise ValueError("coalesce needs at least one argument")
    cap = capacity_of(args)
    out_t = _common_type_of(args)
    values = None
    validity = jnp.zeros((cap,), dtype=jnp.bool_)
    for a in args:
        v = values_of(a, out_t)
        if v.ndim == 0:
            v = jnp.full((cap,), v)
        ok = _valid_mask(a, cap)
        if values is None:
            values = v
            validity = ok
        else:
            take_new = (~validity) & ok
            values = jnp.where(take_new, v, values)
            validity = validity | ok
    return Array(out_t, values, validity, length=length_of(args))


class FillNullOptions:
    def __init__(self, value=None):
        self.value = value


@register_function("fill_null", Kind.SCALAR, 2,
                   null_handling=NullHandling.COMPUTED)
def _fill_null(args, options):
    a, fill = args
    cap = capacity_of([a])
    out_t = _common_type_of([a, fill])
    v = values_of(a, out_t)
    fv = values_of(fill, out_t)
    if fv.ndim == 0:
        fv = jnp.full((cap,), fv)
    ok = _valid_mask(a, cap)
    values = jnp.where(ok, v, fv)
    fill_ok = _valid_mask(fill, cap)
    validity = ok | fill_ok
    return Array(out_t, values, validity, length=length_of([a]))


@register_function("case_when", Kind.SCALAR, -1,
                   null_handling=NullHandling.COMPUTED)
def _case_when(args, options):
    """case_when(cond_struct, *cases[, else]) — first-true-wins. The
    condition "struct" is a Batch of bool columns (structs surface as
    batches in this engine); a null condition counts as not-matched
    (``scalar_if_else.cc`` CaseWhen semantics)."""
    from ..core.batch import Batch as _Batch
    conds = args[0]
    if not isinstance(conds, _Batch):
        raise TypeError("case_when: first argument must be a batch/struct "
                        "of bool conditions")
    cases = args[1:]
    ncond = conds.num_columns
    has_else = len(cases) == ncond + 1
    if not (len(cases) == ncond or has_else):
        raise ValueError("case_when: need one case per condition "
                         "(+ optional else)")
    cap = conds.capacity
    out_t = _common_type_of([c for c in cases if isinstance(c, Array)] or
                            list(cases))
    values = jnp.zeros((cap,), dtype=out_t.storage_np)
    validity = jnp.zeros((cap,), dtype=jnp.bool_)
    decided = jnp.zeros((cap,), dtype=jnp.bool_)
    for i in range(ncond):
        c = conds.column(i)
        hit = ~decided & c.validity_or_true() & c.values.astype(jnp.bool_)
        v = values_of(cases[i], out_t)
        if v.ndim == 0:
            v = jnp.full((cap,), v)
        ok = _valid_mask(cases[i], cap)
        values = jnp.where(hit, v, values)
        validity = jnp.where(hit, ok, validity)
        decided = decided | hit
    if has_else:
        v = values_of(cases[-1], out_t)
        if v.ndim == 0:
            v = jnp.full((cap,), v)
        ok = _valid_mask(cases[-1], cap)
        values = jnp.where(decided, values, v)
        validity = jnp.where(decided, validity, ok)
    return Array(out_t, values, validity, length=conds.length)


@register_function("choose", Kind.SCALAR, -1,
                   null_handling=NullHandling.COMPUTED)
def _choose(args, options):
    """choose(indices, *values): per-row select of the i-th value arg."""
    idx = args[0]
    choices = args[1:]
    cap = idx.capacity
    out_t = _common_type_of([c for c in choices if isinstance(c, Array)] or
                            list(choices))
    values = jnp.zeros((cap,), dtype=out_t.storage_np)
    validity = jnp.zeros((cap,), dtype=jnp.bool_)
    iv = idx.values.astype(jnp.int32)
    for i, c in enumerate(choices):
        hit = iv == i
        v = values_of(c, out_t)
        if v.ndim == 0:
            v = jnp.full((cap,), v)
        values = jnp.where(hit, v, values)
        validity = jnp.where(hit, _valid_mask(c, cap), validity)
    validity = validity & _valid_mask(idx, cap)
    return Array(out_t, values, validity, length=idx.length)
