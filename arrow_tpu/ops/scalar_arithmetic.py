"""Scalar arithmetic kernels (elementwise, VPU-shaped).

Reference: ``cpp/src/arrow/compute/kernels/scalar_arithmetic.cc`` and
``scalar_math.cc``. Unchecked variants wrap like C on integer overflow
(matching Arrow's non-``_checked`` kernels). Data-dependent errors (e.g.
integer divide-by-zero in the ``_checked`` variants) cannot abort inside a
TPU program; the checked variants compute a deferred error flag via
``arrow_tpu.utils.errors`` instead (checked at host materialization).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import datatype as dt
from ..compute.registry import Kind, NullHandling, register_function
from .kernel_utils import output_like, promote_args, values_of

__all__ = []


def _binary_arith(name, op, force_float=False, doc=""):
    @register_function(name, Kind.SCALAR, 2, doc=doc)
    def _fn(args, options, _op=op, _ff=force_float):
        vals, out_t = promote_args(args)
        if _ff and not out_t.is_floating:
            out_t = dt.float64
            vals = [v.astype(jnp.float64) for v in vals]
        out = _op(vals[0], vals[1])
        return output_like(out.astype(out_t.storage_np), out_t, args)
    return _fn


def _unary_arith(name, op, force_float=False, doc=""):
    @register_function(name, Kind.SCALAR, 1, doc=doc)
    def _fn(args, options, _op=op, _ff=force_float):
        (a,) = args
        out_t = a.type
        v = values_of(a)
        if _ff and not out_t.is_floating:
            out_t = dt.float64
            v = v.astype(jnp.float64)
        out = _op(v)
        return output_like(out.astype(out_t.storage_np), out_t, args)
    return _fn


def _unary_float(name, op, doc=""):
    """Unary op whose output is always float (ln, sqrt, trig...).
    Arrow promotes integer inputs to double for these."""
    @register_function(name, Kind.SCALAR, 1, doc=doc)
    def _fn(args, options, _op=op):
        (a,) = args
        out_t = a.type if a.type.is_floating else dt.float64
        v = values_of(a, out_t)
        return output_like(_op(v), out_t, args)
    return _fn


def _int_divide(a, b):
    # C-style truncated integer division (Arrow divide on ints truncates
    # toward zero); jnp // floors, so fix up.
    q = jnp.where(b == 0, jnp.zeros_like(a), a) // jnp.where(b == 0, 1, b)
    r = a - q * jnp.where(b == 0, 1, b)
    neg = (r != 0) & ((a < 0) != (b < 0))
    return jnp.where(neg, q + 1, q)


def _divide(a, b):
    if jnp.issubdtype(a.dtype, jnp.integer):
        return _int_divide(a, b)
    return a / b


_binary_arith("add", jnp.add, doc="a + b (wraps on int overflow)")
_binary_arith("subtract", jnp.subtract, doc="a - b")
_binary_arith("multiply", jnp.multiply, doc="a * b")
_binary_arith("divide", _divide, doc="a / b (int: truncated)")
_binary_arith("power", lambda a, b: jnp.power(a, b), doc="a ** b")
_binary_arith("atan2", jnp.arctan2, force_float=True)
_binary_arith("logb", lambda a, b: jnp.log(a) / jnp.log(b), force_float=True)
class ElementWiseAggregateOptions:
    """``compute/api_scalar.h`` ElementWiseAggregateOptions."""

    def __init__(self, skip_nulls: bool = True):
        self.skip_nulls = skip_nulls


def _minmax_element_wise(name, op):
    @register_function(name, Kind.SCALAR, -1,
                       null_handling=NullHandling.COMPUTED,
                       options_class=ElementWiseAggregateOptions,
                       doc="per-row min/max across args; skip_nulls=True "
                           "(default) ignores null slots — "
                           "scalar_compare.cc:915")
    def _fn(args, options, _op=op):
        from ..compute.scalar import Scalar
        skip = options is None or getattr(options, "skip_nulls", True)
        vals, out_t = promote_args(args)
        masks = []
        for a in args:
            if isinstance(a, Scalar):
                masks.append(None if a.is_valid else False)
            else:
                masks.append(a.validity)
        out = None
        valid = None
        for v, m in zip(vals, masks):
            pm = None if m is None else (
                jnp.zeros_like(v, dtype=jnp.bool_) if m is False else m)
            if out is None:
                out, valid = v, pm
                continue
            if skip:
                # null slots lose to any valid slot
                both = None
                if valid is None and pm is None:
                    out = _op(out, v)
                    continue
                av = jnp.ones_like(v, dtype=jnp.bool_) if valid is None \
                    else valid
                bv = jnp.ones_like(v, dtype=jnp.bool_) if pm is None \
                    else pm
                picked = _op(jnp.where(av, out, v), jnp.where(bv, v, out))
                out = jnp.where(av & ~bv, out,
                                jnp.where(bv & ~av, v, picked))
                valid = av | bv
            else:
                out = _op(out, v)
                if pm is not None:
                    valid = pm if valid is None else (valid & pm)
        return output_like(out.astype(out_t.storage_np), out_t, args,
                           validity=valid)
    return _fn


_minmax_element_wise("max_element_wise", jnp.maximum)
_minmax_element_wise("min_element_wise", jnp.minimum)
_binary_arith("bit_wise_and", jnp.bitwise_and)
_binary_arith("bit_wise_or", jnp.bitwise_or)
_binary_arith("bit_wise_xor", jnp.bitwise_xor)
_binary_arith("shift_left", jnp.left_shift)
_binary_arith("shift_right", jnp.right_shift)


@register_function("mod", Kind.SCALAR, 2,
                   doc="C-style remainder (sign of dividend)")
def _mod(args, options):
    vals, out_t = promote_args(args)
    a, b = vals
    if out_t.is_floating:
        out = jnp.fmod(a, b)
    else:
        q = _int_divide(a, b)
        out = a - q * jnp.where(b == 0, 1, b)
    return output_like(out.astype(out_t.storage_np), out_t, args)


_unary_arith("negate", jnp.negative)
_unary_arith("abs", jnp.abs)


@register_function("sign", Kind.SCALAR, 1,
                   doc="-1/0/1; int8 for integer input, same type for "
                       "float (NaN -> NaN) — scalar_arithmetic.cc Sign")
def _sign(args, options):
    (a,) = args
    v = values_of(a)
    out = jnp.sign(v)
    # Arrow's sign returns int8 for any integer input and the input
    # type for floats (found by the randomized oracle harness, round 4)
    out_t = a.type if a.type.is_floating else dt.int8
    return output_like(out.astype(out_t.storage_np), out_t, args)

_unary_float("sqrt", jnp.sqrt)
_unary_float("exp", jnp.exp)
_unary_float("expm1", jnp.expm1)
_unary_float("ln", jnp.log)
_unary_float("log2", jnp.log2)
_unary_float("log10", jnp.log10)
_unary_float("log1p", jnp.log1p)
_unary_float("sin", jnp.sin)
_unary_float("cos", jnp.cos)
_unary_float("tan", jnp.tan)
_unary_float("asin", jnp.arcsin)
_unary_float("acos", jnp.arccos)
_unary_float("atan", jnp.arctan)
_unary_float("sinh", jnp.sinh)
_unary_float("cosh", jnp.cosh)
_unary_float("tanh", jnp.tanh)
_unary_float("asinh", jnp.arcsinh)
_unary_float("acosh", jnp.arccosh)
_unary_float("atanh", jnp.arctanh)

_unary_arith("bit_wise_not", jnp.bitwise_not)


class RoundOptions:
    def __init__(self, ndigits: int = 0, round_mode: str = "half_to_even"):
        self.ndigits = ndigits
        self.round_mode = round_mode


def _round_values(v, ndigits: int, mode: str):
    scale = 10.0 ** ndigits
    x = v * scale
    if mode == "half_to_even":
        r = jnp.round(x)  # banker's rounding — matches Arrow default
    elif mode == "down":
        r = jnp.floor(x)
    elif mode == "up":
        r = jnp.ceil(x)
    elif mode == "towards_zero":
        r = jnp.trunc(x)
    elif mode == "towards_infinity":
        r = jnp.where(x >= 0, jnp.ceil(x), jnp.floor(x))
    elif mode == "half_down":
        r = jnp.ceil(x - 0.5)
    elif mode == "half_up":
        r = jnp.floor(x + 0.5)
    elif mode == "half_towards_zero":
        r = jnp.where(x >= 0, jnp.ceil(x - 0.5), jnp.floor(x + 0.5))
    elif mode == "half_towards_infinity":
        r = jnp.where(x >= 0, jnp.floor(x + 0.5), jnp.ceil(x - 0.5))
    else:
        raise ValueError(f"unknown round_mode {mode}")
    return r / scale


@register_function("round", Kind.SCALAR, 1, options_class=RoundOptions)
def _round(args, options):
    (a,) = args
    opts = options or RoundOptions()
    if not a.type.is_floating:
        return output_like(values_of(a), a.type, args)
    v = values_of(a)
    return output_like(_round_values(v, opts.ndigits, opts.round_mode),
                       a.type, args)


_unary_arith("floor", lambda v: jnp.floor(v) if jnp.issubdtype(
    v.dtype, jnp.floating) else v)
_unary_arith("ceil", lambda v: jnp.ceil(v) if jnp.issubdtype(
    v.dtype, jnp.floating) else v)
_unary_arith("trunc", lambda v: jnp.trunc(v) if jnp.issubdtype(
    v.dtype, jnp.floating) else v)


class RoundToMultipleOptions:
    def __init__(self, multiple=1.0, round_mode: str = "half_to_even"):
        self.multiple = multiple
        self.round_mode = round_mode


@register_function("round_to_multiple", Kind.SCALAR, 1,
                   options_class=RoundToMultipleOptions)
def _round_to_multiple(args, options):
    (a,) = args
    opts = options or RoundToMultipleOptions()
    v = values_of(a)
    m = jnp.asarray(opts.multiple, jnp.float64)
    scaled = v.astype(jnp.float64) / m
    r = _round_values(scaled.astype(jnp.float64), 0, opts.round_mode)
    out = (r.astype(jnp.float64) * m)
    out_t = a.type if a.type.is_floating else dt.float64
    return output_like(out.astype(out_t.storage_np), out_t, args)


_binary_arith("hypot", jnp.hypot, force_float=True)


@register_function("round_binary", Kind.SCALAR, 2,
                   options_class=RoundOptions)
def _round_binary(args, options):
    """Per-element ndigits round (``scalar_round_arithmetic.cc``
    round_binary): scale = 10^ndigits[i] per row."""
    a, nd = args
    opts = options or RoundOptions()
    mode = opts.round_mode
    if not a.type.is_floating:
        return output_like(values_of(a), a.type, args)
    v = values_of(a)
    from ..core.array import Array as _Arr
    ndv = values_of(nd) if isinstance(nd, _Arr) else nd.as_py()
    scale = jnp.power(10.0, jnp.asarray(ndv, v.dtype))
    x = v * scale
    if mode == "half_to_even":
        r = jnp.round(x)
    elif mode == "down":
        r = jnp.floor(x)
    elif mode == "up":
        r = jnp.ceil(x)
    elif mode == "towards_zero":
        r = jnp.trunc(x)
    else:
        r = jnp.round(x)
    return output_like(r / scale, a.type, args)
