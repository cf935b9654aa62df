"""Checked arithmetic kernels (`*_checked`): raise on data-dependent errors.

Reference: ``cpp/src/arrow/compute/kernels/scalar_arithmetic.cc:339`` — the
checked kernel variants error with ``ArrowInvalid`` on integer overflow,
divide-by-zero, and float domain errors, where the unchecked variants wrap
or produce NaN/inf. Exact messages and edge semantics verified live against
pyarrow 22 (e.g. ``shift_left_checked`` checks only the shift *amount*, not
value overflow; float ``add_checked`` does NOT check overflow).

TPU-native design: each kernel computes its output with wraparound
arithmetic plus a per-row error mask, reduces the mask over in-range valid
rows, and reports one scalar flag through
:mod:`arrow_tpu.utils.errors` — raised immediately in eager mode, deferred
through an ``errors.collect()`` scope inside jitted acero stages.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import datatype as dt
from ..core.array import Array, row_mask
from ..compute.registry import Kind, NullHandling, register_function
from ..compute.scalar import Scalar
from ..utils import errors
from .kernel_utils import length_of, output_like, promote_args, values_of
from .scalar_arithmetic import _divide, _int_divide

__all__ = []

_OVERFLOW = "overflow"
_DIV_ZERO = "divide by zero"
_DOMAIN = "domain error"
_LOG_ZERO = "logarithm of zero"
_LOG_NEG = "logarithm of negative number"
_SQRT_NEG = "square root of negative number"
_NEG_POW = "integers to negative integer powers are not allowed"
_SHIFT_RANGE = "shift amount must be >= 0 and less than precision of type"


def _is_signed(x) -> bool:
    return jnp.issubdtype(x.dtype, jnp.signedinteger)


def _is_int(x) -> bool:
    return jnp.issubdtype(x.dtype, jnp.integer)


def _any_bad(bad, args):
    """Reduce a per-row error mask over in-range, all-valid rows."""
    for a in args:
        if isinstance(a, Scalar) and not a.is_valid:
            return jnp.asarray(False)      # null scalar -> all-null result
    arr = next(a for a in args if isinstance(a, Array))
    m = bad & row_mask(arr.capacity, length_of(args))
    for a in args:
        if isinstance(a, Array) and a.validity is not None:
            m = m & a.validity
    return jnp.any(m)


# ---- integer overflow predicates (wraparound-arithmetic identities) --------

def _ovf_add(a, b, s):
    if _is_signed(a):
        return ((~(a ^ b)) & (a ^ s)) < 0
    return s < a


def _ovf_sub(a, b, d):
    if _is_signed(a):
        return ((a ^ b) & (a ^ d)) < 0
    return b > a


def _ovf_mul(a, b, p):
    bits = a.dtype.itemsize * 8
    if bits < 64:
        wide = jnp.int64 if _is_signed(a) else jnp.uint64
        exact = a.astype(wide) * b.astype(wide)
        info = jnp.iinfo(a.dtype)
        return (exact < info.min) | (exact > info.max)
    if _is_signed(a):
        imin = jnp.iinfo(a.dtype).min
        safe_a = jnp.where((a == 0) | (a == -1), jnp.ones_like(a), a)
        q = _int_divide(p, safe_a)
        return jnp.where(a == 0, False,
                         jnp.where(a == -1, b == imin, q != b))
    safe_a = jnp.where(a == 0, jnp.ones_like(a), a)
    return jnp.where(a == 0, False, p // safe_a != b)


# ---- binary checked arithmetic ---------------------------------------------

def _binary_checked(name, op, ovf):
    @register_function(name, Kind.SCALAR, 2,
                       doc=f"{name[:-8]} raising ArrowInvalid on overflow")
    def _fn(args, options, _op=op, _ovf=ovf):
        vals, out_t = promote_args(args)
        a, b = vals
        out = _op(a, b)
        if out_t.is_integer:
            errors.check(_any_bad(_ovf(a, b, out), args), _OVERFLOW)
        return output_like(out.astype(out_t.storage_np), out_t, args)
    return _fn


_binary_checked("add_checked", jnp.add, _ovf_add)
_binary_checked("subtract_checked", jnp.subtract, _ovf_sub)
_binary_checked("multiply_checked", jnp.multiply, _ovf_mul)


@register_function("divide_checked", Kind.SCALAR, 2)
def _divide_checked(args, options):
    vals, out_t = promote_args(args)
    a, b = vals
    out = _divide(a, b)
    errors.check(_any_bad(b == 0, args), _DIV_ZERO)
    if out_t.is_integer and out_t.signed:
        imin = jnp.iinfo(a.dtype).min
        errors.check(_any_bad((a == imin) & (b == -1), args), _OVERFLOW)
    return output_like(out.astype(out_t.storage_np), out_t, args)


def _shift_checked(name, op):
    @register_function(name, Kind.SCALAR, 2)
    def _fn(args, options, _op=op):
        vals, out_t = promote_args(args)
        a, b = vals
        # Arrow's bound is std::numeric_limits<T>::digits: value bits
        # excluding the sign bit (scalar_arithmetic.cc ShiftLeftChecked)
        digits = a.dtype.itemsize * 8 - (1 if _is_signed(a) else 0)
        bits = jnp.asarray(digits, b.dtype)
        errors.check(_any_bad((b < 0) | (b >= bits), args), _SHIFT_RANGE)
        bc = jnp.clip(b, 0, bits - 1)
        return output_like(_op(a, bc).astype(out_t.storage_np), out_t, args)
    return _fn


_shift_checked("shift_left_checked", jnp.left_shift)
_shift_checked("shift_right_checked", jnp.right_shift)


@register_function("power_checked", Kind.SCALAR, 2)
def _power_checked(args, options):
    vals, out_t = promote_args(args)
    a, b = vals
    if not out_t.is_integer:
        return output_like(jnp.power(a, b), out_t, args)
    errors.check(_any_bad(b < 0, args), _NEG_POW)
    out, ovf = _int_pow_checked(a, jnp.maximum(b, 0))
    errors.check(_any_bad(ovf, args), _OVERFLOW)
    return output_like(out.astype(out_t.storage_np), out_t, args)


def _int_pow_checked(a, e):
    """Exponentiation by squaring with per-multiply overflow detection.

    |base| >= 2 with exponent > 63 always overflows int64, so the live
    squaring loop only needs the low 6 exponent bits; bases in {-1, 0, 1}
    are closed-form for any exponent."""
    big = e > 63
    ec = jnp.where(big, 0, e)
    result = jnp.ones_like(a)
    base = a
    ovf = jnp.zeros(a.shape, jnp.bool_)
    for i in range(6):
        bit = ((ec >> i) & 1) == 1
        nr = result * base
        ovf = ovf | (bit & _ovf_mul(result, base, nr))
        result = jnp.where(bit, nr, result)
        more = (ec >> (i + 1)) > 0
        nb = base * base
        ovf = ovf | (more & _ovf_mul(base, base, nb))
        base = jnp.where(more, nb, base)
    absa = jnp.abs(a)
    small = jnp.where(
        a == 0, jnp.where(e == 0, 1, 0).astype(a.dtype),
        jnp.where((a < 0) & ((e & 1) == 1), -1, 1).astype(a.dtype))
    out = jnp.where(absa <= 1, small, jnp.where(big, 0, result))
    ovf = jnp.where(absa <= 1, False, ovf | big)
    return out.astype(a.dtype), ovf


# ---- unary checked arithmetic ----------------------------------------------

@register_function("negate_checked", Kind.SCALAR, 1)
def _negate_checked(args, options):
    (a,) = args
    if a.type.is_integer and not a.type.signed:
        raise TypeError(
            "Function 'negate_checked' has no kernel matching input types "
            f"({a.type})")
    v = values_of(a)
    if _is_int(v):
        errors.check(_any_bad(v == jnp.iinfo(v.dtype).min, args), _OVERFLOW)
    return output_like(jnp.negative(v), a.type, args)


@register_function("abs_checked", Kind.SCALAR, 1)
def _abs_checked(args, options):
    (a,) = args
    v = values_of(a)
    if _is_int(v) and _is_signed(v):
        errors.check(_any_bad(v == jnp.iinfo(v.dtype).min, args), _OVERFLOW)
    return output_like(jnp.abs(v), a.type, args)


def _unary_float_checked(name, op, bad_fn):
    """Float-domain checked transcendental; ``bad_fn(v)`` yields
    [(mask, message), ...] in raise-priority order."""
    @register_function(name, Kind.SCALAR, 1)
    def _fn(args, options, _op=op, _bad=bad_fn):
        (a,) = args
        out_t = a.type if a.type.is_floating else dt.float64
        v = values_of(a, out_t)
        for mask, msg in _bad(v):
            errors.check(_any_bad(mask, args), msg)
        return output_like(_op(v), out_t, args)
    return _fn


_unary_float_checked("sqrt_checked", jnp.sqrt,
                     lambda v: [(v < 0, _SQRT_NEG)])
for _n, _o in (("ln_checked", jnp.log), ("log2_checked", jnp.log2),
               ("log10_checked", jnp.log10)):
    _unary_float_checked(_n, _o, lambda v: [(v < 0, _LOG_NEG),
                                            (v == 0, _LOG_ZERO)])
_unary_float_checked("log1p_checked", jnp.log1p,
                     lambda v: [(v < -1, _LOG_NEG), (v == -1, _LOG_ZERO)])
for _n, _o in (("sin_checked", jnp.sin), ("cos_checked", jnp.cos),
               ("tan_checked", jnp.tan)):
    _unary_float_checked(_n, _o, lambda v: [(jnp.isinf(v), _DOMAIN)])
for _n, _o in (("asin_checked", jnp.arcsin), ("acos_checked", jnp.arccos)):
    _unary_float_checked(_n, _o, lambda v: [(jnp.abs(v) > 1, _DOMAIN)])
_unary_float_checked("atanh_checked", jnp.arctanh,
                     lambda v: [(jnp.abs(v) >= 1, _DOMAIN)])
_unary_float_checked("acosh_checked", jnp.arccosh,
                     lambda v: [(v < 1, _DOMAIN)])


@register_function("logb_checked", Kind.SCALAR, 2)
def _logb_checked(args, options):
    vals, out_t = promote_args(args)
    if not out_t.is_floating:
        out_t = dt.float64
        vals = [v.astype(jnp.float64) for v in vals]
    x, b = vals
    errors.check(_any_bad((x < 0) | (b < 0), args), _LOG_NEG)
    errors.check(_any_bad((x == 0) | (b == 0), args), _LOG_ZERO)
    return output_like(jnp.log(x) / jnp.log(b), out_t, args)


# ---- checked vector ops (cumulative / pairwise) ----------------------------

def _register_cumulative_checked(op):
    from .vector_misc import CumulativeOptions, _cumulative

    @register_function(f"cumulative_{op}_checked", Kind.VECTOR, 1,
                       null_handling=NullHandling.COMPUTED,
                       options_class=CumulativeOptions)
    def _fn(args, options, _op=op):
        (a,) = args
        out = _cumulative(a, options, _op)
        v = a.values
        if _is_int(v):
            ident = jnp.asarray(0 if _op == "sum" else 1, v.dtype)
            x = jnp.where(a.present_mask(), v, ident)
            acc = out.values
            opts = options or CumulativeOptions()
            start = None if opts.start is None \
                else jnp.asarray(opts.start, v.dtype)
            if _op == "sum":
                base = acc if start is None else acc - start
                prev = base - x            # wraparound-exact inverse step
                bad = _ovf_add(prev, x, base)
                if start is not None:
                    bad = bad | _ovf_add(base, jnp.broadcast_to(
                        start, base.shape), acc)
            else:
                init = jnp.ones((1,), v.dtype) if start is None \
                    else jnp.full((1,), start, v.dtype)
                prev = jnp.concatenate([init, acc[:-1]])
                bad = _ovf_mul(prev, x, acc)
            if out.validity is not None:
                bad = bad & out.validity   # poisoned tail never computed
            errors.check(_any_bad(bad, args), _OVERFLOW)
        return out
    return _fn


_register_cumulative_checked("sum")
_register_cumulative_checked("prod")


from .vector_misc import PairwiseOptions as _PairwiseOptions


@register_function("pairwise_diff_checked", Kind.VECTOR, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=_PairwiseOptions)
def _pairwise_diff_checked(args, options):
    from .vector_misc import _pairwise_diff
    (a,) = args
    out = _pairwise_diff(args, options)
    v = a.values
    if _is_int(v):
        period = options.period if options is not None else 1
        cap = a.capacity
        idx = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).reshape(
            (cap,))
        src = jnp.clip(idx - jnp.int32(period), 0, cap - 1)
        bad = _ovf_sub(v, v[src], out.values)
        if out.validity is not None:
            bad = bad & out.validity
        errors.check(_any_bad(bad, args), _OVERFLOW)
    return out
