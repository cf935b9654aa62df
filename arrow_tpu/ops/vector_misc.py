"""Cumulative / pairwise / replace / fill-null vector kernels.

Reference: ``cpp/src/arrow/compute/kernels/vector_cumulative_ops.cc``
(cumulative_sum/prod/min/max/mean with poison-on-null vs skip semantics),
``vector_pairwise.cc`` (pairwise_diff), ``vector_replace.cc``
(replace_with_mask, fill_null_forward/backward).

TPU-native: every one of these is a scan/gather composition —
``lax.cumsum/cummin/cummax`` for the accumulators, a cummax-of-last-valid-
index for fill_null_forward (no serial loops), prefix-sum indexing for
replace_with_mask's sequential replacement consumption.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import datatype as dt
from ..core.array import Array, row_mask
from ..compute.registry import Kind, NullHandling, register_function
from ..compute.scalar import Scalar
from .kernel_utils import jnp_dtype

__all__ = ["CumulativeOptions", "PairwiseOptions"]


class CumulativeOptions:
    def __init__(self, start=None, skip_nulls: bool = False):
        self.start = start
        self.skip_nulls = skip_nulls


class PairwiseOptions:
    def __init__(self, period: int = 1):
        self.period = period


def _cumulative(a: Array, options, op: str) -> Array:
    opts = options or CumulativeOptions()
    cap = a.capacity
    valid = a.present_mask()
    v = a.values
    if op in ("sum", "prod"):
        ident = 0 if op == "sum" else 1
    elif op == "min":
        # Arrow's identities are std::numeric_limits<T>::max()/min() — for
        # floats ::min() is the smallest POSITIVE normal, not -inf
        # (vector_cumulative_ops.cc CumulativeOptionsWrapper); parity quirk
        ident = jnp.finfo(v.dtype).max if jnp.issubdtype(
            v.dtype, jnp.floating) else jnp.iinfo(v.dtype).max
    else:
        ident = jnp.finfo(v.dtype).tiny if jnp.issubdtype(
            v.dtype, jnp.floating) else jnp.iinfo(v.dtype).min
    x = jnp.where(valid, v, jnp.asarray(ident, v.dtype))
    if op == "sum":
        acc = jnp.cumsum(x)
    elif op == "prod":
        acc = jnp.cumprod(x)
    elif op == "min":
        acc = jax.lax.cummin(x)
    else:
        acc = jax.lax.cummax(x)
    if opts.start is not None:
        s = jnp.asarray(opts.start, v.dtype)
        if op == "sum":
            acc = acc + s
        elif op == "prod":
            acc = acc * s
        elif op == "min":
            acc = jnp.minimum(acc, s)
        else:
            acc = jnp.maximum(acc, s)
    if opts.skip_nulls:
        validity = a.validity
    else:
        # first null poisons everything after it
        if a.validity is None:
            validity = None
        else:
            poison_ok = jax.lax.cummin(
                jnp.where(a.row_mask(), a.validity, True).astype(jnp.uint8))
            validity = poison_ok.astype(jnp.bool_)
    return Array(a.type, acc.astype(v.dtype), validity, length=a.length)


def _cumulative_mean(a: Array, options) -> Array:
    opts = options or CumulativeOptions()
    valid = a.present_mask()
    x = jnp.where(valid, a.values.astype(jnp.float64), 0.0)
    sums = jnp.cumsum(x)
    counts = jnp.cumsum(valid.astype(jnp.int64))
    mean = sums / jnp.maximum(counts, 1).astype(jnp.float64)
    if opts.skip_nulls:
        validity = a.validity
    else:
        if a.validity is None:
            validity = None
        else:
            validity = jax.lax.cummin(jnp.where(
                a.row_mask(), a.validity, True).astype(jnp.uint8)).astype(
                jnp.bool_)
    return Array(dt.float64, mean, validity, length=a.length)


for _op in ("sum", "prod", "min", "max"):
    register_function(f"cumulative_{_op}", Kind.VECTOR, 1,
                      null_handling=NullHandling.COMPUTED,
                      options_class=CumulativeOptions)(
        lambda args, options, _o=_op: _cumulative(args[0], options, _o))

register_function("cumulative_mean", Kind.VECTOR, 1,
                  null_handling=NullHandling.COMPUTED,
                  options_class=CumulativeOptions)(
    lambda args, options: _cumulative_mean(args[0], options))


@register_function("pairwise_diff", Kind.VECTOR, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=PairwiseOptions)
def _pairwise_diff(args, options):
    (a,) = args
    period = options.period if options is not None else 1
    cap = a.capacity
    idx = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).reshape((cap,))
    src = idx - jnp.int32(period)
    ln = jnp.asarray(a.length, jnp.int32)
    in_rng = (src >= 0) & (src < ln)
    srcc = jnp.clip(src, 0, cap - 1)
    out = a.values - a.values[srcc]
    valid = a.validity_or_true()
    validity = in_rng & valid & valid[srcc]
    return Array(a.type, out, validity, length=a.length)


@register_function("replace_with_mask", Kind.VECTOR, 3,
                   null_handling=NullHandling.COMPUTED)
def _replace_with_mask(args, options):
    a, mask, repl = args
    cap = a.capacity
    mv = mask.values.astype(jnp.bool_)
    m_ok = mask.validity_or_true()
    use_repl = mv & m_ok & row_mask(cap, a.length)
    # replacement k goes to the k-th mask-true position
    ridx = jnp.cumsum(use_repl.astype(jnp.int32)) - 1
    if isinstance(repl, Scalar):
        rv = jnp.full((cap,), jnp.asarray(repl.storage_value(),
                                          jnp_dtype(a.type)))
        r_ok_at = jnp.full((cap,), repl.is_valid)
    else:
        rcap = repl.capacity
        rc = jnp.clip(ridx, 0, rcap - 1)
        rv = repl.values[rc]
        r_ok_at = repl.validity_or_true()[rc]
    out = jnp.where(use_repl, rv.astype(a.values.dtype), a.values)
    validity = jnp.where(use_repl, r_ok_at,
                         a.validity_or_true()) & m_ok
    return Array(a.type, out, validity, length=a.length)


def _fill_directional(a: Array, forward: bool) -> Array:
    if a.validity is None:
        return a
    cap = a.capacity
    idx = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).reshape((cap,))
    valid = a.validity & a.row_mask()
    if forward:
        last = jax.lax.cummax(jnp.where(valid, idx, jnp.int32(-1)))
        has = last >= 0
        src = jnp.clip(last, 0, cap - 1)
    else:
        ln = jnp.asarray(a.length, jnp.int32)
        nxt = jax.lax.cummin(jnp.where(valid, idx, jnp.int32(cap)),
                             reverse=True)
        has = nxt < ln
        src = jnp.clip(nxt, 0, cap - 1)
    out = jnp.where(has, a.values[src], a.values)
    validity = a.validity | has
    return Array(a.type, out, validity, length=a.length)


@register_function("fill_null_forward", Kind.VECTOR, 1,
                   null_handling=NullHandling.COMPUTED)
def _fill_null_forward(args, options):
    return _fill_directional(args[0], forward=True)


@register_function("fill_null_backward", Kind.VECTOR, 1,
                   null_handling=NullHandling.COMPUTED)
def _fill_null_backward(args, options):
    return _fill_directional(args[0], forward=False)


@register_function("indices_nonzero", Kind.VECTOR, 1,
                   null_handling=NullHandling.COMPUTED)
def _indices_nonzero(args, options):
    from .selection import get_take_indices
    (a,) = args
    nz = (a.values != 0) & a.present_mask()
    mask = Array(dt.bool_, nz, None, length=a.length)
    idx = get_take_indices(mask)
    return Array(dt.uint64, idx.values.astype(jnp.uint64), None,
                 length=idx.length)


class ScatterOptions:
    def __init__(self, max_index: int = -1):
        self.max_index = max_index


@register_function("scatter", Kind.VECTOR, 2,
                   null_handling=NullHandling.COMPUTED,
                   options_class=ScatterOptions)
def _scatter(args, options):
    """vector_swizzle.cc Scatter: out[indices[i]] = values[i]; positions
    not hit are null. Implemented as take through the inverse
    permutation (one unique scatter of int32 + one gather)."""
    from .selection import take_array
    from ..compute.registry import call_function
    values, indices = args
    inv = call_function("inverse_permutation", [indices])
    mi = options.max_index if options else -1
    if mi is not None and mi >= 0:
        if inv.capacity < mi + 1:
            from ..core.interop import pad_capacity
            cap = pad_capacity(mi + 1)
            iv = jnp.zeros((cap,), jnp.int32).at[:inv.capacity].set(
                inv.values.astype(jnp.int32))
            vv = jnp.zeros((cap,), jnp.bool_).at[:inv.capacity].set(
                inv.validity_or_true())
            inv = Array(dt.int32, iv, vv, length=mi + 1)
        else:
            # positions beyond the hit range are already null-marked
            inv = inv.with_length(mi + 1)
    return take_array(values, inv)
