"""Order-statistic & miscellaneous scalar aggregates:
min_max / first / last / first_last / index / count_distinct /
quantile / median / tdigest / approximate_median / mode / skew / kurtosis.

Reference: ``aggregate_basic.cc`` (min_max/first/last/index),
``aggregate_mode.cc``, ``aggregate_quantile.cc`` (exact quantile with 5
interpolation modes), ``aggregate_tdigest.cc`` (t-digest sketches),
``aggregate_var_std.cc`` + ``vector_statistics.cc`` (skew/kurtosis).

TPU-native notes:
  * quantile/median sort once on the device and interpolate — the exact
    algorithm, not the CPU's partial-sort trick (full sorts are cheap on
    the sort unit relative to the transfer cost of anything partial).
  * tdigest/approximate_median are *allowed* to be approximate; this engine
    computes exact quantiles instead (a t-digest with delta -> inf), which
    is a strictly more accurate answer on a single chip. Distributed
    combines use per-shard quantile sketches (parallel/).
  * mode = value_counts + one lexsort by (-count, value).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core import datatype as dt
from ..core.array import Array
from ..core.batch import Batch
from ..core.schema import Field, Schema
from ..compute.registry import Kind, NullHandling, register_function
from ..compute.scalar import Scalar
from .agg_options import ScalarAggregateOptions, CountOptions
from .kernel_utils import jnp_dtype

__all__ = ["ModeOptions", "QuantileOptions", "TDigestOptions",
           "IndexOptions", "SkewOptions"]


class ModeOptions:
    def __init__(self, n: int = 1, skip_nulls: bool = True,
                 min_count: int = 0):
        self.n = n
        self.skip_nulls = skip_nulls
        self.min_count = min_count


class QuantileOptions:
    def __init__(self, q=0.5, interpolation: str = "linear",
                 skip_nulls: bool = True, min_count: int = 0):
        self.q = [q] if np.isscalar(q) else list(q)
        assert interpolation in ("linear", "lower", "higher", "nearest",
                                 "midpoint")
        self.interpolation = interpolation
        self.skip_nulls = skip_nulls
        self.min_count = min_count


class TDigestOptions:
    def __init__(self, q=0.5, delta: int = 100, buffer_size: int = 500,
                 skip_nulls: bool = True, min_count: int = 0):
        self.q = [q] if np.isscalar(q) else list(q)
        self.delta = delta
        self.buffer_size = buffer_size
        self.skip_nulls = skip_nulls
        self.min_count = min_count


class IndexOptions:
    def __init__(self, value=None):
        self.value = value


class SkewOptions:
    def __init__(self, skip_nulls: bool = True, biased: bool = True,
                 min_count: int = 0):
        self.skip_nulls = skip_nulls
        self.biased = biased
        self.min_count = min_count


def _agg_guard(a: Array, options) -> tuple:
    """(n_valid host int, violates-skip_nulls host bool)."""
    present = a.present_mask()
    n_valid = int(jax.device_get(jnp.sum(present)))
    skip = options.skip_nulls if options is not None and hasattr(
        options, "skip_nulls") else True
    has_null = False
    if not skip and a.validity is not None:
        has_null = bool(jax.device_get(jnp.any(a.row_mask() & ~a.validity)))
    min_count = getattr(options, "min_count", 0) if options else 0
    ok = (n_valid >= max(min_count, 1)) and not has_null
    return n_valid, ok


def _py(v, t: dt.DataType):
    out = np.asarray(jax.device_get(v))[()]
    if isinstance(t, dt.BoolType):
        return bool(out)
    return t.storage_np.type(out).item() if t.is_primitive else out


# ---- min_max / first / last / first_last -------------------------------------

def _extremum(a: Array, which: str):
    present = a.present_mask()
    v = a.values
    d = v.dtype if v.dtype != jnp.bool_ else jnp.uint8
    if jnp.issubdtype(d, jnp.floating):
        lo, hi = -jnp.inf, jnp.inf
    else:
        lo, hi = jnp.iinfo(d).min, jnp.iinfo(d).max
    if which == "min":
        return jnp.min(jnp.where(present, v.astype(d), hi))
    return jnp.max(jnp.where(present, v.astype(d), lo))


@register_function("min_max", Kind.SCALAR_AGGREGATE, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=ScalarAggregateOptions)
def _min_max(args, options):
    (a,) = args
    _, ok = _agg_guard(a, options)
    t = a.type
    st = dt.struct([("min", t), ("max", t)])
    if not ok:
        return Scalar({"min": None, "max": None}, st, is_valid=True)
    mn = _py(_extremum(a, "min"), t)
    mx = _py(_extremum(a, "max"), t)
    return Scalar({"min": mn, "max": mx}, st)


def _edge_value(a: Array, first: bool):
    """(value, any_valid) at the first/last valid position."""
    present = a.present_mask()
    cap = a.capacity
    idx = jax.lax.broadcasted_iota(jnp.int64, (cap, 1), 0).reshape((cap,))
    if first:
        pos = jnp.min(jnp.where(present, idx, jnp.int64(cap)))
        pos = jnp.minimum(pos, cap - 1)
    else:
        pos = jnp.max(jnp.where(present, idx, jnp.int64(-1)))
        pos = jnp.maximum(pos, 0)
    return a.values[pos], jnp.any(present)


def _first_last_exec(which):
    def _fn(args, options):
        (a,) = args
        _, ok = _agg_guard(a, options)
        t = a.type
        if which in ("first", "last"):
            v, any_ok = _edge_value(a, which == "first")
            valid = ok and bool(jax.device_get(any_ok))
            return Scalar(_py(v, t) if valid else None, t, is_valid=valid)
        st = dt.struct([("first", t), ("last", t)])
        if not ok:
            return Scalar({"first": None, "last": None}, st, is_valid=True)
        fv, any_ok = _edge_value(a, True)
        lv, _ = _edge_value(a, False)
        if not bool(jax.device_get(any_ok)):
            return Scalar({"first": None, "last": None}, st, is_valid=True)
        return Scalar({"first": _py(fv, t), "last": _py(lv, t)}, st)
    return _fn


for _name in ("first", "last", "first_last"):
    register_function(_name, Kind.SCALAR_AGGREGATE, 1,
                      null_handling=NullHandling.COMPUTED,
                      options_class=ScalarAggregateOptions)(
        _first_last_exec(_name))


@register_function("index", Kind.SCALAR_AGGREGATE, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=IndexOptions)
def _index(args, options):
    (a,) = args
    if options is None or options.value is None:
        raise ValueError("index requires IndexOptions(value=...)")
    present = a.present_mask()
    cap = a.capacity
    target = jnp.asarray(options.value, dtype=a.values.dtype)
    hit = present & (a.values == target)
    idx = jax.lax.broadcasted_iota(jnp.int64, (cap, 1), 0).reshape((cap,))
    pos = jnp.min(jnp.where(hit, idx, jnp.int64(cap)))
    pos = jnp.where(pos == cap, jnp.int64(-1), pos)
    return Scalar(int(jax.device_get(pos)), dt.int64)


@register_function("count_distinct", Kind.SCALAR_AGGREGATE, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=CountOptions)
def _count_distinct(args, options):
    from .vector_hash import _distinct
    (a,) = args
    mode = options.mode if isinstance(options, CountOptions) else "only_valid"
    include_nulls = mode == "all"
    _, _, n = _distinct(a, include_nulls=include_nulls)
    n = int(jax.device_get(n))
    if mode == "only_null":
        raise NotImplementedError("count_distinct mode=only_null")
    return Scalar(n, dt.int64)


# ---- quantile family ----------------------------------------------------------

def _sorted_valid(a: Array):
    """(sorted values float64-ish ascending with invalids at +inf, n_valid)."""
    present = a.present_mask()
    v = a.values
    d = jnp.float64 if not jnp.issubdtype(v.dtype, jnp.floating) else v.dtype
    s = jnp.sort(jnp.where(present, v.astype(d), jnp.inf))
    return s, jnp.sum(present)


def _quantile_values(a: Array, qs: Sequence[float], interpolation: str):
    """Device-side exact quantiles. Returns (values f64 (len(qs),), is_int
    result flag handled by the caller)."""
    s, n = _sorted_valid(a)
    nf = n.astype(jnp.float64)
    out = []
    for q in qs:
        rank = jnp.asarray(q, jnp.float64) * (nf - 1.0)
        lo = jnp.clip(jnp.floor(rank).astype(jnp.int32), 0, a.capacity - 1)
        hi = jnp.clip(jnp.ceil(rank).astype(jnp.int32), 0, a.capacity - 1)
        vlo = s[lo].astype(jnp.float64)
        vhi = s[hi].astype(jnp.float64)
        if interpolation == "linear":
            frac = rank - jnp.floor(rank)
            out.append(vlo + frac * (vhi - vlo))
        elif interpolation == "lower":
            out.append(vlo)
        elif interpolation == "higher":
            out.append(vhi)
        elif interpolation == "midpoint":
            out.append((vlo + vhi) * 0.5)
        else:  # nearest: round-half-to-even (std::nearbyint semantics)
            ridx = jnp.clip(jnp.round(rank).astype(jnp.int32), 0,
                            a.capacity - 1)
            out.append(s[ridx].astype(jnp.float64))
    return jnp.stack(out)


def _quantile_exec(args, options, name="quantile"):
    (a,) = args
    opts = options or QuantileOptions()
    qs = opts.q
    interp = getattr(opts, "interpolation", "linear")
    n_valid, ok = _agg_guard(a, opts)
    ok = ok and n_valid > 0
    vals = _quantile_values(a, qs, interp)
    # lower/higher/nearest preserve the input type; linear/midpoint -> f64
    if interp in ("lower", "higher", "nearest") and name == "quantile":
        out_t = a.type
        vals = vals.astype(jnp_dtype(a.type))
    else:
        out_t = dt.float64
    validity = None if ok else jnp.zeros((len(qs),), dtype=jnp.bool_)
    return Array(out_t, vals, validity, length=len(qs))


register_function("quantile", Kind.SCALAR_AGGREGATE, 1,
                  null_handling=NullHandling.COMPUTED,
                  options_class=QuantileOptions)(_quantile_exec)


@register_function("tdigest", Kind.SCALAR_AGGREGATE, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=TDigestOptions)
def _tdigest(args, options):
    opts = options or TDigestOptions()
    qopts = QuantileOptions(q=opts.q, skip_nulls=opts.skip_nulls,
                            min_count=opts.min_count)
    return _quantile_exec(args, qopts, name="tdigest")


@register_function("approximate_median", Kind.SCALAR_AGGREGATE, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=ScalarAggregateOptions)
def _approx_median(args, options):
    (a,) = args
    opts = options or ScalarAggregateOptions()
    n_valid, ok = _agg_guard(a, opts)
    ok = ok and n_valid > 0
    v = _quantile_values(a, [0.5], "linear")[0]
    return Scalar(float(jax.device_get(v)) if ok else None, dt.float64,
                  is_valid=ok)


@register_function("mode", Kind.SCALAR_AGGREGATE, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=ModeOptions)
def _mode(args, options):
    """Top-n modes, ties broken by smaller value first. Output: a 2-column
    Batch (mode, count) — Arrow's StructArray equivalent here."""
    from .vector_hash import _distinct
    (a,) = args
    opts = options or ModeOptions()
    codes, unique_rows, nuniq = _distinct(a, include_nulls=False)
    cap = codes.shape[0]
    counts = jnp.zeros((cap,), dtype=jnp.int64).at[
        jnp.where(codes >= 0, codes, cap)].add(1, mode="drop")
    # order groups by (count desc, value asc)
    gidx = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).reshape((cap,))
    in_use = gidx < nuniq
    rows = jnp.where(unique_rows == jnp.int32(2147483647), 0, unique_rows)
    gvals = a.values[rows]
    d = gvals.dtype if gvals.dtype != jnp.bool_ else jnp.uint8
    vkey = gvals.astype(d)
    if jnp.issubdtype(d, jnp.floating):
        vkey = jnp.where(jnp.isnan(vkey), jnp.inf, vkey)
    vkey = jnp.where(in_use, vkey, jnp.inf if jnp.issubdtype(
        d, jnp.floating) else jnp.iinfo(d).max)
    order = jnp.lexsort((vkey, jnp.where(in_use, -counts, jnp.int64(1))))
    n_valid, ok = _agg_guard(a, opts)
    n_out = min(opts.n, int(jax.device_get(nuniq))) if ok else 0
    top = order[:max(opts.n, 1)]
    mode_vals = a.values[rows[top]]
    mode_counts = counts[top]
    schema = Schema((Field("mode", a.type, False),
                     Field("count", dt.int64, False)))
    return Batch(schema, [Array(a.type, mode_vals, None, length=n_out),
                          Array(dt.int64, mode_counts, None, length=n_out)],
                 n_out)


# ---- skew / kurtosis ----------------------------------------------------------

def _central_moments(a: Array):
    present = a.present_mask()
    x = jnp.where(present, a.values.astype(jnp.float64), 0.0)
    n = jnp.sum(present).astype(jnp.float64)
    mean = jnp.sum(x) / jnp.maximum(n, 1.0)
    cx = jnp.where(present, a.values.astype(jnp.float64) - mean, 0.0)
    m2 = jnp.sum(cx * cx) / jnp.maximum(n, 1.0)
    m3 = jnp.sum(cx * cx * cx) / jnp.maximum(n, 1.0)
    m4 = jnp.sum(cx ** 4) / jnp.maximum(n, 1.0)
    return n, m2, m3, m4


def _skew_exec(args, options, kurtosis=False):
    (a,) = args
    opts = options or SkewOptions()
    n_valid, ok = _agg_guard(a, opts)
    min_req = 3 if kurtosis else 2
    n, m2, m3, m4 = _central_moments(a)
    if kurtosis:
        r = m4 / jnp.maximum(m2 * m2, 1e-300) - 3.0
        r = jnp.where(m2 > 0, m4 / (m2 * m2) - 3.0, jnp.nan)
    else:
        r = jnp.where(m2 > 0, m3 / jnp.sqrt(m2) ** 3, jnp.nan)
    if not getattr(opts, "biased", True):
        nf = n
        if kurtosis:
            r = ((nf + 1) * r + 6) * (nf - 1) / jnp.maximum(
                (nf - 2) * (nf - 3), 1.0)
        else:
            r = r * jnp.sqrt(nf * (nf - 1)) / jnp.maximum(nf - 2, 1.0)
    valid = ok and n_valid >= (min_req if not getattr(
        opts, "biased", True) else 1)
    return Scalar(float(jax.device_get(r)) if valid else None, dt.float64,
                  is_valid=valid)


register_function("skew", Kind.SCALAR_AGGREGATE, 1,
                  null_handling=NullHandling.COMPUTED,
                  options_class=SkewOptions)(_skew_exec)
register_function(
    "kurtosis", Kind.SCALAR_AGGREGATE, 1,
    null_handling=NullHandling.COMPUTED, options_class=SkewOptions)(
    lambda args, options: _skew_exec(args, options, kurtosis=True))


class WinsorizeOptions:
    def __init__(self, lower_limit: float = 0.0, upper_limit: float = 1.0):
        self.lower_limit = lower_limit
        self.upper_limit = upper_limit


@register_function("winsorize", Kind.VECTOR, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=WinsorizeOptions)
def _winsorize(args, options):
    """vector_statistics.cc Winsorize: clamp to the nearest data values
    at the limit quantiles (interpolation 'higher' below, 'lower'
    above)."""
    (a,) = args
    opts = options or WinsorizeOptions()
    lo = _quantile_values(a, [opts.lower_limit], "higher")[0]
    hi = _quantile_values(a, [opts.upper_limit], "lower")[0]
    v = a.values
    out = jnp.clip(v, lo.astype(v.dtype), hi.astype(v.dtype))
    return Array(a.type, out, a.validity, length=a.length)
