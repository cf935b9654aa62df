"""Run-end encode/decode + random kernels.

Reference: ``vector_run_end_encode.cc`` / ``vector_run_end_decode.cc``
(RunEndEncoded layout), ``scalar_random.cc``.

TPU-native: run boundaries come from one shifted-compare over the value
lanes; the run list materializes through the same sort-free compaction the
filter kernel uses; decode is a ``searchsorted`` gather. ``random`` uses
the jax threefry PRNG (the reference uses pcg64 — values differ by
design, both are uniform [0,1))."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import datatype as dt
from ..core.array import Array, row_mask
from ..compute.registry import Kind, NullHandling, register_function
from .selection import get_take_indices, take_array

__all__ = ["RandomOptions", "run_end_encode_array", "run_end_decode_array"]


class RandomOptions:
    def __init__(self, length: int = 0, initializer="system"):
        self.length = length
        self.initializer = initializer


def run_end_encode_array(a: Array,
                         run_end_type: dt.DataType = dt.int32) -> Array:
    """Collapse equal-value runs. Output Array<run_end_encoded>: values =
    run values, offsets[1:] = run ends, validity = run validity."""
    if a.type.is_varlen or a.type.is_nested:
        raise NotImplementedError("run_end_encode on nested/varlen")
    cap = a.capacity
    v = a.values
    valid = a.validity_or_true()
    in_rng = a.row_mask()
    same_val = v[1:] == v[:-1]
    same_ok = valid[1:] == valid[:-1]
    # a row ENDS a run if the next row differs (value or validity) or is
    # out of range
    ln = jnp.asarray(a.length, jnp.int32)
    idx = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).reshape((cap,))
    next_differs = jnp.concatenate(
        [~(same_val & same_ok), jnp.ones((1,), jnp.bool_)])
    is_end = in_rng & (next_differs | (idx == ln - 1))
    ends_mask = Array(dt.bool_, is_end, None, length=a.length)
    end_idx = get_take_indices(ends_mask)        # (cap,) int32, dyn length
    nruns = end_idx.length
    run_ends = end_idx.values + 1
    run_vals = v[end_idx.values]
    run_valid = valid[end_idx.values] if a.validity is not None else None
    nmask = row_mask(cap, nruns)
    offsets = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.where(nmask, run_ends, ln).astype(jnp.int32)])
    out_t = dt.run_end_encoded(run_end_type, a.type)
    return Array(out_t, run_vals, run_valid, offsets=offsets, length=nruns)


def run_end_decode_array(ree: Array, out_capacity=None) -> Array:
    """Expand runs back to rows. ``out_capacity`` is the static decoded
    capacity (XLA needs static shapes); when omitted, a host sync reads
    the total row count — fine outside jit, callers inside jit must pass
    it (the same capacity+length discipline as everywhere else)."""
    assert isinstance(ree.type, dt.RunEndEncodedType)
    run_ends = ree.offsets[1:]
    nrows = run_ends[jnp.maximum(jnp.asarray(ree.length, jnp.int32) - 1, 0)]
    nrows = jnp.where(jnp.asarray(ree.length, jnp.int32) > 0, nrows, 0)
    out_cap = out_capacity
    if out_cap is None:
        import numpy as np
        out_cap = max(int(np.asarray(jax.device_get(nrows))), 1)
    idx = jax.lax.broadcasted_iota(jnp.int32, (out_cap, 1), 0).reshape(
        (out_cap,))
    r = jnp.searchsorted(run_ends, idx, side="right").astype(jnp.int32)
    r = jnp.clip(r, 0, ree.capacity - 1)
    vals = ree.values[r]
    validity = ree.validity[r] if ree.validity is not None else None
    return Array(ree.type.value_type, vals, validity, length=nrows)


@register_function("run_end_encode", Kind.VECTOR, 1,
                   null_handling=NullHandling.COMPUTED)
def _run_end_encode(args, options):
    return run_end_encode_array(args[0])


@register_function("run_end_decode", Kind.VECTOR, 1,
                   null_handling=NullHandling.COMPUTED)
def _run_end_decode(args, options):
    return run_end_decode_array(args[0])


@register_function("random", Kind.VECTOR, 0,
                   null_handling=NullHandling.OUTPUT_NOT_NULL,
                   options_class=RandomOptions)
def _random(args, options):
    if options is None or options.length <= 0:
        raise ValueError("random requires RandomOptions(length=...)")
    init = options.initializer
    if init == "system":
        import os
        seed = int.from_bytes(os.urandom(4), "little")
    else:
        seed = int(init)
    key = jax.random.PRNGKey(seed)
    vals = jax.random.uniform(key, (options.length,), dtype=jnp.float64)
    return Array(dt.float64, vals, None, length=options.length)
