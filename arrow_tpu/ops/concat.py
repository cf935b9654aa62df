"""Batch concatenation (pipeline-breaker accumulation).

Used by order_by/aggregate/join build sides to fuse a stream of batches
into one device batch. Sequential dynamic_update_slice writes: batch i+1's
region overwrites batch i's trailing padding, so only the final tail is
padding. Jit-safe with traced lengths.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from ..core import datatype as dt
from ..core.array import Array
from ..core.batch import Batch

__all__ = ["concat_batches", "concat_arrays"]


def _write_values(dst: jax.Array, src: jax.Array, offset) -> jax.Array:
    start = (jnp.asarray(offset, dtype=jnp.int32),) + (0,) * (src.ndim - 1)
    return jax.lax.dynamic_update_slice(dst, src, start)


def concat_arrays(arrays: Sequence[Array], total_capacity: int = None
                  ) -> Array:
    assert arrays, "concat of zero arrays"
    t = arrays[0].type
    any_valid = any(a.validity is not None for a in arrays)

    if t.is_varlen:
        cap = total_capacity or sum(a.capacity for a in arrays)
        bcap = sum(a.values.shape[0] for a in arrays)
        out_off = jnp.zeros((cap + 1,), dtype=jnp.int32)
        out_bytes = jnp.zeros((bcap,), dtype=jnp.uint8)
        out_valid = jnp.zeros((cap,), dtype=jnp.bool_) if any_valid else None
        row_off = jnp.int32(0)
        byte_off = jnp.int32(0)
        for a in arrays:
            n = jnp.asarray(a.length, dtype=jnp.int32)
            nbytes = a.offsets[n]
            # rebased offsets for this chunk (padding rows get end offset)
            reb = jnp.minimum(a.offsets, nbytes) + byte_off
            out_off = _write_values(out_off, reb, row_off)
            out_bytes = _write_values(out_bytes, a.values, byte_off)
            if any_valid:
                out_valid = _write_values(
                    out_valid, a.validity if a.validity is not None else
                    jnp.ones((a.capacity,), jnp.bool_), row_off)
            row_off = row_off + n
            byte_off = byte_off + nbytes
        # normalize trailing offsets to the total byte length
        idx = jax.lax.broadcasted_iota(jnp.int32, (cap + 1, 1), 0).reshape(
            (cap + 1,))
        out_off = jnp.where(idx > row_off, byte_off, out_off)
        return Array(t, out_bytes, out_valid, offsets=out_off,
                     length=row_off)

    cap = total_capacity or sum(a.capacity for a in arrays)
    out_vals = jnp.zeros((cap,) + arrays[0].values.shape[1:],
                         dtype=arrays[0].values.dtype)
    out_valid = jnp.zeros((cap,), dtype=jnp.bool_) if any_valid else None
    off = jnp.int32(0)
    for a in arrays:
        out_vals = _write_values(out_vals, a.values, off)
        if any_valid:
            out_valid = _write_values(
                out_valid, a.validity if a.validity is not None else
                jnp.ones((a.capacity,), jnp.bool_), off)
        off = off + jnp.asarray(a.length, dtype=jnp.int32)
    dictionary = arrays[0].dictionary
    if isinstance(t, dt.DictionaryType):
        # batches must share a dictionary (ingest unifies via
        # combine_chunks); cross-source dictionary unification is future
        # work. Placeholder batches (empty carry in the streaming merge)
        # hold a 0-capacity dictionary — take the first REAL one.
        import numpy as _np
        for a in arrays:
            d = a.dictionary
            if d is None or d.capacity == 0:
                continue
            if isinstance(d.length, (int, _np.integer)) and d.length == 0:
                continue   # placeholder dict of an empty carry batch
            dictionary = d
            break
    return Array(t, out_vals, out_valid, dictionary=dictionary, length=off)


def concat_batches(batches: List[Batch]) -> Batch:
    assert batches, "concat of zero batches"
    if len(batches) == 1:
        return batches[0]
    schema = batches[0].schema
    cap = sum(b.capacity for b in batches)
    arrays = []
    for i in range(len(schema)):
        arrays.append(concat_arrays(
            [b.column(i) for b in batches], total_capacity=cap))
    return Batch(schema, arrays, arrays[0].length if arrays else 0)
