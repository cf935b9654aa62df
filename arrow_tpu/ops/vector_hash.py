"""Vector hash kernels: unique / value_counts / dictionary_encode.

Reference: ``cpp/src/arrow/compute/kernels/vector_hash.cc`` (UniqueAction
:65, ValueCountsAction :101, DictEncodeAction :173 over ``MemoTable`` from
``util/hashing.h``) — per-row memo-table inserts on the CPU.

TPU-native redesign: the memo table does not translate (serial per-row
inserts); instead distinct-detection is **sort-based** and fully
vectorized, with no capacity cap on the number of distinct values:

  1. rows are normalized to uint32 key lanes (raw-bit equality — same
     lane encoding the Grouper uses; null gets a validity lane),
  2. one multi-key stable sort over (lanes, row_id) groups equal keys into
     runs with the earliest row first,
  3. run heads mark distinct values; ranking run-head rows by original row
     order reproduces Arrow's order-of-first-appearance numbering,
  4. codes scatter back through the sort permutation.

Cost: O(n log n) on the sort unit vs the memo table's O(n) — but the sort
is a single fused XLA op at memory bandwidth while serial inserts cannot
vectorize at all; this is the same trade the sort-based filter in
``ops/selection.py`` makes.

Varlen (string/binary) inputs take the same path via the 128-bit
full-content fingerprint + length lane
(``ops/hashing.string_fingerprint_exact``); dictionary-encoded strings key
on their indices (exact).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import datatype as dt
from ..core.array import Array, row_mask
from ..core.batch import Batch
from ..core.schema import Field, Schema
from ..compute.registry import Kind, NullHandling, register_function
from .bits import value_lanes32
from .distinct import sort_distinct
from .hashing import string_fingerprint_exact
from .grouper import group_key_lanes
from .selection import take_array

__all__ = ["unique_array", "value_counts_array",
           "dictionary_encode_array", "sort_distinct"]

_I32MAX = np.int32(2147483647)   # np, not jnp: see distinct._I32MAX note


def _key_lanes(a: Array, include_validity: bool) -> jax.Array:
    """(capacity, L) uint32 lane matrix for equality grouping."""
    if a.type.is_varlen:
        # content lanes: exact byte slots for short strings, 128-bit
        # fingerprint + length for long ones (hashing.py
        # varlen_content_lanes)
        from .hashing import varlen_content_lanes
        lanes = varlen_content_lanes(a)
        if include_validity and a.validity is not None:
            ok = a.validity
            lanes = [ok.astype(jnp.uint32)] + [
                jnp.where(ok, l, 0) for l in lanes]
        return jnp.stack(lanes, axis=1)
    if include_validity:
        return group_key_lanes([a])
    # exclude nulls from keying (caller masks them out via `active`)
    return jnp.stack(value_lanes32(a.values, a.type), axis=1)


def _distinct(a: Array, include_nulls: bool
              ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    active = a.row_mask() if include_nulls else a.present_mask()
    lanes = _key_lanes(a, include_validity=include_nulls)
    return sort_distinct(lanes, active)


def unique_array(a: Array) -> Array:
    """Distinct values in order of first appearance (null included once).

    Parity: ``pa.compute.unique`` (``vector_hash.cc:65`` UniqueAction).
    """
    codes, unique_rows, n = _distinct(a, include_nulls=True)
    idx = Array(dt.int32, jnp.where(unique_rows == _I32MAX, 0, unique_rows),
                length=n)
    return take_array(a, idx)


def value_counts_array(a: Array) -> Batch:
    """Distinct values + counts, order of first appearance.

    Parity: ``pa.compute.value_counts`` (``vector_hash.cc:101``). Arrow
    returns a StructArray<values, counts>; this engine returns a 2-column
    Batch (structs are exposed as batches here).
    """
    codes, unique_rows, n = _distinct(a, include_nulls=True)
    cap = codes.shape[0]
    counts = jnp.zeros((cap,), dtype=jnp.int64).at[
        jnp.where(codes >= 0, codes, cap)].add(1, mode="drop")
    idx = Array(dt.int32, jnp.where(unique_rows == _I32MAX, 0, unique_rows),
                length=n)
    values = take_array(a, idx)
    counts_arr = Array(dt.int64, counts, None, length=n)
    schema = Schema((Field("values", a.type, True),
                     Field("counts", dt.int64, False)))
    return Batch(schema, [values, counts_arr], n)


def dictionary_encode_array(a: Array, index_type: dt.DataType = dt.int32
                            ) -> Array:
    """Dictionary-encode: nulls get a null index (Arrow's default
    NullEncodingBehavior::MASK), the dictionary holds non-null distinct
    values in first-appearance order.

    Parity: ``pa.compute.dictionary_encode`` (``vector_hash.cc:173``).
    """
    if isinstance(a.type, dt.DictionaryType):
        return a
    codes, unique_rows, n = _distinct(a, include_nulls=False)
    idx = Array(dt.int32, jnp.where(unique_rows == _I32MAX, 0, unique_rows),
                length=n)
    dictionary = take_array(a, idx).with_validity(None)
    validity = a.present_mask()
    out_t = dt.dictionary(index_type, a.type)
    out_codes = jnp.maximum(codes, 0).astype(
        jnp.dtype(index_type.storage_np))
    return Array(out_t, out_codes, validity,
                 dictionary=dictionary, length=a.length)


# ---- registration ------------------------------------------------------------

@register_function("unique", Kind.VECTOR, 1,
                   null_handling=NullHandling.COMPUTED)
def _unique(args, options):
    return unique_array(args[0])


@register_function("value_counts", Kind.VECTOR, 1,
                   null_handling=NullHandling.COMPUTED)
def _value_counts(args, options):
    return value_counts_array(args[0])


@register_function("dictionary_encode", Kind.VECTOR, 1,
                   null_handling=NullHandling.COMPUTED)
def _dictionary_encode(args, options):
    return dictionary_encode_array(args[0])


@register_function("dictionary_decode", Kind.VECTOR, 1,
                   null_handling=NullHandling.COMPUTED)
def _dictionary_decode(args, options):
    from .scalar_cast import dictionary_decode
    return dictionary_decode(args[0])
