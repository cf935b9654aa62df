"""Set-lookup kernels: is_in / index_in.

Reference: ``cpp/src/arrow/compute/kernels/scalar_set_lookup.cc`` (memo
table over the value set, per-row probe).

TPU-native design: the value set is small and host-provided, so we
normalize it into the same uint32 key-lane encoding the Grouper uses, then
membership for a whole batch is one **sort-free vectorized probe**: the
batch rows and the value-set rows sort together (the value set is tiny so
we simply compare each row against every distinct set row via the
sort-distinct machinery would be overkill) — concretely we reuse
``vector_hash.sort_distinct`` over the concatenation [value_set ++ input]:
any input row whose group representative lies inside the value-set prefix
is a member, and the representative row IS the first matching value-set
index (Arrow's index_in contract: "index of first occurrence in
value_set").

Null semantics (Arrow ``SetLookupOptions``):
  * ``null_matching_behavior="MATCH"`` (default): null input matches null
    in the set.
  * ``"SKIP"`` (= skip_nulls=True): null input never matches; nulls in the
    value set are ignored.
  * ``"EMIT_NULL"``: null input -> null output.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import datatype as dt
from ..core.array import Array, array as make_array
from ..compute.registry import Kind, NullHandling, register_function
from .concat import concat_arrays
from .vector_hash import _key_lanes, sort_distinct

__all__ = ["SetLookupOptions", "is_in_array", "index_in_array"]

_I32MAX = np.int32(2147483647)   # np, not jnp: see distinct._I32MAX note


class SetLookupOptions:
    def __init__(self, value_set=None, skip_nulls: Optional[bool] = None,
                 null_matching_behavior: Optional[str] = None):
        self.value_set = value_set
        if null_matching_behavior is None:
            null_matching_behavior = "SKIP" if skip_nulls else "MATCH"
        self.null_matching_behavior = null_matching_behavior


def _set_probe(a: Array, options: SetLookupOptions):
    """Returns (first_set_index int32 (cap,), matched bool, in_valid bool).

    first_set_index is the index in value_set of each row's first match
    (undefined where ~matched).
    """
    if options is None or options.value_set is None:
        raise ValueError("is_in/index_in require SetLookupOptions.value_set")
    vs = options.value_set
    if not isinstance(vs, Array):
        vs = make_array(vs, type=a.type if not isinstance(
            a.type, dt.DictionaryType) else a.type.value_type)
    if isinstance(a.type, dt.DictionaryType) and not isinstance(
            vs.type, dt.DictionaryType):
        # probe the dictionary values, then map through indices
        didx, dmatched, _ = _set_probe(a.dictionary, options)
        codes = a.values.astype(jnp.int32)
        in_valid = a.validity_or_true() & a.row_mask()
        matched = in_valid & dmatched[codes]
        return didx[codes], matched, in_valid
    if vs.type != a.type:
        if vs.type.is_numeric and a.type.is_numeric:
            from ..compute.registry import call_function
            from .scalar_cast import CastOptions
            vs = call_function("cast", [vs], options=CastOptions(a.type))
        else:
            raise TypeError(
                f"value_set type {vs.type} does not match input {a.type}")

    nset = len(vs)
    skip = options.null_matching_behavior != "MATCH"
    both = concat_arrays([vs, a])
    active = both.row_mask()
    if skip:
        active = active & both.validity_or_true()
    lanes = _key_lanes(both, include_validity=not skip)
    codes, unique_rows, _ = sort_distinct(lanes, active)
    # representative row of each input row's group; in-set iff rep < nset
    cap = codes.shape[0]
    rep = jnp.where(codes >= 0, unique_rows[jnp.clip(codes, 0, cap - 1)],
                    _I32MAX)
    # input rows occupy concat positions [nset, nset+len(a)); the slice is
    # a.capacity wide (positions past len(a) are padding, masked below)
    rep_in = jax.lax.dynamic_slice_in_dim(rep, nset, a.capacity)
    in_valid = a.validity_or_true() & a.row_mask()
    matched = (rep_in < nset)
    if skip:
        matched = matched & in_valid
    return rep_in.astype(jnp.int32), matched, in_valid


def is_in_array(a: Array, options: SetLookupOptions) -> Array:
    _, matched, in_valid = _set_probe(a, options)
    behavior = options.null_matching_behavior
    if behavior == "EMIT_NULL":
        return Array(dt.bool_, matched, in_valid, length=a.length)
    return Array(dt.bool_, matched, None, length=a.length)


def index_in_array(a: Array, options: SetLookupOptions) -> Array:
    idx, matched, in_valid = _set_probe(a, options)
    behavior = options.null_matching_behavior
    validity = matched
    if behavior == "EMIT_NULL":
        validity = matched & in_valid
    return Array(dt.int32, jnp.where(matched, idx, 0), validity,
                 length=a.length)


@register_function("is_in", Kind.SCALAR, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=SetLookupOptions)
def _is_in(args, options):
    return is_in_array(args[0], options)


@register_function("index_in", Kind.SCALAR, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=SetLookupOptions)
def _index_in(args, options):
    return index_in_array(args[0], options)


@register_function("is_in_meta_binary", Kind.SCALAR, 2,
                   null_handling=NullHandling.COMPUTED)
def _is_in_meta_binary(args, options):
    """Binary (2-arg) convenience variant of is_in: the value set rides
    as the second argument instead of options (api_scalar.cc IsIn meta)."""
    return is_in_array(args[0], SetLookupOptions(value_set=args[1],
                                                 skip_nulls=False))


@register_function("index_in_meta_binary", Kind.SCALAR, 2,
                   null_handling=NullHandling.COMPUTED)
def _index_in_meta_binary(args, options):
    return index_in_array(args[0], SetLookupOptions(value_set=args[1],
                                                    skip_nulls=False))
