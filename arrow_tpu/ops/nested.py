"""Nested (list) kernels: list_value_length / list_flatten /
list_parent_indices + the grouped `list` aggregator.

Reference: ``cpp/src/arrow/compute/kernels/vector_nested.cc`` and
``hash_aggregate.cc:1852`` (GroupedListImpl).

Engine layout: list<T> Arrays carry row offsets in ``offsets`` and the
element Array in the child slot (see core/interop.py); every kernel here
is offsets arithmetic + one gather, the same row/pool pattern the string
kernels use on bytes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import datatype as dt
from ..core.array import Array, row_mask
from ..compute.registry import Kind, NullHandling, register_function
from .aggregates import GROUPED_AGGREGATORS, GroupedAggregator
from .selection import take_array

__all__ = []


def _list_arg(a) -> Array:
    if not isinstance(a, Array) or not isinstance(a.type, dt.ListType):
        raise TypeError("expected a list array")
    return a


@register_function("list_value_length", Kind.SCALAR, 1,
                   null_handling=NullHandling.INTERSECTION)
def _list_value_length(args, options):
    a = _list_arg(args[0])
    lens = (a.offsets[1:] - a.offsets[:-1]).astype(jnp.int32)
    return Array(dt.int32, lens, None, length=a.length)


@register_function("list_parent_indices", Kind.VECTOR, 1,
                   null_handling=NullHandling.COMPUTED)
def _list_parent_indices(args, options):
    a = _list_arg(args[0])
    child = a.dictionary
    ccap = max(child.capacity, 1)
    from .selection import rows_of_positions
    cidx = jax.lax.broadcasted_iota(jnp.int32, (ccap, 1), 0).reshape(
        (ccap,))
    r = jnp.clip(rows_of_positions(a.offsets, ccap), 0,
                 a.capacity - 1).astype(jnp.int64)
    nchild = a.offsets[jnp.asarray(a.length, jnp.int32)]
    return Array(dt.int64, r, None, length=nchild)


@register_function("list_flatten", Kind.VECTOR, 1,
                   null_handling=NullHandling.COMPUTED)
def _list_flatten(args, options):
    """Concatenate list elements, skipping null lists."""
    a = _list_arg(args[0])
    child = a.dictionary
    cap = a.capacity
    ccap = max(child.capacity, 1)
    ok = a.present_mask()
    lens = jnp.where(ok, a.offsets[1:] - a.offsets[:-1], 0).astype(
        jnp.int32)
    new_off = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(lens, dtype=jnp.int32)])
    total = new_off[-1]
    from .selection import rows_of_positions
    oidx = jax.lax.broadcasted_iota(jnp.int32, (ccap, 1), 0).reshape(
        (ccap,))
    r = jnp.clip(rows_of_positions(new_off, ccap), 0, cap - 1)
    src = jnp.clip(a.offsets[r] + (oidx - new_off[r]), 0, ccap - 1)
    idx = Array(dt.int32, src, None, length=total)
    return take_array(child, idx)


class MakeStructOptions:
    def __init__(self, field_names=None):
        self.field_names = list(field_names) if field_names else None


class StructFieldOptions:
    def __init__(self, indices=None, name=None):
        self.indices = indices
        self.name = name


@register_function("make_struct", Kind.SCALAR, -1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=MakeStructOptions)
def _make_struct(args, options):
    """``scalar_nested.cc`` make_struct: wrap N same-length columns as one
    struct column (never null at the struct level)."""
    arrays = [a for a in args if isinstance(a, Array)]
    if not arrays:
        raise TypeError("make_struct requires at least one array input")
    names = options.field_names if options and options.field_names else \
        [str(i) for i in range(len(args))]
    if len(names) != len(args):
        raise ValueError("field_names length != number of inputs")
    cap = arrays[0].capacity
    length = arrays[0].length
    children = []
    for a in args:
        if not isinstance(a, Array):
            from ..core.array import full
            a = full(cap, a.as_py() if hasattr(a, "as_py") else a,
                     a.type, capacity=cap).with_length(length)
        children.append(a)
    t = dt.struct([(n, c.type) for n, c in zip(names, children)])
    return Array(t, jnp.zeros((cap,), jnp.uint8), None, length=length,
                 children=children)


@register_function("struct_field", Kind.SCALAR, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=StructFieldOptions)
def _struct_field(args, options):
    """``scalar_nested.cc`` struct_field: extract one child, merging the
    parent's validity into it (a null struct row has null fields)."""
    a = args[0]
    if not isinstance(a.type, dt.StructType) or a.children is None:
        raise TypeError("struct_field expects a struct array")
    idx = None
    if options is not None and options.indices is not None:
        idx = options.indices[0] if isinstance(
            options.indices, (list, tuple)) else options.indices
    elif options is not None and options.name is not None:
        idx = [n for n, _ in a.type.fields].index(options.name)
    if idx is None:
        raise ValueError("struct_field requires indices or name")
    child = a.children[idx]
    if a.validity is not None:
        v = child.validity_or_true() & a.validity
        child = child.with_validity(v)
    return child


class GroupedList(GroupedAggregator):
    """hash_list (``hash_aggregate.cc:1852``): collect each group's values
    (input order) into a list. Buffers (gid, arrival, value[, valid]) and
    materializes with one lexsort at finalize — output is a list<T> column
    whose child rides the Array child slot."""

    dist_rows = False

    name = "list"
    default_rows = 1 << 16

    def __init__(self, in_type, G, options=None):
        super().__init__(in_type, G, options)
        self.rows = getattr(options, "buffer_rows", None) or \
            self.default_rows

    @property
    def out_type(self):
        return dt.list_(self.in_type)

    def init(self):
        d = jnp.dtype(self.in_type.storage_np)
        if d == jnp.bool_:
            d = jnp.uint8
        return (jnp.full((self.rows,), -1, dtype=jnp.int32),   # gid
                jnp.zeros((self.rows,), dtype=jnp.int64),      # arrival
                jnp.zeros((self.rows,), dtype=d),              # value
                jnp.ones((self.rows,), dtype=jnp.bool_),       # valid
                jnp.int32(0), jnp.int64(0), jnp.int32(0))      # cnt/base/err

    def consume(self, state, values, group_ids):
        bg, ba, bv, bok, cnt, base, err = state
        cap = values.capacity
        in_grp = group_ids >= 0
        gids = jnp.where(in_grp, group_ids, -1)
        arrival = base + jax.lax.broadcasted_iota(
            jnp.int64, (cap, 1), 0).reshape((cap,))
        err = err | jnp.where(cnt + cap > self.rows, 1, 0).astype(jnp.int32)
        start = jnp.minimum(cnt, self.rows - cap)
        v = values.values
        if v.dtype == jnp.bool_:
            v = v.astype(jnp.uint8)
        ok = values.validity if values.validity is not None else \
            jnp.ones((cap,), jnp.bool_)
        bg = jax.lax.dynamic_update_slice(bg, gids.astype(jnp.int32),
                                          (start,))
        ba = jax.lax.dynamic_update_slice(ba, arrival, (start,))
        bv = jax.lax.dynamic_update_slice(bv, v.astype(bv.dtype), (start,))
        bok = jax.lax.dynamic_update_slice(bok, ok, (start,))
        return bg, ba, bv, bok, cnt + cap, base + jnp.int64(cap), err

    def merge(self, state, other, mapping):
        """Compact-concatenate both fixed-capacity buffers: sort the 2R
        union by (inactive, arrival) and keep the first R rows."""
        bg, ba, bv, bok, cnt, base, err = state
        og, oa, ov, ook, ocnt, obase, oerr = other
        valid = og >= 0
        remap = jnp.where(valid, mapping[jnp.clip(
            og, 0, mapping.shape[0] - 1)], -1)
        allg = jnp.concatenate([bg, remap])
        alla = jnp.concatenate([ba, oa + base])
        allv = jnp.concatenate([bv, ov])
        allok = jnp.concatenate([bok, ook])
        inactive = (allg < 0).astype(jnp.int32)
        order = jnp.lexsort((alla, inactive))[:self.rows]
        err = err | oerr | jnp.where(cnt + ocnt > self.rows, 1, 0).astype(
            jnp.int32)
        return (allg[order], alla[order], allv[order], allok[order],
                jnp.minimum(cnt + ocnt, self.rows), base + obase, err)

    def finalize(self, state, num_groups) -> Array:
        bg, ba, bv, bok, cnt, base, err = state
        R = self.rows
        active = bg >= 0
        gkey = jnp.where(active, bg, jnp.int32(2147483647))
        order = jnp.lexsort((ba, gkey))
        sg = gkey[order]
        sv = bv[order]
        sok = bok[order]
        gidx = jax.lax.broadcasted_iota(jnp.int32, (self.G, 1), 0).reshape(
            (self.G,))
        starts = jnp.searchsorted(sg, gidx, side="left").astype(jnp.int32)
        ends = jnp.searchsorted(sg, gidx, side="right").astype(jnp.int32)
        offsets = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                   jnp.cumsum(ends - starts, dtype=
                                       jnp.int32)])
        # child rows laid out contiguously by group: gather from sorted
        ccap = R
        cidx = jax.lax.broadcasted_iota(jnp.int32, (ccap, 1), 0).reshape(
            (ccap,))
        r = jnp.clip(jnp.searchsorted(offsets, cidx, "right").astype(
            jnp.int32) - 1, 0, self.G - 1)
        src = jnp.clip(starts[r] + (cidx - offsets[jnp.clip(r, 0,
                                                            self.G - 1)]),
                       0, R - 1)
        cvals = sv[src]
        cok = sok[src]
        d = jnp.dtype(self.in_type.storage_np)
        if d == jnp.bool_:
            cvals = cvals.astype(jnp.bool_)
        nchild = offsets[jnp.clip(jnp.asarray(num_groups, jnp.int32), 0,
                                  self.G)]
        child = Array(self.in_type, cvals, cok, length=nchild)
        return Array(self.out_type, jnp.zeros((0,), jnp.uint8), None,
                     offsets=offsets, dictionary=child, length=num_groups)


GROUPED_AGGREGATORS["list"] = GroupedList


class ListSliceOptions:
    def __init__(self, start: int = 0, stop=None, step: int = 1,
                 return_fixed_size_list=None):
        self.start = start
        self.stop = stop
        self.step = step


@register_function("list_element", Kind.SCALAR, 2,
                   null_handling=NullHandling.COMPUTED)
def _list_element(args, options):
    """scalar_nested.cc list_element: per-row child element at index i
    (null when out of range or list null)."""
    a = _list_arg(args[0])
    idx_arg = args[1]
    child = a.dictionary
    ccap = max(child.capacity, 1)
    lens = (a.offsets[1:] - a.offsets[:-1]).astype(jnp.int32)
    if isinstance(idx_arg, Array):
        i = idx_arg.values.astype(jnp.int32)
    else:
        i = jnp.full((a.capacity,), int(idx_arg.as_py()), jnp.int32)
    neg = i < 0
    eff = jnp.where(neg, lens + i, i)
    ok = a.present_mask() & (eff >= 0) & (eff < lens)
    src = jnp.clip(a.offsets[:-1] + eff, 0, ccap - 1)
    out = take_array(child, Array(dt.int32, jnp.where(ok, src, 0), None,
                                  length=a.length))
    v = out.validity_or_true() & ok
    return out.with_validity(v)


@register_function("list_slice", Kind.SCALAR, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=ListSliceOptions)
def _list_slice(args, options):
    """scalar_nested.cc list_slice: per-row [start, stop) child window
    (stride ``step``) as a new list column."""
    a = _list_arg(args[0])
    if options is None:
        raise ValueError("list_slice requires options")
    step = int(options.step)
    if step < 1:
        raise ValueError("list_slice step must be >= 1")
    child = a.dictionary
    ccap = max(child.capacity, 1)
    cap = a.capacity
    lens = (a.offsets[1:] - a.offsets[:-1]).astype(jnp.int32)
    start = jnp.clip(jnp.int32(options.start), 0, lens)
    stop = lens if options.stop is None else jnp.clip(
        jnp.int32(options.stop), 0, lens)
    span = jnp.maximum(stop - start, 0)
    new_lens = (span + (step - 1)) // step    # ceil(span / step)
    ok = a.present_mask()
    new_lens = jnp.where(ok, new_lens, 0)
    new_off = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                               jnp.cumsum(new_lens, dtype=jnp.int32)])
    from .selection import rows_of_positions
    cidx = jax.lax.broadcasted_iota(jnp.int32, (ccap, 1), 0).reshape(
        (ccap,))
    r = jnp.clip(rows_of_positions(new_off, ccap), 0, cap - 1)
    src = jnp.clip(a.offsets[r] + start[r] + (cidx - new_off[r]) * step,
                   0, ccap - 1)
    total = new_off[-1]
    new_child = take_array(child, Array(dt.int32, src, None, length=total))
    return Array(a.type, jnp.zeros((0,), jnp.uint8), a.validity,
                 offsets=new_off, dictionary=new_child, length=a.length)


# ---- map_lookup ----------------------------------------------------------------

class MapLookupOptions:
    def __init__(self, query_key=None, occurrence: str = "first"):
        assert occurrence in ("first", "last", "all")
        self.query_key = query_key
        self.occurrence = occurrence


@register_function("map_lookup", Kind.SCALAR, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=MapLookupOptions)
def _map_lookup(args, options):
    """scalar_nested.cc MapLookupFunctor (:734): per-map-row value(s)
    whose entry key equals ``query_key``. first/last emit the item type,
    all emits list<item>; no match (or null map) emits null — never an
    empty list (matches the oracle)."""
    from ..compute.registry import call_function
    from .selection import filter_array, rows_of_positions
    a = args[0]
    if not isinstance(a.type, dt.MapType):
        raise TypeError("map_lookup expects a map array")
    if options is None or options.query_key is None:
        raise ValueError("map_lookup: query_key can't be empty or null")
    entries = a.dictionary
    keys, items = entries.children
    ccap = max(keys.capacity, 1)
    qk = options.query_key
    if hasattr(qk, "as_py"):            # pyarrow scalar -> python value
        qk = qk.as_py()
    eq = call_function("equal", [keys, qk])
    hit = eq.values.astype(jnp.bool_) & eq.validity_or_true()
    # bound child rows to their owning map row
    r = jnp.clip(rows_of_positions(a.offsets, ccap), 0, a.capacity - 1)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (ccap, 1), 0).reshape((ccap,))
    in_child = cidx < a.offsets[a.capacity]
    hit = hit & in_child
    present = a.present_mask()

    if options.occurrence == "all":
        lens = jnp.zeros((a.capacity,), jnp.int32).at[
            jnp.where(in_child, r, a.capacity)].add(
            hit.astype(jnp.int32), mode="drop")
        new_off = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                   jnp.cumsum(lens, dtype=jnp.int32)])
        picked = filter_array(items, Array(dt.bool_, hit, None,
                                           length=a.offsets[a.capacity]))
        validity = present & (lens > 0)
        return Array(dt.ListType(a.type.item_type),
                     jnp.zeros((0,), jnp.uint8), validity,
                     offsets=new_off, dictionary=picked, length=a.length)

    reduce_at = jnp.where(hit, r, a.capacity)
    if options.occurrence == "first":
        pos = jnp.full((a.capacity,), ccap, jnp.int32).at[reduce_at].min(
            cidx, mode="drop")
        found = pos < ccap
    else:
        pos = jnp.full((a.capacity,), -1, jnp.int32).at[reduce_at].max(
            cidx, mode="drop")
        found = pos >= 0
    src = jnp.where(found, pos, 0)
    out = take_array(items, Array(dt.int32, src, None, length=a.length))
    return out.with_validity(out.validity_or_true() & found & present)
