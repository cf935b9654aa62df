"""Sort kernels: sort_indices / rank / select_k / partition_nth.

Reference: ``vector_sort.cc:911`` (SortIndicesMetaFunction),
``vector_array_sort.cc`` (single-array sorters), the multi-key
``RadixRecordBatchSorter`` (``vector_sort.cc:391``), null partitioning
(``vector_sort_internal.h:173-233``).

TPU-native design: Arrow's radix sorter relies on key **normalization to a
byte-comparable encoding** — we do the same trick but keep whole words:
every key column becomes one uint64 lane whose unsigned order equals the
column's sort order (sign-flip for ints, the IEEE bit trick for floats,
rank-remap for dictionary columns), plus a null lane for null placement and
a leading padding lane that pushes rows >= length to the very end. The
composite sort is a single multi-operand stable ``lax.sort`` — XLA's TPU
sort is the hardware-tuned replacement for the reference's MSB radix +
stable_sort hybrid.

Semantics matched to Arrow:
  * stable (equal keys keep input order — reference uses std::stable_sort)
  * NaN sorts after all numbers (before nulls when at_end) — NaNs
    canonicalized to one bit pattern
  * null_placement at_start/at_end applies per batch, independent of
    ascending/descending (Arrow SortOptions semantics)
  * dictionary keys sort by decoded value rank (vector_array_sort.cc:179)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp

from ..core import datatype as dt
from ..core.array import Array, row_mask
from .bits import ascending_lanes32
from ..core.batch import Batch
from ..compute.registry import Kind, NullHandling, register_function

__all__ = ["SortKey", "SortOptions", "ArraySortOptions", "SelectKOptions",
           "RankOptions", "PartitionNthOptions", "sort_indices_batch",
           "sort_indices_array", "sortable_lanes", "batch_key_lanes",
           "merge_key_lanes",
           "lex_leq"]


@dataclass(frozen=True)
class SortKey:
    name: str
    order: str = "ascending"  # ascending | descending


class SortOptions:
    def __init__(self, sort_keys: Sequence, null_placement: str = "at_end"):
        self.sort_keys = [k if isinstance(k, SortKey) else SortKey(*k)
                          for k in sort_keys]
        assert null_placement in ("at_start", "at_end")
        self.null_placement = null_placement


class ArraySortOptions:
    def __init__(self, order: str = "ascending",
                 null_placement: str = "at_end"):
        self.order = order
        self.null_placement = null_placement


class SelectKOptions:
    def __init__(self, k: int, sort_keys: Sequence):
        self.k = k
        self.sort_keys = [x if isinstance(x, SortKey) else SortKey(*x)
                          for x in sort_keys]


class RankOptions:
    def __init__(self, sort_keys: Sequence = (), null_placement="at_end",
                 tiebreaker: str = "first"):
        self.sort_keys = [x if isinstance(x, SortKey) else SortKey(*x)
                          for x in sort_keys]
        self.null_placement = null_placement
        assert tiebreaker in ("min", "max", "first", "dense")
        self.tiebreaker = tiebreaker


class PartitionNthOptions:
    def __init__(self, pivot: int, null_placement: str = "at_end"):
        self.pivot = pivot
        self.null_placement = null_placement


# ---- key normalization -----------------------------------------------------

def _varlen_words_default() -> int:
    """u32 prefix words for varlen sort keys (ARROW_TPU_SORT_PREFIX_BYTES,
    default 32 bytes = 8 words). Order is exact for strings up to this
    prefix; nodes host-probe max length and widen per call."""
    import os
    return max(1, int(os.environ.get("ARROW_TPU_SORT_PREFIX_BYTES",
                                     "32")) // 4)


def sortable_lanes(a: Array, varlen_words: Optional[int] = None,
                   cross_batch: bool = False) -> List[jax.Array]:
    """uint32 lanes whose lexicographic unsigned order == the column's
    ascending sort order. Null handling is SEPARATE (null lane).

    64-bit bitcasts don't compile on TPU and f64 is stored double-float
    there, so all normalization goes through ops.bits (platform-aware).

    Varlen (string/binary): big-endian u32 prefix words + a length
    tiebreak lane — EXACT lexicographic order for values up to
    4*varlen_words bytes (callers that host-probe max length get exact
    order always; ``vector_sort.cc`` sorts strings by full comparator).
    Dictionary: rank within this batch's dictionary (1 lane) — or, with
    ``cross_batch=True``, the DECODED value's lanes, comparable across
    batches with different dictionaries (the streaming sorted_merge's
    bound test needs this)."""
    t = a.type
    v = a.values
    if isinstance(t, dt.DictionaryType):
        d = a.dictionary
        idx = jnp.clip(v.astype(jnp.int32), 0, max(d.capacity, 1) - 1)
        if cross_batch:
            dlanes = sortable_lanes(d, varlen_words=varlen_words)
            return [l[idx] for l in dlanes]
        # rank-remap: position of each dictionary value in the sorted
        # dictionary (nulls in the dictionary sort last, but null slots are
        # masked by the indices' validity anyway)
        rank = _dictionary_rank(a.dictionary)
        return [rank[idx].astype(jnp.uint32)]
    if t.is_varlen:
        return _string_sort_lanes(a, varlen_words or
                                  _varlen_words_default())
    return ascending_lanes32(v, t)


def _string_sort_lanes(a: Array, nwords: int) -> List[jax.Array]:
    """Big-endian uint32 words of the first 4*nwords bytes, then length:
    unsigned lane order == byte-lexicographic order for values up to the
    prefix (length breaks prefix-of ties; equal prefixes of longer
    strings tie — callers probe max length for exactness)."""
    off = a.offsets
    n = off.shape[0] - 1
    data = a.values
    bcap = max(data.shape[0], 1)
    lens = (off[1:] - off[:-1]).astype(jnp.int32)
    starts = off[:-1]
    lanes = []
    for w in range(nwords):
        word = jnp.zeros((n,), dtype=jnp.uint32)
        for b in range(4):
            k = 4 * w + b
            pos = starts + k
            byte = jnp.where(k < lens,
                             data[jnp.clip(pos, 0, bcap - 1)], 0)
            word = (word << jnp.uint32(8)) | byte.astype(jnp.uint32)
        lanes.append(word)
    lanes.append(lens.astype(jnp.uint32))
    return lanes


def _dictionary_rank(dictionary: Array) -> jax.Array:
    """rank[i] = position of dictionary value i in sorted order."""
    t = dictionary.type
    if t.is_varlen:
        # prefix-word lanes (exact up to ARROW_TPU_SORT_PREFIX_BYTES)
        lanes = _string_sort_lanes(dictionary,
                                   _varlen_words_default())
    else:
        lanes = sortable_lanes(dictionary)
    n = lanes[0].shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape((n,))
    out = jax.lax.sort(list(lanes) + [iota], num_keys=len(lanes),
                       is_stable=True)
    perm = out[-1]
    rank = jnp.zeros((n,), jnp.int32).at[perm].set(
        jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape((n,)))
    return rank


def _key_lanes(a: Array, order: str, null_placement: str,
               capacity: int, cross_batch: bool = False,
               varlen_words: Optional[int] = None) -> List[jax.Array]:
    """[null_lane, value_lanes...] for one sort key."""
    lanes = sortable_lanes(a, varlen_words=varlen_words,
                           cross_batch=cross_batch)
    if order == "descending":
        lanes = [~l for l in lanes]
    if a.validity is not None:
        if null_placement == "at_end":
            null_lane = (~a.validity).astype(jnp.uint8)
        else:
            null_lane = a.validity.astype(jnp.uint8)
        lanes = [jnp.where(a.validity, l, 0) for l in lanes]
        return [null_lane] + lanes
    return [jnp.zeros((capacity,), dtype=jnp.uint8)] + lanes


def _composite_sort_perm(columns: Sequence[Array],
                         orders: Sequence[str],
                         null_placement: str,
                         capacity: int, length,
                         varlen_words: Optional[int] = None) -> jax.Array:
    """Stable multi-key sort permutation (padding rows pushed to end)."""
    pad_lane = (~row_mask(capacity, length)).astype(jnp.uint8)
    lanes: List[jax.Array] = [pad_lane]
    for col, order in zip(columns, orders):
        lanes.extend(_key_lanes(col, order, null_placement, capacity,
                                varlen_words=varlen_words))
    iota = jax.lax.broadcasted_iota(jnp.int32, (capacity, 1), 0).reshape(
        (capacity,))
    out = jax.lax.sort(lanes + [iota], num_keys=len(lanes), is_stable=True)
    return out[-1]


def batch_key_lanes(b: Batch, sort_keys, null_placement: str):
    """Flat per-row lane list for a batch's sort keys — the total order
    used by sort/merge within ONE batch (dictionary keys use batch-local
    rank lanes)."""
    lanes = []
    for sk in sort_keys:
        lanes.extend(_key_lanes(b.column(sk.name), sk.order,
                                null_placement, b.capacity))
    return lanes


def merge_key_lanes(b: Batch, sort_keys, null_placement: str,
                    varlen_words: Optional[int] = None):
    """CROSS-BATCH-comparable lane list (the streaming sorted_merge's
    bound test): dictionary keys decode to value lanes, varlen keys use
    prefix-word lanes — one key spec yields identically-shaped lanes for
    every batch, so tails from different inputs compare directly
    (``sorted_merge_node.cc:256`` compares full rows; we compare
    normalized lanes)."""
    lanes = []
    for sk in sort_keys:
        lanes.extend(_key_lanes(b.column(sk.name), sk.order,
                                null_placement, b.capacity,
                                cross_batch=True,
                                varlen_words=varlen_words))
    return lanes


def lex_leq(lanes, bound):
    """Rowwise lexicographic ``row <= bound`` over parallel lane lists
    (bound entries are scalars)."""
    res = lanes[-1] <= bound[-1]
    for i in range(len(lanes) - 2, -1, -1):
        res = (lanes[i] < bound[i]) | ((lanes[i] == bound[i]) & res)
    return res


def sort_indices_array(a: Array, order: str = "ascending",
                       null_placement: str = "at_end") -> Array:
    perm = _composite_sort_perm([a], [order], null_placement,
                                a.capacity, a.length)
    return Array(dt.uint64, perm.astype(jnp.uint64), None, length=a.length)


def sort_indices_batch(b: Batch, options: SortOptions) -> Array:
    cols = [b.column(k.name) for k in options.sort_keys]
    orders = [k.order for k in options.sort_keys]
    perm = _composite_sort_perm(cols, orders, options.null_placement,
                                b.capacity, b.length)
    return Array(dt.uint64, perm.astype(jnp.uint64), None, length=b.length)


# ---- registry --------------------------------------------------------------

@register_function("sort_indices", Kind.VECTOR, 1,
                   null_handling=NullHandling.OUTPUT_NOT_NULL,
                   options_class=SortOptions)
def _sort_indices(args, options):
    (x,) = args
    if isinstance(x, Batch):
        if options is None:
            raise ValueError("sort_indices on a batch needs SortOptions")
        return sort_indices_batch(x, options)
    if options is not None and options.sort_keys:
        k = options.sort_keys[0]
        return sort_indices_array(x, k.order, options.null_placement)
    return sort_indices_array(x)


@register_function("array_sort_indices", Kind.VECTOR, 1,
                   null_handling=NullHandling.OUTPUT_NOT_NULL,
                   options_class=ArraySortOptions)
def _array_sort_indices(args, options):
    (x,) = args
    opts = options or ArraySortOptions()
    return sort_indices_array(x, opts.order, opts.null_placement)


@register_function("select_k_unstable", Kind.VECTOR, 1,
                   null_handling=NullHandling.OUTPUT_NOT_NULL,
                   options_class=SelectKOptions)
def _select_k(args, options):
    """Top-k indices (``vector_select_k.cc``). Arrow's select_k treats
    nulls as absent (never selected) — we sort with nulls at_end and cut k.
    Full-sort implementation; a fused lax.top_k path for single keys is a
    planned optimization."""
    (x,) = args
    if options is None:
        raise ValueError("select_k_unstable needs SelectKOptions")
    if isinstance(x, Batch):
        perm_arr = sort_indices_batch(
            x, SortOptions(options.sort_keys, "at_end"))
        n = x.length
    else:
        k0 = options.sort_keys[0]
        perm_arr = sort_indices_array(x, k0.order, "at_end")
        n = x.length
    k = jnp.minimum(jnp.asarray(options.k, dtype=jnp.int32),
                    jnp.asarray(n, dtype=jnp.int32))
    # exclude null rows from the k cut (Arrow semantics)
    if isinstance(x, Batch):
        first = x.column(options.sort_keys[0].name)
        valid_counts = [x.column(kk.name) for kk in options.sort_keys]
        nv = None
        for c in valid_counts:
            if c.validity is not None:
                nv = c.validity if nv is None else (nv & c.validity)
        if nv is not None:
            n_valid = jnp.sum(nv & row_mask(x.capacity, x.length))
            k = jnp.minimum(k, n_valid.astype(jnp.int32))
    else:
        if x.validity is not None:
            n_valid = jnp.sum(x.present_mask())
            k = jnp.minimum(k, n_valid.astype(jnp.int32))
    return perm_arr.with_length(k)


@register_function("rank", Kind.VECTOR, 1,
                   null_handling=NullHandling.OUTPUT_NOT_NULL,
                   options_class=RankOptions)
def _rank(args, options):
    """``vector_rank.cc``: 1-based rank with tiebreakers
    (min/max/first/dense)."""
    (x,) = args
    opts = options or RankOptions()
    order = opts.sort_keys[0].order if opts.sort_keys else "ascending"
    a = x if isinstance(x, Array) else x.column(opts.sort_keys[0].name)
    cap = a.capacity
    perm = _composite_sort_perm([a], [order], opts.null_placement,
                                cap, a.length)
    iota = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).reshape((cap,))
    if opts.tiebreaker == "first":
        rank_sorted = iota + 1
    else:
        # group equal keys in sorted order
        lanes = sortable_lanes(a)
        # padding rows must form their own trailing group or the max-rank
        # scan would leak their garbage keys into the last real group
        sorted_pad = (~row_mask(cap, a.length))[perm]
        boundary = sorted_pad[1:] != sorted_pad[:-1]
        for l in lanes:
            sl = l[perm]
            boundary = boundary | (sl[1:] != sl[:-1])
        if a.validity is not None:
            sorted_null = (~a.validity)[perm]
            boundary = boundary | (sorted_null[1:] != sorted_null[:-1])
        new_grp = jnp.concatenate([jnp.ones((1,), jnp.bool_), boundary])
        from .segment import running_scan
        if opts.tiebreaker == "dense":
            rank_sorted = jnp.cumsum(new_grp, dtype=jnp.int32)
        elif opts.tiebreaker == "min":
            grp_start = jnp.where(new_grp, iota, 0)
            rank_sorted = running_scan(grp_start, jnp.maximum, 0) + 1
        else:  # max: position of last element of the tie group
            rev_is_last = jnp.concatenate([
                new_grp[1:], jnp.ones((1,), jnp.bool_)])
            grp_end = jnp.where(rev_is_last, iota, cap + 1)
            rank_sorted = running_scan(grp_end[::-1], jnp.minimum,
                                       cap + 1)[::-1] + 1
    ranks = jnp.zeros((cap,), dtype=jnp.uint64).at[perm].set(
        rank_sorted.astype(jnp.uint64))
    return Array(dt.uint64, ranks, None, length=a.length)


@register_function("partition_nth_indices", Kind.VECTOR, 1,
                   null_handling=NullHandling.OUTPUT_NOT_NULL,
                   options_class=PartitionNthOptions)
def _partition_nth(args, options):
    """``vector_array_sort.cc:56``: indices such that element N is in its
    sorted position (we return fully sorted indices — a valid refinement of
    the partial guarantee)."""
    (x,) = args
    return sort_indices_array(x, "ascending",
                              options.null_placement if options else
                              "at_end")


@register_function("rank_quantile", Kind.VECTOR, 1,
                   null_handling=NullHandling.OUTPUT_NOT_NULL,
                   options_class=RankOptions)
def _rank_quantile(args, options):
    """``vector_rank.cc`` RankQuantile: (r_min + r_max)/2 - 0.5 over n
    (nulls rank at the end and count toward n)."""
    (x,) = args
    opts = options or RankOptions()

    def with_tb(tb):
        o = RankOptions(sort_keys=opts.sort_keys,
                        null_placement=opts.null_placement, tiebreaker=tb)
        return _rank([x], o).values.astype(jnp.float64)

    rmin = with_tb("min")
    rmax = with_tb("max")
    n = jnp.maximum(jnp.asarray(x.length, jnp.float64), 1.0)
    q = ((rmin + rmax) * 0.5 - 0.5) / n
    return Array(dt.float64, q, None, length=x.length)


@register_function("rank_normal", Kind.VECTOR, 1,
                   null_handling=NullHandling.OUTPUT_NOT_NULL,
                   options_class=RankOptions)
def _rank_normal(args, options):
    """RankQuantile mapped through the standard normal inverse CDF."""
    from jax.scipy.special import ndtri
    q = _rank_quantile(args, options)
    return Array(dt.float64, ndtri(q.values), None, length=q.length)
