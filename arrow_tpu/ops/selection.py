"""Selection kernels: filter / take / indices-from-mask.

Reference: ``cpp/src/arrow/compute/kernels/vector_selection*.cc``. The
reference's hot loop walks the filter bitmap with ``BitBlockCounter`` 64-row
word runs (``vector_selection_filter_internal.cc:159``); the TPU-native
equivalent is a whole-batch **prefix-sum compaction**: positions =
cumsum(mask)-1 followed by a masked scatter, which XLA maps onto the VPU at
memory bandwidth.

Like the reference's ``GetTakeIndices`` (filter bitmap -> index array), the
batch-level filter computes take-indices ONCE and gathers every column
through them — one compaction + N gathers per batch.

Dynamic-shape discipline: outputs keep the input capacity; the dynamic
``length`` is the number of selected rows. Padding rows hold zeros (in-range
for downstream gathers).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core import datatype as dt
from ..core.array import Array, row_mask
from ..core.batch import Batch
from ..compute.registry import Kind, NullHandling, register_function
from ..compute.scalar import Scalar

__all__ = [
    "FilterOptions", "TakeOptions", "rows_of_positions",
    "get_take_indices", "take_array", "filter_array",
    "take_batch", "filter_batch",
]


class FilterOptions:
    DROP = "drop"
    EMIT_NULL = "emit_null"

    def __init__(self, null_selection_behavior: str = "drop"):
        assert null_selection_behavior in (self.DROP, self.EMIT_NULL)
        self.null_selection_behavior = null_selection_behavior


class TakeOptions:
    def __init__(self, boundscheck: bool = True):
        self.boundscheck = boundscheck  # no data-dependent errors on TPU


def _selection_mask(mask: Array, null_selection: str):
    """(selected bool (capacity,), emit_valid bool or None, out_len)."""
    cap = mask.capacity
    mvals = mask.values.astype(jnp.bool_)
    in_range = row_mask(cap, mask.length)
    mvalid = mask.validity

    if null_selection == FilterOptions.DROP or mvalid is None:
        sel = mvals if mvalid is None else (mvals & mvalid)
        sel = sel & in_range
        emit_valid = None
    else:
        is_null = (~mvalid) & in_range
        sel = ((mvals & mvalid) | is_null) & in_range
        emit_valid = mvalid  # selected-and-null -> null output row
    out_len = jnp.sum(sel, dtype=jnp.int32)
    return sel, emit_valid, out_len


def _compaction_impl() -> str:
    """'sort' (default on TPU): ONE 1-bit-key multi-payload global stable
    sort compacts every column directly — no gathers anywhere. Measured
    on v5e (tools/tpu_filter_probe.py, 10M rows, sel 0.01/0.5/0.99,
    round 3): sort 230M rows/s at EVERY selectivity vs twolevel/pallas
    25M. The two-level tile-sort + stitch designs lose because their
    stitch is XLA 1D gathers, which lower near-serially on TPU (~100M
    elem/s) — the sort's O(log^2 n) streamed comparator passes all run at
    HBM bandwidth and still win 9x. Beating 'sort' needs a single-pass
    Pallas compaction that never leaves VMEM between mask and write, not
    a cheaper index computation.
    'twolevel'/'pallas': tile-local compaction + stitch (kept for probe
    comparisons); 'search': cumsum + searchsorted (40x slower than sort);
    'scatter': O(n) scatter (CPU default — element scatters serialize on
    TPU). Override: ARROW_TPU_FILTER_IMPL."""
    import os
    impl = os.environ.get("ARROW_TPU_FILTER_IMPL")
    if impl:
        return impl
    return "sort" if jax.default_backend() == "tpu" else "scatter"


def _use_sort_compaction() -> bool:
    return _compaction_impl() == "sort"


_TILE = 128  # VPU lane width: one tile = one (8,128)-register-friendly row
_PTILE = 1024  # pallas kernel tile (8 sublanes x 128 lanes)


def _pallas_take_indices(sel: jax.Array, emit_valid):
    """Pallas level-1 local compaction (ops/pallas_kernels.py
    tile_compact_local: prefix-count + one-hot MXU matmul per 1024-row
    tile) + the same scatter/cummax stitch as ``_twolevel_take_indices``.
    Gated behind ARROW_TPU_FILTER_IMPL=pallas until measured faster than
    'twolevel' on real hardware."""
    from .pallas_kernels import tile_compact_local
    cap = sel.shape[0]
    T = cap // _PTILE
    loc, counts = tile_compact_local(sel)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)])
    total = starts[-1]
    tile_of = jnp.clip(rows_of_positions(starts, cap), 0, T - 1)
    j = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).reshape((cap,))
    within = jnp.clip(j - starts[tile_of], 0, _PTILE - 1)
    flat_pos = tile_of * _PTILE + within
    indices = tile_of * _PTILE + loc[flat_pos]
    live = j < total
    indices = jnp.where(live, indices, 0)
    validity = None
    if emit_valid is not None:
        validity = jnp.where(live, emit_valid[indices], True)
    return indices, validity


def _twolevel_take_indices(sel: jax.Array, emit_valid):
    """Two-level compaction (the VERDICT r1 filter-roofline fix).

    Level 1: reshape to (T, 128) tiles and stable-sort each tile on the
    minor axis with a 1-bit key — selected local iotas first.  A 128-wide
    minor-axis sort is a fixed comparator network entirely inside vector
    registers (no HBM traffic beyond the streaming read), unlike the old
    global sort whose O(log^2 n) comparator stages each re-stream the
    whole capacity through HBM.

    Level 2: per-tile selected counts -> exclusive prefix sum = each
    tile's start in the output; a scatter+cummax row map
    (``rows_of_positions``) sends every output position to its source
    tile, and one flat gather stitches the tile-local sorted iotas into
    global take indices.  ~3 streaming passes total, independent of
    capacity.
    """
    cap = sel.shape[0]
    T = cap // _TILE
    s2 = sel.reshape(T, _TILE)
    # Pack [~sel:1][loc:7][ev:1] into ONE u16 key so the minor-axis sort
    # is single-operand: the variadic (key, payload) form lowers on TPU
    # to a tupled reduce-window whose scoped-VMEM footprint exceeds the
    # 16MB limit (observed OOM on v5e); halving the operand count fits.
    # loc < 128 fits 7 bits; sorting ascending puts selected (bit8=0)
    # first ordered by loc (stable by construction — locs are unique).
    loc = jax.lax.broadcasted_iota(jnp.uint16, (T, _TILE), 1)
    key = ((~s2).astype(jnp.uint16) << 8) | (loc << 1)
    if emit_valid is not None:
        key = key | emit_valid.reshape(T, _TILE).astype(jnp.uint16)
    # Barriers on BOTH sides of the minor-axis sort: XLA otherwise fuses
    # the key construction + the sort's tupled minor-axis reduce-window +
    # the stitch scans into ONE kernel whose scoped-VMEM scratch is the
    # full u16 key array (19.07MB at 10M rows > the 16MB limit — the
    # round-2 on-chip compile OOM, .bench_logs/filter.log). Materializing
    # the (T,128) u16 seams to HBM costs two streamed 2B/row passes.
    key = jax.lax.optimization_barrier(key)
    out = jax.lax.sort(key, dimension=1, is_stable=False)
    out = jax.lax.optimization_barrier(out)
    loc_sorted = ((out >> 1) & 0x7F).astype(jnp.int32).reshape((cap,))
    ev_sorted = (out & 1).astype(jnp.bool_).reshape((cap,)) \
        if emit_valid is not None else None

    # counts from the SORTED keys (selected <=> bit8==0 <=> key < 256),
    # not from s2: deriving them pre-sort let XLA fuse this cumsum's
    # blocked-scan levels with the (T,128) u16 key producer — the 19.07MB
    # scoped-VMEM fusion behind the round-2 OOM. dtype=int32 keeps the
    # scan single-operand (x64 default-promotes to int64 = a TUPLED
    # u32-pair reduce-window on TPU, doubling scan scratch).
    counts = jnp.sum(out < 256, axis=1, dtype=jnp.int32)
    starts = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(counts, dtype=jnp.int32)])
    total = starts[-1]
    tile_of = jnp.clip(rows_of_positions(starts, cap), 0, T - 1)
    j = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).reshape((cap,))
    within = jnp.clip(j - starts[tile_of], 0, _TILE - 1)
    flat_pos = tile_of * _TILE + within
    indices = tile_of * _TILE + loc_sorted[flat_pos]
    live = j < total
    indices = jnp.where(live, indices, 0)  # padding stays in-range
    validity = None
    if ev_sorted is not None:
        validity = jnp.where(live, ev_sorted[flat_pos], True)
    return indices, validity


def _search_take_indices(sel: jax.Array, emit_valid, out_len):
    """Compaction by binary search: indices[j] = position of the (j+1)-th
    set bit = searchsorted(cumsum(sel), j+1)."""
    cap = sel.shape[0]
    C = jnp.cumsum(sel, dtype=jnp.int32)
    j = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).reshape((cap,))
    idx = jnp.searchsorted(C, j + 1, side="left").astype(jnp.int32)
    idx = jnp.clip(idx, 0, cap - 1)
    validity = emit_valid[idx] if emit_valid is not None else None
    return idx, validity


def get_take_indices(mask: Array,
                     null_selection: str = FilterOptions.DROP) -> Array:
    """Filter mask -> int32 take indices (dynamic length).

    DROP: selected = valid & true. EMIT_NULL: null mask slots are selected
    too but yield a null index (validity=False) so takes produce null rows.
    """
    cap = mask.capacity
    sel, emit_valid, out_len = _selection_mask(mask, null_selection)
    iota = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).reshape((cap,))

    impl = _compaction_impl()
    if impl == "pallas" and cap % _PTILE == 0 and cap >= _PTILE:
        indices, validity = _pallas_take_indices(sel, emit_valid)
        return Array(dt.int32, indices, validity, length=out_len)
    if impl in ("twolevel", "pallas") and cap % _TILE == 0 \
            and cap >= _TILE:
        indices, validity = _twolevel_take_indices(sel, emit_valid)
        return Array(dt.int32, indices, validity, length=out_len)
    if impl == "search":
        indices, validity = _search_take_indices(sel, emit_valid, out_len)
        return Array(dt.int32, indices, validity, length=out_len)
    if impl in ("sort", "twolevel", "pallas"):
        key = (~sel).astype(jnp.uint8)
        ops = [key, iota] + ([emit_valid] if emit_valid is not None else [])
        out = jax.lax.sort(ops, num_keys=1, is_stable=True)
        indices = out[1]
        validity = out[2] if emit_valid is not None else None
        return Array(dt.int32, indices, validity, length=out_len)

    positions = jnp.cumsum(sel, dtype=jnp.int32) - 1
    scatter_pos = jnp.where(sel, positions, cap)  # cap -> dropped
    indices = jnp.zeros((cap,), dtype=jnp.int32).at[scatter_pos].set(
        iota, mode="drop", unique_indices=True)
    validity = None
    if emit_valid is not None:
        validity = jnp.ones((cap,), dtype=jnp.bool_).at[scatter_pos].set(
            emit_valid, mode="drop", unique_indices=True)
    return Array(dt.int32, indices, validity, length=out_len)


def rows_of_positions(new_off: jax.Array, out_cap: int) -> jax.Array:
    """(out_cap,) source-row index per output position p: the r with
    ``new_off[r] <= p < new_off[r+1]`` (junk past the total, clip before
    use).

    One unique-index scatter of each non-empty row's start + one
    ``lax.cummax`` forward fill — replaces a per-position binary search
    (log n rounds of random gathers, the former hot spot of every var-len
    take: byte pools run to hundreds of MB)."""
    cap = new_off.shape[0] - 1
    starts = new_off[:-1]
    lens = new_off[1:] - starts
    ridx = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).reshape((cap,))
    pos = jnp.where(lens > 0, starts, out_cap)   # empty rows: dropped
    marks = jnp.full((out_cap,), -1, jnp.int32).at[pos].max(
        ridx, mode="drop", unique_indices=True)
    # Barrier: without it XLA fuses this cummax with the caller's cumsum
    # into one tupled reduce-window whose scoped-VMEM scratch exceeds the
    # 16MB TPU limit inside fori_loop bodies (observed v5e compile OOM).
    marks = jax.lax.optimization_barrier(marks)
    return jax.lax.cummax(marks)


def _gather_validity(values: Array, idx: jax.Array,
                     idx_validity: Optional[jax.Array]):
    validity = None
    if values.validity is not None:
        validity = values.validity[idx]
    if idx_validity is not None:
        validity = idx_validity if validity is None \
            else (validity & idx_validity)
    return validity


def take_array(values: Array, indices: Array, grow: int = 1) -> Array:
    """Gather rows of `values` at `indices` (Arrow `take`).

    Indices must be in [0, values.capacity); padding index rows must also be
    in-range (the compaction above guarantees zeros).

    ``grow`` scales the output byte-pool / child-row capacity of varlen
    and list columns (static): a take whose indices REPEAT rows (join
    fanout) can need more output bytes than the input pool holds. The
    caller picks ``grow = ceil(out_rows / in_rows)`` — the exact bound
    when indices repeat whole permutations, a heuristic otherwise; a
    pathological take (all indices at the longest string) still
    overflows, detected at materialization (core/interop raises with
    recovery advice, the engine's capacity+deferred-error discipline).
    """
    t = values.type
    idx = indices.values.astype(jnp.int32)
    out_len = indices.length

    if isinstance(t, dt.DictionaryType):
        out_vals = values.values[idx]
        validity = _gather_validity(values, idx, indices.validity)
        return Array(t, out_vals, validity, dictionary=values.dictionary,
                     length=out_len)

    if t.is_varlen:
        return _take_varlen(values, idx, indices, out_len, grow)

    if isinstance(t, dt.StructType):
        children = tuple(take_array(c, indices, grow)
                         for c in values.children)
        validity = _gather_validity(values, idx, indices.validity)
        return Array(t, values.values[idx], validity, length=out_len,
                     children=children)

    if isinstance(t, dt.UnionType):
        # codes (and dense offsets) gather; children stay as-is for dense,
        # recurse for sparse (vector_selection_take_internal.cc union take)
        codes = values.values[idx]
        if t.mode == "dense":
            off = values.offsets[:-1][idx]
            ocap = idx.shape[0]
            new_off = jnp.zeros((ocap + 1,), jnp.int32).at[:-1].set(off)
            return Array(t, codes, None, offsets=new_off, length=out_len,
                         children=values.children)
        children = tuple(take_array(c, indices) for c in values.children)
        return Array(t, codes, None, length=out_len, children=children)

    if isinstance(t, dt.ListType):
        return _take_list(values, idx, indices, out_len, grow)

    if isinstance(t, dt.RunEndEncodedType):
        # decode -> take -> re-encode keeps the column type stable
        from .ree import run_end_decode_array, run_end_encode_array
        plain = take_array(run_end_decode_array(values), indices)
        return run_end_encode_array(plain, run_end_type=t.run_end_type)

    out_vals = values.values[idx]
    validity = _gather_validity(values, idx, indices.validity)
    return Array(t, out_vals, validity, length=out_len)


def _take_list(values: Array, idx: jax.Array, indices: Array, out_len,
               grow: int = 1):
    """list<T> gather: new offsets from gathered run lengths, then the
    child rows gather through a searchsorted row map (same two-phase shape
    as ``_take_varlen`` but over child rows instead of bytes)."""
    t = values.type
    child = values.dictionary
    ocap = idx.shape[0]
    off = values.offsets
    in_range = row_mask(ocap, out_len)
    sel_ok = in_range
    if indices.validity is not None:
        sel_ok = sel_ok & indices.validity
    lens = jnp.where(sel_ok, off[idx + 1] - off[idx], 0)
    new_off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(lens, dtype=jnp.int32)])
    in_ccap = max(child.capacity, 1)
    ccap = in_ccap * max(int(grow), 1)
    total = new_off[-1]
    cidx = jax.lax.broadcasted_iota(jnp.int32, (ccap, 1), 0).reshape((ccap,))
    r = jnp.clip(rows_of_positions(new_off, ccap), 0, ocap - 1)
    src = jnp.clip(off[idx[r]] + (cidx - new_off[r]), 0, in_ccap - 1)
    child_idx = Array(dt.int32, src, None, length=total)
    new_child = take_array(child, child_idx)
    validity = _gather_validity(values, idx, indices.validity)
    return Array(t, jnp.zeros((0,), jnp.uint8), validity, offsets=new_off,
                 dictionary=new_child, length=out_len)


def _take_varlen(values: Array, idx: jax.Array, indices: Array, out_len,
                 grow: int = 1):
    """Variable-length (string/binary) gather.

    Two-phase: (1) gather per-row byte lengths, prefix-sum into new offsets;
    (2) map every output byte position back to its source byte via a
    searchsorted over the new offsets. O(B log N) — later a Pallas kernel
    with row-parallel DMA copies. Output pool = ``grow`` x input pool
    (see ``take_array``); an overflowing take keeps true offsets so
    materialization can detect and report it.
    """
    t = values.type
    ocap = idx.shape[0]
    off = values.offsets
    in_range = row_mask(ocap, out_len)
    # null/padding rows contribute 0 bytes
    sel_ok = in_range
    if indices.validity is not None:
        sel_ok = sel_ok & indices.validity
    lens = jnp.where(sel_ok, off[idx + 1] - off[idx], 0)
    new_off = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(lens, dtype=jnp.int32)])
    in_bcap = max(values.values.shape[0], 1)
    bcap = in_bcap * max(int(grow), 1)
    total = new_off[-1]
    # output byte j -> row r -> source byte (scatter+cummax row map)
    bidx = jax.lax.broadcasted_iota(jnp.int32, (bcap, 1), 0).reshape((bcap,))
    r = jnp.clip(rows_of_positions(new_off, bcap), 0, ocap - 1)
    src = off[idx[r]] + (bidx - new_off[r])
    src = jnp.clip(src, 0, in_bcap - 1)
    out_bytes = jnp.where(bidx < total, values.values[src], 0).astype(
        jnp.uint8)
    validity = _gather_validity(values, idx, indices.validity)
    return Array(t, out_bytes, validity, offsets=new_off, length=out_len)


def filter_array(values: Array, mask: Array,
                 options: Optional[FilterOptions] = None) -> Array:
    opts = options or FilterOptions()
    if _use_sort_compaction():
        from ..core.schema import Field, Schema
        tmp = Batch(Schema((Field("v", values.type, True),)), [values],
                    values.length)
        return _filter_batch_sorted(
            tmp, mask, opts.null_selection_behavior).column(0)
    indices = get_take_indices(mask, opts.null_selection_behavior)
    return take_array(values, indices)


def take_batch(b: Batch, indices: Array) -> Batch:
    arrays = [take_array(b.column(i), indices) for i in range(b.num_columns)]
    return Batch(b.schema, arrays, indices.length, b.index)


def _filter_varlen_bytes(a: Array, sel: jax.Array) -> jax.Array:
    """Compact a varlen column's BYTE POOL by row selection with the same
    gather-free 1-bit-key sort the fixed-width columns use.

    The row mask propagates to bytes via one unique-index scatter of
    ``row_index*2 + sel`` at row heads + a cummax forward fill (NOT a
    per-byte gather ``sel[row_of_byte]`` — XLA 1D gathers near-serialize
    on TPU, the round-2 varlen-filter bottleneck), then ONE stable sort
    of (not-selected-bit, byte) left-packs the kept bytes in order."""
    off = a.offsets
    data = a.values
    bcap = data.shape[0]
    if bcap == 0:
        return data
    cap = off.shape[0] - 1
    starts = off[:-1]
    lens = off[1:] - starts
    head_pos = jnp.where(lens > 0, starts, bcap)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).reshape((cap,))
    marks = jnp.full((bcap,), -1, jnp.int32).at[head_pos].max(
        ridx * 2 + sel.astype(jnp.int32), mode="drop",
        unique_indices=True)
    marks = jax.lax.optimization_barrier(marks)
    sel_bytes = (jax.lax.cummax(marks) & 1).astype(jnp.bool_)
    # pool slack past the last used byte inherits the last row's mark
    # through the forward fill — force-drop it
    bidx = jax.lax.broadcasted_iota(jnp.int32, (bcap, 1), 0).reshape(
        (bcap,))
    sel_bytes = sel_bytes & (bidx < off[cap])
    bkey = (~sel_bytes).astype(jnp.uint8)
    out = jax.lax.sort([bkey, data], num_keys=1, is_stable=True)
    return out[1]


def _filter_batch_sorted(b: Batch, mask: Array,
                         null_selection: str) -> Batch:
    """TPU fast path: ONE multi-payload 1-bit-key stable sort compacts
    every fixed-width column (values + validity) directly — no random
    scatters/gathers. Varlen columns compact the same way at BOTH
    granularities: their row lengths ride the main sort (new offsets =
    cumsum of compacted lengths) and the byte pool left-packs through a
    second 1-bit sort (``_filter_varlen_bytes``). Nested columns
    (list/struct/union/REE) still ride a take through the iota payload.
    """
    cap = b.capacity
    sel, emit_valid, out_len = _selection_mask(mask, null_selection)
    key = (~sel).astype(jnp.uint8)

    payloads = []
    layout = []  # (col_idx, kind)
    any_nested = False
    for i in range(b.num_columns):
        a = b.column(i)
        if a.type.is_nested:
            any_nested = True
            continue
        if a.type.is_varlen:
            payloads.append((a.offsets[1:] - a.offsets[:-1]).astype(
                jnp.int32))
            layout.append((i, "lens"))
        elif a.values.ndim == 2:
            # multi-limb storage (wide decimals): lax.sort operands are
            # 1D — each limb rides as its own payload, re-stacked after
            for j in range(a.values.shape[1]):
                payloads.append(a.values[:, j])
                layout.append((i, ("values2", j, a.values.shape[1])))
        else:
            payloads.append(a.values)
            layout.append((i, "values"))
        validity = a.validity
        if validity is not None or emit_valid is not None:
            v = validity if validity is not None else \
                jnp.ones((cap,), dtype=jnp.bool_)
            if emit_valid is not None:
                v = v & emit_valid
            payloads.append(v)
            layout.append((i, "validity"))
    iota = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).reshape((cap,))
    if any_nested:
        payloads.append(iota)
        layout.append((-1, "iota"))
        if emit_valid is not None:
            payloads.append(emit_valid)
            layout.append((-1, "emit_valid"))

    out = jax.lax.sort([key] + payloads, num_keys=1, is_stable=True)[1:]
    results = {}
    for o, (ci, kind) in zip(out, layout):
        results[(ci, kind)] = o

    arrays = []
    for i in range(b.num_columns):
        a = b.column(i)
        if a.type.is_nested:
            idx_arr = Array(dt.int32, results[(-1, "iota")],
                            results.get((-1, "emit_valid")),
                            length=out_len)
            arrays.append(take_array(a, idx_arr))
            continue
        validity = results.get((i, "validity"))
        if a.type.is_varlen:
            lens_sorted = results[(i, "lens")]
            live = iota < out_len
            new_off = jnp.concatenate(
                [jnp.zeros((1,), jnp.int32),
                 jnp.cumsum(jnp.where(live, lens_sorted, 0),
                            dtype=jnp.int32)])
            pool = _filter_varlen_bytes(a, sel)
            arrays.append(Array(a.type, pool, validity, offsets=new_off,
                                length=out_len))
            continue
        if a.values.ndim == 2:
            W = a.values.shape[1]
            vals = jnp.stack([results[(i, ("values2", j, W))]
                              for j in range(W)], axis=1)
            arrays.append(Array(a.type, vals, validity,
                                dictionary=a.dictionary, length=out_len))
            continue
        arrays.append(Array(a.type, results[(i, "values")], validity,
                            dictionary=a.dictionary, length=out_len))
    return Batch(b.schema, arrays, out_len, b.index)


_DMA_TILE = 256  # pallas_kernels._FC_ROWS


def _filter_batch_dma(b: Batch, mask: Array,
                      null_selection: str) -> Optional[Batch]:
    """Single-pass Pallas compaction (``pallas_kernels.
    filter_compact_chunks``): every fixed-width column bitcasts to u8
    chunk planes, ONE kernel pass compacts them all (local one-hot MXU
    compact + dynamic-offset DMA per tile), planes bitcast back.
    Returns None when the batch doesn't fit the kernel (varlen/nested
    columns, capacity not tile-aligned) — caller falls back to the
    sort path."""
    cap = b.capacity
    if cap < _DMA_TILE:
        return None
    for i in range(b.num_columns):
        a = b.column(i)
        if a.type.is_varlen or a.type.is_nested:
            return None
        if isinstance(a.type, dt.DecimalType) and a.type.wide:
            return None         # two-limb storage: sort path handles it
    sel, emit_valid, out_len = _selection_mask(mask, null_selection)
    pad = (-cap) % _DMA_TILE
    if pad:
        # tile-align by padding unselected rows; outputs slice back
        sel = jnp.concatenate([sel, jnp.zeros((pad,), jnp.bool_)])

    planes = []
    layout = []  # (col, kind, n_bytes, dtype)
    for i in range(b.num_columns):
        a = b.column(i)
        v = a.values
        if v.dtype == jnp.bool_:
            v = v.astype(jnp.uint8)
        pl8 = jax.lax.bitcast_convert_type(v, jnp.uint8)
        if pl8.ndim == 1:
            pl8 = pl8[:, None]
        planes.append(pl8)
        layout.append((i, "values", pl8.shape[1], v.dtype))
        validity = a.validity
        if validity is not None or emit_valid is not None:
            vv = validity if validity is not None else \
                jnp.ones((cap,), jnp.bool_)
            if emit_valid is not None:
                vv = vv & emit_valid
            planes.append(vv.astype(jnp.uint8)[:, None])
            layout.append((i, "validity", 1, jnp.bool_))
    from .pallas_kernels import filter_compact_chunks
    chunks = jnp.concatenate(planes, axis=1) if planes else \
        jnp.zeros((cap, 0), jnp.uint8)
    if pad:
        chunks = jnp.concatenate(
            [chunks, jnp.zeros((pad, chunks.shape[1]), jnp.uint8)])
    out = filter_compact_chunks(sel, chunks)[:cap]

    pos = 0
    results = {}
    for (i, kind, w, dtype) in layout:
        piece = out[:, pos:pos + w]
        pos += w
        if kind == "validity":
            results[(i, "validity")] = piece[:, 0].astype(jnp.bool_)
        else:
            v = jax.lax.bitcast_convert_type(piece, jnp.dtype(dtype)) \
                if dtype != jnp.bool_ else piece[:, 0]
            if v.ndim > 1:
                v = v.reshape((cap,))
            if dtype == jnp.bool_:
                v = v.astype(jnp.bool_)
            results[(i, "values")] = v
    arrays = []
    for i in range(b.num_columns):
        a = b.column(i)
        arrays.append(Array(a.type, results[(i, "values")],
                            results.get((i, "validity")),
                            dictionary=a.dictionary, length=out_len))
    return Batch(b.schema, arrays, out_len, b.index)


def filter_batch(b: Batch, mask: Array,
                 options: Optional[FilterOptions] = None) -> Batch:
    opts = options or FilterOptions()
    impl = _compaction_impl()
    if impl == "dma":
        out = _filter_batch_dma(b, mask, opts.null_selection_behavior)
        if out is not None:
            return out
        return _filter_batch_sorted(b, mask, opts.null_selection_behavior)
    if impl == "sort":
        return _filter_batch_sorted(b, mask, opts.null_selection_behavior)
    indices = get_take_indices(mask, opts.null_selection_behavior)
    return take_batch(b, indices)


# ---- registry entries ---------------------------------------------------------

@register_function("filter", Kind.VECTOR, 2,
                   null_handling=NullHandling.COMPUTED,
                   options_class=FilterOptions)
def _filter(args, options):
    values, mask = args
    if isinstance(values, Batch):
        return filter_batch(values, mask, options)
    return filter_array(values, mask, options)


@register_function("take", Kind.VECTOR, 2,
                   null_handling=NullHandling.COMPUTED,
                   options_class=TakeOptions)
def _take(args, options):
    values, indices = args
    if isinstance(values, Batch):
        return take_batch(values, indices)
    return take_array(values, indices)


@register_function("array_take_indices_from_mask", Kind.VECTOR, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=FilterOptions)
def _indices_nonzero(args, options):
    (mask,) = args
    opts = options or FilterOptions()
    return get_take_indices(mask, opts.null_selection_behavior)


@register_function("array_filter", Kind.VECTOR, 2,
                   null_handling=NullHandling.COMPUTED,
                   options_class=FilterOptions)
def _array_filter(args, options):
    """Alias of filter restricted to array inputs (vector_selection.cc
    registers both)."""
    values, mask = args
    return filter_array(values, mask, options)


@register_function("array_take", Kind.VECTOR, 2,
                   null_handling=NullHandling.COMPUTED,
                   options_class=TakeOptions)
def _array_take(args, options):
    values, indices = args
    return take_array(values, indices)


@register_function("drop_null", Kind.VECTOR, 1,
                   null_handling=NullHandling.COMPUTED)
def _drop_null(args, options):
    """Remove null rows (vector_selection.cc DropNull)."""
    a = args[0]
    if isinstance(a, Batch):
        ok = jnp.ones((a.capacity,), jnp.bool_)
        for i in range(a.num_columns):
            c = a.column(i)
            if c.validity is not None:
                ok = ok & c.validity
        return filter_batch(a, Array(dt.bool_, ok, None, length=a.length))
    if a.validity is None:
        return a
    return filter_array(a, Array(dt.bool_, a.validity, None,
                                 length=a.length))


@register_function("inverse_permutation", Kind.VECTOR, 1,
                   null_handling=NullHandling.COMPUTED)
def _inverse_permutation(args, options):
    """vector_swizzle.cc InversePermutation: out[perm[i]] = i; positions
    not hit are null."""
    a = args[0]
    cap = a.capacity
    idx = a.values.astype(jnp.int32)
    ok = a.present_mask()
    pos = jnp.where(ok, jnp.clip(idx, 0, cap - 1), cap)
    iota = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).reshape((cap,))
    out = jnp.zeros((cap,), jnp.int32).at[pos].set(
        iota, mode="drop", unique_indices=True)
    hit = jnp.zeros((cap,), jnp.bool_).at[pos].set(
        True, mode="drop", unique_indices=True)
    out_t = a.type if a.type.is_integer else dt.int32
    return Array(out_t, out.astype(out_t.storage_np), hit, length=a.length)
