"""Segment-reduction primitives over sort-grouped batches.

The TPU replacement for scatter-accumulate grouped aggregation: TPU
scatters SERIALIZE on colliding indices, so instead of ``.at[gid].add``
over N rows the engine sorts the batch by key once (ops/distinct) and
reduces each contiguous run with prefix ops:

  * additive stats (sum/count/moments): padded cumsum + boundary gather —
    two vector ops, no scatter at all;
  * order stats (min/max/any/all/first/last): a segmented
    ``associative_scan`` with a head-reset monoid — O(log n) depth, fully
    vectorized;
  * the only scatters left write ONE element per distinct group
    (unique indices — the fast scatter kind).

Reference contrast: the CPU reference scatters per row into per-thread
hash-aggregator states (``hash_aggregate.cc`` Consume) because CPU caches
make random writes cheap; on TPU the sort unit is the cheap resource.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .distinct import SortGroup

__all__ = ["SegmentContext", "make_segment_context", "segmented_scan",
           "segmented_carry_last",
           "seg_sum", "seg_prod", "seg_reduce_min", "seg_reduce_max",
           "seg_any", "seg_all", "seg_first_row", "seg_last_row"]


class SegmentContext(NamedTuple):
    """Per-batch grouping context shared by all aggregators.

    Arrays indexed by SORTED position (cap,) unless noted:
      perm          sorted position -> original row
      s_active      row participates (in-range, in-group)
      head          first position of each run
      seg           run id per position
      starts (seg,) run start position (cap pad)
      ends   (seg,) run end position (exclusive; == starts for pads)
      gid_global    (seg,) -> persistent group id (unique; -1 pads)
      row_gids      per ORIGINAL row: persistent group id (-1 inactive)
      num_segs      int32 scalar
      sorted_cols   dict: id(values buffer) -> (values-in-sorted-order,
                    validity-in-sorted-order | None) for columns that rode
                    the sort as payloads (no post-sort gathers)
    """

    perm: jax.Array
    s_active: jax.Array
    head: jax.Array
    seg: jax.Array
    starts: jax.Array
    ends: jax.Array
    gid_global: jax.Array
    row_gids: jax.Array
    num_segs: jax.Array
    sorted_cols: dict


def make_segment_context(g: SortGroup, rep_gids: jax.Array,
                         sorted_cols=None) -> SegmentContext:
    """rep_gids: (R,) persistent gid per batch-local first-appearance id
    (from the grouper's table pass over unique reps). All seg-granular
    arrays are R-sized (R = the grouper's rep capacity)."""
    cap = g.perm.shape[0]
    R = rep_gids.shape[0]
    assert g.head_pos_seg.shape[0] == R, \
        "sort_group rep_capacity must match the grouper table size"
    sidx = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0).reshape((R,))
    starts = g.head_pos_seg
    nxt = jnp.concatenate([starts[1:], jnp.full((1,), cap, jnp.int32)])
    in_use = sidx < g.num_unique
    ends = jnp.where(sidx < g.num_unique - 1, nxt, g.n_active)
    ends = jnp.where(in_use, ends, starts)
    gid_global_of_local = rep_gids  # local first-appearance id -> gid
    local_of_seg = g.gid_of_seg
    gid_global = jnp.where(
        in_use,
        gid_global_of_local[jnp.clip(local_of_seg, 0, R - 1)],
        jnp.int32(-1))
    if g.codes is None:
        row_gids = None   # no aggregator reads per-row gids (the codes
        #                   scatter was skipped — sort_group need_codes)
    else:
        row_gids = jnp.where(
            g.codes >= 0,
            gid_global_of_local[jnp.clip(g.codes, 0, R - 1)],
            jnp.int32(-1))
    return SegmentContext(g.perm, g.s_active, g.head, g.seg, starts, ends,
                          gid_global, row_gids, g.num_unique,
                          sorted_cols if sorted_cols is not None else {})


def seg_sum(ctx: SegmentContext, x_sorted: jax.Array) -> jax.Array:
    """(seg,) sums. Integers: padded-cumsum boundary differences —
    modular arithmetic makes this BIT-EXACT regardless of order. Floats:
    a head-reset segmented scan so partial sums stay segment-local
    (cross-segment prefixes would otherwise leak cancellation error);
    the tree order differs from Arrow's strictly sequential sum in the
    last ulps (documented float-aggregation divergence)."""
    if jnp.issubdtype(x_sorted.dtype, jnp.floating):
        return _seg_scan_last(ctx, x_sorted, jnp.add)
    C = jnp.concatenate([jnp.zeros((1,), x_sorted.dtype),
                         jnp.cumsum(x_sorted)])
    return C[ctx.ends] - C[ctx.starts]


def running_scan(v: jax.Array, combine, fill) -> jax.Array:
    """Unsegmented inclusive scan. cummax/cummin/cumsum hit the dedicated
    XLA cumulative primitives (fast TPU lowering, unlike generic
    ``associative_scan`` whose slice/concat form is a compile-time hazard
    at engine sizes — and unlike the hand-rolled doubling this replaces,
    which paid log2(n) full passes over the array at runtime)."""
    if combine is jnp.maximum:
        return jax.lax.cummax(v)
    if combine is jnp.minimum:
        return jax.lax.cummin(v)
    if combine is jnp.add:
        return jnp.cumsum(v)
    cap = v.shape[0]
    d = 1
    while d < cap:
        vs = jnp.concatenate([jnp.full((d,), fill, v.dtype), v[:-d]])
        v = combine(v, vs)
        d *= 2
    return v


def segmented_scan(v: jax.Array, head: jax.Array, combine) -> jax.Array:
    """Inclusive segmented scan via hand-rolled Hillis-Steele doubling
    (log2(n) shifted elementwise passes) instead of
    ``lax.associative_scan``: the generic scan's slice/concat lowering
    makes XLA-TPU compile time explode at engine batch sizes (measured:
    minutes at 10M+ rows), while this form is 2*log2(n) trivial fused
    ops."""
    cap = v.shape[0]
    f = head
    d = 1
    while d < cap:
        vs = jnp.concatenate([v[:d], v[:-d]])    # v[i-d] (prefix junk)
        fs = jnp.concatenate([jnp.ones((d,), jnp.bool_), f[:-d]])
        valid = jax.lax.broadcasted_iota(
            jnp.int32, (cap, 1), 0).reshape((cap,)) >= d
        take = valid & ~f
        v = jnp.where(take, combine(vs, v), v)
        f = f | fs  # fs is True for i < d (array start = implicit head)
        d *= 2
    return v


def segmented_carry_last(values_i32: jax.Array,
                         head: jax.Array) -> jax.Array:
    """Within each head-delimited run, carry the value of the LATEST
    position whose value >= 0 (-1 where the run has none yet).

    One cumsum + one packed ``lax.cummax`` + one gather replaces the
    doubling segmented scan (log2(n) full passes): pack (segment id,
    source position) into int64 — higher segments always dominate, so a
    plain cummax never leaks a carry across a head."""
    cap = values_i32.shape[0]
    g = jnp.cumsum(head, dtype=jnp.int32) - 1
    pos = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).reshape((cap,))
    tag = jnp.where(values_i32 >= 0, pos + 1, 0)     # 0 == "no source"
    packed = (g.astype(jnp.int64) << 32) | tag.astype(jnp.int64)
    cm = jax.lax.cummax(packed)
    src = (cm & jnp.int64(0xFFFFFFFF)).astype(jnp.int32) - 1
    return jnp.where(src >= 0,
                     values_i32[jnp.clip(src, 0, cap - 1)],
                     jnp.int32(-1))


def _seg_scan_last(ctx: SegmentContext, x_sorted: jax.Array, combine):
    """Inclusive segmented scan; returns value at each run's LAST position
    per seg — the run's reduction."""
    v = segmented_scan(x_sorted, ctx.head, combine)
    last = jnp.clip(ctx.ends - 1, 0, x_sorted.shape[0] - 1)
    return v[last]


def seg_prod(ctx, x_sorted):
    return _seg_scan_last(ctx, x_sorted, jnp.multiply)


# ---- packed-cummax segmented extremes ----------------------------------------
#
# For <=32-bit orderable dtypes, a segmented min/max is ONE lax.cummax over
# (segment_id << 32 | order-preserving code): higher segments always
# dominate, so the scan can't leak across run boundaries — replacing the
# log2(n)-pass doubling scan. NaNs are forced to the winning code in both
# directions (jnp.minimum/maximum propagate NaN; so do we).

_U32MAX = np.uint32(0xFFFFFFFF)


def _asc_enc32(x: jax.Array):
    """(order-preserving uint32 codes, kind) or (None, None)."""
    d = x.dtype
    if d == jnp.bool_:
        return x.astype(jnp.uint32), "u32"
    if d in (jnp.dtype(jnp.int8), jnp.dtype(jnp.int16),
             jnp.dtype(jnp.int32)):
        return (x.astype(jnp.int32).view(jnp.uint32)
                ^ jnp.uint32(0x80000000)), "i32"
    if d in (jnp.dtype(jnp.uint8), jnp.dtype(jnp.uint16),
             jnp.dtype(jnp.uint32)):
        return x.astype(jnp.uint32), "u32"
    if d == jnp.dtype(jnp.float32):
        bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
        sign = (bits >> jnp.uint32(31)) != 0
        enc = jnp.where(sign, ~bits, bits | jnp.uint32(0x80000000))
        enc = jnp.where(jnp.isnan(x), _U32MAX, enc)
        return enc, "f32"
    return None, None


def _asc_dec32(code: jax.Array, kind: str, out_dtype) -> jax.Array:
    if kind == "u32":
        return code.astype(out_dtype)
    if kind == "i32":
        return (code ^ jnp.uint32(0x80000000)).view(jnp.int32).astype(
            out_dtype)
    # f32: invert the sign-split encoding; 0xFFFFFFFF == forced NaN
    neg = (code >> jnp.uint32(31)) == 0
    bits = jnp.where(neg, ~code, code ^ jnp.uint32(0x80000000))
    v = jax.lax.bitcast_convert_type(bits, jnp.float32)
    return jnp.where(code == _U32MAX, jnp.float32(jnp.nan), v).astype(
        out_dtype)


def _seg_extreme_packed(ctx: SegmentContext, enc: jax.Array,
                        is_max: bool) -> jax.Array:
    """(seg,) winning u32 code per run (max of enc / min via ~enc)."""
    work = enc if is_max else ~enc
    packed = (ctx.seg.astype(jnp.int64) << 32) | work.astype(jnp.int64)
    cm = jax.lax.cummax(packed)
    last = jnp.clip(ctx.ends - 1, 0, enc.shape[0] - 1)
    code = (cm[last] & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32)
    return code if is_max else ~code


def seg_reduce_min(ctx, x_sorted):
    enc, kind = _asc_enc32(x_sorted)
    if enc is None:
        return _seg_scan_last(ctx, x_sorted, jnp.minimum)
    if kind == "f32":
        # NaN must WIN a min too (jnp.minimum propagates): smallest code
        enc = jnp.where(jnp.isnan(x_sorted), jnp.uint32(0), enc)
        code = _seg_extreme_packed(ctx, enc, False)
        return jnp.where(code == jnp.uint32(0), jnp.float32(jnp.nan),
                         _asc_dec32(code, kind, x_sorted.dtype)).astype(
            x_sorted.dtype)
    return _asc_dec32(_seg_extreme_packed(ctx, enc, False), kind,
                      x_sorted.dtype)


def seg_reduce_max(ctx, x_sorted):
    enc, kind = _asc_enc32(x_sorted)
    if enc is None:
        return _seg_scan_last(ctx, x_sorted, jnp.maximum)
    return _asc_dec32(_seg_extreme_packed(ctx, enc, True), kind,
                      x_sorted.dtype)


def seg_any(ctx, flags_sorted):
    f = flags_sorted.astype(jnp.bool_)
    return seg_reduce_max(ctx, f.astype(jnp.uint32)) != 0


def seg_all(ctx, flags_sorted):
    f = flags_sorted.astype(jnp.bool_)
    return seg_reduce_min(ctx, f.astype(jnp.uint32)) != 0


def seg_first_row(ctx: SegmentContext, valid_sorted: jax.Array
                  ) -> jax.Array:
    """(seg,) ORIGINAL row id of the first VALID row per run (cap if
    none). Works under the unstable grouping sort: the min is taken over
    ctx.perm, not sorted positions."""
    cap = valid_sorted.shape[0]
    rows = jnp.where(valid_sorted, ctx.perm, cap)
    return seg_reduce_min(ctx, rows)


def seg_last_row(ctx: SegmentContext, valid_sorted: jax.Array
                 ) -> jax.Array:
    rows = jnp.where(valid_sorted, ctx.perm, -1)
    return seg_reduce_max(ctx, rows)
