"""Grouped + scalar aggregation kernels.

Reference: the GroupedAggregator state protocol
(``hash_aggregate_internal.h:39-58``: Resize/Consume(values, group_ids)/
Merge(other, group_id_mapping)/Finalize) and the kernel set in
``hash_aggregate.cc`` / ``hash_aggregate_numeric.cc`` / ``aggregate_basic.cc``.

TPU-native: Consume is a masked **scatter-accumulate** over the group-id
axis (``.at[gid].add/min/max`` — XLA lowers to vectorized scatters);
Merge re-keys one state into another through a group-id mapping, which is
exactly the cross-shard combine used by the distributed engine (per-chip
partial states -> all_to_all by key -> Merge).

Aggregator states are pytrees of fixed-capacity (max_groups,) buffers, so a
whole multi-aggregate consume jits into one fused pass over the batch.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core import datatype as dt
from ..core.array import Array, row_mask
from ..compute.registry import Kind, NullHandling, register_function
from ..compute.scalar import Scalar

__all__ = [
    "GroupedAggregator", "make_grouped_aggregator", "GROUPED_AGGREGATORS",
    "ScalarAggregateOptions", "CountOptions", "VarianceOptions",
]


from .agg_options import (  # noqa: F401  (re-export, public API location)
    CountOptions, ScalarAggregateOptions, VarianceOptions,
)


def _sum_output_type(t: dt.DataType) -> dt.DataType:
    if t.is_floating:
        return t
    if isinstance(t, dt.BoolType):
        return dt.uint64
    if t.is_signed_integer:
        return dt.int64
    return dt.uint64


def _contrib_mask(values: Array, group_ids: jax.Array) -> jax.Array:
    """Rows that contribute: in a group AND valid (skip_nulls)."""
    m = group_ids >= 0
    if values.validity is not None:
        m = m & values.validity
    return m


def _positions(mask: jax.Array, group_ids: jax.Array, G: int) -> jax.Array:
    """Scatter positions: group id, or G (dropped) for non-contributors."""
    return jnp.where(mask, group_ids, G)


# ---- segment-consume helpers (the TPU fast path; see ops/segment.py) --------

def _sorted_inputs(values: Optional[Array], ctx):
    """(values-in-sorted-order | None, contribution flags in sorted order).
    skip_nulls semantics: a row contributes iff active AND valid.
    Columns that rode the grouping sort as payloads come from
    ctx.sorted_cols (no gather); others gather through perm."""
    ok = ctx.s_active
    v_sorted = None
    if values is not None:
        cached = ctx.sorted_cols.get(id(values.values)) \
            if ctx.sorted_cols else None
        if cached is not None:
            v_sorted, valid_sorted = cached
            if valid_sorted is not None:
                ok = ok & valid_sorted
        else:
            v_sorted = values.values[ctx.perm]
            if values.validity is not None:
                ok = ok & values.validity[ctx.perm]
    return v_sorted, ok


def _gpos(ctx, G: int) -> jax.Array:
    """(seg,) scatter targets: persistent gid per segment, G for pads —
    unique indices by construction (one write per distinct group)."""
    return jnp.where(ctx.gid_global >= 0, ctx.gid_global, G)


class GroupedAggregator:
    """Base class. Subclasses define init/consume/merge/finalize."""

    name: str = ""
    # True when every state leaf is a (G, ...) per-group row array, so a
    # distributed combine can all_to_all state ROWS by key hash and fold
    # them with `merge` (parallel/context pre-aggregated exchange).
    # Aggregators with packed/global buffers (tdigest, count_distinct,
    # list, pivot) opt out and force the raw-row shuffle path.
    dist_rows: bool = True

    def __init__(self, in_type: Optional[dt.DataType], G: int, options=None):
        self.in_type = in_type
        self.G = G
        self.options = options

    def init(self):
        raise NotImplementedError

    def consume(self, state, values: Optional[Array], group_ids: jax.Array):
        raise NotImplementedError

    def merge(self, state, other, mapping: jax.Array):
        """Fold `other`'s group g into this state's group mapping[g]."""
        raise NotImplementedError

    def consume_grouped(self, state, values: Optional[Array], ctx):
        """Segment-reduction consume over a sort-grouped batch
        (ops/segment.SegmentContext). Default falls back to the row-scatter
        consume; hot aggregators override with cumsum/scan reductions whose
        only scatter writes one element per distinct group."""
        return self.consume(state, values, ctx.row_gids)

    def finalize(self, state, num_groups) -> Array:
        raise NotImplementedError


class GroupedCount(GroupedAggregator):
    """hash_count (``hash_aggregate.cc:108``); CountOptions modes."""

    name = "count"
    out_type = dt.int64

    def init(self):
        return jnp.zeros((self.G,), dtype=jnp.int64)

    def consume(self, state, values, group_ids):
        mode = self.options.mode if isinstance(self.options, CountOptions) \
            else "only_valid"
        in_group = group_ids >= 0
        if values is None or values.validity is None:
            ok = in_group if mode != "only_null" else jnp.zeros_like(in_group)
        elif mode == "only_valid":
            ok = in_group & values.validity
        elif mode == "only_null":
            ok = in_group & ~values.validity
        else:
            ok = in_group
        pos = _positions(ok, group_ids, self.G)
        return state.at[pos].add(jnp.ones_like(pos, dtype=jnp.int64),
                                 mode="drop")

    def merge(self, state, other, mapping):
        return state.at[mapping].add(other, mode="drop")

    def consume_grouped(self, state, values, ctx):
        from .segment import seg_sum
        mode = self.options.mode if isinstance(self.options, CountOptions) \
            else "only_valid"
        if values is None or values.validity is None:
            ok = ctx.s_active if mode != "only_null" else \
                jnp.zeros_like(ctx.s_active)
        else:
            vs = values.validity[ctx.perm]
            if mode == "only_valid":
                ok = ctx.s_active & vs
            elif mode == "only_null":
                ok = ctx.s_active & ~vs
            else:
                ok = ctx.s_active
        partial = seg_sum(ctx, ok.astype(jnp.int64))
        return state.at[_gpos(ctx, self.G)].add(partial, mode="drop",
                                                unique_indices=True)

    def finalize(self, state, num_groups) -> Array:
        return Array(dt.int64, state, None, length=num_groups)


class GroupedCountAll(GroupedCount):
    """hash_count_all (``hash_aggregate.cc:62``) — nullary, counts rows."""

    name = "count_all"

    def consume(self, state, values, group_ids):
        ok = group_ids >= 0
        pos = _positions(ok, group_ids, self.G)
        return state.at[pos].add(jnp.ones_like(pos, dtype=jnp.int64),
                                 mode="drop")

    def consume_grouped(self, state, values, ctx):
        from .segment import seg_sum
        partial = seg_sum(ctx, ctx.s_active.astype(jnp.int64))
        return state.at[_gpos(ctx, self.G)].add(partial, mode="drop",
                                                unique_indices=True)


class GroupedSum(GroupedAggregator):
    """hash_sum (``hash_aggregate_numeric.cc:275``)."""

    name = "sum"

    @property
    def out_type(self):
        return _sum_output_type(self.in_type)

    @property
    def _acc_dtype(self):
        return jnp.dtype(self.out_type.storage_np)

    def init(self):
        return (jnp.zeros((self.G,), dtype=self._acc_dtype),
                jnp.zeros((self.G,), dtype=jnp.int64))

    def consume(self, state, values, group_ids):
        acc, cnt = state
        ok = _contrib_mask(values, group_ids)
        pos = _positions(ok, group_ids, self.G)
        v = values.values.astype(self._acc_dtype)
        v = jnp.where(ok, v, jnp.zeros_like(v))
        return (acc.at[pos].add(v, mode="drop"),
                cnt.at[pos].add(ok.astype(jnp.int64), mode="drop"))

    def merge(self, state, other, mapping):
        acc, cnt = state
        oacc, ocnt = other
        return (acc.at[mapping].add(oacc, mode="drop"),
                cnt.at[mapping].add(ocnt, mode="drop"))

    def consume_grouped(self, state, values, ctx):
        from .segment import seg_sum
        acc, cnt = state
        v_sorted, ok = _sorted_inputs(values, ctx)
        x = jnp.where(ok, v_sorted.astype(self._acc_dtype), 0)
        gp = _gpos(ctx, self.G)
        return (acc.at[gp].add(seg_sum(ctx, x), mode="drop",
                               unique_indices=True),
                cnt.at[gp].add(seg_sum(ctx, ok.astype(jnp.int64)),
                               mode="drop", unique_indices=True))

    def finalize(self, state, num_groups) -> Array:
        acc, cnt = state
        # all-null / empty group -> null (Arrow: sum of no rows is null)
        validity = cnt > 0
        return Array(self.out_type, acc, validity, length=num_groups)


class GroupedProduct(GroupedSum):
    name = "product"

    def init(self):
        return (jnp.ones((self.G,), dtype=self._acc_dtype),
                jnp.zeros((self.G,), dtype=jnp.int64))

    def consume(self, state, values, group_ids):
        acc, cnt = state
        ok = _contrib_mask(values, group_ids)
        pos = _positions(ok, group_ids, self.G)
        v = values.values.astype(self._acc_dtype)
        v = jnp.where(ok, v, jnp.ones_like(v))
        return (acc.at[pos].multiply(v, mode="drop"),
                cnt.at[pos].add(ok.astype(jnp.int64), mode="drop"))

    def merge(self, state, other, mapping):
        acc, cnt = state
        oacc, ocnt = other
        return (acc.at[mapping].multiply(oacc, mode="drop"),
                cnt.at[mapping].add(ocnt, mode="drop"))

    def consume_grouped(self, state, values, ctx):
        from .segment import seg_prod, seg_sum
        acc, cnt = state
        v_sorted, ok = _sorted_inputs(values, ctx)
        x = jnp.where(ok, v_sorted.astype(self._acc_dtype),
                      jnp.ones((), self._acc_dtype))
        gp = _gpos(ctx, self.G)
        return (acc.at[gp].multiply(seg_prod(ctx, x), mode="drop",
                                    unique_indices=True),
                cnt.at[gp].add(seg_sum(ctx, ok.astype(jnp.int64)),
                               mode="drop", unique_indices=True))


class GroupedMean(GroupedSum):
    """hash_mean (``hash_aggregate_numeric.cc:360``) — always float64 out."""

    name = "mean"
    out_type = dt.float64

    @property
    def _acc_dtype(self):
        return jnp.float64

    def finalize(self, state, num_groups) -> Array:
        acc, cnt = state
        validity = cnt > 0
        mean = acc / jnp.where(cnt > 0, cnt, 1).astype(jnp.float64)
        return Array(dt.float64, mean, validity, length=num_groups)


class _GroupedExtremum(GroupedAggregator):
    is_min = True

    @property
    def out_type(self):
        return self.in_type

    def _identity(self, dtype):
        if jnp.issubdtype(dtype, jnp.floating):
            v = jnp.inf if self.is_min else -jnp.inf
            return jnp.asarray(v, dtype=dtype)
        info = jnp.iinfo(dtype)
        return jnp.asarray(info.max if self.is_min else info.min,
                           dtype=dtype)

    def init(self):
        d = jnp.dtype(self.in_type.storage_np)
        if d == jnp.bool_:
            d = jnp.uint8
        return (jnp.full((self.G,), self._identity(d), dtype=d),
                jnp.zeros((self.G,), dtype=jnp.int64))

    def consume(self, state, values, group_ids):
        acc, cnt = state
        ok = _contrib_mask(values, group_ids)
        pos = _positions(ok, group_ids, self.G)
        v = values.values.astype(acc.dtype)
        ident = self._identity(acc.dtype)
        v = jnp.where(ok, v, ident)
        # NaN handling: Arrow min/max skip NaNs only with skip_nulls?
        # Arrow treats NaN as a value for min/max (propagates). jnp.minimum
        # propagates NaN; scatter-min uses min which propagates — matches.
        if self.is_min:
            acc = acc.at[pos].min(v, mode="drop")
        else:
            acc = acc.at[pos].max(v, mode="drop")
        return acc, cnt.at[pos].add(ok.astype(jnp.int64), mode="drop")

    def merge(self, state, other, mapping):
        acc, cnt = state
        oacc, ocnt = other
        if self.is_min:
            acc = acc.at[mapping].min(oacc, mode="drop")
        else:
            acc = acc.at[mapping].max(oacc, mode="drop")
        return acc, cnt.at[mapping].add(ocnt, mode="drop")

    def consume_grouped(self, state, values, ctx):
        from .segment import seg_reduce_max, seg_reduce_min, seg_sum
        acc, cnt = state
        v_sorted, ok = _sorted_inputs(values, ctx)
        ident = self._identity(acc.dtype)
        x = jnp.where(ok, v_sorted.astype(acc.dtype), ident)
        partial = seg_reduce_min(ctx, x) if self.is_min else \
            seg_reduce_max(ctx, x)
        gp = _gpos(ctx, self.G)
        if self.is_min:
            acc = acc.at[gp].min(partial, mode="drop", unique_indices=True)
        else:
            acc = acc.at[gp].max(partial, mode="drop", unique_indices=True)
        return acc, cnt.at[gp].add(seg_sum(ctx, ok.astype(jnp.int64)),
                                   mode="drop", unique_indices=True)

    def finalize(self, state, num_groups) -> Array:
        acc, cnt = state
        validity = cnt > 0
        out = acc
        if isinstance(self.in_type, dt.BoolType):
            out = acc.astype(jnp.bool_)
        return Array(self.in_type, out, validity, length=num_groups)


class GroupedMin(_GroupedExtremum):
    name = "min"
    is_min = True


class GroupedMax(_GroupedExtremum):
    name = "max"
    is_min = False


class GroupedAny(GroupedAggregator):
    """hash_any (``hash_aggregate.cc:1224``)."""

    name = "any"
    out_type = dt.bool_

    def init(self):
        return (jnp.zeros((self.G,), dtype=jnp.bool_),
                jnp.zeros((self.G,), dtype=jnp.int64))

    def consume(self, state, values, group_ids):
        acc, cnt = state
        ok = _contrib_mask(values, group_ids)
        pos = _positions(ok, group_ids, self.G)
        v = values.values.astype(jnp.bool_) & ok
        return (acc.at[pos].max(v, mode="drop"),
                cnt.at[pos].add(ok.astype(jnp.int64), mode="drop"))

    def merge(self, state, other, mapping):
        acc, cnt = state
        oacc, ocnt = other
        return (acc.at[mapping].max(oacc, mode="drop"),
                cnt.at[mapping].add(ocnt, mode="drop"))

    def consume_grouped(self, state, values, ctx):
        from .segment import seg_any, seg_sum
        acc, cnt = state
        v_sorted, ok = _sorted_inputs(values, ctx)
        gp = _gpos(ctx, self.G)
        partial = seg_any(ctx, v_sorted.astype(jnp.bool_) & ok)
        return (acc.at[gp].max(partial, mode="drop", unique_indices=True),
                cnt.at[gp].add(seg_sum(ctx, ok.astype(jnp.int64)),
                               mode="drop", unique_indices=True))

    def finalize(self, state, num_groups) -> Array:
        acc, cnt = state
        return Array(dt.bool_, acc, cnt > 0, length=num_groups)


class GroupedAll(GroupedAggregator):
    name = "all"
    out_type = dt.bool_

    def init(self):
        return (jnp.ones((self.G,), dtype=jnp.bool_),
                jnp.zeros((self.G,), dtype=jnp.int64))

    def consume(self, state, values, group_ids):
        acc, cnt = state
        ok = _contrib_mask(values, group_ids)
        pos = _positions(ok, group_ids, self.G)
        v = values.values.astype(jnp.bool_) | ~ok
        return (acc.at[pos].min(v, mode="drop"),
                cnt.at[pos].add(ok.astype(jnp.int64), mode="drop"))

    def merge(self, state, other, mapping):
        acc, cnt = state
        oacc, ocnt = other
        return (acc.at[mapping].min(oacc, mode="drop"),
                cnt.at[mapping].add(ocnt, mode="drop"))

    def consume_grouped(self, state, values, ctx):
        from .segment import seg_all, seg_sum
        acc, cnt = state
        v_sorted, ok = _sorted_inputs(values, ctx)
        gp = _gpos(ctx, self.G)
        partial = seg_all(ctx, v_sorted.astype(jnp.bool_) | ~ok)
        return (acc.at[gp].min(partial, mode="drop", unique_indices=True),
                cnt.at[gp].add(seg_sum(ctx, ok.astype(jnp.int64)),
                               mode="drop", unique_indices=True))

    def finalize(self, state, num_groups) -> Array:
        acc, cnt = state
        return Array(dt.bool_, acc, cnt > 0, length=num_groups)


class GroupedVariance(GroupedAggregator):
    """hash_variance/hash_stddev (``GroupedStatisticImpl``,
    ``hash_aggregate_numeric.cc:458``). Sum/sumsq moments in float64; the
    mean-shifted merge differences vs Arrow's incremental algorithm are
    within float tolerance (tested with rtol)."""

    name = "variance"
    out_type = dt.float64
    is_std = False

    def init(self):
        z = jnp.zeros((self.G,), dtype=jnp.float64)
        return (z, z, jnp.zeros((self.G,), dtype=jnp.int64))

    def consume(self, state, values, group_ids):
        s, ss, cnt = state
        ok = _contrib_mask(values, group_ids)
        pos = _positions(ok, group_ids, self.G)
        v = values.values.astype(jnp.float64)
        v = jnp.where(ok, v, 0.0)
        return (s.at[pos].add(v, mode="drop"),
                ss.at[pos].add(v * v, mode="drop"),
                cnt.at[pos].add(ok.astype(jnp.int64), mode="drop"))

    def merge(self, state, other, mapping):
        s, ss, cnt = state
        os_, oss, ocnt = other
        return (s.at[mapping].add(os_, mode="drop"),
                ss.at[mapping].add(oss, mode="drop"),
                cnt.at[mapping].add(ocnt, mode="drop"))

    def consume_grouped(self, state, values, ctx):
        from .segment import seg_sum
        s, ss, cnt = state
        v_sorted, ok = _sorted_inputs(values, ctx)
        x = jnp.where(ok, v_sorted.astype(jnp.float64), 0.0)
        gp = _gpos(ctx, self.G)
        return (s.at[gp].add(seg_sum(ctx, x), mode="drop",
                             unique_indices=True),
                ss.at[gp].add(seg_sum(ctx, x * x), mode="drop",
                              unique_indices=True),
                cnt.at[gp].add(seg_sum(ctx, ok.astype(jnp.int64)),
                               mode="drop", unique_indices=True))

    def finalize(self, state, num_groups) -> Array:
        s, ss, cnt = state
        ddof = self.options.ddof if isinstance(
            self.options, VarianceOptions) else 0
        n = cnt.astype(jnp.float64)
        denom = n - ddof
        validity = denom > 0
        mean = s / jnp.where(cnt > 0, n, 1.0)
        var = (ss - n * mean * mean) / jnp.where(validity, denom, 1.0)
        var = jnp.maximum(var, 0.0)  # clamp catastrophic-cancellation dust
        out = jnp.sqrt(var) if self.is_std else var
        return Array(dt.float64, out, validity, length=num_groups)


class GroupedStddev(GroupedVariance):
    name = "stddev"
    is_std = True


class GroupedFirst(GroupedAggregator):
    """hash_first/hash_last (``hash_aggregate.cc:730``): value at the
    smallest/largest global row position per group (skip_nulls default).

    State: (best_pos, value, seen_count); consume tracks a monotonically
    increasing global row counter so multiple Consume calls order correctly.
    """

    name = "first"
    is_first = True

    @property
    def out_type(self):
        return self.in_type

    def init(self):
        d = jnp.dtype(self.in_type.storage_np)
        if d == jnp.bool_:
            d = jnp.uint8
        sentinel = jnp.iinfo(jnp.int64).max if self.is_first else -1
        return (jnp.full((self.G,), sentinel, dtype=jnp.int64),
                jnp.zeros((self.G,), dtype=d),
                jnp.int64(0))

    def consume(self, state, values, group_ids):
        best, val, base = state
        cap = values.capacity
        ok = _contrib_mask(values, group_ids)
        pos = _positions(ok, group_ids, self.G)
        rows = base + jax.lax.broadcasted_iota(
            jnp.int64, (cap, 1), 0).reshape((cap,))
        if self.is_first:
            cand = jnp.where(ok, rows, jnp.iinfo(jnp.int64).max)
            best2 = best.at[pos].min(cand, mode="drop")
        else:
            cand = jnp.where(ok, rows, -1)
            best2 = best.at[pos].max(cand, mode="drop")
        # winner rows write their value
        winner = ok & (best2[group_ids.clip(0)] == rows)
        wpos = _positions(winner, group_ids, self.G)
        v = values.values.astype(val.dtype)
        val2 = val.at[wpos].set(v, mode="drop")
        return best2, val2, base + jnp.int64(cap)

    def consume_grouped(self, state, values, ctx):
        from .segment import seg_first_row, seg_last_row
        best, val, base = state
        cap = values.capacity
        _, ok = _sorted_inputs(values, ctx)
        if self.is_first:
            rowid = seg_first_row(ctx, ok)      # original row id or cap
            has = rowid < cap
        else:
            rowid = seg_last_row(ctx, ok)       # original row id or -1
            has = rowid >= 0
        rc = jnp.clip(rowid, 0, cap - 1)
        sentinel = jnp.iinfo(jnp.int64).max if self.is_first else \
            jnp.int64(-1)
        cand = jnp.where(has, base + rowid.astype(jnp.int64), sentinel)
        gp = jnp.where(has & (ctx.gid_global >= 0), ctx.gid_global, self.G)
        if self.is_first:
            best2 = best.at[gp].min(cand, mode="drop", unique_indices=True)
        else:
            best2 = best.at[gp].max(cand, mode="drop", unique_indices=True)
        take = has & (ctx.gid_global >= 0) & (
            best2[jnp.clip(ctx.gid_global, 0, self.G - 1)] == cand)
        wsel = jnp.where(take, ctx.gid_global, self.G)
        # gather winners from the ORIGINAL column ((R,) rows — cheap)
        v = values.values[rc].astype(val.dtype)
        val2 = val.at[wsel].set(v, mode="drop", unique_indices=True)
        return best2, val2, base + jnp.int64(cap)

    def merge(self, state, other, mapping):
        best, val, base = state
        obest, oval, obase = other
        if self.is_first:
            newbest = best.at[mapping].min(obest, mode="drop")
        else:
            newbest = best.at[mapping].max(obest, mode="drop")
        takes = newbest[mapping] == obest
        G = mapping.shape[0]
        wpos = jnp.where(takes, mapping, self.G)
        val = val.at[wpos].set(oval, mode="drop")
        return newbest, val, jnp.maximum(base, obase)

    def finalize(self, state, num_groups) -> Array:
        best, val, _ = state
        sentinel = jnp.iinfo(jnp.int64).max if self.is_first else -1
        validity = best != sentinel
        out = val
        if isinstance(self.in_type, dt.BoolType):
            out = val.astype(jnp.bool_)
        return Array(self.in_type, out, validity, length=num_groups)


class GroupedLast(GroupedFirst):
    name = "last"
    is_first = False


class GroupedOne(GroupedLast):
    """hash_one (``hash_aggregate.cc:1550``) — any value per group."""
    name = "one"


class GroupedCountDistinct(GroupedAggregator):
    """hash_count_distinct (``hash_aggregate.cc:1394``).

    TPU-native: a second Grouper over (group_id, value) pairs — the pair
    table remembers which values each group has seen, so the distinct count
    per group is one occupied-slot scan at finalize. Cross-shard Merge
    replays the other table's occupied slots with remapped group-id lanes.
    """

    dist_rows = False

    name = "count_distinct"
    out_type = dt.int64

    def __init__(self, in_type, G, options=None):
        super().__init__(in_type, G, options)
        from .grouper import Grouper
        self.mode = options.mode if isinstance(options, CountOptions) \
            else "only_valid"
        nullable_val = self.mode == "all"
        # pair capacity: every group may hold several distinct values
        self.max_pairs = getattr(options, "max_pairs", None) or max(4 * G,
                                                                    1 << 12)
        self.pair_grouper = Grouper([dt.int32, in_type],
                                    [False, nullable_val],
                                    max_groups=self.max_pairs)

    def init(self):
        return self.pair_grouper.init_state()

    def consume(self, state, values, group_ids):
        cap = values.capacity
        active = group_ids >= 0
        if self.mode == "only_valid" and values.validity is not None:
            active = active & values.validity
        gid_col = Array(dt.int32, group_ids, None, length=cap)
        val_col = values if self.mode == "all" else values.with_validity(None)
        new_state, _ = self.pair_grouper.consume(
            state, [gid_col, val_col], length=cap, active=active)
        return new_state

    def _table_gid_lane(self, state):
        return state.table_lanes[:, 0].astype(jnp.int32)

    def merge(self, state, other, mapping):
        occupied = other.table_gid >= 0
        gid = other.table_lanes[:, 0].astype(jnp.int32)
        new_gid = mapping[jnp.clip(gid, 0, mapping.shape[0] - 1)]
        lanes = other.table_lanes.at[:, 0].set(new_gid.astype(jnp.uint32))
        new_state, _ = self.pair_grouper._consume_lanes(
            state, lanes, occupied)
        return new_state

    def finalize(self, state, num_groups) -> Array:
        occupied = state.table_gid >= 0
        gid = self._table_gid_lane(state)
        counts = jnp.zeros((self.G,), dtype=jnp.int64).at[
            jnp.where(occupied, gid, self.G)].add(1, mode="drop")
        return Array(dt.int64, counts, None, length=num_groups)


class _GroupedMoments(GroupedAggregator):
    """Shared state for hash_skew/hash_kurtosis (``GroupedStatisticImpl``,
    ``hash_aggregate_numeric.cc:458``): per-group raw power sums in f64."""

    out_type = dt.float64
    nmom = 4

    def init(self):
        return tuple(jnp.zeros((self.G,), dtype=jnp.float64)
                     for _ in range(self.nmom)) + (
            jnp.zeros((self.G,), dtype=jnp.int64),)

    def consume(self, state, values, group_ids):
        ok = _contrib_mask(values, group_ids)
        pos = _positions(ok, group_ids, self.G)
        x = jnp.where(ok, values.values.astype(jnp.float64), 0.0)
        sums = list(state[:-1])
        p = x
        for k in range(self.nmom):
            sums[k] = sums[k].at[pos].add(p, mode="drop")
            p = p * x
        cnt = state[-1].at[pos].add(ok.astype(jnp.int64), mode="drop")
        return tuple(sums) + (cnt,)

    def merge(self, state, other, mapping):
        out = [s.at[mapping].add(o, mode="drop")
               for s, o in zip(state[:-1], other[:-1])]
        return tuple(out) + (state[-1].at[mapping].add(
            other[-1], mode="drop"),)

    def consume_grouped(self, state, values, ctx):
        from .segment import seg_sum
        v_sorted, ok = _sorted_inputs(values, ctx)
        x = jnp.where(ok, v_sorted.astype(jnp.float64), 0.0)
        gp = _gpos(ctx, self.G)
        sums = list(state[:-1])
        p = x
        for k in range(self.nmom):
            sums[k] = sums[k].at[gp].add(seg_sum(ctx, p), mode="drop",
                                         unique_indices=True)
            p = p * x
        cnt = state[-1].at[gp].add(seg_sum(ctx, ok.astype(jnp.int64)),
                                   mode="drop", unique_indices=True)
        return tuple(sums) + (cnt,)

    def _central(self, state):
        s1, s2, s3, s4, cnt = state
        n = cnt.astype(jnp.float64)
        safe_n = jnp.maximum(n, 1.0)
        mean = s1 / safe_n
        m2 = s2 / safe_n - mean ** 2
        m3 = s3 / safe_n - 3 * mean * s2 / safe_n + 2 * mean ** 3
        m4 = (s4 / safe_n - 4 * mean * s3 / safe_n
              + 6 * mean ** 2 * s2 / safe_n - 3 * mean ** 4)
        return n, m2, m3, m4


class GroupedSkew(_GroupedMoments):
    name = "skew"

    def finalize(self, state, num_groups) -> Array:
        n, m2, m3, _ = self._central(state)
        r = jnp.where(m2 > 0, m3 / jnp.sqrt(jnp.maximum(m2, 1e-300)) ** 3,
                      jnp.nan)
        return Array(dt.float64, r, state[-1] > 0, length=num_groups)


class GroupedKurtosis(_GroupedMoments):
    name = "kurtosis"

    def finalize(self, state, num_groups) -> Array:
        n, m2, _, m4 = self._central(state)
        r = jnp.where(m2 > 0, m4 / jnp.maximum(m2 * m2, 1e-300) - 3.0,
                      jnp.nan)
        return Array(dt.float64, r, state[-1] > 0, length=num_groups)


class GroupedTDigest(GroupedAggregator):
    """hash_tdigest / hash_approximate_median (``hash_aggregate_numeric.cc``
    GroupedTDigestImpl :903).

    TPU-native: buffers (group_id, value) pairs in fixed-capacity device
    buffers and computes EXACT per-group quantiles at finalize with one
    sort + searchsorted segment interpolation — a t-digest with
    delta -> inf (strictly more accurate; the digest's purpose is bounded
    memory, which the capacity discipline provides explicitly). Consume
    appends whole capacity blocks; `buffer_rows` must cover the total rows
    routed to this aggregator (deferred-error flag on overflow).

    Output divergence: Arrow emits fixed_size_list<double>[#q]; this engine
    emits one float64 column for scalar q (the common case).
    """

    dist_rows = False

    name = "tdigest"
    out_type = dt.float64
    default_rows = 1 << 16

    def __init__(self, in_type, G, options=None):
        super().__init__(in_type, G, options)
        from .aggregates_order import TDigestOptions
        self.qs = list(getattr(options, "q", None) or [0.5])
        if np.isscalar(self.qs):
            self.qs = [self.qs]
        self.rows = getattr(options, "buffer_rows", None) or \
            self.default_rows

    def init(self):
        return (jnp.full((self.rows,), -1, dtype=jnp.int32),
                jnp.zeros((self.rows,), dtype=jnp.float64),
                jnp.int32(0), jnp.int32(0))

    def _append(self, state, gids, vals):
        bg, bv, cnt, err = state
        n = gids.shape[0]
        err = err | jnp.where(cnt + n > self.rows, 1, 0).astype(jnp.int32)
        start = jnp.minimum(cnt, self.rows - n)
        bg = jax.lax.dynamic_update_slice(bg, gids.astype(jnp.int32),
                                          (start,))
        bv = jax.lax.dynamic_update_slice(bv, vals.astype(jnp.float64),
                                          (start,))
        return bg, bv, cnt + n, err

    def consume(self, state, values, group_ids):
        ok = _contrib_mask(values, group_ids)
        gids = jnp.where(ok, group_ids, -1)
        vals = jnp.where(ok, values.values.astype(jnp.float64), 0.0)
        return self._append(state, gids, vals)

    def merge(self, state, other, mapping):
        og, ov, ocnt, oerr = other
        valid = og >= 0
        remap = jnp.where(valid, mapping[jnp.clip(og, 0,
                                                  mapping.shape[0] - 1)], -1)
        bg, bv, cnt, err = self._append(state, remap, ov)
        return bg, bv, cnt, err | oerr

    def finalize(self, state, num_groups) -> Array:
        bg, bv, cnt, err = state
        active = bg >= 0
        skey = jnp.where(active, bv, jnp.inf)
        gkey = jnp.where(active, bg, jnp.int32(2147483647))
        order = jnp.lexsort((skey, gkey))
        sg = gkey[order]
        sv = bv[order]
        gidx = jax.lax.broadcasted_iota(jnp.int32, (self.G, 1), 0).reshape(
            (self.G,))
        starts = jnp.searchsorted(sg, gidx, side="left").astype(jnp.int32)
        ends = jnp.searchsorted(sg, gidx, side="right").astype(jnp.int32)
        n = (ends - starts).astype(jnp.float64)
        outs = []
        for q in self.qs:
            rank = jnp.asarray(q, jnp.float64) * jnp.maximum(n - 1.0, 0.0)
            lo = starts + jnp.floor(rank).astype(jnp.int32)
            hi = starts + jnp.ceil(rank).astype(jnp.int32)
            lo = jnp.clip(lo, 0, self.rows - 1)
            hi = jnp.clip(hi, 0, self.rows - 1)
            frac = rank - jnp.floor(rank)
            outs.append(sv[lo] + frac * (sv[hi] - sv[lo]))
        out = outs[0] if len(outs) == 1 else jnp.stack(outs, axis=1)
        return Array(dt.float64, out, n > 0, length=num_groups)


class GroupedApproximateMedian(GroupedTDigest):
    name = "approximate_median"

    def __init__(self, in_type, G, options=None):
        super().__init__(in_type, G, options)
        self.qs = [0.5]


class GroupedDecimalSum(GroupedAggregator):
    """hash_sum over decimal columns with EXACT 128-bit accumulation
    (``util/decimal.h:410`` int128 semantics; output type
    decimal(38|76, s) per ``hash_aggregate_numeric.cc`` promotion).

    Each value decomposes into three nonnegative/signed i64 partials —
    hi limb, high-32 and low-32 of the lo limb — each summed exactly in
    int64 (n < 2^31 rows); finalize recombines with explicit carries
    into the two-limb (G, 2) wide-decimal storage. Works for both
    narrow ((cap,) scaled i64) and wide ((cap, 2) limb) inputs. Sums
    beyond +-2^127 scaled units wrap (the reference's release-mode
    decimal sum overflows silently too)."""

    name = "decimal_sum"

    @property
    def out_type(self):
        t = self.in_type
        return dt.DecimalType(38 if t.bits == 128 else 76, t.scale,
                              t.bits)

    def init(self):
        z = jnp.zeros((self.G,), dtype=jnp.int64)
        return (z, z, z, jnp.zeros((self.G,), dtype=jnp.int64))

    def _parts(self, values, ok):
        v = values.values
        if v.ndim == 2:
            lo_u = v[:, 0].astype(jnp.uint64)
            hi = v[:, 1]
        else:
            lo_u = v.astype(jnp.uint64)
            hi = v >> jnp.int64(63)
        lolo = (lo_u & jnp.uint64(0xFFFFFFFF)).astype(jnp.int64)
        lohi = (lo_u >> jnp.uint64(32)).astype(jnp.int64)
        z = jnp.int64(0)
        return (jnp.where(ok, hi, z), jnp.where(ok, lohi, z),
                jnp.where(ok, lolo, z))

    def consume(self, state, values, group_ids):
        hi_a, lohi_a, lolo_a, cnt = state
        ok = _contrib_mask(values, group_ids)
        pos = _positions(ok, group_ids, self.G)
        hi, lohi, lolo = self._parts(values, ok)
        return (hi_a.at[pos].add(hi, mode="drop"),
                lohi_a.at[pos].add(lohi, mode="drop"),
                lolo_a.at[pos].add(lolo, mode="drop"),
                cnt.at[pos].add(ok.astype(jnp.int64), mode="drop"))

    def consume_grouped(self, state, values, ctx):
        from .segment import seg_sum
        hi_a, lohi_a, lolo_a, cnt = state
        v_sorted, ok = _sorted_inputs(values, ctx)
        vv = Array(values.type, v_sorted, None, length=values.length)
        hi, lohi, lolo = self._parts(vv, ok)
        gp = _gpos(ctx, self.G)
        kw = dict(mode="drop", unique_indices=True)
        return (hi_a.at[gp].add(seg_sum(ctx, hi), **kw),
                lohi_a.at[gp].add(seg_sum(ctx, lohi), **kw),
                lolo_a.at[gp].add(seg_sum(ctx, lolo), **kw),
                cnt.at[gp].add(seg_sum(ctx, ok.astype(jnp.int64)), **kw))

    def merge(self, state, other, mapping):
        return tuple(a.at[mapping].add(o, mode="drop")
                     for a, o in zip(state, other))

    def finalize(self, state, num_groups) -> Array:
        hi_a, lohi_a, lolo_a, cnt = state
        # total = hi*2^64 + lohi*2^32 + lolo (mod 2^128), with lolo,
        # lohi exact nonnegative partial sums and hi a signed limb sum
        a = lolo_a.astype(jnp.uint64)
        b_low = (lohi_a.astype(jnp.uint64) &
                 jnp.uint64(0xFFFFFFFF)) << jnp.uint64(32)
        low64 = a + b_low                               # u64 wrap
        carry = (((a >> jnp.uint64(32)) +
                  (lohi_a.astype(jnp.uint64) & jnp.uint64(0xFFFFFFFF)))
                 >> jnp.uint64(32)).astype(jnp.int64)
        hi64 = hi_a + (lohi_a >> jnp.int64(32)) + carry  # i64 wrap
        vals = jnp.stack([low64.astype(jnp.int64), hi64], axis=1)
        return Array(self.out_type, vals, cnt > 0, length=num_groups)


GROUPED_AGGREGATORS = {
    c.name: c for c in [
        GroupedCount, GroupedCountAll, GroupedSum, GroupedProduct,
        GroupedMean, GroupedMin, GroupedMax, GroupedAny, GroupedAll,
        GroupedVariance, GroupedStddev, GroupedFirst, GroupedLast,
        GroupedOne, GroupedCountDistinct, GroupedSkew, GroupedKurtosis,
        GroupedTDigest, GroupedApproximateMedian,
    ]
}


def make_grouped_aggregator(name: str, in_type: Optional[dt.DataType],
                            max_groups: int, options=None
                            ) -> GroupedAggregator:
    key = name[5:] if name.startswith("hash_") else name
    if isinstance(in_type, dt.DecimalType):
        if key == "sum":
            return GroupedDecimalSum(in_type, max_groups, options)
        if key in ("mean", "product", "tdigest", "approximate_median",
                   "variance", "stddev", "skew",
                   "kurtosis") and in_type.wide:
            raise NotImplementedError(
                f"{key} over wide (precision>18) decimals: cast to a "
                "narrower decimal or float first")
    if key not in GROUPED_AGGREGATORS:
        # some aggregators (list, pivot_wider) live in lazily-imported
        # kernel modules
        from ..compute.registry import ensure_kernels_loaded
        ensure_kernels_loaded()
    if key not in GROUPED_AGGREGATORS:
        raise KeyError(f"no grouped aggregator named {name!r}")
    return GROUPED_AGGREGATORS[key](in_type, max_groups, options)


# ---- scalar (whole-array) aggregates ----------------------------------------

def _scalar_reduce(name, a: Array, options) -> Scalar:
    skip_nulls = options.skip_nulls if isinstance(
        options, (ScalarAggregateOptions, VarianceOptions)) else True
    min_count = options.min_count if isinstance(
        options, ScalarAggregateOptions) else (
            options.min_count if isinstance(options, VarianceOptions) else 1)
    present = a.present_mask()
    n_valid = jnp.sum(present)
    has_null_in_range = a.validity is not None
    v = a.values

    def done(value, out_type, valid=True):
        pyv = np.asarray(jax.device_get(value))[()] if hasattr(
            value, "shape") else value
        return Scalar(out_type.storage_np.type(pyv) if valid else None,
                      out_type, is_valid=bool(valid))

    count_ok = bool(jax.device_get(n_valid) >= max(min_count, 1)) \
        if name not in ("count", "count_all") else True
    if not skip_nulls and a.validity is not None:
        any_null = bool(jax.device_get(
            jnp.any(a.row_mask() & ~a.validity)))
        if any_null and name not in ("count", "count_all"):
            count_ok = False

    if name == "count":
        mode = options.mode if isinstance(options, CountOptions) \
            else "only_valid"
        if mode == "only_valid":
            return done(n_valid, dt.int64)
        if mode == "only_null":
            return done(jnp.sum(a.row_mask() & ~a.validity)
                        if a.validity is not None else 0, dt.int64)
        return done(jnp.sum(a.row_mask()), dt.int64)
    if name == "sum":
        t = _sum_output_type(a.type)
        acc = jnp.where(present, v, 0).astype(t.storage_np)
        return done(jnp.sum(acc), t, count_ok)
    if name == "product":
        t = _sum_output_type(a.type)
        acc = jnp.where(present, v, 1).astype(t.storage_np)
        return done(jnp.prod(acc), t, count_ok)
    if name == "mean":
        acc = jnp.where(present, v, 0).astype(jnp.float64)
        m = jnp.sum(acc) / jnp.maximum(n_valid, 1)
        return done(m, dt.float64, count_ok)
    if name in ("min", "max"):
        d = v.dtype if v.dtype != jnp.bool_ else jnp.uint8
        if jnp.issubdtype(d, jnp.floating):
            ident = jnp.inf if name == "min" else -jnp.inf
        else:
            ident = jnp.iinfo(d).max if name == "min" else jnp.iinfo(d).min
        acc = jnp.where(present, v.astype(d), ident)
        r = jnp.min(acc) if name == "min" else jnp.max(acc)
        if isinstance(a.type, dt.BoolType):
            return done(r.astype(jnp.bool_), a.type, count_ok)
        return done(r, a.type, count_ok)
    if name == "any":
        acc = jnp.where(present, v.astype(jnp.bool_), False)
        return done(jnp.any(acc), dt.bool_, count_ok)
    if name == "all":
        acc = jnp.where(present, v.astype(jnp.bool_), True)
        return done(jnp.all(acc), dt.bool_, count_ok)
    if name in ("variance", "stddev"):
        ddof = options.ddof if isinstance(options, VarianceOptions) else 0
        x = jnp.where(present, v, 0).astype(jnp.float64)
        n = n_valid.astype(jnp.float64)
        mean = jnp.sum(x) / jnp.maximum(n, 1.0)
        centered = jnp.where(present, (v.astype(jnp.float64) - mean), 0.0)
        var = jnp.sum(centered * centered) / jnp.maximum(n - ddof, 1.0)
        valid = bool(jax.device_get(n_valid)) and \
            bool(jax.device_get(n_valid) - ddof > 0) and count_ok
        r = jnp.sqrt(var) if name == "stddev" else var
        return done(r, dt.float64, valid)
    raise KeyError(name)


def _register_scalar_aggs():
    for name in ["sum", "product", "mean", "min", "max", "any", "all",
                 "variance", "stddev", "count"]:
        opts_cls = {"count": CountOptions,
                    "variance": VarianceOptions,
                    "stddev": VarianceOptions}.get(name,
                                                   ScalarAggregateOptions)

        def _exec(args, options, _name=name):
            (a,) = args
            return _scalar_reduce(_name, a, options)

        register_function(name, Kind.SCALAR_AGGREGATE, 1,
                          null_handling=NullHandling.COMPUTED,
                          options_class=opts_cls)(_exec)


_register_scalar_aggs()


@register_function("count_all", Kind.SCALAR_AGGREGATE, 1,
                   null_handling=NullHandling.COMPUTED)
def _count_all(args, options):
    """Row count including nulls (aggregate_basic.cc CountAll)."""
    (a,) = args
    import jax as _jax
    import numpy as _np
    n = int(_np.asarray(_jax.device_get(a.length))) \
        if not isinstance(a.length, (int, _np.integer)) else int(a.length)
    return Scalar(n, dt.int64)


def _register_hash_aggs():
    """Register hash_* names for registry parity (initialize.cc registers
    the grouped kernels as functions too). Direct CallFunction on them
    errors like the reference — they only execute through grouped
    contexts (the aggregate node / Table.group_by)."""
    from .agg_options import PivotWiderOptions

    for key in list(GROUPED_AGGREGATORS) + ["count_all", "min_max",
                                            "first_last", "distinct",
                                            "any", "all", "list",
                                            "pivot_wider"]:
        name = f"hash_{key}"
        if name in ("hash_count_all",):
            pass

        def _exec(args, options, _n=name):
            raise ValueError(
                f"Direct calls to \"{_n}\" are not valid: hash "
                f"aggregates execute through group_by/aggregate nodes")
        try:
            register_function(name, Kind.HASH_AGGREGATE, -1,
                              null_handling=NullHandling.COMPUTED)(_exec)
        except KeyError:
            pass


_register_hash_aggs()
