"""Streaming, skew-immune distributed grouped aggregation.

Design (green-field per SURVEY.md §2.8 — the reference's Acero is
single-process; its per-thread-state + Merge protocol,
``groupby_aggregate_node.cc:255``, is the model for the cross-shard
combine):

  1. **Local pre-aggregation**: each shard consumes its stream of local
     batches into a per-shard HashAggregate state — no data movement at
     all during the stream.
  2. **State-row exchange**: at finalize, each shard's per-group state
     ROWS (unique keys + one row per aggregator state leaf) all_to_all
     by key hash. A key that appears on every shard costs exactly one
     row per shard — Zipf-skewed DATA cannot overflow the exchange
     (the classic combiner argument), unlike a raw-row shuffle where one
     hot key funnels its entire mass to one destination bucket.
  3. **Merge**: the receiving shard folds the rows with the existing
     Merge protocol (``HashAggregate.merge_rows``) — aggregator states
     compose exactly as in the reference's Merge-with-group_id_mapping.

Requires every aggregator's state to be per-group row-shaped
(``GroupedAggregator.dist_rows``); `DistContext.group_by` falls back to
the raw-row shuffle for the rest (tdigest, count_distinct, list, pivot).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..core import datatype as dt
from ..core.array import Array, row_mask
from ..core.batch import Batch, Table
from ..core.schema import Schema
from ..compute.expressions import Expression, execute_scalar_expression
from ..ops.hash_aggregate import AggregateSpec, HashAggregate
from ..ops.grouper import SlotStrings
from ..ops.hashing import hash32
from ..ops.selection import filter_batch
from .shuffle import shuffle_rows

__all__ = ["DistGroupBy"]

# decorrelated from the row-shuffle seed AND the grouper hash
_STATE_EXCHANGE_SEED = 0x1B873593


def _scalarize(x):
    return x.reshape(()) if x.ndim == 1 and x.shape[0] == 1 else x


def _vectorize(x):
    x = jnp.asarray(x)
    return x.reshape((1,)) if x.ndim == 0 else x


class DistGroupBy:
    """Streaming distributed grouped aggregation over a 1-D mesh.

    Usage::

        dgb = DistGroupBy(ctx, schema, ["k"], [("sum", "v")])
        state = dgb.init_state()
        for batch in stream:            # each batch sharded over the mesh
            state = dgb.consume(state, batch)
        table = dgb.finalize_table(state)
    """

    def __init__(self, ctx, schema: Schema, keys: Sequence[str],
                 aggregates: Sequence, max_groups_per_shard: int = 1 << 14,
                 pre_filter: Optional[Expression] = None):
        self.ctx = ctx
        self.axis = ctx.axis
        self.n = ctx.n
        self.schema = schema
        self.pre_filter = pre_filter
        aggs = [a if isinstance(a, AggregateSpec) else AggregateSpec(*a)
                for a in aggregates]
        self.ha = HashAggregate(schema, keys, aggs,
                                max_groups=max_groups_per_shard)
        if not self.ha.supports_state_exchange:
            raise ValueError(
                "DistGroupBy needs row-shaped aggregator states "
                "(GroupedAggregator.dist_rows); use DistContext.group_by "
                "which falls back to the raw-row shuffle")
        self.G = max_groups_per_shard
        # build the state template (uniques pre-initialized so the pytree
        # structure is stable from init through every consume)
        self._template = self._init_full_state()
        _, self._treedef = jax.tree_util.tree_flatten(self._template)
        self._consume_cache = {}
        self._finalize_fn = None
        # dictionaries of dict-typed key columns, captured at consume for
        # host-side reattachment to the finalized output (devices carry
        # only the codes; dictionaries are replicated shared metadata)
        self._key_dicts = {}

    # ------------------------------------------------------------------
    def _init_full_state(self):
        grouper_state = self.ha.grouper.init_state()
        agg_states = tuple(a.init() for a in self.ha._aggregators)
        uniques = []
        for f in self.ha.key_fields:
            if f.type.is_varlen:
                uniques.append(SlotStrings.init(
                    self.G, self.ha.grouper.varlen_slot_bytes))
            else:
                uniques.append(Array(
                    f.type,
                    jnp.zeros((self.G,), dtype=f.type.storage_np),
                    jnp.zeros((self.G,), dtype=jnp.bool_)))
        return (grouper_state, agg_states, tuple(uniques))

    def _pack(self, state):
        leaves = jax.tree_util.tree_leaves(state)
        return tuple(_vectorize(l) for l in leaves)

    def _unpack(self, leaves):
        return jax.tree_util.tree_unflatten(
            self._treedef, [_scalarize(jnp.asarray(l)) for l in leaves])

    # ------------------------------------------------------------------
    def init_state(self):
        """Per-shard init states, sharded over the mesh axis."""
        def mk():
            return self._pack(self._init_full_state())
        nspec = tuple(P(self.axis) for _ in
                      jax.tree_util.tree_leaves(self._template))
        fn = jax.jit(jax.shard_map(
            mk, mesh=self.ctx.mesh, in_specs=(), out_specs=nspec,
            check_vma=False))
        return fn()

    # ------------------------------------------------------------------
    def consume(self, state, b: Batch):
        """Consume one batch (auto-sharded if needed) into the per-shard
        local states. Pure local compute — no collectives; the jitted
        step is cached by batch structure so a stream of same-shaped
        morsels compiles once."""
        from .context import _batch_leaves
        b = self.ctx.shard_batch(b) if not self.ctx._is_sharded(b) else b
        raw = _batch_leaves(b)
        mask_none = tuple(l is None for l in raw)
        real = [l if l is not None else jnp.zeros((self.n,), jnp.bool_)
                for l in raw]
        # dictionaries ride as replicated args (NOT closure constants —
        # baking them would poison the compile cache across batches)
        dict_plan = []       # (col index, has_validity, has_offsets)
        dict_leaves = []
        for i in range(b.num_columns):
            d = b.column(i).dictionary
            f = b.schema.fields[i]
            if d is None or not isinstance(f.type, dt.DictionaryType):
                continue
            dict_plan.append((i, d.validity is not None,
                              d.offsets is not None))
            dict_leaves.append(d.values)
            if d.validity is not None:
                dict_leaves.append(d.validity)
            if d.offsets is not None:
                dict_leaves.append(d.offsets)
            if f.name in self.ha.keys:
                self._key_dicts[f.name] = d
        key = (b.schema, b.capacity, mask_none, tuple(dict_plan))
        fn = self._consume_cache.get(key)
        if fn is None:
            fn = self._build_consume_fn(b.schema, b.capacity, mask_none,
                                        tuple(dict_plan),
                                        len(state), len(real))
            self._consume_cache[key] = fn
        return fn(state, tuple(real), tuple(dict_leaves),
                  jnp.asarray(len(b), jnp.int32))

    def _build_consume_fn(self, schema, capacity, mask_none, dict_plan,
                          n_state, n_real):
        from .context import _local_batch
        n, axis = self.n, self.axis
        local_cap = capacity // n
        pre_filter = self.pre_filter
        ha = self.ha

        def step(st_leaves, leaves, dleaves, glen):
            i = jax.lax.axis_index(axis)
            local_len = jnp.clip(
                glen.astype(jnp.int32) - i.astype(jnp.int32) * local_cap,
                0, local_cap)
            leaves = [None if none else l
                      for l, none in zip(leaves, mask_none)]
            dicts = [None] * len(schema)
            it = iter(dleaves)
            for ci, hv, ho in dict_plan:
                vals = next(it)
                valid = next(it) if hv else None
                off = next(it) if ho else None
                dicts[ci] = Array(schema.fields[ci].type.value_type,
                                  vals, valid, offsets=off)
            local = _local_batch(schema, dicts, leaves, local_len)
            if pre_filter is not None:
                mask = execute_scalar_expression(pre_filter, local)
                local = filter_batch(local, mask)
            st = self._unpack(st_leaves)
            st = ha.consume(st, local)
            g, aggs, uniques = st
            # dict-typed uniques pick up the batch dictionary — strip it
            # so the state pytree structure stays stable across consumes
            uniques = tuple(
                Array(u.type, u.values, u.validity) if isinstance(u, Array)
                else u for u in uniques)
            return self._pack((g, aggs, uniques))

        nspec = tuple(P(axis) for _ in range(n_state))
        return jax.jit(jax.shard_map(
            step, mesh=self.ctx.mesh,
            in_specs=(nspec, tuple(P(axis) for _ in range(n_real)),
                      tuple(P() for _ in
                            range(sum(1 + hv + ho
                                      for _, hv, ho in dict_plan))),
                      P()),
            out_specs=nspec, check_vma=False))

    # ------------------------------------------------------------------
    def _exchange_and_merge(self, st_leaves, key_dict_leaves=()):
        """Inside shard_map: state-row exchange + merge + finalize.

        ``key_dict_leaves``: replicated dictionary value buffers for
        dictionary-typed key columns (the packed state template carries
        codes only): content-gathered key lanes
        (ops/hashing.dict_content_lanes) need the dictionary on both
        the hashing and the post-exchange merge side."""
        ha = self.ha
        G, n, axis = self.G, self.n, self.axis
        grouper_state, agg_states, uniques = self._unpack(st_leaves)
        nloc = grouper_state.num_groups
        local_err = grouper_state.error
        kd = iter(key_dict_leaves)
        fixed = []
        for u, f in zip(uniques, ha.key_fields):
            if isinstance(f.type, dt.DictionaryType) and \
                    not isinstance(u, SlotStrings):
                d = next(kd, None)
                if d is not None:
                    u = Array(f.type, u.values, u.validity, dictionary=d)
            fixed.append(u)
        uniques = tuple(fixed)

        # compact key arrays for hashing/consume-compatible rows
        key_arrays = [u.to_array(f.type) if isinstance(u, SlotStrings)
                      else u
                      for u, f in zip(uniques, ha.key_fields)]
        h = hash32(key_arrays, seed=_STATE_EXCHANGE_SEED)
        gidx = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0).reshape((G,))
        dest = jnp.where(gidx < nloc, (h % jnp.uint32(n)).astype(jnp.int32),
                         n)

        # rows to exchange: per-key unique leaves + per-agg state leaves.
        # SlotStrings rows travel in slot form (fixed width) and compact
        # back on the receiving side.
        plan = []      # rebuild plan
        leaves = []
        for u, f in zip(uniques, ha.key_fields):
            if isinstance(u, SlotStrings):
                plan.append(("slot", f.type, 3, None))
                leaves.extend([u.slots, u.lens, u.valid])
            else:
                # dictionary columns exchange CODES; the receiver
                # reattaches its LOCAL dictionary — content-identical
                # across shards (one host-side encode per source is the
                # ingest contract), so the content-gathered key lanes
                # (ops/hashing.dict_content_lanes) stay consistent
                plan.append(("arr", f.type, 2, u.dictionary))
                leaves.extend([u.values,
                               u.validity if u.validity is not None else
                               jnp.ones((G,), jnp.bool_)])
        agg_leaves, agg_defs = [], []
        for st in agg_states:
            ls, td = jax.tree_util.tree_flatten(st)
            agg_defs.append((td, len(ls)))
            agg_leaves.extend(ls)
        # bucket capacity G: a shard sends at most G rows total, so no
        # per-destination bucket can overflow — the exchange is overflow-
        # free by construction; only a genuine >G-distinct-keys-per-shard
        # condition can error (in the merge below)
        recv, total, x_err = shuffle_rows(
            leaves + agg_leaves, dest, n, G, axis)

        it = iter(recv[:len(leaves)])
        o_keys = []
        for kind, t, nl, dct in plan:
            if kind == "slot":
                slots, lens, valid = (next(it) for _ in range(3))
                o_keys.append(SlotStrings(
                    slots, lens, valid, jnp.int32(0)).to_array(t))
            else:
                vals, valid = next(it), next(it)
                o_keys.append(Array(t, vals, valid, dictionary=dct))
        o_agg_states = []
        pos = len(leaves)
        for td, ln in agg_defs:
            o_agg_states.append(jax.tree_util.tree_unflatten(
                td, recv[pos:pos + ln]))
            pos += ln

        fresh = self._init_full_state()
        merged = ha.merge_rows(fresh, o_keys, tuple(o_agg_states), total)
        out = ha.finalize(merged)
        err = (local_err | x_err | merged[0].error).astype(jnp.int32)
        out_leaves = []
        for i in range(out.num_columns):
            a = out.column(i)
            rows = a.offsets.shape[0] - 1 if a.type.is_varlen else \
                a.values.shape[0]
            out_leaves.append(a.values)
            out_leaves.append(a.validity if a.validity is not None else
                              jnp.ones((rows,), jnp.bool_))
            if a.type.is_varlen:
                out_leaves.append(a.offsets)
        return (tuple(out_leaves),
                jnp.asarray(out.length, jnp.int32).reshape((1,)),
                err.reshape((1,)))

    def finalize_table(self, state) -> Table:
        """Exchange + merge + collect per-shard disjoint group tables."""
        ha = self.ha
        axis = self.axis
        # replicated dictionaries of dictionary-typed key columns
        # (captured at consume; the packed state carries codes only)
        key_dicts = tuple(
            self._key_dicts.get(f.name)
            for f in ha.key_fields
            if isinstance(f.type, dt.DictionaryType))
        key_dicts = tuple(d for d in key_dicts if d is not None)
        if self._finalize_fn is None:
            nspec = tuple(P(axis) for _ in state)
            n_out = sum(3 if f.type.is_varlen else 2
                        for f in ha.out_schema.fields)
            kd_spec = jax.tree_util.tree_map(lambda _: P(), key_dicts)
            self._finalize_fn = jax.jit(jax.shard_map(
                self._exchange_and_merge, mesh=self.ctx.mesh,
                in_specs=(nspec, kd_spec),
                out_specs=(tuple(P(axis) for _ in range(n_out)),
                           P(axis), P(axis)),
                check_vma=False))
        out_leaves, lengths, errs = self._finalize_fn(state, key_dicts)

        errs_host = np.asarray(self.ctx.fetch(errs))
        if errs_host.any():
            raise RuntimeError(
                f"distributed group_by overflow (per-shard errors="
                f"{errs_host.tolist()}): raise max_groups_per_shard")
        lengths_host = np.asarray(self.ctx.fetch(lengths))
        out_leaves = self.ctx.fetch(out_leaves)
        n = self.n
        # per-shard slice sizes differ per leaf kind (values/validity are
        # per group row; varlen offsets are G+1; varlen pools are G*W)
        batches = []
        for s in range(n):
            ln = int(lengths_host[s])
            if ln == 0:
                continue
            arrays = []
            li = 0
            for f in ha.out_schema.fields:
                if f.type.is_varlen:
                    pool, valid, off = (out_leaves[li], out_leaves[li + 1],
                                        out_leaves[li + 2])
                    li += 3
                    pp, vp, op = (pool.shape[0] // n, valid.shape[0] // n,
                                  off.shape[0] // n)
                    arrays.append(Array(
                        f.type, jnp.asarray(pool[s * pp:(s + 1) * pp]),
                        jnp.asarray(valid[s * vp:(s + 1) * vp]),
                        offsets=jnp.asarray(off[s * op:(s + 1) * op]),
                        length=ln))
                else:
                    vals, valid = out_leaves[li], out_leaves[li + 1]
                    li += 2
                    vp = vals.shape[0] // n
                    arrays.append(Array(
                        f.type, jnp.asarray(vals[s * vp:(s + 1) * vp]),
                        jnp.asarray(valid[s * vp:(s + 1) * vp]),
                        dictionary=self._key_dicts.get(f.name),
                        length=ln))
            batches.append(Batch(ha.out_schema, arrays, ln))
        if not batches:
            from ..acero.nodes import empty_batch
            batches = [empty_batch(ha.out_schema)]
        return Table(ha.out_schema, batches)
