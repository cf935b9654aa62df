"""Streaming distributed hash join (co-partitioned, plan-integrable).

The reference's partitioned-build design (``swiss_join_internal.h:524``:
PartitionBatch -> per-partition ProcessPartition -> merge) with ICI as
the partitioner and NO merge phase — results stay partitioned
(SURVEY.md §2.8). Streaming shape mirrors the single-chip plan node:

  build phase:  each build-side batch hash-shuffles by its join keys
                (``all_to_all``) and appends into a per-shard
                accumulation buffer — the pipeline-breaker side.
  finish_build: one per-shard sort-group build (ops/join.HashJoin.build).
  probe phase:  each probe-side batch hash-shuffles with the SAME seed
                (co-partitioning: equal keys land on equal shards), is
                probed locally, and its per-shard outputs stream out.
  finish:       right/full-outer unmatched-build emission is shard-local
                (co-partitioning puts every build row on one shard).

All device state crosses the shard_map boundary as packed leaves so the
jitted steps cache by batch structure.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..core import datatype as dt
from ..core.array import Array, row_mask
from ..core.batch import Batch, Table
from ..core.schema import Schema
from ..ops.join import HashJoin
from .shuffle import shuffle_batch

__all__ = ["DistHashJoin"]


class DistHashJoin:
    """Streaming distributed hash join over a 1-D mesh.

    Usage::

        dhj = DistHashJoin(ctx, left_schema, right_schema, options)
        bs = dhj.init_build()
        for b in build_stream:
            bs = dhj.consume_build(bs, b)
        ps = dhj.finish_build(bs)
        for b in probe_stream:
            out_batches, ps = dhj.probe(ps, b)
        tail_batches = dhj.finish(ps)
    """

    def __init__(self, ctx, left_schema: Schema, right_schema: Schema,
                 options, bucket_factor: int = 2,
                 fanout_per_shard: Optional[int] = None):
        self.ctx = ctx
        self.axis = ctx.axis
        self.n = ctx.n
        self.left_schema = left_schema
        self.right_schema = right_schema
        self.options = options
        self.bucket_factor = bucket_factor
        self.hj = HashJoin(left_schema, right_schema, options)
        # per-shard accumulation capacity for the shuffled build side
        self.build_cap = options.max_build_rows
        self.fanout = fanout_per_shard
        self._consume_cache = {}
        self._probe_cache = {}
        self._finish_fn = None
        self._build_treedef = None
        self._build_scalar = None      # which BuildState leaves are ()
        self._dicts_by_name = {}       # host-side dictionary reattachment

    # ------------------------------------------------------------------
    def _accum_template(self):
        """Per-shard build accumulation: one (cap,...) buffer per column
        (validity always materialized), + row count + error."""
        leaves = []
        for f in self.right_schema.fields:
            if f.type.is_varlen:
                raise NotImplementedError(
                    "distributed varlen build columns: dictionary-encode "
                    "first (DistContext.shard_batch restriction)")
            leaves.append(jnp.zeros((self.build_cap,),
                                    dtype=f.type.storage_np))
            leaves.append(jnp.zeros((self.build_cap,), jnp.bool_))
        leaves.append(jnp.zeros((1,), jnp.int32))   # cur_len
        leaves.append(jnp.zeros((1,), jnp.int32))   # error
        return tuple(leaves)

    def init_build(self):
        def mk():
            return self._accum_template()
        nspec = tuple(P(self.axis) for _ in self._accum_template())
        fn = jax.jit(jax.shard_map(
            mk, mesh=self.ctx.mesh, in_specs=(), out_specs=nspec,
            check_vma=False))
        return fn()

    # ------------------------------------------------------------------
    def consume_build(self, state, b: Batch):
        """Shuffle one build batch by its keys and append per shard."""
        from .context import _batch_leaves
        b = self.ctx.shard_batch(b) if not self.ctx._is_sharded(b) else b
        self._capture_dicts(b)
        raw = _batch_leaves(b)
        mask_none = tuple(l is None for l in raw)
        real = [l if l is not None else jnp.zeros((self.n,), jnp.bool_)
                for l in raw]
        key = (b.schema, b.capacity, mask_none)
        fn = self._consume_cache.get(key)
        if fn is None:
            fn = self._build_consume_fn(b.schema, b.capacity, mask_none,
                                        len(state), len(real))
            self._consume_cache[key] = fn
        return fn(state, tuple(real), jnp.asarray(len(b), jnp.int32))

    def _capture_dicts(self, b: Batch):
        for i in range(b.num_columns):
            d = b.column(i).dictionary
            f = b.schema.fields[i]
            if d is not None and isinstance(f.type, dt.DictionaryType):
                self._dicts_by_name.setdefault(f.name, d)

    def _build_consume_fn(self, schema, capacity, mask_none, n_state,
                          n_real):
        from .context import _local_batch
        n, axis = self.n, self.axis
        local_cap = capacity // n
        B = self.bucket_factor * local_cap
        cap_b = self.build_cap
        hj = self.hj

        def step(acc, leaves, glen):
            i = jax.lax.axis_index(axis)
            local_len = jnp.clip(
                glen.astype(jnp.int32) - i.astype(jnp.int32) * local_cap,
                0, local_cap)
            leaves = [None if none else l
                      for l, none in zip(leaves, mask_none)]
            local = _local_batch(schema, [None] * len(schema), leaves,
                                 local_len)
            shuf, err = shuffle_batch(local, hj.right_keys, axis, n,
                                      bucket_capacity=B)
            cur = acc[-2][0]
            rcap = shuf.capacity
            ridx = jax.lax.broadcasted_iota(
                jnp.int32, (rcap, 1), 0).reshape((rcap,))
            in_rows = ridx < shuf.length
            pos = jnp.where(in_rows, cur + ridx, cap_b)
            out = list(acc)
            for ci in range(len(schema)):
                a = shuf.column(ci)
                vals, valid = out[2 * ci], out[2 * ci + 1]
                out[2 * ci] = vals.at[pos].set(a.values, mode="drop",
                                               unique_indices=True)
                av = a.validity if a.validity is not None else \
                    jnp.ones((rcap,), jnp.bool_)
                out[2 * ci + 1] = valid.at[pos].set(
                    av, mode="drop", unique_indices=True)
            new_len = cur + shuf.length.astype(jnp.int32)
            overflow = jnp.where(new_len > cap_b, 1, 0).astype(jnp.int32)
            out[-2] = jnp.minimum(new_len, cap_b).reshape((1,))
            out[-1] = (acc[-1][0] | err | overflow).reshape((1,))
            return tuple(out)

        aspec = tuple(P(axis) for _ in range(n_state))
        return jax.jit(jax.shard_map(
            step, mesh=self.ctx.mesh,
            in_specs=(aspec, tuple(P(axis) for _ in range(n_real)), P()),
            out_specs=aspec, check_vma=False))

    # ------------------------------------------------------------------
    def finish_build(self, state):
        """One per-shard build over the accumulated co-partitioned rows."""
        n, axis = self.n, self.axis
        hj = self.hj
        schema = self.right_schema

        def step(acc):
            arrays = []
            for ci, f in enumerate(schema.fields):
                arrays.append(Array(f.type, acc[2 * ci], acc[2 * ci + 1],
                                    length=acc[-2][0]))
            batch = Batch(schema, arrays, acc[-2][0])
            bs = hj.build(batch)
            bs = bs._with_error(acc[-1][0])
            leaves, treedef = jax.tree_util.tree_flatten(bs)
            # scalar leaves travel as (1,); remember which (so a genuine
            # (1,) row leaf is never mis-squeezed on unpack)
            self._build_treedef = treedef
            self._build_scalar = tuple(
                jnp.asarray(l).ndim == 0 for l in leaves)
            return self._pack_bs(bs)

        # trace once eagerly to learn the BuildState leaf structure
        aspec = tuple(P(axis) for _ in state)
        tmpl = jax.eval_shape(step, tuple(
            jax.ShapeDtypeStruct((l.shape[0] // n,) + l.shape[1:], l.dtype)
            for l in state))
        nspec = tuple(P(axis) for _ in tmpl)
        fn = jax.jit(jax.shard_map(
            step, mesh=self.ctx.mesh, in_specs=(aspec,),
            out_specs=nspec, check_vma=False))
        return fn(state)

    def _unpack_bs(self, leaves):
        return jax.tree_util.tree_unflatten(
            self._build_treedef,
            [jnp.asarray(l).reshape(()) if sc else l
             for l, sc in zip(leaves, self._build_scalar)])

    def _pack_bs(self, bs):
        leaves = jax.tree_util.tree_leaves(bs)
        return tuple(jnp.asarray(l).reshape((1,))
                     if jnp.asarray(l).ndim == 0 else jnp.asarray(l)
                     for l in leaves)

    # ------------------------------------------------------------------
    def probe(self, pstate, b: Batch) -> Tuple[List[Batch], tuple]:
        """Shuffle one probe batch (same seed => co-partitioned), probe
        each shard, collect that batch's per-shard outputs."""
        from .context import _batch_leaves
        b = self.ctx.shard_batch(b) if not self.ctx._is_sharded(b) else b
        self._capture_dicts(b)
        raw = _batch_leaves(b)
        mask_none = tuple(l is None for l in raw)
        real = [l if l is not None else jnp.zeros((self.n,), jnp.bool_)
                for l in raw]
        key = (b.schema, b.capacity, mask_none)
        fn = self._probe_cache.get(key)
        if fn is None:
            fn = self._build_probe_fn(b.schema, b.capacity, mask_none,
                                      len(pstate), len(real))
            self._probe_cache[key] = fn
        out_leaves, lengths, new_state = fn(
            pstate, tuple(real), jnp.asarray(len(b), jnp.int32))
        batches = self._collect(out_leaves, lengths)
        return batches, new_state

    def _build_probe_fn(self, schema, capacity, mask_none, n_state,
                        n_real):
        from .context import _local_batch
        n, axis = self.n, self.axis
        local_cap = capacity // n
        B = self.bucket_factor * local_cap
        fanout = self.fanout or max(2 * local_cap, 1 << 12)
        hj = self.hj
        out_schema = hj.out_schema
        probe_emits = hj.join_type not in ("right semi", "right anti")

        def step(bs_leaves, leaves, glen):
            i = jax.lax.axis_index(axis)
            local_len = jnp.clip(
                glen.astype(jnp.int32) - i.astype(jnp.int32) * local_cap,
                0, local_cap)
            leaves = [None if none else l
                      for l, none in zip(leaves, mask_none)]
            local = _local_batch(schema, [None] * len(schema), leaves,
                                 local_len)
            shuf, err = shuffle_batch(local, hj.left_keys, axis, n,
                                      bucket_capacity=B)
            bs = self._unpack_bs(bs_leaves)
            out, bs = hj.probe(bs, shuf, fanout_capacity=fanout)
            bs = bs._with_error(err)
            out_leaves = []
            if out is None:
                length = jnp.zeros((1,), jnp.int32)
            else:
                for ci in range(out.num_columns):
                    a = out.column(ci)
                    rows = a.values.shape[0]
                    out_leaves.append(a.values)
                    out_leaves.append(
                        a.validity if a.validity is not None else
                        jnp.ones((rows,), jnp.bool_))
                length = jnp.asarray(out.length, jnp.int32).reshape((1,))
            return (tuple(out_leaves), length, self._pack_bs(bs))

        nspec = tuple(P(axis) for _ in range(n_state))
        n_out = 2 * len(out_schema) if probe_emits else 0
        return jax.jit(jax.shard_map(
            step, mesh=self.ctx.mesh,
            in_specs=(nspec, tuple(P(axis) for _ in range(n_real)), P()),
            out_specs=(tuple(P(axis) for _ in range(n_out)),
                       P(axis), nspec),
            check_vma=False))

    # ------------------------------------------------------------------
    def finish(self, pstate) -> List[Batch]:
        """Per-shard trailing emission + deferred error check."""
        n, axis = self.n, self.axis
        hj = self.hj

        def step(bs_leaves):
            bs = self._unpack_bs(bs_leaves)
            tail = hj.finish(bs)
            out_leaves = []
            if tail is None:
                length = jnp.zeros((1,), jnp.int32)
            else:
                for ci in range(tail.num_columns):
                    a = tail.column(ci)
                    rows = a.values.shape[0]
                    out_leaves.append(a.values)
                    out_leaves.append(
                        a.validity if a.validity is not None else
                        jnp.ones((rows,), jnp.bool_))
                length = jnp.asarray(tail.length, jnp.int32).reshape((1,))
            return (tuple(out_leaves), length,
                    jnp.asarray(bs.error, jnp.int32).reshape((1,)))

        nspec = tuple(P(axis) for _ in pstate)
        emits_tail = hj.join_type in ("right outer", "full outer",
                                      "right semi", "right anti")
        n_out = 2 * len(hj.out_schema) if emits_tail else 0
        fn = jax.jit(jax.shard_map(
            step, mesh=self.ctx.mesh, in_specs=(nspec,),
            out_specs=(tuple(P(axis) for _ in range(n_out)),
                       P(axis), P(axis)),
            check_vma=False))
        out_leaves, lengths, errs = fn(pstate)
        errs_host = np.asarray(self.ctx.fetch(errs))
        if errs_host.any():
            raise RuntimeError(
                f"distributed join overflow (per-shard errors="
                f"{errs_host.tolist()}): raise max_build_rows/"
                f"fanout_per_shard/bucket_factor")
        return self._collect(out_leaves, lengths)

    # ------------------------------------------------------------------
    def _collect(self, out_leaves, lengths) -> List[Batch]:
        """Slice per-shard output segments into host-side batches."""
        if not out_leaves:
            return []
        lengths_host = np.asarray(self.ctx.fetch(lengths))
        out_leaves = self.ctx.fetch(out_leaves)
        n = self.n
        schema = self.hj.out_schema
        batches = []
        for s in range(n):
            ln = int(lengths_host[s])
            if ln == 0:
                continue
            arrays = []
            for ci, f in enumerate(schema.fields):
                vals = out_leaves[2 * ci]
                valid = out_leaves[2 * ci + 1]
                vp = vals.shape[0] // n
                arrays.append(Array(
                    f.type, jnp.asarray(vals[s * vp:(s + 1) * vp]),
                    jnp.asarray(valid[s * vp:(s + 1) * vp]),
                    dictionary=self._dicts_by_name.get(f.name),
                    length=ln))
            batches.append(Batch(schema, arrays, ln))
        return batches
