"""Distributed execution context: mesh + SPMD table operations.

The reference's Acero is explicitly single-process; this layer is the
green-field multi-chip design the BASELINE demands (hash-partitioned
tables, all_to_all shuffle feeding per-chip grouped aggregation, >=80%
scaling efficiency). Mental model per the scaling-book recipe: pick a mesh,
annotate shardings, let XLA insert collectives.

Layout: a distributed table is a Batch whose row buffers are sharded over
the mesh's data axis (contiguous blocks); each shard's local length derives
from the replicated global length and its axis index. Dictionaries are
replicated (they are shared metadata).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import datatype as dt
from ..core.array import Array, row_mask
from ..core.batch import Batch, Table
from ..core.schema import Schema
from ..ops.hash_aggregate import AggregateSpec, HashAggregate
from ..compute.expressions import Expression, execute_scalar_expression
from ..ops.selection import filter_batch
from .shuffle import shuffle_batch

__all__ = ["DistContext"]


def _local_batch(schema: Schema, dictionaries, leaves, local_length
                 ) -> Batch:
    arrays = []
    it = iter(leaves)
    for f, dic in zip(schema.fields, dictionaries):
        values = next(it)
        validity = next(it)
        arrays.append(Array(f.type, values, validity, dictionary=dic,
                            length=local_length))
    return Batch(schema, arrays, local_length)


def _batch_leaves(b: Batch):
    leaves = []
    for i in range(b.num_columns):
        a = b.column(i)
        leaves.append(a.values)
        leaves.append(a.validity)
    return leaves


class DistContext:
    """SPMD driver over a 1-D data mesh."""

    def __init__(self, mesh: Optional[Mesh] = None, axis: str = "d",
                 devices=None):
        if mesh is None:
            devices = devices if devices is not None else jax.devices()
            mesh = Mesh(np.asarray(devices), (axis,))
        self.mesh = mesh
        self.axis = axis
        self.n = mesh.shape[axis]
        # multi-process (multi-host) mode: the mesh spans devices this
        # process cannot address; results come home via process_allgather
        # (parallel/multihost.py owns jax.distributed.initialize)
        self.multihost = any(d.process_index != jax.process_index()
                             for d in mesh.devices.flat)

    def fetch(self, x):
        """device_get that works for globally-sharded outputs: on a
        multi-host mesh, all-gathers across processes first (every host
        gets the full value — the engine's results are breaker outputs,
        small by construction)."""
        if self.multihost:
            from jax.experimental import multihost_utils
            x = multihost_utils.process_allgather(x, tiled=True)
        return jax.device_get(x)

    # -------------------------------------------------------------------
    def shard_batch(self, b: Batch) -> Batch:
        """Pad capacity to a multiple of n and shard row buffers."""
        n = self.n
        cap = b.capacity
        pad = (-cap) % n
        sharding = NamedSharding(self.mesh, P(self.axis))
        repl = NamedSharding(self.mesh, P())
        arrays = []
        for i in range(b.num_columns):
            a = b.column(i)
            if a.type.is_varlen:
                raise NotImplementedError(
                    "distributed varlen columns: dictionary-encode first")
            values = a.values if pad == 0 else jnp.concatenate(
                [a.values, jnp.zeros((pad,) + a.values.shape[1:],
                                     a.values.dtype)])
            validity = a.validity
            if validity is not None and pad:
                validity = jnp.concatenate(
                    [validity, jnp.zeros((pad,), jnp.bool_)])
            values = jax.device_put(values, sharding)
            if validity is not None:
                validity = jax.device_put(validity, sharding)
            dic = a.dictionary.device_put(repl) if a.dictionary is not None \
                else None
            arrays.append(Array(a.type, values, validity, dictionary=dic,
                                length=b.length))
        return Batch(b.schema, arrays, b.length)

    # -------------------------------------------------------------------
    def group_by(self, b: Batch, keys: Sequence[str],
                 aggregates: Sequence, max_groups_per_shard: int = 1 << 14,
                 pre_filter: Optional[Expression] = None,
                 bucket_factor: int = 2) -> Table:
        """Distributed grouped aggregation.

        Fast path (all aggregator states row-shaped): local
        pre-aggregation + state-row exchange + Merge — skew-immune, one
        exchanged row per (shard, distinct key) (parallel/dist_agg).
        Fallback (tdigest/count_distinct/list/pivot): raw-row hash
        shuffle (all_to_all) then local aggregation — subject to
        bucket_factor capacity under key skew.
        """
        b = self.shard_batch(b) if not self._is_sharded(b) else b
        aggs = [a if isinstance(a, AggregateSpec) else AggregateSpec(*a)
                for a in aggregates]
        ha = HashAggregate(b.schema, keys, aggs,
                           max_groups=max_groups_per_shard)
        if ha.supports_state_exchange:
            from .dist_agg import DistGroupBy
            dgb = DistGroupBy(self, b.schema, keys, aggs,
                              max_groups_per_shard=max_groups_per_shard,
                              pre_filter=pre_filter)
            state = dgb.consume(dgb.init_state(), b)
            return dgb.finalize_table(state)
        schema = b.schema
        dictionaries = [b.column(i).dictionary
                        for i in range(b.num_columns)]
        n = self.n
        local_cap = b.capacity // n
        axis = self.axis

        def step(leaves, glen):
            i = jax.lax.axis_index(axis)
            local_len = jnp.clip(
                glen.astype(jnp.int32) - i.astype(jnp.int32) * local_cap,
                0, local_cap)
            local = _local_batch(schema, dictionaries, leaves, local_len)
            if pre_filter is not None:
                mask = execute_scalar_expression(pre_filter, local)
                local = filter_batch(local, mask)
            shuffled, err = shuffle_batch(
                local, keys, axis, n, bucket_capacity=bucket_factor *
                local_cap)
            state = ha.init_state()
            state = ha.consume(state, shuffled)
            out = ha.finalize(state)
            err = err | state[0].error
            out_leaves = _batch_leaves(out)
            out_leaves = [l if l is not None else
                          jnp.ones((out.capacity,), jnp.bool_)
                          for l in out_leaves]
            return (tuple(out_leaves),
                    jnp.asarray(out.length, jnp.int32).reshape((1,)),
                    err.reshape((1,)))

        in_leaf_specs = tuple(
            P(axis) if l is not None else P() for l in _batch_leaves(b))
        in_leaves = tuple(l if l is not None else jnp.zeros((0,), jnp.bool_)
                          for l in _batch_leaves(b))
        # None leaves can't cross shard_map; substitute empty markers
        real_leaves = []
        specs = []
        mask_none = []
        for l in _batch_leaves(b):
            mask_none.append(l is None)
            if l is None:
                real_leaves.append(jnp.zeros((self.n,), jnp.bool_))
                specs.append(P(axis))
            else:
                real_leaves.append(l)
                specs.append(P(axis))

        def step_wrap(leaves, glen):
            leaves = [None if none else l
                      for l, none in zip(leaves, mask_none)]
            return step(leaves, glen)

        out_specs = (tuple(P(axis) for _ in range(
            2 * len(ha.out_schema))), P(axis), P(axis))
        fn = jax.jit(jax.shard_map(
            step_wrap, mesh=self.mesh,
            in_specs=(tuple(specs), P()),
            out_specs=out_specs, check_vma=False))
        out_leaves, lengths, errs = fn(
            tuple(real_leaves), jnp.asarray(len(b), jnp.int32))

        errs_host = np.asarray(self.fetch(errs))
        if errs_host.any():
            # host-side bucketed re-execution: the sharded input is still
            # at hand, so an overflow (shuffle bucket or group table)
            # retries at doubled capacities instead of raising
            nb = bucket_factor * 2 if bucket_factor * 2 <= 4 * self.n \
                else bucket_factor
            ng = max_groups_per_shard * 2 \
                if max_groups_per_shard * 2 <= (1 << 24) \
                else max_groups_per_shard
            if (nb, ng) != (bucket_factor, max_groups_per_shard):
                return self.group_by(b, keys, aggregates,
                                     max_groups_per_shard=ng,
                                     pre_filter=pre_filter,
                                     bucket_factor=nb)
            raise RuntimeError(
                f"distributed group_by overflow (per-shard errors="
                f"{errs_host.tolist()}): raise max_groups_per_shard/"
                "bucket_factor or repartition skewed keys")
        # host: slice each shard's group segment and concat
        lengths_host = np.asarray(self.fetch(lengths))
        out_leaves = self.fetch(out_leaves)
        G = max_groups_per_shard
        # dictionary-typed key columns keep the (replicated) input dictionary
        out_dicts = []
        for f in ha.out_schema.fields:
            i = schema.get_field_index(f.name)
            out_dicts.append(dictionaries[i] if i >= 0 and
                             isinstance(f.type, dt.DictionaryType) else None)
        batches = []
        for s in range(n):
            ln = int(lengths_host[s])
            if ln == 0:
                continue
            leaves = []
            for leaf in out_leaves:
                leaves.append(jnp.asarray(leaf[s * G: (s + 1) * G]))
            lb = _local_batch(ha.out_schema, out_dicts, leaves, ln)
            batches.append(lb)
        if not batches:
            from ..acero.nodes import empty_batch
            batches = [empty_batch(ha.out_schema)]
        return Table(ha.out_schema, batches)

    # -------------------------------------------------------------------
    def join(self, left: Batch, right: Batch, options,
             bucket_factor: int = 2,
             fanout_per_shard: Optional[int] = None) -> Table:
        """Distributed hash join: both sides hash-shuffle by their join
        keys over the mesh (same seed -> co-partitioned), then each shard
        builds + probes locally (the reference's partitioned-build design,
        ``swiss_join_internal.h:524``, with ICI as the partitioner — and
        no merge phase: results stay partitioned)."""
        from ..ops.join import HashJoin
        from ..ops.concat import concat_batches as _concat
        left = self.shard_batch(left) if not self._is_sharded(left) \
            else left
        right = self.shard_batch(right) if not self._is_sharded(right) \
            else right
        hj = HashJoin(left.schema, right.schema, options)
        n = self.n
        axis = self.axis
        lcap, rcap = left.capacity // n, right.capacity // n
        fanout = fanout_per_shard or max(2 * lcap, 1 << 12)
        lschema, rschema = left.schema, right.schema
        ldicts = [left.column(i).dictionary
                  for i in range(left.num_columns)]
        rdicts = [right.column(i).dictionary
                  for i in range(right.num_columns)]

        def step(lleaves, rleaves, llen, rlen):
            i = jax.lax.axis_index(axis)
            lloc = _local_batch(lschema, ldicts, lleaves, jnp.clip(
                llen.astype(jnp.int32) - i * lcap, 0, lcap))
            rloc = _local_batch(rschema, rdicts, rleaves, jnp.clip(
                rlen.astype(jnp.int32) - i * rcap, 0, rcap))
            lsh, lerr = shuffle_batch(lloc, hj.left_keys, axis, n,
                                      bucket_capacity=bucket_factor * lcap)
            rsh, rerr = shuffle_batch(rloc, hj.right_keys, axis, n,
                                      bucket_capacity=bucket_factor * rcap)
            bs = hj.build(rsh)
            out, bs = hj.probe(bs, lsh, fanout_capacity=fanout)
            # right/full-outer + right semi/anti finish scans are LOCAL:
            # hash co-partitioning puts every build row on exactly one
            # shard, so each shard's unmatched-build emission is complete
            tail = hj.finish(bs)
            if out is None:
                out = tail
            elif tail is not None:
                out = _concat([out, tail])
            err = lerr | rerr | bs.error
            leaves = _batch_leaves(out)
            leaves = [l if l is not None else
                      jnp.ones((out.capacity,), jnp.bool_) for l in leaves]
            return (tuple(leaves),
                    jnp.asarray(out.length, jnp.int32).reshape((1,)),
                    jnp.asarray(err, jnp.int32).reshape((1,)))

        lreal = [l if l is not None else jnp.zeros((self.n,), jnp.bool_)
                 for l in _batch_leaves(left)]
        lnone = [l is None for l in _batch_leaves(left)]
        rreal = [l if l is not None else jnp.zeros((self.n,), jnp.bool_)
                 for l in _batch_leaves(right)]
        rnone = [l is None for l in _batch_leaves(right)]

        def wrap(ll, rl, llen, rlen):
            ll = [None if m else l for l, m in zip(ll, lnone)]
            rl = [None if m else l for l, m in zip(rl, rnone)]
            return step(ll, rl, llen, rlen)

        nf = len(hj.out_schema)
        fn = jax.jit(jax.shard_map(
            wrap, mesh=self.mesh,
            in_specs=(tuple(P(self.axis) for _ in lreal),
                      tuple(P(self.axis) for _ in rreal), P(), P()),
            out_specs=(tuple(P(self.axis) for _ in range(2 * nf)),
                       P(self.axis), P(self.axis)),
            check_vma=False))
        out_leaves, lengths, errs = fn(
            tuple(lreal), tuple(rreal),
            jnp.asarray(len(left), jnp.int32),
            jnp.asarray(len(right), jnp.int32))
        # dictionary columns keep their (replicated) source dictionaries
        by_name = {}
        for i, f in enumerate(lschema.fields):
            by_name.setdefault(f.name, ldicts[i])
        for i, f in enumerate(rschema.fields):
            by_name.setdefault(f.name, rdicts[i])
        out_dicts = [by_name.get(f.name) for f in hj.out_schema.fields]
        return self._collect_shards(hj.out_schema, out_leaves, lengths,
                                    errs, "join", dicts=out_dicts)

    # -------------------------------------------------------------------
    def sort_by(self, b: Batch, sort_keys,
                bucket_factor: int = 3,
                samples_per_shard: int = 256) -> Table:
        """Distributed sort: sample-based range partition over the mesh,
        then one local sort per shard; shard s holds the s-th key range so
        concatenating shard outputs in order IS the global order (the
        TableSorter sort-then-merge design, ``vector_sort.cc:626``, with
        the merge replaced by disjoint ranges)."""
        from ..ops.bits import ascending_lanes32
        from ..ops.sorting import SortKey, SortOptions, sort_indices_batch
        from ..ops.selection import take_batch
        keys = [k if isinstance(k, SortKey) else SortKey(*k)
                for k in sort_keys]
        b = self.shard_batch(b) if not self._is_sharded(b) else b
        n = self.n
        axis = self.axis
        local_cap = b.capacity // n
        schema = b.schema
        dicts = [b.column(i).dictionary for i in range(b.num_columns)]
        opts = SortOptions(keys)

        def key64(local: Batch) -> jax.Array:
            """Primary sort key -> order-preserving u64 (ties stay on one
            shard; full multi-key order restored by the local sort)."""
            a = local.column(keys[0].name)
            lanes = ascending_lanes32(a.values, a.type)
            hi = lanes[0].astype(jnp.uint64) << jnp.uint64(32)
            lo = lanes[1].astype(jnp.uint64) if len(lanes) > 1 else \
                jnp.uint64(0)
            v = hi | lo
            if keys[0].order == "descending":
                v = ~v
            return v

        def step(leaves, glen):
            i = jax.lax.axis_index(axis)
            local_len = jnp.clip(glen.astype(jnp.int32) - i * local_cap,
                                 0, local_cap)
            local = _local_batch(schema, dicts, leaves, local_len)
            kv = key64(local)
            in_rng = row_mask(local.capacity, local.length)
            kv = jnp.where(in_rng, kv, jnp.uint64(0xFFFFFFFFFFFFFFFF))
            # sample + all_gather -> global range boundaries
            stride = max(local.capacity // samples_per_shard, 1)
            sample = jnp.sort(kv[::stride])
            allsamp = jnp.sort(jax.lax.all_gather(
                sample, axis).reshape((-1,)))
            S = allsamp.shape[0]
            bounds = allsamp[jnp.arange(1, n, dtype=jnp.int32) * (S // n)]
            dest = jnp.searchsorted(bounds, kv, side="right").astype(
                jnp.int32)
            shuffled, err = shuffle_batch(
                local, [], axis, n,
                bucket_capacity=bucket_factor * local_cap, dest=dest)
            perm = sort_indices_batch(shuffled, opts)
            idx32 = Array(dt.int32, perm.values.astype(jnp.int32), None,
                          length=perm.length)
            out = take_batch(shuffled, idx32)
            leaves_out = _batch_leaves(out)
            leaves_out = [l if l is not None else
                          jnp.ones((out.capacity,), jnp.bool_)
                          for l in leaves_out]
            return (tuple(leaves_out),
                    jnp.asarray(out.length, jnp.int32).reshape((1,)),
                    err.reshape((1,)))

        real = [l if l is not None else jnp.zeros((self.n,), jnp.bool_)
                for l in _batch_leaves(b)]
        nones = [l is None for l in _batch_leaves(b)]

        def wrap(leaves, glen):
            leaves = [None if m else l for l, m in zip(leaves, nones)]
            return step(leaves, glen)

        nf = len(schema)
        fn = jax.jit(jax.shard_map(
            wrap, mesh=self.mesh,
            in_specs=(tuple(P(self.axis) for _ in real), P()),
            out_specs=(tuple(P(self.axis) for _ in range(2 * nf)),
                       P(self.axis), P(self.axis)),
            check_vma=False))
        out_leaves, lengths, errs = fn(tuple(real),
                                       jnp.asarray(len(b), jnp.int32))
        return self._collect_shards(schema, out_leaves, lengths, errs,
                                    "sort", dicts=dicts)

    # -------------------------------------------------------------------
    def _collect_shards(self, schema: Schema, out_leaves, lengths, errs,
                        what: str, dicts=None) -> Table:
        errs_host = np.asarray(self.fetch(errs))
        if errs_host.any():
            raise RuntimeError(
                f"distributed {what} overflow (per-shard errors="
                f"{errs_host.tolist()}): raise bucket_factor/capacities "
                "or repartition skewed keys")
        lengths_host = np.asarray(self.fetch(lengths))
        out_leaves = self.fetch(out_leaves)
        n = self.n
        per = out_leaves[0].shape[0] // n
        out_dicts = dicts if dicts is not None and \
            len(dicts) == len(schema) else [None] * len(schema)
        batches = []
        for s in range(n):
            ln = int(lengths_host[s])
            if ln == 0:
                continue
            leaves = [jnp.asarray(leaf[s * per:(s + 1) * per])
                      for leaf in out_leaves]
            batches.append(_local_batch(schema, out_dicts, leaves, ln))
        if not batches:
            from ..acero.nodes import empty_batch
            batches = [empty_batch(schema)]
        return Table(schema, batches)

    def _is_sharded(self, b: Batch) -> bool:
        try:
            a = b.column(0).values
            sh = a.sharding
            return isinstance(sh, NamedSharding) and sh.mesh == self.mesh \
                and sh.spec != P()
        except Exception:
            return False
