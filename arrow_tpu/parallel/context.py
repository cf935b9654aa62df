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
from ..core.array import Array
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
        """Distributed grouped aggregation:
        local (filter) -> hash shuffle by key (all_to_all) -> local grouped
        aggregation -> per-shard disjoint group tables, host-concatenated.
        """
        b = self.shard_batch(b) if not self._is_sharded(b) else b
        aggs = [a if isinstance(a, AggregateSpec) else AggregateSpec(*a)
                for a in aggregates]
        ha = HashAggregate(b.schema, keys, aggs,
                           max_groups=max_groups_per_shard)
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

        errs_host = np.asarray(jax.device_get(errs))
        if errs_host.any():
            raise RuntimeError(
                f"distributed group_by overflow (per-shard errors="
                f"{errs_host.tolist()}): raise max_groups_per_shard/"
                "bucket_factor or repartition skewed keys")
        # host: slice each shard's group segment and concat
        lengths_host = np.asarray(jax.device_get(lengths))
        out_leaves = jax.device_get(out_leaves)
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

    def _is_sharded(self, b: Batch) -> bool:
        try:
            a = b.column(0).values
            sh = a.sharding
            return isinstance(sh, NamedSharding) and sh.mesh == self.mesh \
                and sh.spec != P()
        except Exception:
            return False
