"""Hash-partitioned distributed shuffle (exchange operator).

The reference has NO exchange operator — Acero is single-process
(``docs/source/cpp/acero/overview.rst:99-110``) and the BASELINE's
multi-host shuffle is green-field work (SURVEY.md §1). The in-process
analog is the partitioned hash-join build (``swiss_join_internal.h:524``:
PartitionBatch hash-bucket-sorts rows into power-of-2 partitions).

TPU-native design: shuffle = ``all_to_all`` over the mesh's ICI/DCN links
inside ``shard_map``:

  1. **partition_for_exchange** (per shard, pure XLA): hash keys -> dest
     shard = h mod P; a stable sort by dest compacts rows into a fixed
     (P, B) send buffer (B = per-destination capacity) + per-dest counts.
     Fixed shapes keep the collective static; overflow (skew beyond B)
     raises the deferred error flag — the skew-repartition path splits hot
     keys in a later round.
  2. ``jax.lax.all_to_all`` swaps bucket p of shard s to shard p — data
     rides the interconnect, never the host.
  3. **flatten_received** compacts the received (P, B) buckets + counts
     back into one local batch (lengths prefix-summed).

All functions operate on *local* (per-shard) column pytrees so they compose
inside any shard_map region.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core import datatype as dt
from ..core.array import Array, row_mask
from ..core.batch import Batch
from ..core.schema import Schema
from ..ops.hashing import hash32

__all__ = ["partition_for_exchange", "exchange", "flatten_received",
           "shuffle_batch", "shuffle_rows"]


def shuffle_rows(leaves: Sequence[Optional[jax.Array]], dest: jax.Array,
                 num_partitions: int, bucket_capacity: int,
                 axis_name: str):
    """all_to_all arbitrary per-row leaves by explicit destination.

    The leaf-level core of the exchange, shared by batch shuffles and the
    pre-aggregated state-row exchange (parallel/context): rows whose
    ``dest`` is in [0, P) are bucket-sorted into a fixed (P, B) send
    buffer per leaf, swapped with ``all_to_all``, and front-compacted on
    the receiving side. ``dest >= P`` drops the row (padding).

    Returns (recv_leaves: list of (P*B, ...) arrays (None passes
    through), total: int32 received-row count, error: int32 nonzero when
    some bucket overflowed B).
    """
    P, B = num_partitions, bucket_capacity
    cap = dest.shape[0]
    dest = jnp.where(dest < P, dest, P)
    iota = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).reshape((cap,))
    sorted_dest, perm = jax.lax.sort([dest.astype(jnp.int32), iota],
                                     num_keys=1, is_stable=True)
    from ..ops.pallas_kernels import partition_histogram
    counts = partition_histogram(dest, P)
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    pos_in_run = iota - starts[jnp.clip(sorted_dest, 0, P - 1)]
    error = jnp.int32(jnp.any(counts > B))
    flat_pos = jnp.where((sorted_dest < P) & (pos_in_run < B),
                         sorted_dest * B + pos_in_run, P * B)
    send = []
    for leaf in leaves:
        if leaf is None:
            send.append(None)
            continue
        src = leaf[perm]
        buf = jnp.zeros((P * B,) + leaf.shape[1:], dtype=leaf.dtype)
        buf = buf.at[flat_pos].set(src, mode="drop", unique_indices=True)
        send.append(buf.reshape((P, B) + leaf.shape[1:]))
    recv, recv_counts = exchange(send, jnp.minimum(counts, B), axis_name)
    total = jnp.sum(recv_counts).astype(jnp.int32)
    rstarts = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(recv_counts)[:-1].astype(jnp.int32)])
    pi = jax.lax.broadcasted_iota(jnp.int32, (P, B), 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (P, B), 1)
    outpos = jnp.where(ii < recv_counts[:, None],
                       rstarts[:, None] + ii, P * B).reshape((P * B,))
    out_leaves = []
    for buf in recv:
        if buf is None:
            out_leaves.append(None)
            continue
        flat = buf.reshape((P * B,) + buf.shape[2:])
        out = jnp.zeros_like(flat).at[outpos].set(
            flat, mode="drop", unique_indices=True)
        out_leaves.append(out)
    return out_leaves, total, error


def _column_leaves(b: Batch) -> List[jax.Array]:
    """Flat list of per-row buffers of a batch (values+validity only;
    varlen columns must be dictionary-encoded before a shuffle)."""
    leaves = []
    for i in range(b.num_columns):
        a = b.column(i)
        if a.type.is_varlen:
            raise NotImplementedError(
                "shuffle of raw string columns: dictionary-encode first")
        leaves.append(a.values)
        leaves.append(a.validity if a.validity is not None else None)
    return leaves


def _rebuild_batch(schema: Schema, dictionaries, leaves: List[jax.Array],
                   length) -> Batch:
    arrays = []
    it = iter(leaves)
    for f, dic in zip(schema.fields, dictionaries):
        values = next(it)
        validity = next(it)
        arrays.append(Array(f.type, values, validity, dictionary=dic,
                            length=length))
    return Batch(schema, arrays, length)


def partition_for_exchange(b: Batch, key_names: Sequence[str],
                           num_partitions: int,
                           bucket_capacity: int,
                           seed: int = 0x5108FF1E,
                           dest: Optional[jax.Array] = None):
    """Bucket rows by destination (key-hash by default; pass `dest` for
    range partitioning — the distributed sort router).

    Returns (send_buffers: list of (P, B) arrays matching _column_leaves
    order, counts: (P,) int32, error: int32 scalar).

    NOTE: uses a shuffle-specific hash seed, decorrelated from the
    grouper's hash (same-hash cascades would funnel every key of one local
    grouper slot to one shard).
    """
    P, B = num_partitions, bucket_capacity
    cap = b.capacity
    active = row_mask(cap, b.length)
    if dest is None:
        keys = [b.column(k) for k in key_names]
        h = hash32(keys, seed=seed)
        dest = (h % jnp.uint32(P)).astype(jnp.int32)
    dest = jnp.where(active, dest, P)  # padding -> overflow bucket P

    # stable sort rows by dest -> contiguous runs per destination
    iota = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).reshape((cap,))
    sorted_dest, perm = jax.lax.sort([dest, iota], num_keys=1,
                                     is_stable=True)
    # per-destination counts: single-pass Pallas histogram (a colliding
    # scatter-add here would serialize on TPU — ops/pallas_kernels.py)
    from ..ops.pallas_kernels import partition_histogram
    counts_p = partition_histogram(dest, P)
    counts = jnp.concatenate(
        [counts_p, (jnp.int32(cap) - jnp.sum(counts_p)).reshape((1,))])
    starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    pos_in_run = iota - starts[jnp.clip(sorted_dest, 0, P)]
    error = jnp.int32(jnp.any(counts[:P] > B))

    # scatter each (sorted) row into send[dest, pos]
    flat_pos = jnp.where((sorted_dest < P) & (pos_in_run < B),
                         sorted_dest * B + pos_in_run, P * B)
    leaves = _column_leaves(b)
    send = []
    for leaf in leaves:
        if leaf is None:
            send.append(None)
            continue
        src = leaf[perm]
        buf = jnp.zeros((P * B,) + leaf.shape[1:], dtype=leaf.dtype)
        buf = buf.at[flat_pos].set(src, mode="drop", unique_indices=True)
        send.append(buf.reshape((P, B) + leaf.shape[1:]))
    return send, counts[:P], error


def exchange(send_buffers, counts, axis_name: str):
    """all_to_all the (P, B) buckets + counts across the mesh axis.

    Per shard: send[p] goes to shard p; returns (recv_buffers list of
    (P, B) arrays — bucket from each source, recv_counts (P,))."""
    recv = []
    for buf in send_buffers:
        if buf is None:
            recv.append(None)
            continue
        recv.append(jax.lax.all_to_all(buf, axis_name, split_axis=0,
                                       concat_axis=0, tiled=True))
    recv_counts = jax.lax.all_to_all(counts, axis_name, split_axis=0,
                                     concat_axis=0, tiled=True)
    return recv, recv_counts


def flatten_received(schema: Schema, dictionaries, recv_buffers,
                     recv_counts) -> Batch:
    """Compact received (P, B) buckets into one local batch of capacity
    P*B (dynamic length = sum counts)."""
    P, B = recv_counts.shape[0], None
    for buf in recv_buffers:
        if buf is not None:
            B = buf.shape[1]
            break
    total = jnp.sum(recv_counts).astype(jnp.int32)
    starts = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(recv_counts)[:-1].astype(jnp.int32)])
    # for each (p, i): output position = starts[p] + i if i < counts[p]
    pi = jax.lax.broadcasted_iota(jnp.int32, (P, B), 0)
    ii = jax.lax.broadcasted_iota(jnp.int32, (P, B), 1)
    outpos = jnp.where(ii < recv_counts[:, None],
                       starts[:, None] + ii, P * B).reshape((P * B,))
    leaves = []
    for buf in recv_buffers:
        if buf is None:
            leaves.append(None)
            continue
        flat = buf.reshape((P * B,) + buf.shape[2:])
        out = jnp.zeros_like(flat).at[outpos].set(
            flat, mode="drop", unique_indices=True)
        leaves.append(out)
    return _rebuild_batch(schema, dictionaries, leaves, total)


def shuffle_batch(b: Batch, key_names: Sequence[str], axis_name: str,
                  num_partitions: int,
                  bucket_capacity: Optional[int] = None,
                  seed: int = 0x5108FF1E,
                  dest: Optional[jax.Array] = None
                  ) -> Tuple[Batch, jax.Array]:
    """Full shuffle of a local batch by key hash (or explicit `dest`)
    across `axis_name`.

    Returns (local re-partitioned batch, error flag). Must be called
    inside shard_map with axis_name in scope; num_partitions must equal
    the axis size."""
    B = bucket_capacity or b.capacity
    dictionaries = [b.column(i).dictionary for i in range(b.num_columns)]
    send, counts, err = partition_for_exchange(
        b, key_names, num_partitions, B, seed=seed, dest=dest)
    recv, recv_counts = exchange(send, counts, axis_name)
    out = flatten_received(b.schema, dictionaries, recv, recv_counts)
    return out, err
