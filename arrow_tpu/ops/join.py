"""Hash join (the SwissJoin analog).

Reference: ``cpp/src/arrow/acero/swiss_join.cc`` + ``swiss_join_internal.h``
— build (partition/insert/merge), probe (hash -> early_filter -> find ->
materialize), match bit-vectors for outer joins, ``key_to_payload`` offsets
for duplicate keys (``swiss_join_internal.h:483``).

TPU-native redesign:
  * Build: one Grouper.consume over the build side assigns a dense group
    id per distinct key (null keys excluded — join keys never match null);
    a stable sort by group id makes each key's payload rows CONTIGUOUS
    (group_starts offsets) — the row-major key_to_payload layout without
    per-row appends.
  * Probe: Grouper.lookup vectorized find; per-row match counts come from
    the group-size table. Fanout expansion (one probe row -> many output
    rows) uses the scatter + prefix-max-scan trick (no searchsorted):
    scatter each probe row id and its output offset at its first output
    slot, forward-max-scan fills the gaps, ordinal = j - start.
  * Outer joins: a matched-bitmap per build row is scatter-OR'd during
    probes; unmatched build rows are emitted at finish via filter.

Dynamic output size is held by a static ``fanout_capacity`` with a
deferred overflow error (Arrow instead chunk-appends into 32Ki batches,
``JoinResultMaterialize``; bucketed re-execution at a larger capacity is
the host-side recovery).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core import datatype as dt
from ..core.array import Array, row_mask
from ..core.batch import Batch
from ..core.schema import Field, Schema
from .grouper import Grouper
from .selection import filter_batch, take_batch, take_array

__all__ = ["HashJoin", "BuildState"]

_PROBE_SIDES = ("inner", "left outer", "full outer",
                "left semi", "left anti")


@jax.tree_util.register_pytree_node_class
class BuildState:
    """Device-side build result (pytree)."""

    __slots__ = ("grouper_state", "batch", "counts", "starts", "perm",
                 "matched", "num_rows", "error")

    def __init__(self, grouper_state, batch, counts, starts, perm, matched,
                 num_rows, error):
        self.grouper_state = grouper_state
        self.batch = batch
        self.counts = counts
        self.starts = starts
        self.perm = perm
        self.matched = matched
        self.num_rows = num_rows
        self.error = error

    def tree_flatten(self):
        return ((self.grouper_state, self.batch, self.counts, self.starts,
                 self.perm, self.matched, self.num_rows, self.error), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _all_valid(keys: Sequence[Array], cap: int) -> jax.Array:
    ok = jnp.ones((cap,), dtype=jnp.bool_)
    for k in keys:
        if k.validity is not None:
            ok = ok & k.validity
    return ok


class HashJoin:
    """Static-config hash join. Build side = right input (acero
    convention, ``hash_join_node.cc``)."""

    def __init__(self, left_schema: Schema, right_schema: Schema,
                 options):
        from ..acero.options import HashJoinNodeOptions
        assert isinstance(options, HashJoinNodeOptions)
        self.options = options
        self.join_type = options.join_type
        self.left_schema = left_schema
        self.right_schema = right_schema
        self.left_keys = list(options.left_keys)
        self.right_keys = list(options.right_keys)
        key_fields = [right_schema.field(k) for k in self.right_keys]
        self.max_build_rows = options.max_build_rows
        self.grouper = Grouper([f.type for f in key_fields],
                               [f.nullable for f in key_fields],
                               max_groups=options.max_build_rows)

        self.left_out = options.left_output or list(left_schema.names)
        self.right_out = options.right_output or list(right_schema.names)
        if self.join_type in ("left semi", "left anti"):
            self.right_out = []
        if self.join_type in ("right semi", "right anti"):
            self.left_out = []
        right_nullable = self.join_type in ("left outer", "full outer")
        left_nullable = self.join_type in ("right outer", "full outer")
        fields = []
        lsuf = options.output_suffix_for_left
        rsuf = options.output_suffix_for_right
        rnames = set(self.right_out)
        for n in self.left_out:
            f = left_schema.field(n)
            name = n + lsuf if (n in rnames and (lsuf or rsuf)) else n
            fields.append(Field(name, f.type, f.nullable or left_nullable))
        lnames = set(self.left_out)
        for n in self.right_out:
            f = right_schema.field(n)
            name = n + rsuf if (n in lnames and (lsuf or rsuf)) else n
            fields.append(Field(name, f.type, f.nullable or right_nullable))
        self.out_schema = Schema(tuple(fields))

    # ------------------------------------------------------------------
    def build(self, right: Batch) -> BuildState:
        """Insert the (accumulated) build side. One call; use
        ops.concat.concat_batches upstream for multi-batch builds."""
        cap = right.capacity
        keys = [right.column(k) for k in self.right_keys]
        ok = _all_valid(keys, cap)
        gstate = self.grouper.init_state()
        gstate, gids = self.grouper.consume(gstate, keys,
                                            length=right.length, active=ok)
        G = self.max_build_rows
        pos = jnp.where(gids >= 0, gids, G)
        counts = jnp.zeros((G + 1,), dtype=jnp.int32).at[pos].add(
            1, mode="drop")
        starts = jnp.concatenate([
            jnp.zeros((1,), jnp.int32),
            jnp.cumsum(counts[:G]).astype(jnp.int32)])
        # contiguous payload runs per group: stable sort rows by gid
        iota = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).reshape(
            (cap,))
        _, perm = jax.lax.sort([pos, iota], num_keys=1, is_stable=True)
        matched = jnp.zeros((cap,), dtype=jnp.bool_)
        error = gstate.error
        return BuildState(gstate, right, counts[:G], starts, perm, matched,
                          jnp.asarray(right.length, jnp.int32), error)

    # ------------------------------------------------------------------
    def probe(self, bs: BuildState, left: Batch,
              fanout_capacity: Optional[int] = None
              ) -> Tuple[Optional[Batch], BuildState]:
        """Probe one batch. Returns (output batch or None for right-side
        joins, updated build state)."""
        cap = left.capacity
        keys = [left.column(k) for k in self.left_keys]
        ok = _all_valid(keys, cap)
        in_range = row_mask(cap, left.length)
        gids = self.grouper.lookup(bs.grouper_state, keys,
                                   length=left.length, active=ok)
        cnt = jnp.where(gids >= 0, bs.counts[jnp.clip(gids, 0)], 0)

        jt = self.join_type
        if jt in ("left semi", "left anti"):
            sel = (cnt > 0) if jt == "left semi" else \
                (in_range & (cnt == 0))
            out = filter_batch(left,
                               Array(dt.bool_, sel, None, length=left.length))
            out = out.select(self.left_out)
            return self._rename(out), bs

        if jt in ("right semi", "right anti", "right outer"):
            # only update the matched bitmap; emission happens at finish
            bs = self._update_matched(bs, gids, cnt)
            if jt == "right outer":
                outb, bs2 = self._expand(bs, left, gids, cnt,
                                         fanout_capacity,
                                         emit_unmatched_probe=False,
                                         update_matched=False)
                return outb, bs2
            return None, bs

        emit_unmatched_probe = jt in ("left outer", "full outer")
        return self._expand(bs, left, gids, cnt, fanout_capacity,
                            emit_unmatched_probe=emit_unmatched_probe,
                            update_matched=(jt == "full outer"))

    def _update_matched(self, bs: BuildState, gids, cnt) -> BuildState:
        # build rows matched by any probe row: all rows in matched groups
        G = self.max_build_rows
        grp_hit = jnp.zeros((G + 1,), dtype=jnp.bool_).at[
            jnp.where(gids >= 0, gids, G)].max(
            jnp.ones_like(gids, dtype=jnp.bool_), mode="drop")[:G]
        # mark build rows whose group was hit
        bgids = self._build_gids(bs)
        matched = bs.matched | ((bgids >= 0) & grp_hit[jnp.clip(bgids, 0)])
        return BuildState(bs.grouper_state, bs.batch, bs.counts, bs.starts,
                          bs.perm, matched, bs.num_rows, bs.error)

    def _build_gids(self, bs: BuildState) -> jax.Array:
        keys = [bs.batch.column(k) for k in self.right_keys]
        ok = _all_valid(keys, bs.batch.capacity)
        return self.grouper.lookup(bs.grouper_state, keys,
                                   length=bs.num_rows, active=ok)

    # ------------------------------------------------------------------
    def _expand(self, bs: BuildState, left: Batch, gids, cnt,
                fanout_capacity, emit_unmatched_probe: bool,
                update_matched: bool):
        cap = left.capacity
        T = fanout_capacity or self.options.fanout_capacity or cap
        in_range = row_mask(cap, left.length)
        emit = cnt
        if emit_unmatched_probe:
            emit = jnp.where(in_range & (cnt == 0), 1, cnt)
        offsets = jnp.cumsum(emit) - emit          # exclusive prefix sum
        total = jnp.sum(emit).astype(jnp.int32)
        error = bs.error | jnp.int32(total > T)

        iota_c = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).reshape(
            (cap,))
        spos = jnp.where(emit > 0, offsets, T)
        # scatter (row id, start) at each row's first output slot, then
        # forward-max-scan fills the fanout gaps
        A = jnp.full((T,), -1, dtype=jnp.int32).at[spos].max(
            iota_c, mode="drop", unique_indices=True)
        B = jnp.full((T,), -1, dtype=jnp.int32).at[spos].max(
            offsets.astype(jnp.int32), mode="drop", unique_indices=True)
        from .segment import running_scan
        r_of_j = running_scan(A, jnp.maximum, -1)
        start_of_j = running_scan(B, jnp.maximum, -1)
        jidx = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0).reshape((T,))
        valid_j = (jidx < total) & (r_of_j >= 0)
        r = jnp.clip(r_of_j, 0)
        o = jidx - start_of_j
        gid_j = gids[r]
        has_match = valid_j & (gid_j >= 0) & (o < cnt[r])
        brow_sorted_pos = bs.starts[jnp.clip(gid_j, 0)] + o
        brow = bs.perm[jnp.clip(brow_sorted_pos, 0, bs.batch.capacity - 1)]
        brow = jnp.where(has_match, brow, 0)

        # gather output columns
        arrays = []
        left_idx = Array(dt.int32, r, None, length=total)
        for n in self.left_out:
            a = take_array(left.column(n), left_idx)
            arrays.append(a)
        bvalid = has_match
        right_idx = Array(dt.int32, brow, None, length=total)
        for n in self.right_out:
            a = take_array(bs.batch.column(n), right_idx)
            v = a.validity
            v = bvalid if v is None else (v & bvalid)
            arrays.append(a.with_validity(v))
        out = Batch(self.out_schema, arrays, total)

        if update_matched:
            bcap = bs.batch.capacity
            matched = bs.matched.at[jnp.where(has_match, brow, bcap)].max(
                jnp.ones((T,), jnp.bool_), mode="drop")
            bs = BuildState(bs.grouper_state, bs.batch, bs.counts,
                            bs.starts, bs.perm, matched, bs.num_rows, error)
        else:
            bs = BuildState(bs.grouper_state, bs.batch, bs.counts,
                            bs.starts, bs.perm, bs.matched, bs.num_rows,
                            error)
        return out, bs

    # ------------------------------------------------------------------
    def finish(self, bs: BuildState) -> Optional[Batch]:
        """Emit trailing rows for right-side join types."""
        jt = self.join_type
        if jt in ("right outer", "full outer", "right semi", "right anti"):
            if jt == "right semi":
                sel = bs.matched
            elif jt == "right anti":
                sel = ~bs.matched & row_mask(bs.batch.capacity, bs.num_rows)
            else:
                sel = ~bs.matched & row_mask(bs.batch.capacity, bs.num_rows)
            picked = filter_batch(
                bs.batch, Array(dt.bool_, sel, None, length=bs.num_rows))
            arrays = []
            n_out = picked.length
            for n in self.left_out:
                f = self.left_schema.field(n)
                t = f.type
                vals = jnp.zeros((picked.capacity,) +
                                 (() if not t.is_varlen else ()),
                                 dtype=t.storage_np) if not t.is_varlen \
                    else None
                if t.is_varlen:
                    arrays.append(Array(
                        t, jnp.zeros((16,), jnp.uint8),
                        jnp.zeros((picked.capacity,), jnp.bool_),
                        offsets=jnp.zeros((picked.capacity + 1,), jnp.int32),
                        length=n_out))
                else:
                    arrays.append(Array(
                        t, vals, jnp.zeros((picked.capacity,), jnp.bool_),
                        length=n_out))
            for n in self.right_out:
                arrays.append(picked.column(n))
            return Batch(self.out_schema, arrays, n_out)
        return None

    def _rename(self, b: Batch) -> Batch:
        return Batch(self.out_schema, b.arrays, b.length, b.index)
