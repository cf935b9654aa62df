"""Hash join (the SwissJoin analog).

Reference: ``cpp/src/arrow/acero/swiss_join.cc`` + ``swiss_join_internal.h``
— build (partition/insert/merge), probe (hash -> early_filter -> find ->
materialize), match bit-vectors for outer joins, ``key_to_payload`` offsets
for duplicate keys (``swiss_join_internal.h:483``).

TPU-native redesign (second generation — fully sort-merge shaped):
  * Build: ONE sort-group pass over the build side (ops/distinct) yields,
    with no colliding scatters: dense first-appearance group ids per
    distinct key, contiguous payload runs per key (the row-major
    key_to_payload layout), per-group counts/starts from run boundaries,
    and the unique key lanes in gid order.
  * Probe: sort-merge find — the build's unique key lanes concat with the
    probe keys and ONE variadic sort groups equal keys; a segmented
    last-build scan hands every probe row its gid (the per-round
    table-gather loop of a hash probe ran ~7x slower on v5e). Fanout
    expansion uses the scatter + prefix-max-scan trick (unique-index
    scatters + doubling scans only).
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
                 "matched", "num_rows", "error", "key_lanes", "bgids")

    def __init__(self, grouper_state, batch, counts, starts, perm, matched,
                 num_rows, error, key_lanes=None, bgids=None):
        self.grouper_state = grouper_state  # int32 scalar: num build groups
        self.batch = batch
        self.counts = counts
        self.starts = starts
        self.perm = perm
        self.matched = matched
        self.num_rows = num_rows
        self.error = error
        self.key_lanes = key_lanes   # (G, L) unique build key lanes, gid order
        self.bgids = bgids           # (cap,) build row -> gid (-1 null key)

    def tree_flatten(self):
        return ((self.grouper_state, self.batch, self.counts, self.starts,
                 self.perm, self.matched, self.num_rows, self.error,
                 self.key_lanes, self.bgids), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def _with_error(self, error):
        return BuildState(self.grouper_state, self.batch, self.counts,
                          self.starts, self.perm, self.matched,
                          self.num_rows, self.error | error,
                          self.key_lanes, self.bgids)

    def _with_matched(self, matched, error=None):
        return BuildState(self.grouper_state, self.batch, self.counts,
                          self.starts, self.perm, matched, self.num_rows,
                          self.error if error is None else
                          (self.error | error), self.key_lanes, self.bgids)


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

        # [] means "no columns from this side"; only None means all
        self.left_out = options.left_output \
            if options.left_output is not None else list(left_schema.names)
        self.right_out = options.right_output \
            if options.right_output is not None else list(right_schema.names)
        if self.join_type in ("left semi", "left anti"):
            self.right_out = []
        if self.join_type in ("right semi", "right anti"):
            self.left_out = []
        # residual (non-equi) filter: ``acero/options.h:571`` filter,
        # evaluated per matched key pair (``swiss_join.cc``
        # JoinResidualFilter). A pair whose filter comes out false/null
        # is treated as a non-match for every join type.
        self.residual = getattr(options, "filter", None)
        if self.residual is not None and \
                self.residual.kind == self.residual.KIND_LITERAL:
            v = self.residual.value.as_py()
            if v:
                self.residual = None   # literal(true) = no filter
        if self.residual is not None:
            refs = set(self.residual.field_names())
            self._resid_left = [n for n in left_schema.names if n in refs]
            self._resid_right = [n for n in right_schema.names if n in refs]
            dup = set(self._resid_left) & set(self._resid_right)
            if dup:
                raise ValueError(
                    f"hash join filter field(s) {sorted(dup)} exist on "
                    "both sides; rename before the join")
            missing = refs - set(self._resid_left) - set(self._resid_right)
            if missing:
                raise KeyError(
                    f"hash join filter references unknown field(s) "
                    f"{sorted(missing)}")

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
        ops.concat.concat_batches upstream for multi-batch builds.

        One sort-group pass yields everything (no colliding scatters):
        payload runs (perm), per-gid starts/counts (run boundaries), and
        the unique key lanes in gid order for the sort-merge probe."""
        from .distinct import sort_group
        from .grouper import group_key_lanes
        cap = right.capacity
        keys = [right.column(k) for k in self.right_keys]
        ok = _all_valid(keys, cap)
        lanes = group_key_lanes(keys, self.grouper.key_nullable)
        active = row_mask(cap, right.length) & ok
        G = self.max_build_rows
        R = min(cap, G)
        # single-shot build: NO hash table at all — first-appearance ids
        # from the sort ARE the gids (the claim-tournament insert costs
        # ~5s/1M-slot table on v5e; it exists for streaming consumes only)
        g, _ = sort_group(lanes, active, rep_capacity=R)
        GG = min(R, G)
        starts = jnp.full((G,), cap, jnp.int32).at[:GG].set(
            g.head_pos[:GG])
        # per-seg run widths -> counts in gid order (unique scatter)
        sidx = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0).reshape((R,))
        nxt = jnp.concatenate([g.head_pos_seg[1:],
                               jnp.full((1,), cap, jnp.int32)])
        in_use = sidx < g.num_unique
        ends_seg = jnp.where(sidx < g.num_unique - 1, nxt, g.n_active)
        ends_seg = jnp.where(in_use, ends_seg, g.head_pos_seg)
        cnt_seg = (ends_seg - g.head_pos_seg).astype(jnp.int32)
        counts = jnp.zeros((G,), jnp.int32).at[
            jnp.where(in_use, jnp.clip(g.gid_of_seg, 0, G - 1), G)].set(
            cnt_seg, mode="drop", unique_indices=True)
        key_lanes = jnp.zeros((G, lanes.shape[1]), jnp.uint32).at[
            :GG].set(lanes[jnp.clip(g.unique_rows[:GG], 0, cap - 1)])
        bgids = g.codes
        matched = jnp.zeros((cap,), dtype=jnp.bool_)
        error = jnp.where(g.num_unique > G, 1, 0).astype(jnp.int32)
        return BuildState(g.num_unique, right, counts, starts, g.perm,
                          matched, jnp.asarray(right.length, jnp.int32),
                          error, key_lanes, bgids)

    # ------------------------------------------------------------------
    def bloom_build(self, bs: BuildState) -> jax.Array:
        """Bloom bitset over the build side's distinct key lanes
        (``bloom_filter.h:42`` BlockedBloomFilter; see ops/bloom.py for
        the TPU redesign)."""
        from .bloom import bloom_m_log2, build_bloom
        G = self.max_build_rows
        gidx = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0).reshape((G,))
        active = gidx < bs.grouper_state
        return build_bloom(bs.key_lanes, active, bloom_m_log2(G))

    def bloom_mask(self, bits: jax.Array, left: Batch) -> Array:
        """bool mask: True where the probe row's key MAY match the build
        side. Null-key / out-of-range rows -> False (they never key-match
        any build row, for every join type)."""
        from .bloom import query_bloom
        from .grouper import group_key_lanes
        cap = left.capacity
        keys = [left.column(k) for k in self.left_keys]
        ok = _all_valid(keys, cap) & row_mask(cap, left.length)
        lanes = group_key_lanes(keys, self.grouper.key_nullable)
        hit = query_bloom(bits, lanes, ok)
        return Array(dt.bool_, hit, None, length=left.length)

    def partition_ids(self, b: Batch, side: str, K: int) -> jax.Array:
        """Grace-join hash partition per row: hash(normalized key lanes)
        & (K-1). Both sides use the SAME lane normalization, so equal
        keys always co-partition; null-key rows land deterministically
        (they never match, but outer joins still emit them from their
        partition)."""
        from .bloom import _lane_hashes
        from .grouper import group_key_lanes
        names = self.right_keys if side == "build" else self.left_keys
        keys = [b.column(k) for k in names]
        lanes = group_key_lanes(keys, self.grouper.key_nullable)
        h1, _ = _lane_hashes(lanes)
        return (h1 & jnp.uint32(K - 1)).astype(jnp.int32)

    # ------------------------------------------------------------------
    def _probe_gids(self, bs: BuildState, left: Batch,
                    keys: Sequence[Array], ok: jax.Array) -> jax.Array:
        """Sort-merge find: concat (unique build key lanes ++ probe keys),
        one variadic sort groups equal keys with build rows first, a
        segmented last-build scan carries each run's gid to its probe
        rows. Replaces the per-round table-gather loop (7x slower on
        v5e)."""
        from .grouper import group_key_lanes
        from .segment import segmented_carry_last
        capP = left.capacity
        lanes_p = group_key_lanes(keys, self.grouper.key_nullable)
        act_p = row_mask(capP, left.length) & ok
        G = self.max_build_rows
        L = lanes_p.shape[1]
        gidx = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0).reshape((G,))
        lanesA = jnp.concatenate([bs.key_lanes, lanes_p])
        actA = jnp.concatenate([gidx < bs.grouper_state, act_p])
        side = jnp.concatenate([jnp.zeros((G,), jnp.uint32),
                                jnp.ones((capP,), jnp.uint32)])
        gpay = jnp.concatenate([gidx, jnp.full((capP,), -1, jnp.int32)])
        piota = jax.lax.broadcasted_iota(jnp.int32, (capP, 1), 0).reshape(
            (capP,))
        outp = jnp.concatenate([jnp.full((G,), -1, jnp.int32), piota])
        inact = (~actA).astype(jnp.uint32)
        ops = [inact] + [lanesA[:, j] for j in range(L)] + [side, gpay,
                                                            outp]
        out = jax.lax.sort(ops, num_keys=L + 2, is_stable=False)
        s_act = out[0] == 0
        s_lanes = out[1:1 + L]
        s_gpay = out[2 + L]
        s_outp = out[3 + L]
        diff = s_lanes[0][1:] != s_lanes[0][:-1]
        for c in s_lanes[1:]:
            diff = diff | (c[1:] != c[:-1])
        head = s_act & jnp.concatenate(
            [jnp.ones((1,), jnp.bool_), diff | ~s_act[:-1]])
        carried = segmented_carry_last(s_gpay, head)
        val = jnp.where(s_act, carried, jnp.int32(-1))
        gids = jnp.full((capP,), -1, jnp.int32).at[
            jnp.where(s_outp >= 0, s_outp, capP)].set(
            val, mode="drop", unique_indices=True)
        return gids

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
        gids = self._probe_gids(bs, left, keys, ok)
        cnt = jnp.where(gids >= 0, bs.counts[jnp.clip(gids, 0)], 0)

        jt = self.join_type
        if jt in ("left semi", "left anti"):
            if self.residual is None:
                sel = (cnt > 0) if jt == "left semi" else \
                    (in_range & (cnt == 0))
            else:
                # a probe row matches only if >=1 pair passes the filter
                pass_any, err = self._pass_any(bs, left, gids, cnt,
                                               fanout_capacity)
                bs = bs._with_error(err)
                sel = pass_any if jt == "left semi" else \
                    (in_range & ~pass_any)
            out = filter_batch(left,
                               Array(dt.bool_, sel, None, length=left.length))
            out = out.select(self.left_out)
            return self._rename(out), bs

        if jt in ("right semi", "right anti", "right outer"):
            if self.residual is None:
                # only update the matched bitmap; emission at finish
                bs = self._update_matched(bs, gids, cnt)
            else:
                bs = self._update_matched_residual(bs, left, gids, cnt,
                                                   fanout_capacity)
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
        bgids = bs.bgids
        matched = bs.matched | ((bgids >= 0) & grp_hit[jnp.clip(bgids, 0)])
        return BuildState(bs.grouper_state, bs.batch, bs.counts, bs.starts,
                          bs.perm, matched, bs.num_rows, bs.error,
                          bs.key_lanes, bs.bgids)


    # ------------------------------------------------------------------
    def _pair_geometry(self, bs: BuildState, left: Batch, gids, cnt,
                       fanout_capacity, emit_unmatched_probe: bool):
        """Expand (probe row, gid) matches into flat pair slots.

        Returns (r, o, brow, has_match, valid_j, pass_, total, overflow):
        ``r`` probe row per slot, ``o`` the match ordinal within the row,
        ``brow`` the build row, ``pass_`` = has_match AND the residual
        filter (``swiss_join.cc`` JoinResidualFilter semantics: a
        false/null filter pair is a non-match)."""
        cap = left.capacity
        T = fanout_capacity or self.options.fanout_capacity or cap
        in_range = row_mask(cap, left.length)
        emit = cnt
        if emit_unmatched_probe:
            emit = jnp.where(in_range & (cnt == 0), 1, cnt)
        offsets = jnp.cumsum(emit) - emit          # exclusive prefix sum
        total = jnp.sum(emit).astype(jnp.int32)
        overflow = jnp.int32(total > T)

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

        pass_ = has_match
        if self.residual is not None:
            pass_ = has_match & self._residual_pass(
                bs, left, r, brow, has_match, total)
        return r, o, brow, has_match, valid_j, pass_, total, overflow

    def _residual_pass(self, bs: BuildState, left: Batch, r, brow,
                       has_match, total) -> jax.Array:
        """Evaluate the residual filter on the materialized pairs; null
        results count as false (Arrow filter-null semantics)."""
        from ..compute.expressions import execute_scalar_expression
        from ..compute.scalar import Scalar
        T = r.shape[0]
        left_idx = Array(dt.int32, r, None, length=total)
        right_idx = Array(dt.int32, brow, None, length=total)
        lgrow = -(-T // max(left.capacity, 1))
        rgrow = -(-T // max(bs.batch.capacity, 1))
        fields = []
        arrays = []
        for n in self._resid_left:
            fields.append(self.left_schema.field(n))
            arrays.append(take_array(left.column(n), left_idx, grow=lgrow))
        for n in self._resid_right:
            fields.append(self.right_schema.field(n))
            a = take_array(bs.batch.column(n), right_idx, grow=rgrow)
            v = a.validity
            v = has_match if v is None else (v & has_match)
            arrays.append(a.with_validity(v))
        pb = Batch(Schema(tuple(fields)), arrays, total)
        res = execute_scalar_expression(self.residual, pb)
        if isinstance(res, Scalar):
            ok = bool(res.is_valid) and bool(res.as_py())
            return jnp.full((T,), ok, jnp.bool_)
        pv = res.values.astype(jnp.bool_)
        if res.validity is not None:
            pv = pv & res.validity
        return pv

    def _pass_any(self, bs: BuildState, left: Batch, gids, cnt,
                  fanout_capacity):
        """(probe row -> any pair passes the residual filter, overflow)."""
        cap = left.capacity
        r, o, brow, has_match, valid_j, pass_, total, overflow = \
            self._pair_geometry(bs, left, gids, cnt, fanout_capacity,
                                emit_unmatched_probe=False)
        pass_any = jnp.zeros((cap,), jnp.bool_).at[
            jnp.where(pass_, r, cap)].max(
            jnp.ones_like(r, dtype=jnp.bool_), mode="drop")
        return pass_any, overflow

    def _update_matched_residual(self, bs: BuildState, left: Batch, gids,
                                 cnt, fanout_capacity) -> BuildState:
        """Per-pair matched update: with a residual filter a build ROW is
        matched only if one of its own pairs passed (group-level hit
        tracking is not enough)."""
        r, o, brow, has_match, valid_j, pass_, total, overflow = \
            self._pair_geometry(bs, left, gids, cnt, fanout_capacity,
                                emit_unmatched_probe=False)
        bcap = bs.batch.capacity
        matched = bs.matched.at[jnp.where(pass_, brow, bcap)].max(
            jnp.ones_like(brow, dtype=jnp.bool_), mode="drop")
        return bs._with_matched(matched, overflow)

    def _expand(self, bs: BuildState, left: Batch, gids, cnt,
                fanout_capacity, emit_unmatched_probe: bool,
                update_matched: bool):
        cap = left.capacity
        r, o, brow, has_match, valid_j, pass_, total, overflow = \
            self._pair_geometry(bs, left, gids, cnt, fanout_capacity,
                                emit_unmatched_probe)
        error = bs.error | overflow

        # gather output columns; fanout repeats rows, so varlen pools
        # scale by ceil(T / source capacity) (see take_array grow)
        T = r.shape[0]
        arrays = []
        left_idx = Array(dt.int32, r, None, length=total)
        lgrow = -(-T // max(cap, 1))
        for n in self.left_out:
            a = take_array(left.column(n), left_idx, grow=lgrow)
            arrays.append(a)
        bvalid = pass_
        right_idx = Array(dt.int32, brow, None, length=total)
        rgrow = -(-T // max(bs.batch.capacity, 1))
        for n in self.right_out:
            a = take_array(bs.batch.column(n), right_idx, grow=rgrow)
            v = a.validity
            v = bvalid if v is None else (v & bvalid)
            arrays.append(a.with_validity(v))
        out = Batch(self.out_schema, arrays, total)

        if self.residual is not None:
            # drop pairs the filter rejected; probe rows whose every pair
            # failed fall back to a single null-right emission for
            # left/full outer (JoinResidualFilter outer semantics)
            keep = pass_ | (valid_j & ~has_match)
            if emit_unmatched_probe:
                pass_any = jnp.zeros((cap,), jnp.bool_).at[
                    jnp.where(pass_, r, cap)].max(
                    jnp.ones_like(r, dtype=jnp.bool_), mode="drop")
                keep = keep | (valid_j & has_match & (o == 0) &
                               ~pass_any[r])
            out = filter_batch(out, Array(dt.bool_, keep, None,
                                          length=total))

        if update_matched:
            bcap = bs.batch.capacity
            matched = bs.matched.at[jnp.where(pass_, brow, bcap)].max(
                jnp.ones_like(brow, dtype=jnp.bool_), mode="drop")
            bs = bs._with_matched(matched, overflow)
        else:
            bs = bs._with_error(overflow)
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
