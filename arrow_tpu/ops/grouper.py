"""Grouper: vectorized hash-table grouping (the SwissTable/Grouper analog).

Reference contract: ``cpp/src/arrow/compute/row/grouper.h:105`` — Consume
(keys) -> dense uint32 group ids in ORDER OF FIRST APPEARANCE, persisting
across calls; GetUniques() returns the unique key rows in group-id order.
Reference implementation: ``grouper.cc:548`` (GrouperFastImpl = SwissTable +
RowTableEncoder, 1024-row minibatches, AVX2).

TPU-native redesign (SURVEY.md §2.4 "TPU mapping"): the per-row probe loop
does not translate; instead the whole batch probes **in lockstep**:

  1. Keys are normalized to fixed-width uint32 **lanes** (raw bits +
     a validity lane per nullable column). Group equality is Arrow's
     byte-equality: -0.0 != 0.0, NaN == NaN bitwise, null == null.
  2. One stable multi-key sort groups equal keys (ops/distinct.sort_group)
     and yields batch-local first-appearance ids; the batch's unique key
     representatives then SORT-MERGE into the persistent lane-sorted
     table (ops/distinct.merge_insert) — existing keys pick up their gid
     through a segmented scan, new keys get num_groups + rank.
  3. The whole pipeline is sorts + doubling scans + unique-index writes;
     no hash table, no colliding scatters, no per-row loops (all three
     measured orders of magnitude below bandwidth on v5e).

Everything is jit-compatible: static table capacity, dynamic counts.
Overflow (more groups than capacity) sets ``state.error`` (deferred
error — checked at the host boundary, Arrow would have resized).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core import datatype as dt
from ..core.array import Array, row_mask
from .bits import value_lanes32

__all__ = ["Grouper", "GrouperState", "SlotStrings", "group_key_lanes"]


@jax.tree_util.register_pytree_node_class
class SlotStrings:
    """Per-group varlen key uniques in fixed byte slots (pytree).

    The TPU-shape analog of the reference row table's varbinary region
    (``cpp/src/arrow/compute/row/row_internal.h:33``): each group's key
    bytes live in a static ``(G, W)`` slot; true lengths are kept
    separately and ``to_array`` compacts to a proper varlen Array at
    finalize. Strings longer than W set the deferred ``error`` flag
    (the resize the reference would do is a host-side re-run with a
    larger ``varlen_slot_bytes``)."""

    __slots__ = ("slots", "lens", "valid", "error")

    def __init__(self, slots, lens, valid, error):
        self.slots = slots          # (G, W) uint8
        self.lens = lens            # (G,) int32 true byte length
        self.valid = valid          # (G,) bool
        self.error = error          # int32 scalar, nonzero = slot overflow

    def tree_flatten(self):
        return ((self.slots, self.lens, self.valid, self.error), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @classmethod
    def init(cls, num_groups: int, slot_bytes: int) -> "SlotStrings":
        return cls(jnp.zeros((num_groups, slot_bytes), dtype=jnp.uint8),
                   jnp.zeros((num_groups,), dtype=jnp.int32),
                   jnp.zeros((num_groups,), dtype=jnp.bool_),
                   jnp.int32(0))

    def scatter_from(self, src: Array, rows: jax.Array, pos: jax.Array,
                     unique_indices: bool = False) -> "SlotStrings":
        """Write src[rows[i]]'s bytes into slot pos[i] (pos >= G drops)."""
        G, W = self.slots.shape
        cap = src.offsets.shape[0] - 1
        rows = jnp.clip(rows, 0, cap - 1)
        starts = src.offsets[rows]
        lens = (src.offsets[rows + 1] - starts).astype(jnp.int32)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
        bcap = src.values.shape[0]
        if bcap == 0:
            block = jnp.zeros((rows.shape[0], W), dtype=jnp.uint8)
        else:
            idx = jnp.clip(starts[:, None] + col, 0, bcap - 1)
            block = jnp.where(col < lens[:, None], src.values[idx],
                              jnp.uint8(0))
        sv = src.validity if src.validity is not None else \
            jnp.ones((cap,), dtype=jnp.bool_)
        slots = self.slots.at[pos].set(block, mode="drop",
                                       unique_indices=unique_indices)
        new_lens = self.lens.at[pos].set(lens, mode="drop",
                                         unique_indices=unique_indices)
        valid = self.valid.at[pos].set(sv[rows], mode="drop",
                                       unique_indices=unique_indices)
        written = pos < G
        error = self.error | jnp.where(
            jnp.any(written & (lens > W)), 2, 0).astype(jnp.int32)
        return SlotStrings(slots, new_lens, valid, error)

    def to_array(self, type: dt.DataType, length=None) -> Array:
        """Compact slots to a varlen Array (byte pool capacity G*W)."""
        G, W = self.slots.shape
        lens = jnp.minimum(self.lens, W)
        offsets = jnp.concatenate([
            jnp.zeros((1,), jnp.int32), jnp.cumsum(lens, dtype=jnp.int32)])
        P = G * W
        flat = self.slots.reshape((P,))
        j = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0).reshape((P,))
        r = jnp.clip(jnp.searchsorted(offsets, j, side="right") - 1,
                     0, G - 1).astype(jnp.int32)
        src = r * W + (j - offsets[r])
        pool = jnp.where(j < offsets[G],
                         flat[jnp.clip(src, 0, P - 1)], jnp.uint8(0))
        return Array(type, pool, jnp.asarray(self.valid),
                     offsets=offsets, length=length)

def _raw_lanes(a: Array) -> List[jax.Array]:
    """Key column -> uint32 lanes of the raw storage bits (bit equality).
    Delegates to ops.bits (TPU-safe: no 64-bit bitcasts; f64 handled per
    platform — see bits.py header).

    Varlen (string/binary) keys normalize to 5 lanes: byte length + two
    independent 64-bit full-content polynomial fingerprints
    (ops/hashing.string_fingerprint_exact) — the TPU-native replacement
    for the reference row table's varbinary key region
    (``row_internal.h:33``): equal content => equal lanes, and distinct
    content collides only with ~2^-128 probability (the same confidence
    class as the reference's full byte re-compare after a SwissTable
    stamp match)."""
    if a.type.is_varlen:
        from .hashing import varlen_content_lanes
        return varlen_content_lanes(a)
    if isinstance(a.type, dt.DictionaryType):
        # CONTENT lanes, not codes: codes are only comparable under one
        # dictionary; values compare across join sides / shards /
        # separately-ingested sources (ops/hashing.dict_content_lanes)
        from .hashing import dict_content_lanes
        return dict_content_lanes(a)
    return value_lanes32(a.values, a.type)


def group_key_lanes(columns: Sequence[Array],
                    nullable: Optional[Sequence[bool]] = None) -> jax.Array:
    """(capacity, L) uint32 lane matrix. Value lanes of null rows are zeroed
    (canonical) and a validity lane distinguishes null from zero."""
    lanes = []
    for i, c in enumerate(columns):
        is_nullable = c.validity is not None if nullable is None \
            else nullable[i]
        col_lanes = _raw_lanes(c)
        if c.validity is not None:
            ok = c.validity
            col_lanes = [jnp.where(ok, l, 0) for l in col_lanes]
            lanes.append(ok.astype(jnp.uint32))
        elif is_nullable:
            lanes.append(jnp.ones_like(col_lanes[0]))
        lanes.extend(col_lanes)
    return jnp.stack(lanes, axis=1)  # (cap, L)


@jax.tree_util.register_pytree_node_class
class GrouperState:
    """Persistent grouping table (pytree).

    table_lanes: (S, L) uint32 — lanes of inserted unique keys
    table_gid:   (S,) int32   — group id per slot, -1 empty
    num_groups:  int32 scalar
    error:       int32 scalar — nonzero => table overflow
    """

    __slots__ = ("table_lanes", "table_gid", "num_groups", "error")

    def __init__(self, table_lanes, table_gid, num_groups, error):
        self.table_lanes = table_lanes
        self.table_gid = table_gid
        self.num_groups = num_groups
        self.error = error

    def tree_flatten(self):
        return ((self.table_lanes, self.table_gid, self.num_groups,
                 self.error), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def capacity(self) -> int:
        return self.table_gid.shape[0]


class Grouper:
    """Static-config grouping engine over fixed-width normalized keys.

    max_groups: static capacity for distinct keys; the probe table is
    2*max_groups slots (50% max load factor).
    """

    def __init__(self, key_types: Sequence[dt.DataType],
                 key_nullable: Sequence[bool],
                 max_groups: int = 1 << 16,
                 varlen_slot_bytes: int = 64):
        self.key_types = tuple(key_types)
        self.key_nullable = tuple(key_nullable)
        self.max_groups = max_groups
        # fixed byte-slot width for varlen key uniques (row-table
        # varbinary-region analog); strings longer than this overflow
        # with a deferred error
        self.varlen_slot_bytes = varlen_slot_bytes
        # sorted-table state: exactly max_groups slots (no load factor)
        self.table_size = max_groups
        # lane count is static given types+nullability
        self.num_lanes = 0
        for t, nb in zip(self.key_types, self.key_nullable):
            if t.is_varlen:
                width = 5          # length + 2x 64-bit fingerprints
            elif isinstance(t, dt.DictionaryType):
                from .hashing import dict_value_lane_width
                width = dict_value_lane_width(t)
            elif isinstance(t, dt.DecimalType) and t.wide:
                width = 4          # two-limb decimal (bits.py)
            elif t.is_primitive and t.bit_width == 64:
                width = 2
            else:
                width = 1
            self.num_lanes += width + (1 if nb else 0)

    def init_state(self) -> GrouperState:
        S = self.table_size
        return GrouperState(
            table_lanes=jnp.zeros((S, self.num_lanes), dtype=jnp.uint32),
            table_gid=jnp.full((S,), -1, dtype=jnp.int32),
            num_groups=jnp.int32(0),
            error=jnp.int32(0),
        )

    # -------------------------------------------------------------------
    def consume(self, state: GrouperState, keys: Sequence[Array],
                length=None, active=None
                ) -> Tuple[GrouperState, jax.Array]:
        """Insert key rows; return (new_state, group_ids int32 (capacity,)).

        Padding / filtered-out / inactive rows get group_id -1. ``active``
        lets callers exclude rows (e.g. the join build excludes null keys —
        join keys never match on null, unlike group_by).
        """
        cap = keys[0].capacity
        if length is None:
            length = keys[0].length
        lanes = group_key_lanes(keys, self.key_nullable)  # (cap, L)
        in_range = row_mask(cap, length)
        if active is not None:
            in_range = in_range & active
        return self._consume_lanes(state, lanes, in_range)

    def consume_with_group(self, state: GrouperState,
                           keys: Sequence[Array], length=None, active=None,
                           payloads=(), pack=None, first: bool = False,
                           need_codes: bool = True):
        """Like consume, but also returns (rep_gids, SortGroup) so callers
        can run segment-reduction aggregation over the sorted batch
        (ops/segment) instead of row scatters.

        ``pack``: optional (lo, shift, outmap, K) range-packing of the L
        key lanes into K < L sort lanes (lo/shift/outmap are DYNAMIC
        (L,)-arrays — no recompile when the key ranges shift; K is
        static). Valid only when the caller verified the per-bin bit
        totals fit 30 bits on the host (AggregateNode probe). The
        persistent table always stores the ORIGINAL lanes, so packing is
        purely a per-batch sort-key reduction — sort cost scales with
        KEY operand count on v5e (tools/probe_prims.py).

        ``first``: the state is known empty — the batch-local
        first-appearance ids ARE the persistent gids and the (S+R)-row
        merge-insert sort is skipped entirely; the lane-sorted table
        builds directly from this batch's sort."""
        cap = keys[0].capacity
        if length is None:
            length = keys[0].length
        lanes = group_key_lanes(keys, self.key_nullable)
        in_range = row_mask(cap, length)
        if active is not None:
            in_range = in_range & active
        return self.consume_lanes_grouped(state, lanes, in_range,
                                          payloads=payloads, pack=pack,
                                          first=first,
                                          need_codes=need_codes)

    def _consume_lanes(self, state: GrouperState, lanes: jax.Array,
                       active: jax.Array
                       ) -> Tuple[GrouperState, jax.Array]:
        """Sort-based consume: batch-local distinct via one lexsort
        (ops/distinct), then a sort-merge insert of the unique reps into
        the lane-sorted persistent table — no hash table anywhere."""
        state, rep_gids, g, _ = self.consume_lanes_grouped(state, lanes,
                                                           active)
        R = rep_gids.shape[0]
        row_gids = jnp.where(
            g.codes >= 0, rep_gids[jnp.clip(g.codes, 0, R - 1)],
            jnp.int32(-1))
        return state, row_gids

    def consume_lanes_grouped(self, state: GrouperState, lanes: jax.Array,
                              active: jax.Array, payloads=(), pack=None,
                              first: bool = False,
                              need_codes: bool = True):
        """(new_state, rep_gids (R,), SortGroup, sorted_payloads) —
        rep_gids maps the batch-local first-appearance ids to persistent
        group ids; payloads ride the one variadic sort (see
        distinct.sort_group). See ``consume_with_group`` for
        pack/first/need_codes."""
        from .distinct import _FOLD_SENTINEL, sort_group
        cap, L = lanes.shape
        R = min(cap, self.table_size)
        folded = False
        if pack is not None:
            lo, shift, outmap, K, fold = pack
            cols = []
            for k in range(K):
                pk = jnp.zeros((cap,), jnp.uint32)
                for j in range(L):
                    d = lanes[:, j] - lo[j]
                    pk = pk | jnp.where(outmap[j] == k,
                                        jnp.left_shift(d, shift[j]),
                                        jnp.uint32(0))
                cols.append(pk)
            if fold:
                cols[0] = jnp.where(active, cols[0],
                                    jnp.uint32(_FOLD_SENTINEL))
            sort_lanes = jnp.stack(cols, axis=1)
            folded = bool(fold)
        else:
            sort_lanes = lanes
        # the ORIGINAL lanes ride the sort as trailing payloads: the rep
        # table rows come back via one unique scatter instead of an
        # R x L random gather
        extras = tuple(lanes[:, j] for j in range(L))
        g, s_payloads = sort_group(sort_lanes, active, rep_capacity=R,
                                   payloads=tuple(payloads) + extras,
                                   folded=folded, need_codes=need_codes)
        s_lane_cols = s_payloads[len(payloads):]
        s_payloads = s_payloads[:len(payloads)]
        ridx = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0).reshape((R,))
        rep_active = ridx < jnp.minimum(g.num_unique, R)
        # rep lanes in first-appearance (gid) order via one unique scatter
        segc = jnp.clip(g.seg, 0, R - 1)
        rep_pos = jnp.where(g.head & (g.seg < R),
                            g.gid_of_seg[segc], R)
        rep_lanes = jnp.zeros((R, L), jnp.uint32).at[rep_pos].set(
            jnp.stack(list(s_lane_cols), axis=1), mode="drop",
            unique_indices=True)
        if first:
            S = self.table_size
            rep_gids = jnp.where(rep_active, ridx, jnp.int32(-1))
            # lane-sorted table directly from this batch's sort
            tab_pos = jnp.where(g.head & (g.seg < S), g.seg, S)
            table_lanes = jnp.zeros((S, L), jnp.uint32).at[tab_pos].set(
                jnp.stack(list(s_lane_cols), axis=1), mode="drop",
                unique_indices=True)
            gid_pad = jnp.full((S,), -1, jnp.int32).at[:R].set(
                jnp.where(ridx < g.num_unique, g.gid_of_seg,
                          jnp.int32(-1)))
            num_groups = jnp.minimum(g.num_unique, R)
            error = state.error | jnp.where(
                g.num_unique > self.max_groups, 1, 0).astype(jnp.int32)
            new_state = GrouperState(table_lanes, gid_pad, num_groups,
                                     error)
        else:
            new_state, rep_gids = self._consume_lanes_table(
                state, rep_lanes, rep_active)
        overflow = jnp.where(g.num_unique > R, 4, 0).astype(jnp.int32)
        new_state = GrouperState(new_state.table_lanes, new_state.table_gid,
                                 new_state.num_groups,
                                 new_state.error | overflow)
        return new_state, rep_gids, g, s_payloads

    def _consume_lanes_table(self, state: GrouperState, lanes: jax.Array,
                             active: jax.Array
                             ) -> Tuple[GrouperState, jax.Array]:
        """Insert unique key reps into the SORTED table via one
        sort-merge (ops/distinct.merge_insert) — the claim-tournament
        hash insert this replaces cost ~5s per 1M-slot table on v5e
        (colliding scatters serialize)."""
        from .distinct import merge_insert
        new_lanes, new_gid, rep_gids, new_count = merge_insert(
            state.table_lanes, state.table_gid, state.num_groups,
            lanes, active)
        num_groups = state.num_groups + new_count
        error = state.error | jnp.where(num_groups > self.max_groups,
                                        1, 0).astype(jnp.int32)
        return (GrouperState(new_lanes, new_gid, num_groups, error),
                rep_gids)

    # -------------------------------------------------------------------
    def lookup(self, state: GrouperState, keys: Sequence[Array],
               length=None, active: Optional[jax.Array] = None
               ) -> jax.Array:
        """Find-only probe (no inserts): group id per row, -1 on miss.

        The role of SwissTable::find (``key_map_internal.h:63``): hash ->
        walk the probe chain comparing lanes; an empty slot along the chain
        proves absence (linear-probing invariant — slots never empty out).
        `active=False` rows (padding, null join keys) return -1.
        """
        cap = keys[0].capacity
        if length is None:
            length = keys[0].length
        lanes = group_key_lanes(keys, self.key_nullable)
        act = row_mask(cap, length)
        if active is not None:
            act = act & active
        from .distinct import merge_find
        return merge_find(state.table_lanes, state.table_gid, lanes, act)

    # -------------------------------------------------------------------
    def uniques_scatter_reps(self, keys: Sequence[Array], g, rep_gids,
                             uniques: Optional[Sequence[Array]] = None
                             ) -> List[Array]:
        """uniques_scatter specialized to first-appearance representatives:
        one write per distinct key (unique indices), not per row."""
        cap = keys[0].capacity
        R = rep_gids.shape[0]
        rep_rows = jnp.clip(g.unique_rows[:R], 0, cap - 1)
        ridx = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0).reshape((R,))
        rep_active = ridx < jnp.minimum(g.num_unique, R)
        G = self.max_groups
        pos = jnp.where(rep_active & (rep_gids >= 0), rep_gids, G)
        out = []
        for i, k in enumerate(keys):
            t = k.type
            if t.is_varlen:
                ss = uniques[i] if uniques is not None else \
                    SlotStrings.init(G, self.varlen_slot_bytes)
                out.append(ss.scatter_from(k, rep_rows, pos,
                                           unique_indices=True))
                continue
            if uniques is None:
                vals = jnp.zeros((G,) + k.values.shape[1:],
                                 dtype=k.values.dtype)
                valid = jnp.zeros((G,), dtype=jnp.bool_)
            else:
                vals = uniques[i].values
                valid = uniques[i].validity if uniques[i].validity \
                    is not None else jnp.ones((G,), dtype=jnp.bool_)
            vals = vals.at[pos].set(k.values[rep_rows], mode="drop",
                                    unique_indices=True)
            kv = k.validity if k.validity is not None else \
                jnp.ones((cap,), dtype=jnp.bool_)
            valid = valid.at[pos].set(kv[rep_rows], mode="drop",
                                      unique_indices=True)
            out.append(Array(t, vals, valid,
                             dictionary=k.dictionary, length=None))
        return out

    def uniques_scatter(self, keys: Sequence[Array], group_ids: jax.Array,
                        uniques: Optional[Sequence[Array]] = None
                        ) -> List[Array]:
        """Scatter this batch's key values into per-group unique buffers
        (GetUniques building block). `uniques` carries buffers from prior
        consumes; capacity = max_groups."""
        G = self.max_groups
        out = []
        for i, k in enumerate(keys):
            t = k.type
            if t.is_varlen:
                ss = uniques[i] if uniques is not None else \
                    SlotStrings.init(G, self.varlen_slot_bytes)
                cap = k.offsets.shape[0] - 1
                rows = jax.lax.broadcasted_iota(
                    jnp.int32, (cap, 1), 0).reshape((cap,))
                pos = jnp.where(group_ids >= 0, group_ids, G)
                out.append(ss.scatter_from(k, rows, pos))
                continue
            pos = jnp.where(group_ids >= 0, group_ids, G)
            if uniques is None:
                vals = jnp.zeros((G,) + k.values.shape[1:],
                                 dtype=k.values.dtype)
                valid = jnp.zeros((G,), dtype=jnp.bool_)
            else:
                vals, valid = uniques[i].values, (
                    uniques[i].validity if uniques[i].validity is not None
                    else jnp.ones((G,), dtype=jnp.bool_))
            vals = vals.at[pos].set(k.values, mode="drop")
            kv = k.validity if k.validity is not None else \
                jnp.ones((k.capacity,), dtype=jnp.bool_)
            valid = valid.at[pos].set(kv, mode="drop")
            out.append(Array(t, vals, valid,
                             dictionary=k.dictionary, length=None))
        return out
