"""Sort-based distinct detection over fixed-width key lanes.

The TPU replacement for the reference's per-row memo-table inserts
(``util/hashing.h`` MemoTable) AND for scatter-heavy hash-table probing:
one ``lexsort`` groups equal keys into contiguous runs, after which
distinct-ids, first-appearance numbering and segment boundaries all fall
out of vectorized prefix ops. TPU scatters serialize on colliding
indices, so the grouper/aggregation hot paths route everything through
this module and only ever scatter with UNIQUE indices.

Used by: unique/value_counts/dictionary_encode (ops/vector_hash),
is_in/index_in (ops/set_lookup), the Grouper's consume fast path
(ops/grouper), and segment-reduction grouped aggregation
(ops/hash_aggregate).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["SortGroup", "sort_group", "sort_distinct"]

_I32MAX = np.int32(2147483647)   # np, NOT jnp: module import may happen
#   inside an active trace (lazy kernel loading) and a jnp constant
#   created there would be a leaked tracer


class SortGroup(NamedTuple):
    """Result of grouping rows by equal key lanes via one sort.

    All arrays have length cap (= lanes.shape[0]) unless noted.
      perm         sorted-position -> original row (inactive rows last)
      s_active     active flag per sorted position
      head         True at the first sorted position of each distinct run
      seg          run id per sorted position (0-based, garbage where
                   inactive)
      codes        per ORIGINAL row: first-appearance group id, -1 inactive
      gid_of_seg   run id -> first-appearance group id
      seg_of_gid   first-appearance group id -> run id
      unique_rows  gid -> original row of first occurrence (INT32_MAX pad)
      head_pos     gid -> sorted position of its run head (cap pad)
      head_pos_seg seg -> sorted position of its run head (cap pad)
      n_active     int32 scalar — count of active rows (= first inactive
                   sorted position)
      num_unique   int32 scalar
    """

    perm: jax.Array
    s_active: jax.Array
    head: jax.Array
    seg: jax.Array
    codes: jax.Array
    gid_of_seg: jax.Array
    seg_of_gid: jax.Array
    unique_rows: jax.Array
    head_pos: jax.Array
    head_pos_seg: jax.Array
    n_active: jax.Array
    num_unique: jax.Array


_FOLD_SENTINEL = np.uint32(0xFFFFFFFF)


def sort_group(lanes: jax.Array, active: jax.Array,
               rep_capacity: Optional[int] = None,
               payloads: Tuple[jax.Array, ...] = (),
               folded: bool = False, need_codes: bool = True):
    """Returns (SortGroup, sorted_payloads).

    `rep_capacity` bounds the per-distinct-key bookkeeping arrays
    (rep/order/gid_of_seg/unique_rows/head_pos*): group-by paths pass
    their table size so the first-appearance ranking argsort runs over R
    rows, not cap (a full extra sort otherwise). Segments beyond R are
    dropped (the caller's overflow flag covers that case); the default
    keeps R = cap (unbounded distinct — unique/dictionary_encode).

    `payloads` ride the ONE variadic sort as extra operands — aggregate
    input columns arrive already key-grouped with no post-sort random
    gathers (TPU gathers at engine sizes cost a large fraction of the
    sort itself).

    `folded=True`: the caller already wrote 0xFFFFFFFF into lane 0 of
    every inactive row AND guarantees real lane-0 values never reach the
    sentinel (range-packed lanes, ops/grouper packed consume). The
    separate inactive key operand is dropped — sort KEY count is what
    lax.sort cost scales with on v5e (tools/probe_prims.py round 4).

    `need_codes=False` skips the per-ORIGINAL-row group-id scatter
    (codes=None in the result) — a full capacity-sized scatter that
    segment-reduction consumers (ops/segment via head/seg/perm) never
    read."""
    cap, L = lanes.shape
    R = min(rep_capacity, cap) if rep_capacity else cap
    iota = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).reshape((cap,))
    # UNSTABLE sort: stability costs about one extra key lane of sort
    # time on TPU; the only consumer of intra-run order was the
    # first-appearance rank, recovered below with one packed cummax
    # (ops/segment.segmented_carry_last's trick)
    if folded:
        ops = [lanes[:, j] for j in range(L)] + [iota] + list(payloads)
        out = jax.lax.sort(ops, num_keys=L, is_stable=False)
        s_lane_cols = out[:L]
        perm = out[L]
        s_payloads = tuple(out[1 + L:])
        s_active = s_lane_cols[0] != _FOLD_SENTINEL
    else:
        inactive = (~active).astype(jnp.uint32)
        ops = [inactive] + [lanes[:, j] for j in range(L)] + [iota] + \
            list(payloads)
        out = jax.lax.sort(ops, num_keys=L + 1, is_stable=False)
        s_inactive = out[0]
        s_lane_cols = out[1:1 + L]
        perm = out[1 + L]
        s_payloads = tuple(out[2 + L:])
        s_active = s_inactive == 0
    prev_diff = s_lane_cols[0][1:] != s_lane_cols[0][:-1]
    for c in s_lane_cols[1:]:
        prev_diff = prev_diff | (c[1:] != c[:-1])
    prev_inact = ~s_active[:-1]
    head = s_active & jnp.concatenate(
        [jnp.ones((1,), dtype=jnp.bool_), prev_diff | prev_inact])
    seg = jnp.cumsum(head, dtype=jnp.int32) - 1
    num_unique = jnp.where(jnp.any(active), seg[-1] + 1, 0).astype(
        jnp.int32) if cap > 0 else jnp.int32(0)
    spos = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).reshape((cap,))
    ridx = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0).reshape((R,))
    # first (min-row) occurrence of each run: prefix-min of perm within
    # the run — pack (seg, cap - perm) and cummax; read at each run's
    # LAST position (runs are contiguous, actives first)
    segc = jnp.clip(seg, 0, R - 1)
    minwork = jnp.where(s_active, cap - perm, 0)
    packed = (segc.astype(jnp.int64) << 32) | minwork.astype(jnp.int64)
    cm = jax.lax.cummax(packed)
    rep_of_pos = (cap - (cm & jnp.int64(0xFFFFFFFF))).astype(jnp.int32)
    head_pos_of_seg = jnp.full((R,), cap, dtype=jnp.int32).at[
        jnp.where(head, seg, R)].set(spos, mode="drop",
                                     unique_indices=True)
    n_active = jnp.sum(active).astype(jnp.int32)
    # read the per-run prefix-min at each run's last position
    nxt = jnp.concatenate([head_pos_of_seg[1:],
                           jnp.full((1,), cap, jnp.int32)])
    in_use = ridx < num_unique
    last_pos = jnp.where(ridx < num_unique - 1, nxt - 1, n_active - 1)
    last_pos = jnp.clip(jnp.where(in_use, last_pos, 0), 0,
                        max(cap - 1, 0))
    rep = jnp.where(in_use, rep_of_pos[last_pos], _I32MAX)
    # first-appearance rank: runs ordered by their first original row
    order = jnp.argsort(rep).astype(jnp.int32)        # gid -> seg
    gid_of_seg = jnp.zeros((R,), dtype=jnp.int32).at[order].set(
        ridx, unique_indices=True)
    unique_rows = rep[order]
    if need_codes:
        codes_sorted = gid_of_seg[jnp.clip(seg, 0, R - 1)]
        codes = jnp.zeros((cap,), dtype=jnp.int32).at[perm].set(
            codes_sorted, unique_indices=True)
        codes = jnp.where(active, codes, jnp.int32(-1))
    else:
        codes = None
    head_pos = head_pos_of_seg[order]
    g = SortGroup(perm, s_active, head, seg, codes, gid_of_seg, order,
                  unique_rows, head_pos, head_pos_of_seg, n_active,
                  num_unique)
    return g, s_payloads


def sort_distinct(lanes: jax.Array, active: jax.Array
                  ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """(codes, unique_rows, num_unique) — the compact interface used by
    unique/dictionary_encode/is_in."""
    g, _ = sort_group(lanes, active)
    return g.codes, g.unique_rows, g.num_unique


def merge_find(table_lanes: jax.Array, table_gid: jax.Array,
               probe_lanes: jax.Array, probe_active: jax.Array
               ) -> jax.Array:
    """Sort-merge find: gid per probe row (-1 miss / inactive).

    The TPU replacement for hash-table probing (SwissTable::find): concat
    the table's key lanes (gid-tagged, pad rows gid=-1) with the probe
    lanes, ONE variadic sort groups equal keys with table rows first, and
    a segmented last-table scan carries each run's gid to its probe rows.
    Per-round table-gather loops measured ~7x slower on v5e.
    """
    from .segment import segmented_carry_last
    S, L = table_lanes.shape
    capP = probe_lanes.shape[0]
    sidx = jax.lax.broadcasted_iota(jnp.int32, (S, 1), 0).reshape((S,))
    piota = jax.lax.broadcasted_iota(jnp.int32, (capP, 1), 0).reshape(
        (capP,))
    lanesA = jnp.concatenate([table_lanes, probe_lanes])
    actA = jnp.concatenate([table_gid >= 0, probe_active])
    side = jnp.concatenate([jnp.zeros((S,), jnp.uint32),
                            jnp.ones((capP,), jnp.uint32)])
    gpay = jnp.concatenate([table_gid, jnp.full((capP,), -1, jnp.int32)])
    outp = jnp.concatenate([jnp.full((S,), -1, jnp.int32), piota])
    inact = (~actA).astype(jnp.uint32)
    ops = [inact] + [lanesA[:, j] for j in range(L)] + [side, gpay, outp]
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
    return jnp.full((capP,), -1, jnp.int32).at[
        jnp.where(s_outp >= 0, s_outp, capP)].set(
        val, mode="drop", unique_indices=True)


def merge_insert(table_lanes: jax.Array, table_gid: jax.Array,
                 num_groups, rep_lanes: jax.Array, rep_active: jax.Array):
    """Sort-merge INSERT into a lane-SORTED table (the streaming grouper's
    state transition — replaces hash-table claim tournaments entirely).

    New reps get gids num_groups + first-appearance rank (rep order IS
    first-appearance order); the returned table is again lane-sorted with
    pad rows (gid -1) at the end. No colliding scatters anywhere: one
    (S+R)-row sort + segmented scans + unique-index compaction writes.

    Returns (new_table_lanes, new_table_gid, rep_gids (R,), new_count).
    """
    from .segment import segmented_carry_last
    S, L = table_lanes.shape
    R = rep_lanes.shape[0]
    N = S + R
    lanesA = jnp.concatenate([table_lanes, rep_lanes])
    actA = jnp.concatenate([table_gid >= 0, rep_active])
    side = jnp.concatenate([jnp.zeros((S,), jnp.uint32),
                            jnp.ones((R,), jnp.uint32)])
    gpay = jnp.concatenate([table_gid, jnp.full((R,), -1, jnp.int32)])
    ridx = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0).reshape((R,))
    ipay = jnp.concatenate([jnp.full((S,), -1, jnp.int32), ridx])
    inact = (~actA).astype(jnp.uint32)
    ops = [inact] + [lanesA[:, j] for j in range(L)] + [side, gpay, ipay]
    out = jax.lax.sort(ops, num_keys=L + 2, is_stable=False)
    s_act = out[0] == 0
    s_lanes = out[1:1 + L]
    s_gpay = out[2 + L]
    s_ipay = out[3 + L]
    diff = s_lanes[0][1:] != s_lanes[0][:-1]
    for c in s_lanes[1:]:
        diff = diff | (c[1:] != c[:-1])
    head = s_act & jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), diff | ~s_act[:-1]])
    from .segment import segmented_carry_last as _scl
    carried = _scl(s_gpay, head)
    # each rep's existing gid (or -1 new), scattered back to rep order
    found = jnp.full((R,), -1, jnp.int32).at[
        jnp.where(s_ipay >= 0, s_ipay, R)].set(
        jnp.where(s_act, carried, jnp.int32(-1)), mode="drop",
        unique_indices=True)
    is_new = rep_active & (found < 0)
    new_rank = jnp.cumsum(is_new, dtype=jnp.int32) - 1
    new_count = jnp.where(R > 0, new_rank[-1] + 1, 0).astype(jnp.int32)
    rep_gids = jnp.where(is_new, num_groups + new_rank, found)
    rep_gids = jnp.where(rep_active, rep_gids, jnp.int32(-1))
    # rebuild the sorted table: keep table rows + FIRST new rep of each
    # all-new run (dedup: a run head that is a new rep)
    is_new_sorted = jnp.where(
        s_ipay >= 0, is_new[jnp.clip(s_ipay, 0, R - 1)], False)
    keep = s_act & ((s_gpay >= 0) | (is_new_sorted & head))
    gid_kept = jnp.where(
        s_gpay >= 0, s_gpay,
        rep_gids[jnp.clip(s_ipay, 0, R - 1)])
    pos = jnp.where(keep, jnp.cumsum(keep, dtype=jnp.int32) - 1, N)
    pos = jnp.where(pos >= S, N, pos)  # overflow rows drop (error flagged)
    new_gid = jnp.full((S,), -1, jnp.int32).at[pos].set(
        gid_kept, mode="drop", unique_indices=True)
    new_lanes_cols = []
    for j in range(L):
        col = jnp.zeros((S,), jnp.uint32).at[pos].set(
            s_lanes[j], mode="drop", unique_indices=True)
        new_lanes_cols.append(col)
    new_lanes = jnp.stack(new_lanes_cols, axis=1)
    return new_lanes, new_gid, rep_gids, new_count
