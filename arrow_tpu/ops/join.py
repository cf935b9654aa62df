"""Hash join (the SwissJoin analog).

Reference: ``cpp/src/arrow/acero/swiss_join.cc`` + ``swiss_join_internal.h``
— build (partition/insert/merge), probe (hash -> early_filter -> find ->
materialize), match bit-vectors for outer joins, ``key_to_payload`` offsets
for duplicate keys (``swiss_join_internal.h:483``).

TPU-native redesign, third generation. Primitive costs measured on v5e
(tools/probe_prims*.py, round 4) shape every choice here:

  * lax.sort cost scales with the number of KEY operands; payload
    operands are nearly free (1-key 352M rows/s vs 4-key 150M; +4
    payloads costs nothing). 1D gathers/scatters serialize per index
    (~110-142M/s); packed ``lax.cummax`` runs at 1.4G elem/s.

  * Build: ONE sort-group pass (ops/distinct) over the build side yields
    contiguous payload runs per distinct key, per-seg [start, end) spans
    in sorted-payload space, and the unique key lanes per seg. The
    right-output columns ride that same sort as (free) payload planes, so
    the build payload is pre-permuted into run order — ``RowArray`` built
    by the sort itself.

  * Probe find — the packed fast path: when the build key's per-lane
    value ranges fit 30 bits total (fetched once at build), every key
    packs into ONE uint32 (plus a build/probe side bit), so the
    merge-find sort runs single-key. The build sorts by the packed key
    (lanes as tiebreakers), so payload-run starts are MONOTONE along
    the merged order and plain int32 ``cummax`` forward fills hand
    every probe row its [start, end) span with zero gathers. (64-bit
    packed-cummax tricks are emulated on v5e and measured ~20x slower
    — everything here is int32.) Probe keys outside the build's lane
    ranges clamp to a miss sentinel (they cannot match).

  * Unique-build keys (the PK-FK shape, detected at build): fanout <= 1,
    so pair expansion degenerates to ONE 1-bit-key compaction sort with
    every output plane riding as payload — no pair-slot scatters at
    all (``_probe_unique_compact``).

  * General fanout: int32 scatters of (row, offset) at each row's
    first output slot + cummax forward fills recover (r, brow) per
    pair slot.

  * Materialize: all fixed-width output columns pack into ONE (rows, W)
    uint32 plane matrix per side (ops/planes) and gather by ROW — W
    lanes per index at ~the single-lane index rate (probe_prims2).

  * Outer joins: matched bits are kept in sorted-payload space
    (per-pair) plus per-seg group hits; ``finish`` rebases to original
    rows with one unique scatter.

Dynamic output size is held by a static ``fanout_capacity`` with a
deferred overflow error (Arrow instead chunk-appends into 32Ki batches,
``JoinResultMaterialize``; re-execution at a larger capacity is the
host-side recovery).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core import datatype as dt
from ..core.array import Array, row_mask
from ..core.batch import Batch
from ..core.schema import Field, Schema
from .grouper import Grouper, group_key_lanes
from .planes import pack_columns, plane_width, unpack_columns
from .selection import filter_batch, take_array

__all__ = ["HashJoin", "BuildState"]

_PROBE_SIDES = ("inner", "left outer", "full outer",
                "left semi", "left anti")

# packed-key sentinels (> any real packed value, which is < 2^30)
_MISS_B = jnp.uint32(0x7FFFFFFF)   # inactive build slot
_MISS_P = jnp.uint32(0x7FFFFFFE)   # miss / inactive probe row
# packed-geometry bias (static capacity limits checked by callers)
_GBIAS = 1 << 26
_GSENT = 1                          # "emitted but unmatched" delta code


@jax.tree_util.register_pytree_node_class
class BuildState:
    """Device-side build result (pytree). Spans/payload live in SORTED
    payload space (the one sort's output order); ``perm`` maps sorted
    position -> original build row for varlen fallbacks and finish."""

    __slots__ = ("num_groups", "batch", "starts_seg", "ends_seg",
                 "seg_lanes", "gid_of_seg", "perm", "bsegs",
                 "matched", "matched_seg", "num_rows", "num_active",
                 "error",
                 "pack_lo", "pack_span", "pack_shift", "pack_bits",
                 "packed_seg", "payload_mat")

    def __init__(self, num_groups, batch, starts_seg, ends_seg, seg_lanes,
                 gid_of_seg, perm, bsegs, matched, matched_seg, num_rows,
                 num_active, error, pack_lo, pack_span, pack_shift,
                 pack_bits, packed_seg, payload_mat):
        self.num_groups = num_groups    # int32: distinct build keys
        self.batch = batch
        self.starts_seg = starts_seg    # (G,) run start (sorted space)
        self.ends_seg = ends_seg        # (G,) run end   (exclusive)
        self.seg_lanes = seg_lanes      # (G, L) run-head lanes, seg order
        self.gid_of_seg = gid_of_seg    # (G,) seg -> first-appearance gid
        self.perm = perm                # (cap,) sorted pos -> build row
        self.bsegs = bsegs              # (cap,) build row -> seg (-1 null)
        self.matched = matched          # (cap,) per-pair hits, SORTED space
        self.matched_seg = matched_seg  # (G,) group-level hits, seg index
        self.num_rows = num_rows
        self.num_active = num_active    # int32: non-null-key build rows
        self.error = error
        self.pack_lo = pack_lo          # (L,) u32 per-lane min
        self.pack_span = pack_span      # (L,) u32 per-lane (max - min)
        self.pack_shift = pack_shift    # (L,) u32 bit offsets
        self.pack_bits = pack_bits      # int32: total packed bits
        self.packed_seg = packed_seg    # (G,) u32 packed key per seg
        self.payload_mat = payload_mat  # (cap, WR) u32 planes or None

    def tree_flatten(self):
        return ((self.num_groups, self.batch, self.starts_seg,
                 self.ends_seg, self.seg_lanes, self.gid_of_seg, self.perm,
                 self.bsegs, self.matched, self.matched_seg, self.num_rows,
                 self.num_active, self.error, self.pack_lo, self.pack_span,
                 self.pack_shift, self.pack_bits, self.packed_seg,
                 self.payload_mat), None)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    def _replace(self, **kw):
        vals = {k: getattr(self, k) for k in self.__slots__}
        vals.update(kw)
        return BuildState(**vals)

    def _with_error(self, error):
        return self._replace(error=self.error | error)

    # compatibility shim for older callers (grouper_state was the group
    # count scalar)
    @property
    def grouper_state(self):
        return self.num_groups


def _all_valid(keys: Sequence[Array], cap: int) -> jax.Array:
    ok = jnp.ones((cap,), dtype=jnp.bool_)
    for k in keys:
        if k.validity is not None:
            ok = ok & k.validity
    return ok


def _pack_lanes(lanes: jax.Array, lo, span, shift) -> jax.Array:
    """(n, L) u32 lanes -> (n,) u32 packed keys; rows with any lane
    outside [lo, lo+span] -> _MISS_P (cannot equal any build key)."""
    n, L = lanes.shape
    packed = jnp.zeros((n,), jnp.uint32)
    miss = jnp.zeros((n,), jnp.bool_)
    for j in range(L):
        d = lanes[:, j] - lo[j]            # u32 wraparound
        miss = miss | (d > span[j])
        packed = packed | jnp.left_shift(jnp.where(miss, 0, d), shift[j])
    return jnp.where(miss, _MISS_P, packed)


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

        # plane-packable output columns (ops/planes): packed ones gather
        # as one row-matrix; the rest fall back to per-column takes
        self._rpack = [n for n in self.right_out if plane_width(
            right_schema.field(n).type) is not None]
        self._lpack = [n for n in self.left_out if plane_width(
            left_schema.field(n).type) is not None]

    # ------------------------------------------------------------------
    def build(self, right: Batch) -> BuildState:
        """Insert the (accumulated) build side. One call; use
        ops.concat.concat_batches upstream for multi-batch builds.

        One sort-group pass yields everything: payload runs in sorted
        space, per-seg [start, end) spans, seg-ordered unique key lanes,
        AND the pre-permuted right-output payload planes (they ride the
        sort as payloads — payload operands are nearly free on v5e)."""
        from .distinct import sort_group
        cap = right.capacity
        keys = [right.column(k) for k in self.right_keys]
        ok = _all_valid(keys, cap)
        lanes = group_key_lanes(keys, self.grouper.key_nullable)
        active = row_mask(cap, right.length) & ok
        G = self.max_build_rows
        R = min(cap, G)

        # right-output payload planes AND the key lanes ride the sort as
        # payloads (payload operands are nearly free on v5e)
        rp_cols = [right.column(n) for n in self._rpack]
        WR = 0
        payloads = ()
        if rp_cols:
            rp_mat, _ = pack_columns(rp_cols)
            WR = rp_mat.shape[1]
            payloads = tuple(rp_mat[:, j] for j in range(WR))
        L = lanes.shape[1]
        payloads = payloads + tuple(lanes[:, j] for j in range(L))

        # packing spec BEFORE the sort: the build sorts by the PACKED
        # key first (lanes as tiebreakers for the unpackable case), so
        # seg order == packed-key order and the probe's int32 monotone
        # span fills are valid. Each lane's window is measured in BOTH
        # unsigned and signed space and the tighter one wins: wraparound
        # subtraction (lane - lo mod 2^32) maps any contiguous window
        # bijectively onto [0, span], so signed windows pack too.
        BIGU = jnp.uint32(0xFFFFFFFF)
        act2 = active[:, None]
        lo_u = jnp.min(jnp.where(act2, lanes, BIGU), axis=0)
        hi_u = jnp.max(jnp.where(act2, lanes, jnp.uint32(0)), axis=0)
        span_u = hi_u - lo_u                 # u32 wrap if no active rows
        lanes_i = lanes.view(jnp.int32)
        lo_i = jnp.min(jnp.where(act2, lanes_i, jnp.int32(2**31 - 1)),
                       axis=0)
        hi_i = jnp.max(jnp.where(act2, lanes_i, jnp.int32(-2**31)),
                       axis=0)
        span_i = hi_i.view(jnp.uint32) - lo_i.view(jnp.uint32)
        use_i = span_i < span_u
        lo = jnp.where(use_i, lo_i.view(jnp.uint32), lo_u)
        span = jnp.minimum(span_i, span_u)
        bits = jnp.uint32(32) - jax.lax.clz(span)
        # shift_j = sum of bits of lanes AFTER j (lane 0 in the top bits)
        rev = jnp.cumsum(bits[::-1])
        shift = jnp.concatenate([rev[::-1][1:], jnp.zeros((1,),
                                                          bits.dtype)])
        shiftu = shift.astype(jnp.uint32)
        pack_bits = jnp.sum(bits).astype(jnp.int32)
        pk_rows = _pack_lanes(lanes, lo, span, shiftu)
        sort_lanes = jnp.concatenate([pk_rows[:, None], lanes], axis=1)

        g, s_payloads = sort_group(sort_lanes, active, rep_capacity=R,
                                   payloads=payloads)
        GG = min(R, G)
        sidx = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0).reshape((G,))
        ridx = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0).reshape((R,))
        starts_seg = jnp.full((G,), cap, jnp.int32).at[:GG].set(
            g.head_pos_seg[:GG])
        nxt = jnp.concatenate([g.head_pos_seg[1:],
                               jnp.full((1,), cap, jnp.int32)])
        in_use_r = ridx < g.num_unique
        ends_r = jnp.where(ridx < g.num_unique - 1, nxt, g.n_active)
        ends_r = jnp.where(in_use_r, ends_r, g.head_pos_seg)
        ends_seg = jnp.full((G,), cap, jnp.int32).at[:GG].set(ends_r[:GG])

        # seg-ordered (== packed-key-ordered) unique key lanes: scatter
        # run-head lanes at seg (the lanes arrive pre-sorted as the last
        # L sort payloads)
        s_lanes = jnp.stack(list(s_payloads[WR:WR + L]), axis=1)
        head_seg = jnp.where(g.head & (g.seg < GG), g.seg, G)
        seg_lanes = jnp.zeros((G, L), jnp.uint32).at[head_seg].set(
            s_lanes, mode="drop", unique_indices=True)
        gid_of_seg = jnp.full((G,), -1, jnp.int32).at[:GG].set(
            g.gid_of_seg[:GG])

        packed_seg = _pack_lanes(seg_lanes, lo, span, shiftu)
        packed_seg = jnp.where(sidx < g.num_unique, packed_seg, _MISS_B)

        payload_mat = None
        if rp_cols:
            payload_mat = jnp.stack(list(s_payloads[:WR]), axis=1)

        bsegs = jnp.where(
            g.codes >= 0,
            g.seg_of_gid[jnp.clip(g.codes, 0, R - 1)], jnp.int32(-1))
        matched = jnp.zeros((cap,), dtype=jnp.bool_)
        matched_seg = jnp.zeros((G,), dtype=jnp.bool_)
        error = jnp.where(g.num_unique > G, 1, 0).astype(jnp.int32)
        return BuildState(
            g.num_unique, right, starts_seg, ends_seg, seg_lanes,
            gid_of_seg, g.perm, bsegs, matched, matched_seg,
            jnp.asarray(right.length, jnp.int32), g.n_active, error,
            lo, span, shift.astype(jnp.uint32), pack_bits, packed_seg,
            payload_mat)

    # ------------------------------------------------------------------
    def packed_eligible(self) -> bool:
        """Static capacity guards for the packed probe/geometry paths
        (the dynamic total-bits check reads ``BuildState.pack_bits``)."""
        return self.max_build_rows < (1 << 26)

    # ------------------------------------------------------------------
    def bloom_build(self, bs: BuildState) -> jax.Array:
        """Bloom bitset over the build side's distinct key lanes
        (``bloom_filter.h:42`` BlockedBloomFilter; see ops/bloom.py for
        the TPU redesign)."""
        from .bloom import bloom_m_log2, build_bloom
        G = self.max_build_rows
        gidx = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0).reshape((G,))
        active = gidx < bs.num_groups
        return build_bloom(bs.seg_lanes, active, bloom_m_log2(G))

    def bloom_mask(self, bits: jax.Array, left: Batch) -> Array:
        """bool mask: True where the probe row's key MAY match the build
        side. Null-key / out-of-range rows -> False (they never key-match
        any build row, for every join type)."""
        from .bloom import query_bloom
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
        names = self.right_keys if side == "build" else self.left_keys
        keys = [b.column(k) for k in names]
        lanes = group_key_lanes(keys, self.grouper.key_nullable)
        h1, _ = _lane_hashes(lanes)
        return (h1 & jnp.uint32(K - 1)).astype(jnp.int32)

    # ------------------------------------------------------------------
    def _probe_sorted(self, bs: BuildState, left: Batch,
                      keys: Sequence[Array], ok: jax.Array,
                      payloads: Tuple[jax.Array, ...] = (),
                      want_end: bool = True, want_seg: bool = False):
        """Packed single-key merge find, SORTED-order outputs.

        64-bit arithmetic is emulated on v5e (an i64 cummax measured
        ~20x an i32 one — round-4 phase probe), so every fill here is a
        plain int32 ``cummax``: run starts are MONOTONE along the sorted
        order (runs ascend by key; ``starts_seg`` ascends with seg), so
        a forward max-fill is exactly a forward copy-fill, and "did my
        run have a build row" falls out of comparing the last-build-pos
        fill with the last-head-pos fill.

        Returns a dict of (G+capP,)-arrays in sorted order:
        isp (probe position), act (active probe), hit, bstart (build
        payload row; valid where hit), bend (if want_end), outp
        (original probe row; -1 for build positions), inr (in-range
        flag), plus the riding ``payloads`` (probe-side values; build
        positions carry zeros)."""
        capP = left.capacity
        G = self.max_build_rows
        lanes_p = group_key_lanes(keys, self.grouper.key_nullable)
        in_range = row_mask(capP, left.length)
        act_p = in_range & ok
        packed_p = _pack_lanes(lanes_p, bs.pack_lo, bs.pack_span,
                               bs.pack_shift)
        packed_p = jnp.where(act_p, packed_p, _MISS_P)

        keyv = jnp.concatenate([
            (bs.packed_seg << jnp.uint32(1)),
            (packed_p << jnp.uint32(1)) | jnp.uint32(1)])
        z_p = jnp.zeros((capP,), jnp.int32)
        z_b = jnp.zeros((G,), jnp.int32)
        startp = jnp.concatenate([bs.starts_seg, z_p])
        piota = jax.lax.broadcasted_iota(jnp.int32, (capP, 1), 0).reshape(
            (capP,))
        outp = jnp.concatenate([jnp.full((G,), -1, jnp.int32), piota])
        inrp = jnp.concatenate([z_b, in_range.astype(jnp.int32)])
        ops = [keyv, startp, outp, inrp]
        if want_end:
            ops.append(jnp.concatenate([bs.ends_seg, z_p]))
        if want_seg:
            sidx = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0).reshape(
                (G,))
            ops.append(jnp.concatenate([sidx, z_p]))
        for p in payloads:
            ops.append(jnp.concatenate([z_b.astype(p.dtype), p]))
        out = jax.lax.sort(ops, num_keys=1, is_stable=False)
        skey, sstart, soutp, sinr = out[:4]
        j = 4
        send = sseg = None
        if want_end:
            send = out[j]
            j += 1
        if want_seg:
            sseg = out[j]
            j += 1
        s_payloads = tuple(out[j:])

        N = G + capP
        pos1 = jax.lax.broadcasted_iota(jnp.int32, (N, 1), 0).reshape(
            (N,)) + 1
        lane = skey >> jnp.uint32(1)
        isb = (skey & jnp.uint32(1)) == 0
        head = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                                lane[1:] != lane[:-1]])
        # i32 monotone forward fills
        bstart = jax.lax.cummax(jnp.where(isb, sstart + 1, 0)) - 1
        bpos = jax.lax.cummax(jnp.where(isb, pos1, 0))
        hpos = jax.lax.cummax(jnp.where(head, pos1, 0))
        isp = ~isb
        act = isp & (skey < (jnp.uint32(_MISS_P) << jnp.uint32(1)))
        hit = act & (bpos >= hpos) & (bstart >= 0)
        res = {"isp": isp, "act": act, "hit": hit, "bstart": bstart,
               "outp": soutp, "inr": sinr != 0, "payloads": s_payloads}
        if want_end:
            res["bend"] = jax.lax.cummax(
                jnp.where(isb, send + 1, 0)) - 1
        if want_seg:
            res["bseg"] = jax.lax.cummax(
                jnp.where(isb, sseg + 1, 0)) - 1
        return res

    def _probe_spans_packed(self, bs: BuildState, left: Batch,
                            keys: Sequence[Array], ok: jax.Array,
                            want_seg: bool):
        """Packed find with ROW-order span outputs: the sorted-order
        find plus int32 scatter-backs. Returns (start, cnt, seg)."""
        capP = left.capacity
        s = self._probe_sorted(bs, left, keys, ok, want_end=True,
                               want_seg=want_seg)
        dst = jnp.where(s["outp"] >= 0, s["outp"], capP)
        hit = s["hit"]
        start = jnp.full((capP,), -1, jnp.int32).at[dst].set(
            jnp.where(hit, s["bstart"], -1), mode="drop",
            unique_indices=True)
        cnt = jnp.zeros((capP,), jnp.int32).at[dst].set(
            jnp.where(hit, s["bend"] - s["bstart"], 0), mode="drop",
            unique_indices=True)
        seg = None
        if want_seg:
            seg = jnp.full((capP,), -1, jnp.int32).at[dst].set(
                jnp.where(hit, s["bseg"], -1), mode="drop",
                unique_indices=True)
        return start, cnt, seg

    def _probe_spans_sort(self, bs: BuildState, left: Batch,
                          keys: Sequence[Array], ok: jax.Array,
                          want_seg: bool):
        """Generic multi-lane merge find (the fallback when keys don't
        pack): concat (seg-ordered build lanes ++ probe lanes), one
        variadic sort groups equal keys with build rows first, segmented
        carries hand every probe row its seg; spans gather per row."""
        from .segment import segmented_carry_last
        capP = left.capacity
        lanes_p = group_key_lanes(keys, self.grouper.key_nullable)
        act_p = row_mask(capP, left.length) & ok
        G = self.max_build_rows
        L = lanes_p.shape[1]
        sidx = jax.lax.broadcasted_iota(jnp.int32, (G, 1), 0).reshape((G,))
        lanesA = jnp.concatenate([bs.seg_lanes, lanes_p])
        actA = jnp.concatenate([sidx < bs.num_groups, act_p])
        side = jnp.concatenate([jnp.zeros((G,), jnp.uint32),
                                jnp.ones((capP,), jnp.uint32)])
        gpay = jnp.concatenate([sidx, jnp.full((capP,), -1, jnp.int32)])
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
        seg = jnp.full((capP,), -1, jnp.int32).at[
            jnp.where(s_outp >= 0, s_outp, capP)].set(
            val, mode="drop", unique_indices=True)
        segc = jnp.clip(seg, 0, G - 1)
        start = jnp.where(seg >= 0, bs.starts_seg[segc], jnp.int32(-1))
        cnt = jnp.where(seg >= 0,
                        bs.ends_seg[segc] - bs.starts_seg[segc], 0)
        return start, cnt, (seg if want_seg else None)

    def supports_unique_fast(self) -> bool:
        """Static eligibility for the unique-build compaction probe
        ("packed_u"): the caller additionally verifies (on the host, from
        the build sync) that every build key is distinct."""
        return (self.join_type in ("inner", "left outer", "left semi",
                                   "left anti")
                and self.residual is None and self.packed_eligible())

    def _probe_unique_compact(self, bs: BuildState, left: Batch,
                              fanout_capacity):
        """Unique-build-key probe (the PK-FK join shape): every probe row
        matches at most ONE build row, so pair expansion degenerates to a
        row COMPACTION — one 1-bit-key sort with every output plane
        riding as payload (the same gather-free compaction the filter
        kernel uses; 230M rows/s on v5e) — no pair-slot scatters at all.
        Output rows come out key-ordered (join output order is
        unspecified)."""
        cap = left.capacity
        keys = [left.column(k) for k in self.left_keys]
        ok = _all_valid(keys, cap)
        lp_cols = [left.column(n) for n in self._lpack]
        payloads = ()
        lspec = None
        if lp_cols:
            lmat, lspec = pack_columns(lp_cols)
            payloads = tuple(lmat[:, j] for j in range(lmat.shape[1]))
        need_r = any(n not in self._lpack for n in self.left_out)
        s = self._probe_sorted(bs, left, keys, ok, payloads=payloads,
                               want_end=False)
        hit = s["hit"]
        isp = s["isp"]
        jt = self.join_type
        if jt == "left semi":
            keep = hit
        elif jt == "left anti":
            keep = isp & s["inr"] & ~hit
        elif jt == "left outer":
            keep = isp & s["inr"]
        else:                       # inner
            keep = hit
        total = jnp.sum(keep, dtype=jnp.int32)
        # No fanout-overflow check here: the unique-build compaction
        # emits at most one row per probe-side row, so ``total`` is
        # bounded by this output batch's own capacity (kb.shape[0]) —
        # a user-set small fanout_capacity must not trigger spurious
        # doubling recompiles / fused-plan fallbacks.
        overflow = jnp.int32(0)

        kb = (~keep).astype(jnp.uint8)
        ops = [kb, s["bstart"], hit.astype(jnp.int32)] + \
            list(s["payloads"])
        if need_r:
            ops.append(s["outp"])
        out2 = jax.lax.sort(ops, num_keys=1, is_stable=False)
        c_bstart = out2[1]
        c_hit = out2[2] != 0
        c_pay = out2[3:3 + len(payloads)]
        c_r = out2[3 + len(payloads)] if need_r else None

        bcap = bs.batch.capacity
        brow = jnp.where(c_hit, jnp.clip(c_bstart, 0, bcap - 1), 0)
        cols = {}
        if lp_cols:
            cmat = jnp.stack(list(c_pay), axis=1)
            dicts = [left.column(n).dictionary for n in self._lpack]
            for n, a in zip(self._lpack, unpack_columns(
                    cmat, lspec, total, dictionaries=dicts)):
                cols[("l", n)] = a
        if self._rpack and bs.payload_mat is not None and self.right_out:
            from .planes import pack_spec
            rspec = pack_spec([bs.batch.column(n) for n in self._rpack])
            got = bs.payload_mat[brow]
            dicts = [bs.batch.column(n).dictionary for n in self._rpack]
            for n, a in zip(self._rpack, unpack_columns(
                    got, rspec, total, dictionaries=dicts,
                    extra_valid=c_hit)):
                cols[("r", n)] = a
        N = kb.shape[0]
        if need_r:
            left_idx = Array(dt.int32, jnp.clip(c_r, 0, cap - 1), None,
                             length=total)
            lgrow = -(-N // max(cap, 1))
            for n in self.left_out:
                if ("l", n) in cols:
                    continue
                cols[("l", n)] = take_array(left.column(n), left_idx,
                                            grow=lgrow)
        if any(("r", n) not in cols for n in self.right_out):
            brow_orig = bs.perm[brow]
            right_idx = Array(dt.int32, jnp.clip(brow_orig, 0, bcap - 1),
                              None, length=total)
            rgrow = -(-N // max(bcap, 1))
            for n in self.right_out:
                if ("r", n) in cols:
                    continue
                a = take_array(bs.batch.column(n), right_idx, grow=rgrow)
                v = a.validity
                v = c_hit if v is None else (v & c_hit)
                cols[("r", n)] = a.with_validity(v)
        arrays = [cols[("l", n)] for n in self.left_out] + \
            [cols[("r", n)] for n in self.right_out]
        out = Batch(self.out_schema, arrays, total)
        return out, bs._with_error(overflow)

    def _probe_spans(self, bs, left, keys, ok, impl: str, want_seg: bool):
        if impl == "packed" and self.packed_eligible() and \
                bs.batch.capacity < (1 << 26) and \
                left.capacity < (1 << 27):
            return self._probe_spans_packed(bs, left, keys, ok, want_seg)
        return self._probe_spans_sort(bs, left, keys, ok, want_seg)

    # ------------------------------------------------------------------
    def probe(self, bs: BuildState, left: Batch,
              fanout_capacity: Optional[int] = None,
              impl: str = "sort"
              ) -> Tuple[Optional[Batch], BuildState]:
        """Probe one batch. Returns (output batch or None for right-side
        joins, updated build state). ``impl`` is static: "packed" uses
        the single-key packed find (valid only when the caller verified
        ``BuildState.pack_bits <= 30`` on the host), "sort" the generic
        multi-lane find."""
        if impl == "packed_u" and self.supports_unique_fast():
            return self._probe_unique_compact(bs, left, fanout_capacity)
        if impl == "packed_u":
            impl = "packed"
        cap = left.capacity
        keys = [left.column(k) for k in self.left_keys]
        ok = _all_valid(keys, cap)
        in_range = row_mask(cap, left.length)
        jt = self.join_type
        want_seg = jt in ("right semi", "right anti", "right outer",
                          "full outer")
        start, cnt, seg = self._probe_spans(bs, left, keys, ok, impl,
                                            want_seg)

        if jt in ("left semi", "left anti"):
            if self.residual is None:
                sel = (cnt > 0) if jt == "left semi" else \
                    (in_range & (cnt == 0))
            else:
                pass_any, err = self._pass_any(bs, left, start, cnt,
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
                bs = self._update_matched_seg(bs, seg, cnt)
            else:
                bs = self._update_matched_residual(bs, left, start, cnt,
                                                   fanout_capacity)
            if jt == "right outer":
                outb, bs2 = self._expand(bs, left, start, cnt,
                                         fanout_capacity,
                                         emit_unmatched_probe=False,
                                         update_matched=False)
                return outb, bs2
            return None, bs

        if jt == "full outer":
            if self.residual is None:
                bs = self._update_matched_seg(bs, seg, cnt)
                return self._expand(bs, left, start, cnt, fanout_capacity,
                                    emit_unmatched_probe=True,
                                    update_matched=False)
            return self._expand(bs, left, start, cnt, fanout_capacity,
                                emit_unmatched_probe=True,
                                update_matched=True)

        emit_unmatched_probe = jt == "left outer"
        return self._expand(bs, left, start, cnt, fanout_capacity,
                            emit_unmatched_probe=emit_unmatched_probe,
                            update_matched=False)

    def _update_matched_seg(self, bs: BuildState, seg, cnt) -> BuildState:
        """Group-level matched update (no residual): every build row of a
        probed seg is matched."""
        G = self.max_build_rows
        hit = jnp.zeros((G,), dtype=jnp.bool_).at[
            jnp.where((seg >= 0) & (cnt > 0), seg, G)].max(
            jnp.ones_like(seg, dtype=jnp.bool_), mode="drop")
        return bs._replace(matched_seg=bs.matched_seg | hit)

    # ------------------------------------------------------------------
    def _pair_geometry(self, bs: BuildState, left: Batch, start, cnt,
                       fanout_capacity, emit_unmatched_probe: bool):
        """Expand (probe row, span) matches into flat pair slots.

        Returns (r, o, brow_sorted, has_match, valid_j, pass_, total,
        overflow): ``r`` probe row per slot, ``o`` the match ordinal,
        ``brow_sorted`` the build row in SORTED payload space, ``pass_``
        = has_match AND the residual filter (``swiss_join.cc``
        JoinResidualFilter semantics)."""
        cap = left.capacity
        T = fanout_capacity or self.options.fanout_capacity or cap
        in_range = row_mask(cap, left.length)
        cnt = jnp.where(in_range, cnt, 0)
        emit = cnt
        if emit_unmatched_probe:
            emit = jnp.where(in_range & (cnt == 0), 1, cnt)
        offsets = jnp.cumsum(emit) - emit          # exclusive prefix sum
        total = jnp.sum(emit).astype(jnp.int32)
        overflow = jnp.int32(total > T)
        iota_c = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).reshape(
            (cap,))
        spos = jnp.where(emit > 0, offsets, T)
        jidx = jax.lax.broadcasted_iota(jnp.int32, (T, 1), 0).reshape((T,))

        # int32 scatter + cummax fills ONLY (64-bit packing tricks are
        # emulated on v5e and measured ~20x slower — round-4 phase probe)
        bcap = bs.batch.capacity
        A = jnp.full((T,), -1, dtype=jnp.int32).at[spos].max(
            iota_c, mode="drop", unique_indices=True)
        B = jnp.full((T,), -1, dtype=jnp.int32).at[spos].max(
            offsets.astype(jnp.int32), mode="drop",
            unique_indices=True)
        from .segment import running_scan
        r_of_j = running_scan(A, jnp.maximum, -1)
        start_of_j = running_scan(B, jnp.maximum, -1)
        valid_j = (jidx < total) & (r_of_j >= 0)
        r = jnp.clip(r_of_j, 0)
        o = jidx - start_of_j
        has_match = valid_j & (cnt[r] > 0) & (o < cnt[r])
        brow_sorted = jnp.clip(start[r] + o, 0, bcap - 1)
        brow_sorted = jnp.where(has_match, brow_sorted, 0)

        pass_ = has_match
        if self.residual is not None:
            pass_ = has_match & self._residual_pass(
                bs, left, r, brow_sorted, has_match, total)
        return r, o, brow_sorted, has_match, valid_j, pass_, total, \
            overflow

    def _residual_pass(self, bs: BuildState, left: Batch, r, brow_sorted,
                       has_match, total) -> jax.Array:
        """Evaluate the residual filter on the materialized pairs; null
        results count as false (Arrow filter-null semantics)."""
        from ..compute.expressions import execute_scalar_expression
        from ..compute.scalar import Scalar
        T = r.shape[0]
        bcap = bs.batch.capacity
        brow = bs.perm[jnp.clip(brow_sorted, 0, bcap - 1)]
        left_idx = Array(dt.int32, r, None, length=total)
        right_idx = Array(dt.int32, jnp.clip(brow, 0, bcap - 1), None,
                          length=total)
        lgrow = -(-T // max(left.capacity, 1))
        rgrow = -(-T // max(bcap, 1))
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

    def _pass_any(self, bs: BuildState, left: Batch, start, cnt,
                  fanout_capacity):
        """(probe row -> any pair passes the residual filter, overflow)."""
        cap = left.capacity
        r, o, brow, has_match, valid_j, pass_, total, overflow = \
            self._pair_geometry(bs, left, start, cnt, fanout_capacity,
                                emit_unmatched_probe=False)
        pass_any = jnp.zeros((cap,), jnp.bool_).at[
            jnp.where(pass_, r, cap)].max(
            jnp.ones_like(r, dtype=jnp.bool_), mode="drop")
        return pass_any, overflow

    def _update_matched_residual(self, bs: BuildState, left: Batch, start,
                                 cnt, fanout_capacity) -> BuildState:
        """Per-pair matched update: with a residual filter a build ROW is
        matched only if one of its own pairs passed (group-level hit
        tracking is not enough). Matched bits live in SORTED space."""
        r, o, brow, has_match, valid_j, pass_, total, overflow = \
            self._pair_geometry(bs, left, start, cnt, fanout_capacity,
                                emit_unmatched_probe=False)
        bcap = bs.batch.capacity
        matched = bs.matched.at[jnp.where(pass_, brow, bcap)].max(
            jnp.ones_like(brow, dtype=jnp.bool_), mode="drop")
        return bs._replace(matched=matched, error=bs.error | overflow)

    # ------------------------------------------------------------------
    def _materialize(self, bs: BuildState, left: Batch, r, brow_sorted,
                     bvalid, total) -> Batch:
        """Gather output columns: ONE packed row-gather per side for the
        plane-packable columns; per-column takes for the rest."""
        T = r.shape[0]
        cap = left.capacity
        bcap = bs.batch.capacity
        cols = {}

        if self._lpack:
            lmat, lspec = pack_columns(
                [left.column(n) for n in self._lpack])
            got = lmat[r]                     # (T, WL) row-gather
            dicts = [left.column(n).dictionary for n in self._lpack]
            for n, a in zip(self._lpack, unpack_columns(
                    got, lspec, total, dictionaries=dicts)):
                cols[("l", n)] = a
        if self._rpack and bs.payload_mat is not None:
            from .planes import pack_spec
            rspec = pack_spec([bs.batch.column(n) for n in self._rpack])
            got = bs.payload_mat[brow_sorted]  # (T, WR) row-gather
            dicts = [bs.batch.column(n).dictionary for n in self._rpack]
            for n, a in zip(self._rpack, unpack_columns(
                    got, rspec, total, dictionaries=dicts,
                    extra_valid=bvalid)):
                cols[("r", n)] = a

        left_idx = Array(dt.int32, r, None, length=total)
        lgrow = -(-T // max(cap, 1))
        for n in self.left_out:
            if ("l", n) in cols:
                continue
            cols[("l", n)] = take_array(left.column(n), left_idx,
                                        grow=lgrow)
        if any(("r", n) not in cols for n in self.right_out):
            brow = bs.perm[jnp.clip(brow_sorted, 0, bcap - 1)]
            right_idx = Array(dt.int32, jnp.clip(brow, 0, bcap - 1), None,
                              length=total)
            rgrow = -(-T // max(bcap, 1))
            for n in self.right_out:
                if ("r", n) in cols:
                    continue
                a = take_array(bs.batch.column(n), right_idx, grow=rgrow)
                v = a.validity
                v = bvalid if v is None else (v & bvalid)
                cols[("r", n)] = a.with_validity(v)
        arrays = [cols[("l", n)] for n in self.left_out] + \
            [cols[("r", n)] for n in self.right_out]
        return Batch(self.out_schema, arrays, total)

    def _expand(self, bs: BuildState, left: Batch, start, cnt,
                fanout_capacity, emit_unmatched_probe: bool,
                update_matched: bool):
        cap = left.capacity
        r, o, brow_sorted, has_match, valid_j, pass_, total, overflow = \
            self._pair_geometry(bs, left, start, cnt, fanout_capacity,
                                emit_unmatched_probe)
        error = bs.error | overflow
        out = self._materialize(bs, left, r, brow_sorted, pass_, total)

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
            matched = bs.matched.at[jnp.where(pass_, brow_sorted,
                                              bcap)].max(
                jnp.ones_like(brow_sorted, dtype=jnp.bool_), mode="drop")
            bs = bs._replace(matched=matched, error=error)
        else:
            bs = bs._with_error(overflow)
        return out, bs

    # ------------------------------------------------------------------
    def finish(self, bs: BuildState) -> Optional[Batch]:
        """Emit trailing rows for right-side join types."""
        jt = self.join_type
        if jt in ("right outer", "full outer", "right semi", "right anti"):
            cap = bs.batch.capacity
            G = self.max_build_rows
            # matched bits: per-pair (sorted space) -> original rows,
            # plus group-level seg hits
            m_orig = jnp.zeros((cap,), jnp.bool_).at[bs.perm].set(
                bs.matched, mode="drop", unique_indices=True)
            seg_hit = jnp.where(
                bs.bsegs >= 0,
                bs.matched_seg[jnp.clip(bs.bsegs, 0, G - 1)], False)
            matched = m_orig | seg_hit
            if jt == "right semi":
                sel = matched
            else:
                sel = ~matched & row_mask(cap, bs.num_rows)
            picked = filter_batch(
                bs.batch, Array(dt.bool_, sel, None, length=bs.num_rows))
            arrays = []
            n_out = picked.length
            for n in self.left_out:
                f = self.left_schema.field(n)
                t = f.type
                if t.is_varlen:
                    arrays.append(Array(
                        t, jnp.zeros((16,), jnp.uint8),
                        jnp.zeros((picked.capacity,), jnp.bool_),
                        offsets=jnp.zeros((picked.capacity + 1,), jnp.int32),
                        length=n_out))
                else:
                    arrays.append(Array(
                        t, jnp.zeros((picked.capacity,),
                                     dtype=t.storage_np),
                        jnp.zeros((picked.capacity,), jnp.bool_),
                        length=n_out))
            for n in self.right_out:
                arrays.append(picked.column(n))
            return Batch(self.out_schema, arrays, n_out)
        return None

    def _rename(self, b: Batch) -> Batch:
        return Batch(self.out_schema, b.arrays, b.length, b.index)
