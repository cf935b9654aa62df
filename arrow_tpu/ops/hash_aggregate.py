"""Grouped hash aggregation: Grouper + GroupedAggregators glued together.

Reference: ``GroupByNode`` (``acero/groupby_aggregate_node.cc``; Consume
:210, Merge :255, Finalize :300) and pyarrow's ``Table.group_by`` →
``acero._group_by`` path (``python/pyarrow/acero.py:412``).

The engine-side node (arrow_tpu.acero) streams batches through
``HashAggregate.consume`` (one fused jitted scatter pass per batch) and
emits ``finalize`` at end-of-stream. The same consume/merge protocol serves
the distributed combine: per-shard HashAggregate states are merged after an
all-to-all re-key (arrow_tpu.parallel).

String group keys work in BOTH forms: dictionary-encoded (codes are the
key lanes) and raw varlen (full-content fingerprint lanes + fixed-slot
uniques — ops/grouper.SlotStrings, the row-table varbinary-region analog
of ``row_internal.h:33``). Dictionary-encoding at ingest remains the fast
path for low-cardinality keys (SURVEY.md §7).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core import datatype as dt
from ..core.array import Array
from ..core.batch import Batch
from ..core.schema import Field, Schema
from .aggregates import make_grouped_aggregator
from .grouper import Grouper, GrouperState, SlotStrings

__all__ = ["AggregateSpec", "HashAggregate", "sorted_group_reduce"]


def _blocked_cumsum(x: jax.Array) -> jax.Array:
    """VMEM-safe inclusive cumsum: a flat ``jnp.cumsum`` lowers to one
    reduce-window whose scoped-VMEM scratch scales with the operand
    (the round-3 host_boundary compile SIGSEGV — see
    hashing._cumsum_u64); per-block scans + a block-offset scan keep
    every operand block-sized."""
    n = x.shape[0]
    C = 1 << 16
    if n <= C:
        return jnp.cumsum(x)
    pad = (-n) % C
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
    rows = jax.lax.optimization_barrier(x.reshape((-1, C)))
    within = jax.lax.optimization_barrier(jnp.cumsum(rows, axis=1))
    tot = within[:, -1]
    off = jnp.cumsum(tot) - tot
    return (within + off[:, None]).reshape((-1,))[:n]


def sorted_group_reduce(gid: jax.Array, inputs, kinds: tuple, G: int):
    """Dense-domain grouped reduction for LARGE G — the sorted
    complement of ``pallas_kernels.dense_group_reduce`` (same interface
    and input conventions), used past that kernel's O(n*G) crossover
    (VERDICT r4 #4: dense G-ladder fell to 9.9M rows/s at G=32768 while
    this formulation is G-independent).

    ONE stable 1-key sort by slot groups the rows (payloads ride almost
    free on v5e — sort cost scales with key operands); then integer
    sums/counts are cumsum boundary-differences (bit-exact), extremes
    are segmented Hillis-Steele scans, and per-slot segment bounds come
    from two G-sized searchsorteds. Unlike the generic sort-grouper
    there is NO group table, NO per-row codes scatter and NO unique-key
    extraction: the output slot IS ``key - lo``. kinds[0] must be the
    ``imin``-of-iota appearance tap consume_dense always passes first —
    sort stability makes it a segment-head gather instead of a scan.
    """
    from .segment import segmented_scan
    n = gid.shape[0]
    _I32MAX = jnp.int32((1 << 31) - 1)
    _I32MIN = jnp.int32(-(1 << 31))
    BIAS32 = jnp.uint32(0x80000000)
    key = jnp.where(gid >= 0, gid.astype(jnp.uint32),
                    jnp.uint32(0xFFFFFFFF))
    out = jax.lax.sort([key] + list(inputs), num_keys=1, is_stable=True)
    sk, sx = out[0], out[1:]
    head = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                            sk[1:] != sk[:-1]])
    gidx = jnp.arange(G, dtype=jnp.uint32)
    starts = jnp.searchsorted(sk, gidx, side="left").astype(jnp.int32)
    ends = jnp.searchsorted(sk, gidx, side="right").astype(jnp.int32)
    rows = (ends - starts).astype(jnp.int32)
    present = rows > 0
    s0 = jnp.clip(starts, 0, n - 1)
    e1 = jnp.clip(ends - 1, 0, n - 1)

    def seg_sum_int(x, acc):
        C = jnp.concatenate([jnp.zeros((1,), acc),
                             _blocked_cumsum(x.astype(acc))])
        return C[ends] - C[starts]

    def seg_last(x, combine, ident):
        sc = segmented_scan(x, head, combine)
        return jnp.where(present, sc[e1], ident)

    outs = []
    ij = 0
    for i, kind in enumerate(kinds):
        if kind == "sumc":
            tot = seg_sum_int(sx[ij], jnp.int64)
            tot = jnp.where(present, tot, 0)
            lo = jax.lax.bitcast_convert_type(
                (tot & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32),
                jnp.int32)
            outs.append(lo)
            outs.append((tot >> jnp.int64(32)).astype(jnp.int32))
            ij += 1
        elif kind in ("imin64", "imax64"):
            hi, lo_b = sx[ij], sx[ij + 1]
            lo_u = (jax.lax.bitcast_convert_type(lo_b, jnp.uint32) ^
                    BIAS32)
            v = (hi.astype(jnp.int64) << jnp.int64(32)) | \
                lo_u.astype(jnp.int64)
            is_min = kind == "imin64"
            ident = jnp.int64((1 << 63) - 1) if is_min else \
                jnp.int64(-(1 << 63))
            r = seg_last(v, jnp.minimum if is_min else jnp.maximum,
                         ident)
            outs.append((r >> jnp.int64(32)).astype(jnp.int32))
            outs.append(jax.lax.bitcast_convert_type(
                (r & jnp.int64(0xFFFFFFFF)).astype(jnp.uint32) ^ BIAS32,
                jnp.int32))
            ij += 2
        elif kind == "count":
            s = seg_sum_int(sx[ij], jnp.int32)
            outs.append(jnp.where(present, s, 0))
            ij += 1
        elif kind == "sum":
            outs.append(seg_last(sx[ij], jnp.add,
                                 jnp.asarray(0, sx[ij].dtype)))
            ij += 1
        elif kind in ("min", "imin"):
            ident = _I32MAX if sx[ij].dtype == jnp.int32 else \
                jnp.asarray(jnp.inf, sx[ij].dtype)
            if i == 0:
                # appearance tap: stable sort puts the min iota at the
                # segment head — one gather, no scan
                outs.append(jnp.where(present, sx[0][s0], _I32MAX))
            else:
                outs.append(seg_last(sx[ij], jnp.minimum, ident))
            ij += 1
        else:                                   # max / imax
            ident = _I32MIN if sx[ij].dtype == jnp.int32 else \
                jnp.asarray(-jnp.inf, sx[ij].dtype)
            outs.append(seg_last(sx[ij], jnp.maximum, ident))
            ij += 1
    return rows, outs


@dataclass(frozen=True)
class AggregateSpec:
    """One aggregate: (input column or None for count_all, function,
    options, output field name). Mirrors Arrow's Aggregate struct
    (``compute/api_aggregate.h``)."""
    function: str                  # e.g. "sum" or "hash_sum"
    target: object = None          # input column (str), tuple of columns
    #                                (multi-arg aggs like pivot_wider), or
    #                                None for count_all
    options: object = None
    name: Optional[str] = None     # output column; default "{target}_{fn}"

    @property
    def targets(self) -> tuple:
        if self.target is None:
            return ()
        if isinstance(self.target, (tuple, list)):
            return tuple(self.target)
        return (self.target,)

    @property
    def out_name(self) -> str:
        if self.name:
            return self.name
        fn = self.function[5:] if self.function.startswith("hash_") \
            else self.function
        ts = self.targets
        return "_".join(ts + (fn,)) if ts else fn


class _SlotOverflow:
    """Error carrier for varlen key-slot overflow (quacks like an
    aggregator for the node's error-reporting path)."""

    def __init__(self, key: str, slot_bytes: int):
        self.name = f"key '{key}'"
        self._slot_bytes = slot_bytes

    def error_message(self, flag: int) -> str:
        return (f"group key string in {self.name} exceeds the "
                f"{self._slot_bytes}-byte unique slot; raise "
                f"varlen_slot_bytes (or dictionary-encode the key)")


@jax.jit
def _probe_key_domain(key: Array):
    """(min, max) of the key over active (in-range, non-null) rows; if no
    active rows, min > max."""
    from ..core.array import row_mask
    cap = key.capacity
    act = row_mask(cap, key.length)
    if key.validity is not None:
        act = act & key.validity
    v = key.values
    info = jnp.iinfo(v.dtype)
    lo = jnp.min(jnp.where(act, v, info.max))
    hi = jnp.max(jnp.where(act, v, info.min))
    return lo, hi


class HashAggregate:
    """Static-config grouped aggregation over a stream of batches."""

    def __init__(self, in_schema: Schema, keys: Sequence[str],
                 aggs: Sequence[AggregateSpec], max_groups: int = 1 << 16):
        self.in_schema = in_schema
        self.keys = tuple(keys)
        self.aggs = tuple(aggs)
        self.max_groups = max_groups
        key_fields = [in_schema.field(k) for k in keys]
        self.grouper = Grouper(
            [f.type for f in key_fields],
            [f.nullable for f in key_fields],
            max_groups=max_groups,
        )
        self._aggregators = []
        for spec in self.aggs:
            ts = spec.targets
            if len(ts) > 1:
                in_type = tuple(in_schema.field(t).type for t in ts)
            elif ts:
                in_type = in_schema.field(ts[0]).type
            else:
                in_type = None
            self._aggregators.append(make_grouped_aggregator(
                spec.function, in_type, max_groups, spec.options))
        # output column order matches pyarrow Table.group_by: keys first,
        # then aggregates (verified empirically on pyarrow 25)
        fields = [Field(k, f.type, True)
                  for k, f in zip(keys, key_fields)]
        self.key_fields = list(fields)
        agg_fields = []
        for spec, agg in zip(self.aggs, self._aggregators):
            agg_fields.append(Field(spec.out_name, agg.out_type, True))
        self.out_schema = Schema(tuple(fields + agg_fields))

    # -- state: (grouper_state, tuple(agg_states), tuple(unique key Arrays))
    def init_state(self):
        grouper_state = self.grouper.init_state()
        agg_states = tuple(a.init() for a in self._aggregators)
        uniques = None
        return (grouper_state, agg_states, uniques)

    def consume(self, state, batch: Batch, pack_arrays=None,
                pack_static=None, first: bool = False):
        """One fused pass: sort-group the batch by key (one lexsort), run
        the grouper table over the unique reps, then segment-reduce every
        aggregate (ops/segment) — the only row-granularity op is the sort;
        all scatters write one element per distinct group.

        ``pack_arrays`` (dynamic (lo, shift, outmap)) + ``pack_static``
        (static (K, fold)): per-batch sort-key range packing;
        ``first``: the empty-state fast path (skips the merge-insert
        table sort). Both host-routed by AggregateNode (and bench) via
        ``probe_route``. Callers jitting this mark args 3 and 4 static."""
        from .segment import make_segment_context
        pack = None
        if pack_arrays is not None:
            pack = (pack_arrays[0], pack_arrays[1], pack_arrays[2],
                    pack_static[0], pack_static[1])
        grouper_state, agg_states, uniques = state
        key_cols = [batch.column(k) for k in self.keys]
        # aggregate input columns ride the grouping sort as payloads —
        # they arrive key-grouped without post-sort random gathers
        payload_plan = []   # (buffer id, has_validity)
        payloads = []
        seen = set()
        for spec in self.aggs:
            if len(spec.targets) != 1:
                continue   # multi-target aggs (pivot) read original rows
            col = batch.column(spec.targets[0])
            key = id(col.values)
            if key in seen or col.type.is_varlen or \
                    col.values.ndim == 2:
                # 2D (multi-limb) storage can't ride lax.sort operands;
                # _sorted_inputs row-gathers it through perm instead
                continue
            seen.add(key)
            payload_plan.append((key, col.validity is not None))
            payloads.append(col.values)
            if col.validity is not None:
                payloads.append(col.validity)
        # the per-row group-id scatter (codes) is only needed by
        # aggregators without a segment-consume override
        from .aggregates import GroupedAggregator
        need_codes = any(
            type(a).consume_grouped is GroupedAggregator.consume_grouped
            for a in self._aggregators)
        grouper_state, rep_gids, g, s_payloads = \
            self.grouper.consume_with_group(
                grouper_state, key_cols, length=batch.length,
                payloads=tuple(payloads), pack=pack, first=first,
                need_codes=need_codes)
        sorted_cols = {}
        it = iter(s_payloads)
        for key, has_valid in payload_plan:
            v_sorted = next(it)
            valid_sorted = next(it) if has_valid else None
            sorted_cols[key] = (v_sorted, valid_sorted)
        ctx = make_segment_context(g, rep_gids, sorted_cols)
        uniques = tuple(self.grouper.uniques_scatter_reps(
            key_cols, g, rep_gids, uniques))
        new_agg_states = []
        for spec, agg, st in zip(self.aggs, self._aggregators, agg_states):
            ts = spec.targets
            if len(ts) > 1:
                values = tuple(batch.column(t) for t in ts)
            elif ts:
                values = batch.column(ts[0])
            else:
                values = None
            new_agg_states.append(agg.consume_grouped(st, values, ctx))
        return (grouper_state, tuple(new_agg_states), uniques)

    # ------------------------------------------------------------------
    # Dense-domain fast path (VERDICT r2 #3). The analog of the
    # reference's GrouperFastImpl specialization (``grouper.cc:548``):
    # when one probe shows the single integer key spans a small domain,
    # gid = key - lo directly — NO grouping sort at all — and every
    # aggregate reduces in ONE streaming Pallas pass
    # (ops/pallas_kernels.dense_group_reduce). First-appearance group
    # numbering is reconstructed exactly from a per-slot first-row
    # reduction, and the per-slot partial states fold into the main state
    # through the ordinary ``merge_rows`` protocol, so sort-path and
    # dense-path batches interleave freely.
    # max dense slots: kernel work is O(n*G). MEASURED crossover vs the
    # sort path on v5e (tools/dense_crossover.py, round 4, 30M rows):
    # G=1024 dense 219M vs sort 64M; G=2048 124M vs 63M; G=4096 63.5M vs
    # 63.2M (break-even); G=8192 41M (sort wins). Override via env.
    DENSE_CAP = int(__import__("os").environ.get(
        "ARROW_TPU_DENSE_CAP", "4096"))
    # dense domains past DENSE_CAP route to sorted_group_reduce up to
    # this many slots (state arrays are (G,)-sized)
    SORTED_DENSE_CAP = int(__import__("os").environ.get(
        "ARROW_TPU_SORTED_DENSE_CAP", str(1 << 20)))
    _DENSE_FNS = {"count", "count_all", "sum", "mean", "min", "max",
                  "any", "all"}

    def dense_static_ok(self) -> bool:
        """Static (schema-level) eligibility for the dense-domain kernel."""
        if len(self.keys) != 1:
            return False
        f = self.in_schema.field(self.keys[0])
        if not f.type.is_integer:
            return False
        for agg in self._aggregators:
            if agg.name not in self._DENSE_FNS:
                return False
            it = agg.in_type
            f32 = it is not None and it.is_floating and it.bit_width == 32
            i64 = it is not None and it.is_signed_integer \
                and it.bit_width == 64
            if agg.name == "mean" and not f32:
                return False
            if agg.name in ("sum", "min", "max") and not (f32 or i64):
                return False
            if agg.name in ("any", "all") and not isinstance(
                    it, dt.BoolType):
                return False
        return True

    def probe_scalars(self, batch: Batch):
        """Device scalars for the host routing decision, fetched in ONE
        device_get by the caller: per-lane (lo, span) windows of the
        normalized key lanes (tighter of the unsigned/signed window, as
        in ops/join build-side packing) + the dense key domain when the
        dense kernel is statically eligible."""
        from ..core.array import row_mask
        from .grouper import group_key_lanes
        key_cols = [batch.column(k) for k in self.keys]
        lanes = group_key_lanes(key_cols, self.grouper.key_nullable)
        cap = batch.capacity
        act = row_mask(cap, batch.length)
        act2 = act[:, None]
        BIGU = jnp.uint32(0xFFFFFFFF)
        lo_u = jnp.min(jnp.where(act2, lanes, BIGU), axis=0)
        hi_u = jnp.max(jnp.where(act2, lanes, jnp.uint32(0)), axis=0)
        span_u = hi_u - lo_u
        lanes_i = lanes.view(jnp.int32)
        lo_i = jnp.min(jnp.where(act2, lanes_i, jnp.int32(2**31 - 1)),
                       axis=0)
        hi_i = jnp.max(jnp.where(act2, lanes_i, jnp.int32(-2**31)),
                       axis=0)
        span_i = hi_i.view(jnp.uint32) - lo_i.view(jnp.uint32)
        use_i = span_i < span_u
        out = {"lo": jnp.where(use_i, lo_i.view(jnp.uint32), lo_u),
               "span": jnp.minimum(span_i, span_u)}
        if self.dense_static_ok():
            dlo, dhi = _probe_key_domain(key_cols[0])
            out["dlo"], out["dhi"] = dlo, dhi
        return out

    def probe_route(self, batch: Batch, vals):
        """Host routing from fetched ``probe_scalars``: ("dense", cfg) |
        ("packed", params) | ("generic", None). ``params`` =
        (lo, shift, outmap, K): dynamic arrays + a static sort-lane
        count — the greedy bin packing puts as many key lanes as fit
        into 30-bit uint32 sort keys (bin 0 reserves the top value as
        the folded inactive sentinel, distinct.sort_group)."""
        import numpy as np
        if "dlo" in vals:
            lo, hi = int(vals["dlo"]), int(vals["dhi"])
            if hi >= lo:
                key = batch.column(self.keys[0])
                needed = (hi - lo + 1) + (
                    1 if key.validity is not None else 0)
                if needed <= min(self.DENSE_CAP, self.max_groups):
                    G = 128
                    while G < needed:
                        G *= 2
                    return ("dense", {"lo": lo, "G": G,
                                      "impl": "pallas"})
                if needed <= min(self.SORTED_DENSE_CAP,
                                 self.max_groups):
                    # past the VPU kernel's O(n*G) crossover: the
                    # G-independent sorted-dense path (no group table,
                    # no codes scatter — output slot IS key - lo)
                    G = 128
                    while G < needed:
                        G *= 2
                    return ("dense", {"lo": lo, "G": G,
                                      "impl": "sorted"})
        spans = [int(s) for s in np.asarray(vals["span"])]
        los = np.asarray(vals["lo"], dtype=np.uint32)
        L = len(spans)
        bits = [s.bit_length() for s in spans]
        # first-fit-decreasing into 32-bit bins
        order = sorted(range(L), key=lambda j: -bits[j])
        bin_used: list = []
        outmap = np.zeros((L,), np.int32)
        shifts = np.zeros((L,), np.uint32)
        for j in order:
            for k in range(len(bin_used)):
                if bin_used[k] + bits[j] <= 32:
                    break
            else:
                k = len(bin_used)
                bin_used.append(0)
            outmap[j] = k
            shifts[j] = bin_used[k]
            bin_used[k] += bits[j]
        K = len(bin_used)
        # fold the inactive sentinel into a bin with <= 30 used bits
        # (distinct.sort_group folded mode) by swapping it to bin 0
        fold = False
        for k in range(K):
            if bin_used[k] <= 30:
                if k != 0:
                    outmap = np.where(outmap == 0, -1, outmap)
                    outmap = np.where(outmap == k, 0, outmap)
                    outmap = np.where(outmap == -1, k, outmap)
                fold = True
                break
        # sort-key count: K packed lanes (+1 inactive key when unfolded)
        # vs L lanes + 1 inactive key on the generic path
        if K + (0 if fold else 1) >= L + 1 or K > 2:
            return ("generic", None)
        return ("packed", (jnp.asarray(los), jnp.asarray(shifts),
                           jnp.asarray(outmap.astype(np.int32)), K, fold))

    def consume_dense(self, state, batch: Batch, lo, G: int,
                      impl: str = "pallas"):
        """Dense-domain consume: jit-compatible given static G; ``lo`` is
        a dynamic scalar (no recompile when the domain shifts). ``impl``
        (static): "pallas" = the O(n*G) VPU kernel (fastest up to its
        ~2-4K crossover), "sorted" = sorted_group_reduce (G-independent,
        used for larger dense domains)."""
        from ..core.array import row_mask
        from .pallas_kernels import dense_group_reduce
        key = batch.column(self.keys[0])
        cap = key.capacity
        in_range = row_mask(cap, batch.length)
        kv = (key.values - lo).astype(jnp.int32)
        gid = jnp.where(in_range, kv, jnp.int32(-1))
        if key.validity is not None:
            # null key rows form their own group in slot G-1 (the probe
            # reserved it)
            gid = jnp.where(key.validity | ~in_range, gid,
                            jnp.int32(G - 1))

        from .pallas_kernels import _DG_ARITY
        iota = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).reshape(
            (cap,))
        inputs = [jnp.where(gid >= 0, iota, jnp.int32((1 << 31) - 1))]
        kinds = ["imin"]
        slot_of = {}            # sig -> kind-entry index

        def add(sig, build):
            """Register one kind entry (1+ inputs) once per signature."""
            if sig not in slot_of:
                slot_of[sig] = len(kinds)
                xs, kind = build()
                inputs.extend(xs if isinstance(xs, (list, tuple))
                              else [xs])
                kinds.append(kind)
            return slot_of[sig]

        BIAS32 = jnp.uint32(0x80000000)

        def _i64_limbs(v, ok):
            """int64 -> four 16-bit limbs of the SIGN-BIASED value (u32
            wrap + carry accumulation in the kernel is exact mod 2^64)."""
            u = v.astype(jnp.uint64) ^ jnp.uint64(1 << 63)
            out = []
            for k in range(4):
                limb = ((u >> jnp.uint64(16 * k)) &
                        jnp.uint64(0xFFFF)).astype(jnp.int32)
                out.append(jnp.where(ok, limb, 0))
            return out

        def _i64_pair(v, ok, is_min):
            hi = (v >> jnp.int64(32)).astype(jnp.int32)
            lo = (v.astype(jnp.uint64) &
                  jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
            lo_b = (lo ^ BIAS32).view(jnp.int32)
            ident = jnp.int32((1 << 31) - 1) if is_min else \
                jnp.int32(-(1 << 31))
            return [jnp.where(ok, hi, ident), jnp.where(ok, lo_b, ident)]

        active = gid >= 0
        for spec, agg in zip(self.aggs, self._aggregators):
            if agg.name == "count_all":
                continue        # served by the kernel's rows output
            col = batch.column(spec.targets[0])
            ok = active if col.validity is None else (active & col.validity)
            tgt = spec.targets[0]
            is_i64 = agg.in_type is not None and \
                agg.in_type.is_signed_integer and \
                agg.in_type.bit_width == 64
            if agg.name == "count":
                mode = getattr(agg.options, "mode", "only_valid")
                if mode == "only_null":
                    okn = active & (~col.validity if col.validity
                                    is not None else
                                    jnp.zeros((cap,), jnp.bool_))
                    add((tgt, "count_null"),
                        lambda okn=okn: (okn.astype(jnp.int32), "count"))
                elif mode == "all":
                    add((None, "rows"), lambda: (active.astype(jnp.int32),
                                                 "count"))
                else:
                    add((tgt, "countv"),
                        lambda ok=ok: (ok.astype(jnp.int32), "count"))
                continue
            add((tgt, "countv"),
                lambda ok=ok: (ok.astype(jnp.int32), "count"))
            if agg.name in ("any", "all"):
                bv = col.values.astype(jnp.bool_)
                if agg.name == "any":
                    add((tgt, "any"), lambda bv=bv, ok=ok: (
                        (bv & ok).astype(jnp.int32), "imax"))
                else:
                    add((tgt, "all"), lambda bv=bv, ok=ok: (
                        (bv | ~ok).astype(jnp.int32), "imin"))
                continue
            if is_i64:
                v = col.values
                if agg.name == "sum":
                    add((tgt, "sum64"),
                        lambda v=v, ok=ok: (_i64_limbs(v, ok), "sumc"))
                elif agg.name == "min":
                    add((tgt, "min64"), lambda v=v, ok=ok: (
                        _i64_pair(v, ok, True), "imin64"))
                elif agg.name == "max":
                    add((tgt, "max64"), lambda v=v, ok=ok: (
                        _i64_pair(v, ok, False), "imax64"))
                continue
            v = col.values.astype(jnp.float32)
            if agg.name in ("sum", "mean"):
                add((tgt, "sum"),
                    lambda v=v, ok=ok: (jnp.where(ok, v, 0.0), "sum"))
            elif agg.name == "min":
                add((tgt, "min"),
                    lambda v=v, ok=ok: (
                        jnp.where(ok, v, jnp.float32(jnp.inf)), "min"))
            elif agg.name == "max":
                add((tgt, "max"),
                    lambda v=v, ok=ok: (
                        jnp.where(ok, v, jnp.float32(-jnp.inf)), "max"))

        # int64 sums need FOUR sumc entries (one per limb); expand the
        # single "sumc" marker into the real kind list
        flat_kinds = []
        entry_first_out = []    # kind-entry index -> first output index
        out_pos = 0
        for k in kinds:
            entry_first_out.append(out_pos)
            if k == "sumc":
                flat_kinds.extend(["sumc"] * 4)
                out_pos += 8
            else:
                flat_kinds.append(k)
                out_pos += _DG_ARITY[k][1]

        if impl == "sorted":
            rows, outs = sorted_group_reduce(gid, tuple(inputs),
                                             tuple(flat_kinds), G)
        else:
            rows, outs = dense_group_reduce(gid, tuple(inputs),
                                            tuple(flat_kinds), G)
        first = outs[0]
        present = rows > 0
        order_key = jnp.where(present, first, jnp.int32((1 << 31) - 1))
        perm = jnp.argsort(order_key)       # slots in appearance order
        o_count = jnp.sum(present, dtype=jnp.int32)

        slots = perm.astype(key.values.dtype)
        kvals = lo + slots
        kvalid = None
        if key.validity is not None:
            kvalid = perm != jnp.int32(G - 1)
        o_key = Array(key.type, kvals, kvalid, length=o_count)

        def outs_for(sig, n):
            base = entry_first_out[slot_of[sig]]
            return [outs[base + j][perm] for j in range(n)]

        def _limb_total(lo_i32, carry_i32):
            lo_u = lo_i32.view(jnp.uint32).astype(jnp.uint64)
            return (carry_i32.astype(jnp.uint64) << jnp.uint64(32)) | lo_u

        o_states = []
        for spec, agg in zip(self.aggs, self._aggregators):
            rp = rows[perm]
            if agg.name == "count_all":
                o_states.append(rp.astype(jnp.int64))
                continue
            tgt = spec.targets[0]
            if agg.name == "count":
                mode = getattr(agg.options, "mode", "only_valid")
                sig = (tgt, "countv")
                if mode == "only_null":
                    sig = (tgt, "count_null")
                elif mode == "all":
                    sig = (None, "rows")
                o_states.append(outs_for(sig, 1)[0].astype(jnp.int64))
                continue
            cnt = outs_for((tgt, "countv"), 1)[0].astype(jnp.int64)
            is_i64 = agg.in_type is not None and \
                agg.in_type.is_signed_integer and \
                agg.in_type.bit_width == 64
            if agg.name in ("any", "all"):
                o_states.append(
                    (outs_for((tgt, agg.name), 1)[0] != 0, cnt))
            elif is_i64 and agg.name == "sum":
                parts = outs_for((tgt, "sum64"), 8)
                total = jnp.zeros_like(cnt).astype(jnp.uint64)
                for k in range(4):
                    lt = _limb_total(parts[2 * k], parts[2 * k + 1])
                    total = total + (lt << jnp.uint64(16 * k))
                # un-bias: subtract count * 2^63 (mod 2^64)
                total = total - (cnt.astype(jnp.uint64) <<
                                 jnp.uint64(63))
                acc = total.astype(jnp.int64) \
                    if agg._acc_dtype == jnp.dtype(jnp.int64) \
                    else total.astype(agg._acc_dtype)
                o_states.append((acc, cnt))
            elif is_i64 and agg.name in ("min", "max"):
                sig = (tgt, "min64" if agg.name == "min" else "max64")
                hi, lo_b = outs_for(sig, 2)
                lo_u = (lo_b.view(jnp.uint32) ^ BIAS32).astype(jnp.uint64)
                val = ((hi.astype(jnp.int64) << jnp.int64(32)) |
                       lo_u.astype(jnp.int64))
                o_states.append((val.astype(agg.in_type.storage_np), cnt))
            elif agg.name in ("sum", "mean"):
                acc = outs_for((tgt, "sum"), 1)[0].astype(agg._acc_dtype)
                o_states.append((acc, cnt))
            elif agg.name == "min":
                o_states.append((outs_for((tgt, "min"), 1)[0], cnt))
            elif agg.name == "max":
                o_states.append((outs_for((tgt, "max"), 1)[0], cnt))
        return self.merge_rows(state, [o_key], tuple(o_states), o_count)

    def merge(self, state, other_state):
        """Cross-shard combine: feed other's unique keys through our
        grouper to build the group-id mapping, then Merge each aggregator
        (the reference's Merge-with-group_id_mapping,
        ``groupby_aggregate_node.cc:255``)."""
        o_grouper_state, o_agg_states, o_uniques = other_state
        # other's uniques (capacity = max_groups) are consumed as keys;
        # varlen slot-form uniques compact to real varlen Arrays first so
        # the grouper fingerprints actual content bytes
        o_keys = [u.to_array(f.type) if isinstance(u, SlotStrings) else u
                  for u, f in zip(o_uniques, self.key_fields)]
        return self.merge_rows(state, o_keys, o_agg_states,
                               o_grouper_state.num_groups)

    def merge_rows(self, state, o_keys, o_agg_states, o_count):
        """Fold per-group state ROWS (keys + one state row per group) into
        this state. The rows may come from another state's capacity-G
        buffers (``merge``) or from an all_to_all exchange of pre-aggregated
        shard states (parallel/context) — any capacity works; rows past
        ``o_count`` are dropped."""
        grouper_state, agg_states, uniques = state
        grouper_state, mapping = self.grouper.consume(
            grouper_state, o_keys, length=o_count)
        uniques = tuple(self.grouper.uniques_scatter(
            o_keys, mapping, uniques))
        # inactive rows get gid -1; JAX scatters WRAP negative indices
        # even under mode="drop", so route them to the truly-OOB index G
        # (exchange buffers are zero-filled, not identity-filled)
        mapping = jnp.where(mapping < 0, jnp.int32(self.max_groups),
                            mapping)
        new_agg_states = []
        for agg, st, ost in zip(self._aggregators, agg_states,
                                o_agg_states):
            new_agg_states.append(agg.merge(st, ost, mapping))
        return (grouper_state, tuple(new_agg_states), uniques)

    @property
    def supports_state_exchange(self) -> bool:
        """True when every aggregator's state is per-group row-shaped, so
        the distributed combine can exchange pre-aggregated state rows
        (skew-immune) instead of raw input rows."""
        return all(a.dist_rows for a in self._aggregators)

    def finalize(self, state) -> Batch:
        grouper_state, agg_states, uniques = state
        n = grouper_state.num_groups
        arrays = []
        for u, f in zip(
                uniques or
                [SlotStrings.init(self.max_groups,
                                  self.grouper.varlen_slot_bytes)
                 if f.type.is_varlen else
                 Array(f.type, jnp.zeros((self.max_groups,),
                                         dtype=f.type.storage_np), None)
                 for f in self.key_fields], self.key_fields):
            if isinstance(u, SlotStrings):
                arrays.append(u.to_array(f.type, length=n))
            else:
                arrays.append(u.with_length(n))
        for agg, st in zip(self._aggregators, agg_states):
            arrays.append(agg.finalize(st, n))
        return Batch(self.out_schema, arrays, n)

    def aggregator_errors(self, state):
        """Host-side deferred per-aggregator error flags:
        [(aggregator, nonzero flag)] (e.g. pivot duplicate detection)."""
        out = []
        _, agg_states, uniques = state
        for agg, st in zip(self._aggregators, agg_states):
            if hasattr(agg, "error_flag"):
                flag = int(jax.device_get(agg.error_flag(st)))
                if flag:
                    out.append((agg, flag))
        for u, f in zip(uniques or (), self.key_fields):
            if isinstance(u, SlotStrings) and \
                    int(jax.device_get(u.error)):
                out.append((_SlotOverflow(f.name,
                                          self.grouper.varlen_slot_bytes),
                            2))
        return out

    @property
    def error(self):
        """Extract deferred error flag from a state (host check)."""
        def get(state):
            return state[0].error
        return get
