"""Fused (whole-stage-compiled) plan execution.

The eager driver dispatches each node's programs separately and pays a
~25ms tunnel RTT per host synchronization (~12 per TPC-H Q3 run —
round-4 cProfile: 0.93s of a 0.96s Q3 run was device_get waits). The
fused driver instead compiles each PIPELINE SEGMENT into one program
and defers every data-dependent check:

  * a pure segment — source -> filters/projects -> join probe(s) —
    runs as ONE program per morsel (multi-batch sources stream through
    it with zero per-batch host syncs; overflow flags accumulate as
    device scalars);
  * each hash join's BUILD side executes recursively as its own fused
    subplan; its single host fetch doubles as the packed/unique
    probe-impl decision (HashJoinNode._build_recover);
  * accumulators compile to state-threaded folds: aggregate consume
    threads HashAggregate state across morsels (finalize once),
    order_by+limit folds a running top-k, order_by concatenates then
    sorts once;
  * ONE device_get at materialization fetches every deferred-error
    scalar and output length.

A fired deferred check (join fanout, aggregate group table, checked
kernels) falls back to the standard eager driver, whose per-batch
recovery paths are intact — fused runs are pure, so the fallback is
always safe. Unsupported shapes return None likewise.

This is the engine's whole-stage-codegen analog: Acero fuses pipeline
segments into tasks (``exec_plan.h:225`` push chains); under XLA the
fusion is literal — one compiled program per segment.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..core.batch import Batch, Table


class _Unsupported(Exception):
    pass


class _FallBack(Exception):
    """A deferred device check fired mid-fusion (e.g. inside a join's
    build subtree): fused outputs would be silently wrong, so the whole
    plan is handed to the eager driver, whose per-batch recovery paths
    re-run it correctly."""


class _Ctx:
    def __init__(self):
        self.errors: list = []     # deferred device scalars


# Adaptive fused capacities (round 5, from the committed fused stage
# budget tools/reports/q3_fused_stage_r5.txt): a fused spine carries
# every stage at its WORST-CASE static capacity (a 14.8K-row aggregate
# input ran at the join's ~4M-row fanout capacity = 366ms of the 656ms
# Q3 run) because the single-program spine never host-syncs to compact.
# Instead, the end-of-run fetch additionally observes each stage's live
# length (free — same device_get), and LATER runs compile a static
# prefix slice down to a padded observed capacity right after each
# shrinking stage (filter/join probe — their live rows are already a
# left-packed prefix). A data change past the slice fires the deferred
# overflow scalar: the run falls back to the eager driver and the
# observation updates, so the next fused run recompiles bigger. This is
# runtime-adaptive re-optimization, the fused analog of
# nodes.maybe_compact.
_PLAN_OBS: dict = {}

# Disk persistence for the learned plan state (round 5): a FRESH process
# otherwise pays the full bootstrap chronology again — the eager/boot
# form's extra executables each cost a multi-second persistent-cache
# load (and minutes of compile when the compile cache is cold) through
# the axon relay. Keys are repr() strings of the hashable sigs (schema/
# option reprs are deterministic), values are ints (observed lengths)
# or strs (probe impls) — both JSON-able. Stale entries self-heal: every
# persisted decision is re-validated in-program by deferred scalars, a
# miss falls back to the eager driver and overwrites the entry.
_PLAN_STORE_PATH = os.environ.get(
    "ARROW_TPU_PLAN_CACHE",
    os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".plan_cache.json"))
_PLAN_LOADED = False
_PLAN_DIRTY = False


def _load_plan_store() -> None:
    global _PLAN_LOADED
    if _PLAN_LOADED:
        return
    _PLAN_LOADED = True
    if not _PLAN_STORE_PATH:
        return
    try:
        import json
        with open(_PLAN_STORE_PATH) as f:
            d = json.load(f)
        for k, v in d.get("obs", {}).items():
            _PLAN_OBS.setdefault(k, int(v))
        for k, v in d.get("impl", {}).items():
            _PLAN_IMPL.setdefault(k, v)
    except Exception:
        pass


def _save_plan_store() -> None:
    global _PLAN_DIRTY
    if not _PLAN_DIRTY or not _PLAN_STORE_PATH:
        return
    _PLAN_DIRTY = False
    try:
        import json
        tmp = _PLAN_STORE_PATH + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"obs": _PLAN_OBS, "impl": _PLAN_IMPL}, f)
        os.replace(tmp, _PLAN_STORE_PATH)
    except Exception:
        pass

# Probe-impl decisions learned by _build_recover's host fetch, keyed by
# the (slice-stripped) build-subtree sig + join options. A cached impl
# lets LATER runs compile the build INTO the spine — the whole plan
# becomes ONE program with ONE end fetch (each join build otherwise
# costs 2 extra ~25-50ms relay round-trips per run: the build-subtree
# error fetch and the _build_recover decision fetch). The assumption is
# validated IN-PROGRAM by deferred scalars (build overflow, pack-bits
# range, key uniqueness for packed_u): a data change fires them and the
# run falls back to the eager driver, which re-decides.
_PLAN_IMPL: dict = {}


def _strip_slices(sig) -> tuple:
    """Remove ("slice", ...) entries at EVERY depth: a hashjoin sig
    entry embeds its build subtree's sig, so a shallow strip left the
    build chain's evolving slice capacities inside downstream stages'
    observation keys — each nesting level then re-discovered its slices
    one run later (an N-deep plan took N+2 runs and N+2 recompiles to
    stabilize)."""
    if isinstance(sig, (list, tuple)):
        return tuple(
            _strip_slices(e) for e in sig
            if not (isinstance(e, tuple) and e and e[0] == "slice"))
    return sig


def _tight_capacity(key) -> Optional[int]:
    obs = _PLAN_OBS.get(key)
    if obs is None:
        return None
    from ..core.interop import pad_capacity
    return pad_capacity(int(obs * 1.3) + 16)


def prefix_slice(b: Batch, C: int):
    """Statically slice a batch's leading capacity to C (live rows must
    be a left-packed prefix — true for filter/join/aggregate outputs).
    Returns (sliced_batch, overflow_scalar); bails to the original
    batch (err 0) when any column layout doesn't slice (nested/REE)."""
    from ..core import datatype as dt
    for i in range(b.num_columns):
        t = b.column(i).type
        if t.is_nested or isinstance(t, dt.RunEndEncodedType) or \
                b.column(i).children is not None:
            return b, jnp.int32(0)
    from ..core.array import Array
    n = jnp.asarray(b.length, jnp.int32)
    err = (n > C).astype(jnp.int32)
    nc = jnp.minimum(n, C)
    arrays = []
    for i in range(b.num_columns):
        a = b.column(i)
        al = jnp.minimum(jnp.asarray(a.length, jnp.int32), C)
        validity = a.validity[:C] if a.validity is not None else None
        if a.type.is_varlen:
            arrays.append(Array(a.type, a.values, validity,
                                offsets=a.offsets[:C + 1], length=al))
        else:
            arrays.append(Array(a.type, a.values[:C], validity,
                                dictionary=a.dictionary, length=al))
    out = Batch(b.schema, arrays, nc, b.index)
    return out, err



def _single_batch(node) -> Batch:
    from . import nodes as N
    if not isinstance(node, N.TableSourceNode):
        raise _Unsupported(type(node).__name__)
    t = node.table if hasattr(node, "table") else None
    if t is None or not isinstance(t, Table) or len(t.batches) != 1:
        raise _Unsupported("multi-batch or non-device source")
    return t.batches[0]

def _obs_tap(sig: list, obs_keys: list, fn):
    """Wrap a shrinking stage's chain fn: observe its live length (rides
    the end-of-run fetch) and, when a previous run recorded one, slice
    to the padded observed capacity (deferred overflow).

    The observation key MUST exclude earlier ("slice", C) sig entries:
    keyed on the full sig, inserting one stage's slice would shift every
    downstream stage's key, so each run discovered exactly one more
    slice and paid a full recompile per stage (measured as a 5-compile
    cascade on Q3). Slice-independent keys let run 2 apply ALL of run
    1's observations in one recompile."""
    key = repr(("obs", _strip_slices(sig)))
    C = _tight_capacity(key)
    sig.append(("slice", C))
    obs_keys.append(key)

    def f(*a, _fn=fn, _C=C):
        x, errs, obs = _fn(*a)
        # observe the PRE-slice length: if the data grows past a
        # previously-learned slice, the recorded value must reflect the
        # true size so the next compile gets a bigger capacity (the
        # clamped length would wedge the fused path in fallback forever)
        n = jnp.asarray(x.length, jnp.int32)
        # tiny batches aren't worth a slice (and its overflow risk)
        if _C is not None and _C < x.capacity and \
                x.capacity >= (1 << 16):
            x, e = prefix_slice(x, _C)
            errs = errs + (e,)
        return x, errs, obs + (n,)
    return f


def _chain_single(node, sig: list, obs_keys: list):
    """Returns (args: list, fn(*args) -> (Batch, errors tuple,
    observations tuple)).

    ``sig`` accumulates a hashable cache signature (node kinds, option
    signatures, static shapes, probe impl decisions, adaptive slice
    capacities); ``obs_keys`` collects the _PLAN_OBS keys matching the
    observation scalars the chain emits (in order)."""
    from . import nodes as N
    from .nodes import cached_stage, plan_sig

    if isinstance(node, N.TableSourceNode):
        b = _single_batch(node)
        sig.append(("src", b.schema, b.capacity))
        return [b], lambda b_: (b_, (), ())

    if isinstance(node, (N.FilterNode, N.ProjectNode)):
        args, fn = _chain_single(node.inputs[0], sig, obs_keys)
        # node._sig includes project output names (cache-collision fix)
        sig.append(node._sig)
        pure = node._pure

        def f(*a, _fn=fn, _p=pure):
            x, errs, obs = _fn(*a)
            return _p(x), errs, obs
        if isinstance(node, N.FilterNode):
            f = _obs_tap(sig, obs_keys, f)
        return args, f

    if isinstance(node, N.HashJoinNode):
        if getattr(node, "_dist", None) is not None:
            raise _Unsupported("dist join")
        if node.join.join_type not in ("inner", "left outer",
                                       "left semi", "left anti"):
            raise _Unsupported(f"join type {node.join.join_type}")
        from .spill import spill_budget_bytes
        if spill_budget_bytes(node.join.options) is not None:
            raise _Unsupported("spill-budgeted join")
        # BUILD PHASE
        bsig: list = []
        bobs_keys: list = []
        bargs, bfn = _chain_single(node.inputs[1], bsig, bobs_keys)
        ikey = repr(("impl", plan_sig(node.join.options),
                     _strip_slices(bsig)))
        impl = _PLAN_IMPL.get(ikey)
        if impl is not None:
            # INLINE form: the build compiles into the spine — no
            # per-run build fetches; the learned impl is validated by
            # deferred scalars (data change -> eager fallback + relearn)
            join = node.join
            # the form tag rides in a ("slice", ...) entry: part of the
            # compile cache sig, but STRIPPED from observation keys so
            # bootstrap-run observations carry over to the inline form
            sig.append(("hashjoin", plan_sig(join.options), impl,
                        tuple(bsig)))
            sig.append(("slice", "form", "inline"))
            # observation ORDER must match the emitted tuple
            # (bobs + probe obs + join tap): the build-subtree keys go
            # in FIRST — omitting them zip-shifted every value onto the
            # wrong key and the drifting capacities recompiled forever
            obs_keys.extend(bobs_keys)
            pargs, pfn = _chain_single(node.inputs[0], sig, obs_keys)
            fanout = join.options.fanout_capacity
            kb = len(bargs)

            def f(*a, _fn=pfn, _bfn=bfn, _join=join, _impl=impl,
                  _fanout=fanout, _kb=kb):
                xb, berrs, bobs = _bfn(*a[:_kb])
                bs = _join.build(xb)
                ierr = jnp.asarray(bs.error, jnp.int32)
                if _impl.startswith("packed"):
                    ierr = ierr | (bs.pack_bits > 30).astype(jnp.int32)
                if _impl == "packed_u":
                    ierr = ierr | (bs.num_groups !=
                                   bs.num_active).astype(jnp.int32)
                x, errs, obs = _fn(*a[_kb:])
                out, bs2 = _join.probe(bs, x, _fanout, _impl)
                return out, berrs + errs + (ierr, bs2.error), \
                    bobs + obs
            # distinguish the join-OUTPUT tap from the probe side's
            # last tap: without this entry their slice-stripped sigs
            # are IDENTICAL (the join appends its entries before
            # recursing into the probe chain), the observations
            # collided, the probe filter got sliced to the join's
            # output size, and every run overflowed into eager
            sig.append(("joinout",))
            f = _obs_tap(sig, obs_keys, f)
            return bargs + pargs, f

        # BOOTSTRAP form: run the build subplan as its own program; the
        # recovery fetch doubles as the probe-impl decision, cached for
        # the inline form on later runs
        bkey = ("fusedbuild3", tuple(bsig))
        from .nodes import checked_jit
        bjit = cached_stage(bkey, lambda: checked_jit(
            lambda *a: bfn(*a)))
        build_in, berrs, bobs = bjit(*bargs)
        fetched = jax.device_get(list(berrs) + list(bobs))
        global _PLAN_DIRTY
        for k, v in zip(bobs_keys, fetched[len(berrs):]):
            _PLAN_OBS[k] = int(np.asarray(v))
            _PLAN_DIRTY = True
        if any(int(np.asarray(v)) for v in fetched[:len(berrs)]):
            # a nested join-fanout / group-table overflow in the build
            # subtree: its batch content is truncated garbage
            raise _FallBack("build-side deferred check fired")
        jb = node.join
        bs, impl = node._build_recover(build_in)
        if node.join is jb and build_in.capacity < (1 << 26):
            # no overflow recovery rewrote the stages: the decision is
            # reproducible in-program -> enable the inline form
            _PLAN_IMPL[ikey] = impl
            _PLAN_DIRTY = True
        sig.append(("hashjoin", plan_sig(node.join.options), impl,
                    tuple(bsig)))
        sig.append(("slice", "form", "boot", build_in.capacity))

        pargs, pfn = _chain_single(node.inputs[0], sig, obs_keys)
        join = node.join
        fanout = join.options.fanout_capacity
        k = len(pargs)

        def f(*a, _fn=pfn, _join=join, _impl=impl, _fanout=fanout, _k=k):
            x, errs, obs = _fn(*a[:_k])
            out, bs2 = _join.probe(a[_k], x, _fanout, _impl)
            return out, errs + (bs2.error,), obs
        sig.append(("joinout",))   # see the inline form's comment
        f = _obs_tap(sig, obs_keys, f)
        return pargs + [bs], f

    if isinstance(node, N.AggregateNode):
        if node.ha is None or getattr(node, "_dist", None) is not None:
            raise _Unsupported("scalar/dist aggregate")
        if getattr(node.options, "segment_keys", ()):
            raise _Unsupported("segmented aggregate")
        args, fn = _chain_single(node.inputs[0], sig, obs_keys)
        sig.append(("aggregate", plan_sig(node.options.aggregates),
                    tuple(node.options.keys), node._max_groups))
        ha = node.ha

        def f(*a, _fn=fn, _ha=ha):
            x, errs, obs = _fn(*a)
            st = _ha.consume(_ha.init_state(), x, None, None, True)
            out = _ha.finalize(st)
            return out, errs + (st[0].error,), obs
        return args, f

    if isinstance(node, N.OrderByNode):
        args, fn = _chain_single(node.inputs[0], sig, obs_keys)
        limit = getattr(node, "_limit", None)
        sig.append(("order_by", plan_sig(node.options.sort_keys),
                    node.options.null_placement, limit))
        pure = node._make_topk(limit) if limit else node._pure_run

        def f(*a, _fn=fn, _p=pure):
            x, errs, obs = _fn(*a)
            return _p(x), errs, obs
        return args, f

    if isinstance(node, N.FetchNode):
        args, fn = _chain_single(node.inputs[0], sig, obs_keys)
        off = int(node.options.offset)
        cnt = int(node.options.count)
        sig.append(("fetch", off, cnt))
        from ..core import datatype as dt
        from ..core.array import Array
        from ..ops.selection import take_batch

        def f(*a, _fn=fn, _o=off, _c=cnt):
            x, errs, obs = _fn(*a)
            idx = jnp.minimum(
                jnp.arange(x.capacity, dtype=jnp.int32) + _o,
                x.capacity - 1)
            n = jnp.clip(jnp.asarray(x.length, jnp.int32) - _o, 0, _c)
            return take_batch(x, Array(dt.int32, idx, None, length=n)), \
                errs, obs
        return args, f

    raise _Unsupported(type(node).__name__)




def _prefix(node, ctx: _Ctx, sig: list):
    """Pure per-morsel segment: returns (src_batches, extra_args,
    fn(batch, *extra) -> (Batch, errs))."""
    from . import nodes as N
    from .nodes import plan_sig

    if isinstance(node, N.TableSourceNode):
        t = node.table
        if not isinstance(t, Table) or not t.batches:
            raise _Unsupported("non-device or empty source")
        sig.append(("src", t.schema,
                    tuple(b.capacity for b in t.batches)))
        return list(t.batches), [], lambda b: (b, ())

    if isinstance(node, (N.FilterNode, N.ProjectNode)):
        srcs, extra, fn = _prefix(node.inputs[0], ctx, sig)
        sig.append(node._sig)      # includes project output names
        pure = node._pure

        def f(b, *ex, _fn=fn, _p=pure):
            x, errs = _fn(b, *ex)
            return _p(x), errs
        return srcs, extra, f

    if isinstance(node, N.HashJoinNode):
        if getattr(node, "_dist", None) is not None:
            raise _Unsupported("dist join")
        if node.join.join_type not in ("inner", "left outer",
                                       "left semi", "left anti"):
            raise _Unsupported(f"join type {node.join.join_type}")
        from .spill import spill_budget_bytes
        if spill_budget_bytes(node.join.options) is not None:
            raise _Unsupported("spill-budgeted join")
        # BUILD PHASE: run the build subplan as its own fused plan
        build_batches = _execute(node.inputs[1], ctx)
        if not build_batches:
            from .nodes import empty_batch
            build_in = empty_batch(node.inputs[1].output_schema())
        elif len(build_batches) == 1:
            build_in = build_batches[0]
        else:
            from ..ops.concat import concat_batches
            build_in = concat_batches(build_batches)
        bs, impl = node._build_recover(build_in)
        sig.append(("hashjoin", plan_sig(node.join.options), impl,
                    build_in.capacity))

        srcs, extra, fn = _prefix(node.inputs[0], ctx, sig)
        join = node.join
        fanout = join.options.fanout_capacity
        k = len(extra)

        def f(b, *ex, _fn=fn, _join=join, _impl=impl, _fanout=fanout,
              _k=k):
            x, errs = _fn(b, *ex[:_k])
            out, bs2 = _join.probe(ex[_k], x, _fanout, _impl)
            return out, errs + (bs2.error,)
        return srcs, extra + [bs], f

    raise _Unsupported(type(node).__name__)


def _run_pure(srcs, extra, fn, sig, ctx: _Ctx) -> List[Batch]:
    """Stream every source morsel through the compiled segment; defer
    the per-morsel error scalars."""
    from .nodes import cached_stage, checked_jit
    key = ("fusedseg", tuple(sig))
    jfn = cached_stage(key, lambda: checked_jit(
        lambda b, *ex: fn(b, *ex)))
    out = []
    for i, b in enumerate(srcs):
        x, errs = jfn(b, *extra)
        ctx.errors.extend(errs)
        out.append(x.with_index(i))
    return out


def _execute(node, ctx: _Ctx) -> List[Batch]:
    """Run a (sub)plan fused; returns its output batches with every
    data-dependent check deferred into ctx.errors."""
    from . import nodes as N
    from .nodes import cached_stage, checked_jit, plan_sig

    if isinstance(node, N.AggregateNode):
        if node.ha is None or getattr(node, "_dist", None) is not None:
            raise _Unsupported("scalar/dist aggregate")
        if getattr(node.options, "segment_keys", ()):
            raise _Unsupported("segmented aggregate")
        sig: list = []
        srcs, extra, fn = _prefix(node.inputs[0], ctx, sig)
        ha = node.ha
        key = ("fusedagg", tuple(sig), plan_sig(node.options.aggregates),
               tuple(node.options.keys), node._max_groups)

        def consume(st, b, *ex, first):
            x, errs = fn(b, *ex)
            st2 = ha.consume(st, x, None, None, first)
            return st2, errs

        # `first` must be static: two cached wrappers
        cjit_first = cached_stage(key + ("first",), lambda: checked_jit(
            lambda st, b, *ex: consume(st, b, *ex, first=True)))
        cjit_rest = cached_stage(key + ("rest",), lambda: checked_jit(
            lambda st, b, *ex: consume(st, b, *ex, first=False)))
        st = ha.init_state()
        for i, b in enumerate(srcs):
            st, errs = (cjit_first if i == 0 else cjit_rest)(
                st, b, *extra)
            ctx.errors.extend(errs)
        ctx.errors.append(st[0].error)
        from ..ops.grouper import SlotStrings
        for agg, ast in zip(ha._aggregators, st[1]):
            if hasattr(agg, "error_flag"):
                ctx.errors.append(agg.error_flag(ast))
        for u in (st[2] or ()):
            if isinstance(u, SlotStrings):
                ctx.errors.append(u.error)
        fjit = cached_stage(key + ("fin",),
                            lambda: checked_jit(ha.finalize))
        return [fjit(st).with_index(0)]

    if isinstance(node, N.OrderByNode):
        limit = getattr(node, "_limit", None)
        inner = _execute(node.inputs[0], ctx)
        if not inner:
            return []
        from .nodes import plan_sig as _ps
        okey = ("fusedsort", _ps(node.options.sort_keys),
                node.options.null_placement, limit,
                tuple(b.capacity for b in inner), inner[0].schema)
        if limit:
            topk = node._make_topk(limit)
            if len(inner) == 1:
                jfn = cached_stage(okey, lambda: checked_jit(topk))
                return [jfn(inner[0]).with_index(0)]
            from ..ops.concat import concat_batches

            def fold(best, b, _t=topk):
                return _t(concat_batches([best, b]))
            best = cached_stage(okey + ("seed",),
                                lambda: checked_jit(topk))(inner[0])
            for b in inner[1:]:
                fkey = okey + ("fold", best.capacity, b.capacity)
                best = cached_stage(fkey,
                                    lambda: checked_jit(fold))(best, b)
            return [best.with_index(0)]
        if len(inner) > 1:
            from ..ops.concat import concat_batches
            big = concat_batches(inner)
        else:
            big = inner[0]
        jfn = cached_stage(okey, lambda: checked_jit(node._pure_run))
        return [jfn(big).with_index(0)]

    if isinstance(node, N.FetchNode):
        inner = _execute(node.inputs[0], ctx)
        if len(inner) != 1:
            raise _Unsupported("multi-batch fetch")
        off = int(node.options.offset)
        cnt = int(node.options.count)
        from ..core import datatype as dt
        from ..core.array import Array
        from ..ops.selection import take_batch

        def sl(x, _o=off, _c=cnt):
            idx = jnp.minimum(
                jnp.arange(x.capacity, dtype=jnp.int32) + _o,
                x.capacity - 1)
            n = jnp.clip(jnp.asarray(x.length, jnp.int32) - _o, 0, _c)
            return take_batch(x, Array(dt.int32, idx, None, length=n))

        key = ("fusedfetch", off, cnt, inner[0].schema,
               inner[0].capacity)
        return [cached_stage(key, lambda: checked_jit(sl))(
            inner[0]).with_index(0)]

    # pure chain all the way down
    sig = []
    srcs, extra, fn = _prefix(node, ctx, sig)
    return _run_pure(srcs, extra, fn, sig, ctx)


def try_fused_to_table(decl) -> Optional[Table]:
    """Fused execution, or None when the plan shape is unsupported or a
    deferred check fired (caller falls back to the eager driver).

    Strategy: for fully single-morsel plans the ENTIRE spine (probes,
    aggregate consume+finalize, top-k, fetch) compiles into one program
    (fewest chained executions — the relay penalizes long program
    chains); multi-morsel plans take the streaming form (state-threaded
    folds, still zero per-batch host syncs)."""
    from .nodes import cached_stage, checked_jit
    _load_plan_store()
    node = decl._build()
    try:
        sig1: list = []
        obs_keys: list = []
        args, fn1 = _chain_single(node, sig1, obs_keys)
        key = ("fusedplan", tuple(sig1))
        jfn = cached_stage(key, lambda: checked_jit(lambda *a: fn1(*a)))
        out, errs, obs = jfn(*args)
        ne = len(errs)
        fetch = list(errs) + list(obs) + [out.length]
        vals = [int(np.asarray(v)) for v in jax.device_get(fetch)]
        # adaptive capacities: record each shrinking stage's live length
        # so the NEXT run's spine compiles with tight static slices
        global _PLAN_DIRTY
        for k, v in zip(obs_keys, vals[ne:ne + len(obs)]):
            if _PLAN_OBS.get(k) != v:
                _PLAN_OBS[k] = v
                _PLAN_DIRTY = True
        _save_plan_store()
        if any(vals[:ne]):
            if os.environ.get("ARROW_TPU_FUSE_DEBUG"):
                fired = [i for i, v in enumerate(vals[:ne]) if v]
                print(f"[fuse] deferred checks fired at {fired} of "
                      f"{ne}; falling back eager", flush=True)
            return None
        t = Table(node.output_schema(), [out] if vals[-1] > 0 else [])
        from ..utils.tracing import metrics
        metrics.record(f"plan:{decl.factory_name}", t.num_rows, 0.0)
        return t
    except _FallBack:
        return None
    except _Unsupported:
        pass
    ctx = _Ctx()
    try:
        batches = _execute(node, ctx)
    except _FallBack:
        return None
    except _Unsupported:
        return None
    lengths = [b.length for b in batches]
    vals = [int(np.asarray(v)) for v in
            jax.device_get(list(ctx.errors) + lengths)]
    ne = len(ctx.errors)
    if any(vals[:ne]):
        return None     # deferred overflow: eager driver re-runs
    out = [b for b, n in zip(batches, vals[ne:]) if n > 0]
    t = Table(node.output_schema(), out)
    from ..utils.tracing import metrics
    metrics.record(f"plan:{decl.factory_name}", t.num_rows, 0.0)
    return t
