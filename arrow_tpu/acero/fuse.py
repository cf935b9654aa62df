"""Phase-fused execution for linear single-morsel plans.

The eager driver dispatches each node's programs separately and pays a
~25ms tunnel RTT per host synchronization (~12 per TPC-H Q3 run —
round-4 cProfile: 0.93s of a 0.96s Q3 run was device_get waits). For
plans whose sources are single-batch device tables, the whole pipeline
can instead run as a handful of fused programs:

  * each hash join's BUILD side (itself an arbitrary supported subplan)
    compiles into ONE program; its single host fetch doubles as the
    packed/unique probe-impl decision (HashJoinNode._build_recover);
  * the probe spine — source -> filters/projects -> probe(s) ->
    aggregate consume+finalize -> top-k -> fetch — compiles into ONE
    program with every deferred-error scalar returned alongside the
    result, fetched in ONE device_get.

Deferred overflow (join fanout, aggregate group table) falls back to
the standard eager driver, whose per-batch recovery paths are intact —
fused runs are pure, so the fallback is always safe.

This is the engine's whole-stage-codegen analog: Acero fuses pipeline
segments into tasks (``exec_plan.h:225`` push chains); under XLA the
fusion is literal — one compiled program per pipeline segment.
Unsupported shapes return None and the caller uses the normal driver.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.batch import Batch, Table


class _Unsupported(Exception):
    pass


def _single_batch(node) -> Batch:
    from . import nodes as N
    if not isinstance(node, N.TableSourceNode):
        raise _Unsupported(type(node).__name__)
    t = node.table if hasattr(node, "table") else None
    if t is None or not isinstance(t, Table) or len(t.batches) != 1:
        raise _Unsupported("multi-batch or non-device source")
    return t.batches[0]


def _chain(node, sig: list):
    """Returns (args: list, fn(*args) -> (Batch, errors tuple)).

    ``sig`` accumulates a hashable cache signature (node kinds, option
    signatures, static shapes, probe impl decisions)."""
    from . import nodes as N
    from .nodes import cached_stage, plan_sig

    if isinstance(node, N.TableSourceNode):
        b = _single_batch(node)
        sig.append(("src", b.schema, b.capacity))
        return [b], lambda b_: (b_, ())

    if isinstance(node, (N.FilterNode, N.ProjectNode)):
        args, fn = _chain(node.inputs[0], sig)
        sig.append((node.factory_name, plan_sig(
            getattr(node.options, "filter_expression", None) or
            tuple(getattr(node.options, "expressions", ())))))
        pure = node._pure

        def f(*a, _fn=fn, _p=pure):
            x, errs = _fn(*a)
            return _p(x), errs
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
        # BUILD PHASE: compile + run the build subplan as one program;
        # the recovery fetch doubles as the probe-impl decision
        bsig: list = []
        bargs, bfn = _chain(node.inputs[1], bsig)
        bkey = ("fusedbuild", tuple(bsig))
        from .nodes import checked_jit
        bjit = cached_stage(bkey, lambda: checked_jit(
            lambda *a: bfn(*a)[0]))
        build_in = bjit(*bargs)
        bs, impl = node._build_recover(build_in)
        sig.append(("hashjoin", plan_sig(node.join.options), impl,
                    tuple(bsig), build_in.capacity))

        pargs, pfn = _chain(node.inputs[0], sig)
        join = node.join
        fanout = join.options.fanout_capacity
        k = len(pargs)

        def f(*a, _fn=pfn, _join=join, _impl=impl, _fanout=fanout, _k=k):
            x, errs = _fn(*a[:_k])
            out, bs2 = _join.probe(a[_k], x, _fanout, _impl)
            return out, errs + (bs2.error,)
        return pargs + [bs], f

    if isinstance(node, N.AggregateNode):
        if node.ha is None or getattr(node, "_dist", None) is not None:
            raise _Unsupported("scalar/dist aggregate")
        if getattr(node.options, "segment_keys", ()):
            raise _Unsupported("segmented aggregate")
        args, fn = _chain(node.inputs[0], sig)
        sig.append(("aggregate", plan_sig(node.options.aggregates),
                    tuple(node.options.keys), node._max_groups))
        ha = node.ha

        def f(*a, _fn=fn, _ha=ha):
            x, errs = _fn(*a)
            st = _ha.consume(_ha.init_state(), x, None, None, True)
            out = _ha.finalize(st)
            return out, errs + (st[0].error,)
        return args, f

    if isinstance(node, N.OrderByNode):
        args, fn = _chain(node.inputs[0], sig)
        limit = getattr(node, "_limit", None)
        sig.append(("order_by", plan_sig(node.options.sort_keys),
                    node.options.null_placement, limit))
        pure = node._make_topk(limit) if limit else node._pure_run

        def f(*a, _fn=fn, _p=pure):
            x, errs = _fn(*a)
            return _p(x), errs
        return args, f

    if isinstance(node, N.FetchNode):
        args, fn = _chain(node.inputs[0], sig)
        off = int(node.options.offset)
        cnt = int(node.options.count)
        sig.append(("fetch", off, cnt))
        from ..core import datatype as dt
        from ..core.array import Array
        from ..ops.selection import take_batch

        def f(*a, _fn=fn, _o=off, _c=cnt):
            x, errs = _fn(*a)
            idx = jnp.minimum(
                jnp.arange(x.capacity, dtype=jnp.int32) + _o,
                x.capacity - 1)
            n = jnp.clip(jnp.asarray(x.length, jnp.int32) - _o, 0, _c)
            return take_batch(x, Array(dt.int32, idx, None, length=n)), \
                errs
        return args, f

    raise _Unsupported(type(node).__name__)


def try_fused_to_table(decl) -> Optional[Table]:
    """Fused execution, or None when the plan shape is unsupported or a
    deferred overflow fired (caller falls back to the eager driver)."""
    from . import nodes as N
    from .nodes import cached_stage
    node = decl._build()
    sig: list = []
    try:
        args, fn = _chain(node, sig)
    except _Unsupported:
        return None
    key = ("fusedplan", tuple(sig))
    from .nodes import checked_jit
    jfn = cached_stage(key, lambda: checked_jit(lambda *a: fn(*a)))
    out, errs = jfn(*args)
    fetch = list(errs) + [out.length]
    vals = [int(np.asarray(v)) for v in jax.device_get(fetch)]
    if any(vals[:-1]):
        return None     # overflow: eager driver re-runs with recovery
    n = vals[-1]
    schema = node.output_schema()
    t = Table(schema, [out] if n > 0 else [])
    from ..utils.tracing import metrics
    metrics.record(f"plan:{decl.factory_name}", t.num_rows, 0.0)
    return t
