"""Declaration-based plan construction + staged execution.

Reference: ``acero/exec_plan.h:389`` (Declaration), ``exec_plan.cc:647``
(DeclarationToTable), the node factory registry (``exec_plan.h:353``).

TPU-native engine design (SURVEY.md §7 "Engine = staged, not
push-threaded"): Acero's thread-pool push dataflow exists because CPUs need
explicit concurrency; on TPU the idiomatic engine is a **host-side driver
iterating a stream of device batches through jitted pipeline stages** —
XLA's async dispatch overlaps host orchestration with device compute, and
pipeline-breaker nodes (aggregate/sort/join-build) accumulate device-side
state. Each node exposes ``batches() -> Iterator[Batch]`` (pull-based; the
push/pull distinction dissolves when stages are pure functions).

Deferred errors (e.g. grouper overflow) surface at materialization.
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Optional, Sequence

import jax
import numpy as np

from ..core.batch import Batch, Table
from ..core.schema import Schema
from . import nodes as _nodes
from .options import ExecNodeOptions

__all__ = ["Declaration", "ExecNode", "register_node_factory",
           "declaration_to_table"]


_FACTORIES = _nodes.FACTORIES
register_node_factory = _nodes.register_node_factory


class Declaration:
    """An unbuilt node graph (public plan API)."""

    def __init__(self, factory_name: str,
                 options: Optional[ExecNodeOptions] = None,
                 inputs: Sequence["Declaration"] = ()):
        self.factory_name = factory_name
        self.options = options
        self.inputs = list(inputs)

    @staticmethod
    def from_sequence(decls: Sequence["Declaration"]) -> "Declaration":
        """Chain single-input declarations (Declaration::Sequence analog)."""
        out = None
        for d in decls:
            if out is not None:
                d = Declaration(d.factory_name, d.options, [out] + d.inputs)
            out = d
        return out

    def _build(self) -> "_nodes.ExecNode":
        import os
        decl = self
        if not os.environ.get("ARROW_TPU_NO_PRUNE"):
            decl = prune_columns(self)
        decl = fuse_topk(decl)
        return decl._build_raw()

    def _build_raw(self) -> "_nodes.ExecNode":
        try:
            cls = _FACTORIES[self.factory_name]
        except KeyError:
            raise KeyError(
                f"no exec node factory named '{self.factory_name}'; "
                f"have {sorted(_FACTORIES)}") from None
        inputs = [d._build_raw() for d in self.inputs]
        return cls(self.options, inputs)

    # ---- materialization ----------------------------------------------------
    def to_batches(self, stop_token=None) -> Iterator[Batch]:
        node = self._build()
        if stop_token is None:
            return node.batches()

        def gen():
            for b in node.batches():
                stop_token.raise_if_stopped()
                yield b
        return gen()

    def _auto_lazy(self) -> bool:
        """True when every source is a single-batch device table — the
        single-morsel plan shape where the fully-async lazy driver is
        strictly better (no compaction or inline checks needed)."""
        from ..core.batch import Table as _T
        if self.factory_name == "table_source":
            t = getattr(self.options, "table", None)
            if isinstance(t, _T):
                return len(t.batches) <= 1
            return False
        if not self.inputs:
            return False
        if getattr(self.options, "dist", None) is not None:
            return False
        return all(d._auto_lazy() for d in self.inputs)

    def to_table(self, stop_token=None, lazy=None) -> Table:
        import os
        from . import nodes as _n
        # phase-fused execution for linear single-morsel plans (fuse.py):
        # one program per pipeline segment, one device_get for all
        # deferred errors; None -> unsupported shape or a fired overflow,
        # both fall through to the standard driver
        if os.environ.get("ARROW_TPU_FUSE_PLAN", "1") != "0" and \
                not _n.LAZY.active and stop_token is None:
            from .fuse import try_fused_to_table
            t = try_fused_to_table(self)
            if t is not None:
                return t
        env = os.environ.get("ARROW_TPU_LAZY_PLAN")
        if lazy is None:
            # measured on v5e through the axon relay (round 4): the
            # fully-async lazy chain ran ~1.6x SLOWER than eager+
            # gated-compaction on the Q3 plan (long uninterrupted
            # dispatch chains sit badly with the relay), so lazy is
            # explicit opt-in rather than auto
            lazy = env == "1"
        if lazy and not _n.LAZY.active:
            # fully-async run: zero per-batch host syncs; every deferred
            # overflow scalar fetched in ONE device_get at the end. A
            # fired check re-runs eagerly (lazy runs are pure).
            _n.LAZY.active = True
            _n.LAZY.deferred = []
            try:
                t = self._to_table_eager(stop_token)
                if _n.LAZY.deferred:
                    import numpy as _np
                    vals = jax.device_get(
                        [s for _, s in _n.LAZY.deferred])
                    fired = any(int(_np.asarray(v)) for v in vals)
                else:
                    fired = False
            finally:
                _n.LAZY.active = False
                _n.LAZY.deferred = []
            if not fired:
                return t
            # deferred overflow: the eager driver's per-batch recovery
            # (fanout doubling, group-table growth) handles it
        return self._to_table_eager(stop_token)

    def _to_table_eager(self, stop_token=None) -> Table:
        from ..utils.tracing import trace_span
        node = self._build()
        batches = []
        schema = node.output_schema()
        with trace_span(f"plan:{self.factory_name}"):
            for b in node.batches():
                if stop_token is not None:
                    stop_token.raise_if_stopped()
                batches.append(b)
        # drop empty batches (but keep schema)
        out = [b for b in batches if len(b) > 0]
        from ..utils.tracing import metrics
        t = Table(schema, out)
        metrics.record(f"plan:{self.factory_name}", t.num_rows, 0.0)
        return t

    def to_batches_prefetched(self, prefetch: int = 2,
                              stop_token=None) -> Iterator[Batch]:
        """Bounded-readahead materialization: a producer thread drives the
        plan while the consumer lags at most ``prefetch`` batches — the
        pull-engine form of Acero's byte-threshold backpressure
        (``options.h:369`` BackpressureOptions; pause == queue full).
        XLA's async dispatch overlaps the producer's device work with the
        consumer's host work."""
        import queue as _q
        import threading
        q: "_q.Queue" = _q.Queue(maxsize=max(prefetch, 1))
        DONE, ERR = object(), object()

        def produce():
            try:
                for b in self.to_batches(stop_token=stop_token):
                    q.put(b)
                q.put(DONE)
            except BaseException as e:  # propagate to consumer
                q.put((ERR, e))

        t = threading.Thread(target=produce, daemon=True)
        t.start()

        def gen():
            while True:
                item = q.get()
                if item is DONE:
                    return
                if isinstance(item, tuple) and item and item[0] is ERR:
                    raise item[1]
                yield item
        return gen()

    def to_string(self, indent: int = 0) -> str:
        """Plan dump (ExecPlan::ToString analog)."""
        pad = "  " * indent
        opts = type(self.options).__name__ if self.options is not None \
            else ""
        lines = [f"{pad}{self.factory_name}" + (f" [{opts}]" if opts
                                                else "")]
        for i in self.inputs:
            lines.append(i.to_string(indent + 1))
        return "\n".join(lines)

    def to_pyarrow(self):
        return self.to_table().to_pyarrow()

    def to_reader(self):
        return self.to_batches()

    def __repr__(self):
        inner = f"{self.factory_name}"
        if self.inputs:
            inner += "(" + ", ".join(repr(i) for i in self.inputs) + ")"
        return inner


def declaration_to_table(decl: Declaration) -> Table:
    return decl.to_table()


# ---- projection pushdown ------------------------------------------------------
#
# The reference prunes columns in the dataset scanner (ScanOptions
# projection) and leaves plan-level pruning to the planner; on TPU unused
# columns are far more expensive to drag through kernels (a var-len column
# rides every filter/take as a byte-pool gather), so the engine prunes
# plans itself: sources emit only the columns some ancestor reads.
# ``needed=None`` means "everything" (unknown consumer — safe default).

def fuse_topk(decl: Declaration) -> Declaration:
    """Rewrite ``fetch(offset, count)`` over ``order_by`` into an
    order_by with an internal row limit (offset+count): the node then
    streams top-k in bounded memory instead of accumulating the whole
    input (``order_by_node.cc`` + ``fetch_node.cc`` run unfused in the
    reference; acero's SelectK declaration is the same fusion by hand).
    The fetch node stays (it applies the offset)."""
    inputs = [fuse_topk(d) for d in decl.inputs]
    d = decl if all(a is b for a, b in zip(inputs, decl.inputs)) \
        else Declaration(decl.factory_name, decl.options, inputs)
    if (d.factory_name == "fetch" and d.inputs
            and d.inputs[0].factory_name == "order_by"
            and getattr(d.options, "count", -1) >= 0
            and getattr(d.options, "offset", 0) >= 0):
        import copy
        ob = d.inputs[0]
        o2 = copy.copy(ob.options)
        o2._limit = d.options.offset + d.options.count
        d = Declaration(d.factory_name, d.options,
                        [Declaration("order_by", o2, ob.inputs)]
                        + d.inputs[1:])
    return d


def _expr_fields(e) -> set:
    return set(e.field_names()) if e is not None else set()


def prune_columns(decl: Declaration,
                  needed: Optional[frozenset] = None) -> Declaration:
    f = decl.factory_name
    o = decl.options

    def rebuild(options, new_inputs):
        if options is o and all(a is b for a, b in
                                zip(new_inputs, decl.inputs)):
            return decl
        return Declaration(f, options, new_inputs)

    if f in ("table_source",):
        if needed is None:
            return decl
        table = o.table
        names = [c for c in table.column_names if c in needed]
        if len(names) == len(table.column_names):
            return decl
        from .options import TableSourceNodeOptions
        return rebuild(TableSourceNodeOptions(
            table.select(names), o.max_batch_rows), [])

    if f == "filter":
        child_needed = None if needed is None else \
            frozenset(needed | _expr_fields(o.filter_expression))
        return rebuild(o, [prune_columns(decl.inputs[0], child_needed)])

    if f == "project":
        opts2 = o
        if needed is not None:
            names = o.names or [repr(e) for e in o.expressions]
            keep = [i for i, n in enumerate(names) if n in needed]
            if len(keep) < len(names) and keep:
                from .options import ProjectNodeOptions
                opts2 = ProjectNodeOptions(
                    [o.expressions[i] for i in keep],
                    [names[i] for i in keep])
        child_needed = frozenset().union(
            *[_expr_fields(e) for e in opts2.expressions]) \
            if opts2.expressions else frozenset()
        return rebuild(opts2,
                       [prune_columns(decl.inputs[0],
                                      frozenset(child_needed))])

    if f == "aggregate":
        child_needed = set(o.keys) | set(getattr(o, "segment_keys", ()))
        for spec in o.aggregates:
            child_needed |= set(spec.targets)
        return rebuild(o, [prune_columns(decl.inputs[0],
                                         frozenset(child_needed))])

    if f == "hashjoin":
        lneed = None if o.left_output is None else \
            frozenset(set(o.left_keys) | set(o.left_output))
        rneed = None if o.right_output is None else \
            frozenset(set(o.right_keys) | set(o.right_output))
        return rebuild(o, [prune_columns(decl.inputs[0], lneed),
                           prune_columns(decl.inputs[1], rneed)])

    if f in ("order_by", "sorted_merge"):
        child_needed = None if needed is None else frozenset(
            needed | {k.name for k in o.sort_keys})
        return rebuild(o, [prune_columns(i, child_needed)
                           for i in decl.inputs])

    if f in ("fetch", "union"):
        return rebuild(o, [prune_columns(i, needed) for i in decl.inputs])

    # unknown / schema-opaque nodes (scan, tpch_gen, pivot_longer, asof,
    # sources): children keep everything
    return rebuild(o, [prune_columns(i, None) for i in decl.inputs])


ExecNode = _nodes.ExecNode
