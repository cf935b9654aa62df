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
        try:
            cls = _FACTORIES[self.factory_name]
        except KeyError:
            raise KeyError(
                f"no exec node factory named '{self.factory_name}'; "
                f"have {sorted(_FACTORIES)}") from None
        inputs = [d._build() for d in self.inputs]
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

    def to_table(self, stop_token=None) -> Table:
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


ExecNode = _nodes.ExecNode
