"""Batch (device RecordBatch) and Table (host-side chunked container).

Reference: ``cpp/src/arrow/record_batch.h:41`` / ``table.h:43`` and Acero's
ExecBatch (``compute/exec.h:174``). Our Batch plays both roles: it is the
unit flowing through the staged execution engine (ExecBatch) and the public
record-batch container. Like ExecBatch it has one shared dynamic ``length``;
columns all share it. An optional ``index`` tags position in an ordered
stream (ExecBatch::index, ``compute/exec.h:221``).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import datatype as dt
from .array import Array, array as make_array, row_mask
from .schema import Field, Schema

__all__ = ["Batch", "Table", "batch", "table"]


@jax.tree_util.register_pytree_node_class
class Batch:
    """An ordered set of equal-length Arrays + shared dynamic length."""

    __slots__ = ("schema", "arrays", "length", "index", "_compacted")

    def __init__(self, schema: Schema, arrays: Sequence[Array], length=None,
                 index: int = -1):
        self.schema = schema
        self.arrays = tuple(arrays)
        if length is None:
            length = self.arrays[0].length if self.arrays else 0
        self.length = length
        self.index = index

    # ---- pytree -------------------------------------------------------------
    def tree_flatten(self):
        return (self.arrays, self.length), (self.schema, self.index)

    @classmethod
    def tree_unflatten(cls, aux, children):
        arrays, length = children
        obj = cls.__new__(cls)
        obj.schema = aux[0]
        obj.index = aux[1]
        obj.arrays = tuple(arrays)
        obj.length = length
        return obj

    # ---- accessors ----------------------------------------------------------
    @property
    def num_columns(self) -> int:
        return len(self.arrays)

    @property
    def column_names(self) -> Tuple[str, ...]:
        return self.schema.names

    @property
    def capacity(self) -> int:
        if not self.arrays:
            return 0
        return self.arrays[0].capacity

    @property
    def has_static_length(self) -> bool:
        return isinstance(self.length, (int, np.integer))

    def __len__(self) -> int:
        if self.has_static_length:
            return int(self.length)
        return int(jax.device_get(self.length))

    def column(self, key: Union[int, str]) -> Array:
        if isinstance(key, int):
            a = self.arrays[key]
        else:
            i = self.schema.get_field_index(key)
            if i < 0:
                raise KeyError(key)
            a = self.arrays[i]
        return a.with_length(self.length)

    def __getitem__(self, key) -> Array:
        return self.column(key)

    def row_mask(self) -> jax.Array:
        return row_mask(self.capacity, self.length)

    # ---- manipulation ---------------------------------------------------------
    def select(self, names: Sequence[str]) -> "Batch":
        idxs = [self.schema.get_field_index(n) for n in names]
        return Batch(self.schema.select(names),
                     [self.arrays[i] for i in idxs], self.length, self.index)

    def set_column(self, name: str, arr: Array,
                   nullable: bool = True) -> "Batch":
        i = self.schema.get_field_index(name)
        if i >= 0:
            fields = list(self.schema.fields)
            fields[i] = Field(name, arr.type, nullable)
            arrays = list(self.arrays)
            arrays[i] = arr
            return Batch(Schema(tuple(fields)), arrays, self.length,
                         self.index)
        return Batch(self.schema.append(Field(name, arr.type, nullable)),
                     list(self.arrays) + [arr], self.length, self.index)

    def with_length(self, length) -> "Batch":
        return Batch(self.schema, self.arrays, length, self.index)

    def with_index(self, index: int) -> "Batch":
        return Batch(self.schema, self.arrays, self.length, index)

    def device_put(self, sharding=None) -> "Batch":
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), self)

    def __repr__(self) -> str:
        ln = self.length if self.has_static_length else "<traced>"
        cols = ", ".join(f"{f.name}: {f.type}" for f in self.schema)
        return f"Batch[{ln}/{self.capacity}]({cols})"

    # ---- host conversion --------------------------------------------------
    def to_pyarrow(self):
        from .interop import batch_to_pyarrow
        return batch_to_pyarrow(self)

    def to_pydict(self):
        return self.to_pyarrow().to_pydict()

    @staticmethod
    def from_pyarrow(rb, capacity: Optional[int] = None) -> "Batch":
        from .interop import batch_from_pyarrow
        return batch_from_pyarrow(rb, capacity=capacity)


class Table:
    """Host-side container of Batches sharing a schema (Arrow's Table /
    ChunkedArray analog). Not a pytree — plans consume/emit streams of
    Batches; Table is for user-facing materialization."""

    def __init__(self, schema: Schema, batches: List[Batch]):
        self.schema = schema
        self.batches = list(batches)

    @property
    def num_rows(self) -> int:
        return sum(len(b) for b in self.batches)

    @property
    def num_columns(self) -> int:
        return len(self.schema)

    @property
    def column_names(self):
        return self.schema.names

    def to_pyarrow(self):
        import pyarrow as pa
        from .interop import batch_to_pyarrow
        if not self.batches:
            return self.schema.to_pyarrow().empty_table()
        return pa.Table.from_batches(
            [batch_to_pyarrow(b) for b in self.batches],
            schema=self.schema.to_pyarrow())

    def to_pydict(self):
        return self.to_pyarrow().to_pydict()

    @staticmethod
    def from_pyarrow(pa_table, max_rows_per_batch: Optional[int] = None,
                     capacity: Optional[int] = None) -> "Table":
        from .interop import table_from_pyarrow
        return table_from_pyarrow(pa_table, max_rows_per_batch, capacity)

    # ---- pyarrow.Table-parity query methods (route through acero, like
    # pyarrow's Table.group_by/join/sort_by do: python/pyarrow/acero.py) ---
    def group_by(self, keys, aggregations=None, max_groups: int = 1 << 16,
                 use_threads: bool = True):
        """pyarrow parity (``table.pxi:6465``): ``group_by(keys)`` returns
        a TableGroupBy for ``.aggregate([...])``; passing ``aggregations``
        directly is the one-shot shorthand."""
        if isinstance(keys, str):
            keys = [keys]
        if aggregations is None:
            return TableGroupBy(self, list(keys), max_groups=max_groups)
        from ..acero import group_by as _gb
        aggs = [(a[1], a[0]) if isinstance(a, tuple) and len(a) == 2
                and not callable(a[0]) else a for a in aggregations]
        return _gb(self, keys, aggs, max_groups=max_groups)

    def sort_by(self, sorting) -> "Table":
        from ..acero import sort_by as _sb
        if isinstance(sorting, str):
            sorting = [(sorting, "ascending")]
        return _sb(self, sorting)

    def filter(self, expression) -> "Table":
        from ..acero import filter_table as _ft
        return _ft(self, expression)

    def join(self, right: "Table", keys, right_keys=None,
             join_type: str = "left outer",
             left_suffix: str = "", right_suffix: str = "",
             **kw) -> "Table":
        from ..acero import (Declaration, HashJoinNodeOptions,
                             TableSourceNodeOptions)
        if isinstance(keys, str):
            keys = [keys]
        right_keys = right_keys or keys
        if isinstance(right_keys, str):
            right_keys = [right_keys]
        decl = Declaration("hashjoin", HashJoinNodeOptions(
            join_type, keys, right_keys,
            output_suffix_for_left=left_suffix,
            output_suffix_for_right=right_suffix, **kw), [
            Declaration("table_source", TableSourceNodeOptions(self)),
            Declaration("table_source", TableSourceNodeOptions(right)),
        ])
        return decl.to_table()

    # ---- structural methods (pyarrow.Table parity) -------------------------
    def select(self, names: Sequence[str]) -> "Table":
        return Table(self.schema.select(names),
                     [b.select(names) for b in self.batches])

    def drop_columns(self, names) -> "Table":
        if isinstance(names, str):
            names = [names]
        keep = [n for n in self.schema.names if n not in set(names)]
        return self.select(keep)

    def rename_columns(self, names: Sequence[str]) -> "Table":
        if len(names) != len(self.schema):
            raise ValueError("rename_columns: wrong name count")
        fields = tuple(Field(n, f.type, f.nullable)
                       for n, f in zip(names, self.schema.fields))
        schema = Schema(fields)
        return Table(schema, [Batch(schema, b.arrays, b.length, b.index)
                              for b in self.batches])

    def column(self, key):
        """Host-side column accessor (concatenates chunks via pyarrow)."""
        return self.to_pyarrow().column(
            key if isinstance(key, str) else self.schema.names[key])

    def __getitem__(self, key):
        return self.column(key)

    def slice(self, offset: int = 0, length: Optional[int] = None
              ) -> "Table":
        from ..acero import Declaration, FetchNodeOptions, \
            TableSourceNodeOptions
        count = self.num_rows - offset if length is None else length
        return Declaration.from_sequence([
            Declaration("table_source", TableSourceNodeOptions(self)),
            Declaration("fetch", FetchNodeOptions(offset, count)),
        ]).to_table()

    def _one_batch(self) -> Batch:
        """All rows as ONE device batch (ChunkResolver's role is played by
        device concat: chunks are independent batches; cross-chunk ops
        combine first)."""
        if not self.batches:
            return Batch(self.schema, [], 0)
        if len(self.batches) == 1:
            return self.batches[0]
        from ..ops.concat import concat_batches
        return concat_batches(self.batches)

    @staticmethod
    def _as_column(values, capacity: int) -> Array:
        """Coerce host data / pyarrow / Array to a device Array of the
        given capacity."""
        if isinstance(values, Array):
            if values.capacity == capacity:
                return values
            values = values.to_pyarrow()
        import pyarrow as pa
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        if not isinstance(values, pa.Array):
            values = pa.array(values)
        return make_array(values, capacity=capacity)

    def take(self, indices) -> "Table":
        """Row gather ON DEVICE through the take kernel
        (``vector_selection_take_internal.cc:549``); chunks combine first
        (the ChunkResolver step)."""
        b = self._one_batch()
        idx = self._as_column(indices, max(
            int(idx_len) if (idx_len := _host_len(indices)) is not None
            else b.capacity, 1))
        from ..ops.selection import take_batch
        return Table(self.schema, [take_batch(b, idx)])

    def append_column(self, name: str, values) -> "Table":
        """pyarrow Table.append_column parity (table.pxi) — device column
        construction, no host round-trip of existing columns."""
        b = self._one_batch()
        col = self._as_column(values, max(b.capacity, 1))
        schema = Schema(tuple(self.schema.fields) +
                        (Field(name, col.type, True),))
        return Table(schema, [Batch(schema, list(b.arrays) + [col],
                                    b.length, b.index)])

    def set_column(self, i: int, name: str, values) -> "Table":
        """Replace column i (device; pyarrow Table.set_column parity)."""
        b = self._one_batch()
        col = self._as_column(values, max(b.capacity, 1))
        fields = list(self.schema.fields)
        fields[i] = Field(name, col.type, True)
        schema = Schema(tuple(fields))
        arrays = list(b.arrays)
        arrays[i] = col
        return Table(schema, [Batch(schema, arrays, b.length, b.index)])

    def cast(self, target_schema) -> "Table":
        """Column-wise cast through the registry cast kernels."""
        from ..compute.registry import call_function
        from ..ops.scalar_cast import CastOptions
        from .schema import Schema as _S
        fields = target_schema.fields if isinstance(target_schema, _S) \
            else None
        if fields is None:   # pyarrow schema
            import pyarrow as pa
            return Table.from_pyarrow(
                self.to_pyarrow().cast(target_schema))
        batches = []
        for b in self.batches:
            arrays = [call_function("cast", [b.column(i)],
                                    CastOptions(f.type))
                      for i, f in enumerate(fields)]
            batches.append(Batch(target_schema, arrays, b.length, b.index))
        return Table(target_schema, batches)

    def drop_null(self) -> "Table":
        from ..compute.registry import call_function
        return Table(self.schema,
                     [call_function("drop_null", [b])
                      for b in self.batches])

    def combine_chunks(self) -> "Table":
        """One batch holding all rows (Table.combine_chunks parity)."""
        if len(self.batches) <= 1:
            return self
        from ..ops.concat import concat_batches
        return Table(self.schema, [concat_batches(self.batches)])

    def equals(self, other) -> bool:
        o = other.to_pyarrow() if hasattr(other, "to_pyarrow") else other
        return self.to_pyarrow().equals(o)

    def __repr__(self) -> str:
        return (f"Table(rows={self.num_rows}, batches={len(self.batches)}, "
                f"cols={list(self.schema.names)})")


def _host_len(values):
    """Row count of host-side/pyarrow/Array inputs, None if unknown."""
    try:
        if isinstance(values, Array):
            return values.__len__()
        return len(values)
    except Exception:
        return None


class TableGroupBy:
    """pyarrow.TableGroupBy parity: holds (table, keys), ``aggregate``
    runs the grouped aggregation (``table.pxi`` TableGroupBy.aggregate).

    Aggregation entries are pyarrow-shaped: ``(column, "fn")``,
    ``(column, "fn", options)``, ``([], "count_all")``, or
    ``(("key","value"), "pivot_wider", opts)`` for multi-target
    aggregates."""

    def __init__(self, table: "Table", keys, max_groups: int = 1 << 16):
        self.table = table
        self.keys = list(keys)
        self.max_groups = max_groups

    def aggregate(self, aggregations) -> "Table":
        from ..acero import group_by as _gb
        from ..ops.hash_aggregate import AggregateSpec
        specs = []
        for a in aggregations:
            if isinstance(a, AggregateSpec):
                specs.append(a)
                continue
            target, fn = a[0], a[1]
            options = a[2] if len(a) > 2 else None
            if isinstance(target, list) and not target:
                target = None
            elif isinstance(target, (tuple, list)):
                target = tuple(target)
            specs.append(AggregateSpec(fn, target, options))
        return _gb(self.table, self.keys, specs,
                   max_groups=self.max_groups)


def batch(data: Dict[str, object], schema_: Optional[Schema] = None,
          capacity: Optional[int] = None) -> Batch:
    """Build a Batch from a dict of columns (python lists / numpy / Arrays)."""
    names = list(data.keys())
    arrays = []
    length = None
    for n in names:
        t = schema_.field(n).type if schema_ is not None else None
        a = make_array(data[n], type=t, capacity=capacity)
        arrays.append(a)
        if length is None:
            length = a.length
    fields = tuple(Field(n, a.type, True) for n, a in zip(names, arrays))
    return Batch(Schema(fields), arrays, length)


def table(data, capacity: Optional[int] = None) -> Table:
    """Build a single-batch Table from a dict or pyarrow Table."""
    import pyarrow as pa
    if isinstance(data, pa.Table):
        return Table.from_pyarrow(data, capacity=capacity)
    b = batch(data, capacity=capacity)
    return Table(b.schema, [b])
