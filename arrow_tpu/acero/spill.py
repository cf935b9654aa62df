"""Spill-to-disk external sort for pipeline breakers.

The reference acknowledges its own spill gap
(``acero/aggregate_internal.h:297-302`` — "spilling is not yet
implemented"); this module goes past parity for the breaker where HBM
pressure bites first: ``order_by``. When the accumulated device bytes
exceed a budget, the node switches to an EXTERNAL SORT:

  * each batch is sorted on device (one jitted sort per capacity bucket)
    and written as a sorted *run* to an ATB file (the native mmap
    columnar format, ``native/arrow_tpu_native.cc``) — HBM never holds
    more than one batch;
  * finalize streams the runs back as morsels through the bounded-memory
    k-way ``streaming_sorted_merge`` (acero/nodes.py), so peak device
    memory during the merge is ~(runs x morsel) rows.

Budget: ``OrderByNodeOptions.spill_bytes`` if set, else the
``ARROW_TPU_SPILL_BYTES`` env var, else unbounded (no spill).

Supported column layouts: fixed-width (numeric/bool/temporal/decimal
storage) and varlen (string/binary), with validity. Nested / dictionary /
REE columns fall back to the in-memory path.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from typing import Iterator, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import datatype as dt
from ..core.array import Array
from ..core.batch import Batch
from ..core.schema import Schema

__all__ = ["spill_budget_bytes", "spill_supported", "batch_device_bytes",
           "SpillSorter", "write_run", "read_run"]


def spill_budget_bytes(options=None) -> Optional[int]:
    v = getattr(options, "spill_bytes", None)
    if v is not None:
        return int(v)
    env = os.environ.get("ARROW_TPU_SPILL_BYTES")
    return int(env) if env else None


def spill_supported(schema: Schema) -> bool:
    for f in schema.fields:
        t = f.type
        if t.is_varlen:
            continue
        if (t.is_nested or isinstance(t, (dt.DictionaryType,
                                          dt.RunEndEncodedType,
                                          dt.FixedSizeBinaryType))):
            return False
    return True


def batch_device_bytes(b: Batch) -> int:
    total = 0
    for leaf in jax.tree_util.tree_leaves(b):
        if hasattr(leaf, "nbytes"):
            total += int(leaf.nbytes)
    return total


def write_run(path: str, b: Batch) -> None:
    """Device batch -> one ATB run file (live prefix only)."""
    from .. import native
    n = int(np.asarray(jax.device_get(b.length)))
    cols = {}
    for i in range(b.num_columns):
        a = b.column(i)
        name = b.schema.names[i]
        if a.type.is_varlen:
            off = np.asarray(jax.device_get(a.offsets))[:n + 1]
            used = int(off[-1]) if n else 0
            data = np.asarray(jax.device_get(a.values))[:used]
            col = {"data": data, "offsets": off.astype(np.int32)}
        else:
            col = {"data": np.asarray(jax.device_get(a.values))[:n]}
        if a.validity is not None:
            col["validity"] = np.asarray(jax.device_get(a.validity))[:n]
        cols[name] = col
    native.write_atb(path, cols, n)


def read_run(path: str, schema: Schema,
             morsel_rows: int = 1 << 16) -> Iterator[Batch]:
    """Stream one ATB run back as device batches of <= morsel_rows."""
    from .. import native
    from ..core.interop import pad_capacity
    cols, nrows = native.read_atb(path)
    start = 0
    idx = 0
    while start < nrows or (nrows == 0 and idx == 0):
        n = min(morsel_rows, nrows - start)
        cap = pad_capacity(max(n, 1))
        arrays: List[Array] = []
        for f in schema.fields:
            c = cols[f.name]
            validity = None
            if "validity" in c:
                v = np.zeros((cap,), np.bool_)
                v[:n] = c["validity"][start:start + n]
                validity = jnp.asarray(v)
            if f.type.is_varlen:
                off = c["offsets"][start:start + n + 1].astype(np.int64)
                base = int(off[0]) if n else 0
                used = int(off[-1]) - base if n else 0
                bcap = pad_capacity(max(used, 1))
                data = np.zeros((bcap,), np.uint8)
                data[:used] = c["data"][base:base + used]
                offs = np.zeros((cap + 1,), np.int32)
                offs[:n + 1] = (off - base).astype(np.int32)
                offs[n + 1:] = used
                arrays.append(Array(f.type, jnp.asarray(data), validity,
                                    offsets=jnp.asarray(offs),
                                    length=np.int32(n)))
            else:
                src = c["data"][start:start + n]
                buf = np.zeros((cap,), src.dtype)
                buf[:n] = src
                arrays.append(Array(f.type, jnp.asarray(buf), validity,
                                    length=np.int32(n)))
        yield Batch(schema, arrays, np.int32(n), idx)
        idx += 1
        start += n
        if nrows == 0:
            break


def write_run_masked(path: str, b: Batch, mask: np.ndarray,
                     host_cols=None) -> int:
    """Write the mask-selected rows of a batch as one ATB run; returns
    the row count. `host_cols` optionally carries the batch's columns
    already fetched to host (one device_get for a K-way split)."""
    from .. import native
    n = int(mask.sum())
    cols = {}
    for i in range(b.num_columns):
        a = b.column(i)
        name = b.schema.names[i]
        if host_cols is not None:
            values, validity, offsets = host_cols[i]
        else:
            values = np.asarray(jax.device_get(a.values))
            validity = None if a.validity is None else \
                np.asarray(jax.device_get(a.validity))
            offsets = None if a.offsets is None else \
                np.asarray(jax.device_get(a.offsets))
        if a.type.is_varlen:
            lens = (offsets[1:] - offsets[:-1])[mask].astype(np.int64)
            off = np.zeros((n + 1,), np.int64)
            off[1:] = np.cumsum(lens)
            starts = offsets[:-1][mask].astype(np.int64)
            total = int(off[-1])
            # vectorized ragged gather: source byte index per output
            # byte = repeat(start - out_start, len) + arange
            src = np.repeat(starts - off[:-1], lens) + np.arange(
                total, dtype=np.int64)
            data = values[src] if total else np.empty((0,), np.uint8)
            col = {"data": data, "offsets": off.astype(np.int32)}
        else:
            col = {"data": values[:mask.shape[0]][mask]}
        if validity is not None:
            col["validity"] = validity[:mask.shape[0]][mask]
        cols[name] = col
    native.write_atb(path, cols, n)
    return n


class GracePartitioner:
    """Hash-partition a stream of batches into K on-disk ATB file groups
    (one side of a Grace hash join — ``spill to disk by join-key hash,
    then join partition-by-partition``)."""

    def __init__(self, schema: Schema, K: int, tag: str, base_dir: str):
        self.schema = schema
        self.K = K
        self._dir = os.path.join(base_dir, tag)
        os.makedirs(self._dir, exist_ok=True)
        self.files: List[List[str]] = [[] for _ in range(K)]
        self.rows = [0] * K
        self._seq = 0

    def add(self, b: Batch, pids: np.ndarray, n: int) -> None:
        """pids: host int32 partition per row (junk past n ignored)."""
        host_cols = []
        for i in range(b.num_columns):
            a = b.column(i)
            host_cols.append((
                np.asarray(jax.device_get(a.values)),
                None if a.validity is None else
                np.asarray(jax.device_get(a.validity)),
                None if a.offsets is None else
                np.asarray(jax.device_get(a.offsets))))
        in_range = np.arange(pids.shape[0]) < n
        for p in range(self.K):
            mask = in_range & (pids == p)
            if not mask.any():
                continue
            path = os.path.join(self._dir, f"p{p}_{self._seq}.atb")
            self.rows[p] += write_run_masked(path, b, mask, host_cols)
            self.files[p].append(path)
        self._seq += 1

    def read_partition(self, p: int,
                       morsel_rows: int = 1 << 16) -> Iterator[Batch]:
        for path in self.files[p]:
            yield from read_run(path, self.schema, morsel_rows)


_SEQ = "__arrow_tpu_seq"


class SpillSorter:
    """Per-node external-sort state: add sorted runs, then merge.

    STABILITY: the in-memory sort is stable (iota tiebreak in
    ``_composite_sort_perm``), so the external path must be too — every
    row carries its global arrival position in a trailing ``__seq``
    column; the device run sort is stable (preserves it within ties) and
    the k-way merge breaks cross-run ties on it, so output tie order
    equals the non-spill path's exactly. The column is dropped at
    emission."""

    def __init__(self, schema: Schema, sort_keys,
                 null_placement: str, morsel_rows: int = 1 << 16):
        from ..core.schema import Field
        self.schema = schema
        self._spill_schema = Schema(tuple(
            list(schema.fields) + [Field(_SEQ, dt.int64, False)]))
        self._keys = list(sort_keys)
        self._npl = null_placement
        self._morsel = morsel_rows
        self._dir = tempfile.mkdtemp(prefix="arrow_tpu_spill_")
        self._runs: List[str] = []
        self._next_seq = 0
        self._sort_cache: dict = {}

    def _sorted_with_seq(self, b: Batch) -> Batch:
        from ..ops.selection import take_batch
        from ..ops.sorting import _composite_sort_perm
        keys, npl, sschema = self._keys, self._npl, self._spill_schema
        orders = [k.order for k in keys]

        def run(bb: Batch, base):
            cap = bb.capacity
            seq = Array(dt.int64, base + jax.lax.broadcasted_iota(
                jnp.int64, (cap, 1), 0).reshape((cap,)), None,
                length=bb.length)
            full = Batch(sschema, list(bb.arrays) + [seq], bb.length)
            perm = _composite_sort_perm(
                [full.column(k.name) for k in keys], orders, npl, cap,
                full.length)
            return take_batch(full, Array(
                dt.int32, perm.astype(jnp.int32), None, length=full.length))

        fn = self._sort_cache.get(b.capacity)
        if fn is None:
            fn = jax.jit(run)
            self._sort_cache[b.capacity] = fn
        n = int(np.asarray(jax.device_get(b.length)))
        out = fn(b, np.int64(self._next_seq))
        self._next_seq += n
        return out

    def add(self, b: Batch) -> None:
        path = os.path.join(self._dir, f"run{len(self._runs)}.atb")
        write_run(path, self._sorted_with_seq(b))
        self._runs.append(path)

    def finish(self) -> Iterator[Batch]:
        from ..ops.sorting import SortKey
        from .nodes import streaming_sorted_merge
        try:
            if not self._runs:
                return
            its = [read_run(p, self._spill_schema, self._morsel)
                   for p in self._runs]
            merge_keys = self._keys + [SortKey(_SEQ, "ascending")]
            names = [f.name for f in self.schema.fields]
            for b in streaming_sorted_merge(its, self._spill_schema,
                                            merge_keys, self._npl):
                yield b.select(names)
        finally:
            self.close()

    def close(self) -> None:
        shutil.rmtree(self._dir, ignore_errors=True)

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
