"""pyarrow <-> device-array interop.

This is the engine's boundary layer (the role the C data interface plays in
the reference, ``cpp/src/arrow/c/bridge.h``): host Arrow buffers are staged
into padded device buffers, and device results are exported back as genuine
pyarrow arrays so the test oracle can compare bit-for-bit.

Packed validity bitmaps (Arrow) <-> bool bytemasks (device) conversion lives
here and only here.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import datatype as dt
from .array import Array
from .batch import Batch, Table
from .schema import Schema

__all__ = [
    "array_from_pyarrow", "array_to_pyarrow",
    "batch_from_pyarrow", "batch_to_pyarrow",
    "table_from_pyarrow",
    "pad_capacity",
]

# Capacity bucketing: pad to one of these row counts to bound the number of
# distinct compiled shapes (recompilation buckets — SURVEY.md §7 hard part 1).
_BUCKETS = [1 << k for k in range(4, 31)]

# device dictionary values buffer -> the pyarrow dictionary it was
# ingested from (host-boundary kernels read it back without a fetch)
import weakref
_HOST_DICTS: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def host_dictionary(dict_array: Array):
    """The pyarrow array a dictionary Array was ingested from, or None
    (then callers fetch via array_to_pyarrow)."""
    if dict_array is None:
        return None
    try:
        return _HOST_DICTS.get(dict_array.values)
    except TypeError:
        return None


def pad_capacity(n: int, capacity: Optional[int] = None) -> int:
    if capacity is not None:
        if capacity < n:
            raise ValueError(f"capacity {capacity} < length {n}")
        return capacity
    n = max(n, 1)
    for b in _BUCKETS:
        if b >= n:
            return b
    return n


def _unpack_validity(pa_arr, n: int) -> Optional[np.ndarray]:
    """Return bool bytemask or None if all-valid."""
    if pa_arr.null_count == 0:
        return None
    buf = pa_arr.buffers()[0]
    if buf is None:
        return None
    bits = np.frombuffer(buf, dtype=np.uint8)
    mask = np.unpackbits(bits, count=pa_arr.offset + n,
                         bitorder="little")[pa_arr.offset:]
    return mask.astype(np.bool_)


def _pack_validity(mask: np.ndarray):
    import pyarrow as pa
    return pa.py_buffer(np.packbits(mask, bitorder="little").tobytes())


def _primitive_values(pa_arr, t: dt.DataType, n: int) -> np.ndarray:
    """Extract the raw fixed-width values buffer as numpy (no null decoding)."""
    buf = pa_arr.buffers()[1]
    if isinstance(t, dt.BoolType):
        bits = np.frombuffer(buf, dtype=np.uint8)
        vals = np.unpackbits(bits, count=pa_arr.offset + n,
                             bitorder="little")[pa_arr.offset:]
        return vals.astype(np.bool_)
    if isinstance(t, dt.FixedSizeBinaryType):
        w = t.byte_width
        raw = np.frombuffer(buf, dtype=np.uint8)
        start = pa_arr.offset * w
        return raw[start:start + n * w].reshape(n, w)
    if isinstance(t, dt.DecimalType):
        # wire: 16 (decimal128) / 32 (decimal256) little-endian bytes
        # per value. Device storage (array/array_decimal.h:71 is the
        # wire layout; util/decimal.h:410 the int128 semantics):
        #   precision <= 18  -> ONE scaled int64 lane (always fits);
        #   precision  > 18  -> (n, 2) int64 limbs [lo bits, hi signed]
        # decimal256 values beyond +-2^127 scaled units raise (the
        # documented remaining contract).
        words = t.bits // 64
        raw = np.frombuffer(buf, dtype="<i8").reshape(-1, words)
        raw = raw[pa_arr.offset:pa_arr.offset + n]
        lo = raw[:, 0]
        mask = _unpack_validity(pa_arr, n)
        if t.wide:
            hi = raw[:, 1] if words > 1 else lo >> 63
            sign = hi >> 63             # expected words 2.. (-1 or 0)
            bad = np.zeros((n,), np.bool_)
            for w_i in range(2, words):
                bad |= raw[:, w_i] != sign
            if mask is not None:
                bad &= mask
            if bad.any():
                raise NotImplementedError(
                    f"decimal{t.bits}({t.precision},{t.scale}) value "
                    "exceeds the engine's 128-bit scaled-integer range "
                    "(+-2^127 scaled units)")
            out = np.empty((n, 2), np.int64)
            out[:, 0] = lo
            out[:, 1] = hi
            if mask is not None:
                out[~mask] = 0      # null slots may hold garbage
            return out
        sign = lo >> 63                 # expected upper words (-1 or 0)
        bad = np.zeros((n,), np.bool_)
        for w_i in range(1, words):
            bad |= raw[:, w_i] != sign
        if mask is not None:
            bad &= mask
        if bad.any():
            raise NotImplementedError(
                f"decimal{t.bits}({t.precision},{t.scale}) value exceeds "
                "the 64-bit scaled range; precision > 18 types use the "
                "two-limb representation")
        return np.ascontiguousarray(lo)
    npdt = t.storage_np
    raw = np.frombuffer(buf, dtype=npdt)
    return raw[pa_arr.offset:pa_arr.offset + n]


def array_from_pyarrow(pa_arr, capacity: Optional[int] = None,
                       byte_capacity: Optional[int] = None) -> Array:
    import pyarrow as pa

    if isinstance(pa_arr, pa.ChunkedArray):
        pa_arr = pa_arr.combine_chunks()
    if isinstance(pa_arr, pa.ExtensionArray):
        # extension array = storage layout + named type: convert storage,
        # rewrap with the ExtensionType (lossless round trip)
        ext_t = dt.from_pyarrow_type(pa_arr.type)
        inner = array_from_pyarrow(pa_arr.storage, capacity, byte_capacity)
        return Array(ext_t, inner.values, inner.validity,
                     offsets=inner.offsets, dictionary=inner.dictionary,
                     children=inner.children, length=len(pa_arr))
    import pyarrow.types as _pat
    if _pat.is_string_view(pa_arr.type):
        pa_arr = pa_arr.cast(pa.string())
    elif _pat.is_binary_view(pa_arr.type):
        pa_arr = pa_arr.cast(pa.binary())
    elif getattr(_pat, "is_list_view", lambda _: False)(pa_arr.type) or \
            getattr(_pat, "is_large_list_view",
                    lambda _: False)(pa_arr.type):
        # rebuild as a plain list: views may reorder/overlap child rows
        # and pyarrow's cast emits an n-entry offsets buffer (no
        # terminal) — flatten + explicit cumsum offsets is always valid
        import pyarrow.compute as _pc
        nv = len(pa_arr)
        lens = _pc.fill_null(_pc.list_value_length(pa_arr), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        off = np.zeros((nv + 1,), dtype=np.int32)
        np.cumsum(lens, out=off[1:])
        mask = pa.compute.is_null(pa_arr).to_numpy(zero_copy_only=False)
        pa_arr = pa.ListArray.from_arrays(
            pa.array(off, pa.int32()), _pc.list_flatten(pa_arr),
            mask=pa.array(mask))
    n = len(pa_arr)
    cap = pad_capacity(n, capacity)
    t = dt.from_pyarrow_type(pa_arr.type)
    validity_np = _unpack_validity(pa_arr, n)
    validity = None
    if validity_np is not None:
        v = np.zeros((cap,), dtype=np.bool_)
        v[:n] = validity_np
        validity = jnp.asarray(v)

    if isinstance(t, dt.DictionaryType):
        indices = pa_arr.indices
        dict_arr = array_from_pyarrow(pa_arr.dictionary)
        try:
            # host-boundary kernels (regex via RE2) need the dictionary
            # VALUES back on the host; remember the pyarrow original so
            # they skip a ~25-50ms relay fetch (weak: dies with the
            # device buffer)
            _HOST_DICTS[dict_arr.values] = pa_arr.dictionary
        except TypeError:
            pass
        idx_np = _primitive_values(indices, t.index_type, n)
        buf = np.zeros((cap,), dtype=t.index_type.storage_np)
        # null slots may hold garbage in pyarrow's indices buffer; zero them so
        # padded/null indices stay in-range for gathers.
        if validity_np is not None:
            idx_np = np.where(validity_np, idx_np, 0)
        buf[:n] = idx_np
        return Array(t, jnp.asarray(buf), validity, dictionary=dict_arr,
                     length=n)

    if t.is_varlen:
        if pa.types.is_large_string(pa_arr.type) or \
           pa.types.is_large_binary(pa_arr.type):
            pa_arr = pa_arr.cast(
                pa.string() if pa.types.is_large_string(pa_arr.type)
                else pa.binary())
        offsets_buf = pa_arr.buffers()[1]
        data_buf = pa_arr.buffers()[2]
        raw_off = np.frombuffer(offsets_buf, dtype=np.int32)
        off = raw_off[pa_arr.offset:pa_arr.offset + n + 1].astype(np.int32)
        base = off[0] if n >= 0 and len(off) else 0
        off = off - base
        nbytes = int(off[-1]) if len(off) else 0
        bcap = pad_capacity(max(nbytes, 1), byte_capacity)
        data = np.zeros((bcap,), dtype=np.uint8)
        if data_buf is not None and nbytes:
            raw = np.frombuffer(data_buf, dtype=np.uint8)
            data[:nbytes] = raw[base:base + nbytes]
        offsets = np.zeros((cap + 1,), dtype=np.int32)
        offsets[:n + 1] = off
        offsets[n + 1:] = off[-1] if len(off) else 0
        return Array(t, jnp.asarray(data), validity,
                     offsets=jnp.asarray(offsets), length=n)

    if isinstance(t, dt.FixedSizeListType):
        # fixed_size_list<T, k>: offsets synthesized as arange*k (see
        # datatype.FixedSizeListType) so list kernels apply unchanged
        k = t.list_size
        child = array_from_pyarrow(pa_arr.values.slice(pa_arr.offset * k,
                                                       n * k))
        offsets = np.full((cap + 1,), n * k, dtype=np.int32)
        offsets[:n + 1] = np.arange(n + 1, dtype=np.int32) * k
        return Array(t, jnp.zeros((0,), jnp.uint8), validity,
                     offsets=jnp.asarray(offsets), dictionary=child,
                     length=n)

    if isinstance(t, dt.ListType):
        # list<T> (and map<K,V>, a ListType subclass whose child is the
        # entries struct): offsets into CHILD ROWS; the child Array rides
        # in the `dictionary` child slot (one child slot serves
        # dictionary AND list layouts — they are mutually exclusive)
        import pyarrow as pa_mod
        if pa.types.is_large_list(pa_arr.type):
            pa_arr = pa_arr.cast(pa_mod.list_(pa_arr.type.value_type))
        raw_off = np.frombuffer(pa_arr.buffers()[1], dtype=np.int32)
        off = raw_off[pa_arr.offset:pa_arr.offset + n + 1].astype(np.int32)
        base = off[0] if len(off) else 0
        off = off - base
        child_pa = pa_arr.values
        if base or (len(off) and int(off[-1]) < len(child_pa)):
            child_pa = child_pa.slice(base, int(off[-1]))
        child = array_from_pyarrow(child_pa)
        offsets = np.zeros((cap + 1,), dtype=np.int32)
        offsets[:n + 1] = off
        offsets[n + 1:] = off[-1] if len(off) else 0
        return Array(t, jnp.zeros((0,), jnp.uint8), validity,
                     offsets=jnp.asarray(offsets), dictionary=child,
                     length=n)

    if isinstance(t, dt.UnionType):
        # union: int8 type codes in ``values``, dense value offsets in
        # ``offsets`` (sized cap+1 to match the varlen capacity
        # convention; the last slot is unused), children in ``children``.
        # Unions carry NO top-level validity (Columnar.rst union layout).
        codes_buf = np.frombuffer(pa_arr.buffers()[1], dtype=np.int8)
        codes = np.zeros((cap,), dtype=np.int8)
        codes[:n] = codes_buf[pa_arr.offset:pa_arr.offset + n]
        codes[n:] = t.type_codes[0] if t.type_codes else 0
        offsets = None
        if t.mode == "dense":
            off_buf = np.frombuffer(pa_arr.buffers()[2], dtype=np.int32)
            offsets = np.zeros((cap + 1,), dtype=np.int32)
            offsets[:n] = off_buf[pa_arr.offset:pa_arr.offset + n]
            offsets = jnp.asarray(offsets)
        children = tuple(array_from_pyarrow(pa_arr.field(i))
                         for i in range(pa_arr.type.num_fields))
        if t.mode == "sparse":
            children = tuple(
                array_from_pyarrow(pa_arr.field(i), capacity=cap)
                for i in range(pa_arr.type.num_fields))
        return Array(t, jnp.asarray(codes), None, offsets=offsets,
                     length=n, children=children)

    if isinstance(t, (dt.DayTimeIntervalType, dt.MonthDayNanoIntervalType)):
        # intervals are StructType subclasses (datatype.py): unpack the
        # packed (i32,i32[,i64]) records into component children
        packed = np.dtype([(nm, ft.storage_np) for nm, ft in t.fields])
        children = []
        rec = None
        if pa_arr.buffers()[1] is not None and n:
            raw = np.frombuffer(pa_arr.buffers()[1], dtype=packed)
            rec = raw[pa_arr.offset:pa_arr.offset + n]
        for nm, ft in t.fields:
            buf = np.zeros((cap,), dtype=ft.storage_np)
            if rec is not None:
                buf[:n] = rec[nm]
            children.append(Array(ft, jnp.asarray(buf), None, length=n))
        return Array(t, jnp.zeros((cap,), jnp.uint8), validity,
                     length=n, children=tuple(children))

    if isinstance(t, dt.StructType):
        # struct<...>: same-length children ride in the ``children`` slot;
        # ``values`` is a dummy (cap,) buffer carrying the capacity.
        # ``.field(i)`` (NOT .flatten()) keeps child validity independent of
        # the parent mask, matching ArrayData.child_data semantics
        # (reference ``array/data.h:85``).
        children = tuple(
            array_from_pyarrow(pa_arr.field(i), capacity=cap)
            for i in range(pa_arr.type.num_fields))
        return Array(t, jnp.zeros((cap,), jnp.uint8), validity,
                     length=n, children=children)

    if t.is_primitive:
        vals = _primitive_values(pa_arr, t, n)
        if isinstance(t, dt.FixedSizeBinaryType):
            buf = np.zeros((cap, t.byte_width), dtype=np.uint8)
            buf[:n] = vals
        elif isinstance(t, dt.DecimalType) and t.wide:
            buf = np.zeros((cap, 2), dtype=np.int64)
            buf[:n] = vals
        else:
            buf = np.zeros((cap,), dtype=t.storage_np)
            buf[:n] = vals
        return Array(t, jnp.asarray(buf), validity, length=n)

    raise NotImplementedError(f"array_from_pyarrow for {t}")


def array_to_pyarrow(arr: Array):
    import pyarrow as pa

    n = len(arr)
    t = arr.type
    if isinstance(t, dt.ExtensionType):
        storage = array_to_pyarrow(Array(
            t.storage, arr.values, arr.validity, offsets=arr.offsets,
            dictionary=arr.dictionary, children=arr.children,
            length=arr.length))
        if t.pa_type is not None:
            return pa.ExtensionArray.from_storage(t.pa_type, storage)
        return storage
    pa_type = dt.to_pyarrow_type(t)

    validity_buf = None
    null_count = 0
    if arr.validity is not None:
        v = np.asarray(jax.device_get(arr.validity))[:n]
        null_count = int((~v).sum())
        if null_count:
            validity_buf = _pack_validity(v)
        else:
            validity_buf = None

    if isinstance(t, dt.DictionaryType):
        idx = np.asarray(jax.device_get(arr.values))[:n]
        indices = pa.Array.from_buffers(
            dt.to_pyarrow_type(t.index_type), n,
            [validity_buf, pa.py_buffer(np.ascontiguousarray(idx).tobytes())],
            null_count=null_count if validity_buf else 0)
        dictionary = array_to_pyarrow(arr.dictionary)
        out = pa.DictionaryArray.from_arrays(indices, dictionary,
                                             ordered=t.ordered)
        if t.transparent:
            # ingest-encoded: decode back to the logical plain type
            return out.dictionary_decode()
        return out

    if t.is_varlen:
        off = np.asarray(jax.device_get(arr.offsets))[:n + 1].astype(np.int32)
        nbytes = int(off[-1]) if len(off) else 0
        if nbytes > arr.values.shape[0]:
            raise ValueError(
                f"varlen byte-pool overflow: rows span {nbytes} bytes but "
                f"the pool holds {arr.values.shape[0]} — a take/join fanout "
                f"repeated long rows beyond the static capacity; re-run "
                f"with a larger fanout/byte capacity")
        data = np.asarray(jax.device_get(arr.values))[:nbytes]
        return pa.Array.from_buffers(
            pa_type, n,
            [validity_buf, pa.py_buffer(off.tobytes()),
             pa.py_buffer(data.tobytes())],
            null_count=null_count if validity_buf else 0)

    if isinstance(t, dt.FixedSizeListType):
        off = np.asarray(jax.device_get(arr.offsets))[:n + 1].astype(
            np.int32)
        nchild = int(off[-1]) if len(off) else 0
        child = array_to_pyarrow(arr.dictionary.with_length(nchild))
        return pa.Array.from_buffers(
            pa_type, n, [validity_buf],
            null_count=null_count if validity_buf else 0, children=[child])

    if isinstance(t, dt.ListType):
        off = np.asarray(jax.device_get(arr.offsets))[:n + 1].astype(
            np.int32)
        nchild = int(off[-1]) if len(off) else 0
        child = array_to_pyarrow(arr.dictionary.with_length(nchild))
        if isinstance(t, dt.MapType):
            # the map's entries struct requires a non-nullable key field;
            # rebuild the child with the exact entries type
            entries = pa.struct([
                pa.field("key", dt.to_pyarrow_type(t.key_type),
                         nullable=False),
                pa.field("value", dt.to_pyarrow_type(t.item_type))])
            child = child.cast(entries)
        lists = pa.Array.from_buffers(
            pa_type, n, [validity_buf, pa.py_buffer(off.tobytes())],
            null_count=null_count if validity_buf else 0,
            children=[child])
        return lists

    if isinstance(t, dt.UnionType):
        codes = np.asarray(jax.device_get(arr.values))[:n].astype(np.int8)
        names = [nm for nm, _ in t.fields]
        if t.mode == "sparse":
            children = [array_to_pyarrow(c.with_length(n))
                        for c in (arr.children or ())]
            return pa.UnionArray.from_sparse(
                pa.array(codes, type=pa.int8()), children,
                field_names=names, type_codes=list(t.type_codes))
        off = np.asarray(jax.device_get(arr.offsets))[:n].astype(np.int32)
        children = [array_to_pyarrow(c) for c in (arr.children or ())]
        return pa.UnionArray.from_dense(
            pa.array(codes, type=pa.int8()),
            pa.array(off, type=pa.int32()), children,
            field_names=names, type_codes=list(t.type_codes))

    if isinstance(t, (dt.DayTimeIntervalType, dt.MonthDayNanoIntervalType)) \
            and pa.types.is_interval(pa_type):
        # pa_type degrades to a plain struct when pyarrow's python API
        # lacks the interval (see datatype.to_pyarrow_type) — that case
        # falls through to the StructType branch below
        packed = np.dtype([(nm, ft.storage_np) for nm, ft in t.fields])
        rec = np.zeros(n, dtype=packed)
        for (nm, _ft), c in zip(t.fields, arr.children or ()):
            rec[nm] = np.asarray(jax.device_get(c.values))[:n]
        return pa.Array.from_buffers(
            pa_type, n, [validity_buf, pa.py_buffer(rec.tobytes())],
            null_count=null_count if validity_buf else 0)

    if isinstance(t, dt.StructType):
        children = [array_to_pyarrow(c.with_length(n))
                    for c in (arr.children or ())]
        return pa.Array.from_buffers(
            pa_type, n, [validity_buf],
            null_count=null_count if validity_buf else 0,
            children=children)

    if isinstance(t, dt.BoolType):
        vals = np.asarray(jax.device_get(arr.values))[:n].astype(np.bool_)
        data_buf = pa.py_buffer(
            np.packbits(vals, bitorder="little").tobytes())
        return pa.Array.from_buffers(
            pa_type, n, [validity_buf, data_buf],
            null_count=null_count if validity_buf else 0)

    if isinstance(t, dt.FixedSizeBinaryType):
        vals = np.asarray(jax.device_get(arr.values))[:n]
        data_buf = pa.py_buffer(np.ascontiguousarray(vals).tobytes())
        return pa.Array.from_buffers(
            pa_type, n, [validity_buf, data_buf],
            null_count=null_count if validity_buf else 0)

    if isinstance(t, dt.DecimalType):
        vals = np.asarray(jax.device_get(arr.values))[:n].astype(
            np.int64, copy=False)
        words = t.bits // 64
        wide = np.empty((n, words), dtype="<i8")
        if t.wide:
            wide[:, 0] = vals[:, 0]
            hi = vals[:, 1]
            if words > 1:
                wide[:, 1] = hi
            for w_i in range(2, words):
                wide[:, w_i] = hi >> 63     # sign extension words
        else:
            wide[:, 0] = vals
            for w_i in range(1, words):
                wide[:, w_i] = vals >> 63   # sign extension words
        data_buf = pa.py_buffer(np.ascontiguousarray(wide).tobytes())
        return pa.Array.from_buffers(
            pa_type, n, [validity_buf, data_buf],
            null_count=null_count if validity_buf else 0)

    if t.is_primitive:
        vals = np.asarray(jax.device_get(arr.values))[:n]
        vals = vals.astype(t.storage_np, copy=False)
        data_buf = pa.py_buffer(np.ascontiguousarray(vals).tobytes())
        return pa.Array.from_buffers(
            pa_type, n, [validity_buf, data_buf],
            null_count=null_count if validity_buf else 0)

    raise NotImplementedError(f"array_to_pyarrow for {t}")


# Transparent dictionary ingest (round 5): low-cardinality plain
# string/binary columns dictionary-encode ON THE HOST at staging time,
# so on device the regex/filter/compare/group paths move i32 codes and
# tiny dictionaries instead of byte pools (the reference's string
# kernels prefer the same dictionary fast paths; SURVEY.md §7 "most
# kernels operate on dictionary-encoded or padded forms"). The column's
# LOGICAL type stays the plain value type: DictionaryType.transparent
# makes interop decode on export. Off: ARROW_TPU_INGEST_DICT=0.
_DICT_INGEST_MIN = int(__import__("os").environ.get(
    "ARROW_TPU_DICT_INGEST_MIN", str(1 << 16)))


def _dict_ingest_enabled() -> bool:
    import os
    return os.environ.get("ARROW_TPU_INGEST_DICT", "1") == "1"


def _dict_ingest_encode(tbl):
    """Dictionary-encode qualifying plain varlen columns of a pyarrow
    Table/RecordBatch. Returns (converted, frozenset(encoded names)).
    Applied ONCE per source (before morsel slicing) so every batch of a
    column shares one host-side encoding — codes are comparable across
    the whole stream."""
    import pyarrow as pa
    import pyarrow.compute as pc
    if not _dict_ingest_enabled():
        return tbl, frozenset()
    n = tbl.num_rows
    if n < _DICT_INGEST_MIN:
        return tbl, frozenset()
    is_table = isinstance(tbl, pa.Table)
    names = set()
    cols = [tbl.column(i) for i in range(tbl.num_columns)]
    fields = list(tbl.schema)
    for i, f in enumerate(fields):
        t = f.type
        if not (pa.types.is_string(t) or pa.types.is_binary(t) or
                pa.types.is_large_string(t) or
                pa.types.is_large_binary(t)):
            continue
        col = cols[i]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        try:
            enc = pc.dictionary_encode(col)
        except Exception:
            continue
        if isinstance(enc, pa.ChunkedArray):
            enc = enc.combine_chunks()
        nd = len(enc.dictionary)
        if nd == 0 or nd > min(n // 8, 1 << 16):
            continue
        cols[i] = enc
        fields[i] = pa.field(f.name, enc.type, f.nullable)
        names.add(f.name)
    if not names:
        return tbl, frozenset()
    sch = pa.schema(fields)
    out = pa.table(cols, schema=sch) if is_table else \
        pa.record_batch(cols, schema=sch)
    return out, frozenset(names)


def _mark_transparent_schema(schema: Schema, names) -> Schema:
    if not names:
        return schema
    from .schema import Field
    fields = []
    for f in schema.fields:
        if f.name in names and isinstance(f.type, dt.DictionaryType):
            f = Field(f.name, dataclasses.replace(f.type, transparent=True),
                      f.nullable)
        fields.append(f)
    return Schema(tuple(fields))


def batch_from_pyarrow(rb, capacity: Optional[int] = None,
                       _transparent=frozenset()) -> Batch:
    import pyarrow as pa
    if isinstance(rb, pa.Table):
        rb = rb.combine_chunks().to_batches()
        if len(rb) != 1:
            raise ValueError("use table_from_pyarrow for multi-batch tables")
        rb = rb[0]
    if not _transparent:
        rb, _transparent = _dict_ingest_encode(rb)
    cap = pad_capacity(rb.num_rows, capacity)
    arrays = [array_from_pyarrow(rb.column(i), capacity=cap)
              for i in range(rb.num_columns)]
    if _transparent:
        arrays = [
            Array(dataclasses.replace(a.type, transparent=True), a.values,
                  a.validity, offsets=a.offsets, dictionary=a.dictionary,
                  children=a.children, length=a.length)
            if rb.schema.field(i).name in _transparent and
            isinstance(a.type, dt.DictionaryType) else a
            for i, a in enumerate(arrays)]
    schema = _mark_transparent_schema(Schema.from_pyarrow(rb.schema),
                                      _transparent)
    return Batch(schema, arrays, rb.num_rows)


def batch_to_pyarrow(b: Batch):
    import pyarrow as pa
    n = len(b)
    cols = [array_to_pyarrow(b.column(i).with_length(n))
            for i in range(b.num_columns)]
    return pa.RecordBatch.from_arrays(cols, schema=b.schema.to_pyarrow())


# per-batch varlen byte-pool ceiling: device offsets are int32
# (``array/array_binary.h:179`` Large* types carry 64-bit offsets; on
# device the engine instead ENFORCES that every batch's pool fits 31
# bits and auto-splits oversized morsels at ingest — the documented
# chunking contract for >2 GB columns). Overridable for tests.
_MAX_POOL_BYTES = int(__import__("os").environ.get(
    "ARROW_TPU_MAX_POOL_BYTES", str((1 << 31) - (1 << 20))))


def _split_for_pools(rb, limit: int):
    """Split a record batch so every varlen column's byte pool fits
    ``limit`` bytes: one O(n) pass over per-row byte lengths (prefix
    sums from the offsets buffers), then greedy cuts at the last row
    that keeps every column under the limit."""
    import pyarrow as pa
    import pyarrow.compute as pc
    n = rb.num_rows
    cums = []
    for col in rb.columns:
        t = col.type
        if pa.types.is_string(t) or pa.types.is_binary(t) or \
                pa.types.is_large_string(t) or \
                pa.types.is_large_binary(t):
            lens = pc.binary_length(col).cast(pa.int64()).fill_null(0)
            cums.append(np.concatenate(
                [[0], np.cumsum(lens.to_numpy(zero_copy_only=False))]))
    if not cums or all(c[-1] <= limit for c in cums):
        return [rb]
    out = []
    start = 0
    while start < n:
        # furthest end where every column's bytes stay under the limit
        end = n
        for c in cums:
            e = int(np.searchsorted(c, c[start] + limit, side="right")) - 1
            end = min(end, e)
        if end <= start:
            end = start + 1   # single row over the limit: let interop
            #                   raise its capacity error downstream
        out.append(rb.slice(start, end - start))
        start = end
    return out


def table_from_pyarrow(pa_table, max_rows_per_batch: Optional[int] = None,
                       capacity: Optional[int] = None) -> Table:
    import pyarrow as pa
    if max_rows_per_batch is None:
        max_rows_per_batch = 1 << 15  # ExecPlan::kMaxBatchSize analog
    pa_table = pa_table.combine_chunks()
    # transparent dictionary ingest happens at TABLE level, before
    # morsel slicing: one encoding per column, codes comparable across
    # every batch of this source
    pa_table, transparent = _dict_ingest_encode(pa_table)
    has_varlen = any(
        pa.types.is_string(f.type) or pa.types.is_binary(f.type) or
        pa.types.is_large_string(f.type) or pa.types.is_large_binary(f.type)
        for f in pa_table.schema)
    batches: List[Batch] = []
    for rb in pa_table.to_batches(max_chunksize=max_rows_per_batch):
        pieces = _split_for_pools(rb, _MAX_POOL_BYTES) if has_varlen \
            else [rb]
        for piece in pieces:
            if piece.num_rows == 0:
                continue
            # rebase sliced offsets so interop sees offset-0 arrays
            if len(pieces) > 1:
                piece = pa.record_batch(
                    [pa.concat_arrays([c]) for c in piece.columns],
                    schema=piece.schema)
            batches.append(batch_from_pyarrow(
                piece, capacity=capacity, _transparent=transparent))
    if not batches:
        for rb in pa_table.to_batches(max_chunksize=max_rows_per_batch):
            batches.append(batch_from_pyarrow(
                rb, capacity=capacity, _transparent=transparent))
    return Table(_mark_transparent_schema(
        Schema.from_pyarrow(pa_table.schema), transparent), batches)
