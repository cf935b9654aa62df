"""Bijective u32 plane packing of fixed-width columns.

Rationale (measured on v5e, tools/probe_prims2.py, round 4): XLA 1D
gathers serialize per INDEX (~110-142M indices/s regardless of table
size), but a row-gather from a (rows, W) matrix moves W words per index
at nearly the same index rate (W=4 still runs at ~78M rows/s = 312M
elem/s). Materialization paths that gather several columns through the
same indices (join outputs, wide takes) therefore pack all fixed-width
columns into ONE (rows, W) uint32 matrix, gather rows once, and unpack.

The packing is exactly invertible (unlike ops/bits.value_lanes32, which
canonicalizes NaNs for key equality): every storage bit round-trips.
Validity bitmaps pack as bit-planes, 32 columns per extra u32 lane.

Reference contrast: the reference's ExecBatchBuilder gathers column by
column (``compute/light_array_internal.h:376``) because CPU caches make
per-column strided access cheap; on TPU the per-index serialization
makes row-major the right layout for random access.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core import datatype as dt
from ..core.array import Array
from .bits import join_u32, split_u64, supports_exact_f64

__all__ = ["plane_width", "can_pack", "pack_spec", "pack_columns",
           "unpack_columns"]


def _storage_lanes(a: Array) -> Optional[List[jax.Array]]:
    """Bijective uint32 lanes of a column's storage, or None if the type
    doesn't plane-pack (varlen/nested)."""
    t = a.type
    v = a.values
    if isinstance(t, dt.DictionaryType):
        return [v.astype(jnp.int32).view(jnp.uint32)]
    if t.is_varlen or t.is_nested:
        return None
    if isinstance(t, dt.BoolType):
        return [v.astype(jnp.uint32)]
    if t.is_floating:
        if t.bits == 64:
            if supports_exact_f64():
                bits = jax.lax.bitcast_convert_type(v, jnp.uint64)
                return list(split_u64(bits))
            # TPU: the device's own double-float representation —
            # exactly invertible for device-resident values (bits.py)
            hi = v.astype(jnp.float32)
            lo = (v - hi.astype(jnp.float64)).astype(jnp.float32)
            return [jax.lax.bitcast_convert_type(hi, jnp.uint32),
                    jax.lax.bitcast_convert_type(lo, jnp.uint32)]
        if t.bits == 16:
            return [jax.lax.bitcast_convert_type(v, jnp.uint16).astype(
                jnp.uint32)]
        return [jax.lax.bitcast_convert_type(v, jnp.uint32)]
    if isinstance(t, dt.DecimalType) and t.wide:
        return list(split_u64(v[:, 1])) + list(split_u64(v[:, 0]))
    if t.is_integer or t.is_temporal or isinstance(t, dt.DecimalType):
        if t.bit_width == 64:
            return list(split_u64(v))
        if t.is_signed_integer or t.is_temporal or \
                isinstance(t, dt.DecimalType):
            return [v.astype(jnp.int32).view(jnp.uint32)]
        return [v.astype(jnp.uint32)]
    return None


def _storage_from_lanes(lanes: List[jax.Array], t: dt.DataType,
                        np_dtype) -> jax.Array:
    if isinstance(t, dt.DictionaryType):
        return lanes[0].view(jnp.int32).astype(np_dtype)
    if isinstance(t, dt.BoolType):
        return lanes[0] != 0
    if t.is_floating:
        if t.bits == 64:
            if supports_exact_f64():
                bits = join_u32(lanes[0], lanes[1])
                return jax.lax.bitcast_convert_type(bits, jnp.float64)
            hi = jax.lax.bitcast_convert_type(lanes[0], jnp.float32)
            lo = jax.lax.bitcast_convert_type(lanes[1], jnp.float32)
            return hi.astype(jnp.float64) + lo.astype(jnp.float64)
        if t.bits == 16:
            return jax.lax.bitcast_convert_type(
                lanes[0].astype(jnp.uint16), jnp.float16)
        return jax.lax.bitcast_convert_type(lanes[0], np_dtype)
    from ..core import datatype as _ddt
    if isinstance(t, _ddt.DecimalType) and t.wide:
        hi = join_u32(lanes[0], lanes[1]).astype(jnp.int64)
        lo = join_u32(lanes[2], lanes[3]).astype(jnp.int64)
        return jnp.stack([lo, hi], axis=1)
    if t.bit_width == 64:
        return join_u32(lanes[0], lanes[1]).astype(np_dtype)
    if t.is_signed_integer or t.is_temporal or isinstance(t, dt.DecimalType):
        return lanes[0].view(jnp.int32).astype(np_dtype)
    return lanes[0].astype(np_dtype)


def plane_width(t: dt.DataType) -> Optional[int]:
    """Number of u32 lanes a column of type t packs into (None: cannot)."""
    if isinstance(t, dt.DictionaryType):
        return 1
    if t.is_varlen or t.is_nested:
        return None
    if isinstance(t, dt.BoolType):
        return 1
    if t.is_floating:
        return 2 if t.bits == 64 else 1
    if isinstance(t, dt.DecimalType):
        return 4 if t.wide else 2
    if t.is_integer or t.is_temporal:
        return 2 if t.bit_width == 64 else 1
    return None


def can_pack(types: Sequence[dt.DataType]) -> bool:
    return all(plane_width(t) is not None for t in types)


def pack_spec(cols: Sequence[Array]) -> tuple:
    """The static spec ``pack_columns`` would produce, without packing."""
    return tuple((a.type, plane_width(a.type), a.validity is not None)
                 for a in cols)


def pack_columns(cols: Sequence[Array]) -> Tuple[jax.Array, tuple]:
    """Pack columns into ((cap, W) uint32, spec). All columns must share
    one capacity and satisfy ``plane_width``. Validity bitmaps pack as
    bit-planes appended after the value lanes (32 columns per lane)."""
    assert cols, "pack_columns needs at least one column"
    cap = cols[0].capacity
    lanes: List[jax.Array] = []
    spec = []
    vbits: List[jax.Array] = []   # per-column validity (or None)
    for a in cols:
        ls = _storage_lanes(a)
        assert ls is not None, a.type
        spec.append((a.type, len(ls), a.validity is not None))
        lanes.extend(ls)
        vbits.append(a.validity)
    nv = sum(1 for v in vbits if v is not None)
    vplanes = (nv + 31) // 32
    bit = 0
    plane = jnp.zeros((cap,), jnp.uint32) if vplanes else None
    for v in vbits:
        if v is None:
            continue
        plane = plane | (v.astype(jnp.uint32) << jnp.uint32(bit % 32))
        bit += 1
        if bit % 32 == 0:
            lanes.append(plane)
            plane = jnp.zeros((cap,), jnp.uint32)
    if vplanes and bit % 32 != 0:
        lanes.append(plane)
    return jnp.stack(lanes, axis=1), tuple(spec)


def unpack_columns(mat: jax.Array, spec: tuple, length,
                   dictionaries: Optional[Sequence] = None,
                   extra_valid: Optional[jax.Array] = None) -> List[Array]:
    """Inverse of pack_columns over a (rows, W) gathered matrix.
    ``extra_valid`` ANDs into every column's validity (join null
    extension); columns without a packed validity get it as their
    validity when provided."""
    out: List[Array] = []
    j = 0
    nv = sum(1 for (_, _, hv) in spec if hv)
    vstart = sum(w for (_, w, _) in spec)
    bit = 0
    for i, (t, w, has_valid) in enumerate(spec):
        lanes = [mat[:, j + k] for k in range(w)]
        j += w
        from ..core import datatype as _dt
        np_dtype = t.storage_np
        vals = _storage_from_lanes(lanes, t, np_dtype)
        validity = None
        if has_valid:
            plane = mat[:, vstart + bit // 32]
            validity = ((plane >> jnp.uint32(bit % 32)) &
                        jnp.uint32(1)) != 0
            bit += 1
        if extra_valid is not None:
            validity = extra_valid if validity is None else \
                (validity & extra_valid)
        d = dictionaries[i] if dictionaries is not None else None
        out.append(Array(t, vals, validity, dictionary=d, length=length))
    return out
