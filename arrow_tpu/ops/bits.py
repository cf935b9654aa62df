"""TPU-safe bit-lane extraction for key normalization (hash/group/sort).

Platform facts (measured on TPU v5e via axon, 2026-08):
  * 64-bit bitcast-convert is NOT implemented by the TPU x64-rewrite pass
    (f64<->s64/u64/u32[2] all fail to compile); 32-bit bitcasts work.
  * 64-bit integer ELEMENTWISE arithmetic (add/shift/and/compare) works
    (emulated on u32 pairs).
  * float64 is stored and computed as a double-float (f32 hi/lo pair,
    ~49-bit mantissa): f64 does not even roundtrip device_put/device_get
    bit-exactly. Bit-exact f64 parity with Arrow is PHYSICALLY IMPOSSIBLE
    on this hardware; f64 results agree to double-float rounding.

Consequences implemented here:
  * int64/uint64 lanes: arithmetic hi/lo split (exact everywhere).
  * float64 lanes: on CPU an exact IEEE-bits bitcast; on TPU the native
    double-float decomposition hi=f32(v), lo=f32(v-hi) whose (bits(hi),
    bits(lo)) pair is injective and lexicographically order-preserving for
    every device-representable value.
  * NaNs canonicalized to one quiet NaN: all NaNs group/sort identically
    (Arrow would split exotic NaN payloads — documented divergence).

Lanes are uint32: the grouper compares them, the hasher mixes them, and
the sorter uses them (with order-preserving encodings) as lax.sort keys.
"""

from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["split_u64", "join_u32", "value_lanes32", "ascending_lanes32",
           "supports_exact_f64"]


def supports_exact_f64() -> bool:
    """True when the default backend has real IEEE float64 (CPU)."""
    return jax.default_backend() not in ("tpu",)


def split_u64(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """(hi, lo) uint32 lanes of a 64-bit integer array (arithmetic ops
    only — safe under the TPU x64 rewrite)."""
    u = x.astype(jnp.uint64)
    return ((u >> jnp.uint64(32)).astype(jnp.uint32),
            u.astype(jnp.uint32))


def join_u32(hi: jax.Array, lo: jax.Array) -> jax.Array:
    return (hi.astype(jnp.uint64) << jnp.uint64(32)) | lo.astype(jnp.uint64)


def _f32_bits(v: jax.Array) -> jax.Array:
    bits = jax.lax.bitcast_convert_type(v, jnp.uint32)
    return jnp.where(jnp.isnan(v), jnp.uint32(0x7FC00000), bits)


def _f16_bits(v: jax.Array) -> jax.Array:
    bits = jax.lax.bitcast_convert_type(v, jnp.uint16).astype(jnp.uint32)
    return jnp.where(jnp.isnan(v), jnp.uint32(0x7E00), bits)


def _f64_lanes_exact(v: jax.Array) -> List[jax.Array]:
    """CPU path: exact IEEE bits via 64-bit bitcast."""
    bits = jax.lax.bitcast_convert_type(v, jnp.uint64)
    bits = jnp.where(jnp.isnan(v), jnp.uint64(0x7FF8000000000000), bits)
    return list(split_u64(bits))


def _f64_lanes_dd(v: jax.Array) -> List[jax.Array]:
    """TPU path: double-float decomposition (the value's own on-device
    representation). Injective; (hi, lo) compare like v."""
    isnan = jnp.isnan(v)
    vv = jnp.where(isnan, 0.0, v)
    hi = vv.astype(jnp.float32)
    lo = (vv - hi.astype(jnp.float64)).astype(jnp.float32)
    hb = _f32_bits(hi)
    lb = _f32_bits(lo)
    hb = jnp.where(isnan, jnp.uint32(0x7FC00000), hb)
    lb = jnp.where(isnan, jnp.uint32(0), lb)
    return [hb, lb]


def _f32_enc_ascending(bits: jax.Array) -> jax.Array:
    """IEEE trick: order-preserving u32 encoding of f32 bits."""
    sign = (bits >> jnp.uint32(31)) != 0
    return jnp.where(sign, bits ^ jnp.uint32(0xFFFFFFFF),
                     bits | jnp.uint32(0x80000000))


def value_lanes32(values: jax.Array, type_) -> List[jax.Array]:
    """Bit-equality uint32 lanes of a values buffer (grouping/hashing)."""
    from ..core import datatype as dt
    t = type_
    v = values
    if isinstance(t, dt.DictionaryType):
        return [v.astype(jnp.uint32)]
    if isinstance(t, dt.BoolType):
        return [v.astype(jnp.uint32)]
    if t.is_floating:
        if t.bits == 64:
            return _f64_lanes_exact(v) if supports_exact_f64() \
                else _f64_lanes_dd(v)
        if t.bits == 16:
            return [_f16_bits(v)]
        return [_f32_bits(v)]
    if isinstance(t, dt.DecimalType) and t.wide:
        # two-limb (cap, 2) [lo bits, hi signed] -> 4 raw-bit lanes
        hi_hi, hi_lo = split_u64(v[:, 1])
        lo_hi, lo_lo = split_u64(v[:, 0])
        return [hi_hi, hi_lo, lo_hi, lo_lo]
    if t.is_integer or t.is_temporal or isinstance(t, dt.DecimalType):
        if t.bit_width == 64:
            return list(split_u64(v))
        return [v.astype(jnp.uint32)]
    raise NotImplementedError(f"value lanes for {t}")


def ascending_lanes32(values: jax.Array, type_) -> List[jax.Array]:
    """uint32 lanes whose lexicographic unsigned order == the column's
    ascending sort order (Arrow's radix key-normalization, in lanes).
    NaNs sort greatest (before nulls); -0.0 canonicalized equal to 0.0
    (ties keep input order via stable sort, matching Arrow's comparator)."""
    from ..core import datatype as dt
    t = type_
    v = values
    if isinstance(t, dt.BoolType):
        return [v.astype(jnp.uint32)]
    if t.is_floating:
        if t.bits == 64:
            vv = jnp.where(v == 0, 0.0, v)  # -0.0 == 0.0 for ordering
            if supports_exact_f64():
                hi, lo = _f64_lanes_exact(vv)
                sign = (hi >> jnp.uint32(31)) != 0
                ehi = jnp.where(sign, hi ^ jnp.uint32(0xFFFFFFFF),
                                hi | jnp.uint32(0x80000000))
                elo = jnp.where(sign, lo ^ jnp.uint32(0xFFFFFFFF), lo)
                return [ehi, elo]
            hb, lb = _f64_lanes_dd(vv)
            return [_f32_enc_ascending(hb), _f32_enc_ascending(lb)]
        vv = jnp.where(v == 0, jnp.zeros_like(v), v)
        bits = _f16_bits(vv) if t.bits == 16 else _f32_bits(vv)
        if t.bits == 16:
            sign = (bits >> jnp.uint32(15)) != 0
            return [jnp.where(sign, bits ^ jnp.uint32(0xFFFF),
                              bits | jnp.uint32(0x8000))]
        return [_f32_enc_ascending(bits)]
    if isinstance(t, dt.DecimalType) and t.wide:
        # i128 order: signed hi limb (sign-biased) then unsigned lo
        hi_hi, hi_lo = split_u64(v[:, 1])
        lo_hi, lo_lo = split_u64(v[:, 0])
        return [hi_hi ^ jnp.uint32(0x80000000), hi_lo, lo_hi, lo_lo]
    if t.is_signed_integer or t.is_temporal or isinstance(t, dt.DecimalType):
        if t.bit_width == 64:
            hi, lo = split_u64(v)
            return [hi ^ jnp.uint32(0x80000000), lo]
        return [(v.astype(jnp.int32).astype(jnp.uint32)) ^
                jnp.uint32(0x80000000)]
    if t.is_unsigned_integer:
        if t.bit_width == 64:
            return list(split_u64(v))
        return [v.astype(jnp.uint32)]
    raise NotImplementedError(f"ascending lanes for {t}")
