"""Cast kernels. Reference: ``scalar_cast_*.cc`` + ``cast.cc``.

Round-1 scope: numeric<->numeric, bool<->numeric, temporal<->int,
dictionary decode. Unchecked semantics (Arrow ``safe=False``): overflow
truncates; checked variants come with the deferred-error mechanism.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import datatype as dt
from ..core.array import Array
from ..compute.registry import Kind, NullHandling, register_function
from ..compute.scalar import Scalar
from .kernel_utils import jnp_dtype, values_of

__all__ = ["CastOptions"]


class CastOptions:
    def __init__(self, target_type: dt.DataType, allow_overflow: bool = True):
        self.target_type = target_type
        self.allow_overflow = allow_overflow


def dictionary_decode(a: Array) -> Array:
    """dictionary<T> -> T by gathering dictionary values at indices."""
    t = a.type
    assert isinstance(t, dt.DictionaryType)
    from .selection import take_array
    idx = Array(dt.int32, a.values.astype(jnp.int32), a.validity,
                length=a.length)
    out = take_array(a.dictionary, idx)
    return out


@register_function("cast", Kind.SCALAR, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=CastOptions)
def _cast(args, options):
    (a,) = args
    if options is None:
        raise ValueError("cast requires CastOptions(target_type=...)")
    dst = options.target_type

    if isinstance(a, Scalar):
        raise NotImplementedError("cast of scalars: wrap in array")

    src = a.type
    if src == dst:
        return a

    if isinstance(src, dt.DictionaryType):
        decoded = dictionary_decode(a)
        if decoded.type == dst:
            return decoded
        return _cast([decoded], options)

    if isinstance(dst, dt.DictionaryType):
        from .vector_hash import dictionary_encode_array
        enc = a if src == dst.value_type else _cast(
            [a], CastOptions(dst.value_type))
        return dictionary_encode_array(enc, index_type=dst.index_type)

    if src.is_integer and isinstance(dst, dt.StringType):
        return _int_to_string(a)
    if isinstance(src, (dt.StringType,)) and dst.is_integer:
        return _string_to_int(a, dst)
    if isinstance(src, (dt.StringType,)) and dst.is_floating:
        return _string_to_float(a, dst)

    v = a.values
    if (src.is_numeric or isinstance(src, dt.BoolType) or src.is_temporal) \
            and (dst.is_numeric or isinstance(dst, dt.BoolType)
                 or dst.is_temporal):
        if isinstance(dst, dt.BoolType):
            out = v != 0
        else:
            out = v.astype(jnp_dtype(dst))
        return Array(dst, out, a.validity, length=a.length)

    raise NotImplementedError(f"cast {src} -> {dst}")


def _int_to_string(a: Array) -> Array:
    """int -> decimal string, fully on device: per-row digit count via
    threshold compares, then each output byte computes its digit with a
    power-of-ten table lookup (``scalar_cast_string.cc`` role)."""
    import jax
    from .strings import _build_varlen
    v = a.values.astype(jnp.int64)
    neg = v < 0
    # |v| as uint64 (handles INT64_MIN without overflow)
    mag = jnp.where(neg, (-(v + 1)).astype(jnp.uint64) + 1,
                    v.astype(jnp.uint64))
    pow10 = jnp.asarray([10 ** p for p in range(20)], dtype=jnp.uint64)
    ndig = jnp.ones(v.shape, jnp.int32)
    for p in range(1, 20):
        ndig = ndig + (mag >= pow10[p]).astype(jnp.int32)
    lens = ndig + neg.astype(jnp.int32)
    src_off = a.offsets  # unused; placeholder for helper signature

    cap = a.capacity
    out_t = dt.string

    def src_of(r, k, out_pos):
        return jnp.full_like(r, -1)  # all bytes come from the filler

    def filler(r, k):
        is_sign = neg[r] & (k == 0)
        dpos = k - neg[r].astype(jnp.int32)          # digit index
        p = ndig[r] - 1 - dpos                        # power of ten
        pc = jnp.clip(p, 0, 19)
        digit = (mag[r] // pow10[pc]) % jnp.uint64(10)
        byte = jnp.uint8(48) + digit.astype(jnp.uint8)
        return jnp.where(is_sign, jnp.uint8(45), byte)

    shell = Array(out_t, jnp.zeros((1,), jnp.uint8), a.validity,
                  offsets=jnp.zeros((cap + 1,), jnp.int32), length=a.length)
    out = _build_varlen(shell, lens, src_of, out_bcap=cap * 21,
                        filler=filler)
    return Array(out_t, out.values, a.validity, offsets=out.offsets,
                 length=a.length)


def _string_to_int(a: Array, dst: dt.DataType) -> Array:
    """decimal string -> integer with per-row validity (parse failures
    are nulls — the unchecked-cast analog of Arrow's safe=False)."""
    import jax
    from .strings import _lens, _pool_iota, _rows_of_bytes
    cap = a.capacity
    bcap = max(a.values.shape[0], 1)
    pool = a.values if a.values.shape[0] else jnp.zeros((1,), jnp.uint8)
    rows = _rows_of_bytes(a) if a.values.shape[0] else \
        jnp.zeros((1,), jnp.int32)
    bidx = _pool_iota(max(a.values.shape[0], 1))
    lens = _lens(a).astype(jnp.int32)                      # (cap,)
    row_start = a.offsets[:-1]                             # (cap,)
    first_r = pool[jnp.clip(row_start, 0, bcap - 1)]       # (cap,)
    has_sign_r = ((first_r == 45) | (first_r == 43)) & (lens > 0)
    sign_r = jnp.where(first_r == 45, jnp.int64(-1), jnp.int64(1))
    ndig = lens - has_sign_r.astype(jnp.int32)             # (cap,)
    pos = bidx - a.offsets[rows]                           # per byte
    dpos = pos - has_sign_r[rows].astype(jnp.int32)
    in_pool = bidx < a.offsets[cap]
    is_digit_pos = in_pool & (dpos >= 0)
    byte = pool[jnp.clip(bidx, 0, bcap - 1)]
    digit = (byte - jnp.uint8(48)).astype(jnp.int64)
    valid_byte = (byte >= 48) & (byte <= 57)
    p = jnp.clip(ndig[rows] - 1 - dpos, 0, 18)
    pow10 = jnp.asarray([10 ** q for q in range(19)], dtype=jnp.int64)
    contrib = jnp.where(is_digit_pos, digit * pow10[p], 0)
    total = jnp.zeros((cap,), jnp.int64).at[
        jnp.where(is_digit_pos, rows, cap)].add(contrib, mode="drop")
    bad = jnp.zeros((cap,), jnp.bool_).at[
        jnp.where(is_digit_pos, rows, cap)].max(~valid_byte, mode="drop")
    parse_ok = (ndig > 0) & (ndig <= 19) & ~bad
    out = (sign_r * total).astype(jnp_dtype(dst))
    validity = parse_ok
    if a.validity is not None:
        validity = validity & a.validity
    return Array(dst, out, validity, length=a.length)


def _string_to_float(a: Array, dst: dt.DataType) -> Array:
    """decimal/scientific string -> float, vectorized over the byte pool:
    per-row '.'/'e' positions via segment-min, digit accumulation into
    int64 mantissa halves, power-of-ten scaling. Not guaranteed
    correctly-rounded in the last ulp (multi-step float math) — Arrow's
    parser is; tests compare with rtol."""
    import jax
    from .strings import _lens, _pool_iota, _rows_of_bytes
    cap = a.capacity
    bcap = max(a.values.shape[0], 1)
    pool = a.values if a.values.shape[0] else jnp.zeros((1,), jnp.uint8)
    pool_l = jnp.where((pool >= 65) & (pool <= 90), pool + 32, pool)
    rows = _rows_of_bytes(a) if a.values.shape[0] else \
        jnp.zeros((1,), jnp.int32)
    bidx = _pool_iota(bcap)
    in_pool = bidx < a.offsets[cap]
    lens = _lens(a).astype(jnp.int32)
    row_start = a.offsets[:-1]
    pos = bidx - a.offsets[rows]
    BIG = jnp.int32(2147483647)

    def first_pos_of(byte_val):
        hit = in_pool & (pool_l == byte_val)
        return jnp.full((cap,), BIG, jnp.int32).at[
            jnp.where(hit, rows, cap)].min(pos, mode="drop")

    dot = first_pos_of(jnp.uint8(46))       # '.'
    epos = first_pos_of(jnp.uint8(101))     # 'e'
    first_r = pool[jnp.clip(row_start, 0, bcap - 1)]
    has_sign_r = ((first_r == 45) | (first_r == 43)) & (lens > 0)
    sign_r = jnp.where(first_r == 45, -1.0, 1.0)
    mant_end = jnp.minimum(jnp.minimum(dot, epos), lens)      # int digits
    frac_end = jnp.minimum(epos, lens)

    byte = pool[jnp.clip(bidx, 0, bcap - 1)]
    digit = (byte - jnp.uint8(48)).astype(jnp.int64)
    is_digit = (byte >= 48) & (byte <= 57)

    pow10i = jnp.asarray([10 ** q for q in range(19)], dtype=jnp.int64)
    # integer part: digits in [sign, mant_end)
    ip_lo = has_sign_r.astype(jnp.int32)
    ip_in = in_pool & (pos >= ip_lo[rows]) & (pos < mant_end[rows])
    ip_p = jnp.clip(mant_end[rows] - 1 - pos, 0, 18)
    int_sum = jnp.zeros((cap,), jnp.int64).at[
        jnp.where(ip_in, rows, cap)].add(
        jnp.where(ip_in, digit * pow10i[ip_p], 0), mode="drop")
    n_int = jnp.maximum(mant_end - ip_lo, 0)
    # fraction: digits in (dot, frac_end)
    fr_in = in_pool & (pos > dot[rows]) & (pos < frac_end[rows])
    fr_p = jnp.clip(pos - dot[rows] - 1, 0, 18)   # 0-based frac index
    frac_sum = jnp.zeros((cap,), jnp.int64).at[
        jnp.where(fr_in, rows, cap)].add(
        jnp.where(fr_in, digit * pow10i[jnp.clip(18 - fr_p, 0, 18)], 0),
        mode="drop")
    n_frac = jnp.maximum(frac_end - dot - 1, 0)
    n_frac = jnp.where(dot == BIG, 0, n_frac)
    # exponent: signed int after 'e'
    ex_sign_pos = epos + 1
    exb = pool[jnp.clip(row_start + ex_sign_pos, 0, bcap - 1)]
    ex_has_sign = (exb == 45) | (exb == 43)
    ex_sign = jnp.where(exb == 45, -1, 1)
    ex_lo = ex_sign_pos + ex_has_sign.astype(jnp.int32)
    ex_in = in_pool & (pos >= ex_lo[rows]) & (pos < lens[rows]) & \
        (epos[rows] != BIG)
    ex_p = jnp.clip(lens[rows] - 1 - pos, 0, 18)
    exp_sum = jnp.zeros((cap,), jnp.int64).at[
        jnp.where(ex_in, rows, cap)].add(
        jnp.where(ex_in, digit * pow10i[ex_p], 0), mode="drop")
    n_exp = jnp.where(epos == BIG, -1, lens - ex_lo)
    exp_val = ex_sign.astype(jnp.int64) * exp_sum
    # combine in float64: (int + frac*10^-nfrac) * 10^exp
    f_int = int_sum.astype(jnp.float64)
    f_frac = frac_sum.astype(jnp.float64) * 1e-19
    exp_clip = jnp.clip(exp_val, -330, 330).astype(jnp.int32)
    mag = (f_int + f_frac) * jnp.power(10.0, exp_clip.astype(jnp.float64))
    out = sign_r * mag
    # bad-character / structure detection
    is_struct = (pool_l == 46) | (pool_l == 101) | (byte == 43) | \
        (byte == 45)
    bad_pos = in_pool & ~is_digit & ~is_struct
    bad = jnp.zeros((cap,), jnp.bool_).at[
        jnp.where(in_pool, rows, cap)].max(bad_pos, mode="drop")
    parse_ok = ~bad & ((n_int > 0) | (n_frac > 0)) & (n_exp != 0) & \
        (n_int <= 19)
    # special literals: inf / -inf / nan (case-insensitive)
    def _is_word(word):
        w = word.encode()
        m = lens == len(w) + 0
        base = jnp.zeros((cap,), jnp.bool_) | m
        for k, ch in enumerate(w):
            b = pool_l[jnp.clip(row_start + k, 0, bcap - 1)]
            base = base & (b == ch)
        return base
    is_inf = _is_word("inf")
    is_nan = _is_word("nan")
    neg_inf = _is_word("-inf")
    out = jnp.where(is_inf, jnp.inf, out)
    out = jnp.where(neg_inf, -jnp.inf, out)
    out = jnp.where(is_nan, jnp.nan, out)
    parse_ok = parse_ok | is_inf | is_nan | neg_inf
    validity = parse_ok
    if a.validity is not None:
        validity = validity & a.validity
    return Array(dst, out.astype(jnp_dtype(dst)), validity,
                 length=a.length)
