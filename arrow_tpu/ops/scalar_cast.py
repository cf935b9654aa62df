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
    if src.is_floating and isinstance(dst, dt.StringType):
        return _float_to_string(a)
    if isinstance(src, dt.BoolType) and isinstance(dst, dt.StringType):
        return _bool_to_string(a)
    if isinstance(src, (dt.StringType,)) and dst.is_integer:
        return _string_to_int(a, dst)
    if isinstance(src, (dt.StringType,)) and dst.is_floating:
        return _string_to_float(a, dst)
    if isinstance(src, (dt.StringType,)) and isinstance(dst, dt.BoolType):
        return _string_to_bool(a)
    if isinstance(src, (dt.StringType,)) and (
            isinstance(dst, (dt.TimestampType, dt.Date32Type,
                             dt.Date64Type))):
        return _string_to_temporal(a, dst)
    if src.is_temporal and isinstance(dst, dt.StringType):
        return _temporal_to_string(a)

    v = a.values
    if src.is_temporal and dst.is_temporal:
        return _temporal_to_temporal(a, dst)
    if (src.is_numeric or isinstance(src, dt.BoolType) or src.is_temporal) \
            and (dst.is_numeric or isinstance(dst, dt.BoolType)
                 or dst.is_temporal):
        if isinstance(dst, dt.BoolType):
            out = v != 0
        else:
            out = v.astype(jnp_dtype(dst))
        return Array(dst, out, a.validity, length=a.length)

    raise NotImplementedError(f"cast {src} -> {dst}")


# ---- temporal unit rescaling -------------------------------------------------

_UNIT_NS = {"s": 10**9, "ms": 10**6, "us": 10**3, "ns": 1}


def _ns_per_tick(t: dt.DataType) -> int:
    """Nanoseconds represented by one stored unit of ``t``."""
    if isinstance(t, dt.Date32Type):
        return 86_400 * 10**9
    if isinstance(t, dt.Date64Type):
        return 10**6       # ms
    if isinstance(t, (dt.TimestampType, dt.DurationType, dt.Time32Type,
                      dt.Time64Type)):
        return _UNIT_NS[t.unit]
    raise NotImplementedError(f"temporal cast for {t}")


def _temporal_to_temporal(a: Array, dst: dt.DataType) -> Array:
    """Unit-aware temporal cast (``scalar_cast_temporal.cc``): upscaling
    multiplies; downscaling divides TRUNCATING TOWARD ZERO (C++ integer
    division — pre-epoch -1500ms -> -1s, matching Arrow, not floor's
    -2s)."""
    sn = _ns_per_tick(a.type)
    dn = _ns_per_tick(dst)
    v = a.values.astype(jnp.int64)
    to_date = isinstance(dst, (dt.Date32Type, dt.Date64Type)) and \
        not isinstance(a.type, (dt.Date32Type, dt.Date64Type))
    to_time = isinstance(dst, (dt.Time32Type, dt.Time64Type)) and \
        isinstance(a.type, dt.TimestampType)
    if to_date:
        # calendar-day casts FLOOR (pre-epoch instants belong to the
        # previous day), unlike plain unit downscale which truncates
        day = 86_400 * 10**9 // sn
        days = jnp.floor_divide(v, day)
        out = days if isinstance(dst, dt.Date32Type) else \
            days * 86_400_000
    elif to_time:
        day = 86_400 * 10**9 // sn
        tod = v - jnp.floor_divide(v, day) * day  # time of day in src units
        k_up, k_dn = (sn // dn, 1) if sn >= dn else (1, dn // sn)
        out = tod * k_up // k_dn
    elif sn >= dn:
        out = v * (sn // dn)
    else:
        k = dn // sn
        mag = jnp.abs(v) // k
        out = jnp.where(v < 0, -mag, mag)
    return Array(dst, out.astype(jnp_dtype(dst)), a.validity,
                 length=a.length)


def _bool_to_string(a: Array) -> Array:
    """bool -> "true"/"false" on device (byte-table writes)."""
    from .strings import _build_varlen
    v = a.values.astype(jnp.bool_)
    cap = a.capacity
    lens = jnp.where(v, 4, 5).astype(jnp.int32)
    table = jnp.asarray(
        [list(b"true\x00"), list(b"false")], dtype=jnp.uint8)

    def src_of(r, k, out_pos):
        return jnp.full_like(r, -1)  # all bytes come from the filler

    def filler(r, k):
        row = jnp.where(v[r], 0, 1)
        return table[row, jnp.clip(k, 0, 4)]

    shell = Array(dt.string, jnp.zeros((1,), jnp.uint8), a.validity,
                  offsets=jnp.zeros((cap + 1,), jnp.int32), length=a.length)
    out = _build_varlen(shell, lens, src_of, out_bcap=cap * 5,
                        filler=filler)
    return Array(dt.string, out.values, a.validity, offsets=out.offsets,
                 length=a.length)


def _string_to_bool(a: Array) -> Array:
    """"1"/"true" -> True, "0"/"false" -> False (case-insensitive,
    ``scalar_cast_string.cc`` ParseBool semantics); unparseable rows
    become null (the unchecked-cast analog, same policy as
    ``_string_to_int``)."""
    from .strings import _lens
    cap = a.capacity
    bcap = max(a.values.shape[0], 1)
    pool = a.values if a.values.shape[0] else jnp.zeros((1,), jnp.uint8)
    lower = jnp.where((pool >= 65) & (pool <= 90), pool + 32, pool)
    lens = _lens(a).astype(jnp.int32)
    start = a.offsets[:-1]

    def byte_at(j):
        return jnp.where(j < lens,
                         lower[jnp.clip(start + j, 0, bcap - 1)], 0)

    b = [byte_at(jnp.full((cap,), j, jnp.int32)) for j in range(5)]

    def _is(word: bytes):
        m = lens == len(word)
        for i, ch in enumerate(word):
            m = m & (b[i] == ch)
        return m

    t = _is(b"1") | _is(b"true")
    f = _is(b"0") | _is(b"false")
    ok = t | f
    validity = ok if a.validity is None else (a.validity & ok)
    return Array(dt.bool_, t, validity, length=a.length)


def _float_to_string(a: Array) -> Array:
    """float -> shortest-roundtrip decimal string. HOST-BOUNDARY kernel
    (same policy as strftime — text formatting is not device work)."""
    import jax
    import numpy as np_
    import pyarrow as pa
    from ..core.array import array as make_array
    vals = np_.asarray(jax.device_get(a.values))[:len(a)]
    valid = np_.asarray(jax.device_get(a.validity))[:len(a)] \
        if a.validity is not None else None
    outs = []
    for i, x in enumerate(vals):
        if valid is not None and not valid[i]:
            outs.append(None)
        elif np_.isnan(x):
            outs.append("nan")
        elif np_.isinf(x):
            outs.append("inf" if x > 0 else "-inf")
        else:
            outs.append(repr(x.item()) if vals.dtype == np_.float64
                        else repr(float(str(x))))
    return make_array(pa.array(outs, type=pa.string()),
                      capacity=a.capacity)


def _string_to_temporal(a: Array, dst: dt.DataType) -> Array:
    """ISO-8601 string -> timestamp/date. HOST-BOUNDARY kernel (the
    reference parses in C via ParseTimestampISO8601)."""
    import numpy as np_
    from ..core.array import Array as _Arr
    vals = a.to_pylist()
    import datetime as _dtm
    epoch = _dtm.datetime(1970, 1, 1)
    buf = np_.zeros((a.capacity,), np_.int64)
    ok = np_.ones((a.capacity,), np_.bool_)
    for i, v in enumerate(vals):
        if v is None:
            ok[i] = False
            continue
        try:
            ts = _dtm.datetime.fromisoformat(v)
        except ValueError:
            raise ValueError(f"cannot parse {v!r} as {dst}")
        delta = ts - epoch
        if isinstance(dst, dt.Date32Type):
            buf[i] = delta.days
        elif isinstance(dst, dt.Date64Type):
            buf[i] = int(delta.total_seconds() * 1000)
        else:
            us = delta.days * 86_400_000_000 + delta.seconds * 10**6 \
                + delta.microseconds
            scale = {"s": 10**6, "ms": 10**3, "us": 1}.get(dst.unit)
            buf[i] = us // scale if scale else us * 1000
    validity = None if bool(ok[:len(vals)].all()) and a.validity is None \
        else jnp.asarray(ok)
    out_np = buf if not isinstance(dst, dt.Date32Type) else \
        buf.astype(np_.int32)
    return _Arr(dst, jnp.asarray(out_np.astype(dst.storage_np)), validity,
                length=a.length)


def _temporal_to_string(a: Array) -> Array:
    """timestamp/date -> ISO string via the strftime host-boundary kernel
    (Arrow's cast formats ISO with unit-dependent precision)."""
    from ..compute.registry import call_function
    from .temporal import StrftimeOptions
    t = a.type
    if isinstance(t, (dt.Date32Type, dt.Date64Type)):
        fmt = "%Y-%m-%d"
    elif isinstance(t, dt.TimestampType) and t.unit == "s":
        fmt = "%Y-%m-%d %H:%M:%S"
    else:
        fmt = "%Y-%m-%d %H:%M:%S.%f"
    return call_function("strftime", [a],
                         options=StrftimeOptions(format=fmt))


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
