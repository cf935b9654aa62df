"""Device-side Unicode tables + codepoint-level UTF-8 transforms.

Reference: ``cpp/src/arrow/compute/kernels/scalar_string_utf8.cc`` — the
utf8_* kernels run codepoint LUTs (``lut_upper_codepoint`` etc., built
from utf8proc at :29) over decoded UTF-8. The TPU-native equivalent keeps
the LUTs in HBM (generated from the pyarrow oracle itself by
``tools/gen_unicode_tables.py``) and expresses decode -> map -> encode as
byte-pool-parallel passes:

  * decode: every pool byte classifies itself (head/continuation) and
    head bytes assemble their codepoint from the next <=3 bytes — one
    vectorized pass, no per-row loops;
  * map: one LUT gather per head (upper/lower/swapcase/cased);
  * encode: output byte lengths prefix-sum into new offsets, each output
    byte locates its source head via the scatter+cummax row map
    (ops/selection.rows_of_positions pattern) and computes its own UTF-8
    byte — the same shape-changing recipe as every other varlen kernel.

Output pools are sized 2x the input pool: the widest simple case mapping
grows a codepoint 1.5x (2-byte LATIN SMALL LETTER SHARP S -> 3-byte
U+1E9E), asserted against the tables at load.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import datatype as dt
from ..core.array import Array, row_mask

__all__ = ["unicode_case_transform", "head_codepoints", "predicate_flags",
           "cased_flags"]

_NPZ = os.path.join(os.path.dirname(__file__), "_unicode_tables.npz")


@functools.lru_cache(maxsize=1)
def _tables():
    z = np.load(_NPZ)
    return {
        "bound": int(z["bound"]),
        "upper": z["upper"].astype(np.uint32),
        "lower": z["lower"].astype(np.uint32),
        "swapcase": z["swapcase"].astype(np.uint32),
        "flags": z["flags"],
        "pred_index": {str(b): i for i, b in enumerate(z["pred_bits"])},
    }


@functools.lru_cache(maxsize=8)
def _dev_table(name: str) -> jax.Array:
    return jnp.asarray(_tables()[name])


def predicate_flags(cp: jax.Array, name: str) -> jax.Array:
    """Per-codepoint oracle-derived character-class bit (see
    tools/gen_unicode_tables.py): one of alpha/alnum/digit/decimal/
    numeric/space/printable/lower/title_char/cased."""
    bit = _tables()["pred_index"][name]
    t = _dev_table("flags")
    f = t[jnp.clip(cp, 0, t.shape[0] - 1)].astype(jnp.int32)
    return (f & (1 << bit)) != 0


def _u8len(c: jax.Array) -> jax.Array:
    c = c.astype(jnp.int32)
    return (1 + (c >= 0x80).astype(jnp.int32) + (c >= 0x800).astype(jnp.int32)
            + (c >= 0x10000).astype(jnp.int32))


def _pool_iota(n: int) -> jax.Array:
    return jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape((n,))


def head_codepoints(a: Array):
    """Per-pool-byte decode: (is_head bool (B,), cp int32 (B,) valid at
    head bytes, in_pool bool (B,)). Malformed bytes decode best-effort
    (the reference errors; our capacity discipline forbids data-dependent
    raises inside jit — garbage-in/garbage-out like all varlen kernels)."""
    b = a.values
    B = b.shape[0]
    if B == 0:
        z = jnp.zeros((0,), jnp.bool_)
        return z, jnp.zeros((0,), jnp.int32), z
    bidx = _pool_iota(B)
    in_pool = bidx < a.offsets[a.capacity]
    is_cont = (b & jnp.uint8(0xC0)) == jnp.uint8(0x80)
    is_head = in_pool & ~is_cont

    def nxt(k):
        return jnp.concatenate([b[k:], jnp.zeros((k,), jnp.uint8)]) \
            .astype(jnp.int32) & 0x3F

    b0 = b.astype(jnp.int32)
    b1, b2, b3 = nxt(1), nxt(2), nxt(3)
    cp = jnp.where(
        b0 < 0x80, b0,
        jnp.where((b0 & 0xE0) == 0xC0, ((b0 & 0x1F) << 6) | b1,
                  jnp.where((b0 & 0xF0) == 0xE0,
                            ((b0 & 0x0F) << 12) | (b1 << 6) | b2,
                            ((b0 & 0x07) << 18) | (b1 << 12) | (b2 << 6)
                            | b3)))
    return is_head, jnp.clip(cp, 0, 0x10FFFF), in_pool


def _lut(cp: jax.Array, name: str) -> jax.Array:
    """Case LUT with identity beyond the table bound."""
    t = _dev_table(name)
    n = t.shape[0]
    mapped = t[jnp.clip(cp, 0, n - 1)].astype(jnp.int32)
    return jnp.where(cp < n, mapped, cp)


def cased_flags(cp: jax.Array) -> jax.Array:
    return predicate_flags(cp, "cased")


def _encode_byte(c: jax.Array, ln: jax.Array, k: jax.Array) -> jax.Array:
    """k-th UTF-8 byte of codepoint c whose encoded length is ln."""
    one = c & 0x7F
    two = jnp.where(k == 0, 0xC0 | (c >> 6), 0x80 | (c & 0x3F))
    three = jnp.where(k == 0, 0xE0 | (c >> 12),
                      jnp.where(k == 1, 0x80 | ((c >> 6) & 0x3F),
                                0x80 | (c & 0x3F)))
    four = jnp.where(k == 0, 0xF0 | (c >> 18),
                     jnp.where(k == 1, 0x80 | ((c >> 12) & 0x3F),
                               jnp.where(k == 2, 0x80 | ((c >> 6) & 0x3F),
                                         0x80 | (c & 0x3F))))
    out = jnp.where(ln == 1, one,
                    jnp.where(ln == 2, two,
                              jnp.where(ln == 3, three, four)))
    return out.astype(jnp.uint8)


def unicode_case_transform(a: Array, mode: str) -> Array:
    """utf8_{upper,lower,swapcase,capitalize,title} on the device.

    Semantics match ``scalar_string_utf8.cc``: upper/lower/swapcase map
    every codepoint through the LUT; capitalize upper-maps the first
    codepoint and lower-maps the rest (Utf8CapitalizeTransform:421);
    title upper-maps the first cased codepoint of each word, lower-maps
    following cased codepoints, and passes uncased codepoints through
    (Utf8TitleTransform:449-476, word state = IsCasedCharacterUnicode).
    """
    B = a.values.shape[0]
    cap = a.capacity
    if B == 0:
        return a
    is_head, cp, in_pool = head_codepoints(a)
    bidx = _pool_iota(B)

    if mode in ("upper", "lower", "swapcase"):
        mapped = _lut(cp, mode)
    elif mode == "capitalize":
        first = bidx == a.offsets[_rows_of_bytes(a)]
        mapped = jnp.where(first, _lut(cp, "upper"), _lut(cp, "lower"))
    elif mode == "title":
        cased = cased_flags(cp) & is_head
        # previous head position (strictly before this byte, same pool)
        head_pos = jnp.where(is_head, bidx, -1)
        prev_head = jnp.concatenate(
            [jnp.full((1,), -1, jnp.int32),
             jax.lax.cummax(head_pos)[:-1].astype(jnp.int32)])
        rows = _rows_of_bytes(a)
        row_start = a.offsets[rows]
        prev_in_row = prev_head >= row_start
        prev_cased = jnp.where(
            prev_in_row, cased[jnp.clip(prev_head, 0, B - 1)], False)
        word_start = cased & ~prev_cased
        mapped = jnp.where(word_start, _lut(cp, "upper"),
                           jnp.where(cased, _lut(cp, "lower"), cp))
    else:
        raise ValueError(mode)

    out_len_cp = _u8len(mapped)
    out_bytes = jnp.where(is_head, out_len_cp, 0)
    # exclusive prefix over pool bytes = each head's output start; row
    # offsets are the same prefix sampled at the old row starts
    csum = jnp.cumsum(out_bytes).astype(jnp.int32)
    out_start = jnp.concatenate([jnp.zeros((1,), jnp.int32), csum])
    new_off = out_start[jnp.clip(a.offsets, 0, B)]
    total = new_off[cap]

    out_bcap = 2 * B
    q = _pool_iota(out_bcap)
    # output byte -> source head via scatter + cummax (each head emits
    # >=1 byte so head output starts are unique)
    marks = jnp.full((out_bcap,), -1, jnp.int32).at[
        jnp.where(is_head, out_start[:-1], out_bcap)].max(
        jnp.where(is_head, bidx, -1), mode="drop", unique_indices=True)
    h = jnp.clip(jax.lax.cummax(marks), 0, B - 1)
    k = q - out_start[h]
    out = _encode_byte(mapped[h], out_len_cp[h], k)
    out = jnp.where(q < total, out, 0).astype(jnp.uint8)
    return Array(a.type, out, a.validity, offsets=new_off, length=a.length)


def _rows_of_bytes(a: Array) -> jax.Array:
    from .selection import rows_of_positions
    r = rows_of_positions(a.offsets, a.values.shape[0])
    return jnp.clip(r, 0, a.capacity - 1)
