"""Vectorized key hashing + fixed-width key packing.

Reference: ``cpp/src/arrow/compute/key_hash_internal.{h,cc}`` (xxh3-style
``Hashing32/64`` with per-column hash + combine, ``HashMultiColumn``
``key_hash_internal.h:46``) and the row encoder
(``compute/row/encode_internal.h``).

TPU-native design: every key column is first **normalized to a fixed-width
integer word** (uint32 or uint64 lanes):
  * ints/bools/temporals -> their bits (sign handled by the sort encoder,
    not the hasher)
  * floats -> raw bits with -0.0 canonicalized to +0.0 (Arrow hashes equal
    values identically)
  * dictionary -> indices (dictionaries are shared within a batch)
  * strings -> a 64-bit content fingerprint (length-mixed chunked FNV over
    the byte pool) — collisions resolved by full key comparison in the
    grouper, exactly like the reference resolves stamp collisions.

Hash function: a Murmur3-style finalizer chain per word with per-column seed
mixing — multiplicative mixing vectorizes perfectly on the VPU (no
byte-level xxh3 loops, which would be scalar poison on TPU).

Everything here operates on u32 lanes (TPU has no native 64-bit ints; XLA
emulates them) with an optional u64 variant on CPU for collision headroom.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..core import datatype as dt
from ..core.array import Array
from .bits import value_lanes32

__all__ = ["hash32", "hash64", "normalize_keys", "hash_batch_columns",
           "combine_hashes32", "string_fingerprint_exact"]

# Murmur3 / xxh-style constants
_C1 = np.uint32(0xCC9E2D51)   # np, not jnp: see distinct._I32MAX note
_C2 = np.uint32(0x1B873593)
_FMIX1 = np.uint32(0x85EBCA6B)
_FMIX2 = np.uint32(0xC2B2AE35)

_PRIME64_1 = 0x9E3779B185EBCA87
_PRIME64_2 = 0xC2B2AE3D27D4EB4F
_PRIME64_3 = 0x165667B19E3779F9


def _rotl32(x, r):
    return (x << r) | (x >> (32 - r))


def _fmix32(h):
    h = h ^ (h >> 16)
    h = h * _FMIX1
    h = h ^ (h >> 13)
    h = h * _FMIX2
    h = h ^ (h >> 16)
    return h


def _mix32(h, k):
    k = k * _C1
    k = _rotl32(k, 15)
    k = k * _C2
    h = h ^ k
    h = _rotl32(h, 13)
    h = h * jnp.uint32(5) + jnp.uint32(0xE6546B64)
    return h


def _word_lanes(a: Array) -> List[jax.Array]:
    """Normalize one key column to a list of uint32 lanes.

    Must be CONSISTENT with the grouper's equality lanes (equal group keys
    must produce equal hashes), so it delegates to the same
    bits.value_lanes32 (raw bits; NaNs canonicalized there)."""
    t = a.type
    if t.is_varlen:
        fp = _string_fingerprint64(a)
        return [fp.astype(jnp.uint32),
                (fp >> jnp.uint64(32)).astype(jnp.uint32)]
    from ..core import datatype as dt
    if isinstance(t, dt.DictionaryType):
        # content-based (codes are dictionary-local; shuffles hash the
        # two sides of a join independently — see dict_content_lanes)
        return dict_content_lanes(a)
    return value_lanes32(a.values, t)


def _string_fingerprint64(a: Array) -> jax.Array:
    """64-bit content fingerprint of each string row.

    A strided chunked hash: each row mixes in up to 16 sampled bytes (exact
    for short strings, stride-sampled for long ones) plus its exact last 8
    bytes and its length. Exactness is NOT required here — groupers/joins
    re-verify candidate matches with full key comparisons (the same way the
    reference resolves SwissTable stamp collisions); this only needs good
    dispersion.
    """
    off = a.offsets
    n = off.shape[0] - 1
    lens = (off[1:] - off[:-1]).astype(jnp.uint64)
    data = a.values
    bcap = data.shape[0]
    h = lens * jnp.uint64(_PRIME64_2) + jnp.uint64(_PRIME64_3)
    start = off[:-1]
    # 16 strided probes cover short strings exactly and sample long ones;
    # stride grows with length so the whole string influences the hash.
    NPROBE = 16
    stride = jnp.maximum(lens // NPROBE, 1).astype(jnp.int32)
    for k in range(NPROBE):
        pos = start + stride * k
        valid = (jnp.uint64(k) * stride.astype(jnp.uint64)) < lens
        byte = data[jnp.clip(pos, 0, bcap - 1)].astype(jnp.uint64)
        contrib = jnp.where(valid, byte + jnp.uint64(k + 1), jnp.uint64(0))
        h = (h ^ contrib) * jnp.uint64(_PRIME64_1)
        h = h ^ (h >> jnp.uint64(29))
    # fold in the exact last 8 bytes (catches suffix-only differences)
    for k in range(8):
        pos = off[1:] - 1 - k
        valid = jnp.uint64(k) < lens
        byte = data[jnp.clip(pos, 0, bcap - 1)].astype(jnp.uint64)
        contrib = jnp.where(valid, byte, jnp.uint64(0))
        h = (h ^ (contrib << jnp.uint64(8 * (k % 8)))) * \
            jnp.uint64(_PRIME64_2)
    h = h ^ (h >> jnp.uint64(32))
    return h


def _fmix64(h: jax.Array) -> jax.Array:
    h = h ^ (h >> jnp.uint64(33))
    h = h * jnp.uint64(0xFF51AFD7ED558CCD)
    h = h ^ (h >> jnp.uint64(33))
    h = h * jnp.uint64(0xC4CEB9FE1A85EC53)
    h = h ^ (h >> jnp.uint64(33))
    return h


_SCAN_BLOCK = 8192  # rows per blocked-scan block (see _cumsum_u64)


def _cumsum_u64(x: jax.Array) -> jax.Array:
    """u64 inclusive prefix sum via an explicit two-level blocked scan.

    A flat ``jnp.cumsum`` over a multi-million-element u64 vector lowers
    on TPU to ONE tupled (u32, u32) reduce-window whose scoped-VMEM
    scratch scales with the input (19.07MB at a 16.7M-byte pool > the
    16MB limit — the round-3 host_boundary pushdown compile SIGSEGV,
    ``.bench_logs/host_boundary.log``; bisected to this op by
    ``tools/pushdown_bisect.py``). Splitting into per-block scans +
    a small block-offset scan keeps every reduce-window's operand
    block-sized; the barriers stop XLA re-fusing the levels back into
    one scratch-hungry kernel."""
    n = x.shape[0]
    C = _SCAN_BLOCK
    if n <= C:
        return jnp.cumsum(x)
    pad = (-n) % C
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)])
    rows = jax.lax.optimization_barrier(x.reshape((-1, C)))
    within = jax.lax.optimization_barrier(jnp.cumsum(rows, axis=1))
    row_tot = within[:, -1]
    row_off = jnp.cumsum(row_tot) - row_tot
    out = (within + row_off[:, None]).reshape((-1,))
    return out[:n]


def _pow_bits(exp: jax.Array, base: int, nbits: int) -> jax.Array:
    """Elementwise ``base ** exp mod 2**64`` by square-and-multiply over
    the bits of ``exp`` with HOST-precomputed squares: ``nbits`` fused
    select+multiply steps, no scan, no gather — everything stays in
    registers for XLA to fuse into the surrounding elementwise kernel."""
    sq = base % (1 << 64)
    acc = jnp.full(exp.shape, jnp.uint64(1))
    e = exp.astype(jnp.uint32)
    for b in range(max(nbits, 1)):
        bit = ((e >> jnp.uint32(b)) & jnp.uint32(1)).astype(jnp.bool_)
        acc = jnp.where(bit, acc * jnp.uint64(sq), acc)
        sq = (sq * sq) % (1 << 64)
    return acc


def string_fingerprint_exact(a: Array, mult: int = 0x9E3779B185EBCA87
                             ) -> jax.Array:
    """Full-content 64-bit polynomial fingerprint of each string row.

    ``h[r] = fmix64(len(r) ^ sum_p (byte[p]+1) * mult**p mod 2**64)``
    (p relative to the row start) over ALL bytes of the row — unlike
    ``_string_fingerprint64`` nothing is sampled, so two rows collide
    only with ~len/2**64 probability (use two different odd ``mult``s
    for 128-bit confidence).

    The positional powers need NO segmented scan (the r2 design's
    segmented product scan burned ~25 full-pool passes, ~700ms at 2M
    rows on v5e): since ``mult`` is odd and therefore invertible mod
    2**64, ``mult**(p - start) = mult**p * inv(mult)**start`` — and
    ``mult**p`` is elementwise in the BITS of p (``_pow_bits``
    square-and-multiply against host-precomputed squares). The only scan
    left is one u64 cumsum of the byte contributions; per-row sums are
    prefix-sum differences at the row boundaries (two (cap,) gathers —
    pool slack between/after rows cancels in the difference, so no
    masking pass either), each scaled by ``inv(mult)**start`` computed
    per ROW, not per byte.

    Role: exact-equality keying of varlen columns in unique /
    dictionary_encode / group-by (the reference memo-table compares full
    key bytes, ``util/hashing.h``; we get equivalent confidence from the
    128-bit full-content fingerprint).
    """
    off = a.offsets
    data = a.values
    bcap = data.shape[0]
    lens = (off[1:] - off[:-1]).astype(jnp.uint64)
    if bcap == 0:
        return _fmix64(lens)
    starts = off[:-1]
    nbits = max(int(bcap - 1).bit_length(), 1)
    pos = jax.lax.broadcasted_iota(jnp.uint32, (bcap, 1), 0).reshape(
        (bcap,))
    powp = _pow_bits(pos, mult, nbits)
    contrib = (data.astype(jnp.uint64) + jnp.uint64(1)) * powp
    # per-row sum = difference of the inclusive prefix sum at row ends:
    # two (cap,)-sized gathers instead of an 18M-way colliding
    # scatter-add (XLA serializes colliding scatters on TPU)
    csum = _cumsum_u64(contrib)
    zero = jnp.zeros((1,), dtype=jnp.uint64)
    csum_ext = jnp.concatenate([zero, csum])   # csum_ext[p] = sum(<p)
    # ONE gather covers both row boundaries: starts and ends are both
    # slices of `off`, so gather csum at off once and diff neighbors
    # (1D gathers are the expensive op on TPU — halve them)
    g = csum_ext[jnp.clip(off, 0, bcap)]
    raw = g[1:] - g[:-1]
    inv_mult = pow(mult, -1, 1 << 64)
    acc = raw * _pow_bits(starts.astype(jnp.uint32), inv_mult, nbits)
    return _fmix64(acc ^ (lens * jnp.uint64(_PRIME64_2)))


_SLOT_W = 16  # short-string exact-slot width (bytes)


def varlen_content_lanes(a: Array) -> List[jax.Array]:
    """5 uint32 lanes keying a varlen column by content: byte length +
    4 content lanes. Equal content <=> equal lanes for short strings;
    ~2^-128 collision confidence for long ones.

    The content-lane FORM is chosen PER ROW by the row's length (which
    is itself lane 0): rows <= 16 bytes key by their exact padded bytes,
    longer rows by two independent 64-bit full-content polynomial
    fingerprints (the reference row table's varbinary region,
    ``row_internal.h:33``; fingerprints are the same confidence class as
    SwissTable stamp + full re-compare). Per-ROW selection is a
    correctness requirement, not an optimization: lanes are compared
    ACROSS arrays (join build vs probe, grouper table vs later batches),
    so equal values must produce equal lanes no matter which array they
    sit in — a per-ARRAY branch on max length silently dropped every
    match when one side held any >16-byte row and the other did not
    (round-5 regression test: test_join_keys_straddle_slot_width).

    Short-slot formulation: the byte pool scatters into fixed (cap, 16)
    u8 slots — row index and row start forward-fill through ``cummax``
    (both are monotone at row heads, so the fills are exact), the byte's
    destination is ``row*16 + (pos - row_start)``, and ONE monotone
    unique-index scatter places every byte; the lanes are the EXACT
    padded bytes (bitcast to 4 u32). When the whole array is short a
    ``lax.cond`` still skips the fingerprint math entirely (measured
    147 ms/fingerprint at an 18MB pool on v5e; the slot path is ~5x
    cheaper) — the cond only skips WORK, never changes a row's lanes.
    """
    off = a.offsets
    cap = off.shape[0] - 1
    data = a.values
    bcap = data.shape[0]
    lens32 = (off[1:] - off[:-1]).astype(jnp.uint32)
    if bcap == 0:
        z = jnp.zeros((cap,), jnp.uint32)
        return [lens32, z, z, z, z]

    def _short(_):
        starts = off[:-1].astype(jnp.int32)
        ilens = (off[1:] - off[:-1]).astype(jnp.int32)
        head_pos = jnp.where(ilens > 0, starts, bcap)
        ridx = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).reshape(
            (cap,))
        bidx = jax.lax.broadcasted_iota(jnp.int32, (bcap, 1), 0).reshape(
            (bcap,))
        row_fill = jax.lax.cummax(
            jnp.full((bcap,), -1, jnp.int32).at[head_pos].max(
                ridx, mode="drop", unique_indices=True))
        start_fill = jax.lax.cummax(
            jnp.zeros((bcap,), jnp.int32).at[head_pos].max(
                starts, mode="drop", unique_indices=True))
        within = bidx - start_fill
        ok = (row_fill >= 0) & (bidx < off[cap]) & (within < _SLOT_W)
        dst = jnp.where(ok, row_fill * _SLOT_W + within, -1)
        slots = jnp.zeros((cap * _SLOT_W,), jnp.uint8).at[dst].set(
            data, mode="drop", unique_indices=True)
        return jax.lax.bitcast_convert_type(
            slots.reshape((cap, _SLOT_W // 4, 4)), jnp.uint32)  # (cap, 4)

    def _mixed(_):
        # some rows exceed the slot: short rows STILL key by their exact
        # slot bytes (consistent with arrays where the cond skipped the
        # fingerprints); only >16-byte rows take the fingerprint lanes
        s4 = _short(None)
        fp1 = string_fingerprint_exact(a)
        fp2 = string_fingerprint_exact(a, mult=0xC2B2AE3D27D4EB4F)
        f4 = jnp.stack(
            [fp1.astype(jnp.uint32),
             (fp1 >> jnp.uint64(32)).astype(jnp.uint32),
             fp2.astype(jnp.uint32),
             (fp2 >> jnp.uint64(32)).astype(jnp.uint32)], axis=1)
        return jnp.where((lens32 <= _SLOT_W)[:, None], s4, f4)

    lanes4 = jax.lax.cond(jnp.max(lens32) <= _SLOT_W, _short, _mixed,
                          None)
    return [lens32, lanes4[:, 0], lanes4[:, 1], lanes4[:, 2],
            lanes4[:, 3]]


def dict_value_lane_width(t) -> int:
    """Static lane count of ``dict_content_lanes`` for a dictionary key
    column. IDENTICAL to the plain value type's width (varlen: 5;
    64-bit: 2; else 1) so a dictionary side keys consistently against a
    plain side of the same logical type (transparent ingest encodes a
    source only past a size threshold — mixed joins are the norm)."""
    from ..core import datatype as dt
    vt = t.value_type
    if vt.is_varlen:
        return 5
    if isinstance(vt, dt.BoolType):
        return 1
    if vt.is_floating:
        return 2 if vt.bits == 64 else 1
    return 2 if getattr(vt, "bit_width", 32) == 64 else 1


def dict_content_lanes(a: Array) -> List[jax.Array]:
    """Content-based key lanes for a dictionary column: the lanes of the
    DICTIONARY values (tiny) gathered per row by code — one amortized
    row-gather from a (G, L) u32 matrix.

    Codes are only comparable under ONE dictionary; lanes of the VALUES
    are comparable across any dictionaries (join build vs probe sides,
    shuffled shards, unions of separately-ingested sources) AND against
    a plain column of the value type (the lane forms are identical by
    construction). This is the dictionary analog of the reference
    re-encoding dictionary join keys (``hash_join_dict.cc``).

    Limitation: a null DICTIONARY SLOT keys like the zero value/empty
    string (nulls belong in row validity in this engine; ingest encodes
    them that way — ``array_from_pyarrow`` zeroes null codes)."""
    from ..core import datatype as dt
    d = a.dictionary
    if d is None:
        return [a.values.astype(jnp.uint32)]
    Gd = max(d.capacity, 1)
    codes = jnp.clip(a.values.astype(jnp.int32), 0, Gd - 1)
    if d.type.is_varlen:
        dl = varlen_content_lanes(d)
    else:
        from .bits import value_lanes32
        dl = value_lanes32(d.values, d.type)
    if d.validity is not None:
        dl = [jnp.where(d.validity, l, 0) for l in dl]
    mat = jnp.stack(dl, axis=1)            # (Gd, L)
    rows = mat[codes]                      # amortized row gather
    return [rows[:, j] for j in range(rows.shape[1])]


def normalize_keys(columns: Sequence[Array]) -> List[jax.Array]:
    """All key columns as uint32 lanes; validity folded in as an extra lane
    trait is NOT done here — groupers handle nulls explicitly."""
    lanes: List[jax.Array] = []
    for c in columns:
        lanes.extend(_word_lanes(c))
    return lanes


def hash32(columns: Sequence[Array],
           seed: int = 0) -> jax.Array:
    """(capacity,) uint32 hash of the key tuple in each row.

    Null rows: a null key value hashes as value-bits with a null marker
    mixed in (so null == null groups together, distinct from zero).

    The hash is a pure function of each row's (value, is_null) pair —
    NOT of whether the column carries a validity buffer. A column with
    validity=None must hash identically to the same column with an
    all-true validity mask: co-partitioning (dist join/group_by) hashes
    build and probe sides independently, and one side materializing its
    validity while the other omits it must not desync the partitions.
    """
    cap = columns[0].capacity
    h = jnp.full((cap,), jnp.uint32(seed ^ 0x9747B28C), dtype=jnp.uint32)
    col_seed = 0x9E3779B9
    for ci, c in enumerate(columns):
        for lane in _word_lanes(c):
            if c.validity is not None:
                # zero null rows' value bits: all nulls must hash alike or
                # a shuffle would split the null group across shards
                lane = jnp.where(c.validity, lane, jnp.uint32(0))
            h = _mix32(h, lane ^ jnp.uint32((col_seed * (ci + 1)) &
                                            0xFFFFFFFF))
        # marker round runs unconditionally (0 for valid / absent
        # validity) so validity-buffer presence never changes the hash
        if c.validity is not None:
            null_marker = jnp.where(c.validity, jnp.uint32(0),
                                    jnp.uint32(0x7FB5D329))
        else:
            null_marker = jnp.zeros((cap,), dtype=jnp.uint32)
        h = _mix32(h, null_marker)
    return _fmix32(h)


def combine_hashes32(a: jax.Array, b: jax.Array) -> jax.Array:
    return _fmix32(_mix32(a, b))


def hash64(columns: Sequence[Array], seed: int = 0) -> jax.Array:
    """uint64 hash: two decorrelated 32-bit hashes packed."""
    h1 = hash32(columns, seed=seed)
    h2 = hash32(columns, seed=seed ^ 0x52DCE729)
    return h1.astype(jnp.uint64) << jnp.uint64(32) | h2.astype(jnp.uint64)


def hash_batch_columns(batch, names: Sequence[str],
                       seed: int = 0) -> jax.Array:
    return hash32([batch.column(n) for n in names], seed=seed)
