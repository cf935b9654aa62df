"""Regex + split string kernels (HOST-BOUNDARY family).

Reference: ``scalar_string_ascii.cc`` / ``scalar_string_utf8.cc`` regex
kernels (RE2-backed) and split kernels. Regex engines are irreducibly
scalar/backtracking — not device work (the reference runs RE2 on the CPU
too) — so like strftime these run at materialization edges via Python
``re``. Splits produce list<string> columns (the engine's list layout);
``extract_regex`` produces a struct column of named groups.
"""

from __future__ import annotations

import re
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core import datatype as dt
from ..core.array import Array
from ..compute.registry import Kind, NullHandling, register_function

__all__ = ["MatchSubstringOptions", "ReplaceSubstringOptions",
           "SplitOptions", "SplitPatternOptions", "ExtractRegexOptions"]

# option classes for the regex variants reuse the string family's where
# possible; locals only where arrow defines distinct shapes
from .strings import MatchSubstringOptions, ReplaceSubstringOptions  # noqa


class SplitOptions:
    def __init__(self, max_splits: Optional[int] = None,
                 reverse: bool = False):
        self.max_splits = max_splits
        self.reverse = reverse


class SplitPatternOptions(SplitOptions):
    def __init__(self, pattern: str = "",
                 max_splits: Optional[int] = None, reverse: bool = False):
        super().__init__(max_splits, reverse)
        self.pattern = pattern


class ExtractRegexOptions:
    def __init__(self, pattern: str = ""):
        self.pattern = pattern


def _pylist(a: Array):
    return a.to_pylist()


def _compile(pattern: str, ignore_case: bool = False):
    return re.compile(pattern, re.IGNORECASE if ignore_case else 0)


def _from_py(objs, pa_type, capacity):
    import pyarrow as pa
    from ..core.array import array as make_array
    return make_array(pa.array(objs, type=pa_type), capacity=capacity)


def _host_elementwise(a: Array, fn, pa_type):
    out = [None if v is None else fn(v) for v in _pylist(a)]
    return _from_py(out, pa_type, a.capacity)


_PUSHDOWN_MIN_ROWS = 65536      # below this the direct host hop is cheap
_PUSHDOWN_MAX_DISTINCT = 8192   # slot-buffer capacity for device uniques
_PUSHDOWN_SLOT_BYTES = 64       # max string length served by the pushdown


@jax.jit
def _pushdown_encode(a: Array):
    """One jitted pass: distinct-encode a varlen column and extract the
    unique VALUES into fixed byte slots (SlotStrings — NOT a varlen take,
    whose output byte pool would be input-pool-sized and whose byte map
    would gather the whole pool for a few thousand rows).

    Returns (codes int32 (cap,), n_distinct, slots (R, W) u8,
    slot_lens (R,), slot_error) — slot_error nonzero when a distinct
    string exceeds W (caller falls back to the direct host hop)."""
    from .grouper import SlotStrings
    from .vector_hash import _distinct
    codes, unique_rows, n = _distinct(a, include_nulls=False)
    R = _PUSHDOWN_MAX_DISTINCT
    cap = a.capacity
    rows = jnp.clip(unique_rows[:R], 0, max(cap, 1) - 1)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (R, 1), 0).reshape((R,))
    pos = jnp.where(ridx < jnp.minimum(n, R), ridx, R)
    ss = SlotStrings.init(R, _PUSHDOWN_SLOT_BYTES).scatter_from(
        a, rows, pos, unique_indices=True)
    return (jnp.maximum(codes, 0), n, ss.slots, ss.lens, ss.error)


import functools


@functools.partial(jax.jit, static_argnums=(2,))
def _pushdown_take(uniq_arr: Array, codes: Array, grow: int):
    from .selection import take_array
    return take_array(uniq_arr, codes, grow=grow)


def _via_pc(name: str, a: Array, pc_options, fallback):
    """Host boundary through pyarrow compute (RE2 — the same engine the
    reference binds, ``scalar_string_regex.cc``) instead of a Python
    ``re`` loop: ~50x on match/replace/split. Python re stays as the
    fallback for patterns RE2 rejects (backrefs, lookaround).

    Dictionary pushdown (VERDICT r2 #2): every ``_via_pc`` kernel is
    elementwise over the string VALUE, so ``out[i] = f(uniq[code[i]])``.
    For large columns ONE jitted device pass distinct-encodes the column
    (``_pushdown_encode``), the host RE2 pass runs over the <=n_distinct
    unique values only, and the result rides back through one device
    gather — the dictionary-array fast path the reference's string
    kernels apply, here applied adaptively to plain columns too. Cuts
    both the host regex work and the device->host transfer by
    cap/n_distinct."""
    import numpy as np
    import jax
    import pyarrow as pa
    import pyarrow.compute as pc
    from ..core.interop import array_to_pyarrow
    from ..core.array import array as make_array
    from .selection import take_array

    import os
    import time as _time
    _dbg = os.environ.get("ARROW_TPU_HB_DEBUG")
    _t0 = _time.perf_counter()

    def _mark(label):
        nonlocal _t0
        if _dbg:
            now = _time.perf_counter()
            print(f"    hb {label}: {(now - _t0)*1e3:.1f}ms", flush=True)
            _t0 = now

    codes = uniq_pa = None
    uniq_cap = 0
    if isinstance(a.type, dt.DictionaryType) and a.dictionary is not None \
            and a.dictionary.type.is_varlen:
        uniq_cap = max(a.dictionary.capacity, 1)
        codes = Array(dt.int32,
                      jnp.clip(a.values.astype(jnp.int32), 0,
                               uniq_cap - 1),
                      a.validity, length=a.length)
        from ..core.interop import host_dictionary
        uniq_pa = host_dictionary(a.dictionary)
        if uniq_pa is None:
            uniq_pa = array_to_pyarrow(a.dictionary)
        _mark("dict values on host")
    elif a.type.is_varlen and a.capacity >= _PUSHDOWN_MIN_ROWS:
        # codes STAY on device (2M rows of i32 = 8MB — fetching them
        # through the axon relay and re-uploading was the round-3
        # host_boundary bottleneck); only the <=R unique slots (~64KB)
        # cross to the host for RE2
        c_dev, n_dev, slots_dev, lens_dev, err_dev = _pushdown_encode(a)
        _mark("encode dispatch")
        n, slots, lens, err = jax.device_get(
            (n_dev, slots_dev, lens_dev, err_dev))
        _mark("slots fetch")
        n = int(n)
        if n <= _PUSHDOWN_MAX_DISTINCT and not int(err):
            uniq_cap = _PUSHDOWN_MAX_DISTINCT
            # vectorized slots -> pyarrow varlen (the per-row python
            # loop here was the host_boundary bench's largest single
            # cost — round-4 hb_probe)
            W = slots.shape[1]
            ln = np.minimum(np.asarray(lens[:n], dtype=np.int64), W)
            keep = np.arange(W, dtype=np.int64)[None, :] < ln[:, None]
            pool = np.ascontiguousarray(np.asarray(slots[:n])[keep])
            offs = np.zeros((n + 1,), np.int32)
            np.cumsum(ln, out=offs[1:])
            ptype = pa.binary() if isinstance(a.type, dt.BinaryType) \
                else pa.string()
            cls = pa.BinaryArray if isinstance(a.type, dt.BinaryType) \
                else pa.StringArray
            uniq_pa = cls.from_buffers(
                n, pa.py_buffer(offs.tobytes()),
                pa.py_buffer(pool.tobytes()))
            codes = Array(dt.int32, c_dev, a.validity,
                          length=a.length)

    if codes is not None:
        _mark("slots->pa")
        try:
            uniq_out = getattr(pc, name)(uniq_pa, options=pc_options)
        except Exception:
            return fallback()
        _mark("host regex")
        uniq_arr = make_array(uniq_out, capacity=uniq_cap)
        _mark("uniq upload")
        grow = 1
        if uniq_arr.type.is_varlen:
            # fanout take: every output row may repeat the LONGEST unique
            # value; sizes are host-known here, so the bound is exact
            try:
                max_len = int(pc.max(pc.binary_length(uniq_out)).as_py()
                              or 0)
            except Exception:
                max_len = _PUSHDOWN_SLOT_BYTES
            pool = max(int(uniq_arr.values.shape[0]), 1)
            grow = max(1, -(-codes.capacity * max(max_len, 1) // pool))
        out = _pushdown_take(uniq_arr, codes, grow)
        _mark("codes take dispatch")
        return out

    try:
        out = getattr(pc, name)(array_to_pyarrow(a), options=pc_options)
    except Exception:
        return fallback()
    return make_array(out, capacity=a.capacity)


@register_function("match_substring_regex", Kind.SCALAR, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=MatchSubstringOptions)
def _match_substring_regex(args, options):
    import pyarrow as pa
    import pyarrow.compute as pc

    def slow():
        rx = _compile(options.pattern,
                      getattr(options, "ignore_case", False))
        return _host_elementwise(
            args[0], lambda s: rx.search(s) is not None, pa.bool_())
    return _via_pc("match_substring_regex", args[0],
                   pc.MatchSubstringOptions(
                       options.pattern,
                       ignore_case=getattr(options, "ignore_case", False)),
                   slow)


@register_function("count_substring_regex", Kind.SCALAR, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=MatchSubstringOptions)
def _count_substring_regex(args, options):
    import pyarrow as pa
    import pyarrow.compute as pc

    def slow():
        rx = _compile(options.pattern,
                      getattr(options, "ignore_case", False))
        return _host_elementwise(args[0], lambda s: len(rx.findall(s)),
                                 pa.int32())
    return _via_pc("count_substring_regex", args[0],
                   pc.MatchSubstringOptions(
                       options.pattern,
                       ignore_case=getattr(options, "ignore_case", False)),
                   slow)


@register_function("find_substring_regex", Kind.SCALAR, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=MatchSubstringOptions)
def _find_substring_regex(args, options):
    import pyarrow as pa
    import pyarrow.compute as pc

    def slow():
        rx = _compile(options.pattern,
                      getattr(options, "ignore_case", False))

        def find(s):
            m = rx.search(s)
            return -1 if m is None else m.start()
        return _host_elementwise(args[0], find, pa.int32())
    return _via_pc("find_substring_regex", args[0],
                   pc.MatchSubstringOptions(
                       options.pattern,
                       ignore_case=getattr(options, "ignore_case", False)),
                   slow)


@register_function("replace_substring_regex", Kind.SCALAR, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=ReplaceSubstringOptions)
def _replace_substring_regex(args, options):
    import pyarrow as pa
    import pyarrow.compute as pc
    mr = getattr(options, "max_replacements", None)

    def slow():
        rx = _compile(options.pattern)
        # python re uses \1 backrefs like RE2
        return _host_elementwise(
            args[0],
            lambda s: rx.sub(options.replacement, s,
                             count=mr if mr is not None else 0),
            pa.string())
    return _via_pc("replace_substring_regex", args[0],
                   pc.ReplaceSubstringOptions(
                       options.pattern, options.replacement,
                       max_replacements=mr),
                   slow)


@register_function("extract_regex", Kind.SCALAR, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=ExtractRegexOptions)
def _extract_regex(args, options):
    """Named groups -> struct<group: string, ...>; null on no match
    (``extract_regex`` in scalar_string*.cc)."""
    import pyarrow.compute as pc

    def _fast():
        return _via_pc("extract_regex", args[0],
                       pc.ExtractRegexOptions(options.pattern),
                       slow)

    def slow():
        return _extract_regex_py(args, options)
    return _fast()


def _extract_regex_py(args, options):
    rx = _compile(options.pattern)
    names = [n for n, _ in sorted(rx.groupindex.items(),
                                  key=lambda kv: kv[1])]
    if not names:
        raise ValueError("extract_regex requires named groups "
                         "(?P<name>...)")
    import pyarrow as pa

    def ext(s):
        m = rx.search(s)
        if m is None:
            return None
        return {n: m.group(n) for n in names}
    out = [None if v is None else ext(v) for v in _pylist(args[0])]
    return _from_py(out, pa.struct([(n, pa.string()) for n in names]),
                    args[0].capacity)


def _split_impl(a: Array, splitter) -> Array:
    out = [None if v is None else splitter(v) for v in _pylist(a)]
    import pyarrow as pa
    return _from_py(out, pa.list_(pa.string()), a.capacity)


@register_function("split_pattern", Kind.SCALAR, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=SplitPatternOptions)
def _split_pattern(args, options):
    pat = options.pattern
    ms = options.max_splits

    def sp(s):
        if options.reverse and ms is not None:
            parts = s.rsplit(pat, ms)
        else:
            parts = s.split(pat, ms if ms is not None else -1)
        return parts
    return _split_impl(args[0], sp)


@register_function("split_pattern_regex", Kind.SCALAR, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=SplitPatternOptions)
def _split_pattern_regex(args, options):
    import pyarrow.compute as pc

    def slow():
        rx = _compile(options.pattern)
        ms = options.max_splits

        def sp(s):
            return rx.split(s, maxsplit=ms if ms is not None else 0)
        return _split_impl(args[0], sp)
    return _via_pc("split_pattern_regex", args[0],
                   pc.SplitPatternOptions(
                       options.pattern, max_splits=options.max_splits,
                       reverse=options.reverse),
                   slow)


@register_function("utf8_split_whitespace", Kind.SCALAR, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=SplitOptions)
@register_function("ascii_split_whitespace", Kind.SCALAR, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=SplitOptions)
def _split_whitespace(args, options):
    """Split on maximal whitespace runs, keeping empty leading/trailing
    tokens (" a " -> ['', 'a', '']).

    DIVERGENCE NOTE: the reference's SplitWhitespaceAsciiFinder
    (``scalar_string_ascii.cc:2900-2904``) checks ``*i`` BEFORE ``i <
    end`` and so reads one byte past the string when a whitespace run
    touches the end — its trailing-token output depends on the next
    string's bytes in the pool. We implement the evident intent
    (maximal-run separators) instead of replicating the overread."""
    ms = options.max_splits if options else None
    if options and options.reverse:
        raise NotImplementedError("reverse whitespace split")
    ws = re.compile(r"\s+")

    def sp(s):
        return ws.split(s, maxsplit=ms if ms is not None else 0)
    return _split_impl(args[0], sp)


class ReplaceSliceOptions:
    def __init__(self, start: int = 0, stop: int = 0,
                 replacement: str = ""):
        self.start = start
        self.stop = stop
        self.replacement = replacement


@register_function("binary_replace_slice", Kind.SCALAR, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=ReplaceSliceOptions)
@register_function("utf8_replace_slice", Kind.SCALAR, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=ReplaceSliceOptions)
def _replace_slice(args, options):
    import pyarrow as pa
    st, sp, rep = options.start, options.stop, options.replacement
    return _host_elementwise(args[0], lambda s: s[:st] + rep + s[sp:],
                             pa.string())


@register_function("binary_join", Kind.SCALAR, 2,
                   null_handling=NullHandling.COMPUTED)
def _binary_join(args, options):
    """list<string> + separator -> joined string; null if the list or any
    element is null (``scalar_string_ascii.cc`` binary_join)."""
    import pyarrow as pa
    lists, sep = args
    if not isinstance(sep, Array):
        sv = sep.as_py()
        seps = [sv] * (len(lists) if hasattr(lists, "__len__") else 0)
    else:
        seps = sep.to_pylist()
    lv = lists.to_pylist()
    out = []
    for i, parts in enumerate(lv):
        s = seps[i] if i < len(seps) else None
        if parts is None or s is None or any(p is None for p in parts):
            out.append(None)
        else:
            out.append(s.join(parts))
    return _from_py(out, pa.string(), lists.capacity)


class ZeroFillOptions:
    def __init__(self, width: int = 0, padding: str = "0"):
        self.width = width
        self.padding = padding


class Utf8NormalizeOptions:
    def __init__(self, form: str = "NFC"):
        self.form = form


# utf8_reverse / utf8_swapcase moved to ops/strings.py: both now run on
# device (codepoint scatter / oracle-derived case LUT) — str.swapcase
# here even disagreed with utf8proc (full vs simple mapping of U+00DF).


@register_function("utf8_zero_fill", Kind.SCALAR, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=ZeroFillOptions)
def _utf8_zero_fill(args, options):
    import pyarrow as pa
    w = options.width
    p = options.padding
    if p == "0":
        return _host_elementwise(args[0], lambda s: s.zfill(w),
                                 pa.string())

    def zf(s):
        if len(s) >= w:
            return s
        sign = s[0] if s[:1] in "+-" else ""
        body = s[len(sign):]
        return sign + p * (w - len(s)) + body
    return _host_elementwise(args[0], zf, pa.string())


@register_function("utf8_normalize", Kind.SCALAR, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=Utf8NormalizeOptions)
def _utf8_normalize(args, options):
    import pyarrow as pa
    import unicodedata
    form = options.form
    return _host_elementwise(
        args[0], lambda s: unicodedata.normalize(form, s), pa.string())


@register_function("extract_regex_span", Kind.SCALAR, 1,
                   null_handling=NullHandling.COMPUTED,
                   options_class=ExtractRegexOptions)
def _extract_regex_span(args, options):
    """Named groups -> struct<group: fixed_size_list<int32, 2>, ...> of
    (byte offset, byte length) spans; null on no match. The pattern runs
    over UTF-8 BYTES (python re in bytes mode) so offsets match RE2's
    byte spans (scalar_string*.cc extract_regex_span)."""
    import pyarrow as pa
    rx = _compile(options.pattern)
    names = [n for n, _ in sorted(rx.groupindex.items(),
                                  key=lambda kv: kv[1])]
    if not names:
        raise ValueError("extract_regex_span requires named groups "
                         "(?P<name>...)")
    brx = re.compile(options.pattern.encode("utf-8"))

    def ext(s):
        m = brx.search(s.encode("utf-8"))
        if m is None:
            return None
        out = {}
        for n in names:
            st, en = m.span(n)
            out[n] = None if st < 0 else [st, en - st]
        return out
    out = [None if v is None else ext(v) for v in _pylist(args[0])]
    return _from_py(
        out, pa.struct([(n, pa.list_(pa.int32(), 2)) for n in names]),
        args[0].capacity)
