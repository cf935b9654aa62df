"""Regex/split host-boundary kernels + new scalar/vector additions vs the
pyarrow oracle (reference: scalar_string_*.cc regex + split kernels,
scalar_nested.cc list_element/list_slice, vector_swizzle.cc)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow_tpu as at
from arrow_tpu.compute import call_function as cf
from arrow_tpu.compute.scalar import Scalar
from arrow_tpu.ops.nested import ListSliceOptions
from arrow_tpu.ops.strings import (MatchSubstringOptions,
                                   ReplaceSubstringOptions)
from arrow_tpu.ops.strings_regex import (ExtractRegexOptions,
                                         SplitPatternOptions)

A = pa.array(["hello world", "a-b-c", None, "", "  pad  "])


def test_match_count_find_regex():
    aa = at.array(A)
    for fn, kw in [("match_substring_regex", dict(pattern="^h.*d$")),
                   ("count_substring_regex", dict(pattern="[lo]")),
                   ("find_substring_regex", dict(pattern="o"))]:
        got = cf(fn, [aa], options=MatchSubstringOptions(**kw)).to_pylist()
        ref = getattr(pc, fn)(A, **kw).to_pylist()
        assert got == ref, (fn, got, ref)


def test_replace_regex():
    aa = at.array(A)
    got = cf("replace_substring_regex", [aa],
             options=ReplaceSubstringOptions(
                 pattern="[aeiou]", replacement="_")).to_pylist()
    assert got == pc.replace_substring_regex(
        A, pattern="[aeiou]", replacement="_").to_pylist()


def test_split_pattern_and_regex():
    aa = at.array(A)
    for ms in (None, 1):
        got = cf("split_pattern", [aa],
                 options=SplitPatternOptions("-", ms)).to_pylist()
        ref = pc.split_pattern(A, pattern="-", max_splits=ms).to_pylist()
        assert got == ref
    got = cf("split_pattern_regex", [aa],
             options=SplitPatternOptions("[-l]")).to_pylist()
    assert got == pc.split_pattern_regex(A, pattern="[-l]").to_pylist()


def test_split_whitespace():
    # avoid TRAILING whitespace: the reference finder reads one byte past
    # the string end there (scalar_string_ascii.cc:2900-2904), so its
    # output depends on pool contents; interior/leading runs agree
    B = pa.array(["hello world", "a  b", None, "", " lead"])
    got = cf("utf8_split_whitespace", [at.array(B)]).to_pylist()
    assert got == pc.utf8_split_whitespace(B).to_pylist()


def test_extract_regex_struct():
    e = pa.array(["ab12", "xy", None])
    pat = r"(?P<l>[a-z]+)(?P<d>\d+)"
    got = cf("extract_regex", [at.array(e)],
             options=ExtractRegexOptions(pat)).to_pylist()
    assert got == pc.extract_regex(e, pattern=pat).to_pylist()


def test_list_element_and_slice():
    lt = pa.array([[1, 2, 3], [4, 5], [6, 7]])
    la = at.array(lt)
    got = cf("list_element", [la, Scalar(1, at.int64)]).to_pylist()
    assert got == pc.list_element(lt, 1).to_pylist()
    # short/null lists: pyarrow raises; we emit null (documented
    # relaxation — no data-dependent errors on device)
    lt2 = pa.array([[1, 2], [3], None])
    got2 = cf("list_element", [at.array(lt2),
                               Scalar(1, at.int64)]).to_pylist()
    assert got2 == [2, None, None]
    out = cf("list_slice", [la],
             options=ListSliceOptions(start=1, stop=3)).to_pylist()
    assert out == pc.list_slice(lt, start=1, stop=3).to_pylist()


def test_selection_aliases_and_inverse_permutation():
    a = pa.array([1, None, 3, None, 5])
    m = pa.array([True, False, True, True, False])
    assert cf("array_filter", [at.array(a), at.array(m)]).to_pylist() == \
        pc.array_filter(a, m).to_pylist()
    idx = pa.array([0, 2, 4], type=pa.int32())
    assert cf("array_take", [at.array(a), at.array(idx)]).to_pylist() == \
        pc.array_take(a, idx).to_pylist()
    assert cf("drop_null", [at.array(a)]).to_pylist() == \
        pc.drop_null(a).to_pylist()
    perm = pa.array([2, 0, 1])
    assert cf("inverse_permutation", [at.array(perm)]).to_pylist() == \
        pc.inverse_permutation(perm).to_pylist()


def test_hypot_count_all_and_hash_stub():
    a = pa.array([3.0, 1.0])
    b = pa.array([4.0, 1.0])
    np.testing.assert_allclose(
        cf("hypot", [at.array(a), at.array(b)]).to_pylist(),
        pc.hypot(a, b).to_pylist())
    assert cf("count_all",
              [at.array(pa.array([1, None, 3]))]).as_py() == 3
    with pytest.raises(ValueError, match="group_by"):
        cf("hash_sum", [at.array(a)])


def test_timezone_kernels():
    import datetime as dtm
    from arrow_tpu.ops.temporal import AssumeTimezoneOptions
    ts = pa.array([dtm.datetime(2020, 6, 1, 12),
                   dtm.datetime(2020, 1, 1, 12), None])
    ours = cf("assume_timezone", [at.array(ts)],
              options=AssumeTimezoneOptions("America/New_York"))
    ref = pc.assume_timezone(ts, timezone="America/New_York")
    assert ours.to_pyarrow().equals(ref)
    assert cf("is_dst", [ours]).to_pylist() == pc.is_dst(ref).to_pylist()
    assert cf("local_timestamp", [ours]).to_pyarrow().equals(
        pc.local_timestamp(ref))


def test_binary_join_and_replace_slice():
    from arrow_tpu.ops.strings_regex import ReplaceSliceOptions
    a = pa.array(["hello", "x", None])
    got = cf("binary_replace_slice", [at.array(a)],
             options=ReplaceSliceOptions(1, 3, "XY")).to_pylist()
    assert got == pc.binary_replace_slice(
        a, start=1, stop=3, replacement="XY").to_pylist()
    lj = pa.array([["a", "b"], ["c"], None, ["x", None]])
    got = cf("binary_join", [at.array(lj),
                             Scalar("-", at.string)]).to_pylist()
    assert got == pc.binary_join(lj, "-").to_pylist()


def test_scatter_round_binary_winsorize_utf8_extras():
    from arrow_tpu.ops.vector_misc import ScatterOptions
    from arrow_tpu.ops.strings_regex import (Utf8NormalizeOptions,
                                             ZeroFillOptions)
    from arrow_tpu.ops.aggregates_order import WinsorizeOptions
    a = pa.array([10, 20, 30])
    idx = pa.array([2, 0, 1])
    assert cf("scatter", [at.array(a), at.array(idx)]).to_pylist() == \
        pc.scatter(a, idx).to_pylist()
    assert cf("scatter", [at.array(a), at.array(idx)],
              options=ScatterOptions(5)).to_pylist() == \
        pc.scatter(a, idx, max_index=5).to_pylist()
    s = pa.array(["x", "yy", "zzz"])
    assert cf("scatter", [at.array(s), at.array(idx)]).to_pylist() == \
        pc.scatter(s, idx).to_pylist()
    np.testing.assert_allclose(
        cf("round_binary", [at.array(pa.array([1.234, 5.678])),
                            at.array(pa.array([1, 2]))]).to_pylist(),
        pc.round_binary(pa.array([1.234, 5.678]),
                        pa.array([1, 2])).to_pylist())
    w = pa.array([1., 2., 3., 4., 100.])
    assert cf("winsorize", [at.array(w)],
              options=WinsorizeOptions(0.2, 0.8)).to_pylist() == \
        pc.winsorize(w, lower_limit=0.2, upper_limit=0.8).to_pylist()
    u = pa.array(["abç", "aBc", None])
    assert cf("utf8_reverse", [at.array(u)]).to_pylist() == \
        pc.utf8_reverse(u).to_pylist()
    assert cf("utf8_swapcase", [at.array(u)]).to_pylist() == \
        pc.utf8_swapcase(u).to_pylist()
    z = pa.array(["-42", "7"])
    assert cf("utf8_zero_fill", [at.array(z)],
              options=ZeroFillOptions(5)).to_pylist() == \
        pc.utf8_zero_fill(z, width=5).to_pylist()
    n = pa.array(["é"])
    assert cf("utf8_normalize", [at.array(n)],
              options=Utf8NormalizeOptions("NFD")).to_pylist() == \
        pc.utf8_normalize(n, form="NFD").to_pylist()


def test_extract_regex_span():
    s = pa.array(['héllo12', None, 'x', 'a1b22', ''])
    got = cf("extract_regex_span", [at.array(s)],
             pattern=r'(?P<d>\d+)').to_pyarrow().to_pylist()
    assert got == pc.extract_regex_span(s, pattern=r'(?P<d>\d+)').to_pylist()


def test_meta_binary_set_lookup():
    v = pa.array([1, 2, 3, None])
    vs = pa.array([2, 9])
    got = cf("is_in_meta_binary", [at.array(v), at.array(vs)])
    assert got.to_pylist() == pc.is_in_meta_binary(v, vs).to_pylist()
    got = cf("index_in_meta_binary", [at.array(v), at.array(vs)])
    assert got.to_pylist() == pc.index_in_meta_binary(v, vs).to_pylist()


def test_pushdown_encode_large_column():
    """Dictionary-pushdown fast path (ops/strings_regex._via_pc): columns
    >= _PUSHDOWN_MIN_ROWS distinct-encode ON DEVICE and only the unique
    slots cross to RE2. This is the first test to reach the 65,536-row
    activation threshold (VERDICT r3 weak #1: the path previously had
    zero coverage and its first real execution was the driver bench,
    where the encode compile crashed — tools/reports/pushdown_bisect_r4
    .txt)."""
    from arrow_tpu.ops import strings_regex as sre
    n = sre._PUSHDOWN_MIN_ROWS + 1024
    rng = np.random.default_rng(7)
    words = np.array([f"id{i % 977:03d}x{i % 31}" for i in range(4096)])
    vals = words[rng.integers(0, len(words), n)]
    # a few nulls: pushdown must preserve the validity mask
    pa_vals = pa.array([None if i % 9973 == 0 else v
                        for i, v in enumerate(vals.tolist())])
    aa = at.array(pa_vals)
    pattern = r"7x[12]?[0-9]$"

    calls = {"n": 0}
    orig = sre._pushdown_encode

    def counting(a):
        calls["n"] += 1
        return orig(a)
    sre._pushdown_encode = counting
    try:
        got = cf("match_substring_regex", [aa],
                 options=MatchSubstringOptions(pattern))
        ref = pc.match_substring_regex(pa_vals, pattern)
        assert got.to_pylist() == ref.to_pylist()
        # varlen output rides back through the device gather too
        got2 = cf("replace_substring_regex", [aa],
                  options=ReplaceSubstringOptions(
                      pattern="x[0-9]+$", replacement="!"))
        ref2 = pc.replace_substring_regex(
            pa_vals, pattern="x[0-9]+$", replacement="!")
        assert got2.to_pylist() == ref2.to_pylist()
    finally:
        sre._pushdown_encode = orig
    assert calls["n"] >= 2, "pushdown fast path was not exercised"


def test_pushdown_slot_overflow_falls_back():
    """Distinct strings longer than the 64-byte slot must fall back to the
    direct host hop (slot_error path) and still be correct."""
    from arrow_tpu.ops import strings_regex as sre
    n = sre._PUSHDOWN_MIN_ROWS
    long_word = "x" * (sre._PUSHDOWN_SLOT_BYTES + 9)
    vals = [long_word if i % 3 == 0 else f"w{i % 50}" for i in range(n)]
    pa_vals = pa.array(vals)
    got = cf("match_substring_regex", [at.array(pa_vals)],
             options=MatchSubstringOptions("x{65}"))
    ref = pc.match_substring_regex(pa_vals, "x{65}")
    assert got.to_pylist() == ref.to_pylist()
