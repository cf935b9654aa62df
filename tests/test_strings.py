"""String kernel family vs the pyarrow oracle (reference tests:
scalar_string_test.cc)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow_tpu as at
from arrow_tpu import compute as atc

from oracle import assert_array_equal


def rand_strings(rng, n, max_len=12, charset="abcXYZ 019_", null_prob=0.15):
    out = []
    for _ in range(n):
        if rng.random() < null_prob:
            out.append(None)
        else:
            ln = int(rng.integers(0, max_len + 1))
            out.append("".join(rng.choice(list(charset), ln)))
    return pa.array(out, type=pa.string())


def check(fn, arr, *, atfn=None, **kw):
    expected = getattr(pc, fn)(arr, **kw)
    got = atc.call_function(atfn or fn, [at.array(arr)], **kw)
    assert_array_equal(got, expected, msg=fn)


SAMPLE = pa.array(["Hello World", "hEllO", "", None, "a1 b2", "ZZZ",
                   "  padded  ", "tail    "])


def test_lengths(rng):
    check("binary_length", SAMPLE)
    check("utf8_length", pa.array(["héllo", "日本", "", None, "ascii"]))


@pytest.mark.parametrize("fn", [
    "ascii_upper", "ascii_lower", "ascii_swapcase", "ascii_capitalize",
    "ascii_title", "ascii_reverse", "utf8_upper", "utf8_lower",
    "utf8_capitalize", "utf8_title"])
def test_case_transforms(rng, fn):
    check(fn, SAMPLE)
    check(fn, rand_strings(rng, 200))


@pytest.mark.parametrize("fn", [
    "ascii_is_alnum", "ascii_is_alpha", "ascii_is_decimal",
    "ascii_is_space", "ascii_is_printable", "ascii_is_lower",
    "ascii_is_upper", "ascii_is_title", "string_is_ascii",
    "utf8_is_alnum", "utf8_is_alpha", "utf8_is_digit", "utf8_is_space"])
def test_predicates(rng, fn):
    a = pa.array(["abc", "ABC", "a1", "123", "  ", "", None, "Hello World",
                  "Hello world", "hELLO", "a b", "A1B2"])
    check(fn, a)
    check(fn, rand_strings(rng, 150))


@pytest.mark.parametrize("pattern", ["ab", "a", "XY", "", "Hello",
                                     "not-there"])
def test_match_find_count(rng, pattern):
    a = pa.array(["abab", "aaab", "", None, "XYXY", "Hello World",
                  "aaaa", "abababa"])
    for fn in ["match_substring", "find_substring", "count_substring"]:
        check(fn, a, pattern=pattern)
    b = rand_strings(rng, 200, charset="abX")
    for fn in ["match_substring", "find_substring", "count_substring"]:
        if pattern:  # random sweep with non-empty patterns
            check(fn, b, pattern=pattern)


def test_count_overlapping_patterns():
    # greedy non-overlapping semantics: "abababa" has 2 "aba"s, "aaaa" 2 "aa"s
    a = pa.array(["abababa", "aaaa", "aaa", "ababab"])
    for p in ["aba", "aa", "ab", "abab"]:
        check("count_substring", a, pattern=p)


def test_match_ignore_case():
    a = pa.array(["AbC", "xyz", None])
    check("match_substring", a, pattern="bc", ignore_case=True)
    check("starts_with", a, pattern="aB", ignore_case=True)


@pytest.mark.parametrize("fn", ["starts_with", "ends_with"])
def test_starts_ends(rng, fn):
    a = pa.array(["abab", "ab", "b", "", None, "xyzab"])
    for p in ["ab", "b", "", "abababX"]:
        check(fn, a, pattern=p)


def test_match_like():
    a = pa.array(["foobar", "foo", "barfoo", "xfoox", None])
    for p in ["foo%", "%foo", "%foo%", "foo"]:
        check("match_like", a, pattern=p)


@pytest.mark.parametrize("start,stop,step", [
    (0, 2, 1), (1, None, 1), (-3, -1, 1), (2, 100, 1), (1, 100, 2),
    (-100, 3, 1), (4, 0, -2), (0, 0, 1)])
def test_slice(rng, start, stop, step):
    a = pa.array(["hello", "", "ab", None, "longer-string"])
    check("binary_slice", pa.array([s.encode() if s is not None else None
                                    for s in a.to_pylist()],
                                   type=pa.binary()),
          start=start, stop=stop, step=step)
    check("utf8_slice_codeunits", a, start=start, stop=stop, step=step)


@pytest.mark.parametrize("fn", ["utf8_trim", "utf8_ltrim", "utf8_rtrim"])
def test_trim(rng, fn):
    a = pa.array(["xxhixx", "  hi  ", "xhx", "", None, "xxxx"])
    check(fn, a, characters=" x")


@pytest.mark.parametrize("fn", ["utf8_trim_whitespace",
                                "utf8_ltrim_whitespace",
                                "utf8_rtrim_whitespace"])
def test_trim_whitespace(rng, fn):
    a = pa.array(["\t hi \n", "hi", "  ", "", None])
    check(fn, a)


@pytest.mark.parametrize("fn,width", [("utf8_lpad", 6), ("utf8_rpad", 6),
                                      ("utf8_center", 7),
                                      ("utf8_center", 6)])
def test_pad(rng, fn, width):
    a = pa.array(["ab", "abcdefgh", "", None])
    check(fn, a, width=width, padding="*")


def test_repeat():
    a = pa.array(["ab", "", None, "x"])
    expected = pc.binary_repeat(a, 3)
    got = atc.call_function("binary_repeat", [at.array(a), 3])
    assert_array_equal(got, expected, msg="binary_repeat")


def test_join_element_wise():
    a = pa.array(["a", None, "c", ""])
    b = pa.array(["1", "2", None, "4"])
    expected = pc.binary_join_element_wise(a, b, "-")
    got = atc.call_function("binary_join_element_wise",
                            [at.array(a), at.array(b), "-"])
    assert_array_equal(got, expected, msg="join")
    # 3 columns, empty separator (concat)
    expected = pc.binary_join_element_wise(a, b, a, "")
    got = atc.call_function("binary_join_element_wise",
                            [at.array(a), at.array(b), at.array(a), ""])
    assert_array_equal(got, expected, msg="concat")


@pytest.mark.parametrize("maxr", [None, 1, 2])
def test_replace_substring(maxr):
    a = pa.array(["ababab", "xx", "", None, "aba", "abababa"])
    kw = {"pattern": "ab", "replacement": "XYZ"}
    if maxr is not None:
        kw["max_replacements"] = maxr
    check("replace_substring", a, **kw)


def test_replace_shrink():
    a = pa.array(["hello world", "wow", None])
    check("replace_substring", a, pattern="o", replacement="")


@pytest.mark.parametrize("op", ["equal", "not_equal", "less", "greater",
                                "less_equal", "greater_equal"])
def test_string_compare_scalar(rng, op):
    a = pa.array(["apple", "banana", "", None, "app", "applf", "zz"])
    expected = getattr(pc, op)(a, "apple")
    got = atc.call_function(op, [at.array(a), "apple"])
    assert_array_equal(got, expected, msg=f"{op} scalar")


@pytest.mark.parametrize("op", ["equal", "less", "greater_equal"])
def test_string_compare_array(rng, op):
    a = pa.array(["apple", "b", "", None, "same", "prefix"])
    b = pa.array(["apples", "a", "", "x", "same", None])
    expected = getattr(pc, op)(a, b)
    got = atc.call_function(op, [at.array(a), at.array(b)])
    assert_array_equal(got, expected, msg=f"{op} array")


def test_dictionary_compare_scalar():
    a = pa.array(["x", "y", "x", None, "z"]).dictionary_encode()
    expected = pc.equal(a.cast(pa.string()), "x")
    got = atc.call_function("equal", [at.array(a), "x"])
    assert_array_equal(got, expected, msg="dict equal")


# ---- Unicode (codepoint-level) utf8_* kernels -------------------------------

_UNICODE_CORPUS = [
    "ß", "İstanbul", "ǆungla hello", "aΣb σc ΤΕΛΟΣ", "ı", "ﬃ",
    "Hello World", "", "ʼn", "ΐ", "µzµ", "ǅenan ǄUNGLA", "ᏣᎳᎩ",
    "𐐀𐐨 deseret", "ab_cd 12", "  spaced  ", "ÉÀ-éà", "ẞß",
    "数字123", "٣٤٥", "Ⅷ ⅷ", "¾", None, "x", "\tb c",
]


@pytest.mark.parametrize("fn", [
    "utf8_upper", "utf8_lower", "utf8_swapcase", "utf8_capitalize",
    "utf8_title", "utf8_reverse"])
def test_utf8_case_transforms_unicode(fn):
    """Oracle parity beyond ASCII (VERDICT r1 #9): case LUTs generated
    from pyarrow (tools/gen_unicode_tables.py) applied on device."""
    a = pa.array(_UNICODE_CORPUS)
    got = atc.call_function(fn, [at.array(a)]).to_pyarrow().to_pylist()
    assert got == pc.call_function(fn, [a]).to_pylist(), fn


@pytest.mark.parametrize("fn", [
    "utf8_is_alpha", "utf8_is_alnum", "utf8_is_digit", "utf8_is_decimal",
    "utf8_is_numeric", "utf8_is_space", "utf8_is_printable",
    "utf8_is_lower", "utf8_is_upper", "utf8_is_title"])
def test_utf8_predicates_unicode(fn):
    a = pa.array(_UNICODE_CORPUS)
    got = atc.call_function(fn, [at.array(a)]).to_pyarrow().to_pylist()
    assert got == pc.call_function(fn, [a]).to_pylist(), fn


def test_utf8_case_random_codepoints(rng):
    """Fuzz over the whole case-mapped range incl. multi-byte growth."""
    pool = ([chr(c) for c in rng.integers(0x20, 0x1E944, 400)
             if not (0xD800 <= c < 0xE000)] +
            [chr(c) for c in rng.integers(0x1E944, 0x10FFFF, 100)
             if not (0xD800 <= c < 0xE000)])
    strings = ["".join(rng.choice(pool, rng.integers(0, 12)))
               for _ in range(64)]
    a = pa.array(strings)
    for fn in ("utf8_upper", "utf8_lower", "utf8_swapcase", "utf8_title"):
        got = atc.call_function(fn, [at.array(a)]).to_pyarrow().to_pylist()
        assert got == pc.call_function(fn, [a]).to_pylist(), fn
