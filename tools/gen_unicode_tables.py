"""Generate arrow_tpu/ops/_unicode_tables.npz.

Every table is derived from pyarrow's own utf8proc-backed kernels run on
single-codepoint strings, so the device LUTs match the oracle bit-for-bit
(reference: cpp/src/arrow/compute/kernels/scalar_string_utf8.cc —
lut_*_codepoint tables at :29, character predicates at :125-175).

Single-char algebra for the case predicates (CharacterPredicateUnicode
folds ALL/ANY over the string; on one cased-or-not codepoint):
  pc.utf8_is_lower(chr(cp))  == IsCased(cp) && IsLowerCaseChar(cp)
                             == IsLowerCaseChar(cp)   (lower => cased)
  pc.utf8_is_title(chr(cp))  == IsCased(cp) && !IsLowerCaseChar(cp)
  => IsCased(cp) = is_lower_single | is_title_single

Run: python tools/gen_unicode_tables.py
"""
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

N = 0x110000
iden = np.arange(N, dtype=np.uint32)
cps = [cp for cp in range(N) if not (0xD800 <= cp < 0xE000)]
cps_np = np.asarray(cps)
chars = pa.array([chr(cp) for cp in cps])


def derive_map(fn_name):
    out = iden.copy()                     # identity default (+ surrogates)
    mapped = pc.call_function(fn_name, [chars]).to_pylist()
    for cp, s in zip(cps, mapped):
        assert len(s) == 1, (fn_name, hex(cp), s)   # simple 1:1 mappings
        out[cp] = ord(s)
    return out


def derive_pred(fn_name):
    out = np.zeros(N, dtype=bool)
    out[cps_np] = np.asarray(
        pc.call_function(fn_name, [chars]).to_pylist(), dtype=bool)
    return out


upper = derive_map("utf8_upper")
lower = derive_map("utf8_lower")
swap = derive_map("utf8_swapcase")

PRED_BITS = ["alpha", "alnum", "digit", "decimal", "numeric", "space",
             "printable", "lower", "upper", "title_char", "cased"]
preds = {
    "alpha": derive_pred("utf8_is_alpha"),
    "alnum": derive_pred("utf8_is_alnum"),
    "digit": derive_pred("utf8_is_digit"),
    "decimal": derive_pred("utf8_is_decimal"),
    "numeric": derive_pred("utf8_is_numeric"),
    "space": derive_pred("utf8_is_space"),
    "printable": derive_pred("utf8_is_printable"),
    "lower": derive_pred("utf8_is_lower"),       # == IsLowerCaseChar
    "upper": derive_pred("utf8_is_upper"),       # == IsUpperCaseChar
    "title_char": derive_pred("utf8_is_title"),  # == cased && !lower
}
preds["cased"] = preds["lower"] | preds["title_char"]
flags = np.zeros(N, dtype=np.uint16)
for i, name in enumerate(PRED_BITS):
    flags |= preds[name].astype(np.uint16) << i

def u8len(c):
    c = c.astype(np.int64)
    return 1 + (c >= 0x80) + (c >= 0x800) + (c >= 0x10000)

for t in (upper, lower, swap):              # 2x output pool invariant
    assert (u8len(t) <= 2 * u8len(iden)).all()

hi = int(max(np.nonzero(upper != iden)[0].max(),
             np.nonzero(lower != iden)[0].max(),
             np.nonzero(swap != iden)[0].max(),
             np.nonzero(preds["cased"])[0].max())) + 1
print("case table bound:", hex(hi))

np.savez_compressed(
    "/root/repo/arrow_tpu/ops/_unicode_tables.npz",
    bound=np.int32(hi),
    upper=upper[:hi], lower=lower[:hi], swapcase=swap[:hi],
    flags=flags, pred_bits=np.array(PRED_BITS))
print("wrote arrow_tpu/ops/_unicode_tables.npz")
