"""Logical data types for the TPU-native columnar engine.

Mirrors the role of Arrow's ``DataType`` tree (reference:
``cpp/src/arrow/type.h``) but is deliberately small: a frozen, hashable
dataclass hierarchy that maps each logical type onto a TPU-friendly storage
representation (a JAX dtype plus optional offsets/child structure).

Storage conventions (decided up front, per SURVEY.md §7):
  * numeric / temporal types -> a single ``values`` array of the storage dtype
  * bool -> ``values`` is a bool array (bytemask, NOT Arrow's packed bits;
    packed bitmaps are hostile to the VPU — we pack/unpack only at the
    pyarrow interop boundary)
  * string/binary -> ``offsets`` (int32, n+1) + ``values`` (uint8 byte pool)
  * dictionary -> ``values`` holds indices; ``dictionary`` child Array holds
    the dictionary values
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Optional

import numpy as np

__all__ = [
    "DataType",
    "IntegerType",
    "FloatType",
    "BoolType",
    "StringType",
    "BinaryType",
    "TimestampType",
    "Date32Type",
    "Date64Type",
    "Time32Type",
    "Time64Type",
    "DurationType",
    "DecimalType",
    "DictionaryType",
    "ListType",
    "StructType",
    "UnionType",
    "FixedSizeBinaryType", "ExtensionType",
    "NullType",
    "int8", "int16", "int32", "int64",
    "uint8", "uint16", "uint32", "uint64",
    "float16", "float32", "float64",
    "bool_", "string", "binary", "null",
    "date32", "date64",
    "timestamp", "time32", "time64", "duration",
    "decimal128", "dictionary", "list_", "struct", "union", "fixed_size_binary",
    "from_pyarrow_type", "to_pyarrow_type",
]


@dataclass(frozen=True)
class DataType:
    """Base logical type. Frozen + hashable so types can key kernel dispatch
    tables (the role of ``TypeHolder`` in reference ``compute/kernel.h``)."""

    @property
    def id(self) -> str:
        raise NotImplementedError

    # ---- storage mapping -------------------------------------------------
    @property
    def storage_np(self) -> np.dtype:
        """NumPy dtype of the primary ``values`` buffer on device."""
        raise NotImplementedError(f"no storage dtype for {self}")

    @property
    def is_primitive(self) -> bool:
        """One fixed-width values buffer (plus validity)."""
        return False

    @property
    def is_varlen(self) -> bool:
        """offsets + byte pool layout (string/binary)."""
        return False

    @property
    def is_nested(self) -> bool:
        return False

    @property
    def is_numeric(self) -> bool:
        return False

    @property
    def is_integer(self) -> bool:
        return False

    @property
    def is_floating(self) -> bool:
        return False

    @property
    def is_signed_integer(self) -> bool:
        return False

    @property
    def is_unsigned_integer(self) -> bool:
        return False

    @property
    def is_temporal(self) -> bool:
        return False

    @property
    def bit_width(self) -> int:
        return 8 * self.storage_np.itemsize

    def __str__(self) -> str:
        return self.id


@dataclass(frozen=True)
class NullType(DataType):
    @property
    def id(self) -> str:
        return "null"


@dataclass(frozen=True)
class IntegerType(DataType):
    bits: int
    signed: bool

    @property
    def id(self) -> str:
        return f"{'int' if self.signed else 'uint'}{self.bits}"

    @property
    def storage_np(self) -> np.dtype:
        return np.dtype(f"{'i' if self.signed else 'u'}{self.bits // 8}")

    @property
    def is_primitive(self) -> bool:
        return True

    @property
    def is_numeric(self) -> bool:
        return True

    @property
    def is_integer(self) -> bool:
        return True

    @property
    def is_signed_integer(self) -> bool:
        return self.signed

    @property
    def is_unsigned_integer(self) -> bool:
        return not self.signed


@dataclass(frozen=True)
class FloatType(DataType):
    bits: int

    @property
    def id(self) -> str:
        return {16: "halffloat", 32: "float", 64: "double"}[self.bits]

    @property
    def storage_np(self) -> np.dtype:
        return np.dtype(f"f{self.bits // 8}")

    @property
    def is_primitive(self) -> bool:
        return True

    @property
    def is_numeric(self) -> bool:
        return True

    @property
    def is_floating(self) -> bool:
        return True


@dataclass(frozen=True)
class BoolType(DataType):
    @property
    def id(self) -> str:
        return "bool"

    @property
    def storage_np(self) -> np.dtype:
        return np.dtype(np.bool_)

    @property
    def is_primitive(self) -> bool:
        return True

    @property
    def bit_width(self) -> int:
        return 1  # logical width (Arrow packs bools; we store a bytemask)


@dataclass(frozen=True)
class StringType(DataType):
    @property
    def id(self) -> str:
        return "string"

    @property
    def storage_np(self) -> np.dtype:
        return np.dtype(np.uint8)  # byte pool

    @property
    def is_varlen(self) -> bool:
        return True


@dataclass(frozen=True)
class BinaryType(DataType):
    @property
    def id(self) -> str:
        return "binary"

    @property
    def storage_np(self) -> np.dtype:
        return np.dtype(np.uint8)

    @property
    def is_varlen(self) -> bool:
        return True


@dataclass(frozen=True)
class FixedSizeBinaryType(DataType):
    byte_width: int

    @property
    def id(self) -> str:
        return f"fixed_size_binary[{self.byte_width}]"

    @property
    def storage_np(self) -> np.dtype:
        return np.dtype(np.uint8)

    @property
    def is_primitive(self) -> bool:
        return True

    @property
    def bit_width(self) -> int:
        return 8 * self.byte_width


@dataclass(frozen=True)
class TimestampType(DataType):
    unit: str = "us"  # s|ms|us|ns
    tz: Optional[str] = None

    @property
    def id(self) -> str:
        return f"timestamp[{self.unit}{', tz=' + self.tz if self.tz else ''}]"

    @property
    def storage_np(self) -> np.dtype:
        return np.dtype(np.int64)

    @property
    def is_primitive(self) -> bool:
        return True

    @property
    def is_temporal(self) -> bool:
        return True


@dataclass(frozen=True)
class Date32Type(DataType):
    @property
    def id(self) -> str:
        return "date32[day]"

    @property
    def storage_np(self) -> np.dtype:
        return np.dtype(np.int32)

    @property
    def is_primitive(self) -> bool:
        return True

    @property
    def is_temporal(self) -> bool:
        return True


@dataclass(frozen=True)
class Date64Type(DataType):
    @property
    def id(self) -> str:
        return "date64[ms]"

    @property
    def storage_np(self) -> np.dtype:
        return np.dtype(np.int64)

    @property
    def is_primitive(self) -> bool:
        return True

    @property
    def is_temporal(self) -> bool:
        return True


@dataclass(frozen=True)
class Time32Type(DataType):
    unit: str = "ms"  # s|ms

    @property
    def id(self) -> str:
        return f"time32[{self.unit}]"

    @property
    def storage_np(self) -> np.dtype:
        return np.dtype(np.int32)

    @property
    def is_primitive(self) -> bool:
        return True

    @property
    def is_temporal(self) -> bool:
        return True


@dataclass(frozen=True)
class Time64Type(DataType):
    unit: str = "us"  # us|ns

    @property
    def id(self) -> str:
        return f"time64[{self.unit}]"

    @property
    def storage_np(self) -> np.dtype:
        return np.dtype(np.int64)

    @property
    def is_primitive(self) -> bool:
        return True

    @property
    def is_temporal(self) -> bool:
        return True


@dataclass(frozen=True)
class DurationType(DataType):
    unit: str = "us"

    @property
    def id(self) -> str:
        return f"duration[{self.unit}]"

    @property
    def storage_np(self) -> np.dtype:
        return np.dtype(np.int64)

    @property
    def is_primitive(self) -> bool:
        return True

    @property
    def is_temporal(self) -> bool:
        return True


@dataclass(frozen=True)
class DecimalType(DataType):
    """decimal128/decimal256 scaled-integer device storage.

    Precision <= 18: ONE int64 lane (10^18 < 2^63, always fits).
    Precision  > 18 (``wide``): TWO-limb (cap, 2) int64 storage
    [low 64 bits, high signed 64] — full decimal128 magnitude
    (``util/decimal.h:410`` int128 semantics). The representation is
    chosen STATICALLY by precision so join sides / stream batches of
    one logical type never mix limb layouts. decimal256 uses the same
    two limbs; values beyond +-2^127 scaled units raise at ingest
    (the documented remaining contract). ``bits`` records the WIRE
    width (128 or 256) so round trips re-emit the original Arrow
    type."""

    precision: int
    scale: int
    bits: int = 128

    @property
    def id(self) -> str:
        return f"decimal{self.bits}({self.precision}, {self.scale})"

    @property
    def wide(self) -> bool:
        return self.precision > 18

    @property
    def storage_np(self) -> np.dtype:
        return np.dtype(np.int64)

    @property
    def is_primitive(self) -> bool:
        return True


@dataclass(frozen=True)
class DictionaryType(DataType):
    index_type: DataType
    value_type: DataType
    ordered: bool = False
    # ingest-time encoding (TPU-native fast path for low-cardinality
    # string columns — the engine-internal analog of the reference's
    # dictionary kernels' fast paths): the column's LOGICAL type is
    # ``value_type``; interop decodes on export so users round-trip
    # plain strings. Excluded from equality/hash: engine-internal
    # schema checks treat it as an ordinary dictionary type.
    transparent: bool = dataclasses.field(default=False, compare=False)

    @property
    def id(self) -> str:
        return f"dictionary<values={self.value_type}, indices={self.index_type}>"

    @property
    def storage_np(self) -> np.dtype:
        return self.index_type.storage_np

    @property
    def is_primitive(self) -> bool:
        return True  # indices are primitive; dictionary is a child


@dataclass(frozen=True)
class ListType(DataType):
    value_type: DataType

    @property
    def id(self) -> str:
        return f"list<item: {self.value_type}>"

    @property
    def is_nested(self) -> bool:
        return True


@dataclass(frozen=True)
class RunEndEncodedType(DataType):
    """Run-end-encoded layout (Arrow RunEndEncoded). Engine mapping: the
    Array's ``offsets[1:]`` hold the run ends (offsets[0]=0 — monotone like
    varlen offsets), ``values`` the run values, ``validity`` per run."""

    run_end_type: DataType
    value_type: DataType

    @property
    def id(self) -> str:
        return (f"run_end_encoded<run_ends: {self.run_end_type}, "
                f"values: {self.value_type}>")

    @property
    def is_nested(self) -> bool:
        return True


@dataclass(frozen=True)
class StructType(DataType):
    fields: tuple  # tuple[tuple[str, DataType], ...]

    @property
    def id(self) -> str:
        inner = ", ".join(f"{n}: {t}" for n, t in self.fields)
        return f"struct<{inner}>"

    @property
    def is_nested(self) -> bool:
        return True


@dataclass(frozen=True)
class UnionType(DataType):
    """Sparse or dense union (``type.h`` UnionType; layout
    ``Columnar.rst`` union section). Engine mapping: ``values`` holds the
    int8 type-code buffer, ``offsets`` the int32 value offsets (dense
    only), children in the ``children`` slot. ``type_codes[i]`` is the
    code of child i (codes need not be 0..n-1)."""

    fields: tuple       # tuple[tuple[str, DataType], ...]
    type_codes: tuple   # tuple[int, ...], parallel to fields
    mode: str = "sparse"   # "sparse" | "dense"

    @property
    def id(self) -> str:
        inner = ", ".join(f"{n}: {t}" for n, t in self.fields)
        return f"union<{inner}; mode={self.mode}>"

    @property
    def is_nested(self) -> bool:
        return True

    def child_index_of_code(self, code: int) -> int:
        return self.type_codes.index(code)


@dataclass(frozen=True)
class MonthIntervalType(DataType):
    """Calendar month interval (``type.h`` MonthIntervalType): one int32
    month count per row — plain primitive storage."""

    @property
    def id(self) -> str:
        return "month_interval"

    @property
    def storage_np(self) -> np.dtype:
        return np.dtype(np.int32)

    @property
    def is_primitive(self) -> bool:
        return True


# ---- canonical singletons -------------------------------------------------
int8 = IntegerType(8, True)
int16 = IntegerType(16, True)
int32 = IntegerType(32, True)
int64 = IntegerType(64, True)
uint8 = IntegerType(8, False)
uint16 = IntegerType(16, False)
uint32 = IntegerType(32, False)
uint64 = IntegerType(64, False)
float16 = FloatType(16)
float32 = FloatType(32)
float64 = FloatType(64)
bool_ = BoolType()
string = StringType()
binary = BinaryType()
null = NullType()
date32 = Date32Type()
date64 = Date64Type()

ALL_INTEGER = (int8, int16, int32, int64, uint8, uint16, uint32, uint64)
ALL_FLOATING = (float16, float32, float64)
ALL_NUMERIC = ALL_INTEGER + ALL_FLOATING


# ---- derived layouts (subclasses share their base's array machinery) -------

@dataclass(frozen=True)
class DayTimeIntervalType(StructType):
    """Interval of (days int32, milliseconds int32) (``type.h``
    DayTimeIntervalType). Engine layout: a StructType subclass — the
    components ride as struct children so every nested kernel (take,
    filter, concat) applies unchanged; only interop repacks the 8-byte
    pairs."""

    fields: tuple = (("days", int32), ("milliseconds", int32))

    @property
    def id(self) -> str:
        return "day_time_interval"


@dataclass(frozen=True)
class MonthDayNanoIntervalType(StructType):
    """Interval of (months int32, days int32, nanoseconds int64)
    (``type.h`` MonthDayNanoIntervalType); struct-subclass layout like
    DayTimeIntervalType."""

    fields: tuple = (("months", int32), ("days", int32),
                     ("nanoseconds", int64))

    @property
    def id(self) -> str:
        return "month_day_nano_interval"


@dataclass(frozen=True)
class MapType(ListType):
    """map<K, V> (``type.h`` MapType) = list<struct<key, value>> with the
    entries struct in the list child slot — the physical layout Arrow
    itself uses (Columnar.rst map layout), so list kernels apply as-is."""

    keys_sorted: bool = False

    @property
    def id(self) -> str:
        kt, it = self.key_type, self.item_type
        return f"map<{kt}, {it}{', keys_sorted' if self.keys_sorted else ''}>"

    @property
    def key_type(self) -> DataType:
        return self.value_type.fields[0][1]

    @property
    def item_type(self) -> DataType:
        return self.value_type.fields[1][1]


@dataclass(frozen=True)
class FixedSizeListType(ListType):
    """fixed_size_list<T, k> (``type.h`` FixedSizeListType). Engine
    layout: identical to list<T> with offsets synthesized as
    ``arange(cap+1) * k`` at ingest — one int32 per row buys every list
    kernel unchanged."""

    list_size: int = 0

    @property
    def id(self) -> str:
        return f"fixed_size_list<{self.value_type}, {self.list_size}>"


month_interval = MonthIntervalType()
day_time_interval = DayTimeIntervalType()
month_day_nano_interval = MonthDayNanoIntervalType()


def map_(key_type: DataType, item_type: DataType,
         keys_sorted: bool = False) -> MapType:
    return MapType(StructType((("key", key_type), ("value", item_type))),
                   keys_sorted)


def fixed_size_list(value_type: DataType, list_size: int) -> FixedSizeListType:
    return FixedSizeListType(value_type, list_size)


def timestamp(unit: str = "us", tz: Optional[str] = None) -> TimestampType:
    return TimestampType(unit, tz)


def time32(unit: str = "ms") -> Time32Type:
    return Time32Type(unit)


def time64(unit: str = "us") -> Time64Type:
    return Time64Type(unit)


def duration(unit: str = "us") -> DurationType:
    return DurationType(unit)


def decimal128(precision: int, scale: int = 0) -> DecimalType:
    return DecimalType(precision, scale)


def dictionary(index_type: DataType, value_type: DataType,
               ordered: bool = False) -> DictionaryType:
    return DictionaryType(index_type, value_type, ordered)


def list_(value_type: DataType) -> ListType:
    return ListType(value_type)


def run_end_encoded(run_end_type: DataType,
                    value_type: DataType) -> RunEndEncodedType:
    return RunEndEncodedType(run_end_type, value_type)


def struct(fields) -> StructType:
    return StructType(tuple((n, t) for n, t in fields))


def union(fields, type_codes=None, mode: str = "sparse") -> UnionType:
    fs = tuple((n, t) for n, t in fields)
    codes = tuple(type_codes) if type_codes is not None \
        else tuple(range(len(fs)))
    return UnionType(fs, codes, mode)


def fixed_size_binary(byte_width: int) -> FixedSizeBinaryType:
    return FixedSizeBinaryType(byte_width)



@dataclass(frozen=True)
class ExtensionType(DataType):
    """Arrow extension type (``extension_type.h:93``): a registered NAMED
    wrapper around a storage type. The on-device layout IS the storage
    layout — every kernel and interop path operates on storage — and the
    original pyarrow type object rides along (excluded from eq/hash) for
    lossless reconstruction at the boundary."""
    storage: DataType
    ext_name: str
    pa_type: object = dataclasses.field(compare=False, hash=False,
                                        repr=False, default=None)

    @property
    def id(self) -> str:
        return f"extension<{self.ext_name}, {self.storage.id}>"

    @property
    def storage_np(self):
        return self.storage.storage_np

    @property
    def is_primitive(self):
        return self.storage.is_primitive

    @property
    def is_varlen(self):
        return self.storage.is_varlen

    @property
    def is_nested(self):
        return self.storage.is_nested

    @property
    def is_numeric(self):
        return self.storage.is_numeric

    @property
    def is_integer(self):
        return self.storage.is_integer

    @property
    def is_floating(self):
        return self.storage.is_floating

    @property
    def is_signed_integer(self):
        return self.storage.is_signed_integer

    @property
    def is_unsigned_integer(self):
        return self.storage.is_unsigned_integer

    @property
    def is_temporal(self):
        return self.storage.is_temporal

    @property
    def bit_width(self):
        return self.storage.bit_width


# ---- pyarrow bridge ---------------------------------------------------------

def to_pyarrow_type(t: DataType):
    import pyarrow as pa

    if isinstance(t, ExtensionType):
        if t.pa_type is not None:
            return t.pa_type
        return to_pyarrow_type(t.storage)
    if isinstance(t, NullType):
        return pa.null()
    if isinstance(t, IntegerType):
        return getattr(pa, t.id)()
    if isinstance(t, FloatType):
        return {16: pa.float16, 32: pa.float32, 64: pa.float64}[t.bits]()
    if isinstance(t, BoolType):
        return pa.bool_()
    if isinstance(t, StringType):
        return pa.string()
    if isinstance(t, BinaryType):
        return pa.binary()
    if isinstance(t, FixedSizeBinaryType):
        return pa.binary(t.byte_width)
    if isinstance(t, TimestampType):
        return pa.timestamp(t.unit, t.tz)
    if isinstance(t, Date32Type):
        return pa.date32()
    if isinstance(t, Date64Type):
        return pa.date64()
    if isinstance(t, Time32Type):
        return pa.time32(t.unit)
    if isinstance(t, Time64Type):
        return pa.time64(t.unit)
    if isinstance(t, DurationType):
        return pa.duration(t.unit)
    if isinstance(t, DecimalType):
        if t.bits == 256:
            return pa.decimal256(t.precision, t.scale)
        return pa.decimal128(t.precision, t.scale)
    if isinstance(t, MonthIntervalType):
        # pyarrow<=25 exposes NO python constructor/wrapper for
        # month_interval (pc.month_interval_between's own result cannot
        # be wrapped: KeyError 21) — materialize as the storage type
        if hasattr(pa, "month_interval"):
            return pa.month_interval()
        return pa.int32()
    if isinstance(t, DayTimeIntervalType):
        if hasattr(pa, "day_time_interval"):
            return pa.day_time_interval()
        return pa.struct([("days", pa.int32()),
                          ("milliseconds", pa.int32())])
    if isinstance(t, MonthDayNanoIntervalType):
        return pa.month_day_nano_interval()
    if isinstance(t, DictionaryType):
        if t.transparent:
            # ingest-encoded: the logical (user-visible) type
            return to_pyarrow_type(t.value_type)
        return pa.dictionary(to_pyarrow_type(t.index_type),
                             to_pyarrow_type(t.value_type), t.ordered)
    if isinstance(t, MapType):
        return pa.map_(to_pyarrow_type(t.key_type),
                       to_pyarrow_type(t.item_type),
                       keys_sorted=t.keys_sorted)
    if isinstance(t, FixedSizeListType):
        return pa.list_(to_pyarrow_type(t.value_type), t.list_size)
    if isinstance(t, ListType):
        return pa.list_(to_pyarrow_type(t.value_type))
    if isinstance(t, StructType):
        return pa.struct([(n, to_pyarrow_type(ft)) for n, ft in t.fields])
    if isinstance(t, UnionType):
        fields = [pa.field(n, to_pyarrow_type(ft)) for n, ft in t.fields]
        maker = pa.sparse_union if t.mode == "sparse" else pa.dense_union
        return maker(fields, type_codes=list(t.type_codes))
    raise NotImplementedError(f"to_pyarrow_type({t})")


def from_pyarrow_type(pt) -> DataType:
    import pyarrow as pa
    import pyarrow.types as pat

    if isinstance(pt, pa.BaseExtensionType):
        return ExtensionType(from_pyarrow_type(pt.storage_type),
                             pt.extension_name, pt)
    # view layouts fold to their offset-based logical equivalents at the
    # boundary (Arrow 22 StringView/BinaryView/ListView,
    # ``array/data.h:485`` variadic buffers — a CPU cache optimization
    # with no device analog here)
    if pat.is_string_view(pt):
        return string
    if pat.is_binary_view(pt):
        return binary
    if getattr(pat, "is_list_view", lambda _: False)(pt) or \
            getattr(pat, "is_large_list_view", lambda _: False)(pt):
        return ListType(from_pyarrow_type(pt.value_type))
    if pat.is_null(pt):
        return null
    if pat.is_boolean(pt):
        return bool_
    if pat.is_integer(pt):
        return IntegerType(pt.bit_width, pat.is_signed_integer(pt))
    if pat.is_float16(pt):
        return float16
    if pat.is_float32(pt):
        return float32
    if pat.is_float64(pt):
        return float64
    if pat.is_string(pt) or pat.is_large_string(pt):
        return string
    if pat.is_fixed_size_binary(pt):
        return FixedSizeBinaryType(pt.byte_width)
    if pat.is_binary(pt) or pat.is_large_binary(pt):
        return binary
    if pat.is_timestamp(pt):
        return TimestampType(pt.unit, pt.tz)
    if pat.is_date32(pt):
        return date32
    if pat.is_date64(pt):
        return date64
    if pat.is_time32(pt):
        return Time32Type(pt.unit)
    if pat.is_time64(pt):
        return Time64Type(pt.unit)
    if pat.is_duration(pt):
        return DurationType(pt.unit)
    if pat.is_decimal(pt):
        bits = 256 if pat.is_decimal256(pt) else 128
        return DecimalType(pt.precision, pt.scale, bits)
    if pat.is_interval(pt):
        if pt.equals(pa.month_day_nano_interval()):
            return month_day_nano_interval
        # month_interval / day_time_interval have no python-API
        # constructors in pyarrow<=25; match on the type string
        if str(pt) == "month_interval":
            return month_interval
        if str(pt) == "day_time_interval":
            return day_time_interval
        raise NotImplementedError(f"interval type {pt}")
    if pat.is_dictionary(pt):
        return DictionaryType(from_pyarrow_type(pt.index_type),
                              from_pyarrow_type(pt.value_type), pt.ordered)
    if pat.is_map(pt):
        return map_(from_pyarrow_type(pt.key_type),
                    from_pyarrow_type(pt.item_type),
                    keys_sorted=bool(pt.keys_sorted))
    if pat.is_fixed_size_list(pt):
        return FixedSizeListType(from_pyarrow_type(pt.value_type),
                                 pt.list_size)
    if pat.is_list(pt) or pat.is_large_list(pt):
        return ListType(from_pyarrow_type(pt.value_type))
    if pat.is_struct(pt):
        return StructType(tuple((f.name, from_pyarrow_type(f.type))
                                for f in pt))
    if pat.is_union(pt):
        fields = tuple((pt.field(i).name, from_pyarrow_type(pt.field(i).type))
                       for i in range(pt.num_fields))
        return UnionType(fields, tuple(pt.type_codes), pt.mode)
    raise NotImplementedError(f"from_pyarrow_type({pt})")
