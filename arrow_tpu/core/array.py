"""Columnar Array: the device-resident equivalent of Arrow's ArrayData.

Reference model: ``cpp/src/arrow/array/data.h:85`` (ArrayData = type, length,
offset, buffers[], child_data[]). TPU-native redesign decisions:

  * **capacity + length discipline** — XLA needs static shapes, so every
    buffer has a static ``capacity`` (its allocated row count) and the array
    carries a dynamic ``length`` (python int when known statically, or a
    traced int32 scalar inside jit). Rows in ``[length, capacity)`` are
    padding with unspecified contents; kernels that reduce/reorder mask them
    explicitly via ``row_mask``.
  * **validity is a bool bytemask**, not Arrow's packed bitmap. ``None``
    means all-valid (same convention as Arrow's empty null bitmap,
    ``array/data.h`` null_count==0 path). Packing happens only at the
    pyarrow boundary.
  * **no offset field** — zero-copy slicing is a CPU idiom; on TPU a slice
    is a gather or an index-window, both explicit.
  * varlen (string/binary) arrays carry ``offsets`` (int32, capacity+1) into
    a uint8 byte pool in ``values`` whose own capacity is the byte capacity.
  * dictionary arrays store indices in ``values`` and the dictionary as a
    child Array.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from . import datatype as dt

__all__ = ["Array", "array", "nulls", "full", "row_mask"]

AnyArr = Union[np.ndarray, jax.Array]


def _is_static_len(length) -> bool:
    return isinstance(length, (int, np.integer))


@jax.tree_util.register_pytree_node_class
class Array:
    """One typed column with capacity+length discipline.

    Pytree leaves: values, validity?, offsets?, dictionary?, length.
    Static aux: type.
    """

    __slots__ = ("type", "values", "validity", "offsets", "dictionary",
                 "children", "length")

    def __init__(self, type: dt.DataType, values: AnyArr,
                 validity: Optional[AnyArr] = None,
                 offsets: Optional[AnyArr] = None,
                 dictionary: Optional["Array"] = None,
                 length=None, children=None):
        self.type = type
        self.values = values
        self.validity = validity
        self.offsets = offsets
        self.dictionary = dictionary
        self.children = tuple(children) if children is not None else None
        if length is None:
            length = (offsets.shape[0] - 1) if offsets is not None \
                else values.shape[0]
        self.length = length

    # ---- pytree protocol --------------------------------------------------
    def tree_flatten(self):
        children = (self.values, self.validity, self.offsets,
                    self.dictionary, self.children, self.length)
        return children, self.type

    @classmethod
    def tree_unflatten(cls, aux, children):
        values, validity, offsets, dictionary, struct_children, length = \
            children
        obj = cls.__new__(cls)
        obj.type = aux
        obj.values = values
        obj.validity = validity
        obj.offsets = offsets
        obj.dictionary = dictionary
        obj.children = struct_children
        obj.length = length
        return obj

    # ---- shape / capacity -------------------------------------------------
    @property
    def capacity(self) -> int:
        """Static allocated row capacity."""
        if self.offsets is not None:
            return self.offsets.shape[0] - 1
        return self.values.shape[0]

    @property
    def byte_capacity(self) -> Optional[int]:
        if self.type.is_varlen:
            return self.values.shape[0]
        return None

    @property
    def has_static_length(self) -> bool:
        return _is_static_len(self.length)

    def __len__(self) -> int:
        if not self.has_static_length:
            return int(jax.device_get(self.length))
        return int(self.length)

    # ---- null handling ----------------------------------------------------
    @property
    def all_valid(self) -> bool:
        """True iff statically known to have no nulls."""
        return self.validity is None

    def validity_or_true(self) -> jax.Array:
        """Materialized validity bytemask of shape (capacity,)."""
        if self.validity is not None:
            return self.validity
        return jnp.ones((self.capacity,), dtype=jnp.bool_)

    def null_count(self) -> int:
        """Host-side null count over the first ``length`` rows."""
        if self.validity is None:
            return 0
        v = np.asarray(jax.device_get(self.validity))[: len(self)]
        return int((~v).sum())

    def row_mask(self) -> jax.Array:
        """(capacity,) bool — True for rows < length (non-padding)."""
        return row_mask(self.capacity, self.length)

    def present_mask(self) -> jax.Array:
        """(capacity,) bool — True for in-range AND valid rows."""
        m = self.row_mask()
        if self.validity is not None:
            m = m & self.validity
        return m

    # ---- convenience ------------------------------------------------------
    def with_validity(self, validity: Optional[AnyArr]) -> "Array":
        return Array(self.type, self.values, validity, self.offsets,
                     self.dictionary, self.length, self.children)

    def with_length(self, length) -> "Array":
        ch = self.children
        if ch is not None and not isinstance(self.type, dt.UnionType):
            # struct children share the parent's length; union children
            # (esp. dense) have their own
            ch = tuple(c.with_length(length) for c in ch)
        return Array(self.type, self.values, self.validity, self.offsets,
                     self.dictionary, length, ch)

    def device_put(self, sharding=None) -> "Array":
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, sharding), self)

    def __repr__(self) -> str:
        ln = self.length if self.has_static_length else "<traced>"
        return (f"Array<{self.type}>(length={ln}, capacity={self.capacity}, "
                f"nullable={self.validity is not None})")

    # ---- host conversion (see interop.py for bulk paths) -------------------
    def to_pylist(self):
        from .interop import array_to_pyarrow
        return array_to_pyarrow(self).to_pylist()

    def to_pyarrow(self):
        from .interop import array_to_pyarrow
        return array_to_pyarrow(self)

    def to_numpy(self, zero_copy_only: bool = False):
        return self.to_pyarrow().to_numpy(zero_copy_only=zero_copy_only)


def row_mask(capacity: int, length) -> jax.Array:
    """True for row indices < length. Uses 2D broadcasted_iota internally so
    it is safe inside Pallas kernels too."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (capacity, 1), 0).reshape(
        (capacity,))
    return idx < jnp.asarray(length, dtype=jnp.int32)


# ---- constructors -----------------------------------------------------------

def _infer_type(npv: np.ndarray) -> dt.DataType:
    mapping = {
        np.dtype(np.bool_): dt.bool_,
        np.dtype(np.int8): dt.int8, np.dtype(np.int16): dt.int16,
        np.dtype(np.int32): dt.int32, np.dtype(np.int64): dt.int64,
        np.dtype(np.uint8): dt.uint8, np.dtype(np.uint16): dt.uint16,
        np.dtype(np.uint32): dt.uint32, np.dtype(np.uint64): dt.uint64,
        np.dtype(np.float16): dt.float16, np.dtype(np.float32): dt.float32,
        np.dtype(np.float64): dt.float64,
    }
    if npv.dtype in mapping:
        return mapping[npv.dtype]
    raise TypeError(f"cannot infer arrow_tpu type for numpy {npv.dtype}")


def array(values, type: Optional[dt.DataType] = None,
          validity=None, capacity: Optional[int] = None) -> Array:
    """Build an Array from host data (python list / numpy / pyarrow array).

    The equivalent of ``pa.array`` for this engine. Python ``None`` entries
    become nulls. ``capacity`` pads the buffers to a static size >= length.
    """
    import pyarrow as pa

    if isinstance(values, Array):
        return values
    if isinstance(values, (pa.Array, pa.ChunkedArray)):
        from .interop import array_from_pyarrow
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        return array_from_pyarrow(values, capacity=capacity)

    if isinstance(values, np.ndarray) and validity is None:
        t = type or _infer_type(values)
        if t.is_primitive and not isinstance(t, dt.DictionaryType):
            n = values.shape[0]
            cap = capacity or n
            buf = np.zeros((cap,), dtype=t.storage_np)
            buf[:n] = values.astype(t.storage_np, copy=False)
            return Array(t, jnp.asarray(buf), None, length=n)

    # General path: let pyarrow parse python objects (incl. None -> null).
    pa_type = dt.to_pyarrow_type(type) if type is not None else None
    pa_arr = pa.array(values, type=pa_type)
    from .interop import array_from_pyarrow
    return array_from_pyarrow(pa_arr, capacity=capacity)


def nulls(n: int, type: dt.DataType, capacity: Optional[int] = None) -> Array:
    cap = capacity or max(n, 1)
    if type.is_varlen:
        return Array(type, jnp.zeros((0,), dtype=jnp.uint8),
                     jnp.zeros((cap,), dtype=jnp.bool_),
                     offsets=jnp.zeros((cap + 1,), dtype=jnp.int32), length=n)
    buf = jnp.zeros((cap,), dtype=type.storage_np)
    return Array(type, buf, jnp.zeros((cap,), dtype=jnp.bool_), length=n)


def full(n: int, value, type: dt.DataType,
         capacity: Optional[int] = None) -> Array:
    cap = capacity or max(n, 1)
    if not type.is_primitive:
        raise NotImplementedError("full() supports primitive types only")
    buf = jnp.full((cap,), value, dtype=type.storage_np)
    return Array(type, buf, None, length=n)
