"""Dense + sparse tensors (reference: ``cpp/src/arrow/tensor.{h,cc}`` and
``cpp/src/arrow/sparse_tensor.cc`` — Tensor, SparseCOOTensor,
SparseCSRMatrix, SparseCSCMatrix).

TPU-native redesign: a dense Tensor IS a jax device array plus Arrow
metadata (dim_names); sparse formats keep the Arrow index structure
(COO coords / CSR indptr+indices) as device arrays with the same
capacity+length discipline as columns (``nnz`` is the dynamic length, the
index buffers carry a static capacity; padded entries scatter past the end
— "drop" semantics). ``to_dense`` is one scatter; ``mm``/``mv`` ride
``jax.experimental.sparse.BCOO`` so matmuls hit the MXU-backed sparse
lowering rather than a hand-rolled gather loop.

Serialization rides pyarrow at the edges (``ipc.write_tensor`` /
``read_tensor``) like the rest of the interop boundary.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["Tensor", "SparseCOOTensor", "SparseCSRMatrix",
           "SparseCSCMatrix"]


def _np_strides(shape: Tuple[int, ...], itemsize: int) -> Tuple[int, ...]:
    strides = []
    acc = itemsize
    for d in reversed(shape):
        strides.append(acc)
        acc *= d
    return tuple(reversed(strides))


@jax.tree_util.register_pytree_node_class
class Tensor:
    """Dense n-dim tensor: one device array + dim names (``tensor.h``)."""

    __slots__ = ("data", "dim_names")

    def __init__(self, data, dim_names: Optional[Sequence[str]] = None):
        self.data = jnp.asarray(data) if not isinstance(data, jax.Array) \
            else data
        self.dim_names = tuple(dim_names) if dim_names else None

    def tree_flatten(self):
        return (self.data,), self.dim_names

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.data = children[0]
        obj.dim_names = aux
        return obj

    @property
    def shape(self):
        return tuple(self.data.shape)

    @property
    def ndim(self):
        return self.data.ndim

    @property
    def size(self):
        return int(np.prod(self.shape)) if self.shape else 1

    @property
    def strides(self):
        return _np_strides(self.shape, self.data.dtype.itemsize)

    @property
    def is_contiguous(self):
        return True

    def dim_name(self, i: int) -> str:
        return self.dim_names[i] if self.dim_names else ""

    # ---- interop ----------------------------------------------------------
    @classmethod
    def from_numpy(cls, arr: np.ndarray,
                   dim_names: Optional[Sequence[str]] = None) -> "Tensor":
        return cls(jnp.asarray(arr), dim_names)

    def to_numpy(self) -> np.ndarray:
        return np.asarray(jax.device_get(self.data))

    @classmethod
    def from_pyarrow(cls, t) -> "Tensor":
        names = t.dim_names or None
        if names is not None and not any(names):
            names = None   # IPC read yields ['', ...] for unnamed dims
        return cls(jnp.asarray(t.to_numpy()), names)

    def to_pyarrow(self):
        import pyarrow as pa
        return pa.Tensor.from_numpy(
            self.to_numpy(), dim_names=list(self.dim_names)
            if self.dim_names else None)

    def equals(self, other: "Tensor") -> bool:
        return self.shape == other.shape and \
            self.dim_names == other.dim_names and \
            bool(np.array_equal(self.to_numpy(), other.to_numpy(),
                                equal_nan=True))

    def __repr__(self):
        return f"Tensor<{self.data.dtype}>{self.shape}"


class _SparseBase:
    @property
    def ndim(self):
        return len(self.shape)

    @property
    def size(self):
        return int(np.prod(self.shape))

    def __len__(self):
        return int(jax.device_get(self.nnz)) \
            if not isinstance(self.nnz, (int, np.integer)) else int(self.nnz)

    @property
    def non_zero_length(self):
        return len(self)

    def to_tensor(self) -> Tensor:
        return Tensor(self.to_dense(), self.dim_names)


@jax.tree_util.register_pytree_node_class
class SparseCOOTensor(_SparseBase):
    """COO: data (C,), coords (C, ndim) int64; nnz dynamic length
    (``SparseCOOIndex``, sparse_tensor.h). Coords rows ≥ nnz are padding."""

    __slots__ = ("data", "coords", "shape", "dim_names", "nnz")

    def __init__(self, data, coords, shape, nnz=None,
                 dim_names: Optional[Sequence[str]] = None):
        self.data = jnp.asarray(data)
        self.coords = jnp.asarray(coords)
        self.shape = tuple(int(d) for d in shape)
        self.dim_names = tuple(dim_names) if dim_names else None
        self.nnz = self.data.shape[0] if nnz is None else nnz

    def tree_flatten(self):
        return (self.data, self.coords, self.nnz), \
            (self.shape, self.dim_names)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.data, obj.coords, obj.nnz = children
        obj.shape, obj.dim_names = aux
        return obj

    @classmethod
    def from_dense(cls, arr, dim_names=None,
                   capacity: Optional[int] = None) -> "SparseCOOTensor":
        """Host-staged construction (dynamic nnz needs a host sync; inside
        jit use a fixed capacity + mask instead)."""
        a = np.asarray(jax.device_get(arr) if isinstance(arr, jax.Array)
                       else arr)
        idx = np.argwhere(a != 0)
        vals = a[tuple(idx.T)] if idx.size else a.reshape(-1)[:0]
        n = idx.shape[0]
        cap = max(capacity or n, 1)
        data = np.zeros((cap,), dtype=a.dtype)
        data[:n] = vals
        coords = np.zeros((cap, a.ndim), dtype=np.int64)
        coords[:n] = idx
        return cls(jnp.asarray(data), jnp.asarray(coords), a.shape, n,
                   dim_names)

    def to_dense(self) -> jax.Array:
        flat_strides = jnp.asarray(
            [int(np.prod(self.shape[i + 1:], dtype=np.int64))
             for i in range(self.ndim)], dtype=jnp.int64)
        flat = (self.coords * flat_strides[None, :]).sum(axis=1)
        size = int(np.prod(self.shape))
        cap = self.data.shape[0]
        ridx = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).reshape(
            (cap,))
        live = ridx < jnp.asarray(self.nnz, jnp.int32)
        pos = jnp.where(live, flat, size)   # padding scatters past the end
        out = jnp.zeros((size,), self.data.dtype).at[pos].set(
            self.data, mode="drop")
        return out.reshape(self.shape)

    def to_bcoo(self):
        from jax.experimental import sparse as jsparse
        n = len(self)
        return jsparse.BCOO((self.data[:n], self.coords[:n]),
                            shape=self.shape)

    @classmethod
    def from_pyarrow(cls, t) -> "SparseCOOTensor":
        data, coords = t.to_numpy()
        return cls(jnp.asarray(data.reshape(-1)), jnp.asarray(coords),
                   t.shape, data.shape[0], t.dim_names or None)

    def to_pyarrow(self):
        import pyarrow as pa
        n = len(self)
        data = np.asarray(jax.device_get(self.data))[:n]
        coords = np.asarray(jax.device_get(self.coords))[:n]
        return pa.SparseCOOTensor.from_numpy(
            data, coords, self.shape,
            dim_names=list(self.dim_names) if self.dim_names else None)

    def __repr__(self):
        return f"SparseCOOTensor<{self.data.dtype}>{self.shape} nnz={len(self)}"


class _CompressedMatrix(_SparseBase):
    """Shared CSR/CSC machinery: indptr (major+1,), indices (C,), data (C,).
    ``sparse_tensor.h`` SparseCSRIndex/SparseCSCIndex."""

    _major_axis = 0  # CSR: rows are major; CSC overrides with 1

    def __init__(self, data, indptr, indices, shape, nnz=None,
                 dim_names=None):
        self.data = jnp.asarray(data)
        self.indptr = jnp.asarray(indptr)
        self.indices = jnp.asarray(indices)
        self.shape = tuple(int(d) for d in shape)
        self.dim_names = tuple(dim_names) if dim_names else None
        self.nnz = self.data.shape[0] if nnz is None else nnz
        assert len(self.shape) == 2

    def tree_flatten(self):
        return (self.data, self.indptr, self.indices, self.nnz), \
            (self.shape, self.dim_names)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.data, obj.indptr, obj.indices, obj.nnz = children
        obj.shape, obj.dim_names = aux
        return obj

    def _major_of_position(self) -> jax.Array:
        """(C,) major coordinate per stored element (searchsorted over
        indptr — the device-side inverse of the compression)."""
        cap = self.data.shape[0]
        ridx = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).reshape(
            (cap,))
        major_dim = self.shape[self._major_axis]
        return jnp.clip(
            jnp.searchsorted(self.indptr, ridx, side="right").astype(
                jnp.int64) - 1, 0, major_dim - 1)

    def _coords(self):
        major = self._major_of_position()
        minor = self.indices.astype(jnp.int64)
        if self._major_axis == 0:
            return major, minor
        return minor, major

    def to_dense(self) -> jax.Array:
        r, c = self._coords()
        nrow, ncol = self.shape
        size = nrow * ncol
        cap = self.data.shape[0]
        ridx = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0).reshape(
            (cap,))
        live = ridx < jnp.asarray(self.nnz, jnp.int32)
        pos = jnp.where(live, r * ncol + c, size)
        return jnp.zeros((size,), self.data.dtype).at[pos].set(
            self.data, mode="drop").reshape(self.shape)

    def to_bcoo(self):
        from jax.experimental import sparse as jsparse
        n = len(self)
        r, c = self._coords()
        coords = jnp.stack([r[:n], c[:n]], axis=1)
        return jsparse.BCOO((self.data[:n], coords), shape=self.shape)

    def mv(self, x) -> jax.Array:
        """Sparse @ dense-vector on device (BCOO lowering)."""
        return self.to_bcoo() @ jnp.asarray(x)

    def mm(self, x) -> jax.Array:
        return self.to_bcoo() @ jnp.asarray(x)

    @classmethod
    def from_scipy(cls, m, dim_names=None):
        return cls(jnp.asarray(m.data), jnp.asarray(m.indptr),
                   jnp.asarray(m.indices), m.shape, m.data.shape[0],
                   dim_names)

    def _scipy_cls(self):
        import scipy.sparse as sp
        return sp.csr_matrix if self._major_axis == 0 else sp.csc_matrix

    def to_scipy(self):
        n = len(self)
        data = np.asarray(jax.device_get(self.data))[:n]
        indices = np.asarray(jax.device_get(self.indices))[:n]
        indptr = np.asarray(jax.device_get(self.indptr))
        return self._scipy_cls()((data, indices, indptr), shape=self.shape)

    @classmethod
    def from_dense(cls, arr, dim_names=None):
        import scipy.sparse as sp
        a = np.asarray(jax.device_get(arr) if isinstance(arr, jax.Array)
                       else arr)
        kind = sp.csr_matrix if cls._major_axis == 0 else sp.csc_matrix
        return cls.from_scipy(kind(a), dim_names)

    def __repr__(self):
        return (f"{type(self).__name__}<{self.data.dtype}>{self.shape} "
                f"nnz={len(self)}")


@jax.tree_util.register_pytree_node_class
class SparseCSRMatrix(_CompressedMatrix):
    _major_axis = 0

    @classmethod
    def from_pyarrow(cls, t) -> "SparseCSRMatrix":
        return cls.from_scipy(t.to_scipy(), t.dim_names or None)

    def to_pyarrow(self):
        import pyarrow as pa
        return pa.SparseCSRMatrix.from_scipy(
            self.to_scipy(), dim_names=list(self.dim_names)
            if self.dim_names else None)


@jax.tree_util.register_pytree_node_class
class SparseCSCMatrix(_CompressedMatrix):
    _major_axis = 1

    @classmethod
    def from_pyarrow(cls, t) -> "SparseCSCMatrix":
        return cls.from_scipy(t.to_scipy(), t.dim_names or None)

    def to_pyarrow(self):
        import pyarrow as pa
        return pa.SparseCSCMatrix.from_scipy(
            self.to_scipy(), dim_names=list(self.dim_names)
            if self.dim_names else None)
