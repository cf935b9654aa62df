"""Dense/sparse tensors vs pyarrow (reference: tensor.cc,
sparse_tensor.cc; pyarrow Tensor / SparseCOOTensor / SparseCSRMatrix /
SparseCSCMatrix are the oracle)."""

import numpy as np
import pyarrow as pa
import pytest

import jax
import jax.numpy as jnp

from arrow_tpu import (SparseCOOTensor, SparseCSCMatrix, SparseCSRMatrix,
                       Tensor)


@pytest.fixture
def dense():
    rng = np.random.default_rng(3)
    a = rng.normal(size=(7, 5))
    a[rng.random(a.shape) < 0.6] = 0.0
    return a


def test_tensor_roundtrip(dense):
    t = Tensor.from_numpy(dense, dim_names=["r", "c"])
    assert t.shape == (7, 5)
    assert t.strides == pa.Tensor.from_numpy(dense).strides
    pt = t.to_pyarrow()
    assert pt.equals(pa.Tensor.from_numpy(dense, dim_names=["r", "c"]))
    assert Tensor.from_pyarrow(pt).equals(t)


def test_tensor_ipc_roundtrip(dense):
    import pyarrow.ipc as ipc
    t = Tensor.from_numpy(dense)
    sink = pa.BufferOutputStream()
    ipc.write_tensor(t.to_pyarrow(), sink)
    back = ipc.read_tensor(pa.BufferReader(sink.getvalue()))
    assert Tensor.from_pyarrow(back).equals(t)


def test_coo_dense_roundtrip(dense):
    coo = SparseCOOTensor.from_dense(dense, capacity=64)
    assert np.array_equal(np.asarray(coo.to_dense()), dense)
    # pyarrow comparison
    ref = pa.SparseCOOTensor.from_dense_numpy(dense)
    assert len(coo) == ref.non_zero_length
    back = SparseCOOTensor.from_pyarrow(coo.to_pyarrow())
    assert np.array_equal(np.asarray(back.to_dense()), dense)


def test_coo_3d():
    a = np.zeros((2, 3, 4))
    a[0, 1, 2] = 5.0
    a[1, 2, 3] = -1.0
    coo = SparseCOOTensor.from_dense(a)
    assert np.array_equal(np.asarray(coo.to_dense()), a)


def test_coo_to_dense_jits(dense):
    coo = SparseCOOTensor.from_dense(dense, capacity=64)
    out = jax.jit(lambda c: c.to_dense())(coo)
    assert np.array_equal(np.asarray(out), dense)


def test_csr_roundtrip_and_matmul(dense):
    csr = SparseCSRMatrix.from_dense(dense)
    assert np.array_equal(np.asarray(csr.to_dense()), dense)
    x = np.arange(5, dtype=np.float64)
    assert np.allclose(np.asarray(csr.mv(x)), dense @ x)
    m = np.ones((5, 2))
    assert np.allclose(np.asarray(csr.mm(m)), dense @ m)
    back = SparseCSRMatrix.from_pyarrow(csr.to_pyarrow())
    assert np.array_equal(back.to_scipy().toarray(), dense)


def test_csc_roundtrip(dense):
    csc = SparseCSCMatrix.from_dense(dense)
    assert np.array_equal(np.asarray(csc.to_dense()), dense)
    back = SparseCSCMatrix.from_pyarrow(csc.to_pyarrow())
    assert np.array_equal(back.to_scipy().toarray(), dense)


def test_to_tensor_bridge(dense):
    coo = SparseCOOTensor.from_dense(dense, dim_names=["r", "c"])
    t = coo.to_tensor()
    assert t.dim_names == ("r", "c")
    assert np.array_equal(t.to_numpy(), dense)
