"""Pallas kernel unit tests (interpret mode on the CPU mesh)."""

import numpy as np
import jax.numpy as jnp
import pytest

from arrow_tpu.ops.pallas_kernels import partition_histogram


@pytest.mark.parametrize("n,P", [(100, 4), (1024, 8), (4096, 16),
                                 (5000, 64), (7, 2)])
def test_partition_histogram(rng, n, P):
    d = rng.integers(-1, P + 2, n).astype(np.int32)
    got = np.asarray(partition_histogram(jnp.asarray(d), P))
    exp = np.array([(d == p).sum() for p in range(P)], np.int32)
    np.testing.assert_array_equal(got, exp)


def test_partition_histogram_in_jit(rng):
    import jax
    d = rng.integers(0, 8, 2048).astype(np.int32)

    @jax.jit
    def f(x):
        return partition_histogram(x, 8)

    got = np.asarray(f(jnp.asarray(d)))
    exp = np.array([(d == p).sum() for p in range(8)], np.int32)
    np.testing.assert_array_equal(got, exp)
