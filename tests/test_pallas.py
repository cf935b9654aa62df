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


def test_tile_compact_local(rng):
    """Per-tile compaction kernel: local iotas of selected rows first,
    per-tile counts (interpret mode off-TPU)."""
    import jax.numpy as jnp
    from arrow_tpu.ops.pallas_kernels import tile_compact_local
    for n, p in [(1024, 0.0), (4096, 0.3), (8192, 1.0), (2048, 0.99)]:
        sel = rng.random(n) < p
        loc, cnt = tile_compact_local(jnp.asarray(sel))
        loc, cnt = np.asarray(loc), np.asarray(cnt)
        for t in range(n // 1024):
            tile = sel[t * 1024:(t + 1) * 1024]
            want = np.nonzero(tile)[0]
            assert cnt[t] == want.size
            assert (loc[t * 1024:(t + 1) * 1024][:want.size] == want).all()


def test_filter_impl_pallas_matches_oracle(rng, monkeypatch):
    monkeypatch.setenv("ARROW_TPU_FILTER_IMPL", "pallas")
    import pyarrow as pa
    import pyarrow.compute as pc
    import arrow_tpu as at
    from arrow_tpu.compute import call_function
    n = 3000
    a = pa.array(rng.integers(0, 100, n))
    m = pa.array(rng.random(n) < 0.4)
    got = call_function("filter", [at.array(a, capacity=4096),
                                   at.array(m, capacity=4096)])
    assert got.to_pylist() == pc.filter(a, m).to_pylist()
