"""Native C++ runtime tests: memory pool, ATB spill format, morsel loader.
(Reference roles: memory_pool_test.cc, ipc read/write tests, dataset
readahead.)"""

import numpy as np
import pytest

from arrow_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(),
    reason=f"native runtime unavailable: {native.build_error()}")


def test_memory_pool_stats():
    pool = native.MemoryPool(poison=True)
    a = pool.alloc(1000)
    assert a.nbytes == 1000
    assert a.ctypes.data % 64 == 0
    assert (a == 0xDE).all()  # poisoned
    b = pool.alloc(4096)
    assert pool.bytes_allocated == 5096
    assert pool.max_memory == 5096
    pool.free(a)
    assert pool.bytes_allocated == 4096
    pool.free(b)
    assert pool.bytes_allocated == 0
    assert pool.max_memory == 5096
    assert pool.num_allocations == 2


def test_atb_roundtrip(tmp_path):
    path = str(tmp_path / "t.atb")
    rng = np.random.default_rng(1)
    n = 1000
    strings = [f"row-{i}" if i % 7 else "" for i in range(n)]
    pool = "".join(strings).encode()
    offsets = np.zeros(n + 1, np.int32)
    offsets[1:] = np.cumsum([len(s) for s in strings])
    cols = {
        "i": {"data": rng.integers(-1 << 40, 1 << 40, n)},
        "f": {"data": rng.standard_normal(n),
              "validity": rng.random(n) < 0.8},
        "s": {"data": np.frombuffer(pool, np.uint8), "offsets": offsets},
    }
    native.write_atb(path, cols, n)
    got, nrows = native.read_atb(path)
    assert nrows == n
    np.testing.assert_array_equal(got["i"]["data"], cols["i"]["data"])
    np.testing.assert_array_equal(got["f"]["data"], cols["f"]["data"])
    np.testing.assert_array_equal(got["f"]["validity"],
                                  cols["f"]["validity"])
    np.testing.assert_array_equal(got["s"]["offsets"], offsets)
    np.testing.assert_array_equal(got["s"]["data"], cols["s"]["data"])


def test_morsel_loader(tmp_path):
    rng = np.random.default_rng(2)
    paths = []
    total = 0
    for f in range(3):
        n = int(rng.integers(100, 5000))
        total += n
        p = str(tmp_path / f"part{f}.atb")
        native.write_atb(p, {"x": {"data": np.arange(n) + f * 1_000_000}},
                         n)
        paths.append(p)
    loader = native.MorselLoader(paths, morsel_rows=512, nthreads=3,
                                 queue_depth=4)
    seen = {}
    rows = 0
    for fi, cols, n in loader:
        rows += n
        seen.setdefault(fi, []).append(cols["x"]["data"])
    loader.close()
    assert rows == total
    for fi, chunks in seen.items():
        # morsels within one file arrive in order; concatenation = file
        allv = np.concatenate(chunks)
        assert allv.min() == fi * 1_000_000
        assert len(np.unique(allv)) == len(allv)


def test_loader_to_device_batch(tmp_path):
    """End-to-end: ATB -> morsel loader -> device Batch -> kernel."""
    import jax
    import arrow_tpu as at
    from arrow_tpu import compute as atc
    n = 3000
    p = str(tmp_path / "ingest.atb")
    vals = np.arange(n, dtype=np.int64)
    native.write_atb(p, {"v": {"data": vals}}, n)
    total = 0
    for fi, cols, nr in native.MorselLoader([p], morsel_rows=1024):
        b = at.batch({"v": cols["v"]["data"]})
        s = atc.call_function("sum", [b["v"]])
        total += s.as_py()
    assert total == vals.sum()
