"""Oracle-comparison helpers: pyarrow is the reference implementation
(SURVEY.md §4 — "oracle = pyarrow/arrow::acero itself, bit-exact comparison
harness from day 1")."""

import numpy as np
import pyarrow as pa

import arrow_tpu as at


def assert_array_equal(result: "at.Array", expected: pa.Array, msg="",
                       rtol=0.0, atol=0.0):
    """Bit-exact comparison by default; pass rtol for transcendentals
    (XLA libm and Arrow libm legitimately differ in the last ulps)."""
    got = result.to_pyarrow()
    if isinstance(expected, pa.ChunkedArray):
        expected = expected.combine_chunks()
    if got.type != expected.type:
        raise AssertionError(
            f"{msg} type mismatch: got {got.type}, want {expected.type}")
    if not got.equals(expected):
        # float NaN slots make equals() fail; compare with nulls+values
        if pa.types.is_floating(got.type):
            gv = got.to_numpy(zero_copy_only=False)
            ev = expected.to_numpy(zero_copy_only=False)
            if np.allclose(gv, ev, equal_nan=True, rtol=rtol,
                           atol=atol) and \
                    got.is_null().equals(expected.is_null()):
                return
        raise AssertionError(
            f"{msg} mismatch:\n got: {got}\nwant: {expected}")


def assert_batch_equal(result: "at.Batch", expected, msg=""):
    got = result.to_pyarrow()
    if isinstance(expected, pa.Table):
        expected = expected.combine_chunks()
        expected = expected.to_batches()[0] if expected.num_rows else \
            pa.RecordBatch.from_pylist([], schema=expected.schema)
    if not got.equals(expected):
        raise AssertionError(
            f"{msg} batch mismatch:\n got: {got.to_pydict()}\n"
            f"want: {expected.to_pydict()}")


def random_numeric_array(rng, n, pa_type, null_prob=0.0, small=False):
    npt = pa_type.to_pandas_dtype()
    if pa.types.is_integer(pa_type):
        info = np.iinfo(npt)
        if small:  # avoid overflow divergence in arithmetic oracle tests
            vals = rng.integers(max(info.min, -63), 63, size=n, dtype=npt,
                                endpoint=True)
        else:
            vals = rng.integers(info.min, info.max, size=n, dtype=npt,
                                endpoint=True)
    elif pa.types.is_floating(pa_type):
        vals = rng.standard_normal(n).astype(npt) * 100
    elif pa.types.is_boolean(pa_type):
        vals = rng.integers(0, 2, size=n).astype(bool)
    else:
        raise NotImplementedError(str(pa_type))
    if null_prob > 0:
        mask = rng.random(n) < null_prob
        return pa.array(vals, type=pa_type, mask=mask)
    return pa.array(vals, type=pa_type)
