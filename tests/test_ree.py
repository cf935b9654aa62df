"""run_end_encode/decode + random kernels (reference:
vector_run_end_encode tests, scalar_random.cc)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow_tpu as at
from arrow_tpu import compute as atc


def test_run_end_encode_oracle(rng):
    vals = pa.array([1, 1, 2, 2, 2, None, None, 3, 1, 1], type=pa.int64())
    got = atc.call_function("run_end_encode", [at.array(vals)])
    exp = pc.run_end_encode(vals)
    assert np.asarray(got.offsets)[1:len(got) + 1].tolist() == \
        exp.run_ends.to_pylist()
    got_vals = [None if got.validity is not None and not bool(v) else int(x)
                for x, v in zip(np.asarray(got.values)[:len(got)],
                                np.asarray(got.validity)[:len(got)]
                                if got.validity is not None else
                                [True] * len(got))]
    assert got_vals == exp.values.to_pylist()


def test_run_end_roundtrip(rng):
    base = rng.integers(0, 4, 300)
    runs = np.repeat(base, rng.integers(1, 5, 300))
    a = pa.array(runs, type=pa.int64())
    enc = atc.call_function("run_end_encode", [at.array(a)])
    dec = atc.call_function("run_end_decode", [enc])
    assert dec.to_pylist() == a.to_pylist()


def test_random():
    r = atc.call_function("random", [], length=1000, initializer=7)
    vals = r.to_pylist()
    assert len(vals) == 1000
    assert all(0.0 <= v < 1.0 for v in vals)
    r2 = atc.call_function("random", [], length=1000, initializer=7)
    assert vals == r2.to_pylist()  # deterministic initializer
