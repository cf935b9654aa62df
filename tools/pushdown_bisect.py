"""Bisect the host_boundary pushdown compiler SIGSEGV on a real v5e.

The driver's round-3 sweep showed `_pushdown_encode` (ops/strings_regex)
killing the remote TPU compile helper with SIGSEGV at the bench shape
(2M rows, ~18MB byte pool). This script AOT-compiles each constituent
piece separately at that exact shape so the crashing sub-program is
identified, not guessed.

Run on chip:  python tools/pushdown_bisect.py [stage ...]
Stages: lanes distinct slots encode
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import pyarrow as pa
    import arrow_tpu as at
    from arrow_tpu.core.array import array as make_array

    stages = sys.argv[1:] or ["lanes", "distinct", "slots", "encode"]

    n = 2_000_000
    rng = np.random.default_rng(7)
    words = np.array([f"id{i % 977:03d}x{i % 31}" for i in range(4096)])
    vals = words[rng.integers(0, len(words), n)]
    arr = make_array(pa.array(vals))
    dev = jax.devices()[0]
    arr = jax.device_put(arr, dev)
    print("shape:", arr.capacity, "pool:", arr.values.shape, flush=True)

    if "lanes" in stages:
        from arrow_tpu.ops.vector_hash import _key_lanes

        @jax.jit
        def lanes_fn(a):
            return _key_lanes(a, include_validity=False)

        print("compile lanes ...", flush=True)
        lanes_fn.lower(arr).compile()
        print("lanes OK", flush=True)

    if "distinct" in stages:
        from arrow_tpu.ops.vector_hash import _distinct

        @jax.jit
        def dist_fn(a):
            return _distinct(a, include_nulls=False)

        print("compile distinct ...", flush=True)
        dist_fn.lower(arr).compile()
        print("distinct OK", flush=True)

    if "slots" in stages:
        from arrow_tpu.ops.grouper import SlotStrings

        @jax.jit
        def slots_fn(a):
            R, W = 8192, 64
            rows = jnp.arange(R, dtype=jnp.int32) % a.capacity
            pos = jnp.arange(R, dtype=jnp.int32)
            ss = SlotStrings.init(R, W).scatter_from(
                a, rows, pos, unique_indices=True)
            return ss.slots, ss.lens, ss.error

        print("compile slots ...", flush=True)
        slots_fn.lower(arr).compile()
        print("slots OK", flush=True)

    if "encode" in stages:
        from arrow_tpu.ops.strings_regex import _pushdown_encode
        print("compile encode ...", flush=True)
        _pushdown_encode.lower(arr).compile()
        print("encode OK", flush=True)

    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
