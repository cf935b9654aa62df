"""Benchmark driver — prints ONE JSON line.

Round-1 benchmark: BASELINE config #1 — filter+take over a 10M-row
(int64, float64) batch at ~50% selectivity, rows/s on the TPU chip vs
pyarrow.compute on the host CPU (the reference oracle and baseline).
"""

import json
import time

import numpy as np


def _time_it(fn, warmup=2, iters=5):
    for _ in range(warmup):
        fn()
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import pyarrow as pa
    import pyarrow.compute as pc
    import arrow_tpu as at
    from arrow_tpu.ops.selection import filter_batch

    n = 10_000_000
    rng = np.random.default_rng(42)
    ints = rng.integers(-1 << 40, 1 << 40, n)
    floats = rng.standard_normal(n)
    mask_np = rng.random(n) < 0.5

    # ---- reference: pyarrow on host CPU --------------------------------
    rb = pa.record_batch({"i": pa.array(ints), "f": pa.array(floats)})
    pa_mask = pa.array(mask_np)

    def pa_run():
        return rb.filter(pa_mask)

    pa_sec = _time_it(pa_run)
    pa_rows_s = n / pa_sec

    # ---- ours: device filter (mask eval + compaction + 2 gathers) ------
    batch = at.batch({"i": ints, "f": floats}, capacity=n)
    mask = at.array(mask_np, capacity=n)
    dev = jax.devices()[0]
    batch = batch.device_put(dev)
    mask = mask.device_put(dev)

    step = jax.jit(filter_batch)
    out = step(batch, mask)  # compile
    jax.block_until_ready(jax.tree_util.tree_leaves(out))

    def our_run():
        r = step(batch, mask)
        jax.block_until_ready(jax.tree_util.tree_leaves(r))
        return r

    our_sec = _time_it(our_run)
    our_rows_s = n / our_sec

    # correctness spot-check (first run vs pyarrow)
    got = out.to_pyarrow()
    want = pa_run()
    assert got["i"].to_pylist()[:1000] == want["i"].to_pylist()[:1000], \
        "filter result mismatch vs pyarrow"
    assert len(got["i"]) == len(want["i"])

    print(json.dumps({
        "metric": "filter+take rows/s (10M-row int64+f64 batch, 50% sel, "
                  f"1 chip: {dev.platform})",
        "value": round(our_rows_s),
        "unit": "rows/s",
        "vs_baseline": round(our_rows_s / pa_rows_s, 3),
    }))


if __name__ == "__main__":
    main()
