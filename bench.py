"""Benchmark driver — prints ONE JSON line.

Round-1 benchmark: BASELINE config #1 — filter+take over a 10M-row
(int64, float64) batch at ~50% selectivity, rows/s on the TPU chip vs
pyarrow.compute on the host CPU (the reference oracle and baseline).

Timing methodology (the axon relay memoizes identical executions and
host-side loops measure dispatch): K iterations run INSIDE one jit via
lax.fori_loop, each iteration's mask perturbed by a seed scalar and every
output consumed into the carry; the timed call uses a different seed than
the warmup. See tests/… and the project notes.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    import pyarrow as pa
    import arrow_tpu as at
    from arrow_tpu.ops.selection import filter_batch

    n = 10_000_000
    K = 10
    rng = np.random.default_rng(42)
    ints = rng.integers(-1 << 40, 1 << 40, n)
    floats = rng.standard_normal(n)
    mask_np = rng.random(n) < 0.5

    # ---- reference: pyarrow on host CPU --------------------------------
    rb = pa.record_batch({"i": pa.array(ints), "f": pa.array(floats)})
    pa_mask = pa.array(mask_np)
    rb.filter(pa_mask)  # warm
    t0 = time.perf_counter()
    for _ in range(5):
        rb.filter(pa_mask)
    pa_sec = (time.perf_counter() - t0) / 5
    pa_rows_s = n / pa_sec

    # ---- ours: device filter, K-iteration fused loop -------------------
    batch = at.batch({"i": ints, "f": floats}, capacity=n)
    mask = at.array(mask_np, capacity=n)
    dev = jax.devices()[0]
    batch = batch.device_put(dev)
    mask = mask.device_put(dev)
    iota_mod = jnp.arange(n, dtype=jnp.int32) & 8191

    @jax.jit
    def run(s, b, m):
        def body(i, carry):
            mv = m.values ^ (iota_mod == (s + i))
            out = filter_batch(b, at.Array(at.bool_, mv, None, length=n))
            acc = carry
            acc = acc + out.column(0).values[::65537].astype(
                jnp.float32).sum()
            acc = acc + out.column(1).values[::65537].astype(
                jnp.float32).sum()
            acc = acc + out.length.astype(jnp.float32)
            return acc
        return lax.fori_loop(0, K, body, jnp.float32(0))

    jax.block_until_ready(run(jnp.int32(0), batch, mask))  # compile+warm
    best = float("inf")
    for s in (1, 2):
        t0 = time.perf_counter()
        jax.block_until_ready(run(jnp.int32(s), batch, mask))
        best = min(best, (time.perf_counter() - t0) / K)
    our_rows_s = n / best

    # correctness spot-check outside the loop
    out = jax.jit(filter_batch)(batch, mask)
    got = out.to_pyarrow()
    want = rb.filter(pa_mask)
    assert got["i"].to_pylist() == want["i"].to_pylist(), \
        "filter int64 mismatch vs pyarrow"

    print(json.dumps({
        "metric": "filter+take rows/s (10M-row int64+f64 batch, 50% sel, "
                  f"1 chip: {dev.platform})",
        "value": round(our_rows_s),
        "unit": "rows/s",
        "vs_baseline": round(our_rows_s / pa_rows_s, 3),
    }))


if __name__ == "__main__":
    main()
