"""Is the fused Q3 aggregate's ~350ms max_groups-proportional?

Times jit(consume(first=True) + finalize) over a Q3-shaped input
(32768-capacity batch, ~14.8K live rows, keys (i64, date32, i32),
sum f32) at max_groups = 2^19 (the bench setting) vs right-sized
2^13. Seed-perturbed, reduced to scalars.

Run:  python tools/agg_g_probe.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import pyarrow as pa
    import arrow_tpu as at
    from arrow_tpu.ops.hash_aggregate import AggregateSpec, HashAggregate

    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    rng = np.random.default_rng(0)
    n = 14_823
    cap = 32768
    t = pa.table({
        "l_orderkey": pa.array(rng.integers(0, 3_000_000, n) * 4),
        "o_orderdate": pa.array(rng.integers(9000, 9500, n).astype(
            np.int32)),
        "o_shippriority": pa.array(np.zeros(n, np.int32)),
        "rev": pa.array(rng.random(n).astype(np.float32) * 1e4),
    })
    batch = at.Batch.from_pyarrow(
        pa.record_batch(t.to_batches()[0]), capacity=cap).device_put(dev)

    for G in (1 << 19, 1 << 13):
        ha = HashAggregate(batch.schema,
                           ["l_orderkey", "o_orderdate",
                            "o_shippriority"],
                           [AggregateSpec("sum", "rev", name="revenue")],
                           max_groups=G)

        @jax.jit
        def run(s, b, _ha=ha):
            v2 = b.column("rev").values + s.astype(jnp.float32) * 1e-3
            b2 = b.set_column("rev", at.Array(at.float32, v2, None,
                                              length=b.length))
            st = _ha.consume(_ha.init_state(), b2, None, None, True)
            out = _ha.finalize(st)
            return (out.arrays[3].values[::97].sum() +
                    out.length.astype(jnp.float32) +
                    st[0].error.astype(jnp.float32))

        jax.device_get(run(np.int32(0), batch))
        ts = []
        for s in range(1, 4):
            t0 = time.perf_counter()
            jax.device_get(run(np.int32(s), batch))
            ts.append(time.perf_counter() - t0)
        med = float(np.median([x for x in ts if x > 2e-3] or ts))
        print(f"max_groups=2^{G.bit_length()-1}: {med*1e3:7.1f}ms  "
              f"{sorted(round(x*1e3) for x in ts)}", flush=True)


if __name__ == "__main__":
    main()
