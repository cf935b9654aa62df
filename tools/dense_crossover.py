"""Dense-vs-sort group-by crossover probe (VERDICT r3 next #5).

Measures the dense kernel's rows/s at G in {1K..32K} against the
sort-grouper path on the bench shape (30M rows, f32 values, sum/min/
count_all) and prints the break-even — the measured basis for
HashAggregate.DENSE_CAP.

Run on chip:  python tools/dense_crossover.py [--rows 30000000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=30_000_000)
    args = ap.parse_args()

    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp
    from jax import lax
    import arrow_tpu as at
    from arrow_tpu.ops.hash_aggregate import AggregateSpec, HashAggregate

    dev = jax.devices()[0]
    n = args.rows
    rng = np.random.default_rng(7)
    vals = rng.standard_normal(n).astype(np.float32)

    def timed(fn, *a, K=2):
        jax.device_get(fn(np.int32(0), *a))
        ts = []
        for s in range(1, 3):
            t0 = time.perf_counter()
            jax.device_get(fn(np.int32(s), *a))
            ts.append(time.perf_counter() - t0)
        real = [t for t in ts if t > 2e-3]
        return (float(np.median(real)) / K) if real else float("nan")

    print(f"rows={n}", flush=True)
    for G in (1024, 2048, 4096, 8192, 16384, 32768):
        keys = rng.integers(0, G - G // 8, n)
        batch = at.batch({"k": keys, "v": vals}, capacity=n).device_put(
            dev)
        ha = HashAggregate(batch.schema, ["k"],
                           [AggregateSpec("sum", "v"),
                            AggregateSpec("min", "v"),
                            AggregateSpec("count_all")],
                           max_groups=2 * G)
        for label in ("dense", "sorted", "sort"):
            @jax.jit
            def run(s, b, label=label, G=G, ha=ha):
                def body(i, acc):
                    v2 = b.column("v").values + \
                        (s + i).astype(jnp.float32) * 1e-6
                    b2 = b.set_column("v", at.Array(
                        at.float32, v2, None, length=n))
                    st = ha.init_state()
                    if label == "dense":
                        st = ha.consume_dense(st, b2, np.int64(0), G)
                    elif label == "sorted":
                        st = ha.consume_dense(st, b2, np.int64(0), G,
                                              "sorted")
                    else:
                        st = ha.consume(st, b2, None, None, True)
                    out = ha.finalize(st)
                    return acc + out.arrays[1].values[::4097].sum().astype(
                        jnp.float32) + out.length.astype(jnp.float32)
                return lax.fori_loop(0, 2, body, jnp.float32(0))

            try:
                sec = timed(run, batch)
                print(f"G={G:>6} {label:>5}: {n/sec/1e6:7.1f}M rows/s "
                      f"({sec*1e3:.0f}ms)", flush=True)
            except Exception as e:
                print(f"G={G:>6} {label:>5}: FAILED "
                      f"({type(e).__name__}: {str(e)[:120]})", flush=True)


if __name__ == "__main__":
    main()
