"""Filter-compaction impl shootout on the real chip.

Measures rows/s of batch filter at several selectivities for each impl
('sort' global 1-bit sort, 'twolevel' tile sort + stitch, 'pallas'
one-hot-MXU tile compaction, 'scatter', 'search') so the default in
ops/selection.py is set from DATA (VERDICT r1 #3: filter ran at ~0.6% of
HBM roofline under 'sort').

Run: python tools/tpu_filter_probe.py [--rows 10000000]
Prints one JSON line per (impl, selectivity) + a winner summary.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=10_000_000)
    ap.add_argument("--impls", default="sort,twolevel,pallas")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import arrow_tpu as at
    from arrow_tpu.ops import selection

    dev = jax.devices()[0]
    n = args.rows
    rng = np.random.default_rng(0)
    ints = rng.integers(-1 << 40, 1 << 40, n)
    floats = rng.standard_normal(n).astype(np.float32)
    batch = at.batch({"i": ints, "f": floats}, capacity=n).device_put(dev)
    K = 8
    iota_mod = jnp.arange(n, dtype=jnp.int32) & 8191

    best = {}
    for impl in args.impls.split(","):
        os.environ["ARROW_TPU_FILTER_IMPL"] = impl
        for selp in (0.01, 0.5, 0.99):
            mask_np = rng.random(n) < selp
            mask = at.array(mask_np, capacity=n).device_put(dev)

            @jax.jit
            def run(s, b, m):
                def body(i, acc):
                    mv = m.values ^ (iota_mod == (s + i))
                    out = selection.filter_batch(
                        b, at.Array(at.bool_, mv, None, length=n))
                    acc = acc + out.column(0).values[::65537].astype(
                        jnp.float32).sum()
                    return acc + out.length.astype(jnp.float32)
                return jax.lax.fori_loop(0, K, body, jnp.float32(0))

            jax.device_get(run(np.int32(0), batch, mask))
            times = []
            for s in range(1, args.reps + 1):
                t0 = time.perf_counter()
                jax.device_get(run(np.int32(s), batch, mask))
                times.append(time.perf_counter() - t0)
            real = [t for t in times if t > 2e-3]
            sec = (float(np.median(real)) if real else float("nan")) / K
            rate = n / sec
            print(json.dumps({"impl": impl, "sel": selp,
                              "rows_per_s": round(rate),
                              "gb_per_s": round(rate * 13 / 1e9, 1)}),
                  flush=True)
            key = selp
            if key not in best or rate > best[key][1]:
                best[key] = (impl, rate)
    print(json.dumps({"winners": {str(k): v[0]
                                  for k, v in best.items()}}), flush=True)


if __name__ == "__main__":
    main()
