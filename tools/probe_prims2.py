"""Second primitive probe: sync RTT, wide row gathers, i64 scatter/cummax,
and the packed 1-key probe-sort candidate end-to-end.

Run:  python tools/probe_prims2.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def setup():
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    return jax.devices()[0]


def timeit(fn, *args, reps=3, K=4):
    import jax
    jax.device_get(fn(np.int32(0), *args))
    ts = []
    for s in range(1, reps + 1):
        t0 = time.perf_counter()
        jax.device_get(fn(np.int32(s), *args))
        ts.append(time.perf_counter() - t0)
    real = [t for t in ts if t > 2e-3]
    return float(np.median(real)) / K if real else float("nan")


def main():
    dev = setup()
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(1)
    N = 20_000_000

    # ---- device_get RTT for a scalar -----------------------------------
    x = jax.device_put(np.float32(1.5), dev)
    f = jax.jit(lambda v: v + 1)
    jax.device_get(f(x))
    ts = []
    for _ in range(8):
        t0 = time.perf_counter()
        jax.device_get(f(x))
        ts.append(time.perf_counter() - t0)
    print(f"scalar jit+device_get RTT: median {np.median(ts)*1e3:.1f}ms "
          f"min {min(ts)*1e3:.1f}ms", flush=True)

    # two scalars in one get vs two gets
    g = jax.jit(lambda v: (v + 1, v * 2))
    jax.device_get(g(x))
    t0 = time.perf_counter()
    for _ in range(4):
        jax.device_get(g(x))
    one = (time.perf_counter() - t0) / 4
    print(f"tupled device_get of 2 scalars: {one*1e3:.1f}ms", flush=True)

    # ---- 2D row gather: T indices from (cap, W) u32 ---------------------
    T = 16_000_000
    cap = N
    for W in [1, 2, 4, 8]:
        tbl = jax.device_put(
            rng.integers(0, 1 << 31, (cap, W)).astype(np.int32), dev)
        idx = jax.device_put(rng.integers(0, cap, T).astype(np.int32), dev)

        @jax.jit
        def run(s, t, ix):
            def body(i, acc):
                ix2 = jnp.clip(ix ^ (s + i), 0, cap - 1)
                gth = t[ix2]        # (T, W)
                return acc + gth[::65537].astype(jnp.int64).sum()
            return lax.fori_loop(0, 4, body, jnp.int64(0))

        sec = timeit(run, tbl, idx)
        print(f"row-gather 16M x W={W}: {T/sec/1e6:.0f}M rows/s "
              f"({sec*1e3:.0f}ms)", flush=True)

    # ---- i64 unique scatter + i64 cummax --------------------------------
    perm = jax.device_put(rng.permutation(N).astype(np.int32), dev)
    vals64 = jax.device_put(
        rng.integers(0, 1 << 62, N).astype(np.int64), dev)

    @jax.jit
    def run_sc64(s, p, v):
        def body(i, acc):
            v2 = v ^ (s + i).astype(jnp.int64)
            out = jnp.zeros((N,), jnp.int64).at[p].set(
                v2, mode="drop", unique_indices=True)
            return acc + out[::65537].sum()
        return lax.fori_loop(0, 4, body, jnp.int64(0))

    sec = timeit(run_sc64, perm, vals64)
    print(f"unique scatter i64 20M: {N/sec/1e6:.0f}M elem/s "
          f"({sec*1e3:.0f}ms)", flush=True)

    @jax.jit
    def run_cm(s, v):
        def body(i, acc):
            c = lax.cummax(v ^ (s + i).astype(jnp.int64))
            return acc + c[::65537].sum()
        return lax.fori_loop(0, 4, body, jnp.int64(0))

    sec = timeit(run_cm, vals64)
    print(f"cummax i64 20M: {N/sec/1e6:.0f}M elem/s ({sec*1e3:.0f}ms)",
          flush=True)

    # ---- packed 1-key probe-sort construct ------------------------------
    # build: G sorted unique keys; probe: N keys; key domain < 2^21.
    G = 1 << 20
    bk = np.sort(rng.choice(np.arange(2 * G, dtype=np.uint32), G,
                            replace=False))
    t_key = jax.device_put(bk, dev)
    t_start = jax.device_put(
        np.cumsum(rng.integers(1, 2, G)).astype(np.int32), dev)
    pk = jax.device_put(rng.integers(0, 2 * G, N).astype(np.uint32), dev)

    @jax.jit
    def run_packed(s, tk, ts_, p):
        def body(i, acc):
            pkx = p ^ (s + i).astype(jnp.uint32) & jnp.uint32(0)
            # key = (lane << 1) | side ; build side=0 first
            kb = (tk << jnp.uint32(1))
            kp = (pkx << jnp.uint32(1)) | jnp.uint32(1)
            key = jnp.concatenate([kb, kp])
            piota = jax.lax.broadcasted_iota(
                jnp.int32, (N, 1), 0).reshape((N,))
            outp = jnp.concatenate([jnp.full((G,), -1, jnp.int32), piota])
            startp = jnp.concatenate([ts_, jnp.zeros((N,), jnp.int32)])
            endp = jnp.concatenate([ts_ + 1, jnp.zeros((N,), jnp.int32)])
            srt = lax.sort([key, outp, startp, endp], num_keys=1,
                           is_stable=False)
            skey, soutp, sstart, send = srt
            lane = skey >> jnp.uint32(1)
            isb = (skey & jnp.uint32(1)) == 0
            head = jnp.concatenate([
                jnp.ones((1,), jnp.bool_), lane[1:] != lane[:-1]])
            run_id = jnp.cumsum(head, dtype=jnp.int32) - 1
            # packed segmented broadcast: (run_id << 28 | start+1), etc.
            p1 = (run_id.astype(jnp.int64) << 28) | jnp.where(
                isb, sstart + 1, 0).astype(jnp.int64)
            p2 = (run_id.astype(jnp.int64) << 28) | jnp.where(
                isb, send + 1, 0).astype(jnp.int64)
            c1 = (lax.cummax(p1) & jnp.int64((1 << 28) - 1)).astype(
                jnp.int32) - 1
            c2 = (lax.cummax(p2) & jnp.int64((1 << 28) - 1)).astype(
                jnp.int32) - 1
            # scatter (start:28 | end:28) back to probe rows
            packed = (jnp.maximum(c1, 0).astype(jnp.int64) << 28) | \
                jnp.maximum(c2, 0).astype(jnp.int64)
            packed = jnp.where(c1 >= 0, packed, jnp.int64(-1))
            dst = jnp.where(soutp >= 0, soutp, N)
            se = jnp.full((N,), -1, jnp.int64).at[dst].set(
                packed, mode="drop", unique_indices=True)
            return acc + se[::65537].sum()
        return lax.fori_loop(0, 4, body, jnp.int64(0))

    sec = timeit(run_packed, t_key, t_start, pk)
    print(f"packed 1-key probe (sort+2 cummax+1 i64 scatter) 20M: "
          f"{N/sec/1e6:.1f}M rows/s ({sec*1e3:.0f}ms)", flush=True)


if __name__ == "__main__":
    main()
