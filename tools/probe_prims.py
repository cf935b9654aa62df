"""On-chip primitive throughput probe (round 4).

Measures the building blocks the join/group-by redesign chooses between:
  * lax.sort throughput vs (n, #key operands, #payload operands)
  * 1D gather throughput vs table size (VMEM-resident vs HBM)
  * unique-index scatter throughput
  * binary-search probe (fori_loop of gathers) vs sort-merge find

Run:  python tools/probe_prims.py
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


def timeit(fn, *args, reps=3):
    import jax
    jax.device_get(fn(np.int32(0), *args))
    ts = []
    for s in range(1, reps + 1):
        t0 = time.perf_counter()
        jax.device_get(fn(np.int32(s), *args))
        ts.append(time.perf_counter() - t0)
    real = [t for t in ts if t > 2e-3]
    return float(np.median(real)) if real else float("nan")


def main():
    dev = setup()
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    N = 20_000_000
    K = 4

    # ---- sort throughput vs operand mix -------------------------------
    for nkeys, npay in [(1, 1), (2, 2), (3, 3), (4, 2), (1, 4)]:
        keys = [jax.device_put(rng.integers(0, 1 << 32, N, dtype=np.uint32),
                               dev) for _ in range(nkeys)]
        pays = [jax.device_put(rng.integers(0, 1 << 31, N).astype(np.int32),
                               dev) for _ in range(npay)]

        @jax.jit
        def run(s, ks, ps, nk=nkeys):
            def body(i, acc):
                k0 = ks[0] ^ (s + i).astype(jnp.uint32)
                out = lax.sort([k0] + list(ks[1:]) + list(ps), num_keys=nk,
                               is_stable=False)
                return acc + out[-1][::65537].astype(jnp.int64).sum()
            return lax.fori_loop(0, K, body, jnp.int64(0))

        sec = timeit(run, keys, pays) / K
        print(f"sort n=20M keys={nkeys} pays={npay}: "
              f"{N/sec/1e6:.0f}M rows/s  ({sec*1e3:.0f}ms)", flush=True)

    # ---- 1D gather throughput vs table size ----------------------------
    for tbl_n in [4096, 1 << 16, 1 << 20, 1 << 24]:
        tbl = jax.device_put(
            rng.integers(0, 1 << 31, tbl_n).astype(np.int32), dev)
        idx = jax.device_put(
            rng.integers(0, tbl_n, N).astype(np.int32), dev)

        @jax.jit
        def run(s, t, ix):
            def body(i, acc):
                ix2 = (ix + s + i) % tbl_n
                g = t[ix2]
                return acc + g[::65537].astype(jnp.int64).sum()
            return lax.fori_loop(0, K, body, jnp.int64(0))

        sec = timeit(run, tbl, idx) / K
        print(f"gather 20M from {tbl_n}: {N/sec/1e6:.0f}M elem/s  "
              f"({sec*1e3:.0f}ms)", flush=True)

    # ---- unique scatter throughput -------------------------------------
    perm = jax.device_put(rng.permutation(N).astype(np.int32), dev)
    vals = jax.device_put(rng.integers(0, 1 << 31, N).astype(np.int32), dev)

    @jax.jit
    def run_sc(s, p, v):
        def body(i, acc):
            v2 = v ^ (s + i)
            out = jnp.zeros((N,), jnp.int32).at[p].set(
                v2, mode="drop", unique_indices=True)
            return acc + out[::65537].astype(jnp.int64).sum()
        return lax.fori_loop(0, K, body, jnp.int64(0))

    sec = timeit(run_sc, perm, vals) / K
    print(f"unique scatter 20M: {N/sec/1e6:.0f}M elem/s ({sec*1e3:.0f}ms)",
          flush=True)

    # ---- binary-search probe vs sort-merge find -------------------------
    G = 1 << 20
    tbl_lanes = np.sort(rng.choice(np.arange(2 * G, dtype=np.uint64), G,
                                   replace=False)).astype(np.uint64)
    t_lo = jax.device_put((tbl_lanes & 0xFFFFFFFF).astype(np.uint32), dev)
    t_hi = jax.device_put((tbl_lanes >> 32).astype(np.uint32), dev)
    pk = rng.integers(0, 2 * G, N).astype(np.uint64)
    p_lo = jax.device_put((pk & 0xFFFFFFFF).astype(np.uint32), dev)
    p_hi = jax.device_put((pk >> 32).astype(np.uint32), dev)

    STEPS = 21

    @jax.jit
    def run_bs(s, thi, tlo, phi, plo):
        def body(i, acc):
            ph = phi ^ (s + i).astype(jnp.uint32) * 0  # keep shape; vary lo
            pl = plo ^ jnp.uint32(0)
            lo = jnp.zeros((N,), jnp.int32)
            hi = jnp.full((N,), G, jnp.int32)

            def step(_, lh):
                lo, hi = lh
                mid = (lo + hi) >> 1
                th = thi[mid]
                tl = tlo[mid]
                lt = (th < ph) | ((th == ph) & (tl < pl))
                lo = jnp.where(lt, mid + 1, lo)
                hi = jnp.where(lt, hi, mid)
                return (lo, hi)

            lo, hi = lax.fori_loop(0, STEPS, step, (lo, hi))
            pos = jnp.clip(lo, 0, G - 1)
            hit = (thi[pos] == ph) & (tlo[pos] == pl)
            gid = jnp.where(hit, pos, -1)
            return acc + gid[::65537].astype(jnp.int64).sum()
        return lax.fori_loop(0, K, body, jnp.int64(0))

    sec = timeit(run_bs, t_hi, t_lo, p_hi, p_lo) / K
    print(f"binary-search probe 20M vs 1M table: {N/sec/1e6:.1f}M rows/s "
          f"({sec*1e3:.0f}ms)", flush=True)

    # sort-merge find baseline (the current probe)
    from arrow_tpu.ops.distinct import merge_find
    tg = jax.device_put(np.arange(G, dtype=np.int32), dev)
    tl2 = jnp.stack([t_hi, t_lo], axis=1)
    pl2 = jnp.stack([p_hi, p_lo], axis=1)
    act = jnp.ones((N,), bool)

    @jax.jit
    def run_mf(s, tl, tg_, pl_, a):
        def body(i, acc):
            g = merge_find(tl, tg_, pl_, a)
            return acc + (g[::65537].astype(jnp.int64) ^
                          (s + i).astype(jnp.int64)).sum()
        return lax.fori_loop(0, 2, body, jnp.int64(0))

    sec = timeit(run_mf, tl2, tg, pl2, act) / 2
    print(f"merge_find probe 20M vs 1M table: {N/sec/1e6:.1f}M rows/s "
          f"({sec*1e3:.0f}ms)", flush=True)


if __name__ == "__main__":
    main()
