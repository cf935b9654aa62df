"""Phase-level timing of the v3 join on the bench shape (1M build x 20M
probe, inner). Times each phase in its own fori_loop jit so the slow
stage is unambiguous.

Run:  python tools/join_phase_probe.py
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


def timeit(fn, *args, reps=3, K=2):
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
    import arrow_tpu as at
    from arrow_tpu.acero.options import HashJoinNodeOptions
    from arrow_tpu.ops.join import HashJoin
    from arrow_tpu.core.array import row_mask
    from arrow_tpu.ops.grouper import group_key_lanes

    nb = 1_000_000
    np_ = 20_000_000
    rng = np.random.default_rng(11)
    build_keys = rng.permutation(2 * nb)[:nb].astype(np.int64)
    build_vals = rng.standard_normal(nb).astype(np.float32)
    probe_keys = rng.integers(0, 2 * nb, np_).astype(np.int64)
    probe_vals = rng.standard_normal(np_).astype(np.float32)

    left = at.batch({"k": probe_keys, "pv": probe_vals},
                    capacity=np_).device_put(dev)
    right = at.batch({"k": build_keys, "bv": build_vals},
                     capacity=nb).device_put(dev)
    max_build = 1 << 20
    hj = HashJoin(left.schema, right.schema, HashJoinNodeOptions(
        "inner", left_keys=["k"], right_keys=["k"],
        max_build_rows=max_build))
    fanout = 1 << 24

    bs = jax.jit(hj.build)(right)
    print("pack_bits:", int(jax.device_get(bs.pack_bits)), flush=True)

    # -- build ----------------------------------------------------------
    @jax.jit
    def run_build(s, r):
        def body(i, acc):
            bv = r.column("bv").values + (s + i).astype(jnp.float32) * 1e-6
            r2 = r.set_column("bv", at.Array(at.float32, bv, None,
                                             length=nb))
            b = hj.build(r2)
            return acc + b.starts_seg[::4097].sum().astype(jnp.float32)
        return lax.fori_loop(0, 2, body, jnp.float32(0))

    sec = timeit(run_build, right)
    print(f"build 1M: {sec*1e3:.0f}ms", flush=True)

    # -- find (spans) per impl -----------------------------------------
    for impl in ("packed", "sort"):
        @jax.jit
        def run_find(s, b, l, impl=impl):
            keys = [l.column("k")]
            cap = l.capacity

            def body(i, acc):
                ok = jnp.ones((cap,), jnp.bool_) & (
                    jax.lax.broadcasted_iota(
                        jnp.int32, (cap, 1), 0).reshape((cap,)) >= 0)
                start, cnt, _ = hj._probe_spans(
                    b, l, keys, ok ^ (jnp.zeros((cap,), jnp.bool_) &
                                      (s + i == -1)), impl, False)
                return acc + start[::65537].sum().astype(jnp.float32) + \
                    cnt[::65537].sum().astype(jnp.float32)
            return lax.fori_loop(0, 2, body, jnp.float32(0))

        sec = timeit(run_find, bs, left)
        print(f"find[{impl}] 20M: {sec*1e3:.0f}ms", flush=True)

    # -- geometry -------------------------------------------------------
    keys = [left.column("k")]
    ok0 = jnp.ones((np_,), jnp.bool_)
    start0, cnt0, _ = jax.jit(
        lambda b, l: hj._probe_spans(b, l, [l.column("k")],
                                     jnp.ones((np_,), jnp.bool_),
                                     "packed", False))(bs, left)

    @jax.jit
    def run_geom(s, b, l, start, cnt):
        def body(i, acc):
            st = jnp.where(start >= 0, start, start + 0 * (s + i))
            r, o, brow, hm, vj, p_, total, ovf = hj._pair_geometry(
                b, l, st, cnt, fanout, False)
            return acc + r[::65537].sum().astype(jnp.float32) + \
                brow[::65537].sum().astype(jnp.float32)
        return lax.fori_loop(0, 2, body, jnp.float32(0))

    sec = timeit(run_geom, bs, left, start0, cnt0)
    print(f"geometry T=16M: {sec*1e3:.0f}ms", flush=True)

    # -- materialize ----------------------------------------------------
    r0, o0, brow0, hm0, vj0, p0, total0, _ = jax.jit(
        lambda b, l, st, cn: hj._pair_geometry(b, l, st, cn, fanout,
                                               False))(
        bs, left, start0, cnt0)

    @jax.jit
    def run_mat(s, b, l, r, brow, p_, total):
        def body(i, acc):
            rr = jnp.clip(r + 0 * (s + i), 0, np_ - 1)
            out = hj._materialize(b, l, rr, brow, p_, total)
            return acc + out.column("bv").values[::65537].sum() + \
                out.column("pv").values[::65537].sum()
        return lax.fori_loop(0, 2, body, jnp.float32(0))

    sec = timeit(run_mat, bs, left, r0, brow0, p0, total0)
    print(f"materialize T=16M: {sec*1e3:.0f}ms", flush=True)

    # -- whole probe ----------------------------------------------------
    for impl in ("packed_u", "packed", "sort"):
        @jax.jit
        def run_probe(s, b, l, impl=impl):
            def body(i, acc):
                pv = l.column("pv").values + (s + i).astype(
                    jnp.float32) * 1e-6
                l2 = l.set_column("pv", at.Array(at.float32, pv, None,
                                                 length=np_))
                out, _ = hj.probe(b, l2, fanout_capacity=fanout,
                                  impl=impl)
                return acc + out.column("bv").values[::65537].sum() + \
                    out.length.astype(jnp.float32)
            return lax.fori_loop(0, 2, body, jnp.float32(0))

        sec = timeit(run_probe, bs, left)
        print(f"probe[{impl}] 20M end-to-end: {sec*1e3:.0f}ms "
              f"({np_/sec/1e6:.1f}M rows/s)", flush=True)


if __name__ == "__main__":
    main()
