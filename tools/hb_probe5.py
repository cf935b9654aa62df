"""host_boundary round-5 bisect: where do the milliseconds go, and what
would a SLOTTED short-string representation ((cap, W) u8 matrix + exact
offsets) buy vs the byte-packed pool?

Every timed fn is seed-perturbed inside one jit (the axon relay memoizes
repeat executions of an executable) and reduced to a scalar fetch.

Run:  python tools/hb_probe5.py
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
    from arrow_tpu.ops.hashing import varlen_content_lanes
    from arrow_tpu.ops.vector_hash import _distinct
    from arrow_tpu.ops.distinct import sort_distinct
    from arrow_tpu.ops.selection import (filter_batch,
                                         _filter_varlen_bytes)
    from arrow_tpu.ops.strings_regex import _pushdown_encode

    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    n = 2_000_000
    rng = np.random.default_rng(7)
    words = np.array([f"id{i % 977:03d}x{i % 31}" for i in range(4096)])
    vals = words[rng.integers(0, len(words), n)]
    ints = rng.integers(0, 1 << 30, n)
    rb = pa.record_batch({"s": pa.array(vals), "v": pa.array(ints)})
    batch = at.Batch.from_pyarrow(rb).device_put(dev)
    col = batch.column(0)
    print("pool bytes:", int(col.values.shape[0]), "cap:", col.capacity,
          flush=True)

    # host-built slotted representation (cap, 16) u8 -> 4 u32 lanes
    W = 16
    sa = rb["s"]
    offs = np.asarray(sa.buffers()[1]).view(np.int32)
    pool = np.asarray(sa.buffers()[2]).view(np.uint8)
    lens_np = (offs[1:] - offs[:-1]).astype(np.int32)
    slot_np = np.zeros((n, W), np.uint8)
    keep = np.arange(W)[None, :] < lens_np[:, None]
    src = np.minimum(offs[:-1, None] + np.arange(W)[None, :],
                     len(pool) - 1)
    slot_np[keep] = pool[src[keep]]
    lanes_np = slot_np.view(np.uint32)          # (n, 4) little-endian
    slot_dev = jax.device_put(jnp.asarray(slot_np), dev)
    lens_dev = jax.device_put(jnp.asarray(lens_np), dev)
    ints_dev = jax.device_put(jnp.asarray(ints), dev)

    def timeit(label, make_fn, reps=3):
        fn = jax.jit(make_fn)
        jax.device_get(fn(np.int32(0)))
        ts = []
        for s in range(1, reps + 1):
            t0 = time.perf_counter()
            jax.device_get(fn(np.int32(s)))
            ts.append(time.perf_counter() - t0)
        real = [t for t in ts if t > 2e-3]
        med = float(np.median(real)) if real else float("nan")
        print(f"{label:>44}: {med*1e3:8.1f}ms  {sorted(ts)}", flush=True)
        return med

    def perturb_col(s):
        # flip a low bit of the first byte of each string (changes
        # content, preserves lengths) so the relay can't memoize
        v = col.values
        v = v.at[0].set((v[0] ^ (s & 1)).astype(jnp.uint8))
        from arrow_tpu.core.array import Array
        return Array(col.type, v, col.validity, offsets=col.offsets,
                     length=col.length)

    # 1. content lanes (short path: 18M-byte scatter into (cap,16) slots)
    def f_lanes(s):
        a = perturb_col(s)
        ls = varlen_content_lanes(a)
        return sum(l.astype(jnp.uint32).sum() for l in ls)
    timeit("varlen_content_lanes (pool scatter)", f_lanes)

    # 2. full _distinct (lanes + 6-lane sort_group + scatters)
    def f_dist(s):
        a = perturb_col(s)
        codes, ur, nn = _distinct(a, include_nulls=False)
        return codes.sum() + nn
    timeit("_distinct (lanes+sort+codes)", f_dist)

    # 3. whole _pushdown_encode
    def f_enc(s):
        a = perturb_col(s)
        c, nn, slots, lens, err = _pushdown_encode.__wrapped__(a)
        return c.sum() + nn + slots.astype(jnp.uint32).sum() + err
    timeit("_pushdown_encode (total)", f_enc)

    # 4. SIMULATED slotted distinct: lanes are free (bitcast of resident
    # slots), only the sort_group + scatters remain
    def f_sdist(s):
        sl = slot_dev.at[0, 0].set(
            (slot_dev[0, 0] ^ (s & 1)).astype(jnp.uint8))
        lanes4 = jax.lax.bitcast_convert_type(
            sl.reshape((n, W // 4, 4)), jnp.uint32)
        lanes = jnp.concatenate(
            [lens_dev.astype(jnp.uint32)[:, None], lanes4], axis=1)
        active = jnp.ones((n,), jnp.bool_)
        codes, ur, nn = sort_distinct(lanes, active)
        return codes.sum() + nn
    timeit("slotted distinct (sim)", f_sdist)

    # 5. current jitted filter (50% mask) — mask padded to batch capacity
    cap = batch.capacity
    mask_np = np.zeros((cap,), bool)
    mask_np[:n] = rng.random(n) < 0.5
    from arrow_tpu.core.array import Array as A
    from arrow_tpu.core import datatype as dt
    mask_dev = A(dt.bool_, jax.device_put(jnp.asarray(mask_np), dev),
                 None, length=n)

    def f_filt(s):
        b2 = at.Batch(batch.schema,
                      [perturb_col(s), batch.column(1)], batch.length)
        out = filter_batch(b2, mask_dev)
        return out.column(1).values[::8191].astype(jnp.float32).sum() + \
            out.length.astype(jnp.float32)
    timeit("filter_batch (current, 50% sel)", f_filt)

    # 6. the byte-pool 1-bit sort alone
    def f_fvb(s):
        a = perturb_col(s)
        out = _filter_varlen_bytes(a, jnp.asarray(mask_np))
        return out.astype(jnp.uint32).sum()
    timeit("_filter_varlen_bytes (pool sort)", f_fvb)

    mask_n = mask_np[:n]

    # 7. SIMULATED slotted filter: one 1-bit-key sort, string rides as
    # 4 u32 lanes + lens payload; new offsets = cumsum of kept lens
    def f_sfilt(s):
        sl = slot_dev.at[0, 0].set(
            (slot_dev[0, 0] ^ (s & 1)).astype(jnp.uint8))
        lanes4 = jax.lax.bitcast_convert_type(
            sl.reshape((n, W // 4, 4)), jnp.uint32)
        key = (~jnp.asarray(mask_n)).astype(jnp.uint8)
        ops = [key, ints_dev, lens_dev] + \
            [lanes4[:, j] for j in range(4)]
        out = jax.lax.sort(ops, num_keys=1, is_stable=True)
        newlens = out[2]
        no = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                              jnp.cumsum(newlens, dtype=jnp.int32)])
        return out[1][::8191].astype(jnp.float32).sum() + \
            no[-1].astype(jnp.float32) + out[3].sum()
    timeit("slotted filter (sim)", f_sfilt)

    # 8. raw 6-lane sort_group cost floor (precomputed lanes)
    lanes_const = jax.device_put(
        jnp.concatenate([jnp.asarray(lens_np, jnp.uint32)[:, None],
                         jnp.asarray(lanes_np)], axis=1), dev)

    def f_sg(s):
        l2 = lanes_const.at[0, 0].set(lanes_const[0, 0] ^ (s & 1))
        codes, ur, nn = sort_distinct(l2, jnp.ones((n,), jnp.bool_))
        return codes.sum() + nn
    timeit("sort_distinct on resident lanes", f_sg)


if __name__ == "__main__":
    main()
