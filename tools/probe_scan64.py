"""x64-ON scan-primitive probe: i64 vs i32 cummax, Hillis-Steele
segmented scan, fill+gather carry — the basis for the round-4 removal
of packed-int64 cummax tricks (emulated on v5e)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import arrow_tpu  # enables x64
import jax, jax.numpy as jnp
from jax import lax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
dev = jax.devices()[0]
N = 20_000_000
rng = np.random.default_rng(0)
v32 = jax.device_put(rng.integers(0, 1 << 30, N).astype(np.int32), dev)
v64 = jax.device_put(rng.integers(0, 1 << 60, N).astype(np.int64), dev)
head = jax.device_put((rng.random(N) < 0.1), dev)

def timeit(fn, *args, K=2):
    jax.device_get(fn(np.int32(0), *args))
    ts = []
    for s in range(1, 4):
        t0 = time.perf_counter()
        jax.device_get(fn(np.int32(s), *args))
        ts.append(time.perf_counter() - t0)
    real = [t for t in ts if t > 2e-3]
    return (float(np.median(real)) / K) if real else float("nan")

@jax.jit
def cm32(s, v):
    def body(i, acc):
        c = lax.cummax(v ^ (s + i))
        return acc + c[::65537].astype(jnp.int64).sum()
    return lax.fori_loop(0, 2, body, jnp.int64(0))

@jax.jit
def cm64(s, v):
    def body(i, acc):
        c = lax.cummax(v ^ (s + i).astype(jnp.int64))
        return acc + c[::65537].sum()
    return lax.fori_loop(0, 2, body, jnp.int64(0))

@jax.jit
def cs64(s, v):
    def body(i, acc):
        c = jnp.cumsum(v ^ (s + i).astype(jnp.int64))
        return acc + c[::65537].sum()
    return lax.fori_loop(0, 2, body, jnp.int64(0))

@jax.jit
def hillis(s, v, h):
    def body(i, acc):
        x = v ^ (s + i)
        f = h
        d = 1
        while d < N:
            xs = jnp.concatenate([x[:d], x[:-d]])
            fs = jnp.concatenate([jnp.ones((d,), jnp.bool_), f[:-d]])
            idx = lax.broadcasted_iota(jnp.int32, (N, 1), 0).reshape((N,))
            take = (idx >= d) & ~f
            x = jnp.where(take, jnp.maximum(xs, x), x)
            f = f | fs
            d *= 2
        return acc + x[::65537].astype(jnp.int64).sum()
    return lax.fori_loop(0, 2, body, jnp.int64(0))

@jax.jit
def fill_gather(s, v, h):
    def body(i, acc):
        x = v ^ (s + i)
        pos1 = lax.broadcasted_iota(jnp.int32, (N, 1), 0).reshape((N,)) + 1
        src = lax.cummax(jnp.where(x > 0, pos1, 0))
        hsrc = lax.cummax(jnp.where(h, pos1, 0))
        ok = src >= hsrc
        out = jnp.where(ok, x[jnp.clip(src - 1, 0, N - 1)], -1)
        return acc + out[::65537].astype(jnp.int64).sum()
    return lax.fori_loop(0, 2, body, jnp.int64(0))

print(f"cummax i32 20M: {timeit(cm32, v32)*1e3:.0f}ms", flush=True)
print(f"cummax i64 20M: {timeit(cm64, v64)*1e3:.0f}ms", flush=True)
print(f"cumsum i64 20M: {timeit(cs64, v64)*1e3:.0f}ms", flush=True)
print(f"hillis-seg-max i32 20M (25 passes): {timeit(hillis, v32, head)*1e3:.0f}ms", flush=True)
print(f"fill+gather carry 20M: {timeit(fill_gather, v32, head)*1e3:.0f}ms", flush=True)
