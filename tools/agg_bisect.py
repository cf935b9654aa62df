"""Bisect the generic grouped-aggregate consume at Q3's shape (bench
timing pattern: K iterations inside one jit, seed-perturbed inputs,
outputs consumed into the carry).

Run:  python tools/agg_bisect.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp
    from jax import lax
    import arrow_tpu as at
    from arrow_tpu.ops.hash_aggregate import AggregateSpec, HashAggregate
    from arrow_tpu.ops.grouper import group_key_lanes
    from arrow_tpu.ops.distinct import sort_group
    from arrow_tpu.core.array import row_mask

    dev = jax.devices()[0]
    n = 3_500_000
    length = 1_500_000
    R = 1 << 19
    rng = np.random.default_rng(5)
    k1 = rng.integers(0, 3_000_000, n)
    k2 = rng.integers(0, 2400, n).astype(np.int32)
    k3 = rng.integers(0, 1, n).astype(np.int32)
    rev = rng.standard_normal(n).astype(np.float32)
    b0 = at.Batch(at.batch({"k1": k1, "k2": k2, "k3": k3, "v": rev},
                           capacity=n).schema,
                  at.batch({"k1": k1, "k2": k2, "k3": k3, "v": rev},
                           capacity=n).arrays, length).device_put(dev)
    keys = ["k1", "k2", "k3"]
    K = 2

    def timeit(fn):
        jax.device_get(fn(np.int32(0), b0))
        ts = []
        for s in range(1, 4):
            t0 = time.perf_counter()
            jax.device_get(fn(np.int32(s), b0))
            ts.append(time.perf_counter() - t0)
        real = [x for x in ts if x > 2e-3]
        return (float(np.median(real)) / K) if real else float("nan")

    def perturbed(b, s, i):
        v = b.column("k1").values ^ (s + i).astype(jnp.int64)
        return b.set_column("k1", at.Array(at.int64, v, None,
                                           length=b.length))

    def stage(label, inner):
        @jax.jit
        def run(s, b):
            def body(i, acc):
                b2 = perturbed(b, s, i)
                return acc + inner(b2)
            return lax.fori_loop(0, K, body, jnp.float32(0))
        sec = timeit(run)
        print(f"{label:>26}: {sec*1e3:7.1f}ms", flush=True)

    def i_lanes(b):
        lanes = group_key_lanes([b.column(k) for k in keys], (True,)*3)
        return lanes[::65537, 0].astype(jnp.float32).sum()
    stage("group_key_lanes", i_lanes)

    def i_sort(b):
        lanes = group_key_lanes([b.column(k) for k in keys], (True,)*3)
        act = row_mask(n, b.length)
        inact = (~act).astype(jnp.uint32)
        iota = lax.broadcasted_iota(jnp.int32, (n, 1), 0).reshape((n,))
        L = lanes.shape[1]
        ops = [inact] + [lanes[:, j] for j in range(L)] + [iota,
                                                           b.column("v").values]
        out = lax.sort(ops, num_keys=L + 1, is_stable=False)
        return out[1][::65537].astype(jnp.float32).sum() + \
            out[-1][::65537].sum()
    stage("raw grouping sort", i_sort)

    def i_sg(b):
        lanes = group_key_lanes([b.column(k) for k in keys], (True,)*3)
        act = row_mask(n, b.length)
        g, sp = sort_group(lanes, act, rep_capacity=R,
                           payloads=(b.column("v").values,),
                           need_codes=False)
        return g.unique_rows[::4097].astype(jnp.float32).sum() + \
            sp[0][::65537].sum() + g.num_unique.astype(jnp.float32)
    stage("sort_group(R=512K)", i_sg)

    ha = HashAggregate(b0.schema, keys,
                       [AggregateSpec("sum", "v", name="revenue")],
                       max_groups=R)

    def i_cons(b):
        st = ha.consume(ha.init_state(), b, None, None, True)
        leaves = jax.tree_util.tree_leaves(st)
        return sum(l[::4097].astype(jnp.float32).sum() for l in leaves
                   if hasattr(l, "ndim") and l.ndim == 1 and
                   l.dtype in (jnp.float32,))
    stage("consume(first=True)", i_cons)

    def i_consfin(b):
        st = ha.consume(ha.init_state(), b, None, None, True)
        out = ha.finalize(st)
        return out.arrays[-1].values[::4097].sum() + \
            out.length.astype(jnp.float32)
    stage("consume+finalize", i_consfin)

if __name__ == "__main__":
    main()
