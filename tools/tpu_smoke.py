"""On-hardware compile-smoke gate (VERDICT r2 #5).

AOT-compiles every hot jitted program at bench capacities against the
real TPU — no input data needed beyond shapes — so a compile regression
(e.g. the round-2 scoped-VMEM OOM in the default filter path,
`.bench_logs/filter.log`) is caught BEFORE the driver's bench window,
not by it.

Programs covered (bench.py shapes unless --scale given):
  filter      10M-row (i64, f32) batch filter, K-iteration fori_loop body
  take        10M-row take through int32 indices
  sort        20M-row (int64, dict-string) sort_indices
  group_by    30M-row sum/min/count at 1K and 3M distinct keys
  join        1M x 20M build+probe
(The q3 pipeline's compile coverage comes from `bench.py --one q3`,
which runs the full plan at SF-0.5 — its stages reuse the programs
smoked here plus the plan engine's host orchestration.)

Run whenever the axon tunnel is live:
    python tools/tpu_smoke.py [--scale 1.0] [--only filter,sort]
Prints one PASS/FAIL line per program and exits non-zero on any FAIL.
BASELINE.md records the last green run.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _cache():
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def _spec(shape, dtype):
    import jax
    return jax.ShapeDtypeStruct(shape, dtype)


def smoke_filter(scale):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import arrow_tpu as at
    from arrow_tpu.ops.selection import filter_batch

    n = int(10_000_000 * scale)
    iota_mod = jnp.arange(n, dtype=jnp.int32) & 8191

    from arrow_tpu.core.schema import Field, Schema
    schema = Schema((Field("i", at.int64, True), Field("f", at.float32, True)))

    def run(s, iv, fv, mv0):
        b = at.Batch(schema, [at.Array(at.int64, iv, None, length=n),
                              at.Array(at.float32, fv, None, length=n)], n)

        def body(i, acc):
            mv = mv0 ^ (iota_mod == (s + i))
            out = filter_batch(b, at.Array(at.bool_, mv, None, length=n))
            acc = acc + out.column(0).values[::65537].astype(
                jnp.float32).sum()
            acc = acc + out.column(1).values[::65537].astype(
                jnp.float32).sum()
            return acc + out.length.astype(jnp.float32)
        return jax.lax.fori_loop(0, 10, body, jnp.float32(0))

    jax.jit(run).lower(
        _spec((), np.int32), _spec((n,), np.int64),
        _spec((n,), np.float32), _spec((n,), np.bool_)).compile()


def smoke_take(scale):
    import jax
    import numpy as np
    import arrow_tpu as at
    from arrow_tpu.ops.selection import take_batch

    n = int(10_000_000 * scale)

    from arrow_tpu.core.schema import Field, Schema
    schema = Schema((Field("i", at.int64, True), Field("f", at.float32, True)))

    def run(iv, fv, idx, ln):
        b = at.Batch(schema, [at.Array(at.int64, iv, None, length=n),
                              at.Array(at.float32, fv, None, length=n)], n)
        ind = at.Array(at.int32, idx, None, length=ln)
        out = take_batch(b, ind)
        return out.column(0).values, out.column(1).values

    jax.jit(run).lower(
        _spec((n,), np.int64), _spec((n,), np.float32),
        _spec((n,), np.int32), _spec((), np.int32)).compile()


def smoke_sort(scale):
    import jax
    import numpy as np
    import arrow_tpu as at
    from arrow_tpu.ops.sorting import SortKey, SortOptions, \
        sort_indices_batch

    n = int(20_000_000 * scale)
    opts = SortOptions([SortKey("s", "ascending"), SortKey("i", "descending")])

    from arrow_tpu.core.schema import Field, Schema
    dtyp = at.dictionary(at.int32, at.string)
    schema = Schema((Field("i", at.int64, True), Field("s", dtyp, True)))

    def run(iv, sv, dvals, doffs):
        d = at.Array(at.string, dvals, None, offsets=doffs, length=1000)
        b = at.Batch(schema, [
            at.Array(at.int64, iv, None, length=n),
            at.Array(dtyp, sv, None, dictionary=d, length=n)], n)
        return sort_indices_batch(b, opts).values

    jax.jit(run).lower(
        _spec((n,), np.int64), _spec((n,), np.int32),
        _spec((8192,), np.uint8), _spec((1001,), np.int32)).compile()


def smoke_group_by(scale, distinct):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import arrow_tpu as at
    from arrow_tpu.core.schema import Field, Schema
    from arrow_tpu.ops.hash_aggregate import AggregateSpec, HashAggregate

    n = int(30_000_000 * scale)
    schema = Schema((Field("k", at.int64, True), Field("v", at.float32, True)))
    max_groups = 1
    while max_groups < distinct * 2:
        max_groups *= 2
    ha = HashAggregate(schema, ["k"],
                       [AggregateSpec("sum", "v"), AggregateSpec("min", "v"),
                        AggregateSpec("count_all")], max_groups=max_groups)

    def run(kv, vv):
        b = at.Batch(schema, [at.Array(at.int64, kv, None, length=n),
                              at.Array(at.float32, vv, None, length=n)], n)
        state = ha.init_state()
        state = ha.consume(state, b)
        out = ha.finalize(state)
        return out.arrays[1].values, out.length

    jax.jit(run).lower(
        _spec((n,), np.int64), _spec((n,), np.float32)).compile()


def smoke_join(scale):
    import jax
    import numpy as np
    import arrow_tpu as at
    from arrow_tpu.acero.options import HashJoinNodeOptions
    from arrow_tpu.core.schema import Field, Schema
    from arrow_tpu.ops.join import HashJoin

    nb = int(1_000_000 * scale)
    np_ = int(20_000_000 * scale)
    lsch = Schema((Field("k", at.int64, True), Field("pv", at.float32, True)))
    rsch = Schema((Field("k", at.int64, True), Field("bv", at.float32, True)))
    max_build = 1
    while max_build < nb:
        max_build *= 2
    hj = HashJoin(lsch, rsch, HashJoinNodeOptions(
        "inner", left_keys=["k"], right_keys=["k"],
        max_build_rows=max_build))
    fanout = 1
    while fanout < int(np_ * 0.6):
        fanout *= 2

    def run(lk, lv, rk, rv):
        l = at.Batch(lsch, [at.Array(at.int64, lk, None, length=np_),
                            at.Array(at.float32, lv, None, length=np_)], np_)
        r = at.Batch(rsch, [at.Array(at.int64, rk, None, length=nb),
                            at.Array(at.float32, rv, None, length=nb)], nb)
        bs = hj.build(r)
        out, _ = hj.probe(bs, l, fanout_capacity=fanout)
        return out.column("bv").values, out.length

    jax.jit(run).lower(
        _spec((np_,), np.int64), _spec((np_,), np.float32),
        _spec((nb,), np.int64), _spec((nb,), np.float32)).compile()


SMOKES = {
    "filter": lambda s: smoke_filter(s),
    "take": lambda s: smoke_take(s),
    "sort": lambda s: smoke_sort(s),
    "group_by_1k": lambda s: smoke_group_by(s, 1000),
    "group_by_3m": lambda s: smoke_group_by(s, 3_000_000),
    "join": lambda s: smoke_join(s),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=float, default=1.0)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    _cache()

    names = args.only.split(",") if args.only else list(SMOKES)
    failed = []
    for name in names:
        t0 = time.time()
        try:
            SMOKES[name](args.scale)
            print(f"PASS {name}  ({time.time() - t0:.1f}s)", flush=True)
        except Exception as e:
            msg = str(e).replace("\n", " ")[:300]
            print(f"FAIL {name}  ({time.time() - t0:.1f}s): {msg}",
                  flush=True)
            traceback.print_exc(file=sys.stderr)
            failed.append(name)
    if failed:
        print(f"SMOKE FAILED: {failed}", flush=True)
        sys.exit(1)
    print("SMOKE OK", flush=True)


if __name__ == "__main__":
    main()
