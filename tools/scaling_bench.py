"""Scaling-efficiency harness: distributed group_by / join over 1-2-4-8
device meshes (SURVEY.md north star: >=80% rows/s scaling efficiency).

On a dev box this runs against VIRTUAL CPU devices (8-way host platform),
so the absolute rates are proxies — all shards share the same host cores
and scaling efficiency is structurally capped. The harness exists so the
same measurement runs unmodified on a real multi-chip TPU slice (where
shards are real chips and ICI carries the all_to_all): point JAX at the
slice and the table becomes the true scaling curve.

Usage:  python tools/scaling_bench.py [--rows 1048576] [--op group_by|join|all]
Prints one JSON line per (op, n_devices) and a final summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               " --xla_force_host_platform_device_count=8"
                               ).strip()

import jax  # noqa: E402

if os.environ.get("SCALING_BENCH_CPU", "1") == "1":
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import pyarrow as pa  # noqa: E402

import arrow_tpu as at  # noqa: E402
from arrow_tpu.acero.options import HashJoinNodeOptions  # noqa: E402
from arrow_tpu.parallel import DistContext  # noqa: E402


def _time_best(fn, reps=3):
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(jax.tree_util.tree_leaves(out))
        best = min(best, time.perf_counter() - t0)
    return best


def bench_group_by(ctx: DistContext, rows: int) -> float:
    rng = np.random.default_rng(0)
    t = pa.table({"k": pa.array(rng.integers(0, 10_000, rows)),
                  "v": pa.array(rng.standard_normal(rows))})
    b = at.Batch.from_pyarrow(t.to_batches()[0])

    def run():
        return ctx.group_by(b, ["k"], [("sum", "v"), ("count_all",)],
                            max_groups_per_shard=1 << 15)

    run()  # compile
    return rows / _time_best(run)


def bench_join(ctx: DistContext, rows: int) -> float:
    rng = np.random.default_rng(1)
    nr = max(rows // 16, 1024)
    l = pa.table({"k": pa.array(rng.integers(0, nr, rows)),
                  "lv": pa.array(rng.standard_normal(rows))})
    r = pa.table({"k": pa.array(rng.permutation(nr)),
                  "rv": pa.array(rng.standard_normal(nr))})
    lb = at.Batch.from_pyarrow(l.to_batches()[0])
    rb = at.Batch.from_pyarrow(r.to_batches()[0])
    opts = HashJoinNodeOptions("inner", ["k"], ["k"], right_output=["rv"],
                               max_build_rows=1 << 17)

    def run():
        return ctx.join(lb, rb, opts, fanout_per_shard=rows)

    run()
    return rows / _time_best(run)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1 << 20)
    ap.add_argument("--op", default="all",
                    choices=["group_by", "join", "all"])
    args = ap.parse_args()
    ops = {"group_by": bench_group_by, "join": bench_join}
    if args.op != "all":
        ops = {args.op: ops[args.op]}
    devs = jax.devices()
    counts = [n for n in (1, 2, 4, 8) if n <= len(devs)]
    summary = {}
    for name, fn in ops.items():
        base = None
        rates = {}
        for n in counts:
            ctx = DistContext(devices=devs[:n])
            rate = fn(ctx, args.rows)
            base = base or rate
            eff = rate / (base * n)
            rates[n] = rate
            print(json.dumps({"op": name, "n_devices": n,
                              "rows_per_s": round(rate),
                              "efficiency_vs_1": round(eff, 3)}),
                  flush=True)
        summary[name] = {str(n): round(r) for n, r in rates.items()}
    print(json.dumps({"metric": "scaling", "rows": args.rows,
                      "backend": jax.default_backend(),
                      "rates": summary}), flush=True)


if __name__ == "__main__":
    main()
