"""Interleaved A/B timing of fused Q3 spine prefixes.

Between-line numbers from q3_fused_probe are polluted by relay weather
(stalls shift minute to minute). This probe stabilizes the adaptive
fused programs, then times the COMPILED spine callables directly,
A/B/A/B interleaved in one loop, so every variant sees the same
weather. Variants: full Q3 spine, spine-through-project, and
spine-through-joins.

Run:  python tools/q3_spine_ab.py
"""

from __future__ import annotations

import datetime as dtm
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import pyarrow as pa
    import arrow_tpu as at
    from arrow_tpu.acero import (AggregateNodeOptions, AggregateSpec,
                                 Declaration, FetchNodeOptions,
                                 FilterNodeOptions, HashJoinNodeOptions,
                                 OrderByNodeOptions, ProjectNodeOptions,
                                 TableSourceNodeOptions)
    from arrow_tpu.acero import fuse
    from arrow_tpu.acero.nodes import cached_stage, checked_jit
    from arrow_tpu.compute.expressions import field, literal
    from arrow_tpu.utils.tpch import tpch_table

    sf = 0.5

    def _f32(t):
        cols = {}
        for name in t.column_names:
            c = t[name]
            cols[name] = c.cast(pa.float32()) if pa.types.is_float64(
                c.type) else c
        return pa.table(cols)

    lineitem = _f32(tpch_table("lineitem", sf))
    orders = _f32(tpch_table("orders", sf))
    customer = _f32(tpch_table("customer", sf))
    n = lineitem.num_rows
    date = dtm.date(1995, 3, 15)
    big = 1 << 22
    li_dev = at.Table.from_pyarrow(lineitem, max_rows_per_batch=big)
    ord_dev = at.Table.from_pyarrow(orders, max_rows_per_batch=big)
    cust_dev = at.Table.from_pyarrow(customer, max_rows_per_batch=big)
    print(f"rows: li {n}", flush=True)

    def co_decl():
        return Declaration("hashjoin", HashJoinNodeOptions(
            "inner", left_keys=["o_custkey"], right_keys=["c_custkey"],
            left_output=["o_orderkey", "o_orderdate", "o_shippriority"],
            right_output=[], max_build_rows=1 << 17),
            inputs=[
                Declaration.from_sequence([
                    Declaration("table_source", TableSourceNodeOptions(
                        ord_dev, max_batch_rows=big)),
                    Declaration("filter", FilterNodeOptions(
                        field("o_orderdate") < literal(date)))]),
                Declaration.from_sequence([
                    Declaration("table_source", TableSourceNodeOptions(
                        cust_dev, max_batch_rows=big)),
                    Declaration("filter", FilterNodeOptions(
                        field("c_mktsegment") == "BUILDING"))]),
            ])

    def lco_decl():
        return Declaration("hashjoin", HashJoinNodeOptions(
            "inner", left_keys=["l_orderkey"], right_keys=["o_orderkey"],
            left_output=["l_orderkey", "l_extendedprice", "l_discount"],
            right_output=["o_orderdate", "o_shippriority"],
            max_build_rows=1 << 19),
            inputs=[Declaration.from_sequence([
                Declaration("table_source", TableSourceNodeOptions(
                    li_dev, max_batch_rows=big)),
                Declaration("filter", FilterNodeOptions(
                    field("l_shipdate") > literal(date)))]), co_decl()])

    proj = Declaration("project", ProjectNodeOptions(
        [field("l_orderkey"),
         field("l_extendedprice") * (1.0 - field("l_discount")),
         field("o_orderdate"), field("o_shippriority")],
        ["l_orderkey", "rev", "o_orderdate", "o_shippriority"]))
    agg = Declaration("aggregate", AggregateNodeOptions(
        [AggregateSpec("sum", "rev", name="revenue")],
        keys=["l_orderkey", "o_orderdate", "o_shippriority"],
        max_groups=1 << 19))
    srt = Declaration("order_by", OrderByNodeOptions(
        [("revenue", "descending"), ("o_orderdate", "ascending")]))
    fetch = Declaration("fetch", FetchNodeOptions(0, 10))

    variants = {
        "joins": lco_decl(),
        "joins+proj": Declaration.from_sequence([lco_decl(), proj]),
        "+agg": Declaration.from_sequence([lco_decl(), proj, agg]),
        "full": Declaration.from_sequence([lco_decl(), proj, agg, srt,
                                           fetch]),
    }

    # stabilize: 3 to_table runs per variant (bootstrap -> inline+slices
    # -> steady)
    for name, d in variants.items():
        for i in range(3):
            t0 = time.perf_counter()
            d.to_table()
            print(f"  stabilize {name} run{i}: "
                  f"{(time.perf_counter()-t0)*1e3:.0f}ms", flush=True)

    # compile the spine callables once, then interleave timed reps
    progs = {}
    for name, d in variants.items():
        node = d._build()
        sig, obs_keys = [], []
        args, fn = fuse._chain_single(node, sig, obs_keys)
        jfn = cached_stage(("fusedplan", tuple(sig)),
                           lambda fn=fn: checked_jit(
                               lambda *a: fn(*a)))
        progs[name] = (jfn, args)

    REPS = 6
    times = {k: [] for k in progs}
    times["full_to_table"] = []
    full_decl = variants["full"]
    for r in range(REPS):
        for name, (jfn, args) in progs.items():
            t0 = time.perf_counter()
            out, errs, obs = jfn(*args)
            ev = jax.device_get(list(errs) + list(obs) + [out.length])
            times[name].append(time.perf_counter() - t0)
            ne = len(errs)
            if r == 0 and any(int(np.asarray(v)) for v in ev[:ne]):
                print(f"  !! {name}: deferred checks fired "
                      f"{[i for i,v in enumerate(ev[:ne]) if int(np.asarray(v))]}",
                      flush=True)
        t0 = time.perf_counter()
        full_decl.to_table()
        times["full_to_table"].append(time.perf_counter() - t0)
    for name, ts in times.items():
        ms = sorted(round(x * 1e3) for x in ts)
        print(f"{name:>12}: median {np.median(ts)*1e3:7.1f}ms  {ms}",
              flush=True)
    full_med = float(np.median(times["full"]))
    print(f"\nfull spine: {full_med*1e3:.1f}ms -> "
          f"{n/full_med/1e6:.2f}M rows/s", flush=True)


if __name__ == "__main__":
    main()
