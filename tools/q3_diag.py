"""Diagnose: (a) which adaptive slices engage in the fused Q3 spine,
(b) where to_table's ~430ms of host-side overhead goes (cProfile).

Run:  python tools/q3_diag.py
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
    date = dtm.date(1995, 3, 15)
    big = 1 << 22
    li_dev = at.Table.from_pyarrow(lineitem, max_rows_per_batch=big)
    ord_dev = at.Table.from_pyarrow(orders, max_rows_per_batch=big)
    cust_dev = at.Table.from_pyarrow(customer, max_rows_per_batch=big)

    def make():
        co = Declaration("hashjoin", HashJoinNodeOptions(
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
        lco = Declaration("hashjoin", HashJoinNodeOptions(
            "inner", left_keys=["l_orderkey"], right_keys=["o_orderkey"],
            left_output=["l_orderkey", "l_extendedprice", "l_discount"],
            right_output=["o_orderdate", "o_shippriority"],
            max_build_rows=1 << 19),
            inputs=[Declaration.from_sequence([
                Declaration("table_source", TableSourceNodeOptions(
                    li_dev, max_batch_rows=big)),
                Declaration("filter", FilterNodeOptions(
                    field("l_shipdate") > literal(date)))]), co])
        return Declaration.from_sequence([
            lco,
            Declaration("project", ProjectNodeOptions(
                [field("l_orderkey"),
                 field("l_extendedprice") * (1.0 - field("l_discount")),
                 field("o_orderdate"), field("o_shippriority")],
                ["l_orderkey", "rev", "o_orderdate", "o_shippriority"])),
            Declaration("aggregate", AggregateNodeOptions(
                [AggregateSpec("sum", "rev", name="revenue")],
                keys=["l_orderkey", "o_orderdate", "o_shippriority"],
                max_groups=1 << 19)),
            Declaration("order_by", OrderByNodeOptions(
                [("revenue", "descending"),
                 ("o_orderdate", "ascending")])),
            Declaration("fetch", FetchNodeOptions(0, 10)),
        ])

    d = make()
    for i in range(3):
        t0 = time.perf_counter()
        d.to_table()
        print(f"warm {i}: {(time.perf_counter()-t0)*1e3:.0f}ms",
              flush=True)

    # (a) spy on slice decisions during chain build
    orig_tap = fuse._obs_tap

    def spy_tap(sig, obs_keys, fn):
        key = repr(("obs", fuse._strip_slices(sig)))
        C = fuse._tight_capacity(key)
        last = sig[-1] if sig else None
        tag = last[0] if isinstance(last, tuple) and last else last
        print(f"  obs_tap after {tag!r}: obs="
              f"{fuse._PLAN_OBS.get(key)} C={C}", flush=True)
        return orig_tap(sig, obs_keys, fn)
    fuse._obs_tap = spy_tap
    node = d._build()
    sig, ok_ = [], []
    fuse._chain_single(node, sig, ok_)
    fuse._obs_tap = orig_tap

    # (b) host-side profile of one steady-state to_table
    import cProfile
    import pstats
    pr = cProfile.Profile()
    t0 = time.perf_counter()
    pr.enable()
    d.to_table()
    pr.disable()
    print(f"profiled to_table: {(time.perf_counter()-t0)*1e3:.0f}ms",
          flush=True)
    st = pstats.Stats(pr)
    st.sort_stats("cumulative")
    st.print_stats(22)


if __name__ == "__main__":
    main()
