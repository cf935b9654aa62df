"""Q3 FUSED-mode per-stage device-time budget (VERDICT r4 #1).

Times successive PREFIXES of the fused Q3 spine as whole plans through
the default driver (try_fused_to_table); consecutive differences
attribute device time per stage *in fused mode* (the constant host
fetch cancels in the differences). Build sides timed separately.

Run:  python tools/q3_fused_probe.py
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
    import jax.numpy as jnp
    import pyarrow as pa
    import arrow_tpu as at
    from arrow_tpu.acero import (AggregateNodeOptions, AggregateSpec,
                                 Declaration, FetchNodeOptions,
                                 FilterNodeOptions, HashJoinNodeOptions,
                                 OrderByNodeOptions, ProjectNodeOptions,
                                 TableSourceNodeOptions)
    from arrow_tpu.compute.expressions import field, literal
    from arrow_tpu.utils.tpch import tpch_table

    sf = float(os.environ.get("Q3_SF", "0.5"))

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
    print(f"lineitem {n} orders {orders.num_rows} "
          f"customer {customer.num_rows}", flush=True)

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

    def li_filtered():
        return Declaration.from_sequence([
            Declaration("table_source", TableSourceNodeOptions(
                li_dev, max_batch_rows=big)),
            Declaration("filter", FilterNodeOptions(
                field("l_shipdate") > literal(date)))])

    def lco_decl():
        return Declaration("hashjoin", HashJoinNodeOptions(
            "inner", left_keys=["l_orderkey"], right_keys=["o_orderkey"],
            left_output=["l_orderkey", "l_extendedprice", "l_discount"],
            right_output=["o_orderdate", "o_shippriority"],
            max_build_rows=1 << 19),
            inputs=[li_filtered(), co_decl()])

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

    prefixes = [
        ("cust_filter", Declaration.from_sequence([
            Declaration("table_source", TableSourceNodeOptions(
                cust_dev, max_batch_rows=big)),
            Declaration("filter", FilterNodeOptions(
                field("c_mktsegment") == "BUILDING"))])),
        ("co_join (orders filter + cust build+probe)", co_decl()),
        ("li_filter", li_filtered()),
        ("lco_join (li + co build+probe)", lco_decl()),
        ("+project", Declaration.from_sequence([lco_decl(), proj])),
        ("+aggregate", Declaration.from_sequence([lco_decl(), proj,
                                                  agg])),
        ("+order_by+fetch (full Q3)", Declaration.from_sequence(
            [lco_decl(), proj, agg, srt, fetch])),
    ]

    def timeit(label, decl, reps=3):
        t0 = time.perf_counter()
        t = decl.to_table()
        warm = time.perf_counter() - t0
        rows = t.num_rows
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            decl.to_table()
            ts.append(time.perf_counter() - t0)
        med = float(np.median([x for x in ts if x > 2e-3] or ts))
        print(f"{label:>44}: {med*1e3:8.1f}ms  warm0={warm*1e3:7.1f}ms "
              f"rows={rows}  {sorted(round(x*1e3) for x in ts)}",
              flush=True)
        return med

    results = {}
    for label, decl in prefixes:
        results[label] = timeit(label, decl)
    full = results["+order_by+fetch (full Q3)"]
    print(f"\nfull Q3: {full*1e3:.1f}ms -> {n/full/1e6:.2f}M rows/s",
          flush=True)


if __name__ == "__main__":
    main()
