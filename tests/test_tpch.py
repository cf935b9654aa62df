"""TPC-H end-to-end plan tests vs the pyarrow oracle.

Reference: ``acero/tpch_benchmark.cc`` (Q1 plan at :115) + the tpch_gen
node. Q1/Q3/Q6 exercise filter, project, hash join, grouped aggregation,
order_by and fetch through full multi-node plans.
"""

import datetime as dtm

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow_tpu as at
from arrow_tpu.acero import (AggregateNodeOptions, AggregateSpec,
                             Declaration, FetchNodeOptions,
                             FilterNodeOptions, HashJoinNodeOptions,
                             OrderByNodeOptions, ProjectNodeOptions,
                             TableSourceNodeOptions, TpchGenNodeOptions)
from arrow_tpu.compute.expressions import field, literal
from arrow_tpu.utils.tpch import tpch_table

SF = 0.003


@pytest.fixture(scope="module")
def lineitem():
    return tpch_table("lineitem", SF)


@pytest.fixture(scope="module")
def orders():
    return tpch_table("orders", SF)


@pytest.fixture(scope="module")
def customer():
    return tpch_table("customer", SF)


def test_tpch_gen_node(lineitem):
    decl = Declaration("tpch_gen", TpchGenNodeOptions("lineitem", SF))
    got = decl.to_pyarrow()
    assert got.num_rows == lineitem.num_rows
    assert set(got.column_names) == set(lineitem.column_names)


def test_lineitem_orders_consistency(lineitem, orders):
    # every lineitem orderkey exists in orders (the skeleton is shared)
    lo = set(lineitem["l_orderkey"].to_pylist())
    oo = set(orders["o_orderkey"].to_pylist())
    assert lo <= oo


def test_q1(lineitem):
    cutoff = dtm.date(1998, 12, 1) - dtm.timedelta(days=90)
    decl = Declaration.from_sequence([
        Declaration("table_source", TableSourceNodeOptions(
            lineitem, max_batch_rows=4096)),
        Declaration("filter", FilterNodeOptions(
            field("l_shipdate") <= literal(cutoff))),
        Declaration("project", ProjectNodeOptions(
            [field("l_returnflag"), field("l_linestatus"),
             field("l_quantity"), field("l_extendedprice"),
             field("l_extendedprice") * (1.0 - field("l_discount")),
             (field("l_extendedprice") * (1.0 - field("l_discount"))
              * (1.0 + field("l_tax"))),
             field("l_discount")],
            ["l_returnflag", "l_linestatus", "qty", "base_price",
             "disc_price", "charge", "l_discount"])),
        Declaration("aggregate", AggregateNodeOptions(
            [AggregateSpec("sum", "qty", name="sum_qty"),
             AggregateSpec("sum", "base_price", name="sum_base_price"),
             AggregateSpec("sum", "disc_price", name="sum_disc_price"),
             AggregateSpec("sum", "charge", name="sum_charge"),
             AggregateSpec("mean", "qty", name="avg_qty"),
             AggregateSpec("mean", "base_price", name="avg_price"),
             AggregateSpec("mean", "l_discount", name="avg_disc"),
             AggregateSpec("count_all", name="count_order")],
            keys=["l_returnflag", "l_linestatus"], max_groups=16)),
        Declaration("order_by", OrderByNodeOptions(
            [("l_returnflag", "ascending"), ("l_linestatus", "ascending")])),
    ])
    got = decl.to_pyarrow()

    # oracle: same query via pyarrow table ops
    t = lineitem.filter(pc.less_equal(lineitem["l_shipdate"], cutoff))
    disc_price = pc.multiply(t["l_extendedprice"],
                             pc.subtract(1.0, t["l_discount"]))
    charge = pc.multiply(disc_price, pc.add(1.0, t["l_tax"]))
    t = t.append_column("disc_price", disc_price)
    t = t.append_column("charge", charge)
    exp = t.group_by(["l_returnflag", "l_linestatus"]).aggregate([
        ("l_quantity", "sum"), ("l_extendedprice", "sum"),
        ("disc_price", "sum"), ("charge", "sum"),
        ("l_quantity", "mean"), ("l_extendedprice", "mean"),
        ("l_discount", "mean"), ([], "count_all")])
    # pyarrow cannot sort dictionary columns (our engine can) — decode for
    # the oracle sort
    exp = exp.set_column(0, "l_returnflag",
                         exp["l_returnflag"].cast(pa.string()))
    exp = exp.set_column(1, "l_linestatus",
                         exp["l_linestatus"].cast(pa.string()))
    exp = exp.sort_by([("l_returnflag", "ascending"),
                       ("l_linestatus", "ascending")])

    assert got.num_rows == exp.num_rows
    got_rf = got["l_returnflag"].cast(pa.string()).to_pylist()
    assert got_rf == exp["l_returnflag"].cast(pa.string()).to_pylist()
    for g_col, e_col in [("sum_qty", "l_quantity_sum"),
                         ("sum_base_price", "l_extendedprice_sum"),
                         ("sum_disc_price", "disc_price_sum"),
                         ("sum_charge", "charge_sum"),
                         ("avg_qty", "l_quantity_mean"),
                         ("avg_price", "l_extendedprice_mean"),
                         ("avg_disc", "l_discount_mean")]:
        np.testing.assert_allclose(got[g_col].to_pylist(),
                                   exp[e_col].to_pylist(), rtol=1e-9,
                                   err_msg=g_col)
    assert got["count_order"].to_pylist() == \
        exp["count_all"].to_pylist()


def test_q6(lineitem):
    lo, hi = dtm.date(1994, 1, 1), dtm.date(1995, 1, 1)
    decl = Declaration.from_sequence([
        Declaration("table_source", TableSourceNodeOptions(lineitem)),
        Declaration("filter", FilterNodeOptions(
            (field("l_shipdate") >= literal(lo))
            & (field("l_shipdate") < literal(hi))
            & (field("l_discount") >= 0.05)
            & (field("l_discount") <= 0.07)
            & (field("l_quantity") < 24.0))),
        Declaration("project", ProjectNodeOptions(
            [field("l_extendedprice") * field("l_discount")], ["revenue"])),
        Declaration("aggregate", AggregateNodeOptions(
            [AggregateSpec("sum", "revenue", name="revenue")], keys=[])),
    ])
    got = decl.to_pyarrow()

    m = pc.and_(
        pc.and_(pc.greater_equal(lineitem["l_shipdate"], lo),
                pc.less(lineitem["l_shipdate"], hi)),
        pc.and_(pc.and_(pc.greater_equal(lineitem["l_discount"], 0.05),
                        pc.less_equal(lineitem["l_discount"], 0.07)),
                pc.less(lineitem["l_quantity"], 24.0)))
    t = lineitem.filter(m)
    exp = pc.sum(pc.multiply(t["l_extendedprice"], t["l_discount"])).as_py()
    np.testing.assert_allclose(got["revenue"].to_pylist(), [exp],
                               rtol=1e-9)


def test_q3(lineitem, orders, customer):
    date = dtm.date(1995, 3, 15)
    co = Declaration("hashjoin", HashJoinNodeOptions(
        "inner", left_keys=["o_custkey"], right_keys=["c_custkey"],
        left_output=["o_orderkey", "o_orderdate", "o_shippriority"],
        right_output=[]),
        inputs=[
            Declaration.from_sequence([
                Declaration("table_source", TableSourceNodeOptions(orders)),
                Declaration("filter", FilterNodeOptions(
                    field("o_orderdate") < literal(date))),
            ]),
            Declaration.from_sequence([
                Declaration("table_source",
                            TableSourceNodeOptions(customer)),
                Declaration("filter", FilterNodeOptions(
                    field("c_mktsegment") == "BUILDING")),
            ]),
        ])
    lco = Declaration("hashjoin", HashJoinNodeOptions(
        "inner", left_keys=["l_orderkey"], right_keys=["o_orderkey"],
        left_output=["l_orderkey", "l_extendedprice", "l_discount"],
        right_output=["o_orderdate", "o_shippriority"]),
        inputs=[
            Declaration.from_sequence([
                Declaration("table_source",
                            TableSourceNodeOptions(lineitem)),
                Declaration("filter", FilterNodeOptions(
                    field("l_shipdate") > literal(date))),
            ]),
            co,
        ])
    decl = Declaration.from_sequence([
        lco,
        Declaration("project", ProjectNodeOptions(
            [field("l_orderkey"),
             field("l_extendedprice") * (1.0 - field("l_discount")),
             field("o_orderdate"), field("o_shippriority")],
            ["l_orderkey", "rev", "o_orderdate", "o_shippriority"])),
        Declaration("aggregate", AggregateNodeOptions(
            [AggregateSpec("sum", "rev", name="revenue")],
            keys=["l_orderkey", "o_orderdate", "o_shippriority"],
            max_groups=1 << 14)),
        Declaration("order_by", OrderByNodeOptions(
            [("revenue", "descending"), ("o_orderdate", "ascending")])),
        Declaration("fetch", FetchNodeOptions(0, 10)),
    ])
    got = decl.to_pyarrow()

    # oracle via pyarrow joins
    c = customer.filter(pc.equal(
        customer["c_mktsegment"].cast(pa.string()), "BUILDING"))
    o = orders.filter(pc.less(orders["o_orderdate"], date))
    li = lineitem.filter(pc.greater(lineitem["l_shipdate"], date))
    oc = o.join(c.select(["c_custkey"]), keys="o_custkey",
                right_keys="c_custkey", join_type="inner")
    j = li.select(["l_orderkey", "l_extendedprice", "l_discount"]).join(
        oc.select(["o_orderkey", "o_orderdate", "o_shippriority"]),
        keys="l_orderkey", right_keys="o_orderkey", join_type="inner")
    rev = pc.multiply(j["l_extendedprice"],
                      pc.subtract(1.0, j["l_discount"]))
    j = j.append_column("rev", rev)
    exp = j.group_by(["l_orderkey", "o_orderdate", "o_shippriority"]) \
        .aggregate([("rev", "sum")]) \
        .sort_by([("rev_sum", "descending"), ("o_orderdate", "ascending")])
    exp = exp.slice(0, 10)

    assert got.num_rows == exp.num_rows
    assert got["l_orderkey"].to_pylist() == exp["l_orderkey"].to_pylist()
    np.testing.assert_allclose(got["revenue"].to_pylist(),
                               exp["rev_sum"].to_pylist(), rtol=1e-9)
    assert got["o_orderdate"].to_pylist() == exp["o_orderdate"].to_pylist()


def test_q19_residual_join(lineitem):
    """TPC-H Q19 (simplified to one disjunct branch): lineitem x part
    equi-join on partkey with a RESIDUAL filter over both sides
    (p_brand/p_size/l_quantity) — the JoinResidualFilter path
    (options.h:571) at the query level."""
    part = tpch_table("part", SF)
    resid = ((field("p_brand") == "Brand#12")
             & (field("l_quantity") <= literal(25.0))
             & (field("p_size") <= literal(10)))
    decl = Declaration.from_sequence([
        Declaration("hashjoin", HashJoinNodeOptions(
            "inner", left_keys=["l_partkey"], right_keys=["p_partkey"],
            left_output=["l_extendedprice", "l_discount", "l_quantity"],
            right_output=["p_brand", "p_size"],
            max_build_rows=1 << 12, filter=resid),
            inputs=[
                Declaration("table_source",
                            TableSourceNodeOptions(lineitem)),
                Declaration("table_source", TableSourceNodeOptions(part)),
            ]),
        Declaration("project", ProjectNodeOptions(
            [field("l_extendedprice") * (literal(1.0) -
                                         field("l_discount"))],
            ["revenue"])),
        Declaration("aggregate", AggregateNodeOptions(
            [AggregateSpec("sum", "revenue", name="revenue")], keys=[])),
    ])
    got = decl.to_pyarrow()

    # oracle: pyarrow join + host-side residual filter
    j = lineitem.select(["l_partkey", "l_extendedprice", "l_discount",
                         "l_quantity"]).join(
        part.select(["p_partkey", "p_brand", "p_size"]),
        keys="l_partkey", right_keys="p_partkey", join_type="inner")
    m = pc.and_(pc.and_(
        pc.equal(j["p_brand"].cast(pa.string()), "Brand#12"),
        pc.less_equal(j["l_quantity"], 25.0)),
        pc.less_equal(j["p_size"], 10))
    jf = j.filter(m)
    exp = float(pc.sum(pc.multiply(
        jf["l_extendedprice"],
        pc.subtract(1.0, jf["l_discount"]))).as_py() or 0.0)
    np.testing.assert_allclose(got["revenue"].to_pylist()[0] or 0.0, exp,
                               rtol=1e-6)


def test_q10_topk(lineitem, orders, customer):
    """TPC-H Q10 shape: returned-item revenue by customer, top 20 by
    revenue — exercises join chain + grouped agg + the fused streaming
    top-k (order_by+fetch)."""
    d0, d1 = dtm.date(1993, 10, 1), dtm.date(1994, 1, 1)
    decl = Declaration.from_sequence([
        Declaration("hashjoin", HashJoinNodeOptions(
            "inner", left_keys=["l_orderkey"], right_keys=["o_orderkey"],
            left_output=["l_extendedprice", "l_discount"],
            right_output=["o_custkey"], max_build_rows=1 << 14),
            inputs=[
                Declaration.from_sequence([
                    Declaration("table_source",
                                TableSourceNodeOptions(lineitem)),
                    Declaration("filter", FilterNodeOptions(
                        field("l_returnflag") == "R")),
                ]),
                Declaration.from_sequence([
                    Declaration("table_source",
                                TableSourceNodeOptions(orders)),
                    Declaration("filter", FilterNodeOptions(
                        (field("o_orderdate") >= literal(d0))
                        & (field("o_orderdate") < literal(d1)))),
                ]),
            ]),
        Declaration("project", ProjectNodeOptions(
            [field("o_custkey"),
             field("l_extendedprice") * (literal(1.0) -
                                         field("l_discount"))],
            ["o_custkey", "rev"])),
        Declaration("aggregate", AggregateNodeOptions(
            [AggregateSpec("sum", "rev", name="revenue")],
            keys=["o_custkey"], max_groups=1 << 14)),
        Declaration("order_by", OrderByNodeOptions(
            [("revenue", "descending"), ("o_custkey", "ascending")])),
        Declaration("fetch", FetchNodeOptions(0, 20)),
    ])
    got = decl.to_pyarrow()

    li = lineitem.filter(pc.equal(
        lineitem["l_returnflag"].cast(pa.string()), "R"))
    o = orders.filter(pc.and_(
        pc.greater_equal(orders["o_orderdate"], d0),
        pc.less(orders["o_orderdate"], d1)))
    j = li.select(["l_orderkey", "l_extendedprice", "l_discount"]).join(
        o.select(["o_orderkey", "o_custkey"]),
        keys="l_orderkey", right_keys="o_orderkey", join_type="inner")
    rev = pc.multiply(j["l_extendedprice"],
                      pc.subtract(1.0, j["l_discount"]))
    exp = j.append_column("rev", rev).group_by("o_custkey") \
        .aggregate([("rev", "sum")]) \
        .sort_by([("rev_sum", "descending"),
                  ("o_custkey", "ascending")]).slice(0, 20)
    assert got["o_custkey"].to_pylist() == exp["o_custkey"].to_pylist()
    np.testing.assert_allclose(got["revenue"].to_pylist(),
                               exp["rev_sum"].to_pylist(), rtol=1e-6)


def test_q5_join_chain(lineitem, orders, customer):
    """TPC-H Q5 shape: 5-way join chain (lineitem-orders-customer-
    supplier-nation) + region filter + grouped revenue, descending sort —
    deep multi-join plan evidence (tpch_benchmark.cc plan family)."""
    supplier = tpch_table("supplier", SF)
    nation = tpch_table("nation", SF)
    d0, d1 = dtm.date(1994, 1, 1), dtm.date(1995, 1, 1)

    # region predicate folded to n_regionkey == 2 (nation carries the
    # region key directly; joining the 5-row region table adds nothing)
    decl = Declaration.from_sequence([
        Declaration("hashjoin", HashJoinNodeOptions(
            "inner", left_keys=["o_custkey", "s_nationkey_l"],
            right_keys=["c_custkey", "c_nationkey"],
            left_output=["rev", "n_name"], right_output=[],
            max_build_rows=1 << 13), inputs=[
            # left: lineitem x orders x supplier x nation(region-filtered)
            Declaration("project", ProjectNodeOptions(
                [field("o_custkey"), field("s_nationkey_l"),
                 field("rev"), field("n_name")],
                ["o_custkey", "s_nationkey_l", "rev", "n_name"]), [
                Declaration("hashjoin", HashJoinNodeOptions(
                    "inner", left_keys=["s_nationkey_l"],
                    right_keys=["n_nationkey"],
                    left_output=["o_custkey", "s_nationkey_l", "rev"],
                    right_output=["n_name"], max_build_rows=64), inputs=[
                    Declaration("project", ProjectNodeOptions(
                        [field("o_custkey"), field("s_nationkey"),
                         field("l_extendedprice") *
                         (literal(1.0) - field("l_discount"))],
                        ["o_custkey", "s_nationkey_l", "rev"]), [
                        Declaration("hashjoin", HashJoinNodeOptions(
                            "inner", left_keys=["l_suppkey"],
                            right_keys=["s_suppkey"],
                            left_output=["o_custkey", "l_extendedprice",
                                         "l_discount"],
                            right_output=["s_nationkey"],
                            max_build_rows=1 << 10), inputs=[
                            Declaration("hashjoin", HashJoinNodeOptions(
                                "inner", left_keys=["l_orderkey"],
                                right_keys=["o_orderkey"],
                                left_output=["l_suppkey",
                                             "l_extendedprice",
                                             "l_discount"],
                                right_output=["o_custkey"],
                                max_build_rows=1 << 13), inputs=[
                                Declaration("table_source",
                                            TableSourceNodeOptions(
                                                lineitem)),
                                Declaration.from_sequence([
                                    Declaration(
                                        "table_source",
                                        TableSourceNodeOptions(orders)),
                                    Declaration("filter",
                                                FilterNodeOptions(
                                        (field("o_orderdate") >=
                                         literal(d0)) &
                                        (field("o_orderdate") <
                                         literal(d1)))),
                                ]),
                            ]),
                            Declaration("table_source",
                                        TableSourceNodeOptions(supplier)),
                        ]),
                    ]),
                    Declaration.from_sequence([
                        Declaration("table_source",
                                    TableSourceNodeOptions(nation)),
                        Declaration("filter", FilterNodeOptions(
                            field("n_regionkey") == literal(2))),
                    ]),
                ]),
            ]),
            Declaration("table_source", TableSourceNodeOptions(customer)),
        ]),
        Declaration("aggregate", AggregateNodeOptions(
            [AggregateSpec("sum", "rev", name="revenue")],
            keys=["n_name"], max_groups=64)),
        Declaration("order_by", OrderByNodeOptions(
            [("revenue", "descending")])),
    ])
    got = decl.to_pyarrow()

    # pyarrow oracle
    o = orders.filter(pc.and_(
        pc.greater_equal(orders["o_orderdate"], d0),
        pc.less(orders["o_orderdate"], d1)))
    j = lineitem.select(["l_orderkey", "l_suppkey", "l_extendedprice",
                         "l_discount"]) \
        .join(o.select(["o_orderkey", "o_custkey"]),
              keys="l_orderkey", right_keys="o_orderkey",
              join_type="inner") \
        .join(supplier.select(["s_suppkey", "s_nationkey"]),
              keys="l_suppkey", right_keys="s_suppkey",
              join_type="inner") \
        .join(nation.filter(pc.equal(nation["n_regionkey"], 2))
              .select(["n_nationkey", "n_name"]),
              keys="s_nationkey", right_keys="n_nationkey",
              join_type="inner")
    j = j.join(customer.select(["c_custkey", "c_nationkey"]),
               keys=["o_custkey", "s_nationkey"],
               right_keys=["c_custkey", "c_nationkey"], join_type="inner")
    rev = pc.multiply(j["l_extendedprice"],
                      pc.subtract(1.0, j["l_discount"]))
    exp = j.append_column("rev", rev).group_by("n_name") \
        .aggregate([("rev", "sum")]) \
        .sort_by([("rev_sum", "descending")])
    gn = got["n_name"].to_pylist()
    en = [str(x) for x in exp["n_name"].to_pylist()]
    assert gn == en, (gn, en)
    np.testing.assert_allclose(got["revenue"].to_pylist(),
                               exp["rev_sum"].to_pylist(), rtol=1e-6)
