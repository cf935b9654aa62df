"""Spec-structure tests for the TPC-H generator (clause 4.2.2/4.2.3
conformance — the same bar as ``tpch_node.cc``, which is likewise a
spec-conformant pcg-seeded generator, not a dbgen byte-clone)."""

import collections

import numpy as np
import pytest

from arrow_tpu.utils.tpch import tpch_table, TPCH_TABLES

SF = 0.002


@pytest.fixture(scope="module")
def tabs():
    return {n: tpch_table(n, SF) for n in TPCH_TABLES}


def test_row_counts(tabs):
    assert tabs["region"].num_rows == 5
    assert tabs["nation"].num_rows == 25
    assert tabs["partsupp"].num_rows == 4 * tabs["part"].num_rows
    avg_lines = tabs["lineitem"].num_rows / tabs["orders"].num_rows
    assert 3.5 < avg_lines < 4.5


def test_lineitem_partsupp_referential(tabs):
    ps = tabs["partsupp"]
    li = tabs["lineitem"]
    pairs = set(zip(ps["ps_partkey"].to_pylist(),
                    ps["ps_suppkey"].to_pylist()))
    lip = set(zip(li["l_partkey"].to_pylist(),
                  li["l_suppkey"].to_pylist()))
    assert lip <= pairs


def test_totalprice_is_lineitem_sum(tabs):
    li, orders = tabs["lineitem"], tabs["orders"]
    per = (np.asarray(li["l_extendedprice"])
           * (1 + np.asarray(li["l_tax"]))
           * (1 - np.asarray(li["l_discount"])))
    tot = collections.defaultdict(float)
    for k, v in zip(np.asarray(li["l_orderkey"]), per):
        tot[k] += v
    want = dict(zip(orders["o_orderkey"].to_pylist(),
                    orders["o_totalprice"].to_pylist()))
    assert max(abs(tot[k] - want[k]) for k in want) < 0.02


def test_orderstatus_from_linestatus(tabs):
    li, orders = tabs["lineitem"], tabs["orders"]
    agg = collections.defaultdict(set)
    for k, s in zip(li["l_orderkey"].to_pylist(),
                    li["l_linestatus"].combine_chunks().to_pylist()):
        agg[k].add(s)
    st = dict(zip(orders["o_orderkey"].to_pylist(),
                  orders["o_orderstatus"].combine_chunks().to_pylist()))
    for k, ss in agg.items():
        want = "F" if ss == {"F"} else ("O" if ss == {"O"} else "P")
        assert st[k] == want


def test_extendedprice_formula(tabs):
    li = tabs["lineitem"]
    pk = np.asarray(li["l_partkey"], dtype=np.int64)
    retail = (90000 + ((pk // 10) % 20001) + 100 * (pk % 1000)) / 100.0
    want = np.round(np.asarray(li["l_quantity"]) * retail, 2)
    np.testing.assert_allclose(np.asarray(li["l_extendedprice"]), want)
    part = tabs["part"]
    k = np.asarray(part["p_partkey"], dtype=np.int64)
    pr = (90000 + ((k // 10) % 20001) + 100 * (k % 1000)) / 100.0
    np.testing.assert_allclose(np.asarray(part["p_retailprice"]), pr)


def test_custkey_mod3_never_orders(tabs):
    ck = np.asarray(tabs["orders"]["o_custkey"])
    assert (ck % 3 != 0).all()


def test_sparse_orderkeys(tabs):
    ok = np.asarray(tabs["orders"]["o_orderkey"])
    assert len(np.unique(ok)) == len(ok)
    # only 8 of every 32 keys used
    assert (ok.max() + 31) // 32 * 8 >= len(ok)
    assert ((ok - 1) % 32 < 8).all()


def test_phone_country_codes(tabs):
    for t, pre in (("customer", "c"), ("supplier", "s")):
        tab = tabs[t]
        cc = np.asarray([int(p.split("-")[0])
                         for p in tab[f"{pre}_phone"].to_pylist()])
        nk = np.asarray(tab[f"{pre}_nationkey"])
        assert (cc == nk + 10).all()


def test_part_name_and_brand(tabs):
    part = tabs["part"]
    for nm in part["p_name"].to_pylist()[:50]:
        words = nm.split(" ")
        assert len(words) == 5 and len(set(words)) == 5
    for mfgr, brand in zip(
            part["p_mfgr"].combine_chunks().to_pylist()[:200],
            part["p_brand"].combine_chunks().to_pylist()[:200]):
        assert brand.startswith("Brand#")
        assert brand[6] == mfgr[-1]  # shared M digit


def test_comment_lengths_and_grammar(tabs):
    lens = [len(c) for c in tabs["orders"]["o_comment"].to_pylist()]
    assert min(lens) >= 19 and max(lens) <= 78
    lens = [len(c) for c in tabs["partsupp"]["ps_comment"].to_pylist()]
    assert min(lens) >= 49 and max(lens) <= 198
    # grammar text, not a counter pattern
    text = " ".join(tabs["orders"]["o_comment"].to_pylist()[:100])
    assert "comment" not in text


def test_supplier_special_comments():
    t = tpch_table("supplier", 1.0)  # 10K suppliers, 5 of each tag
    comments = t["s_comment"].to_pylist()
    n_bad = sum("Customer Complaints" in c for c in comments)
    n_good = sum("Customer Recommends" in c for c in comments)
    assert n_bad == 5 and n_good == 5


def test_date_rules(tabs):
    import datetime as dtm
    li, orders = tabs["lineitem"], tabs["orders"]
    od = orders["o_orderdate"].to_pylist()
    assert min(od) >= dtm.date(1992, 1, 1)
    assert max(od) <= dtm.date(1998, 8, 2)
    ship = np.asarray([d.toordinal() for d in
                       li["l_shipdate"].to_pylist()])
    rcpt = np.asarray([d.toordinal() for d in
                       li["l_receiptdate"].to_pylist()])
    lodate = np.asarray([d.toordinal() for d in
                         np.repeat(od, np.diff(np.searchsorted(
                             np.asarray(li["l_orderkey"]),
                             np.append(np.asarray(
                                 orders["o_orderkey"]),
                                 1 << 60))))])
    assert ((ship - lodate >= 1) & (ship - lodate <= 121)).all()
    assert ((rcpt - ship >= 1) & (rcpt - ship <= 30)).all()
