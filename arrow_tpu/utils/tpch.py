"""TPC-H data generator (host-side, numpy-vectorized).

Reference: ``cpp/src/arrow/acero/tpch_node.cc`` (3.5k LoC dbgen re-creation
used by ``tpch_benchmark.cc``). This re-implements the *distributional
shape* of dbgen — row counts per scale factor, key structure (orders ->
1..7 lineitems, sparse orderkeys), value ranges, date rules (shipdate =
orderdate + 1..121, returnflag R/A before the 1995-06-17 receipt horizon,
linestatus F/O around the same ship horizon), text columns drawn from the
spec vocabularies — without reproducing dbgen's exact text grammar: the
benchmark protocol runs OUR engine and the pyarrow oracle on the SAME
generated tables, so statistical fidelity (not byte-identity with dbgen)
is what matters.

All tables generate in one numpy pass per column; strings use fixed
vocabularies (dictionary-encoded where the engine expects it).
"""

from __future__ import annotations

import datetime as dtm

import numpy as np
import pyarrow as pa

__all__ = ["tpch_table", "TPCH_TABLES"]

TPCH_TABLES = ["region", "nation", "supplier", "customer", "part",
               "partsupp", "orders", "lineitem"]

_EPOCH = dtm.date(1970, 1, 1)
_D = lambda y, m, d: (dtm.date(y, m, d) - _EPOCH).days  # noqa: E731

_SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY",
             "HOUSEHOLD"]
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
               "5-LOW"]
_INSTRUCT = ["DELIVER IN PERSON", "COLLECT COD", "NONE",
             "TAKE BACK RETURN"]
_MODES = ["REG AIR", "AIR", "RAIL", "SHIP", "TRUCK", "MAIL", "FOB"]
_NATIONS = ["ALGERIA", "ARGENTINA", "BRAZIL", "CANADA", "EGYPT",
            "ETHIOPIA", "FRANCE", "GERMANY", "INDIA", "INDONESIA", "IRAN",
            "IRAQ", "JAPAN", "JORDAN", "KENYA", "MOROCCO", "MOZAMBIQUE",
            "PERU", "CHINA", "ROMANIA", "SAUDI ARABIA", "VIETNAM",
            "RUSSIA", "UNITED KINGDOM", "UNITED STATES"]
_REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
_NATION_REGION = [0, 1, 1, 1, 4, 0, 3, 3, 2, 2, 4, 4, 2, 4, 0, 0, 0, 1, 2,
                  3, 4, 2, 3, 3, 1]
_CONTAINERS = ["SM CASE", "SM BOX", "LG CASE", "LG BOX", "MED BAG",
               "JUMBO JAR", "WRAP PKG"]
_BRANDS = [f"Brand#{i}{j}" for i in range(1, 6) for j in range(1, 6)]
_TYPES = [f"{a} {b} {c}" for a in ["STANDARD", "SMALL", "MEDIUM", "LARGE",
                                   "ECONOMY", "PROMO"]
          for b in ["ANODIZED", "BURNISHED", "PLATED", "POLISHED",
                    "BRUSHED"]
          for c in ["TIN", "NICKEL", "BRASS", "STEEL", "COPPER"]]

_ORDERS_PER_SF = 1_500_000
_CUST_PER_SF = 150_000
_PART_PER_SF = 200_000
_SUPP_PER_SF = 10_000


def _dict_col(rng, n, vocab):
    idx = rng.integers(0, len(vocab), n).astype(np.int32)
    return pa.DictionaryArray.from_arrays(
        pa.array(idx), pa.array(vocab, type=pa.string()))


def _date32(days):
    return pa.array(days.astype(np.int32), type=pa.int32()).cast(
        pa.date32())


def _orders_skeleton(rng, sf):
    """Shared by orders + lineitem: per-order key, date, line count.
    dbgen leaves gaps in orderkeys (only 1/4 of the key space is used)."""
    n_orders = max(int(_ORDERS_PER_SF * sf), 10)
    okey = (np.arange(1, n_orders + 1, dtype=np.int64) - 1) * 4 + 1
    odate = rng.integers(_D(1992, 1, 1), _D(1998, 8, 2) + 1, n_orders)
    nlines = rng.integers(1, 8, n_orders)
    return n_orders, okey, odate, nlines


def tpch_table(name: str, scale_factor: float = 0.01,
               seed: int = 42) -> pa.Table:
    """Generate one TPC-H table as a pyarrow.Table."""
    rng = np.random.default_rng(seed + TPCH_TABLES.index(name))
    sf = scale_factor
    n_cust = max(int(_CUST_PER_SF * sf), 5)
    n_part = max(int(_PART_PER_SF * sf), 5)
    n_supp = max(int(_SUPP_PER_SF * sf), 3)

    if name == "region":
        return pa.table({
            "r_regionkey": pa.array(range(5), type=pa.int64()),
            "r_name": pa.array(_REGIONS),
            "r_comment": pa.array([f"region comment {i}" for i in range(5)]),
        })

    if name == "nation":
        return pa.table({
            "n_nationkey": pa.array(range(25), type=pa.int64()),
            "n_name": pa.array(_NATIONS),
            "n_regionkey": pa.array(_NATION_REGION, type=pa.int64()),
            "n_comment": pa.array([f"nation comment {i}"
                                   for i in range(25)]),
        })

    if name == "supplier":
        k = np.arange(1, n_supp + 1, dtype=np.int64)
        return pa.table({
            "s_suppkey": pa.array(k),
            "s_name": pa.array([f"Supplier#{i:09d}" for i in k]),
            "s_address": pa.array([f"addr-{i}" for i in k]),
            "s_nationkey": pa.array(rng.integers(0, 25, n_supp),
                                    type=pa.int64()),
            "s_phone": pa.array([f"{rng.integers(10,35)}-{i%1000:03d}-000"
                                 for i in k]),
            "s_acctbal": pa.array(
                np.round(rng.uniform(-999.99, 9999.99, n_supp), 2)),
            "s_comment": pa.array([f"supplier comment {i}" for i in k]),
        })

    if name == "customer":
        k = np.arange(1, n_cust + 1, dtype=np.int64)
        return pa.table({
            "c_custkey": pa.array(k),
            "c_name": pa.array([f"Customer#{i:09d}" for i in k]),
            "c_address": pa.array([f"addr-{i}" for i in k]),
            "c_nationkey": pa.array(rng.integers(0, 25, n_cust),
                                    type=pa.int64()),
            "c_phone": pa.array([f"{(i % 25) + 10}-{i % 1000:03d}-0000"
                                 for i in k]),
            "c_acctbal": pa.array(
                np.round(rng.uniform(-999.99, 9999.99, n_cust), 2)),
            "c_mktsegment": _dict_col(rng, n_cust, _SEGMENTS),
            "c_comment": pa.array([f"customer comment {i}" for i in k]),
        })

    if name == "part":
        k = np.arange(1, n_part + 1, dtype=np.int64)
        return pa.table({
            "p_partkey": pa.array(k),
            "p_name": pa.array([f"part {i} name" for i in k]),
            "p_mfgr": _dict_col(rng, n_part,
                                [f"Manufacturer#{i}" for i in range(1, 6)]),
            "p_brand": _dict_col(rng, n_part, _BRANDS),
            "p_type": _dict_col(rng, n_part, _TYPES),
            "p_size": pa.array(rng.integers(1, 51, n_part),
                               type=pa.int64()),
            "p_container": _dict_col(rng, n_part, _CONTAINERS),
            "p_retailprice": pa.array(
                np.round(900 + (k % 1000) * 100 / 1000 + (k % 100), 2)
                .astype(np.float64)),
            "p_comment": pa.array([f"part comment {i}" for i in k]),
        })

    if name == "partsupp":
        nps = n_part * 4
        pkey = np.repeat(np.arange(1, n_part + 1, dtype=np.int64), 4)
        j = np.tile(np.arange(4, dtype=np.int64), n_part)
        skey = ((pkey + j * (n_supp // 4 + 1)) % n_supp) + 1
        return pa.table({
            "ps_partkey": pa.array(pkey),
            "ps_suppkey": pa.array(skey),
            "ps_availqty": pa.array(rng.integers(1, 10000, nps),
                                    type=pa.int64()),
            "ps_supplycost": pa.array(
                np.round(rng.uniform(1.0, 1000.0, nps), 2)),
            "ps_comment": pa.array([f"ps comment {i}" for i in range(nps)]),
        })

    if name == "orders":
        n_orders, okey, odate, _ = _orders_skeleton(rng, sf)
        custkey = rng.integers(1, n_cust + 1, n_orders)
        total = np.round(rng.uniform(850.0, 560000.0, n_orders), 2)
        status_idx = np.where(
            odate < _D(1995, 6, 17), rng.integers(0, 2, n_orders) * 2,
            1).astype(np.int32)  # F/P-ish before horizon, O after
        return pa.table({
            "o_orderkey": pa.array(okey),
            "o_custkey": pa.array(custkey, type=pa.int64()),
            "o_orderstatus": pa.DictionaryArray.from_arrays(
                pa.array(status_idx), pa.array(["F", "O", "P"])),
            "o_totalprice": pa.array(total),
            "o_orderdate": _date32(odate),
            "o_orderpriority": _dict_col(rng, n_orders, _PRIORITIES),
            "o_clerk": pa.array(
                [f"Clerk#{i:09d}" for i in
                 rng.integers(1, max(int(1000 * sf), 2), n_orders)]),
            "o_shippriority": pa.array(np.zeros(n_orders, np.int64)),
            "o_comment": pa.array([f"order comment {i}" for i in okey]),
        })

    if name == "lineitem":
        # regenerate the SAME skeleton the orders table used
        rng_o = np.random.default_rng(seed + TPCH_TABLES.index("orders"))
        n_orders, okey, odate, nlines = _orders_skeleton(rng_o, sf)
        n = int(nlines.sum())
        l_okey = np.repeat(okey, nlines)
        l_odate = np.repeat(odate, nlines)
        first = np.repeat(np.cumsum(nlines) - nlines, nlines)
        linenumber = np.arange(n, dtype=np.int64) - first + 1
        qty = rng.integers(1, 51, n).astype(np.float64)
        partkey = rng.integers(1, n_part + 1, n)
        suppkey = rng.integers(1, n_supp + 1, n)
        retail = 900 + (partkey % 1000) / 10.0 + (partkey % 100)
        extprice = np.round(qty * retail, 2)
        discount = rng.integers(0, 11, n) / 100.0
        tax = rng.integers(0, 9, n) / 100.0
        shipdate = l_odate + rng.integers(1, 122, n)
        commitdate = l_odate + rng.integers(30, 91, n)
        receiptdate = shipdate + rng.integers(1, 31, n)
        linestatus_idx = (shipdate > _D(1995, 6, 17)).astype(np.int32)
        rf = rng.integers(0, 2, n).astype(np.int32)  # R or A when returned
        returnflag_idx = np.where(receiptdate <= _D(1995, 6, 17), rf,
                                  2).astype(np.int32)
        return pa.table({
            "l_orderkey": pa.array(l_okey),
            "l_partkey": pa.array(partkey, type=pa.int64()),
            "l_suppkey": pa.array(suppkey, type=pa.int64()),
            "l_linenumber": pa.array(linenumber),
            "l_quantity": pa.array(qty),
            "l_extendedprice": pa.array(extprice),
            "l_discount": pa.array(discount),
            "l_tax": pa.array(tax),
            "l_returnflag": pa.DictionaryArray.from_arrays(
                pa.array(returnflag_idx), pa.array(["R", "A", "N"])),
            "l_linestatus": pa.DictionaryArray.from_arrays(
                pa.array(linestatus_idx), pa.array(["F", "O"])),
            "l_shipdate": _date32(shipdate),
            "l_commitdate": _date32(commitdate),
            "l_receiptdate": _date32(receiptdate),
            "l_shipinstruct": _dict_col(rng, n, _INSTRUCT),
            "l_shipmode": _dict_col(rng, n, _MODES),
            "l_comment": pa.array([f"li {i}" for i in range(n)]),
        })

    raise KeyError(f"unknown TPC-H table {name!r}")
