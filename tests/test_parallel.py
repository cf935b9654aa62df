"""Distributed operators over the 8-virtual-device CPU mesh
(conftest forces xla_force_host_platform_device_count=8):
shuffle-backed group_by, co-partitioned hash join, range-partitioned sort.
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow_tpu as at
from arrow_tpu.acero.options import HashJoinNodeOptions
from arrow_tpu.parallel import DistContext


@pytest.fixture(scope="module")
def ctx():
    return DistContext()


def test_dist_group_by(ctx, rng):
    n = 4096
    t = pa.table({"k": pa.array(rng.integers(0, 37, n)),
                  "v": pa.array(rng.standard_normal(n))})
    b = at.Batch.from_pyarrow(t.to_batches()[0])
    out = ctx.group_by(b, ["k"], [("sum", "v"), ("count_all",)],
                       max_groups_per_shard=64)
    got = out.to_pyarrow().sort_by([("k", "ascending")])
    exp = t.group_by("k").aggregate([("v", "sum"), ([], "count_all")]) \
        .sort_by([("k", "ascending")])
    assert got["k"].to_pylist() == exp["k"].to_pylist()
    np.testing.assert_allclose(got["v_sum"].to_pylist(),
                               exp["v_sum"].to_pylist(), rtol=1e-9)
    assert got["count_all"].to_pylist() == exp["count_all"].to_pylist()


@pytest.mark.parametrize("join_type", ["inner", "left outer", "left semi",
                                       "left anti", "right outer",
                                       "full outer", "right semi",
                                       "right anti"])
def test_dist_join(ctx, rng, join_type):
    nl, nr = 2048, 512
    l = pa.table({"k": pa.array(rng.integers(0, 800, nl)),
                  "lv": pa.array(rng.standard_normal(nl))})
    r = pa.table({"k": pa.array(rng.permutation(800)[:nr]),
                  "rv": pa.array(rng.standard_normal(nr))})
    lb = at.Batch.from_pyarrow(l.to_batches()[0])
    rb = at.Batch.from_pyarrow(r.to_batches()[0])
    out = ctx.join(lb, rb, HashJoinNodeOptions(
        join_type, ["k"], ["k"], right_output=["rv"],
        max_build_rows=1024), fanout_per_shard=2048)
    got = out.to_pyarrow()
    exp = l.join(r, keys="k", join_type=join_type)
    assert got.num_rows == exp.num_rows, (join_type, got.num_rows,
                                          exp.num_rows)
    gs, es = got, exp
    # pyarrow coalesces key columns for right/full outer; ours keeps the
    # probe-side key (null on unmatched build rows) — compare keys only
    # where the semantics agree
    if "k" in gs.column_names and "k" in es.column_names and \
            join_type not in ("right outer", "full outer"):
        gk = sorted(gs["k"].to_pylist(), key=lambda x: (x is None, x))
        ek = sorted(es["k"].to_pylist(), key=lambda x: (x is None, x))
        assert gk == ek
    if "rv" in gs.column_names:
        grv = [round(x, 12) if x is not None else None
               for x in gs["rv"].to_pylist()]
        erv = [round(x, 12) if x is not None else None
               for x in es["rv"].to_pylist()]
        assert sorted(grv, key=lambda x: (x is None, x)) == \
            sorted(erv, key=lambda x: (x is None, x))


def test_dist_sort(ctx, rng):
    n = 4096
    t = pa.table({"a": pa.array(rng.integers(-1000, 1000, n)),
                  "b": pa.array(rng.standard_normal(n))})
    b = at.Batch.from_pyarrow(t.to_batches()[0])
    out = ctx.sort_by(b, [("a", "ascending"), ("b", "descending")])
    got = out.to_pyarrow()
    exp = t.sort_by([("a", "ascending"), ("b", "descending")])
    assert got["a"].to_pylist() == exp["a"].to_pylist()
    np.testing.assert_allclose(got["b"].to_pylist(), exp["b"].to_pylist())


def test_dist_sort_descending_primary(ctx, rng):
    n = 2048
    t = pa.table({"a": pa.array(rng.standard_normal(n))})
    b = at.Batch.from_pyarrow(t.to_batches()[0])
    got = ctx.sort_by(b, [("a", "descending")]).to_pyarrow()
    exp = t.sort_by([("a", "descending")])
    np.testing.assert_allclose(got["a"].to_pylist(), exp["a"].to_pylist())


def test_dist_group_by_zipf_skew(ctx, rng):
    """Zipf(1.5) keys: the state-row exchange moves one row per
    (shard, distinct key) so data skew cannot overflow any bucket
    (parallel/dist_agg — the combiner argument)."""
    n = 1 << 15
    z = rng.zipf(1.5, n).astype(np.int64) % 1000
    t = pa.table({"k": pa.array(z), "v": pa.array(rng.integers(0, 10, n))})
    b = at.Batch.from_pyarrow(t.to_batches()[0])
    out = ctx.group_by(b, ["k"], [("sum", "v"), ("min", "v"),
                                  ("max", "v"), ("mean", "v")],
                       max_groups_per_shard=512)
    got = out.to_pyarrow().sort_by([("k", "ascending")])
    exp = t.group_by("k").aggregate(
        [("v", "sum"), ("v", "min"), ("v", "max"),
         ("v", "mean")]).sort_by([("k", "ascending")])
    assert got["k"].to_pylist() == exp["k"].to_pylist()
    assert got["v_sum"].to_pylist() == exp["v_sum"].to_pylist()
    assert got["v_min"].to_pylist() == exp["v_min"].to_pylist()
    assert got["v_max"].to_pylist() == exp["v_max"].to_pylist()
    np.testing.assert_allclose(got["v_mean"].to_pylist(),
                               exp["v_mean"].to_pylist(), rtol=1e-12)


def test_dist_group_by_single_hot_key(ctx, rng):
    """Degenerate skew: every row the same key."""
    n = 1 << 14
    t = pa.table({"k": pa.array(np.zeros(n, np.int64)),
                  "v": pa.array(rng.integers(0, 100, n))})
    b = at.Batch.from_pyarrow(t.to_batches()[0])
    out = ctx.group_by(b, ["k"], [("sum", "v"), ("count_all",)],
                       max_groups_per_shard=16)
    got = out.to_pyarrow()
    assert got.num_rows == 1
    assert got["v_sum"][0].as_py() == int(t["v"].to_numpy().sum())
    assert got["count_all"][0].as_py() == n


def test_dist_group_by_streaming(ctx, rng):
    """Streaming consume over several morsels, then one exchange+merge."""
    from arrow_tpu.parallel import DistGroupBy
    n = 1 << 14
    t = pa.table({"k": pa.array(rng.integers(0, 200, n)),
                  "v": pa.array(rng.integers(-50, 50, n))})
    tt = at.Table.from_pyarrow(t, max_rows_per_batch=1 << 12)
    assert len(tt.batches) > 1
    dgb = DistGroupBy(ctx, tt.schema, ["k"],
                      [("sum", "v"), ("count", "v"), ("variance", "v")],
                      max_groups_per_shard=256)
    state = dgb.init_state()
    for bb in tt.batches:
        state = dgb.consume(state, bb)
    got = dgb.finalize_table(state).to_pyarrow().sort_by(
        [("k", "ascending")])
    exp = t.group_by("k").aggregate(
        [("v", "sum"), ("v", "count"), ("v", "variance")]).sort_by(
        [("k", "ascending")])
    assert got["k"].to_pylist() == exp["k"].to_pylist()
    assert got["v_sum"].to_pylist() == exp["v_sum"].to_pylist()
    assert got["v_count"].to_pylist() == exp["v_count"].to_pylist()
    np.testing.assert_allclose(got["v_variance"].to_pylist(),
                               exp["v_variance"].to_pylist(), rtol=1e-9)


def test_dist_group_by_fallback_count_distinct(ctx, rng):
    """count_distinct state is not row-shaped -> raw-row shuffle path."""
    t = pa.table({"k": pa.array(rng.integers(0, 20, 4096)),
                  "v": pa.array(rng.integers(0, 5, 4096))})
    b = at.Batch.from_pyarrow(t.to_batches()[0])
    out = ctx.group_by(b, ["k"], [("count_distinct", "v")],
                       max_groups_per_shard=64)
    got = out.to_pyarrow().sort_by([("k", "ascending")])
    exp = t.group_by("k").aggregate([("v", "count_distinct")]).sort_by(
        [("k", "ascending")])
    assert got["k"].to_pylist() == exp["k"].to_pylist()
    assert got["v_count_distinct"].to_pylist() == \
        exp["v_count_distinct"].to_pylist()


def test_dist_group_by_dict_keys(ctx, rng):
    """Dictionary-typed keys through the state exchange: codes travel,
    the replicated dictionary reattaches at collect."""
    words = np.array(["alpha", "beta", "gamma", "delta"])
    raw = pa.array(words[rng.integers(0, 4, 4096)])
    t = pa.table({"k": raw.dictionary_encode(),
                  "v": pa.array(rng.integers(0, 100, 4096))})
    b = at.Batch.from_pyarrow(t.to_batches()[0])
    out = ctx.group_by(b, ["k"], [("sum", "v")], max_groups_per_shard=16)
    got = out.to_pyarrow()
    got = pa.table({"k": got["k"].cast(pa.string()), "v_sum": got["v_sum"]})
    exp = pa.table({"k": raw, "v": t["v"]}).group_by("k").aggregate(
        [("v", "sum")])
    assert got.sort_by("k").to_pydict() == \
        exp.rename_columns(["k", "v_sum"]).sort_by("k").to_pydict()


# ---------------------------------------------------------------------------
# plan-integrated distribution: dist= on HashJoinNodeOptions /
# AggregateNodeOptions runs the node SPMD inside a Declaration pipeline
# ---------------------------------------------------------------------------

def _sorted_dict(t):
    u = [f"c{i}" for i in range(t.num_columns)]
    return t.rename_columns(u).sort_by(
        [(x, "ascending") for x in u]).to_pydict()


@pytest.mark.parametrize("join_type", ["inner", "left outer", "full outer",
                                       "left anti", "right semi"])
def test_plan_dist_join_streaming(ctx, rng, join_type):
    """Declaration hashjoin with dist=ctx: build batches shuffle+
    accumulate, probe batches stream; matches the single-chip plan."""
    from arrow_tpu.acero import (Declaration, FilterNodeOptions,
                                 TableSourceNodeOptions)
    from arrow_tpu.compute.expressions import field
    nl, nr = 5000, 800
    lt = pa.table({"k": pa.array(rng.integers(0, 400, nl)),
                   "lv": pa.array(rng.integers(0, 1000, nl))})
    rt = pa.table({"k": pa.array(rng.integers(0, 400, nr)),
                   "rv": pa.array(rng.integers(0, 1000, nr))})

    def run(dist):
        left = Declaration("table_source",
                           TableSourceNodeOptions(lt, max_batch_rows=1024))
        right = Declaration("table_source",
                            TableSourceNodeOptions(rt, max_batch_rows=256))
        left = Declaration("filter",
                           FilterNodeOptions(field("lv") < 700), [left])
        d = Declaration("hashjoin", HashJoinNodeOptions(
            join_type, ["k"], ["k"], max_build_rows=1 << 11,
            fanout_capacity=1 << 13, output_suffix_for_left="_l",
            output_suffix_for_right="_r", dist=dist), [left, right])
        return d.to_pyarrow()

    assert _sorted_dict(run(None)) == _sorted_dict(run(ctx))


def test_plan_dist_join_chained(ctx, rng):
    """Two chained dist joins: the second consumes the first's emitted
    batches directly. Regression: hash32 once depended on validity-buffer
    PRESENCE, desyncing build/probe co-partitioning between a dist-join
    output (materialized validity) and a table source (validity=None)."""
    from arrow_tpu.acero import Declaration, TableSourceNodeOptions
    na, nb, nc = 4000, 900, 700
    ta_ = pa.table({"k": pa.array(rng.integers(0, 300, na)),
                    "av": pa.array(rng.integers(0, 1000, na))})
    tb_ = pa.table({"k": pa.array(rng.integers(0, 300, nb)),
                    "j": pa.array(rng.integers(0, 200, nb)),
                    "bv": pa.array(rng.integers(0, 1000, nb))})
    tc_ = pa.table({"j": pa.array(rng.integers(0, 200, nc)),
                    "cv": pa.array(rng.integers(0, 1000, nc))})

    def run(d1, d2):
        bc = Declaration("hashjoin", HashJoinNodeOptions(
            "inner", ["j"], ["j"], max_build_rows=1 << 11,
            fanout_capacity=1 << 14, output_suffix_for_left="_b",
            output_suffix_for_right="_c", dist=d1),
            [Declaration("table_source",
                         TableSourceNodeOptions(tb_, max_batch_rows=256)),
             Declaration("table_source",
                         TableSourceNodeOptions(tc_, max_batch_rows=256))])
        abc = Declaration("hashjoin", HashJoinNodeOptions(
            "inner", ["k"], ["k"], max_build_rows=1 << 13,
            fanout_capacity=1 << 16, output_suffix_for_left="_a",
            output_suffix_for_right="_bc", dist=d2),
            [Declaration("table_source",
                         TableSourceNodeOptions(ta_, max_batch_rows=512)),
             bc])
        return abc.to_pyarrow()

    exp = _sorted_dict(run(None, None))
    assert _sorted_dict(run(ctx, ctx)) == exp


def test_plan_dist_aggregate_streaming(ctx, rng):
    """Declaration aggregate with dist=ctx: streaming per-shard
    pre-aggregation + state-row exchange through the plan API."""
    from arrow_tpu.acero import (AggregateNodeOptions, Declaration,
                                 TableSourceNodeOptions)
    n = 8192
    t = pa.table({"k": pa.array(rng.integers(0, 97, n)),
                  "v": pa.array(rng.integers(0, 1000, n))})

    def run(dist):
        d = Declaration("aggregate", AggregateNodeOptions(
            [("sum", "v"), ("count_all",)], keys=["k"],
            max_groups=256, dist=dist),
            [Declaration("table_source",
                         TableSourceNodeOptions(t, max_batch_rows=1024))])
        return d.to_pyarrow().sort_by([("k", "ascending")])

    assert run(None).to_pydict() == run(ctx).to_pydict()


def test_hash32_validity_presence_invariant(rng):
    """hash32(col with validity=None) == hash32(col with all-true mask)."""
    import jax.numpy as jnp
    from arrow_tpu.core import datatype as dt
    from arrow_tpu.core.array import Array
    from arrow_tpu.ops.hashing import hash32
    vals = jnp.asarray(rng.integers(0, 1000, 257))
    a = Array(dt.int64, vals, None, length=257)
    b = Array(dt.int64, vals, jnp.ones((257,), jnp.bool_), length=257)
    np.testing.assert_array_equal(np.asarray(hash32([a], seed=7)),
                                  np.asarray(hash32([b], seed=7)))


def test_dist_group_by_overflow_recovers(ctx, rng):
    """Fallback (tdigest forces the raw-row shuffle) with skewed keys and
    tiny bucket_factor: overflow retries at doubled capacities."""
    n = 4096
    k = np.where(rng.random(n) < 0.9, 0, rng.integers(0, 16, n))  # skew
    t = pa.table({"k": pa.array(k), "v": pa.array(rng.standard_normal(n))})
    b = at.Batch.from_pyarrow(t.to_batches()[0])
    out = ctx.group_by(b, ["k"], [("tdigest", "v"), ("count_all",)],
                       max_groups_per_shard=32, bucket_factor=1)
    got = out.to_pyarrow().sort_by([("k", "ascending")])
    exp = t.group_by("k").aggregate([([], "count_all")]) \
        .sort_by([("k", "ascending")])
    assert got["k"].to_pylist() == exp["k"].to_pylist()
    assert got["count_all"].to_pylist() == exp["count_all"].to_pylist()


def test_dist_join_dict_keys_cross_dictionary(ctx, rng):
    """Round 5: dictionary join keys with DIFFERENT dictionaries on the
    two sides (content-gathered lanes, ops/hashing.dict_content_lanes)
    — codes are dictionary-local, so only content keying makes the
    co-partitioning shuffle + per-shard probe correct."""
    from arrow_tpu.acero.options import HashJoinNodeOptions
    words = np.array(["alpha", "beta", "gamma", "delta",
                      "eps", "zeta", "eta", "theta"])
    n = 512
    lk = pa.array(words[rng.integers(0, 8, n)]).dictionary_encode()
    left = at.Batch.from_pyarrow(pa.record_batch(
        {"k": lk, "v": pa.array(np.arange(n))}))
    rk = pa.array(words[[0, 2, 4, 6]]).dictionary_encode()
    right = at.Batch.from_pyarrow(pa.record_batch(
        {"k": rk, "w": pa.array([10, 20, 30, 40])}))
    out = ctx.join(left, right, HashJoinNodeOptions(
        "inner", ["k"], ["k"], right_output=["w"], max_build_rows=64),
        fanout_per_shard=4 * n)
    t = out.to_pyarrow()
    lw = pa.table({"k": lk.cast(pa.string()), "v": pa.array(np.arange(n))})
    rw = pa.table({"k": rk.cast(pa.string()),
                   "w": pa.array([10, 20, 30, 40])})
    exp = lw.join(rw, keys="k", join_type="inner")
    assert t.num_rows == exp.num_rows
    gk = [str(x) for x in t["k"].to_pylist()]
    assert sorted(gk) == sorted(exp["k"].to_pylist())
