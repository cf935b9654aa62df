"""Grouper + grouped aggregation vs the pyarrow oracle.

Reference test model: NaiveGroupBy cross-check
(``acero/hash_aggregate_test.cc:166``) — here the oracle is pyarrow's
Table.group_by itself.
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow_tpu as at
from arrow_tpu.core.schema import Schema
from arrow_tpu.ops.grouper import Grouper
from arrow_tpu.ops.hash_aggregate import AggregateSpec, HashAggregate
from arrow_tpu.ops.aggregates import CountOptions, VarianceOptions

from oracle import random_numeric_array


def run_group_by(pa_table, keys, aggs, max_groups=1 << 12,
                 batch_rows=None):
    """Drive HashAggregate over (possibly several) batches; return pyarrow."""
    tt = at.Table.from_pyarrow(pa_table, max_rows_per_batch=batch_rows)
    ha = HashAggregate(tt.schema, keys, aggs, max_groups=max_groups)
    state = ha.init_state()
    for b in tt.batches:
        state = ha.consume(state, b)
    out = ha.finalize(state)
    assert int(np.asarray(state[0].error)) == 0, "grouper error flag set"
    return out.to_pyarrow()


def assert_group_by_equal(pa_table, keys, aggs, oracle_aggs=None,
                          rtol=0.0, **kw):
    """Order-insensitive comparison (sort by keys): Arrow's group output
    order is an implementation detail — even unthreaded pyarrow is not
    strictly first-appearance — so like the reference's own tests
    (AssertExecBatchesEqualIgnoringOrder, hash_join_node_test.cc:3167) we
    compare contents. Our engine's order (true first-appearance) is pinned
    separately in test_grouper_first_appearance_order."""
    got = run_group_by(pa_table, keys, aggs, **kw)
    expected = pa_table.group_by(keys).aggregate(
        oracle_aggs if oracle_aggs is not None else
        [((a.target if a.target else []), a.function, a.options)
         if a.options is not None else
         ((a.target if a.target else []), a.function) for a in aggs])
    sort_keys = [(k, "ascending") for k in keys]
    got_t = pa.table(got).sort_by(sort_keys)
    expected = expected.sort_by(sort_keys)
    if got_t.schema != expected.schema:
        raise AssertionError(
            f"schema: got {got_t.schema}, want {expected.schema}")
    if rtol == 0.0:
        assert got_t.equals(expected), (
            f"\ngot: {got_t.to_pydict()}\nwant: {expected.to_pydict()}")
    else:
        gd, ed = got_t.to_pydict(), expected.to_pydict()
        assert list(gd) == list(ed)
        for c in gd:
            g, e = gd[c], ed[c]
            assert len(g) == len(e), c
            for x, y in zip(g, e):
                if x is None or y is None:
                    assert x == y, (c, x, y)
                elif isinstance(x, float):
                    assert x == pytest.approx(y, rel=rtol), (c, x, y)
                else:
                    assert x == y, (c, x, y)


# ---- grouper unit behavior ---------------------------------------------------

def test_grouper_first_appearance_order():
    t = pa.table({"k": [3, 1, 3, 2, 1, 3]})
    got = run_group_by(t, ["k"], [AggregateSpec("count_all")])
    assert got.to_pydict() == {"k": [3, 1, 2], "count_all": [3, 2, 1]}


def test_grouper_null_and_negzero_and_nan_keys():
    t = pa.table({"k": pa.array([0.0, -0.0, float("nan"), float("nan"),
                                 1.0, None, 0.0]),
                  "v": [1, 2, 3, 4, 5, 6, 7]})
    got = run_group_by(t, ["k"], [AggregateSpec("sum", "v")])
    expected = t.group_by("k").aggregate([("v", "sum")])
    # Table.equals treats NaN != NaN; compare bit patterns instead
    gk = np.asarray(got["k"].to_numpy(zero_copy_only=False)).view(np.uint64)
    ek = np.asarray(expected["k"].to_numpy(
        zero_copy_only=False)).view(np.uint64)
    assert gk.tolist() == ek.tolist()
    assert got["v_sum"].to_pylist() == expected["v_sum"].to_pylist()


def test_grouper_multi_key_multi_batch():
    rng = np.random.default_rng(0)
    n = 5000
    t = pa.table({
        "a": rng.integers(0, 13, n),
        "b": rng.integers(-3, 3, n).astype(np.int8),
        "v": rng.standard_normal(n),
    })
    assert_group_by_equal(t, ["a", "b"],
                          [AggregateSpec("count", "v")],
                          batch_rows=512)


def test_grouper_persists_across_consumes():
    g = Grouper([at.int64], [False], max_groups=64)
    st = g.init_state()
    a1 = at.array(np.array([5, 7, 5], dtype=np.int64))
    a2 = at.array(np.array([7, 9, 5], dtype=np.int64))
    st, gid1 = g.consume(st, [a1])
    st, gid2 = g.consume(st, [a2])
    assert np.asarray(gid1)[:3].tolist() == [0, 1, 0]
    assert np.asarray(gid2)[:3].tolist() == [1, 2, 0]
    assert int(st.num_groups) == 3


# ---- aggregate functions vs oracle -----------------------------------------

AGG_CASES = [
    # float sums: the segmented-scan tree order legitimately differs from
    # Arrow's sequential accumulation in the last ulps (ops/segment.py);
    # integer sums stay bit-exact (modular cumsum differences)
    ("sum", {}, 1e-12),
    ("product", {}, 1e-12),
    ("mean", {}, 1e-12),
    ("min", {}, 0.0),
    ("max", {}, 0.0),
    ("count", {}, 0.0),
    ("first", {}, 0.0),
    ("last", {}, 0.0),
]


@pytest.mark.parametrize("fn,opts,rtol", AGG_CASES, ids=lambda c: str(c)[:12])
@pytest.mark.parametrize("vtype", [pa.int64(), pa.float64(), pa.int32()])
def test_agg_oracle(rng, fn, opts, rtol, vtype):
    n = 2000
    t = pa.table({
        "k": pa.array(rng.integers(0, 50, n)),
        "v": random_numeric_array(rng, n, vtype, null_prob=0.25, small=True),
    })
    assert_group_by_equal(t, ["k"], [AggregateSpec(fn, "v")], rtol=rtol)


def test_agg_bool_any_all(rng):
    n = 1000
    t = pa.table({
        "k": pa.array(rng.integers(0, 20, n)),
        "v": random_numeric_array(rng, n, pa.bool_(), null_prob=0.3),
    })
    assert_group_by_equal(t, ["k"], [AggregateSpec("any", "v"),
                                     AggregateSpec("all", "v")])


def test_agg_variance_stddev(rng):
    n = 3000
    t = pa.table({
        "k": pa.array(rng.integers(0, 30, n)),
        "v": pa.array(rng.standard_normal(n) * 10),
    })
    assert_group_by_equal(
        t, ["k"],
        [AggregateSpec("variance", "v", VarianceOptions(ddof=1)),
         AggregateSpec("stddev", "v", VarianceOptions(ddof=0))],
        oracle_aggs=[("v", "variance", pc.VarianceOptions(ddof=1)),
                     ("v", "stddev", pc.VarianceOptions(ddof=0))],
        rtol=1e-9)


def test_agg_count_modes(rng):
    n = 500
    t = pa.table({
        "k": pa.array(rng.integers(0, 10, n)),
        "v": random_numeric_array(rng, n, pa.int64(), null_prob=0.4),
    })
    got = run_group_by(
        t, ["k"],
        [AggregateSpec("count", "v", CountOptions("only_valid"),
                       name="v_count"),
         AggregateSpec("count", "v", CountOptions("only_null"),
                       name="n_count"),
         AggregateSpec("count", "v", CountOptions("all"), name="a_count")])
    expected = t.group_by("k").aggregate(
        [("v", "count", pc.CountOptions(mode="only_valid")),
         ("v", "count", pc.CountOptions(mode="only_null")),
         ("v", "count", pc.CountOptions(mode="all"))])
    # pyarrow names all three "v_count"; compare positionally
    for i in range(4):
        assert got.column(i).to_pylist() == \
            expected.column(i).to_pylist(), i


def test_agg_all_null_group():
    t = pa.table({"k": [1, 1, 2], "v": pa.array([None, None, 3],
                                                type=pa.int64())})
    assert_group_by_equal(t, ["k"], [AggregateSpec("sum", "v"),
                                     AggregateSpec("min", "v")])


def test_dictionary_string_keys(rng):
    n = 800
    words = np.array(["alpha", "beta", "gamma", "delta", "eps"])
    raw = pa.array(words[rng.integers(0, 5, n)])
    t_dict = pa.table({"k": raw.dictionary_encode(),
                       "v": pa.array(rng.integers(0, 100, n))})
    got = run_group_by(t_dict, ["k"], [AggregateSpec("sum", "v")])
    # oracle on the decoded table (group_by on dictionary col directly)
    t_plain = pa.table({"k": raw, "v": t_dict["v"]})
    expected = t_plain.group_by("k").aggregate([("v", "sum")])
    got_decoded = pa.table({"k": got["k"].cast(pa.string()),
                            "v_sum": got["v_sum"]})
    assert got_decoded.equals(expected)


def test_merge_two_states(rng):
    """Cross-shard combine: split table in half, aggregate separately,
    merge — must equal single-pass result."""
    n = 2000
    t = pa.table({
        "k": pa.array(rng.integers(0, 40, n)),
        "v": pa.array(rng.integers(-50, 50, n)),
    })
    schema = Schema.from_pyarrow(t.schema)
    aggs = [AggregateSpec("sum", "v"), AggregateSpec("count", "v"),
            AggregateSpec("min", "v"), AggregateSpec("max", "v")]
    ha = HashAggregate(schema, ["k"], aggs, max_groups=256)

    half = n // 2
    t1, t2 = t.slice(0, half), t.slice(half)
    s1, s2 = ha.init_state(), ha.init_state()
    s1 = ha.consume(s1, at.Table.from_pyarrow(t1).batches[0])
    s2 = ha.consume(s2, at.Table.from_pyarrow(t2).batches[0])
    merged = ha.merge(s1, s2)
    got = pa.table(ha.finalize(merged).to_pyarrow())

    expected = t.group_by("k").aggregate(
        [("v", "sum"), ("v", "count"), ("v", "min"), ("v", "max")])
    assert got.equals(expected), (
        f"\ngot: {got.to_pydict()}\nwant: {expected.to_pydict()}")


def test_group_by_jit_consume(rng):
    """The consume path must be jittable (deployment mode)."""
    import jax
    n = 512
    t = pa.table({"k": pa.array(rng.integers(0, 16, n)),
                  "v": pa.array(rng.integers(0, 100, n))})
    tt = at.Table.from_pyarrow(t)
    ha = HashAggregate(tt.schema, ["k"], [AggregateSpec("sum", "v")],
                       max_groups=64)
    consume = jax.jit(ha.consume)
    state = ha.init_state()
    state = consume(state, tt.batches[0])
    got = pa.table(ha.finalize(state).to_pyarrow())
    expected = t.group_by("k").aggregate([("v", "sum")])
    assert got.equals(expected)


def test_high_cardinality_keys(rng):
    """Many distinct keys (stress the probe loop & first-appearance order)."""
    n = 4096
    t = pa.table({"k": pa.array(rng.integers(0, 3000, n)),
                  "v": pa.array(np.ones(n, dtype=np.int64))})
    assert_group_by_equal(t, ["k"], [AggregateSpec("sum", "v")],
                          max_groups=4096)


# ---- round-2 additions: count_distinct / skew / kurtosis / tdigest ----------

def test_group_by_count_distinct(rng):
    n = 400
    t = pa.table({
        "k": pa.array(rng.integers(0, 7, n), type=pa.int64()),
        "v": pa.array([None if rng.random() < 0.25 else int(x)
                       for x in rng.integers(0, 9, n)], type=pa.int64()),
    })
    assert_group_by_equal(t, ["k"], [AggregateSpec("count_distinct", "v")])
    assert_group_by_equal(
        t, ["k"],
        [AggregateSpec("count_distinct", "v", CountOptions(mode="all"))],
        oracle_aggs=[("v", "count_distinct", pc.CountOptions(mode="all"))])


def test_group_by_count_distinct_merge(rng):
    n = 300
    t = pa.table({
        "k": pa.array(rng.integers(0, 5, n), type=pa.int64()),
        "v": pa.array(rng.integers(0, 6, n), type=pa.int64()),
    })
    # two shards merged must equal single-shard
    tt = at.Table.from_pyarrow(t, max_rows_per_batch=128)
    ha = HashAggregate(tt.schema, ["k"],
                       [AggregateSpec("count_distinct", "v")],
                       max_groups=64)
    states = []
    for b in tt.batches:
        s = ha.init_state()
        states.append(ha.consume(s, b))
    merged = states[0]
    for s in states[1:]:
        merged = ha.merge(merged, s)
    got = pa.table(ha.finalize(merged).to_pyarrow()).sort_by([("k", "ascending")])
    expected = t.group_by("k").aggregate([("v", "count_distinct")]).sort_by(
        [("k", "ascending")])
    assert got.equals(expected), (got.to_pydict(), expected.to_pydict())


@pytest.mark.parametrize("fn", ["skew", "kurtosis"])
def test_group_by_skew_kurtosis(rng, fn):
    n = 500
    t = pa.table({
        "k": pa.array(rng.integers(0, 6, n), type=pa.int64()),
        "v": pa.array(rng.standard_normal(n) * 10, type=pa.float64()),
    })
    assert_group_by_equal(t, ["k"], [AggregateSpec(fn, "v")], rtol=1e-9)


def test_group_by_approximate_median(rng):
    n = 400
    t = pa.table({
        "k": pa.array(rng.integers(0, 5, n), type=pa.int64()),
        "v": pa.array(rng.standard_normal(n) * 10, type=pa.float64()),
    })
    got = run_group_by(t, ["k"], [AggregateSpec("approximate_median", "v")])
    got = pa.table(got).sort_by([("k", "ascending")])
    # exact median as truth (pyarrow's tdigest approximates)
    df = t.to_pydict()
    import collections
    groups = collections.defaultdict(list)
    for k, v in zip(df["k"], df["v"]):
        groups[k].append(v)
    for k, m in zip(got["k"].to_pylist(), got["v_approximate_median"].to_pylist()):
        assert m == pytest.approx(float(np.median(groups[k])), rel=1e-12)


def test_raw_string_keys(rng):
    """Raw (non-dictionary) string keys: fingerprint lanes + SlotStrings
    uniques (the row-table varbinary-region analog, row_internal.h:33)."""
    n = 1000
    words = np.array(["alpha", "beta", "gamma", "delta",
                      "a-much-longer-key-string", "z", ""])
    t = pa.table({"k": pa.array(words[rng.integers(0, len(words), n)],
                                pa.string()),
                  "v": pa.array(rng.integers(0, 100, n))})
    got = run_group_by(t, ["k"], [AggregateSpec("sum", "v"),
                                  AggregateSpec("count", "v")])
    expected = t.group_by("k").aggregate([("v", "sum"), ("v", "count")])
    assert got.sort_by("k").to_pydict() == \
        expected.sort_by("k").to_pydict()


def test_raw_string_keys_with_nulls(rng):
    n = 300
    k = pa.array([None if i % 7 == 0 else str(i % 13) for i in range(n)],
                 pa.string())
    t = pa.table({"k": k, "v": pa.array(np.arange(n))})
    got = run_group_by(t, ["k"], [AggregateSpec("sum", "v")])
    expected = t.group_by("k").aggregate([("v", "sum")])
    assert got.sort_by("k").to_pydict() == \
        expected.sort_by("k").to_pydict()


def test_raw_string_key_multibatch_merge(rng):
    """Streaming consume + merge with SlotStrings uniques: two shards'
    states merge through to_array -> re-consume (hash_aggregate.merge)."""
    n = 1200
    words = np.array(["x", "yy", "zzz", "wwww", "v5"])
    t = pa.table({"k": pa.array(words[rng.integers(0, 5, n)], pa.string()),
                  "v": pa.array(rng.integers(-50, 50, n))})
    schema = Schema.from_pyarrow(t.schema)
    aggs = [AggregateSpec("sum", "v"), AggregateSpec("min", "v")]
    ha = HashAggregate(schema, ["k"], aggs, max_groups=64)
    half = n // 2
    b1 = at.Batch.from_pyarrow(t.slice(0, half).to_batches()[0])
    b2 = at.Batch.from_pyarrow(t.slice(half).to_batches()[0])
    s1 = ha.consume(ha.init_state(), b1)
    s2 = ha.consume(ha.init_state(), b2)
    merged = ha.merge(s1, s2)
    got = pa.table(ha.finalize(merged).to_pyarrow())
    expected = t.group_by("k").aggregate([("v", "sum"), ("v", "min")])
    assert got.sort_by("k").to_pydict() == \
        expected.sort_by("k").to_pydict()


def test_raw_string_key_slot_overflow():
    """Strings longer than varlen_slot_bytes set a deferred error
    (reported through HashAggregate.errors, the node's raise path)."""
    t = pa.table({"k": pa.array(["a" * 200, "b"], pa.string()),
                  "v": pa.array([1, 2])})
    tt = at.Table.from_pyarrow(t)
    ha = HashAggregate(tt.schema, ["k"], [AggregateSpec("sum", "v")],
                       max_groups=16)
    state = ha.consume(ha.init_state(), tt.batches[0])
    errs = ha.aggregator_errors(state)
    assert errs, "slot overflow not reported"
    assert "slot" in errs[0][0].error_message(errs[0][1])


# ---- dense-domain fast path (VERDICT r2 #3) --------------------------------

def test_dense_group_by_matches_pyarrow_and_sort_path():
    """HashAggregate.consume_dense: same results AND same first-appearance
    group order as the sort-grouper, vs the pyarrow oracle."""
    import numpy as np
    import pyarrow as pa
    import arrow_tpu as at
    from arrow_tpu.ops.hash_aggregate import AggregateSpec, HashAggregate

    rng = np.random.default_rng(7)
    n = 20000
    keys = rng.integers(5, 800, n)
    vals = rng.standard_normal(n).astype(np.float32)
    pk = pa.array(keys, mask=rng.random(n) < 0.05)
    pv = pa.array(vals, mask=rng.random(n) < 0.1)
    t = pa.table({"k": pk, "v": pv})
    want = t.group_by("k").aggregate(
        [("v", "sum"), ("v", "min"), ("v", "max"), ("v", "mean"),
         ("v", "count"), ([], "count_all")]).sort_by([("k", "ascending")])

    b = at.Batch.from_pyarrow(pa.record_batch({"k": pk, "v": pv}))
    ha = HashAggregate(b.schema, ["k"],
                       [AggregateSpec("sum", "v"), AggregateSpec("min", "v"),
                        AggregateSpec("max", "v"), AggregateSpec("mean", "v"),
                        AggregateSpec("count", "v"),
                        AggregateSpec("count_all")], max_groups=2048)
    import jax
    vals_dev = jax.device_get(jax.jit(ha.probe_scalars)(b))
    kind, cfg = ha.probe_route(b, vals_dev)
    assert kind == "dense" and cfg["G"] == 1024
    st = ha.consume_dense(ha.init_state(), b, np.int64(cfg["lo"]), cfg["G"])
    out = ha.finalize(st).to_pyarrow()
    got = pa.table({c: out[c] for c in out.column_names}).sort_by(
        [("k", "ascending")])
    assert got["k"].to_pylist() == want["k"].to_pylist()
    assert got["v_count"].to_pylist() == want["v_count"].to_pylist()
    assert got["count_all"].to_pylist() == want["count_all"].to_pylist()
    assert got["v_min"].to_pylist() == want["v_min"].to_pylist()
    assert got["v_max"].to_pylist() == want["v_max"].to_pylist()
    for c in ("v_sum", "v_mean"):
        for a, w in zip(got[c].to_pylist(), want[c].to_pylist()):
            assert (a is None) == (w is None)
            if a is not None:
                assert abs(a - w) < 1e-2 + 1e-4 * abs(w), (c, a, w)

    # first-appearance order identical to the sort path; mixed streams fold
    st2 = ha.consume(ha.init_state(), b)
    out2 = ha.finalize(st2).to_pyarrow()
    assert out["k"].to_pylist() == out2["k"].to_pylist()


def test_dense_group_by_mixed_stream_and_plan():
    import numpy as np
    import pyarrow as pa
    import arrow_tpu as at

    rng = np.random.default_rng(3)
    n = 30000
    t = pa.table({"k": rng.integers(-20, 400, n),
                  "v": rng.standard_normal(n).astype(np.float32)})
    got = at.Table.from_pyarrow(t, max_rows_per_batch=7000) \
        .group_by("k").aggregate([("v", "sum"), ([], "count_all")]) \
        .to_pyarrow().sort_by([("k", "ascending")])
    want = t.group_by("k").aggregate([("v", "sum"), ([], "count_all")]) \
        .sort_by([("k", "ascending")])
    assert got["k"].to_pylist() == want["k"].to_pylist()
    assert got["count_all"].to_pylist() == want["count_all"].to_pylist()
    for a, w in zip(got["v_sum"].to_pylist(), want["v_sum"].to_pylist()):
        assert abs(a - w) < 1e-2 + 1e-4 * abs(w)



def test_dense_group_by_int64_values_exact():
    """Round-4 dense widening: int64 sum/min/max run through the dense
    kernel's limb/pair reductions and must be EXACT (the sums via
    16-bit-limb u32-wrap+carry accumulators, mod 2^64)."""
    import numpy as np
    import pyarrow as pa
    import jax
    import arrow_tpu as at
    from arrow_tpu.ops.hash_aggregate import AggregateSpec, HashAggregate

    rng = np.random.default_rng(11)
    n = 15000
    keys = rng.integers(0, 300, n)
    vals = rng.integers(-(1 << 62), 1 << 62, n, dtype=np.int64)
    pv = pa.array(vals, mask=rng.random(n) < 0.08)
    t = pa.table({"k": pa.array(keys), "v": pv})
    want = t.group_by("k").aggregate(
        [("v", "sum"), ("v", "min"), ("v", "max"), ([], "count_all")]
    ).sort_by([("k", "ascending")])

    b = at.Batch.from_pyarrow(pa.record_batch(
        {"k": pa.array(keys), "v": pv}))
    ha = HashAggregate(b.schema, ["k"],
                       [AggregateSpec("sum", "v"),
                        AggregateSpec("min", "v"),
                        AggregateSpec("max", "v"),
                        AggregateSpec("count_all")], max_groups=1024)
    vals_dev = jax.device_get(jax.jit(ha.probe_scalars)(b))
    kind, cfg = ha.probe_route(b, vals_dev)
    assert kind == "dense", kind
    st = ha.consume_dense(ha.init_state(), b, np.int64(cfg["lo"]),
                          cfg["G"])
    out = ha.finalize(st).to_pyarrow()
    got = pa.table({c: out[c] for c in out.column_names}).sort_by(
        [("k", "ascending")])
    for c in ("k", "v_sum", "v_min", "v_max", "count_all"):
        assert got[c].to_pylist() == want[c].to_pylist(), c


def test_dense_group_by_any_all_bool():
    import numpy as np
    import pyarrow as pa
    import jax
    import arrow_tpu as at
    from arrow_tpu.ops.hash_aggregate import AggregateSpec, HashAggregate

    rng = np.random.default_rng(13)
    n = 8000
    keys = rng.integers(0, 97, n)
    vals = rng.random(n) < 0.03
    pv = pa.array(vals, mask=rng.random(n) < 0.1)
    t = pa.table({"k": pa.array(keys), "v": pv})
    want = t.group_by("k").aggregate(
        [("v", "any"), ("v", "all"), ([], "count_all")]
    ).sort_by([("k", "ascending")])

    b = at.Batch.from_pyarrow(pa.record_batch(
        {"k": pa.array(keys), "v": pv}))
    ha = HashAggregate(b.schema, ["k"],
                       [AggregateSpec("any", "v"),
                        AggregateSpec("all", "v"),
                        AggregateSpec("count_all")], max_groups=256)
    vals_dev = jax.device_get(jax.jit(ha.probe_scalars)(b))
    kind, cfg = ha.probe_route(b, vals_dev)
    assert kind == "dense", kind
    st = ha.consume_dense(ha.init_state(), b, np.int64(cfg["lo"]),
                          cfg["G"])
    out = ha.finalize(st).to_pyarrow()
    got = pa.table({c: out[c] for c in out.column_names}).sort_by(
        [("k", "ascending")])
    for c in ("k", "v_any", "v_all", "count_all"):
        assert got[c].to_pylist() == want[c].to_pylist(), c


def test_sorted_dense_group_by_oracle(rng):
    """Round-5 sorted-dense path (hash_aggregate.sorted_group_reduce):
    dense int key domains past the Pallas kernel's cap route through
    ONE stable 1-key sort + cumsum boundary-diffs / segmented scans,
    scattering straight into dense slots. Oracle parity incl. i64
    sum/min/max, nulls, counts, across the routing boundary."""
    from arrow_tpu import acero
    from arrow_tpu.ops.hash_aggregate import HashAggregate
    n = 60_000
    G = HashAggregate.DENSE_CAP * 4      # past the pallas cap
    k = rng.integers(0, G, n)
    km = rng.random(n) < 0.05
    t = pa.table({"k": pa.array(k, mask=km),
                  "v": pa.array(rng.standard_normal(n).astype(
                      np.float32)),
                  "w": pa.array(rng.integers(-1 << 40, 1 << 40, n))})
    got = acero.group_by(at.Table.from_pyarrow(t), ["k"],
                         [("sum", "v"), ("min", "v"), ("max", "w"),
                          ("sum", "w"), ("count", "v"), ("count_all",)],
                         max_groups=1 << 16).to_pyarrow()
    exp = t.group_by("k").aggregate([("v", "sum"), ("v", "min"),
                                     ("w", "max"), ("w", "sum"),
                                     ("v", "count"), ([], "count_all")])
    key = [("k", "ascending")]
    g, e = got.sort_by(key), exp.sort_by(key)
    assert g["k"].to_pylist() == e["k"].to_pylist()
    for c in ("count_all", "w_max", "w_sum", "v_count", "v_min"):
        assert g[c].to_pylist() == e[c].to_pylist(), c
    assert np.allclose(
        np.array(g["v_sum"].to_pylist(), dtype=np.float64),
        np.array(e["v_sum"].to_pylist(), dtype=np.float64),
        rtol=1e-4, atol=1e-4)
