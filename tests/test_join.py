"""Hash join vs the pyarrow.acero oracle.

Reference test model: randomized schemas/keys/null-ratios compared
order-insensitively (hash_join_node_test.cc:252-390, 3167)."""

import numpy as np
import pyarrow as pa
import pyarrow.acero as pac
import pytest

import arrow_tpu as at
from arrow_tpu.acero import (Declaration, HashJoinNodeOptions,
                             TableSourceNodeOptions)

from oracle import random_numeric_array

JOIN_TYPES = ["inner", "left outer", "right outer", "full outer",
              "left semi", "right semi", "left anti", "right anti"]


def run_join(left, right, join_type, left_keys, right_keys,
             max_build_rows=1 << 12, batch_rows=None, **opt_kw):
    decl = Declaration("hashjoin", HashJoinNodeOptions(
        join_type, left_keys, right_keys, max_build_rows=max_build_rows,
        **opt_kw), [
        Declaration("table_source", TableSourceNodeOptions(
            left, max_batch_rows=batch_rows or (1 << 15))),
        Declaration("table_source", TableSourceNodeOptions(right)),
    ])
    return decl.to_pyarrow()


def oracle_join(left, right, join_type, left_keys, right_keys):
    decl = pac.Declaration("hashjoin", pac.HashJoinNodeOptions(
        join_type, left_keys, right_keys), [
        pac.Declaration("table_source", pac.TableSourceNodeOptions(left)),
        pac.Declaration("table_source", pac.TableSourceNodeOptions(right)),
    ])
    return decl.to_table()


def assert_join_equal(got, expected, msg=""):
    """Order-insensitive comparison (join output order is unspecified)."""
    got = pa.table(got) if not isinstance(got, pa.Table) else got
    assert got.schema.names == expected.schema.names, \
        (got.schema, expected.schema)
    assert got.num_rows == expected.num_rows, \
        f"{msg}: rows {got.num_rows} != {expected.num_rows}"
    # join outputs may repeat column names (both key columns) — make
    # unique positional names before sort_by
    uniq = [f"c{i}" for i in range(got.num_columns)]
    got = got.rename_columns(uniq)
    expected = expected.rename_columns(uniq)
    sort_keys = [(n, "ascending") for n in uniq]
    g = got.sort_by(sort_keys).to_pydict()
    e = expected.sort_by(sort_keys).to_pydict()
    assert g == e, f"{msg}:\ngot {g}\nwant {e}"


def make_tables(rng, nl=500, nr=200, kmax=50, null_prob=0.1):
    left = pa.table({
        "k": random_numeric_array(rng, nl, pa.int64(), null_prob=null_prob,
                                  small=True),
        "lv": pa.array(np.arange(nl)),
    })
    right = pa.table({
        "k": random_numeric_array(rng, nr, pa.int64(), null_prob=null_prob,
                                  small=True),
        "rv": pa.array(np.arange(nr) * 10),
    })
    return left, right


@pytest.mark.parametrize("join_type", JOIN_TYPES)
def test_join_types_oracle(rng, join_type):
    left, right = make_tables(rng)
    got = run_join(left, right, join_type, ["k"], ["k"],
                   output_suffix_for_left="_l", output_suffix_for_right="_r",
                   fanout_capacity=1 << 15)
    expected = oracle_join(left, right, join_type, ["k"], ["k"])
    # acero oracle uses no suffixes for semi/anti (single side); align names
    got = got.rename_columns(expected.schema.names)
    assert_join_equal(got, expected, msg=join_type)


def test_join_duplicate_build_keys(rng):
    left = pa.table({"k": [1, 2, 3, 2], "lv": [10, 20, 30, 40]})
    right = pa.table({"k": [2, 2, 2, 5], "rv": [1, 2, 3, 4]})
    got = run_join(left, right, "inner", ["k"], ["k"],
                   output_suffix_for_left="_l", output_suffix_for_right="_r",
                   fanout_capacity=64)
    expected = oracle_join(left, right, "inner", ["k"], ["k"])
    got = got.rename_columns(expected.schema.names)
    assert_join_equal(got, expected, msg="dup keys")
    assert got.num_rows == 6  # two probe rows x three build rows


def test_join_null_keys_never_match():
    left = pa.table({"k": pa.array([1, None, 3]), "lv": [1, 2, 3]})
    right = pa.table({"k": pa.array([None, 3]), "rv": [10, 30]})
    got = run_join(left, right, "inner", ["k"], ["k"],
                   output_suffix_for_left="_l", output_suffix_for_right="_r")
    expected = oracle_join(left, right, "inner", ["k"], ["k"])
    got = got.rename_columns(expected.schema.names)
    assert_join_equal(got, expected, msg="null keys")
    assert got.num_rows == 1


def test_join_multi_key(rng):
    nl, nr = 400, 300
    left = pa.table({
        "a": pa.array(rng.integers(0, 8, nl)),
        "b": pa.array(rng.integers(0, 8, nl).astype(np.int32)),
        "lv": pa.array(np.arange(nl)),
    })
    right = pa.table({
        "a": pa.array(rng.integers(0, 8, nr)),
        "b": pa.array(rng.integers(0, 8, nr).astype(np.int32)),
        "rv": pa.array(np.arange(nr)),
    })
    got = run_join(left, right, "inner", ["a", "b"], ["a", "b"],
                   output_suffix_for_left="_l", output_suffix_for_right="_r",
                   fanout_capacity=1 << 15)
    expected = oracle_join(left, right, "inner", ["a", "b"], ["a", "b"])
    got = got.rename_columns(expected.schema.names)
    assert_join_equal(got, expected, msg="multi key")


def test_join_streamed_probe_batches(rng):
    left, right = make_tables(rng, nl=2000, nr=300)
    got = run_join(left, right, "left outer", ["k"], ["k"],
                   batch_rows=256, fanout_capacity=1 << 14,
                   output_suffix_for_left="_l",
                   output_suffix_for_right="_r")
    expected = oracle_join(left, right, "left outer", ["k"], ["k"])
    got = got.rename_columns(expected.schema.names)
    assert_join_equal(got, expected, msg="streamed")


def test_join_output_projection(rng):
    left, right = make_tables(rng, nl=100, nr=50)
    got = run_join(left, right, "inner", ["k"], ["k"],
                   left_output=["lv"], right_output=["rv"],
                   fanout_capacity=1 << 13)
    expected = oracle_join(left, right, "inner", ["k"], ["k"])
    expected = expected.select(["lv", "rv"])
    srt = [("lv", "ascending"), ("rv", "ascending")]
    assert pa.table(got).sort_by(srt).to_pydict() == \
        expected.sort_by(srt).to_pydict()


def test_join_fanout_overflow_recovers(rng):
    """100x100 fanout (10k pairs) with a 64-slot fanout capacity: the
    node retries the batch at doubled capacities until it fits (the
    host-side bucketed re-execution of ops/join.py's deferred-error
    design) instead of raising."""
    left = pa.table({"k": [1] * 100, "lv": list(range(100))})
    right = pa.table({"k": [1] * 100, "rv": list(range(100))})
    got = run_join(left, right, "inner", ["k"], ["k"], fanout_capacity=64,
                   output_suffix_for_left="_l", output_suffix_for_right="_r")
    assert got.num_rows == 10_000


def test_join_build_overflow_recovers(rng):
    """More distinct build keys (100) than max_build_rows (16): the node
    rebuilds at doubled group capacities until the build side fits."""
    ks = list(range(100))
    left = pa.table({"k": ks * 3, "lv": list(range(300))})
    right = pa.table({"k": ks, "rv": [k * 10 for k in ks]})
    got = run_join(left, right, "inner", ["k"], ["k"], max_build_rows=16,
                   output_suffix_for_left="_l", output_suffix_for_right="_r")
    expected = oracle_join(left, right, "inner", ["k"], ["k"])
    got = got.rename_columns(expected.schema.names)
    assert_join_equal(got, expected, msg="build overflow recovery")


def test_join_empty_build(rng):
    left = pa.table({"k": [1, 2], "lv": [1, 2]})
    right = pa.table({"k": pa.array([], type=pa.int64()),
                      "rv": pa.array([], type=pa.int64())})
    got = run_join(left, right, "left outer", ["k"], ["k"],
                   output_suffix_for_left="_l", output_suffix_for_right="_r")
    expected = oracle_join(left, right, "left outer", ["k"], ["k"])
    got = got.rename_columns(expected.schema.names)
    assert_join_equal(got, expected, msg="empty build")


# ----------------------------------------------------------------------
# Residual (non-equi) filter — acero/options.h:571 filter expression,
# evaluated on matched key pairs (swiss_join.cc JoinResidualFilter).
# ----------------------------------------------------------------------

def run_join_filtered(left, right, join_type, expr):
    from arrow_tpu.compute.expressions import call, field
    return run_join(left, right, join_type, ["k"], ["k"],
                    output_suffix_for_left="_l",
                    output_suffix_for_right="_r",
                    fanout_capacity=1 << 15,
                    filter=expr)


def oracle_join_filtered(left, right, join_type, expr):
    decl = pac.Declaration("hashjoin", pac.HashJoinNodeOptions(
        join_type, ["k"], ["k"], output_suffix_for_left="_l",
        output_suffix_for_right="_r", filter_expression=expr), [
        pac.Declaration("table_source", pac.TableSourceNodeOptions(left)),
        pac.Declaration("table_source", pac.TableSourceNodeOptions(right)),
    ])
    return decl.to_table()


@pytest.mark.parametrize("join_type", JOIN_TYPES)
def test_join_residual_filter_oracle(rng, join_type):
    import pyarrow.compute as pc
    from arrow_tpu.compute.expressions import call, field
    left, right = make_tables(rng, nl=400, nr=150, kmax=40)
    expr = call("less", [field("lv"), call("multiply",
                                           [field("rv"), literal_i64(3)])])
    oexpr = pc.field("lv") < (pc.field("rv") * pa.scalar(3, pa.int64()))
    got = run_join_filtered(left, right, join_type, expr)
    expected = oracle_join_filtered(left, right, join_type, oexpr)
    got = pa.table(got).rename_columns(expected.schema.names)
    assert_join_equal(got, expected, msg=f"residual {join_type}")


def literal_i64(v):
    from arrow_tpu.compute.expressions import literal
    import arrow_tpu.core.datatype as adt
    return literal(v, adt.int64)


@pytest.mark.parametrize("join_type", ["inner", "left outer", "full outer",
                                       "right outer", "left anti"])
def test_join_residual_filter_nulls(rng, join_type):
    """Null filter results count as non-matches."""
    import pyarrow.compute as pc
    from arrow_tpu.compute.expressions import call, field
    left = pa.table({"k": [1, 1, 2, 3, None],
                     "lv": [10, None, 5, 7, 0]})
    right = pa.table({"k": [1, 1, 2, 4],
                      "rv": [8, 20, None, 1]})
    expr = call("less", [field("lv"), field("rv")])
    oexpr = pc.field("lv") < pc.field("rv")
    got = run_join_filtered(left, right, join_type, expr)
    expected = oracle_join_filtered(left, right, join_type, oexpr)
    got = pa.table(got).rename_columns(expected.schema.names)
    assert_join_equal(got, expected, msg=f"residual-null {join_type}")


def test_join_residual_literal_true_noop(rng):
    from arrow_tpu.compute.expressions import literal
    import arrow_tpu.core.datatype as adt
    left, right = make_tables(rng, nl=100, nr=60)
    got = run_join(left, right, "inner", ["k"], ["k"],
                   output_suffix_for_left="_l",
                   output_suffix_for_right="_r",
                   fanout_capacity=1 << 14,
                   filter=literal(True, adt.bool_))
    expected = oracle_join(left, right, "inner", ["k"], ["k"])
    got = pa.table(got).rename_columns(expected.schema.names)
    assert_join_equal(got, expected, msg="literal-true")


def test_join_residual_ambiguous_field_raises(rng):
    from arrow_tpu.compute.expressions import call, field
    left = pa.table({"k": [1], "v": [1]})
    right = pa.table({"k": [1], "v": [2]})
    with pytest.raises((ValueError, KeyError)):
        run_join(left, right, "inner", ["k"], ["k"],
                 filter=call("less", [field("v"), field("v")]))


@pytest.mark.parametrize("join_type", JOIN_TYPES)
def test_join_raw_string_keys(rng, join_type):
    """Raw (non-dictionary) string join keys + string payloads: keys match
    via full-content fingerprint lanes; payload takes scale the byte pool
    by the fanout grow factor."""
    words = ["apple", "pear", "plum", "kiwi", "mango", "fig", None]
    lk = [words[i] for i in rng.integers(0, len(words), 300)]
    rk = [words[i] for i in rng.integers(0, len(words), 40)]
    left = pa.table({"k": pa.array(lk, pa.string()),
                     "lv": pa.array(np.arange(300))})
    right = pa.table({"k": pa.array(rk, pa.string()),
                      "rs": pa.array([None if w is None else w.upper()
                                      for w in rk], pa.string())})
    got = run_join(left, right, join_type, ["k"], ["k"],
                   output_suffix_for_left="_l", output_suffix_for_right="_r",
                   max_build_rows=1 << 8, fanout_capacity=1 << 13)
    expected = oracle_join(left, right, join_type, ["k"], ["k"])
    got = got.rename_columns(expected.schema.names)
    assert_join_equal(got, expected, msg=join_type)


# ---- Bloom pushdown (ops/bloom.py; reference bloom_filter.h:42) ----------

def test_bloom_unit_no_false_negatives(rng):
    """Every inserted key queries True; disjoint keys mostly query False."""
    import jax.numpy as jnp
    from arrow_tpu.ops.bloom import bloom_m_log2, build_bloom, query_bloom
    n = 1 << 10
    keys = jnp.arange(n, dtype=jnp.uint32).reshape(n, 1) * 2654435761
    lanes = keys.astype(jnp.uint32)
    active = jnp.ones((n,), jnp.bool_)
    bits = build_bloom(lanes, active, bloom_m_log2(n))
    hit = query_bloom(bits, lanes, active)
    assert bool(hit.all()), "false negative"
    other = (jnp.arange(n, dtype=jnp.uint32) + n).reshape(n, 1) * 2654435761
    fp = query_bloom(bits, other.astype(jnp.uint32), active)
    fpr = float(fp.sum()) / n
    assert fpr < 0.12, f"FPR {fpr} too high (expect ~3% at 8 slots/key)"


@pytest.mark.parametrize("join_type",
                         ["inner", "left semi", "left anti", "right outer"])
def test_bloom_selective_join_oracle(rng, join_type):
    """~2% selective probe side: bloom drops (or anti-emits) most rows
    before the probe; output must still match pyarrow exactly."""
    lk = rng.integers(0, 100_000, 5000)
    rk = rng.integers(0, 100, 64)          # tiny build side
    left = pa.table({"k": pa.array(lk), "lv": pa.array(np.arange(5000))})
    right = pa.table({"k": pa.array(rk), "rv": pa.array(np.arange(64))})
    got = run_join(left, right, join_type, ["k"], ["k"],
                   max_build_rows=1 << 8, batch_rows=1 << 10)
    expected = oracle_join(left, right, join_type, ["k"], ["k"])
    got = got.rename_columns(expected.schema.names)
    assert_join_equal(got, expected, msg=f"bloom {join_type}")


def test_bloom_disable_flag_matches(rng):
    lk = rng.integers(0, 10_000, 2000)
    rk = rng.integers(0, 50, 32)
    left = pa.table({"k": pa.array(lk), "lv": pa.array(np.arange(2000))})
    right = pa.table({"k": pa.array(rk), "rv": pa.array(np.arange(32))})
    a = run_join(left, right, "inner", ["k"], ["k"],
                 disable_bloom_filter=True)
    b = run_join(left, right, "inner", ["k"], ["k"],
                 disable_bloom_filter=False)
    expected = oracle_join(left, right, "inner", ["k"], ["k"])
    assert_join_equal(a.rename_columns(expected.schema.names), expected)
    assert_join_equal(b.rename_columns(expected.schema.names), expected)


# ---- Grace (disk-partitioned) spill join ----------------------------------

@pytest.mark.parametrize("join_type",
                         ["inner", "left outer", "full outer", "left anti",
                          "right outer"])
def test_join_grace_spill_oracle(rng, join_type):
    """A tiny spill budget forces the Grace path: both sides hash-
    partition to ATB files and the join runs partition-by-partition;
    results must match pyarrow for every join type."""
    from arrow_tpu import native
    if not native.available():
        pytest.skip("native runtime unavailable")
    nl, nr = 6000, 1500
    lk = rng.integers(0, 2000, nl)
    rk = rng.integers(500, 2500, nr)
    left = pa.table({"k": pa.array(lk), "lv": pa.array(np.arange(nl))})
    right = pa.table({"k": pa.array(rk),
                      "rv": pa.array(np.arange(nr) * 10)})
    got = run_join(left, right, join_type, ["k"], ["k"],
                   max_build_rows=1 << 12, batch_rows=1 << 10,
                   spill_bytes=10_000,
                   output_suffix_for_left="_l",
                   output_suffix_for_right="_r")
    expected = oracle_join(left, right, join_type, ["k"], ["k"])
    got = got.rename_columns(expected.schema.names)
    assert_join_equal(got, expected, msg=f"grace {join_type}")


# ---- packed single-key probe vs generic multi-lane probe ------------------

@pytest.mark.parametrize("join_type", JOIN_TYPES)
def test_join_packed_vs_sort_impl(rng, join_type):
    """The round-4 packed single-key probe (ops/join.py
    _probe_spans_packed) must agree with the generic multi-lane find for
    every join type, including duplicate build keys and nulls."""
    import jax
    from arrow_tpu.acero.options import HashJoinNodeOptions
    from arrow_tpu.ops.join import HashJoin
    left, right = make_tables(rng, nl=700, nr=300, kmax=60, null_prob=0.15)
    lb = at.Batch.from_pyarrow(left.combine_chunks().to_batches()[0])
    rb = at.Batch.from_pyarrow(right.combine_chunks().to_batches()[0])
    hj = HashJoin(lb.schema, rb.schema, HashJoinNodeOptions(
        join_type, ["k"], ["k"], max_build_rows=1 << 10,
        output_suffix_for_left="_l", output_suffix_for_right="_r"))
    bs = jax.jit(hj.build)(rb)
    assert int(jax.device_get(bs.pack_bits)) <= 30
    outs = {}
    for impl in ("packed", "sort"):
        out, bs2 = hj.probe(bs, lb, 1 << 13, impl)
        rows = []
        if out is not None:
            rows += list(zip(*out.to_pyarrow().to_pydict().values()))
        tail = hj.finish(bs2)
        if tail is not None:
            rows += list(zip(*tail.to_pyarrow().to_pydict().values()))
        outs[impl] = sorted(rows, key=lambda r: tuple(
            (v is None, v) for v in r))
    assert outs["packed"] == outs["sort"], join_type


@pytest.mark.parametrize("join_type",
                         ["inner", "left outer", "left semi", "left anti"])
def test_join_unique_build_compaction_impl(rng, join_type):
    """The unique-build (PK-FK) compaction probe must agree with the
    generic path, including null keys on both sides."""
    import jax
    from arrow_tpu.acero.options import HashJoinNodeOptions
    from arrow_tpu.ops.join import HashJoin
    nl, nr = 600, 180
    lk = [None if rng.random() < 0.1 else int(v)
          for v in rng.integers(0, 400, nl)]
    rv = list(rng.permutation(400)[:nr - 12])
    rk = [None] * 12 + [int(v) for v in rv]   # unique non-null keys
    left = pa.table({"k": pa.array(lk, pa.int64()),
                     "lv": pa.array(np.arange(nl))})
    right = pa.table({"k": pa.array(rk, pa.int64()),
                      "rv": pa.array(np.arange(nr) * 10)})
    lb = at.Batch.from_pyarrow(left.combine_chunks().to_batches()[0])
    rb = at.Batch.from_pyarrow(right.combine_chunks().to_batches()[0])
    hj = HashJoin(lb.schema, rb.schema, HashJoinNodeOptions(
        join_type, ["k"], ["k"], max_build_rows=1 << 9,
        output_suffix_for_left="_l", output_suffix_for_right="_r"))
    bs = jax.jit(hj.build)(rb)
    ng, na = (int(v) for v in jax.device_get((bs.num_groups,
                                              bs.num_active)))
    assert ng == na, "build keys must be unique for this test"
    outs = {}
    for impl in ("packed_u", "sort"):
        out, bs2 = hj.probe(bs, lb, 1 << 13, impl)
        rows = []
        if out is not None:
            rows += list(zip(*out.to_pyarrow().to_pydict().values()))
        tail = hj.finish(bs2)
        if tail is not None:
            rows += list(zip(*tail.to_pyarrow().to_pydict().values()))
        outs[impl] = sorted(rows, key=lambda r: tuple(
            (v is None, v) for v in r))
    assert outs["packed_u"] == outs["sort"], join_type


def test_join_unpackable_keys_fall_back(rng):
    """Keys whose lane ranges exceed 30 bits must route to the generic
    probe and still match the oracle."""
    nl, nr = 400, 150
    lk = rng.integers(-1 << 60, 1 << 60, nl)
    rk = np.concatenate([lk[:50], rng.integers(-1 << 60, 1 << 60, nr - 50)])
    left = pa.table({"k": pa.array(lk), "lv": pa.array(np.arange(nl))})
    right = pa.table({"k": pa.array(rk), "rv": pa.array(np.arange(nr))})
    got = run_join(left, right, "inner", ["k"], ["k"],
                   output_suffix_for_left="_l", output_suffix_for_right="_r")
    expected = oracle_join(left, right, "inner", ["k"], ["k"])
    assert_join_equal(got.rename_columns(expected.schema.names), expected)


def test_join_keys_straddle_slot_width():
    """Round-5 regression: varlen content lanes must pick their FORM per
    row (by length), not per array — a per-array branch on max length
    made a join whose probe side held any >16-byte string (build side
    all short) return 0 rows instead of every match."""
    from arrow_tpu.acero import (Declaration, HashJoinNodeOptions,
                                 TableSourceNodeOptions)
    bk = [f"key{i:03d}" for i in range(50)]
    long = "averyverylongstringkey_exceeding16"
    # probe-side-long is the originally-observed bug; the build-side
    # direction is covered by the same per-row lane-form argument and
    # costs a second compile set — keep the lane lean
    for probe_extra, build_extra in (([long], []),):
        b = pa.table({"k": pa.array(bk + build_extra),
                      "w": pa.array(range(50 + len(build_extra)))})
        p = pa.table({"k": pa.array(bk * 4 + probe_extra),
                      "v": pa.array(range(200 + len(probe_extra)))})
        d = Declaration("hashjoin", HashJoinNodeOptions(
            "inner", left_keys=["k"], right_keys=["k"],
            left_output=["k", "v"], right_output=["w"],
            max_build_rows=256),
            inputs=[Declaration("table_source", TableSourceNodeOptions(
                        at.Table.from_pyarrow(p))),
                    Declaration("table_source", TableSourceNodeOptions(
                        at.Table.from_pyarrow(b)))])
        exp = p.join(b, keys="k", join_type="inner")
        assert d.to_table().num_rows == exp.num_rows


def test_group_by_batches_straddle_slot_width():
    """Same per-row lane-form requirement across BATCHES of one stream:
    a later batch containing a >16-byte string must not re-key earlier
    short strings."""
    from arrow_tpu import acero
    bk = [f"key{i:03d}" for i in range(50)]
    keys = bk * 40 + ["averyverylongstringkey_exceeding16"] * 7
    t = pa.table({"k": pa.array(keys), "v": pa.array(range(len(keys)))})
    g = acero.group_by(at.Table.from_pyarrow(t, max_rows_per_batch=512),
                       ["k"], [("count_all",)], max_groups=256).to_pyarrow()
    exp = t.group_by("k").aggregate([([], "count_all")])
    assert g.num_rows == exp.num_rows
    assert sorted(g["count_all"].to_pylist()) == \
        sorted(exp["count_all"].to_pylist())
