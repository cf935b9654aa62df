"""Dataset layer: hive partitioning, guarantee pruning, scanner, writes.
(Reference: dataset/partition_test.cc, scanner tests.)"""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import arrow_tpu as at
from arrow_tpu import dataset as ds
from arrow_tpu.compute.expressions import field


@pytest.fixture
def sample_table(rng):
    n = 500
    return pa.table({
        "year": pa.array(rng.integers(2020, 2024, n)),
        "region": pa.array(rng.choice(["eu", "us"], n)),
        "v": pa.array(rng.standard_normal(n)),
        "k": pa.array(rng.integers(0, 10, n)),
    })


def test_write_read_roundtrip_parquet(tmp_path, sample_table):
    root = str(tmp_path / "flat")
    ds.write_dataset(sample_table, root, format="parquet")
    d = ds.dataset(root)
    got = d.to_table().to_pyarrow()
    assert got.sort_by("v").equals(sample_table.sort_by("v"))


def test_hive_partitioned_write_discover(tmp_path, sample_table):
    root = str(tmp_path / "hive")
    ds.write_dataset(sample_table, root, partitioning=["year"],
                     format="parquet")
    years = set(sample_table["year"].to_pylist())
    for y in years:
        assert os.path.isdir(os.path.join(root, f"year={y}"))
    d = ds.dataset(root, partitioning=["year"])
    assert len(d.fragments) == len(years)
    got = d.to_table().to_pyarrow()
    assert got.num_rows == sample_table.num_rows
    # partition column re-attached with coerced type
    assert set(got["year"].to_pylist()) == years


def test_guarantee_pruning(tmp_path, sample_table):
    root = str(tmp_path / "hive2")
    ds.write_dataset(sample_table, root, partitioning=["year"],
                     format="parquet")
    d = ds.dataset(root, partitioning=["year"])
    sc = d.scanner(filter=(field("year") == 2021) & (field("k") > 4))
    # only one fragment survives pruning
    assert len(sc._selected_fragments()) == 1
    got = sc.to_table().to_pyarrow()
    exp = sample_table.filter(
        pc.and_(pc.equal(sample_table["year"], 2021),
                pc.greater(sample_table["k"], 4)))
    assert got.num_rows == exp.num_rows
    assert sorted(got["v"].to_pylist()) == sorted(exp["v"].to_pylist())


def test_split_filter():
    part, resid = ds.split_filter(
        (field("year") == 2021) & (field("k") > 4) & (field("v") < 0.0),
        ["year"])
    assert len(part) == 1
    assert resid is not None
    assert set(resid.field_names()) == {"k", "v"}
    part2, resid2 = ds.split_filter(None, ["year"])
    assert part2 == [] and resid2 is None


def test_atb_dataset_roundtrip(tmp_path, rng):
    from arrow_tpu import native
    if not native.available():
        pytest.skip("native runtime unavailable")
    t = pa.table({
        "i": pa.array(rng.integers(0, 100, 200)),
        "s": pa.array([f"row{i}" if i % 5 else None for i in range(200)]),
    })
    root = str(tmp_path / "atb")
    ds.write_dataset(t, root, format="atb")
    d = ds.dataset(root)
    got = d.to_table().to_pyarrow()
    assert got["i"].to_pylist() == t["i"].to_pylist()
    assert got["s"].to_pylist() == t["s"].to_pylist()


def test_scanner_projection_and_csv(tmp_path, sample_table):
    root = str(tmp_path / "csvd")
    ds.write_dataset(sample_table, root, format="csv")
    d = ds.dataset(root)
    got = d.scanner(columns=["k", "v"]).to_table().to_pyarrow()
    assert got.column_names == ["k", "v"]
    assert got.num_rows == sample_table.num_rows


def test_scan_node_in_plan(tmp_path, sample_table):
    from arrow_tpu.acero import (AggregateNodeOptions, AggregateSpec,
                                 Declaration, ScanNodeOptions)
    root = str(tmp_path / "hive3")
    ds.write_dataset(sample_table, root, partitioning=["region"],
                     format="parquet")
    d = ds.dataset(root, partitioning=["region"])
    decl = Declaration.from_sequence([
        Declaration("scan", ScanNodeOptions(
            d, filter=(field("region") == "eu") & (field("k") < 5))),
        Declaration("aggregate", AggregateNodeOptions(
            [AggregateSpec("sum", "v"), AggregateSpec("count_all")],
            keys=["k"], max_groups=32)),
    ])
    got = decl.to_pyarrow().sort_by([("k", "ascending")])
    st = sample_table.filter(pc.and_(
        pc.equal(sample_table["region"], "eu"),
        pc.less(sample_table["k"], 5)))
    exp = st.group_by("k").aggregate([("v", "sum"), ([], "count_all")]) \
        .sort_by([("k", "ascending")])
    assert got["k"].to_pylist() == exp["k"].to_pylist()
    np.testing.assert_allclose(got["v_sum"].to_pylist(),
                               exp["v_sum"].to_pylist(), rtol=1e-12)
    assert got["count_all"].to_pylist() == exp["count_all"].to_pylist()


def test_filesystem_backed_dataset(tmp_path, sample_table):
    """pyarrow.fs FileSystem objects plug into discovery/read/write
    (SURVEY §2.6 Filesystems — local/S3/GCS/mock share one interface)."""
    from pyarrow import fs as pafs
    fs = pafs.SubTreeFileSystem(str(tmp_path), pafs.LocalFileSystem())
    ds.write_dataset(sample_table, "fsd", partitioning=["region"],
                     format="parquet", filesystem=fs)
    d = ds.dataset("fsd", partitioning=["region"], filesystem=fs)
    assert all(f.filesystem is fs for f in d.fragments)
    got = d.to_table().to_pyarrow()
    assert got.num_rows == sample_table.num_rows
    assert sorted(got["v"].to_pylist()) == \
        sorted(sample_table["v"].to_pylist())


def test_mock_filesystem_dataset(sample_table):
    """In-memory mock FS — the stand-in for cloud filesystems in CI."""
    from pyarrow import fs as pafs
    mfs = pafs._MockFileSystem()
    ds.write_dataset(sample_table, "bucket/data", format="feather",
                     filesystem=mfs)
    d = ds.dataset("bucket/data", filesystem=mfs)
    assert d.to_table().to_pyarrow().num_rows == sample_table.num_rows


def test_orc_and_json_fragments(tmp_path):
    import pyarrow.orc as porc
    root = tmp_path / "mixed"
    root.mkdir()
    porc.write_table(pa.table({"v": [1, 2, 3]}), str(root / "a.orc"))
    (root / "b.json").write_text(
        "\n".join('{"v": %d}' % i for i in (100, 200)))
    d = ds.dataset(str(root))
    assert {f.format for f in d.fragments} == {"orc", "json"}
    rows = d.to_table().to_pyarrow()
    assert sorted(rows["v"].to_pylist()) == [1, 2, 3, 100, 200]


def test_avro_roundtrip_and_fragment(tmp_path):
    """Avro adapter (reference: cpp/src/arrow/adapters/avro): writer ->
    reader round-trip across types, deflate + null codecs, nullable
    unions, logical date/timestamp, arrays; and .avro discovery through
    the dataset layer into the engine."""
    import datetime
    from arrow_tpu.dataset.avro import read_avro, write_avro

    t = pa.table({
        "i": pa.array([1, None, 3, -(1 << 40)], type=pa.int64()),
        "f": pa.array([0.5, 1.5, None, 3.25], type=pa.float64()),
        "s": pa.array(["a", "β", None, ""], type=pa.string()),
        "b": pa.array([True, False, None, True]),
        "raw": pa.array([b"\x00\x01", b"", None, b"zz"],
                        type=pa.binary()),
        "d": pa.array([datetime.date(2020, 1, 1), None,
                       datetime.date(1969, 12, 31),
                       datetime.date(2024, 2, 29)], type=pa.date32()),
        "ts": pa.array([1, 2, None, 4],
                       type=pa.timestamp("us")),
        "lst": pa.array([[1, 2], [], None, [5]],
                        type=pa.list_(pa.int64())),
    })
    for codec in ("deflate", "null"):
        path = str(tmp_path / f"t_{codec}.avro")
        write_avro(t, path, codec=codec, block_rows=3)
        got = read_avro(path)
        assert got.equals(t), (codec, got, t)

    # dataset discovery + engine scan
    d = ds.dataset(str(tmp_path))
    assert {f.format for f in d.fragments} == {"avro"}
    out = d.to_table().to_pyarrow()
    assert out.num_rows == 2 * t.num_rows


def test_avro_non_nullable_and_errors(tmp_path):
    from arrow_tpu.dataset.avro import read_avro, write_avro
    t = pa.table({"k": pa.array([1, 2, 3], type=pa.int32())})
    t = t.cast(pa.schema([pa.field("k", pa.int32(), nullable=False)]))
    path = str(tmp_path / "nn.avro")
    write_avro(t, path)
    assert read_avro(path).equals(t.cast(pa.schema(
        [pa.field("k", pa.int32())])))
    with pytest.raises(ValueError):
        read_avro(__file__)  # not an avro file
