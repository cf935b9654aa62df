"""arrow_tpu.dataset — partitioned datasets + scanner.

Reference: ``cpp/src/arrow/dataset`` (Dataset/Fragment discovery, hive and
directory partitioning with expression guarantees, Scanner, ScanNode with
readahead, partitioned write via DatasetWriter).

TPU-native shape: fragments are files (native ATB for engine-internal
storage — zero-copy mmap + threaded morsel readahead via the C++ loader —
or parquet/ipc/csv read through pyarrow at the edges). Each fragment
carries a partition GUARANTEE (field=value conjunction from its path);
the scanner splits the filter into partition-only conjuncts (evaluated
host-side to prune whole fragments — the reference's
SimplifyWithGuarantee role, ``expression.h:224``) and a residual that
runs vectorized on device.
"""

from __future__ import annotations

import os
import re
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..compute.expressions import Expression, field as field_ref, literal
from ..core.batch import Batch, Table

__all__ = ["HivePartitioning", "DirectoryPartitioning", "Fragment",
           "FileSystemDataset", "Scanner", "dataset", "write_dataset",
           "split_filter"]


# ---- partitioning schemes ------------------------------------------------------

class HivePartitioning:
    """key=value path segments (``dataset/partition.h`` HivePartitioning)."""

    def __init__(self, fields: Sequence[str]):
        self.fields = list(fields)

    def parse(self, relpath: str) -> Dict[str, str]:
        out = {}
        for seg in relpath.split(os.sep):
            if "=" in seg:
                k, v = seg.split("=", 1)
                if k in self.fields:
                    out[k] = v
        return out

    def format(self, values: Dict) -> str:
        return os.sep.join(f"{k}={values[k]}" for k in self.fields)


class DirectoryPartitioning:
    """Positional path segments (``DirectoryPartitioning``)."""

    def __init__(self, fields: Sequence[str]):
        self.fields = list(fields)

    def parse(self, relpath: str) -> Dict[str, str]:
        segs = relpath.split(os.sep)[:-1]  # drop filename
        return {k: v for k, v in zip(self.fields, segs)}

    def format(self, values: Dict) -> str:
        return os.sep.join(str(values[k]) for k in self.fields)


# ---- fragments / dataset -------------------------------------------------------

class Fragment:
    def __init__(self, path: str, fmt: str,
                 partition_values: Optional[Dict] = None,
                 filesystem=None):
        self.path = path
        self.format = fmt
        self.partition_values = partition_values or {}
        self.filesystem = filesystem  # pyarrow.fs.FileSystem or None=local

    def read_pyarrow(self):
        import pyarrow as pa
        fs = self.filesystem
        if self.format == "parquet":
            import pyarrow.parquet as pq
            return pq.read_table(self.path, filesystem=fs)
        if self.format in ("ipc", "feather", "arrow"):
            import pyarrow.feather as fe
            if fs is not None:
                with fs.open_input_file(self.path) as f:
                    return fe.read_table(f)
            return fe.read_table(self.path)
        if self.format == "csv":
            import pyarrow.csv as pcsv
            if fs is not None:
                with fs.open_input_stream(self.path) as f:
                    return pcsv.read_csv(f)
            return pcsv.read_csv(self.path)
        if self.format == "json":
            import pyarrow.json as pjson
            if fs is not None:
                with fs.open_input_stream(self.path) as f:
                    return pjson.read_json(f)
            return pjson.read_json(self.path)
        if self.format == "orc":
            import pyarrow.orc as porc
            if fs is not None:
                with fs.open_input_file(self.path) as f:
                    return porc.ORCFile(f).read()
            return porc.ORCFile(self.path).read()
        if self.format == "avro":
            from .avro import read_avro
            if fs is not None:
                with fs.open_input_file(self.path) as f:
                    return read_avro(f)
            return read_avro(self.path)
        if self.format == "atb":
            if fs is not None:
                raise ValueError(
                    "atb fragments are local-mmap only; use parquet/ipc "
                    "on remote filesystems")
            from .. import native
            cols, nrows = native.read_atb(self.path)
            return pa.table({name: _atb_col_to_pa(c, nrows)
                             for name, c in cols.items()})
        raise ValueError(f"unknown fragment format {self.format!r}")

    def __repr__(self):
        return f"Fragment({self.path!r}, {self.partition_values})"


def _atb_col_to_pa(col, nrows):
    import pyarrow as pa
    data = col["data"]
    if "offsets" in col:
        arr = pa.StringArray.from_buffers(
            nrows, pa.py_buffer(col["offsets"]), pa.py_buffer(data))
    else:
        arr = pa.array(data)
    if "validity" in col:
        mask = ~col["validity"]
        arr = pa.array(arr.to_numpy(zero_copy_only=False), mask=mask)
    return arr


_EXT_FORMAT = {".parquet": "parquet", ".feather": "feather",
               ".arrow": "ipc", ".ipc": "ipc", ".csv": "csv",
               ".json": "json", ".orc": "orc", ".atb": "atb",
               ".avro": "avro"}


class FileSystemDataset:
    """Discovered set of fragments with partition guarantees."""

    def __init__(self, fragments: List[Fragment], partitioning=None):
        self.fragments = fragments
        self.partitioning = partitioning

    @staticmethod
    def discover(root: str, partitioning=None,
                 format: Optional[str] = None,
                 filesystem=None) -> "FileSystemDataset":
        if filesystem is None and _is_uri(root):
            # "s3://bucket/…" etc. resolve through pyarrow.fs — the
            # reference's FileSystem layer plays the same edge role here
            # (SURVEY §2.6 Filesystems; our compute never touches IO)
            from pyarrow import fs as pafs
            filesystem, root = pafs.FileSystem.from_uri(root)
        frags = []
        if filesystem is not None:
            from pyarrow import fs as pafs
            infos = filesystem.get_file_info(
                pafs.FileSelector(root, recursive=True))
            for info in sorted(infos, key=lambda i: i.path):
                if info.type != pafs.FileType.File:
                    continue
                ext = os.path.splitext(info.path)[1]
                fmt = format or _EXT_FORMAT.get(ext)
                if fmt is None:
                    continue
                rel = os.path.relpath(info.path, root)
                pv = partitioning.parse(rel) if partitioning else {}
                frags.append(Fragment(info.path, fmt, pv,
                                      filesystem=filesystem))
            return FileSystemDataset(frags, partitioning)
        for dirpath, _dirs, files in sorted(os.walk(root)):
            for f in sorted(files):
                ext = os.path.splitext(f)[1]
                fmt = format or _EXT_FORMAT.get(ext)
                if fmt is None:
                    continue
                path = os.path.join(dirpath, f)
                rel = os.path.relpath(path, root)
                pv = partitioning.parse(rel) if partitioning else {}
                frags.append(Fragment(path, fmt, pv))
        return FileSystemDataset(frags, partitioning)

    def scanner(self, columns=None, filter=None,
                batch_rows: int = 1 << 15) -> "Scanner":
        return Scanner(self, columns=columns, filter=filter,
                       batch_rows=batch_rows)

    def to_table(self, **kw) -> Table:
        return self.scanner(**kw).to_table()


def _is_uri(path: str) -> bool:
    return bool(re.match(r"^[a-zA-Z][a-zA-Z0-9+.-]*://", path))


def dataset(root: str, partitioning=None, format=None,
            filesystem=None) -> FileSystemDataset:
    """``pyarrow.dataset.dataset`` analog. ``filesystem`` takes a
    pyarrow.fs.FileSystem (S3/GCS/Azure/HDFS/local/mock); URIs like
    "s3://bucket/path" resolve automatically."""
    if isinstance(partitioning, (list, tuple)):
        partitioning = HivePartitioning(list(partitioning))
    return FileSystemDataset.discover(root, partitioning, format,
                                      filesystem=filesystem)


# ---- filter splitting (guarantee simplification) --------------------------------

def _conjuncts(expr: Expression) -> List[Expression]:
    if expr is None:
        return []
    if expr.kind == Expression.KIND_CALL and expr.function in (
            "and", "and_kleene"):
        return _conjuncts(expr.args[0]) + _conjuncts(expr.args[1])
    return [expr]


def _recombine(conjs: List[Expression]) -> Optional[Expression]:
    if not conjs:
        return None
    out = conjs[0]
    for c in conjs[1:]:
        from ..compute.expressions import call
        out = call("and_kleene", [out, c])
    return out


def split_filter(expr: Optional[Expression],
                 partition_fields: Sequence[str]
                 ) -> Tuple[List[Expression], Optional[Expression]]:
    """(partition-only conjuncts, residual expression) — the pruning split
    of SimplifyWithGuarantee (``expression.h:224``): a conjunct whose
    fields are all partition fields evaluates host-side per fragment."""
    pf = set(partition_fields)
    part, rest = [], []
    for c in _conjuncts(expr):
        (part if c.field_names() and set(c.field_names()) <= pf
         else rest).append(c)
    return part, _recombine(rest)


def _fragment_matches(frag: Fragment, part_conjs: List[Expression],
                      schema_types: Dict[str, object]) -> bool:
    """Evaluate partition-only conjuncts against this fragment's values
    (1-row batch through the real kernels — no bespoke evaluator)."""
    if not part_conjs:
        return True
    import pyarrow as pa
    from .. import array as make_array
    from ..core.schema import Field, Schema
    from ..compute.expressions import execute_scalar_expression
    cols, fields = [], []
    for k, v in frag.partition_values.items():
        t = schema_types.get(k)
        pa_arr = pa.array([v]).cast(t) if t is not None else \
            pa.array([_coerce(v)])
        cols.append(make_array(pa_arr))
        fields.append(Field(k, cols[-1].type, False))
    b = Batch(Schema(tuple(fields)), cols, 1)
    for c in part_conjs:
        r = execute_scalar_expression(c, b)
        vals = np.asarray(r.values[:1])
        ok = bool(vals[0]) and (r.validity is None or
                                bool(np.asarray(r.validity[:1])[0]))
        if not ok:
            return False
    return True


def _coerce(v: str):
    for conv in (int, float):
        try:
            return conv(v)
        except (TypeError, ValueError):
            continue
    return v


# ---- scanner -------------------------------------------------------------------

class Scanner:
    """Prune -> read -> device filter/project (``dataset/scanner.h``).
    ATB fragments stream through the native threaded morsel loader
    (readahead); other formats read via pyarrow."""

    def __init__(self, ds: FileSystemDataset, columns=None, filter=None,
                 batch_rows: int = 1 << 15):
        self.dataset = ds
        self.columns = columns
        self.filter = filter
        self.batch_rows = batch_rows
        pf = ds.partitioning.fields if ds.partitioning else []
        self._part_conjs, self._residual = split_filter(filter, pf)

    def _selected_fragments(self) -> List[Fragment]:
        # partition value types inferred per fragment (string paths coerce)
        return [f for f in self.dataset.fragments
                if _fragment_matches(f, self._part_conjs, {})]

    def to_batches(self) -> Iterator[Batch]:
        import pyarrow as pa
        from ..ops.selection import filter_batch
        from ..compute.expressions import execute_scalar_expression
        for frag in self._selected_fragments():
            t = frag.read_pyarrow()
            # attach partition columns (dataset schema evolution)
            if frag.partition_values:
                n = t.num_rows
                for k, v in frag.partition_values.items():
                    if k not in t.column_names:
                        t = t.append_column(
                            k, pa.array([_coerce(v)] * n))
            tt = Table.from_pyarrow(t, max_rows_per_batch=self.batch_rows)
            for b in tt.batches:
                if self._residual is not None:
                    mask = execute_scalar_expression(self._residual, b)
                    b = filter_batch(b, mask)
                if self.columns is not None:
                    b = b.select(self.columns)
                yield b

    def to_table(self) -> Table:
        batches = [b for b in self.to_batches() if len(b) > 0]
        if not batches:
            raise ValueError("scan produced no rows; empty dataset?")
        return Table(batches[0].schema, batches)


# ---- partitioned write ----------------------------------------------------------

def write_dataset(table, root: str, partitioning=None,
                  format: str = "parquet", basename: str = "part-{i}",
                  filesystem=None):
    """Partitioned write (``dataset/dataset_writer.cc`` role).
    ``filesystem`` takes a pyarrow.fs.FileSystem; URIs resolve
    automatically (atb stays local-only)."""
    import pyarrow as pa
    if isinstance(table, Table):
        table = table.to_pyarrow()
    if isinstance(partitioning, (list, tuple)):
        partitioning = HivePartitioning(list(partitioning))
    if filesystem is None and _is_uri(root):
        from pyarrow import fs as pafs
        filesystem, root = pafs.FileSystem.from_uri(root)
    if filesystem is not None and format == "atb":
        raise ValueError("atb writes are local-mmap only")
    _mkdir(root, filesystem)
    if partitioning is None:
        _write_one(table, _join(root, basename.format(i=0) +
                                f".{_ext(format)}", filesystem), format,
                   filesystem)
        return
    keys = partitioning.fields
    combos = table.group_by(keys).aggregate([([], "count_all")])
    for i in range(combos.num_rows):
        values = {k: combos[k][i].as_py() for k in keys}
        mask = None
        import pyarrow.compute as pc
        for k, v in values.items():
            m = pc.equal(table[k], v)
            mask = m if mask is None else pc.and_(mask, m)
        part = table.filter(mask).drop_columns(keys)
        d = _join(root, partitioning.format(values), filesystem)
        _mkdir(d, filesystem)
        _write_one(part, _join(d, basename.format(i=0) +
                               f".{_ext(format)}", filesystem), format,
                   filesystem)


def _mkdir(path: str, filesystem=None):
    if filesystem is not None:
        filesystem.create_dir(path, recursive=True)
    else:
        os.makedirs(path, exist_ok=True)


def _join(root: str, name: str, filesystem=None) -> str:
    if filesystem is not None:
        return f"{root.rstrip('/')}/{name}"
    return os.path.join(root, name)


def _ext(fmt: str) -> str:
    return {"parquet": "parquet", "ipc": "arrow", "feather": "feather",
            "csv": "csv", "atb": "atb"}[fmt]


def _write_one(t, path: str, fmt: str, filesystem=None):
    if fmt == "parquet":
        import pyarrow.parquet as pq
        pq.write_table(t, path, filesystem=filesystem)
    elif fmt in ("ipc", "feather"):
        import pyarrow.feather as fe
        if filesystem is not None:
            with filesystem.open_output_stream(path) as f:
                fe.write_feather(t, f)
        else:
            fe.write_feather(t, path)
    elif fmt == "csv":
        import pyarrow.csv as pcsv
        if filesystem is not None:
            with filesystem.open_output_stream(path) as f:
                pcsv.write_csv(t, f)
        else:
            pcsv.write_csv(t, path)
    elif fmt == "atb":
        from .. import native
        cols = {}
        for name in t.column_names:
            arr = t[name].combine_chunks()
            col = {}
            import pyarrow.types as pt
            if pt.is_string(arr.type) or pt.is_binary(arr.type):
                import numpy as np_
                # zero-copy from the arrow buffers (the python-join loop
                # this replaces was the write path's hot spot)
                n = len(arr)
                obuf = arr.buffers()[1]
                if obuf is None:   # spec allows a NULL buffer when n == 0
                    off = np_.zeros((1,), np_.int32)
                else:
                    off = np_.frombuffer(
                        obuf, np_.int32,
                        count=n + 1 + arr.offset)[arr.offset:]
                dbuf = arr.buffers()[2]
                data = np_.frombuffer(dbuf, np_.uint8) if dbuf is not None \
                    else np_.zeros((0,), np_.uint8)
                base = int(off[0])
                if base:
                    off = off - base
                    data = data[base:]
                data = data[:int(off[-1])]
                col = {"data": data, "offsets": off}
            else:
                col = {"data": arr.to_numpy(zero_copy_only=False)}
            if arr.null_count:
                col["validity"] = ~np.asarray(arr.is_null())
            cols[name] = col
        native.write_atb(path, cols, t.num_rows)
    else:
        raise ValueError(fmt)
