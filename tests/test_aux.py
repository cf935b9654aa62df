"""Aux subsystems: tracing/metrics, config, cancellation, plan dumps."""

import pyarrow as pa
import pytest

import arrow_tpu as at
from arrow_tpu.acero import (Declaration, FilterNodeOptions,
                             TableSourceNodeOptions)
from arrow_tpu.compute.expressions import field
from arrow_tpu.utils import (CancelledError, StopSource, build_info,
                             env_settings, metrics, runtime_info,
                             trace_span)


def test_metrics_and_trace_span():
    metrics.reset()
    with trace_span("unit:op", rows=100):
        pass
    snap = metrics.snapshot()
    assert snap["unit:op"]["rows"] == 100
    assert snap["unit:op"]["calls"] == 1


def test_plan_records_metrics():
    metrics.reset()
    t = pa.table({"x": [1, 2, 3, 4]})
    decl = Declaration.from_sequence([
        Declaration("table_source", TableSourceNodeOptions(t)),
        Declaration("filter", FilterNodeOptions(field("x") > 2)),
    ])
    out = decl.to_table()
    assert out.num_rows == 2
    snap = metrics.snapshot()
    assert snap["plan:filter"]["rows"] == 2


def test_stop_token():
    t = pa.table({"x": list(range(100))})
    src = StopSource()
    decl = Declaration("table_source", TableSourceNodeOptions(
        t, max_batch_rows=10))
    it = decl.to_batches(stop_token=src.token())
    next(it)
    src.request_stop("test abort")
    with pytest.raises(CancelledError):
        next(it)


def test_plan_to_string():
    t = pa.table({"x": [1]})
    decl = Declaration.from_sequence([
        Declaration("table_source", TableSourceNodeOptions(t)),
        Declaration("filter", FilterNodeOptions(field("x") > 0)),
    ])
    s = decl.to_string()
    assert "filter" in s and "table_source" in s
    assert s.index("filter") < s.index("table_source")  # tree indent


def test_build_runtime_info():
    bi = build_info()
    assert "jax_version" in bi and "version" in bi
    ri = runtime_info()
    assert ri["backend"] in ("cpu", "tpu", "axon")
    assert isinstance(env_settings(), dict)
