"""Multi-process (multi-host analog) SPMD: 2 OS processes x 4 virtual CPU
devices = one 8-device global mesh, distributed group_by through
parallel/multihost.py (jax.distributed + gloo collectives + allgathered
results). The same wiring drives a real multi-host TPU slice."""

import os
import socket
import subprocess
import sys
import textwrap

import pytest

_WORKER = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    import jax
    jax.config.update("jax_platforms", "cpu")
    pid = int(sys.argv[1]); n = int(sys.argv[2]); port = sys.argv[3]
    sys.path.insert(0, %r)
    from arrow_tpu.parallel import multihost
    ctx = multihost.initialize(coordinator="localhost:" + port,
                               num_processes=n, process_id=pid)
    assert ctx.multihost, "mesh should span processes"
    import numpy as np, pyarrow as pa
    import arrow_tpu as at
    rng = np.random.default_rng(0)
    t = pa.table({"k": pa.array(rng.integers(0, 37, 4096)),
                  "v": pa.array(rng.standard_normal(4096))})
    b = at.Batch.from_pyarrow(t.to_batches()[0])
    out = ctx.group_by(b, ["k"], [("sum", "v"), ("count_all",)],
                       max_groups_per_shard=64)
    got = out.to_pyarrow().sort_by([("k", "ascending")])
    exp = t.group_by("k").aggregate(
        [("v", "sum"), ([], "count_all")]).sort_by([("k", "ascending")])
    assert got["k"].to_pylist() == exp["k"].to_pylist()
    np.testing.assert_allclose(got["v_sum"].to_pylist(),
                               exp["v_sum"].to_pylist(), rtol=1e-9)
    assert got["count_all"].to_pylist() == exp["count_all"].to_pylist()
    print("MULTIHOST_OK", pid)
""") % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_multihost_group_by(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(i), "2", port],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=env) for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-3000:]}"
        assert f"MULTIHOST_OK {i}" in out
