"""Multi-host (multi-process) SPMD driver.

Reference framing: the C++ reference scales within one process (thread
pools) and leaves cross-process distribution to external systems
(SURVEY.md §2.8 cross-process row). Here the engine's distributed
operators already run SPMD over a ``jax.sharding.Mesh``; this module is
the thin launch layer that makes the SAME code run across N processes /
N hosts: ``jax.distributed.initialize`` + a global-device DistContext.

Per the scaling-book recipe the engine does NOT change per host count —
shardings are annotated against the global mesh and XLA lays the
collectives onto ICI within a host / DCN across hosts.

Usage (one call per process, before any jax computation)::

    from arrow_tpu.parallel import multihost
    ctx = multihost.initialize(coordinator="host0:9991",
                               num_processes=N, process_id=i)
    out = ctx.group_by(batch, ["k"], [("sum", "v")])

On TPU pods, ``initialize()`` with no arguments takes everything from the
TPU environment metadata (jax.distributed's auto-detection).

Testing without hardware: ``tests/test_multihost.py`` launches 2 CPU
processes x 4 virtual devices each and runs a distributed group_by over
the 8-device global mesh — the same wiring a 2-host TPU slice uses.
"""

from __future__ import annotations

from typing import Optional

__all__ = ["initialize", "is_initialized", "global_context"]

_initialized = False


def initialize(coordinator: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None,
               local_device_ids=None):
    """Connect this process to the cluster and return a DistContext over
    the GLOBAL device set. Call once per process before any computation.

    With no arguments, jax auto-detects cluster topology from the
    environment (TPU pod metadata / SLURM / GKE)."""
    global _initialized
    import jax
    if not _initialized:
        kwargs = {}
        if coordinator is not None:
            kwargs["coordinator_address"] = coordinator
        if num_processes is not None:
            kwargs["num_processes"] = num_processes
        if process_id is not None:
            kwargs["process_id"] = process_id
        if local_device_ids is not None:
            kwargs["local_device_ids"] = local_device_ids
        jax.distributed.initialize(**kwargs)
        _initialized = True
    from .context import DistContext
    return DistContext(devices=jax.devices())   # global devices


def is_initialized() -> bool:
    return _initialized


def global_context():
    """DistContext over the global mesh (initialize() must have run, or
    single-process local devices are used)."""
    import jax
    from .context import DistContext
    return DistContext(devices=jax.devices())
